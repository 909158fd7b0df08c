#!/usr/bin/env python
"""TPU/tunnel health probe: one line per metric, real completion barriers.

Why: this framework runs against a remote TPU whose effective performance
varies by orders of magnitude with "weather" — tunnel bandwidth, shared
tenancy, and (observed 2026-08-18) the remote compiler's conv lowering
regressing 250x while dot_general stayed at full MXU rate. The e2e bench
number is only interpretable next to this probe's readings; bench.py logs
the same probe (small shapes) before its laps.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_tpu_health.py [--small]
Prints a table plus one machine-readable JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)


def main():
    from vosdetectron_tpu.utils.health import choose_conv_impl, quick_probe

    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    results = quick_probe(small="--small" in sys.argv[1:])
    w = max(len(k) for k in results)
    for k, v in results.items():
        print(f"{k:{w}s}  {v}")
    print(f"{'conv_impl_choice':{w}s}  {choose_conv_impl(results)}")
    print(json.dumps({"tpu_health": results}))


if __name__ == "__main__":
    main()
