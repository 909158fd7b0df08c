#!/usr/bin/env python
"""TPU/tunnel health probe: one line per metric, real completion barriers.

Why: this framework runs against a remote TPU whose effective performance
varies by orders of magnitude with "weather" — tunnel bandwidth, shared
tenancy, and (observed 2026-08-18) the remote compiler's conv lowering
regressing 250x while dot_general stayed at full MXU rate. The e2e bench
number is only interpretable next to this probe's readings.

Every timing uses a REAL completion barrier (download of a reduced
scalar): ``Array.block_until_ready()`` can return before device work
finishes on this backend, which silently turns timings into queue-depth
measurements.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_tpu_health.py
Prints a table plus one machine-readable JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)
    take1 = jax.jit(lambda a: a.ravel()[0])

    def real_sync(x):
        return np.asarray(take1(x))

    def bench(fn, *args, reps=3):
        fn(*args)
        real_sync(jnp.zeros(1))
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        real_sync(outs[-1])
        return (time.time() - t0) / reps

    results = {}

    # round-trip latency: jitted scalar add + 8-byte download
    x1 = jax.device_put(np.ones(8, np.float32), dev)
    tiny = jax.jit(lambda a: a + 1.0)
    dt = bench(tiny, x1, reps=5)
    results["rtt_ms"] = round(dt * 1e3, 1)

    # MXU rate: 2048^3 bf16 matmul chain of 8 (amortizes dispatch)
    a = jax.device_put(
        (np.random.rand(2048, 2048) * 0.01).astype(jnp.bfloat16), dev)

    @jax.jit
    def mm(a):
        y = a
        for _ in range(8):
            y = jax.lax.dot(y, a, precision=None,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16) * 0.5
        return y

    dt = bench(mm, a)
    results["matmul_tflops"] = round(8 * 2 * 2048 ** 3 / dt / 1e12, 1)

    # native conv rate: 3x3 64->64 @ (8, 256, 448)
    xc = jax.device_put(
        np.random.rand(8, 256, 448, 64).astype(jnp.bfloat16), dev)
    wc = jax.device_put(
        (np.random.rand(3, 3, 64, 64) * 0.01).astype(jnp.bfloat16), dev)
    conv_flops = 2 * 8 * 256 * 448 * 64 * 64 * 9

    @jax.jit
    def conv_native(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = bench(conv_native, xc, wc)
    results["conv_native_tflops"] = round(conv_flops / dt / 1e12, 2)

    # dots conv rate (models/convs.py lowering)
    from vosdetectron_tpu.models.convs import dots_conv

    @jax.jit
    def conv_dots(x, w):
        return dots_conv(x, w, (1, 1), ((1, 1), (1, 1)), (1, 1))

    dt = bench(conv_dots, xc, wc)
    results["conv_dots_tflops"] = round(conv_flops / dt / 1e12, 2)

    # HBM-ish bandwidth: elementwise add over 256 MB
    xb = jax.device_put(np.zeros((64, 1024, 1024), np.float32), dev)
    add = jax.jit(lambda a: a + 1.0)
    dt = bench(add, xb)
    results["elementwise_gbps"] = round(2 * xb.nbytes / dt / 2 ** 30, 1)

    # upload / download (16 MB buffers)
    host = np.zeros(16 * 2 ** 20, np.uint8)
    jax.block_until_ready(jax.device_put(host, dev))
    t0 = time.time()
    bufs = [jax.device_put(host, dev) for _ in range(4)]
    real_sync(bufs[-1].astype(jnp.float32))
    results["upload_mbps"] = round(4 * 16 / (time.time() - t0), 1)
    t0 = time.time()
    for b in bufs:
        np.asarray(b)
    results["download_mbps"] = round(4 * 16 / (time.time() - t0), 1)

    w = max(len(k) for k in results)
    for k, v in results.items():
        print(f"{k:{w}s}  {v}")
    print(json.dumps({"tpu_health": results}))


if __name__ == "__main__":
    main()
