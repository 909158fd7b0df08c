"""Device/tunnel health probing with real completion barriers.

The TPU behind the axon tunnel has weather: tunnel bandwidth, shared
tenancy, and the remote compiler's code quality all vary between sessions
by orders of magnitude (2026-08-18: native convs at 0.2 TFLOP/s while
dot_general sustained 54; effective HBM bandwidth 4 GB/s vs ~40 earlier
the same day). Two consumers:

  * bench.py logs a probe line to stderr so the recorded benchmark number
    carries its own weather context, and uses `choose_conv_impl` to route
    around a conv-lowering regression (models/convs.py dots mode).
  * tools/probe_tpu_health.py prints the full table interactively.

Every timing downloads a reduced scalar: ``Array.block_until_ready()`` can
return before device work completes on this backend, which silently turns
wall-clock timings into queue-depth measurements.
"""

from __future__ import annotations

import time
from typing import Dict


def quick_probe(small: bool = True,
                budget_s: float = 180.0) -> Dict[str, float]:
    """Measure the device's effective rates. small=True keeps every
    program tiny (fast remote compiles) — right for bench warmup; False
    uses larger shapes for more stable numbers (the CLI tool).

    budget_s bounds the probe's own wall time: in degraded weather even
    tiny programs cost seconds each, and a weather probe must not spend
    the benchmark's deadline. Metrics that don't fit are omitted
    (consumers treat missing keys as unknown)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..models.convs import dots_conv

    dev = jax.devices()[0]
    take1 = jax.jit(lambda a: a.ravel()[0])
    t_begin = time.time()

    class _OutOfBudget(Exception):
        pass

    def real_sync(x):
        return np.asarray(take1(x))

    def bench(fn, *args, reps=3):
        if time.time() - t_begin > budget_s:
            raise _OutOfBudget
        fn(*args)
        real_sync(jnp.zeros(1))
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        real_sync(outs[-1])
        return (time.time() - t0) / reps

    results: Dict[str, float] = {}

    try:

        x1 = jax.device_put(np.ones(8, np.float32), dev)
        tiny = jax.jit(lambda a: a + 1.0)
        results["rtt_ms"] = round(bench(tiny, x1, reps=5) * 1e3, 1)

        # conv lowerings, native vs dots, on one representative 3x3.
        n, h, w, c = (2, 64, 128, 32) if small else (8, 256, 448, 64)
        xc = jax.device_put(np.random.rand(n, h, w, c).astype(jnp.bfloat16), dev)
        wc = jax.device_put((np.random.rand(3, 3, c, c) * 0.01
                             ).astype(jnp.bfloat16), dev)
        conv_flops = 2 * n * h * w * c * c * 9

        @jax.jit
        def conv_native(x, kw):
            return lax.conv_general_dilated(
                x, kw, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        dt = bench(conv_native, xc, wc)
        results["conv_native_tflops"] = round(conv_flops / dt / 1e12, 3)

        @jax.jit
        def conv_d(x, kw):
            return dots_conv(x, kw, (1, 1), ((1, 1), (1, 1)), (1, 1))

        dt = bench(conv_d, xc, wc)
        results["conv_dots_tflops"] = round(conv_flops / dt / 1e12, 3)

        # MXU rate: chained matmuls, compute-dense (reads stay in VMEM).
        m = 1024 if small else 4096
        a = jax.device_put((np.random.rand(m, m) * 0.01).astype(jnp.bfloat16),
                           dev)

        @jax.jit
        def mm(a):
            y = a
            for _ in range(8):
                y = (lax.dot(y, a, preferred_element_type=jnp.float32)
                     .astype(jnp.bfloat16) * 0.5)
            return y

        dt = bench(mm, a)
        results["matmul_tflops"] = round(8 * 2 * m ** 3 / dt / 1e12, 2)

        # effective HBM bandwidth: elementwise add.
        nb = (16 if small else 64) * 2 ** 20
        xb = jax.device_put(np.zeros(nb // 4, np.float32), dev)
        add = jax.jit(lambda v: v + 1.0)
        dt = bench(add, xb)
        results["elementwise_gbps"] = round(2 * nb / dt / 2 ** 30, 1)

        # tunnel transfer rates.
        mb = 8 if small else 16
        host = np.zeros(mb * 2 ** 20, np.uint8)
        jax.block_until_ready(jax.device_put(host, dev))
        t0 = time.time()
        bufs = [jax.device_put(host, dev) for _ in range(4)]
        real_sync(bufs[-1].astype(jnp.float32))
        results["upload_mbps"] = round(4 * mb / (time.time() - t0), 1)
        t0 = time.time()
        for b in bufs:
            np.asarray(b)
        results["download_mbps"] = round(4 * mb / (time.time() - t0), 1)
    except _OutOfBudget:
        results["probe_truncated"] = 1.0
    return results


def choose_conv_impl(health: Dict[str, float],
                     margin: float = 3.0) -> str:
    """Route around a regressed native conv lowering: pick "dots" only
    when it beats native by `margin` (a healthy toolchain's native convs
    always win — dots re-reads the input K*K times)."""
    native = health.get("conv_native_tflops", 0.0)
    dots = health.get("conv_dots_tflops", 0.0)
    if native > 0 and dots > margin * native:
        return "dots"
    return "native"
