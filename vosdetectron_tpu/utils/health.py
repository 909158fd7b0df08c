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

    def bench_iters(fn, *args, target_s=0.5, n_max=16384):
        """Time fn(n, *args) where n is a TRACED iteration count (one
        compile), scaling n until device work dominates the dispatch+
        download floor (~rtt). A fixed-size probe behind an 80 ms tunnel
        rtt measures the floor, not the device: 8 chained 1024^3 bf16
        matmuls are 0.4 ms of MXU work — invisible behind the rtt, so the
        old probe under-read healthy rates ~100x and overstated
        degradation. Returns (n, seconds) for the final timed run."""
        if time.time() - t_begin > budget_s:
            raise _OutOfBudget
        real_sync(fn(jnp.int32(2), *args))  # compile once
        n = 4
        while True:
            if time.time() - t_begin > budget_s:
                raise _OutOfBudget
            t0 = time.time()
            out = fn(jnp.int32(n), *args)
            real_sync(out)
            dt = time.time() - t0
            if dt >= target_s or n >= n_max:
                return n, dt
            n = min(n_max, max(n * 2, int(n * target_s / max(dt, 1e-4))))

    results: Dict[str, float] = {}

    try:

        x1 = jax.device_put(np.ones(8, np.float32), dev)
        tiny = jax.jit(lambda a: a + 1.0)
        results["rtt_ms"] = round(bench(tiny, x1, reps=5) * 1e3, 1)

        # conv lowerings, native vs dots, on one representative 3x3.
        # Channel count matters: c=32 underfills the 128-lane MXU and
        # reads ~6 TF/s on a toolchain whose c>=128 convs do 56-177
        # (measured 2026-08-18 against the real R50 shapes) — a
        # small-channel probe would mis-rank the lowerings for the
        # model it is guarding. res3-block geometry, modest batch.
        n, h, w, c = (4, 64, 112, 128) if small else (16, 128, 224, 256)
        xc = jax.device_put(np.random.rand(n, h, w, c).astype(jnp.bfloat16), dev)
        wc = jax.device_put((np.random.rand(3, 3, c, c) * 0.01
                             ).astype(jnp.bfloat16), dev)
        conv_flops = 2 * n * h * w * c * c * 9

        def _renorm(y):
            # keep the bf16 carry in range over arbitrarily many iters
            return y * lax.rsqrt(jnp.mean(
                y.astype(jnp.float32) ** 2) + 1e-6).astype(y.dtype)

        @jax.jit
        def conv_native(n, x, kw):
            def body(_, y):
                y = lax.conv_general_dilated(
                    y, kw, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return _renorm(y)
            return lax.fori_loop(0, n, body, x).ravel()[0]

        n, dt = bench_iters(conv_native, xc, wc)
        results["conv_native_tflops"] = round(n * conv_flops / dt / 1e12, 3)

        @jax.jit
        def conv_d(n, x, kw):
            def body(_, y):
                y = dots_conv(y, kw, (1, 1), ((1, 1), (1, 1)), (1, 1))
                return _renorm(y)
            return lax.fori_loop(0, n, body, x).ravel()[0]

        n, dt = bench_iters(conv_d, xc, wc)
        results["conv_dots_tflops"] = round(n * conv_flops / dt / 1e12, 3)

        # MXU rate: chained matmuls, compute-dense (reads stay in VMEM).
        m = 1024 if small else 4096
        a = jax.device_put((np.random.rand(m, m) * 0.01).astype(jnp.bfloat16),
                           dev)

        @jax.jit
        def mm(n, a):
            def body(_, y):
                y = (lax.dot(y, a, preferred_element_type=jnp.float32)
                     .astype(jnp.bfloat16))
                return _renorm(y)
            return lax.fori_loop(0, n, body, a).ravel()[0]

        n, dt = bench_iters(mm, a)
        results["matmul_tflops"] = round(n * 2 * m ** 3 / dt / 1e12, 2)

        # effective HBM bandwidth: elementwise add, read + write per
        # iteration. The buffer must EXCEED VMEM (128 MiB on v5e) or the
        # loop carry stays VMEM-resident and this reads ~4 TB/s of VMEM
        # bandwidth instead of HBM; allocate on device (a 192 MiB
        # device_put through a 30 MB/s tunnel would cost the budget).
        nb = 192 * 2 ** 20
        xb = jax.device_put(
            jax.jit(lambda: jnp.zeros(nb // 4, jnp.float32))(), dev)

        @jax.jit
        def add(n, v):
            return lax.fori_loop(0, n, lambda _, y: y + 1.0, v).ravel()[0]

        n, dt = bench_iters(add, xb)
        results["elementwise_gbps"] = round(n * 2 * nb / dt / 2 ** 30, 1)

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
