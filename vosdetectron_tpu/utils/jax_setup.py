"""Process-level JAX configuration: persistent compile cache, platform quirks.

Replaces the reference's native-extension build step (lib/make.sh) in
spirit: instead of precompiled CUDA objects, our "binaries" are XLA
executables — the persistent compilation cache makes them survive process
restarts, turning 85-second whole-pipeline compiles into millisecond loads.

This machine reaches its TPU through a network tunnel (~30 ms round-trip
per host<->device op), which makes EAGER execution catastrophically slow —
everything must run under jit, including flax `Module.init`.
"""

from __future__ import annotations

import os

_DONE = False


def _host_fingerprint() -> str:
    """Cache-key suffix tied to the host microarchitecture.

    XLA:CPU AOT executables embed the compile machine's feature set and
    ABORT (SIGABRT, not a graceful miss) when loaded on a host missing a
    feature — a persistent cache carried across machines (shared home
    dir, container reschedule) would poison every CPU-platform run. Keying
    the cache dir by (machine, cpu flags) makes foreign entries unfindable
    instead of fatal.
    """
    import hashlib
    import platform

    txt = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    txt += line
                    break
    except OSError:
        pass
    return hashlib.sha1(txt.encode()).hexdigest()[:12]


def _repo_cache_root() -> str:
    """Default cache root: the repo-local `zoo/xla_cache` when the package
    runs from a source tree (three levels up from this file), else the
    user cache dir. Repo-local matters for the benchmark artifact: the
    driver runs bench.py in a FRESH environment where `~/.cache` is empty,
    so cold remote-compiles of the whole program set (~10 min through the
    tunnel) used to eat the bench deadline (BENCH_r04: warmup t+623s vs a
    480s deadline). Committed cache entries ride along with the clone."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(repo, "zoo")):
        return os.path.join(repo, "zoo", "xla_cache")
    return os.path.expanduser("~/.cache/vosdetectron_xla")


def cache_subdir(backend: str, device_kind: str) -> str:
    """Per-platform cache subdirectory.

    CPU entries are XLA:CPU AOT executables that embed the compile
    machine's feature set and ABORT when loaded on a lesser host, so
    they key on the host microarch fingerprint (never commit these).
    Device-platform entries (tpu/axon) are device executables — host
    CPU features are irrelevant — so they key on (backend, device kind)
    and CAN be shipped with the repo and hit from any host driving the
    same device class."""
    if backend == "cpu":
        return "cpu-" + _host_fingerprint()
    kind = "".join(c if c.isalnum() else "_" for c in device_kind)
    return f"{backend}-{kind}"


def setup(cache_dir: str | None = None) -> None:
    """Idempotent process-level setup. Call before building engines."""
    global _DONE
    if _DONE:
        return
    import jax

    cache = cache_dir or os.environ.get(
        "VOSDETECTRON_CACHE", _repo_cache_root())
    try:
        backend = jax.default_backend()
        kind = jax.devices()[0].device_kind
    except Exception:
        backend, kind = "cpu", ""
    cache = os.path.join(cache, cache_subdir(backend, kind))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run without the persistent cache
    _DONE = True
