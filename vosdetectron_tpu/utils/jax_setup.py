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


def setup(cache_dir: str | None = None) -> None:
    """Idempotent process-level setup. Call before building engines."""
    global _DONE
    if _DONE:
        return
    import jax

    cache = cache_dir or os.environ.get(
        "VOSDETECTRON_CACHE", os.path.expanduser("~/.cache/vosdetectron_xla"))
    cache = os.path.join(cache, _host_fingerprint())
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run without the persistent cache
    _DONE = True
