"""Persistent compile-cache policy (utils/jax_setup): the bench artifact
depends on a fresh clone hitting committed TPU cache entries (BENCH_r04
post-mortem: a cold environment re-compiled the whole program set through
the remote-compile tunnel and blew the bench deadline), while CPU entries
must stay host-keyed — XLA:CPU AOT executables embed the compile host's
feature set and SIGABRT on lesser hosts."""

import os

from vosdetectron_tpu.utils import jax_setup


def test_cpu_cache_keyed_by_host_fingerprint():
    sub = jax_setup.cache_subdir("cpu", "cpu")
    assert sub.startswith("cpu-")
    assert sub == jax_setup.cache_subdir("cpu", "anything")  # kind-agnostic


def test_device_cache_keyed_by_backend_and_kind_only():
    # device executables carry no host-CPU dependency: the subdir must be
    # stable across hosts so committed entries hit from a fresh driver env
    sub = jax_setup.cache_subdir("axon", "TPU v5 lite")
    assert sub == "axon-TPU_v5_lite"
    assert "/" not in sub and " " not in sub
    assert jax_setup.cache_subdir("tpu", "TPU v4") == "tpu-TPU_v4"


def test_default_cache_root_is_repo_local():
    root = jax_setup._repo_cache_root()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert root == os.path.join(repo, "zoo", "xla_cache")


def test_setup_configures_cache_dir_under_root():
    # setup() ran earlier in this process (engine constructors call it);
    # whatever call won, the configured dir must follow the policy above
    import jax

    jax_setup.setup()
    d = jax.config.jax_compilation_cache_dir
    assert d is not None
    sub = os.path.basename(d)
    backend = jax.default_backend()
    if backend == "cpu":
        assert sub.startswith("cpu-"), d
    else:
        assert sub.startswith(backend + "-"), d
