"""Device mesh + sharding helpers — the framework's entire "comm backend".

Replaces the reference's parallel machinery
(reference: lib/nn/parallel/* custom DataParallel scatter/gather ~400 LoC,
and lib/utils/subprocess.py per-GPU eval subprocess forks — SURVEY.md §2.3).

There is no hand-written communication layer: a `jax.sharding.Mesh` plus
NamedSharding annotations make XLA/GSPMD insert all collectives (psum for
gradient reduction, all-gathers for eval) over ICI. Multi-host runs call
`jax.distributed.initialize()` once; everything else is identical SPMD code.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config

DATA_AXIS = "data"


def make_mesh(cfg: Optional[Config] = None,
              num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the available devices (v5e-8: 8 chips).

    Batch dims shard over `data`; params are replicated (Mask R-CNN at
    ~44M params needs no TP — SURVEY.md §2.3 marks TP/PP out of scope).
    """
    devs = jax.devices()
    n = num_devices or (cfg.parallel.num_devices if cfg else -1)
    if n and n > 0:
        devs = devs[:n]
    axis = cfg.parallel.data_axis if cfg else DATA_AXIS
    return Mesh(np.asarray(devs), (axis,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the mesh's (sole) data axis —
    named by cfg.parallel.data_axis at mesh construction."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host pytree with its leading axis sharded over the mesh.

    Single-process: plain device_put with a NamedSharding. Multi-HOST
    (jax.distributed): each process passes its LOCAL portion of the batch
    (leading axis = global/num_processes) and the global array is
    assembled from per-process shards — the multi-host data-feeding path
    of workload 5."""
    s = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def initialize_multihost() -> None:
    """Multi-host entry (reference equivalent: none — single node only).

    Call before any jax op on each host of a multi-host slice; no-op when
    the coordinator env vars are absent.
    """
    import os

    if "COORDINATOR_ADDRESS" in os.environ or \
            "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
