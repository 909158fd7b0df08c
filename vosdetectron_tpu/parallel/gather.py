"""Cross-process gather of arbitrary Python objects.

TPU-native replacement for the reference's per-GPU detection-pickle merge
(reference: lib/core/test_engine.py + lib/utils/subprocess.py — each GPU
subprocess wrote a .pkl shard; the parent read and merged them). With
jax.distributed there is no shared filesystem contract between hosts, so
shards ride the ICI/DCN fabric instead: pickle -> fixed-width uint8 rows ->
`multihost_utils.process_allgather` -> unpickle.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def allgather_object(obj: Any) -> List[Any]:
    """All-gather one picklable object per process; returns the list of
    every process's object, ordered by process index, identical on all
    processes. Single-process: returns [obj] without touching the fabric.
    """
    import jax

    if jax.process_count() <= 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # Rows must share one static shape: agree on the max length first.
    n = np.asarray([payload.size], np.int64)
    all_n = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    width = int(all_n.max())
    row = np.zeros((width,), np.uint8)
    row[:payload.size] = payload
    rows = np.asarray(multihost_utils.process_allgather(row))
    rows = rows.reshape(jax.process_count(), width)
    return [pickle.loads(rows[i, :int(all_n[i])].tobytes())
            for i in range(jax.process_count())]
