"""Checkpoint utilities (reference: lib/utils/net.py save_ckpt/load_ckpt).

Orbax-backed; params-only loading for inference tools.
"""

from __future__ import annotations

import os


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest COMPLETE snapshot. Skips orbax's *-tmp dirs — a crash mid-
    save must not poison --resume (reference behavior: load_ckpt restores
    the last fully-written .pth)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir)
                   if d.startswith("step_") and "tmp" not in d)
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def save_params(path: str, params) -> None:
    """Write a params-only snapshot loadable by load_params (stored as
    step_0 so a dir of snapshots and a single snapshot read the same)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "step_0"),
               {"params": params}, force=True)
    ckptr.wait_until_finished()


def load_params(path: str):
    """Load the params subtree from a Trainer checkpoint (or a dir of
    them — picks the latest)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)  # orbax rejects relative paths
    if os.path.isdir(path) and not os.path.basename(path).startswith(
            "step_"):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = latest
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    return restored["params"] if "params" in restored else restored
