"""Worker process for the 2-process distributed (multi-HOST simulated)
test. NOT a pytest module — spawned by tests/test_multihost.py.

Usage: python _multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp

    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.engine.train import Trainer
    from vosdetectron_tpu.models.targets import GroundTruth
    from vosdetectron_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("rpn.pre_nms_top_n_train", 64),
        ("rpn.post_nms_top_n_train", 32),
        ("rpn.batch_size_per_im", 64),
        ("fast_rcnn.batch_size_per_im", 32),
        ("train.padded_image_size", (128, 192)),
        ("train.max_gt_instances", 4),
    ]).validate()

    mesh = make_mesh()  # all 8 global devices
    assert mesh.devices.size == 4 * nproc

    # Establish the cross-process (gloo) collective context with a cheap
    # all-reduce FIRST: its compile is seconds on both processes, so they
    # reach the collective within the 30s KV-exchange window. The big
    # train-step compile that follows can then skew freely (single-core
    # host) — the context already exists.
    warm = shard_batch(mesh, np.ones((4,), np.float32))
    total_devsum = float(jnp.sum(warm))
    assert total_devsum == 4.0 * nproc, total_devsum
    print(f"gloo context up (pid={pid})", flush=True)

    trainer = Trainer(cfg, rng=0, mesh=mesh)

    # Each process feeds its LOCAL half of the global batch of 8 —
    # same deterministic content on both processes for reproducibility.
    local_b = 4
    ph, pw = cfg.train.padded_image_size
    g = cfg.train.max_gt_instances
    rng = np.random.RandomState(pid)  # DIFFERENT data per host
    images = rng.randn(local_b, ph, pw, 3).astype(np.float32)
    im_hw = np.tile([[ph, pw]], (local_b, 1)).astype(np.float32)
    boxes = np.zeros((local_b, g, 4), np.float32)
    boxes[:, 0] = (20, 30, 80, 90)
    classes = np.zeros((local_b, g), np.int32)
    classes[:, 0] = 1
    masks = np.zeros((local_b, g, ph // 4, pw // 4), np.float32)
    masks[:, 0, 8:22, 6:19] = 1.0
    valid = np.zeros((local_b, g), bool)
    valid[:, 0] = True

    with mesh:
        imgs, hw = shard_batch(mesh, (images, im_hw))
        gt = GroundTruth(*shard_batch(mesh, (boxes, classes, masks, valid)))
        assert imgs.shape[0] == 4 * nproc  # global batch
        key = jax.random.PRNGKey(0)
        # AOT-compile the train step BEFORE executing: compilation on this
        # one-core host skews the two processes by minutes, and any NEW
        # gloo clique the step's collectives need must connect within 30s
        # of both sides arriving. Compile first, then barrier on the
        # already-established 8-device clique, then execute in lockstep.
        compiled = trainer._step.lower(trainer.state, key, imgs, hw,
                                       gt).compile()
        barrier = shard_batch(mesh, np.ones((4,), np.float32))
        assert float(jnp.sum(barrier)) == 4.0 * nproc
        state2, losses = compiled(trainer.state, key, imgs, hw, gt)
        total = float(losses["total"])
    assert np.isfinite(total), f"non-finite loss: {losses}"
    # Both processes must agree on the psum-reduced loss exactly.
    print(f"MULTIHOST_OK pid={pid} loss={total:.6f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
