"""Worker for the 2-process sharded VOS eval test (VERDICT r4 #7):
two jax.distributed processes, 4 virtual CPU devices each, one global
8-device mesh; each process feeds its 4 LOCAL sequences to
run_sequences_sharded and checks its local predictions pixel-match the
single-device engine on the same sequences. Also asserts the documented
multi-process delta fallback: yuv420_delta is requested but the
content-dependent K alphabet cannot form a consistent global array, so
the path must report delta=False while keeping packed yuv420.

Usage: python _sharded_eval_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import numpy as np

    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.vos import VOSEngine, run_sequences_sharded
    from vosdetectron_tpu.parallel.mesh import make_mesh

    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == nproc * n_local, (n_global, nproc, n_local)

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("rpn.pre_nms_top_n_test", 64),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96),
        ("test.max_size", 192),
        ("test.detections_per_im", 8),
        ("vos.max_tracks", 4),
        ("vos.track_mask_size", (32, 48)),
        ("vos.upload_format", "yuv420_delta"),  # must fall back to packed
        ("vos.delta_block", 64),
    ]).validate()

    # sequence i is always drawn from seed i: process p materializes only
    # its local block [p*n_local, (p+1)*n_local) — shard_batch assembles
    # the 8-sequence global batch from the two 4-sequence local halves
    rng = np.random.RandomState(0)
    seqs, firsts = [], []
    for i in range(pid * n_local, (pid + 1) * n_local):
        frames, idmaps = make_synthetic_sequence(
            i, num_frames=1, size=(96, 160), num_objects=2)
        fr = np.repeat(frames[:1], 2, axis=0).copy()
        rloc = np.random.RandomState(1000 + i)
        fr[1, 30:40, 50:60] = rloc.randint(0, 256, 3)  # sparse motion
        seqs.append(fr)
        firsts.append(idmaps[0])
    del rng
    frames_s = np.stack(seqs)
    first = np.stack(firsts)

    mesh = make_mesh(num_devices=n_global)
    eng = VOSEngine(cfg, rng=0, chunk=2)
    preds = run_sequences_sharded(eng, frames_s, first, mesh, verbose=True)
    assert len(preds) == n_local, (len(preds), n_local)
    assert len(preds[0]) == 2

    # pixel parity of every LOCAL sequence vs the single-device engine
    # (identical rng=0 init on both processes -> identical params)
    worst = 1.0
    for i in range(n_local):
        single = eng.run_sequence(seqs[i], firsts[i])
        for t in range(2):
            agree = (preds[i][t] == single[t]).mean()
            worst = min(worst, float(agree))
    assert worst > 0.999, f"sharded/single disagree: worst agree={worst}"

    print(f"SHARDED_EVAL_OK pid={pid} worst_agree={worst:.6f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
