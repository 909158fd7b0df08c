#!/usr/bin/env python
"""Fine-tune Mask R-CNN on DAVIS (reference: tools/train_net_step.py).

Example:
    python tools/train_net.py --set solver.max_iter=1000 \
        data.davis_root=/data/DAVIS train.ims_per_batch=2
"""

from common import base_parser, load_cfg


def main():
    p = base_parser("Train Mask R-CNN on DAVIS")
    p.add_argument("--out", default="./output", help="checkpoint dir")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no-mesh", action="store_true",
                   help="single-device (skip mesh sharding)")
    p.add_argument("--use-tfboard", action="store_true",
                   help="write TensorBoard scalars to <out>/tb "
                        "(reference: train_net_step.py --use_tfboard)")
    p.add_argument("--eval-json", default="",
                   help="COCO-detection json of a held-out set; with "
                        "--eval-every, box/mask AP is measured during "
                        "training (reference: test_net-on-snapshot loop)")
    p.add_argument("--eval-image-dir", default="",
                   help="image root for --eval-json (defaults to its dir)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate every N steps (0 = never)")
    p.add_argument("--curve-out", default="",
                   help="JSONL path recording {step, losses, AP} rows "
                        "(defaults to <out>/curve.jsonl when evaluating)")
    args = p.parse_args()
    cfg = load_cfg(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vosdetectron_tpu.data.catalog import build_combined_roidb
    from vosdetectron_tpu.data.detection_data import DetectionLoader
    from vosdetectron_tpu.engine.train import Trainer
    from vosdetectron_tpu.models.targets import GroundTruth
    from vosdetectron_tpu.parallel.mesh import (initialize_multihost,
                                                make_mesh, shard_batch)
    from vosdetectron_tpu.utils.training_stats import TrainingStats

    initialize_multihost()
    mesh = None if args.no_mesh else make_mesh(cfg)
    trainer = Trainer(cfg, rng=0, mesh=mesh)
    if args.ckpt:
        trainer.load(args.ckpt)

    # resolve cfg.train.datasets through the catalog (multi-dataset concat;
    # reference: combined_roidb_for_training)
    records = build_combined_roidb(cfg)
    n_dev = 1 if mesh is None else mesh.size
    batch = cfg.train.ims_per_batch * n_dev
    loader = DetectionLoader(cfg, records, batch)
    import os
    stats = TrainingStats(
        log_period=20,
        tb_dir=os.path.join(args.out, "tb") if args.use_tfboard else None)

    evaluator = None
    if args.eval_json and args.eval_every:
        from vosdetectron_tpu.data.coco import CocoDataset
        from vosdetectron_tpu.engine.eval_images import evaluate_coco
        from vosdetectron_tpu.engine.inference import Detector

        eval_ds = CocoDataset(args.eval_json,
                              args.eval_image_dir
                              or os.path.dirname(args.eval_json))
        # one Detector reused across evals: its jitted programs take
        # params as an argument, so swapping weights never recompiles
        det = Detector(cfg, params=trainer.state.params)
        curve_path = args.curve_out or os.path.join(args.out,
                                                    "curve.jsonl")
        os.makedirs(os.path.dirname(os.path.abspath(curve_path)),
                    exist_ok=True)

        def evaluator(step, losses):
            import json

            det.params = trainer.state.params
            summ = evaluate_coco(det, eval_ds, cfg,
                                 merge_processes=False)
            row = {"step": step + 1,
                   **{f"loss_{k}": round(float(v), 4)
                      for k, v in losses.items()}}
            for iou_type, s in summ.items():
                for k in ("AP", "AP50", "AP75"):
                    row[f"{iou_type}_{k}"] = round(float(s[k]), 4)
            with open(curve_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[eval] {row}", flush=True)

    key = jax.random.PRNGKey(int(trainer.state.step))
    it = iter(loader)
    ctx = mesh if mesh is not None else _nullcontext()
    try:
        with ctx:
            for step in range(int(trainer.state.step), cfg.solver.max_iter):
                images, im_hw, gt_np = next(it)
                key, sub = jax.random.split(key)
                gt = GroundTruth(jnp.asarray(gt_np["boxes"]),
                                 jnp.asarray(gt_np["classes"]),
                                 jnp.asarray(gt_np["masks"]),
                                 jnp.asarray(gt_np["valid"]),
                                 jnp.asarray(gt_np["keypoints"])
                                 if "keypoints" in gt_np else None)
                imgs = jnp.asarray(images)
                hw = jnp.asarray(im_hw)
                if mesh is not None:
                    imgs, hw = shard_batch(mesh, (imgs, hw))
                    gt = GroundTruth(*shard_batch(mesh, tuple(gt)))
                losses = trainer.train_step(sub, imgs, hw, gt)
                stats.log(step, {k: float(v) for k, v in losses.items()},
                          cfg.solver.max_iter)
                if (step + 1) % cfg.train.snapshot_iters == 0 \
                        or step + 1 == cfg.solver.max_iter:
                    trainer.save(args.out)
                    print(f"saved checkpoint at step {step + 1}")
                if evaluator is not None \
                        and (step + 1) % args.eval_every == 0:
                    evaluator(step,
                              {k: float(v) for k, v in losses.items()})
    except (Exception, KeyboardInterrupt):
        # Emergency snapshot on crash/interrupt so --resume restarts from
        # the dying step (reference: train_net_step.py catches exceptions
        # and save_ckpt's before re-raising).
        import traceback

        traceback.print_exc()
        try:
            trainer.save(args.out)
            print(f"EMERGENCY checkpoint saved to {args.out} at step "
                  f"{int(trainer.state.step)} — resume with --resume")
        except Exception as save_err:  # noqa: BLE001
            print(f"emergency checkpoint failed: {save_err}")
        raise


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
