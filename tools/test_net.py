#!/usr/bin/env python
"""Dataset-level detection eval (reference: tools/test_net.py).

Example:
    python tools/test_net.py --ann instances_val.json --imgs val2017/ \
        --ckpt output/ --max-images 500
"""

from common import base_parser, load_cfg


def main():
    p = base_parser("Evaluate detection + instance segmentation (COCO AP)")
    p.add_argument("--ann", required=True, help="COCO instances json")
    p.add_argument("--imgs", required=True, help="image directory")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--no-masks", action="store_true")
    args = p.parse_args()
    cfg = load_cfg(args)

    from vosdetectron_tpu.data.coco import CocoDataset
    from vosdetectron_tpu.engine.eval_images import evaluate_coco
    from vosdetectron_tpu.engine.inference import Detector

    dataset = CocoDataset(args.ann, args.imgs)
    if cfg.model.num_classes != dataset.num_classes:
        from vosdetectron_tpu.config import apply_overrides

        cfg = apply_overrides(cfg, [("model.num_classes",
                                     dataset.num_classes)])
    params = None
    if args.ckpt:
        from vosdetectron_tpu.utils.checkpoint import load_params

        params = load_params(args.ckpt)
    det = Detector(cfg, params=params)
    res = evaluate_coco(det, dataset, cfg, max_images=args.max_images,
                        batch_size=args.batch,
                        with_masks=not args.no_masks)
    for task, r in res.items():
        print(f"{task}: AP={r['AP']:.4f} AP50={r['AP50']:.4f} "
              f"AP75={r['AP75']:.4f}")


if __name__ == "__main__":
    main()
