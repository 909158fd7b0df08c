#!/usr/bin/env python
"""Export the detector as a serialized serving artifact (StableHLO).

TPU-native replacement for the reference's ship-the-repo deployment: the
whole jitted detect program (backbone -> RPN -> heads -> postprocess ->
masks/keypoints) is lowered ahead of time with jax.export and written as a
versioned artifact a serving process loads without model code on the hot
path. See vosdetectron_tpu/zoo/export.py.

Examples:
  # portable (pure-XLA RoIAlign), params as a call argument + checkpoint dir
  python tools/export_model.py --ckpt zoo/detector_synthetic_bf16 \
      --set model.num_classes=2 --out /tmp/det_artifact --platforms tpu,cpu

  # self-contained TPU-only artifact with Pallas RoIAlign baked in
  python tools/export_model.py --ckpt ... --bake-params \
      --set fast_rcnn.roi_xform_method=roi_align_pallas --platforms tpu
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import base_parser, load_cfg  # noqa: E402


def main():
    p = base_parser("Export the detector as a jax.export serving artifact")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--platforms", default="",
                   help="comma list (tpu,cpu,cuda); default = current")
    p.add_argument("--bake-params", action="store_true",
                   help="embed weights as constants (self-contained, large)")
    args = p.parse_args()
    cfg = load_cfg(args).validate()

    params = None
    if args.ckpt:
        from vosdetectron_tpu.utils.checkpoint import load_params

        params = load_params(args.ckpt)
    else:
        print("warning: no --ckpt; exporting randomly-initialized weights",
              file=sys.stderr)

    from vosdetectron_tpu.zoo.export import export_detector, save_artifact

    platforms = [s for s in args.platforms.split(",") if s] or None
    exp, with_params, params = export_detector(
        cfg, params, batch=args.batch, platforms=platforms,
        bake_params=args.bake_params)
    save_artifact(args.out, exp, with_params, cfg,
                  params=params if not args.bake_params else None)
    with open(os.path.join(args.out, "meta.json")) as f:
        meta = json.load(f)
    print(json.dumps(meta, indent=1))
    print(f"artifact written to {args.out}")


if __name__ == "__main__":
    main()
