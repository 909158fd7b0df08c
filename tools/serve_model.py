#!/usr/bin/env python
"""Run detection from an EXPORTED artifact — no model code on the hot path.

The serving counterpart of tools/export_model.py: loads the StableHLO
program (zoo/export.py artifact directory), jits its call, and drives it
over images. Only the artifact's recorded shapes/meta and (when not baked)
its params checkpoint are used — GeneralizedRCNN is never constructed, so
this is the deployment path a model-code change cannot drift.

Example:
    python tools/export_model.py --ckpt ./ckpt --out ./artifact \
        --set model.num_classes=2
    python tools/serve_model.py --artifact ./artifact img1.jpg img2.jpg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)


def main():
    p = argparse.ArgumentParser(
        description="Serve detections from an exported artifact")
    p.add_argument("images", nargs="+", help="input image paths")
    p.add_argument("--artifact", required=True, help="artifact directory")
    p.add_argument("--params", default=None,
                   help="params checkpoint (default: <artifact>/params)")
    p.add_argument("--thresh", type=float, default=0.5)
    args = p.parse_args()

    import numpy as np

    import jax

    from vosdetectron_tpu.data.davis import read_image_bgr
    from vosdetectron_tpu.engine.inference import preprocess_np
    from vosdetectron_tpu.zoo.export import load_artifact

    exp, meta = load_artifact(args.artifact)
    ph, pw = meta["padded_image_size"]
    print(f"artifact: {meta['fun_name']} platforms={meta['platforms']} "
          f"padded={ph}x{pw} program={meta['program_bytes']}B",
          file=sys.stderr)

    params = None
    if meta["call_with_params"]:
        ppath = args.params or os.path.join(args.artifact, "params")
        from vosdetectron_tpu.utils.checkpoint import load_params

        # commit once: host-resident params re-upload on EVERY call
        # (~150 MB through the tunnel — see VOSEngine.__init__)
        params = jax.device_put(load_params(ppath),
                                jax.local_devices()[0])
        print(f"params: {ppath}", file=sys.stderr)

    call = jax.jit(exp.call)

    for path in args.images:
        im = read_image_bgr(path)
        # the artifact records its preprocessing contract (zoo/export.py)
        padded, hw, scale = preprocess_np(
            im, meta["test_scale"], meta["test_max_size"], (ph, pw),
            tuple(meta["pixel_means"]), tuple(meta["pixel_stds"]))
        inputs = (padded[None], hw[None])
        dets = call(params, *inputs) if params is not None \
            else call(*inputs)
        boxes = np.asarray(dets.boxes[0]) / scale
        scores = np.asarray(dets.scores[0])
        classes = np.asarray(dets.classes[0])
        valid = np.asarray(dets.valid[0]) & (scores >= args.thresh)
        print(f"{path}: {int(valid.sum())} detections >= {args.thresh}")
        for j in np.nonzero(valid)[0]:
            x1, y1, x2, y2 = boxes[j]
            print(f"  cls={int(classes[j])} score={scores[j]:.3f} "
                  f"box=({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")


if __name__ == "__main__":
    main()
