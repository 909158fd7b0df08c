#!/usr/bin/env python
"""Single-image detection + mask visualization
(reference: tools/infer_simple.py).

Example:
    python tools/infer_image.py image.jpg --out vis.png
"""

from common import base_parser, load_cfg


def main():
    p = base_parser("Detect + segment objects in images")
    p.add_argument("images", nargs="+", help="input image paths")
    p.add_argument("--out", default=None,
                   help="visualization output path (first image)")
    p.add_argument("--thresh", type=float, default=0.5)
    args = p.parse_args()
    cfg = load_cfg(args)

    import numpy as np
    import jax.numpy as jnp

    from vosdetectron_tpu.data.davis import read_image_bgr
    from vosdetectron_tpu.engine.inference import Detector, preprocess_np
    from vosdetectron_tpu.utils.vis import draw_detections

    params = None
    if args.ckpt:
        from vosdetectron_tpu.utils.checkpoint import load_params

        params = load_params(args.ckpt)
    det = Detector(cfg, params=params)

    for i, path in enumerate(args.images):
        im = read_image_bgr(path)
        padded, hw, scale = preprocess_np(
            im, cfg.test.scale, cfg.test.max_size,
            cfg.test.padded_image_size, cfg.data.pixel_means,
            cfg.data.pixel_stds)
        out = det.detect(jnp.asarray(padded[None]), jnp.asarray(hw[None]))
        boxes = np.asarray(out.boxes[0]) / scale
        scores = np.asarray(out.scores[0])
        classes = np.asarray(out.classes[0])
        valid = np.asarray(out.valid[0]) & (scores >= args.thresh)
        pasted = None
        if out.masks is not None:
            pasted = np.asarray(det.paste(out, im.shape[0], im.shape[1],
                                          scale)[0])
        n = int(valid.sum())
        print(f"{path}: {n} detections >= {args.thresh}")
        for j in np.nonzero(valid)[0]:
            x1, y1, x2, y2 = boxes[j]
            print(f"  cls={int(classes[j])} score={scores[j]:.3f} "
                  f"box=({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")
        if args.out and i == 0:
            vis = draw_detections(im, boxes, scores, classes, valid, pasted)
            if out.keypoints is not None:
                from vosdetectron_tpu.utils.vis import draw_keypoints

                kps = np.asarray(out.keypoints[0]).copy()
                kps[:, :, :2] /= scale
                vis = draw_keypoints(vis, kps, valid)
            import cv2

            cv2.imwrite(args.out, vis)
            print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
