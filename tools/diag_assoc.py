#!/usr/bin/env python
"""Per-frame association/rescue diagnosis for a held-out sequence.

Runs the SAME pipeline as tools/eval_quality.py (detection chunks +
per-frame propagation/association) but steps the association one frame
at a time with ``associate_and_update(..., return_diag=True)``, dumping
for every frame and track slot: the matched detection, its blend weight,
the track score, and every rescue gate (lost flag, anchor similarity,
row/column margins, mutual-best). Alongside, it measures DETECTOR
COVERAGE of each ground-truth object (best det IoU at low-res + that
det's score), so a lost object can be attributed precisely:

  * coverage low            -> the detector never saw it; rescue can't fire
  * coverage ok, lost=False -> track score never dropped (wrong-match
                               refreshing keeps a drifted track "healthy")
  * lost=True, sim too low  -> anchor embedding not discriminative
  * margins/mutual fail     -> ambiguity between lost tracks

Output: JSONL (one record per frame) + a compact per-frame table on
stderr for the window of interest.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)

from common import base_parser, load_cfg  # noqa: E402


def main():
    p = base_parser("Per-frame association/rescue diagnosis")
    p.add_argument("--prop-ckpt", default=None)
    p.add_argument("--seed", type=int, default=1003)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--objects", type=int, default=3)
    p.add_argument("--hardness", type=float, default=1.0)
    p.add_argument("--out", default="/tmp/diag_assoc.jsonl")
    p.add_argument("--bench-config", action="store_true")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    overrides = [
        ("model.num_classes", 2),
        ("test.scale", 480), ("test.max_size", 864),
        ("test.padded_image_size", (512, 896)),
        ("test.detections_per_im", 32),
        ("rpn.post_nms_top_n_test", 300),
        ("rpn.min_size", 4.0),
        ("fast_rcnn.roi_xform_method", "roi_align_pallas"),
        ("data.pixel_stds", (57.375, 57.12, 58.395)),
        ("vos.propagation", "learned"),
    ]
    if args.bench_config:
        overrides += [("vos.render_scale_den", 2),
                      ("vos.upload_format", "yuv420_delta")]
    cfg = load_cfg(args, overrides)
    if not args.ckpt:
        args.ckpt = os.path.join(repo, "zoo", "detector_synthetic_bf16")
    if args.prop_ckpt is None:
        args.prop_ckpt = os.path.join(repo, "zoo", "prop_head_det")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.vos import VOSEngine
    from vosdetectron_tpu.models.propagation import (associate_and_update,
                                                     render_indexed)
    from vosdetectron_tpu.utils.checkpoint import load_params

    params = load_params(args.ckpt)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float32), params)
    prop_params = load_params(args.prop_ckpt)
    eng = VOSEngine(cfg, params=params, rng=0, chunk=16,
                    prop_params=prop_params)

    frames, idmaps = make_synthetic_sequence(
        args.seed, num_frames=args.frames, size=(480, 854),
        num_objects=args.objects, hardness=args.hardness)
    pseq = eng.prepare_sequence(frames, idmaps[0])
    h0, w0, scale = pseq.h0, pseq.w0, pseq.scale
    den = max(cfg.vos.render_scale_den, 1)
    ph, pw = cfg.test.padded_image_size
    out_hw = (ph // den, pw // den)

    @jax.jit
    def detect(params, fr):
        dm, de, sc, va, inp = eng._detect_chunk(params, fr, scale,
                                                eng.prop_params, (h0, w0))
        # 4x-downsampled det masks for host-side GT coverage (cheap to
        # download; IoU at quarter track res is plenty for attribution)
        dm_small = jax.image.resize(
            dm, dm.shape[:2] + (dm.shape[2] // 4, dm.shape[3] // 4),
            "linear")
        return dm, de, sc, va, inp, dm_small

    @jax.jit
    def dbg_step(state, dm, de, sc, va, inp):
        prop = eng.prop_head.apply({"params": eng.prop_params},
                                   state.pfeat, inp, state.masks)
        propagated = jnp.where(state.alive[:, None, None], prop,
                               state.masks)
        st, diag = associate_and_update(cfg, state, dm, de, sc, va,
                                        propagated, return_diag=True)
        st = st._replace(pfeat=inp)
        idmap = render_indexed(st, out_hw, cfg.mrcnn.thresh_binarize)
        return st, idmap.astype(jnp.uint8), diag

    # host-side GT masks at quarter track res, per frame
    mh, mw = cfg.vos.track_mask_size
    gt_small, gt_ids = [], None
    for t in range(args.frames):
        g, oids = eng._gt_to_track_masks(idmaps[t], scale)
        if gt_ids is None:
            gt_ids = oids
        import cv2
        gs = np.stack([cv2.resize(m, (mw // 4, mh // 4),
                                  interpolation=cv2.INTER_AREA)
                       for m in g])
        gt_small.append(gs)

    state = pseq.state
    recs = []
    fidx = 0
    base = None
    outf = open(args.out, "w")
    for fut in pseq.chunk_futs:
        buf = eng._resolve_chunk(fut.result(), base)
        base = buf[-1]
        dm, de, sc, va, inp, dm_small = detect(eng.params, buf)
        dm_small_np = np.asarray(dm_small)
        sc_np, va_np = np.asarray(sc), np.asarray(va)
        for j in range(buf.shape[0]):
            if fidx >= args.frames:
                break
            t = fidx  # production scans every frame incl. 0 (GT overwrites
            # frame 0's OUTPUT, but the state trajectory includes its step)
            state, idmap, diag = dbg_step(
                state, dm[j], de[j], sc[j], va[j], inp[j])
            d = {k: np.asarray(v) for k, v in diag.items()}
            # detector coverage of each GT object at frame t
            g = gt_small[t]                      # (K, mh/4, mw/4)
            dsm = dm_small_np[j]                 # (D, mh/4, mw/4)
            inter = np.minimum(g[:, None], dsm[None]).sum((2, 3))
            union = np.maximum(g[:, None], dsm[None]).sum((2, 3))
            cov = np.where(union > 0, inter / np.maximum(union, 1e-6), 0.0)
            cov = np.where(va_np[j][None, :], cov, 0.0)
            best_det = cov.argmax(1)
            rec = {"frame": t, "slots": []}
            k_alive = int(np.sum(gt_ids > 0))
            for s in range(k_alive):
                rec["slots"].append({
                    "obj": int(gt_ids[s]),
                    "score": round(float(d["score_after"][s]), 3),
                    "matched": bool(d["matched"][s]),
                    "midx": int(d["midx"][s]),
                    "w": round(float(d["w"][s]), 3),
                    "iou_m": round(float(d["iou_matched"][s]), 3),
                    "lost": bool(d.get("lost", np.zeros(16))[s]),
                    "rescued": bool(d.get("rescued", np.zeros(16))[s]),
                    "r_sim": round(float(d.get(
                        "rescue_sim", np.zeros(16))[s]), 3),
                    "r_rm": round(float(np.nan_to_num(d.get(
                        "rescue_row_margin", np.zeros(16))[s])), 3),
                    "r_cm": round(float(np.nan_to_num(d.get(
                        "rescue_col_margin", np.zeros(16))[s])), 3),
                    "r_mut": bool(d.get("rescue_mutual",
                                        np.zeros(16))[s]),
                    "cov_iou": round(float(cov[s, best_det[s]]), 3),
                    "cov_det": int(best_det[s]),
                    "cov_score": round(float(sc_np[j][best_det[s]]), 3),
                    "cov_free": bool(d.get(
                        "free", np.zeros(32, bool))[best_det[s]]),
                })
            nfree = int(np.sum(d.get("free", np.zeros(1, bool))))
            rec["n_free"] = nfree
            recs.append(rec)
            outf.write(json.dumps(rec) + "\n")
            fidx += 1
    outf.close()

    # compact table
    print(f"frame | per-slot: obj score m w iou_m lost resc r_sim r_rm "
          f"r_cm mut | cov_iou cov_score free", file=sys.stderr)
    for rec in recs:
        cells = []
        for s in rec["slots"]:
            cells.append(
                f"o{s['obj']}:sc{s['score']:.2f}"
                f"{' M' if s['matched'] else ' .'}w{s['w']:.2f}"
                f"{' L' if s['lost'] else '  '}"
                f"{'R' if s['rescued'] else ' '}"
                f" si{s['r_sim']:.2f}/{s['r_rm']:.2f}/{s['r_cm']:.2f}"
                f"{'m' if s['r_mut'] else ' '}"
                f" cv{s['cov_iou']:.2f}@{s['cov_score']:.2f}"
                f"{'F' if s['cov_free'] else ' '}")
        print(f"f{rec['frame']:3d} | " + " | ".join(cells),
              file=sys.stderr)


if __name__ == "__main__":
    main()
