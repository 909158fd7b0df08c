#!/usr/bin/env python
"""Full-pipeline VOS quality evaluation on held-out synthetic sequences.

The canonical quality protocol for this repo (no real DAVIS checkout
exists in the build environment — SURVEY.md §0): N held-out synthetic
480p sequences (seeds >= 1000, disjoint from every training seed used by
tools/train_propagation.py and the detector fine-tune), run through the
COMPLETE pipeline — detector, learned propagation, association, indexed
rendering — exactly as `tools/infer_vos.py` serves it, scored with
metrics/davis_jf.evaluate_sequence (J region IoU + F boundary).

Reference parity note: the reference scores with the official davis2017
evaluator on real DAVIS (SURVEY.md §2.2 "DAVIS eval"); this harness is
the same protocol on the synthetic stand-in, and switches to a real
checkout automatically when --davis-root is given.

Examples:
    # full pipeline, shipped checkpoints (the repo's headline number)
    PYTHONPATH=.:/root/.axon_site python tools/eval_quality.py \
        --ckpt zoo/detector_synthetic_bf16 --prop-ckpt zoo/prop_head_det

    # propagation isolated (association gated off by a 0.99 threshold)
    ... --isolate-propagation

    # association ablation: identity propagation
    ... --set vos.propagation=identity
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)

from common import base_parser, load_cfg  # noqa: E402


def main():
    p = base_parser("Held-out full-pipeline VOS quality (J&F)")
    p.add_argument("--prop-ckpt", default=None,
                   help="PropagationHead checkpoint; default "
                        "zoo/prop_head_det when vos.propagation=learned")
    p.add_argument("--seqs", type=int, default=10,
                   help="number of held-out sequences (seeds 1000..)")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--objects", type=int, default=3)
    p.add_argument("--seed0", type=int, default=1000)
    p.add_argument("--hardness", type=float, default=1.0,
                   help="curriculum hardness of the held-out sequences "
                        "(0 = the pre-r4 easy generator)")
    p.add_argument("--bench-config", action="store_true",
                   help="apply bench.py's throughput overrides verbatim "
                        "(vos.render_scale_den=2, yuv420_delta) so this "
                        "J&F describes the SAME configuration as the "
                        "recorded f/s (VERDICT r3 weak #2)")
    p.add_argument("--isolate-propagation", action="store_true",
                   help="disable association (score thresh 0.99) to "
                        "measure the propagation head alone")
    p.add_argument("--davis-root", default=None,
                   help="real DAVIS checkout: score --split sequences "
                        "instead of synthetic")
    p.add_argument("--split", default="val")
    p.add_argument("--diagnose", default=None, metavar="OUT.jsonl",
                   help="dump per-object per-frame J trajectories (host-"
                        "side, from the rendered id maps) so failures can "
                        "be attributed: an object whose J collapses at "
                        "frame k and stays down is drift/ID-switch; a "
                        "uniformly mediocre trajectory is mask quality")
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
    if args.isolate_propagation:
        overrides.append(("vos.assoc_score_thresh", 0.99))
    cfg = load_cfg(args, overrides)

    if not args.ckpt:
        args.ckpt = os.path.join(repo, "zoo", "detector_synthetic_bf16")
    if args.prop_ckpt is None and cfg.vos.propagation in (
            "learned", "flow_warp", "convgru"):
        args.prop_ckpt = os.path.join(repo, "zoo", "prop_head_det")

    import numpy as np

    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.vos import VOSEngine
    from vosdetectron_tpu.metrics.davis_jf import evaluate_sequence
    from vosdetectron_tpu.utils.checkpoint import load_params

    params = load_params(args.ckpt)
    params = __import__("jax").tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float32), params)
    prop_params = load_params(args.prop_ckpt) if args.prop_ckpt else None
    print(f"detector: {args.ckpt}", file=sys.stderr)
    print(f"prop head: {args.prop_ckpt} "
          f"(propagation={cfg.vos.propagation})", file=sys.stderr)

    eng = VOSEngine(cfg, params=params, rng=0, chunk=16,
                    prop_params=prop_params)

    if args.davis_root:
        from vosdetectron_tpu.data.davis import (DavisCatalog,
                                                 read_indexed_png)

        cat = DavisCatalog(args.davis_root)
        names = cat.split_sequences(args.split)
        cases = []
        for n in names:
            seq = cat.sequence(n)
            gts = [read_indexed_png(a) for a in seq.anno_paths]
            cases.append((n, seq.frame_paths, gts))
    else:
        cases = []
        for i in range(args.seqs):
            seed = args.seed0 + i
            frames, idmaps = make_synthetic_sequence(
                seed, num_frames=args.frames, size=(480, 854),
                num_objects=args.objects, hardness=args.hardness)
            cases.append((f"heldout_{seed}", frames, list(idmaps)))

    diag_f = open(args.diagnose, "w") if args.diagnose else None

    def diagnose(name, preds, gts):
        """Per-object per-frame J (region IoU only — cheap), plus the
        first frame each object's J dips below 0.5 ('lost_at')."""
        import json as _json

        from vosdetectron_tpu.metrics.davis_jf import mask_iou

        oids = sorted(int(i) for i in np.unique(gts[0]) if i != 0)
        per_obj = {}
        for oid in oids:
            js = [round(mask_iou(preds[t] == oid, gts[t] == oid), 3)
                  for t in range(1, len(gts))]
            lost = next((t + 1 for t, v in enumerate(js) if v < 0.5), None)
            recovered = (lost is not None
                         and any(v >= 0.5 for v in js[lost:]))
            per_obj[oid] = {"J_frames": js, "lost_at": lost,
                            "recovered": bool(recovered)}
        diag_f.write(_json.dumps({"seq": name, "objects": per_obj}) + "\n")
        diag_f.flush()
        for oid, d in per_obj.items():
            tag = (f"lost@{d['lost_at']}"
                   f"{'+recovered' if d['recovered'] else ''}"
                   if d["lost_at"] else "tracked")
            print(f"    obj {oid}: meanJ="
                  f"{float(np.mean(d['J_frames'])):.3f} {tag}",
                  file=sys.stderr, flush=True)

    rows = []
    for name, frames, gts in cases:
        if isinstance(frames, list):  # real checkout: file paths
            prepared = eng.prepare_sequence_from_files(frames, gts[0])
            preds = eng.run_sequence(None, prepared=prepared)
        else:
            preds = eng.run_sequence(frames, gts[0])
        res = evaluate_sequence(preds, gts)
        rows.append((name, res["J"], res["F"], res["J&F"]))
        print(f"{name:20s} J={res['J']:.3f} F={res['F']:.3f} "
              f"J&F={res['J&F']:.3f}", flush=True)
        if diag_f is not None:
            diagnose(name, preds, gts)
    if diag_f is not None:
        diag_f.close()

    mj = float(np.mean([r[1] for r in rows]))
    mf = float(np.mean([r[2] for r in rows]))
    mjf = float(np.mean([r[3] for r in rows]))
    print(f"{'MEAN':20s} J={mj:.3f} F={mf:.3f} J&F={mjf:.3f}")
    import json

    print(json.dumps({
        "protocol": {"seqs": len(rows), "frames": args.frames,
                     "hardness": args.hardness,
                     "bench_config": bool(args.bench_config),
                     "render_scale_den": cfg.vos.render_scale_den,
                     "upload_format": cfg.vos.upload_format},
        "J": round(mj, 4), "F": round(mf, 4), "JF": round(mjf, 4)}))


if __name__ == "__main__":
    main()
