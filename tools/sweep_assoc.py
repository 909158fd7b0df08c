#!/usr/bin/env python
"""Association-config sweep over shared, on-device detections.

Full-pipeline eval runs (tools/eval_quality.py) are the canonical
quality number, but they are a poor A/B instrument for ASSOCIATION
changes: detection dominates their runtime (re-run per config), and the
association trajectory is chaotically sensitive — a marginal rescue that
flips on epsilon-level numeric differences between runs masquerades as a
config effect (observed: the same HEAD config scored heldout_1009 obj1
at meanJ 0.03 in one run and a healthy recovery in another).

This tool removes both problems: per-frame detection outputs (det masks,
embeddings, scores, propagation inputs) are computed ONCE per sequence
and kept on device; each association variant then re-runs only the cheap
recurrence scan (propagate + associate + render, the Phase-B half of
engine/vos._scan_chunk) over the IDENTICAL detections. Variants differ
deterministically, and a 6-variant sweep costs one detection pass plus
six track-resolution scans.

    PYTHONPATH=.:/root/.axon_site python tools/sweep_assoc.py \
        --seqs 10 --variants '{"old": {"assoc_refresh_ramp": [0.0, 1e-6],
                                       "assoc_conf_relax": false}}'
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

# Default grid: attribute a quality delta to the r5 mechanisms
# (score-refresh ramp, anchor-gated confidence relax) and their
# parameters, against the pre-r5 behavior ("old").
DEFAULT_VARIANTS = {
    "head": {},
    "old": {"assoc_refresh_ramp": (0.0, 1e-6), "assoc_conf_relax": False},
    "ramp_only": {"assoc_conf_relax": False},
    "relax_only": {"assoc_refresh_ramp": (0.0, 1e-6)},
    "ramp_mild": {"assoc_refresh_ramp": (0.08, 0.3),
                  "assoc_conf_relax": False},
}


def main():
    p = base_parser("Association-variant sweep on shared detections")
    p.add_argument("--prop-ckpt", default=None)
    p.add_argument("--seqs", type=int, default=10)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--objects", type=int, default=3)
    p.add_argument("--seed0", type=int, default=1000)
    p.add_argument("--hardness", type=float, default=1.0)
    p.add_argument("--variants", default=None,
                   help="JSON {name: {vos_field: value}}; default grid "
                        "ablates the r5 mechanisms")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # exact bench config (tools/eval_quality.py --bench-config)
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
        ("vos.render_scale_den", 2),
        ("vos.upload_format", "yuv420_delta"),
    ]
    cfg = load_cfg(args, overrides)
    if not args.ckpt:
        args.ckpt = os.path.join(repo, "zoo", "detector_synthetic_bf16")
    if args.prop_ckpt is None:
        args.prop_ckpt = os.path.join(repo, "zoo", "prop_head_det")

    variants = (json.loads(args.variants) if args.variants
                else DEFAULT_VARIANTS)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vosdetectron_tpu.config import apply_overrides
    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.vos import VOSEngine, _unpack_ids4, \
        _pack_ids4
    from vosdetectron_tpu.metrics.davis_jf import evaluate_sequence
    from vosdetectron_tpu.models.propagation import (associate_and_update,
                                                     render_indexed,
                                                     render_indexed_pallas)
    from vosdetectron_tpu.utils.checkpoint import load_params

    params = load_params(args.ckpt)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float32), params)
    prop_params = load_params(args.prop_ckpt)
    eng = VOSEngine(cfg, params=params, rng=0, chunk=16,
                    prop_params=prop_params)

    den = max(cfg.vos.render_scale_den, 1)
    ph, pw = cfg.test.padded_image_size
    out_hw = (ph // den, pw // den)

    # ---- per-sequence: one detection pass, then every variant's
    # recurrence over the SAME on-device detections. Holding all
    # sequences' detections at once OOMs the 16 GB HBM (~450 MB/seq of
    # det masks + prop inputs next to the detector params), so the
    # sequence loop is outermost and each sequence's buffers are freed
    # before the next detection pass.
    pack = None

    # ---- per-variant recurrence scan (Phase B of _scan_chunk)
    def make_recur(cfg_v):
        render = (render_indexed_pallas if cfg_v.vos.use_pallas_render
                  else render_indexed)

        @jax.jit
        def recur(state, dm, de, sc, va, inp):
            def step(st, x):
                dmf, def_, scf, vaf, inpf = x
                prop = eng.prop_head.apply({"params": eng.prop_params},
                                           st.pfeat, inpf, st.masks)
                propagated = jnp.where(st.alive[:, None, None], prop,
                                       st.masks)
                st = associate_and_update(cfg_v, st, dmf, def_, scf, vaf,
                                          propagated)
                st = st._replace(pfeat=inpf)
                idmap = render(st, out_hw, cfg_v.mrcnn.thresh_binarize)
                return st, idmap.astype(jnp.uint8)

            st, ids = jax.lax.scan(step, state, (dm, de, sc, va, inp))
            return st, (_pack_ids4(ids) if pack else ids)

        return recur

    recurs = {}
    for name, vover in variants.items():
        cfg_v = apply_overrides(
            cfg, [(f"vos.{k}", tuple(v) if isinstance(v, list) else v)
                  for k, v in vover.items()]).validate()
        recurs[name] = make_recur(cfg_v)

    per_variant = {name: [] for name in variants}
    for i in range(args.seqs):
        seed = args.seed0 + i
        frames, idmaps = make_synthetic_sequence(
            seed, num_frames=args.frames, size=(480, 854),
            num_objects=args.objects, hardness=args.hardness)
        pseq = eng.prepare_sequence(frames, idmaps[0])
        if pack is None:
            pack = eng._pack_gate(pseq.first_frame_gt, out_hw)
        chunks, base = [], None
        for fut in pseq.chunk_futs:
            buf = eng._resolve_chunk(fut.result(), base)
            base = buf[-1]
            chunks.append(eng._detect_chunk(
                eng.params, buf, pseq.scale, eng.prop_params,
                (pseq.h0, pseq.w0)))
        del buf, base
        nh = int(round(pseq.h0 * pseq.scale))
        nw = int(round(pseq.w0 * pseq.scale))
        for name, recur in recurs.items():
            state = pseq.state
            downloads = []
            for det in chunks:
                state, ids = recur(state, *det)
                downloads.append(eng._down_pool.submit(
                    lambda a: _unpack_ids4(np.asarray(a)) if pack
                    else np.asarray(a), ids))
            idm = np.concatenate([f.result() for f in downloads]
                                 )[:args.frames]
            preds = []
            for fr in range(args.frames):
                m = idm[fr][:nh // den, :nw // den].astype(np.uint8)
                preds.append(cv2.resize(m, (pseq.w0, pseq.h0),
                                        interpolation=cv2.INTER_NEAREST))
            preds[0] = pseq.first_frame_gt.astype(np.uint8)
            res = evaluate_sequence(preds, list(idmaps))
            per_variant[name].append((seed, res["J&F"]))
            print(f"  [{name}] {seed}: J&F={res['J&F']:.3f}",
                  file=sys.stderr, flush=True)
        del chunks, pseq

    results = {}
    for name, rows in per_variant.items():
        mean = float(np.mean([r[1] for r in rows]))
        results[name] = {"mean_JF": round(mean, 4),
                         "per_seq": {str(k): round(v, 4)
                                     for k, v in rows}}
        print(f"[{name}] MEAN J&F = {mean:.4f}", flush=True)

    print(json.dumps(results))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
