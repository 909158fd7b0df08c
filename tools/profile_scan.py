#!/usr/bin/env python
"""Phase profile of the device scan (_scan_chunk) on the real chip.

bench_pipeline.py proves WHERE the e2e frames/sec go between stages
(decode / upload / scan / export); this tool decomposes the scan stage
itself — the pure-device ceiling — into its phases, each timed as its
own jitted program with a real completion barrier (a reduced-scalar
download; block_until_ready can return early on this backend):

  unpack      packed yuv420 -> BGR f32 frames
  preprocess  resize + normalize + pad to the static detect shape
  backbone    trunk + FPN feature extraction (the conv FLOPs)
  rpn+post    RPN forward + traced proposal path + box decode/NMS
  mask        mask branch on the final detections
  lowres      det mask paste to track grid + embeddings + prop inputs
  recurrence  the per-frame lax.scan (propagate + associate + render)
  full scan   _scan_chunk as the engine runs it (for cross-checking:
              phases are timed as separate programs, so their sum
              exceeds the fused full-scan time by the un-fused
              intermediate materialization)

Phase timings of separate programs bound, not equal, the fused cost —
XLA fuses across phase boundaries inside _scan_chunk — but they rank
the phases and size the headroom.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)


def main():
    import numpy as np

    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.data.davis import (DavisCatalog,
                                             materialize_synthetic_davis,
                                             read_indexed_png)
    from vosdetectron_tpu.engine.vos import VOSEngine

    import tempfile

    davis_root = os.path.join(tempfile.gettempdir(), "synthetic_davis_bench")
    if not os.path.isdir(os.path.join(davis_root, "JPEGImages")):
        materialize_synthetic_davis(
            davis_root, {"bench_a": 0, "bench_b": 1}, num_frames=64,
            size=(480, 854), num_objects=3)

    from bench import load_detector_params

    overrides = [
        ("model.num_classes", 2),
        ("test.scale", 480), ("test.max_size", 864),
        ("test.padded_image_size", (512, 896)),
        ("test.detections_per_im", 32),
        ("rpn.post_nms_top_n_test", 300),
        ("rpn.min_size", 4.0),
        ("fast_rcnn.roi_xform_method", "roi_align_pallas"),
        ("vos.render_scale_den", 2),
        ("data.davis_root", davis_root),
    ]
    params, desc = load_detector_params()
    if params is not None:
        overrides.append(("data.pixel_stds", (57.375, 57.12, 58.395)))
    print(f"weights: {desc}", file=sys.stderr)

    # Learned propagation head, exactly as bench.py runs it — the phase
    # table must describe the SHIPPED configuration (profiling identity
    # propagation would understate the recurrence phase).
    prop_params = None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prop_dir = os.path.join(repo, "zoo", "prop_head_det")
    if (params is not None and os.path.isdir(prop_dir)
            and os.environ.get("PROFILE_PROP", "1") != "0"):
        from vosdetectron_tpu.utils.checkpoint import load_params

        prop_params = load_params(prop_dir)
        overrides.append(("vos.propagation", "learned"))
        print(f"propagation: learned ({prop_dir})", file=sys.stderr)
    cfg = apply_overrides(Config(), overrides).validate()

    import jax
    import jax.numpy as jnp

    from vosdetectron_tpu.engine.inference import (postprocess_boxes,
                                                   select_class_masks)
    from vosdetectron_tpu.models.generalized_rcnn import GeneralizedRCNN

    eng = VOSEngine(cfg, params=params, rng=0, chunk=16,
                    prop_params=prop_params)
    dev = jax.devices()[0]

    cat = DavisCatalog(davis_root)
    seq = cat.sequence(cat.split_sequences("val")[0])
    gt0 = read_indexed_png(seq.anno_paths[0])
    prepared = eng.prepare_sequence_from_files(seq.frame_paths, gt0)
    # one resolved packed chunk, committed on device (chunk 1 may be
    # chain-delta-coded off chunk 0's last frame — resolve in order)
    buf0 = eng._resolve_chunk(prepared.chunk_futs[0].result())
    buf = eng._resolve_chunk(prepared.chunk_futs[1].result(), buf0[-1])
    buf = jax.device_put(np.asarray(buf), dev)
    scale = prepared.scale
    src_hw = (prepared.h0, prepared.w0)
    rden = max(cfg.vos.render_scale_den, 1)
    ph, pw = cfg.test.padded_image_size
    out_hw = (ph // rden, pw // rden)
    state0 = prepared.state

    take1 = jax.jit(lambda a: jnp.asarray(
        jax.tree_util.tree_leaves(a)[0]).ravel()[0])

    def bench_fn(fn, *args, reps=8):
        out = fn(*args)
        np.asarray(take1(out))          # compile + warm
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(take1(out))          # real barrier
        return (time.time() - t0) / reps, out

    model, p = eng.model, eng.params
    C = eng.chunk

    # ---- phases as separate jitted programs
    @jax.jit
    def f_unpack(b):
        return eng._frames_to_bgr(b, src_hw)

    @jax.jit
    def f_pre(frames_f32):
        return jax.vmap(lambda f: eng._preprocess(f, scale))(frames_f32)

    @jax.jit
    def f_backbone(imgs):
        return model.apply({"params": p}, imgs,
                           method=GeneralizedRCNN.extract_feats)

    @jax.jit
    def f_rpn_post(imgs, hws):
        out = model.apply({"params": p}, imgs, hws)
        dets = postprocess_boxes(out, hws, cfg,
                                 candidate_topk=min(
                                     1000, out.cls_scores.shape[1]
                                     * max(out.cls_scores.shape[2] - 1, 1)))
        return dets

    @jax.jit
    def f_mask(feats, dets):
        ml = model.apply({"params": p}, feats, dets.boxes,
                         method=GeneralizedRCNN.mask_branch)
        return select_class_masks(ml, dets.classes)

    @jax.jit
    def f_lowres(dets, masks, feats, imgs):
        from vosdetectron_tpu.models.propagation import reid_embedding

        det_masks_lr = jax.vmap(eng._det_lowres)(dets.boxes, masks)
        feat = feats[1] if cfg.fpn.enabled else feats[0]
        mh, mw = cfg.vos.track_mask_size
        feat_lr = jax.vmap(lambda f: jax.image.resize(
            f.astype(jnp.bfloat16), (mh, mw, f.shape[-1]), "linear"
        ).astype(jnp.float32))(feat)
        if cfg.vos.emb_mode == "centered_color":
            stds = jnp.asarray(cfg.data.pixel_stds, jnp.float32)
            img_lr = jax.vmap(lambda im: jax.image.resize(
                im, (mh, mw, 3), "linear"))(imgs) * stds
            det_emb = jax.vmap(lambda f, m, im: reid_embedding(
                cfg, f, m, im))(feat_lr, det_masks_lr, img_lr)
        else:
            det_emb = jax.vmap(lambda f, m: reid_embedding(
                cfg, f, m))(feat_lr, det_masks_lr)
        return det_masks_lr, det_emb

    @jax.jit
    def f_detect(b):
        return eng._detect_chunk(p, b, scale, eng.prop_params, src_hw)

    @jax.jit
    def f_recurrence(st, per_frame):
        from vosdetectron_tpu.models.propagation import (
            associate_and_update, propagate_identity, render_indexed,
            render_indexed_pallas)
        render = (render_indexed_pallas if cfg.vos.use_pallas_render
                  else render_indexed)

        def step(s, x):
            if eng.learned_prop:
                dm, de, sc, va, inp = x
                prop = eng.prop_head.apply({"params": eng.prop_params},
                                           s.pfeat, inp, s.masks)
                propagated = jnp.where(s.alive[:, None, None], prop, s.masks)
            else:
                dm, de, sc, va = x
                propagated = propagate_identity(s)
            s = associate_and_update(cfg, s, dm, de, sc, va, propagated)
            if eng.learned_prop:
                s = s._replace(pfeat=inp)
            return s, render(s, out_hw, cfg.mrcnn.thresh_binarize
                             ).astype(jnp.uint8)
        return jax.lax.scan(step, st, per_frame)

    rows = []
    t, frames_f32 = bench_fn(f_unpack, buf)
    rows.append(("unpack yuv420->bgr", t))
    t, (imgs, hws) = bench_fn(f_pre, frames_f32)
    rows.append(("preprocess/resize/pad", t))
    t, feats = bench_fn(f_backbone, imgs)
    rows.append(("backbone trunk+fpn", t))
    t, dets = bench_fn(f_rpn_post, imgs, hws)
    rows.append(("trunk+rpn+postprocess", t))
    t, masks = bench_fn(f_mask, feats, dets)
    rows.append(("mask branch", t))
    t, (dm_lr, de) = bench_fn(f_lowres, dets, masks, feats, imgs)
    rows.append(("lowres paste+embed", t))
    t, det_out = bench_fn(f_detect, buf)
    rows.append(("detect_chunk (fused A)", t))
    per_frame = det_out[:4] + ((det_out[4],) if eng.learned_prop else ())
    t, _ = bench_fn(f_recurrence, state0, per_frame)
    rows.append(("recurrence scan (B)", t))

    pack = eng._pack_gate(gt0, out_hw)

    def f_full(st, b):
        return eng._scan_chunk(p, st, scale, out_hw, b, eng.prop_params,
                               src_hw, pack)
    t_full, _ = bench_fn(f_full, state0, buf)
    rows.append(("full _scan_chunk", t_full))

    print(f"{'phase':26s} {'ms/chunk':>9s} {'ms/frame':>9s} {'f/s':>7s}")
    for name, tt in rows:
        print(f"{name:26s} {tt * 1e3:9.1f} {tt * 1e3 / C:9.2f} "
              f"{C / tt:7.1f}")

    # ---- MFU: exact program FLOPs (XLA cost analysis of the fused scan)
    # against the measured rate. v5e bf16 peak ~394 TFLOP/s/chip.
    try:
        lowered = jax.jit(
            lambda st, b: eng._scan_chunk.__wrapped__(
                eng, p, st, scale, out_hw, b, eng.prop_params, src_hw,
                pack)).lower(state0, buf)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            gf_frame = flops / C / 1e9
            tfs = flops / t_full / 1e12
            peak = float(os.environ.get("TPU_PEAK_TFLOPS", "394"))
            print(f"program flops: {gf_frame:.1f} GF/frame; sustained "
                  f"{tfs:.1f} TF/s = {100 * tfs / peak:.1f}% MFU "
                  f"(peak {peak:.0f} bf16 TF/s)")
    except Exception as e:  # cost analysis is best-effort diagnostics
        print(f"cost_analysis unavailable: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
