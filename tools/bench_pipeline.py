#!/usr/bin/env python
"""Pipeline microbenchmark: decompose the VOS e2e throughput into its
stages so the binding constraint is measurable, not guessed
(VERDICT r2 #1: prove where the frames/sec go).

Stages measured independently over the same 480p chunks:
  decode      — JPEG read + BGR decode via cv2 (host, per frame)
  native dec  — JPEG file -> packed yuv420 via native/jpegdec.cpp
                (the path run_davis_dataset/bench.py actually use)
  pack        — BGR -> packed yuv420 buffer (host; cv2 fallback path)
  upload      — device_put of packed chunks, N streams (tunnel bandwidth)
  scan        — _scan_chunk on PRE-UPLOADED chunks (pure device rate)
  png export  — indexed-PNG writes of the predictions (off critical path
                in the engine, measured for completeness)
  e2e         — the composed pipeline (prepare_sequence_from_files +
                run_sequence, i.e. the native-decode route)

The e2e ceiling is min(scan, upload, decode+pack serialized on this host's
cores); if e2e ~= that ceiling the pipeline is lossless and the residual
gap to the 60 f/s target is the stage's irreducible cost on this host.
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
                                             read_image_bgr,
                                             read_indexed_png)
    from vosdetectron_tpu.engine.vos import VOSEngine, _to_yuv420_packed

    import tempfile

    davis_root = os.environ.get("DAVIS_ROOT", "")
    if not davis_root or not os.path.isdir(davis_root):
        davis_root = os.path.join(tempfile.gettempdir(),
                                  "synthetic_davis_bench")
        if not os.path.isdir(os.path.join(davis_root, "JPEGImages")):
            materialize_synthetic_davis(
                davis_root, {"bench_a": 0, "bench_b": 1}, num_frames=64,
                size=(480, 854), num_objects=3)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
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
        ("vos.upload_format", "yuv420_delta"),  # as bench.py runs it
        ("data.davis_root", davis_root),
    ]
    params, desc = load_detector_params()
    if params is not None:
        overrides.append(("data.pixel_stds", (57.375, 57.12, 58.395)))
    print(f"weights: {desc}", file=sys.stderr)
    cfg = apply_overrides(Config(), overrides).validate()

    import jax

    eng = VOSEngine(cfg, params=params, rng=0, chunk=16)
    device = jax.devices()[0]

    cat = DavisCatalog(davis_root)
    seq = cat.sequence(cat.split_sequences("val")[0])
    paths = seq.frame_paths

    # ---- decode (cv2 BGR route)
    t0 = time.time()
    frames = np.stack([read_image_bgr(p) for p in paths])
    t_decode = time.time() - t0
    t, h0, w0, _ = frames.shape
    chunks = frames[: (t // 16) * 16].reshape(-1, 16, h0, w0, 3)

    # ---- native decode (jpeg -> packed yuv420, the production path)
    from vosdetectron_tpu.native import jpegdec

    t_native = None
    probe = jpegdec.probe_file(paths[0])
    if probe is not None and probe[2]:
        nbuf = np.empty(jpegdec.packed_size(h0, w0), np.uint8)
        jpegdec.read_packed_into(paths[0], nbuf)  # warm (builds the .so)
        t0 = time.time()
        for p in paths:
            jpegdec.read_packed_into(p, nbuf)
        t_native = time.time() - t0

    # ---- pack (yuv420)
    t0 = time.time()
    packed = [_to_yuv420_packed(c) for c in chunks]
    t_pack = time.time() - t0

    # ---- delta encode (lossless temporal coding, bench.py's upload mode;
    # chunks after the first chain off the previous chunk's last frame,
    # exactly as prepare_sequence encodes them)
    from vosdetectron_tpu.engine.vos import _delta_encode_chunk

    def encode(i, p):
        # mirror _upload_packed's fallback chain: chained -> self-contained
        # delta -> full chunk (counting the full chunk when only the
        # CHAINED encode fails would overstate the bytes on
        # boundary-dense content)
        enc = _delta_encode_chunk(
            p, cfg.vos.delta_block,
            base=packed[i - 1][-1] if i > 0 else None)
        if enc is None and i > 0:
            enc = _delta_encode_chunk(p, cfg.vos.delta_block)
        return enc

    t0 = time.time()
    encs = [encode(i, p) for i, p in enumerate(packed)]
    t_delta = time.time() - t0
    delta_bytes = sum(
        ((0 if e[0] is None else e[0].nbytes) + e[1].nbytes + e[2].nbytes)
        if e is not None else p.nbytes for e, p in zip(encs, packed))

    # ---- upload: N streams, M reps; measure sustained bandwidth
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as _jnp

    take1 = jax.jit(lambda a: a.ravel()[0].astype(_jnp.float32))

    def real_sync(x):
        # block_until_ready can return before device work completes on
        # this backend; only a downloaded reduced scalar is a barrier.
        return np.asarray(take1(x))

    nbytes = sum(p.nbytes for p in packed)
    pool = ThreadPoolExecutor(max_workers=cfg.vos.upload_streams)
    # warm the transfer path
    real_sync(jax.device_put(packed[0], device))
    reps = 4
    t0 = time.time()
    for _ in range(reps):
        futs = [pool.submit(jax.device_put, p, device) for p in packed]
        bufs = [f.result() for f in futs]
        for b in bufs:
            real_sync(b)
    t_upload = (time.time() - t0) / reps

    # ---- scan on pre-uploaded chunks
    gt0 = read_indexed_png(seq.anno_paths[0])
    scale = eng._output_scale(h0, w0)
    gt_lr, obj_ids = eng._gt_to_track_masks(gt0, scale)
    import jax.numpy as jnp

    state = eng._init_state(eng.params, jnp.asarray(frames[0]),
                            jnp.asarray(gt_lr), scale,
                            jnp.asarray(obj_ids), eng.prop_params)
    state = jax.device_put(state, device)
    den = max(cfg.vos.render_scale_den, 1)
    ph, pw = cfg.test.padded_image_size
    out_hw = (ph // den, pw // den)
    # warm compile
    st, ids = eng._scan_chunk(eng.params, state, scale, out_hw, bufs[0],
                              eng.prop_params, (h0, w0))
    real_sync(ids)
    n_scan_frames = len(bufs) * 16 * reps
    t0 = time.time()
    st = state
    for _ in range(reps):
        for b in bufs:
            st, ids = eng._scan_chunk(eng.params, st, scale, out_hw, b,
                                      eng.prop_params, (h0, w0))
    real_sync(ids)
    t_scan = time.time() - t0

    # ---- e2e (composed, native-decode route as bench.py runs it)
    t0 = time.time()
    prepared = eng.prepare_sequence_from_files(paths, gt0)
    preds = eng.run_sequence(None, prepared=prepared)
    t_e2e = time.time() - t0

    # ---- png export of the predictions
    from vosdetectron_tpu.data.davis import write_sequence_pngs

    png_dir = os.path.join(tempfile.gettempdir(), "bench_png_export")
    t0 = time.time()
    write_sequence_pngs(png_dir, preds)
    t_png = time.time() - t0

    n = chunks.shape[0] * 16
    mbps = nbytes / t_upload / 2**20
    rows = [
        ("decode (cv2 BGR)", t / t_decode),
        ("pack (BGR->yuv420)", t / t_pack),
        ("delta encode", n / t_delta),
        (f"upload ({mbps:.0f} MB/s)", n / t_upload),
        ("scan (device only)", n_scan_frames / t_scan),
        ("png export", len(preds) / t_png),
        ("e2e native run_sequence", len(preds) / t_e2e),
    ]
    if t_native is not None:
        rows.insert(1, ("native decode (jpeg->yuv)", t / t_native))
    print(f"{'stage':28s} frames/sec")
    for name, v in rows:
        print(f"{name:28s} {v:8.1f}")
    bytes_per_frame = nbytes / n
    delta_per_frame = delta_bytes / n
    print(f"bytes/frame (yuv420): {bytes_per_frame/1024:.0f} KiB; "
          f"delta-coded: {delta_per_frame/1024:.0f} KiB "
          f"({bytes_per_frame/delta_per_frame:.2f}x)")
    print(f"upload-bound ceiling at this bandwidth: "
          f"{mbps * 2**20 / bytes_per_frame:.1f} f/s full, "
          f"{mbps * 2**20 / delta_per_frame:.1f} f/s delta")


if __name__ == "__main__":
    main()
