#!/usr/bin/env python
"""Per-frame serving latency of OnlineVOS.step on the real chip
(VERDICT r3 #5).

The offline engine's chunked throughput says nothing about the per-frame
path's latency; this tool drives OnlineVOS exactly as a live-video server
would — start() with the first frame + GT, then step(frame) one frame at
a time — and reports p50/p95/p99 wall-clock ms/frame. Each step() ends
with a real device->host download of the id map (np.asarray), so the
wall clock is an honest completion barrier (block_until_ready lies on
this backend — see .claude/skills/verify/SKILL.md); the measured number
includes the host-side pack, the upload, the compiled step, and the
download: true serving latency.

    PYTHONPATH=.:/root/.axon_site python tools/bench_latency.py \
        --ckpt zoo/detector_synthetic_bf16 --prop-ckpt zoo/prop_head_det
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_axon = "/root/.axon_site"
if os.path.isdir(_axon) and _axon not in sys.path:
    sys.path.append(_axon)

from common import base_parser, load_cfg  # noqa: E402


def main():
    p = base_parser("OnlineVOS per-frame serving latency")
    p.add_argument("--prop-ckpt", default=None,
                   help="PropagationHead checkpoint; default "
                        "zoo/prop_head_det when vos.propagation=learned")
    p.add_argument("--frames", type=int, default=96,
                   help="timed frames (after warmup)")
    p.add_argument("--warmup", type=int, default=8)
    p.add_argument("--hardness", type=float, default=0.0,
                   help="content hardness of the synthetic sequence")
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
        ("vos.render_scale_den", 2),
        ("data.pixel_stds", (57.375, 57.12, 58.395)),
        ("vos.propagation", "learned"),
    ]
    cfg = load_cfg(args, overrides)

    if not args.ckpt:
        args.ckpt = os.path.join(repo, "zoo", "detector_synthetic_bf16")
    if args.prop_ckpt is None and cfg.vos.propagation in (
            "learned", "flow_warp", "convgru"):
        args.prop_ckpt = os.path.join(repo, "zoo", "prop_head_det")

    import json

    import numpy as np

    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.vos import OnlineVOS, VOSEngine
    from vosdetectron_tpu.utils.checkpoint import load_params

    params = load_params(args.ckpt)
    params = __import__("jax").tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float32), params)
    prop_params = load_params(args.prop_ckpt) if args.prop_ckpt else None
    print(f"detector: {args.ckpt}", file=sys.stderr)
    print(f"prop head: {args.prop_ckpt}", file=sys.stderr)

    # chunk=1: OnlineVOS drives _scan_chunk with single-frame buffers
    eng = VOSEngine(cfg, params=params, rng=0, chunk=1,
                    prop_params=prop_params)
    online = OnlineVOS(eng)

    n = args.warmup + args.frames
    frames, idmaps = make_synthetic_sequence(
        1000, num_frames=n + 1, size=(480, 854), num_objects=3,
        hardness=args.hardness)

    online.start(frames[0], idmaps[0])
    for t in range(1, args.warmup + 1):   # compile + cache warm
        online.step(frames[t])

    lat = []
    for t in range(args.warmup + 1, n + 1):
        t0 = time.perf_counter()
        online.step(frames[t])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)

    row = {
        "metric": "online_vos_step_latency",
        "unit": "ms/frame",
        "frames": int(lat.size),
        "p50": round(float(np.percentile(lat, 50)), 1),
        "p95": round(float(np.percentile(lat, 95)), 1),
        "p99": round(float(np.percentile(lat, 99)), 1),
        "mean": round(float(lat.mean()), 1),
        "fps_at_p50": round(1e3 / float(np.percentile(lat, 50)), 1),
        "hardness": args.hardness,
    }
    print(f"latency ms/frame: p50={row['p50']} p95={row['p95']} "
          f"p99={row['p99']} mean={row['mean']} "
          f"(~{row['fps_at_p50']} f/s at p50)", file=sys.stderr)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
