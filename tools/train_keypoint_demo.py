"""Keypoint R-CNN end-to-end learning demo (reference analogue: the
keypoint branch of tools/train_net_step.py + test_net.py on person
keypoints; here on synthetic data since no COCO is mountable offline).

Trains the keypoint head (trunk warm-started from the shipped detector)
on synthetic ellipse frames whose keypoints are derived from the
instance masks (center/top/bottom/left/right extremes), then reports
held-out OKS AP through the full Detector + CocoEvaluator path.

Measured on the real chip (2026-08-17, 900 steps, ~30 min):
keypoint loss 8.05 (= log 56*56 uniform) -> 2.57, held-out
OKS AP 0.187 / AP50 0.455 (random init scores ~0).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.data.davis import (DavisCatalog, read_image_bgr,
                                         read_indexed_png,
                                         materialize_synthetic_davis)
from vosdetectron_tpu.engine.train import Trainer
from vosdetectron_tpu.engine.inference import Detector, preprocess_np
from vosdetectron_tpu.models.targets import GroundTruth
from vosdetectron_tpu.metrics.coco_eval import CocoEvaluator

ROOT = os.environ.get("KP_DEMO_ROOT", "/tmp/synthetic_davis_kp")
NK = 5  # center, top, bottom, left, right

def kps_from_idmap(idmap, oid):
    ys, xs = np.nonzero(idmap == oid)
    if len(ys) == 0:
        return None
    cy, cx = ys.mean(), xs.mean()
    t = ys.argmin(); b = ys.argmax(); l = xs.argmin(); r = xs.argmax()
    pts = [(cx, cy), (xs[t], ys[t]), (xs[b], ys[b]), (xs[l], ys[l]), (xs[r], ys[r])]
    return np.asarray([[x, y, 2.0] for x, y in pts], np.float32)

def load_frame(cat, seq, t, cfg, train=True):
    s = cat.sequence(seq)
    im = read_image_bgr(s.frame_paths[t])
    idmap = read_indexed_png(s.anno_paths[t])
    scale_t = cfg.train.scales[0] if train else cfg.test.scale
    maxs = cfg.train.max_size if train else cfg.test.max_size
    pad = cfg.train.padded_image_size if train else cfg.test.padded_image_size
    padded, hw, sc = preprocess_np(im, scale_t, maxs, pad,
                                   cfg.data.pixel_means, cfg.data.pixel_stds)
    g = cfg.train.max_gt_instances
    ph, pw = cfg.train.padded_image_size
    boxes = np.zeros((g, 4), np.float32)
    classes = np.zeros((g,), np.int32)
    masks = np.zeros((g, ph // 4, pw // 4), np.float32)
    valid = np.zeros((g,), bool)
    kps = np.zeros((g, NK, 3), np.float32)
    oids = [o for o in np.unique(idmap) if o != 0][:g]
    import cv2
    for i, oid in enumerate(oids):
        m = (idmap == oid)
        ys, xs = np.nonzero(m)
        boxes[i] = (xs.min() * sc, ys.min() * sc, xs.max() * sc, ys.max() * sc)
        classes[i] = 1
        valid[i] = True
        mm = cv2.resize(m.astype(np.float32), (pw // 4, ph // 4))
        masks[i] = mm
        kp = kps_from_idmap(idmap, oid)
        kp[:, :2] *= sc
        kps[i] = kp
    return padded, hw, dict(boxes=boxes, classes=classes, masks=masks,
                            valid=valid, keypoints=kps), im, idmap, sc

def main():
    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2), ("model.keypoint_on", True),
        ("krcnn.num_keypoints", NK), ("krcnn.conv_layers", 4),
        ("krcnn.dim", 128),
        ("train.scales", (480,)), ("train.max_size", 864),
        ("train.padded_image_size", (512, 896)),
        ("train.max_gt_instances", 4), ("train.ims_per_batch", 2),
        ("test.scale", 480), ("test.max_size", 864),
        ("test.padded_image_size", (512, 896)),
        ("test.detections_per_im", 8),
        ("rpn.post_nms_top_n_test", 300), ("rpn.min_size", 4.0),
        ("fast_rcnn.roi_xform_method", "roi_align_pallas"),
        ("data.pixel_stds", (57.375, 57.12, 58.395)),
        ("solver.base_lr", 0.0025), ("solver.warm_up_iters", 100),
        ("solver.steps", (0, 600)), ("solver.max_iter", 900),
    ]).validate()

    # warm-start the shared trunk from the detector ckpt (keypoint head fresh)
    from vosdetectron_tpu.utils.checkpoint import load_params
    from vosdetectron_tpu.zoo.torch_import import merge_params  # noqa: F401
    trainer = Trainer(cfg, rng=0)
    try:
        det_params = load_params("/root/repo/zoo/detector_synthetic_bf16")
        base = jax.device_get(trainer.state.params)
        for k in base:
            if k in det_params and k != "keypoint_head":
                base[k] = jax.tree_util.tree_map(
                    lambda t, x: np.asarray(x, np.float32 if t.dtype == jnp.float32 else t.dtype),
                    base[k], jax.device_get(det_params[k]))
        from vosdetectron_tpu.engine.train import TrainState
        trainer.state = TrainState(trainer.state.step, jax.device_put(base),
                                   trainer.tx.init(jax.device_put(base)))
        print("warm-started trunk from detector_synthetic_bf16", flush=True)
    except Exception as e:
        print("warm start failed:", e, flush=True)

    if not os.path.isdir(os.path.join(ROOT, "JPEGImages")):
        materialize_synthetic_davis(
            ROOT, {f"train_{i}": i for i in range(4)}
                  | {f"val_{i}": 100 + i for i in range(3)},
            num_frames=64, size=(480, 854), num_objects=3)
    cat = DavisCatalog(ROOT)
    train_seqs = cat.split_sequences("train")
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for step in range(cfg.solver.max_iter):
        ims, hws, gts = [], [], []
        for _ in range(cfg.train.ims_per_batch):
            seq = train_seqs[rng.randint(len(train_seqs))]
            t = rng.randint(64)
            p, hw, gt, *_ = load_frame(cat, seq, t, cfg, train=True)
            ims.append(p); hws.append(hw); gts.append(gt)
        gt = GroundTruth(
            jnp.asarray(np.stack([g["boxes"] for g in gts])),
            jnp.asarray(np.stack([g["classes"] for g in gts])),
            jnp.asarray(np.stack([g["masks"] for g in gts])),
            jnp.asarray(np.stack([g["valid"] for g in gts])),
            jnp.asarray(np.stack([g["keypoints"] for g in gts])))
        key, sub = jax.random.split(key)
        losses = trainer.train_step(sub, jnp.asarray(np.stack(ims)),
                                    jnp.asarray(np.stack(hws)), gt)
        if step % 50 == 0 or step == cfg.solver.max_iter - 1:
            ls = {k: round(float(v), 4) for k, v in losses.items()}
            print(f"[{step}] {ls} ({time.time()-t0:.0f}s)", flush=True)

    # eval OKS AP on held-out val frames
    det = Detector(cfg, params=trainer.state.params)
    ev = CocoEvaluator(iou_type="keypoints")
    for seq in cat.split_sequences("val"):
        for t in range(0, 64, 8):
            p, hw, gt, im, idmap, sc = load_frame(cat, seq, t, cfg, train=False)
            out = det.detect(jnp.asarray(p[None]), jnp.asarray(hw[None]))
            v = np.asarray(out.valid[0])
            dk = np.asarray(out.keypoints[0])[v].copy(); dk[:, :, :2] /= sc
            db = np.asarray(out.boxes[0])[v] / sc
            ds = np.asarray(out.scores[0])[v]
            dc = np.asarray(out.classes[0])[v]
            oids = [o for o in np.unique(idmap) if o != 0]
            gb, gk = [], []
            for oid in oids:
                ys, xs = np.nonzero(idmap == oid)
                gb.append([xs.min(), ys.min(), xs.max(), ys.max()])
                gk.append(kps_from_idmap(idmap, oid))
            gb = np.asarray(gb, np.float32).reshape(-1, 4)
            gk = np.stack(gk) if gk else np.zeros((0, NK, 3), np.float32)
            ga = np.asarray([(idmap == o).sum() for o in oids], np.float64)
            ev.add_image(db, ds, dc, gb, np.ones(len(gb), np.int32),
                         det_kps=dk, gt_kps=gk, gt_areas=ga)
    s = ev.summarize()
    print({k: round(v, 4) for k, v in s.items() if not isinstance(v, dict)},
          flush=True)

if __name__ == "__main__":
    main()
