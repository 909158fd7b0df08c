#!/usr/bin/env python
"""Train the learned mask-propagation head (flow-warp + refine) against a
frozen detector (reference: fork-added propagation module training,
SURVEY.md §2.2 "Mask propagation / association").

Trains on synthetic moving sequences with exact motion GT (or real DAVIS
pairs when data.davis_root points at a real checkout), reports held-out
single-step J vs the identity-propagation baseline, and saves an Orbax
checkpoint loadable by `tools/infer_vos.py --prop-ckpt`.

Example:
    python tools/train_propagation.py --steps 2500 --out ./prop_ckpt \
        --set vos.propagation=learned
"""

from common import base_parser, load_cfg


def main():
    p = base_parser("Train the learned propagation head")
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--unroll-steps", type=int, default=0,
                   help="closed-loop fine-tune steps after pair training "
                        "(backprop through the whole-sequence rollout)")
    p.add_argument("--deform-prob", type=float, default=0.0,
                   help="probability of jittering the input mask per pair "
                        "example (MaskTrack-style exposure-gap aug)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train-seqs", type=int, default=24)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--size", type=int, nargs=2, default=(96, 160),
                   help="sequence resolution; use 480 854 to train at "
                        "the real VOS geometry")
    p.add_argument("--objects", type=int, default=2)
    p.add_argument("--hardness", type=float, default=0.0,
                   help="curriculum hardness ceiling (sequences ramp "
                        "0 -> this)")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    args = p.parse_args()
    cfg = load_cfg(args)

    import os

    import jax
    import orbax.checkpoint as ocp

    from vosdetectron_tpu.engine.train_propagation import train_on_synthetic

    det_params = None
    if args.ckpt:
        from vosdetectron_tpu.utils.checkpoint import load_params

        det_params = load_params(args.ckpt)

    head_params, report = train_on_synthetic(
        cfg, num_train_seqs=args.train_seqs, num_frames=args.frames,
        steps=args.steps, lr=args.lr, det_params=det_params,
        unroll_steps=args.unroll_steps, deform_prob=args.deform_prob,
        size=tuple(args.size), num_objects=args.objects,
        hardness=args.hardness)

    print(f"held-out single-step J: identity={report['J_identity']:.4f} "
          f"learned(init)={report['J_learned_init']:.4f} "
          f"learned(final)={report['J_learned_final']:.4f}")
    if "J_rollout" in report:
        print(f"held-out ROLLOUT J (closed-loop, whole sequence): "
              f"identity={report['J_rollout_identity']:.4f} "
              f"pair-only={report['J_rollout_mid']:.4f} "
              f"after-unroll={report['J_rollout']:.4f}")

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(args.out, "step_00000000"))
    ckptr.save(path, {"step": 0, "params": head_params}, force=True)
    ckptr.wait_until_finished()
    print(f"saved propagation head -> {path}")


if __name__ == "__main__":
    main()
