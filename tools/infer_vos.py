#!/usr/bin/env python
"""VOS inference + J&F eval over DAVIS (reference: fork VOS infer tool).

Example:
    python tools/infer_vos.py --set data.davis_root=/data/DAVIS \
        --split val --out ./vos_out
"""

from common import base_parser, load_cfg


def main():
    p = base_parser("Run VOS over DAVIS sequences, export PNGs, eval J&F")
    p.add_argument("--split", default="val")
    p.add_argument("--out", default=None, help="indexed-PNG export dir")
    p.add_argument("--max-seqs", type=int, default=None)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--prop-ckpt", default=None,
                   help="PropagationHead checkpoint (vos.propagation="
                        "learned; see tools/train_propagation.py)")
    args = p.parse_args()
    cfg = load_cfg(args)

    from vosdetectron_tpu.engine.vos import VOSEngine, run_davis_eval

    params = None
    if args.ckpt:
        from vosdetectron_tpu.utils.checkpoint import load_params

        params = load_params(args.ckpt)
    prop_params = None
    if args.prop_ckpt:
        from vosdetectron_tpu.utils.checkpoint import load_params

        prop_params = load_params(args.prop_ckpt)
    eng = VOSEngine(cfg, params=params, chunk=args.chunk,
                    prop_params=prop_params)
    per_seq, agg = run_davis_eval(eng, cfg.data.davis_root, args.split,
                                  out_dir=args.out,
                                  max_sequences=args.max_seqs)
    for name, r in per_seq.items():
        print(f"{name}: J={r['J']:.4f} F={r['F']:.4f} J&F={r['J&F']:.4f}")
    print(f"GLOBAL: J={agg['J']:.4f} F={agg['F']:.4f} J&F={agg['J&F']:.4f}")


if __name__ == "__main__":
    main()
