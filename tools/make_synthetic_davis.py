#!/usr/bin/env python
"""Materialize a synthetic-DAVIS tree with the hardness curriculum.

The repo's quality protocol trains and evaluates on the deterministic
synthetic generator (no real DAVIS checkout exists in this environment —
SURVEY.md §0). This tool writes the training trees reproducibly:

    # r4 curriculum training tree (32 sequences, hardness ramp 0 -> 1)
    python tools/make_synthetic_davis.py --root /tmp/synth_hard_train \
        --seqs 32 --frames 48 --ramp

    # held-out eval tree at full hardness (seeds >= 1000 are reserved
    # for eval — tools/eval_quality.py uses 1000.. in-memory)
    python tools/make_synthetic_davis.py --root /tmp/synth_hard_val \
        --seqs 4 --frames 12 --seed0 900 --hardness 1.0

Training seeds MUST stay < 1000 (eval seeds start there).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--seqs", type=int, default=32)
    p.add_argument("--frames", type=int, default=48)
    p.add_argument("--seed0", type=int, default=0)
    p.add_argument("--size", type=int, nargs=2, default=(480, 854))
    p.add_argument("--objects", type=int, default=3)
    p.add_argument("--vary-objects", action="store_true",
                   help="cycle 2/3/4 objects across sequences")
    p.add_argument("--hardness", type=float, default=1.0,
                   help="fixed hardness for every sequence")
    p.add_argument("--ramp", action="store_true",
                   help="hardness curriculum: first 4 sequences at 0, "
                        "then a linear ramp 0.25 -> 1.0")
    args = p.parse_args()

    from vosdetectron_tpu.data.davis import materialize_synthetic_davis

    def hard(i):
        if not args.ramp:
            return args.hardness
        if i < 4:
            return 0.0
        return min(1.0, 0.25 + 0.75 * (i - 4) / max(args.seqs - 8, 1))

    groups = {}
    for i in range(args.seqs):
        seed = args.seed0 + i
        nobj = (2 + i % 3) if args.vary_objects else args.objects
        groups.setdefault(nobj, {})[f"seq_{seed:04d}"] = (seed, hard(i))
    for nobj, seqs in groups.items():
        materialize_synthetic_davis(args.root, seqs,
                                    num_frames=args.frames,
                                    size=tuple(args.size),
                                    num_objects=nobj)
    # materialize per group overwrote the split files; rebuild them whole
    names = sorted(n for g in groups.values() for n in g)
    os.makedirs(os.path.join(args.root, "ImageSets", "2017"), exist_ok=True)
    for split in ("train", "val"):
        with open(os.path.join(args.root, "ImageSets", "2017",
                               f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    print(f"wrote {len(names)} sequences x {args.frames} frames to "
          f"{args.root}")


if __name__ == "__main__":
    main()
