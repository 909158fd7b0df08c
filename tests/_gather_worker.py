"""Worker for the 2-process merged-eval test (VERDICT r2 #4): builds a
deterministic per-process evaluator shard, merges across processes via
allgather_object, and checks the merged summary equals the full result
computed locally (both processes know all the data, so each can verify).

Usage: python _gather_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import numpy as np

    from vosdetectron_tpu.metrics.coco_eval import CocoEvaluator
    from vosdetectron_tpu.parallel.gather import allgather_object

    def synth(rng):
        def boxes(n):
            b = rng.uniform(0, 200, (n, 4)).astype(np.float32)
            b[:, 2:] = b[:, :2] + rng.uniform(10, 120, (n, 2))
            return b
        return (boxes(6), rng.uniform(0.05, 1, 6).astype(np.float32),
                rng.randint(1, 4, 6), boxes(4), rng.randint(1, 4, 4),
                rng.rand(4) < 0.2)

    # image i always drawn from seed i — every process can rebuild the
    # full dataset; process p EVALUATES only its strided shard.
    images = [synth(np.random.RandomState(i)) for i in range(8)]
    mine = CocoEvaluator("bbox", 100)
    for i in range(pid, len(images), nproc):
        mine.add_image(*images[i])

    merged = mine.merge_across_processes()
    got = merged.summarize()

    full = CocoEvaluator("bbox", 100)
    for im in images:
        full.add_image(*im)
    want = full.summarize()

    for k in want:
        a, b = want[k], got[k]
        if k == "per_category":
            assert a == b, (k, a, b)
        else:
            assert a == b or (np.isnan(a) and np.isnan(b)), (k, a, b)

    # payload-size asymmetry: also gather objects of very different sizes
    blob = {"pid": pid, "data": np.zeros(1000 * (pid + 1), np.uint8)}
    outs = allgather_object(blob)
    assert [o["pid"] for o in outs] == list(range(nproc))
    assert [len(o["data"]) for o in outs] == [1000 * (i + 1)
                                              for i in range(nproc)]

    print(f"GATHER_OK pid={pid} AP={got['AP']:.6f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
