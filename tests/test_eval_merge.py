"""Merged dataset-level evaluation (VERDICT r2 #4).

The reference's test engine merges per-GPU detection pickles into ONE
result (reference: lib/core/test_engine.py, SURVEY.md:131); here the unit
is CocoEvaluator.merge — sharded evaluators folded together must reproduce
the single-evaluator summary bit-for-bit.
"""

import numpy as np

from vosdetectron_tpu.metrics.coco_eval import CocoEvaluator
from vosdetectron_tpu.parallel.gather import allgather_object


def synth_image(rng, n_det=6, n_gt=4, n_cls=3):
    def boxes(n):
        b = rng.uniform(0, 200, (n, 4)).astype(np.float32)
        b[:, 2:] = b[:, :2] + rng.uniform(10, 120, (n, 2))
        return b

    det_b = boxes(n_det)
    det_s = rng.uniform(0.05, 1.0, n_det).astype(np.float32)
    det_c = rng.randint(1, n_cls + 1, n_det)
    gt_b = boxes(n_gt)
    gt_c = rng.randint(1, n_cls + 1, n_gt)
    crowd = rng.rand(n_gt) < 0.2
    return det_b, det_s, det_c, gt_b, gt_c, crowd


def test_merge_equals_single_evaluator():
    rng = np.random.RandomState(0)
    images = [synth_image(rng) for _ in range(10)]

    ev_all = CocoEvaluator("bbox", 100)
    shards = [CocoEvaluator("bbox", 100) for _ in range(3)]
    for i, im in enumerate(images):
        ev_all.add_image(*im)
        shards[i % 3].add_image(*im)

    merged = shards[0].merge(shards[1]).merge(shards[2])
    want = ev_all.summarize()
    got = merged.summarize()
    assert set(want) == set(got)
    for k in want:
        if k == "per_category":
            assert want[k] == got[k]
        else:
            assert want[k] == got[k] or (
                np.isnan(want[k]) and np.isnan(got[k])), k


def test_state_roundtrip_preserves_summary():
    rng = np.random.RandomState(1)
    ev = CocoEvaluator("bbox", 100)
    for _ in range(4):
        ev.add_image(*synth_image(rng))
    ev2 = CocoEvaluator.from_state(ev.state())
    a, b = ev.summarize(), ev2.summarize()
    assert a == b or all(
        a[k] == b[k] or (isinstance(a[k], float) and np.isnan(a[k])
                         and np.isnan(b[k])) for k in a)


def test_allgather_object_single_process():
    obj = {"x": np.arange(5), "y": "hello"}
    out = allgather_object(obj)
    assert len(out) == 1
    assert out[0]["y"] == "hello"
    np.testing.assert_array_equal(out[0]["x"], obj["x"])


def test_merge_type_mismatch_rejected():
    import pytest

    with pytest.raises(AssertionError):
        CocoEvaluator("bbox").merge(CocoEvaluator("segm"))
