"""Tests: DAVIS I/O round-trip, synthetic generator, J&F metric sanity."""

import os

import numpy as np
import pytest

from vosdetectron_tpu.data import davis as D
from vosdetectron_tpu.metrics import davis_jf as JF


def test_indexed_png_roundtrip(tmp_path):
    ids = np.zeros((32, 48), np.uint8)
    ids[4:10, 5:20] = 1
    ids[15:25, 30:40] = 2
    p = str(tmp_path / "m.png")
    D.write_indexed_png(p, ids)
    back = D.read_indexed_png(p)
    np.testing.assert_array_equal(back, ids)


def test_synthetic_davis_tree(tmp_path):
    root = str(tmp_path / "DAVIS")
    D.materialize_synthetic_davis(root, {"seq_a": 0, "seq_b": 1},
                                  num_frames=5, size=(96, 160),
                                  num_objects=2)
    cat = D.DavisCatalog(root)
    names = cat.split_sequences("val")
    assert names == ["seq_a", "seq_b"]
    seq = cat.sequence("seq_a")
    assert len(seq) == 5 and len(seq.anno_paths) == 5
    idmap, ids = cat.load_first_frame_instances(seq)
    assert idmap.shape == (96, 160)
    assert ids == [1, 2]
    im = D.read_image_bgr(seq.frame_paths[0])
    assert im.shape == (96, 160, 3)


def test_hard_synthetic_generator():
    """Curriculum generator (hardness > 0): deterministic, exact masks,
    every object visible in most frames, and actually different content
    from the easy generator."""
    f1, i1 = D.make_synthetic_sequence(7, num_frames=12, size=(96, 160),
                                       num_objects=3, hardness=1.0)
    f2, i2 = D.make_synthetic_sequence(7, num_frames=12, size=(96, 160),
                                       num_objects=3, hardness=1.0)
    np.testing.assert_array_equal(f1, f2)  # deterministic
    np.testing.assert_array_equal(i1, i2)
    assert f1.shape == (12, 96, 160, 3) and i1.shape == (12, 96, 160)
    assert set(np.unique(i1)) <= {0, 1, 2, 3}
    for k in (1, 2, 3):
        vis = ((i1 == k).sum(axis=(1, 2)) > 20).mean()
        assert vis >= 0.8, (k, vis)
    f0, i0 = D.make_synthetic_sequence(7, num_frames=12, size=(96, 160),
                                       num_objects=3, hardness=0.0)
    assert not np.array_equal(f0, f1)
    # hardness=0 must stay bit-identical to the pre-curriculum generator
    # (committed checkpoints + eval history depend on its exact content)
    import hashlib

    assert hashlib.sha1(f0.tobytes()).hexdigest()[:12] == "a1bf0fcc18fc", \
        "easy-generator content drifted"


def test_materialize_mixed_hardness(tmp_path):
    root = str(tmp_path / "DAVIS")
    D.materialize_synthetic_davis(root, {"easy": (0, 0.0),
                                         "hard": (1, 1.0)},
                                  num_frames=3, size=(96, 160),
                                  num_objects=2)
    cat = D.DavisCatalog(root)
    assert cat.split_sequences("train") == ["easy", "hard"]
    for n in ("easy", "hard"):
        seq = cat.sequence(n)
        assert len(seq) == 3 and len(seq.anno_paths) == 3


def test_jf_perfect_prediction():
    _, idmaps = D.make_synthetic_sequence(0, num_frames=6, size=(96, 160),
                                          num_objects=2)
    res = JF.evaluate_sequence(list(idmaps), list(idmaps))
    assert res["J"] == pytest.approx(1.0)
    assert res["F"] == pytest.approx(1.0)
    assert res["J&F"] == pytest.approx(1.0)


def test_jf_empty_prediction_is_zero():
    _, idmaps = D.make_synthetic_sequence(1, num_frames=6, size=(96, 160))
    empty = [np.zeros_like(m) for m in idmaps]
    res = JF.evaluate_sequence(empty, list(idmaps))
    assert res["J&F"] < 0.05


def test_jf_shifted_prediction_degrades():
    _, idmaps = D.make_synthetic_sequence(2, num_frames=6, size=(96, 160))
    shifted = [np.roll(m, 8, axis=1) for m in idmaps]
    res = JF.evaluate_sequence(shifted, list(idmaps))
    perfect = JF.evaluate_sequence(list(idmaps), list(idmaps))
    assert res["J"] < perfect["J"]
    assert 0.2 < res["J"] < 0.95  # overlapping but clearly degraded
    assert res["F"] < 0.9


def test_jf_excludes_first_last_frames():
    _, idmaps = D.make_synthetic_sequence(3, num_frames=6, size=(96, 160))
    pred = list(idmaps)
    # corrupt only first and last frame -> score unchanged
    pred[0] = np.zeros_like(pred[0])
    pred[-1] = np.zeros_like(pred[-1])
    res = JF.evaluate_sequence(pred, list(idmaps))
    assert res["J&F"] == pytest.approx(1.0)


def test_dataset_aggregation():
    agg = JF.evaluate_dataset({
        "a": {"J": 0.8, "F": 0.6},
        "b": {"J": 0.4, "F": 0.2},
    })
    assert agg["J"] == pytest.approx(0.6)
    assert agg["F"] == pytest.approx(0.4)
    assert agg["J&F"] == pytest.approx(0.5)


def test_training_stats_tensorboard_scalars(tmp_path):
    """TB scalar logging (reference: train_net_step.py --use_tfboard via
    tensorboardX)."""
    from vosdetectron_tpu.utils.training_stats import TrainingStats

    tb = tmp_path / "tb"
    stats = TrainingStats(log_period=2, tb_dir=str(tb))
    for step in range(4):
        stats.log(step, {"loss": 1.0 / (step + 1)}, max_iter=4)
    stats.close()
    files = list(tb.glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


def test_boundary_f_exact_bipartite_vs_dilation():
    """VERDICT r2 #8: the exact one-to-one bipartite boundary match vs the
    official davis2017-evaluation dilation shortcut. Dilation allows
    many-to-one matches, so exact <= dilation always; for clean single
    boundaries the delta must be small (error budget for 'parity +-0.5')."""
    import numpy as np

    from vosdetectron_tpu.metrics.davis_jf import boundary_f_measure

    rng = np.random.RandomState(0)
    deltas = []
    for shift in (0, 1, 3, 5):
        gt = np.zeros((120, 216), bool)
        gt[30:90, 50:160] = True
        pred = np.roll(gt, shift, axis=1)
        f_dil = boundary_f_measure(pred, gt)
        f_ex = boundary_f_measure(pred, gt, exact=True)
        assert f_ex <= f_dil + 1e-9, (shift, f_ex, f_dil)
        deltas.append(f_dil - f_ex)
        if shift == 0:
            assert f_ex == 1.0 and f_dil == 1.0
    # clean single-boundary case: the approximation error is tiny
    assert max(deltas) < 0.02, deltas

    # fragmented prediction (noisy blobs around the boundary): dilation
    # over-credits many-to-one matches; exact penalizes. Just assert the
    # ordering and that both stay in [0, 1].
    noise = rng.rand(120, 216) < 0.02
    pred = np.zeros((120, 216), bool)
    pred[30:90, 50:160] = True
    pred ^= noise
    gt = np.zeros((120, 216), bool)
    gt[30:90, 50:160] = True
    f_dil = boundary_f_measure(pred, gt)
    f_ex = boundary_f_measure(pred, gt, exact=True)
    assert 0.0 <= f_ex <= f_dil <= 1.0


def test_boundary_f_exact_empty_cases():
    import numpy as np

    from vosdetectron_tpu.metrics.davis_jf import boundary_f_measure

    z = np.zeros((32, 32), bool)
    o = np.zeros((32, 32), bool)
    o[8:20, 8:20] = True
    assert boundary_f_measure(z, z, exact=True) == 1.0
    assert boundary_f_measure(o, z, exact=True) == 0.0
    assert boundary_f_measure(z, o, exact=True) == 0.0
