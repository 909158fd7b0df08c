"""Nibble-packed id-map downloads (engine/vos.py::_pack_ids4).

The device->host id-map transfer shares the tunnel with frame uploads and
is starved when uploads saturate the link; packing two 4-bit ids per byte
halves it. The invariant: packing is LOSSLESS whenever the gate admits it
(semi-supervised, max first-frame GT id <= 15, even render width), and
the engine output is bit-identical with packing on or off.
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.engine.vos import VOSEngine, _pack_ids4, _unpack_ids4


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    for shape in [(4, 6, 8), (3, 10), (16,), (2, 5, 32)]:
        ids = rng.randint(0, 16, shape).astype(np.uint8)
        packed = np.asarray(_pack_ids4(jnp.asarray(ids)))
        assert packed.shape == shape[:-1] + (shape[-1] // 2,)
        out = _unpack_ids4(packed)
        np.testing.assert_array_equal(out, ids)


def _gate(cfg, gt, out_hw):
    return VOSEngine._pack_gate(SimpleNamespace(cfg=cfg), gt, out_hw)


def test_pack_gate():
    cfg = Config()
    gt = np.zeros((8, 8), np.uint8)
    gt[2:4, 2:4] = 3
    assert _gate(cfg, gt, (64, 96)) is True
    # no GT (unsupervised) -> raw
    assert _gate(cfg, None, (64, 96)) is False
    # odd render width -> raw
    assert _gate(cfg, gt, (64, 97)) is False
    # an id that does not fit 4 bits -> raw
    big = gt.copy()
    big[0, 0] = 16
    assert _gate(cfg, big, (64, 96)) is False
    # opt-out knob
    off = apply_overrides(cfg, [("vos.pack_downloads", False)])
    assert _gate(off, gt, (64, 96)) is False
    # unsupervised spawning can mint ids beyond the GT alphabet -> raw
    unsup = apply_overrides(cfg, [("vos.semi_supervised", False)])
    assert _gate(unsup, gt, (64, 96)) is False


@pytest.mark.slow
def test_engine_output_identical_packed_vs_raw():
    from vosdetectron_tpu.data.davis import make_synthetic_sequence

    frames, idmaps = make_synthetic_sequence(
        0, num_frames=4, size=(96, 160), num_objects=2)

    def run(pack):
        cfg = apply_overrides(Config(), [
            ("model.num_classes", 2),
            ("rpn.pre_nms_top_n_test", 64),
            ("rpn.post_nms_top_n_test", 16),
            ("test.padded_image_size", (128, 192)),
            ("test.scale", 96),
            ("test.max_size", 192),
            ("test.detections_per_im", 8),
            ("vos.max_tracks", 4),
            ("vos.track_mask_size", (32, 48)),
            ("vos.pack_downloads", pack),
        ]).validate()
        eng = VOSEngine(cfg, rng=0, chunk=2)
        return eng.run_sequence(frames, idmaps[0])

    a = run(True)
    b = run(False)
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(pa, pb)
