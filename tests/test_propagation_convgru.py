"""GRUPropagationHead: the recurrent alternate behind the propagation
interface (SURVEY §7 hard-part 6 — the fork's head is "recurrent/flow-
warp", Tier C; the framework ships both designs). Invariants: factory
dispatch, identity-like behavior at init, trainable gates, engine
integration, and that the flow-warp head's checkpoints/params stay
disjoint (no accidental tree collisions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.models.propagation import (GRUPropagationHead,
                                                 PropagationHead,
                                                 init_propagation_params,
                                                 make_propagation_head)


def small_cfg(**extra):
    over = [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96),
        ("test.max_size", 192),
        ("vos.max_tracks", 4),
        ("vos.track_mask_size", (32, 48)),
    ] + list(extra.items())
    return apply_overrides(Config(), over).validate()


def test_factory_dispatch():
    assert make_propagation_head(small_cfg()) is None  # identity default
    assert isinstance(
        make_propagation_head(small_cfg(**{"vos.propagation": "learned"})),
        PropagationHead)
    assert isinstance(
        make_propagation_head(small_cfg(**{"vos.propagation": "flow_warp"})),
        PropagationHead)
    h = make_propagation_head(small_cfg(**{"vos.propagation": "convgru"}))
    assert isinstance(h, GRUPropagationHead)
    with pytest.raises(ValueError):
        apply_overrides(Config(),
                        [("vos.propagation", "lstm")]).validate()


def _init_head(cfg):
    head = make_propagation_head(cfg)
    params = init_propagation_params(cfg, head, jax.random.PRNGKey(0), 16)
    return head, params


def test_untrained_gru_head_is_near_identity():
    cfg = small_cfg(**{"vos.propagation": "convgru"})
    head, params = _init_head(cfg)
    mh, mw = cfg.vos.track_mask_size
    masks = np.zeros((4, mh, mw), np.float32)
    masks[0, 8:20, 10:30] = 1.0
    masks[1, 2:6, 2:8] = 1.0
    img = jax.random.normal(jax.random.PRNGKey(1), (mh, mw, 3)) * 50
    feat = jax.random.normal(jax.random.PRNGKey(2), (mh, mw, 16))
    inp = head.apply({"params": params}, img, feat,
                     method=GRUPropagationHead.frame_input)
    out = np.asarray(head.apply({"params": params}, inp, inp,
                                jnp.asarray(masks)))
    np.testing.assert_array_equal(out > 0.5, masks > 0.5)


def test_gru_gates_receive_gradient():
    cfg = small_cfg(**{"vos.propagation": "convgru"})
    head, params = _init_head(cfg)
    mh, mw = cfg.vos.track_mask_size
    masks = jnp.zeros((4, mh, mw)).at[0, 5:15, 5:15].set(1.0)
    target = jnp.zeros((4, mh, mw)).at[0, 7:17, 7:17].set(1.0)
    img = jax.random.normal(jax.random.PRNGKey(3), (mh, mw, 3)) * 50
    feat = jax.random.normal(jax.random.PRNGKey(4), (mh, mw, 16))

    def loss(p):
        inp = head.apply({"params": p}, img, feat,
                         method=GRUPropagationHead.frame_input)
        logits, aux = head.apply(
            {"params": p}, inp, inp, masks,
            method=GRUPropagationHead.propagate_with_aux)
        np.testing.assert_array_equal(np.asarray(aux), np.asarray(masks))
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    grads = jax.grad(loss)(params)
    gate_grads = jax.tree_util.tree_leaves(
        {k: v for k, v in grads.items() if k.startswith(("gru", "gate",
                                                         "cand"))})
    assert gate_grads and all(np.isfinite(g).all() for g in gate_grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in gate_grads)


def test_param_trees_differ_between_variants():
    cfg_f = small_cfg(**{"vos.propagation": "flow_warp"})
    cfg_g = small_cfg(**{"vos.propagation": "convgru"})
    _, pf = _init_head(cfg_f)
    _, pg = _init_head(cfg_g)
    assert "flow_out" in pf and "gate_out" in pg
    assert "flow_out" not in pg and "gate_out" not in pf
    # shared input contract: both have the projection + norm
    assert "proj" in pf and "proj" in pg


@pytest.mark.slow
def test_vos_engine_with_convgru_head():
    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.vos import VOSEngine
    from vosdetectron_tpu.metrics.davis_jf import evaluate_sequence

    cfg = small_cfg(**{
        "rpn.pre_nms_top_n_test": 64,
        "rpn.post_nms_top_n_test": 16,
        "test.detections_per_im": 8,
        "vos.assoc_score_thresh": 0.99,
        "vos.miss_tolerance": 100,
        "vos.propagation": "convgru",
    })
    frames, idmaps = make_synthetic_sequence(
        0, num_frames=6, size=(96, 160), num_objects=2)
    frames = np.repeat(frames[:1], 6, axis=0)
    idmaps = np.repeat(idmaps[:1], 6, axis=0)

    eng = VOSEngine(cfg, rng=0, chunk=3)
    assert isinstance(eng.prop_head, GRUPropagationHead)
    preds = eng.run_sequence(frames, idmaps[0])
    assert len(preds) == 6
    for p in preds:
        assert set(np.unique(p)).issubset({0, 1, 2})
    res = evaluate_sequence(preds, list(idmaps))
    assert res["J"] > 0.6, f"convgru engine J too low: {res}"


@pytest.mark.slow
def test_convgru_head_trains():
    """PropagationTrainer steps run and the head params move."""
    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.train_propagation import (
        PropagationTrainer, build_pair_batches)

    cfg = small_cfg(**{
        "rpn.pre_nms_top_n_test": 64,
        "rpn.post_nms_top_n_test": 16,
        "test.detections_per_im": 8,
        "vos.propagation": "convgru",
    })
    tr = PropagationTrainer(cfg, rng=0)
    assert isinstance(tr.head, GRUPropagationHead)
    seqs = [make_synthetic_sequence(0, num_frames=4, size=(96, 160),
                                    num_objects=2)]
    batch = build_pair_batches(tr, seqs)[0]
    before = np.asarray(
        jax.tree_util.tree_leaves(tr.head_params)[0]).copy()
    losses = [tr.train_step(batch) for _ in range(2)]
    assert all(np.isfinite(v) for v in losses)
    after = np.asarray(jax.tree_util.tree_leaves(tr.head_params)[0])
    assert not np.array_equal(before, after)
