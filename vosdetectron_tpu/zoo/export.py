"""Serving export: serialize the jitted detector as a portable artifact.

The reference's deployment story is "ship the .pth + the repo and run
python" (lib/core/test.py loaded in-process). The TPU-native equivalent is
an ahead-of-time *program* artifact: `jax.export` lowers the full detect
program (backbone -> RPN -> heads -> postprocess -> masks/keypoints) to
versioned StableHLO that a serving process can deserialize and run WITHOUT
this framework's Python on the hot path — model code changes can't drift
an already-shipped model, and the artifact is target-checked (platform
recorded at export).

Layout of an artifact directory:
    program.jaxexp    serialized jax.export.Exported (StableHLO + vjp-less
                      calling convention)
    meta.json         shapes/dtypes, platforms, flags, param treedef info
    params/           (optional, --bake-params off) Orbax checkpoint to
                      feed as the first call argument

Params are call ARGUMENTS by default (artifact stays a few MB; pair it
with any compatible checkpoint). `bake_params=True` closes over them —
self-contained but large, and the weights become compile-time constants.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

SUFFIX = "program.jaxexp"


def _register_output_types() -> None:
    """jax.export needs custom pytree containers registered for
    serialization. Idempotent."""
    from jax import export

    from ..engine.inference import Detections

    try:
        export.register_namedtuple_serialization(
            Detections,
            serialized_name="vosdetectron_tpu.engine.inference.Detections")
    except ValueError:
        pass  # already registered


def export_detector(cfg, params, batch: int = 1,
                    platforms: Optional[Sequence[str]] = None,
                    bake_params: bool = False):
    """Export Detector._detect for fixed (batch, padded_image_size) shapes.

    Returns (jax.export.Exported, call_with_params: bool, params) — params
    are the detector's actual weights (initialized when the caller passed
    None), so save_artifact can always ship a runnable params/ dir in
    params-as-argument mode. Pallas RoIAlign
    lowers to a tpu_custom_call; exporting it is allowed explicitly (the
    artifact is then TPU-only and tied to the Mosaic version) — the
    portable default is cfg.fast_rcnn.roi_xform_method="roi_align".
    """
    import jax
    import jax.numpy as jnp
    from jax import export

    from ..engine.inference import Detector

    _register_output_types()
    det = Detector(cfg, params=params)
    ph, pw = cfg.test.padded_image_size
    img_spec = jax.ShapeDtypeStruct((batch, ph, pw, 3), jnp.float32)
    hw_spec = jax.ShapeDtypeStruct((batch, 2), jnp.float32)

    disabled = ()
    if "pallas" in cfg.fast_rcnn.roi_xform_method:
        disabled = (export.DisabledSafetyCheck.custom_call("tpu_custom_call"),)

    if bake_params:
        fn = jax.jit(lambda images, im_hw: det._detect.__wrapped__(
            det, det.params, images, im_hw))
        args = (img_spec, hw_spec)
    else:
        fn = jax.jit(lambda p, images, im_hw: det._detect.__wrapped__(
            det, p, images, im_hw))
        p_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), det.params)
        args = (p_spec, img_spec, hw_spec)

    exp = export.export(fn, platforms=list(platforms) if platforms else None,
                        disabled_checks=list(disabled))(*args)
    return exp, not bake_params, det.params


def save_artifact(out_dir: str, exp, call_with_params: bool, cfg,
                  params=None) -> None:
    """Write program.jaxexp + meta.json (+ params/ when given)."""
    os.makedirs(out_dir, exist_ok=True)
    data = exp.serialize()
    with open(os.path.join(out_dir, SUFFIX), "wb") as f:
        f.write(data)
    meta = {
        "fun_name": exp.fun_name,
        "platforms": list(exp.platforms),
        "calling_convention_version": exp.calling_convention_version,
        "call_with_params": call_with_params,
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "padded_image_size": list(cfg.test.padded_image_size),
        "detections_per_im": cfg.test.detections_per_im,
        "conv_body": cfg.model.conv_body,
        "roi_xform_method": cfg.fast_rcnn.roi_xform_method,
        "program_bytes": len(data),
        # preprocessing contract: the program starts at preprocessed
        # tensors; a serving site must reproduce these exactly.
        "test_scale": cfg.test.scale,
        "test_max_size": cfg.test.max_size,
        "pixel_means": list(cfg.data.pixel_means),
        "pixel_stds": list(cfg.data.pixel_stds),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    if params is not None and call_with_params:
        from ..utils.checkpoint import save_params

        save_params(os.path.join(out_dir, "params"), params)


def load_artifact(out_dir: str) -> Tuple[object, dict]:
    """Deserialize an artifact. Returns (exported, meta); call via
    ``exported.call(params?, images, im_hw)`` (jit-compatible — wrap in
    jax.jit at the serving site)."""
    from jax import export

    _register_output_types()
    with open(os.path.join(out_dir, SUFFIX), "rb") as f:
        exp = export.deserialize(f.read())
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    return exp, meta
