"""Serving export: AOT-serialize the detection pipeline (StableHLO).

Production-deployment path: `jax.export` freezes the jitted
normalize -> forward -> decode -> NMS program (weights baked in as
constants or kept as inputs) into a portable serialized artifact that any
JAX runtime — or, via StableHLO, non-JAX runtimes — can execute without
Python model code.  The reference has no serving story (eval scripts load
`.pth` + Python modules); this is the TPU-native equivalent of a
TorchScript/ONNX export.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def export_eval_pipeline(
    model,
    params,
    batch_stats,
    batch_size: int,
    canvas_hw: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    bake_weights: bool = True,
):
    """Export the full eval pipeline for ``[B, H, W, 3] uint8`` inputs.

    Returns the `jax.export.Exported` object; call ``.serialize()`` for
    bytes, or run it via ``jax.export.deserialize(blob).call(images)``.
    With ``bake_weights`` the params are constants inside the artifact
    (single-tensor serving input); otherwise they stay as arguments.
    """
    from jax import export as jexport

    from pytorch_object_detection_tpu.eval.evaluator import make_eval_pipeline

    pipeline = make_eval_pipeline(
        model, strides, canvas_hw, score_threshold, nms_iou, max_detections
    )

    img_spec = jax.ShapeDtypeStruct((batch_size, *canvas_hw, 3), jnp.uint8)
    # return a plain tuple: jax.export's serializer has no registration for
    # the Detections NamedTuple
    if bake_weights:
        fn = jax.jit(lambda images: tuple(pipeline(params, batch_stats, images)))
        return jexport.export(fn)(img_spec)
    fn = jax.jit(lambda p, s, images: tuple(pipeline(p, s, images)))
    p_spec = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    s_spec = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch_stats)
    return jexport.export(fn)(p_spec, s_spec, img_spec)


def export_eval_pipeline_int8(
    model,
    variables,
    calib_images,
    batch_size: int,
    canvas_hw: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    backend: str = "pallas_block",
    nms_impl: str = "auto",
):
    """Export the full int8-PTQ serving pipeline (RAW uint8 input through
    the fused Pallas kernels + decode + NMS) as a serialized artifact.

    The Pallas kernels serialize as StableHLO custom calls (TPU-platform
    artifact).  Quantized weights are baked in as constants — the artifact
    is the complete serving binary.  calib_images: NORMALIZED float batch
    for activation calibration.
    """
    from jax import export as jexport

    from pytorch_object_detection_tpu.eval.evaluator import make_eval_pipeline_int8

    pipeline = make_eval_pipeline_int8(
        model, variables, calib_images, strides, canvas_hw,
        score_threshold=score_threshold, nms_iou=nms_iou,
        max_detections=max_detections, backend=backend, nms_impl=nms_impl,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    img_spec = jax.ShapeDtypeStruct((batch_size, *canvas_hw, 3), jnp.uint8)
    fn = jax.jit(lambda images: tuple(pipeline(params, batch_stats, images)))
    return jexport.export(fn)(img_spec)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
