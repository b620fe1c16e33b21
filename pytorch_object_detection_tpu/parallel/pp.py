"""Pipeline parallelism: stage-split serving across devices.

Completes the parallel layouts next to dp (mesh.py), tp (tp.py) and sp
(sp.py): the detector is split at the backbone/FPN seam into two stages,
each stage's params live resident on their OWN device, and microbatches
stream through.  JAX dispatch is asynchronous, so while stage 2 processes
microbatch k on its device, stage 1 is already running microbatch k+1 on
its — the classic GPipe-style overlap, orchestrated from the host with the
inter-stage hop as a device-to-device copy (ICI on a real TPU slice).

When to use: dp is throughput-optimal for every model this repo ships
(params are small next to activations — PERF.md); the pipeline seam exists
for deployments where one chip cannot hold the whole model + serving
working set, or where the two stages should ride different chip
generations.  The reference framework has no concept of this
(single-process single-GPU eval, `/root/reference/test.py:198-223`).

SPMD is not involved: each stage is an ordinary single-device jit program,
so this composes with the Pallas serving kernels (which are not
auto-partitionable) without shard_map.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def make_two_stage_pipeline(
    model,
    variables,
    strides: Sequence[int],
    canvas_hw,
    devices: Optional[Sequence] = None,
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    compute_dtype=jnp.bfloat16,
    mean=None,
    std=None,
):
    """Two-stage pipeline: backbone on devices[0], FPN+head+decode on
    devices[1].  Returns ``run(batches) -> [Detections]`` streaming the
    iterable of uint8 [B,H,W,3] microbatches through both stages.

    Output contract per microbatch matches
    `eval.evaluator.make_eval_pipeline` (fixed-shape Detections).
    """
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from pytorch_object_detection_tpu.ops.postprocess import decode_detections
    from pytorch_object_detection_tpu.utils.gradcam import _fpn_head_for

    devices = list(devices if devices is not None else jax.devices()[:2])
    assert len(devices) >= 2, "pipeline parallelism needs >= 2 devices"
    d0, d1 = devices[0], devices[1]
    mean = jnp.asarray(mean if mean is not None else IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else IMAGENET_STD, jnp.float32)

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    fpn_mod, head_mod = _fpn_head_for(model)

    if getattr(model, "backbone", "resnet50").startswith("efficientnet"):
        from pytorch_object_detection_tpu.nn.efficientnet import EfficientNet

        bb_mod = EfficientNet.b0()
        bb_apply = lambda v, x: bb_mod.apply(v, x, False)[-3:]
    else:
        from pytorch_object_detection_tpu.nn.resnet import ResNet50

        bb_mod = ResNet50(stem_mode=getattr(model, "stem_mode", "conv7"))
        bb_apply = lambda v, x: bb_mod.apply(v, x, False)

    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    def stage1(bb_params, bb_stats, images_u8):
        x = ((images_u8.astype(jnp.float32) / 255.0 - mean) / std).astype(compute_dtype)
        v = {"params": bb_params}
        if bb_stats:
            v["batch_stats"] = bb_stats
        return bb_apply(v, x)

    def stage2(rest_params, rest_stats, feats):
        fpn_v = {"params": rest_params["fpn"]}
        if "fpn" in rest_stats:
            fpn_v["batch_stats"] = rest_stats["fpn"]
        head_v = {"params": rest_params["head"]}
        if "head" in rest_stats:
            head_v["batch_stats"] = rest_stats["head"]
        levels = fpn_mod.apply(fpn_v, feats, False)
        try:
            cls_l, cnt_l, reg_l = head_mod.apply(head_v, levels)
        except TypeError:
            cls_l, cnt_l, reg_l = head_mod.apply(head_v, levels, False)
        f32 = lambda xs: [x.astype(jnp.float32) for x in xs]
        return decode_detections(
            f32(cls_l), f32(cnt_l), f32(reg_l), strides, score_threshold,
            nms_iou, max_detections, canvas_hw,
        )

    # stage params resident on their own devices for the pipeline's lifetime
    p0 = jax.device_put(
        (cast(params["backbone"]), cast(stats.get("backbone", {}))), d0)
    rest_params = {k: v for k, v in params.items() if k != "backbone"}
    rest_stats = {k: v for k, v in stats.items() if k != "backbone"}
    p1 = jax.device_put((cast(rest_params), cast(rest_stats)), d1)
    s1 = jax.jit(stage1)
    s2 = jax.jit(stage2)

    def run(batches) -> List:
        """Stream microbatches; detections come back in order.  Dispatch is
        async: stage 1 of microbatch k+1 overlaps stage 2 of microbatch k."""
        outs = []
        for x in batches:
            x = jax.device_put(jnp.asarray(x), d0)
            feats = s1(*p0, x)
            feats = jax.tree_util.tree_map(
                lambda t: jax.device_put(t, d1), feats)  # inter-stage hop
            outs.append(s2(*p1, feats))
        return outs

    run.devices = (d0, d1)
    run.stage_params = (p0, p1)
    return run
