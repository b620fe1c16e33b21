"""Batched dataset evaluation: loader -> jitted forward+decode -> metrics.

The device side (forward, decode, top-k, NMS) is one jit program over full
batches — unlike the reference whose post-process is only safe at batch 1
(`/root/reference/model/modules/head.py:84-101`, `test.py:263` batch=1).
Detections come back as fixed-size arrays + validity mask; boxes are
un-scaled to original image coordinates by the carried resize scale
(reference Test_coco.py:144-151).

Eval hyperparameters default to the reference's: score 0.05, NMS IoU 0.6,
max 1000 detections (test.py:172-174).  All 5 pyramid levels are decoded
(the reference's test.py:176 silently drops the 5th — SURVEY §2.7; delta
documented).
"""
from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.data.pipeline import DetectionLoader, make_device_preprocess
from pytorch_object_detection_tpu.eval.coco_map import COCOEvaluator
from pytorch_object_detection_tpu.eval.voc_map import eval_voc_ap, mean_ap
from pytorch_object_detection_tpu.ops.postprocess import decode_detections
from pytorch_object_detection_tpu.train.trainer import make_eval_forward


def make_eval_pipeline(
    model,
    strides: Sequence[int],
    canvas_hw,
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    compute_dtype=jnp.bfloat16,
    mean=None,
    std=None,
    device_resize: bool = False,
):
    """One jitted program: [resize ->] normalize -> forward -> decode -> NMS.

    ``device_resize=True`` completes the north-star device input pipeline:
    the program takes RAW decoded tiles + per-image (h, w) (dataset built
    with ``raw_tiles=True``) and performs the aspect-preserving resize on
    device (data/pipeline.make_device_resize) before normalize+forward.
    The pipeline then has signature ``(params, stats, tiles_u8, src_hw)``.
    """
    from pytorch_object_detection_tpu.data.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        make_device_resize,
    )

    mean = jnp.asarray(mean if mean is not None else IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else IMAGENET_STD, jnp.float32)
    fwd = make_eval_forward(model, compute_dtype)
    resize = make_device_resize(canvas_hw) if device_resize else None

    def body(params, batch_stats, images_u8):
        x = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
        cls_l, cnt_l, reg_l = fwd(params, batch_stats, x)
        # decode exactly len(strides) levels: passing ONE fewer stride than
        # the model has levels reproduces the reference's zip-truncation
        # (test.py:176 decodes 4 of 5 pyramid levels — SURVEY §2.7) as an
        # explicit eval-compat mode.  Anything else is a config error —
        # fail loudly instead of silently decoding a subset.
        k = len(strides)
        assert k in (len(cls_l), len(cls_l) - 1), (
            f"{k} strides for a {len(cls_l)}-level model: only the full set "
            f"or the documented ref-compat (levels-1) truncation is allowed")
        return decode_detections(
            cls_l[:k], cnt_l[:k], reg_l[:k], strides, score_threshold,
            nms_iou, max_detections, canvas_hw
        )

    if device_resize:
        @jax.jit
        def pipeline(params, batch_stats, tiles_u8, src_hw):
            canvas_u8, _, _ = resize(tiles_u8, src_hw)
            return body(params, batch_stats, canvas_u8)
    else:
        pipeline = jax.jit(body)

    return pipeline


def make_eval_pipeline_anchor(
    model,
    canvas_hw,
    score_threshold: float = 0.05,
    nms_iou: float = 0.5,
    max_detections: int = 1000,
    compute_dtype=jnp.bfloat16,
    mean=None,
    std=None,
):
    """Eval pipeline for anchor-based detectors (RetinaNet / SSD300).

    Same one-jitted-program shape as :func:`make_eval_pipeline` but the
    decode is the anchor codec (`ops/anchors.decode_anchor_detections` —
    the device replacement for the reference's host-side DataEncoder.decode,
    `/root/reference/utill/utills.py:161-179`).  Output contract
    (:class:`..ops.postprocess.Detections`) is identical, so the VOC/COCO
    evaluators and metrics run unchanged.
    """
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from pytorch_object_detection_tpu.models.ssd import SSD300, default_boxes
    from pytorch_object_detection_tpu.ops.anchors import (
        decode_anchor_detections,
        generate_anchors,
    )

    mean = jnp.asarray(mean if mean is not None else IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else IMAGENET_STD, jnp.float32)
    if isinstance(model, SSD300):
        assert canvas_hw[0] == canvas_hw[1] == 300, (
            f"SSD300 is defined at 300x300 (config block: input [300,300], "
            f"canvas_align 1); got {canvas_hw}")
        anchors = default_boxes(canvas_hw[0])
        activation = "softmax_bg0"
    else:  # RetinaNet layout
        anchors = generate_anchors(
            model.level_shapes(canvas_hw), (8, 16, 32, 64, 128))
        activation = "sigmoid"

    def body(anchors, params, batch_stats, images_u8):
        x = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
        apply_vars = {"params": jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params)}
        if batch_stats:
            apply_vars["batch_stats"] = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype), batch_stats)
        loc, cls = model.apply(apply_vars, x.astype(compute_dtype), False)
        return decode_anchor_detections(
            anchors, loc.astype(jnp.float32), cls.astype(jnp.float32),
            activation, score_threshold, nms_iou, max_detections, canvas_hw,
        )

    # anchors ride as a jit argument (closure-captured arrays constant-fold
    # through the remote-compile tunnel, PERF.md)
    jitted = jax.jit(body)
    return lambda params, batch_stats, images_u8: jitted(
        anchors, params, batch_stats, images_u8)


def make_eval_pipeline_anchor_int8(
    model,
    variables,
    calib_images,
    canvas_hw,
    score_threshold: float = 0.05,
    nms_iou: float = 0.5,
    max_detections: int = 1000,
    mean=None,
    std=None,
    backend: str = "pallas_block",
):
    """int8-PTQ serving pipeline for the anchor family (counterpart of
    :func:`make_eval_pipeline_int8`): RetinaNet runs int8 ResNet-50 ->
    BN-folded int8 RetinaFPN -> int8 subnets (models/retinanet_int8.py);
    SSD300 runs the full int8 VGG-16 multibox ladder (models/ssd_int8.py).
    Anchor decode rides the same jitted program.

    ``calib_images``: representative NORMALIZED batch.
    """
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from pytorch_object_detection_tpu.models.retinanet import RetinaNet
    from pytorch_object_detection_tpu.models.ssd import SSD300, default_boxes
    from pytorch_object_detection_tpu.ops.anchors import (
        decode_anchor_detections,
        generate_anchors,
    )

    mean = jnp.asarray(mean if mean is not None else IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else IMAGENET_STD, jnp.float32)
    if isinstance(model, SSD300):
        from pytorch_object_detection_tpu.models.ssd_int8 import (
            quantize_ssd300,
            ssd300_int8_forward,
        )

        assert canvas_hw[0] == canvas_hw[1] == 300, (
            f"SSD300 is defined at 300x300 (config block: input [300,300], "
            f"canvas_align 1); got {canvas_hw}")
        qtree = quantize_ssd300(model, variables, calib_images)
        anchors = default_boxes(canvas_hw[0])
        activation = "softmax_bg0"
        fwd = lambda qt, x: ssd300_int8_forward(model, qt, x)
    else:
        from pytorch_object_detection_tpu.models.retinanet_int8 import (
            quantize_retinanet,
            retinanet_int8_forward,
        )

        assert isinstance(model, RetinaNet), "unknown anchor family"
        qtree = quantize_retinanet(model, variables, calib_images, backend=backend)
        anchors = generate_anchors(
            model.level_shapes(canvas_hw), (8, 16, 32, 64, 128))
        activation = "sigmoid"
        fwd = lambda qt, x: retinanet_int8_forward(model, qt, x, backend=backend)

    def body(qtree, anchors, params, batch_stats, images_u8):
        x = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
        loc, cls = fwd(qtree, x)
        return decode_anchor_detections(
            anchors, loc, cls, activation, score_threshold, nms_iou,
            max_detections, canvas_hw,
        )

    jitted = jax.jit(body)  # qtree/anchors as args: no giant jit constants
    return lambda params, batch_stats, images_u8: jitted(
        qtree, anchors, params, batch_stats, images_u8)


def _default_pipeline(model, strides, canvas_hw, score_threshold, nms_iou,
                      max_detections, device_resize: bool = False):
    """Dispatch: FCOS-family per-level decode vs anchor codec decode."""
    from pytorch_object_detection_tpu.models.retinanet import RetinaNet
    from pytorch_object_detection_tpu.models.ssd import SSD300

    if isinstance(model, (RetinaNet, SSD300)):
        assert not device_resize, "device-resize path: FCOS-family only"
        return make_eval_pipeline_anchor(
            model, canvas_hw, score_threshold, nms_iou, max_detections)
    return make_eval_pipeline(
        model, strides, canvas_hw, score_threshold, nms_iou, max_detections,
        device_resize=device_resize)


def _run_pipeline(pipeline, params, batch_stats, images, mesh=None, src_hw=None):
    """Run the jitted pipeline, optionally with the batch sharded over the
    mesh's data axis (the loader pads the last batch, so every batch shards
    evenly and there is exactly one compiled program).  ``src_hw`` rides
    along for device-resize pipelines (raw-tile input)."""
    x = jnp.asarray(images)
    extra = () if src_hw is None else (jnp.asarray(src_hw),)
    if mesh is not None:
        from pytorch_object_detection_tpu.parallel.mesh import batch_sharding

        assert x.shape[0] % mesh.shape["data"] == 0, (
            f"batch {x.shape[0]} not divisible by data-mesh size {mesh.shape['data']}"
        )
        with mesh:
            x = jax.device_put(x, batch_sharding(mesh))
            extra = tuple(jax.device_put(e, batch_sharding(mesh)) for e in extra)
            return pipeline(params, batch_stats, x, *extra)
    return pipeline(params, batch_stats, x, *extra)


def _collect(det, scales, n_valid: int = -1):
    """Fetch detections to host, unscale, and trim to valid entries.

    All ``max_detections`` NMS survivors are kept (the reference carries up
    to 1000 through NMS, test.py:172-174 — no extra cap here).  ``n_valid``
    trims loader padding rows.
    """
    scores = np.asarray(det.scores)
    classes = np.asarray(det.classes)
    boxes = np.asarray(det.boxes)
    valid = np.asarray(det.valid)
    n = scores.shape[0] if n_valid < 0 else n_valid
    out = []
    for i in range(n):
        keep = valid[i]
        out.append((boxes[i][keep] / scales[i], classes[i][keep], scores[i][keep]))
    return out


def make_eval_pipeline_int8(
    model,
    variables,
    calib_images,
    strides: Sequence[int],
    canvas_hw,
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    mean=None,
    std=None,
    nms_impl: str = "auto",
    backend: str = "pallas_block",
    int8_fpn: bool = True,
    int8_head: bool = True,
    mesh=None,
    device_resize: bool = False,
):
    """int8-PTQ serving pipeline: calibrated int8 backbone + HisFPN + head
    through the fused Pallas kernels + on-device decode/NMS.

    calib_images: representative NORMALIZED float batch for activation
    calibration.  Returns a pipeline usable via evaluate_voc(pipeline=...).
    ``int8_fpn=False`` restricts the int8 domain to the backbone,
    ``int8_head=False`` to backbone+FPN (both are also the automatic
    fallback for non-HISFCOS models).

    ``mesh``: data-parallel serving over a device Mesh.  Pallas custom
    calls are not XLA-auto-partitionable, so the whole pipeline is wrapped
    in ``jax.shard_map`` over the batch axis — each device runs the fused
    kernels on its local shard (the DDP-serving counterpart of the
    reference's single-GPU eval loop, test.py:198-223).

    ``device_resize=True``: the pipeline takes RAW decoded uint8 tiles +
    per-image (h, w) (dataset built with ``raw_tiles=True``) and performs
    the aspect-preserving resize batched on device before the stem —
    signature becomes ``(params, batch_stats, tiles_u8, src_hw)``.
    ``calib_images`` must still be normalized CANVAS images.
    """
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from pytorch_object_detection_tpu.models.fcos import FCOS, HISFCOS
    from pytorch_object_detection_tpu.train.trainer import (
        make_eval_forward_int8,
        quantize_backbone,
        quantize_fpn,
        quantize_head,
    )

    from pytorch_object_detection_tpu.models.mcfcos import MC_FCOS

    backbone = getattr(model, "backbone", "resnet50")
    mean = jnp.asarray(mean if mean is not None else IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else IMAGENET_STD, jnp.float32)
    if isinstance(model, MC_FCOS):
        # MC_FCOS: one-shot full-detector ladder (models/mcfcos_int8.py);
        # raw-u8 serving via the shared s2d stem fold
        from pytorch_object_detection_tpu.models.mcfcos_int8 import (
            mcfcos_int8_forward,
            quantize_mcfcos,
        )

        u8_input = True
        mc_backend = "xla" if jax.devices()[0].platform == "cpu" else backend
        qtree = quantize_mcfcos(model, variables, calib_images,
                                backend=mc_backend, mean=mean, std=std)
        fwd = lambda qt, p, bs, x: mcfcos_int8_forward(
            model, qt, x, backend=mc_backend, u8_stem=True)
    else:
        int8_fpn = (int8_fpn and isinstance(model, (HISFCOS, FCOS))
                    and (backbone == "resnet50"
                         or backbone.startswith("efficientnet")))
        int8_head = int8_head and int8_fpn
        # u8 serving input: the normalize affine is folded into the exact
        # s2d stem kernel, so the float normalize pass disappears entirely
        # (ResNet-only; the EfficientNet ladder takes normalized floats)
        u8_input = int8_fpn and backbone == "resnet50"
        qtree = quantize_backbone(model, variables, calib_images, mean=mean, std=std)
        if int8_fpn:
            qfpn = quantize_fpn(model, variables, qtree, calib_images)
            if int8_head:
                qhead = quantize_head(model, variables, qtree, qfpn, calib_images)
                qtree = {"backbone": qtree, "fpn": qfpn, "head": qhead}
            else:
                qtree = {"backbone": qtree, "fpn": qfpn}
        fwd = make_eval_forward_int8(model, backend=backend, int8_fpn=int8_fpn,
                                     int8_head=int8_head, u8_input=u8_input)

    def body(qtree, params, batch_stats, images_u8):
        if u8_input:
            x = images_u8  # raw uint8: normalize folded into the stem
        else:
            x = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
        cls_l, cnt_l, reg_l = fwd(qtree, params, batch_stats, x)
        k = len(strides)  # 4-stride eval-compat mode (see make_eval_pipeline)
        assert k in (len(cls_l), len(cls_l) - 1), (
            f"{k} strides for a {len(cls_l)}-level model: only the full set "
            f"or the documented ref-compat (levels-1) truncation is allowed")
        return decode_detections(
            cls_l[:k], cnt_l[:k], reg_l[:k], strides, score_threshold,
            nms_iou, max_detections, canvas_hw, nms_impl=nms_impl,
        )

    if device_resize:
        from pytorch_object_detection_tpu.data.pipeline import make_device_resize

        resize = make_device_resize(canvas_hw)

        def inner(qtree, params, batch_stats, tiles_u8, src_hw):
            canvas_u8, _, _ = resize(tiles_u8, src_hw)
            return body(qtree, params, batch_stats, canvas_u8)
    else:
        inner = body

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from pytorch_object_detection_tpu.parallel.mesh import DATA_AXIS

        data_args = 2 if device_resize else 1
        inner = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(), P()) + (P(DATA_AXIS),) * data_args,
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    # qtree rides as a jit ARGUMENT: a large closure-captured array would
    # make XLA constant-fold through the remote-compile tunnel (PERF.md)
    jitted = jax.jit(inner)
    pinned: dict = {}

    def _pinned_call(params, batch_stats, view_u8, *extra):
        # 5D RGBX view fast path: pin the frame buffer's layout to
        # row-major (== the Pallas stem operand constraint) so XLA inserts
        # no relayout copy — worth ~4 ms at B=128 (PERF.md r3)
        if not pinned:
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            pinned["fmt"] = Format(Layout(major_to_minor=(0, 1, 2, 3, 4)),
                                   SingleDeviceSharding(jax.devices()[0]))
            pinned["fn"] = jax.jit(
                inner,
                in_shardings=(None, None, None, pinned["fmt"])
                + (None,) * len(extra),
            )
        view_u8 = jax.device_put(view_u8, pinned["fmt"])
        return pinned["fn"](qtree, params, batch_stats, view_u8, *extra)

    def pipeline(params, batch_stats, images_u8, *extra):
        nd = getattr(images_u8, "ndim", 0)
        if (u8_input and mesh is None and not device_resize
                and isinstance(images_u8, np.ndarray)
                and jax.devices()[0].platform == "tpu"):
            if nd == 4 and images_u8.shape[-1] == 3:
                # host-pad RGB -> RGBX (X is ignored: its folded stem
                # weights are zero) so the device runs the zero-prep path
                b, h, w, _ = images_u8.shape
                rgbx = np.empty((b, h, w, 4), np.uint8)
                rgbx[..., :3] = images_u8
                images_u8, nd = rgbx, 4
            if nd == 4 and images_u8.shape[-1] == 4:
                # RGBX canvas -> free host view of the same bytes
                b, h, w, _ = images_u8.shape
                images_u8 = np.ascontiguousarray(images_u8).reshape(
                    b, h // 2, 2, w // 2, 8)
                nd = 5
            if nd == 5:
                return _pinned_call(params, batch_stats, images_u8, *extra)
        return jitted(qtree, params, batch_stats, images_u8, *extra)

    return pipeline


def collect_voc_predictions(
    pipeline,
    params,
    batch_stats,
    dataset,
    batch_size: int = 16,
    num_workers: int = 8,
    mesh=None,
    process_count: Optional[int] = None,
    process_index: Optional[int] = None,
    use_ring_loader: bool = False,
):
    """Run the eval pipeline over this process's dataset shard.

    Returns per-image lists (gt_boxes, gt_labels, pred_boxes, pred_labels,
    pred_scores, image_ids) in original-image coordinates.  Multi-host eval
    = each process collects its shard, the union of the lists across
    processes covers every image exactly once (tested in
    tests/test_end_to_end.py::test_sharded_eval_union_matches_single).

    ``use_ring_loader``: feed from data/pipeline.RingTileLoader (batched
    native decode into a preallocated ring — no per-image Python; requires
    a raw-tiles VOC-style dataset).  Same batches, faster host (PERF.md r5
    "loader ceiling").
    """
    if use_ring_loader:
        from pytorch_object_detection_tpu.data.pipeline import RingTileLoader

        loader = RingTileLoader(
            dataset, batch_size, shuffle=False, drop_last=False,
            pad_last=True, decode_threads=num_workers,
            process_count=process_count, process_index=process_index,
        )
    else:
        loader = DetectionLoader(
            dataset, batch_size, shuffle=False, drop_last=False, num_workers=num_workers,
            pad_last=True, process_count=process_count, process_index=process_index,
        )
    raw_tiles = bool(getattr(dataset, "raw_tiles", False))
    gt_boxes, gt_labels, pred_boxes, pred_labels, pred_scores, ids = [], [], [], [], [], []
    for batch in loader:
        src_hw = (np.stack([batch.content_h, batch.content_w], 1).astype(np.int32)
                  if raw_tiles else None)
        det = _run_pipeline(pipeline, params, batch_stats, batch.images, mesh, src_hw)
        for i, (b, c, s) in enumerate(_collect(det, batch.scales, batch.n_valid)):
            gt_valid = batch.labels[i] > 0
            gt_boxes.append(batch.boxes[i][gt_valid] / batch.scales[i])
            gt_labels.append(batch.labels[i][gt_valid])
            pred_boxes.append(b)
            pred_labels.append(c)
            pred_scores.append(s)
            ids.append(batch.image_ids[i])
    return gt_boxes, gt_labels, pred_boxes, pred_labels, pred_scores, ids


def evaluate_voc(
    model,
    params,
    batch_stats,
    dataset,
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    batch_size: int = 16,
    num_classes: int = 20,
    iou_threshold: float = 0.5,
    num_workers: int = 8,
    verbose: bool = True,
    mesh=None,
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    process_count: Optional[int] = None,
    process_index: Optional[int] = None,
    pipeline=None,
    use_ring_loader: bool = False,
) -> Dict:
    """Full VOC eval: per-class AP@0.5, mAP, images/sec (reference test.py).

    Pass a Mesh to shard each eval batch over the 'data' axis (params stay
    replicated; batch_size must divide by the mesh's data size).
    process_count/index override the loader's multi-host shard (testing).
    ``pipeline`` injects a custom jitted (params, batch_stats, images_u8) ->
    Detections program (e.g. the int8 serving pipeline, see
    :func:`make_eval_pipeline_int8`).  ``use_ring_loader``: see
    :func:`collect_voc_predictions`.
    """
    canvas_hw = dataset.canvas_hw
    if pipeline is None:
        pipeline = _default_pipeline(
            model, strides, canvas_hw, score_threshold, nms_iou, max_detections,
            device_resize=bool(getattr(dataset, "raw_tiles", False)),
        )
    t0 = time.perf_counter()
    gt_boxes, gt_labels, pred_boxes, pred_labels, pred_scores, _ids = collect_voc_predictions(
        pipeline, params, batch_stats, dataset, batch_size, num_workers,
        mesh=mesh, process_count=process_count, process_index=process_index,
        use_ring_loader=use_ring_loader,
    )
    n_images = len(gt_boxes)
    elapsed = time.perf_counter() - t0

    aps = eval_voc_ap(
        gt_boxes, gt_labels, pred_boxes, pred_labels, pred_scores, iou_threshold, num_classes
    )
    result = {
        "per_class_ap": aps,
        "mAP": mean_ap(aps),
        "images_per_sec": n_images / elapsed,
        "num_images": n_images,
    }
    if verbose:
        names = getattr(dataset, "class_names", None)
        for cls, ap in sorted(aps.items()):
            label = names[cls - 1] if names else str(cls)
            print(f"ap for {label} is {ap}")
        print(f"mAP=====>{result['mAP']:.3f}  ({result['images_per_sec']:.1f} img/s)")
    return result


def evaluate_coco(
    model,
    params,
    batch_stats,
    dataset,
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    batch_size: int = 16,
    num_workers: int = 8,
    results_json: Optional[str] = None,
    verbose: bool = True,
    mesh=None,
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    process_count: Optional[int] = None,
    process_index: Optional[int] = None,
    pipeline=None,
) -> Dict:
    """COCO-protocol eval; optionally dumps a results JSON
    (xyxy -> xywh, original coords — reference Test_coco.py:144-177).
    ``pipeline`` overrides the default bf16 forward (e.g.
    :func:`make_eval_pipeline_int8` for the serving path)."""
    import json

    canvas_hw = dataset.canvas_hw
    num_classes = len(dataset.class_names)
    if pipeline is None:
        pipeline = _default_pipeline(
            model, strides, canvas_hw, score_threshold, nms_iou, max_detections
        )
    loader = DetectionLoader(
        dataset, batch_size, shuffle=False, drop_last=False, num_workers=num_workers,
        pad_last=True, process_count=process_count, process_index=process_index,
    )
    evaluator = COCOEvaluator(num_classes)
    json_records = []
    n_images = 0
    t0 = time.perf_counter()
    for batch in loader:
        det = _run_pipeline(pipeline, params, batch_stats, batch.images, mesh)
        collected = _collect(det, batch.scales, batch.n_valid)
        for i, (b, c, s) in enumerate(collected):
            image_id = int(batch.image_ids[i])
            gt_valid = batch.labels[i] > 0
            gt_b = batch.boxes[i][gt_valid] / batch.scales[i]
            gt_l = batch.labels[i][gt_valid]
            crowd_flags = np.zeros(len(gt_l), bool)
            if hasattr(dataset, "eval_crowds"):
                # crowd regions: ignore GTs with COCOeval iscrowd semantics
                cb, cl = dataset.eval_crowds(image_id)
                if len(cl):
                    gt_b = np.concatenate([gt_b, cb])
                    gt_l = np.concatenate([gt_l, cl])
                    crowd_flags = np.concatenate([crowd_flags, np.ones(len(cl), bool)])
            evaluator.add_image(image_id, gt_b, gt_l, b, c, s, gt_crowd=crowd_flags)
            if results_json is not None:
                for box, cls_id, score in zip(b, c, s):
                    x1, y1, x2, y2 = [float(v) for v in box]
                    json_records.append(
                        {
                            "image_id": image_id,
                            "category_id": int(dataset.contig_to_cat[int(cls_id)]),
                            "bbox": [x1, y1, x2 - x1, y2 - y1],
                            "score": float(score),
                        }
                    )
        n_images += batch.n_valid
    elapsed = time.perf_counter() - t0

    if results_json is not None:
        with open(results_json, "w") as f:
            json.dump(json_records, f)

    stats = evaluator.summarize()
    stats["images_per_sec"] = n_images / elapsed
    stats["num_images"] = n_images
    if verbose:
        for k, v in stats.items():
            print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
    return stats
