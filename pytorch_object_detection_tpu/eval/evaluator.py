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
):
    """One jitted program: normalize -> forward -> decode -> NMS."""
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(mean if mean is not None else IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else IMAGENET_STD, jnp.float32)
    fwd = make_eval_forward(model, compute_dtype)

    @jax.jit
    def pipeline(params, batch_stats, images_u8):
        x = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
        cls_l, cnt_l, reg_l = fwd(params, batch_stats, x)
        return decode_detections(
            cls_l, cnt_l, reg_l, strides, score_threshold, nms_iou, max_detections, canvas_hw
        )

    return pipeline


def _run_pipeline(pipeline, params, batch_stats, images, mesh=None):
    """Run the jitted pipeline, optionally with the batch sharded over the
    mesh's data axis (last partial batches fall back to single-device)."""
    x = jnp.asarray(images)
    if mesh is not None:
        from pytorch_object_detection_tpu.parallel.mesh import batch_sharding

        n_data = mesh.shape["data"]
        if x.shape[0] % n_data == 0:
            import jax as _jax

            with mesh:
                x = _jax.device_put(x, batch_sharding(mesh))
                return pipeline(params, batch_stats, x)
    return pipeline(params, batch_stats, x)


def _collect(det, scales, max_out: int = 300):
    """Fetch detections to host, unscale, and trim to valid entries."""
    scores = np.asarray(det.scores)
    classes = np.asarray(det.classes)
    boxes = np.asarray(det.boxes)
    valid = np.asarray(det.valid)
    out = []
    for i in range(scores.shape[0]):
        keep = valid[i]
        b = boxes[i][keep] / scales[i]
        out.append((b[:max_out], classes[i][keep][:max_out], scores[i][keep][:max_out]))
    return out


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
) -> Dict:
    """Full VOC eval: per-class AP@0.5, mAP, images/sec (reference test.py).

    Pass a Mesh to shard each eval batch over the 'data' axis (params stay
    replicated; batch_size must divide by the mesh's data size).
    """
    canvas_hw = dataset.canvas_hw
    pipeline = make_eval_pipeline(
        model, strides, canvas_hw, score_threshold, nms_iou, max_detections
    )
    loader = DetectionLoader(
        dataset, batch_size, shuffle=False, drop_last=False, num_workers=num_workers
    )

    gt_boxes, gt_labels, pred_boxes, pred_labels, pred_scores = [], [], [], [], []
    n_images = 0
    t0 = time.perf_counter()
    for batch in loader:
        det = _run_pipeline(pipeline, params, batch_stats, batch.images, mesh)
        for i, (b, c, s) in enumerate(_collect(det, batch.scales)):
            gt_valid = batch.labels[i] > 0
            gt_boxes.append(batch.boxes[i][gt_valid] / batch.scales[i])
            gt_labels.append(batch.labels[i][gt_valid])
            pred_boxes.append(b)
            pred_labels.append(c)
            pred_scores.append(s)
        n_images += len(batch.images)
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
) -> Dict:
    """COCO-protocol eval; optionally dumps a results JSON
    (xyxy -> xywh, original coords — reference Test_coco.py:144-177)."""
    import json

    canvas_hw = dataset.canvas_hw
    num_classes = len(dataset.class_names)
    pipeline = make_eval_pipeline(
        model, strides, canvas_hw, score_threshold, nms_iou, max_detections
    )
    loader = DetectionLoader(
        dataset, batch_size, shuffle=False, drop_last=False, num_workers=num_workers
    )
    evaluator = COCOEvaluator(num_classes)
    json_records = []
    n_images = 0
    t0 = time.perf_counter()
    for batch in loader:
        det = _run_pipeline(pipeline, params, batch_stats, batch.images, mesh)
        collected = _collect(det, batch.scales)
        for i, (b, c, s) in enumerate(collected):
            image_id = int(batch.image_ids[i])
            gt_valid = batch.labels[i] > 0
            evaluator.add_image(
                image_id,
                batch.boxes[i][gt_valid] / batch.scales[i],
                batch.labels[i][gt_valid],
                b, c, s,
            )
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
        n_images += len(batch.images)
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
