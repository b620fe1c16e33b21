#!/usr/bin/env python
"""Detection + GradCAM visualization (replaces the reference's
visualization.py, whose main path was left incomplete).

    python scripts/visualize.py --config config/main.yaml --image path.jpg \
        [--checkpoint dir] [--out overlay.jpg]
"""
from __future__ import annotations

import argparse
import os
import sys

import jax

if __import__("os").environ.get("PODT_FORCE_CPU"):
    # test hook: the axon plugin ignores JAX_PLATFORMS, force via config
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/main.yaml")
    ap.add_argument("--image", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--out", default="overlay.jpg")
    ap.add_argument("--score-threshold", type=float, default=0.3)
    args = ap.parse_args()

    import cv2
    from PIL import Image

    from pytorch_object_detection_tpu.core import config as C
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from pytorch_object_detection_tpu.data.voc import resize_to_canvas
    from pytorch_object_detection_tpu.eval.evaluator import _default_pipeline
    from pytorch_object_detection_tpu.models.registry import build_model
    from pytorch_object_detection_tpu.train import checkpoints as ckpt
    from pytorch_object_detection_tpu.train.trainer import create_train_state
    from pytorch_object_detection_tpu.utils.gradcam import gradcam_fcos, overlay_heatmap

    cfg = C.load_config(args.config)
    block = C.model_block(cfg)
    canvas = C.canvas_hw(cfg)
    model = build_model(cfg["model"]["name"], C.num_classes(cfg), int(block["channel"]))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, *canvas, 3))
    if args.checkpoint:
        state = ckpt.restore_checkpoint(args.checkpoint, state)

    raw = np.asarray(Image.open(args.image).convert("RGB"))
    canvas_img, _, scale, _ = resize_to_canvas(raw, None, canvas)

    strides = C.strides(cfg) if "stride" in block else (8, 16, 32, 64, 128)
    pipeline = _default_pipeline(model, strides, canvas, args.score_threshold,
                                 0.6, 1000)
    det = pipeline(state.params, state.batch_stats, jnp.asarray(canvas_img[None]))

    if cfg["model"]["name"] in ("RETINANET", "SSD300"):
        # GradCAM targets the FCOS-family heads (matching the reference's
        # visualization.py scope); anchor models get the detection overlay
        overlay = canvas_img.copy()
    else:
        # gradcam heatmap over the normalized input
        norm = (canvas_img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        cam = gradcam_fcos(model, {"params": state.params, "batch_stats": state.batch_stats},
                           jnp.asarray(norm[None]))[0]
        overlay = overlay_heatmap(canvas_img, cam)

    names = cfg["dataset_setting"]["class"]
    valid = np.asarray(det.valid[0])
    boxes = np.asarray(det.boxes[0])[valid]
    classes = np.asarray(det.classes[0])[valid]
    scores = np.asarray(det.scores[0])[valid]
    for b, c, s in zip(boxes, classes, scores):
        x1, y1, x2, y2 = [int(v) for v in b]
        cv2.rectangle(overlay, (x1, y1), (x2, y2), (0, 255, 0), 2)
        label = names[int(c) - 1] if int(c) - 1 < len(names) else str(int(c))
        cv2.putText(overlay, f"{label} {s:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    cv2.imwrite(args.out, cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
    print(f"{len(boxes)} detections -> {args.out} (scale {scale:.3f})")


if __name__ == "__main__":
    main()
