#!/usr/bin/env python
"""VOC07-test evaluation (replaces the reference's test.py).

    python scripts/eval_voc.py --config config/main.yaml --checkpoint <dir/path>

Batched on-device decode+NMS (the reference is batch-1 only); prints
per-class AP@0.5, mAP, and images/sec.
"""
from __future__ import annotations

import argparse
import os
import sys

import jax

if __import__("os").environ.get("PODT_FORCE_CPU"):
    # test hook: the axon plugin ignores JAX_PLATFORMS, force via config
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/main.yaml")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--torch-checkpoint", default="", help=".pth detector checkpoint to convert")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--split", default="test")
    ap.add_argument("--int8", action="store_true",
                    help="serve through the int8-PTQ backbone (fused Pallas "
                         "kernels); calibrates on the first eval batch")
    ap.add_argument("--device-resize", action="store_true",
                    help="north-star input pipeline: host only JPEG-decodes "
                         "into fixed uint8 tiles; the aspect-preserving "
                         "resize runs batched ON DEVICE inside the eval "
                         "program (data/pipeline.make_device_resize)")
    ap.add_argument("--ref-4stride", action="store_true",
                    help="eval-compat mode: decode only the first 4 pyramid "
                         "levels, reproducing the reference's silent zip-"
                         "truncation (test.py:176 passes strides=[8,16,32,"
                         "64] for a 5-level model); quantifies that delta")
    args = ap.parse_args()

    from pytorch_object_detection_tpu.core import config as C
    from pytorch_object_detection_tpu.data.voc import VOCDataset
    from pytorch_object_detection_tpu.eval.evaluator import evaluate_voc
    from pytorch_object_detection_tpu.models.registry import build_model
    from pytorch_object_detection_tpu.train import checkpoints as ckpt
    from pytorch_object_detection_tpu.train.trainer import create_train_state

    cfg = C.load_config(args.config)
    block = C.model_block(cfg)
    canvas = C.canvas_hw(cfg)
    model = build_model(cfg["model"]["name"], C.num_classes(cfg), int(block["channel"]))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, *canvas, 3))
    if args.checkpoint:
        state = ckpt.restore_checkpoint(args.checkpoint, state)

    ds_root = cfg["dataset_setting"].get("test_07", cfg["dataset_setting"].get("train_07"))
    dataset = VOCDataset([ds_root], args.split, canvas,
                         raw_tiles=args.device_resize)
    eval_cfg = block.get("eval", {})  # optional overrides of the reference defaults
    strides = C.strides(cfg) if "stride" in block else (8, 16, 32, 64, 128)
    if args.ref_4stride:
        assert cfg["model"]["name"] not in ("RETINANET", "SSD300"), (
            "--ref-4stride is a FCOS-family eval-compat mode")
        strides = tuple(strides)[:4]
    pipeline = None
    if args.int8:
        import jax.numpy as jnp
        import numpy as np

        from pytorch_object_detection_tpu.data.pipeline import (
            IMAGENET_MEAN,
            IMAGENET_STD,
            DetectionLoader,
        )
        from pytorch_object_detection_tpu.eval.evaluator import make_eval_pipeline_int8

        # calibration always uses host-resized CANVAS images (the raw-tile
        # dataset carries unresized tiles, the wrong distribution)
        calib_ds = (VOCDataset([ds_root], args.split, canvas)
                    if args.device_resize else dataset)
        calib_batch = next(iter(DetectionLoader(
            calib_ds, min(args.batch_size, 8), shuffle=False, drop_last=False, num_workers=2)))
        calib = (jnp.asarray(calib_batch.images, jnp.float32) / 255.0
                 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if cfg["model"]["name"] in ("RETINANET", "SSD300"):
            from pytorch_object_detection_tpu.eval.evaluator import (
                make_eval_pipeline_anchor_int8,
            )

            pipeline = make_eval_pipeline_anchor_int8(
                model, {"params": state.params, "batch_stats": state.batch_stats},
                calib, canvas,
                score_threshold=float(eval_cfg.get("score_threshold", 0.05)),
                nms_iou=float(eval_cfg.get("nms_iou", 0.5)),
                max_detections=int(eval_cfg.get("max_detections", 1000)),
                backend="xla" if os.environ.get("PODT_FORCE_CPU") else "pallas_block",
            )
        else:
            pipeline = make_eval_pipeline_int8(
                model, {"params": state.params, "batch_stats": state.batch_stats},
                calib, strides, canvas,
                score_threshold=float(eval_cfg.get("score_threshold", 0.05)),
                nms_iou=float(eval_cfg.get("nms_iou", 0.6)),
                max_detections=int(eval_cfg.get("max_detections", 1000)),
                nms_impl="auto",
                backend="xla" if os.environ.get("PODT_FORCE_CPU") else "pallas_block",
                device_resize=args.device_resize,
            )
    evaluate_voc(
        model, state.params, state.batch_stats, dataset,
        strides=strides, batch_size=args.batch_size, num_classes=C.num_classes(cfg),
        score_threshold=float(eval_cfg.get("score_threshold", 0.05)),
        nms_iou=float(eval_cfg.get("nms_iou", 0.6)),
        max_detections=int(eval_cfg.get("max_detections", 1000)),
        pipeline=pipeline,
    )


if __name__ == "__main__":
    main()
