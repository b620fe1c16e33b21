#!/usr/bin/env python
"""COCO val2017 evaluation (replaces the reference's Test_coco.py / code_test.py).

    python scripts/eval_coco.py --config config/main.yaml --checkpoint <dir>

Batched device pipeline; dumps `coco_bbox_results.json` and prints the
12-number COCO summary (own evaluator; pycocotools used when available).
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
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--results-json", default="coco_bbox_results.json")
    ap.add_argument("--int8", action="store_true",
                    help="int8-PTQ serving pipeline (calibrated on the first batch)")
    args = ap.parse_args()

    from pytorch_object_detection_tpu.core import config as C
    from pytorch_object_detection_tpu.data.coco import COCODataset
    from pytorch_object_detection_tpu.eval.evaluator import evaluate_coco
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

    ds_cfg = cfg["dataset_setting"]
    dataset = COCODataset(ds_cfg["ValData"], ds_cfg["ValAnnotation"], canvas, filter_empty=False)
    eval_cfg = block.get("eval", {})
    strides = C.strides(cfg) if "stride" in block else (8, 16, 32, 64, 128)
    pipeline = None
    if args.int8:
        assert cfg["model"]["name"] != "SSD300", (
            "--int8 covers the ResNet-50 families (FCOS-family + RetinaNet); "
            "SSD300 (VGG backbone) evaluates on the bf16 path")
        import jax.numpy as jnp

        from pytorch_object_detection_tpu.data.pipeline import (
            IMAGENET_MEAN,
            IMAGENET_STD,
            DetectionLoader,
        )
        from pytorch_object_detection_tpu.eval.evaluator import make_eval_pipeline_int8

        calib_batch = next(iter(DetectionLoader(
            dataset, min(args.batch_size, 8), shuffle=False, drop_last=False, num_workers=2)))
        calib = (jnp.asarray(calib_batch.images, jnp.float32) / 255.0
                 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if cfg["model"]["name"] == "RETINANET":
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
                calib, C.strides(cfg), canvas,
                score_threshold=float(eval_cfg.get("score_threshold", 0.05)),
                nms_iou=float(eval_cfg.get("nms_iou", 0.6)),
                max_detections=int(eval_cfg.get("max_detections", 1000)),
                nms_impl="auto",
                backend="xla" if os.environ.get("PODT_FORCE_CPU") else "pallas_block",
            )
    stats = evaluate_coco(
        model, state.params, state.batch_stats, dataset,
        strides=strides, batch_size=args.batch_size, results_json=args.results_json,
        score_threshold=float(eval_cfg.get("score_threshold", 0.05)),
        nms_iou=float(eval_cfg.get("nms_iou", 0.6)),
        max_detections=int(eval_cfg.get("max_detections", 1000)),
        pipeline=pipeline,
    )
    # official numbers when pycocotools exists (metric parity)
    try:
        from pytorch_object_detection_tpu.eval.coco_map import evaluate_coco_official

        official = evaluate_coco_official(args.results_json, ds_cfg["ValAnnotation"])
        print("pycocotools:", official)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
