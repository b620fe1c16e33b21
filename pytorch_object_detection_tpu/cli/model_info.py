#!/usr/bin/env python
"""Model summary: params, per-module breakdown, output shapes, FLOPs.

TPU-native `model_info` entry point (replaces the reference's per-model
torchinfo __main__ blocks, e.g. model/od/HISFcos.py:232-235).

    python scripts/model_info.py --model HISFCOS [--classes 20] [--size 512]
"""
from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="HISFCOS")
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument("--features", type=int, default=256)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # shape-only analysis: no TPU needed

    from pytorch_object_detection_tpu.models.registry import build_model
    from pytorch_object_detection_tpu.utils.model_info import model_info

    model = build_model(args.model, args.classes, args.features)
    info = model_info(model, (args.batch, args.size, args.size, 3))
    print(f"{args.model} @ {args.batch}x{args.size}x{args.size}x3")
    print(f"  total params: {info['params']:,}")
    for mod, n in info["params_by_module"].items():
        print(f"    {mod}: {n:,}")
    if "batch_stats" in info:
        print(f"  batch_stats (BN moments): {info['batch_stats']:,}")
    if info.get("flops"):
        print(f"  forward FLOPs: {info['flops'] / 1e9:.2f} G  (mult-adds ~{info['flops'] / 2e9:.2f} G)")
    print("  output shapes:", info["output_shapes"])


if __name__ == "__main__":
    main()
