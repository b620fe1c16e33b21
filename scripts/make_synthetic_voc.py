#!/usr/bin/env python
"""Write a disk-backed synthetic VOC dataset whose images ENCODE their boxes.

Each of the 20 VOC classes is a distinct (shape, hue) combination drawn on a
textured background, so a detector must actually read pixels to localize and
classify — unlike the in-memory `--synthetic` stream (noise images, random
boxes) this gives a learnable, generalizable signal with a held-out split.
Used by the r3 convergence run (VERDICT r2 #9): train on `trainval`,
evaluate rising mAP on the disjoint `test` split through the standard
VOCDataset/DetectionLoader/evaluate_voc path (reference layout:
dataset/voc.py:35-60 — JPEGImages/ Annotations/ ImageSets/Main/).

Usage: python scripts/make_synthetic_voc.py OUTROOT [--train 320] [--val 64]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_object_detection_tpu.data.voc import VOC_CLASSES

# class id -> (shape kind, RGB). 4 shapes x 5 hues = 20 distinct looks.
SHAPES = ("box", "disc", "tri", "ring")
HUES = ((220, 40, 40), (40, 200, 40), (50, 80, 230), (230, 200, 40), (200, 60, 220))


def _draw(arr: np.ndarray, cls: int, x1: int, y1: int, x2: int, y2: int, rng) -> None:
    shape = SHAPES[cls % 4]
    color = np.array(HUES[cls // 4], np.float32) * rng.uniform(0.75, 1.0)
    h, w = y2 - y1, x2 - x1
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    if shape == "box":
        mask = np.ones((h, w), bool)
    elif shape == "disc":
        mask = ((yy - cy) / (h / 2)) ** 2 + ((xx - cx) / (w / 2)) ** 2 <= 1.0
    elif shape == "tri":  # upward triangle spanning the box
        t = yy / max(h - 1, 1)  # 0 at top .. 1 at base
        mask = np.abs(xx - cx) <= t * (w / 2)
    else:  # ring
        r2 = ((yy - cy) / (h / 2)) ** 2 + ((xx - cx) / (w / 2)) ** 2
        mask = (r2 <= 1.0) & (r2 >= 0.36)
    region = arr[y1:y2, x1:x2].astype(np.float32)
    region[mask] = 0.25 * region[mask] + 0.75 * color
    arr[y1:y2, x1:x2] = np.clip(region, 0, 255).astype(np.uint8)


def _background(h: int, w: int, rng) -> np.ndarray:
    """Low-frequency textured background (upsampled noise + gradient)."""
    coarse = rng.integers(40, 200, (h // 32 + 2, w // 32 + 2, 3), np.uint8)
    ys = np.linspace(0, coarse.shape[0] - 1.001, h)
    xs = np.linspace(0, coarse.shape[1] - 1.001, w)
    yi, xi = ys.astype(int), xs.astype(int)
    img = coarse[yi][:, xi].astype(np.float32)
    img += rng.normal(0, 12, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def make_image(rng, min_side=320, max_side=500, max_objects=6):
    h = int(rng.integers(min_side, max_side))
    w = int(rng.integers(min_side, max_side))
    arr = _background(h, w, rng)
    n = int(rng.integers(1, max_objects + 1))
    boxes, labels = [], []
    for _ in range(n):
        for _attempt in range(20):
            bw = int(rng.integers(40, min(220, w - 2)))
            bh = int(rng.integers(40, min(220, h - 2)))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            box = np.array([x1, y1, x1 + bw, y1 + bh], np.float32)
            # keep pairwise IoU low so shapes stay identifiable
            ok = True
            for b in boxes:
                ix = max(0, min(box[2], b[2]) - max(box[0], b[0]))
                iy = max(0, min(box[3], b[3]) - max(box[1], b[1]))
                inter = ix * iy
                union = bw * bh + (b[2] - b[0]) * (b[3] - b[1]) - inter
                if inter / union > 0.3:
                    ok = False
                    break
            if ok:
                cls = int(rng.integers(0, 20))
                _draw(arr, cls, x1, y1, x1 + bw, y1 + bh, rng)
                boxes.append(box)
                labels.append(cls)
                break
    return arr, boxes, labels


def write_split(root: str, ids, rng) -> None:
    from PIL import Image

    for img_id in ids:
        arr, boxes, labels = make_image(rng)
        Image.fromarray(arr).save(os.path.join(root, "JPEGImages", f"{img_id}.jpg"), quality=92)
        objs = "\n".join(
            f"  <object><name>{VOC_CLASSES[c]}</name><difficult>0</difficult>"
            f"<bndbox><xmin>{int(b[0]) + 1}</xmin><ymin>{int(b[1]) + 1}</ymin>"
            f"<xmax>{int(b[2]) + 1}</xmax><ymax>{int(b[3]) + 1}</ymax></bndbox></object>"
            for b, c in zip(boxes, labels)
        )
        with open(os.path.join(root, "Annotations", f"{img_id}.xml"), "w") as f:
            f.write(f"<annotation>\n{objs}\n</annotation>\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outroot")
    ap.add_argument("--train", type=int, default=320)
    ap.add_argument("--val", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    root = args.outroot
    for d in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    rng = np.random.default_rng(args.seed)
    train_ids = [f"tr{i:05d}" for i in range(args.train)]
    val_ids = [f"va{i:05d}" for i in range(args.val)]
    write_split(root, train_ids, rng)
    write_split(root, val_ids, rng)
    with open(os.path.join(root, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(os.path.join(root, "ImageSets", "Main", "test.txt"), "w") as f:
        f.write("\n".join(val_ids) + "\n")
    print(f"wrote {args.train} train + {args.val} val images under {root}")


if __name__ == "__main__":
    main()
