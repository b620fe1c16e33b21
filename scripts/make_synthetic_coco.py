#!/usr/bin/env python
"""Write a disk-backed synthetic COCO-format dataset (80 classes) whose
images ENCODE their boxes — the COCO-canvas sibling of
make_synthetic_voc.py (r5, VERDICT r4 #6: the int8 accuracy contract
needs trained weights at an 80-class COCO-canvas config).

Each of the 80 classes is a distinct (shape, hue) combination (8 shapes x
10 hues) on a textured background; image sizes span the 800x1333
reference eval range so the aspect-preserving resize path is exercised.
Layout: IMAGES_DIR/*.jpg + instances JSON per split, consumed by
data/coco.COCODataset.

Usage: python scripts/make_synthetic_coco.py OUTROOT [--train 240] [--val 48]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_synthetic_voc import _background  # noqa: E402  (shared renderer)

SHAPES8 = ("box", "disc", "tri", "ring", "diamond", "cross", "hbar", "vbar")
HUES10 = (
    (220, 40, 40), (40, 200, 40), (50, 80, 230), (230, 200, 40),
    (200, 60, 220), (40, 210, 210), (240, 130, 30), (140, 90, 40),
    (160, 160, 160), (90, 230, 140),
)


def _draw80(arr, cls, x1, y1, x2, y2, rng) -> None:
    shape = SHAPES8[cls % 8]
    color = np.array(HUES10[cls // 8], np.float32) * rng.uniform(0.75, 1.0)
    h, w = y2 - y1, x2 - x1
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ny = np.abs(yy - cy) / max(h / 2, 1)
    nx = np.abs(xx - cx) / max(w / 2, 1)
    if shape == "box":
        mask = np.ones((h, w), bool)
    elif shape == "disc":
        mask = ny**2 + nx**2 <= 1.0
    elif shape == "tri":
        t = yy / max(h - 1, 1)
        mask = np.abs(xx - cx) <= t * (w / 2)
    elif shape == "ring":
        r2 = ny**2 + nx**2
        mask = (r2 <= 1.0) & (r2 >= 0.36)
    elif shape == "diamond":
        mask = ny + nx <= 1.0
    elif shape == "cross":
        mask = (ny <= 0.34) | (nx <= 0.34)
    elif shape == "hbar":
        mask = ny <= 0.34
    else:  # vbar
        mask = nx <= 0.34
    region = arr[y1:y2, x1:x2].astype(np.float32)
    region[mask] = 0.25 * region[mask] + 0.75 * color
    arr[y1:y2, x1:x2] = np.clip(region, 0, 255).astype(np.uint8)


def make_image(rng, max_objects=8):
    h = int(rng.integers(480, 800))
    w = int(rng.integers(640, 1280))
    arr = _background(h, w, rng)
    n = int(rng.integers(1, max_objects + 1))
    boxes, labels = [], []
    for _ in range(n):
        for _attempt in range(20):
            bw = int(rng.integers(56, min(320, w - 2)))
            bh = int(rng.integers(56, min(320, h - 2)))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            box = np.array([x1, y1, x1 + bw, y1 + bh], np.float32)
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
                cls = int(rng.integers(0, 80))
                _draw80(arr, cls, x1, y1, x1 + bw, y1 + bh, rng)
                boxes.append(box)
                labels.append(cls)
                break
    return arr, boxes, labels


def write_split(root: str, split: str, n: int, rng, start_id: int) -> None:
    from PIL import Image

    img_dir = os.path.join(root, split)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = start_id * 1000
    for k in range(n):
        img_id = start_id + k
        arr, boxes, labels = make_image(rng)
        fname = f"{img_id:012d}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, fname), quality=92)
        images.append({"id": img_id, "file_name": fname,
                       "width": arr.shape[1], "height": arr.shape[0]})
        for b, c in zip(boxes, labels):
            annotations.append({
                "id": ann_id, "image_id": img_id,
                # category ids 1..80 (contiguous remap is identity-shifted)
                "category_id": int(c) + 1,
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "iscrowd": 0,
                "area": float((b[2] - b[0]) * (b[3] - b[1])),
            })
            ann_id += 1
    cats = [{"id": i + 1, "name": f"{SHAPES8[i % 8]}-{i // 8}"} for i in range(80)]
    with open(os.path.join(root, f"instances_{split}.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outroot")
    ap.add_argument("--train", type=int, default=240)
    ap.add_argument("--val", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.outroot, exist_ok=True)
    write_split(args.outroot, "train", args.train, rng, 1)
    write_split(args.outroot, "val", args.val, rng, 100000)
    print(f"wrote {args.train} train + {args.val} val COCO-format images "
          f"under {args.outroot}")


if __name__ == "__main__":
    main()
