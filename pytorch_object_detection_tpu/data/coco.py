"""MS-COCO dataset: pure-JSON index (no pycocotools dependency on the hot path).

Covers the reference `COCODataset` / `COCOGenerator` capability
(`/root/reference/dataset/coco.py:21-165`, `Test_coco.py:14-117`):
crowd/degenerate filtering, xywh->xyxy, contiguous category remapping,
aspect-preserving resize with the carried ``scale`` for un-resizing eval
boxes.  Same fixed-canvas static-shape policy as data/voc.py.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from pytorch_object_detection_tpu.data.voc import Sample, resize_to_canvas


class COCODataset:
    def __init__(
        self,
        image_dir: str,
        annotation_file: str,
        canvas_hw: Tuple[int, int] = (896, 1408),
        filter_empty: bool = True,
        min_size: float = 1.0,
        augment=None,
    ):
        self.image_dir = image_dir
        self.canvas_hw = canvas_hw
        self.augment = augment
        with open(annotation_file) as f:
            coco = json.load(f)

        # contiguous 1-based category remap (reference coco.py:51-52)
        cat_ids = sorted(c["id"] for c in coco["categories"])
        self.cat_to_contig: Dict[int, int] = {c: i + 1 for i, c in enumerate(cat_ids)}
        self.contig_to_cat: Dict[int, int] = {v: k for k, v in self.cat_to_contig.items()}
        self.class_names = [
            c["name"] for c in sorted(coco["categories"], key=lambda c: c["id"])
        ]

        anns_by_img = defaultdict(list)
        crowds_by_img = defaultdict(list)
        for a in coco.get("annotations", []):
            x, y, w, h = a["bbox"]
            if a.get("iscrowd", 0):
                # crowd regions are excluded from training targets (reference
                # coco.py:123-133) but kept for eval: COCOeval treats them as
                # ignore regions that absorb detections
                crowds_by_img[a["image_id"]].append(
                    (x, y, x + w, y + h, self.cat_to_contig[a["category_id"]])
                )
                continue
            if w < min_size or h < min_size:
                continue
            anns_by_img[a["image_id"]].append((x, y, x + w, y + h, self.cat_to_contig[a["category_id"]]))

        self.images: List[dict] = []
        for img in coco["images"]:
            if filter_empty and not anns_by_img.get(img["id"]):
                continue
            self.images.append(img)
        self.anns_by_img = anns_by_img
        self.crowds_by_img = crowds_by_img

    def eval_crowds(self, image_id) -> Tuple[np.ndarray, np.ndarray]:
        """Crowd (iscrowd) boxes/labels for one image, original coordinates
        (xyxy, contiguous labels) — feed to COCOEvaluator as gt_crowd rows."""
        rows = self.crowds_by_img.get(int(image_id), [])
        if not rows:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
        arr = np.asarray(rows, np.float32)
        return arr[:, :4], arr[:, 4].astype(np.int32)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int) -> Sample:
        from pytorch_object_detection_tpu.data.decode import decode_image

        info = self.images[index]
        path = os.path.join(self.image_dir, info["file_name"])
        img = decode_image(path)
        anns = self.anns_by_img.get(info["id"], [])
        if anns:
            arr = np.asarray(anns, np.float32)
            boxes, labels = arr[:, :4], arr[:, 4].astype(np.int32)
        else:
            boxes = np.zeros((0, 4), np.float32)
            labels = np.zeros((0,), np.int32)
        if self.augment is not None:
            img, boxes = self.augment(img, boxes)
        canvas, boxes, scale, content_hw = resize_to_canvas(img, boxes, self.canvas_hw)
        return Sample(canvas, boxes, labels, scale, str(info["id"]), content_hw)
