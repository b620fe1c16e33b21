"""Independent loop-based transcription of the COCOeval bbox protocol.

Test oracle for eval/coco_map.py (pycocotools is not installable in this
image).  Deliberately written as a direct, slow, per-element transcription
of the published algorithm — COCOeval.evaluateImg / accumulate / summarize
semantics (pycocotools cocoeval.py): per-(image,category) greedy matching
in score order over sorted-ignore-last GTs with the ignore-break rule,
crowd GTs matched with intersection-over-det-area IoU and re-matchable,
maxDets truncation before matching, unmatched out-of-area dets ignored,
101-point interpolated precision with monotone envelope, category means
over categories present in the GT.

Two independent implementations agreeing on randomized hostile fixtures is
the strongest parity evidence available offline; the fixtures (seeded) are
in tests/test_eval_metrics.py.
"""
from __future__ import annotations

import numpy as np

IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
RECALL = [i / 100.0 for i in range(101)]
AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _iou_single(d, g, crowd):
    ix = max(0.0, min(d[2], g[2]) - max(d[0], g[0]))
    iy = max(0.0, min(d[3], g[3]) - max(d[1], g[1]))
    inter = ix * iy
    da = max(0.0, d[2] - d[0]) * max(0.0, d[3] - d[1])
    ga = max(0.0, g[2] - g[0]) * max(0.0, g[3] - g[1])
    denom = da if crowd else (da + ga - inter)
    return inter / denom if denom > 0 else 0.0


class OracleEval:
    """images: list of dicts with keys
    gt_boxes [M,4], gt_labels [M], gt_crowd [M] bool,
    det_boxes [D,4], det_labels [D], det_scores [D]."""

    def __init__(self, num_classes, max_dets=(1, 10, 100)):
        self.num_classes = num_classes
        self.max_dets = max_dets
        self.images = []

    def add_image(self, **kw):
        self.images.append(kw)

    def _evaluate_img(self, img, cls, area, max_det):
        lo, hi = AREAS[area]
        g_sel = [i for i in range(len(img["gt_labels"])) if img["gt_labels"][i] == cls]
        d_sel = [i for i in range(len(img["det_labels"])) if img["det_labels"][i] == cls]
        gts = [img["gt_boxes"][i] for i in g_sel]
        crowd = [bool(img["gt_crowd"][i]) for i in g_sel]
        # gt ignore: crowd or out of area range
        gig = []
        for b, cr in zip(gts, crowd):
            a = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
            gig.append(cr or a < lo or a > hi)
        # dets sorted by score desc (stable), truncated to max_det
        order = sorted(range(len(d_sel)), key=lambda i: -img["det_scores"][d_sel[i]])
        order = order[:max_det]
        dets = [img["det_boxes"][d_sel[i]] for i in order]
        scores = [img["det_scores"][d_sel[i]] for i in order]
        # gt order: non-ignored first (stable)
        gind = sorted(range(len(gts)), key=lambda i: gig[i])
        n_gt = sum(1 for x in gig if not x)

        T, D, G = len(IOU_THRS), len(dets), len(gts)
        dt_m = [[False] * D for _ in range(T)]
        dt_ig = [[False] * D for _ in range(T)]
        for ti, thr in enumerate(IOU_THRS):
            gt_taken = [False] * G
            for di in range(D):
                best = -1
                best_iou = min(thr, 1 - 1e-10)
                for gi_pos in range(G):
                    gi = gind[gi_pos]
                    if gt_taken[gi] and not crowd[gi]:
                        continue
                    if best > -1 and not gig[gind_of(gind, best)] and gig[gi]:
                        break
                    iou = _iou_single(dets[di], gts[gi], crowd[gi])
                    if iou < best_iou:
                        continue
                    best_iou = iou
                    best = gi_pos
                if best == -1:
                    a = (max(0.0, dets[di][2] - dets[di][0])
                         * max(0.0, dets[di][3] - dets[di][1]))
                    if a < lo or a > hi:
                        dt_ig[ti][di] = True
                    continue
                gi = gind[best]
                gt_taken[gi] = True
                if gig[gi]:
                    dt_ig[ti][di] = True
                else:
                    dt_m[ti][di] = True
        return scores, dt_m, dt_ig, n_gt

    def _accumulate(self, area, max_det):
        aps, ars = [], []
        for cls in range(1, self.num_classes + 1):
            scores, ms, igs, n_gt = [], [], [], 0
            for img in self.images:
                s, m, ig, n = self._evaluate_img(img, cls, area, max_det)
                scores.extend(s)
                ms.append(m)
                igs.append(ig)
                n_gt += n
            if n_gt == 0:
                aps.append(None)
                ars.append(None)
                continue
            order = sorted(range(len(scores)), key=lambda i: -scores[i])
            ap_t, ar_t = [], []
            for ti in range(len(IOU_THRS)):
                m_all, ig_all = [], []
                for m, ig in zip(ms, igs):
                    m_all.extend(m[ti])
                    ig_all.extend(ig[ti])
                m_srt = [m_all[i] for i in order]
                ig_srt = [ig_all[i] for i in order]
                tp = fp = 0
                rec, prec = [], []
                for mm, ii in zip(m_srt, ig_srt):
                    if ii:
                        continue
                    if mm:
                        tp += 1
                    else:
                        fp += 1
                    rec.append(tp / n_gt)
                    prec.append(tp / (tp + fp))
                if not rec:
                    ap_t.append(0.0)
                    ar_t.append(0.0)
                    continue
                for i in range(len(prec) - 1, 0, -1):
                    prec[i - 1] = max(prec[i - 1], prec[i])
                q = []
                for r in RECALL:
                    # searchsorted side='left'
                    idx = next((i for i, rv in enumerate(rec) if rv >= r), None)
                    q.append(prec[idx] if idx is not None else 0.0)
                ap_t.append(sum(q) / len(q))
                ar_t.append(rec[-1])
            aps.append(ap_t)
            ars.append(ar_t)
        return aps, ars

    def summarize(self):
        def mean_valid(per_cls, ti=None):
            vals = []
            for v in per_cls:
                if v is None:
                    continue
                vals.extend(v if ti is None else [v[ti]])
            return sum(vals) / len(vals) if vals else 0.0

        ap, ar = self._accumulate("all", self.max_dets[-1])
        out = {
            "AP": mean_valid(ap),
            "AP50": mean_valid(ap, 0),
            "AP75": mean_valid(ap, 5),
            "AR@100": mean_valid(ar),
        }
        for area in ("small", "medium", "large"):
            ap_a, ar_a = self._accumulate(area, self.max_dets[-1])
            out[f"AP_{area}"] = mean_valid(ap_a)
            out[f"AR_{area}"] = mean_valid(ar_a)
        for md in self.max_dets[:-1]:
            _, ar_md = self._accumulate("all", md)
            out[f"AR@{md}"] = mean_valid(ar_md)
        return out


def gind_of(gind, pos):
    return gind[pos]
