import numpy as np

from pytorch_object_detection_tpu.eval.coco_map import COCOEvaluator
from pytorch_object_detection_tpu.eval.voc_map import average_precision, eval_voc_ap, mean_ap


def test_voc_ap_perfect_predictions():
    gt_b = [np.array([[10.0, 10, 50, 50], [60, 60, 90, 90]])]
    gt_l = [np.array([1, 2])]
    aps = eval_voc_ap(gt_b, gt_l, gt_b, gt_l, [np.array([0.9, 0.8])], 0.5, 2)
    assert aps[1] == 1.0 and aps[2] == 1.0
    assert mean_ap(aps) == 1.0


def test_voc_ap_missed_gt():
    gt_b = [np.array([[10.0, 10, 50, 50], [60, 60, 90, 90]])]
    gt_l = [np.array([1, 1])]
    pred_b = [np.array([[10.0, 10, 50, 50]])]
    pred_l = [np.array([1])]
    aps = eval_voc_ap(gt_b, gt_l, pred_b, pred_l, [np.array([0.9])], 0.5, 1)
    assert abs(aps[1] - 0.5) < 1e-9  # one of two GTs found, no FP


def test_voc_ap_duplicate_detection_is_fp():
    gt_b = [np.array([[10.0, 10, 50, 50]])]
    gt_l = [np.array([1])]
    pred_b = [np.array([[10.0, 10, 50, 50], [11, 11, 51, 51]])]
    pred_l = [np.array([1, 1])]
    aps = eval_voc_ap(gt_b, gt_l, pred_b, pred_l, [np.array([0.9, 0.8])], 0.5, 1)
    # first matches, duplicate is FP after recall saturates -> AP stays 1.0
    assert aps[1] == 1.0
    # but if the duplicate scores HIGHER, it takes the GT and the true one is FP
    aps2 = eval_voc_ap(gt_b, gt_l, pred_b, pred_l, [np.array([0.5, 0.8])], 0.5, 1)
    assert aps2[1] == 1.0  # still: higher-scored dup matches (IoU>0.5), other is FP


def test_voc_ap_score_ordering_matters():
    # FP scored above the TP drags precision at the TP's recall point
    gt_b = [np.array([[10.0, 10, 50, 50]])]
    gt_l = [np.array([1])]
    pred_b = [np.array([[200.0, 200, 250, 250], [10, 10, 50, 50]])]
    pred_l = [np.array([1, 1])]
    aps = eval_voc_ap(gt_b, gt_l, pred_b, pred_l, [np.array([0.9, 0.8])], 0.5, 1)
    assert abs(aps[1] - 0.5) < 1e-9  # precision at recall 1 is 1/2


def test_average_precision_envelope():
    ap = average_precision(np.array([0.5, 1.0]), np.array([1.0, 0.5]))
    assert abs(ap - 0.75) < 1e-9


def test_coco_perfect_detection():
    ev = COCOEvaluator(num_classes=2)
    gt = np.array([[10.0, 10, 60, 60]])
    ev.add_image(1, gt, np.array([1]), gt, np.array([1]), np.array([0.9]))
    stats = ev.summarize()
    assert stats["AP"] == 1.0
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 1.0


def test_coco_partial_iou_detection():
    ev = COCOEvaluator(num_classes=1)
    gt = np.array([[0.0, 0, 100, 100]])
    det = np.array([[0.0, 0, 100, 62.0]])  # IoU = 0.62
    ev.add_image(1, gt, np.array([1]), det, np.array([1]), np.array([0.9]))
    stats = ev.summarize()
    # passes thresholds .50, .55, .60 only -> AP = 3/10
    assert abs(stats["AP"] - 0.3) < 1e-6
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 0.0


def test_coco_area_ranges():
    ev = COCOEvaluator(num_classes=1)
    small_gt = np.array([[0.0, 0, 10, 10]])  # area 100 < 32^2
    ev.add_image(1, small_gt, np.array([1]), small_gt, np.array([1]), np.array([0.9]))
    stats = ev.summarize()
    assert stats["AP_small"] == 1.0
    assert stats["AP_large"] == 0.0  # no large GT -> NaN -> 0


def test_coco_crowd_ignore_absorbs_detection():
    ev = COCOEvaluator(num_classes=1)
    gt = np.array([[0.0, 0, 100, 100], [200.0, 200, 300, 300]])
    ignore = np.array([False, True])
    det = np.array([[0.0, 0, 100, 100], [200.0, 200, 300, 300]])
    ev.add_image(1, gt, np.array([1, 1]), det, np.array([1, 1]), np.array([0.9, 0.8]), gt_ignore=ignore)
    stats = ev.summarize()
    # det on the ignored GT neither helps nor hurts
    assert stats["AP"] == 1.0


def test_coco_false_positive_hurts():
    ev = COCOEvaluator(num_classes=1)
    gt = np.array([[0.0, 0, 100, 100]])
    det = np.array([[0.0, 0, 100, 100], [300.0, 300, 400, 400]])
    ev.add_image(1, gt, np.array([1]), det, np.array([1, 1]), np.array([0.8, 0.9]))
    stats = ev.summarize()
    assert stats["AP50"] < 1.0  # higher-scored FP caps precision at low recall
