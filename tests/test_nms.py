import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.ops.nms import batched_class_nms, nms_keep_mask


def _py_greedy_nms(boxes, valid, thresh):
    """Independent reference greedy NMS (boxes pre-sorted by score)."""
    n = len(boxes)
    keep = []
    suppressed = [not v for v in valid]
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in range(i + 1, n):
            if suppressed[j]:
                continue
            xa1, ya1, xa2, ya2 = boxes[i]
            xb1, yb1, xb2, yb2 = boxes[j]
            iw = max(0.0, min(xa2, xb2) - max(xa1, xb1))
            ih = max(0.0, min(ya2, yb2) - max(ya1, yb1))
            inter = iw * ih
            ua = (xa2 - xa1) * (ya2 - ya1) + (xb2 - xb1) * (yb2 - yb1) - inter
            if ua > 0 and inter / ua > thresh:
                suppressed[j] = True
    mask = np.zeros(n, bool)
    mask[keep] = True
    return mask


def test_nms_matches_python_reference_random():
    rng = np.random.default_rng(0)
    for _ in range(5):
        k = 64
        xy = rng.uniform(0, 100, (k, 2))
        wh = rng.uniform(5, 40, (k, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        valid = rng.uniform(size=k) > 0.2
        got = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
        want = _py_greedy_nms(boxes, valid, 0.5)
        np.testing.assert_array_equal(got, want)


def test_nms_basic_suppression():
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # highest score
            [1.0, 1.0, 11.0, 11.0],  # iou ~0.68 -> suppressed at 0.5
            [20.0, 20.0, 30.0, 30.0],  # disjoint -> kept
        ]
    )
    keep = np.asarray(nms_keep_mask(boxes, jnp.ones(3, bool), 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_invalid_boxes_do_not_suppress():
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # invalid (below threshold)
            [1.0, 1.0, 11.0, 11.0],  # valid, would be suppressed by [0]
        ]
    )
    keep = np.asarray(nms_keep_mask(boxes, jnp.array([False, True]), 0.5))
    np.testing.assert_array_equal(keep, [False, True])


def test_class_aware_nms_keeps_cross_class_overlaps():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    classes = jnp.array([1, 2])
    keep = np.asarray(
        batched_class_nms(boxes, jnp.array([0.9, 0.8]), classes, jnp.ones(2, bool), 0.5)
    )
    np.testing.assert_array_equal(keep, [True, True])
    same = np.asarray(
        batched_class_nms(boxes, jnp.array([0.9, 0.8]), jnp.array([1, 1]), jnp.ones(2, bool), 0.5)
    )
    np.testing.assert_array_equal(same, [True, False])
