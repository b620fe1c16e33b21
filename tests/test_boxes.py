import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_object_detection_tpu.ops import boxes as B


def test_level_coords_matches_reference_grid():
    # stride 8, 2x3 feature map: x in {4, 12, 20}, y in {4, 12}; row-major (y outer)
    c = np.asarray(B.level_coords(2, 3, 8))
    expected = np.array(
        [[4, 4], [12, 4], [20, 4], [4, 12], [12, 12], [20, 12]], dtype=np.float32
    )
    np.testing.assert_allclose(c, expected)


def test_level_coords_odd_stride_integer_offset():
    # reference uses strides // 2 (integer division)
    c = np.asarray(B.level_coords(1, 2, 5))
    np.testing.assert_allclose(c, np.array([[2, 2], [7, 2]], dtype=np.float32))


def test_ltrb_roundtrip():
    coords = jnp.array([[10.0, 20.0], [30.0, 40.0]])
    offsets = jnp.array([[[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]]])  # [1,2,4]
    boxes = B.ltrb_to_boxes(coords, offsets)
    np.testing.assert_allclose(
        np.asarray(boxes[0]), np.array([[9, 18, 13, 24], [25, 34, 37, 48]], np.float32)
    )
    back = B.boxes_to_ltrb(coords, boxes)
    np.testing.assert_allclose(np.asarray(back), np.asarray(offsets))


def test_clip_boxes():
    bx = jnp.array([[-5.0, -3.0, 600.0, 520.0], [10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(B.clip_boxes(bx, 512, 512))
    np.testing.assert_allclose(out[0], [0, 0, 511, 511])
    np.testing.assert_allclose(out[1], [10, 10, 20, 20])


def test_pairwise_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(B.pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou[0], 1.0)
    np.testing.assert_allclose(iou[1], 25.0 / 175.0, rtol=1e-6)
    np.testing.assert_allclose(iou[2], 0.0)


def test_ltrb_iou_giou_identity():
    t = jnp.array([[3.0, 4.0, 5.0, 6.0]])
    np.testing.assert_allclose(np.asarray(B.ltrb_iou(t, t)), [1.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B.ltrb_giou(t, t)), [1.0], rtol=1e-6)


def test_ltrb_giou_hand_value():
    # pred box (from grid point): l,t,r,b = 2,2,2,2 -> 4x4 box; target 1,1,1,1 -> 2x2
    p = jnp.array([[2.0, 2.0, 2.0, 2.0]])
    t = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    # ltrb-space overlap: (min(2,1)+min(2,1)) ** 2 = 4; union = 16 + 4 - 4 = 16
    # enclosing box = (max+max)^2 = 16 -> giou = iou - (16-16)/16 = 0.25
    np.testing.assert_allclose(np.asarray(B.ltrb_iou(p, t)), [0.25], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B.ltrb_giou(p, t)), [0.25], rtol=1e-6)


def test_ltrb_giou_penalty_term():
    # disjoint-ish in ltrb space: pred fully left/top of target center
    p = jnp.array([[4.0, 4.0, -2.0, -2.0]])  # degenerate: r,b negative
    t = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    g = np.asarray(B.ltrb_giou(p, t))[0]
    i = np.asarray(B.ltrb_iou(p, t))[0]
    assert g <= i  # giou includes enclosing-box penalty
