import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.ops.postprocess import decode_detections


def _make_levels(b=2, c=5, shapes=((8, 8), (4, 4)), low=-10.0):
    cls = [jnp.full((b, h, w, c), low) for h, w in shapes]
    cnt = [jnp.full((b, h, w, 1), low) for h, w in shapes]
    reg = [jnp.zeros((b, h, w, 4)) for h, w in shapes]
    return [list(cls), list(cnt), list(reg)]


def test_decode_single_strong_detection():
    cls, cnt, reg = _make_levels()
    # plant one confident detection at level 0, cell (2, 3), class 1 (index 0)
    cls[0] = cls[0].at[:, 2, 3, 1].set(8.0)
    cnt[0] = cnt[0].at[:, 2, 3, 0].set(8.0)
    reg[0] = reg[0].at[:, 2, 3, :].set(jnp.log(jnp.array([8.0, 8.0, 8.0, 8.0])))
    # reg head output is pre-exp in the models (ScaleExp); decode expects the
    # post-exp ltrb, so feed exp'd values directly
    reg[0] = reg[0].at[:, 2, 3, :].set(8.0)

    det = decode_detections(cls, cnt, reg, strides=[8, 16], score_threshold=0.05,
                            nms_iou=0.6, max_detections=10, image_hw=(64, 64))
    assert det.scores.shape == (2, 10)
    assert bool(det.valid[0, 0])
    assert int(det.classes[0, 0]) == 2  # argmax index 1 -> class 2 (1-based)
    # cell (row=2, col=3) at stride 8 -> center (28, 20); box center +- 8
    np.testing.assert_allclose(np.asarray(det.boxes[0, 0]), [20, 12, 36, 28], atol=1e-4)
    # score = sqrt(sigmoid(8)^2) = sigmoid(8)
    np.testing.assert_allclose(float(det.scores[0, 0]), 1 / (1 + np.exp(-8.0)), rtol=1e-5)
    # everything else below threshold
    assert not bool(det.valid[0, 1])


def test_decode_is_batch_consistent():
    cls, cnt, reg = _make_levels(b=2)
    cls[0] = cls[0].at[0, 1, 1, 2].set(6.0)
    cnt[0] = cnt[0].at[0, 1, 1, 0].set(6.0)
    cls[1] = cls[1].at[1, 2, 2, 3].set(6.0)
    cnt[1] = cnt[1].at[1, 2, 2, 0].set(6.0)
    reg = [r + 4.0 for r in reg]
    det = decode_detections(cls, cnt, reg, strides=[8, 16], max_detections=5)
    assert bool(det.valid[0, 0]) and bool(det.valid[1, 0])
    assert int(det.classes[0, 0]) == 3
    assert int(det.classes[1, 0]) == 4


def test_decode_nms_suppresses_duplicates():
    cls, cnt, reg = _make_levels(b=1, shapes=((4, 4),))
    # two adjacent cells predicting (nearly) the same box
    for cell, logit in (((1, 1), 8.0), ((1, 2), 7.0)):
        cls[0] = cls[0].at[0, cell[0], cell[1], 0].set(logit)
        cnt[0] = cnt[0].at[0, cell[0], cell[1], 0].set(logit)
    # cell (1,1) center (12,12); cell (1,2) center (20,12)
    reg[0] = reg[0].at[0, 1, 1].set(jnp.array([10.0, 10.0, 10.0, 10.0]))
    reg[0] = reg[0].at[0, 1, 2].set(jnp.array([18.0, 10.0, 2.0, 10.0]))  # same box
    det = decode_detections(cls, cnt, reg, strides=[8], max_detections=8, nms_iou=0.6)
    kept = np.asarray(det.valid[0])
    assert kept[0]
    assert not kept[1]  # duplicate suppressed


def test_decode_fixed_output_shapes_jit():
    import jax

    cls, cnt, reg = _make_levels()
    f = jax.jit(
        lambda c, n, r: decode_detections(c, n, r, strides=[8, 16], max_detections=16)
    )
    det = f(cls, cnt, reg)
    assert det.boxes.shape == (2, 16, 4)
    assert det.valid.dtype == jnp.bool_
