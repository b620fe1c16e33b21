"""Pallas NMS kernel vs the XLA reference implementation (interpret mode on
the CPU test backend; the compiled kernel is exercised on TPU by bench/eval)."""
import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.ops.nms import batched_class_nms
from pytorch_object_detection_tpu.ops.pallas_nms import pallas_batched_class_nms


def test_pallas_nms_matches_xla():
    rng = np.random.default_rng(7)
    b, k = 4, 200
    xy = rng.uniform(0, 300, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, (b, k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    classes = jnp.asarray(rng.integers(1, 6, (b, k)))
    scores = jnp.asarray(np.sort(rng.uniform(size=(b, k)))[:, ::-1].copy())
    valid = jnp.asarray(rng.uniform(size=(b, k)) > 0.15)

    want = np.asarray(batched_class_nms(boxes, scores, classes, valid, 0.6))
    got = np.asarray(
        pallas_batched_class_nms(boxes, scores, classes, valid, 0.6, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_nms_batch_padding():
    # batch not a multiple of the tile
    rng = np.random.default_rng(1)
    b, k = 3, 130  # k not a multiple of 128 either
    xy = rng.uniform(0, 100, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(5, 30, (b, k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    classes = jnp.ones((b, k), jnp.int32)
    scores = jnp.asarray(np.sort(rng.uniform(size=(b, k)))[:, ::-1].copy())
    valid = jnp.ones((b, k), bool)
    want = np.asarray(batched_class_nms(boxes, scores, classes, valid, 0.5))
    got = np.asarray(
        pallas_batched_class_nms(boxes, scores, classes, valid, 0.5, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
