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


def test_fused_resnet_matches_linen():
    """Pallas fused-epilogue ResNet forward == linen forward (fp32)."""
    import jax

    from pytorch_object_detection_tpu.nn.fused_resnet import resnet50_fused_forward
    from pytorch_object_detection_tpu.nn.resnet import ResNet50

    m = ResNet50()
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(1), img, False)
    want = m.apply(v, img, False)
    got = resnet50_fused_forward(v, img, compute_dtype=jnp.float32, interpret=True)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4)


def test_matmul_bn_act_epilogue():
    from pytorch_object_detection_tpu.ops.pallas_fused import matmul_bn_act

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    got = matmul_bn_act(x, w, scale, shift, res, act=True, interpret=True)
    want = np.maximum(np.asarray(x) @ np.asarray(w) * np.asarray(scale) + np.asarray(shift) + np.asarray(res), 0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
