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


def test_pallas_nms_adversarial_ties_degenerate_exact_threshold():
    """Adversarial agreement case for all three NMS implementations (Pallas
    kernel, XLA fixpoint, C++ oracle): duplicate boxes with tied scores,
    zero-area boxes, and a pair whose IoU equals the threshold exactly
    (strict `>` contract: not suppressed).  All coordinates are small
    integers so the IoUs are exactly representable in f32 and f64."""
    from pytorch_object_detection_tpu.native.lib import native_available, nms_cpu_native
    from pytorch_object_detection_tpu.ops.nms import nms_keep_mask

    boxes_np = np.array([
        [0, 0, 10, 10],   # 0: kept (first of three exact duplicates)
        [0, 0, 10, 10],   # 1: suppressed by 0 (IoU 1)
        [0, 0, 10, 10],   # 2: suppressed by 0
        [5, 5, 5, 5],     # 3: zero-area -> IoU 0 with everything, kept
        [5, 5, 5, 5],     # 4: zero-area duplicate; IoU(3,4)=0/0 -> 0, kept
        [20, 0, 24, 3],   # 5: kept
        [20, 0, 22, 3],   # 6: IoU vs 5 = 6/12 = 0.5 == thr exactly -> kept
        [20, 0, 23, 3],   # 7: IoU vs 5 = 9/12 = 0.75 > thr -> suppressed
        [50, 50, 60, 60], # 8: invalid input
    ], np.float32)
    n = len(boxes_np)
    valid_np = np.ones(n, bool)
    valid_np[8] = False
    want = np.array([1, 0, 0, 1, 1, 1, 1, 0, 0], bool)

    boxes = jnp.asarray(boxes_np)[None]
    scores = jnp.asarray(np.linspace(1.0, 0.5, n, dtype=np.float32))[None]
    classes = jnp.ones((1, n), jnp.int32)
    valid = jnp.asarray(valid_np)[None]

    got_xla = np.asarray(nms_keep_mask(boxes[0], valid[0], 0.5))
    got_pallas = np.asarray(
        pallas_batched_class_nms(boxes, scores, classes, valid, 0.5, interpret=True)
    )[0]
    np.testing.assert_array_equal(got_xla, want)
    np.testing.assert_array_equal(got_pallas, want)
    if native_available():
        got_cpp = nms_cpu_native(boxes_np, valid_np, 0.5)
        np.testing.assert_array_equal(got_cpp, want)


def test_resolve_nms_impl_auto(monkeypatch):
    """auto -> fixpoint on the CPU test backend; env override wins."""
    from pytorch_object_detection_tpu.ops.postprocess import resolve_nms_impl

    assert resolve_nms_impl("auto") == "fixpoint"  # conftest forces CPU
    assert resolve_nms_impl("pallas") == "pallas"
    monkeypatch.setenv("PODT_NMS", "pallas")
    assert resolve_nms_impl("auto") == "pallas"
    assert resolve_nms_impl("fixpoint") == "pallas"


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
