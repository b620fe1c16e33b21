"""Aux components: deformable conv, dcnt loss, SWA, GradCAM, profiling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_object_detection_tpu.nn.deform import DeformableConv, deform_sample
from pytorch_object_detection_tpu.ops.losses import fcos_loss
from pytorch_object_detection_tpu.train.swa import swa_init, swa_lr, swa_update
from pytorch_object_detection_tpu.utils.profile import StepTimer, device_memory_stats


def test_deformable_conv_equals_regular_conv_at_init():
    """Zero-init offsets/modulator -> DCN == plain conv with the same kernel."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    m = DeformableConv(features=8, kernel=3)
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 8)

    # same computation via lax conv with the reshaped kernel
    kernel = np.asarray(v["params"]["kernel"]).reshape(3, 3, 16, 8)
    want = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_deform_sample_identity_offsets():
    img = jnp.arange(16.0).reshape(1, 4, 4, 1)
    offsets = jnp.zeros((1, 4, 4, 18))
    taps = deform_sample(img, offsets, 3)
    # center tap (index 4) equals the pixel itself
    np.testing.assert_allclose(np.asarray(taps[0, 1, 2, 4, 0]), float(img[0, 1, 2, 0]))
    # out-of-bounds taps are zero (corner top-left tap of pixel (0,0))
    np.testing.assert_allclose(np.asarray(taps[0, 0, 0, 0, 0]), 0.0)


def test_dcnt_loss_mode_runs_and_masks():
    b, n = 2, 6
    out = fcos_loss(
        jnp.zeros((b, n, 3)),
        jnp.zeros((b, n, 1)),
        jnp.ones((b, n, 4)),
        jnp.ones((b, n, 1), jnp.int32),
        jnp.concatenate([jnp.ones((b, 3, 1)), -jnp.ones((b, 3, 1))], axis=1),
        jnp.ones((b, n, 4)),
        mode="giou",
        cnt_mode="dcnt",
    )
    assert np.isfinite(float(out["cnt"]))
    # dcnt of identical reg pred/target has zero distance term; equal to bce part
    assert float(out["cnt"]) > 0


def test_swa_uniform_average():
    p0 = {"w": jnp.zeros(3)}
    s = swa_init(p0)
    s = swa_update(s, {"w": jnp.ones(3) * 2})
    s = swa_update(s, {"w": jnp.ones(3) * 4})
    # avg of [0 replaced... first update: (0 + (2-0)*1/1) = 2; second: 2+(4-2)/2=3
    np.testing.assert_allclose(np.asarray(s.params["w"]), 3.0)
    assert int(s.count) == 2


def test_swa_lr_schedule():
    s = swa_lr(0.01, 0.001, 100)
    np.testing.assert_allclose(float(s(50)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(150)), 0.001, rtol=1e-6)


def test_step_timer_and_memory_stats():
    t = StepTimer()
    rate = t.tick(32)
    assert rate > 0
    stats = device_memory_stats()
    assert stats is None or "bytes_in_use" in stats


@pytest.mark.slow
def test_gradcam_shapes():
    from pytorch_object_detection_tpu.models.fcos import FCOS, HISFCOS
    from pytorch_object_detection_tpu.utils.gradcam import gradcam_fcos

    for ctor in (HISFCOS, FCOS):
        m = ctor(num_classes=4, features=64)
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 128, 3))
        v = m.init(jax.random.PRNGKey(1), img, False)
        cam = gradcam_fcos(m, v, img)
        assert cam.shape == (1, 128, 128)
        assert 0.0 <= cam.min() and cam.max() <= 1.0


@pytest.mark.slow
def test_export_eval_pipeline_roundtrip(tmp_path):
    """Serialize the full detection pipeline and run the deserialized blob."""
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.utils.export import (
        export_eval_pipeline,
        load_exported,
        save_exported,
    )

    hw = (128, 128)
    model = HISFCOS(num_classes=5, features=64)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), False)
    exported = export_eval_pipeline(
        model, v["params"], v.get("batch_stats", {}), 2, hw, max_detections=50
    )
    path = str(tmp_path / "pipeline.jaxexport")
    save_exported(exported, path)
    loaded = load_exported(path)

    images = np.random.default_rng(0).integers(0, 255, (2, *hw, 3), np.uint8)
    det = loaded.call(jnp.asarray(images))
    scores, classes, boxes, valid = det
    assert boxes.shape == (2, 50, 4)
    # must match the live pipeline
    from pytorch_object_detection_tpu.eval.evaluator import make_eval_pipeline

    live = make_eval_pipeline(model, (8, 16, 32, 64, 128), hw, max_detections=50)(
        v["params"], v.get("batch_stats", {}), jnp.asarray(images)
    )
    np.testing.assert_allclose(np.asarray(scores), np.asarray(live.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(live.valid))


@pytest.mark.slow
def test_remat_train_step_matches_baseline():
    from pytorch_object_detection_tpu.data.synthetic import synthetic_batch
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.train.trainer import create_train_state, make_train_step

    hw = (128, 128)
    strides = [8, 16, 32, 64, 128]
    shapes = [(hw[0] // s, hw[1] // s) for s in strides]
    ranges = [(-1, 32), (32, 96), (96, 192), (192, 384), (384, 9999999)]
    model = HISFCOS(num_classes=5, features=64)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, *hw, 3), {"lr": 1e-2})
    imgs, boxes, labels = synthetic_batch(jax.random.PRNGKey(1), 2, hw, 5, max_boxes=8)

    s_base, m_base = make_train_step(model, shapes, strides, ranges, compute_dtype=jnp.float32, donate=False)(
        state, imgs, boxes, labels
    )
    s_remat, m_remat = make_train_step(
        model, shapes, strides, ranges, compute_dtype=jnp.float32, donate=False, remat=True
    )(state, imgs, boxes, labels)
    np.testing.assert_allclose(float(m_base["total"]), float(m_remat["total"]), rtol=1e-6)
    a = jax.tree_util.tree_leaves(s_base.params["head"])[0]
    b = jax.tree_util.tree_leaves(s_remat.params["head"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_export_int8_serving_roundtrip(tmp_path):
    """The FULL int8 serving pipeline (u8 input, quantized weights baked)
    serializes and the deserialized artifact matches the live pipeline."""
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.utils.export import (
        export_eval_pipeline_int8,
        load_exported,
        save_exported,
    )

    hw = (128, 128)
    model = HISFCOS(num_classes=5, features=64)
    v = jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)))
    calib = jax.random.uniform(jax.random.PRNGKey(1), (2, *hw, 3), jnp.float32)
    exported = export_eval_pipeline_int8(
        model, v, calib, 2, hw, max_detections=50,
        backend="xla", nms_impl="fixpoint",  # CPU-testable backends
    )
    path = str(tmp_path / "pipeline_int8.jaxexport")
    save_exported(exported, path)
    loaded = load_exported(path)

    images = np.random.default_rng(0).integers(0, 255, (2, *hw, 3), np.uint8)
    scores, classes, boxes, valid = loaded.call(jnp.asarray(images))
    assert boxes.shape == (2, 50, 4)

    from pytorch_object_detection_tpu.eval.evaluator import make_eval_pipeline_int8

    live = make_eval_pipeline_int8(
        model, v, calib, (8, 16, 32, 64, 128), hw, max_detections=50,
        backend="xla", nms_impl="fixpoint",
    )(v["params"], v.get("batch_stats", {}), jnp.asarray(images))
    # the deserialized StableHLO recompiles with (on CPU) different
    # reduction vectorization -> float-order diffs -> occasional 1-LSB
    # int8 flips; on the TPU platform the round-trip is exact (verified
    # on-device).  Tolerance here covers the CPU re-lowering.
    np.testing.assert_allclose(np.asarray(scores), np.asarray(live.scores), atol=5e-3)
