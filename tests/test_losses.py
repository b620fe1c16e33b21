import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.ops import losses as L


def test_bce_with_logits_golden():
    # reference golden value: BCE(logits=1, target=1) = log(1 + e^-1) = 0.31326
    v = np.asarray(L.bce_with_logits(jnp.ones(()), jnp.ones(())))
    np.testing.assert_allclose(v, 0.3132617, rtol=1e-5)


def test_cnt_loss_reference_golden():
    # mirrors the reference smoke test (model/loss.py:218-221):
    # preds all ones over 5 levels of [2,4,4,1] -> [2,80,1]; targets ones; all positive
    # expected per-sample loss = 0.3133
    b, n = 2, 80
    cls_logits = jnp.zeros((b, n, 20))
    cnt_logits = jnp.ones((b, n, 1))
    reg_preds = jnp.ones((b, n, 4))
    cls_t = jnp.ones((b, n, 1), jnp.int32)
    cnt_t = jnp.ones((b, n, 1))
    reg_t = jnp.ones((b, n, 4))
    out = L.fcos_loss(cls_logits, cnt_logits, reg_preds, cls_t, cnt_t, reg_t, "giou")
    np.testing.assert_allclose(float(out["cnt"]), 0.31326, rtol=1e-4)
    # giou(pred==target) == 1 -> reg loss 0
    np.testing.assert_allclose(float(out["reg"]), 0.0, atol=1e-6)


def test_focal_loss_manual_value():
    # single location, 2 classes, logits 0 -> p=0.5; target class 1
    logits = jnp.zeros((1, 2))
    onehot = jnp.array([[1.0, 0.0]])
    # positive term: -0.25 * 0.5^2 * log(0.5); negative: -0.75 * 0.5^2 * log(0.5)
    expected = (0.25 + 0.75) * 0.25 * np.log(2.0)
    v = float(L.sigmoid_focal_loss(logits, onehot).sum())
    np.testing.assert_allclose(v, expected, rtol=1e-5)


def test_focal_loss_clip_matches_reference_window():
    # huge negative logit -> p clipped at 5e-6; loss for a positive target
    logits = jnp.array([[-100.0]])
    onehot = jnp.array([[1.0]])
    expected = -0.25 * (1 - 5e-6) ** 2 * np.log(5e-6)
    np.testing.assert_allclose(float(L.sigmoid_focal_loss(logits, onehot).sum()), expected, rtol=1e-5)


def test_num_pos_normalization():
    # 2 positives out of 4 locations; cnt loss should divide by 2, not 4
    b, n = 1, 4
    cnt_logits = jnp.ones((b, n, 1))
    cnt_t = jnp.array([[[1.0], [1.0], [-1.0], [-1.0]]])
    cls_logits = jnp.zeros((b, n, 3))
    cls_t = jnp.zeros((b, n, 1), jnp.int32)
    reg = jnp.ones((b, n, 4))
    out = L.fcos_loss(cls_logits, cnt_logits, reg, cls_t, cnt_t, reg, "giou")
    np.testing.assert_allclose(float(out["cnt"]), 0.3132617, rtol=1e-5)


def test_iou_mode_log_loss():
    b, n = 1, 1
    cnt_t = jnp.ones((b, n, 1))
    reg_p = jnp.ones((b, n, 4)) * 2.0  # 4x4 box in ltrb space
    reg_t = jnp.ones((b, n, 4))  # 2x2 -> iou 0.25
    out = L.fcos_loss(
        jnp.zeros((b, n, 2)), jnp.zeros((b, n, 1)), reg_p,
        jnp.ones((b, n, 1), jnp.int32), cnt_t, reg_t, "iou",
    )
    np.testing.assert_allclose(float(out["reg"]), -np.log(0.25), rtol=1e-5)


def test_masked_entries_do_not_poison_gradients():
    import jax

    def loss_fn(reg_p):
        return L.fcos_loss(
            jnp.zeros((1, 2, 3)),
            jnp.zeros((1, 2, 1)),
            reg_p,
            jnp.ones((1, 2, 1), jnp.int32),
            jnp.array([[[0.5], [-1.0]]]),  # second location negative
            jnp.array([[[1.0, 1.0, 1.0, 1.0], [-1.0, -1.0, -1.0, -1.0]]]),
            "giou",
        )["total"]

    g = jax.grad(loss_fn)(jnp.ones((1, 2, 4)))
    assert np.isfinite(np.asarray(g)).all()


def test_flatten_level_preds():
    lv1 = jnp.zeros((2, 4, 4, 20))
    lv2 = jnp.ones((2, 2, 2, 20))
    out = L.flatten_level_preds([lv1, lv2])
    assert out.shape == (2, 20, 20)
    assert float(out[0, 16, 0]) == 1.0


def test_focal_gradient_finite_at_extreme_logits():
    """Stable-sigmoid regression (r5): the naive 1/(1+exp(-x)) form NaN'd
    the focal GRADIENT once background logits passed -88 (exp overflow ->
    inf * 0 in the chain rule) — the r5 RetinaNet convergence run died at
    step ~1.2k through it.  Forward values match the naive form after the
    reference clip window; gradients must be finite at any logit."""
    import jax

    logits = jnp.array([[-200.0, -88.0, -20.0, 0.0, 20.0, 88.0, 200.0]])
    onehot = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0]])

    val = L.sigmoid_focal_loss(logits, onehot)
    assert np.isfinite(np.asarray(val)).all()
    g = jax.grad(lambda x: L.sigmoid_focal_loss(x, onehot).sum())(logits)
    assert np.isfinite(np.asarray(g)).all(), np.asarray(g)

    # anchor-codec loss end to end at extreme logits (the RetinaNet path)
    from pytorch_object_detection_tpu.ops.anchors import retinanet_loss

    cls_t = jnp.array([[3, 0, -1, 0]], jnp.int32)
    loc_t = jnp.zeros((1, 4, 4))
    cls_logits = jnp.full((1, 4, 5), -200.0)
    loc_p = jnp.zeros((1, 4, 4))
    g2 = jax.grad(
        lambda x: retinanet_loss(x, loc_p, cls_t, loc_t, 5)["total"]
    )(cls_logits)
    assert np.isfinite(np.asarray(g2)).all()
