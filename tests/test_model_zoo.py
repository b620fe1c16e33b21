"""Shape/param smoke tests for the wider model zoo + anchor codec
(mirrors the reference's per-model __main__ blocks, SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_object_detection_tpu.models.mcfcos import MC_FCOS
from pytorch_object_detection_tpu.models.retinanet import RetinaNet
from pytorch_object_detection_tpu.models.ssd import SSD300, default_boxes
from pytorch_object_detection_tpu.nn.efficientnet import EfficientNet
from pytorch_object_detection_tpu.nn.mobilenet import MobileNetV2
from pytorch_object_detection_tpu.nn.vgg import VGG16
from pytorch_object_detection_tpu.ops import anchors as A
from pytorch_object_detection_tpu.utils.model_info import count_params


def _shape_init(model, shape, train=False):
    return jax.eval_shape(
        lambda r, x: model.init(r, x, train), jax.random.PRNGKey(0), jnp.zeros(shape)
    )


def _shape_apply(model, variables, shape, train=False):
    return jax.eval_shape(
        lambda v, x: model.apply(v, x, train), variables, jnp.zeros(shape)
    )


def test_efficientnet_b0_endpoints():
    m = EfficientNet.b0()
    v = _shape_init(m, (1, 512, 512, 3))
    assert count_params(v["params"]) == 3_595_388
    outs = _shape_apply(m, v, (1, 512, 512, 3))
    assert [o.shape[1] for o in outs] == [256, 128, 64, 32, 16]
    assert outs[-1].shape[-1] == 320


def test_mobilenet_v2_taps():
    m = MobileNetV2()
    v = _shape_init(m, (1, 256, 256, 3))
    outs = _shape_apply(m, v, (1, 256, 256, 3))
    assert [tuple(o.shape[1:]) for o in outs] == [(32, 32, 32), (16, 16, 96), (8, 8, 320)]


def test_vgg16_ssd_taps():
    m = VGG16()
    v = _shape_init(m, (1, 300, 300, 3))
    c4, c7 = _shape_apply(m, v, (1, 300, 300, 3))
    assert tuple(c4.shape[1:]) == (38, 38, 512)  # ceil-mode pool3: 75 -> 38
    assert tuple(c7.shape[1:]) == (19, 19, 1024)


def test_ssd300_output_is_8732_boxes():
    m = SSD300(num_classes=21)
    v = _shape_init(m, (1, 300, 300, 3))
    loc, conf = _shape_apply(m, v, (1, 300, 300, 3))
    assert loc.shape == (1, 8732, 4)
    assert conf.shape == (1, 8732, 21)
    assert default_boxes(300).shape == (8732, 4)


def test_retinanet_output_layout():
    m = RetinaNet(num_classes=20)
    v = _shape_init(m, (1, 256, 256, 3))
    loc, cls = _shape_apply(m, v, (1, 256, 256, 3))
    n = sum((256 // s) ** 2 * 9 for s in (8, 16, 32, 64, 128))
    assert loc.shape == (1, n, 4)
    assert cls.shape == (1, n, 20)


def test_mcfcos_four_levels():
    m = MC_FCOS(num_classes=20, features=64)
    v = _shape_init(m, (1, 128, 128, 3))
    cls, cnt, reg = _shape_apply(m, v, (1, 128, 128, 3))
    assert [c.shape[1] for c in cls] == [16, 8, 4, 2]  # strides 8,16,32,64
    assert cls[0].shape[-1] == 20 and reg[0].shape[-1] == 4


def test_anchor_generation_and_codec_roundtrip():
    shapes = [(8, 8), (4, 4)]
    anchors = A.generate_anchors(shapes, [8, 16])
    assert anchors.shape == ((64 + 16) * 9, 4)
    # encode a GT then decode the matched anchor's offsets -> recovers the GT
    gt = jnp.array([[[10.0, 10.0, 50.0, 50.0]]])
    labels = jnp.array([[3]], jnp.int32)
    loc, cls = A.encode_targets(anchors, gt, labels)
    assert loc.shape == (1, anchors.shape[0], 4)
    pos = np.asarray(cls[0]) == 3
    assert pos.sum() > 0  # some anchor matched at IoU >= 0.5
    decoded = A.decode_boxes(anchors, loc[0])
    np.testing.assert_allclose(np.asarray(decoded[pos]), [[10, 10, 50, 50]] * pos.sum(), atol=1e-3)
    # ignore band exists betwen neg and pos
    vals = set(np.unique(np.asarray(cls)))
    assert vals <= {-1, 0, 3}


def test_retinanet_loss_decreases_on_positive_fit():
    shapes = [(8, 8)]
    anchors = A.generate_anchors(shapes, [8])
    gt = jnp.array([[[8.0, 8.0, 40.0, 40.0]]])
    labels = jnp.array([[2]], jnp.int32)
    loc_t, cls_t = A.encode_targets(anchors, gt, labels)
    # perfect predictions -> tiny loss; wrong predictions -> bigger
    perfect_cls = jnp.where(
        (jnp.arange(1, 6)[None, None, :] == cls_t[..., None]), 9.0, -9.0
    )
    good = A.retinanet_loss(perfect_cls, loc_t, cls_t, loc_t, 5)
    bad = A.retinanet_loss(-perfect_cls, loc_t + 2.0, cls_t, loc_t, 5)
    assert float(good["total"]) < float(bad["total"])
    np.testing.assert_allclose(float(good["reg"]), 0.0, atol=1e-7)


def test_registry_includes_zoo():
    from pytorch_object_detection_tpu.models.registry import available_models, build_model

    assert {"FCOS", "HISFCOS", "MNFCOS", "MC_FCOS", "RETINANET", "SSD300"} <= set(available_models())
    # registry convention: callers pass the dataset's FOREGROUND count and
    # SSD300 gets its explicit background class added (reference ssd.py
    # num_class=21 for VOC's 20 classes)
    m = build_model("SSD300", num_classes=20)
    assert m.num_classes == 21


def test_anchor_decode_detections_end_to_end():
    """RetinaNet-style decode: plant one confident anchor, recover its box."""
    import jax
    from pytorch_object_detection_tpu.ops.anchors import decode_anchor_detections

    shapes = [(8, 8)]
    anchors = A.generate_anchors(shapes, [8])
    n = anchors.shape[0]
    loc = jnp.zeros((1, n, 4))  # zero offsets -> boxes == anchors
    cls = jnp.full((1, n, 4), -9.0)
    cls = cls.at[0, 17, 2].set(8.0)  # anchor 17, class index 2 -> label 3
    det = decode_anchor_detections(anchors, loc, cls, "sigmoid", 0.3, 0.5, 20, (64, 64))
    assert bool(det.valid[0, 0])
    assert int(det.classes[0, 0]) == 3
    want = np.clip(np.asarray(anchors[17]), 0, 63)
    np.testing.assert_allclose(np.asarray(det.boxes[0, 0]), want, atol=1e-4)
    assert int(det.valid.sum()) == 1


def test_ssd_softmax_decode():
    import jax
    from pytorch_object_detection_tpu.models.ssd import default_boxes
    from pytorch_object_detection_tpu.ops.anchors import decode_anchor_detections

    boxes = default_boxes(300)
    n = boxes.shape[0]
    loc = jnp.zeros((1, n, 4))
    conf = jnp.zeros((1, n, 21))  # 21 classes incl background
    conf = conf.at[0, 100, 5].set(10.0)
    det = decode_anchor_detections(boxes, loc, conf, "softmax_bg0", 0.5, 0.45, 50)
    assert bool(det.valid[0, 0])
    assert int(det.classes[0, 0]) == 5  # softmax_bg0 drops bg then 1-bases


def test_multibox_loss_hard_negative_mining():
    """3:1 mining keeps exactly the hardest negatives (hand-computed)."""
    import jax

    N, C1 = 6, 4  # 1+3 classes
    cls_t = jnp.array([[1, 0, 0, 0, 0, 0]], jnp.int32)  # 1 pos, 5 negs
    loc_t = jnp.zeros((1, N, 4))
    # logits: negative anchors have increasing background confidence
    # => CE(neg) decreasing with index => mining keeps indices 1,2,3
    logits = np.zeros((1, N, C1), np.float32)
    logits[0, 0, 1] = 5.0  # positive well classified
    for i, conf in enumerate([0.0, 1.0, 2.0, 3.0, 4.0], start=1):
        logits[0, i, 0] = conf
    out = A.multibox_loss(jnp.asarray(logits), loc_t, cls_t, loc_t)

    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    want_cls = -(logp[0, 0, 1] + logp[0, 1, 0] + logp[0, 2, 0] + logp[0, 3, 0])
    np.testing.assert_allclose(float(out["cls"]), float(want_cls), rtol=1e-6)
    assert float(out["reg"]) == 0.0


def test_multibox_loss_orders_good_vs_bad():
    shapes = [(4, 4)]
    anchors = A.generate_anchors(shapes, [8], sizes=[8.0], ratios=(1.0,), scales=(1.0,))
    boxes = jnp.array([[[0.0, 0.0, 8.0, 8.0], [-1.0] * 4]])  # == first anchor
    labels = jnp.array([[2, -1]], jnp.int32)
    loc_t, cls_t = A.encode_targets(anchors, boxes, labels, pos_iou=0.5, neg_iou=0.5)
    assert int((cls_t > 0).sum()) >= 1
    n = anchors.shape[0]
    onehot = np.full((1, n, 5), -4.0, np.float32)
    for i in range(n):
        onehot[0, i, max(int(cls_t[0, i]), 0)] = 4.0
    good = A.multibox_loss(jnp.asarray(onehot), loc_t, cls_t, loc_t)
    bad = A.multibox_loss(-jnp.asarray(onehot), loc_t + 2.0, cls_t, loc_t)
    assert float(good["total"]) < float(bad["total"])


@pytest.mark.slow
def test_ssd_train_step_loss_decreases():
    """SSD MultiBox training path end-to-end (VERDICT r1 missing #5)."""
    from pytorch_object_detection_tpu.models.ssd import SSD300, default_boxes
    from pytorch_object_detection_tpu.train.trainer import create_train_state, make_anchor_train_step

    model = SSD300(num_classes=6)  # background + 5
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 300, 300, 3), {"lr": 1e-3})
    anchors = default_boxes(300)
    step = make_anchor_train_step(
        model, anchors, 5, compute_dtype=jnp.float32, donate=False,
        pos_iou=0.5, neg_iou=0.5, loss="multibox",
    )
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 300, 300, 3))
    boxes = jnp.array([[[30.0, 40.0, 160.0, 200.0], [-1.0] * 4]])
    labels = jnp.array([[2, -1]], jnp.int32)
    losses = []
    for _ in range(3):
        state, metrics = step(state, imgs, boxes, labels)
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
