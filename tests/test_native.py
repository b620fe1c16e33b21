"""Native C++ runtime ops: build, bind, and match the numpy references."""
import numpy as np
import pytest

from pytorch_object_detection_tpu.native.lib import (
    coco_match_native,
    native_available,
    nms_cpu_native,
    voc_match_native,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ build unavailable")


def _rand_boxes(rng, n, span=300.0):
    xy = rng.uniform(0, span, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 80, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], -1)


def test_voc_match_equals_numpy():
    from pytorch_object_detection_tpu.eval.voc_map import _iou_matrix

    rng = np.random.default_rng(0)
    for _ in range(10):
        gt = _rand_boxes(rng, rng.integers(0, 8))
        preds = _rand_boxes(rng, rng.integers(0, 30))
        got = voc_match_native(gt, preds, 0.5)
        # numpy reference
        assigned = np.zeros(len(gt), bool)
        want = np.zeros(len(preds), bool)
        if len(gt) and len(preds):
            iou = _iou_matrix(gt, preds)
            for j in range(len(preds)):
                best = int(np.argmax(iou[:, j]))
                if iou[best, j] >= 0.5 and not assigned[best]:
                    assigned[best] = True
                    want[j] = True
        np.testing.assert_array_equal(got, want)


def test_nms_cpu_equals_xla_reference():
    import jax.numpy as jnp

    from pytorch_object_detection_tpu.ops.nms import nms_keep_mask

    rng = np.random.default_rng(3)
    boxes = _rand_boxes(rng, 64)
    valid = rng.uniform(size=64) > 0.2
    got = nms_cpu_native(boxes, valid, 0.5)
    want = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
    np.testing.assert_array_equal(got, want)


def test_coco_match_native_vs_python():
    """The full evaluator must produce identical stats with and without the
    native matcher."""
    from pytorch_object_detection_tpu.eval import coco_map

    rng = np.random.default_rng(5)

    def build_eval():
        ev = coco_map.COCOEvaluator(num_classes=3)
        for img in range(4):
            n_gt = int(rng.integers(1, 6))
            gt = _rand_boxes(rng, n_gt)
            gl = rng.integers(1, 4, n_gt)
            n_det = int(rng.integers(0, 12))
            det = _rand_boxes(rng, n_det)
            dl = rng.integers(1, 4, n_det)
            ds = rng.uniform(size=n_det).astype(np.float32)
            ig = rng.uniform(size=n_gt) < 0.2
            ev.add_image(img, gt, gl, det, dl, ds, gt_ignore=ig)
        return ev

    state = rng.bit_generator.state
    ev_native = build_eval()
    stats_native = ev_native.summarize()

    rng.bit_generator.state = state
    ev_py = build_eval()
    import pytorch_object_detection_tpu.native.lib as nl

    orig = nl.native_available
    nl.native_available = lambda: False
    try:
        stats_py = ev_py.summarize()
    finally:
        nl.native_available = orig
    for k in stats_native:
        np.testing.assert_allclose(stats_native[k], stats_py[k], atol=1e-9, err_msg=k)
