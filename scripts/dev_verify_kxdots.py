"""Verify kxdots stem refactor: full int8 serving pipeline on the REAL TPU,
detections must be bit-identical between kxdots=True (new default) and the
old 16-piece im2col form (kxdots=False), driven through the public API."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.models.fcos import HISFCOS
from pytorch_object_detection_tpu.ops.postprocess import decode_detections
from pytorch_object_detection_tpu.train.trainer import (
    make_eval_forward_int8, quantize_backbone, quantize_fpn, quantize_head)
from pytorch_object_detection_tpu.ops import pallas_qstem

HW = (512, 512)
B = 8
STRIDES = [8, 16, 32, 64, 128]

model = HISFCOS(num_classes=20)
variables = jax.jit(lambda r, x: model.init(r, x, False))(
    jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3), jnp.float32))
params, batch_stats = variables["params"], variables.get("batch_stats", {})
calib = jax.random.uniform(jax.random.PRNGKey(1), (8, *HW, 3), jnp.float32)
qtree = quantize_backbone(model, variables, calib)
qfpn = quantize_fpn(model, variables, qtree, calib)
qtree = {"backbone": qtree, "fpn": qfpn}
qtree["head"] = quantize_head(model, variables, qtree["backbone"], qfpn, calib)

fwd = make_eval_forward_int8(
    model, compute_dtype=jnp.bfloat16, fuse_strided=True,
    int8_fpn=True, int8_head=True, u8_input=True)

images = jax.random.randint(
    jax.random.PRNGKey(2), (B, HW[0] // 2, 2, HW[1] // 2, 8), 0, 256, jnp.uint8)


def run():
    @jax.jit
    def pipe(qtree, params, batch_stats, images):
        cls_l, cnt_l, reg_l = fwd(qtree, params, batch_stats, images)
        return decode_detections(
            cls_l, cnt_l, reg_l, STRIDES, score_threshold=0.05,
            nms_iou=0.6, max_detections=1000, image_hw=HW, nms_impl="pallas")
    det = pipe(qtree, params, batch_stats, images)
    return jax.device_get((det.boxes, det.scores, det.classes, det.valid))


orig = pallas_qstem.qstem_conv
b_new, s_new, c_new, v_new = run()
pallas_qstem.qstem_conv = functools.partial(orig, kxdots=False)
b_old, s_old, c_old, v_old = run()
pallas_qstem.qstem_conv = orig

import numpy as np
assert v_new.sum() > 0, "no detections at all"
for name, a, b in [("boxes", b_new, b_old), ("scores", s_new, s_old),
                   ("classes", c_new, c_old), ("valid", v_new, v_old)]:
    exact = np.array_equal(np.asarray(a), np.asarray(b))
    print(f"{name}: bit-identical={exact}")
    assert exact, name
print(f"OK: {int(v_new.sum())} detections across B={B}, kxdots bit-identical"
      f" to 16-piece form on {jax.devices()[0].platform}:{jax.devices()[0]}")
