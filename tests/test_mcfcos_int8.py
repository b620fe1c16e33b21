"""MC_FCOS int8 PTQ ladder (models/mcfcos_int8.py): BN-folded MCBlock
FFM/FPN/refine + shared 4-conv head on the int8 ResNet-50, vs the float
model (reference /root/reference/model/od/Mc_Fcos.py:9-223)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.mark.slow
def test_mcfcos_int8_close_to_float():
    from pytorch_object_detection_tpu.models.mcfcos import MC_FCOS
    from pytorch_object_detection_tpu.models.mcfcos_int8 import (
        mcfcos_int8_forward,
        quantize_mcfcos,
    )

    m = MC_FCOS(num_classes=20)
    v = jax.jit(lambda r, x: m.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3)).astype(np.float32))
    q = quantize_mcfcos(m, v, calib, backend="xla")

    x = jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3)).astype(np.float32))
    cls_i, cnt_i, reg_i = jax.jit(
        lambda x: mcfcos_int8_forward(m, q, x, backend="xla"))(x)
    cls_f, cnt_f, reg_f = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, x, False)
    assert len(cls_i) == len(cls_f) == 4
    for i in range(4):
        assert cls_i[i].shape == cls_f[i].shape
        assert cnt_i[i].shape == cnt_f[i].shape
        assert reg_i[i].shape == reg_f[i].shape
    cos_cls = min(_cos(a, b) for a, b in zip(cls_i, cls_f))
    cos_reg = min(_cos(a, b) for a, b in zip(reg_i, reg_f))
    assert cos_cls > 0.99, cos_cls
    assert cos_reg > 0.99, cos_reg
