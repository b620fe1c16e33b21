"""RetinaNet int8 PTQ ladder (models/retinanet_int8.py): BN-folded RetinaFPN
+ plain-ReLU subnets on top of the shared int8 ResNet-50, vs the float model.
"""
from __future__ import annotations

import os
import pytest

# compile-heavy (measured in PARITY.md); the fast tier covers this
# subsystem through its cherry-picked/fast siblings
pytestmark = pytest.mark.slow
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_retinanet_int8_close_to_float():
    from pytorch_object_detection_tpu.models.registry import build_model
    from pytorch_object_detection_tpu.models.retinanet_int8 import (
        quantize_retinanet,
        retinanet_int8_forward,
    )

    m = build_model("RETINANET", 20, 64)
    v = jax.jit(lambda r, x: m.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3)).astype(np.float32))
    q = quantize_retinanet(m, v, calib, backend="xla")

    x = jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3)).astype(np.float32))
    loc_i, cls_i = jax.jit(
        lambda x: retinanet_int8_forward(m, q, x, backend="xla"))(x)
    loc_f, cls_f = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, x, False)
    assert loc_i.shape == loc_f.shape and cls_i.shape == cls_f.shape
    # measured on random init: loc 0.9992, cls 0.99999996
    assert _cos(loc_i, loc_f) > 0.995
    assert _cos(cls_i, cls_f) > 0.999


def test_retinanet_int8_eval_cli(tmp_path):
    """eval_voc --int8 with model RETINANET runs the anchor int8 pipeline."""
    from tests.test_anchor_eval import _write_retinanet_config
    from tests.test_data import _write_voc_fixture

    voc_root = str(tmp_path / "voc")
    _write_voc_fixture(voc_root)
    cfg = _write_retinanet_config(tmp_path, voc_root)
    env = {**os.environ, "PODT_FORCE_CPU": "1"}
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "eval_voc.py"), "--config", cfg,
         "--batch-size", "2", "--split", "trainval", "--int8"],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "mAP=====>" in r.stdout
