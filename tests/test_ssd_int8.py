"""SSD300 int8 PTQ ladder (models/ssd_int8.py): full int8 VGG-16 multibox
(int8 pools, scale-free L2Norm on int8 codes) vs the float model, plus the
user-facing ``eval_voc --int8`` route.
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


def test_ssd300_int8_close_to_float():
    from pytorch_object_detection_tpu.models.registry import build_model
    from pytorch_object_detection_tpu.models.ssd_int8 import (
        quantize_ssd300,
        ssd300_int8_forward,
    )

    m = build_model("SSD300", 20)
    v = jax.jit(lambda r, x: m.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3))
    )
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.normal(0, 1, (2, 300, 300, 3)).astype(np.float32))
    q = quantize_ssd300(m, v, calib)

    x = jnp.asarray(rng.normal(0, 1, (2, 300, 300, 3)).astype(np.float32))
    loc_i, conf_i = jax.jit(lambda x: ssd300_int8_forward(m, q, x))(x)
    loc_f, conf_f = m.apply({"params": v["params"]}, x, False)
    assert loc_i.shape == loc_f.shape and conf_i.shape == conf_f.shape
    # measured on random init: loc 0.99996, conf 0.99996
    assert _cos(loc_i, loc_f) > 0.999
    assert _cos(conf_i, conf_f) > 0.999


def _write_ssd_config(tmp_path, voc_root):
    main = tmp_path / "main_ssd.yaml"
    voc = tmp_path / "voc_ssd.yaml"
    voc.write_text(f"""
dataset_setting:
  class_num : 20
  train_07 : '{voc_root}'
  test_07 : '{voc_root}'
  input : [512, 512]
  type : 'trainval'
  num_workers : 2
  max_boxes : 8
  class: ["aeroplane","bicycle","bird","boat","bottle","bus","car","cat","chair","cow",
          "diningtable","dog","horse","motorbike","person","pottedplant","sheep","sofa","train","tvmonitor"]
SSD300:
  input : [300, 300]
  canvas_align : 1
  channel : 256
  Epoch : 1
  batch_size : 2
  optimizer: {{name: SGD, lr: 1.0e-3, momentum: 0.9, weight_decay: 0.0005}}
  criterion : multibox
  pos_iou : 0.5
  neg_iou : 0.5
""")
    main.write_text(f"""
dataset : VOC
model : SSD300
VOC : {voc}
COCO : {voc}
amp : False
ddp_enabled : False
savename : ssd_test
""")
    return str(main)


def test_ssd300_int8_eval_cli(tmp_path):
    """eval_voc --int8 with model SSD300 runs the anchor int8 pipeline
    (previously asserted out as bf16-only)."""
    from tests.test_data import _write_voc_fixture

    voc_root = str(tmp_path / "voc")
    _write_voc_fixture(voc_root)
    cfg = _write_ssd_config(tmp_path, voc_root)
    env = {**os.environ, "PODT_FORCE_CPU": "1"}
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "eval_voc.py"), "--config", cfg,
         "--batch-size", "2", "--split", "trainval", "--int8"],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "mAP=====>" in r.stdout
