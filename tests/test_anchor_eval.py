"""Anchor-based detectors (RetinaNet / SSD300) through the USER-FACING flow:
config-driven CLI training and the evaluators' anchor-codec pipeline.

The reference ships both models as untrainable scaffolds with no eval path
(`/root/reference/model/od/RetinaNet.py`, `ssd.py` — crash on construction);
here they ride the same config/CLI/evaluator surface as the FCOS family.
"""
from __future__ import annotations

import os
import pytest

# compile-heavy (measured in PARITY.md); the fast tier covers this
# subsystem through its cherry-picked/fast siblings
pytestmark = pytest.mark.slow
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_retinanet_config(tmp_path, voc_root):
    main = tmp_path / "main.yaml"
    voc = tmp_path / "voc.yaml"
    voc.write_text(f"""
dataset_setting:
  class_num : 20
  train_07 : '{voc_root}'
  test_07 : '{voc_root}'
  input : [128, 128]
  type : 'trainval'
  num_workers : 2
  max_boxes : 8
  class: ["aeroplane","bicycle","bird","boat","bottle","bus","car","cat","chair","cow",
          "diningtable","dog","horse","motorbike","person","pottedplant","sheep","sofa","train","tvmonitor"]
RETINANET:
  channel: 64
  Epoch: 1
  batch_size: 2
  optimizer: {{name: SGD, lr: 1.0e-3, momentum: 0.9, weight_decay: 0.0001}}
  criterion: focal
  stride: [8, 16, 32, 64, 128]
  pos_iou: 0.5
  neg_iou: 0.4
  eval: {{nms_iou: 0.5}}
""")
    main.write_text(f"""
dataset : VOC
model : RETINANET
VOC : {voc}
COCO : {voc}
amp : False
ddp_enabled : False
savename : retina_test
""")
    return str(main)


def _run(argv):
    env = {**os.environ, "PODT_FORCE_CPU": "1"}
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable] + argv, cwd=_REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )


def test_retinanet_cli_train_then_eval(tmp_path):
    from tests.test_data import _write_voc_fixture

    voc_root = str(tmp_path / "voc")
    _write_voc_fixture(voc_root)
    cfg = _write_retinanet_config(tmp_path, voc_root)
    ckpt_dir = str(tmp_path / "ckpt")

    r = _run([os.path.join("scripts", "train.py"), "--config", cfg, "--synthetic",
              "--steps", "2", "--log-every", "1", "--checkpoint-dir", ckpt_dir])
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "training done" in r.stdout
    run_dir = os.path.join(ckpt_dir, "retina_test")
    assert os.path.isdir(run_dir) and os.listdir(run_dir)

    r = _run([os.path.join("scripts", "eval_voc.py"), "--config", cfg,
              "--checkpoint", run_dir, "--batch-size", "2", "--split", "trainval"])
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "mAP=====>" in r.stdout


def test_ssd300_evaluate_voc_api(tmp_path):
    """SSD300 through evaluate_voc's anchor-codec dispatch at its fixed
    300x300 canvas (softmax background decode)."""
    import jax
    import jax.numpy as jnp

    from tests.test_data import _write_voc_fixture
    from pytorch_object_detection_tpu.data.voc import VOCDataset
    from pytorch_object_detection_tpu.eval.evaluator import evaluate_voc
    from pytorch_object_detection_tpu.models.registry import build_model

    voc_root = str(tmp_path / "voc")
    _write_voc_fixture(voc_root)
    dataset = VOCDataset([voc_root], "trainval", (300, 300))

    model = build_model("SSD300", 20)
    assert model.num_classes == 21  # background class added by the registry
    v = jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3))
    )
    result = evaluate_voc(
        model, v["params"], v.get("batch_stats", {}), dataset,
        batch_size=2, num_classes=20, verbose=False, max_detections=100,
    )
    assert 0.0 <= result["mAP"] <= 1.0
    assert result["num_images"] == len(dataset)
    assert np.isfinite(result["images_per_sec"])


def test_ssd300_canvas_from_config(tmp_path):
    """The SSD300 config block pins the canvas to exactly 300x300
    (canvas_align 1 overrides the 128-alignment of the FPN models)."""
    from pytorch_object_detection_tpu.core import config as C

    cfg = C.load_config("config/main.yaml")
    cfg["model"]["name"] = "SSD300"
    assert C.canvas_hw(cfg) == (300, 300)
    cfg["model"]["name"] = "HISFCOS"
    assert C.canvas_hw(cfg) == (512, 512)


def test_ssd300_cli_train(tmp_path):
    """SSD300 (multibox loss, fixed 300x300 canvas) trains through the
    config CLI."""
    main = tmp_path / "main_ssd.yaml"
    voc = tmp_path / "voc_ssd.yaml"
    voc.write_text(f"""
dataset_setting:
  class_num : 20
  train_07 : '{tmp_path / "unused"}'
  input : [512, 512]
  type : 'trainval'
  num_workers : 2
  max_boxes : 8
  class: ["a","b","c","d","e","f","g","h","i","j","k","l","m","n","o","p","q","r","s","t"]
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
    r = _run([os.path.join("scripts", "train.py"), "--config", str(main),
              "--synthetic", "--steps", "2", "--log-every", "1",
              "--checkpoint-dir", str(tmp_path / "ckpt")])
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "training done" in r.stdout
