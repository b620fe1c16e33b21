"""CLI-level end-to-end tests: the entry scripts run as a user would run
them (subprocess), on fixture data, forced onto the CPU backend."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PODT_FORCE_CPU": "1", "JAX_PLATFORMS": "cpu"}


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=ENV, timeout=timeout,
        capture_output=True, text=True,
    )


def _write_config(tmp_path, voc_root):
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
HISFCOS:
  CannelofBackbone: [512, 1024, 2048]
  channel: 64
  Epoch: 1
  batch_size: 2
  optimizer: {{name: SGD, lr: 1.0e-3, momentum: 0.9, weight_decay: 0.0001}}
  criterion: giou
  stride: [8, 16, 32, 64, 128]
  range: [[-1, 32], [32, 96], [96, 192], [192, 384], [384, 9999999]]
""")
    main.write_text(f"""
dataset : VOC
model : HISFCOS
VOC : {voc}
COCO : {voc}
amp : False
ddp_enabled : False
persistent_workers : False
savename : cli_test
prefetch_factor : 2
""")
    return str(main)


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    from tests.test_data import _write_voc_fixture

    voc_root = str(tmp_path / "VOC2007")
    _write_voc_fixture(voc_root, n=4)
    # the fixture writes a 'trainval' split; eval uses --split trainval
    cfg = _write_config(tmp_path, voc_root)
    ckpt_dir = str(tmp_path / "ckpt")

    r = _run(["scripts/train.py", "--config", cfg, "--steps", "2", "--log-every", "1",
              "--checkpoint-dir", ckpt_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "training done" in r.stdout
    run_dir = os.path.join(ckpt_dir, "cli_test")
    assert os.path.isdir(run_dir) and os.listdir(run_dir)

    r = _run(["scripts/eval_voc.py", "--config", cfg, "--checkpoint", run_dir,
              "--batch-size", "2", "--split", "trainval"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mAP=====>" in r.stdout

    # int8-PTQ serving path through the same CLI (xla int8 backend on CPU)
    r = _run(["scripts/eval_voc.py", "--config", cfg, "--checkpoint", run_dir,
              "--batch-size", "2", "--split", "trainval", "--int8"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mAP=====>" in r.stdout


def test_model_info_cli():
    r = _run(["scripts/model_info.py", "--model", "FCOS", "--size", "128"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "total params: 32,157,022" in r.stdout


@pytest.mark.slow
def test_bench_model_knobs(monkeypatch):
    """bench.build_pipeline constructs + runs for every PODT_BENCH_MODEL
    (and the EfficientNet backbone knob) — bf16 path, tiny canvas, CPU."""
    sys.path.insert(0, REPO)
    import bench

    for name, backbone in [("hisfcos", ""), ("fcos", ""), ("mnfcos", ""),
                           ("fcos", "efficientnet-b0")]:
        monkeypatch.setenv("PODT_BENCH_MODEL", name)
        if backbone:
            monkeypatch.setenv("PODT_BENCH_BACKBONE", backbone)
        else:
            monkeypatch.delenv("PODT_BENCH_BACKBONE", raising=False)
        run, _ = bench.build_pipeline("bf16", (128, 128), 2)
        assert np.isfinite(float(run())), (name, backbone)


def test_console_entry_points_resolve():
    """pyproject [project.scripts] targets import and are callable, and each
    CLI submodule exposes the argparse main() the shim scripts delegate to."""
    import importlib

    cli = importlib.import_module("pytorch_object_detection_tpu.cli")
    for fn in ("train_main", "eval_voc_main", "eval_coco_main",
               "visualize_main", "model_info_main"):
        assert callable(getattr(cli, fn))
    for mod in ("train", "eval_voc", "eval_coco", "visualize", "model_info"):
        m = importlib.import_module(f"pytorch_object_detection_tpu.cli.{mod}")
        assert callable(m.main)


def test_bundled_configs_match_repo_configs():
    """The installed-tree config copies must not drift from config/*.yaml."""
    import glob

    from pytorch_object_detection_tpu.configs import CONFIG_DIR

    repo_cfg = os.path.join(REPO, "config")
    names = sorted(os.path.basename(p) for p in glob.glob(os.path.join(repo_cfg, "*.yaml")))
    assert names, "repo config/ dir missing"
    for name in names:
        with open(os.path.join(repo_cfg, name), "rb") as f:
            want = f.read()
        bundled = os.path.join(CONFIG_DIR, name)
        assert os.path.exists(bundled), f"configs/{name} missing from package"
        with open(bundled, "rb") as f:
            assert f.read() == want, f"configs/{name} drifted from config/{name}"


def test_load_config_outside_repo_root(tmp_path, monkeypatch):
    """An installed user runs from any cwd: defaults resolve to the bundled
    package configs when no repo-root config/ exists."""
    from pytorch_object_detection_tpu.core.config import load_config

    monkeypatch.chdir(tmp_path)
    cfg = load_config("config/main.yaml")
    assert cfg["model"]["name"] in ("FCOS", "HISFCOS", "MNFCOS")
    assert "dataset_setting" in cfg


@pytest.mark.slow
def test_train_cli_ring_loader(tmp_path):
    """--ring-loader (r5 batched-native host path): trains through the
    device-resize + device-augment pipeline with finite losses."""
    from tests.test_data import _write_voc_fixture

    voc_root = str(tmp_path / "VOC2007")
    _write_voc_fixture(voc_root, n=4)
    cfg = _write_config(tmp_path, voc_root)
    ckpt_dir = str(tmp_path / "ckpt")
    r = _run(["scripts/train.py", "--config", cfg, "--steps", "2",
              "--log-every", "1", "--ring-loader", "--checkpoint-dir", ckpt_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "training done" in r.stdout
    assert "total=nan" not in r.stdout
