"""YAML config loading — same public surface as the reference.

The two-level scheme (`config/main.yaml` selects dataset/model/runtime flags
and points at `config/{voc,coco}.yaml` with dataset paths + per-model
hyperparameter blocks) matches `load_config`
(`/root/reference/utill/utills.py:258-272`), including the injected
``config['model']`` keys, so reference configs run unchanged.  Key names
(``CannelofBackbone``, ``channel``, ``stride``, ``range``, ``criterion``,
``optimizer.*``, ``dataset_setting.*``) are public API.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import yaml


def _resolve(path: str) -> str:
    """Resolve a config path: as given, else the bundled package copy.

    Reference configs are repo-root-relative (``config/main.yaml``); an
    installed tree has no repo root, so fall back to the byte-identical
    copies shipped in ``pytorch_object_detection_tpu/configs/``.
    """
    if os.path.exists(path):
        return path
    from pytorch_object_detection_tpu.configs import CONFIG_DIR

    bundled = os.path.join(CONFIG_DIR, os.path.basename(path))
    return bundled if os.path.exists(bundled) else path


def load_config(cfg_path: str = "config/main.yaml") -> Dict[str, Any]:
    cfg_path = _resolve(cfg_path)
    with open(cfg_path) as f:
        main = yaml.safe_load(f)
    dataset = main["dataset"]
    dataset_cfg_path = main[dataset]
    if not os.path.exists(dataset_cfg_path):
        # reference paths are repo-root-relative; also try next to main.yaml,
        # then the bundled package copy
        alt = os.path.join(os.path.dirname(os.path.abspath(cfg_path)), os.path.basename(dataset_cfg_path))
        dataset_cfg_path = alt if os.path.exists(alt) else _resolve(dataset_cfg_path)
    with open(dataset_cfg_path) as f:
        config = yaml.safe_load(f)
    config["model"] = {
        "dataset": dataset,
        "name": main["model"],
        "amp": main.get("amp", True),
        "ddp": main.get("ddp_enabled", True),
        "persistent": main.get("persistent_workers", False),
        "prefetch": main.get("prefetch_factor", 2),
    }
    config["savename"] = main.get("savename", "run")
    return config


def model_block(config: Dict[str, Any]) -> Dict[str, Any]:
    """The per-model hyperparameter block selected by main.yaml."""
    return config[config["model"]["name"]]


def limit_ranges(config: Dict[str, Any]) -> List[Tuple[float, float]]:
    return [tuple(r) for r in model_block(config)["range"]]


def strides(config: Dict[str, Any]) -> List[int]:
    return list(model_block(config)["stride"])


def input_hw(config: Dict[str, Any]) -> Tuple[int, int]:
    """Input size; a model block may override the dataset default (SSD300
    is defined at a fixed 300x300 regardless of dataset)."""
    size = model_block(config).get("input", config["dataset_setting"]["input"])
    return int(size[0]), int(size[1])


def num_classes(config: Dict[str, Any]) -> int:
    return int(config["dataset_setting"]["class_num"])


def level_shapes(config: Dict[str, Any]) -> List[Tuple[int, int]]:
    """Static per-level feature shapes for a fixed input canvas.

    TPU-first: the reference pads to per-batch variable /32 multiples
    (dataset/voc.py:110-139) which would force XLA recompiles; we fix the
    canvas to the configured input size (carrying a resize `scale` per image
    like the reference's eval path, Test_coco.py:63).
    """
    h, w = canvas_hw(config)
    return [( _ceil_div(h, s), _ceil_div(w, s)) for s in strides(config)]


def canvas_hw(config: Dict[str, Any]) -> Tuple[int, int]:
    # canvas_align=1 keeps exact sizes for models defined at a fixed
    # resolution (SSD300); FPN models align to the 128 max stride
    align = int(model_block(config).get("canvas_align", 128))
    h, w = input_hw(config)
    return _round_up(h, align), _round_up(w, align)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
