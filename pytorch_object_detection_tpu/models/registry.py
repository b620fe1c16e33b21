"""Model registry + config-driven builder.

The YAML surface mirrors the reference (`config/main.yaml` model switch,
train_new.py:135-146 / bulider.py:15-26): names FCOS / HISFCOS / MNFCOS
(plus RETINANET / SSD300 scaffolds) select an assembly; per-model blocks
supply channel/stride/range hyperparameters.
"""
from __future__ import annotations

from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}


def register(name: str):
    def deco(ctor):
        _REGISTRY[name.upper()] = ctor
        return ctor

    return deco


def available_models():
    _ensure_registered()
    return sorted(_REGISTRY)


def build_model(name: str, num_classes: int, features: int = 256, **kwargs):
    """Build a detector by config name (reference model switch)."""
    import dataclasses

    _ensure_registered()
    key = name.upper()
    if key not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {available_models()}")
    ctor = _REGISTRY[key]
    fields = {f.name for f in dataclasses.fields(ctor)}
    if key == "SSD300":
        # SSD's softmax head carries an explicit background class 0; callers
        # pass the dataset's foreground count (reference ssd.py num_class=21
        # for VOC's 20 classes)
        num_classes = num_classes + 1
    all_kwargs = {"num_classes": num_classes, "features": features, **kwargs}
    return ctor(**{k: v for k, v in all_kwargs.items() if k in fields})


def _ensure_registered():
    if _REGISTRY:
        return
    from pytorch_object_detection_tpu.models import fcos

    from pytorch_object_detection_tpu.models.mcfcos import MC_FCOS
    from pytorch_object_detection_tpu.models.retinanet import RetinaNet
    from pytorch_object_detection_tpu.models.ssd import SSD300

    _REGISTRY["FCOS"] = fcos.FCOS
    _REGISTRY["HISFCOS"] = fcos.HISFCOS
    _REGISTRY["MNFCOS"] = fcos.MNFCOS
    _REGISTRY["MC_FCOS"] = MC_FCOS
    _REGISTRY["RETINANET"] = RetinaNet
    _REGISTRY["SSD300"] = SSD300
