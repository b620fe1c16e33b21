"""GradCAM visualization for the FCOS-family detectors.

Capability equivalent of the reference's `visualization.py` (pytorch_grad_cam
overlay, visualization.py:20-29 — its main path was left incomplete).  In
JAX the hook machinery is unnecessary: split the network at the backbone
boundary, take ``d(max class score)/d(C5)`` with `jax.grad`, and weight the
activation map by the pooled gradients (classic GradCAM).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gradcam_fcos(model, variables, images: jnp.ndarray, level: int = 0) -> np.ndarray:
    """GradCAM heatmaps ``[B, H, W]`` in [0, 1] for a FCOS-family model.

    Splits the model at the backbone: heat = ReLU(sum_c w_c * A_c) on the C5
    activation, where w = GAP of d(score)/dA and score = max class logit over
    all locations of ``level``.
    """
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables.get("batch_stats", {}).get("backbone", {}),
    }
    if getattr(model, "backbone", "resnet50") == "efficientnet-b0":
        from pytorch_object_detection_tpu.nn.efficientnet import EfficientNet

        feats = EfficientNet.b0().apply(bb_vars, images, False)[-3:]
    else:
        from pytorch_object_detection_tpu.nn.resnet import ResNet50

        backbone = ResNet50(stem_mode=getattr(model, "stem_mode", "conv7"))
        feats = backbone.apply(bb_vars, images, False)

    fpn_mod, head_mod = _fpn_head_for(model)
    stats = variables.get("batch_stats", {})
    fpn_vars = {"params": variables["params"]["fpn"], "batch_stats": stats.get("fpn", {})}
    head_vars = {"params": variables["params"]["head"]}
    if "head" in stats:
        head_vars["batch_stats"] = stats["head"]

    def head_score(c5):
        levels = fpn_mod.apply(fpn_vars, (feats[0], feats[1], c5), False)
        cls_l = head_mod.apply(head_vars, levels)[0]
        return jnp.sum(jnp.max(cls_l[level], axis=(1, 2, 3)))

    grads = jax.grad(head_score)(feats[2])  # [B, h, w, C]
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
    cam = jax.nn.relu(jnp.sum(weights * feats[2], axis=-1))  # [B, h, w]
    cam = jax.image.resize(cam, (cam.shape[0], images.shape[1], images.shape[2]), "bilinear")
    cam = cam - cam.min(axis=(1, 2), keepdims=True)
    cam = cam / jnp.maximum(cam.max(axis=(1, 2), keepdims=True), 1e-8)
    return np.asarray(cam)


def _fpn_head_for(mdl) -> Tuple:
    """The (fpn, head) submodules matching a detector assembly."""
    from pytorch_object_detection_tpu.models.fcos import HISFCOS, MNFCOS
    from pytorch_object_detection_tpu.models.heads import FCOSHead, HISHead, MNHead
    from pytorch_object_detection_tpu.nn.fpn import FPN, HisFPN, LightweightFPN

    if isinstance(mdl, HISFCOS):
        return HisFPN(mdl.features), HISHead(mdl.num_classes, mdl.features)
    if isinstance(mdl, MNFCOS):
        return LightweightFPN(mdl.features), MNHead(mdl.num_classes, mdl.features)
    return FPN(mdl.features), FCOSHead(mdl.num_classes, mdl.features)


def overlay_heatmap(image_u8: np.ndarray, cam: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Blend a [0,1] heatmap over an RGB uint8 image (jet-like colormap)."""
    import cv2

    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    return ((1 - alpha) * image_u8 + alpha * heat).astype(np.uint8)
