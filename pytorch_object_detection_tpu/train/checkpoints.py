"""Checkpointing (orbax) + PyTorch state_dict conversion.

Capability superset of the reference, which only saves model weights for the
last few epochs and cannot truly resume (`/root/reference/train.py:218-219`,
``start_epoch=0`` hardcoded at train.py:130): here the full
{params, batch_stats, opt_state, step} pytree is saved asynchronously and
restores bit-exact, surviving preemption.

The torch converter maps torchvision-style ResNet-50 state_dicts (and the
reference's detector checkpoints, `module.`-prefixed or not — test.py:273-281)
onto our NHWC pytrees: conv ``[O,I,kh,kw] -> [kh,kw,I,O]``, depthwise
``[C,1,kh,kw] -> [kh,kw,1,C]``, linear transposed, BN stats into
``batch_stats``.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax save / restore
# ---------------------------------------------------------------------------
def save_checkpoint(directory: str, state, step: Optional[int] = None, keep: int = 5) -> str:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    step = int(state.step) if step is None else step
    path = os.path.join(directory, f"step_{step:08d}")
    ckpt = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(int(state.step)),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)
    if jax.process_index() == 0:  # save is collective; GC is not — one rmtree
        _gc_old(directory, keep)
    return path


def restore_checkpoint(directory_or_path: str, state):
    """Restore into an existing TrainState template (shape/dtype donor).

    Platform-agnostic: every leaf is restored as host numpy (orbax would
    otherwise replay the SAVING runtime's device sharding, which breaks
    restoring a TPU-trained checkpoint on CPU) and grafted into the
    template's pytree structure.  A checkpoint whose optimizer state was
    built with different freeze masks than the template (e.g. eval
    restoring a training run) keeps the template's fresh optimizer state —
    params/batch_stats/step are what eval needs.
    """
    import orbax.checkpoint as ocp

    path = directory_or_path
    if not os.path.basename(path).startswith("step_"):
        steps = sorted(d for d in os.listdir(path) if d.startswith("step_"))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = os.path.join(path, steps[-1])
    path = os.path.abspath(path)

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        md = ckptr.metadata(path)
        md_tree = getattr(md, "item_metadata", md)
        md_tree = getattr(md_tree, "tree", md_tree)
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), md_tree
        )
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )

    def graft(template, rec):
        """Rebuild `template`'s pytree (incl. NamedTuple optimizer nodes,
        which orbax serializes as dicts) from the restored leaves; None on
        any structural/shape mismatch."""
        if rec is None:
            return None
        t_leaves, t_def = jax.tree_util.tree_flatten(template)
        r_leaves = jax.tree_util.tree_leaves(rec)
        if len(t_leaves) != len(r_leaves):
            return None
        if any(np.shape(t) != np.shape(r) for t, r in zip(t_leaves, r_leaves)):
            return None
        return jax.tree_util.tree_unflatten(t_def, r_leaves)

    params = graft(state.params, restored.get("params"))
    if params is None:
        raise ValueError(
            f"checkpoint at {path} does not match the model's parameter tree")
    batch_stats = graft(state.batch_stats, restored.get("batch_stats"))
    if batch_stats is None:
        batch_stats = state.batch_stats
    opt_state = graft(state.opt_state, restored.get("opt_state"))
    if opt_state is None:  # e.g. different freeze masks: fresh optimizer
        opt_state = state.opt_state
    return state.replace(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jax.numpy.asarray(int(np.asarray(restored["step"]))),
    )


def _gc_old(directory: str, keep: int) -> None:
    import shutil

    if not os.path.isdir(directory):
        return
    steps = sorted(d for d in os.listdir(directory) if d.startswith("step_"))
    for old in steps[:-keep]:
        shutil.rmtree(os.path.join(directory, old), ignore_errors=True)


# ---------------------------------------------------------------------------
# torch -> jax conversion
# ---------------------------------------------------------------------------
def _to_numpy(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_conv(weight) -> np.ndarray:
    """torch conv [O, I/g, kh, kw] -> flax [kh, kw, I/g, O]."""
    return np.transpose(_to_numpy(weight), (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file to numpy, stripping DDP's ``module.`` prefix."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        out[re.sub(r"^module\.", "", k)] = _to_numpy(v)
    return out


def torchvision_resnet50_to_pytree(
    sd: Dict[str, np.ndarray], prefix: str = "", stem_mode: str = "conv7"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a torchvision resnet50 state_dict onto nn/resnet.py's pytree.

    Returns (params, batch_stats) for the `ResNet50` module (to be placed
    under the detector's 'backbone' scope).  `prefix` selects nested dicts
    (e.g. 'backbone.' for the reference's detector checkpoints, whose
    ResNet50 wrapper re-exposes torchvision attributes —
    /root/reference/model/backbone/resnet50.py:12-20).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def bn(src: str, dst_scope: str):
        put(params, [dst_scope, "bn", "scale"], sd[prefix + src + ".weight"])
        put(params, [dst_scope, "bn", "bias"], sd[prefix + src + ".bias"])
        put(stats, [dst_scope, "bn", "mean"], sd[prefix + src + ".running_mean"])
        put(stats, [dst_scope, "bn", "var"], sd[prefix + src + ".running_var"])

    def conv(src: str, dst_scope: str):
        put(params, [dst_scope, "conv", "kernel"], convert_conv(sd[prefix + src + ".weight"]))

    if stem_mode == "s2d":
        from pytorch_object_detection_tpu.nn.resnet import s2d_stem_kernel

        k7 = convert_conv(sd[prefix + "conv1.weight"])
        put(params, ["conv1_s2d", "kernel"], np.asarray(s2d_stem_kernel(k7)))
    else:
        conv("conv1", "conv1")
    bn("bn1", "bn1")
    stage_sizes = (3, 4, 6, 3)
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            for ci in (1, 2, 3):
                put(params, [dst, f"conv{ci}", "conv", "kernel"],
                    convert_conv(sd[prefix + f"{src}.conv{ci}.weight"]))
                put(params, [dst, f"bn{ci}", "bn", "scale"], sd[prefix + f"{src}.bn{ci}.weight"])
                put(params, [dst, f"bn{ci}", "bn", "bias"], sd[prefix + f"{src}.bn{ci}.bias"])
                put(stats, [dst, f"bn{ci}", "bn", "mean"], sd[prefix + f"{src}.bn{ci}.running_mean"])
                put(stats, [dst, f"bn{ci}", "bn", "var"], sd[prefix + f"{src}.bn{ci}.running_var"])
            ds = prefix + f"{src}.downsample.0.weight"
            if ds in sd:
                put(params, [dst, "downsample_conv", "conv", "kernel"], convert_conv(sd[ds]))
                put(params, [dst, "downsample_bn", "bn", "scale"], sd[prefix + f"{src}.downsample.1.weight"])
                put(params, [dst, "downsample_bn", "bn", "bias"], sd[prefix + f"{src}.downsample.1.bias"])
                put(stats, [dst, "downsample_bn", "bn", "mean"], sd[prefix + f"{src}.downsample.1.running_mean"])
                put(stats, [dst, "downsample_bn", "bn", "var"], sd[prefix + f"{src}.downsample.1.running_var"])
    return params, stats


def load_pretrained_backbone(state, pth_path: str, prefix: str = ""):
    """Graft torchvision ResNet-50 weights into a TrainState's backbone."""
    sd = load_torch_state_dict(pth_path)
    params, stats = torchvision_resnet50_to_pytree(sd, prefix)
    new_params = dict(state.params)
    new_params["backbone"] = jax.tree_util.tree_map(np.asarray, params)
    new_stats = dict(state.batch_stats)
    new_stats["backbone"] = jax.tree_util.tree_map(np.asarray, stats)
    return state.replace(params=new_params, batch_stats=new_stats)
