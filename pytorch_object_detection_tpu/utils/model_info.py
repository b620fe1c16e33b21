"""Model summaries: param counts, output shapes, FLOP estimates.

TPU-native replacement for the reference's torchinfo-based `model_info`
(`/root/reference/utill/utills.py:10-14`): counts come from the param
pytree and a jaxpr-based cost analysis instead of forward hooks.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    """Total number of scalar parameters in a pytree."""
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def count_by_top_level(params) -> Dict[str, int]:
    """Param count per top-level module (backbone / fpn / head / ...)."""
    out = {}
    for key, sub in params.items():
        out[key] = count_params(sub)
    return out


def model_info(model, input_shape=(1, 512, 512, 3), train: bool = False, seed: int = 0) -> Dict[str, Any]:
    """Initialize a model on abstract inputs and report params + output shapes.

    Mirrors the reference's per-model `__main__` smoke blocks
    (e.g. model/od/HISFcos.py:232-235) without allocating device memory:
    uses `jax.eval_shape` so it is instant even for full-size inputs.
    """
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros(input_shape, jnp.float32)

    # close over `train` so it stays a static Python bool under tracing
    variables = jax.eval_shape(lambda r, x: model.init(r, x, train), rng, img)
    params = variables["params"]
    info = {
        "params": count_params(params),
        "params_by_module": count_by_top_level(params),
    }
    if "batch_stats" in variables:
        info["batch_stats"] = count_params(variables["batch_stats"])

    out_shapes = jax.eval_shape(lambda v, x: model.apply(v, x, train), variables, img)
    info["output_shapes"] = jax.tree_util.tree_map(lambda x: tuple(x.shape), out_shapes)

    flops = estimate_flops(model, variables, img, train)
    if flops is not None:
        info["flops"] = flops
    return info


def estimate_flops(model, variables, img, train: bool = False):
    """FLOPs of one forward pass via XLA's cost analysis (returns None if
    the backend does not expose it)."""
    try:
        lowered = jax.jit(lambda v, x: model.apply(v, x, train)).lower(variables, img)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", -1.0))
    except Exception:
        return None
