"""Isolate where the int8 backbone time goes: full epilogue vs cheap-shift
epilogue (conv-only ceiling) vs bf16 reference."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.resnet import ResNet50
from pytorch_object_detection_tpu.nn.resnet_int8 import (
    STAGE_SIZES,
    calibrate_resnet50,
    quantize_resnet50,
    resnet50_int8_forward,
    _qconv,
)

B, HW = 32, (512, 512)


def int8_forward_cheap(qtree, images):
    """Same conv graph, epilogue = shift+cast only (no scales/round)."""
    x = images[..., :1].astype(jnp.int8)
    # fake stem output shape: quantize the real stem result cheaply
    from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn, _conv_bn_act
    stem = qtree["stem"]
    mult, shift = _fold_bn(*stem["bn"])
    x = _conv_bn_act(images.astype(jnp.bfloat16), stem["kernel"].astype(jnp.bfloat16), mult, shift, stride=2)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    x_q = x.astype(jnp.int8)

    outs = []
    for stage, blocks in enumerate(STAGE_SIZES):
        for b in range(blocks):
            blk = qtree[f"layer{stage + 1}_{b}"]
            stride = 2 if (b == 0 and stage > 0) else 1
            a1 = (_qconv(x_q, blk["w1"]).astype(jnp.int32) >> 8).astype(jnp.int8)
            a2 = (_qconv(a1, blk["w2"], stride).astype(jnp.int32) >> 8).astype(jnp.int8)
            pre = (_qconv(a2, blk["w3"]).astype(jnp.int32) >> 8)
            if "wd" in blk:
                short = (_qconv(x_q, blk["wd"], stride).astype(jnp.int32) >> 8)
            else:
                short = x_q.astype(jnp.int32)
            x_q = jnp.clip(pre + short, -127, 127).astype(jnp.int8)
        outs.append(x_q.astype(jnp.bfloat16))
    return tuple(outs[-3:])


def bench(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.asarray(out[-1]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = fn(*args)
        chk = out[-1].astype(jnp.float32).sum()
        if prev is not None:
            float(prev)
        prev = chk
    float(prev)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    model = ResNet50()
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, x: model.init(r, x, False))(rng, jnp.zeros((1, *HW, 3), jnp.float32))
    images = jax.random.normal(jax.random.PRNGKey(1), (B, *HW, 3), jnp.float32)
    calib = {k: float(v) for k, v in jax.jit(calibrate_resnet50)(variables, images[:8]).items()}
    qtree = jax.jit(quantize_resnet50)(variables, calib)

    fwd_f = jax.jit(lambda v, x: model.apply(jax.tree.map(lambda a: a.astype(jnp.bfloat16), v), x.astype(jnp.bfloat16), False))
    fwd_q = jax.jit(resnet50_int8_forward)
    fwd_c = jax.jit(int8_forward_cheap)

    t_c = bench(fwd_c, qtree, images)
    t_q = bench(fwd_q, qtree, images)
    t_f = bench(fwd_f, variables, images)
    print(f"B={B}: bf16 {t_f:.2f} ms | int8 full-epi {t_q:.2f} ms | int8 cheap-epi {t_c:.2f} ms")


if __name__ == "__main__":
    main()
