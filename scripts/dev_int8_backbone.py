"""Dev check: int8 backbone vs float backbone — numerics + speed (B=32)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.resnet import ResNet50
from pytorch_object_detection_tpu.nn.resnet_int8 import (
    calibrate_resnet50,
    quantize_resnet50,
    resnet50_int8_forward,
)

B, HW = 32, (512, 512)


def main():
    model = ResNet50()
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, *HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, False))(rng, small)

    images = jax.random.normal(jax.random.PRNGKey(1), (B, *HW, 3), jnp.float32)

    # calibrate on one batch
    calib = jax.jit(calibrate_resnet50)(variables, images[:8])
    calib = {k: float(v) for k, v in calib.items()}
    qtree = jax.jit(quantize_resnet50, static_argnums=())(variables, calib)

    fwd_f = jax.jit(lambda v, x: model.apply(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), v), x.astype(jnp.bfloat16), False))
    fwd_q = jax.jit(resnet50_int8_forward)

    ref = fwd_f(variables, images)
    out = fwd_q(qtree, images)
    for i, (r, o) in enumerate(zip(ref, out)):
        r = r.astype(jnp.float32); o = o.astype(jnp.float32)
        cos = float((r * o).sum() / (jnp.linalg.norm(r) * jnp.linalg.norm(o)))
        rel = float(jnp.abs(r - o).mean() / (jnp.abs(r).mean() + 1e-9))
        print(f"C{i+3}: cos={cos:.5f} rel_l1={rel:.4f}")

    def bench(fn, *args, iters=20):
        out = fn(*args)
        float(jnp.asarray(out[-1]).sum())
        t0 = time.perf_counter()
        prev = None
        for _ in range(iters):
            out = fn(*args)
            chk = out[-1].sum()
            if prev is not None:
                float(prev)
            prev = chk
        float(prev)
        return (time.perf_counter() - t0) / iters * 1e3

    t_f = bench(fwd_f, variables, images)
    t_q = bench(fwd_q, qtree, images)
    print(f"bf16 backbone B={B}: {t_f:.2f} ms   int8: {t_q:.2f} ms   x{t_f/t_q:.2f}")


if __name__ == "__main__":
    main()
