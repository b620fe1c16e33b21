"""Dev check (real TPU): fused stem pool + merged row-pair stage-1 chain.

Compares resnet50_int8_forward(backend='pallas_block', fuse_strided=True,
u8_stem=True) under three env configs — (a) XLA pool (PODT_STEM_POOL=0),
(b) fused in-kernel pool, canonical layout (PODT_MERGED_S1=0), (c) fused
pool emitting the row-pair lane-merged layout consumed by the merged
stage-1 bottlenecks — asserting bit-identical C3/C4/C5 and timing each.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.nn.resnet import ResNet50
from pytorch_object_detection_tpu.nn.resnet_int8 import (
    calibrate_resnet50,
    quantize_resnet50,
    resnet50_int8_forward,
)

B, HW = int(os.environ.get("B", "64")), (512, 512)


def bench(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.asarray(out[-1].astype(jnp.float32)).sum())
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
    variables = jax.jit(lambda r, x: model.init(r, x, False))(
        rng, jnp.zeros((1, *HW, 3), jnp.float32))
    imgs_f = jax.random.uniform(jax.random.PRNGKey(1), (8, *HW, 3), jnp.float32)
    calib = jax.jit(calibrate_resnet50)(variables, imgs_f)
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    qtree = jax.jit(quantize_resnet50)(
        variables, {k: float(v) for k, v in calib.items()},
        jnp.asarray(IMAGENET_MEAN, jnp.float32), jnp.asarray(IMAGENET_STD, jnp.float32))
    images = jax.random.randint(jax.random.PRNGKey(2), (B, *HW, 3), 0, 256, jnp.uint8)

    outs, times = {}, {}
    for name, pool, merged in [("xla_pool", "0", "0"),
                               ("fused_pool", "1", "0"),
                               ("merged", "1", "1")]:
        os.environ["PODT_STEM_POOL"] = pool
        os.environ["PODT_MERGED_S1"] = merged
        fwd = jax.jit(lambda q, x: resnet50_int8_forward(
            q, x, backend="pallas_block", fuse_strided=True, u8_stem=True))
        out = fwd(qtree, images)
        outs[name] = [np.asarray(o.astype(jnp.float32)) for o in out]
        times[name] = bench(fwd, qtree, images)
        print(f"{name}: {times[name]:.2f} ms", flush=True)

    for name in ("fused_pool", "merged"):
        for i, (a, b) in enumerate(zip(outs["xla_pool"], outs[name])):
            np.testing.assert_array_equal(a, b), (name, i)
        print(f"{name}: bit-identical to xla_pool", flush=True)


if __name__ == "__main__":
    main()
