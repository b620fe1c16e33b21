"""Microbench: bf16 vs int8 conv throughput on the real chip (dev tool).

Times representative ResNet-50 conv shapes (B=32, NHWC) three ways:
  - bf16 x bf16 -> bf16 (current path)
  - int8 x int8 -> int32 (PTQ candidate; v5e MXU doubles int8 throughput)
  - int8 conv + dequant+bias+relu epilogue (realistic PTQ layer)

Timing: submit N iterations chained through a data dependency, fetch one
scalar at the end (block_until_ready is a no-op through the axon tunnel).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax

B = 32


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    chk = float(jnp.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force completion with one scalar fetch
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = time.perf_counter() - t0
    return dt / iters * 1e3, chk


def conv_bf16(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def conv_i8(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def conv_i8_epi(x, w, scale, bias):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return jnp.maximum(y.astype(jnp.float32) * scale + bias, 0.0).astype(jnp.bfloat16)


SHAPES = [  # (H, W, Cin, Cout, k)
    (128, 128, 64, 64, 3),
    (128, 128, 64, 256, 1),
    (64, 64, 128, 128, 3),
    (32, 32, 256, 256, 3),
    (32, 32, 1024, 256, 1),
    (16, 16, 512, 512, 3),
    (16, 16, 2048, 512, 1),
]


def main():
    print("device:", jax.devices()[0])
    k0 = jax.random.PRNGKey(0)
    for (H, W, Cin, Cout, k) in SHAPES:
        x = jax.random.normal(k0, (B, H, W, Cin), jnp.bfloat16)
        w = jax.random.normal(k0, (k, k, Cin, Cout), jnp.bfloat16)
        xi = jax.random.randint(k0, (B, H, W, Cin), -127, 127, jnp.int8)
        wi = jax.random.randint(k0, (k, k, Cin, Cout), -127, 127, jnp.int8)
        scale = jnp.abs(jax.random.normal(k0, (Cout,), jnp.float32)) * 1e-3
        bias = jax.random.normal(k0, (Cout,), jnp.float32)

        f_bf = jax.jit(conv_bf16)
        f_i8 = jax.jit(conv_i8)
        f_ep = jax.jit(conv_i8_epi)
        t_bf, _ = timeit(f_bf, x, w)
        t_i8, _ = timeit(f_i8, xi, wi)
        t_ep, _ = timeit(f_ep, xi, wi, scale, bias)
        gflop = 2 * B * H * W * Cin * Cout * k * k / 1e9
        print(
            f"{H}x{W} {Cin}->{Cout} k{k}: bf16 {t_bf:6.2f}ms ({gflop/t_bf:6.1f} TF/s)"
            f"  int8 {t_i8:6.2f}ms ({gflop/t_i8:6.1f} TOP/s)"
            f"  int8+epi {t_ep:6.2f}ms  speedup x{t_bf/t_ep:.2f}"
        )


if __name__ == "__main__":
    main()
