"""Cleaner int8-vs-bf16 conv probe: N chained convs inside ONE jit, so the
per-dispatch axon-tunnel overhead amortizes. Channel-preserving shapes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

B = 32
REPS = 16


@functools.partial(jax.jit, static_argnums=(2,))
def chain_bf16(x, w, reps):
    def body(y, _):
        y = lax.conv_general_dilated(
            y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return y * (1.0 / jnp.sqrt(jnp.float32(w.shape[0] * w.shape[1] * w.shape[2])).astype(jnp.bfloat16)), None
    y, _ = lax.scan(body, x, None, length=reps)
    return y.sum()


@functools.partial(jax.jit, static_argnums=(2,))
def chain_int8(x, w, reps):
    def body(y, _):
        acc = lax.conv_general_dilated(
            y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # requantize epilogue back to int8 (shift keeps it in range)
        return (acc >> 10).astype(jnp.int8), None
    y, _ = lax.scan(body, x, None, length=reps)
    return y.astype(jnp.int32).sum()


def timeit(fn, *args, iters=10):
    float(fn(*args))
    t0 = time.perf_counter()
    out = [fn(*args) for _ in range(iters)]
    float(out[-1])
    return (time.perf_counter() - t0) / (iters * REPS) * 1e3


SHAPES = [  # (H, W, C, k)
    (128, 128, 64, 3),
    (64, 64, 128, 3),
    (32, 32, 256, 3),
    (16, 16, 512, 3),
    (32, 32, 512, 1),
    (16, 16, 1024, 1),
]


def main():
    print("device:", jax.devices()[0])
    k0 = jax.random.PRNGKey(0)
    for (H, W, C, k) in SHAPES:
        x = jax.random.normal(k0, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(k0, (k, k, C, C), jnp.bfloat16)
        xi = jax.random.randint(k0, (B, H, W, C), -127, 127, jnp.int8)
        wi = jax.random.randint(k0, (k, k, C, C), -16, 16, jnp.int8)
        t_bf = timeit(chain_bf16, x, w, REPS)
        t_i8 = timeit(chain_int8, xi, wi, REPS)
        gflop = 2 * B * H * W * C * C * k * k / 1e9
        print(
            f"{H}x{W} c{C} k{k}: bf16 {t_bf:6.3f}ms ({gflop/t_bf:6.1f} TF/s)"
            f"  int8 {t_i8:6.3f}ms ({gflop/t_i8:6.1f} TOP/s)  x{t_bf/t_i8:.2f}"
        )


if __name__ == "__main__":
    main()
