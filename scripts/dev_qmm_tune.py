"""Tune qmatmul tile sizes on the dominant ResNet int8 shapes (B=64)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.ops.pallas_qconv import qmatmul

import ast

CASES = ast.literal_eval(os.environ.get(
    "QMM_CASES", "[(1048576, 64, 256, True)]"))
TILES = ast.literal_eval(os.environ.get("QMM_TILES", "[(1024, 256), (2048, 256)]"))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = fn(*args)
        chk = out[0, 0].astype(jnp.float32)
        if prev is not None:
            float(prev)
        prev = chk
    float(prev)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    k0 = jax.random.PRNGKey(0)
    for (M, K, N, has_res) in CASES:
        x = jax.random.randint(k0, (M, K), -127, 127, jnp.int8)
        w = jax.random.randint(k0, (K, N), -16, 16, jnp.int8)
        a = jnp.abs(jax.random.normal(k0, (N,))) * 1e-3
        b = jax.random.normal(k0, (N,))
        res = jax.random.randint(k0, (M, N), -127, 127, jnp.int8) if has_res else None
        bytes_min = M * K + K * N + M * N * (2 if has_res else 1)
        floor = bytes_min / 800e9 * 1e3
        print(f"M={M} K={K} N={N} res={has_res}  floor~{floor:.2f} ms")
        for tm, tn in TILES:
                if tn > N or (tm * tn * 4 + tm * K + K * tn + (tm * tn if has_res else 0)) > 12 * 2**20:
                    continue
                try:
                    if has_res:
                        f = jax.jit(lambda x, w, a, b, r, tm=tm, tn=tn: qmatmul(
                            x, w, a, b, relu=True, res=r, res_scale=0.5,
                            tile_m=tm, tile_n=tn))
                        t = timeit(f, x, w, a, b, res)
                    else:
                        f = jax.jit(lambda x, w, a, b, tm=tm, tn=tn: qmatmul(
                            x, w, a, b, relu=True, tile_m=tm, tile_n=tn))
                        t = timeit(f, x, w, a, b)
                    print(f"  tm={tm:5d} tn={tn:3d}: {t:6.3f} ms  ({floor/t*100:4.0f}% of BW floor)")
                except Exception as e:
                    print(f"  tm={tm:5d} tn={tn:3d}: FAIL {type(e).__name__} {str(e)[:80]}")


if __name__ == "__main__":
    main()
