"""Trace-based isolation of qmatmul cost: full epilogue+residual vs
no-residual vs shift-only epilogue, on the stage1-conv3 shape at B=64."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 64 * 128 * 128, 64, 256
TM, TN = 512, 256


def _spec(tm, k, tn):
    return dict(
        x=pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        w=pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ab=pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        out=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )


def k_full(x_ref, w_ref, a_ref, b_ref, res_ref, out_ref):
    acc = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:] + res_ref[:].astype(jnp.float32) * 0.5
    y = jnp.maximum(y, 0.0)
    out_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def k_nores(x_ref, w_ref, a_ref, b_ref, out_ref):
    acc = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * a_ref[:] + b_ref[:], 0.0)
    out_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def k_shift(x_ref, w_ref, a_ref, b_ref, out_ref):
    acc = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out_ref[:] = (acc >> 8).astype(jnp.int8)


def build(kern, with_res):
    s = _spec(TM, K, TN)
    in_specs = [s["x"], s["w"], s["ab"], s["ab"]] + ([s["out"]] if with_res else [])

    @jax.jit
    def f(x, w, a, b, *res):
        return pl.pallas_call(
            kern,
            grid=(M // TM, N // TN),
            in_specs=in_specs,
            out_specs=s["out"],
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        )(x, w, a, b, *res)

    return f


def main():
    k0 = jax.random.PRNGKey(0)
    x = jax.random.randint(k0, (M, K), -127, 127, jnp.int8)
    w = jax.random.randint(k0, (K, N), -16, 16, jnp.int8)
    a = (jnp.abs(jax.random.normal(k0, (1, N))) * 1e-3).astype(jnp.float32)
    b = jax.random.normal(k0, (1, N)).astype(jnp.float32)
    res = jax.random.randint(k0, (M, N), -127, 127, jnp.int8)

    fns = {
        "full": (build(k_full, True), (x, w, a, b, res)),
        "nores": (build(k_nores, False), (x, w, a, b)),
        "shift": (build(k_shift, False), (x, w, a, b)),
    }
    for name, (f, args) in fns.items():
        out = f(*args)
        float(out[0, 0].astype(jnp.float32))
        print(name, "compiled")

    jax.profiler.start_trace("/tmp/jax-trace-qmmvar")
    for name, (f, args) in fns.items():
        outs = [f(*args) for _ in range(4)]
        float(outs[-1][0, 0].astype(jnp.float32))
    jax.profiler.stop_trace()
    print("traced (4 iters each, order: full, nores, shift)")


if __name__ == "__main__":
    main()
