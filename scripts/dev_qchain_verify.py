"""Interpret-mode bit-exactness check: qchain vs per-block qbottleneck.

Runs a miniature stage-1+2 segment (merged s1 x2 -> s2 merged_in -> s1
canonical) both ways on CPU.  Usage: JAX_PLATFORMS=cpu python
scripts/dev_qchain_verify.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.ops.pallas_qblock import (
    qbottleneck,
    qbottleneck_s2,
    row_pair_merge,
)
from pytorch_object_detection_tpu.ops.pallas_qchain import qchain

rng = np.random.default_rng(0)


def rw(*shape):
    return jnp.asarray(rng.integers(-127, 128, shape, endpoint=False), jnp.int8)


def rs(n, lo=0.001, hi=0.02):
    return jnp.asarray(rng.uniform(lo, hi, n), jnp.float32)


def rb(n):
    return jnp.asarray(rng.uniform(-1.0, 1.0, n), jnp.float32)


def mkblk(kind, cin, cw, cout, ds, merged=False):
    blk = dict(
        kind=kind, merged=merged,
        w1=rw(cin, cw), w2=rw(3, 3, cw, cw), w3=rw(cw, cout),
        A1=rs(cw), B1=rb(cw), A2=rs(cw), B2=rb(cw), A3=rs(cout), B3=rb(cout),
    )
    if ds:
        blk.update(wd=rw(cin, cout), Ad=rs(cout), Bd=rb(cout))
    else:
        blk["short_mul"] = float(rng.uniform(0.5, 1.5))
    return blk


def run_ref(x_m, blocks):
    x = x_m
    for blk in blocks:
        common = (x, blk["w1"], blk["w2"], blk["w3"])
        sc = (blk["A1"], blk["B1"], blk["A2"], blk["B2"], blk["A3"], blk["B3"])
        if blk["kind"] == "s1":
            kw = (dict(wd=blk["wd"], ad=blk["Ad"], bd=blk["Bd"])
                  if "wd" in blk else dict(short_mul=blk["short_mul"]))
            x = qbottleneck(*common, *sc, merged=blk["merged"],
                            interpret=True, **kw)
        else:
            x = qbottleneck_s2(*common[:4], blk["wd"], *sc, blk["Ad"], blk["Bd"],
                               merged_in=blk["merged"], interpret=True)
    return x


def main():
    B, H, W, C = 2, 16, 32, 64
    x = rw(B, H, W, C)
    x_m = row_pair_merge(x)  # [B, 8, 32, 128]

    blocks = [
        mkblk("s1", C, 16, 64, ds=True, merged=True),      # proj, merged io
        mkblk("s1", 64, 16, 64, ds=False, merged=True),    # identity, merged
        mkblk("s2", 64, 32, 96, ds=True, merged=True),     # s2 merged_in
        mkblk("s1", 96, 32, 96, ds=False, merged=False),   # identity canonical
    ]

    ref = run_ref(x_m, blocks)
    got = qchain(x_m, blocks, rc_s1=4, rc_s2=2, interpret=True)
    ref, got = np.asarray(ref), np.asarray(got)
    assert ref.shape == got.shape, (ref.shape, got.shape)
    neq = int((ref != got).sum())
    print("shape", ref.shape, "mismatches", neq, "/", ref.size)
    assert neq == 0, "qchain != per-block kernels"

    # canonical-only chain (stage-3/4 shape)
    x2 = rw(B, 8, 16, 96)
    blocks2 = [
        mkblk("s2", 96, 32, 128, ds=True),
        mkblk("s1", 128, 32, 128, ds=False),
        mkblk("s1", 128, 32, 128, ds=False),
    ]
    ref2 = run_ref(x2, blocks2)
    got2 = qchain(x2, blocks2, rc_s1=4, rc_s2=2, interpret=True)
    neq2 = int((np.asarray(ref2) != np.asarray(got2)).sum())
    print("shape", np.asarray(ref2).shape, "mismatches", neq2)
    assert neq2 == 0
    print("OK: qchain bit-exact vs per-block kernels (interpret)")


if __name__ == "__main__":
    main()
