"""Isolate which phase of the qhisblock kernel diverges from the XLA oracle.

Runs ONE HisBlock (small H) in interpret mode and compares x1q/x2q/a/m/out
against the per-op XLA int8 path step by step.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.layers import HisBlock
from pytorch_object_detection_tpu.nn.fpn_int8 import (
    _clip8,
    _conv_i8,
    _float_hisblock_taps,
    _quantize_hisblock,
    _requant,
    _silu,
)

B, H, W, C = 1, 8, 8, 256


def xla_steps(blk, x_q):
    acc1 = _conv_i8(x_q, blk["w1"], 0)
    x1 = _silu(acc1 * blk["A1"] + blk["B1"])
    x1q = _clip8(x1 * blk["inv_x1"])
    x2q = _requant(_conv_i8(x_q, blk["w2"], 0), blk["A2"], blk["B2"], relu=False)
    c = x1q.shape[-1]
    aq = _requant(_conv_i8(x1q, blk["wdw"], 1, groups=c), blk["Adw"], blk["Bdw"])
    mean = jnp.mean(x1q.astype(jnp.float32), axis=(1, 2)) * blk["se_premul"]
    g = _silu(mean @ blk["se_w1"] + blk["se_b1"])
    g = jax.nn.sigmoid(g @ blk["se_w2"] + blk["se_b2"])
    bq = _clip8(x1q.astype(jnp.float32) * g[:, None, None, :])
    cat = jnp.concatenate([aq, bq], axis=-1)
    mq = _requant(_conv_i8(cat, blk["w3"], 1), blk["A3"], blk["B3"])
    cat2 = jnp.concatenate([mq, x2q], axis=-1)
    acc4 = _conv_i8(cat2, blk["w4"], 2, dilation=2)
    out = _clip8(_silu(acc4 * blk["A4"] + blk["B4"]) * blk["inv_out"])
    return dict(x1q=x1q, x2q=x2q, aq=aq, g=g, bq=bq, mq=mq, out=out)


def kernel_steps(blk, x_q):
    """Replicate the kernel's math in plain jnp (same chunking)."""
    from pytorch_object_detection_tpu.ops.pallas_qhis import (
        _band as band_fn,
        _dot_i8,
        _shift_cols,
    )

    half = blk["w1"].shape[-1]
    cin = 2 * half
    w1 = blk["w1"].reshape(cin, half)
    w2 = blk["w2"].reshape(cin, half)
    wdw = blk["wdw"].reshape(9, half)
    rc = min(16, H)
    outs = {}
    for bi in range(B):
        x_img = x_q[bi]
        x1q_s = np.zeros((H, W, half), np.int8)
        x2q_s = np.zeros((H, W, half), np.int8)
        se_sum = jnp.zeros((1, half), jnp.float32)
        a1r, b1r = blk["A1"], blk["B1"]
        for r0 in range(0, H, rc):
            xs = x_img[r0:r0 + rc].reshape(rc * W, cin)
            acc1 = _dot_i8(xs, w1).astype(jnp.float32)
            x1 = _silu(acc1 * a1r + b1r)
            x1q = _clip8(x1 * blk["inv_x1"])
            x1q_s[r0:r0 + rc] = np.asarray(x1q.reshape(rc, W, half))
            se_sum = se_sum + jnp.sum(x1q.astype(jnp.float32), axis=0, keepdims=True)
            acc2 = _dot_i8(xs, w2).astype(jnp.float32)
            x2q_s[r0:r0 + rc] = np.asarray(
                _clip8(acc2 * blk["A2"] + blk["B2"]).reshape(rc, W, half))
        mean = se_sum * (blk["se_premul"] / (H * W))
        g = _silu(mean @ blk["se_w1"] + blk["se_b1"].reshape(1, -1))
        g = jax.nn.sigmoid(g @ blk["se_w2"] + blk["se_b2"].reshape(1, -1))
        g3 = g.reshape(1, 1, half)
        aq_s = np.zeros((H, W, half), np.int8)
        for r0 in range(0, H, rc):
            bnd = band_fn(jnp.asarray(x1q_s), r0, rc, H, W, half, 1)
            acc = jnp.zeros((rc, W, half), jnp.int32)
            for ky in range(3):
                rows = bnd[ky:ky + rc]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 1, W, half)
                    acc = acc + win.astype(jnp.int32) * wdw[3 * ky + kx].astype(jnp.int32)
            aq_s[r0:r0 + rc] = np.asarray(
                _clip8(jnp.maximum(acc.astype(jnp.float32) * blk["Adw"] + blk["Bdw"], 0.0)))
        mq_s = np.zeros((H, W, half), np.int8)
        for r0 in range(0, H, rc):
            a_band = band_fn(jnp.asarray(aq_s), r0, rc, H, W, half, 1)
            x1_band = band_fn(jnp.asarray(x1q_s), r0, rc, H, W, half, 1)
            b_band = _clip8(x1_band.astype(jnp.float32) * g3)
            cat = jnp.concatenate([a_band, b_band], axis=-1)
            acc = jnp.zeros((rc * W, half), jnp.int32)
            for ky in range(3):
                rows = cat[ky:ky + rc]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 1, W, 2 * half)
                    acc = acc + _dot_i8(win.reshape(rc * W, 2 * half), blk["w3"][ky, kx])
            mq_s[r0:r0 + rc] = np.asarray(
                _clip8(jnp.maximum(acc.astype(jnp.float32) * blk["A3"] + blk["B3"], 0.0)
                       ).reshape(rc, W, half))
        out = np.zeros((H, W, cin), np.int8)
        for r0 in range(0, H, rc):
            m_band = band_fn(jnp.asarray(mq_s), r0, rc, H, W, half, 2)
            x2_band = band_fn(jnp.asarray(x2q_s), r0, rc, H, W, half, 2)
            cat = jnp.concatenate([m_band, x2_band], axis=-1)
            acc = jnp.zeros((rc * W, cin), jnp.int32)
            for ky in range(3):
                rows = cat[2 * ky:2 * ky + rc]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 2, W, cin)
                    acc = acc + _dot_i8(win.reshape(rc * W, cin), blk["w4"][ky, kx])
            z = acc.astype(jnp.float32) * blk["A4"] + blk["B4"]
            out[r0:r0 + rc] = np.asarray(
                _clip8(_silu(z) * blk["inv_out"]).reshape(rc, W, cin))
        outs.setdefault("x1q", []).append(x1q_s)
        outs.setdefault("x2q", []).append(x2q_s)
        outs.setdefault("aq", []).append(aq_s)
        outs.setdefault("g", []).append(np.asarray(g))
        outs.setdefault("mq", []).append(mq_s)
        outs.setdefault("out", []).append(out)
    return {k: np.stack(v) for k, v in outs.items()}


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.float32)
    mod = HisBlock(C)
    variables = mod.init(rng, x, False)
    p, s = variables["params"], variables["batch_stats"]

    taps = {}
    _float_hisblock_taps(p, s, x, taps, "t")
    taps = {k: float(v) for k, v in taps.items()}
    s_in = float(jnp.max(jnp.abs(x))) / 127.0
    blk = _quantize_hisblock(p, s, jnp.float32(s_in), taps, "t")
    x_q = jnp.clip(jnp.round(x / s_in), -127, 127).astype(jnp.int8)

    ref = {k: np.asarray(v) for k, v in xla_steps(blk, x_q).items()}
    ker = kernel_steps(blk, x_q)
    for k in ("x1q", "x2q", "aq", "g", "mq", "out"):
        a, b = ref[k].astype(np.float64), ker[k].astype(np.float64)
        if a.shape != b.shape:
            b = b.reshape(a.shape)
        mm = (a != b).mean()
        print(f"{k}: mismatch={mm:.6f} maxdiff={np.abs(a-b).max():.3g}")

    # and the real kernel in interpret mode
    from pytorch_object_detection_tpu.ops.pallas_qhis import qhisblock

    out_pal = np.asarray(qhisblock(blk, x_q, interpret=True))
    mm = (out_pal != ref["out"]).mean()
    print(f"pallas out: mismatch={mm:.6f} maxdiff={np.abs(out_pal.astype(np.int32)-ref['out'].astype(np.int32)).max()}")


if __name__ == "__main__":
    main()
