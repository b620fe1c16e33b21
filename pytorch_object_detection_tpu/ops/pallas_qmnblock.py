"""Whole-MNBlock fused int8 Pallas kernel (the MNFCOS building block).

One kernel computes dilated-depthwise-3x3(+folded BN) -> requant ->
pw1(1x1, C->aC) -> SiLU -> requant -> pw2(1x1, aC->C) -> +residual ->
requant for an entire MNBlock (reference
`/root/reference/model/modules/modules.py:195-216`): HBM sees the block
input once (int8) and the output once (int8).  The XLA ladder
(models/mnfcos_int8._mnblock_i8) round-trips three int32 accumulators and
three requant passes per block — ~13-14 ms/iter of clamp_convert/conv
fusions at B=128 (PERF.md "MNFCOS trace attribution").

Scope: any odd kernel size, dilation 1 or 2 — every MNFCOS block instance
(FPN mnb3/4 k=3 on the big P3/P4 levels, mnb5/6 k=5 and mnb7 k=7 on the
16x16-and-smaller levels, head block1/2 k=3 d=2 shared across levels).
The small-level k=5/7 blocks cost ~nothing themselves, but leaving them
on XLA next to Pallas neighbours was measured CATASTROPHIC: stripped of
its fusion context, XLA's depthwise emitter
(EmitDepthwiseInputBatchInSublanes) ran mnb5's 16x16x256 dw conv at
12.5 ms/iter — 30x the whole level's kernel cost (trace, B=128).  Routing
every block through this kernel removes the class.

Numerics match the XLA ladder op-for-op:
  * the depthwise int32 accumulation is done as f32 FMAs over the 9 taps
    — exact (|acc| <= 127*127*9 < 2^24), so it equals the int32 conv
    cast to f32;
  * every epilogue uses the same expression shapes as _mnblock_i8
    (division by the per-tensor scale, not reciprocal multiplication);
  * the one measured delta source: compiling the kernel body as ONE
    program lets XLA contract the epilogue's mul+add into FMA (native on
    the TPU VPU/MXU), so the pre-requant f32 can differ from the
    op-by-op ladder by one ulp — debugged to exactly this (a 41.499996
    vs 41.5 boundary value).  After the int8 requant that is a <= 1 LSB
    delta on the ~1e-5 of elements whose pre-requant value sits on a
    rounding boundary; the tests bound both the magnitude (<= 1) and the
    frequency (< 1e-3).

Grid is (batch,); the level image stays VMEM-resident per program and a
static Python loop walks row chunks (same structure as pallas_qblock's
nbands=1 path — the levels are small: P3 at the COCO canvas is
112x176x256 int8 = 4.9 MB in + out).

MEASURED VERDICT (r3, PERF.md "Fused MNBlock kernel"): all-fused e2e is
2003 img/s vs 2361 for the XLA ladder at 512^2 B=128 — XLA's int8 graph
was already well-fused at these thin 256-channel levels, so the kernel
stays OPT-IN (PODT_QMN=1).  It must be all-or-nothing: partially fused,
the leftover XLA depthwise hits a pathological emitter (12.5 ms for a
16x16 level — see Scope below).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_i8(x2d, w2d):
    return jax.lax.dot_general(
        x2d, w2d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _requant(y):
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _qmnblock_kernel(x_ref, wdw_ref, w1_ref, w2_ref, sc_ref, out_ref, *,
                     height, width, cin, cmid, kernel, dilation, row_chunk):
    """sc_ref f32 [7, max(cin, cmid)] rows:
    0 Adw = s_in*swdw [cin], 1 Bdw = bn shift [cin],
    2 A1 = s_a1*sw1 [cmid],  3 B1 = pw1 bias [cmid],
    4 A2 = s_a2*sw2 [cin],   5 B2 = pw2 bias [cin],
    6 scalars: [s_a1, s_a2, s_out, s_in/s_out, ...0].
    wdw_ref f32 [k*k, cin] (tap-major: ky*k+kx), w1 int8 [cin, cmid],
    w2 int8 [cmid, cin]."""
    k, d = kernel, dilation
    hd = d * (k - 1) // 2  # halo rows/cols each side ('SAME' padding)
    adw = sc_ref[0, :cin]
    bdw = sc_ref[1, :cin]
    a1r = sc_ref[2, :cmid]
    b1r = sc_ref[3, :cmid]
    a2r = sc_ref[4, :cin]
    b2r = sc_ref[5, :cin]
    s_a1 = sc_ref[6, 0]
    s_a2 = sc_ref[6, 1]
    s_out = sc_ref[6, 2]
    short_mul = sc_ref[6, 3]

    x_img = x_ref[0]  # [H, W, C] int8, VMEM-resident

    zero_rows = jnp.zeros((hd, width, cin), jnp.int8)
    zero_cols = jnp.zeros((row_chunk + 2 * hd, hd, cin), jnp.int8)
    for r0 in range(0, height, row_chunk):
        # depthwise window rows [r0-hd, r0+RC+hd) in the zero-padded x domain
        lo, hi = r0 - hd, r0 + row_chunk + hd
        clo, chi = max(lo, 0), min(hi, height)
        xs = x_img[clo:chi]
        if clo > lo:
            xs = jnp.concatenate([zero_rows[: clo - lo], xs], axis=0)
        if hi > chi:
            xs = jnp.concatenate([xs, zero_rows[: hi - chi]], axis=0)
        # pad hd columns both sides, cast once: [RC+2hd, W+2hd, C] f32
        xp = jnp.concatenate([zero_cols, xs, zero_cols], axis=1)
        xf = xp.astype(jnp.float32)

        # k*k dilated taps as per-channel VPU FMAs (exact int accumulation
        # in f32 — see module docstring)
        acc = jnp.zeros((row_chunk, width, cin), jnp.float32)
        for ky in range(k):
            for kx in range(k):
                win = xf[ky * d:ky * d + row_chunk,
                         kx * d:kx * d + width]
                acc = acc + win * wdw_ref[ky * k + kx]
        a1 = _requant((acc * adw + bdw) / s_a1).reshape(
            row_chunk * width, cin)

        # pw1 C->aC on the MXU, SiLU epilogue, requant
        z = _dot_i8(a1, w1_ref[:]).astype(jnp.float32) * a1r + b1r
        a2 = _requant(z * jax.nn.sigmoid(z) / s_a2)

        # pw2 aC->C + residual + requant
        y = _dot_i8(a2, w2_ref[:]).astype(jnp.float32) * a2r + b2r
        x_rows = x_img[r0:r0 + row_chunk].reshape(row_chunk * width, cin)
        out = _requant(y / s_out + x_rows.astype(jnp.float32) * short_mul)
        out_ref[0, r0:r0 + row_chunk] = out.reshape(row_chunk, width, cin)


def qmnblock(x_q, wdw_q, swdw, bdw, w1_q, sw1, b1, w2_q, sw2, b2,
             s_in, s_a1, s_a2, s_out, *, kernel: int = 3, dilation: int = 1,
             row_chunk: int | None = None, interpret: bool = False):
    """Fused int8 MNBlock (odd kernel size, dilation 1 or 2).

    x_q [B,H,W,C] int8; wdw_q int8 [k,k,1,C] (HWIO depthwise, BN already
    folded into the float kernel before quantization), swdw f32[C];
    w1_q [1,1,C,aC] / w2_q [1,1,aC,C] int8 with per-out-channel scales
    sw1/sw2 and f32 biases b1/b2; s_* per-tensor activation scales.
    Returns int8 [B,H,W,C] == models/mnfcos_int8._mnblock_i8 up to
    <= 1 LSB on requant-boundary elements (FMA contraction — see module
    docstring).
    """
    assert dilation in (1, 2), dilation
    assert kernel % 2 == 1, kernel
    bsz, h, w, cin = x_q.shape
    cmid = w1_q.shape[-1]
    assert wdw_q.shape == (kernel, kernel, 1, cin), wdw_q.shape
    assert w2_q.shape[-1] == cin, w2_q.shape

    if row_chunk is None:
        row_chunk = 16
    row_chunk = min(row_chunk, h)
    while h % row_chunk:  # non-pow2 level heights (COCO 28x44...)
        row_chunk -= 1

    wdw = wdw_q.astype(jnp.float32).reshape(kernel * kernel, cin)
    w1 = w1_q.reshape(cin, cmid)
    w2 = w2_q.reshape(cmid, cin)

    cmax = max(cin, cmid)

    def row(v):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cmax - v.shape[0]))

    s_in = jnp.asarray(s_in, jnp.float32)
    s_out = jnp.asarray(s_out, jnp.float32)
    scalars = jnp.stack([jnp.asarray(s_a1, jnp.float32).reshape(()),
                         jnp.asarray(s_a2, jnp.float32).reshape(()),
                         s_out.reshape(()), (s_in / s_out).reshape(())])
    scales = jnp.stack([
        row(s_in * swdw), row(bdw), row(sw1 * jnp.asarray(s_a1, jnp.float32)),
        row(b1), row(sw2 * jnp.asarray(s_a2, jnp.float32)), row(b2),
        row(scalars),
    ])  # [7, cmax]

    kern = functools.partial(
        _qmnblock_kernel, height=h, width=w, cin=cin, cmid=cmid,
        kernel=kernel, dilation=dilation, row_chunk=row_chunk,
    )
    vmem = lambda shape, imap: pl.BlockSpec(shape, imap,
                                            memory_space=pltpu.VMEM)
    whole = lambda *shape: vmem(shape, lambda b: (0,) * len(shape))
    flops = 2 * bsz * h * w * (kernel * kernel * cin + 2 * cin * cmid)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            vmem((1, h, w, cin), lambda b: (b, 0, 0, 0)),
            whole(kernel * kernel, cin),
            whole(cin, cmid),
            whole(cmid, cin),
            whole(7, cmax),
        ],
        out_specs=vmem((1, h, w, cin), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cin), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=bsz * h * w * cmid,
            bytes_accessed=2 * bsz * h * w * cin + cin * cmid * 2),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x_q, wdw, w1, w2, scales)
