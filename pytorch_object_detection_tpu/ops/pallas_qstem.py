"""Fused int8 space-to-depth ResNet stem kernel (TPU).

One kernel computes the whole serving stem — 7x7/2 conv + BN + ReLU +
requantize + 3x3/2 maxpool — from a space-to-depth uint8-derived int8
input.  Replaces the three slowest XLA passes of the pipeline (bf16 stem
conv at 35 TF/s on 3 input channels, the unfused quantize chain, and the
int8 reduce_window running ~5x off its bandwidth floor — together ~6.8 ms
at B=64, PERF.md).

Key facts making this exact and fast:
  * images are uint8, and the normalize affine ((u/255 - mean)/std) is
    per-channel linear — it folds into the conv weights and bias EXACTLY,
    so ``u8 - 128`` IS the int8 conv input with zero quantization error
    (nn/resnet_int8.quantize_stem_s2d);
  * s2d(2) turns the 7x7/2 conv into a 4x4/1 conv over 12 channels
    (nn/resnet.s2d_stem_kernel, exact) = ONE K=192 int8 MXU dot per row
    band, with the im2col built by 16 lane-concats of shifted slices;
  * the 3x3/2 maxpool commutes with the monotone requant, and both of its
    stride-2 subsamples run at 128 lanes via lane-merge reshapes (columns
    first, then rows) — the Mosaic-supported shape-cast forms (PERF.md).

Border semantics: the reference zero-pads the NORMALIZED image
(pad=3, resnet50 stem); x_f = 0 corresponds to v = 255*mean - 128, which
is generally non-integer — the kernel pads with round(255*mean - 128)
(error <= 0.5 input LSB, border pixels only; documented delta).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S2D_C = 16  # s2d(2) of 3 input channels (12), zero-padded to 16 lanes
            # so the 16-piece im2col concat lands on 256 aligned lanes
KTAP = 4    # 4x4 s2d kernel
COUT = 64


def _dot_i8(x2d, w2d):
    return jax.lax.dot_general(
        x2d, w2d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _clip8(x):
    return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)


def _qstem_kernel(x_ref, w_ref, sc_ref, pad_ref, out_ref, *carry_s,
                  hs, ws, row_chunk, pool, emit_merged=False, raw=False,
                  kxdots=False):
    # pool: scale rows are channel-tiled to 128 for the block-diag dot
    a_row = sc_ref[0, :]
    b_row = sc_ref[1, :]
    padv = pad_ref[0]  # [S2D_C] int8 (x_f = 0 in the v domain)

    if raw:
        # raw mode: the block is the FREE bitcast view [hs, 2, ws, 8] of the
        # channel-padded raw image (row pairs split on an outer dim, column
        # pairs already lane-merged by the row-major reshape).  One offset-0
        # lane-concat rebuilds the (dy, dx, c4) s2d channel order in VMEM —
        # the 4.3 ms of XLA transpose/relayout copies (trace r3: copy.185/
        # 187/228) never exist.
        x4 = x_ref[0]  # [hs, 2, ws, 8] uint8
        x_img = jnp.concatenate([x4[:, 0], x4[:, 1]], axis=-1)
    else:
        x_img = x_ref[0]  # [hs, ws, 16] uint8 (raw s2d image data)

    # conv 4x4/1 (pad (2,1)) + BN + ReLU + requant; output stays 2D
    # [RC*ws, 64] — a 3D reshape at 64 lanes is an unsupported Mosaic
    # shape cast (PERF.md), so the caller reshapes in XLA (free on HBM)
    prow = jnp.broadcast_to(padv.reshape(1, 1, S2D_C), (1, ws, S2D_C))
    for r0 in range(0, hs, row_chunk):
        lo, hi = r0 - 2, r0 + row_chunk  # rows [lo, hi] inclusive (RC+3)
        clo, chi = max(lo, 0), min(hi, hs - 1)
        # u8 -> v = u - 128 (the int8 conv input) converts in VMEM — no
        # separate XLA cast pass over the image
        band = (x_img[clo:chi + 1].astype(jnp.int32) - 128).astype(jnp.int8)
        for _ in range(clo - lo):
            band = jnp.concatenate([prow, band], axis=0)
        for _ in range(hi - chi):
            band = jnp.concatenate([band, prow], axis=0)
        # col shifts built as concats (offset-0 results): Mosaic rejects a
        # lane-concat of sublane-OFFSET slices ("offset mismatch on
        # non-concat dimension"), so each shifted piece is materialized by
        # the same concat-shift pattern the block kernels use
        if kxdots:
            # v2 (r3): smaller im2col + accumulating ky-tap dots.  Mosaic
            # lane-merge reshapes need a >=128-lane SOURCE (a 64->128 2D
            # merge is an unsupported shape cast — measured), which fixes
            # the factoring per mode:
            #   * no pool: im2col over kx only (4 pieces, 64 lanes) + 4
            #     accumulating K=64 dots over sublane-aligned row-offset
            #     slices of the flattened im2col (4x less concat volume,
            #     4x smaller im2col VMEM than the 16-piece form);
            #   * pool: im2col over (ky in {0,1}) x kx (8 pieces, 128
            #     lanes — mergeable to column pairs) + 2 accumulating
            #     K=256 dots, the second over a +2-row offset slice
            #     (2x less concat volume, 2x smaller im2col).
            # MXU work is unchanged (same total K, same column-pair kron
            # half-density in the pool form).
            nrows = row_chunk + KTAP - 1  # band rows
            nky = 1 if not pool else 2  # ky taps folded into im2col lanes
            nim = nrows - (nky - 1)  # im2col rows
            pieces = []
            for ky in range(nky):
                rows = band[ky:ky + nim]
                for kx in range(KTAP):
                    off = kx - 2  # window cols q-2 .. q+1
                    if off == 0:
                        piece = rows
                    elif off < 0:
                        fill = jnp.broadcast_to(
                            padv.reshape(1, 1, S2D_C), (nim, -off, S2D_C))
                        piece = jnp.concatenate(
                            [fill, rows[:, :ws + off]], axis=1)
                    else:
                        fill = jnp.broadcast_to(
                            padv.reshape(1, 1, S2D_C), (nim, off, S2D_C))
                        piece = jnp.concatenate(
                            [rows[:, off:], fill], axis=1)
                    pieces.append(piece)
            kim = jnp.concatenate(pieces, axis=-1)  # [nim, ws, nky*4*S2D_C]
            if not pool:
                flat = kim.reshape(nim * ws, KTAP * S2D_C)
                acc = _dot_i8(flat[:row_chunk * ws], w_ref[0])
                for ky in range(1, KTAP):
                    acc += _dot_i8(
                        flat[ky * ws:(ky + row_chunk) * ws], w_ref[ky])
                z = acc.astype(jnp.float32) * a_row + b_row
                out_ref[0, r0 * ws:(r0 + row_chunk) * ws] = _clip8(
                    jnp.maximum(z, 0.0))
                continue
            wp = ws // 2
            kw = 2 * nky * KTAP * S2D_C  # column-pair dot K (256)
            flat = kim.reshape(nim, wp, kw).reshape(nim * wp, kw)
            acc = _dot_i8(flat[:row_chunk * wp], w_ref[0])
            acc += _dot_i8(flat[2 * wp:(2 + row_chunk) * wp], w_ref[1])
            zm = jnp.maximum(acc.astype(jnp.float32) * a_row + b_row, 0.0)
            _qstem_pool_epilogue(zm, out_ref, carry_s[0], r0, row_chunk, wp,
                                 emit_merged)
            continue
        pieces = []
        for ky in range(KTAP):
            rows = band[ky:ky + row_chunk]
            for kx in range(KTAP):
                off = kx - 2  # window cols q-2 .. q+1
                if off == 0:
                    piece = rows
                elif off < 0:
                    fill = jnp.broadcast_to(
                        padv.reshape(1, 1, S2D_C), (row_chunk, -off, S2D_C))
                    piece = jnp.concatenate([fill, rows[:, :ws + off]], axis=1)
                else:
                    fill = jnp.broadcast_to(
                        padv.reshape(1, 1, S2D_C), (row_chunk, off, S2D_C))
                    piece = jnp.concatenate([rows[:, off:], fill], axis=1)
                pieces.append(piece)
        win = jnp.concatenate(pieces, axis=-1)  # [RC, ws, 256]
        if not pool:
            acc = _dot_i8(win.reshape(row_chunk * ws, KTAP * KTAP * S2D_C), w_ref[:])
            z = acc.astype(jnp.float32) * a_row + b_row
            out_ref[0, r0 * ws:(r0 + row_chunk) * ws] = _clip8(jnp.maximum(z, 0.0))
            continue

        # ---- fused 3x3/2 maxpool (reference resnet50 stem pool).  Mosaic
        # constraints shaping this epilogue (each hit while building it):
        #   * every 64-lane shape cast of the conv OUTPUT is rejected (2D
        #     and 3D lane-merges included), so the (even,odd)-column split
        #     happens on the 256-lane im2col — the one lane-merge form
        #     proven to compile ([R,2W,C] -> [R,W,2C], PERF.md) — and ONE
        #     block-diag dot produces the column-pair tensor directly
        #     (two lane-offset half dots measured slower: the offset-256
        #     operand forces a relayout per band);
        #   * int8/uint8 jnp.maximum does not legalize (arith.maxsi/maxui),
        #     so the pool maxes run on the RELU'd f32 values and the int8
        #     requant happens once on the pooled result — bit-identical
        #     because round/clip are monotone (max commutes);
        #   * sublane-concat of a lane-OFFSET slice is the "offset mismatch
        #     on non-concat dimension" failure, so the row shift happens on
        #     the full-width tensor and the odd-lane slice comes after.
        # emit_merged=True: pool rows are written as ROW-pair lanes
        # ([pool row 2q | 2q+1]) — the layout the merged stage-1 bottleneck
        # kernels consume — so no XLA relayout ever materializes.
        (carry,) = carry_s
        wp = ws // 2
        k2 = KTAP * KTAP * S2D_C
        win_m = win.reshape(row_chunk, wp, 2 * k2)  # cols 2c | 2c+1
        acc = _dot_i8(win_m.reshape(row_chunk * wp, 2 * k2), w_ref[:])
        zm = jnp.maximum(acc.astype(jnp.float32) * a_row + b_row, 0.0)
        _qstem_pool_epilogue(zm, out_ref, carry, r0, row_chunk, wp,
                             emit_merged)


def _qstem_pool_epilogue(zm, out_ref, carry, r0, row_chunk, wp, emit_merged):
    """Fused 3x3/2 maxpool on the RELU'd conv rows (see the Mosaic
    constraints comment at the call site in _qstem_kernel)."""
    # zm [rc*wp, 128] f32 >= 0; lanes = [col 2c | col 2c+1]
    pend = []
    for i in range(row_chunk // 2):
        re_ = zm[(2 * i) * wp:(2 * i + 1) * wp]      # conv row 2p
        ro = zm[(2 * i + 1) * wp:(2 * i + 2) * wp]   # conv row 2p+1
        if i > 0:
            prev = zm[(2 * i - 1) * wp:(2 * i) * wp]  # conv row 2p-1
        elif r0 == 0:
            prev = jnp.full((wp, 2 * COUT), -1.0, jnp.float32)
        else:
            prev = carry[0]
        rmax = jnp.maximum(jnp.maximum(re_, ro), prev)  # [wp, 128]
        rm_prev = jnp.concatenate(
            [jnp.full((1, 2 * COUT), -1.0, jnp.float32), rmax[:-1]], axis=0)
        e_col, o_col = rmax[:, :COUT], rmax[:, COUT:]   # cols 2c | 2c+1
        pool_row = _clip8(jnp.maximum(
            jnp.maximum(e_col, o_col), rm_prev[:, COUT:]))  # [wp, 64]
        p = r0 // 2 + i
        if not emit_merged:
            out_ref[0, p] = pool_row
        elif p % 2 == 0:
            pend.append(pool_row)
        else:
            out_ref[0, p // 2] = jnp.concatenate([pend.pop(), pool_row], axis=-1)
    carry[0] = zm[(row_chunk - 1) * wp:]


def qstem_conv(xs2d, w2d, a, b, padvec, *, row_chunk: int = 32,
               pool: bool = False, emit_merged: bool = False,
               raw: bool = False, kxdots: bool = True,
               interpret: bool = False):
    """int8 s2d stem conv: [B, 256, 256, 16] uint8 -> [B, 256, 256, 64] int8.

    xs2d: space_to_depth of the channel-padded RAW uint8 image (the
    u8 - 128 conversion runs inside the kernel);
    w2d/a/b/padvec from nn/resnet_int8.quantize_stem_s2d (a/b include BN
    fold and the output requant scale; relu commutes with the positive
    scale).

    raw=True: xs2d is instead the FREE bitcast view [B, hs, 2, ws, 8] of
    the channel-padded raw uint8 image ([B, 2hs, 2ws, 4].reshape(B, hs, 2,
    ws, 8) — row-major, so no data moves) and the s2d row merge happens
    in-kernel; bit-identical to the space_to_depth path but skips its XLA
    transpose/relayout copies entirely.

    pool=False: returns the conv output; the 3x3/2 maxpool runs in XLA.
    pool=True: the 3x3/2 stride-2 maxpool (pad 1 — reference resnet50
    stem) is fused into the kernel epilogue and the full-res conv output
    never touches HBM: returns [B, hs/2, ws/2, 64] int8 directly
    (bit-identical to pool=False + reduce_window; tests/test_quant.py).
    emit_merged=True (requires pool): pool rows leave the kernel ROW-pair
    lane-merged as [B, hs/4, ws/2, 128] (row 2q in lanes :64, row 2q+1 in
    64:), feeding the merged stage-1 bottleneck kernels with no XLA
    relayout in between.
    """
    if raw:
        bsz, hs, two, ws, c8 = xs2d.shape
        assert two == 2 and c8 == S2D_C // 2, xs2d.shape
    else:
        bsz, hs, ws, c = xs2d.shape
        assert c == S2D_C, xs2d.shape
    assert w2d.shape == (KTAP * KTAP * S2D_C, COUT)
    assert xs2d.dtype == jnp.uint8, xs2d.dtype
    assert not (emit_merged and not pool)
    while hs % row_chunk or (pool and row_chunk % (4 if emit_merged else 2)):
        row_chunk //= 2
    assert row_chunk >= 1 and not (pool and (hs % 2 or ws % 2))

    if kxdots:
        # v2 weights: [ndots, K, N] — one dot operand per ky tap (group).
        # w2d's K ordering is (ky, kx, c): tap ky owns rows ky*64:(ky+1)*64
        if pool:
            wk = w2d.reshape(2, 2 * KTAP * S2D_C, COUT)  # ky pairs {0,1},{2,3}
            w2d = jax.vmap(
                lambda w: jnp.kron(jnp.eye(2, dtype=w.dtype), w))(wk)
        else:
            w2d = w2d.reshape(KTAP, KTAP * S2D_C, COUT)
    elif pool:
        # column-pair dot: block-diag weights produce [col 2c | 2c+1] lanes
        w2d = jnp.kron(jnp.eye(2, dtype=w2d.dtype), w2d)  # [2K, 128]
    if pool:
        tile2 = lambda v: jnp.tile(jnp.asarray(v, jnp.float32).reshape(-1), 2)
        a, b = tile2(a), tile2(b)
    scales = jnp.stack([
        jnp.asarray(a, jnp.float32).reshape(-1),
        jnp.asarray(b, jnp.float32).reshape(-1),
    ])  # [2, 64 or 128]
    pad2d = jnp.asarray(padvec, jnp.int8).reshape(1, S2D_C)

    kern = functools.partial(_qstem_kernel, hs=hs, ws=ws, row_chunk=row_chunk,
                             pool=pool, emit_merged=emit_merged, raw=raw,
                             kxdots=kxdots)
    whole = lambda *shape: pl.BlockSpec(shape, lambda bi: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    if pool:
        hp, wp = hs // 2, ws // 2
        oh, oc = (hp // 2, 2 * COUT) if emit_merged else (hp, COUT)
        out_spec = pl.BlockSpec((1, oh, wp, oc), lambda bi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bsz, oh, wp, oc), jnp.int8)
        scratch = [pltpu.VMEM((1, wp, 2 * COUT), jnp.float32)]  # last-row carry
        out_bytes = bsz * hp * wp * COUT
    else:
        out_spec = pl.BlockSpec((1, hs * ws, COUT), lambda bi: (bi, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bsz, hs * ws, COUT), jnp.int8)
        scratch = []
        out_bytes = bsz * hs * ws * COUT
    out = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hs, 2, ws, S2D_C // 2) if raw else (1, hs, ws, S2D_C),
                         (lambda bi: (bi, 0, 0, 0, 0)) if raw else (lambda bi: (bi, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
            whole(*w2d.shape),
            whole(*scales.shape),
            whole(1, S2D_C),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hs * ws * KTAP * KTAP * S2D_C * COUT,
            bytes_accessed=xs2d.size + out_bytes,
            transcendentals=0,
        ),
        # COCO canvas (448x704 s2d): the double-buffered input window alone
        # is 80.7 MB physical (16-lane minor padded to 128), so the scoped
        # limit must rise above the default 100 MB; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(124 if hs * ws > 2**17 else 100) * 2**20),
        interpret=interpret,
    )(xs2d, w2d, scales, pad2d)
    if pool:
        return out
    return out.reshape(bsz, hs, ws, COUT)
