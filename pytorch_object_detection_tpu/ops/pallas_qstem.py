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
        _qstem_chunk(band, w_ref, a_row, b_row, padv, out_ref, carry_s,
                     r0, row_chunk, ws, pool, emit_merged, kxdots,
                     r0 == 0)


def _qstem_chunk(band, w_ref, a_row, b_row, padv, out_ref, carry_s,
                 r0, row_chunk, ws, pool, emit_merged, kxdots, is_top):
    """Conv + requant (+ fused pool) for one row chunk.

    ``band``: the int8 conv-input rows [r0-2, r0+row_chunk] inclusive
    (row_chunk+3 rows, pad rows already substituted).  ``r0`` is the
    conv-row offset within the OUTPUT block (global for the whole-image
    kernel, band-local for the banded one).  ``is_top`` tells the pool
    epilogue whether conv row r0-1 is image-top padding (Python bool, or
    a traced bool in the banded kernel where only the first grid band is
    the image top)."""
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
            return
        wp = ws // 2
        kw = 2 * nky * KTAP * S2D_C  # column-pair dot K (256)
        flat = kim.reshape(nim, wp, kw).reshape(nim * wp, kw)
        acc = _dot_i8(flat[:row_chunk * wp], w_ref[0])
        acc += _dot_i8(flat[2 * wp:(2 + row_chunk) * wp], w_ref[1])
        zm = jnp.maximum(acc.astype(jnp.float32) * a_row + b_row, 0.0)
        _qstem_pool_epilogue(zm, out_ref, carry_s[0], r0, row_chunk, wp,
                             emit_merged, is_top)
        return
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
        return

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
                         emit_merged, is_top)


def _qstem_pool_epilogue(zm, out_ref, carry, r0, row_chunk, wp, emit_merged,
                         is_top):
    """Fused 3x3/2 maxpool on the RELU'd conv rows (see the Mosaic
    constraints comment at the call site in _qstem_kernel).

    ``is_top``: conv row r0-1 is image-top padding (so ``prev`` is the
    -1 fill, not the carried row).  Python bool in the whole-image kernel
    (r0 == 0); possibly a traced bool in the banded kernel (first chunk of
    a band is the image top only on the first band — elsewhere the carry
    scratch holds the previous band's last conv row, written on the
    preceding sequential grid step)."""
    # zm [rc*wp, 128] f32 >= 0; lanes = [col 2c | col 2c+1]
    pend = []
    for i in range(row_chunk // 2):
        re_ = zm[(2 * i) * wp:(2 * i + 1) * wp]      # conv row 2p
        ro = zm[(2 * i + 1) * wp:(2 * i + 2) * wp]   # conv row 2p+1
        if i > 0:
            prev = zm[(2 * i - 1) * wp:(2 * i) * wp]  # conv row 2p-1
        elif is_top is True:
            prev = jnp.full((wp, 2 * COUT), -1.0, jnp.float32)
        elif is_top is False:
            prev = carry[0]
        else:
            prev = jnp.where(
                is_top, jnp.full((wp, 2 * COUT), -1.0, jnp.float32), carry[0])
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


def _qstem_banded_kernel(xc_ref, xp_ref, xn_ref, w_ref, sc_ref, pad_ref,
                         out_ref, *carry_s, band_rows, nbands, ws,
                         row_chunk, pool, emit_merged=False, raw=False,
                         kxdots=False):
    """Row-banded stem: grid (B, nbands), sequential bands per image.

    The whole-image kernel's input window overflows VMEM on big canvases
    (COCO 448x704 s2d: 80.7 MB double-buffered; the raw 5D view 161 MB —
    PERF.md r3), killing double-buffering headroom or the raw form
    outright.  Each banded step sees three blocks of the SAME input
    array: its own ``band_rows`` rows plus a 2-row top halo and a 1-row
    bottom halo (separate in_specs with clamped index maps — blocked-mode
    Pallas cannot overlap blocks of one spec).  Halo rows that fall
    outside the image are replaced by the pad row, selected on the band
    index.  The pool carry rides the scratch across grid steps (TPU grid
    iteration is sequential, last dim innermost), so the output is
    bit-identical to the whole-image kernel."""
    ri = pl.program_id(1)
    a_row = sc_ref[0, :]
    b_row = sc_ref[1, :]
    padv = pad_ref[0]
    if raw:
        mrg = lambda x: jnp.concatenate([x[:, 0], x[:, 1]], axis=-1)
        cur, top, bot = mrg(xc_ref[0]), mrg(xp_ref[0]), mrg(xn_ref[0])
    else:
        cur, top, bot = xc_ref[0], xp_ref[0], xn_ref[0]
    # pad rows in the u8 domain: v = u - 128 makes pad_u8 = padv + 128
    # exact (padv is int8, so padv + 128 is always a valid uint8)
    prow_u8 = (padv.astype(jnp.int32) + 128).astype(jnp.uint8)
    p2 = jnp.broadcast_to(prow_u8.reshape(1, 1, S2D_C), (2, ws, S2D_C))
    top = jnp.where(ri == 0, p2, top)
    bot = jnp.where(ri == nbands - 1, p2[:1], bot)
    x_img = jnp.concatenate([top, cur, bot], axis=0)  # [band_rows+3, ws, 16]
    for r0 in range(0, band_rows, row_chunk):
        band = (x_img[r0:r0 + row_chunk + 3].astype(jnp.int32)
                - 128).astype(jnp.int8)
        _qstem_chunk(band, w_ref, a_row, b_row, padv, out_ref, carry_s,
                     r0, row_chunk, ws, pool, emit_merged, kxdots,
                     (ri == 0) if r0 == 0 else False)


def _pick_bands(hs, row_bytes, merged, budget=40 * 2**20,
                target=21 * 2**20):
    """Band count for the stem grid.  Whole-image if its double-buffered
    window fits ``budget`` (512^2 raw is 33.5 MB — the shipped headline
    form, measured >= any banded split).  Otherwise the smallest band
    count whose window is <= ``target``: at the COCO canvas the sweep
    measured 56-row bands (20.2 MB, nb=8) 0.96 ms faster than 112-row
    (nb=4) — smaller windows double-buffer earlier (nb 4/8/16/28 =
    9.02/8.06/8.61/8.16 ms).  Bands must divide hs, be even (the 2-row
    top-halo block must start block-aligned: its offset ri*band - 2 is a
    multiple of 2 only for even bands) and keep the merged row-pair
    granularity."""
    if hs * row_bytes * 2 <= budget:
        return 1
    gran = 4 if merged else 2
    for nb in range(2, hs + 1):
        if hs % nb:
            continue
        band = hs // nb
        if band % gran:
            continue
        if band * row_bytes * 2 <= target or band <= gran:
            return nb
    return 1


def qstem_conv(xs2d, w2d, a, b, padvec, *, row_chunk: int = 32,
               pool: bool = False, emit_merged: bool = False,
               raw: bool = False, kxdots: bool = True,
               bands: int | None = None,
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
    # physical VMEM bytes per input row: the minor dim pads to 128 lanes
    # (raw [.., 2, ws, 8] pays 16x, s2d [.., ws, 16] pays 8x)
    row_bytes = (2 * ws * 128) if raw else (ws * 128)
    if bands is None:
        bands = _pick_bands(hs, row_bytes, pool and emit_merged)
    assert hs % bands == 0, (hs, bands)
    band_rows = hs // bands
    assert bands == 1 or band_rows % 2 == 0, (band_rows, bands)
    while band_rows % row_chunk or (pool and row_chunk % (4 if emit_merged else 2)):
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

    banded = bands > 1
    grid = (bsz, bands) if banded else (bsz,)
    vmem = lambda shape, imap: pl.BlockSpec(shape, imap,
                                            memory_space=pltpu.VMEM)
    whole = lambda *shape: vmem(shape, lambda *g: (0,) * len(shape))
    if pool:
        hp, wp = hs // 2, ws // 2
        oh, oc = (hp // 2, 2 * COUT) if emit_merged else (hp, COUT)
        ohb = oh // bands
        out_spec = vmem((1, ohb, wp, oc),
                        (lambda bi, ri: (bi, ri, 0, 0)) if banded else
                        (lambda bi: (bi, 0, 0, 0)))
        out_shape = jax.ShapeDtypeStruct((bsz, oh, wp, oc), jnp.int8)
        scratch = [pltpu.VMEM((1, wp, 2 * COUT), jnp.float32)]  # last-row carry
        out_bytes = bsz * hp * wp * COUT
    else:
        out_spec = vmem((1, band_rows * ws, COUT),
                        (lambda bi, ri: (bi, ri, 0)) if banded else
                        (lambda bi: (bi, 0, 0)))
        out_shape = jax.ShapeDtypeStruct((bsz, hs * ws, COUT), jnp.int8)
        scratch = []
        out_bytes = bsz * hs * ws * COUT
    if banded:
        kern = functools.partial(_qstem_banded_kernel, band_rows=band_rows,
                                 nbands=bands, ws=ws, row_chunk=row_chunk,
                                 pool=pool, emit_merged=emit_merged, raw=raw,
                                 kxdots=kxdots)
        # the 2-row top halo / 1-row bottom halo are extra blocks of the
        # SAME array, clamped at the image edges (the kernel substitutes
        # pad rows there); band_rows is even, so the top halo's offset
        # ri*band - 2 is always a multiple of its 2-row block
        hb = band_rows // 2
        if raw:
            blk = lambda r: (1, r, 2, ws, S2D_C // 2)
            idx = lambda f: (lambda bi, ri: (bi, f(ri), 0, 0, 0))
        else:
            blk = lambda r: (1, r, ws, S2D_C)
            idx = lambda f: (lambda bi, ri: (bi, f(ri), 0, 0))
        x_specs = [
            vmem(blk(band_rows), idx(lambda ri: ri)),
            vmem(blk(2), idx(lambda ri: jnp.maximum(ri * hb - 1, 0))),
            vmem(blk(1), idx(lambda ri: jnp.minimum((ri + 1) * band_rows,
                                                    hs - 1))),
        ]
        x_args = (xs2d, xs2d, xs2d)
    else:
        kern = functools.partial(_qstem_kernel, hs=hs, ws=ws,
                                 row_chunk=row_chunk, pool=pool,
                                 emit_merged=emit_merged, raw=raw,
                                 kxdots=kxdots)
        x_specs = [vmem((1, hs, 2, ws, S2D_C // 2) if raw
                        else (1, hs, ws, S2D_C),
                        (lambda bi: (bi, 0, 0, 0, 0)) if raw
                        else (lambda bi: (bi, 0, 0, 0)))]
        x_args = (xs2d,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=x_specs + [
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
        # whole-image mode at the COCO canvas (448x704 s2d): the double-
        # buffered input window alone is 80.7 MB physical (16-lane minor
        # padded to 128), so the scoped limit must rise above the default
        # 100 MB; v5e has 128 MB VMEM.  Banded mode never needs this.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(124 if not banded and hs * ws > 2**17
                              else 100) * 2**20),
        interpret=interpret,
    )(*x_args, w2d, scales, pad2d)
    if pool:
        return out
    return out.reshape(bsz, hs, ws, COUT)
