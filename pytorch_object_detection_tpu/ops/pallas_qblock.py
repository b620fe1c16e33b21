"""Whole-bottleneck fused int8 Pallas kernel (stride-1 ResNet blocks).

One kernel computes conv1(1x1) -> ReLU -> conv2(3x3 SAME) -> ReLU ->
conv3(1x1) -> +residual -> ReLU -> requantize for an entire bottleneck
block: HBM sees the block input once (int8) and the block output once
(int8).  The a1/a2 intermediates and the int32/f32 accumulators never
leave VMEM — this removes both the int32 accumulator round-trips of the
per-conv path and the residual elementwise pass that costs the bf16
XLA path ~28% of its eval iteration (trace-verified, PERF.md).

Grid is (batch,); the whole (small) feature image stays resident per
program and a static Python loop walks row chunks, so conv2's row halo is
plain static slicing with zero-row edge padding — no dynamic control flow,
no masks, MXU-only dots (int8 x int8 -> int32).

Supports the identity shortcut (res = x * short_mul) and the projection
shortcut (res = dequant(conv(x, wd))) — i.e. every stride-1 block of
ResNet-50 including layer1_0.  The three stride-2 blocks use the per-conv
kernels (ops/pallas_qconv).

Epilogue scale algebra identical to nn/resnet_int8.quantize_resnet50.
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


def _qblock_kernel(x_ref, *refs, height, width, cin, cw, cout, row_chunk,
                   has_ds, merged=False, nbands=1):
    """sc_ref: f32 scale table [8, max(cw,cout)] rows =
    A1,B1,A2,B2,A3,B3,Ad|short_mul,Bd (unused tail zero-padded).

    ``merged=True``: ROW-pair lane-merged layout.  The block input/output
    are [H/2, W, 2C] int8 with image row 2q in lanes [:C] and row 2q+1 in
    lanes [C:] — produced by the stem-pool kernel (emit_merged) and carried
    across the whole 64-channel stage so no XLA relayout ever materializes
    (Mosaic rejects every 64<->128-lane shape cast, so the layout must be
    born and die inside kernels).  Weights are block-diag, scale rows
    channel-tiled, and every dot/epilogue runs at 2x the lane width —
    recovering the MXU/VPU utilization the 64-channel stage-1 bottlenecks
    lose to 128-lane padding (conv2's nine 64x64 dots are 4x-padded;
    block-diag 128x128 halves the pass count).  cin/cw/cout here are the
    MERGED channel counts (2x true); ``height`` is the merged height H/2.
    conv2's +-1-ROW windows become half-lane rotates built from 64-aligned
    lane slices of the current and +-1 merged rows; column windows are the
    ordinary shifts.

    ``nbands > 1``: row-banded grid (B, nbands) for big canvases where the
    whole-image in+out windows lose double-buffering headroom (COCO:
    measured +42% per block at matched pixels, dev_qblock_coco.py).  Two
    extra in_specs carry the 1-row top/bottom halos of the SAME input
    array (clamped index maps); ``height`` is then the BAND height.  conv2
    zero-pads in the conv1-OUTPUT domain, so edge bands substitute the
    zero row into a1 selected on the band index — bit-identical to the
    whole-image kernel.
    """
    if nbands > 1:
        xt_ref, xb_ref = refs[0], refs[1]
        refs = refs[2:]
        ri = pl.program_id(1)
    w1_ref, w2_ref, w3_ref, wd_ref, sc_ref, out_ref = refs
    a1r = sc_ref[0, :cw]
    b1r = sc_ref[1, :cw]
    a2r = sc_ref[2, :cw]
    b2r = sc_ref[3, :cw]
    a3r = sc_ref[4, :cout]
    b3r = sc_ref[5, :cout]
    adr = sc_ref[6, :cout]
    bdr = sc_ref[7, :cout]

    x_img = x_ref[0]  # [H(band), W, Cin], int8, VMEM-resident

    zero_row = jnp.zeros((1, width, cw), jnp.int8)
    half = cw // 2  # merged: lanes per true image row
    for r0 in range(0, height, row_chunk):
        lo = max(r0 - 1, 0)
        hi = min(r0 + row_chunk + 1, height)
        if nbands > 1:
            # halo rows come from the extra blocks; interior chunks are a
            # free ref slice (concatenating whole band+halo up front was
            # measured as a 2x regression at small row_chunks — it copies
            # the window through the VPU once per program)
            pieces = ([xt_ref[0]] if r0 == 0 else []) + [x_img[lo:hi]] + \
                ([xb_ref[0]] if r0 + row_chunk == height else [])
            xs = pieces[0] if len(pieces) == 1 else jnp.concatenate(
                pieces, axis=0)
            rows = row_chunk + 2
        else:
            xs = x_img[lo:hi]  # [rows, W, Cin]
            rows = hi - lo
        # conv1 1x1 + BN + ReLU -> int8 a1 (halo rows included)
        acc1 = _dot_i8(xs.reshape(rows * width, cin), w1_ref[:])
        a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
        a1 = a1.reshape(rows, width, cw)
        if nbands > 1:
            # conv2 zero-pads the a1 domain at the IMAGE edges only —
            # interior bands keep the real halo rows
            if r0 == 0:
                a1 = jnp.concatenate(
                    [jnp.where(ri == 0, zero_row, a1[:1]), a1[1:]], axis=0)
            if r0 + row_chunk == height:
                a1 = jnp.concatenate(
                    [a1[:-1], jnp.where(ri == nbands - 1, zero_row, a1[-1:])],
                    axis=0)
        else:
            if lo == r0:  # top edge: conv2's row -1 is zero padding
                a1 = jnp.concatenate([zero_row, a1], axis=0)
            if hi == r0 + row_chunk:  # bottom edge
                a1 = jnp.concatenate([a1, zero_row], axis=0)
        # a1 now [row_chunk + 2, W, cw]

        # conv2 3x3 SAME: nine shifted int8 dots accumulating int32
        zero_col = jnp.zeros((row_chunk, 1, cw), jnp.int8)
        acc2 = jnp.zeros((row_chunk * width, cw), jnp.int32)
        for ky in range(3):
            if not merged:
                band = a1[ky:ky + row_chunk]  # [RC, W, cw]
            else:
                # merged rows [E_q | O_q] = image rows (2q, 2q+1); the
                # +-1 image-row windows are half-lane rotates through the
                # +-1 MERGED rows
                cur = a1[1:1 + row_chunk]
                if ky == 0:   # image rows (2q-1, 2q) = [O_{q-1} | E_q]
                    prev = a1[0:row_chunk]
                    band = jnp.concatenate(
                        [prev[..., half:], cur[..., :half]], axis=-1)
                elif ky == 2:  # image rows (2q+1, 2q+2) = [O_q | E_{q+1}]
                    nxt = a1[2:2 + row_chunk]
                    band = jnp.concatenate(
                        [cur[..., half:], nxt[..., :half]], axis=-1)
                else:
                    band = cur
            for kx in range(3):
                if kx == 0:
                    win = jnp.concatenate([zero_col, band[:, : width - 1]], axis=1)
                elif kx == 2:
                    win = jnp.concatenate([band[:, 1:], zero_col], axis=1)
                else:
                    win = band
                acc2 = acc2 + _dot_i8(win.reshape(row_chunk * width, cw), w2_ref[ky, kx])
        a2 = _requant(jnp.maximum(acc2.astype(jnp.float32) * a2r + b2r, 0.0))

        # conv3 1x1 + residual + ReLU + requant -> block output rows
        acc3 = _dot_i8(a2, w3_ref[:])
        y = acc3.astype(jnp.float32) * a3r + b3r
        x_rows = x_img[r0:r0 + row_chunk].reshape(row_chunk * width, cin)
        if has_ds:
            accd = _dot_i8(x_rows, wd_ref[:])
            y = y + accd.astype(jnp.float32) * adr + bdr
        else:
            y = y + x_rows.astype(jnp.float32) * adr  # adr = short_mul (bcast)
        out = _requant(jnp.maximum(y, 0.0))
        out_ref[0, r0:r0 + row_chunk] = out.reshape(row_chunk, width, cout)


def _qblock_s2_kernel(x_ref, w1_ref, w2_ref, w3_ref, wd_ref, sc_ref, out_ref, *,
                      height, width, cin, cw, cout, row_chunk, merged_in=False):
    """Stride-2 bottleneck (conv2 3x3/2 + projection shortcut 1x1/2).

    Output rows are chunked; each chunk computes a1 for input rows
    [2p0-1, 2p0+2RC] on the fly (1x1 conv), applies the stride-2 window
    selection with reshape-pair tricks (all static), and fuses conv3 +
    requantized shortcut + ReLU + requant.

    ``merged_in=True``: the input is the ROW-pair lane-merged stage-1
    layout ([H/2, W, 2*Cin_true], see _qblock_kernel merged) — the natural
    consumer: the stride-2 ROW subsample is a plain 64-aligned lane slice
    (even rows live in lanes [:C]), with no reshape at all.  ``height`` is
    then the merged height H/2 and ``cin`` the merged channels; only
    conv1's weights/scales come block-diag/tiled (its taps un-merge).
    """
    cw_t = cw // 2 if merged_in else cw      # true tap channel count
    cin_t = cin // 2 if merged_in else cin   # true input channels
    a1r, b1r = sc_ref[0, :cw], sc_ref[1, :cw]
    a2r, b2r = sc_ref[2, :cw_t], sc_ref[3, :cw_t]
    a3r, b3r = sc_ref[4, :cout], sc_ref[5, :cout]
    adr, bdr = sc_ref[6, :cout], sc_ref[7, :cout]

    x_img = x_ref[0]  # [H, W, Cin]  (merged_in: [H/2, W, 2Cin])
    h_out, w_out = (height if merged_in else height // 2), width // 2

    for p0 in range(0, h_out, row_chunk):
        if merged_in:
            # a1 on merged rows [p0-1, p0+RC) (halo: image row 2p-1)
            lo, hi = p0 - 1, p0 + row_chunk
            clo, chi = max(lo, 0), min(hi, height)
            xs = x_img[clo:chi]
            rows = chi - clo
            acc1 = _dot_i8(xs.reshape(rows * width, cin), w1_ref[:])
            a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
            a1 = a1.reshape(rows, width, cw)
            zrow = jnp.zeros((1, width, cw), jnp.int8)
            for _ in range(clo - lo):
                a1 = jnp.concatenate([zrow, a1], axis=0)
            for _ in range(hi - chi):
                a1 = jnp.concatenate([a1, zrow], axis=0)
            # a1 [RC+1, W, 2cw_t]; pad cols FIRST (a sublane-concat of a
            # lane-OFFSET slice is the Mosaic "offset mismatch" failure),
            # then un-merge the three tap rows by lane slicing
            zcol = jnp.zeros((a1.shape[0], 1, cw), jnp.int8)
            ap = jnp.concatenate([zcol, a1, zcol], axis=1)  # [RC+1, W+2, cw]
            bands = [
                ap[0:row_chunk, :, cw_t:],               # image row 2p-1
                ap[1:1 + row_chunk, :, :cw_t],           # image row 2p
                ap[1:1 + row_chunk, :, cw_t:],           # image row 2p+1
            ]
        else:
            lo = 2 * p0 - 1
            hi = 2 * p0 + 2 * row_chunk + 1  # rows [lo, hi], count 2RC+2
            clo, chi = max(lo, 0), min(hi + 1, height)
            xs = x_img[clo:chi]
            rows = chi - clo
            acc1 = _dot_i8(xs.reshape(rows * width, cin), w1_ref[:])
            a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
            a1 = a1.reshape(rows, width, cw)
            zrow = jnp.zeros((1, width, cw), jnp.int8)
            for _ in range(clo - lo):
                a1 = jnp.concatenate([zrow, a1], axis=0)
            for _ in range(hi + 1 - chi):
                a1 = jnp.concatenate([a1, zrow], axis=0)
            # a1: [2RC+2, W, cw]; pad cols by 1 both sides for kx shifts
            zcol = jnp.zeros((a1.shape[0], 1, cw), jnp.int8)
            ap = jnp.concatenate([zcol, a1, zcol], axis=1)  # [2RC+2, W+2, cw]
            bands = [
                ap[ky:ky + 2 * row_chunk].reshape(
                    row_chunk, 2, width + 2, cw)[:, 0]  # stride-2 rows
                for ky in range(3)
            ]

        acc2 = jnp.zeros((row_chunk * w_out, cw_t), jnp.int32)
        for ky in range(3):
            band = bands[ky]  # [RC, W+2, cw_t]
            for kx in range(3):
                if kx == 2:
                    sl = band[:, 2:width + 2]
                else:
                    sl = band[:, kx:width + kx]
                # stride-2 cols via lane-merge: [RC, W, c] -> [RC, W/2, 2c]
                # puts even cols in the first c LANES — an aligned lane
                # slice instead of the (slow) 2-sublane pair select
                win = sl.reshape(row_chunk, w_out, 2 * cw_t)[:, :, :cw_t]
                acc2 = acc2 + _dot_i8(win.reshape(row_chunk * w_out, cw_t), w2_ref[ky, kx])
        a2 = _requant(jnp.maximum(acc2.astype(jnp.float32) * a2r + b2r, 0.0))

        acc3 = _dot_i8(a2, w3_ref[:])
        y = acc3.astype(jnp.float32) * a3r + b3r
        # projection shortcut: x rows 2p, cols even (same lane-merge trick)
        if merged_in:
            xr = x_img[p0:p0 + row_chunk, :, :cin_t]  # image rows 2p
        else:
            xr = x_img[2 * p0:2 * p0 + 2 * row_chunk]
            xr = xr.reshape(row_chunk, 2, width, cin_t)[:, 0]
        xr = xr.reshape(row_chunk, w_out, 2 * cin_t)[:, :, :cin_t]
        accd = _dot_i8(xr.reshape(row_chunk * w_out, cin_t), wd_ref[:])
        y = y + accd.astype(jnp.float32) * adr + bdr
        out = _requant(jnp.maximum(y, 0.0))
        out_ref[0, p0:p0 + row_chunk] = out.reshape(row_chunk, w_out, cout)


def qbottleneck_s2(x, w1, w2, w3, wd, a1, b1, a2, b2, a3, b3, ad, bd, *,
                   row_chunk: int = 8, merged_in: bool = False,
                   interpret: bool = False):
    """Fused stride-2 bottleneck block (always a projection shortcut).

    x [B,H,W,Cin] int8 -> [B,H/2,W/2,Cout] int8.
    ``merged_in=True``: x is the row-pair lane-merged stage-1 layout
    [B,H/2,W,2Cin] (see _qblock_s2_kernel); output stays canonical.
    """
    bsz, h, wdt, cin = x.shape
    cw = w1.shape[1]
    cout = w3.shape[1]
    h_out, w_out = (h if merged_in else h // 2), wdt // 2
    row_chunk = min(row_chunk, h_out)
    while h_out % row_chunk:  # non-pow2 canvases (COCO 896x1408)
        row_chunk //= 2
    assert row_chunk >= 1
    if merged_in:
        assert cin == 2 * w1.shape[0], (x.shape, w1.shape)
        w1 = jnp.kron(jnp.eye(2, dtype=w1.dtype), w1)  # [2Cin, 2cw]
        tile2 = lambda v: jnp.tile(jnp.asarray(v, jnp.float32).reshape(-1), 2)
        a1k, b1k = tile2(a1), tile2(b1)
        cw_k = 2 * cw
    else:
        a1k, b1k, cw_k = a1, b1, cw
    cmax = max(cw_k, cout)

    def row(v):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cmax - v.shape[0]))

    scales = jnp.stack([
        row(a1k), row(b1k), row(a2), row(b2), row(a3), row(b3), row(ad), row(bd),
    ])
    kern = functools.partial(
        _qblock_s2_kernel, height=h, width=wdt, cin=cin, cw=cw_k, cout=cout,
        row_chunk=row_chunk, merged_in=merged_in,
    )
    true_cin = cin // 2 if merged_in else cin
    flops = 2 * bsz * h_out * 2 * wdt * true_cin * cw + 2 * bsz * h_out * w_out * (
        9 * cw * cw + cw * cout + true_cin * cout)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cw_k), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cw, cw), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((true_cin, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cmax), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h_out, w_out, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size + bsz * h_out * w_out * cout,
            transcendentals=0,
        ),
        # 124 MB of the v5e's 128 MB VMEM: COCO-canvas levels need >100
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(x, w1, w2, w3, wd, scales)


def _pick_qb_bands(h, row_bytes, budget=int(9.5 * 2**20), min_band=28):
    """Band count: shrink the double-buffered in+out row windows toward
    the budget (row_bytes = W*(Cin+Cout)*2) but never below ``min_band``
    rows.  1 at the 512^2 shapes; >1 at the COCO canvas where whole-image
    residency measured +42%/block (dev_qblock_coco.py).

    Retuned in r4 from the COCO sweep (scripts/dev_qb_coco_r4.py,
    trace-timed custom-call times, dedupe-trap-corrected): smaller windows
    double-buffer earlier — the r3 stem finding transfers —
      * 112x176x512 (layer2): whole 2.21 ms -> nb=4 (10 MB) 1.74
      * 56x88x1024 (layer3):  whole 2.27/2 -> nb=2 1.12
      * 28x44x2048 (layer4):  whole 1.89 -> nb=2 (14-row bands) 1.44
    while the stage-1 merged shape's plateau stays at 28-row bands
    (nb=4, r3 A/B: 2.72 vs 2.87 at 14 rows) — hence the 28-row floor,
    with sub-floor bands only when the whole image exceeds the budget
    (layer4's 10.1 MB whole -> 14-row bands).  512^2 shapes all fit the
    budget whole and are unchanged."""
    for nb in range(1, h + 1):
        if h % nb:
            continue
        band = h // nb
        # stop at the budget, or at the 28-row floor — but a whole image
        # OVER budget keeps banding (layer4's h=28 whole -> 14-row bands)
        if band * row_bytes <= budget or (band <= min_band and band < h):
            return nb
    return 1


def _pick_qb_row_chunk(h: int, bands: int, cin: int) -> int:
    """Default grid row-chunk for :func:`qbottleneck` (before the band-
    divisibility clamp applied at the call site).

    Banded: largest divisor of the band <= the tuned 16 (COCO stage-1 A/B:
    rc=14 2.72 ms vs rc=28 2.84 vs rc=7 2.80 vs whole-image 3.19);
    whole-image keeps the plain 16.

    r4 COCO sweep exception: wide-channel whole-image kernels at
    /14-divisible heights (COCO /32 level 28x44x2048, and its halved h=14
    form) run 3.77 ms at rc=14 vs 1.46 at rc=7 — pin rc=7 there.  Keyed on
    h % 14 == 0 so BOTH the h=14 case (where the generic min() would land
    on 14) and the forced-bands=1 h=28 case (where the divisor fallback
    would otherwise degrade to rc=4) take the measured chunk.  512^2
    (h=16, rc=16) and every banded config are untouched."""
    band_h = h // bands
    if bands > 1:
        return next(rc for rc in range(min(band_h, 16), 0, -1)
                    if band_h % rc == 0)
    if cin >= 2048 and h % 14 == 0:
        return 7
    return 16


def qbottleneck(x, w1, w2, w3, a1, b1, a2, b2, a3, b3, *,
                short_mul=None, wd=None, ad=None, bd=None,
                row_chunk: int | None = None, merged: bool = False,
                bands: int | None = None,
                interpret: bool = False):
    """Fused stride-1 bottleneck block.

    x [B,H,W,Cin] int8; w1 [Cin,Cw], w2 [3,3,Cw,Cw], w3 [Cw,Cout] int8;
    a*/b* f32 per-channel epilogue vectors.  Identity shortcut: pass
    ``short_mul`` (f32 scalar s_in/s_out, requires Cin == Cout).
    Projection shortcut: pass wd [Cin,Cout] int8 + ad/bd f32[Cout].

    ``merged=True``: ROW-pair lane-merged io (see _qblock_kernel): ``x`` is
    ``[B, H/2, W, 2*Cin]`` (image row 2q in lanes [:Cin]) and the output
    comes back ``[B, H/2, W, 2*Cout]``.  The layout is produced by
    upstream kernels (stem pool emit_merged / a previous merged block) and
    consumed downstream (next merged block / the stride-2 block's
    merged_in), so it never needs an XLA relayout; tests convert with
    :func:`row_pair_merge` / :func:`row_pair_split`.
    """
    bsz, h, wdt, cin = x.shape
    cw = w1.shape[1]
    cout = w3.shape[1]
    has_ds = wd is not None
    if bands is None:
        bands = _pick_qb_bands(h, wdt * (cin + cout) * 2)
    assert h % bands == 0, (h, bands)
    band_h = h // bands
    if row_chunk is None:
        row_chunk = _pick_qb_row_chunk(h, bands, cin)
    row_chunk = min(row_chunk, band_h)
    while band_h % row_chunk:  # non-pow2 canvases (COCO 896x1408)
        row_chunk //= 2
    assert row_chunk >= 1
    if not has_ds:
        assert w1.shape[0] == cout and short_mul is not None
        wd = jnp.zeros((w1.shape[0], cout), jnp.int8)
        ad = jnp.broadcast_to(jnp.asarray(short_mul, jnp.float32), (cout,))
        bd = jnp.zeros((cout,), jnp.float32)

    if merged:
        assert cin == 2 * w1.shape[0], (x.shape, w1.shape)
        eye2 = jnp.eye(2, dtype=w1.dtype)
        bd2 = lambda w: jnp.kron(eye2, w)  # [K,N] -> block-diag [2K,2N]
        w1, w3, wd = bd2(w1), bd2(w3), bd2(wd)
        w2 = jnp.stack([jnp.stack([bd2(w2[ky, kx]) for kx in range(3)])
                        for ky in range(3)])
        tile2 = lambda v: jnp.tile(jnp.asarray(v, jnp.float32).reshape(-1), 2)
        a1, b1, a2, b2 = map(tile2, (a1, b1, a2, b2))
        a3, b3, ad, bd = map(tile2, (a3, b3, ad, bd))
        cw, cout = 2 * cw, 2 * cout

    cmax = max(cw, cout)

    def row(v, n):
        v = v.astype(jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cmax - v.shape[0]))

    scales = jnp.stack([
        row(a1, cw), row(b1, cw), row(a2, cw), row(b2, cw),
        row(a3, cout), row(b3, cout), row(ad, cout), row(bd, cout),
    ])  # [8, cmax] f32

    kern = functools.partial(
        _qblock_kernel, height=band_h, width=wdt, cin=cin, cw=cw, cout=cout,
        row_chunk=row_chunk, has_ds=has_ds, merged=merged, nbands=bands,
    )
    flops = 2 * bsz * h * wdt * (cin * cw + 9 * cw * cw + cw * cout + (cin * cout if has_ds else 0))
    if merged:  # block-diag doubles nominal dims; true flops are half
        flops //= 2
    vmem = lambda shape, imap: pl.BlockSpec(shape, imap,
                                            memory_space=pltpu.VMEM)
    if bands > 1:
        x_specs = [
            vmem((1, band_h, wdt, cin), lambda b, ri: (b, ri, 0, 0)),
            # 1-row top/bottom halos of the same array, clamped at edges
            # (edge bands substitute conv2's zero row in-kernel)
            vmem((1, 1, wdt, cin),
                 lambda b, ri: (b, jnp.maximum(ri * band_h - 1, 0), 0, 0)),
            vmem((1, 1, wdt, cin),
                 lambda b, ri: (b, jnp.minimum((ri + 1) * band_h, h - 1),
                                0, 0)),
        ]
        out_spec = vmem((1, band_h, wdt, cout), lambda b, ri: (b, ri, 0, 0))
        x_args = (x, x, x)
        grid = (bsz, bands)
    else:
        x_specs = [vmem((1, h, wdt, cin), lambda b: (b, 0, 0, 0))]
        out_spec = vmem((1, h, wdt, cout), lambda b: (b, 0, 0, 0))
        x_args = (x,)
        grid = (bsz,)
    whole = lambda *shape: vmem(shape, lambda *g: (0,) * len(shape))
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=x_specs + [
            whole(cin, cw),
            whole(3, 3, cw, cw),
            whole(cw, cout),
            whole(cin, cout),
            whole(8, cmax),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size + bsz * h * wdt * cout + w2.size + w1.size + w3.size,
            transcendentals=0,
        ),
        # stage1 blocks double-buffer 4MB in + 4MB out; v5e has headroom
        # beyond the 16MB default scoped-vmem limit
        # 124 MB of the v5e's 128 MB VMEM: COCO-canvas levels need >100
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )
    return call(*x_args, w1, w2, w3, wd, scales)


def row_pair_merge(x):
    """[B, H, W, C] -> [B, H/2, W, 2C] row-pair lanes (tests/fallbacks —
    inside the serving pipeline the layout is produced by kernels)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4).reshape(
        b, h // 2, w, 2 * c)


def row_pair_split(x):
    """Inverse of :func:`row_pair_merge`."""
    b, q, w, c2 = x.shape
    c = c2 // 2
    return x.reshape(b, q, w, 2, c).transpose(0, 1, 3, 2, 4).reshape(
        b, 2 * q, w, c)
