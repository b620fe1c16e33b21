"""Chained int8 bottleneck kernels: a whole ResNet *segment* per kernel.

`ops/pallas_qblock` fuses one bottleneck per kernel, so every block still
round-trips its int8 activation through HBM (stage-1 tensors are 4.2 MB/img
at 512^2 — the backbone moves ~57 MB/img of intermediates for ~7.5 MB/img
of genuinely needed io).  This module chains CONSECUTIVE blocks inside ONE
`pallas_call`: the whole (small) feature image stays VMEM-resident per
batch-grid step, each block writes its output to a VMEM scratch buffer the
next block reads, and HBM sees the segment input once and the segment
output once.  With `fuse_strided` layouts this covers whole backbone
segments: [layer1_0 .. layer2_3] -> C3, [layer3_*] -> C4, [layer4_*] -> C5.

Block bodies mirror ops/pallas_qblock's row-chunk loops (same epilogue
algebra, same merged row-pair layout rules, same stride-2 lane-merge
subsample) — bit-exactness vs the per-block kernels is a test contract
(tests/test_quant.py).

No reference analogue: the reference's backbone is torchvision ResNet-50
under cuDNN (/root/reference/model/backbone/resnet50.py:9-65); segment
fusion is a TPU VMEM-residency design.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_object_detection_tpu.ops.pallas_qblock import _dot_i8, _requant


def _run_s1(read, write, w1, w2, w3, wd, sc, *, height, width, cin, cw, cout,
            row_chunk, has_ds, merged):
    """One stride-1 bottleneck over a VMEM-resident image.

    read(lo, hi) -> int8 [hi-lo, W, Cin] rows; write(r0, rows) stores int8
    [row_chunk, W, Cout].  Same math as pallas_qblock._qblock_kernel.
    """
    a1r, b1r = sc[0, :cw], sc[1, :cw]
    a2r, b2r = sc[2, :cw], sc[3, :cw]
    a3r, b3r = sc[4, :cout], sc[5, :cout]
    adr, bdr = sc[6, :cout], sc[7, :cout]

    zero_row = jnp.zeros((1, width, cw), jnp.int8)
    half = cw // 2
    for r0 in range(0, height, row_chunk):
        lo = max(r0 - 1, 0)
        hi = min(r0 + row_chunk + 1, height)
        xs = read(lo, hi)
        rows = hi - lo
        acc1 = _dot_i8(xs.reshape(rows * width, cin), w1)
        a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
        a1 = a1.reshape(rows, width, cw)
        if lo == r0:
            a1 = jnp.concatenate([zero_row, a1], axis=0)
        if hi == r0 + row_chunk:
            a1 = jnp.concatenate([a1, zero_row], axis=0)

        zero_col = jnp.zeros((row_chunk, 1, cw), jnp.int8)
        acc2 = jnp.zeros((row_chunk * width, cw), jnp.int32)
        for ky in range(3):
            if not merged:
                band = a1[ky:ky + row_chunk]
            else:
                cur = a1[1:1 + row_chunk]
                if ky == 0:
                    prev = a1[0:row_chunk]
                    band = jnp.concatenate(
                        [prev[..., half:], cur[..., :half]], axis=-1)
                elif ky == 2:
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
                acc2 = acc2 + _dot_i8(win.reshape(row_chunk * width, cw), w2[ky, kx])
        a2 = _requant(jnp.maximum(acc2.astype(jnp.float32) * a2r + b2r, 0.0))

        acc3 = _dot_i8(a2, w3)
        y = acc3.astype(jnp.float32) * a3r + b3r
        x_rows = read(r0, r0 + row_chunk).reshape(row_chunk * width, cin)
        if has_ds:
            accd = _dot_i8(x_rows, wd)
            y = y + accd.astype(jnp.float32) * adr + bdr
        else:
            y = y + x_rows.astype(jnp.float32) * adr
        out = _requant(jnp.maximum(y, 0.0))
        write(r0, out.reshape(row_chunk, width, cout))


def _run_s2(read, write, w1, w2, w3, wd, sc, *, height, width, cin, cw, cout,
            row_chunk, merged_in):
    """One stride-2 bottleneck (projection shortcut) over a resident image.

    Mirrors pallas_qblock._qblock_s2_kernel; read/write as in :func:`_run_s1`
    (write stores [row_chunk, W/2, Cout] output rows).
    """
    cw_t = cw // 2 if merged_in else cw
    cin_t = cin // 2 if merged_in else cin
    a1r, b1r = sc[0, :cw], sc[1, :cw]
    a2r, b2r = sc[2, :cw_t], sc[3, :cw_t]
    a3r, b3r = sc[4, :cout], sc[5, :cout]
    adr, bdr = sc[6, :cout], sc[7, :cout]

    h_out, w_out = (height if merged_in else height // 2), width // 2

    for p0 in range(0, h_out, row_chunk):
        if merged_in:
            lo, hi = p0 - 1, p0 + row_chunk
            clo, chi = max(lo, 0), min(hi, height)
            xs = read(clo, chi)
            rows = chi - clo
            acc1 = _dot_i8(xs.reshape(rows * width, cin), w1)
            a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
            a1 = a1.reshape(rows, width, cw)
            zrow = jnp.zeros((1, width, cw), jnp.int8)
            for _ in range(clo - lo):
                a1 = jnp.concatenate([zrow, a1], axis=0)
            for _ in range(hi - chi):
                a1 = jnp.concatenate([a1, zrow], axis=0)
            zcol = jnp.zeros((a1.shape[0], 1, cw), jnp.int8)
            ap = jnp.concatenate([zcol, a1, zcol], axis=1)
            bands = [
                ap[0:row_chunk, :, cw_t:],
                ap[1:1 + row_chunk, :, :cw_t],
                ap[1:1 + row_chunk, :, cw_t:],
            ]
        else:
            lo = 2 * p0 - 1
            hi = 2 * p0 + 2 * row_chunk + 1
            clo, chi = max(lo, 0), min(hi + 1, height)
            xs = read(clo, chi)
            rows = chi - clo
            acc1 = _dot_i8(xs.reshape(rows * width, cin), w1)
            a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
            a1 = a1.reshape(rows, width, cw)
            zrow = jnp.zeros((1, width, cw), jnp.int8)
            for _ in range(clo - lo):
                a1 = jnp.concatenate([zrow, a1], axis=0)
            for _ in range(hi + 1 - chi):
                a1 = jnp.concatenate([a1, zrow], axis=0)
            zcol = jnp.zeros((a1.shape[0], 1, cw), jnp.int8)
            ap = jnp.concatenate([zcol, a1, zcol], axis=1)
            bands = [
                ap[ky:ky + 2 * row_chunk].reshape(
                    row_chunk, 2, width + 2, cw)[:, 0]
                for ky in range(3)
            ]

        acc2 = jnp.zeros((row_chunk * w_out, cw_t), jnp.int32)
        for ky in range(3):
            band = bands[ky]
            for kx in range(3):
                if kx == 2:
                    sl = band[:, 2:width + 2]
                else:
                    sl = band[:, kx:width + kx]
                win = sl.reshape(row_chunk, w_out, 2 * cw_t)[:, :, :cw_t]
                acc2 = acc2 + _dot_i8(win.reshape(row_chunk * w_out, cw_t), w2[ky, kx])
        a2 = _requant(jnp.maximum(acc2.astype(jnp.float32) * a2r + b2r, 0.0))

        acc3 = _dot_i8(a2, w3)
        y = acc3.astype(jnp.float32) * a3r + b3r
        if merged_in:
            xr = read(p0, p0 + row_chunk)[:, :, :cin_t]
        else:
            xr = read(2 * p0, 2 * p0 + 2 * row_chunk)
            xr = xr.reshape(row_chunk, 2, width, cin_t)[:, 0]
        xr = xr.reshape(row_chunk, w_out, 2 * cin_t)[:, :, :cin_t]
        accd = _dot_i8(xr.reshape(row_chunk * w_out, cin_t), wd)
        y = y + accd.astype(jnp.float32) * adr + bdr
        out = _requant(jnp.maximum(y, 0.0))
        write(p0, out.reshape(row_chunk, w_out, cout))


def _pick_rc(h: int, preferred: int) -> int:
    rc = min(preferred, h)
    while h % rc:
        rc //= 2
    assert rc >= 1
    return rc


def _expand_block(blk: dict) -> dict:
    """Trace-time weight/scale expansion (block-diag for merged layouts),
    mirroring the qbottleneck/qbottleneck_s2 wrappers.  Returns a dict of
    kernel-ready arrays + static config."""
    kind = blk["kind"]  # 's1' | 's2'
    merged = blk.get("merged", False)        # s1: io layout; s2: input layout
    w1, w2, w3 = blk["w1"], blk["w2"], blk["w3"]
    has_ds = "wd" in blk
    cw = w1.shape[1]
    cout = w3.shape[1]
    a1, b1 = blk["A1"], blk["B1"]
    a2, b2 = blk["A2"], blk["B2"]
    a3, b3 = blk["A3"], blk["B3"]
    if has_ds:
        wd, ad, bd = blk["wd"], blk["Ad"], blk["Bd"]
    else:
        assert kind == "s1" and w1.shape[0] == cout
        wd = None
        ad = jnp.broadcast_to(jnp.asarray(blk["short_mul"], jnp.float32), (cout,))
        bd = jnp.zeros((cout,), jnp.float32)

    tile2 = lambda v: jnp.tile(jnp.asarray(v, jnp.float32).reshape(-1), 2)
    eye2 = None
    if merged:
        eye2 = jnp.eye(2, dtype=w1.dtype)
    bd2 = lambda w: jnp.kron(eye2, w)

    if kind == "s1" and merged:
        w1 = bd2(w1)
        w3 = bd2(w3)
        if wd is not None:
            wd = bd2(wd)
        w2 = jnp.stack([jnp.stack([bd2(w2[ky, kx]) for kx in range(3)])
                        for ky in range(3)])
        a1, b1, a2, b2 = map(tile2, (a1, b1, a2, b2))
        a3, b3, ad, bd = map(tile2, (a3, b3, ad, bd))
        cw, cout = 2 * cw, 2 * cout
    elif kind == "s2" and merged:
        # only conv1 sees the merged layout (taps un-merge) — qbottleneck_s2
        w1 = jnp.kron(jnp.eye(2, dtype=w1.dtype), w1)
        a1, b1 = tile2(a1), tile2(b1)
        cw_k = 2 * cw
        return dict(kind=kind, merged=merged, has_ds=True,
                    w1=w1, w2=w2, w3=w3, wd=wd, cw=cw_k, cout=cout,
                    scales=(a1, b1, a2, b2, a3, b3, ad, bd))
    return dict(kind=kind, merged=merged, has_ds=has_ds,
                w1=w1, w2=w2, w3=w3, wd=wd, cw=cw, cout=cout,
                scales=(a1, b1, a2, b2, a3, b3, ad, bd))


def chain_shapes(x_shape, blocks):
    """Per-block (in_shape, out_shape) [H, W, C] given the chain input shape
    (batch dim excluded).  Merged layouts count MERGED height/channels."""
    shapes = []
    h, w, c = x_shape
    for blk in blocks:
        e_cout = blk["w3"].shape[1]
        if blk["kind"] == "s1":
            mult = 2 if blk.get("merged", False) else 1
            out = (h, w, mult * e_cout)
        else:
            merged = blk.get("merged", False)
            out = ((h if merged else h // 2), w // 2, e_cout)
        shapes.append(((h, w, c), out))
        h, w, c = out
    return shapes


def plan_chains(x_shape, blocks, budget_bytes: int = 80 * 2**20):
    """Greedily group consecutive blocks into chains whose per-image VMEM
    estimate (2x io double-buffering + intermediates + weights) fits the
    budget.  Returns a list of index lists covering ``blocks`` in order."""
    shapes = chain_shapes(x_shape, blocks)

    def wbytes(blk):
        n = blk["w1"].size + blk["w2"].size + blk["w3"].size
        if "wd" in blk:
            n += blk["wd"].size
        mult = 4 if blk.get("merged", False) else 1  # block-diag expansion
        return n * mult

    def est(i0, i1):
        nbytes = 2 * int(np.prod(shapes[i0][0])) + 2 * int(np.prod(shapes[i1 - 1][1]))
        nbytes += sum(int(np.prod(shapes[i][1])) for i in range(i0, i1 - 1))
        nbytes += sum(wbytes(blocks[i]) for i in range(i0, i1))
        return nbytes

    groups, start = [], 0
    for i in range(1, len(blocks) + 1):
        if i - start >= 2 and est(start, i) > budget_bytes:
            groups.append(list(range(start, i - 1)))
            start = i - 1
    groups.append(list(range(start, len(blocks))))
    return groups


def qchain(x, blocks, *, rc_s1: int = 16, rc_s2: int = 8,
           interpret: bool = False):
    """Run a sequence of bottleneck blocks as ONE Pallas kernel.

    x: int8 [B, H, W, C] (merged chains: [B, H/2, W, 2C]).
    blocks: list of dicts — ``kind`` 's1'|'s2', weights ``w1``/``w2``/``w3``
    (+ ``wd``/``Ad``/``Bd`` for projection shortcuts, ``short_mul`` for
    identity), scale vectors ``A1..B3``, and ``merged`` (s1: io layout,
    s2: input layout; an s2 block's output is always canonical).
    Returns the final block's int8 output.
    """
    bsz = x.shape[0]
    exp = [_expand_block(b) for b in blocks]
    shapes = chain_shapes(x.shape[1:], blocks)
    n = len(blocks)

    # scale table: 8 rows per block, padded to the global channel max
    cmax = max(max(e["cw"], e["cout"]) for e in exp)

    def row(v):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cmax - v.shape[0]))

    scales = jnp.stack([row(v) for e in exp for v in e["scales"]])  # [8n, cmax]

    # flat weight operand list + per-block slot indices
    operands, slots = [], []
    for e in exp:
        idx = {"w1": len(operands)}
        operands.append(e["w1"])
        idx["w2"] = len(operands)
        operands.append(e["w2"])
        idx["w3"] = len(operands)
        operands.append(e["w3"])
        if e["wd"] is not None:
            idx["wd"] = len(operands)
            operands.append(e["wd"])
        slots.append(idx)

    cfgs = []
    flops = 0
    for e, ((h, w, cin), (ho, wo, cout_l)), blk in zip(exp, shapes, blocks):
        kind, merged = e["kind"], e["merged"]
        if kind == "s1":
            rc = _pick_rc(h, rc_s1)
        else:
            rc = _pick_rc(ho, rc_s2)
        cfgs.append(dict(kind=kind, merged=merged, has_ds=e["has_ds"],
                         height=h, width=w, cin=cin, cw=e["cw"],
                         cout=e["cout"], row_chunk=rc))
        tc_in = cin // 2 if (merged and kind != "s1") else cin
        cw_t = e["cw"] // (2 if merged else 1)
        f = 2 * (h * w * tc_in * cw_t + ho * wo * (9 * cw_t * cw_t
                                                   + cw_t * cout_l
                                                   + (tc_in * cout_l if e["has_ds"] else 0)))
        flops += bsz * f

    out_shape = shapes[-1][1]

    def kernel(x_ref, *refs):
        wrefs = refs[:len(operands)]
        sc_ref = refs[len(operands)]
        out_ref = refs[len(operands) + 1]
        scratch = refs[len(operands) + 2:]

        for i, cfg in enumerate(cfgs):
            sc = sc_ref[8 * i:8 * i + 8]
            if i == 0:
                read = lambda lo, hi: x_ref[0, lo:hi]
            else:
                src = scratch[i - 1]
                read = lambda lo, hi, _s=src: _s[lo:hi]
            if i == n - 1:
                def write(r0, rows):
                    out_ref[0, r0:r0 + rows.shape[0]] = rows
            else:
                dst = scratch[i]

                def write(r0, rows, _d=dst):
                    _d[r0:r0 + rows.shape[0]] = rows

            e = slots[i]
            w1 = wrefs[e["w1"]][:]
            w2 = wrefs[e["w2"]]
            w3 = wrefs[e["w3"]][:]
            wd = wrefs[e["wd"]][:] if "wd" in e else None
            kw = dict(height=cfg["height"], width=cfg["width"], cin=cfg["cin"],
                      cw=cfg["cw"], cout=cfg["cout"], row_chunk=cfg["row_chunk"])
            if cfg["kind"] == "s1":
                _run_s1(read, write, w1, w2, w3, wd, sc,
                        has_ds=cfg["has_ds"], merged=cfg["merged"], **kw)
            else:
                _run_s2(read, write, w1, w2, w3, wd, sc,
                        merged_in=cfg["merged"], **kw)

    in_specs = [pl.BlockSpec((1, *x.shape[1:]), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)] + [
        pl.BlockSpec(op.shape, _ZeroIdx(op.ndim), memory_space=pltpu.VMEM)
        for op in operands
    ] + [pl.BlockSpec(scales.shape, _ZeroIdx(2), memory_space=pltpu.VMEM)]

    scratch_shapes = [
        pltpu.VMEM(shapes[i][1], jnp.int8) for i in range(n - 1)
    ]

    bytes_accessed = x.size + bsz * out_shape[0] * out_shape[1] * out_shape[2]
    bytes_accessed += sum(op.size for op in operands)

    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, *out_shape), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, *out_shape), jnp.int8),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(x, *operands, scales)


class _ZeroIdx:
    """Constant block index map (hashable — a fresh lambda per spec defeats
    jit caching)."""

    def __init__(self, nd):
        self.nd = nd

    def __call__(self, b):
        return (0,) * self.nd

    def __eq__(self, other):
        return isinstance(other, _ZeroIdx) and other.nd == self.nd

    def __hash__(self):
        return hash((_ZeroIdx, self.nd))
