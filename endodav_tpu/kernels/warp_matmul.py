"""Bilinear warp + forward splat as one-hot MXU matmuls (Pallas).

The reference's training losses are built on `F.grid_sample` warps and a
`scatter_add_` forward splat (trainer_end_to_end_video.py:861,
utils/layers.py:406-426,552-605).  XLA lowers the obvious
gather/scatter formulations to ~7 ns-per-index serial HBM loops — 91%
of the whole train step (PERFORMANCE.md round-2 profile).  TPUs have no
fast gather, but they have an enormous matmul unit, and a bilinear
sample is a *separable one-hot contraction*:

    out[p, c] = sum_h sum_w OHY[p, h] * img[h, w, c] * OHX[p, w]

where OHY[p, :] holds the two y-corner lerp weights at the (clipped)
corner rows and OHX likewise for x.  The kernels compute in a fully
TRANSPOSED [space, pixels] orientation so every tensor is row-native
(pixel index on lanes):

    stage 1 (MXU):  Rt = dot(img [H, W*C], OHYt [H, Pb]) -> [W*C, Pb]
                    (contracting the H sublanes of both operands)
    stage 2 (VPU):  out[c, p] = sum_sublanes Rt * OHXt * (l%C == c)

with the one-hots built in-register from broadcasted_iota comparisons —
they never exist in memory.  Per output pixel this costs H MACs on the
MXU instead of 4 serial gathers, and — the real win — the **backward is
just the transposed matmul**: d_img = dot(OHYt, dRt contracting Pb) and
the coordinate gradients are two more one-hot matmuls, replacing XLA's
even-slower scatter chains.

Windowing (round 3): warp flows are local, so one pixel chunk's source
footprint is a small sub-rectangle of the image — yet the base
formulation contracts/masks over ALL H rows and W*C lanes.  Two layered
cuts, each with a per-chunk plan precomputed on the XLA side and
scalar-prefetched to SMEM, and each with an exact full-size fallback
branch for chunks whose footprint doesn't fit (results are identical
for ANY coordinates — one-hot selection means the trimmed region only
ever contributed exact zeros):

  * row bands: an 8-aligned `_BAND`-row window per chunk cuts the MXU
    contraction H -> _BAND (4x at H=256).  The plan's alignment is
    restated in-kernel via `pl.multiple_of` — Mosaic cannot prove a
    scalar-prefetched start is 8-aligned and rejects the vector.load
    otherwise (round-3 device failure);
  * lane windows (default; `ENDODAV_WARP_NOTILE=1` disables): pixels are re-ordered into
    th x tw spatial tiles per chunk (pure reshape/transpose on the XLA
    side) so the chunk's x-footprint is tile-sized too, and a
    128-aligned 128-pixel lane window cuts the stage-2 VPU masking
    W*C -> 128*C (2.5x at W=320, C=3).

Data-layout notes (learned the hard way on real hardware):
  * Corner indices/weights travel as ONE packed f32 array [B, 8, Ppad]
    (rows: y0,y1,wy0,wy1,x0,x1,wx0,wx1).  A [B, P, 1] layout is
    128x-padded by TPU (8,128) tiling (observed 5 MB -> 640 MB HLO
    temps) and a [B, P] block (1, pb) violates Mosaic's block-shape
    rule; the packed 8-sublane form has zero padding waste and
    satisfies "block == array dims".  Indices live as exact f32
    (H, W < 2^24) and compare against f32 iota in-kernel.
  * Each kernel's blocks are constant over the pixel-chunk grid axis,
    so coords/img stay resident in VMEM across chunks; the chunk slice
    is an in-kernel dynamic lane slice at 128-aligned offsets.
  * Lane windows require the image lane count padded to a multiple of
    128 (zero pad; the one-hot masks never select pad lanes).

The forward splat (occupancy map) is the transpose of the same
structure: occ += dot(At [H, Pc], Bt [W, Pc] contracting Pc) with
At/Bt the per-axis corner-weight one-hots.

Exactness: the one-hot entries select exact image values; lerp weights
are applied in f32.  Semantics (border clip, zeros masking,
align_corners) are inherited from the caller, which passes fractional
source coordinates — this module reproduces ops/sampling.py's
(torch-parity-tested) math bit-for-bit up to f32 summation order.
Out-of-range pixel padding is weight-zero padding in the wrapper:
padded pixels contribute nothing to any accumulated output.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from endodav_tpu.utils.envflags import env_on
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["grid_sample_mm", "splat_mm"]


def _split_bf16(x):
    """f32 -> (hi, lo) with hi = bf16-rounded, lo = exact residual."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot3(a, b, dims):
    """Compensated f32 contraction on the bf16 MXU (3 passes).

    Mosaic's DEFAULT dot truncates f32 operands to bf16 — measured
    1.2e-2 absolute error on the splat occupancy, which flips the
    reference's hard (occ > 0.95) mask pixels and perturbs training
    gradients (round-3 device A/B).  XLA's fix is `Precision.HIGH`
    (3-pass bf16 emulation), but Mosaic's lowering rejects HIGH and its
    HIGHEST (6-pass) tripled the whole train step.  So the split is done
    by hand: a = ah + al, b = bh + bl exactly; ah@bh + ah@bl + al@bh
    drops only the al@bl term (~2^-18 relative) plus bf16 truncation of
    the residuals (~2^-17) — measured 1e-6-level occupancy agreement
    with the exact XLA scatter and zero threshold flips, at half the
    cost of HIGHEST."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _dot2_onehot(a, oh, dims):
    """Contraction where the SECOND operand is a pure 0/1 indicator
    (bf16-exact): only `a` needs hi/lo splitting — 2 passes, ~2^-17."""
    ah, al = _split_bf16(a)

    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    return d(ah, oh) + d(al, oh)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _corners(f, size, zeros_mode):
    """Fractional coord -> (i0, i1 clipped, w0, w1), all f32.

    Matches ops/sampling.py:grid_sample: indices clipped to the image,
    weights multiplied by the inside mask in zeros mode.
    """
    f0 = jnp.floor(f)
    w1 = (f - f0).astype(jnp.float32)
    w0 = 1.0 - w1
    i1 = f0 + 1.0
    if zeros_mode:
        w0 = w0 * ((f0 >= 0) & (f0 <= size - 1))
        w1 = w1 * ((i1 >= 0) & (i1 <= size - 1))
    return jnp.clip(f0, 0, size - 1), jnp.clip(i1, 0, size - 1), w0, w1


def _pad_packed(packed, pad):
    """Pad the pixel axis: index rows (0,1,4,5) replicate their edge value
    so a final partial chunk's band plan sees only real coordinates;
    weight rows (2,3,6,7) pad with zeros so pad pixels contribute nothing
    to any accumulated output (splat / d_img)."""
    if not pad:
        return packed
    edge = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)), mode="edge")
    zero = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)))
    is_idx = jnp.asarray([1, 1, 0, 0, 1, 1, 0, 0], jnp.bool_)[None, :, None]
    return jnp.where(is_idx, edge, zero)


def _pack_coords(fx, fy, H, W, zeros_mode, pb):
    """-> packed [B, 8, Ppad] f32 (y0,y1,wy0,wy1,x0,x1,wx0,wx1), p, ppad."""
    b = fx.shape[0]
    p = 1
    for s in fx.shape[1:]:
        p *= s
    fx = fx.reshape(b, p).astype(jnp.float32)
    fy = fy.reshape(b, p).astype(jnp.float32)
    x0, x1, wx0, wx1 = _corners(fx, W, zeros_mode)
    y0, y1, wy0, wy1 = _corners(fy, H, zeros_mode)
    packed = jnp.stack([y0, y1, wy0, wy1, x0, x1, wx0, wx1], axis=1)
    pad = _round_up(p, pb) - p
    return _pad_packed(packed, pad), p, p + pad


def _read_coords(c_ref, start, pb):
    """Slice the 8 packed coordinate rows for one pixel chunk: 8x [1, pb]."""
    return [c_ref[0, r:r + 1, pl.ds(start, pb)] for r in range(8)]


_BAND = int(os.environ.get("ENDODAV_WARP_BAND", "64"))  # rows, multiple of 8
_LANE = 128  # TPU lane width: x-window size/alignment unit (in lanes)


def _banding_enabled(h: int) -> bool:
    """Banding applies when the image is taller than one band;
    ENDODAV_WARP_NOBAND=1 forces the full-height path (A/B switch)."""
    return h > _BAND and not env_on("ENDODAV_WARP_NOBAND")


def _tiling_enabled() -> bool:
    """Spatial-tile pixel ordering + lane windows — ON by default
    (ENDODAV_WARP_NOTILE=1 restores plain row bands).

    Device-measured (tools/bench_warp_windows.py, whole train step):
    tile 803 ms/step vs band 918 vs full 1243.  Exactness: forward
    grid_sample/splat and the grid_sample backward probe bit-identical
    to the full path on device at every train shape (256x320..128x160,
    C=1/3); the few-1e-4 whole-step loss drift the A/B harness flags
    under tile is downstream bf16 graph reassociation (the tile
    transposes change XLA's fusion/reduction order), not a window-plan
    defect."""
    return not env_on("ENDODAV_WARP_NOTILE") and not env_on("ENDODAV_WARP_NOBAND")


def _lane_window(C: int) -> int:
    """Lane-window width: starts are 128-aligned, so the window must
    cover a tile's x-footprint PLUS up to 127 lanes of alignment slack.
    A th x tw tile spans ~(tw + 1 + flow-spread) * C lanes — ~54 at the
    production C=3 shapes — so 2 vregs (256 lanes) suffice for every
    supported C <= 4 with locality to spare (round 4; was C * 128,
    which made the stage-2 [wc, pb] masking 50% wider at C=3 for no
    coverage gain).  Any width is CORRECT — chunks whose footprint
    misses the window take the exact full fallback (the plan's `ok`
    test) — so this is purely a masking-cost/fallback-rate tradeoff;
    ENDODAV_WARP_LW overrides for A/B (validated: non-128-multiples
    would break _band_plan's clamped lane starts and violate the
    kernels' pl.multiple_of(lane_ref, 128) promise — silent misaligned
    loads, not an error)."""
    lw = int(os.environ.get("ENDODAV_WARP_LW", "256"))
    if lw < _LANE or lw % _LANE:
        raise ValueError(
            f"ENDODAV_WARP_LW={lw}: the lane window must be a positive "
            f"multiple of {_LANE} (lane starts are clamped to wcp - lw, "
            "so any other width produces misaligned lane slices)")
    return lw


def _tile_shape(pb, ho, wo):
    """th x tw spatial tile holding exactly one pb-pixel chunk, or None
    when the output grid doesn't divide into such tiles."""
    th = 8 if pb == 128 else 16
    tw = pb // th
    if ho % th or wo % tw:
        return None
    return th, tw


def _tile_cols(a, th, tw):
    """[..., Ho, Wo] -> [..., Ho*Wo] in tile-major pixel order."""
    *lead, ho, wo = a.shape
    nd = len(lead)
    a = a.reshape(*lead, ho // th, th, wo // tw, tw)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3)
    return a.transpose(*perm).reshape(*lead, ho * wo)


def _untile_cols(a, th, tw, ho, wo):
    """Inverse of `_tile_cols` on the last axis: tile order -> raster."""
    *lead, _ = a.shape
    nd = len(lead)
    a = a.reshape(*lead, ho // th, wo // tw, th, tw)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3)
    return a.transpose(*perm).reshape(*lead, ho * wo)


def _band_plan(packed, h, pb, wcp=None, lw=None, C=1):
    """Per-(batch, chunk) window plan from the packed coords: 8-aligned
    row start [B, nc] i32, 128-aligned lane start [B, nc] i32 (zeros
    when lane windowing is off), and an in-window flag [B, nc] i32 (the
    y corners fit the _BAND-row window AND — when `lw` is set — the x
    corners fit the lw-lane window at the plan's start).

    Pad pixels replicate the last real pixel's indices (_pad_packed), so
    a final partial chunk still gets a real plan."""
    b, _, ppad = packed.shape
    nc = ppad // pb
    rows = lambda r: packed[:, r, :].reshape(b, nc, pb)
    lo = jnp.min(rows(0), axis=2)
    hi = jnp.max(rows(1), axis=2)
    # the clamp must itself be 8-aligned (align DOWN: h % 8 != 0 would
    # otherwise break the pl.multiple_of promise the kernels assert —
    # silent misaligned loads); chunks needing the last h % 8 rows then
    # simply fail the `ok` window test and take the exact full branch
    start = jnp.minimum(jnp.floor(lo / 8.0) * 8.0,
                        float(max(h - _BAND, 0) // 8 * 8))
    ok = (hi - start) <= float(_BAND - 1)
    if lw is None:
        lane = jnp.zeros_like(start)
    else:
        xlo = jnp.min(rows(4), axis=2) * float(C)
        xhi = (jnp.max(rows(5), axis=2) + 1.0) * float(C) - 1.0
        lane = jnp.minimum(jnp.floor(xlo / _LANE) * _LANE,
                           float(max(wcp - lw, 0)))
        ok = ok & ((xhi - lane) <= float(lw - 1))
    return (start.astype(jnp.int32), lane.astype(jnp.int32),
            ok.astype(jnp.int32))


def _ohyt(y0, y1, wy0, wy1, h, pb, row0=0):
    """Weighted y one-hot, built transposed [rows, Pb] from [1, Pb] rows;
    ``row0`` offsets BANDED sub-images — folded into the [1, Pb] index
    rows (a row-vector subtract) instead of the [rows, Pb] iota (a
    full-tile add): the VPU mask builds, not the MXU dots, dominate
    these kernels (round-4 profile), so every [tile]-shaped op counts.
    (int32 iota + int compare: Mosaic has no float iota.)"""
    ioh = jax.lax.broadcasted_iota(jnp.int32, (h, pb), 0)
    return (wy0 * (ioh == y0.astype(jnp.int32) - row0)
            + wy1 * (ioh == y1.astype(jnp.int32) - row0))


def _xmask(il, xi, C, l0):
    """0/1 x-selection mask on the [wc, Pb] lane-window grid: absolute
    lane al = l0 + sublane selects pixel column w = al // C.  The
    division is algebraically removed (al // C == x  <=>  al in
    [x*C, x*C + C)), with l0 folded into the [1, Pb] bound rows — two
    tile compares + an AND instead of iota-add + div-chain + compare."""
    if C == 1:
        return il == xi.astype(jnp.int32) - l0
    lo = xi.astype(jnp.int32) * C - l0
    return (il >= lo) & (il <= lo + (C - 1))


def _ohxt(x0, x1, wx0, wx1, wc, pb, C, l0=0):
    """Weighted x one-hot on the [wc, Pb] lane-window grid."""
    il = jax.lax.broadcasted_iota(jnp.int32, (wc, pb), 0)
    return (wx0 * _xmask(il, x0, C, l0) + wx1 * _xmask(il, x1, C, l0))


# ---------------------------------------------------------------- forward

def _fwd_kernel(band_ref, lane_ref, ok_ref, c_ref, img_ref, o_ref, *,
                C: int, pb: int, banded: bool, lw):
    bi, pi = pl.program_id(0), pl.program_id(1)
    start = pi * pb
    y0, y1, wy0, wy1, x0, x1, wx0, wx1 = _read_coords(c_ref, start, pb)
    H, WC = img_ref.shape[1], img_ref.shape[2]

    def x_stage(rt, wc, l0):
        il = jax.lax.broadcasted_iota(jnp.int32, (wc, pb), 0)
        t = rt * (wx0 * _xmask(il, x0, C, l0) + wx1 * _xmask(il, x1, C, l0))
        if C == 1:
            return jnp.sum(t, axis=0, keepdims=True)
        # channel of absolute lane (l0 + l) % C == c  <=>  l % C ==
        # (c - l0) % C: one tile mod + per-channel scalar compares
        imc = il % C
        return jnp.concatenate(
            [jnp.sum(t * (imc == (c - l0) % C), axis=0, keepdims=True)
             for c in range(C)], axis=0)

    def full():
        ohyt = _ohyt(y0, y1, wy0, wy1, H, pb)
        rt = _dot3(img_ref[0], ohyt, ((0,), (0,)))  # [WC, pb]
        o_ref[0, :, pl.ds(start, pb)] = x_stage(rt, WC, 0)

    if banded:
        row0 = pl.multiple_of(band_ref[bi, pi], 8)

        @pl.when(ok_ref[bi, pi] != 0)
        def _banded():
            if lw is None:
                sub = img_ref[0, pl.ds(row0, _BAND), :]
                wc, l0 = WC, 0
            else:
                l0 = pl.multiple_of(lane_ref[bi, pi], _LANE)
                sub = img_ref[0, pl.ds(row0, _BAND), pl.ds(l0, lw)]
                wc = lw
            ohyt = _ohyt(y0, y1, wy0, wy1, _BAND, pb, row0)
            rt = _dot3(sub, ohyt, ((0,), (0,)))
            o_ref[0, :, pl.ds(start, pb)] = x_stage(rt, wc, l0)

        @pl.when(ok_ref[bi, pi] == 0)
        def _full():
            full()
    else:
        full()


def _fwd_kernel_cp(band_ref, lane_ref, ok_ref, c_ref, img_ref, o_ref, *,
                   C: int, pb: int, banded: bool, lw):
    """Channel-plane forward: img travels as C separate [H, W] planes
    ([1, C, H, Wp] block) instead of interleaved [H, W*C] lanes.

    Why (round-5, the round-4 profile's named candidate): the kernels
    are VPU mask-build bound, and the interleaved layout builds its
    x-masks on a [W*C(-window), pb] grid with per-channel `% C`
    selection chains — 3x the mask area at C=3, plus the mod work.  In
    channel planes the x grid is [W(-window), pb], the masks build ONCE
    with C=1 semantics and are SHARED by all C plane matmuls, and the
    lane window shrinks to a single 128-lane vreg."""
    bi, pi = pl.program_id(0), pl.program_id(1)
    start = pi * pb
    y0, y1, wy0, wy1, x0, x1, wx0, wx1 = _read_coords(c_ref, start, pb)
    H, W = img_ref.shape[2], img_ref.shape[3]

    def run(rows, row0, wlanes, l0, img_at):
        ohyt = _ohyt(y0, y1, wy0, wy1, rows, pb, row0)
        ohx = _ohxt(x0, x1, wx0, wx1, wlanes, pb, 1, l0)
        o_ref[0, :, pl.ds(start, pb)] = jnp.concatenate(
            [jnp.sum(_dot3(img_at(c), ohyt, ((0,), (0,))) * ohx,
                     axis=0, keepdims=True) for c in range(C)], axis=0)

    if banded:
        row0 = pl.multiple_of(band_ref[bi, pi], 8)

        @pl.when(ok_ref[bi, pi] != 0)
        def _banded():
            if lw is None:
                run(_BAND, row0, W, 0,
                    lambda c: img_ref[0, c, pl.ds(row0, _BAND), :])
            else:
                l0 = pl.multiple_of(lane_ref[bi, pi], _LANE)
                run(_BAND, row0, lw, l0,
                    lambda c: img_ref[0, c, pl.ds(row0, _BAND), pl.ds(l0, lw)])

        @pl.when(ok_ref[bi, pi] == 0)
        def _full():
            run(H, 0, W, 0, lambda c: img_ref[0, c])
    else:
        run(H, 0, W, 0, lambda c: img_ref[0, c])


# --------------------------------------------------------------- backward

def _g_t(g, wc, pb, C, l0=0, il=None):
    """Expand gᵀ [C, Pb] onto the [wc, Pb] lane-window grid:
    G[l, p] = g[(l0 + l) % C, p] — via one tile mod + scalar-target
    compares (see `_xmask` note on removing the div chains)."""
    if C == 1:
        return jnp.broadcast_to(g[0:1, :].astype(jnp.float32), (wc, pb))
    if il is None:
        il = jax.lax.broadcasted_iota(jnp.int32, (wc, pb), 0)
    imc = il % C
    acc = None
    for c in range(C):
        term = g[c:c + 1, :].astype(jnp.float32) * (imc == (c - l0) % C)
        acc = term if acc is None else acc + term
    return acc


def _bwd_coord_kernel(band_ref, lane_ref, ok_ref, c_ref, img_ref, g_ref,
                      dw_ref, *, C: int, pb: int, banded: bool, lw):
    """d(out)/d(lerp weights) -> packed [1, 4, Ppad] rows
    (dwy0, dwy1, dwx0, dwx1); two 0/1 one-hot matmuls recover the
    per-corner row samples, the rest is elementwise + sublane reduces."""
    bi, pi = pl.program_id(0), pl.program_id(1)
    start = pi * pb
    y0, y1, wy0, wy1, x0, x1, wx0, wx1 = _read_coords(c_ref, start, pb)
    H, WC = img_ref.shape[1], img_ref.shape[2]

    def core(img, rows, row0, wc, l0):
        ior = jax.lax.broadcasted_iota(jnp.int32, (rows, pb), 0)
        oh0 = (ior == y0.astype(jnp.int32) - row0).astype(jnp.float32)
        oh1 = (ior == y1.astype(jnp.int32) - row0).astype(jnp.float32)
        r0 = _dot2_onehot(img, oh0, ((0,), (0,)))  # [wc, pb]
        r1 = _dot2_onehot(img, oh1, ((0,), (0,)))
        rt = wy0 * r0 + wy1 * r1

        il = jax.lax.broadcasted_iota(jnp.int32, (wc, pb), 0)
        m0 = _xmask(il, x0, C, l0).astype(jnp.float32)
        m1 = _xmask(il, x1, C, l0).astype(jnp.float32)

        g = _g_t(g_ref[0, :, pl.ds(start, pb)], wc, pb, C, l0, il)
        dr = g * (wx0 * m0 + wx1 * m1)
        gr = g * rt
        out = jnp.concatenate([
            jnp.sum(dr * r0, axis=0, keepdims=True),
            jnp.sum(dr * r1, axis=0, keepdims=True),
            jnp.sum(gr * m0, axis=0, keepdims=True),
            jnp.sum(gr * m1, axis=0, keepdims=True),
        ], axis=0)
        dw_ref[0, :, pl.ds(start, pb)] = out

    if banded:
        row0 = pl.multiple_of(band_ref[bi, pi], 8)

        @pl.when(ok_ref[bi, pi] != 0)
        def _banded():
            if lw is None:
                core(img_ref[0, pl.ds(row0, _BAND), :], _BAND, row0, WC, 0)
            else:
                l0 = pl.multiple_of(lane_ref[bi, pi], _LANE)
                core(img_ref[0, pl.ds(row0, _BAND), pl.ds(l0, lw)],
                     _BAND, row0, lw, l0)

        @pl.when(ok_ref[bi, pi] == 0)
        def _full():
            core(img_ref[0], H, 0, WC, 0)
    else:
        core(img_ref[0], H, 0, WC, 0)


def _bwd_fused_kernel(band_ref, lane_ref, ok_ref, c_ref, img_ref, g_ref,
                      dw_ref, dimg_ref, *, C: int, pb: int, banded: bool, lw):
    """Coordinate + image grads in ONE kernel (round-4 fusion).

    The two round-3 backward kernels each re-DMA'd the same packed
    coords, image and cotangent per launch and each rebuilt the same
    [wc, pb] iota masks (m0/m1), the g expansion and the y one-hots —
    the VPU mask builds, not the MXU dots, dominate at these shapes.
    Fused: oh0/oh1 feed BOTH the corner samples r0/r1 (coord grads) and
    ohyt = wy0*oh0 + wy1*oh1 (image grad), and dr = g*(wx0*m0 + wx1*m1)
    is simultaneously the x-lerp cotangent (coord grads) and dRt (image
    grad: dimg += dot(ohyt, drᵀ)).  Outputs: dw [1, 4, Ppad] packed
    (dwy0, dwy1, dwx0, dwx1) + dimg [1, H, WCp] accumulated over chunks."""
    bi, pi = pl.program_id(0), pl.program_id(1)
    start = pi * pb
    y0, y1, wy0, wy1, x0, x1, wx0, wx1 = _read_coords(c_ref, start, pb)
    H, WC = img_ref.shape[1], img_ref.shape[2]

    @pl.when(pi == 0)
    def _init():
        dimg_ref[0] = jnp.zeros((H, WC), dimg_ref.dtype)

    def core(img, rows, row0, wc, l0, dimg_write):
        ior = jax.lax.broadcasted_iota(jnp.int32, (rows, pb), 0)
        oh0 = (ior == y0.astype(jnp.int32) - row0).astype(jnp.float32)
        oh1 = (ior == y1.astype(jnp.int32) - row0).astype(jnp.float32)
        r0 = _dot2_onehot(img, oh0, ((0,), (0,)))  # [wc, pb]
        r1 = _dot2_onehot(img, oh1, ((0,), (0,)))
        rt = wy0 * r0 + wy1 * r1

        il = jax.lax.broadcasted_iota(jnp.int32, (wc, pb), 0)
        m0 = _xmask(il, x0, C, l0).astype(jnp.float32)
        m1 = _xmask(il, x1, C, l0).astype(jnp.float32)

        g = _g_t(g_ref[0, :, pl.ds(start, pb)], wc, pb, C, l0, il)
        dr = g * (wx0 * m0 + wx1 * m1)
        gr = g * rt
        dw_ref[0, :, pl.ds(start, pb)] = jnp.concatenate([
            jnp.sum(dr * r0, axis=0, keepdims=True),
            jnp.sum(dr * r1, axis=0, keepdims=True),
            jnp.sum(gr * m0, axis=0, keepdims=True),
            jnp.sum(gr * m1, axis=0, keepdims=True),
        ], axis=0)
        ohyt = wy0 * oh0 + wy1 * oh1
        dimg_write(_dot3(ohyt, dr, ((1,), (1,))).astype(dimg_ref.dtype))

    if banded:
        row0 = pl.multiple_of(band_ref[bi, pi], 8)

        @pl.when(ok_ref[bi, pi] != 0)
        def _banded():
            if lw is None:
                def wr(upd):
                    dimg_ref[0, pl.ds(row0, _BAND), :] += upd
                core(img_ref[0, pl.ds(row0, _BAND), :], _BAND, row0, WC, 0, wr)
            else:
                l0 = pl.multiple_of(lane_ref[bi, pi], _LANE)

                def wr(upd):
                    dimg_ref[0, pl.ds(row0, _BAND), pl.ds(l0, lw)] += upd
                core(img_ref[0, pl.ds(row0, _BAND), pl.ds(l0, lw)],
                     _BAND, row0, lw, l0, wr)

        @pl.when(ok_ref[bi, pi] == 0)
        def _full():
            def wr(upd):
                dimg_ref[0] += upd
            core(img_ref[0], H, 0, WC, 0, wr)
    else:
        def wr(upd):
            dimg_ref[0] += upd
        core(img_ref[0], H, 0, WC, 0, wr)


def _bwd_fused_kernel_cp(band_ref, lane_ref, ok_ref, c_ref, img_ref, g_ref,
                         dw_ref, dimg_ref, *, C: int, pb: int, banded: bool,
                         lw):
    """Channel-plane fused backward (see _fwd_kernel_cp): the y one-hots
    AND the x masks build once and are shared by every channel's corner
    samples / grads; the cotangent expansion is a plain per-plane
    broadcast instead of the interleaved `% C` selection."""
    bi, pi = pl.program_id(0), pl.program_id(1)
    start = pi * pb
    y0, y1, wy0, wy1, x0, x1, wx0, wx1 = _read_coords(c_ref, start, pb)
    H, W = img_ref.shape[2], img_ref.shape[3]

    @pl.when(pi == 0)
    def _init():
        dimg_ref[0] = jnp.zeros((C, H, dimg_ref.shape[3]), dimg_ref.dtype)

    def core(rows, row0, wlanes, l0, img_at, dimg_write):
        ior = jax.lax.broadcasted_iota(jnp.int32, (rows, pb), 0)
        oh0 = (ior == y0.astype(jnp.int32) - row0).astype(jnp.float32)
        oh1 = (ior == y1.astype(jnp.int32) - row0).astype(jnp.float32)
        il = jax.lax.broadcasted_iota(jnp.int32, (wlanes, pb), 0)
        m0 = _xmask(il, x0, 1, l0).astype(jnp.float32)
        m1 = _xmask(il, x1, 1, l0).astype(jnp.float32)
        wxm = wx0 * m0 + wx1 * m1
        ohyt = wy0 * oh0 + wy1 * oh1
        sums = None
        for c in range(C):
            img = img_at(c)
            r0 = _dot2_onehot(img, oh0, ((0,), (0,)))  # [wlanes, pb]
            r1 = _dot2_onehot(img, oh1, ((0,), (0,)))
            g = jnp.broadcast_to(
                g_ref[0, c:c + 1, pl.ds(start, pb)].astype(jnp.float32),
                (wlanes, pb))
            dr = g * wxm
            gr = g * (wy0 * r0 + wy1 * r1)
            term = jnp.concatenate([
                jnp.sum(dr * r0, axis=0, keepdims=True),
                jnp.sum(dr * r1, axis=0, keepdims=True),
                jnp.sum(gr * m0, axis=0, keepdims=True),
                jnp.sum(gr * m1, axis=0, keepdims=True),
            ], axis=0)
            sums = term if sums is None else sums + term
            dimg_write(c, _dot3(ohyt, dr, ((1,), (1,))).astype(dimg_ref.dtype))
        dw_ref[0, :, pl.ds(start, pb)] = sums

    if banded:
        row0 = pl.multiple_of(band_ref[bi, pi], 8)

        @pl.when(ok_ref[bi, pi] != 0)
        def _banded():
            if lw is None:
                def wr(c, upd):
                    dimg_ref[0, c, pl.ds(row0, _BAND), :] += upd
                core(_BAND, row0, W, 0,
                     lambda c: img_ref[0, c, pl.ds(row0, _BAND), :], wr)
            else:
                l0 = pl.multiple_of(lane_ref[bi, pi], _LANE)

                def wr(c, upd):
                    dimg_ref[0, c, pl.ds(row0, _BAND), pl.ds(l0, lw)] += upd
                core(_BAND, row0, lw, l0,
                     lambda c: img_ref[0, c, pl.ds(row0, _BAND),
                                       pl.ds(l0, lw)], wr)

        @pl.when(ok_ref[bi, pi] == 0)
        def _full():
            def wr(c, upd):
                dimg_ref[0, c] += upd
            core(H, 0, W, 0, lambda c: img_ref[0, c], wr)
    else:
        def wr(c, upd):
            dimg_ref[0, c] += upd
        core(H, 0, W, 0, lambda c: img_ref[0, c], wr)


def _bwd_coord_kernel_cp(band_ref, lane_ref, ok_ref, c_ref, img_ref, g_ref,
                         dw_ref, *, C: int, pb: int, banded: bool, lw):
    """Channel-plane coord-only backward (img_grad=False callers)."""
    bi, pi = pl.program_id(0), pl.program_id(1)
    start = pi * pb
    y0, y1, wy0, wy1, x0, x1, wx0, wx1 = _read_coords(c_ref, start, pb)
    H, W = img_ref.shape[2], img_ref.shape[3]

    def core(rows, row0, wlanes, l0, img_at):
        ior = jax.lax.broadcasted_iota(jnp.int32, (rows, pb), 0)
        oh0 = (ior == y0.astype(jnp.int32) - row0).astype(jnp.float32)
        oh1 = (ior == y1.astype(jnp.int32) - row0).astype(jnp.float32)
        il = jax.lax.broadcasted_iota(jnp.int32, (wlanes, pb), 0)
        m0 = _xmask(il, x0, 1, l0).astype(jnp.float32)
        m1 = _xmask(il, x1, 1, l0).astype(jnp.float32)
        wxm = wx0 * m0 + wx1 * m1
        sums = None
        for c in range(C):
            img = img_at(c)
            r0 = _dot2_onehot(img, oh0, ((0,), (0,)))
            r1 = _dot2_onehot(img, oh1, ((0,), (0,)))
            g = jnp.broadcast_to(
                g_ref[0, c:c + 1, pl.ds(start, pb)].astype(jnp.float32),
                (wlanes, pb))
            dr = g * wxm
            gr = g * (wy0 * r0 + wy1 * r1)
            term = jnp.concatenate([
                jnp.sum(dr * r0, axis=0, keepdims=True),
                jnp.sum(dr * r1, axis=0, keepdims=True),
                jnp.sum(gr * m0, axis=0, keepdims=True),
                jnp.sum(gr * m1, axis=0, keepdims=True),
            ], axis=0)
            sums = term if sums is None else sums + term
        dw_ref[0, :, pl.ds(start, pb)] = sums

    if banded:
        row0 = pl.multiple_of(band_ref[bi, pi], 8)

        @pl.when(ok_ref[bi, pi] != 0)
        def _banded():
            if lw is None:
                core(_BAND, row0, W, 0,
                     lambda c: img_ref[0, c, pl.ds(row0, _BAND), :])
            else:
                l0 = pl.multiple_of(lane_ref[bi, pi], _LANE)
                core(_BAND, row0, lw, l0,
                     lambda c: img_ref[0, c, pl.ds(row0, _BAND), pl.ds(l0, lw)])

        @pl.when(ok_ref[bi, pi] == 0)
        def _full():
            core(H, 0, W, 0, lambda c: img_ref[0, c])
    else:
        core(H, 0, W, 0, lambda c: img_ref[0, c])


# ---------------------------------------------------------------- wrapper

def _use_cp(c: int) -> bool:
    """Channel-plane kernel layout for C>1 warps — a MEASURED NEGATIVE,
    kept experiment-gated (ENDODAV_WARP_CP=1 opts in; round-5 device
    A/B, tools/profile_train_step.py same-session): 792 vs 750 ms/step,
    the C=3 warp kernels themselves 355 vs 313 ms (fwd 178 vs 151, bwd
    177 vs 162).  The hypothesis — sharing the x-mask builds across
    channels on a [W, pb] grid instead of per-channel `% C` selection on
    [W*C, pb] — did not pay: the three per-plane dots/mask applications
    schedule worse than the single interleaved region, and pb=256 for
    the cp backward spills registers.  C=1 warps are identical under
    both layouts.  The kernels stay as the documented worked example;
    oracle parity is pinned by tests/test_warp_matmul.py both ways."""
    return c > 1 and env_on("ENDODAV_WARP_CP")


def _pick_pb(C, backward=False, cp=False):
    """Pixel-chunk width.  Larger chunks amortize the per-chunk fixed
    work (coord reads, window-plan test, iota builds); the ceiling is
    the ~dozen [lw, pb] f32 temps the backward holds in VMEM — pb=256
    for the C=3 INTERLEAVED backward was tried in round 4 and
    overflowed scoped vmem by 680K on device.  The channel-plane layout
    (cp) holds per-PLANE temps (C=1-sized), so it takes the C=1 chunk
    widths.  ENDODAV_WARP_PB overrides for A/B (restricted to the
    widths _tile_shape/lane slicing support)."""
    env = os.environ.get("ENDODAV_WARP_PB")
    if env:
        pb = int(env)
        if pb not in (128, 256, 512):
            raise ValueError(
                f"ENDODAV_WARP_PB={pb}: supported pixel-chunk widths are "
                "128, 256, 512 (other widths break _tile_shape and the "
                "128-lane slice alignment the kernels assert)")
        return pb
    if C <= 2 or cp:
        return 256 if (backward and cp) else 512
    return 128 if backward else 256


def _cspec(ppad):
    # index map tolerates the scalar-prefetch refs appended by
    # PrefetchScalarGridSpec
    return pl.BlockSpec((1, 8, ppad), lambda bi, pi, *_: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _grid_tile(out_sp, pb, h):
    """Tile shape for a [B, Ho, Wo] coordinate grid, or None when tiling
    is off / the grid doesn't divide / banding (which hosts the lane
    window) is off."""
    if not (_tiling_enabled() and len(out_sp) == 2 and _banding_enabled(h)):
        return None
    return _tile_shape(pb, out_sp[0], out_sp[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def grid_sample_mm(img, fx, fy, zeros_mode: bool = False,
                   align_corners: bool = True, img_grad: bool = True,
                   img_tile: int = 1):
    """Bilinear sample img[B,H,W,C] at fractional pixel coords fx, fy
    [B*img_tile, Ho, Wo] (already unnormalized).  align_corners is
    carried only so the vjp can recompute identically; coords are
    already resolved.

    img_grad (static): when True the backward runs the FUSED kernel
    producing coordinate AND image grads in one launch (round-4); when
    False it runs the coord-only kernel and returns ZERO image grads —
    only legal when the caller knows the image carries no gradient
    (input frames in the training losses).  Tradeoff of the fusion: the
    two separate pallas_calls let XLA DCE whichever output was unused —
    with the fused kernel, img_grad=True always computes the coord
    grads too (both outputs come from one launch), so a caller with
    image grads but a non-differentiated GRID should pass
    img_grad=True knowing the dw work is wasted; every in-repo caller
    differentiates the grid, so this is latent, not active (round-4
    advisor note).

    img_tile (static): coordinate-grid batch element bi samples image
    bi // img_tile — several same-image warps (e.g. the per-scale flow
    fields of the monodepth losses) share one launch without tiling the
    image in HBM; ordered so consecutive grid steps reuse the resident
    image block (Pallas elides the repeat DMA).  Requires
    img_grad=False (multiple grid elements would race on one d_img
    block otherwise)."""
    return _mm_forward(img, fx, fy, zeros_mode, img_tile)


def _mm_forward(img, fx, fy, zeros_mode, img_tile=1):
    b_img, h, w, c = img.shape
    bg = fx.shape[0]
    assert bg == b_img * img_tile, (bg, b_img, img_tile)
    out_sp = fx.shape[1:]
    use_cp = _use_cp(c)
    pb = _pick_pb(c, cp=use_cp)
    tile = _grid_tile(out_sp, pb, h)
    if tile:
        fx = _tile_cols(fx, *tile)
        fy = _tile_cols(fy, *tile)
    packed, p, ppad = _pack_coords(fx, fy, h, w, zeros_mode, pb)
    banded = _banding_enabled(h)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
    if use_cp:
        # channel planes: [B, C, H, Wp] — masks build on W lanes with
        # C=1 semantics and are shared across the plane matmuls
        imgf = jnp.moveaxis(img, 3, 1).astype(jnp.float32)
        lw = _lane_window(1) if (tile and w > _lane_window(1)) else None
        wp = _round_up(w, _LANE) if lw is not None else w
        if wp != w:
            imgf = jnp.pad(imgf, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
        band, lane, ok = _band_plan(packed, h, pb, wp, lw, 1)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_cp, C=c, pb=pb, banded=banded, lw=lw),
            out_shape=jax.ShapeDtypeStruct((bg, c, ppad), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(bg, ppad // pb),
                in_specs=[
                    _cspec(ppad),
                    pl.BlockSpec((1, c, h, wp),
                                 lambda bi, pi, *_: (bi // img_tile, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, c, ppad),
                                       lambda bi, pi, *_: (bi, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=params,
        )(band, lane, ok, packed, imgf)
        out = out[:, :, :p]
        if tile:
            out = _untile_cols(out, *tile, out_sp[0], out_sp[1])
        return jnp.moveaxis(out, 1, 2).reshape(bg, *out_sp, c)
    # f32 once here instead of a per-chunk in-kernel cast (the image is
    # VMEM-resident across the chunk grid; the cast ran every chunk).
    imgf = img.reshape(b_img, h, w * c).astype(jnp.float32)
    wc = w * c
    lw = _lane_window(c) if (tile and wc > _lane_window(c)) else None
    if lw is not None:
        wcp = _round_up(wc, _LANE)
        if wcp != wc:
            imgf = jnp.pad(imgf, ((0, 0), (0, 0), (0, wcp - wc)))
    else:
        wcp = wc
    band, lane, ok = _band_plan(packed, h, pb, wcp, lw, c)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C=c, pb=pb, banded=banded, lw=lw),
        out_shape=jax.ShapeDtypeStruct((bg, c, ppad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bg, ppad // pb),
            in_specs=[
                _cspec(ppad),
                pl.BlockSpec((1, h, wcp),
                             lambda bi, pi, *_: (bi // img_tile, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, ppad), lambda bi, pi, *_: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=params,
    )(band, lane, ok, packed, imgf)
    out = out[:, :, :p]
    if tile:
        out = _untile_cols(out, *tile, out_sp[0], out_sp[1])
    # [B, C, P] -> [B, *out_sp, C]
    return jnp.moveaxis(out, 1, 2).reshape(bg, *out_sp, c)


def _mm_fwd(img, fx, fy, zeros_mode, align_corners, img_grad, img_tile):
    return _mm_forward(img, fx, fy, zeros_mode, img_tile), (img, fx, fy)


def _mm_bwd(zeros_mode, align_corners, img_grad, img_tile, res, g):
    img, fx, fy = res
    if img_grad and img_tile != 1:
        raise ValueError("img_tile > 1 requires img_grad=False (grid "
                         "elements sharing an image would race on d_img)")
    b_img, h, w, c = img.shape
    b = fx.shape[0]
    out_sp2 = fx.shape[1:]
    use_cp = _use_cp(c)
    pb = _pick_pb(c, backward=True, cp=use_cp)
    tile = _grid_tile(out_sp2, pb, h)
    fxk, fyk = (_tile_cols(fx, *tile), _tile_cols(fy, *tile)) if tile else (fx, fy)
    packed, p, ppad = _pack_coords(fxk, fyk, h, w, zeros_mode, pb)
    gt = jnp.moveaxis(g.reshape(b, p, c).astype(jnp.float32), 2, 1)  # [B, C, P]
    if tile:
        gt = _tile_cols(gt.reshape(b, c, *out_sp2), *tile)
    if ppad != p:
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, ppad - p)))
    banded = _banding_enabled(h)
    grid = (b, ppad // pb)
    gspec = pl.BlockSpec((1, c, ppad), lambda bi, pi, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    dwspec = pl.BlockSpec((1, 4, ppad), lambda bi, pi, *_: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))

    if use_cp:
        imgf = jnp.moveaxis(img, 3, 1).astype(jnp.float32)  # [B, C, H, W]
        lw = _lane_window(1) if (tile and w > _lane_window(1)) else None
        wp = _round_up(w, _LANE) if lw is not None else w
        if wp != w:
            imgf = jnp.pad(imgf, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
        band, lane, ok = _band_plan(packed, h, pb, wp, lw, 1)
        ispec_cp = pl.BlockSpec((1, c, h, wp),
                                lambda bi, pi, *_: (bi // img_tile, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        if img_grad:
            dw, dimg = pl.pallas_call(
                functools.partial(_bwd_fused_kernel_cp, C=c, pb=pb,
                                  banded=banded, lw=lw),
                out_shape=(jax.ShapeDtypeStruct((b, 4, ppad), jnp.float32),
                           jax.ShapeDtypeStruct((b, c, h, wp), jnp.float32)),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=grid,
                    in_specs=[_cspec(ppad), ispec_cp, gspec],
                    out_specs=(dwspec,
                               pl.BlockSpec((1, c, h, wp),
                                            lambda bi, pi, *_: (bi, 0, 0, 0),
                                            memory_space=pltpu.VMEM)),
                ),
                compiler_params=params,
            )(band, lane, ok, packed, imgf, gt)
            if wp != w:
                dimg = dimg[:, :, :, :w]
            dimg = jnp.moveaxis(dimg, 1, 3).astype(img.dtype)
        else:
            dw = pl.pallas_call(
                functools.partial(_bwd_coord_kernel_cp, C=c, pb=pb,
                                  banded=banded, lw=lw),
                out_shape=jax.ShapeDtypeStruct((b, 4, ppad), jnp.float32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=grid,
                    in_specs=[_cspec(ppad), ispec_cp, gspec],
                    out_specs=dwspec,
                ),
                compiler_params=params,
            )(band, lane, ok, packed, imgf, gt)
            dimg = jnp.zeros(img.shape, img.dtype)
        return _mm_bwd_epilogue(dw, dimg, fx, fy, tile, out_sp2, b, p, h, w,
                                zeros_mode)

    imgf = img.reshape(b_img, h, w * c).astype(jnp.float32)
    wc = w * c
    lw = _lane_window(c) if (tile and wc > _lane_window(c)) else None
    if lw is not None:
        wcp = _round_up(wc, _LANE)
        if wcp != wc:
            imgf = jnp.pad(imgf, ((0, 0), (0, 0), (0, wcp - wc)))
    else:
        wcp = wc
    band, lane, ok = _band_plan(packed, h, pb, wcp, lw, c)

    ispec = pl.BlockSpec((1, h, wcp),
                         lambda bi, pi, *_: (bi // img_tile, 0, 0),
                         memory_space=pltpu.VMEM)

    if img_grad:
        # fused: coordinate-weight grads + accumulated image grad, one
        # launch sharing the coords/img/cotangent DMAs and mask builds
        dw, dimg = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, C=c, pb=pb, banded=banded,
                              lw=lw),
            out_shape=(jax.ShapeDtypeStruct((b, 4, ppad), jnp.float32),
                       jax.ShapeDtypeStruct((b, h, wcp), jnp.float32)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[_cspec(ppad), ispec, gspec],
                out_specs=(dwspec,
                           pl.BlockSpec((1, h, wcp),
                                        lambda bi, pi, *_: (bi, 0, 0),
                                        memory_space=pltpu.VMEM)),
            ),
            compiler_params=params,
        )(band, lane, ok, packed, imgf, gt)
        if wcp != wc:
            dimg = dimg[:, :, :wc]
        dimg = dimg.reshape(img.shape).astype(img.dtype)
    else:
        dw = pl.pallas_call(
            functools.partial(_bwd_coord_kernel, C=c, pb=pb, banded=banded,
                              lw=lw),
            out_shape=jax.ShapeDtypeStruct((b, 4, ppad), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[_cspec(ppad), ispec, gspec],
                out_specs=dwspec,
            ),
            compiler_params=params,
        )(band, lane, ok, packed, imgf, gt)
        dimg = jnp.zeros(img.shape, img.dtype)  # caller declared img gradless

    return _mm_bwd_epilogue(dw, dimg, fx, fy, tile, out_sp2, b, p, h, w,
                            zeros_mode)


def _mm_bwd_epilogue(dw, dimg, fx, fy, tile, out_sp2, b, p, h, w, zeros_mode):
    """Packed lerp-weight grads -> (d_img, d_fx, d_fy)."""
    dw = dw[:, :, :p]
    if tile:
        dw = _untile_cols(dw, *tile, out_sp2[0], out_sp2[1])
    out_sp = fx.shape
    dwy0, dwy1, dwx0, dwx1 = (dw[:, i, :] for i in range(4))
    # w1 = frac(f) * v1, w0 = (1 - frac(f)) * v0 with v the zeros-mode
    # inside masks (v == 1 in border mode)  =>  d_f = d_w1*v1 - d_w0*v0
    if zeros_mode:
        def _valid(f, size):
            f0 = jnp.floor(f.reshape(b, p).astype(jnp.float32))
            v0 = ((f0 >= 0) & (f0 <= size - 1)).astype(jnp.float32)
            v1 = ((f0 + 1 >= 0) & (f0 + 1 <= size - 1)).astype(jnp.float32)
            return v0, v1

        vx0, vx1 = _valid(fx, w)
        vy0, vy1 = _valid(fy, h)
        d_fx = (dwx1 * vx1 - dwx0 * vx0).reshape(out_sp)
        d_fy = (dwy1 * vy1 - dwy0 * vy0).reshape(out_sp)
    else:
        d_fx = (dwx1 - dwx0).reshape(out_sp)
        d_fy = (dwy1 - dwy0).reshape(out_sp)
    d_fx = d_fx.astype(fx.dtype)  # cotangents must match primal dtypes
    d_fy = d_fy.astype(fy.dtype)
    return dimg, d_fx, d_fy


grid_sample_mm.defvjp(_mm_fwd, _mm_bwd)


# ------------------------------------------------------------------ splat

def _splat_kernel(band_ref, lane_ref, ok_ref, c_ref, occ_ref, *, H: int,
                  W: int, pb: int, banded: bool, lw):
    """occ += dot(At [H, Pc], Bt [W, Pc] contracting Pc): At one-hot over
    target rows, Bt over target cols, each carrying its axis' weights.
    Banded chunks accumulate only their _BAND-row (x lw-lane) window."""
    bi, pi = pl.program_id(0), pl.program_id(1)
    start = pi * pb
    y0, y1, wy0, wy1, x0, x1, wx0, wx1 = _read_coords(c_ref, start, pb)
    Wp = occ_ref.shape[2]

    def bt_of(w_lanes, l0):
        # [w_lanes, pb]; l0 folded into the index rows (_ohxt note)
        return _ohxt(x0, x1, wx0, wx1, w_lanes, pb, 1, l0)

    @pl.when(pi == 0)
    def _init():
        occ_ref[0] = jnp.zeros((H, Wp), occ_ref.dtype)

    if banded:
        row0 = pl.multiple_of(band_ref[bi, pi], 8)

        @pl.when(ok_ref[bi, pi] != 0)
        def _banded():
            at = _ohyt(y0, y1, wy0, wy1, _BAND, pb, row0)
            if lw is None:
                occ_ref[0, pl.ds(row0, _BAND), :] += _dot3(
                    at, bt_of(Wp, 0), ((1,), (1,)))
            else:
                l0 = pl.multiple_of(lane_ref[bi, pi], _LANE)
                occ_ref[0, pl.ds(row0, _BAND), pl.ds(l0, lw)] += _dot3(
                    at, bt_of(lw, l0), ((1,), (1,)))

        @pl.when(ok_ref[bi, pi] == 0)
        def _full():
            at = _ohyt(y0, y1, wy0, wy1, H, pb)
            occ_ref[0] += _dot3(at, bt_of(Wp, 0), ((1,), (1,)))
    else:
        at = _ohyt(y0, y1, wy0, wy1, H, pb)
        occ_ref[0] += _dot3(at, bt_of(Wp, 0), ((1,), (1,)))


def _splat_corners(f, size):
    """Corner indices/weights with the reference splat's conventions
    (ops/sampling.py:forward_splat_occupancy / utils/layers.py:552-605):
    weight (1 - |f - clipped corner|) * (corner unclipped), where
    'floor' = floor(f) and 'ceil' = floor(f) + 1."""
    f1 = jnp.floor(f)          # floor corner
    f0 = f1 + 1.0              # ceil corner
    cf = jnp.clip(f1, 0, size - 1)
    cc = jnp.clip(f0, 0, size - 1)
    wf = (1.0 - jnp.abs(f - cf)) * (f1 == cf)
    wc = (1.0 - jnp.abs(f - cc)) * (f0 == cc)
    return cf, cc, wf.astype(jnp.float32), wc.astype(jnp.float32)


def splat_mm(x, y, height: int, width: int):
    """Forward-splat unit bilinear mass at pixel coords x, y [B, P].
    Returns the occupancy map [B, height, width] (f32).  When P equals
    height*width the pixels are assumed raster-ordered over that grid
    (true for the warp losses), which enables tile windowing."""
    b, p = x.shape
    pb = 512
    tile = (_grid_tile((height, width), pb, height)
            if p == height * width else None)
    if tile:
        x = _tile_cols(x.reshape(b, height, width), *tile)
        y = _tile_cols(y.reshape(b, height, width), *tile)
    pad = _round_up(p, pb) - p
    x0, x1, wx0, wx1 = _splat_corners(x.astype(jnp.float32), width)
    y0, y1, wy0, wy1 = _splat_corners(y.astype(jnp.float32), height)
    packed = _pad_packed(
        jnp.stack([y0, y1, wy0, wy1, x0, x1, wx0, wx1], axis=1), pad)
    ppad = p + pad
    banded = _banding_enabled(height)
    lw = _lane_window(1) if (tile and width > _lane_window(1)) else None
    wp = _round_up(width, _LANE) if lw is not None else width
    band, lane, ok = _band_plan(packed, height, pb, wp, lw, 1)

    occ = pl.pallas_call(
        functools.partial(_splat_kernel, H=height, W=width, pb=pb,
                          banded=banded, lw=lw),
        out_shape=jax.ShapeDtypeStruct((b, height, wp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, ppad // pb),
            in_specs=[_cspec(ppad)],
            out_specs=pl.BlockSpec((1, height, wp),
                                   lambda bi, pi, *_: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(band, lane, ok, packed)
    return occ[:, :, :width] if wp != width else occ
