"""Fused DPT ResidualConvUnit: x + conv2(relu(conv1(relu(x)))) in one kernel.

The serving profile's post-round-3 tail names the thin-channel DPT convs
as HBM-bandwidth/efficiency-bound (PERFORMANCE.md "MFU context"): at the
production vits width C=64 each 3x3 conv is a [M, 64] x [64, 64]
contraction — half the MXU's K lanes idle — and XLA materializes the
inter-conv intermediate to HBM (~1.8 GB per 518px chunk at path_2
scale).  This kernel attacks both at once:

  * **in-VMEM taps**: each conv is nine accumulating [M, C] x [C, C]
    tap matmuls on VMEM-resident shifted slices (the round-2 XLA
    im2col experiments lost because their patch panels round-tripped
    HBM; here nothing leaves VMEM).  The single concatenated [M, 9C]
    panel (K=576 fills the MXU contraction lanes) does NOT lower:
    Mosaic's tpu.concatenate rejects operands with mismatched sublane
    offsets on a non-concat dim — see the in-kernel comment for the
    full list of lowering constraints this body works around;
  * **relu -> conv -> relu -> conv -> +skip fused** in one residency:
    the intermediate never touches HBM.

Banding: grid over (frames, row bands).  The input block is an
OVERLAPPING band of ``bh + 4`` rows via `pl.Element` indexing (halo 2 =
two stacked 3x3 convs); the host pads H to a band multiple and W by 2
on each side, so in-kernel slicing is static.  Weights ride VMEM as
pre-reshaped [9C, C] panels, constant across the grid (DMA elided after
the first step).  Cost accounting: the host-side pad is one extra HBM
round trip of the input (~0.23 GB/chunk at 518px path_2 — ~13% of the
~1.8 GB intermediate traffic the fusion removes) and the ``out[:, :h]``
slice copies only when H is not a band multiple; folding the borders
into the kernel's existing validity mask would remove both if the
device A/B shows them to matter.

Scope: inference forward for C <= 128 (vits features=64).  At vitl's
C=256 the [M, 9C] panel alone exceeds the VMEM budget; XLA keeps that
width.  The backward is a custom_vjp recompute through the XLA
reference composition (same policy as the fused temporal block —
serving is the target; training keeps XLA unless a step A/B says
otherwise).

Reference: models/endodav/util/blocks.py:37-91 (ResidualConvUnit);
routed from endodav_tpu/models/dpt.py behind ENDODAV_FUSED_RCU=1
pending the device A/B (tools/tpu_session_r3.sh stage `rcu`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_rcu", "rcu_reference"]


def rcu_reference(x, w1, b1, w2, b2, skip=None):
    """The exact XLA composition the kernel replaces (NHWC, SAME).

    ``skip``: residual input for the final add (defaults to x); the
    dpt.py caller passes the *uncast* activation here so the output
    dtype promotion matches the historical nn.Conv composition exactly.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.nn.relu(x)
    y = jax.lax.conv_general_dilated(y, w1.astype(x.dtype), (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = y + b1.astype(x.dtype)
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(y, w2.astype(x.dtype), (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = y + b2.astype(x.dtype)
    return y + (x if skip is None else skip)


def _round_up(n, m):
    return -(-n // m) * m


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, bh, w, c, h):
    xb = x_ref[...]                     # [bh+4, W+4, C], halo 2 each side
    a = jnp.maximum(xb, 0)

    # Mosaic lowering constraints shape this body (each found by a
    # device compile probe):
    #   * folding leading dims into the sublane axis (3D->2D reshape)
    #     only lowers when the folded sublane dim is tile-aligned, so
    #     every fold pads cols to the 16-row tile (covers bf16 (16,128)
    #     and f32 (8,128));
    #   * tpu.concatenate rejects operands whose layout offsets differ
    #     on a non-concat dim, which kills the single [M, 9C] im2col
    #     panel (the nine 3x3-tap slices carry sublane offsets 0/1/2);
    #     instead each tap folds alone and the conv is nine accumulating
    #     [M, C] x [C, C] matmuls — the zero-pad concat rides the
    #     offset-bearing dim itself, normalizing the layout before the
    #     fold.  cpad > cols always (round_up(cols+1)) so the concat is
    #     never skipped.
    def conv3x3(src, rows, cols, cpad, w_ref):
        acc = jnp.zeros((rows * cpad, c), jnp.float32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            sl = src[dy:dy + rows, dx:dx + cols, :]
            zeros = jnp.zeros((rows, cpad - cols, c), sl.dtype)
            panel = jnp.concatenate([sl, zeros], axis=1).reshape(rows * cpad, c)
            acc += jnp.dot(panel, w_ref[k * c:(k + 1) * c, :],
                           preferred_element_type=jnp.float32)
        return acc

    # conv1 on the bh+2 x W+2 interior (still carrying halo 1 for conv2)
    w1p = _round_up(w + 3, 16)
    acc1 = conv3x3(a, bh + 2, w + 2, w1p, w1_ref)
    t1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0)
    t1 = t1.reshape(bh + 2, w1p, c)[:, :w + 2, :]
    # conv2's SAME padding zero-pads the INTERMEDIATE at image borders;
    # recomputing t1 from zero-padded x yields relu(b1) there instead of
    # 0 — mask the out-of-image halo rows/cols (band rows are absolute
    # r0 + j - 1; r0 = band index * bh)
    # 3D iotas from the start: inserting a minor dim on a non-32-bit
    # vector (bool mask[:, :, None]) fails Mosaic lowering.
    r0 = pl.program_id(1) * bh
    row_abs = r0 + jax.lax.broadcasted_iota(jnp.int32, (bh + 2, w + 2, 1), 0) - 1
    col_abs = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, w + 2, 1), 1) - 1
    valid = ((row_abs >= 0) & (row_abs < h) & (col_abs >= 0) & (col_abs < w))
    t1 = jnp.where(valid, t1, 0).astype(xb.dtype)

    w2p = _round_up(w + 1, 16)
    acc2 = conv3x3(t1, bh, w, w2p, w2_ref)
    y = (acc2 + b2_ref[:].astype(jnp.float32)).astype(xb.dtype)
    y = y.reshape(bh, w2p, c)[:, :w, :]
    o_ref[0] = y + xb[2:2 + bh, 2:2 + w, :]


def _fused_rcu_impl(x, w1, b1, w2, b2, *, block_rows, interpret):
    b, h, w, c = x.shape
    bh = min(block_rows, h)
    # shrink the band until the VMEM working set fits.  With per-tap
    # matmuls the peak residency is: input band xb, one padded tap
    # panel, the two f32 accumulators, and the masked t1 copy (f32
    # pre-relu + element-dtype post-cast); cpad <= cols + 17.
    bytes_el = 2 if x.dtype == jnp.bfloat16 else 4

    def band_bytes(rows):
        wp = w + 20                              # cpad upper bound (+halo)
        panel = (rows + 2) * wp * c * bytes_el   # one tap panel at a time
        accs = (rows + 2) * wp * c * 4 * 2       # f32 acc1 + acc2
        t1b = (rows + 2) * wp * c * (4 + bytes_el)
        xb = (rows + 4) * (w + 4) * c * bytes_el
        return panel + accs + t1b + xb

    while bh > 1 and band_bytes(bh) > 10 * 2 ** 20:
        bh = max(1, bh // 2)
    hp = pl.cdiv(h, bh) * bh
    xp = jnp.pad(x, ((0, 0), (2, 2 + hp - h), (2, 2), (0, 0)))

    # HWIO [3,3,C,C] -> [9C, C] rows ordered (ky, kx, ci) to match im2col
    w1f = w1.reshape(9 * c, c).astype(x.dtype)
    w2f = w2.reshape(9 * c, c).astype(x.dtype)
    b1r = b1.reshape(1, c).astype(jnp.float32)
    b2r = b2.reshape(1, c).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, w=w, c=c, h=h),
        grid=(b, hp // bh),
        in_specs=[
            # Mosaic requires every dim of an elementwise-indexed block to
            # be Element (or Squeezed) — mixing Element with Blocked dims
            # fails lowering ("All block dimensions must be Elements...").
            # Squeeze the frame dim; give the rest element start offsets.
            pl.BlockSpec((None, pl.Element(bh + 4), pl.Element(w + 4),
                          pl.Element(c)),
                         lambda i, j: (i, j * bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), x.dtype),
        interpret=interpret,
    )(xp, w1f, b1r, w2f, b2r)
    return out[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_rcu(x, w1, b1, w2, b2, block_rows: int = 8, interpret: bool = False):
    """x [B, H, W, C] + conv params (HWIO [3,3,C,C], bias [C]) -> RCU out."""
    return _fused_rcu_impl(x, w1, b1, w2, b2, block_rows=block_rows,
                           interpret=interpret)


def _fwd(x, w1, b1, w2, b2, block_rows, interpret):
    return fused_rcu(x, w1, b1, w2, b2, block_rows, interpret), (x, w1, b1, w2, b2)


def _bwd(block_rows, interpret, res, g):
    # XLA-recompute backward (training keeps the XLA forward anyway)
    _, vjp = jax.vjp(rcu_reference, *res)
    return vjp(g)


fused_rcu.defvjp(_fwd, _bwd)
