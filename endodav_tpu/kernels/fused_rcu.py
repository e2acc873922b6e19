"""Fused DPT ResidualConvUnit: x + conv2(relu(conv1(relu(x)))) in one kernel.

The serving profile's post-round-3 tail names the thin-channel DPT convs
as HBM-bandwidth/efficiency-bound (PERFORMANCE.md "MFU context"): at the
production vits width C=64 each 3x3 conv is a [M, 64] x [64, 64]
contraction — half the MXU's K lanes idle — and XLA materializes the
inter-conv intermediate to HBM (~1.8 GB per 518px chunk at path_2
scale).  This kernel attacks both at once:

  * **in-VMEM im2col**: the nine 3x3 taps are concatenated into one
    [M, 9C] panel and each conv becomes a single [M, 9C] x [9C, C]
    matmul — K=576 fills the MXU contraction lanes (the round-2 XLA
    im2col experiments lost because their patch panels round-tripped
    HBM; here the panel never leaves VMEM);
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


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, bh, w, c, h):
    xb = x_ref[...]                     # [bh+4, W+4, C], halo 2 each side
    a = jnp.maximum(xb, 0)

    def im2col(src, rows, cols):
        panels = [src[dy:dy + rows, dx:dx + cols, :].reshape(rows * cols, c)
                  for dy in range(3) for dx in range(3)]
        return jnp.concatenate(panels, axis=1)    # [rows*cols, 9C]

    # conv1 on the bh+2 x W+2 interior (still carrying halo 1 for conv2)
    col1 = im2col(a, bh + 2, w + 2)
    acc1 = jnp.dot(col1, w1_ref[:], preferred_element_type=jnp.float32)
    t1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0)
    t1 = t1.reshape(bh + 2, w + 2, c)
    # conv2's SAME padding zero-pads the INTERMEDIATE at image borders;
    # recomputing t1 from zero-padded x yields relu(b1) there instead of
    # 0 — mask the out-of-image halo rows/cols (band rows are absolute
    # r0 + j - 1; r0 = band index * bh)
    r0 = pl.program_id(1) * bh
    row_abs = r0 + jax.lax.broadcasted_iota(jnp.int32, (bh + 2, w + 2), 0) - 1
    col_abs = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, w + 2), 1) - 1
    valid = ((row_abs >= 0) & (row_abs < h) & (col_abs >= 0) & (col_abs < w))
    t1 = jnp.where(valid[:, :, None], t1, 0).astype(xb.dtype)

    col2 = im2col(t1, bh, w)
    acc2 = jnp.dot(col2, w2_ref[:], preferred_element_type=jnp.float32)
    y = (acc2 + b2_ref[:].astype(jnp.float32)).astype(xb.dtype)
    o_ref[0] = y.reshape(bh, w, c) + xb[2:2 + bh, 2:2 + w, :]


def _fused_rcu_impl(x, w1, b1, w2, b2, *, block_rows, interpret):
    b, h, w, c = x.shape
    bh = min(block_rows, h)
    # shrink the band until the VMEM working set fits: the two im2col
    # panels dominate ((bh+2)*(W+2)*9C + bh*W*9C elements); at the 518px
    # path_1 width (W=736, C=64) bh=8 would need ~17 MB
    bytes_el = 2 if x.dtype == jnp.bfloat16 else 4

    def band_bytes(rows):
        col1 = (rows + 2) * (w + 2) * 9 * c * bytes_el
        col2 = rows * w * 9 * c * bytes_el
        xb = (rows + 4) * (w + 4) * c * bytes_el
        acc = (rows + 2) * (w + 2) * c * 4 * 2  # f32 acc1 + masked t1
        return col1 + col2 + xb + acc

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
