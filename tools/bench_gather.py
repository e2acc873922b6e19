"""Find a fast TPU formulation for grid_sample's pixel gather.

The profiler shows XLA lowers `take_along_axis` over the H*W axis to a
~10 ns/element serial gather — 56% of the whole train step
(PERFORMANCE.md round-2 profile).  This tool times candidate
formulations with real device-side durations (tools/profile_device.py).

Shape under test: the scale-0 training warp — img [15, 256, 320, 3],
index maps [15, 256, 320] (one corner of the bilinear stencil; the full
grid_sample does 4).
"""

from __future__ import annotations


import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402

from tools.profile_device import device_profile

B, H, W, C = 15, 256, 320, 3


def run_case(label, fn, args):
    device_sync(fn(*args))  # compile

    def run():
        return fn(*args)

    rows = device_profile(run, top=50)
    dev_ms = sum(ms for name, n, ms in rows
                 if not name.startswith("jit_") and not name.isdigit())
    print(f"{label}: {dev_ms:.2f} ms device", flush=True)
    return dev_ms


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    iy = jnp.asarray(rng.integers(0, H, (B, H, W)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, W, (B, H, W)), jnp.int32)

    # v0: current — take_along_axis over hw with trailing C slice
    @jax.jit
    def v0(img, ix, iy):
        flat = img.reshape(B, H * W, C)
        idx = (iy * W + ix).reshape(B, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, C)

    run_case("v0 take_along_axis [b,hw,c]", v0, (img, ix, iy))

    # v1: channels-first — per-channel gather along the minor axis
    @jax.jit
    def v1(img, ix, iy):
        flat = img.reshape(B, H * W, C).swapaxes(1, 2)  # [B, C, HW]
        idx = (iy * W + ix).reshape(B, 1, -1)
        out = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (B, C, H * W)), axis=2)
        return out.swapaxes(1, 2).reshape(B, H, W, C)

    run_case("v1 take_along_axis [b,c,hw] minor", v1, (img, ix, iy))

    # v2: interleaved single flat gather (slice size 1 over hw*c)
    @jax.jit
    def v2(img, ix, iy):
        flat = img.reshape(B, H * W * C)
        base = ((iy * W + ix) * C).reshape(B, -1, 1)
        idx = (base + jnp.arange(C)[None, None]).reshape(B, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(B, H, W, C)

    run_case("v2 flat interleaved", v2, (img, ix, iy))

    # v3: Pallas — whole image in VMEM, per-row dynamic gather in-kernel
    def _kernel(img_ref, idx_ref, o_ref):
        src = img_ref[...]              # [HW, C] padded-to-lane VMEM block
        idx = idx_ref[...]              # [rows, W]
        o_ref[...] = jnp.take(src, idx, axis=0)

    rows_blk = 8

    @jax.jit
    def v3(img, ix, iy):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        flat = img.reshape(B, H * W, C)
        idx = (iy * W + ix)  # [B, H, W]
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), img.dtype),
            grid_spec=pl.GridSpec(
                grid=(B, H // rows_blk),
                in_specs=[
                    pl.BlockSpec((1, H * W, C), lambda b, r: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, rows_blk, W), lambda b, r: (b, r, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, rows_blk, W, C), lambda b, r: (b, r, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(flat, idx)
        return out

    def _kernel2(img_ref, idx_ref, o_ref):
        src = img_ref[0]                # [HW, C]
        idx = idx_ref[0].reshape(-1)    # [rows*W]
        o_ref[0] = jnp.take(src, idx, axis=0).reshape(rows_blk, W, C)

    @jax.jit
    def v3b(img, ix, iy):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        flat = img.reshape(B, H * W, C)
        idx = (iy * W + ix)
        return pl.pallas_call(
            _kernel2,
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), img.dtype),
            grid_spec=pl.GridSpec(
                grid=(B, H // rows_blk),
                in_specs=[
                    pl.BlockSpec((1, H * W, C), lambda b, r: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, rows_blk, W), lambda b, r: (b, r, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, rows_blk, W, C), lambda b, r: (b, r, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(flat, idx)

    for label, fn in (("v3 pallas take(axis0)", v3), ("v3b pallas take flat", v3b)):
        try:
            got = fn(img, ix, iy)
            want = v0(img, ix, iy)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
            if err > 0:
                print(f"{label}: WRONG (err {err})", flush=True)
                continue
            run_case(label, fn, (img, ix, iy))
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()


def patch_vs_4x():
    """All 4 bilinear corners in ONE gather (slice 2x2xC) vs 4 separate."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    y0 = jnp.asarray(rng.integers(0, H - 1, (B, H, W)), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, W - 1, (B, H, W)), jnp.int32)

    @jax.jit
    def four(img, x0, y0):
        flat = img.reshape(B, H * W, C)
        outs = []
        for dy in (0, 1):
            for dx in (0, 1):
                idx = ((y0 + dy) * W + (x0 + dx)).reshape(B, -1)
                outs.append(jnp.take_along_axis(flat, idx[..., None], axis=1))
        return sum(outs)

    @jax.jit
    def patch(img, x0, y0):
        starts = jnp.stack([y0.reshape(B, -1), x0.reshape(B, -1)], axis=-1)  # [B,P,2]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        out = jax.lax.gather(img, starts, dn, slice_sizes=(1, 2, 2, C),
                             mode=jax.lax.GatherScatterMode.CLIP)
        # out: [B, P, 2, 2, C]
        return out.sum(axis=(2, 3))

    w4 = four(img, x0, y0)
    wp = patch(img, x0, y0)
    err = float(jnp.max(jnp.abs(w4.astype(jnp.float32).reshape(B, -1, C)
                                - wp.astype(jnp.float32))))
    print(f"patch-vs-4x max err: {err:.2e}")
    run_case("4x separate corner gathers", four, (img, x0, y0))
    run_case("one 2x2xC patch gather", patch, (img, x0, y0))
