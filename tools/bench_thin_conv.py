"""Thin-channel conv microbench: XLA conv_general_dilated vs im2col matmul.

DPT fusion at vits runs 3x3 convs at C=32..64 — a regime where the MXU
wants 128-deep contractions.  Checks whether reformulating as an
explicit im2col dot ([pixels, 9*C] @ [9*C, C']) beats XLA's native conv
lowering at the production shapes, at whole-op granularity (chained
timing, distinct buffers).

Run: python tools/bench_thin_conv.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402


SHAPES = [
    # (B, H, W, Cin, Cout) — DPT production shapes at 518px serving
    (64, 148, 184, 64, 64),    # fuse(1)/(2) ResidualConvUnit
    (64, 296, 368, 64, 32),    # HeadDepth conv0
    (64, 592, 736, 32, 32),    # HeadDepth conv2 (post-upsample)
    (64, 74, 92, 64, 64),      # fuse(3) RCU
]


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def im2col_conv(x, w):
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)  # [b, h, w, 9*ci]
    return jnp.einsum("bhwk,kc->bhwc", patches, w.reshape(9 * ci, co),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def shifted_dot_conv(x, w):
    """3x3 conv as 9 shifted [*, Cin]@[Cin, Cout] dots summed — no 9x
    patches materialization (reads x 9 times instead)."""
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            part = jnp.einsum("bhwi,io->bhwo", xp[:, dy:dy + h, dx:dx + wd, :],
                              w[dy, dx], preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def timeit(fn, xs, w, reps=6):
    out = fn(xs[0], w)
    device_sync(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(xs[i % len(xs)], w)
    device_sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    for b, h, wd, ci, co in SHAPES:
        xs = [jnp.asarray(rng.standard_normal((b, h, wd, ci)), jnp.bfloat16)
              for _ in range(2)]
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.bfloat16)
        fns = [("xla_conv", jax.jit(xla_conv)),
               ("im2col", jax.jit(im2col_conv)),
               ("shifted9", jax.jit(shifted_dot_conv))]
        ref = None
        row = [f"[{b},{h},{wd},{ci}->{co}]"]
        for name, fn in fns:
            out = fn(xs[0], w)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                assert err < 1.0, (name, err)
            ms = timeit(fn, xs, w) * 1e3
            row.append(f"{name} {ms:.2f} ms")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
