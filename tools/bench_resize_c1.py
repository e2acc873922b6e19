#!/usr/bin/env python
# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

"""A/B the C=1 (single-channel) big-resize formulation.

MEASUREMENT CAVEAT (the round-5 lesson this tool taught): in this
environment the FIRST timed loop of any freshly compiled executable
reads ~3-4x inflated even after a warm-up call + sync — run every
variant's timed loop TWICE and keep the second, or the first variant in
the list appears 4x slower than the rest (which initially masqueraded
as a 4x einsum-operand-order win; steady-state all formulations tie).
The loop below runs two passes in opposite orders and reports both.

  python tools/bench_resize_c1.py [--shape 128 592 736] [--out 512 640]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(128, 592, 736))
    ap.add_argument("--out", type=int, nargs=2, default=(512, 640))
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dtype", default="float32")
    args, _ = ap.parse_known_args()

    import jax
    import jax.numpy as jnp

    from endodav_tpu.ops.resize import interp_matrix, resize2d
    from endodav_tpu.utils.devsync import device_sync

    b, h, w = args.shape
    oh, ow = args.out
    dt = jnp.dtype(args.dtype)
    mh = jnp.asarray(interp_matrix(h, oh, "bilinear", True), dt)
    mw = jnp.asarray(interp_matrix(w, ow, "bilinear", True), dt)

    def v_current(x):  # resize2d on [..., 1]
        return resize2d(x[..., None], (oh, ow), "bilinear", align_corners=True)[..., 0]

    def v_einsum_lhs_x(x):  # x on the LHS of both einsums
        y = jnp.einsum("bhw,ph->bpw", x, mh, preferred_element_type=dt)
        return jnp.einsum("bpw,qw->bpq", y, mw, preferred_element_type=dt)

    def v_dot_cycle(x):
        # contract h -> [b, w, p]; contract w -> [b, p, q]: each dot puts
        # its surviving spatial axis minor, no explicit transposes
        y = jax.lax.dot_general(x, mh.T, (((1,), (0,)), ((), ())))   # [b, w, p]
        return jax.lax.dot_general(y, mw.T, (((1,), (0,)), ((), ())))  # [b, p, q]

    def v_batch_in_c(x):  # fold batch into the channel axis: one [h, w, b] image
        y = jnp.moveaxis(x, 0, -1)[None]                # [1, h, w, b]
        y = resize2d(y, (oh, ow), "bilinear", align_corners=True)
        return jnp.moveaxis(y[0], -1, 0)

    variants = {
        "current(resize2d c=1)": v_current,
        "einsum x-lhs": v_einsum_lhs_x,
        "dot cycle [b,w,p]": v_dot_cycle,
        "batch-as-channels": v_batch_in_c,
    }

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, h, w)).astype(args.dtype))
    jitted, ref = [], None
    for name, fn in variants.items():
        f = jax.jit(fn)
        try:
            out = f(x0)
            device_sync(out)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:100]}")
            continue
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            d = np.abs(np.asarray(out, np.float32) - ref).max()
            assert d < 1e-4, (name, d)
        jitted.append((name, f))
    for rep in range(2):
        for name, f in (jitted if rep == 0 else jitted[::-1]):
            t0 = time.time()
            cur = x0
            for i in range(args.reps):
                out = f(cur)
                cur = x0 + out[0, 0, 0].astype(dt) * 0  # dependency chain
            device_sync(out)
            dt_ms = (time.time() - t0) / args.reps * 1e3
            print(f"rep{rep} {name:24s} {dt_ms:8.2f} ms  "
                  f"({b}x{h}x{w} -> {oh}x{ow}, {args.dtype})")


if __name__ == "__main__" and "--c32" not in _sys.argv:
    main()


def bench_c32():
    """Secondary check: does einsum operand order matter at C=32 (the
    HeadDepth up-resize shape) too, or only at C=1?"""
    import jax
    import jax.numpy as jnp

    from endodav_tpu.ops.resize import interp_matrix, resize2d
    from endodav_tpu.utils.devsync import device_sync
    import numpy as np, time

    b, h, w, c = 128, 296, 368, 32
    oh, ow = 592, 736
    dt = jnp.bfloat16
    mh = jnp.asarray(interp_matrix(h, oh, "bilinear", True), dt)
    mw = jnp.asarray(interp_matrix(w, ow, "bilinear", True), dt)

    def cur(x):
        return resize2d(x, (oh, ow), "bilinear", align_corners=True)

    def xlhs(x):
        y = jnp.einsum("bhwc,ph->bpwc", x, mh, preferred_element_type=dt)
        return jnp.einsum("bpwc,qw->bpqc", y, mw, preferred_element_type=dt)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
    for name, fn in [("current mh-lhs", cur), ("x-lhs", xlhs)]:
        f = jax.jit(fn)
        out = f(x0); device_sync(out)
        t0 = time.time()
        cur_x = x0
        for i in range(10):
            out = f(cur_x)
            cur_x = x0 + out[0, 0, 0, 0].astype(dt) * 0
        device_sync(out)
        print(f"C=32 {name:16s} {(time.time()-t0)/10*1e3:8.2f} ms")


if __name__ == "__main__" and "--c32" in _sys.argv:
    bench_c32()
