"""vitl 518px serving measurement via split compilation.

Round-2 blocker: whole-model vitl jits exceed the remote-compile
service's limits (>40 min / dropped connection), at both resolutions and
with kernels disabled (PERFORMANCE.md "Closed experiments (b)").  This
tool compiles the model in PIECES — ViT trunk and DPT head as separate
jits sharing one variables tree — and measures the real end-to-end
chunk forward as their composition (dispatch gap per extra jit is
~20 ms through this environment's relay, <2% at vitl chunk times).

Run: python tools/bench_vitl.py [--stage trunk|head|all] [--chunk 1]
     [--image 518 644] [--reps 3]

Stages can be compiled in separate invocations to stay under the
compile-service session limits; the persistent XLA cache makes the
measurement run pick them up warm.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from endodav_tpu.utils.devsync import device_sync  # noqa: E402 (needs sys.path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=["trunk", "head", "all"])
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--image", type=int, nargs=2, default=(518, 644))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fused", action="store_true",
                    help="route motion modules to the fused temporal kernel")
    ap.add_argument("--scan", action="store_true",
                    help="scan-over-layers trunk (models/vit.py:scan_trunk_apply)"
                         " — one compiled block body per segment")
    args = ap.parse_args()

    import os

    if not args.fused:
        os.environ.setdefault("ENDODAV_NO_FUSED", "1")

    import jax
    import jax.numpy as jnp

    from endodav_tpu.models.dpt import DPTDecoder
    from endodav_tpu.models.endodav import ENDODAV_CONFIGS, IMAGENET_MEAN, IMAGENET_STD
    from endodav_tpu.models.vit import VIT_CONFIGS, DinoViT
    from endodav_tpu.ops.resize import resize2d

    enc = "vitl"
    t = 32
    ih, iw = args.image
    vit_cfg = VIT_CONFIGS[enc]
    cfg = ENDODAV_CONFIGS[enc]
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    vit = DinoViT(**vit_cfg, include_cls_token=True, lora_variant="none",
                  dtype=dtype, name="pretrained")
    head = DPTDecoder(in_channels=vit_cfg["embed_dim"], features=cfg["features"],
                      out_channels=cfg["out_channels"], temporal=True,
                      num_frames=32, conv_head=True, dtype=dtype, name="head")

    n = args.chunk * t
    x = jnp.asarray(rng.uniform(0, 1, (n, ih, iw, 3)).astype(np.float32), dtype)
    ph, pw = ih // 14, iw // 14

    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)

    if args.scan:
        from endodav_tpu.models.vit import scan_trunk_apply

        @jax.jit
        def trunk_fn(pv, x):
            xi = (x - mean) / std
            return scan_trunk_apply(vit, pv, xi, cfg["intermediate"])
    else:
        @jax.jit
        def trunk_fn(pv, x):
            xi = (x - mean) / std
            return vit.apply({"params": pv}, xi, cfg["intermediate"])

    @jax.jit
    def head_fn(ph_params, taps):
        return head.apply({"params": ph_params}, taps, (ph, pw), frames=t)[("disp", 0)]

    print(f"[vitl] init ({ih}x{iw}, chunk={args.chunk}, fused={args.fused})...",
          flush=True)
    pv = jax.jit(vit.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x[:1], tuple(cfg["intermediate"]))["params"]

    def timed(label, fn, *a):
        t0 = time.time()
        out = fn(*a)
        device_sync(out)
        print(f"[vitl] {label} first call (compile+run): {time.time()-t0:.1f}s",
              flush=True)
        return out

    taps = None
    if args.stage in ("trunk", "all"):
        taps = timed("trunk", trunk_fn, pv, x)
    if args.stage == "trunk":
        return

    if taps is None:  # head-only compile: synthesize taps at the right shapes
        taps = [(jnp.zeros((n, ph * pw, vit_cfg["embed_dim"]), dtype),
                 jnp.zeros((n, vit_cfg["embed_dim"]), dtype))
                for _ in cfg["intermediate"]]
    # jit the init: eager vitl-width init materializes every DPT
    # intermediate at 32 frames and OOMs HBM next to the resident trunk.
    phd = jax.jit(
        lambda rng, tp: head.init(rng, tp, (ph, pw), frames=t)["params"]
    )(jax.random.PRNGKey(1), jax.tree_util.tree_map(lambda a: a[:t], taps))
    disp = timed("head", head_fn, phd, taps)
    if args.stage == "head":
        return

    # measured composition: trunk -> head, distinct buffers per rep
    xs = [jnp.asarray(rng.uniform(0, 1, (n, ih, iw, 3)).astype(np.float32), dtype)
          for _ in range(args.reps)]
    device_sync(xs)
    t0 = time.time()
    for xb in xs:
        disp = head_fn(phd, trunk_fn(pv, xb))
    device_sync(disp)
    per = (time.time() - t0) / args.reps
    print(f"[vitl] e2e chunk forward: {per*1e3:.0f} ms -> "
          f"{n/per:.1f} frames/s compute ({args.reps} reps)", flush=True)

    # GFLOP/frame + MFU from XLA cost_analysis of the two compiled jits
    # (round-4 VERDICT weak #5: the vitl rows carried fps but no cost
    # accounting, so nobody could say whether the next vitl lever is
    # kernels or structure)
    try:
        tf_ = float(trunk_fn.lower(pv, x).compile()
                    .cost_analysis()["flops"])
        hf_ = float(head_fn.lower(phd, taps).compile()
                    .cost_analysis()["flops"])
        gpf = (tf_ + hf_) / n / 1e9
        mfu = ((tf_ + hf_) / per) / 197e12
        print(f"[vitl] cost: {gpf:.1f} GFLOP/frame "
              f"(trunk {tf_/n/1e9:.1f} + head {hf_/n/1e9:.1f}), "
              f"MFU {100*mfu:.1f}% of v5e bf16 peak", flush=True)
    except Exception as e:
        print(f"[vitl] cost_analysis unavailable ({type(e).__name__})",
              flush=True)

    if args.chunk == 1:
        # dedup serving composition (the eval CLIs' DEFAULT,
        # video_inference.DedupWindowForward): the 186-frame bench clip
        # is 6 unique-frame [32]-batch encodes (192 encodes) + 8 window
        # heads — vs the window path's 8 full (trunk+head) forwards
        # (256 encodes).  Same-shape buffers stand in for the gathered
        # taps (the per-window tap gather is ~0.5 ms of HBM traffic at
        # these shapes, negligible vs vitl trunk times).
        t0 = time.time()
        taps_d = None
        for xb in (xs * 3)[:6]:
            taps_d = trunk_fn(pv, xb)
        for _ in range(8):
            disp = head_fn(phd, taps_d)
        device_sync(disp)
        clip = time.time() - t0
        print(f"[vitl] dedup clip (6x32 encodes + 8 window heads, 186 frames): "
              f"{clip:.2f} s -> {186/clip:.1f} frames/s effective; "
              f"window path 8x(trunk+head) = {8*per:.2f} s -> "
              f"{186/(8*per):.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
