#!/usr/bin/env python
# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

"""Chunk-width sweep for the dedup serving pipeline (default path).

bench.py's cw=4 optimum was measured for the WHOLE-model window forward
(trunk+head per chunk); under dedup the per-chunk work is only the
temporal DPT head, so the optimum may move.  Sweeps the device-resident
dedup pipeline (encode batches + per-chunk heads, pre-staged indices)
at several chunk_windows and prints effective clip fps for the
186-frame bench clip.

  python tools/bench_dedup_cw.py [--config 518|224] [--cw 2 4 8]
"""

import argparse
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="518", choices=["518", "224"])
    ap.add_argument("--cw", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--fb", type=int, nargs="+", default=[32],
                    help="encode batch sizes to sweep (frames per trunk call)")
    ap.add_argument("--frames", type=int, default=186)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval import video_inference as vi

    def sync(t):
        # robust device sync for this environment: block_until_ready has
        # been observed to return early on the axon tunnel under load
        # (a no-op while the queue is saturated); materializing a scalar
        # slice of the LAST output rides the in-order device stream and
        # genuinely waits (probe: equal to block_until_ready when that
        # works, correct when it does not).
        leaf = jax.tree_util.tree_leaves(t)[-1]
        # scalar INDEX, not ravel: ravel copies the whole array and XLA
        # picked a (8,128)-tiled layout for f32[96,518,644,3] that
        # padded 43x and OOM'd HBM; a multi-axis [0,...,0] index lowers
        # to a slice of one element.
        return np.asarray(leaf[(0,) * leaf.ndim])
    from endodav_tpu.models import EndoDAV
    from endodav_tpu.models.endodav import _endodav_lora_alpha
    from endodav_tpu.models.lora import merge_lora_params

    if args.config == "518":
        src_hw, image_shape, residual_blocks = (512, 640), (518, 644), ()
    else:
        src_hw, image_shape, residual_blocks = (256, 320), (224, 280), (2, 5, 8, 11)

    lora_model = EndoDAV(encoder="vits", lora_type="dvlora",
                         residual_block_indexes=residual_blocks,
                         image_shape=image_shape, dtype=jnp.bfloat16)
    variables = jax.jit(lora_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, *image_shape, 3)))
    variables = {"params": merge_lora_params(
        variables["params"], "dvlora", 4, _endodav_lora_alpha("dvlora", 4))}
    model = EndoDAV(encoder="vits", lora_type="none",
                    residual_block_indexes=residual_blocks,
                    image_shape=image_shape, dtype=jnp.bfloat16)

    dedup = vi.dedup_window_forward(model, variables)
    n = args.frames
    th, tw = vi.keep_aspect_size(*src_hw, *image_shape)
    rng = np.random.default_rng(0)
    idx = vi.window_indices(n)
    nw = idx.shape[0]

    # encode batch-size sweep: the trunk fill-rate vs padding trade
    enc_results = {}
    for fb in args.fb:
        n_fpad = math.ceil(n / fb) * fb
        batches = [jnp.asarray(rng.uniform(0, 1, (fb, th, tw, 3)).astype(np.float32))
                   for _ in range(n_fpad // fb)]
        sync(batches)

        def encode_all():
            outs = [dedup.encode(variables, b) for b in batches]
            sync(outs[-1])
            return outs

        try:
            encode_all()
        except Exception as e:
            print(f"[dedup-cw {args.config}] fb={fb}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        t0 = time.time()
        for _ in range(args.reps):
            pairs = encode_all()
        enc_results[fb] = ((time.time() - t0) / args.reps, pairs, n_fpad)
        enc_s = enc_results[fb][0]
        print(f"[dedup-cw {args.config}] fb={fb}: encode {n_fpad} frames in "
              f"{enc_s*1e3:.0f} ms ({n_fpad/enc_s:.1f} enc/s)", flush=True)

    fb, (enc_s, pairs, n_fpad) = min(enc_results.items(), key=lambda kv: kv[1][0])
    print(f"[dedup-cw {args.config}] best fb={fb} ({enc_s*1e3:.0f} ms)", flush=True)
    maps_all = tuple(jnp.concatenate(ms, axis=0) for ms in zip(*pairs))
    sync(maps_all)

    for cw in args.cw:
        pad_to = math.ceil(nw / cw) * cw
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad_to - nw, axis=0)], axis=0)
        widx = [jnp.asarray(idx_p[c0:c0 + cw].reshape(-1))
                for c0 in range(0, pad_to, cw)]
        sync(widx)
        head = dedup.head_for(*src_hw, np.float16)

        def run_heads():
            outs = [head(variables, w, *maps_all) for w in widx]
            sync(outs[-1])

        try:
            run_heads()
        except Exception as e:
            print(f"[dedup-cw {args.config}] cw={cw}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        t0 = time.time()
        for _ in range(args.reps):
            run_heads()
        head_s = (time.time() - t0) / args.reps
        clip_s = enc_s + head_s
        print(f"[dedup-cw {args.config}] cw={cw}: heads {head_s*1e3:.0f} ms "
              f"({pad_to} windows) -> clip {clip_s*1e3:.0f} ms = "
              f"{n/clip_s:.1f} frames/s effective", flush=True)


if __name__ == "__main__":
    main()
