#!/usr/bin/env python
"""Benchmark: sliding-window video-depth throughput on one chip.

Measures the serving hot path (endodav.infer_video_depth counterpart,
SURVEY.md §3.2) end-to-end: uint8 upload, device keep-aspect resize,
batched window forward, full-res upsample, device stitch, float16
device->host transfer of the stitched video.

HEADLINE (the BASELINE.json metric): the 518 px configuration —
512x640 source frames, keep-aspect lower_bound to 518x644 model input
(the reference's commented-out high-res path, endodav.py:162-180; run
without ResBottleneck blocks because the reference hardcodes their
(224,280) patch grid, backbones/layers/block.py:71-73, so its own 518
path is incompatible with them — matching scripts/train_video.sh's
--disable_residual_block config).

`vs_baseline` is the speedup over the reference's *sequential* window
schedule executed on the same chip (window-at-a-time with a synchronous
f32 output copy per window — a faithful emulation of endodav.py:193-208),
i.e. the measured gain of the TPU-first redesign on identical hardware.

stdout carries exactly ONE JSON line (the 518 px headline); the
224x280 reference-default config, compute-only fps, and the MFU
estimate print to stderr and feed PERFORMANCE.md.
"""

import json
import sys
import time

import numpy as np

V5E_PEAK_BF16 = 197e12  # TPU v5e: 197 TFLOP/s bf16 (394 TOPS int8)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def median_of(fn, n=5):
    """Median of n timed runs — the dev tunnel's transfer rate drifts,
    and a median is reproducible across driver invocations where a
    min/single-shot is not (round-2 VERDICT item 6)."""
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    times.sort()
    return times[n // 2], times


def measure_transfer_rates(n_mb: int = 16):
    """Measured H2D/D2H MB/s at bench time, recorded next to the e2e
    number so tunnel-bound results are reproducible-in-context."""
    import jax
    import jax.numpy as jnp

    from endodav_tpu.utils.devsync import device_sync

    # warm both directions first: the process's first transfer each way
    # pays lazy runtime setup (observed: a first-D2H stall that read as
    # 0.0 MB/s while the e2e run right after sustained ~30 MB/s).
    warm = jax.device_put(np.zeros((1 << 20,), np.uint8))
    np.asarray(warm + 1)
    host = np.random.default_rng(0).integers(0, 255, (n_mb, 1 << 20), dtype=np.uint8)
    t0 = time.time()
    dev = jax.device_put(host)
    device_sync(dev)  # block_until_ready can return early on this tunnel
    h2d = n_mb / (time.time() - t0)
    dev = dev + 1  # distinct buffer so the copy is not elided
    dev.block_until_ready()
    t0 = time.time()
    np.asarray(dev)
    d2h = n_mb / (time.time() - t0)
    return round(h2d, 1), round(d2h, 1)


def bench_config(name, *, src_hw, image_shape, n_frames, chunk_windows,
                 residual_blocks, measure_sequential=True):
    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval import video_inference as vi
    from endodav_tpu.models import EndoDAV

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, *src_hw, 3), dtype=np.uint8)

    # production serving config: dvlora weights with the adapters folded
    # into the base kernels (--merge_lora; exact — models/lora.py), so the
    # forward carries no adapter matmuls (measured 6% of the chunk)
    from endodav_tpu.models.endodav import _endodav_lora_alpha
    from endodav_tpu.models.lora import merge_lora_params

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

    # weights travel as jit ARGUMENTS (variables=), not closure constants:
    # a closed-over param set lowers as inline HLO constants that every
    # compile ships to the remote-compile service (engine.py note)
    def fwd(v, win):
        return model.apply(v, win)[("disp", 0)]

    # unique-frame dedup serving (video_inference.DedupWindowForward):
    # encode each source frame ONCE, gather taps per window — exact, and
    # skips the ~31% of trunk FLOPs the sliding window's OVERLAP
    # keyframe-carry re-encodes.  Resolution-aware default (dedup_wins):
    # on at 518px, off at 224x280; ENDODAV_DEDUP=1 / ENDODAV_NO_DEDUP=1
    # force either leg for A/B.
    dedup = None
    if vi.dedup_by_default(image_shape):
        dedup = vi.dedup_window_forward(model, variables)

    def run_fast():
        return vi.infer_video_depth(fwd, frames, image_shape=image_shape,
                                    chunk_windows=chunk_windows,
                                    transfer_dtype=np.float16, stitch="device",
                                    variables=variables, dedup=dedup)

    def run_reference():
        return vi.infer_video_depth(fwd, frames, image_shape=image_shape,
                                    chunk_windows=1, transfer_dtype=np.float32,
                                    stitch="host", sequential=True,
                                    variables=variables)

    log(f"[{name}] compiling batched path...")
    run_fast()
    batched_s, all_times = median_of(run_fast, n=5)
    fps = n_frames / batched_s
    result = {"fps_e2e": fps, "seconds": batched_s}
    log(f"[{name}] end-to-end: {fps:.2f} frames/s median "
        f"(5 runs: {', '.join(f'{t:.2f}s' for t in all_times)})")

    if measure_sequential:
        log(f"[{name}] compiling sequential-emulation path...")
        run_reference()
        sequential_s, _ = median_of(run_reference, n=3)
        result["vs_sequential"] = sequential_s / batched_s
        log(f"[{name}] sequential emulation: {n_frames/sequential_s:.2f} frames/s "
            f"-> redesign speedup {result['vs_sequential']:.3f}x")

    # ---- compute-only fps + MFU on a device-resident window chunk
    th, tw = vi.keep_aspect_size(*src_hw, *image_shape)
    win = jnp.asarray(
        rng.uniform(0, 1, (chunk_windows, 32, th, tw, 3)).astype(np.float32))
    run_v = vi._chunk_fn(fwd, chunk_windows, th, tw, *src_hw, np.float16,
                         with_variables=True)
    from endodav_tpu.utils.devsync import device_sync

    run = lambda w: run_v(variables, w)  # noqa: E731
    out = run(win)
    device_sync(out)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = run(win)
    device_sync(out)
    per_chunk = (time.time() - t0) / reps
    frames_per_chunk = chunk_windows * 32
    result["fps_compute"] = frames_per_chunk / per_chunk

    try:
        cost = run_v.lower(variables, win).compile().cost_analysis()
        flops_chunk = float(cost["flops"]) if cost and "flops" in cost else None
    except Exception as e:  # remote-compile backends may not expose it
        log(f"[{name}] cost_analysis unavailable ({type(e).__name__}); using analytic estimate")
        flops_chunk = None
    if flops_chunk is None:
        # analytic ViT-S estimate (per frame): 12 blocks of 24*N*C^2 + 4*N^2*C
        n_tok = (image_shape[0] // 14) * (image_shape[1] // 14) + 1
        c = 384
        flops_frame = 12 * (24 * n_tok * c * c + 4 * n_tok * n_tok * c) * 1.35  # +~35% decoder/motion
        flops_chunk = flops_frame * frames_per_chunk
        result["flops_source"] = "analytic"
    else:
        result["flops_source"] = "xla_cost_analysis"
    result["gflops_per_frame"] = flops_chunk / frames_per_chunk / 1e9
    result["mfu_compute"] = (flops_chunk / per_chunk) / V5E_PEAK_BF16
    log(f"[{name}] compute-only: {result['fps_compute']:.1f} frames/s, "
        f"{result['gflops_per_frame']:.1f} GFLOP/frame ({result['flops_source']}), "
        f"MFU {100*result['mfu_compute']:.1f}% of v5e bf16 peak")

    if dedup is not None:
        # device-resident dedup pipeline: unique-frame encodes + per-window
        # heads (the stitch and transfers excluded, same contract as the
        # window-forward compute column above)
        import math

        idx = vi.window_indices(n_frames)
        nw = idx.shape[0]
        fb = dedup.encode_batch_for(n_frames)
        n_fpad = math.ceil(n_frames / fb) * fb
        # pre-stage the encode batches and gather indices on device so the
        # timed loop measures device work, not per-dispatch relay hops
        # (~20 ms each through this environment's tunnel).  The last
        # chunk is TRIMMED to the window remainder, exactly like the
        # shipped driver (infer_video_depth) — padding it re-ran up to
        # cw-1 dummy windows (25% of the 186-frame clip's head work at
        # cw=4) and under-reported the pipeline the users actually get.
        batches = [jnp.asarray(rng.uniform(0, 1, (fb, th, tw, 3)).astype(np.float32))
                   for _ in range(n_fpad // fb)]
        widx_dev = [jnp.asarray(idx[c0:c0 + chunk_windows].reshape(-1))
                    for c0 in range(0, nw, chunk_windows)]
        device_sync([batches, widx_dev])
        head = dedup.head_for(*src_hw, np.float16)

        def run_dedup():
            parts = [dedup.encode(variables, batch) for batch in batches]
            maps_all = tuple(ms[0] if len(ms) == 1 else jnp.concatenate(ms, axis=0)
                             for ms in zip(*parts))
            outs = [head(variables, w, *maps_all) for w in widx_dev]
            device_sync(outs[-1])
            return maps_all

        maps_all = run_dedup()
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            run_dedup()
        per_clip = (time.time() - t0) / reps
        result["fps_compute_dedup"] = n_frames / per_clip
        # same-units comparison: the window path (which pads windows to
        # full chunks) runs pad_to*32 slots at
        # fps_compute slots/s for this clip
        pad_to = math.ceil(nw / chunk_windows) * chunk_windows
        win_eff = n_frames / (pad_to * 32 / result["fps_compute"])
        result["fps_compute_window_effective"] = win_eff

        # honest MFU: FLOPs of the DEFAULT (dedup) pipeline over source
        # frames — the slot-path MFU counts the ~25-31% of trunk work the
        # dedup pipeline proves redundant (round-3 VERDICT weak #3)
        try:
            enc_flops = float(dedup._encode_c.lower(variables, batches[0])
                              .compile().cost_analysis()["flops"])
            hd_args = (variables, widx_dev[0], *maps_all)
            head_flops = float(head.lower(*hd_args)
                               .compile().cost_analysis()["flops"])
            flops_clip = enc_flops * len(batches) + head_flops * len(widx_dev)
            result["mfu_compute_dedup"] = (flops_clip / per_clip) / V5E_PEAK_BF16
            result["gflops_per_frame_dedup"] = flops_clip / n_frames / 1e9
        except Exception as e:
            log(f"[{name}] dedup cost_analysis unavailable ({type(e).__name__})")
        log(f"[{name}] compute-only dedup (unique-frame encode): "
            f"{result['fps_compute_dedup']:.1f} frames/s for the {n_frames}-frame clip "
            f"({n_fpad} encodes vs {nw * 32} window slots; window path "
            f"effective {win_eff:.1f} frames/s"
            + (f"; MFU {100*result['mfu_compute_dedup']:.1f}% at "
               f"{result['gflops_per_frame_dedup']:.1f} GFLOP/source-frame"
               if "mfu_compute_dedup" in result else "") + ")")
    return result


def main():
    # Fail fast if the TPU tunnel is down: backend init on a dead tunnel
    # blocks ~25+ minutes before raising (observed during an axon
    # outage), which would eat the whole bench budget.  Probe in a
    # subprocess with a hard timeout so the failure is quick and loud.
    import subprocess

    for attempt in range(3):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=600)
            if probe.returncode == 0:
                break
            log(f"[env] TPU backend init FAILED (attempt {attempt + 1}/3, "
                "tunnel down?):\n" + probe.stderr[-800:])
        except subprocess.TimeoutExpired:
            log(f"[env] TPU backend init timed out after 600 s "
                f"(attempt {attempt + 1}/3) — tunnel down")
        if attempt == 2:
            log("[env] aborting bench instead of hanging")
            sys.exit(3)
        time.sleep(60)  # transient blips recover fast; real outages don't

    # headline: 518 px (BASELINE.json metric).  chunk_windows=4 is the
    # measured per-slot throughput optimum on v5e (222/244/280/241 fps
    # at cw=2/3/4/5; 6+ OOM).  NOTE: 186 frames -> 9 windows (starts
    # range(0, 186, 22)) -> padded to 12 at cw=4; the dedup default
    # makes the padding cheap (3 duplicate HEAD chunks, no re-encodes),
    # and tools/bench_dedup_cw.py sweeps cw/fb for the dedup pipeline.
    h2d, d2h = measure_transfer_rates()
    log(f"[env] measured transfer rates: H2D {h2d} MB/s, D2H {d2h} MB/s")
    headline = bench_config(
        "518px", src_hw=(512, 640), image_shape=(518, 644), n_frames=186,
        chunk_windows=4, residual_blocks=())
    # secondary: the reference-default 224x280 training/eval resolution
    secondary = bench_config(
        "224x280", src_hw=(256, 320), image_shape=(224, 280), n_frames=110,
        chunk_windows=5, residual_blocks=(2, 5, 8, 11))
    log(f"[224x280] summary: {json.dumps({k: round(v, 3) if isinstance(v, float) else v for k, v in secondary.items()})}")

    # fps_compute / mfu_compute are SOURCE-FRAME rates through the
    # default (dedup) pipeline — the honest per-chip throughput; the
    # window slot-path numbers stay as *_slots for cross-round
    # comparability (round-3 VERDICT weak #3 / task 3).
    fps_c = headline.get("fps_compute_dedup", headline["fps_compute"])
    mfu_c = headline.get("mfu_compute_dedup", headline["mfu_compute"])
    print(json.dumps({
        "metric": "video_depth_frames_per_sec_per_chip_518px",
        "value": round(headline["fps_e2e"], 2),
        "unit": "frames/s",
        "vs_baseline": round(headline["vs_sequential"], 3),
        # the e2e value is bounded by this environment's ~30 MB/s
        # device<->host tunnel (PERFORMANCE.md); compute fps/MFU is the
        # production-host rate
        "fps_compute": round(fps_c, 1),
        "mfu_compute": round(mfu_c, 3),
        "fps_compute_slots": round(headline["fps_compute"], 1),
        "mfu_compute_slots": round(headline["mfu_compute"], 3),
        **({"gflops_per_source_frame": round(headline["gflops_per_frame_dedup"], 1)}
           if "gflops_per_frame_dedup" in headline else {}),
        "tunnel_h2d_mbps": h2d,
        "tunnel_d2h_mbps": d2h,
    }))


if __name__ == "__main__":
    main()
