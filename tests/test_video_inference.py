"""Parity test: batched windowed inference == reference sequential loop.

We simulate the reference algorithm (endodav.py:186-254) step by step with
a deterministic toy "model" whose per-frame output depends on the whole
window (so keyframe carry-over matters), and check our batched
window-index + stitch pipeline produces identical results.
"""

import numpy as np

import jax.numpy as jnp

from endodav_tpu.eval import metrics
from endodav_tpu.eval.video_inference import infer_video_depth, keep_aspect_size, window_indices
from endodav_tpu.models.endodav import INFER_LEN, INTERP_LEN, KEYFRAMES, OVERLAP

RNG = np.random.default_rng(42)


def toy_model_disp(window):
    """[T, H, W] window -> [T, H, W] 'disparity': frame + 0.01 * window mean.

    Depends on all frames in the window => sensitive to keyframe carry.
    """
    return 0.5 * window + 0.01 * window.mean() + 0.05


def reference_sequential(frames):
    """Literal simulation of the reference windowed loop + stitch."""
    n = len(frames)
    step = INFER_LEN - OVERLAP
    append_len = (step - (n % step)) % step + (INFER_LEN - step)
    frame_list = list(frames) + [frames[-1].copy()] * append_len

    depth_list = []
    pre_input = None
    for frame_id in range(0, n, step):
        cur = np.stack([frame_list[frame_id + i] for i in range(INFER_LEN)], axis=0)
        if pre_input is not None:
            cur[:OVERLAP] = pre_input[list(KEYFRAMES)]
        depth = toy_model_disp(cur)
        depth_list += [depth[i] for i in range(INFER_LEN)]
        pre_input = cur

    aligned = []
    align_len = OVERLAP - INTERP_LEN
    for frame_id in range(0, len(depth_list), INFER_LEN):
        if not aligned:
            aligned += depth_list[:INFER_LEN]
        else:
            pre = aligned[-INTERP_LEN:]
            post = depth_list[frame_id + align_len : frame_id + OVERLAP]
            s, t = metrics.compute_scale_and_shift(np.concatenate(post), np.concatenate(pre))
            post = [np.maximum(p * s + t, 0) for p in post]
            aligned[-INTERP_LEN:] = metrics.interpolate_frames(pre, post)
            for i in range(OVERLAP, INFER_LEN):
                aligned.append(np.maximum(depth_list[frame_id + i] * s + t, 0))
    return np.stack(aligned[:n], axis=0)


def test_window_indices_recurrence():
    n = 80
    idx = window_indices(n)
    step = INFER_LEN - OVERLAP
    assert idx.shape == (len(range(0, n, step)), INFER_LEN)
    # window 0 reads [0..31]
    np.testing.assert_array_equal(idx[0], np.clip(np.arange(INFER_LEN), 0, n - 1))
    # window 1 slots 0..9 replay window 0's KEYFRAMES
    np.testing.assert_array_equal(idx[1, :OVERLAP], idx[0, list(KEYFRAMES)])
    np.testing.assert_array_equal(idx[1, OVERLAP:], np.clip(np.arange(step, step + INFER_LEN)[OVERLAP:], 0, n - 1))


def test_batched_inference_matches_reference_loop():
    n, h, w = 60, 6, 8
    frames = RNG.uniform(0.1, 1.0, (n, h, w)).astype(np.float32)
    want = reference_sequential(frames)

    idx = window_indices(n)
    windows = frames[idx]  # [W, T, h, w]
    disp = np.stack([toy_model_disp(windows[i]) for i in range(idx.shape[0])], axis=0)

    from endodav_tpu.eval.video_inference import _stitch

    got = _stitch(disp, n)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_keep_aspect_size_scared():
    # SCARED full-res 1024x1280 -> exactly the model-internal 224x280
    assert keep_aspect_size(1024, 1280, 224, 280) == (224, 280)
    # a 16:9 input lower-bounds to >= target then rounds to multiple of 14
    th, tw = keep_aspect_size(720, 1280, 224, 280)
    assert th >= 224 and tw >= 280 and th % 14 == 0 and tw % 14 == 0


def test_infer_video_depth_end_to_end_shapes():
    n, h, w = 45, 28, 42
    frames = (RNG.uniform(0, 1, (n, h, w, 3)) * 255).astype(np.uint8)

    def fwd(win):  # [C, T, h', w', 3] -> [C*T, h', w', 1]
        c, t = win.shape[0], win.shape[1]
        return win.mean(axis=-1, keepdims=True).reshape(c * t, *win.shape[2:4], 1) * 0.5 + 0.1

    out = infer_video_depth(fwd, frames, image_shape=(28, 42), chunk_windows=2)
    assert out.shape == (n, h, w)
    assert np.isfinite(out).all()


def test_device_stitch_matches_host_stitch():
    n, h, w = 60, 10, 12
    frames = RNG.uniform(0.1, 1.0, (n, h, w, 3)).astype(np.float32)

    def fwd(win):  # positive outputs -> clamp never binds -> exact match
        c, t = win.shape[0], win.shape[1]
        return (win.mean(axis=-1, keepdims=True) * 0.5 + 0.1 + 0.01 * win.mean()).reshape(
            c * t, *win.shape[2:4], 1
        )

    host = infer_video_depth(fwd, frames, image_shape=(h, w), chunk_windows=2, stitch="host")
    dev = infer_video_depth(fwd, frames, image_shape=(h, w), chunk_windows=2, stitch="device")
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-5)


def test_multichip_window_sharding():
    """Windows shard over a 'data' mesh; results match single-device."""
    import jax
    from jax.sharding import Mesh

    n, h, w = 60, 10, 12
    frames = RNG.uniform(0.1, 1.0, (n, h, w, 3)).astype(np.float32)

    def fwd(win):
        c, t = win.shape[0], win.shape[1]
        per_window_mean = win.mean(axis=(1, 2, 3, 4))[:, None, None, None, None]
        out = win.mean(axis=-1, keepdims=True) * 0.5 + 0.1 + 0.01 * per_window_mean
        return out.reshape(c * t, win.shape[2], win.shape[3], 1)

    single = infer_video_depth(fwd, frames, image_shape=(h, w), chunk_windows=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharded = infer_video_depth(fwd, frames, image_shape=(h, w), chunk_windows=4, mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_fn_cache_is_per_closure_object():
    """Jit caches must key on the closure OBJECT (weakly), never id():
    ids recycle after GC, which could bind a new model to a stale jitted
    fn (VERDICT round-1 weak #4)."""
    import gc

    from endodav_tpu.eval.video_inference import _fn_cache

    def make(bias):
        def fwd(x):
            return x + bias

        return fwd

    f1 = make(1.0)
    c1 = _fn_cache(f1)
    c1[("shape",)] = "compiled-for-f1"
    assert _fn_cache(f1) is c1
    del f1
    gc.collect()
    # a fresh closure (possibly reusing the old id) must get a FRESH cache
    f2 = make(2.0)
    assert ("shape",) not in _fn_cache(f2)


def test_two_models_do_not_collide_in_cache():
    """Functional check: two successively created forwards with identical
    shapes produce their own outputs (no stale-cache crosstalk)."""
    import gc

    import jax.numpy as jnp
    import numpy as np

    from endodav_tpu.eval.video_inference import infer_video_depth_single_frame

    frames = np.random.default_rng(0).uniform(0, 1, (4, 16, 20, 3)).astype(np.float32)

    def make_const(c):
        def fwd(batch):
            return jnp.full(batch.shape[:1] + (8, 10, 1), c, batch.dtype)

        return fwd

    f1 = make_const(0.25)
    out1 = infer_video_depth_single_frame(f1, frames, batch_size=2)
    del f1
    gc.collect()
    f2 = make_const(0.75)
    out2 = infer_video_depth_single_frame(f2, frames, batch_size=2)
    np.testing.assert_allclose(out1, 0.25, atol=1e-6)
    np.testing.assert_allclose(out2, 0.75, atol=1e-6)


def test_single_frame_respects_precompiled_forward():
    """A forward marked `precompiled` (split-compiled / mesh-jitted by
    the engine) must run EAGERLY per batch — wrapping it in an outer jit
    would re-fuse the separately-compiled pieces into one whole-model
    compile (the >40-min vitl case the marker exists to avoid)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from endodav_tpu.eval.video_inference import infer_video_depth_single_frame

    calls = []

    @jax.jit
    def _inner(batch):
        return jnp.mean(batch, axis=-1, keepdims=True)[:, :8, :10, :]

    def fwd(batch):
        calls.append(1)  # python side effect: runs once PER BATCH if eager
        return _inner(batch)

    fwd.precompiled = True
    frames = np.random.default_rng(0).uniform(0, 1, (8, 16, 20, 3)).astype(np.float32)
    out = infer_video_depth_single_frame(fwd, frames, batch_size=2)
    assert out.shape == (8, 16, 20)
    assert len(calls) == 4  # 8 frames / batch 2 — an outer jit would give 1


def test_variables_threading_no_retrace_across_weight_updates():
    """The epoch-eval path: ONE stable forward + per-call `variables`
    must (a) trace the chunk pipeline exactly once across weight
    updates and (b) actually use the new weights (a closure-captured
    variables tree would silently serve epoch-1 weights forever)."""
    n, h, w = 45, 12, 14
    frames = RNG.uniform(0.1, 1.0, (n, h, w, 3)).astype(np.float32)
    traces = []

    def fwd(variables, win):
        traces.append(1)  # python side effect: runs once per trace only
        c, t = win.shape[0], win.shape[1]
        base = win.mean(axis=-1, keepdims=True).reshape(c * t, *win.shape[2:4], 1)
        return base * variables["scale"] + variables["shift"]

    v1 = {"scale": jnp.float32(0.5), "shift": jnp.float32(0.1)}
    v2 = {"scale": jnp.float32(0.25), "shift": jnp.float32(0.3)}
    out1 = infer_video_depth(fwd, frames, image_shape=(h, w), chunk_windows=2,
                             variables=v1)
    n_traces_first = len(traces)
    out2 = infer_video_depth(fwd, frames, image_shape=(h, w), chunk_windows=2,
                             variables=v2)
    assert len(traces) == n_traces_first, "second eval retraced the pipeline"
    # out = base*s + t, so out2 must reflect v2, not v1
    base = (out1 - 0.1) / 0.5
    np.testing.assert_allclose(out2, base * 0.25 + 0.3, rtol=1e-4, atol=1e-5)


def test_split_compile_matches_whole_model(monkeypatch):
    """ENDODAV_SPLIT_COMPILE=1 (engine.depth_window_forward) composes
    separately-jitted EndoDAV.encode/decode; output must be bit-identical
    to the whole-model jit through the full chunk pipeline."""
    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval import engine
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 28, 28, 3)))
    frames = np.random.default_rng(1).integers(0, 255, (40, 32, 32, 3), dtype=np.uint8)

    monkeypatch.delenv("ENDODAV_SPLIT_COMPILE", raising=False)
    whole = infer_video_depth(engine.depth_window_forward(m, v, "endodav"),
                              frames, image_shape=(28, 28), chunk_windows=2)
    monkeypatch.setenv("ENDODAV_SPLIT_COMPILE", "1")
    fwd = engine.depth_window_forward(m, v, "endodav")
    assert getattr(fwd, "precompiled", False)
    split = infer_video_depth(fwd, frames, image_shape=(28, 28), chunk_windows=2)
    np.testing.assert_allclose(split, whole, atol=1e-6)


def test_scan_trunk_matches_whole_model(monkeypatch):
    """ENDODAV_SCAN_TRUNK=1 runs uniform ViT block runs as lax.scan over
    stacked per-layer params (one compiled block body instead of `depth`
    inlined copies — the vitl compile-size fix); the full chunk pipeline
    must match the whole-model jit."""
    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval import engine
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 28, 28, 3)))
    frames = np.random.default_rng(2).integers(0, 255, (40, 32, 32, 3), dtype=np.uint8)

    monkeypatch.delenv("ENDODAV_SPLIT_COMPILE", raising=False)
    monkeypatch.delenv("ENDODAV_SCAN_TRUNK", raising=False)
    whole = infer_video_depth(engine.depth_window_forward(m, v, "endodav"),
                              frames, image_shape=(28, 28), chunk_windows=2)
    monkeypatch.setenv("ENDODAV_SCAN_TRUNK", "1")
    fwd = engine.depth_window_forward(m, v, "endodav")
    assert getattr(fwd, "precompiled", False)
    scan = infer_video_depth(fwd, frames, image_shape=(28, 28), chunk_windows=2)
    np.testing.assert_allclose(scan, whole, atol=1e-5)


def test_dedup_matches_whole_model(monkeypatch):
    """ENDODAV_DEDUP=1 (engine.depth_window_forward) encodes each unique
    source frame ONCE and gathers taps per window instead of re-encoding
    the OVERLAP keyframe-carried slots (video_inference.DedupWindowForward).
    The trunk is strictly per-frame, so both host- and device-stitch
    outputs must match the whole-model window pipeline."""
    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval import engine
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 28, 28, 3)))
    frames = np.random.default_rng(3).integers(0, 255, (40, 32, 32, 3), dtype=np.uint8)

    for name in ("ENDODAV_SPLIT_COMPILE", "ENDODAV_SCAN_TRUNK",
                 "ENDODAV_DEDUP", "ENDODAV_NO_DEDUP"):
        monkeypatch.delenv(name, raising=False)
    monkeypatch.setenv("ENDODAV_NO_DEDUP", "1")  # baseline leg
    base_fwd = engine.depth_window_forward(m, v, "endodav")
    assert base_fwd.dedup is None
    whole = infer_video_depth(base_fwd.vw_fn, frames, image_shape=(28, 28),
                              chunk_windows=2, variables=base_fwd.bound_variables)

    monkeypatch.delenv("ENDODAV_NO_DEDUP")
    # tiny test shapes sit under the resolution gate; force dedup on
    monkeypatch.setenv("ENDODAV_DEDUP", "1")
    fwd = engine.depth_window_forward(m, v, "endodav")
    assert fwd.dedup is not None
    dd = infer_video_depth(fwd.vw_fn, frames, image_shape=(28, 28),
                           chunk_windows=2, variables=fwd.bound_variables,
                           dedup=fwd.dedup)
    np.testing.assert_allclose(dd, whole, atol=1e-5)

    dd_dev = infer_video_depth(fwd.vw_fn, frames, image_shape=(28, 28),
                               chunk_windows=2, variables=fwd.bound_variables,
                               dedup=fwd.dedup, stitch="device")
    np.testing.assert_allclose(dd_dev, whole, atol=2e-3)

    # ENDODAV_NO_DEDUP is the opt-out even when a dedup object is passed
    monkeypatch.setenv("ENDODAV_NO_DEDUP", "1")
    off = infer_video_depth(fwd.vw_fn, frames, image_shape=(28, 28),
                            chunk_windows=2, variables=fwd.bound_variables,
                            dedup=fwd.dedup)
    np.testing.assert_allclose(off, whole, atol=0)


def test_dedup_scan_trunk_matches_whole_model(monkeypatch):
    """Dedup composes with the scan-over-layers trunk (the vitl serving
    config): ENDODAV_DEDUP=1 + ENDODAV_SCAN_TRUNK=1 must still match the
    plain whole-model pipeline."""
    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval import engine
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 28, 28, 3)))
    frames = np.random.default_rng(4).integers(0, 255, (40, 32, 32, 3), dtype=np.uint8)

    for name in ("ENDODAV_SPLIT_COMPILE", "ENDODAV_SCAN_TRUNK",
                 "ENDODAV_DEDUP", "ENDODAV_NO_DEDUP"):
        monkeypatch.delenv(name, raising=False)
    base_fwd = engine.depth_window_forward(m, v, "endodav")
    whole = infer_video_depth(base_fwd.vw_fn, frames, image_shape=(28, 28),
                              chunk_windows=2, variables=base_fwd.bound_variables)

    monkeypatch.setenv("ENDODAV_DEDUP", "1")
    monkeypatch.setenv("ENDODAV_SCAN_TRUNK", "1")
    fwd = engine.depth_window_forward(m, v, "endodav")
    assert getattr(fwd, "precompiled", False) and fwd.dedup is not None
    dd = infer_video_depth(fwd, frames, image_shape=(28, 28),
                           chunk_windows=2, dedup=fwd.dedup)
    np.testing.assert_allclose(dd, whole, atol=1e-5)


def test_dedup_short_clip_no_retrace_across_weight_updates():
    """Dedup pipeline contract: (a) exact on a short clip (n < INFER_LEN
    exercises the clamp padding), (b) ONE trace serves different weight
    trees (variables are jit ARGUMENTS — the trainer's per-epoch eval
    relies on this), (c) the new weights are actually used."""
    import jax
    import jax.numpy as jnp

    from endodav_tpu.eval.video_inference import dedup_window_forward
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    v1 = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 28, 28, 3)))
    v2 = jax.jit(m.init)(jax.random.PRNGKey(9), jnp.zeros((1, 32, 28, 28, 3)))
    frames = np.random.default_rng(11).integers(0, 255, (5, 32, 32, 3), dtype=np.uint8)

    def vw(v, win):
        return m.apply(v, win)[("disp", 0)]

    dd = dedup_window_forward(m)
    out1 = infer_video_depth(vw, frames, image_shape=(28, 28), chunk_windows=2,
                             variables=v1, dedup=dd)
    ref1 = infer_video_depth(vw, frames, image_shape=(28, 28), chunk_windows=2,
                             variables=v1)
    np.testing.assert_allclose(out1, ref1, atol=1e-5)

    out2 = infer_video_depth(vw, frames, image_shape=(28, 28), chunk_windows=2,
                             variables=v2, dedup=dd)
    ref2 = infer_video_depth(vw, frames, image_shape=(28, 28), chunk_windows=2,
                             variables=v2)
    np.testing.assert_allclose(out2, ref2, atol=1e-5)
    assert np.abs(out1 - out2).max() > 1e-6  # new weights actually served

    assert dd._encode_c._cache_size() == 1, "encode retraced on new weights"
    (head,) = dd._head_cache.values()
    assert head._cache_size() == 1, "head retraced on new weights"


def test_dedup_resolution_default(monkeypatch):
    """The dedup default is resolution-aware (device sweeps,
    PERFORMANCE.md "Dedup"): on for token-heavy trunk inputs (518x644),
    off at the reference-default 224x280; both force flags override."""
    from endodav_tpu.eval.video_inference import dedup_by_default, dedup_wins

    for name in ("ENDODAV_DEDUP", "ENDODAV_NO_DEDUP"):
        monkeypatch.delenv(name, raising=False)
    assert dedup_wins((518, 644))
    assert not dedup_wins((224, 280))
    assert dedup_by_default((518, 644))
    assert not dedup_by_default((224, 280))
    monkeypatch.setenv("ENDODAV_DEDUP", "1")
    assert dedup_by_default((224, 280))
    monkeypatch.setenv("ENDODAV_NO_DEDUP", "1")  # NO_DEDUP wins over DEDUP
    assert not dedup_by_default((518, 644))
    assert not dedup_by_default((224, 280))


def test_prefix_map_shapes_match_decode_prefix():
    """The dedup pipeline's flat-boundary contract reshapes by
    `prefix_map_shapes` — pin the analytic shapes against the actual
    decode_prefix outputs (a drift here silently corrupts every gathered
    map)."""
    import jax

    from endodav_tpu.models.endodav import EndoDAV, prefix_map_shapes

    for image_shape in ((28, 28), (42, 70)):
        m = EndoDAV(image_shape=image_shape, num_frames=2)

        def fn(x):
            v = m.init(jax.random.PRNGKey(0), x)
            taps = m.apply(v, x, method="encode")
            return m.apply(v, taps, method="decode_prefix")

        maps = jax.eval_shape(fn, jax.ShapeDtypeStruct((1, 2, *image_shape, 3),
                                                       jnp.float32))
        got = tuple(mp.shape[1:] for mp in maps)
        assert got == prefix_map_shapes(m), (image_shape, got,
                                             prefix_map_shapes(m))


def test_dedup_taps_mode_matches_whole_model(monkeypatch):
    """ENDODAV_DEDUP_PREFIX=0 — the raw-taps boundary the pipeline
    auto-selects when the prefix maps outweigh the taps (vitl: 25.3 vs
    13.9 MB/frame, where the maps OOM'd a 186-frame clip) — must match
    the whole-model window pipeline like the prefix mode does."""
    import jax

    from endodav_tpu.eval import engine
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 28, 28, 3)))
    frames = np.random.default_rng(3).integers(0, 255, (40, 32, 32, 3),
                                               dtype=np.uint8)
    for name in ("ENDODAV_SPLIT_COMPILE", "ENDODAV_SCAN_TRUNK",
                 "ENDODAV_DEDUP", "ENDODAV_NO_DEDUP"):
        monkeypatch.delenv(name, raising=False)
    monkeypatch.setenv("ENDODAV_NO_DEDUP", "1")
    base_fwd = engine.depth_window_forward(m, v, "endodav")
    whole = infer_video_depth(base_fwd.vw_fn, frames, image_shape=(28, 28),
                              chunk_windows=2,
                              variables=base_fwd.bound_variables)

    monkeypatch.delenv("ENDODAV_NO_DEDUP")
    monkeypatch.setenv("ENDODAV_DEDUP", "1")
    monkeypatch.setenv("ENDODAV_DEDUP_PREFIX", "0")
    fwd = engine.depth_window_forward(m, v, "endodav")
    assert fwd.dedup is not None and not fwd.dedup.prefix_mode
    dd = infer_video_depth(fwd.vw_fn, frames, image_shape=(28, 28),
                           chunk_windows=2, variables=fwd.bound_variables,
                           dedup=fwd.dedup)
    np.testing.assert_allclose(dd, whole, atol=2e-4, rtol=2e-4)
