"""Streaming inference == offline infer_video_depth, bounded memory.

The DepthStreamer must reproduce the offline sliding-window program
(eval/video_inference.py, itself parity-tested against the reference's
endodav.py:162-254 loop) frame-for-frame for every stream length —
including the keyframe-carry recurrence, the sequential scale/shift
stitch, and the end-of-stream clamp padding.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from endodav_tpu.eval.streaming import DepthStreamer
from endodav_tpu.eval.video_inference import infer_video_depth

SRC_HW = (64, 80)
IMAGE_SHAPE = (56, 70)  # keep_aspect of 64x80 -> (56, 70)


def _fake_forward(win):
    """Stands in for EndoDAV: [C, T, th, tw, 3] -> [C*T, h', w', 1] with
    content- AND slot-position-dependent output (so a stitch/alignment
    slip shifts values and fails the comparison)."""
    c, t = win.shape[:2]
    x = win[:, :, ::7, ::7, :]
    d = jnp.tanh(x[..., 0] * 1.7 + x[..., 1] - 0.3 * x[..., 2])
    d = d * (1.0 + 0.1 * jnp.arange(t, dtype=d.dtype)[None, :, None, None])
    d = d * 0.5 + 0.5
    return d.reshape(c * t, d.shape[2], d.shape[3], 1)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, *SRC_HW, 3), dtype=np.uint8)


@pytest.mark.parametrize("n", [5, 32, 33, 54, 76, 110])
def test_streaming_matches_offline(n):
    frames = _frames(n)
    ref = infer_video_depth(
        _fake_forward, frames, image_shape=IMAGE_SHAPE, chunk_windows=2, stitch="host"
    )

    streamer = DepthStreamer(_fake_forward, image_shape=IMAGE_SHAPE)
    out, max_buf = [], 0
    for f in frames:
        out.extend(streamer.push(f))
        max_buf = max(max_buf, streamer.frames_buffered)
    out.extend(streamer.flush())

    got = np.stack(out, axis=0)
    assert got.shape == ref.shape == (n, *SRC_HW)
    # per-window device resize vs the offline whole-video resize reorders
    # f32 reductions; the scale/shift fit amplifies that to ~2.5e-5
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert max_buf <= 64  # constant-memory: < 2*INFER_LEN source frames held


def test_streaming_float_255_frames_match_offline():
    """Float frames in [0, 255] (cv2-decode-then-cast pattern) must hit
    the same /255 normalization the offline path applies via its
    max() > 1.5 heuristic (video_inference.py:300)."""
    frames = _frames(40).astype(np.float32)
    ref = infer_video_depth(
        _fake_forward, frames, image_shape=IMAGE_SHAPE, chunk_windows=2, stitch="host"
    )
    streamer = DepthStreamer(_fake_forward, image_shape=IMAGE_SHAPE)
    out = []
    for f in frames:
        out.extend(streamer.push(f))
    out.extend(streamer.flush())
    np.testing.assert_allclose(np.stack(out, axis=0), ref, atol=1e-4, rtol=1e-4)


def test_streaming_finality_cadence():
    """Window k finalizes step frames the moment source frame
    step*k + INFER_LEN - 1 arrives; nothing already emitted changes."""
    frames = _frames(76, seed=1)
    streamer = DepthStreamer(_fake_forward, image_shape=IMAGE_SHAPE)
    emitted_at = {}
    total = 0
    for i, f in enumerate(frames):
        new = streamer.push(f)
        if new:
            emitted_at[i] = len(new)
            total += len(new)
    tail = streamer.flush()
    # windows fire at pushes 31 and 53 and 75 (step=22, INFER_LEN=32)
    assert sorted(emitted_at) == [31, 53, 75]
    assert emitted_at[31] == 24  # INFER_LEN - INTERP_LEN
    assert emitted_at[53] == 22 and emitted_at[75] == 22
    assert total + len(tail) == 76


def test_streaming_guards():
    streamer = DepthStreamer(_fake_forward, image_shape=IMAGE_SHAPE)
    assert streamer.flush() == []
    with pytest.raises(AssertionError):
        streamer.push(_frames(1)[0])  # push after flush


@pytest.mark.parametrize("n", [33, 54])
def test_streaming_dedup_matches_offline(n):
    """Dedup streaming (per-frame encode at push + per-window temporal
    head) must reproduce the offline pipeline exactly: the trunk is
    strictly per-frame, so moving encodes to arrival time changes
    nothing but the schedule."""
    import jax

    from endodav_tpu.eval.video_inference import dedup_window_forward
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 28, 28, 3)))
    frames = np.random.default_rng(7).integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)

    def fwd(win):
        return m.apply(v, win)[("disp", 0)]

    ref = infer_video_depth(fwd, frames, image_shape=(28, 28),
                            chunk_windows=2, stitch="host")

    dd = dedup_window_forward(m, v)
    streamer = DepthStreamer(fwd, image_shape=(28, 28), dedup=dd)
    out, max_buf = [], 0
    for f in frames:
        out.extend(streamer.push(f))
        max_buf = max(max_buf, streamer.frames_buffered)
    out.extend(streamer.flush())

    got = np.stack(out, axis=0)
    assert got.shape == ref.shape == (n, 32, 32)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert max_buf <= 64  # constant memory: taps buffered, not re-encoded


def test_streaming_dedup_requires_variables():
    from endodav_tpu.eval.video_inference import dedup_window_forward
    from endodav_tpu.models.endodav import EndoDAV

    m = EndoDAV(image_shape=(28, 28), num_frames=32)
    dd = dedup_window_forward(m, None)
    with pytest.raises(ValueError, match="variables"):
        DepthStreamer(lambda w: w, image_shape=(28, 28), dedup=dd)
