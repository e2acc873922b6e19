"""End-to-end model-graph parity against the reference's ACTUAL torch code.

The released checkpoint in the reference mount is truncated, so the
executable parity oracle is: build the reference model (unmodified code,
/root/reference/models) with RANDOMIZED weights, transfer its
state_dict through `torch_to_flax`, run both full graphs on the same
input, and require the disparity maps to match at f32 tolerance.  This
closes the converter key-name-drift risk end to end — every reference
parameter is randomized, so any dropped/mis-mapped tensor changes the
output.

Covers (VERDICT round-1 item 1):
  * endodav forward (models/endodav/endodav.py:150-160) in the flagship
    train config (dvlora + ResBottleneck + temporal LoRA) and graph
    variants (lora / ssb, disable_conv_head, inv/out_sigmoid),
  * endodac forward (models/endodac/endodac.py:244-257),
  * the full sliding-window `infer_video_depth` loop (:162-254) vs our
    batched re-design, including the cv2 preproc and the stitch.

The reference's ResBottleneck blocks hardcode the (224,280)/14 patch
grid (backbones/layers/block.py:71-73), so residual-block configs run at
full 224x280 (marked slow); variant configs shrink image_shape for speed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from endodav_tpu.utils.checkpoint import torch_to_flax  # noqa: E402
from refshim import import_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    endodav_file, endodac_file, encoders, decoders = import_reference()
    return {"endodav": endodav_file, "endodac": endodac_file,
            "encoders": encoders, "decoders": decoders}


def _randomize(module: "torch.nn.Module", seed: int) -> None:
    """Overwrite every float parameter (and BN stats) with random values
    so that any conversion drop/mis-map shows up in the output."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * 0.05)
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)


def _state_numpy(module) -> dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()
            if hasattr(v, "numpy")}


def _assert_full_transfer(report, allow_untouched=()):
    assert not report["mismatched"], f"shape mismatches: {report['mismatched'][:8]}"
    assert not report["ignored"], f"unconverted torch keys: {report['ignored'][:8]}"
    leftover = [k for k in report["untouched"]
                if not any(tok in k for tok in allow_untouched)]
    assert not leftover, f"flax leaves never written: {leftover[:8]}"


def _compare(t_out, j_out, atol, scales=(0, 1, 2, 3)):
    for s in scales:
        t = t_out[("disp", s)].detach().cpu().numpy()  # [N,1,h,w]
        j = np.asarray(j_out[("disp", s)], np.float32)  # [N,h,w,1]
        t = np.transpose(t, (0, 2, 3, 1))
        assert t.shape == j.shape, (s, t.shape, j.shape)
        diff = np.max(np.abs(t - j))
        assert diff < atol, f"scale {s}: max |Δdisp| = {diff:.2e} (atol {atol})"


# ---------------------------------------------------------------- endodav

ENDODAV_CASES = {
    # flagship train config (scripts/train_video.sh flags)
    "flagship": dict(lora_type="dvlora", residual_block_indexes=[2, 5, 8, 11],
                     temporal_lora=True, image_shape=(224, 280), slow=True),
    "lora_noconvhead": dict(lora_type="lora", residual_block_indexes=[],
                            temporal_lora=False, disable_conv_head=True,
                            out_sigmoid=True, image_shape=(56, 70), slow=False),
    "ssb_invsigmoid": dict(lora_type="ssb", residual_block_indexes=[],
                           temporal_lora=True, inv_sigmoid=True,
                           image_shape=(56, 70), slow=False),
}


def _run_endodav_case(ref, name):
    from endodav_tpu.models import EndoDAV

    case = dict(ENDODAV_CASES[name])
    case.pop("slow")
    image_shape = case.pop("image_shape")
    disable_conv_head = case.pop("disable_conv_head", False)
    torch.manual_seed(0)
    tm = ref["endodav"].endodav(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384], r=4,
        image_shape=image_shape, include_cls_token=True,
        disable_conv_head=disable_conv_head, **case)
    tm.eval()
    _randomize(tm, seed=1234)

    t = 2
    rng = np.random.default_rng(7)
    video = rng.uniform(0.05, 0.95, (1, t, 64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(video, (0, 1, 4, 2, 3))))

    jm = EndoDAV(encoder="vits", r=4, image_shape=image_shape,
                 lora_type=case["lora_type"],
                 residual_block_indexes=tuple(case["residual_block_indexes"]),
                 temporal_lora=case["temporal_lora"],
                 conv_head=not disable_conv_head,
                 inv_sigmoid=case.get("inv_sigmoid", False),
                 out_sigmoid=case.get("out_sigmoid", False))
    variables = jax.jit(jm.init)(jax.random.PRNGKey(0), jnp.asarray(video))
    variables, report = torch_to_flax(_state_numpy(tm), "endodav", variables)
    _assert_full_transfer(report)
    j_out = jax.jit(lambda v, x: jm.apply(v, x))(variables, jnp.asarray(video))
    _compare(t_out, j_out, atol=2e-4)


@pytest.mark.slow
def test_endodav_flagship_parity(ref):
    _run_endodav_case(ref, "flagship")


@pytest.mark.slow
def test_endodav_lora_noconvhead_parity(ref):
    _run_endodav_case(ref, "lora_noconvhead")


@pytest.mark.slow
def test_endodav_ssb_invsigmoid_parity(ref):
    _run_endodav_case(ref, "ssb_invsigmoid")


# ---------------------------------------------------------------- endodac

ENDODAC_CASES = {
    "flagship": dict(lora_type="dvlora", residual_block_indexes=[2, 5, 8, 11],
                     pre_norm=True, image_shape=(224, 280), slow=True),
    "lora_small": dict(lora_type="lora", residual_block_indexes=[],
                       pre_norm=False, image_shape=(56, 70), slow=False),
}


def _run_endodac_case(ref, name):
    from endodav_tpu.models import EndoDAC

    case = dict(ENDODAC_CASES[name])
    case.pop("slow")
    image_shape = case.pop("image_shape")
    torch.manual_seed(0)
    tm = ref["endodac"].endodac(
        backbone_size="small", r=4, image_shape=image_shape,
        include_cls_token=True, **case)
    tm.eval()
    _randomize(tm, seed=4321)

    rng = np.random.default_rng(11)
    imgs = rng.uniform(0.05, 0.95, (2, 64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))))

    jm = EndoDAC(backbone_size="vits", r=4, image_shape=image_shape,
                 lora_type=case["lora_type"],
                 residual_block_indexes=tuple(case["residual_block_indexes"]),
                 pre_norm=case["pre_norm"])
    variables = jax.jit(jm.init)(jax.random.PRNGKey(0), jnp.asarray(imgs))
    variables, report = torch_to_flax(_state_numpy(tm), "endodac", variables)
    _assert_full_transfer(report)
    j_out = jax.jit(lambda v, x: jm.apply(v, x))(variables, jnp.asarray(imgs))
    _compare(t_out, j_out, atol=2e-4)


@pytest.mark.slow
def test_endodac_flagship_parity(ref):
    _run_endodac_case(ref, "flagship")


def test_endodac_lora_parity(ref):
    _run_endodac_case(ref, "lora_small")


# ---------------------------------------------- sliding-window inference

@pytest.mark.slow
def test_infer_video_depth_loop_parity(ref):
    """Reference infer_video_depth (endodav.py:162-254) — the sequential
    keyframe-carry loop + cv2 preproc + scale/shift stitch — vs our
    batched window inference, same randomized weights, 60-frame video."""
    from endodav_tpu.eval.video_inference import infer_video_depth
    from endodav_tpu.models import EndoDAV

    image_shape = (56, 70)
    torch.manual_seed(0)
    tm = ref["endodav"].endodav(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384], r=4,
        image_shape=image_shape, lora_type="lora", residual_block_indexes=[],
        include_cls_token=True, temporal_lora=False)
    tm.eval()
    _randomize(tm, seed=99)
    # Random 0.05-std weights make the disparity maps nearly constant,
    # which leaves the stitch's closed-form scale/shift fit ill-conditioned
    # (tiny det amplifies f32 noise ~1e4x).  Boost the final head convs so
    # the maps have real spatial variance and the fit is well-posed.
    with torch.no_grad():
        for nm, p in tm.named_parameters():
            if "conv_depth" in nm and ".head.4." in nm:
                p.mul_(80.0)

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (60, 60, 74, 3), dtype=np.uint8)
    t_depth = tm.infer_video_depth(frames, device="cpu")  # [N, H, W]

    jm = EndoDAV(encoder="vits", r=4, image_shape=image_shape, lora_type="lora",
                 residual_block_indexes=(), temporal_lora=False)
    variables = jax.jit(jm.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, *image_shape, 3)))
    variables, report = torch_to_flax(_state_numpy(tm), "endodav", variables)
    _assert_full_transfer(report)

    def fwd(win):
        return jm.apply(variables, win)[("disp", 0)]

    j_depth = infer_video_depth(fwd, frames, image_shape=image_shape,
                                chunk_windows=3)
    assert j_depth.shape == t_depth.shape
    scale = float(np.abs(t_depth).mean()) + 1e-8
    rel = np.max(np.abs(j_depth - t_depth)) / scale
    assert rel < 1e-3, f"stitched video depth relative max err {rel:.2e}"
