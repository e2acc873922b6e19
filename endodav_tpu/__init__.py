"""endodav_tpu — a TPU-native video-depth framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
EndoDAV reference (self-supervised endoscopic video depth + pose):

* single-frame metric-free depth (DINOv2 ViT + LoRA + DPT decoder),
* temporally-consistent video depth (temporal attention interleaved in the
  DPT pyramid, sliding-window full-video inference with scale/shift stitch),
* self-supervised training from unlabeled surgery video (pose network,
  learned intrinsics, optical/appearance flow, reprojection losses),
* evaluation suites (depth / temporal / pose / intrinsics metrics).

Everything on the compute path is jit-compiled XLA with Pallas kernels for
the hot attention ops; parallelism is expressed with `jax.sharding` over a
device mesh rather than DataParallel.
"""

__version__ = "0.1.0"

from endodav_tpu.utils.envflags import env_on


def _apply_platform_override():
    """ENDODAV_FORCE_PLATFORM=cpu forces the JAX platform from the
    environment.  Needed because some deployments pin ``jax_platforms``
    from config-side sitecustomize hooks, where the standard
    JAX_PLATFORMS env var is ineffective — e.g. to run a CLI as a CPU
    subprocess while the TPU is busy (tools/parity_released.py)."""
    import os

    plat = os.environ.get("ENDODAV_FORCE_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            cache = os.path.join(os.path.expanduser("~"), ".cache", "endodav_tpu_jax_cpu")
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass


def _enable_persistent_compile_cache():
    """Persist XLA compilations across processes (first compile of the
    video model is expensive; CLI entry points are separate processes).
    Opt out with ENDODAV_TPU_NO_COMPILE_CACHE=1."""
    import os

    if env_on("ENDODAV_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "endodav_tpu_jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compile_cache()
_apply_platform_override()
