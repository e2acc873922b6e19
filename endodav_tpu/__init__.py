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
