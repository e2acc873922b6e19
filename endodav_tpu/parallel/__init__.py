"""Device-mesh construction and sharding specs — the SPMD story in one place.

The reference's entire parallelism surface is `torch.nn.DataParallel`
(options.py:247-249, trainer_end_to_end_video.py:269-271): batch scatter
over CUDA P2P, gradient reduction on device 0.  The TPU-native superset
is a 1-D `jax.sharding.Mesh` with one `data` axis: the jitted train step
shards the flattened B*T batch on it and XLA inserts the gradient
all-reduce over ICI; serving shards independent 32-frame windows the
same way (windows are embarrassingly parallel until the host stitch,
SURVEY.md §5 long-context).

Used by `train/trainer.py` (train-step DP), `eval/engine.py` +
`eval/video_inference.py` (`--serve_mesh` window DP), and the driver's
`dryrun_multichip`.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "build_mesh",
    "parse_mesh_shape",
    "replicated",
    "data_sharding",
    "shard_batch",
]


def parse_mesh_shape(spec: str | None, allow_model: bool = False) -> int | None:
    """Parse a ``--mesh_shape``/``--serve_mesh`` value.

    '' / None -> None (caller decides: all devices or no mesh);
    'data=N' -> N.  With ``allow_model`` (the serving call sites only),
    'model=N' -> None here — tensor parallelism is built at the
    forward-builder level (`parallel/tp.py`), not as a data mesh.
    Anything else is rejected: the SPMD layout is 1-D data-parallel for
    training (SURVEY.md §2.5: the per-chip batch is the unit of work)
    plus the optional model axis for serving latency — so the training
    flag ``--mesh_shape model=N`` stays a loud error rather than a
    silent all-devices data mesh.
    """
    if not spec:
        return None
    if spec.startswith("data="):
        return int(spec.split("=", 1)[1])
    if allow_model and spec.startswith("model="):
        return None
    expected = "'data=N' or 'model=N'" if allow_model else "'data=N'"
    raise ValueError(f"mesh spec must be {expected}, got {spec!r}")


def build_mesh(spec: str | None = None, devices=None, default_all: bool = True,
               clamp: bool = False, allow_model: bool = False) -> Mesh | None:
    """Build the 1-D data mesh.

    spec: 'data=N' restricts to the first N visible devices; '' / None
    uses all of them when `default_all`, else returns None (no mesh —
    e.g. serving defaults to single-device unless --serve_mesh is set).
    clamp: shrink N to the visible device count instead of raising
    (training keeps running on the one tunneled chip with a pod config).
    allow_model: accept a serving 'model=N' spec (-> None: the TP mesh
    is built by the forward builder, parallel/tp.py).
    """
    n = parse_mesh_shape(spec, allow_model=allow_model)
    if n is None and not default_all:
        return None
    devs = list(devices if devices is not None else jax.devices())
    if n is not None:
        if n > len(devs):
            if not clamp:
                raise ValueError(f"mesh wants {n} devices, only {len(devs)} visible")
            n = len(devs)
        devs = devs[:n]
    return Mesh(np.array(devs), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    """Params / optimizer state: every chip holds a full copy."""
    return NamedSharding(mesh, PartitionSpec())


def data_sharding(mesh: Mesh, ndim_sharded_axis: int = 0) -> NamedSharding:
    """Batch tensors: leading axis split across the 'data' axis."""
    spec = [None] * ndim_sharded_axis + ["data"]
    return NamedSharding(mesh, PartitionSpec(*spec))


def shard_batch(batch, mesh: Mesh):
    """Place every array of a (pytree) batch with its leading axis sharded."""
    return jax.device_put(batch, data_sharding(mesh))
