"""Robust device synchronization for timing code in this environment.

On the axon-tunneled backend, ``jax.block_until_ready`` has been
observed to RETURN EARLY while the relay is saturated (probe: 6 chained
518px trunk encodes reported "2 ms"), silently turning a timing loop
into a dispatch-latency measurement.  Materializing a SCALAR INDEX of
the last output genuinely waits: the slice computation rides the
in-order device stream behind everything already enqueued, and the
``np.asarray`` device->host fetch cannot complete before it runs.
Probe-verified equal to ``block_until_ready`` when that works (387 vs
391 ms), correct when it does not (PERFORMANCE.md "Dedup",
measurement caveat).

Use a scalar index, never ``ravel()[0]``: ravel copies the whole array,
and XLA picked a (8,128)-tiled layout for an f32[96,518,644,3] copy
that padded 43x and OOM'd HBM.

Timing-tool use only — the serving/eval paths themselves materialize
their real outputs (np.asarray / host stitch), which is already a true
sync.
"""

from __future__ import annotations

import numpy as np

__all__ = ["device_sync"]


def device_sync(tree):
    """Block until every computation enqueued before this call (on the
    streams feeding `tree`'s last leaf) has executed; returns the
    fetched scalar."""
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[-1]
    if not hasattr(leaf, "ndim"):  # plain python scalar
        return leaf
    return np.asarray(leaf[(0,) * leaf.ndim])
