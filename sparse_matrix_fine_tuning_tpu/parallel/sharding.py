"""Sharding rules: FSDP for the frozen base, replication for adapters.

Parameter placement is inferred from shapes rather than per-layer rules:
the largest dimension divisible by the fsdp axis size is sharded; adapter
parameters and anything small/ragged is replicated.  Batches are sharded
over (dp, fsdp) jointly on the batch axis, so the fsdp axis doubles as a
data axis (standard FSDP training layout: params gather over fsdp,
gradients reduce-scatter over it).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Below this size it's cheaper to replicate than to gather.
_MIN_SHARD_ELEMS = 1 << 16


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, macro: bool = False) -> NamedSharding:
    """Shard the (batch) axis over both mesh axes.  ``macro`` batches are
    shaped (accum_steps, batch, ...): the scan axis stays unsharded and the
    per-micro batch axis is data-parallel."""
    if macro:
        return NamedSharding(mesh, P(None, ("dp", "fsdp")))
    return NamedSharding(mesh, P(("dp", "fsdp")))


def param_spec(value, fsdp_size: int) -> P:
    shape = getattr(value, "shape", ())
    if not shape or value.size < _MIN_SHARD_ELEMS:
        return P()
    # shard the largest divisible dim over fsdp
    dims = sorted(range(len(shape)), key=lambda i: -shape[i])
    for d in dims:
        if shape[d] % fsdp_size == 0 and shape[d] >= fsdp_size:
            spec = [None] * len(shape)
            spec[d] = "fsdp"
            return P(*spec)
    return P()


def shard_state(state, mesh: Mesh, *, replicate: bool = False):
    """device_put a (nested) state pytree with inferred shardings.

    replicate=True forces replication (used for adapter/optimizer state,
    which is tiny for PEFT).
    """
    fsdp = mesh.shape["fsdp"]

    def place(leaf):
        if leaf is None or not hasattr(leaf, "shape"):
            return leaf
        spec = P() if replicate else param_spec(leaf, fsdp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)
