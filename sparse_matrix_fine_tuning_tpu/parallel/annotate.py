"""Activation-sharding annotations: Megatron-style sequence parallelism.

The parameter rules in sharding.py partition the attention/MLP matmuls
over the "tp" mesh axis; between those matmuls -- the residual stream,
RMSNorms, embeddings -- activations would be REPLICATED over tp, so every
tp device holds (and normalizes) the full (batch, seq, hidden) tensor.

Sequence parallelism shards those token-parallel regions over the SAME tp
axis along the sequence dim (Megatron-LM's SP: the tp group double-books
as the sp group).  With GSPMD, one `with_sharding_constraint` at each
block boundary is enough: XLA turns the row-parallel output all-reduce
into a reduce-scatter and inserts the all-gather just before the next
column-parallel matmul -- the exact Megatron dataflow, same collective
bytes as plain tp, with residual/norm activation memory (and norm/add
compute) cut by tp-x.

The reference is single-GPU (SURVEY.md section 2.6); this is part of the
repo's native scaling story alongside the fsdp/tp rules.

Mechanics: model code calls ``shard_tokens(x)`` on (batch, seq, hidden)
activations at block boundaries.  It is a no-op unless a mesh has been
installed for the calling trace -- the Trainer wraps its jitted steps in
``activation_mesh(mesh)`` when ``sequence_parallel`` resolves on -- so
single-device runs, tests, and the decode path (seq 1 never divides tp)
trace exactly as before.
"""

from __future__ import annotations

import contextlib

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE: dict = {"mesh": None}


def set_activation_mesh(mesh: Mesh | None) -> None:
    """Install (or clear, with None) the mesh ``shard_tokens`` constrains to."""
    _STATE["mesh"] = mesh


def get_activation_mesh() -> Mesh | None:
    return _STATE["mesh"]


@contextlib.contextmanager
def activation_mesh(mesh: Mesh | None):
    """Scoped ``set_activation_mesh``: active for jit traces begun inside."""
    prev = _STATE["mesh"]
    _STATE["mesh"] = mesh
    try:
        yield
    finally:
        _STATE["mesh"] = prev


def shard_tokens(x):
    """Constrain a (batch, seq, hidden) activation to the SP layout
    P(("dp","fsdp"), "tp", None).  No-op when no mesh is installed, when
    the mesh has no tp axis to ride, or when the dims don't divide (decode
    steps have seq 1; uneven tails stay replicated rather than mis-shard).
    """
    mesh = _STATE["mesh"]
    if mesh is None:
        return x
    tp = mesh.shape.get("tp", 1)
    if tp <= 1 or getattr(x, "ndim", 0) != 3 or x.shape[1] % tp != 0:
        return x
    data = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
    batch = ("dp", "fsdp") if x.shape[0] % data == 0 and data > 1 else None
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(batch, "tp", None)))
