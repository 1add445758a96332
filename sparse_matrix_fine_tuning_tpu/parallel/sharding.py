"""Sharding rules: FSDP + optional tensor parallelism for the frozen base.

Parameter placement is inferred from shapes plus (for the "tp" axis)
Megatron-style per-layer rules keyed on the parameter path:

* FSDP ("fsdp" axis): the largest dimension divisible by the axis size is
  sharded; adapter parameters and anything small/ragged is replicated.
  Batches are sharded over (dp, fsdp) jointly on the batch axis, so the
  fsdp axis doubles as a data axis (standard FSDP training layout: params
  gather over fsdp, gradients reduce-scatter over it).
* Tensor parallel ("tp" axis, size 1 unless requested): column-parallel
  projections (q/k/v/gate/up, lm_head) shard their OUTPUT features,
  row-parallel projections (o/down) shard their INPUT features -- XLA's
  sharding propagation then partitions the attention/MLP math per device
  and inserts the reduce for the row-parallel matmul, exactly the
  Megatron dataflow without explicit collectives.  Monarch adapters stay
  replicated (they are tiny); their output add reshards automatically.

Orientation note: ``MonarchLinear.dense`` is stored (out, in) while
``nnx.Linear.kernel`` is (in, out) -- the tp dim is resolved per leaf name.
A QUANTIZED dense (int8/uint8 leaf dtype) is stored in-major (quant/), so
its orientation matches kernel; detected from the dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Below this size it's cheaper to replicate than to gather (fsdp only; the
# tp rules always apply -- tp partitions compute, not just memory).
_MIN_SHARD_ELEMS = 1 << 16

# Column-parallel (shard output features) / row-parallel (shard input
# features) module names, per Megatron: the column->row pairing keeps the
# activation sharded over tp between the two matmuls of attention and MLP.
_TP_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "lm_head")
_TP_ROW = ("o_proj", "down_proj")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, macro: bool = False) -> NamedSharding:
    """Shard the (batch) axis over the dp and fsdp mesh axes (tp replicates
    the batch).  ``macro`` batches are shaped (accum_steps, batch, ...): the
    scan axis stays unsharded and the per-micro batch axis is data-parallel."""
    if macro:
        return NamedSharding(mesh, P(None, ("dp", "fsdp")))
    return NamedSharding(mesh, P(("dp", "fsdp")))


def _tp_dim(path_str: str, ndim: int, shape, tp_size: int,
            in_major: bool = False):
    """Which dim (if any) the tp axis shards for this parameter path."""
    if tp_size <= 1 or ndim != 2:
        return None
    col = any(f"{name}" in path_str for name in _TP_COL)
    row = any(f"{name}" in path_str for name in _TP_ROW)
    if not (col or row):
        return None
    # leaf name resolves the orientation: dense (out, in) vs kernel (in, out).
    # A QUANTIZED dense (int8/uint8 values -- quant/) is stored in-major
    # (in, out), same orientation as kernel.
    if "dense" in path_str and "dense_scales" not in path_str:
        dim = (1 if col else 0) if in_major else (0 if col else 1)
    elif "kernel" in path_str:
        dim = 1 if col else 0
    else:
        return None
    return dim if shape[dim] % tp_size == 0 else None


def param_spec(value, fsdp_size: int, tp_size: int = 1,
               path_str: str = "") -> P:
    shape = getattr(value, "shape", ())
    ndim = len(shape)
    spec = [None] * ndim
    dt = getattr(value, "dtype", None)
    in_major = dt in (jnp.uint8, jnp.int8) if dt is not None else False
    tp_d = _tp_dim(path_str, ndim, shape, tp_size, in_major=in_major)
    if tp_d is not None:
        spec[tp_d] = "tp"
    if not shape or value.size < _MIN_SHARD_ELEMS:
        return P(*spec) if any(spec) else P()
    # shard the largest divisible remaining dim over fsdp
    dims = sorted(range(ndim), key=lambda i: -shape[i])
    for d in dims:
        if d == tp_d:
            continue
        sz = shape[d]
        if sz % fsdp_size == 0 and sz >= fsdp_size:
            spec[d] = "fsdp"
            break
    return P(*spec) if any(spec) else P()


def shard_state(state, mesh: Mesh, *, replicate: bool = False):
    """device_put a (nested) state pytree with inferred shardings.

    replicate=True forces replication (used for adapter/optimizer state,
    which is tiny for PEFT).  When the mesh has a tp axis of size > 1, the
    Megatron rules above apply to matching frozen-base parameters.
    """
    fsdp = mesh.shape["fsdp"]
    tp = mesh.shape.get("tp", 1)

    def place(path, leaf):
        if leaf is None or not hasattr(leaf, "shape"):
            return leaf
        if replicate:
            spec = P()
        else:
            spec = param_spec(leaf, fsdp, tp, jax.tree_util.keystr(path))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)
