"""Multi-host (pod) training support.

The reference is strictly single-process / single-GPU (SURVEY.md
section 5.8); here pod-scale training is native.  JAX's runtime is SPMD
across processes: every host runs the same program over a GLOBAL mesh
(``jax.devices()`` spans all hosts), each host feeding the slice of every
batch that lives on its locally-attached chips.  This module is the thin
host-side glue that makes the Trainer's single-process code run unchanged
on a pod:

* :func:`initialize` -- ``jax.distributed.initialize`` wrapper (idempotent;
  auto-detects TPU pod environments where JAX needs no arguments).
* :func:`shard_data_for_process` -- contiguous per-process split of a
  host-resident dataset, so each host tokenizes/holds only 1/num_processes
  of the rows.
* :func:`global_batch` -- assemble the per-process batch rows into one
  global ``jax.Array`` per leaf via ``jax.make_array_from_process_local_data``
  (the batch axis is sharded over ("dp","fsdp") exactly like the
  single-host path's ``batch_sharding``).
* :func:`is_primary` -- process-0 guard for filesystem side effects
  (checkpoints, TSV exports, logs).

Parameter placement needs NO multihost special-casing:
``sharding.shard_state`` device_puts host-identical values onto global
``NamedSharding``\\ s, which JAX supports directly when every process
participates with the same value (each host materialises only its
addressable shards).  Trainable/adapter state is replicated, so
checkpoint reads (``np.asarray``) stay valid on every host.

Contract with the Trainer: under ``jax.process_count() > 1``, construct
the Trainer with the per-process data shard and the PER-PROCESS batch
size (global batch = per_device_train_batch_size * process_count); step
counts and epoch boundaries then agree with the single-host view because
both the data and the batches shrink by the same factor.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join (or create) the multi-process JAX runtime.  Idempotent.

    On real TPU pods call with no arguments -- JAX discovers the
    coordinator from the TPU metadata.  For CPU-simulated multihost tests
    (and non-TPU clusters) pass coordinator_address/num_processes/
    process_id explicitly or via the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``).
    """
    global _INITIALIZED
    # Idempotence must be checked WITHOUT jax.process_count(): that call
    # initialises the XLA backend, after which distributed.initialize
    # refuses to run at all.  jax.distributed.is_initialized() is the
    # public API (jax >= 0.4.34); fall back to a module flag + catching
    # the double-initialize RuntimeError on older versions.
    if getattr(jax.distributed, "is_initialized", None) is not None:
        if jax.distributed.is_initialized():
            return
    elif _INITIALIZED:
        return
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
        kw["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
        kw["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        # older-jax fallback path raced another initialize; treat the
        # "already initialized" error as idempotent success, re-raise rest
        if "already" not in str(e).lower():
            raise
    _INITIALIZED = True


_INITIALIZED = False


def is_primary() -> bool:
    """True on the process that should own filesystem side effects."""
    return jax.process_index() == 0


def shard_data_for_process(data: Mapping[str, np.ndarray],
                           *, drop_remainder: bool = True) -> dict:
    """Contiguous per-process split of a dict-of-arrays dataset.

    Every process ALWAYS receives the same number of rows -- mandatory
    under SPMD, where every host must see the same number of batches and
    enter every collective.  With ``drop_remainder`` (default) that count
    is ``n // process_count`` (the dropped tail is at most
    process_count - 1 rows); with ``drop_remainder=False`` it is
    ``ceil(n / process_count)`` and the final process's short tail is
    padded by repeating the dataset's last rows (at most
    process_count - 1 duplicate rows across the whole job -- the
    eval-style choice when no example may be dropped).
    """
    nproc, pid = jax.process_count(), jax.process_index()
    if nproc == 1:
        return dict(data)
    n = min(len(v) for v in data.values())
    if drop_remainder:
        per = n // nproc
        lo = pid * per
        return {k: v[lo:lo + per] for k, v in data.items()}
    per = -(-n // nproc)
    lo, hi = pid * per, min((pid + 1) * per, n)
    pad = per - (hi - lo)
    out = {}
    for k, v in data.items():
        shard = v[lo:hi]
        if pad:
            shard = np.concatenate([shard, np.repeat(v[-1:], pad, axis=0)])
        out[k] = shard
    return out


def global_batch(batch: Mapping[str, "np.ndarray"], mesh: Mesh,
                 *, macro: bool = False) -> dict:
    """Assemble per-process batch rows into global sharded arrays.

    ``batch`` leaves are this process's rows: shape (local_bs, ...) or,
    for ``macro`` (gradient-accumulation) batches, (accum, local_bs, ...)
    where the scan axis stays unsharded.  The batch axis becomes
    global_bs = local_bs * process_count, sharded over ("dp","fsdp") --
    identical layout to the single-host ``batch_sharding`` path, so the
    jitted train step compiles to the same program.
    """
    nproc = jax.process_count()
    spec = P(None, ("dp", "fsdp")) if macro else P(("dp", "fsdp"))
    sharding = NamedSharding(mesh, spec)
    bdim = 1 if macro else 0
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        gshape = list(v.shape)
        gshape[bdim] *= nproc
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, tuple(gshape))
    return out
