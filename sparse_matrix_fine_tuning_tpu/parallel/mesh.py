"""Device mesh construction.

The reference has no distributed training at all (SURVEY.md section 2.6);
here scaling is native: a ("dp", "fsdp", "tp") mesh over ICI, with the
frozen base FSDP-sharded over "fsdp", Megatron-style tensor-parallel over
"tp" (column-parallel q/k/v/gate/up, row-parallel o/down -- see
sharding.py), and batches data-parallel over ("dp", "fsdp").  XLA inserts
the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, fsdp: Optional[int] = None,
              tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("dp", "fsdp", "tp") mesh.

    Defaults: all devices on the fsdp axis (pure FSDP, tp=1) -- the right
    default for a frozen 7B base on a small slice; set dp>1 for data
    parallelism across replicas, tp>1 for tensor-parallel attention/MLP
    (lower per-step latency at the cost of activation collectives).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = 1
    rest = n // tp
    assert tp * rest == n, f"tp({tp}) does not divide devices({n})"
    if dp is None and fsdp is None:
        dp, fsdp = 1, rest
    elif dp is None:
        dp = rest // fsdp
    elif fsdp is None:
        fsdp = rest // dp
    assert dp * fsdp * tp == n, \
        f"dp({dp}) * fsdp({fsdp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))
