"""Device mesh construction.

The reference has no distributed training at all (SURVEY.md section 2.6);
here scaling is native: a ("dp", "fsdp") mesh over ICI, with the frozen
base FSDP-sharded and batches data-parallel.  XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, fsdp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("dp", "fsdp") mesh.

    Defaults: all devices on the fsdp axis (pure FSDP) -- the right default
    for a frozen 7B base on a small slice; set dp>1 for data parallelism
    across replicas.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and fsdp is None:
        dp, fsdp = 1, n
    elif dp is None:
        dp = n // fsdp
    elif fsdp is None:
        fsdp = n // dp
    assert dp * fsdp == n, f"dp({dp}) * fsdp({fsdp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))
