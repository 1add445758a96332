"""BOFT: butterfly orthogonal fine-tuning baseline.

The reference gets BOFT from the peft library (train_utils.py:378-401 with
task_configs/boft_roberta_glue/peft_boft_roberta.json).  TPU-native
implementation: the frozen dense output is rotated by a product of
block-diagonal orthogonal matrices with butterfly block-interleaving
between factors.  Each block is a Cayley transform Q = (I-S)(I+S)^-1 of a
trainable skew-symmetric S, zero-initialised so training starts at the
identity (pretrained behaviour preserved); a per-feature scale (ones-init)
finishes the layer, matching peft's ``boft_s``.

Config surface: boft_block_size / boft_block_num (mutually exclusive),
boft_n_butterfly_factor, boft_dropout, bias.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import AdapterParam

Array = jax.Array


def cayley(skew_params: Array) -> Array:
    """Batched Cayley transform: (..., b, b) raw params -> orthogonal blocks."""
    S = skew_params - jnp.swapaxes(skew_params, -1, -2)
    b = S.shape[-1]
    eye = jnp.eye(b, dtype=S.dtype)
    return jnp.linalg.solve(eye + S, eye - S)


def _butterfly_block_perm(n_blocks: int, factor: int) -> jnp.ndarray:
    """Block interleaving between factors: factor i regroups blocks at
    stride 2^i so successive factors mix progressively distant blocks."""
    stride = 2 ** factor
    if stride >= n_blocks:
        stride = max(n_blocks // 2, 1)
    idx = jnp.arange(n_blocks).reshape(stride, -1).T.reshape(-1)
    return idx


class BOFTLinear(nnx.Module):
    """Frozen dense linear with a trainable butterfly-orthogonal output
    rotation."""

    def __init__(self, in_features: int, out_features: int, *,
                 weights: Array, bias: Optional[Array] = None,
                 block_size: int = 0, block_num: int = 0,
                 n_butterfly_factor: int = 2, dropout: float = 0.0,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        assert (block_size > 0) != (block_num > 0), \
            "exactly one of boft_block_size/boft_block_num must be set"
        if block_num > 0:
            block_size = out_features // block_num
        assert out_features % block_size == 0, (
            f"out_features {out_features} % block {block_size} != 0")
        self.in_features = in_features
        self.out_features = out_features
        self.block_size = block_size
        self.n_blocks = out_features // block_size
        self.n_factors = max(n_butterfly_factor, 1)
        self.dense = nnx.Param(jnp.asarray(weights, param_dtype))
        self.bias = nnx.Param(jnp.asarray(bias, param_dtype)) if bias is not None else None
        # zero-init skew params -> identity rotations at init
        self.boft_R = AdapterParam(jnp.zeros(
            (self.n_factors, self.n_blocks, block_size, block_size), param_dtype))
        self.boft_s = AdapterParam(jnp.ones((out_features,), param_dtype))
        self.dropout = nnx.Dropout(dropout, deterministic=True, rngs=rngs) \
            if dropout > 0 else None

    def __call__(self, x: Array, *, deterministic=None) -> Array:
        w = self.dense[...].astype(x.dtype)
        h = jax.lax.dot_general(
            x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        if self.dropout is not None:
            h = self.dropout(h, deterministic=deterministic)
        Q = cayley(self.boft_R[...]).astype(x.dtype)  # (F, nb, bs, bs)
        lead = h.shape[:-1]
        for f in range(self.n_factors):
            # each factor is P^T (block-diag Q) P: identity blocks give the
            # identity factor, and P regroups which features share a block
            perm = _butterfly_block_perm(self.n_blocks, f)
            inv = jnp.argsort(perm)
            hb = h.reshape(*lead, self.n_blocks, self.block_size)
            hb = hb[..., perm, :]
            hb = jnp.einsum("...nb,nbc->...nc", hb, Q[f])
            hb = hb[..., inv, :]
            h = hb.reshape(*lead, self.out_features)
        h = h * self.boft_s[...].astype(h.dtype)
        if self.bias is not None:
            h = h + self.bias[...].astype(h.dtype)
        return h


def init_boft(model: nnx.Module, peft_config: dict, *,
              rngs: Optional[nnx.Rngs] = None,
              param_dtype=jnp.float32) -> list[str]:
    """Replace target linears with BOFT layers (reference
    train_utils.py:378-401; pooler/classifier/lm_head stay trainable via the
    standard trainable-path filter)."""
    from sparse_matrix_fine_tuning_tpu.peft.surgery import _iter_parents
    rngs = rngs or nnx.Rngs(0)
    targets = set(peft_config["target_modules"])
    adapted = []
    for parent, name, child in list(_iter_parents(model)):
        if name not in targets or not isinstance(child, nnx.Linear):
            continue
        kernel = child.kernel[...]
        in_f, out_f = kernel.shape
        new_layer = BOFTLinear(
            in_f, out_f, weights=kernel.T,
            bias=child.bias[...] if child.bias is not None else None,
            block_size=peft_config.get("boft_block_size", 0) or 0,
            block_num=peft_config.get("boft_block_num", 0) or 0,
            n_butterfly_factor=peft_config.get("boft_n_butterfly_factor", 2),
            dropout=peft_config.get("boft_dropout", 0.0),
            param_dtype=param_dtype, rngs=rngs)
        if isinstance(parent, nnx.List):
            parent[int(name)] = new_layer
        else:
            setattr(parent, name, new_layer)
        adapted.append(name)
    return adapted
