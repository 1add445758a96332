"""BOFT: butterfly orthogonal fine-tuning baseline.

The reference gets BOFT from the peft library (train_utils.py:378-401 with
task_configs/boft_roberta_glue/peft_boft_roberta.json).  This implements
peft's exact math TPU-natively (verified weight-for-weight against the
installed peft in tests/reference_parity/test_boft_parity.py):

  y = ((x @ R) @ W^T) * boft_s + bias,   R = M_{F-1} @ ... @ M_0,
  M_i = P_i @ blockdiag(Cayley(0.5 (R_i - R_i^T))) @ P_i^T

with the rotation acting on IN_FEATURES, boft_R zero-initialised so R
starts at the identity (pretrained behaviour preserved), P_i the BOFT
paper's block-butterfly permutations (peft boft/layer.py
block_butterfly_perm), and a per-output-feature scale ``boft_s``
(ones-init).  Multiplicative dropout replaces a random fraction of one
factor's blocks with the identity during training (peft
MultiplicativeDropoutLayer semantics).

Config surface: boft_block_size / boft_block_num (mutually exclusive,
over in_features), boft_n_butterfly_factor, boft_dropout, bias
("none" keeps the frozen bias; "boft_only"/"all" make it trainable,
mirroring peft's bias option).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import AdapterParam

Array = jax.Array


def cayley(skew_params: Array) -> Array:
    """Batched Cayley transform with peft's convention
    (boft/layer.py cayley_batch): S = 0.5 (R - R^T), Q = (I - S)(I + S)^-1.
    Zero input -> identity; always exactly orthogonal."""
    S = 0.5 * (skew_params - jnp.swapaxes(skew_params, -1, -2))
    b = S.shape[-1]
    eye = jnp.eye(b, dtype=S.dtype)
    # (I - S)(I + S)^-1 == (I + S)^-1 (I - S): rational functions of S commute
    return jnp.linalg.solve(eye + S, eye - S)


@functools.lru_cache(maxsize=256)
def _butterfly_perm(n: int, b: int, r: int, n_butterfly_factor: int) -> tuple:
    """peft BOFTLayer.block_butterfly_perm: permutation indices that
    regroup the length-n feature axis so the next factor's blocks mix
    progressively distant features.  Returns a hashable tuple."""
    if n_butterfly_factor == 0:
        return tuple(range(n))
    if b * r * 2 > n:
        raise ValueError("Invalid number of blocks!")
    block_size = n // b
    indices = np.arange(n)
    step = block_size / r
    initial_order = np.arange(block_size)
    sorted_order = np.empty(block_size, dtype=np.int64)
    evens = np.arange(0, step, 2)
    odds = np.arange(1, step, 2)
    sorted_seq = np.concatenate([evens, odds])
    for i, pos in enumerate(sorted_seq):
        sorted_order[int(i * r):int(i * r + r)] = \
            initial_order[int(pos * r):int(pos * r + r)]
    for i in range(0, n, block_size):
        indices[i:i + block_size] = indices[i:i + block_size][sorted_order]
    return tuple(int(i) for i in indices)


class BOFTLinear(nnx.Module):
    """Frozen dense linear with a trainable butterfly-orthogonal INPUT
    rotation and per-output scale (peft BOFT Linear semantics)."""

    def __init__(self, in_features: int, out_features: int, *,
                 weights: Array, bias: Optional[Array] = None,
                 block_size: int = 0, block_num: int = 0,
                 n_butterfly_factor: int = 1, dropout: float = 0.0,
                 bias_mode: str = "none",
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        assert (block_size > 0) != (block_num > 0), \
            "exactly one of boft_block_size/boft_block_num must be set"
        if block_num > 0:
            assert in_features % block_num == 0, (
                f"in_features {in_features} % boft_block_num {block_num} != 0")
            block_size = in_features // block_num
        assert in_features % block_size == 0, (
            f"in_features {in_features} % boft_block_size {block_size} != 0")
        block_num = in_features // block_size
        F = max(n_butterfly_factor, 1)
        if F > 1:
            # peft update_layer validity rules for multi-factor butterflies
            assert block_num % (2 ** (F - 1)) == 0 and block_num % 2 == 0, (
                f"boft_block_num {block_num} incompatible with "
                f"n_butterfly_factor {F}")
            assert block_size % 2 == 0, (
                f"boft_block_size {block_size} must be even for butterflies")
        self.in_features = in_features
        self.out_features = out_features
        self.block_size = block_size
        self.n_blocks = block_num
        self.n_factors = F
        self.dense = nnx.Param(jnp.asarray(weights, param_dtype))
        if bias is None:
            self.bias = None
        elif bias_mode in ("boft_only", "all"):
            # reference config pins bias="boft_only": the adapted layer's
            # bias trains (peft's bias option)
            self.bias = AdapterParam(jnp.asarray(bias, param_dtype))
        else:
            self.bias = nnx.Param(jnp.asarray(bias, param_dtype))
        # zero-init skew params -> identity rotations at init
        self.boft_R = AdapterParam(jnp.zeros(
            (F, block_num, block_size, block_size), param_dtype))
        self.boft_s = AdapterParam(jnp.ones((out_features,), param_dtype))
        self.dropout_p = float(dropout)
        self.drop_rngs = rngs if dropout > 0 else None
        # flipped by nnx model.train()/eval() (set_attributes), same
        # convention as nnx.Dropout
        self.deterministic = True

    def _perm(self, i: int) -> np.ndarray:
        # P_i built with b = block_num / 2^i (peft update_layer)
        return np.asarray(_butterfly_perm(
            self.in_features, self.n_blocks // (2 ** i), self.block_size // 2,
            self.n_factors - 1), dtype=np.int32)

    def _dropped(self, Q: Array, deterministic) -> Array:
        """peft MultiplicativeDropoutLayer: during training, replace a
        random ~p fraction of ONE random factor's blocks with identity."""
        det = self.deterministic if deterministic is None else deterministic
        if self.dropout_p <= 0 or det:
            return Q
        F, D, H, _ = Q.shape
        key = self.drop_rngs.dropout()
        kf, km = jax.random.split(key)
        n_replace = int(self.dropout_p * D)
        mask = jnp.zeros((D,)).at[:n_replace].set(1.0)
        mask = jax.random.permutation(km, mask)
        factor = jax.random.randint(kf, (), 0, F)
        full = jnp.zeros((F, D, 1, 1)).at[factor].set(mask[:, None, None])
        eye = jnp.broadcast_to(jnp.eye(H, dtype=Q.dtype), Q.shape)
        return (1 - full) * Q + full * eye

    def __call__(self, x: Array, *, deterministic=None) -> Array:
        Q = cayley(self.boft_R[...].astype(jnp.float32))
        Q = self._dropped(Q, deterministic).astype(x.dtype)  # (F, D, bs, bs)
        lead = x.shape[:-1]
        h = x
        # x @ (M_{F-1} @ ... @ M_0) applied left-to-right; each
        # M_i = P_i @ BD_i @ P_i^T, and for a permutation matrix with
        # P[j, perm[j]] = 1 (peft perm2mat): x @ P = x[..., argsort(perm)],
        # x @ P^T = x[..., perm]
        for i in range(self.n_factors - 1, -1, -1):
            perm = self._perm(i)
            hb = h[..., np.argsort(perm)]
            hb = hb.reshape(*lead, self.n_blocks, self.block_size)
            hb = jnp.einsum("...nb,nbc->...nc", hb, Q[i])
            h = hb.reshape(*lead, self.in_features)[..., perm]
        w = self.dense[...].astype(x.dtype)
        y = jax.lax.dot_general(
            h, w, dimension_numbers=(((h.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = y * self.boft_s[...].astype(y.dtype)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y


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
            bias_mode=peft_config.get("bias", "none"),
            param_dtype=param_dtype, rngs=rngs)
        if isinstance(parent, nnx.List):
            parent[int(name)] = new_layer
        else:
            setattr(parent, name, new_layer)
        adapted.append(name)
    if peft_config.get("bias") == "all":
        # peft bias="all": EVERY bias in the model trains, not just the
        # adapted layers' (bias="boft_only" is handled per-layer above)
        for _, attr, child in _iter_parents(model):
            bias = getattr(child, "bias", None)
            if isinstance(bias, nnx.Param) and not isinstance(bias, AdapterParam):
                child.bias = AdapterParam(bias[...])
    return adapted
