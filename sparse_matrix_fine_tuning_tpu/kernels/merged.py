"""Merge-during-training: the fastest TPU path for the PEFT hot loop.

The reference merges the adapter into the frozen dense only at eval
(reference src/layers/monarch_linear.py:255-276).  On TPU we can afford to
merge DURING training as well: because the dense is frozen, the layer

    y = x @ (Wd + M(w1, w2))^T

is exact, and the merged operand ``Wm`` changes only when (w1, w2) change
-- once per optimizer step, NOT per micro-batch.  With the reference's own
gradient-accumulation recipes (ga=16, BASELINE.md), the merge amortizes to
noise and the adapter's forward AND input-gradient costs drop to ZERO: both
big matmuls use one dense operand, exactly like a non-adapted layer.  The
only per-micro-batch adapter work left is the factor-gradient pass
(ops.monarch.monarch_dw -- one read of x and dout).  Measured on v5e
(scripts/exp_merged_v3.py, slope-timed): adapter marginal cost drops from
+339 us (XLA unfused) to +174 us/micro-batch at the Llama-7B projection
shape -- a 1.95x cut of the adapter overhead, vs the reference Triton
kernel's ~1.2x op-level claim (README.md:11).

This is an *algorithmic* win eager PyTorch cannot express: the merged
operand must be hoisted out of the micro-batch loop and the factor grads
taken w.r.t. the UNMERGED parameterisation -- custom_vjp + jit make that a
10-line definition here.

Numerics: Wm is built in f32 and rounded once to the storage dtype; the
single rounding matches the standard path's output rounding (bf16 matmul),
and factor gradients are computed exactly from (x, dout), not through Wm.
Validity: plain additive adapter only (no output dropout/scaler/
mult-factor -- those wrap the monarch branch and cannot fold into Wm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    expand_monarch_factors,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import monarch_dw

Array = jax.Array


def build_merged_operands(dense: Array, w1: Array, w2: Array):
    """(wm, wm_t) from the frozen dense (out, in) and monarch factors.

    wm (in, out) feeds the forward ``x @ wm``; wm_t (out, in) feeds the
    input-gradient ``dout @ wm_t`` -- both materialised once per step so
    neither matmul hides a per-micro-batch transpose.
    """
    m, n = dense.shape
    w1bd, w2hat = expand_monarch_factors(w1, w2)
    d = jnp.dot(w1bd.astype(dense.dtype), w2hat.astype(dense.dtype),
                preferred_element_type=jnp.float32)  # (in_ext, out_ext)
    # padded blocks fold away: zero-padded input rows never contribute and
    # truncated output columns are dropped (structured_linear pad semantics)
    d = d[:n, :m]
    wm = (dense.T.astype(jnp.float32) + d).astype(dense.dtype)
    return wm, wm.T


@jax.custom_vjp
def merged_apply(x: Array, wm: Array, wm_t: Array, w1: Array, w2: Array) -> Array:
    """``x @ wm`` with factor-structured gradients.

    wm/wm_t must be ``build_merged_operands(dense, w1, w2)`` for the SAME
    (w1, w2) -- the trainer refreshes them at the top of every optimizer
    step.  Gradients: dx through wm_t (one dense matmul); (dw1, dw2) through
    the monarch structure directly from (x, dout); wm/wm_t receive zeros
    (the dense is frozen and the factor grads are already exact).
    """
    *batch, n = x.shape
    out = jax.lax.dot_general(
        x.reshape(-1, n), wm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(*batch, wm.shape[1])


def _ma_fwd(x, wm, wm_t, w1, w2):
    return merged_apply(x, wm, wm_t, w1, w2), (x, wm_t, w1, w2)


def _ma_bwd(res, dout):
    x, wm_t, w1, w2 = res
    *batch, n = x.shape
    m = dout.shape[-1]
    d2 = dout.reshape(-1, m)
    dx = jax.lax.dot_general(
        d2, wm_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # factor grads run at the EXTENDED (padded) monarch shapes: zero-pad the
    # input features and the cotangent of the truncated output columns
    k, _, p = w1.shape
    l, s, _ = w2.shape
    x2 = x.reshape(-1, n)
    if k * p > n:
        x2 = jnp.pad(x2, ((0, 0), (0, k * p - n)))
    if s * l > m:
        d2 = jnp.pad(d2, ((0, 0), (0, s * l - m)))
    # per-runtime kernel selection (static at trace time): the fused
    # one-read Pallas dw where custom calls are penalty-free in-scan,
    # XLA's block path where they are not (kernels/runtime_gate.py)
    from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
        monarch_dw_fused, monarch_dw_fused_supported)
    from sparse_matrix_fine_tuning_tpu.kernels.runtime_gate import use_fused_dw
    if (monarch_dw_fused_supported(x2.shape[1], d2.shape[1],
                                   w1.shape, w2.shape)
            and use_fused_dw()):
        dw1, dw2 = monarch_dw_fused(x2, d2, w1, w2)
    else:
        dw1, dw2, _ = monarch_dw(x2, d2, w1, w2)
    zero_wm = jnp.zeros((wm_t.shape[1], wm_t.shape[0]), wm_t.dtype)
    return dx.reshape(x.shape), zero_wm, jnp.zeros_like(wm_t), dw1, dw2


merged_apply.defvjp(_ma_fwd, _ma_bwd)
