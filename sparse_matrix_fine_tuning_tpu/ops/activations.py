"""Fused gated activations: GeGLU (tanh-GELU * gate) and SwiGLU (SiLU * gate).

TPU equivalent of the reference's Triton elementwise kernels
(reference src/ops/activations.py:6-126, adapted there from Liger-Kernel).
On TPU these are VPU-bound elementwise ops that XLA fuses into neighbouring
matmuls, so the jnp implementation below IS the fused fast path; the
custom VJP recomputes the activation in the backward instead of saving it
(the same recompute-in-backward memory trick the Triton kernels use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_SQRT_2_OVER_PI = 0.7978845608028654  # sqrt(2/pi)


def _gelu_tanh(x: Array) -> Array:
    x3 = x * x * x
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x3)))


def _silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


@jax.custom_vjp
def geglu(a: Array, b: Array) -> Array:
    """tanh-GELU(a) * b."""
    return _gelu_tanh(a) * b


def _geglu_fwd(a, b):
    return geglu(a, b), (a, b)


def _geglu_bwd(res, g):
    a, b = res
    # recompute activation + derivative in backward (no saved activation)
    t = jnp.tanh(_SQRT_2_OVER_PI * (a + 0.044715 * a * a * a))
    gelu_a = 0.5 * a * (1.0 + t)
    dgelu = 0.5 * (1.0 + t) + 0.5 * a * (1.0 - t * t) * _SQRT_2_OVER_PI * (1.0 + 3 * 0.044715 * a * a)
    return (g * b * dgelu).astype(a.dtype), (g * gelu_a).astype(b.dtype)


geglu.defvjp(_geglu_fwd, _geglu_bwd)


@jax.custom_vjp
def swiglu(a: Array, b: Array) -> Array:
    """SiLU(a) * b."""
    return _silu(a) * b


def _swiglu_fwd(a, b):
    return swiglu(a, b), (a, b)


def _swiglu_bwd(res, g):
    a, b = res
    sig = jax.nn.sigmoid(a)
    silu_a = a * sig
    dsilu = sig * (1.0 + a * (1.0 - sig))
    return (g * b * dsilu).astype(a.dtype), (g * silu_a).astype(b.dtype)


swiglu.defvjp(_swiglu_fwd, _swiglu_bwd)
