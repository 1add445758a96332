"""Quantized frozen base: int8 / int4 dense weights under bf16 adapters.

Covers the reference's qlora flow (qlora/qlora_monarch.py) -- note the
reference fork ships with BitsAndBytes quantization commented OUT
(qlora/qlora.py:294-302), so this is a capability the reference only
gestures at.  TPU-native scheme:

  int8: per-output-row absmax scaling, stored as int8 (half of bf16).
  int4: per-(row, group) absmax scaling with group_size input columns,
        two nibbles packed per uint8 byte (quarter of bf16) in a
        **packed-halves layout**: byte ``j`` holds input columns ``j``
        (low nibble) and ``j + in/2`` (high nibble).

Dequantisation happens in the forward as a convert+multiply that XLA fuses
into the matmul operand read; adapters and all activations stay bf16.
The halves layout exists because the natural even/odd interleave needs a
lane-dimension shuffle (stack+reshape) that XLA must materialize as a full
dequantized matrix in HBM -- measured 210 us for a 5632x2048 batch-4 dot
vs 32.5 us for the halves layout, where each half dequantizes with pure
elementwise ops and the matmul splits into two fused half-dots
(``y = x_lo @ W_lo^T + x_hi @ W_hi^T`` -- MonarchLinear._dense_forward).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import MonarchLinear


class QuantScales(nnx.Variable):
    """Dequantisation scales of a frozen quantized base matrix.

    A dedicated Variable type so state filters can treat scales like the
    frozen weights they belong to (e.g. the Trainer's static/mutable state
    split keeps them input-only in the jitted step, and FSDP sharding can
    address them)."""


def quantize_int8(w):
    """(values int8 (out, in), scales f32 (out, 1))"""
    w = np.asarray(w, np.float32)
    scales = np.abs(w).max(axis=1, keepdims=True) / 127.0
    scales = np.maximum(scales, 1e-12)
    q = np.clip(np.round(w / scales), -127, 127).astype(np.int8)
    return q, scales.astype(np.float32)


def dequantize_int8(q, scales, dtype=jnp.float32):
    return (q.astype(jnp.float32) * scales).astype(dtype)


def quantize_int4(w, group_size: int = 64):
    """(packed uint8 (out, in//2), scales f32 (out, in//group_size)).

    Packed-halves layout: byte j = column j (low nibble) | column
    j + in//2 (high nibble), offset-8 encoded.  Requires (in//2) to be a
    multiple of group_size so each half's scale groups stay contiguous."""
    w = np.asarray(w, np.float32)
    out_f, in_f = w.shape
    h = in_f // 2
    assert in_f % 2 == 0 and h % group_size == 0, \
        f"in_features {in_f}: half must be a multiple of {group_size}"
    g = w.reshape(out_f, in_f // group_size, group_size)
    scales = np.abs(g).max(axis=-1, keepdims=True) / 7.0
    scales = np.maximum(scales, 1e-12)
    q = np.clip(np.round(g / scales), -8, 7).astype(np.int8).reshape(out_f, in_f)
    u = (q + 8).astype(np.uint8)
    packed = (u[:, :h] | (u[:, h:] << 4)).astype(np.uint8)
    return packed, scales[..., 0].astype(np.float32)


def unpack_int4(packed):
    """(lo, hi) int8 halves -- columns [0, in/2) and [in/2, in)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = ((packed >> 4) & 0xF).astype(jnp.int8) - 8
    return lo, hi


def dequantize_int4(packed, scales, group_size: int = 64, dtype=jnp.float32):
    lo, hi = unpack_int4(packed)
    out_f = packed.shape[0]
    in_f = packed.shape[1] * 2
    q = jnp.concatenate([lo, hi], axis=1)
    g = q.reshape(out_f, in_f // group_size, group_size).astype(jnp.float32)
    w = g * scales[..., None]
    return w.reshape(out_f, in_f).astype(dtype)


import jax
from functools import partial


@partial(jax.jit, static_argnums=())
def _quantize_int8_device(w):
    w = w.astype(jnp.float32)
    scales = jnp.maximum(jnp.abs(w).max(axis=1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scales), -127, 127).astype(jnp.int8)
    return q, scales


def _quantize_int4_device(w, group_size):
    w = w.astype(jnp.float32)
    out_f, in_f = w.shape
    g = w.reshape(out_f, in_f // group_size, group_size)
    scales = jnp.maximum(jnp.abs(g).max(axis=-1, keepdims=True) / 7.0, 1e-12)
    q = jnp.clip(jnp.round(g / scales), -8, 7).astype(jnp.int8).reshape(out_f, in_f)
    u = (q + 8).astype(jnp.uint8)
    h = in_f // 2
    packed = (u[:, :h] | (u[:, h:] << 4)).astype(jnp.uint8)
    return packed, scales[..., 0]


def _fit_group(in_f: int, group_size: int):
    """Largest group <= group_size that divides in_f//2 (the halves layout
    needs each half's scale groups contiguous).  Layers whose in_features
    is not a multiple of the requested group still quantize with a
    slightly smaller per-layer group (e.g. 8640 -> 60) instead of
    silently staying bf16."""
    if in_f % 2:
        return None
    half = in_f // 2
    for g in range(min(group_size, half), 7, -1):
        if half % g == 0:
            return g
    return None  # groups < 8 would balloon the f32 scales; stay bf16


def quantize_frozen_base(model: nnx.Module, bits: int = 8,
                         group_size: int = 64) -> int:
    """Quantize every MonarchLinear's frozen dense weight in place.

    Returns the number of matrices quantized.  The int values live in the
    (frozen) ``dense`` Param; scales in a new ``dense_scales`` Variable;
    ``quant_bits``/``quant_group`` static attrs steer the dequant path in
    ``MonarchLinear._dense_forward``.  Quantization runs ON DEVICE, one
    layer at a time (a 7B bf16 base never round-trips to host and the
    transient overhead is one layer's worth).
    """
    assert bits in (4, 8)
    from sparse_matrix_fine_tuning_tpu.peft.surgery import _iter_parents
    quant4 = jax.jit(_quantize_int4_device, static_argnums=(1,))
    n = 0
    # _iter_parents yields descendants only -- include the root so a bare
    # MonarchLinear quantizes too (layer micro-bench / unit-test path)
    candidates = [model] if isinstance(model, MonarchLinear) else []
    candidates += [child for _, _, child in _iter_parents(model)]
    for child in candidates:
        if isinstance(child, MonarchLinear) and child.dense is not None \
                and child.as_adapter and not getattr(child, "quant_bits", 0):
            w = child.dense[...]
            if bits == 8:
                q, scales = _quantize_int8_device(w)
            else:
                g = _fit_group(w.shape[1], group_size)
                if g is None:
                    print(f"[quant] skipping {w.shape} layer: in_features "
                          f"has no halves-compatible group <= {group_size}; "
                          f"stays bf16")
                    continue
                q, scales = quant4(w, g)
            child.dense.set_value(q)
            child.dense_scales = QuantScales(scales)
            child.quant_bits = bits
            child.quant_group = group_size if bits == 8 else g
            n += 1
    return n
