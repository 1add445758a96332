"""Quantized frozen base: int8 / int4 dense weights under bf16 adapters.

Covers the reference's qlora flow (qlora/qlora_monarch.py) -- note the
reference fork ships with BitsAndBytes quantization commented OUT
(qlora/qlora.py:294-302), so this is a capability the reference only
gestures at.  TPU-native scheme:

  int8: per-output-row absmax scaling, stored as int8 (half of bf16).
  int4: per-(row, group) absmax scaling with group_size input columns,
        two nibbles packed per uint8 byte (quarter of bf16) in an
        **in-major packed-halves layout**: ``packed_t (in/2, out)`` where
        byte ``(j, o)`` holds input columns ``j`` (low nibble) and
        ``j + in/2`` (high nibble) of output row ``o``;
        ``scales (in/group, out)`` f32.

The halves split exists because the natural even/odd nibble interleave
needs a lane-dimension shuffle that XLA materializes as a full dequantized
matrix in HBM (measured 6.5x slower at decode shapes); with halves the
matmul splits into two dots ``y = x_lo @ W_lo + x_hi @ W_hi``.  The
IN-MAJOR orientation makes the grouped scale broadcast a leading-axis
reshape -- XLA-neutral (measured equal to out-major) but required by the
fused Pallas dequant-matmul (kernels/quant_matmul.py), which keeps the
dequantized matrix VMEM-resident so HBM traffic is the packed bytes only
(the XLA paths all materialize the bf16 dequant: ~40 us for a
(5632, 2048) batch-4 dot whose packed bytes stream in ~7 us).
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
    """(values int8 (in, out) in-major, scales f32 (1, out))"""
    w = np.asarray(w, np.float32)
    scales = np.abs(w).max(axis=1, keepdims=True) / 127.0
    scales = np.maximum(scales, 1e-12)
    q = np.clip(np.round(w / scales), -127, 127).astype(np.int8)
    return np.ascontiguousarray(q.T), \
        np.ascontiguousarray(scales.astype(np.float32).T)


def dequantize_int8(q_t, scales, dtype=jnp.float32):
    """Reconstruct W (out, in) from the in-major layout."""
    return (q_t.astype(jnp.float32) * scales).T.astype(dtype)


def quantize_int4(w, group_size: int = 64):
    """(packed_t uint8 (in//2, out), scales f32 (in//group_size, out)).

    In-major packed-halves layout: byte (j, o) = W[o, j] (low nibble) |
    W[o, j + in//2] (high nibble), offset-8 encoded.  Scale rows
    [0, ns/2) belong to the low half, [ns/2, ns) to the high half.
    Requires (in//2) to be a multiple of group_size so each half's scale
    groups stay contiguous."""
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
    return np.ascontiguousarray(packed.T), \
        np.ascontiguousarray(scales[..., 0].astype(np.float32).T)


def unpack_int4(packed_t):
    """(lo_t, hi_t) int8 transposed halves: lo_t (in/2, out) = W_lo^T for
    input columns [0, in/2), hi_t for [in/2, in)."""
    lo = (packed_t & 0xF).astype(jnp.int8) - 8
    hi = ((packed_t >> 4) & 0xF).astype(jnp.int8) - 8
    return lo, hi


def dequantize_int4_halves(packed_t, scales, group_size: int = 64,
                           dtype=jnp.float32):
    """(W_lo^T, W_hi^T) dequantized (in/2, out) halves in ``dtype``.

    THE canonical grouped-scale broadcast for the halves layout --
    ``(ns/2, out) -> (ns/2, g, out) -> (in/2, out)``, leading axes only
    (the in-major orientation exists so this never relayouts the lane
    dim).  Shared by ``dequantize_int4``, the layer's split-dot fallback
    (layers/monarch_linear.py), and the kernel's XLA backward fallback
    (kernels/quant_matmul.py); the in-VMEM mirror of the same math is
    ``quant_matmul._unpack_scaled``."""
    lo, hi = unpack_int4(packed_t)
    h, out_f = packed_t.shape
    ns = scales.shape[0]

    def half(q, s):  # q (h, out), s (ns/2, out)
        sb = jnp.broadcast_to(s[:, None, :], (ns // 2, group_size, out_f))
        return (q.astype(jnp.float32) * sb.reshape(h, out_f)).astype(dtype)

    return half(lo, scales[: ns // 2]), half(hi, scales[ns // 2:])


def dequantize_int4(packed_t, scales, group_size: int = 64, dtype=jnp.float32):
    """Reconstruct W (out, in) from the in-major layout."""
    lo, hi = dequantize_int4_halves(packed_t, scales, group_size, jnp.float32)
    return jnp.concatenate([lo, hi], axis=0).T.astype(dtype)


import jax
from functools import partial


@partial(jax.jit, static_argnums=())
def _quantize_int8_device(w):
    w = w.astype(jnp.float32)
    scales = jnp.maximum(jnp.abs(w).max(axis=1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scales), -127, 127).astype(jnp.int8)
    return q.T, scales.T


def _quantize_int4_device(w, group_size):
    w = w.astype(jnp.float32)
    out_f, in_f = w.shape
    g = w.reshape(out_f, in_f // group_size, group_size)
    scales = jnp.maximum(jnp.abs(g).max(axis=-1, keepdims=True) / 7.0, 1e-12)
    q = jnp.clip(jnp.round(g / scales), -8, 7).astype(jnp.int8).reshape(out_f, in_f)
    u = (q + 8).astype(jnp.uint8)
    h = in_f // 2
    packed = (u[:, :h] | (u[:, h:] << 4)).astype(jnp.uint8)
    return packed.T, scales[..., 0].T


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


class Int8LMHead(nnx.Module):
    """Frozen int8 lm_head (drop-in for the ``nnx.Linear`` one).

    Opt-in and OFF by default, matching bitsandbytes' default
    ``llm_int8_skip_modules=["lm_head"]`` that the reference's qlora flow
    inherits (qlora/qlora.py): quantizing the logit projection trades a
    little logit precision for decode bandwidth.  Small-batch decode is
    weight-read-bound and the bf16 lm_head is the single largest
    unquantized matrix left after ``quantize_frozen_base`` (~12% of
    TinyLlama's per-token HBM traffic, ~7% of 7B's under int4); per-output
    -column absmax int8 halves that share.

    Implementation choice is measured, not assumed (standalone slope-timed
    at the (4, 2048) x (2048, 32000) decode shape on the v5e):

      bf16 dot 178.6 us | XLA dequant-dot 94.8 | fused Pallas 113.4 |
      w8a8 int8-MXU 89.3 -- all int8 variants argmax-exact vs bf16.

    XLA fuses the int8->bf16 dequant into the dot at this fat-out shape
    (no HBM materialization), and a Pallas custom call inside the decode
    ``lax.while_loop`` pays this runtime's ~175 us layout/scheduling
    penalty (kernels/runtime_gate.py) -- measured +177 us/step on the
    full decode loop.  So the default is the plain XLA dequant dot;
    ``impl="w8a8"`` opts into per-token activation quantization with an
    int8xint8->int32 MXU dot (fastest, one more quantization error term).
    """

    def __init__(self, q_t, scales, compute_dtype=None, impl="dequant"):
        assert impl in ("dequant", "w8a8")
        self.kernel_q = nnx.Param(q_t)      # (in, vocab) int8, frozen
        self.scales = QuantScales(scales)   # (1, vocab) f32
        self.compute_dtype = compute_dtype
        self.impl = impl

    def __call__(self, x):
        q, s = self.kernel_q[...], self.scales[...]
        compute = self.compute_dtype if self.compute_dtype is not None \
            else x.dtype
        dims = (((x.ndim - 1,), (0,)), ((), ()))
        if self.impl == "w8a8":
            xf = x.astype(jnp.float32)
            sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            sx = jnp.maximum(sx, 1e-12)
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, q, dimension_numbers=dims,
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sx * s).astype(x.dtype)
        w = (q.astype(jnp.float32) * s).astype(compute)
        return jax.lax.dot_general(
            x.astype(compute), w, dimension_numbers=dims,
            preferred_element_type=jnp.float32).astype(x.dtype)


def quantize_lm_head(model: nnx.Module, impl: str = "dequant") -> bool:
    """Replace ``model.lm_head`` (untied ``nnx.Linear``) with an
    :class:`Int8LMHead`.  Returns False (with a note) for tied-embedding
    models, whose logits reuse the embedding matrix, and for heads with a
    bias (none of the supported families has one).  Quantizes on device
    like :func:`quantize_frozen_base`."""
    head = getattr(model, "lm_head", None)
    if head is None:
        print("[quant] lm_head is tied to the embedding; not quantized")
        return False
    if getattr(head, "bias", None) is not None and head.bias is not None:
        print("[quant] lm_head has a bias; not quantized")
        return False
    kernel = head.kernel[...]  # (in, vocab)
    q_t, scales = jax.jit(_quantize_int8_device)(kernel.T)
    model.lm_head = Int8LMHead(q_t, scales,
                               compute_dtype=getattr(head, "dtype", None),
                               impl=impl)
    return True


def enable_w8a8_serving(model: nnx.Module) -> int:
    """Opt-in w8a8 decode for int8-quantized bases: per-token activation
    quantization + an int8 x int8 -> int32 MXU dot, scales applied to the
    int32 accumulator (per-out weight scale x per-token activation scale).

    Pure XLA -- no weight dequantisation AT ALL (the fused Pallas kernel
    still pays ~3 VPU passes per weight cell widening int8 -> f32 -> bf16;
    the Int8LMHead measured the same trade at the head shape: w8a8 89.3 us
    vs fused Pallas 113.4 vs XLA dequant-dot 94.8).  Decode at batch 4 is
    weight-read-bound, so removing the per-cell dequant work takes the
    projection dots to the int8 DMA floor.  One more quantization error
    term (activations at 1/127 per token); serving-only, like
    ``requantize_merge_adapters`` -- training and in-training eval keep
    the exact dequant paths.

    Returns the number of layers switched (int8 layers only; int4's
    grouped scales cannot ride the int32 accumulator -- group partials
    would need scale-weighted summation before accumulation)."""
    from sparse_matrix_fine_tuning_tpu.peft.surgery import _iter_parents
    n = 0
    candidates = [model] if isinstance(model, MonarchLinear) else []
    candidates += [child for _, _, child in _iter_parents(model)]
    for child in candidates:
        if (isinstance(child, MonarchLinear)
                and getattr(child, "quant_bits", 0) == 8):
            child.serve_w8a8 = True
            n += 1
    return n


def requantize_merge_adapters(model: nnx.Module) -> int:
    """SERVING-ONLY adapter merge for quantized bases: fold each unmerged
    Monarch adapter into its int codes by dequantize -> add delta ->
    requantize (same bits/group).

    A quantized base cannot absorb the bf16 adapter delta exactly
    (``MonarchLinear._check_mergeable`` guards the exact merge), so the
    quantized decode configs pay per-layer adapter ops the bf16 config
    merges away -- 7 x n_layers extra ops every decode step.  For serving
    that trade can be reversed: requantizing ``W + delta`` carries ONE
    quantization of the merged matrix instead of quant(W) + exact adapter,
    the same noise class as quantizing a fine-tuned dense checkpoint
    (the delta is adapter-scale, far below absmax, so group scales barely
    move).  This is deliberately NOT what training/eval-during-training
    uses: it is lossy and one-way (``unmerge_adapter`` on a requantized
    layer still raises -- the exact factors remain in ``blkdiag*`` but the
    dense codes can no longer subtract the delta exactly).

    Returns the number of layers merged.  Layers with branch transforms
    the fold cannot express exactly at serving time (dropout is identity
    at eval but Scaler/mult-factor wrap the branch) are skipped, as are
    already-merged or unquantized layers (use ``merge_all_adapters`` for
    those BEFORE ``quantize_frozen_base``)."""
    from sparse_matrix_fine_tuning_tpu.peft.surgery import _iter_parents
    quant4 = jax.jit(_quantize_int4_device, static_argnums=(1,))
    n = 0
    candidates = [model] if isinstance(model, MonarchLinear) else []
    candidates += [child for _, _, child in _iter_parents(model)]
    for child in candidates:
        if not (isinstance(child, MonarchLinear) and child.as_adapter
                and not child.merged and getattr(child, "quant_bits", 0)):
            continue
        if child.scaler is not None or child.use_mult_factor:
            print(f"[quant] requantize-merge skipping a layer with "
                  f"scaler/mult-factor (branch transforms do not fold)")
            continue
        bits, group = child.quant_bits, child.quant_group
        q, scales = child.dense[...], child.dense_scales[...]
        if bits == 8:
            w = dequantize_int8(q, scales, jnp.float32)
        else:
            w = dequantize_int4(q, scales, group, jnp.float32)
        w = w + child.adapter_dense_equivalent().astype(jnp.float32)
        if bits == 8:
            q2, s2 = _quantize_int8_device(w)
        else:
            q2, s2 = quant4(w, group)
        child.dense.set_value(q2)
        child.dense_scales.set_value(s2)
        child.merged = True
        n += 1
    return n


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
