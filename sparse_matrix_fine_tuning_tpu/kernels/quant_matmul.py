"""Fused dequantize-matmul Pallas TPU kernels for the quantized frozen base.

The qlora-flow frozen base (reference qlora/qlora_monarch.py; quantization
there is commented out -- qlora/qlora.py:294-302 -- so this path is a
capability the reference only gestures at) stores dense weights as int8 or
packed int4 + absmax scales (quant/).  XLA cannot fuse the dequantisation
into a dot's operand read: it materialises the dequantized bf16 matrix in
HBM every step, so the quantized forward costs MORE traffic than bf16
(packed read + bf16 write + bf16 read; measured ~40 us for a (5632, 2048)
batch-4 int4 dot whose packed bytes alone stream in ~7 us).  These
kernels dequantize in VMEM: HBM traffic is the packed bytes + scales
only, a 4x (int4) / 2x (int8) cut vs bf16.

Layouts (quant/ canonical, IN-MAJOR -- the dequant scale broadcast must
ride a LEADING axis so it never relayouts the lane dimension):

  int4: ``packed_t (in/2, out)`` uint8, byte (j, o) = input columns j
        (low nibble) and j + in/2 (high nibble) of output row o, offset-8;
        ``scales (in/group, out)`` f32.  Broadcast ``(ns, out) ->
        (ns, g, out) -> (in/2, out)`` collapses leading dims only.
  int8: ``q_t (in, out)`` int8; ``scales (1, out)`` f32 (per output row),
        a plain lane-aligned broadcast.

Forward:  y (b, out) = x (b, in) @ W (in, out)          [int4: two halves]
Backward (frozen weights -- dx only, no dw):
          dx (b, in) = dy (b, out) @ W^T
          accumulated over out-chunks across sequential grid steps
          (TPU grids are sequential per core; no atomics needed).

Both are memory-bound on the packed bytes; MXU utilisation is secondary
(decode batches are tiny).  VMEM budgets come from
``monarch_pallas._vmem_budgets_or_none`` (per-device-kind; on untuned TPU
generations the ``*_supported`` gates return False and callers take the
XLA split-dot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    _vmem_budgets_or_none)

Array = jax.Array


def _pick_tiles(b: int, in_f: int, rows: int, out_f: int,
                cell_bytes: int, xb: int, bwd: bool):
    """(row tile, out-column tile) picker for both quant kernels, or None
    if no tiling fits this device's VMEM (callers fall back to the XLA
    path; also None on untuned TPU generations).

    Charged per grid step, per direction.  Forward: the (tb, in) x block
    in the activation dtype (``xb`` bytes/elem) double-buffered, the
    packed operand + its dequant temps at ``cell_bytes`` per (row, col)
    over (rows, to), and the (tb, to) f32 accumulator + output block.
    Backward: the (tb, to) dy block double-buffered, the same dequant
    temps, and the resident (tb, in) f32 dx accumulator.  Wide 7B-class
    in_features (11008) need small row tiles: prefer wide out-column
    tiles first (amortise the per-chunk dequant), then shrink rows."""
    budgets = _vmem_budgets_or_none()
    if budgets is None:
        return None
    budget = budgets[1]
    for tb in (min(b, 256), 128, 64, 32):
        if tb > b:
            continue
        for to in (512, 384, 256, 128):
            if out_f % to:
                continue
            weight_side = rows * to * cell_bytes
            if bwd:
                need = (2 * xb * tb * to     # dy blocks, double-buffered
                        + weight_side
                        + 4 * tb * in_f)     # f32 dx block (resident)
            else:
                need = (2 * xb * tb * in_f   # x blocks, double-buffered
                        + weight_side
                        + (4 + xb) * tb * to)  # f32 accumulator + out block
            if need <= budget:
                return tb, to
    return None


def _pick_fwd_tiles(b: int, in_f: int, h: int, out_f: int, xb: int = 2,
                    bwd: bool = False):
    """int4 tiles: packed (h, to) uint8 x2 buffers, plus the int32 nibble
    temp + f32 scale broadcast + activation-dtype dequant per cell."""
    return _pick_tiles(b, in_f, h, out_f, cell_bytes=2 + 4 + 4 + xb, xb=xb,
                       bwd=bwd)


def _unpack_scaled(p, s_ref, g: int, nibble: str, dtype):
    """Dequantized (h, to) weight half in ``dtype``.  All arithmetic in
    int32/f32: this Mosaic legalizes no 8-bit arithmetic (uint8->f32
    casts, int8 subtract, and uint8 shifts all fail to legalize), so the
    nibble unpack runs on widened lanes.  The dequant is VPU-bound as a
    result (~23 us for 5.8 MB packed whose DMA floor is ~7 us) but still
    beats both the XLA int4 path (~33 us, materialized dequant) and the
    bf16 dense dot (~26 us) at decode shapes."""
    h, to = p.shape
    pi = p if p.dtype == jnp.int32 else p.astype(jnp.int32)
    qi = (pi & 15) - 8 if nibble == "lo" else (pi >> 4) - 8
    s = s_ref[...]  # (ns2, to) f32
    ns2 = s.shape[0]
    sb = jnp.broadcast_to(s[:, None, :], (ns2, g, to)).reshape(h, to)
    return (qi.astype(jnp.float32) * sb).astype(dtype)


def _fwd_kernel(x_ref, p_ref, slo_ref, shi_ref, o_ref, *, g: int,
                f32dot: bool):
    """``f32dot`` (decode-size batches, b <= 64): the dequantized weight
    half stays f32 and the dot runs on f32 operands -- drops the per-cell
    f32 -> bf16 downcast, the largest single saving measured across seven
    arithmetic variants on the v5e (scripts/exp_int4_dequant_variants.py:
    15.5 -> 11.7 us at the (4, 2048)x(2048, 5632) decode dot, exact vs
    the f32 oracle).  At training batches the f32 MXU rate (1/8 of bf16)
    would dominate, so large-b grids keep the bf16 operands."""
    h, _ = p_ref.shape
    p = p_ref[...].astype(jnp.int32)  # widen once, shared by both halves

    def half_dot(nibble, s_ref, xh):
        w = _unpack_scaled(p, s_ref, g, nibble,
                           jnp.float32 if f32dot else x_ref.dtype)
        if f32dot:
            xh = xh.astype(jnp.float32)
        return jax.lax.dot_general(
            xh, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = half_dot("lo", slo_ref, x_ref[:, :h])
    acc += half_dot("hi", shi_ref, x_ref[:, h:])
    o_ref[...] = acc.astype(o_ref.dtype)


def _bwd_kernel(dy_ref, p_ref, slo_ref, shi_ref, dx_ref, *, g: int):
    """dx accumulates across sequential out-chunk grid steps in an f32
    output block (bf16 += over ~out/to chunks measures 1.5-2.5% dx error
    vs f32 -- the XLA paths accumulate dots in f32, so must we)."""
    k = pl.program_id(1)
    h, _ = p_ref.shape
    p = p_ref[...].astype(jnp.int32)

    @pl.when(k == 0)
    def _init():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    def half_dxt(nibble, s_ref):
        w = _unpack_scaled(p, s_ref, g, nibble, dy_ref.dtype)
        # (tb, to) x (h, to) -> (tb, h), contracting the out-chunk
        return jax.lax.dot_general(
            dy_ref[...], w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dx_ref[:, :h] += half_dxt("lo", slo_ref)
    dx_ref[:, h:] += half_dxt("hi", shi_ref)


def _fwd_call(x2d, packed_t, slo, shi, g, interpret):
    b, in_f = x2d.shape
    h, out_f = packed_t.shape
    tiles = _pick_fwd_tiles(b, in_f, h, out_f, x2d.dtype.itemsize)
    assert tiles is not None, "gate with int4_matmul_supported first"
    tb, to = tiles
    grid = (pl.cdiv(b, tb), out_f // to)  # row-major: x block reused over j
    ns2 = slo.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, g=g, f32dot=b <= 64),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, in_f), lambda i, j: (i, 0)),
            pl.BlockSpec((h, to), lambda i, j: (0, j)),
            pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
            pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tb, to), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, out_f), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * in_f * out_f,
            bytes_accessed=h * out_f + 8 * ns2 * out_f + 2 * b * (in_f + out_f),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, packed_t, slo, shi)


def _bwd_call(dy2d, packed_t, slo, shi, g, interpret):
    b, out_f = dy2d.shape
    h, _ = packed_t.shape
    in_f = 2 * h
    tiles = _pick_fwd_tiles(b, in_f, h, out_f, dy2d.dtype.itemsize, bwd=True)
    if tiles is None:
        # Defensive: with today's charge formulas a forward plan strictly
        # implies a backward plan (cotangents always carry the forward
        # output's shape/dtype, and fwd_need > bwd_need at every candidate
        # tile), but the *_supported gates only certify the forward -- if
        # the per-direction charges ever diverge the backward must fall
        # back to exact XLA math rather than crash at trace time
        # (materialises the dequant in HBM, correct but slower).
        from sparse_matrix_fine_tuning_tpu.quant import (  # lazy: no cycle
            dequantize_int4_halves)
        lo, hi = dequantize_int4_halves(
            packed_t, jnp.concatenate([slo, shi], 0), g, dy2d.dtype)
        contract = (((1,), (1,)), ((), ()))
        dx = jnp.concatenate(
            [jax.lax.dot_general(dy2d, lo, contract,
                                 preferred_element_type=jnp.float32),
             jax.lax.dot_general(dy2d, hi, contract,
                                 preferred_element_type=jnp.float32)], -1)
        return dx.astype(dy2d.dtype)
    tb, to = tiles
    grid = (pl.cdiv(b, tb), out_f // to)  # k (out chunks) innermost
    ns2 = slo.shape[0]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, to), lambda i, k: (i, k)),
            pl.BlockSpec((h, to), lambda i, k: (0, k)),
            pl.BlockSpec((ns2, to), lambda i, k: (0, k)),
            pl.BlockSpec((ns2, to), lambda i, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((tb, in_f), lambda i, k: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, in_f), jnp.float32),
        interpret=interpret,
    )(dy2d, packed_t, slo, shi).astype(dy2d.dtype)


@functools.lru_cache(maxsize=2)
def _int4_matmul_vjp(g: int, interpret: bool):
    @jax.custom_vjp
    def mm(x, packed_t, slo, shi):
        *batch, in_f = x.shape
        out = _fwd_call(x.reshape(-1, in_f), packed_t, slo, shi, g, interpret)
        return out.reshape(*batch, out.shape[-1])

    def mm_fwd(x, packed_t, slo, shi):
        return mm(x, packed_t, slo, shi), (x.shape, packed_t, slo, shi)

    def mm_bwd(res, dout):
        x_shape, packed_t, slo, shi = res
        m = dout.shape[-1]
        dx = _bwd_call(dout.reshape(-1, m), packed_t, slo, shi, g, interpret)
        return (dx.reshape(x_shape),
                np.zeros(packed_t.shape, jax.dtypes.float0),
                jnp.zeros_like(slo), jnp.zeros_like(shi))

    mm.defvjp(mm_fwd, mm_bwd)
    return mm


def int4_matmul_supported(x_shape, packed_t_shape, group: int,
                          itemsize: int = 2) -> bool:
    """Shapes the kernel handles: lane dims multiples of 128, the packed
    sublane (in/2) a multiple of the group, and a tile plan that fits this
    device's VMEM at the activation dtype's ``itemsize`` (False on untuned
    TPU generations -- callers fall back to the XLA split-dot path).

    ``h`` itself must be a multiple of 128: the kernels slice the x/dx
    lane dimension at offset ``h`` (``x_ref[:, h:]``), and Mosaic cannot
    legalize a lane-dim slice at a non-tile-aligned offset (every
    on-chip-validated shape has h % 128 == 0; interpret mode would accept
    the others and then fail on real hardware)."""
    in_f = x_shape[-1]
    h, out_f = packed_t_shape
    if 2 * h != in_f or out_f % 128 or h % 128 or h % group:
        return False
    ns = in_f // group
    if ns % 2:
        return False
    b = 1
    for d in x_shape[:-1]:
        b *= d
    return _pick_fwd_tiles(b, in_f, h, out_f, itemsize) is not None


def int4_matmul(x: Array, packed_t: Array, scales: Array, group: int,
                interpret: bool = False) -> Array:
    """``y = x @ dequant(packed_t, scales)`` with dequantisation fused in
    VMEM (never materialised to HBM).

    Args:
      x: (..., in) bf16/f32 activations.
      packed_t: (in/2, out) uint8, in-major packed-halves int4 (quant/).
      scales: (in/group, out) f32 grouped absmax scales; rows [0, ns/2)
        scale the low-nibble half, [ns/2, ns) the high-nibble half.
      group: quantisation group size along in.
    Returns: (..., out) in x.dtype.  Backward produces dx only (the packed
    base is frozen); scale cotangents are structural zeros.
    """
    ns = scales.shape[0]
    slo, shi = scales[: ns // 2], scales[ns // 2:]
    return _int4_matmul_vjp(int(group), bool(interpret))(x, packed_t, slo, shi)


# ---------------------------------------------------------------------------
# int8: per-output-row scales -- same structure, simpler dequant


def _fwd8_kernel(x_ref, q_ref, s_ref, o_ref):
    w = (q_ref[...].astype(jnp.float32) * s_ref[...]).astype(x_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd8_kernel(dy_ref, q_ref, s_ref, dx_ref):
    # f32 accumulation across out-chunks, as in _bwd_kernel
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    w = (q_ref[...].astype(jnp.float32) * s_ref[...]).astype(dy_ref.dtype)
    dx_ref[...] += jax.lax.dot_general(
        dy_ref[...], w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pick8_tiles(b: int, in_f: int, out_f: int, xb: int = 2,
                 bwd: bool = False):
    """int8 tiles: q (in, to) int8 x2 buffers, plus the f32 widening +
    activation-dtype dequant per cell."""
    return _pick_tiles(b, in_f, in_f, out_f, cell_bytes=2 + 4 + xb, xb=xb,
                       bwd=bwd)


@functools.lru_cache(maxsize=2)
def _int8_matmul_vjp(interpret: bool):
    @jax.custom_vjp
    def mm(x, q_t, scales):
        *batch, in_f = x.shape
        x2d = x.reshape(-1, in_f)
        b = x2d.shape[0]
        out_f = q_t.shape[1]
        tiles = _pick8_tiles(b, in_f, out_f, x2d.dtype.itemsize)
        assert tiles is not None, "gate with int8_matmul_supported first"
        tb, to = tiles
        out = pl.pallas_call(
            _fwd8_kernel,
            grid=(pl.cdiv(b, tb), out_f // to),
            in_specs=[
                pl.BlockSpec((tb, in_f), lambda i, j: (i, 0)),
                pl.BlockSpec((in_f, to), lambda i, j: (0, j)),
                pl.BlockSpec((1, to), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((tb, to), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((b, out_f), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * in_f * out_f,
                bytes_accessed=in_f * out_f + 2 * b * (in_f + out_f),
                transcendentals=0),
            interpret=interpret,
        )(x2d, q_t, scales)
        return out.reshape(*batch, out_f)

    def mm_fwd(x, q_t, scales):
        return mm(x, q_t, scales), (x.shape, q_t, scales)

    def mm_bwd(res, dout):
        x_shape, q_t, scales = res
        in_f, out_f = q_t.shape
        dy2d = dout.reshape(-1, out_f)
        b = dy2d.shape[0]
        tiles = _pick8_tiles(b, in_f, out_f, dy2d.dtype.itemsize, bwd=True)
        if tiles is None:  # defensive exact-XLA fallback (see _bwd_call)
            w = (q_t.astype(jnp.float32) * scales).astype(dy2d.dtype)
            dx = jax.lax.dot_general(
                dy2d, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dout.dtype)
            return (dx.reshape(x_shape),
                    np.zeros(q_t.shape, jax.dtypes.float0),
                    jnp.zeros_like(scales))
        tb, to = tiles
        dx = pl.pallas_call(
            _bwd8_kernel,
            grid=(pl.cdiv(b, tb), out_f // to),  # out chunks innermost
            in_specs=[
                pl.BlockSpec((tb, to), lambda i, k: (i, k)),
                pl.BlockSpec((in_f, to), lambda i, k: (0, k)),
                pl.BlockSpec((1, to), lambda i, k: (0, k)),
            ],
            out_specs=pl.BlockSpec((tb, in_f), lambda i, k: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, in_f), jnp.float32),
            interpret=interpret,
        )(dy2d, q_t, scales).astype(dout.dtype)
        return (dx.reshape(x_shape),
                np.zeros(q_t.shape, jax.dtypes.float0),
                jnp.zeros_like(scales))

    mm.defvjp(mm_fwd, mm_bwd)
    return mm


def int8_matmul_supported(x_shape, q_t_shape, itemsize: int = 2) -> bool:
    """Lane dims multiples of 128, int8 sublane a multiple of 32, and a
    tile plan that fits VMEM at the activation dtype's ``itemsize``
    (False on untuned TPU generations -- callers fall back to XLA)."""
    in_f = x_shape[-1]
    if q_t_shape[0] != in_f or q_t_shape[1] % 128 or in_f % 32:
        return False
    b = 1
    for d in x_shape[:-1]:
        b *= d
    return _pick8_tiles(b, in_f, q_t_shape[1], itemsize) is not None


def int8_matmul(x: Array, q_t: Array, scales: Array,
                interpret: bool = False) -> Array:
    """``y = x @ (q_t * scales)`` with the int8 dequant fused in VMEM.

    Args:
      x: (..., in) activations.
      q_t: (in, out) int8, in-major.
      scales: (1, out) f32 per-output-row absmax scales.
    Returns: (..., out) in x.dtype; backward produces dx only.
    """
    return _int8_matmul_vjp(bool(interpret))(x, q_t, scales)
