"""[EXPERIMENT -- on-chip A/B] int4 in-VMEM dequant arithmetic variants.

The production kernel (kernels/quant_matmul.py) is VPU-bound on the nibble
unpack+dequant (~23 us for 5.8 MB packed whose DMA floor is ~7 us), which
is why end-to-end int4 decode (results/decode_bits.json) loses to int8
despite reading half the bytes.  Per weight cell the production unpack
runs: shared uint8->int32 widen, AND (or SHIFT), SUB 8, int32->f32 cast,
f32 scale MUL (with the (h, to) f32 scale broadcast materialised), cast
to the activation dtype -- ~6 VPU passes over every (h, to) cell.  This
script slope-times arithmetic variants of the same kernel on the real
chip, at the PRODUCTION tile picks (_pick_fwd_tiles; the previous
revision hard-coded to=512 tiles that now exceed the scoped-VMEM budget
at 7B shapes):

  f32mul  -- production baseline (above).
  bf16mul -- int32->bf16 cast and a bf16 scale MUL: drops the final
             downcast and lets the VPU pack 2 bf16 lanes per f32 lane.
             bf16(q) is exact for |q| <= 8; scale rounding ~2^-9, far
             below the int4 quantisation step.
  mul3d   -- bf16mul with the multiply done in the (ns2, g, to) view
             against s (ns2, 1, to), so the scale broadcast is never
             materialised as an (h, to) array (Mosaic can ride the
             broadcast operand).
  ucorr   -- drop the per-cell "- 8" entirely: dequantize UNSIGNED
             nibbles (u * s, u in [0, 15]) in the kernel and correct
             outside with the rank-ns closed form
                 y -= 8 * (group_sums(x) @ s)
             (group sums over the contraction dim; an (b, ns) x (ns, out)
             XLA dot, ~1/64th of the main dot's FLOPs).
  ugdot   -- move the scale MUL off the weight cells too: per-cell work
             is only widen+AND/SHIFT+int32->bf16 cast; the matmul runs as
             an ns2-batched (tb, g) x (g, to) dot_general and the scales
             multiply the (ns2, tb, to) partials (tb*to cells per group
             instead of g*to), summed over ns2.  Unsigned + the same
             external correction as ucorr.  x arrives pre-split as
             (ns2, tb, g) per half (host-side reshape; decode b is tiny).

Run on TPU:  timeout 1800 python -u scripts/exp_int4_dequant_variants.py
Correctness of each variant is asserted against the XLA dequant oracle
before timing.  If a variant wins by >10%, port it into
kernels/quant_matmul._unpack_scaled and re-run scripts/verify_tpu_kernel.py
plus scripts/bench_decode_bits.py.
"""

import functools
import statistics
import sys

sys.path.insert(0, ".")

import os

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import _pick_fwd_tiles
from sparse_matrix_fine_tuning_tpu.quant import dequantize_int4, quantize_int4
from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn

INTERPRET = jax.default_backend() != "tpu"
if INTERPRET:
    print("WARNING: not on TPU -- interpret-mode correctness check only, "
          "timings meaningless")


# --- in-kernel unpack variants (p already widened to int32) ---------------

def _unpack_f32mul(p, s, g, nibble, dtype):
    h, to = p.shape
    qi = (p & 15) - 8 if nibble == "lo" else (p >> 4) - 8
    ns2 = s.shape[0]
    sb = jnp.broadcast_to(s[:, None, :], (ns2, g, to)).reshape(h, to)
    return (qi.astype(jnp.float32) * sb).astype(dtype)


def _unpack_bf16mul(p, s, g, nibble, dtype):
    h, to = p.shape
    qi = (p & 15) - 8 if nibble == "lo" else (p >> 4) - 8
    ns2 = s.shape[0]
    sb = jnp.broadcast_to(s.astype(dtype)[:, None, :],
                          (ns2, g, to)).reshape(h, to)
    return qi.astype(dtype) * sb


def _unpack_mul3d(p, s, g, nibble, dtype):
    h, to = p.shape
    qi = (p & 15) - 8 if nibble == "lo" else (p >> 4) - 8
    ns2 = s.shape[0]
    q3 = qi.astype(dtype).reshape(ns2, g, to)
    return (q3 * s.astype(dtype)[:, None, :]).reshape(h, to)


def _unpack_ucorr(p, s, g, nibble, dtype):
    # unsigned: [0, 15]; caller subtracts 8 * (group_sums(x) @ s) outside
    h, to = p.shape
    qu = p & 15 if nibble == "lo" else p >> 4
    ns2 = s.shape[0]
    q3 = qu.astype(dtype).reshape(ns2, g, to)
    return (q3 * s.astype(dtype)[:, None, :]).reshape(h, to)


def _fwd_kernel(x_ref, p_ref, slo_ref, shi_ref, o_ref, *, g, unpack):
    h, _ = p_ref.shape
    p = p_ref[...].astype(jnp.int32)

    def half(nibble, s_ref, xh):
        w = unpack(p, s_ref[...], g, nibble, x_ref.dtype)
        return jax.lax.dot_general(
            xh, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = half("lo", slo_ref, x_ref[:, :h])
    acc += half("hi", shi_ref, x_ref[:, h:])
    o_ref[...] = acc.astype(o_ref.dtype)


def _gdot_kernel(xlo_ref, xhi_ref, p_ref, slo_ref, shi_ref, o_ref, *, g):
    """ns2-batched group dots: scales never touch the (h, to) cells."""
    h, to = p_ref.shape
    p = p_ref[...].astype(jnp.int32)

    def half(nibble, s_ref, x3):          # x3 (ns2, tb, g)
        qu = p & 15 if nibble == "lo" else p >> 4
        ns2 = s_ref.shape[0]
        w3 = qu.astype(x3.dtype).reshape(ns2, g, to)
        t = jax.lax.dot_general(          # (ns2, tb, to) f32
            x3, w3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(t * s_ref[...][:, None, :], axis=0)

    acc = half("lo", slo_ref, xlo_ref[...])
    acc += half("hi", shi_ref, xhi_ref[...])
    o_ref[...] = acc.astype(o_ref.dtype)


def _ukern_kernel(x_ref, p_ref, slo_ref, shi_ref, o_ref, *, g, variant):
    """Leaner in-kernel arithmetic.  ``f32dot``: the signed unpack but the
    main dot runs on f32 operands (skips the per-cell bf16 downcast; at
    decode batch the MXU cost is negligible).  ``u2dot``: unsigned
    nibbles, y = x @ (qu * sb) - 8 * (x @ sb) -- the offset-8 correction
    is a SECOND MXU dot against the scale broadcast that is materialised
    anyway, so per-cell VPU work drops to extract + convert + scale-mul
    (no SUB, no downcast).  NB the earlier group-sum formulation needed a
    lane-dim split reshape that Mosaic rejects on real hardware."""
    h, to = p_ref.shape
    p = p_ref[...].astype(jnp.int32)

    def half(nibble, s_ref, xh):  # xh (tb, h)
        s = s_ref[...]  # (ns2, to)
        ns2 = s.shape[0]
        sb = jnp.broadcast_to(s[:, None, :], (ns2, g, to)).reshape(h, to)
        xf = xh.astype(jnp.float32)
        if variant == "f32dot":
            qi = (p & 15) - 8 if nibble == "lo" else (p >> 4) - 8
            return jax.lax.dot_general(
                xf, qi.astype(jnp.float32) * sb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        qu = (p & 15) if nibble == "lo" else (p >> 4)
        acc = jax.lax.dot_general(
            xf, qu.astype(jnp.float32) * sb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        corr = jax.lax.dot_general(
            xf, sb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc - 8.0 * corr

    o_ref[...] = (half("lo", slo_ref, x_ref[:, :h])
                  + half("hi", shi_ref, x_ref[:, h:])).astype(o_ref.dtype)


def make_ukern_call(variant):
    def call(x2d, packed_t, slo, shi, g, tb, to):
        b, in_f = x2d.shape
        h, out_f = packed_t.shape
        ns2 = slo.shape[0]
        return pl.pallas_call(
            functools.partial(_ukern_kernel, g=g, variant=variant),
            grid=(pl.cdiv(b, tb), out_f // to),
            in_specs=[
                pl.BlockSpec((tb, in_f), lambda i, j: (i, 0)),
                pl.BlockSpec((h, to), lambda i, j: (0, j)),
                pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
                pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((tb, to), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((b, out_f), x2d.dtype),
            interpret=INTERPRET,
        )(x2d, packed_t, slo, shi)
    return call


def make_call(unpack):
    def call(x2d, packed_t, slo, shi, g, tb, to):
        b, in_f = x2d.shape
        h, out_f = packed_t.shape
        ns2 = slo.shape[0]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, g=g, unpack=unpack),
            grid=(pl.cdiv(b, tb), out_f // to),
            in_specs=[
                pl.BlockSpec((tb, in_f), lambda i, j: (i, 0)),
                pl.BlockSpec((h, to), lambda i, j: (0, j)),
                pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
                pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((tb, to), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((b, out_f), x2d.dtype),
            interpret=INTERPRET,
        )(x2d, packed_t, slo, shi)
    return call


def gdot_call(x2d, packed_t, slo, shi, g, tb, to):
    b, in_f = x2d.shape
    h, out_f = packed_t.shape
    ns2 = slo.shape[0]
    # (b, h) halves -> (ns2, b, g): XLA-side relayout, outside the kernel
    xlo = jnp.transpose(x2d[:, :h].reshape(b, ns2, g), (1, 0, 2))
    xhi = jnp.transpose(x2d[:, h:].reshape(b, ns2, g), (1, 0, 2))
    return pl.pallas_call(
        functools.partial(_gdot_kernel, g=g),
        grid=(pl.cdiv(b, tb), out_f // to),
        in_specs=[
            pl.BlockSpec((ns2, tb, g), lambda i, j: (0, i, 0)),
            pl.BlockSpec((ns2, tb, g), lambda i, j: (0, i, 0)),
            pl.BlockSpec((h, to), lambda i, j: (0, j)),
            pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
            pl.BlockSpec((ns2, to), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tb, to), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, out_f), x2d.dtype),
        interpret=INTERPRET,
    )(xlo, xhi, packed_t, slo, shi)


def unsigned_correction(x2d, slo, shi, g):
    """8 * (group_sums(x) @ s) per half, summed -- the external term that
    converts unsigned-nibble dequant back to offset-8 signed."""
    b, in_f = x2d.shape
    h = in_f // 2
    ns2 = slo.shape[0]

    def half(xh, s):
        xs = jnp.sum(xh.reshape(b, ns2, g).astype(jnp.float32), axis=-1)
        return jax.lax.dot_general(
            xs, s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return 8.0 * (half(x2d[:, :h], slo) + half(x2d[:, h:], shi))


def main():
    G = 64
    # TinyLlama-1.1B decode shapes (the decode_bits bench model) + the 7B
    # down_proj (widest in_features; exercises the small-row-tile regime)
    for B, IN, OUT in ((4, 5632, 2048), (4, 2048, 5632), (4, 11008, 4096),
                       (256, 11008, 4096)):
        tiles = _pick_fwd_tiles(B, IN, IN // 2, OUT, 2)
        if tiles is None:
            print(f"--- B={B} {IN}->{OUT}: no production tile plan; skip")
            continue
        tb, to = tiles
        rng = np.random.default_rng(0)
        w = (rng.normal(size=(OUT, IN)) * 0.02).astype(np.float32)
        packed_t, scales = quantize_int4(w, group_size=G)
        packed_t, scales = jnp.asarray(packed_t), jnp.asarray(scales)
        x = jnp.asarray(rng.normal(size=(B, IN)), jnp.bfloat16)
        ns = scales.shape[0]
        slo, shi = scales[: ns // 2], scales[ns // 2:]

        wd = dequantize_int4(packed_t, scales, G, jnp.bfloat16)
        oracle = jax.jit(lambda x: jax.lax.dot_general(
            x, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))(x)

        def plain(call):
            return lambda x: call(x, packed_t, slo, shi, G, tb, to)

        def corrected(call):
            def fn(x):
                y = call(x, packed_t, slo, shi, G, tb, to)
                return (y.astype(jnp.float32)
                        - unsigned_correction(x, slo, shi, G)).astype(x.dtype)
            return fn

        variants = {
            "f32mul": plain(make_call(_unpack_f32mul)),
            "bf16mul": plain(make_call(_unpack_bf16mul)),
            "mul3d": plain(make_call(_unpack_mul3d)),
            "ucorr": corrected(make_call(_unpack_ucorr)),
            "ugdot": corrected(gdot_call),
            "f32dot": plain(make_ukern_call("f32dot")),
            "u2dot": plain(make_ukern_call("u2dot")),
        }
        print(f"--- B={B} {IN}->{OUT} (production tiles tb={tb}, to={to})")
        fns = {}
        for name, f in variants.items():
            fn = jax.jit(f)
            try:
                y = fn(x)
            except Exception as e:  # noqa: BLE001 -- speculative variants may
                print(f"{name:9s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:140]}")       # not legalize; keep going
                continue
            err = float(jnp.abs(y.astype(jnp.float32)
                                - oracle.astype(jnp.float32)).max())
            scale = float(jnp.abs(oracle.astype(jnp.float32)).max())
            print(f"{name:9s} max|err| {err:.4f} (out scale {scale:.2f})")
            assert err <= 0.02 * max(scale, 1.0), f"{name} diverges"
            fns[name] = fn
        if INTERPRET:
            continue
        for name, fn in fns.items():
            t = statistics.median(
                time_fn(fn, (x,), iters=256, chain_argnum=0)
                for _ in range(3))
            print(f"{name:9s} {t*1e6:7.1f} us")


if __name__ == "__main__":
    main()
