"""[EXPERIMENT -- on-chip A/B] int4 in-VMEM dequant arithmetic variants.

The production kernel (kernels/quant_matmul.py) is VPU-bound on the nibble
unpack+dequant (~23 us for 5.8 MB packed whose DMA floor is ~7 us).  Per
cell it runs: shared uint8->int32 widen, AND/SHIFT, SUB 8, int32->f32
cast, f32 scale MUL, cast to the activation dtype.  This script slope-
times three arithmetic variants of the same kernel on the real chip:

  f32mul  -- production: (int32->f32 cast) * f32-scale -> bf16
  bf16mul -- cast int32->bf16 and multiply by bf16 scales (if the VPU
             packs 2 bf16 lanes per f32 lane this halves MUL+store work;
             bf16(q) is exact for |q|<=8 and the scale rounding is ~2^-9,
             far below the int4 quantisation step)
  biasfold-- (q & 15) * s - (8*s) with the 8*s bias precomputed on the
             host: replaces the per-cell integer SUB with an f32 SUB
             after the MUL (same op count; tests whether int32 ALU ops
             are the expensive ones)

Run on TPU:  timeout 1200 python -u scripts/exp_int4_dequant_variants.py
Correctness of each variant is asserted against the XLA dequant oracle
before timing.  If a variant wins by >10%, port it into
kernels/quant_matmul._unpack_scaled and re-run scripts/verify_tpu_kernel.py.
"""

import functools
import statistics
import sys

sys.path.insert(0, ".")

import os

import jax

# honor an explicit JAX_PLATFORMS=cpu even though the sandbox's
# sitecustomize pre-registers the tunnelled TPU plugin (conftest pattern)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from sparse_matrix_fine_tuning_tpu.quant import dequantize_int4, quantize_int4
from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn

INTERPRET = jax.default_backend() != "tpu"
if INTERPRET:
    print("WARNING: not on TPU -- interpret-mode correctness check only, "
          "timings meaningless")


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


def _unpack_biasfold(p, s, g, nibble, dtype):
    # s here is stacked (2, ns2, to): [scale, 8*scale]
    h, to = p.shape
    qu = p & 15 if nibble == "lo" else p >> 4
    ns2 = s.shape[1]
    sb = jnp.broadcast_to(s[0][:, None, :], (ns2, g, to)).reshape(h, to)
    bb = jnp.broadcast_to(s[1][:, None, :], (ns2, g, to)).reshape(h, to)
    return (qu.astype(jnp.float32) * sb - bb).astype(dtype)


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


def make_call(unpack, stacked_scales):
    def call(x2d, packed_t, slo, shi, g, tb, to):
        b, in_f = x2d.shape
        h, out_f = packed_t.shape
        if stacked_scales:
            ns2 = slo.shape[1]
            spec = pl.BlockSpec((2, ns2, to), lambda i, j: (0, 0, j))
        else:
            ns2 = slo.shape[0]
            spec = pl.BlockSpec((ns2, to), lambda i, j: (0, j))
        return pl.pallas_call(
            functools.partial(_fwd_kernel, g=g, unpack=unpack),
            grid=(pl.cdiv(b, tb), out_f // to),
            in_specs=[
                pl.BlockSpec((tb, in_f), lambda i, j: (i, 0)),
                pl.BlockSpec((h, to), lambda i, j: (0, j)),
                spec, spec,
            ],
            out_specs=pl.BlockSpec((tb, to), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((b, out_f), x2d.dtype),
            interpret=INTERPRET,
        )(x2d, packed_t, slo, shi)
    return call


def main():
    G = 64
    # 7B down_proj decode shape (the int4 kernel's headline win) + a
    # training-ish batch
    for B, IN, OUT, tb, to in ((4, 11008, 4096, 4, 512),
                               (256, 11008, 4096, 128, 512),
                               (4, 4096, 11008, 4, 256)):  # 11008 % 512 != 0
        rng = np.random.default_rng(0)
        w = (rng.normal(size=(OUT, IN)) * 0.02).astype(np.float32)
        packed_t, scales = quantize_int4(w, group_size=G)
        packed_t, scales = jnp.asarray(packed_t), jnp.asarray(scales)
        x = jnp.asarray(rng.normal(size=(B, IN)), jnp.bfloat16)
        ns = scales.shape[0]
        slo, shi = scales[: ns // 2], scales[ns // 2:]
        slo2 = jnp.stack([slo, 8.0 * slo])  # biasfold operands
        shi2 = jnp.stack([shi, 8.0 * shi])

        wd = dequantize_int4(packed_t, scales, G, jnp.bfloat16)
        oracle = jax.jit(lambda x: jax.lax.dot_general(
            x, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))(x)

        variants = {
            "f32mul": (make_call(_unpack_f32mul, False), (slo, shi)),
            "bf16mul": (make_call(_unpack_bf16mul, False), (slo, shi)),
            "biasfold": (make_call(_unpack_biasfold, True), (slo2, shi2)),
        }
        print(f"--- B={B} {IN}->{OUT} (tb={tb}, to={to})")
        fns = {}
        for name, (call, ss) in variants.items():
            fn = jax.jit(lambda x, c=call, ss=ss: c(x, packed_t, *ss, G, tb, to))
            y = fn(x)
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
