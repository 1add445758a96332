"""In-context dw-pass shootout inside the bench.py harness.

The merged-training path's only per-micro-batch adapter cost is the
factor-gradient pass.  Three candidate implementations, measured inside
the exact ga=16 scan harness bench.py uses (dout varies per micro-batch,
merged operands hoisted out of the scan):

  block    -- ops.monarch.monarch_dw on (K,Q,P)/(L,S,R) factors (current
              production path).  Pays XLA relayout copies: xb (b,k,p) and
              doutb (l,b,s) batched-dot layouts materialise transposes of
              the two 21.8 MB operands.
  expanded -- 4 clean 2D dots against the expanded permuted-dense pair
              (w1bd, w2hat) -- hoisted per optimizer step like wm -- then
              _extract_dw gathers the block gradients.  No batched dims,
              no relayouts; reads x and dout twice each (~88 MB).
  pallas   -- kernels.experimental.more_linear._more_dw_call: one Pallas kernel reads
              x and dout ONCE per tile and accumulates both dense grads
              in VMEM (~44 MB, the floor).

Run: python scripts/exp_dw_in_context.py
"""

import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_fine_tuning_tpu.kernels.merged import build_merged_operands
from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    expand_monarch_factors,
)
from sparse_matrix_fine_tuning_tpu.kernels.experimental.more_linear import (
    _extract_dw,
    _more_dw_call,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import monarch_dw


from sparse_matrix_fine_tuning_tpu.utils.benchlib import slope_time


def block_nt_dw(x2, d2, w1, w2):
    """Block-factor dw with NO explicit operand transposes: batch/contract
    dims passed to dot_general in place, so any relayout is XLA's internal
    choice rather than a materialized transpose of the 21.8 MB operands."""
    pet = jnp.float32
    k, q, p = w1.shape
    l, s, r = w2.shape
    xb = x2.reshape(-1, k, p)          # pure reshape, no copy
    d3 = d2.reshape(-1, s, l)          # pure reshape, no copy
    # out1[b, l, r]: batched over k in place -> (k, b, q), small transposes after
    o1 = jax.lax.dot_general(xb, w1, (((2,), (2,)), ((1,), (0,))),
                             preferred_element_type=pet)  # (k, b, q)
    out1 = o1.transpose(1, 0, 2).reshape(-1, r, l).transpose(0, 2, 1)
    out1 = out1.astype(x2.dtype)       # (b, l, r) -- small (B x kq)
    # dw2[l, s, r] = sum_b d3[b, s, l] * out1[b, l, r]: batch l IN PLACE
    dw2 = jax.lax.dot_general(d3, out1, (((0,), (0,)), ((2,), (1,))),
                              preferred_element_type=pet)  # (l, s, r)
    # dout1[l, b, r] = sum_s d3[b, s, l] * w2[l, s, r]: batch l IN PLACE
    dout1 = jax.lax.dot_general(d3, w2, (((1,), (1,)), ((2,), (0,))),
                                preferred_element_type=pet)  # (l, b, r)
    dout1_kq = dout1.astype(x2.dtype).transpose(1, 2, 0).reshape(-1, k, q)
    # dw1[k, q, p] = sum_b dout1_kq[b, k, q] * xb[b, k, p]: batch k in place
    dw1 = jax.lax.dot_general(dout1_kq, xb, (((0,), (0,)), ((1,), (1,))),
                              preferred_element_type=pet)  # (k, q, p)
    return dw1, dw2


def expanded_dw(x2, d2, w1bd, w2hat, w1_shape, w2_shape):
    pet = jnp.float32
    out1e = jax.lax.dot_general(x2, w1bd, (((1,), (0,)), ((), ())),
                                preferred_element_type=pet).astype(x2.dtype)
    dw2hat = jax.lax.dot_general(out1e, d2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=pet)
    dout1e = jax.lax.dot_general(d2, w2hat, (((1,), (1,)), ((), ())),
                                 preferred_element_type=pet).astype(x2.dtype)
    dw1bd = jax.lax.dot_general(x2, dout1e, (((0,), (0,)), ((), ())),
                                preferred_element_type=pet)
    return _extract_dw(dw1bd, dw2hat, w1_shape, w2_shape)


def main():
    dtype = jnp.bfloat16
    B, n, m, K, r, G = 2664, 4096, 4096, 4, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xs = jax.random.normal(ks[0], (G, B, n), dtype)
    wd = jax.random.normal(ks[1], (m, n), dtype) * 0.02
    w1 = jax.random.normal(ks[2], (K, r * K, n // K), dtype) * 0.02
    w2 = jax.random.normal(ks[3], (K, m // K, r * K), dtype) * 0.02
    w1_shape, w2_shape = w1.shape, w2.shape

    def sq(y):
        return jnp.sum(y.astype(jnp.float32) ** 2)

    # manual micro-batch pass: fwd + dx + dw, dout = 2*out (grad of sq)
    def micro(x, wm, wm_t, w1bd, w2hat, dw_mode):
        out = jax.lax.dot_general(x, wm, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(x.dtype)
        dout = (2.0 * out.astype(jnp.float32)).astype(x.dtype)
        dx = jax.lax.dot_general(dout, wm_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
        if dw_mode == "block":
            dw1, dw2, _ = monarch_dw(x, dout, w1, w2)
        elif dw_mode == "block_nt":
            dw1, dw2 = block_nt_dw(x, dout, w1, w2)
        elif dw_mode == "expanded":
            dw1, dw2 = expanded_dw(x, dout, w1bd, w2hat, w1_shape, w2_shape)
        elif dw_mode == "pallas":
            dw1bd, dw2hat = _more_dw_call(x, dout, w1bd, w2hat, False)
            dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1_shape, w2_shape)
        else:  # none: no dw pass (floor)
            dw1 = jnp.zeros(w1_shape, jnp.float32)
            dw2 = jnp.zeros(w2_shape, jnp.float32)
        loss = sq(out)
        return (dw1.astype(jnp.float32), dw2.astype(jnp.float32),
                loss + jnp.sum(dx.astype(jnp.float32)) * 1e-30)

    def make_loop(dw_mode):
        @jax.jit
        def loop(w1_, w2_, xs, nn):
            def body(i, carry):
                w1c, w2c, acc = carry
                wm, wm_t = build_merged_operands(wd, w1c, w2c)
                w1bd, w2hat = expand_monarch_factors(w1c, w2c)

                def sbody(acc2, x):
                    g1, g2, dep = micro(x, wm, wm_t, w1bd, w2hat, dw_mode)
                    return (acc2[0] + g1, acc2[1] + g2, acc2[2] + dep), None

                (g1, g2, dep), _ = jax.lax.scan(
                    sbody, (jnp.zeros(w1_shape, jnp.float32),
                            jnp.zeros(w2_shape, jnp.float32),
                            jnp.float32(0)), xs)
                w1c = w1c + (g1 * 1e-30).astype(w1c.dtype)
                w2c = w2c + (g2 * 1e-30).astype(w2c.dtype)
                return (w1c, w2c, acc + dep)
            return jax.lax.fori_loop(0, nn, body, (w1_, w2_, jnp.float32(0)))[2]
        return loop

    # correctness cross-check first
    x0 = xs[0]
    d0 = (2.0 * jax.lax.dot_general(
        x0, build_merged_operands(wd, w1, w2)[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)).astype(dtype)
    ref1, ref2, _ = monarch_dw(x0, d0, w1, w2)
    w1bd, w2hat = expand_monarch_factors(w1, w2)
    e1, e2 = expanded_dw(x0, d0, w1bd, w2hat, w1_shape, w2_shape)
    p1raw = _more_dw_call(x0, d0, w1bd, w2hat, False)
    p1, p2 = _extract_dw(p1raw[0], p1raw[1], w1_shape, w2_shape)
    nt1, nt2 = block_nt_dw(x0, d0, w1, w2)
    for name, (a1, a2) in {"expanded": (e1, e2), "pallas": (p1, p2),
                           "block_nt": (nt1, nt2)}.items():
        err1 = float(jnp.max(jnp.abs(a1.astype(jnp.float32) - ref1.astype(jnp.float32))))
        err2 = float(jnp.max(jnp.abs(a2.astype(jnp.float32) - ref2.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref1))) + 1e-9
        print(f"{name}: max|dw1 err|={err1:.3e} max|dw2 err|={err2:.3e} "
              f"(scale {scale:.2e})", flush=True)

    results = {k: [] for k in ("none", "block", "block_nt", "expanded",
                               "pallas")}
    loops = {k: make_loop(k) for k in results}
    for _ in range(3):
        for k, loop in loops.items():
            try:
                results[k].append(slope_time(loop, (w1, w2, xs), iters=12) / G)
            except Exception as e:
                print(f"{k}: FAIL {type(e).__name__} {str(e)[:140]}", flush=True)
                results[k].append(float("nan"))
    floor = statistics.median(results["none"])
    for k in results:
        med = statistics.median(results[k])
        print(f"{k:9s}: {med*1e6:7.1f} us/micro  (dw marginal "
              f"{(med-floor)*1e6:+7.1f} us)", flush=True)


if __name__ == "__main__":
    main()
