"""Merged-design v3: hoisted wm AND wm^T, pallas dw kernel, G=16.

Also measures a valid dense-only floor (chained through wd so the loop
body can't be hoisted).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import expand_monarch_factors
from sparse_matrix_fine_tuning_tpu.kernels.experimental.more_linear import _more_dw_call
from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import _extract_dw
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dw_call_v2(x2d, dout2d, w1bd, w2hat, ts=256):
    def kernel(x_ref, dout_ref, w1bd_ref, w2hat_ref, dw1bd_ref, dw2hat_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1bd_ref[...] = jnp.zeros(dw1bd_ref.shape, dw1bd_ref.dtype)
            dw2hat_ref[...] = jnp.zeros(dw2hat_ref.shape, dw2hat_ref.dtype)

        x = x_ref[...]
        dout = dout_ref[...]
        out1 = jnp.dot(x, w1bd_ref[...], preferred_element_type=jnp.float32
                       ).astype(x.dtype)
        dw2hat_ref[...] += jax.lax.dot_general(
            out1, dout, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dout1 = jax.lax.dot_general(
            dout, w2hat_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        dw1bd_ref[...] += jax.lax.dot_general(
            x, dout1, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    b, n = x2d.shape
    m = dout2d.shape[1]
    kq = w1bd.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(b, ts),),
        in_specs=[
            pl.BlockSpec((ts, n), lambda i: (i, 0)),
            pl.BlockSpec((ts, m), lambda i: (i, 0)),
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, kq), jnp.float32),
            jax.ShapeDtypeStruct((kq, m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x2d, dout2d, w1bd, w2hat)
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply


def build_merged(wd_t, w1, w2):
    w1bd, w2hat = expand_monarch_factors(w1, w2)
    d = jnp.dot(w1bd, w2hat, preferred_element_type=jnp.float32)
    wm = (wd_t.astype(jnp.float32) + d).astype(wd_t.dtype)
    return wm, wm.T, w1bd, w2hat


def make_merged_apply(dw_impl):
    @jax.custom_vjp
    def merged_apply(x, wm, wm_t, w1bd, w2hat, w1, w2):
        return jax.lax.dot_general(x, wm, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(x.dtype)

    def fwd(x, wm, wm_t, w1bd, w2hat, w1, w2):
        return merged_apply(x, wm, wm_t, w1bd, w2hat, w1, w2), \
            (x, wm_t, w1bd, w2hat, w1, w2)

    def bwd(res, dout):
        x, wm_t, w1bd, w2hat, w1, w2 = res
        k, q, p = w1.shape
        l, s, r = w2.shape
        dx = jax.lax.dot_general(dout, wm_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
        if dw_impl == "pallas":
            dw1bd, dw2hat = _more_dw_call(x, dout, w1bd, w2hat, False)
            dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1.shape, w2.shape)
        elif dw_impl == "pallas_v2":
            dw1bd, dw2hat = dw_call_v2(x, dout, w1bd, w2hat)
            dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1.shape, w2.shape)
        elif dw_impl == "jnp_hybrid":
            # expanded (relayout-free) dw2/dout1; batched dw1
            out1f = jnp.dot(x, w1bd, preferred_element_type=jnp.float32
                            ).astype(x.dtype)                      # (b, kq)
            dw2hat = jax.lax.dot_general(out1f, dout, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            dout1f = jax.lax.dot_general(dout, w2hat, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32
                                         ).astype(x.dtype)         # (b, kq)
            _, dw2 = _extract_dw(jnp.zeros((x.shape[1], k * q)), dw2hat,
                                 w1.shape, w2.shape)
            # dout1f indexes the SAME flat (k q) layout as out1f
            dout1_kq = dout1f.reshape(-1, k, q)
            xb = x.reshape(-1, k, p)
            dw1 = jax.lax.dot_general(dout1_kq, xb, (((0,), (0,)), ((1,), (1,))),
                                      preferred_element_type=jnp.float32
                                      ).astype(w1.dtype)
        elif dw_impl == "jnp_expanded":
            # relayout-free: four plain matmuls on the expanded factors
            out1f = jnp.dot(x, w1bd, preferred_element_type=jnp.float32
                            ).astype(x.dtype)
            dw2hat = jax.lax.dot_general(out1f, dout, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            dout1f = jax.lax.dot_general(dout, w2hat, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32
                                         ).astype(x.dtype)
            dw1bd = jax.lax.dot_general(x, dout1f, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1.shape, w2.shape)
        else:
            xb = x.reshape(-1, k, p)
            out1 = jax.lax.dot_general(
                xb, w1, dimension_numbers=(((2,), (2,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)
            out1 = out1.transpose(1, 0, 2).reshape(-1, r, l).transpose(0, 2, 1)
            out1 = out1.astype(x.dtype)
            doutb = dout.reshape(-1, s, l).transpose(2, 0, 1).astype(x.dtype)
            dw2 = jax.lax.dot_general(doutb, out1, (((1,), (0,)), ((0,), (1,))),
                                      preferred_element_type=jnp.float32)
            dout1 = jax.lax.dot_general(doutb, w2, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32
                                        ).astype(x.dtype)
            dout1_kq = dout1.transpose(1, 2, 0).reshape(-1, k, q)
            dw1 = jax.lax.dot_general(dout1_kq, xb, (((0,), (0,)), ((1,), (1,))),
                                      preferred_element_type=jnp.float32)
        z = jnp.zeros_like
        return (dx, z(res[1].T), z(res[1]), z(res[2]), z(res[3]),
                dw1.astype(w1.dtype), dw2.astype(w2.dtype))

    merged_apply.defvjp(fwd, bwd)
    return merged_apply


def dense_nm(x, wd_t):
    return jax.lax.dot_general(x, wd_t, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(x.dtype)


def slope(run, iters=12):
    t_lo, t_hi = run(iters), run(iters * 3)
    return (t_hi - t_lo) / (iters * 2)


def main():
    B, n, m, K, r, G = 2664, 4096, 4096, 4, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xs = jax.random.normal(ks[0], (G, B, n), jnp.bfloat16)
    wd_t = jax.random.normal(ks[1], (n, m), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (K, r * K, n // K), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (K, m // K, r * K), jnp.bfloat16) * 0.02

    def sq(y):
        return jnp.sum(y.astype(jnp.float32) ** 2)

    # ---------------- dense floor: chain through wd so nothing hoists
    @jax.jit
    def loop_dense(wd_t_, xs, nn):
        def macro(wd_c, xs):
            def body(acc, x):
                loss, gx = jax.value_and_grad(
                    lambda x_: sq(dense_nm(x_, wd_c)))(x)
                return acc + loss + jnp.sum(gx.astype(jnp.float32)) * 1e-30, None
            dep, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return dep

        def body(i, carry):
            wd_c, acc = carry
            dep = macro(wd_c, xs)
            wd_c = wd_c + (dep * 1e-30).astype(wd_c.dtype)
            return (wd_c, acc + dep)
        return jax.lax.fori_loop(0, nn, body, (wd_t_, jnp.float32(0)))[1]

    def run_dense(nn):
        float(np.asarray(loop_dense(wd_t, xs, jnp.int32(nn))))
        t0 = time.perf_counter()
        float(np.asarray(loop_dense(wd_t, xs, jnp.int32(nn))))
        return time.perf_counter() - t0

    t_dense = slope(run_dense) / G
    print(f"dense floor     : {t_dense*1e6:7.1f} us/micro", flush=True)

    # ---------------- candidates: chain through (w1, w2)
    def timed(name, macro_fn):
        @jax.jit
        def loop(w1_, w2_, xs, nn):
            def body(i, carry):
                w1c, w2c, acc = carry
                g1, g2, dep = macro_fn(w1c, w2c, xs)
                w1c = w1c + (g1 * 1e-30).astype(w1c.dtype)
                w2c = w2c + (g2 * 1e-30).astype(w2c.dtype)
                return (w1c, w2c, acc + dep)
            return jax.lax.fori_loop(0, nn, body, (w1_, w2_, jnp.float32(0)))[2]

        def run(nn):
            float(np.asarray(loop(w1, w2, xs, jnp.int32(nn))))
            t0 = time.perf_counter()
            float(np.asarray(loop(w1, w2, xs, jnp.int32(nn))))
            return time.perf_counter() - t0

        t = slope(run) / G
        print(f"{name:16s}: {t*1e6:7.1f} us/micro (marginal +{(t-t_dense)*1e6:5.1f})",
              flush=True)
        return t

    def scan_grads(micro_loss, w1_, w2_, xs):
        def body(acc, x):
            loss, (g1, g2, gx) = jax.value_and_grad(
                micro_loss, argnums=(0, 1, 2))(w1_, w2_, x)
            dep = loss + jnp.sum(gx.astype(jnp.float32)) * 1e-30
            return (acc[0] + g1, acc[1] + g2, acc[2] + dep), None
        (g1, g2, dep), _ = jax.lax.scan(
            body, (jnp.zeros_like(w1_, jnp.float32),
                   jnp.zeros_like(w2_, jnp.float32), jnp.float32(0)), xs)
        return g1, g2, dep

    def macro_xla(w1_, w2_, xs):
        return scan_grads(
            lambda a, b, x: sq(dense_nm(x, wd_t)
                               + blockdiag_butterfly_multiply(x, a, b)),
            w1_, w2_, xs)

    t_xla = timed("xla-unfused", macro_xla)

    for dw_impl in ("jnp", "jnp_hybrid"):
        apply_fn = make_merged_apply(dw_impl)

        def macro_merged(w1_, w2_, xs, apply_fn=apply_fn):
            wm, wm_t, w1bd, w2hat = build_merged(wd_t, w1_, w2_)
            return scan_grads(
                lambda a, b, x: sq(apply_fn(x, wm, wm_t, w1bd, w2hat, a, b)),
                w1_, w2_, xs)

        t = timed(f"merged[{dw_impl}]", macro_merged)
        print(f"   -> speedup vs xla-unfused: {t_xla/t:.3f}x", flush=True)

    # correctness of the pallas-dw variant
    apply_fn = make_merged_apply("pallas")
    wm, wm_t, w1bd, w2hat = build_merged(wd_t, w1, w2)
    g_ref = jax.grad(lambda a, b: sq(dense_nm(xs[0], wd_t)
                                     + blockdiag_butterfly_multiply(xs[0], a, b)),
                     argnums=(0, 1))(w1, w2)
    g_m = jax.grad(lambda a, b: sq(apply_fn(xs[0], wm, wm_t, w1bd, w2hat, a, b)),
                   argnums=(0, 1))(w1, w2)
    for nm_, a, b in (("dw1", g_ref[0], g_m[0]), ("dw2", g_ref[1], g_m[1])):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        sc = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
        print(f"{nm_} max rel err {e/sc:.4g}")


if __name__ == "__main__":
    main()
