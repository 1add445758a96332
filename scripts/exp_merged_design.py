"""Prototype v2: merge-during-training MonarchLinear.

Key structure: the merged weight Wm = Wd^T + W1bd @ W2hat  (n, m) is built
ONCE per optimizer step OUTSIDE the grad-accumulation scan (XLA's loop
invariant code motion does NOT hoist large dots out of scan bodies --
measured), and enters the scanned micro-step as an invariant argument.

merged_apply(x, wm, w1, w2) custom VJP:
  fwd: one dense matmul x @ Wm            (adapter fwd overhead: none)
  bwd: dx = dout @ Wm^T                   (adapter dx overhead: none)
       dw1/dw2 skinny monarch-structure einsums from (x, dout)
       dWm = symbolic zeros (wd frozen; w1/w2 grads computed directly)

Gradients w.r.t. (w1, w2, x) -- x-grad included so the dense backward
matmul is actually exercised (real layers propagate dout upstream).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    expand_monarch_factors,
    monarch_add,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply


def build_merged(wd_t, w1, w2):
    """wd_t: (n, m) dense operand (nn.Linear kernel layout).  Returns
    Wm = wd_t + W1bd @ W2hat in wd_t.dtype (one f32 add, one rounding)."""
    w1bd, w2hat = expand_monarch_factors(w1, w2)
    d = jnp.dot(w1bd, w2hat, preferred_element_type=jnp.float32)
    return (wd_t.astype(jnp.float32) + d).astype(wd_t.dtype)


@jax.custom_vjp
def merged_apply(x, wm, w1, w2):
    return jax.lax.dot_general(x, wm, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(x.dtype)


def _ma_fwd(x, wm, w1, w2):
    out = merged_apply(x, wm, w1, w2)
    return out, (x, wm, w1, w2)


def _ma_bwd(res, dout):
    x, wm, w1, w2 = res
    k, q, p = w1.shape
    l, s, r = w2.shape
    dx = jax.lax.dot_general(dout, wm, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(x.dtype)
    xb = x.reshape(-1, k, p)
    out1 = jax.lax.dot_general(
        xb, w1, dimension_numbers=(((2,), (2,)), ((1,), (0,))),
        preferred_element_type=jnp.float32)  # (k, b, q)
    out1 = out1.transpose(1, 0, 2).reshape(-1, r, l).transpose(0, 2, 1)
    out1 = out1.astype(x.dtype)  # (b, l, r)
    doutb = dout.reshape(-1, s, l).transpose(2, 0, 1).astype(x.dtype)  # (l,b,s)
    dw2 = jax.lax.dot_general(doutb, out1, (((1,), (0,)), ((0,), (1,))),
                              preferred_element_type=jnp.float32)
    dout1 = jax.lax.dot_general(doutb, w2, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32).astype(x.dtype)
    dout1_kq = dout1.transpose(1, 2, 0).reshape(-1, k, q)
    dw1 = jax.lax.dot_general(dout1_kq, xb, (((0,), (0,)), ((1,), (1,))),
                              preferred_element_type=jnp.float32)
    return (dx, jnp.zeros_like(wm), dw1.astype(w1.dtype), dw2.astype(w2.dtype))


merged_apply.defvjp(_ma_fwd, _ma_bwd)


def dense_nm(x, wd_t):
    return jax.lax.dot_general(x, wd_t, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(x.dtype)


def time_macro_step(make_micro, xs, w1, w2, G, iters=20, label=""):
    """make_micro(w1, w2) -> (micro_loss(w1, w2, x), uses merged) builder.
    One macro step: optional merged build, scan over G micro-batches,
    accumulate (dw1, dw2, dx-consumption).  Slope-timed sec/micro-batch."""

    def macro(w1, w2, xs):
        micro_loss = make_micro()

        def body(acc, x):
            loss, (g1, g2, gx) = jax.value_and_grad(
                micro_loss, argnums=(0, 1, 2))(w1, w2, x)
            dep = loss + jnp.sum(gx.astype(jnp.float32)) * 1e-30
            return (acc[0] + g1, acc[1] + g2, acc[2] + dep), None

        (g1, g2, dep), _ = jax.lax.scan(
            body, (jnp.zeros_like(w1, jnp.float32),
                   jnp.zeros_like(w2, jnp.float32), jnp.float32(0)), xs)
        return g1, g2, dep

    @jax.jit
    def loop(w1, w2, xs, n):
        def body(i, carry):
            w1c, w2c, acc = carry
            g1, g2, dep = macro(w1c, w2c, xs)
            w1c = w1c + (g1 * 1e-30).astype(w1c.dtype)
            w2c = w2c + (g2 * 1e-30).astype(w2c.dtype)
            return (w1c, w2c, acc + dep)
        return jax.lax.fori_loop(0, n, body, (w1, w2, jnp.float32(0)))[2]

    def run(n):
        float(np.asarray(loop(w1, w2, xs, jnp.int32(n))))
        t0 = time.perf_counter()
        float(np.asarray(loop(w1, w2, xs, jnp.int32(n))))
        return time.perf_counter() - t0

    lo, hi = iters, iters * 3
    t_lo = run(lo)
    t_hi = run(hi)
    return (t_hi - t_lo) / (hi - lo) / G


def main():
    B, n, m, K, r, G = 2664, 4096, 4096, 4, 4, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xs = jax.random.normal(ks[0], (G, B, n), jnp.bfloat16)
    wd_t = jax.random.normal(ks[1], (n, m), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (K, r * K, n // K), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (K, m // K, r * K), jnp.bfloat16) * 0.02

    def sq(y):
        return jnp.sum(y.astype(jnp.float32) ** 2)

    results = {}

    def measure(name, make_micro):
        t = time_macro_step(make_micro, xs, w1, w2, G)
        results[name] = t
        print(f"{name:18s}: {t*1e6:7.1f} us/micro", flush=True)

    measure("dense-only", lambda: lambda w1_, w2_, x:
            sq(dense_nm(x, wd_t)) + jnp.sum(w1_) * 0 + jnp.sum(w2_) * 0)
    measure("xla-unfused", lambda: lambda w1_, w2_, x:
            sq(dense_nm(x, wd_t) + blockdiag_butterfly_multiply(x, w1_, w2_)))
    measure("r1-fused-add", lambda: lambda w1_, w2_, x:
            sq(monarch_add(dense_nm(x, wd_t), x, w1_, w2_)))

    # merged: build wm outside scan by restructuring macro manually
    def time_merged(iters=20):
        def macro(w1_, w2_, xs):
            wm = build_merged(wd_t, w1_, w2_)   # once per step, scan-invariant

            def micro_loss(w1c, w2c, x):
                return sq(merged_apply(x, wm, w1c, w2c))

            def body(acc, x):
                loss, (g1, g2, gx) = jax.value_and_grad(
                    micro_loss, argnums=(0, 1, 2))(w1_, w2_, x)
                dep = loss + jnp.sum(gx.astype(jnp.float32)) * 1e-30
                return (acc[0] + g1, acc[1] + g2, acc[2] + dep), None

            (g1, g2, dep), _ = jax.lax.scan(
                body, (jnp.zeros_like(w1_, jnp.float32),
                       jnp.zeros_like(w2_, jnp.float32), jnp.float32(0)), xs)
            return g1, g2, dep

        @jax.jit
        def loop(w1_, w2_, xs, nn):
            def body(i, carry):
                w1c, w2c, acc = carry
                g1, g2, dep = macro(w1c, w2c, xs)
                w1c = w1c + (g1 * 1e-30).astype(w1c.dtype)
                w2c = w2c + (g2 * 1e-30).astype(w2c.dtype)
                return (w1c, w2c, acc + dep)
            return jax.lax.fori_loop(0, nn, body, (w1_, w2_, jnp.float32(0)))[2]

        def run(nn):
            float(np.asarray(loop(w1, w2, xs, jnp.int32(nn))))
            t0 = time.perf_counter()
            float(np.asarray(loop(w1, w2, xs, jnp.int32(nn))))
            return time.perf_counter() - t0

        t_lo, t_hi = run(iters), run(iters * 3)
        return (t_hi - t_lo) / (iters * 2) / G

    t = time_merged()
    results["merged"] = t
    print(f"{'merged':18s}: {t*1e6:7.1f} us/micro", flush=True)

    d = results["dense-only"]
    for k_ in ("xla-unfused", "r1-fused-add", "merged"):
        print(f"{k_:18s}: marginal +{(results[k_]-d)*1e6:6.1f} us "
              f"({results['xla-unfused']/results[k_]:.3f}x vs xla)", flush=True)

    # correctness
    wm = build_merged(wd_t, w1, w2)
    y_ref = dense_nm(xs[0], wd_t) + blockdiag_butterfly_multiply(xs[0], w1, w2)
    y_m = merged_apply(xs[0], wm, w1, w2)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_m.astype(jnp.float32))))
    print(f"fwd max err {err:.4g} (scale {float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))):.4g})")
    g_ref = jax.grad(lambda a, b: sq(dense_nm(xs[0], wd_t)
                                     + blockdiag_butterfly_multiply(xs[0], a, b)),
                     argnums=(0, 1))(w1, w2)
    g_m = jax.grad(lambda a, b: sq(merged_apply(xs[0], build_merged(wd_t, a, b), a, b)),
                   argnums=(0, 1))(w1, w2)
    for nm, a, b in (("dw1", g_ref[0], g_m[0]), ("dw2", g_ref[1], g_m[1])):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        sc = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
        print(f"{nm} max rel err {e/sc:.4g}")


if __name__ == "__main__":
    main()
