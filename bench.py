"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

What is measured -- the PEFT fine-tuning hot loop at the reference's own
training recipe: one optimizer step = gradient accumulation over G=16
micro-batches (BASELINE.md math recipe, bs 2 x ga 16) of the Llama-7B
projection shape (2664 x 4096 -> 4096, nblocks 4, blk_r 4 -- reference
blockdiag_butterfly_multiply.py:89), grads w.r.t. (w1, w2, x), bf16.

Headline metric -- ADAPTER OVERHEAD SPEEDUP: the adapter's marginal cost
per micro-batch over the bare frozen-dense layer, unfused-XLA vs this
repo's merge-during-training path (kernels/merged.py).  This is the TPU
apples-to-apples of the reference's benchmark (demos/test_triton.py times
the monarch op alone; its README claims the fused Triton kernel runs it
~1.2x faster than the optimized PyTorch path -- README.md:11), because on
TPU the op never runs alone: XLA fuses it into the surrounding layer, so
the only honest "op time" is the marginal cost it adds to the layer.
vs_baseline = (our marginal-cost speedup) / (their 1.2x op speedup).

Timing integrity (utils/benchlib.py): this chip's runtime elides repeated
identical executions, returns from block_until_ready early, AND charges a
~24 ms fixed dispatch cost per jitted call -- so each measurement runs N
and 3N iterations inside one fori_loop with a chained data dependency and
reports the SLOPE, which cancels the fixed cost exactly.
"""

import json
import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


from sparse_matrix_fine_tuning_tpu.utils.benchlib import slope_time


def main():
    from sparse_matrix_fine_tuning_tpu.kernels.merged import (
        build_merged_operands, merged_apply)
    from sparse_matrix_fine_tuning_tpu.ops.monarch import (
        blockdiag_butterfly_multiply)

    dtype = jnp.bfloat16
    B, n, m, K, r, G = 2664, 4096, 4096, 4, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xs = jax.random.normal(ks[0], (G, B, n), dtype)
    wd = jax.random.normal(ks[1], (m, n), dtype) * 0.02   # frozen (out, in)
    w1 = jax.random.normal(ks[2], (K, r * K, n // K), dtype) * 0.02
    w2 = jax.random.normal(ks[3], (K, m // K, r * K), dtype) * 0.02

    def sq(y):
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def dense_fwd(x, w):
        return jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(x.dtype)

    # ---- dense floor: chained through the dense weight itself
    @jax.jit
    def loop_dense(wd_, xs, nn):
        def macro(wd_c):
            def body(acc, x):
                loss, gx = jax.value_and_grad(
                    lambda x_: sq(dense_fwd(x_, wd_c)))(x)
                return acc + loss + jnp.sum(gx.astype(jnp.float32)) * 1e-30, None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]

        def body(i, carry):
            wd_c, acc = carry
            dep = macro(wd_c)
            return (wd_c + (dep * 1e-30).astype(wd_c.dtype), acc + dep)
        return jax.lax.fori_loop(0, nn, body, (wd_, jnp.float32(0)))[1]

    # ---- candidates: one optimizer step = scan over G micro-batches
    def make_loop(macro_fn):
        @jax.jit
        def loop(w1_, w2_, xs, nn):
            def body(i, carry):
                w1c, w2c, acc = carry
                g1, g2, dep = macro_fn(w1c, w2c, xs)
                w1c = w1c + (g1 * 1e-30).astype(w1c.dtype)
                w2c = w2c + (g2 * 1e-30).astype(w2c.dtype)
                return (w1c, w2c, acc + dep)
            return jax.lax.fori_loop(0, nn, body, (w1_, w2_, jnp.float32(0)))[2]
        return loop

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
            lambda a, b, x: sq(dense_fwd(x, wd)
                               + blockdiag_butterfly_multiply(x, a, b)),
            w1_, w2_, xs)

    def macro_merged(w1_, w2_, xs):
        # merged operands built ONCE per optimizer step, scan-invariant --
        # exactly what Trainer._train_step_accum does via refresh_merged()
        wm, wm_t = build_merged_operands(wd, w1_, w2_)
        return scan_grads(
            lambda a, b, x: sq(merged_apply(x, wm, wm_t, a, b)),
            w1_, w2_, xs)

    loops = {
        "dense": (loop_dense, (wd, xs)),
        "xla": (make_loop(macro_xla), (w1, w2, xs)),
        "merged": (make_loop(macro_merged), (w1, w2, xs)),
    }
    # interleave rounds; medians (single-shot slope noise ~ +-10 us)
    results = {k: [] for k in loops}
    for _ in range(3):
        for k, (loop, args) in loops.items():
            results[k].append(slope_time(loop, args, iters=12) / G)
    t_dense = statistics.median(results["dense"])
    t_xla = statistics.median(results["xla"])
    t_merged = statistics.median(results["merged"])

    marg_xla = t_xla - t_dense
    marg_merged = t_merged - t_dense
    overhead_speedup = marg_xla / max(marg_merged, 1e-9)
    layer_speedup = t_xla / t_merged

    print(json.dumps({
        "metric": "monarch_adapter_overhead_speedup_vs_xla_unfused",
        "value": round(overhead_speedup, 4),
        "unit": ("x adapter-marginal-cost cut (merged-training path; "
                 "layer-level speedup %.3fx; per-micro-batch: dense-floor=%.0fus "
                 "xla-unfused=%.0fus merged=%.0fus; adapter marginal "
                 "+%.0fus -> +%.0fus; 2664x4096->4096 blkr4 nblocks4 bf16, "
                 "ga=16 recipe, grads wrt w1/w2/x, slope-timed) vs the "
                 "reference Triton kernel's ~1.2x op-level claim"
                 % (layer_speedup, t_dense * 1e6, t_xla * 1e6, t_merged * 1e6,
                    marg_xla * 1e6, marg_merged * 1e6)),
        "vs_baseline": round(overhead_speedup / 1.2, 4),
    }))


if __name__ == "__main__":
    main()
