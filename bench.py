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


def _require_responsive_chip(timeout_s: float = 300.0):
    """Fail fast (exit 1) if the backend cannot run a trivial matmul.

    The tunnelled chip can wedge in a way where every dispatch blocks
    forever; without this probe the whole bench hangs until the driver's
    own timeout and records nothing actionable.  The probe runs in a
    daemon thread so a hung dispatch cannot block interpreter exit.  A
    backend that FAILS fast (RPC/init error) is also reported immediately
    with its real traceback instead of being misdiagnosed as a hang after
    the full wait.
    """
    import os
    import threading
    import traceback

    done = threading.Event()
    failure = []

    def probe():
        try:
            x = jnp.ones((256, 256), jnp.bfloat16)
            (x @ x).block_until_ready()
        except BaseException:  # noqa: BLE001 -- report, then fail fast
            failure.append(traceback.format_exc())
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(f"bench: backend unresponsive -- a 256x256 matmul did not "
              f"complete within {timeout_s:.0f}s (wedged tunnel?); "
              f"aborting instead of hanging", file=sys.stderr)
        _emit_stale_record("chip unresponsive (matmul probe hang)")
        os._exit(1)
    if failure:
        print("bench: backend probe FAILED (not a hang):\n" + failure[0],
              file=sys.stderr)
        _emit_stale_record("chip probe failed: " + failure[0].strip().splitlines()[-1])
        os._exit(1)


def _emit_stale_record(reason: str) -> None:
    """Chip-down fallback: re-emit the most recent driver-recorded
    measurement, EXPLICITLY labelled stale, so the round's bench artifact
    says what happened instead of recording nothing.  Values are copied
    from the newest BENCH_r*.json; nothing is measured here."""
    import glob
    import os as _os
    here = _os.path.dirname(_os.path.abspath(__file__))
    records = sorted(glob.glob(_os.path.join(here, "BENCH_r*.json")))
    if not records:
        return
    try:
        with open(records[-1]) as f:
            parsed = json.load(f).get("parsed") or {}
        if "value" not in parsed:
            return
        parsed["unit"] = ("STALE -- NOT measured this round (%s); value "
                          "carried from %s. Original unit: %s"
                          % (reason, _os.path.basename(records[-1]),
                             parsed.get("unit", "")))
        print(json.dumps(parsed), flush=True)
    except Exception as e:  # noqa: BLE001 -- best-effort fallback
        print(f"bench: stale-record fallback failed: {e}", file=sys.stderr)


def main():
    _require_responsive_chip()
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

    # ---- blk_r sweep {4, 8, 16} at the 7B projection shape: the north-star
    # pins blk_r=8 (BASELINE.md); 16 = the reference kernel-bench config
    sweep = {4: {"marginal_xla_us": round(marg_xla * 1e6, 1),
                 "marginal_merged_us": round(marg_merged * 1e6, 1),
                 "overhead_speedup": round(overhead_speedup, 3)}}
    for rr in (8, 16):
        k1, k2 = jax.random.split(jax.random.PRNGKey(rr), 2)
        w1r = jax.random.normal(k1, (K, rr * K, n // K), dtype) * 0.02
        w2r = jax.random.normal(k2, (K, m // K, rr * K), dtype) * 0.02
        tx = slope_time(make_loop(macro_xla), (w1r, w2r, xs), iters=12) / G
        tm = slope_time(make_loop(macro_merged), (w1r, w2r, xs), iters=12) / G
        sweep[rr] = {
            "marginal_xla_us": round((tx - t_dense) * 1e6, 1),
            "marginal_merged_us": round((tm - t_dense) * 1e6, 1),
            "overhead_speedup": round((tx - t_dense) / max(tm - t_dense, 1e-9), 3),
        }

    # ---- north-star op roofline at blk_r=8: standalone monarch fwd+bwd
    # slope time vs the v5e HBM bound (the op is memory-bound at these
    # shapes: weights+activations dominate, MXU utilisation is secondary)
    from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_grad_steps

    k1, k2 = jax.random.split(jax.random.PRNGKey(99), 2)
    r8 = 8
    w18 = jax.random.normal(k1, (K, r8 * K, n // K), dtype) * 0.02
    w28 = jax.random.normal(k2, (K, m // K, r8 * K), dtype) * 0.02

    def op_loss(ws, x):
        return sq(blockdiag_butterfly_multiply(x, ws[0], ws[1]))

    # The op alone is ~100 us/iter while each dispatch costs ~24 ms through
    # the tunnel: a single-shot slope at small N is noise (one run measured
    # a negative slope).  Median of interleaved rounds at larger N.
    t_op8 = statistics.median(
        time_grad_steps(op_loss, ((w18, w28), xs[0]),
                        argnums=(0, 1), iters=64, chain_argnum=0)
        for _ in range(3))
    # Minimal-traffic floor for fwd + factor grads (the PEFT training case:
    # dx flows through the fused surrounding layer, factors are the only
    # HBM-resident grads): x read for fwd + re-read for dw1 (2 passes of
    # B*n bf16), the (B, K*q) interleave intermediate written+read once,
    # factor tensors negligible.  The out cotangent of the scalar loss is
    # fused, never round-tripping HBM.
    kq_total = r8 * K * K  # out1 features: K blocks x q = r8*K each
    floor_bytes = 2 * (2 * B * n + 2 * B * kq_total)
    hbm_peak = 819e9  # v5e HBM bytes/s (public spec)
    roofline_pct = (floor_bytes / t_op8) / hbm_peak * 100

    # ---- recipe-level: full-model optimizer-step throughput (production
    # Trainer path, merged-training auto) -- hidden-2048 8-layer Llama at
    # bs 4 x ga 8 x seq 512 (docs/BENCHMARKS.md "Production-path trainer")
    import time as _time

    import numpy as onp
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
    from sparse_matrix_fine_tuning_tpu.peft import init_monarch
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

    BS, GA, T = 4, 8, 512
    cfg = LlamaConfig(hidden_size=2048, num_hidden_layers=8,
                      num_attention_heads=16, num_key_value_heads=16,
                      intermediate_size=5504, vocab_size=32000,
                      param_dtype="bfloat16", dtype="bfloat16", remat=True,
                      max_position_embeddings=T)
    rng = onp.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, size=(BS * GA * 2, T)).astype(onp.int32)
    data = {"input_ids": ids, "attention_mask": onp.ones_like(ids),
            "labels": ids}

    def lm_loss(model, batch, train):
        logits = model(batch["input_ids"], attention_mask=batch["attention_mask"])
        return model.loss(logits, batch["labels"], weights=batch.get("_valid"))

    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    init_monarch(model, {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj"]},
        rngs=nnx.Rngs(1))
    targs = TrainingArgs(output_dir="/tmp/bench_recipe", learning_rate=5e-4,
                         max_steps=10**9, per_device_train_batch_size=BS,
                         gradient_accumulation_steps=GA, logging_steps=0,
                         log_param_steps=0, merged_training="auto")
    tr = Trainer(model, targs, train_data=data, loss_fn=lm_loss)
    tr.model.train()
    batches = [b for b, _ in tr._batches(data, BS, shuffle=False, accum=GA)]
    for _ in range(3):  # compile + tunnel first-execution finalization
        float(tr._train_step_accum(tr.model, tr.optimizer, batches[0]))
    times = []
    for i in range(8):  # per-step sync: mixed-executable queues serialize
        t0 = _time.time()
        float(tr._train_step_accum(tr.model, tr.optimizer,
                                   batches[i % len(batches)]))
        times.append(_time.time() - t0)
    step_ms = statistics.median(times) * 1e3
    tokens_per_s = BS * GA * T / (step_ms / 1e3)

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
        "blk_r_sweep": sweep,
        "north_star_blk_r8": {
            "op_fwd_bwd_us": round(t_op8 * 1e6, 1),
            "hbm_roofline_pct": round(roofline_pct, 1),
            "note": ("standalone monarch op (fwd + factor grads) at "
                     "2664x4096->4096 blk_r=8; %% of the v5e 819 GB/s HBM "
                     "bound against a minimal-traffic floor of 2 passes of "
                     "x + 1 round-trip of the (B, %d) interleave = %.1f MB "
                     "(op is memory-bound at this shape; MXU utilisation "
                     "is secondary)" % (kq_total, floor_bytes / 1e6)),
        },
        "recipe_level": {
            "model": "llama 2048h x 8L bf16 + monarch blk_r4 adapters",
            "config": "bs4 x ga8 x seq512, merged_training=auto, remat",
            "ms_per_opt_step": round(step_ms, 1),
            "tokens_per_s": round(tokens_per_s),
        },
    }))


if __name__ == "__main__":
    main()
