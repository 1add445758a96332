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


def _bench_int8_decode():
    """Greedy decode tokens/s, int8 frozen base + requantized adapter
    merge + w8a8 int8 lm_head (the measured-best serving config, 82.8% of
    its weight roofline -- docs/BENCHMARKS.md decode table; full 9-row
    ablation incl. unmerged/int4/w8a8-projection rows in the committed
    results/decode_bits.json), on the TinyLlama-1.1B shape.
    Slope-timed: one call generating N tokens vs one generating 3N with
    fresh prompts (identical-args calls are elided by the tunnel),
    per-token = slope; cancels prefill + dispatch cost."""
    import time as _time

    import numpy as onp
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import (
        LlamaConfig, LlamaForCausalLM)
    from sparse_matrix_fine_tuning_tpu.models.generate import (
        GenerationConfig, generate)
    from sparse_matrix_fine_tuning_tpu.peft import init_monarch
    from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base

    B, NEW, PROMPT = 4, 128, 64
    try:
        cfg = LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_hidden_layers=22,
            num_attention_heads=32, num_key_value_heads=4,
            intermediate_size=5632, param_dtype="bfloat16", dtype="bfloat16",
            max_position_embeddings=PROMPT + 3 * NEW)
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        init_monarch(model, {
            "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
            "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                               "gate_proj", "up_proj", "down_proj"]},
            rngs=nnx.Rngs(1))
        quantize_frozen_base(model, bits=8)
        from sparse_matrix_fine_tuning_tpu.quant import (
            quantize_lm_head, requantize_merge_adapters)
        requantize_merge_adapters(model)
        quantize_lm_head(model, impl="w8a8")
        model.eval()
        mask = jnp.ones((B, PROMPT), jnp.int32)
        rng = np.random.default_rng(0)

        def fresh_ids():
            return jnp.asarray(rng.integers(2, cfg.vocab_size, (B, PROMPT)),
                               jnp.int32)

        def one_round():
            gc_lo = GenerationConfig(max_new_tokens=NEW, eos_token_id=None)
            gc_hi = GenerationConfig(max_new_tokens=3 * NEW, eos_token_id=None)
            np.asarray(generate(model, fresh_ids(), mask, gc_lo))
            np.asarray(generate(model, fresh_ids(), mask, gc_hi))
            t0 = _time.perf_counter()
            np.asarray(generate(model, fresh_ids(), mask, gc_lo))
            t_lo = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            np.asarray(generate(model, fresh_ids(), mask, gc_hi))
            t_hi = _time.perf_counter() - t0
            return (t_hi - t_lo) / (2 * NEW)

        per_tok = statistics.median(one_round() for _ in range(3))
        return {
            "ms_per_decode_step": round(per_tok * 1e3, 2),
            "tokens_per_s": round(B / per_tok),
            "config": ("TinyLlama-1.1B shape (2048h x 22L, GQA4), int8 "
                       "frozen base + fused dequant-matmul kernels + "
                       "requantized adapter merge (serving-only) + "
                       "w8a8 int8 lm_head, greedy, batch 4"),
        }
    except Exception as e:  # noqa: BLE001 -- decode bench must not sink the record
        return {"error": f"{type(e).__name__}: {str(e)[:200]}"}


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

    # third production path: the fused-add Pallas kernel (base + monarch(x)
    # in one pass), usable when merging is off (e.g. memory-tight 7B)
    from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
        monarch_add, monarch_kernel_supported)

    def macro_fused_add(w1_, w2_, xs):
        return scan_grads(
            lambda a, b, x: sq(monarch_add(dense_fwd(x, wd), x, a, b)),
            w1_, w2_, xs)

    loops = {
        "dense": (loop_dense, (wd, xs)),
        "xla": (make_loop(macro_xla), (w1, w2, xs)),
        "merged": (make_loop(macro_merged), (w1, w2, xs)),
    }
    if monarch_kernel_supported(n, w1.shape, w2.shape):
        loops["fused_add"] = (make_loop(macro_fused_add), (w1, w2, xs))
    # interleave rounds; medians (single-shot slope noise ~ +-10 us)
    results = {k: [] for k in loops}
    for _ in range(3):
        for k, (loop, args) in loops.items():
            results[k].append(slope_time(loop, args, iters=12) / G)
    t_dense = statistics.median(results["dense"])
    t_xla = statistics.median(results["xla"])
    t_merged = statistics.median(results["merged"])
    t_fadd = (statistics.median(results["fused_add"])
              if "fused_add" in results else None)

    marg_xla = t_xla - t_dense
    marg_merged = t_merged - t_dense
    overhead_speedup = marg_xla / max(marg_merged, 1e-9)
    layer_speedup = t_xla / t_merged

    # ---- blk_r sweep {4, 8, 16} at the 7B projection shape: the north-star
    # pins blk_r=8 (BASELINE.md); 16 = the reference kernel-bench config.
    # All three production paths (unfused XLA / fused-add Pallas / merged)
    # are captured per rank.
    def _sweep_entry(tx, tm, tf):
        ent = {
            "marginal_xla_us": round((tx - t_dense) * 1e6, 1),
            "marginal_merged_us": round((tm - t_dense) * 1e6, 1),
            "overhead_speedup": round((tx - t_dense) / max(tm - t_dense, 1e-9), 3),
        }
        ent["marginal_fused_add_us"] = (
            round((tf - t_dense) * 1e6, 1) if tf is not None else None)
        return ent

    sweep = {4: _sweep_entry(t_xla, t_merged, t_fadd)}
    for rr in (8, 16):
        k1, k2 = jax.random.split(jax.random.PRNGKey(rr), 2)
        w1r = jax.random.normal(k1, (K, rr * K, n // K), dtype) * 0.02
        w2r = jax.random.normal(k2, (K, m // K, rr * K), dtype) * 0.02
        tx = slope_time(make_loop(macro_xla), (w1r, w2r, xs), iters=12) / G
        tm = slope_time(make_loop(macro_merged), (w1r, w2r, xs), iters=12) / G
        tf = (slope_time(make_loop(macro_fused_add), (w1r, w2r, xs),
                         iters=12) / G
              if monarch_kernel_supported(n, w1r.shape, w2r.shape) else None)
        sweep[rr] = _sweep_entry(tx, tm, tf)

    # ---- north-star op roofline at blk_r=8 (BASELINE.md: >=80% of
    # roofline).  PROTOCOL (round 5, reconciling VERDICT r4 #3): the op is
    # timed in its EXTERNAL-LOSS form -- out is a live program output
    # (it becomes the next iteration's x, forcing the HBM write) and dout
    # is an HBM-resident input read every iteration -- exactly the
    # traffic an op instance inside a model sees.  The floor is the timed
    # program's INTERFACE bytes (each input read once + each output
    # written once) over the 819 GB/s v5e spec: a truth no schedule of
    # this program can beat, so the headline pct cannot exceed 100.
    # Round 4's inconsistency (110.8% "of the general floor") came from
    # timing a loss-FUSED program -- whose out/dout never touch HBM --
    # against the external-loss floor.
    k1, k2 = jax.random.split(jax.random.PRNGKey(99), 2)
    r8 = 8
    w18 = jax.random.normal(k1, (K, r8 * K, n // K), dtype) * 0.02
    w28 = jax.random.normal(k2, (K, m // K, r8 * K), dtype) * 0.02
    dout8 = jax.random.normal(jax.random.PRNGKey(7), (B, m), dtype)

    from sparse_matrix_fine_tuning_tpu.ops.monarch import monarch_dw

    @jax.jit
    def loop_ext(x0, w1_, w2_, dout, nn):
        # fwd + factor grads (PEFT training: dx flows through the fused
        # surrounding dense, factors are the only HBM-resident grads)
        def body(i, carry):
            x, acc = carry
            out = blockdiag_butterfly_multiply(x, w1_, w2_)
            g1, g2, _ = monarch_dw(x, dout, w1_, w2_)
            acc = acc + (jnp.sum(g1.astype(jnp.float32))
                         + jnp.sum(g2.astype(jnp.float32)))
            return out, acc  # out -> next x: the out write is mandatory
        return jax.lax.fori_loop(0, nn, body, (x0, jnp.float32(0)))[1]

    t_op8 = statistics.median(
        slope_time(loop_ext, (xs[0], w18, w28, dout8), iters=64)
        for _ in range(5))
    hbm_peak = 819e9  # v5e HBM bytes/s (public spec)
    # interface bytes: x read + dout read + out write (all (B, 4096)
    # bf16) + both factor reads; dw1/dw2 are reduced in-loop (not
    # program outputs), so they are excluded -- which only LOWERS the
    # floor, keeping it a true bound
    ext_bytes = (3 * B * n + w18.size + w28.size) * 2
    floor_ext = ext_bytes / hbm_peak
    roofline_pct = floor_ext / t_op8 * 100

    # factor-gradient pass standalone, both implementations (the runtime
    # gate picks per-runtime inside scans -- kernels/runtime_gate.py)
    from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
        monarch_dw_fused)
    from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn

    t_dw_xla = statistics.median(
        time_fn(lambda ws, a, d: monarch_dw(a, d, ws[0], ws[1])[:2],
                ((w18, w28), xs[0], dout8), iters=128) for _ in range(3))
    try:
        t_dw_fused = statistics.median(
            time_fn(lambda ws, a, d: monarch_dw_fused(a, d, ws[0], ws[1]),
                    ((w18, w28), xs[0], dout8), iters=128) for _ in range(3))
    except NotImplementedError:  # untuned TPU generation: no VMEM budgets
        t_dw_fused = None
    dw_floor = 2 * (B * n + B * m)  # one read each of x and dout

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
    # remat_policy="dots": best-or-tied across measurement rounds on this
    # chip (scripts/exp_remat_policy.py; margins within the runtime's
    # day-to-day variance -- docs/BENCHMARKS.md "Remat policy") -- matmul
    # outputs stay resident, only elementwise work recomputes;
    # memory-tight single-chip 7B configs keep "nothing"
    cfg = LlamaConfig(hidden_size=2048, num_hidden_layers=8,
                      num_attention_heads=16, num_key_value_heads=16,
                      intermediate_size=5504, vocab_size=32000,
                      param_dtype="bfloat16", dtype="bfloat16", remat=True,
                      remat_policy="dots", max_position_embeddings=T)
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
    try:
        for _ in range(3):  # compile + tunnel first-execution finalization
            float(tr._train_step_accum(tr.model, tr.optimizer, batches[0]))
    except Exception:  # noqa: BLE001 -- observed once: ResourceExhausted
        # from leftover device state (a killed prior process's buffers on
        # the tunnel server).  Drop every live buffer the earlier bench
        # sections still reference, clear executable caches, rebuild once.
        import gc
        del tr, model
        jax.clear_caches()
        gc.collect()
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        init_monarch(model, {
            "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
            "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                               "gate_proj", "up_proj", "down_proj"]},
            rngs=nnx.Rngs(1))
        tr = Trainer(model, targs, train_data=data, loss_fn=lm_loss)
        tr.model.train()
        batches = [b for b, _ in tr._batches(data, BS, shuffle=False, accum=GA)]
        for _ in range(3):
            float(tr._train_step_accum(tr.model, tr.optimizer, batches[0]))
    times = []
    for i in range(8):  # per-step sync: mixed-executable queues serialize
        t0 = _time.time()
        float(tr._train_step_accum(tr.model, tr.optimizer,
                                   batches[i % len(batches)]))
        times.append(_time.time() - t0)
    step_ms = statistics.median(times) * 1e3
    tokens_per_s = BS * GA * T / (step_ms / 1e3)

    # ---- MFU: model FLOPs per token / step time / v5e bf16 peak.
    # Convention (PaLM-style): 6 * P_matmul per token for fwd+bwd of every
    # 2D matmul incl. the lm_head (embedding LOOKUP excluded) plus
    # 12 * L * hidden * seq for the attention score/value matmuls (full
    # seq, causality not discounted).  Rematerialized recompute FLOPs are
    # NOT counted (MFU measures useful model FLOPs, so remat lowers MFU).
    # Monarch adapter FLOPs are <0.3% at blk_r=4 and are excluded.
    p_matmul = (cfg.num_hidden_layers
                * (4 * cfg.hidden_size ** 2
                   + 3 * cfg.hidden_size * cfg.intermediate_size)
                + cfg.hidden_size * cfg.vocab_size)
    flops_per_token = (6 * p_matmul
                       + 12 * cfg.num_hidden_layers * cfg.hidden_size * T)
    V5E_BF16_PEAK = 197e12  # public v5e spec
    mfu_pct = flops_per_token * tokens_per_s / V5E_BF16_PEAK * 100

    # ---- flagship 7B: the committed execution artifact (regenerated by
    # scripts/regen_7b_artifact.sh; too slow to re-measure per bench run:
    # compile+first-step alone is ~4 min).  Carried so every BENCH_rNN.json
    # answers "does the full 7B train on one chip, and how fast".
    flagship_7b = None
    try:
        import os as _os
        art = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "results", "exp_7b_execution.jsonl")
        with open(art) as f:
            rows = [json.loads(line) for line in f]
        # best executed full-7B row (the artifact also carries the smaller
        # shape-isolation rows and the expected-OOM demonstrations)
        rows = [r for r in rows if r.get("quant_host") and r.get("executed")
                and r.get("layers") == 32 and r.get("hidden") == 4096]
        rows.sort(key=lambda r: r.get("tokens_per_s", 0))
        for rec in rows[-1:]:
            # model-FLOPs MFU, same convention as recipe_level:
            # 6*P_matmul + 12*L*h*T per token; remat recompute and
            # adapter FLOPs excluded, lm_head included
            h7, L7, i7, v7, t7 = 4096, 32, 11008, 32000, rec.get("seq", 256)
            p_matmul = L7 * (4 * h7 * h7 + 3 * h7 * i7) + h7 * v7
            fpt = 6 * p_matmul + 12 * L7 * h7 * t7
            mfu7 = fpt * rec["tokens_per_s"] / V5E_BF16_PEAK * 100
            flagship_7b = {
                "ms_per_step": rec["ms_per_step"],
                "tokens_per_s": rec["tokens_per_s"],
                "mfu_pct": round(mfu7, 1),
                "config": ("Llama-7B (32L x 4096h/11008i), int4 "
                           "host-quantized base + Monarch adapters "
                           "on all 7 projections, state_split, "
                           "remat, bs%d x seq%d"
                           % (rec.get("bs", 1), t7)),
                "losses": rec.get("losses"),
                "source": ("committed artifact results/"
                           "exp_7b_execution.jsonl (regen: "
                           "scripts/regen_7b_artifact.sh)"),
            }
    except Exception as e:  # noqa: BLE001 -- artifact is optional context
        flagship_7b = {"error": str(e)}

    # ---- reasoning-eval: committed artifact (regen:
    # scripts/bench_reasoning_eval.py -- whole-call generation-eval at the
    # loreft math shape: 1.1B model, prompt 666, 32 new tokens, beam 4)
    reasoning_eval = None
    try:
        import os as _os
        art = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "results", "reasoning_eval_bench.json")
        with open(art) as f:
            r = json.load(f)
        reasoning_eval = {
            "greedy_s_per_1k": r["greedy"]["s_per_1k_examples"],
            "beam4_s_per_1k": r["beam4"]["s_per_1k_examples"],
            "greedy_reft_s_per_1k": r["greedy_reft"]["s_per_1k_examples"],
            "seven_dataset_math_eval_min":
                r["seven_dataset_math_eval"]["extrapolated_wall_clock_min"],
            "config": r["config"],
            "source": ("committed artifact results/reasoning_eval_bench."
                       "json (regen: scripts/bench_reasoning_eval.py)"),
        }
    except Exception as e:  # noqa: BLE001 -- artifact is optional context
        reasoning_eval = {"error": str(e)}

    # ---- int8 serving decode: TinyLlama-1.1B-shaped greedy decode with a
    # quantized frozen base + unmerged adapters (docs/BENCHMARKS.md decode
    # table's sweet spot), slope-timed 128-vs-384 new tokens
    int8_decode = _bench_int8_decode()
    if "error" in int8_decode:
        # the tunnel's remote-compile endpoint can transiently drop a
        # response (observed: "response body closed before all bytes were
        # read"); one retry distinguishes transient from real failures
        int8_decode = _bench_int8_decode()

    print(json.dumps({
        "metric": "monarch_adapter_overhead_speedup_vs_xla_unfused",
        "value": round(overhead_speedup, 4),
        "unit": ("x adapter-marginal-cost cut (merged-training path; "
                 "2664x4096->4096 blkr4 nblocks4 bf16, ga=16 recipe, grads "
                 "wrt w1/w2/x, slope-timed) vs the reference Triton "
                 "kernel's ~1.2x op-level claim"),
        "vs_baseline": round(overhead_speedup / 1.2, 4),
        "layer_level_speedup": round(layer_speedup, 4),
        "per_micro_batch_us": {
            "dense_floor": round(t_dense * 1e6, 1),
            "xla_unfused": round(t_xla * 1e6, 1),
            "fused_add": (round(t_fadd * 1e6, 1)
                          if t_fadd is not None else None),
            "merged": round(t_merged * 1e6, 1),
        },
        "blk_r_sweep": sweep,
        "north_star_blk_r8": {
            "op_fwd_bwd_us": round(t_op8 * 1e6, 1),
            "hbm_roofline_pct": round(roofline_pct, 1),
            "floor_us": round(floor_ext * 1e6, 1),
            "floor_mbytes": round(ext_bytes / 1e6, 1),
            "dw_standalone_us": {
                "xla": round(t_dw_xla * 1e6, 1),
                "fused_pallas": (round(t_dw_fused * 1e6, 1)
                                 if t_dw_fused is not None else None),
                "floor": round(dw_floor / hbm_peak * 1e6, 1)},
            "note": ("standalone monarch op (fwd + factor grads) at "
                     "2664x4096->4096 blk_r=8, timed in its EXTERNAL-LOSS "
                     "form: out is a live output (chained into the next "
                     "iteration's x, forcing its HBM write) and dout an "
                     "HBM input read per iteration.  hbm_roofline_pct = "
                     "interface floor / measured: the floor is the timed "
                     "program's interface bytes (x read + dout read + out "
                     "write + factor reads = %.1f MB) over the 819 GB/s "
                     "v5e spec -- a bound no schedule of this program can "
                     "beat, so the pct cannot exceed 100 (same-session "
                     "calibration + component floors: results/"
                     "north_star_floor.json).  dw_standalone_us compares "
                     "the XLA block path with the fused one-read Pallas "
                     "kernel the runtime gate (kernels/runtime_gate.py) "
                     "auto-selects per runtime."
                     % (ext_bytes / 1e6,)),
        },
        "recipe_level": {
            "model": "llama 2048h x 8L bf16 + monarch blk_r4 adapters",
            "config": "bs4 x ga8 x seq512, merged_training=auto, remat",
            "ms_per_opt_step": round(step_ms, 1),
            "tokens_per_s": round(tokens_per_s),
            "mfu_pct": round(mfu_pct, 1),
            "mfu_convention": ("6*P_matmul + 12*L*h*T per token (PaLM-style; "
                               "lm_head in, embedding lookup + remat "
                               "recompute + adapter FLOPs out) / 197 TF/s "
                               "v5e bf16 peak"),
        },
        "flagship_7b": flagship_7b,
        "reasoning_eval": reasoning_eval,
        "int8_decode": int8_decode,
    }))


if __name__ == "__main__":
    main()
