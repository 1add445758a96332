"""Find the biggest-executing int4+state_split+remat PEFT config on this
chip, and isolate WHY full 7B fails (VERDICT r2 #2).

Round 2 showed the int4 7B training step COMPILES at 5.85 GB peak but
ResourceExhausts at execution on this tunnel runtime, while 3.3B executes
(docs/BENCHMARKS.md "int4 7B").  The diagnosis blamed width-dependent
tunnel-arena behavior; this experiment proves or kills that:

  1. width isolation: 8 layers x 7B width (hidden 4096 / inter 11008)
  2. depth isolation: 32 layers x half width (hidden 2048 / inter 5504)
  3. full 7B (32 x 4096/11008) -- expected to fail per round 2
  4. layer binary-search at 7B width for the execution boundary

Each config runs in a FRESH subprocess (a ResourceExhausted can poison the
runtime arena).  Every executing config reports median ms/step over 4
steps with per-step loss (must decrease).  Results append to
results/exp_7b_execution.jsonl.

Run: timeout 3600 python -u scripts/exp_7b_execution.py
Single config: LAYERS=8 HIDDEN=4096 INTER=11008 python -u scripts/exp_7b_execution.py
"""

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# bs x seq: round-2/3 boundary runs used 1 x 256; the flagship-throughput
# config (round 5) scales both to fill the MXU -- the state_split plan
# left ~10 GB of HBM idle at bs1 x seq256 (VERDICT r4 #1)
BT = int(os.environ.get("BS", "1"))
T = int(os.environ.get("SEQ", "256"))
STEPS = int(os.environ.get("STEPS", "4"))


def run_one(layers: int, hidden: int, inter: int,
            quant_host: bool = False) -> int:
    """Child process: one config, 4 training steps.  Exit 0 = executed,
    42 = ResourceExhausted, other = real error.

    quant_host: initialise + int4-quantize the base ON THE HOST (CPU
    backend) and ship only the packed weights to the chip -- the device
    never holds the transient bf16 base.  Tests the hypothesis that the 7B
    failure is the INIT-TIME bf16 footprint (13 GB) poisoning the arena,
    not the training step's own (~5 GB) footprint.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import nnx

    from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
    from sparse_matrix_fine_tuning_tpu.peft import (
        init_monarch, param_stats, trainable_filter)
    from sparse_matrix_fine_tuning_tpu.quant import QuantScales, quantize_frozen_base

    heads = max(hidden // 128, 1)
    remat_policy = os.environ.get("REMAT_POLICY", "nothing")
    cfg = LlamaConfig(hidden_size=hidden, num_hidden_layers=layers,
                      num_attention_heads=heads, num_key_value_heads=heads,
                      intermediate_size=inter, vocab_size=32000,
                      param_dtype="bfloat16", dtype="bfloat16", remat=True,
                      remat_policy=remat_policy,
                      max_position_embeddings=T)
    t0 = time.time()
    total = None  # set after a successful build; None in init-failure records

    def build():
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        init_monarch(model, {
            "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
            "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                               "gate_proj", "up_proj", "down_proj"]},
            rngs=nnx.Rngs(1))
        return model, quantize_frozen_base(model, bits=4)

    # the try covers init too: the device-side bf16 init transient is one
    # of the failure modes this experiment exists to diagnose, so an
    # init-time ResourceExhausted must produce the same structured record
    # (executed=False, oom=True, rc 42) as a step-time one
    try:
        if quant_host:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                model, nq = build()
            tpu = jax.devices()[0]
            state = jax.device_put(nnx.state(model), tpu)
            nnx.update(model, state)
            print(f"host-quantized; packed state shipped to {tpu}", flush=True)
        else:
            model, nq = build()
        total, _ = param_stats(model, extra_paths=(), verbose=False)
        print(f"[{layers}L x {hidden}h/{inter}i] ~{total/1e9:.2f}B params, "
              f"{nq} int4 matrices, setup {time.time()-t0:.0f}s", flush=True)

        filt = trainable_filter(extra_paths=())
        opt = nnx.Optimizer(model, optax.adamw(5.4e-4), wrt=filt)
        ids = jnp.asarray(np.random.default_rng(0).integers(
            2, cfg.vocab_size, (BT, T)))

        static_f = nnx.Any(nnx.All(nnx.Param, nnx.Not(filt)),
                           nnx.OfType(QuantScales))
        graphdef, static_state, rest = nnx.split((model, opt), static_f, ...)

        @partial(jax.jit, donate_argnums=(1,))
        def step(static_state, rest, ids):
            model, opt = nnx.merge(graphdef, static_state, rest)

            def loss(mm, ids):
                return mm.loss(mm(ids), ids)

            val, grads = nnx.value_and_grad(
                loss, argnums=nnx.DiffState(0, filt))(model, ids)
            opt.update(model, grads)
            _, _, new_rest = nnx.split((model, opt), static_f, ...)
            return val, new_rest

        losses, times = [], []
        for i in range(STEPS):
            t0 = time.time()
            v, rest = step(static_state, rest, ids)
            v = float(v)
            times.append(time.time() - t0)
            losses.append(round(v, 3))
        ms = statistics.median(times[1:]) * 1e3
        print(json.dumps({
            "layers": layers, "hidden": hidden, "inter": inter,
            "quant_host": quant_host, "remat_policy": remat_policy,
            "bs": BT, "seq": T,
            "params_b": round(total / 1e9, 2), "executed": True,
            "ms_per_step": round(ms, 1),
            "tokens_per_s": round(BT * T / (ms / 1e3), 1),
            "compile_plus_first_step_s": round(times[0], 1),
            "losses": losses,
        }), flush=True)
        return 0
    except Exception as e:
        name = type(e).__name__
        oom = "RESOURCE_EXHAUSTED" in str(e) or "ResourceExhausted" in name
        print(json.dumps({
            "layers": layers, "hidden": hidden, "inter": inter,
            "quant_host": quant_host,
            "params_b": round(total / 1e9, 2) if total else None,
            "executed": False,
            "error": name, "oom": oom,
            "detail": str(e).split("\n")[0][:300],
        }), flush=True)
        return 42 if oom else 1


def drive():
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "results", "exp_7b_execution.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    results = {}

    def attempt(layers, hidden, inter, label):
        """True = executed, False = OOM (rc 42).  A non-OOM error (rc 1:
        remote-compile flake etc.) is retried once -- it must not shrink
        the capacity boundary search as if it were an OOM -- and if it
        persists it is recorded as an error and treated as a failure,
        flagged distinctly in the JSONL."""
        key = (layers, hidden, inter)
        if key in results:
            return results[key]
        print(f"=== {label}: {layers}L x {hidden}h/{inter}i ===", flush=True)
        env = dict(os.environ, LAYERS=str(layers), HIDDEN=str(hidden),
                   INTER=str(inter))
        hung = False
        for retry in range(2):
            # A wedged tunnel hangs the child rather than erroring -- the
            # exact failure mode this experiment diagnoses.  Record it as
            # a distinct non-OOM failure instead of crashing the search.
            try:
                p = subprocess.run([sys.executable, "-u", __file__], env=env,
                                   capture_output=True, text=True,
                                   timeout=1500)
            except subprocess.TimeoutExpired as e:
                hung = True
                for stream in (e.stdout, e.stderr):
                    if stream:
                        sys.stdout.write(
                            stream.decode(errors="replace")[-2000:]
                            if isinstance(stream, bytes) else stream[-2000:])
                print(f"child HUNG past {e.timeout:.0f}s (wedged tunnel?); "
                      "recorded as hang", flush=True)
                p = None
                break
            sys.stdout.write(p.stdout)
            if p.returncode in (0, 42):
                break
            sys.stdout.write(p.stderr[-2000:])
            if retry == 0:
                print(f"non-OOM rc={p.returncode}; retrying once "
                      "(transient?)", flush=True)
        ok = p is not None and p.returncode == 0
        # child-printed metrics first, driver verdict last: the driver's
        # returncode-derived fields are authoritative (a child can print a
        # success record and then die at teardown -- rc != 0 must win so
        # the JSONL row agrees with the boundary search's own decision)
        rec = {"label": label, "layers": layers, "hidden": hidden,
               "inter": inter}
        if p is not None:
            for line in p.stdout.splitlines():
                if line.startswith("{"):
                    rec.update(json.loads(line))
        rec.update(executed=ok, rc=None if hung else p.returncode,
                   hung=hung,
                   non_oom_error=hung or p.returncode not in (0, 42))
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if hung:
            # A hang is tunnel state, not capacity: concluding "fails" here
            # would shrink the boundary search on wedged-tunnel noise.
            # Abort; per-attempt progress is already persisted in the JSONL.
            raise RuntimeError(
                f"{label}: child hung -- wedged tunnel; aborting the search "
                "(capacity cannot be concluded from a hang)")
        results[key] = ok
        return ok

    wide_shallow = attempt(8, 4096, 11008, "width-isolation (7B width, 8L)")
    deep_narrow = attempt(32, 2048, 5504, "depth-isolation (32L, half width)")
    full = attempt(32, 4096, 11008, "full 7B")

    if wide_shallow and not full:
        # boundary search on depth at 7B width
        lo, hi = 8, 32  # lo executes, hi fails
        while hi - lo > 4:
            mid = (lo + hi) // 2
            if attempt(mid, 4096, 11008, f"boundary search {mid}L"):
                lo = mid
            else:
                hi = mid
        print(f"boundary: {lo}L x 7B-width executes, {hi}L fails", flush=True)
    elif not wide_shallow:
        print("width alone already fails at 8L -- width-dependent failure "
              "confirmed independent of total size", flush=True)
    print(f"results -> {out_path}", flush=True)


if __name__ == "__main__":
    if os.environ.get("LAYERS"):
        sys.exit(run_one(int(os.environ["LAYERS"]),
                         int(os.environ["HIDDEN"]),
                         int(os.environ["INTER"]),
                         quant_host=bool(os.environ.get("QUANT_HOST"))))
    drive()
