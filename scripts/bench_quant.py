"""Quantized-frozen-base measurements on the real chip (VERDICT r1 weak #9).

1. Layer micro-bench: MonarchLinear fwd+bwd with bf16 vs int8 vs int4 dense
   at the Llama-7B projection shape -- verifies the "convert+scale fuses
   into the matmul operand read" claim with honest slope timing.
2. 4-bit 7B PEFT step: the int4 base (3.4 GB) + bf16 activations fits a
   single 16 GB chip even at 2x transient (tunnel ignores donation), so
   this is the config that actually proves the qlora flow at 7B scale.

Run: timeout 2400 python -u scripts/bench_quant.py  [SKIP_7B=1 to skip #2]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import MonarchLinear
from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base
from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_grad_steps

print("backend:", jax.default_backend(), flush=True)

B, n, m = 2664, 4096, 4096
PEFT = {"monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True}


def layer_time(bits):
    w = np.random.default_rng(0).normal(0, 0.02, (m, n)).astype(np.float32)
    layer = MonarchLinear(n, m, peft_config=PEFT, weights=jnp.asarray(w),
                          dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                          rngs=nnx.Rngs(0))
    if bits in (4, 8):
        quantize_frozen_base(layer, bits=bits)
    layer.train()
    from sparse_matrix_fine_tuning_tpu.peft import trainable_filter
    filt = trainable_filter(extra_paths=())
    graphdef, adapters, rest = nnx.split(layer, filt, ...)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, n), jnp.bfloat16)

    def loss(x, adapters):
        lyr = nnx.merge(graphdef, adapters, rest)
        return jnp.sum(lyr(x).astype(jnp.float32) ** 2)

    t = time_grad_steps(loss, (x, adapters), argnums=(0, 1), iters=40,
                        chain_argnum=1)
    return t


if not os.environ.get("ONLY_7B"):
    for bits in (16, 8, 4):
        t = layer_time(bits)
        print(f"layer fwd+bwd int{bits:<2}: {t*1e6:7.1f} us/iter "
              f"(2664x4096->4096 blkr4)", flush=True)

if os.environ.get("SKIP_7B"):
    sys.exit(0)
if not os.environ.get("ONLY_7B"):
    # the 7B section needs the whole chip: run it in a fresh process so the
    # micro-bench's live buffers/compile caches don't eat HBM
    import subprocess
    env = dict(os.environ, ONLY_7B="1")
    rc = subprocess.run([sys.executable, "-u", __file__], env=env).returncode
    sys.exit(rc)

# ---------------------------------------------------------------------------
# 4-bit 7B step
from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import (
    init_monarch, param_stats, trainable_filter)

Bt, T = 1, 256
cfg = LlamaConfig(param_dtype="bfloat16", dtype="bfloat16", remat=True,
                  max_position_embeddings=T)
t0 = time.time()
model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
print(f"init 7B random base: {time.time()-t0:.1f}s", flush=True)
init_monarch(model, dict(PEFT, target_modules=[
    "q_proj", "v_proj", "k_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj"]), rngs=nnx.Rngs(1))
nq = quantize_frozen_base(model, bits=4)
print(f"quantized {nq} frozen base matrices to int4", flush=True)
param_stats(model, extra_paths=())

import optax

from sparse_matrix_fine_tuning_tpu.quant import QuantScales

filt = trainable_filter(extra_paths=())
tx = optax.adamw(5.4e-4)  # reference llama_mmlu best-HP lr
opt = nnx.Optimizer(model, tx, wrt=filt)
ids = jnp.asarray(np.random.default_rng(0).integers(2, cfg.vocab_size, (Bt, T)))

# static/mutable split (TrainingArgs.state_split): frozen base + scales are
# input-only, so the plan is args 4.29 + outputs 0.12 + temps 1.44 GB
# instead of the 10.02 GB full-state round-trip
static_f = nnx.Any(nnx.All(nnx.Param, nnx.Not(filt)), nnx.OfType(QuantScales))
graphdef, static_state, rest = nnx.split((model, opt), static_f, ...)


@partial(jax.jit, donate_argnums=(1,))
def step(static_state, rest, ids):
    model, opt = nnx.merge(graphdef, static_state, rest)
    def loss(mm, ids):
        return mm.loss(mm(ids), ids)
    val, grads = nnx.value_and_grad(loss, argnums=nnx.DiffState(0, filt))(model, ids)
    opt.update(model, grads)
    _, _, new_rest = nnx.split((model, opt), static_f, ...)
    return val, new_rest


t0 = time.time()
v, rest = step(static_state, rest, ids)
v = float(np.asarray(v))
print(f"compile + first step: {time.time()-t0:.1f}s loss={v:.3f}", flush=True)
losses = [v]
N = 5
t0 = time.time()
for _ in range(N):
    v, rest = step(static_state, rest, ids)
    losses.append(float(np.asarray(v)))
dt = (time.time() - t0) / N
print(f"int4 7B monarch step: {dt*1e3:.0f} ms/step "
      f"({Bt*T/dt:.0f} tokens/s) losses={['%.3f' % l for l in losses]}",
      flush=True)
