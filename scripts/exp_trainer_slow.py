"""Why is Trainer's train_step_accum slow on TPU?  Bisect:
(c) single-micro fwd+bwd dispatch x GA  vs  (b) nnx.scan accumulation step.
Same model/config as bench_trainer_step (hidden 2048, 8 layers, bs4 ga8).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import init_monarch, trainable_filter

print("backend:", jax.default_backend(), flush=True)

BS, GA, T = 4, 8, 512
REMAT = os.environ.get("REMAT", "1") == "1"
cfg = LlamaConfig(hidden_size=2048, num_hidden_layers=8,
                  num_attention_heads=16, num_key_value_heads=16,
                  intermediate_size=5504, vocab_size=32000,
                  param_dtype="bfloat16", dtype="bfloat16", remat=REMAT,
                  max_position_embeddings=T)
model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
                     "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                                        "gate_proj", "up_proj", "down_proj"]},
             rngs=nnx.Rngs(1))
filt = trainable_filter(extra_paths=())
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(GA, BS, T)), jnp.int32)
print(f"remat={REMAT}", flush=True)


def timeit(fn, *args, n=4, label=""):
    v = fn(*args)
    float(np.asarray(v))
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    float(np.asarray(v))
    dt = (time.time() - t0) / n
    print(f"{label:36s}: {dt*1e3:8.1f} ms", flush=True)
    return dt


@nnx.jit
def step_c(model, mb):
    def inner(m, mb):
        return m.loss(m(mb), mb)
    loss, grads = nnx.value_and_grad(
        inner, argnums=nnx.DiffState(0, filt))(model, mb)
    return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 1e-30


t_micro = timeit(step_c, model, ids[0], label="(c) one micro fwd+bwd dispatch")
print(f"    -> x GA={GA}: {t_micro*GA*1e3:.1f} ms expected", flush=True)


@nnx.jit
def step_b(model, ids):
    zero = jax.tree.map(lambda v: jnp.zeros(v.shape, jnp.float32),
                        nnx.state(model, filt))

    def inner(m, mb):
        return m.loss(m(mb), mb)

    @nnx.scan(in_axes=(nnx.Carry, 0), out_axes=nnx.Carry)
    def micro(carry, mb):
        model, gacc, lacc = carry
        loss, grads = nnx.value_and_grad(
            inner, argnums=nnx.DiffState(0, filt))(model, mb)
        gacc = jax.tree.map(lambda a, g: a + g.astype(a.dtype), gacc, grads)
        return (model, gacc, lacc + loss)

    model, gacc, lacc = micro((model, zero, jnp.float32(0)), ids)
    return lacc


timeit(step_b, model, ids, label="(b) nnx.scan accum step (GA micros)")


# (e) the REAL Trainer step (optimizer.update + donation included)
from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

n = BS * GA * 4
rng2 = np.random.default_rng(1)
ids_np = rng2.integers(2, cfg.vocab_size, size=(n, T)).astype(np.int32)
data = {"input_ids": ids_np, "attention_mask": np.ones_like(ids_np),
        "labels": ids_np.copy()}

def lm_loss(m, batch, train):
    logits = m(batch["input_ids"], attention_mask=batch["attention_mask"])
    return m.loss(logits, batch["labels"], weights=batch.get("_valid"))

args = TrainingArgs(output_dir="/tmp/exp_tr", learning_rate=5e-4,
                    max_steps=10**9, per_device_train_batch_size=BS,
                    gradient_accumulation_steps=GA, logging_steps=0,
                    log_param_steps=0, merged_training="off")
tr = Trainer(model, args, train_data=data, loss_fn=lm_loss)
tr.model.train()
batch = next(tr._batches(data, BS, shuffle=False, accum=GA))[0]

def run_e(batch):
    return tr._train_step_accum(tr.model, tr.optimizer, batch)

t_first = time.time()
float(np.asarray(run_e(batch)))
print(f"(e) trainer step first call: {time.time()-t_first:.1f}s", flush=True)
timeit(run_e, batch, label="(e) real Trainer accum step")

# (f) same jitted body but NO optimizer.update and NO donation
@nnx.jit
def step_f(model, batch):
    G = GA
    zero = jax.tree.map(lambda v: jnp.zeros(v.shape, jnp.float32),
                        nnx.state(model, filt))

    def inner(m, b):
        return lm_loss(m, b, True)

    @nnx.scan(in_axes=(nnx.Carry, 0), out_axes=nnx.Carry)
    def micro(carry, mb):
        model, gacc, lacc = carry
        loss, grads = nnx.value_and_grad(
            inner, argnums=nnx.DiffState(0, filt))(model, mb)
        gacc = jax.tree.map(lambda a, g: a + g.astype(a.dtype), gacc, grads)
        return (model, gacc, lacc + loss)

    model, gacc, lacc = micro((model, zero, jnp.float32(0)), batch)
    g = sum(jnp.sum(x) for x in jax.tree.leaves(gacc))
    return lacc + g * 1e-30

timeit(step_f, model, batch, label="(f) same body, no update/donate")


# (g) same trainer step but with a BLOCKING loss fetch per call
def run_g(batch, n=4):
    t0 = time.time()
    for _ in range(n):
        float(np.asarray(tr._train_step_accum(tr.model, tr.optimizer, batch)))
    return (time.time() - t0) / n


print(f"(g) trainer step, fetch per call    : {run_g(batch)*1e3:8.1f} ms",
      flush=True)

# (h) dispatch+fetch overhead of a trivial jitted fn
@jax.jit
def tiny(x):
    return x + 1

x = jnp.zeros((8, 128))
float(np.asarray(tiny(x)))
t0 = time.time()
for _ in range(10):
    x = tiny(x)
    float(np.asarray(x[0, 0]))
print(f"(h) trivial dispatch+fetch          : {(time.time()-t0)/10*1e3:8.1f} ms",
      flush=True)
