"""50-step bf16 trajectory parity vs the reference's torch training
(VERDICT r4 #4: strengthen the 0.5-pt accuracy-target evidence).

The slow-tier tests pin 6-step f32 parity on tiny widths; this experiment
runs the PRODUCTION configuration much longer and wider:

- RoBERTa-base-like layer widths (hidden 768 / intermediate 3072 / 12
  heads; 2 layers to bound wall-clock),
- causal-LM path (our Llama) with CHUNKED cross-entropy
  (config.loss_chunk > 0: full logits never materialized),
- merged_training="on" (the production merge-during-training fast path),
- OUR side in bf16 params + bf16 compute -- the TPU production numerics --
  against the reference's torch f32 `init_monarch` + AdamW training
  (reference train_utils.py:475-510, the same surgery the 6-step tests
  pin exactly),
- >= 50 optimizer steps, per-step loss trajectories compared.

The claim certified: the bf16 merged-chunked production path tracks the
reference's f32 trajectory within bf16 noise -- the remaining gap to the
0.5-pt GLUE target is pretrained-weight access, not training mechanics.

Run (writes results/trajectory_parity_50step.json):
  timeout 1800 python -u scripts/exp_trajectory_parity.py
The slow test (tests/reference_parity/test_trajectory_50step.py) runs the
same pair on CPU and asserts the tolerances.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 50
LR, WD, BETAS, EPS = 2e-3, 0.01, (0.9, 0.999), 1e-8
PEFT_CONFIG = {
    "monarch": True, "nblocks": 4, "blk_r": 4, "blk_sz": None,
    "square": False, "adapter": True,
    "target_modules": ["q_proj", "v_proj"],
}
REF_TRAIN_UTILS = "/root/reference/train_utils.py"


def _ref_train_utils():
    """Import the reference's train_utils.py via the reference-parity
    conftest's stub machinery (triton/bitsandbytes/ray/wandb fakes +
    cuda->cpu default rebinding)."""
    import importlib.util
    conftest_path = os.path.join(os.path.dirname(__file__), "..", "tests",
                                 "reference_parity", "conftest.py")
    spec = importlib.util.spec_from_file_location("ref_parity_conftest",
                                                  conftest_path)
    ct = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = ct
    spec.loader.exec_module(ct)

    if ct.REFERENCE_ROOT not in sys.path:
        sys.path.append(ct.REFERENCE_ROOT)
    # pre-load the transformers pieces train_utils needs (see conftest
    # ref_train_utils: a visible fake triton breaks availability probes)
    from transformers import Seq2SeqTrainer, Trainer, TrainerCallback  # noqa: F401
    from transformers.utils.import_utils import is_sagemaker_mp_enabled  # noqa: F401

    installed = ct._install_stubs()
    try:
        import src.layers.monarch_linear as ml
        import train_utils
    finally:
        ct._pop_stubs(installed)
    # rebind device="cuda" defaults to cpu (conftest ref fixture)
    for klass in (ml.MonarchLinear, ml.MonarchFactor):
        defaults = list(klass.__init__.__defaults__ or ())
        klass.__init__.__defaults__ = tuple(
            "cpu" if d == "cuda" else d for d in defaults)
    return train_utils


def run(steps: int = STEPS, seq: int = 64, mb: int = 8,
        param_dtype: str = "bfloat16", merged: str = "on",
        loss_chunk: int = 32):
    import numpy as np
    import torch
    import transformers

    import jax.numpy as jnp
    from flax import nnx

    from sparse_matrix_fine_tuning_tpu.models import (
        LlamaConfig, LlamaForCausalLM)
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_llama
    from sparse_matrix_fine_tuning_tpu.peft.surgery import init_monarch
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

    ref_tu = _ref_train_utils()

    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=2, num_attention_heads=12,
        num_key_value_heads=12, max_position_embeddings=seq,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attention_dropout=0.0)
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg)

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=2, num_attention_heads=12,
        num_key_value_heads=12, max_position_embeddings=seq,
        rms_norm_eps=1e-6, param_dtype=param_dtype, dtype=param_dtype,
        loss_chunk=loss_chunk)
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    load_llama(model, {k: v for k, v in hf_model.state_dict().items()})

    # --- surgery: the reference's own init_monarch vs ours, factors synced
    ref_tu.init_monarch(hf_model, dict(PEFT_CONFIG))
    adapted = init_monarch(model, dict(PEFT_CONFIG), rngs=nnx.Rngs(1))
    assert len(adapted) == 2 * cfg.num_hidden_layers
    for i in range(cfg.num_hidden_layers):
        sa_t = hf_model.model.layers[i].self_attn
        sa_j = model.model.layers[i].self_attn
        for name in ("q_proj", "v_proj"):
            rl, ol = getattr(sa_t, name), getattr(sa_j, name)
            assert type(rl).__name__ == "MonarchLinear"
            assert np.all(rl.blkdiag2.detach().numpy() == 0)
            # EXPLICIT COPY (np.array): .numpy() shares memory with the
            # torch parameter and jax's CPU backend zero-copy-aliases
            # numpy buffers, so with matching dtypes the synced factor
            # would keep tracking torch's in-place AdamW updates -- our
            # side would start from torch's POST-training factors and the
            # "parity" would silently compare shifted trajectories
            # (hf_convert._np guards the same hazard for weight loading).
            ol.blkdiag1.set_value(jnp.asarray(np.array(
                rl.blkdiag1.detach().numpy(), copy=True)
            ).astype(ol.blkdiag1[...].dtype))

    # --- torch side: reference surgery's designated trainable set
    # (blkdiag factors; same freeze note as test_training_trajectory.py)
    train_params = []
    for n, p in hf_model.named_parameters():
        keep = "blkdiag" in n
        p.requires_grad_(keep)
        if keep:
            train_params.append(p)
    opt_t = torch.optim.AdamW(train_params, lr=LR, weight_decay=WD,
                              betas=BETAS, eps=EPS)

    # cycle 4 fixed batches: the adapters memorize them, so the loss
    # DECREASES visibly and divergence between the two trainings would
    # compound into the trajectory instead of hiding in noise
    rng = np.random.default_rng(0)
    pool = [rng.integers(2, 512, size=(mb, seq)) for _ in range(4)]
    batches = [pool[i % len(pool)] for i in range(steps)]

    hf_model.train()
    torch_losses = []
    for ids in batches:
        opt_t.zero_grad()
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.ones(ids.shape, dtype=torch.long),
                       labels=torch.tensor(ids))
        out.loss.backward()
        opt_t.step()
        torch_losses.append(float(out.loss))

    # --- our side: production Trainer, merged path + chunked CE, bf16
    args = TrainingArgs(
        output_dir="/tmp/traj_parity", learning_rate=LR, weight_decay=WD,
        warmup_ratio=0.0, lr_scheduler_type="constant", max_grad_norm=0.0,
        max_steps=steps, per_device_train_batch_size=mb,
        gradient_accumulation_steps=1, large_lr=False,
        merged_training=merged, logging_steps=0, log_param_steps=0)
    dummy = {"input_ids": np.zeros((steps * mb, seq), np.int32),
             "attention_mask": np.ones((steps * mb, seq), np.int32),
             "labels": np.zeros((steps * mb, seq), np.int32)}
    # blkdiag factors ONLY (no lm_head), matching the torch side's set
    tr = Trainer(model, args, train_data=dummy, extra_trainable_paths=())
    if merged == "on":
        assert tr._n_merged == 2 * cfg.num_hidden_layers
    n_trainable = sum(leaf[...].size
                      for _, leaf in nnx.state(model, tr.filt).flat_state())
    assert n_trainable == sum(p.numel() for p in train_params), \
        (n_trainable, sum(p.numel() for p in train_params))
    tr.model.train()

    our_losses = []
    for ids in batches:
        batch = {"input_ids": jnp.asarray(ids)[None],
                 "attention_mask": jnp.ones((1, mb, seq), jnp.int32),
                 "labels": jnp.asarray(ids)[None]}
        our_losses.append(
            float(tr._train_step_accum(tr.model, tr.optimizer, batch)))

    t = np.asarray(torch_losses)
    o = np.asarray(our_losses)
    rec = {
        "steps": steps,
        "config": ("llama 768h/3072i x 2L 12-head vocab512, monarch blk_r4 "
                   "adapters on q_proj/v_proj, OURS bf16 params+compute, "
                   "merged_training=on, loss_chunk=32, AdamW lr 2e-3; "
                   "REFERENCE torch f32 init_monarch (train_utils.py:"
                   "475-510) + AdamW"),
        "torch_losses": [round(x, 4) for x in torch_losses],
        "our_losses": [round(x, 4) for x in our_losses],
        "max_abs_loss_diff": round(float(np.abs(t - o).max()), 4),
        "mean_abs_loss_diff": round(float(np.abs(t - o).mean()), 4),
        "torch_total_decrease": round(float(t[0] - t[-1]), 4),
        "our_total_decrease": round(float(o[0] - o[-1]), 4),
    }
    return rec


def main():
    import jax
    if os.environ.get("TRAJ_CPU"):  # env JAX_PLATFORMS alone is not enough
        jax.config.update("jax_platforms", "cpu")  # (sitecustomize pre-init)
    rec = run(steps=int(os.environ.get("STEPS", STEPS)))
    rec["backend"] = jax.default_backend()
    print(json.dumps(rec))
    out = os.path.join(os.path.dirname(__file__), "..", "results",
                       "trajectory_parity_50step.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
