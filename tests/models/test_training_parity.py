"""TRAINING-dynamics parity vs torch: same weights, same batches, same
AdamW hyperparameters -> the loss trajectory over several optimizer steps
must match HF torch step for step.

Logit parity (test_hf_parity.py) validates the forward; this validates the
whole differentiated step: gradients through every layer, AdamW (decoupled
weight decay, bias-correction) semantics of optax vs torch.optim.AdamW,
and loss reduction -- the properties that make the reference's GLUE
recipes transfer (reference run_glue.py training loop via HF Trainer).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import (
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_roberta
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

LR, WD, BETAS, EPS = 1e-3, 0.01, (0.9, 0.999), 1e-8
STEPS = 5


def test_full_finetune_adamw_loss_trajectory_matches_torch():
    hf_cfg = transformers.RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        num_labels=3, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf_model = transformers.RobertaForSequenceClassification(hf_cfg)

    cfg = RobertaConfig.tiny(num_labels=3, hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0)
    model = fresh_model(RobertaForSequenceClassification, cfg)
    load_roberta(model, {k: v for k, v in hf_model.state_dict().items()})

    rng = np.random.default_rng(0)
    batches = [
        (rng.integers(2, 128, size=(8, 12)), rng.integers(0, 3, size=(8,)))
        for _ in range(STEPS)
    ]

    # ---- torch side: HF loss (mean CE) + decoupled AdamW
    hf_model.train()
    opt_t = torch.optim.AdamW(hf_model.parameters(), lr=LR, weight_decay=WD,
                              betas=BETAS, eps=EPS)
    torch_losses = []
    for ids, labels in batches:
        opt_t.zero_grad()
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.ones(ids.shape, dtype=torch.long),
                       labels=torch.tensor(labels))
        out.loss.backward()
        opt_t.step()
        torch_losses.append(float(out.loss))

    # ---- our side: full fine-tuning (every Param trainable) + optax.adamw
    model.train()
    tx = optax.adamw(LR, b1=BETAS[0], b2=BETAS[1], eps=EPS, weight_decay=WD)
    opt = nnx.Optimizer(model, tx, wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, ids, labels):
        def loss_fn(m):
            logits = m(ids, jnp.ones_like(ids))
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, labels[:, None], axis=-1))
        val, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return val

    with jax.default_matmul_precision("float32"):
        our_losses = [
            float(step(model, opt, jnp.asarray(ids), jnp.asarray(labels)))
            for ids, labels in batches
        ]

    # the trajectories must track each other step for step: identical
    # start, then each AdamW update keeps them within f32 noise
    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-3)
    # and training actually moved (guards against two flat no-op loops)
    assert abs(torch_losses[-1] - torch_losses[0]) > 1e-3
