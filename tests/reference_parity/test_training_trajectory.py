"""N-step Monarch-ADAPTER training trajectory parity vs the reference's own
surgery + torch autograd + torch AdamW.

Extends tests/models/test_training_parity.py (full fine-tuning) to the PEFT
path the paper is about: a tiny RoBERTa classifier is adapted with the
REFERENCE's ``init_monarch`` (reference train_utils.py:475-510) on the torch
side and with ``peft/surgery.init_monarch`` on ours, given identical base
weights, identical adapter factors, and identical batches; the per-step
losses must track to f32 noise.  This is the strongest available
substantiation of the "within 0.5 pts of the reference" north star in a
sandbox with no pretrained weights: same surgery semantics, same gradients,
same optimizer behavior imply the same training outcome.

Trainable-set note: the reference's ``set_monarch_recursive`` explicitly
freezes the adapted layer's bias (train_utils.py:459-462), but the later
blanket ``module.requires_grad_(True)`` over MonarchLinear modules
(train_utils.py:500-505) silently re-enables it.  This test pins the torch
optimizer to the explicitly designated set (blkdiag factors + classifier),
matching this repo's structural AdapterParam filter; the re-enable is an
accident of module-level requires_grad_, not a designed capability.
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
from sparse_matrix_fine_tuning_tpu.peft.surgery import (
    init_monarch,
    trainable_filter,
)
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

LR, WD, BETAS, EPS = 2e-3, 0.01, (0.9, 0.999), 1e-8
STEPS = 6

PEFT_CONFIG = {
    "monarch": True, "nblocks": 4, "blk_r": 4, "blk_sz": None,
    "square": False, "adapter": True, "target_modules": ["query", "value"],
}


@pytest.mark.slow
def test_monarch_adapter_training_trajectory_matches_reference(ref, ref_train_utils):
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

    # --- surgery: the reference's own init_monarch vs ours
    ref_train_utils.init_monarch(hf_model, dict(PEFT_CONFIG))
    adapted = init_monarch(model, dict(PEFT_CONFIG), rngs=nnx.Rngs(1))
    assert len(adapted) == 2 * cfg.num_hidden_layers  # query+value per layer

    # --- align adapter factors (reference blkdiag1 is random Kaiming,
    # blkdiag2 zero) and verify the surgery produced the same shapes
    for i in range(cfg.num_hidden_layers):
        sa_t = hf_model.roberta.encoder.layer[i].attention.self
        sa_j = model.roberta.layer[i].attention.self
        for name in ("query", "value"):
            rl, ol = getattr(sa_t, name), getattr(sa_j, name)
            assert type(rl).__name__ == "MonarchLinear"
            assert tuple(ol.blkdiag1[...].shape) == tuple(rl.blkdiag1.shape)
            assert tuple(ol.blkdiag2[...].shape) == tuple(rl.blkdiag2.shape)
            assert np.all(rl.blkdiag2.detach().numpy() == 0)
            assert np.all(np.asarray(ol.blkdiag2[...]) == 0)
            ol.blkdiag1.set_value(jnp.asarray(rl.blkdiag1.detach().numpy()))
            np.testing.assert_allclose(np.asarray(ol.dense[...]),
                                       rl.dense.detach().numpy())

    # --- torch side: adapters (blkdiag only, see module docstring) + classifier
    train_params = []
    for n, p in hf_model.named_parameters():
        if "blkdiag" in n or "classifier" in n:
            p.requires_grad_(True)
            train_params.append((n, p))
        else:
            p.requires_grad_(False)
    # reference init_monarch froze embeddings/attention dense/etc.
    assert all("dense" not in n or "classifier" in n for n, _ in train_params)

    rng = np.random.default_rng(0)
    batches = [
        (rng.integers(2, 128, size=(8, 12)), rng.integers(0, 3, size=(8,)))
        for _ in range(STEPS)
    ]

    hf_model.train()
    opt_t = torch.optim.AdamW([p for _, p in train_params], lr=LR,
                              weight_decay=WD, betas=BETAS, eps=EPS)
    torch_losses = []
    for ids, labels in batches:
        opt_t.zero_grad()
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.ones(ids.shape, dtype=torch.long),
                       labels=torch.tensor(labels))
        out.loss.backward()
        opt_t.step()
        torch_losses.append(float(out.loss))

    # --- our side: structural AdapterParam + classifier filter
    model.train()
    wrt = trainable_filter()
    tx = optax.adamw(LR, b1=BETAS[0], b2=BETAS[1], eps=EPS, weight_decay=WD)
    opt = nnx.Optimizer(model, tx, wrt=wrt)

    n_trainable = sum(
        leaf[...].size for _, leaf in nnx.state(model, wrt).flat_state())
    assert n_trainable == sum(p.numel() for _, p in train_params)

    @nnx.jit
    def step(model, opt, ids, labels):
        def loss_fn(m):
            logits = m(ids, jnp.ones_like(ids))
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        val, grads = nnx.value_and_grad(
            loss_fn, argnums=nnx.DiffState(0, wrt))(model)
        opt.update(model, grads)
        return val

    with jax.default_matmul_precision("float32"):
        our_losses = [
            float(step(model, opt, jnp.asarray(ids), jnp.asarray(labels)))
            for ids, labels in batches
        ]

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-3)
    # training moved, and the adapter actually contributed (blkdiag2 left 0)
    assert abs(torch_losses[-1] - torch_losses[0]) > 1e-3
    b2 = model.roberta.layer[0].attention.self.query.blkdiag2[...]
    assert float(jnp.abs(b2).max()) > 0


@pytest.mark.slow
def test_composed_recipe_trajectory_matches_reference(ref, ref_train_utils,
                                                      tmp_path):
    """The reference's COMPOSED training stack vs this repo's Trainer.

    The plain-AdamW trajectory test above certifies model+optimizer in
    isolation; this one drives the reference's actual recipe end to end on
    the torch side -- ``MyAwesomeTrainer.create_optimizer`` (reference
    train_utils.py:309-374: 3 param groups with the no-decay name list and
    the large-lr group for blkdiag2), the HF scheduler via
    ``Trainer.create_scheduler``, HF gradient-accumulation semantics
    (loss/G per micro-batch, clip the accumulated grads, one
    optimizer+scheduler step per boundary) -- against ``training/Trainer``
    with ``merged_training="on"`` (in-jit nnx.scan accumulation over the
    merged-operand fast path).  Recipe-level drift (wrong group labels,
    schedule off-by-one, accumulation-boundary mismatch, merged-path
    numerics) shows up here and nowhere else.
    """
    G, OPT_STEPS, MB = 2, 6, 4  # micro-batches/step, optimizer steps, micro bs
    NEW_LR, WARMUP_RATIO = 5e-3, 0.0

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

    ref_train_utils.init_monarch(hf_model, dict(PEFT_CONFIG))
    init_monarch(model, dict(PEFT_CONFIG), rngs=nnx.Rngs(1))
    for i in range(cfg.num_hidden_layers):
        sa_t = hf_model.roberta.encoder.layer[i].attention.self
        sa_j = model.roberta.layer[i].attention.self
        for name in ("query", "value"):
            rl, ol = getattr(sa_t, name), getattr(sa_j, name)
            ol.blkdiag1.set_value(jnp.asarray(rl.blkdiag1.detach().numpy()))

    # identical trainable set both sides (see module docstring on the
    # reference's bias re-enable accident)
    train_params = []
    for n, p in hf_model.named_parameters():
        keep = "blkdiag" in n or "classifier" in n
        p.requires_grad_(keep)
        if keep:
            train_params.append((n, p))

    rng = np.random.default_rng(1)
    micro_batches = [
        (rng.integers(2, 128, size=(MB, 12)), rng.integers(0, 3, size=(MB,)))
        for _ in range(G * OPT_STEPS)
    ]

    # --- torch side: the reference's own composed stack
    hf_args = transformers.TrainingArguments(
        output_dir=str(tmp_path / "ref"), learning_rate=LR,
        weight_decay=WD, warmup_ratio=WARMUP_RATIO,
        lr_scheduler_type="linear", max_grad_norm=1.0,
        per_device_train_batch_size=MB, gradient_accumulation_steps=G,
        report_to=[], use_cpu=True)
    ref_trainer = ref_train_utils.MyAwesomeTrainer(
        model=hf_model, args=hf_args, large_lr=True, new_lr=NEW_LR)
    opt_t = ref_trainer.create_optimizer()
    sched_t = ref_trainer.create_scheduler(num_training_steps=OPT_STEPS,
                                           optimizer=opt_t)
    # the large-lr group really exists and holds exactly the blkdiag2 set
    group_sizes = [sum(p.numel() for p in g["params"])
                   for g in opt_t.param_groups]
    assert group_sizes[2] == sum(p.numel() for n, p in train_params
                                 if "blkdiag2" in n)
    assert opt_t.param_groups[2]["lr"] == NEW_LR

    hf_model.train()
    torch_losses = []
    for s in range(OPT_STEPS):
        opt_t.zero_grad()
        acc = 0.0
        for g in range(G):
            ids, labels = micro_batches[s * G + g]
            out = hf_model(
                input_ids=torch.tensor(ids),
                attention_mask=torch.ones(ids.shape, dtype=torch.long),
                labels=torch.tensor(labels))
            (out.loss / G).backward()
            acc += float(out.loss) / G
        torch.nn.utils.clip_grad_norm_([p for _, p in train_params], 1.0)
        opt_t.step()
        sched_t.step()
        torch_losses.append(acc)

    # --- our side: the production Trainer, merged path forced on
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

    def ce_loss(m, batch, train):
        logits = m(batch["input_ids"], batch["attention_mask"])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, batch["labels"][:, None], axis=-1))

    args = TrainingArgs(
        output_dir=str(tmp_path / "ours"), learning_rate=LR,
        weight_decay=WD, warmup_ratio=WARMUP_RATIO,
        lr_scheduler_type="linear", max_grad_norm=1.0, max_steps=OPT_STEPS,
        per_device_train_batch_size=MB, gradient_accumulation_steps=G,
        large_lr=True, new_lr=NEW_LR, merged_training="on",
        logging_steps=0, log_param_steps=0)
    dummy = {"input_ids": np.zeros((G * OPT_STEPS * MB, 12), np.int32),
             "attention_mask": np.ones((G * OPT_STEPS * MB, 12), np.int32),
             "labels": np.zeros((G * OPT_STEPS * MB,), np.int32)}
    tr = Trainer(model, args, train_data=dummy, loss_fn=ce_loss)
    assert tr._n_merged == 2 * cfg.num_hidden_layers  # merged path really on
    assert tr.num_training_steps() == OPT_STEPS
    tr.model.train()

    our_losses = []
    with jax.default_matmul_precision("float32"):
        for s in range(OPT_STEPS):
            stack = [micro_batches[s * G + g] for g in range(G)]
            batch = {
                "input_ids": jnp.asarray(np.stack([b[0] for b in stack])),
                "attention_mask": jnp.ones((G, MB, 12), jnp.int32),
                "labels": jnp.asarray(np.stack([b[1] for b in stack])),
            }
            our_losses.append(
                float(tr._train_step_accum(tr.model, tr.optimizer, batch)))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-3)
    assert abs(torch_losses[-1] - torch_losses[0]) > 1e-3
