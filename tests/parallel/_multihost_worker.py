"""Subprocess worker for the multihost (pod-simulation) test.

Each worker is one "host": its own process with 4 virtual CPU devices,
joined into one 8-device global mesh via ``jax.distributed`` (Gloo over
localhost -- the standard way to validate multi-process SPMD without a
pod).  The parent test imports ``build_model``/``build_data`` from this
module so the single-process reference run is constructed identically.

argv: process_id num_processes port out_json_path output_dir
"""

import json
import os
import sys

N_ROWS, SEQ, VOCAB = 24, 16, 128
BS_LOCAL, ACCUM, STEPS = 2, 2, 3  # global micro-batch 4, macro 8 rows/step


def build_data():
    import numpy as np

    rng = np.random.default_rng(0)
    ids = rng.integers(2, VOCAB, size=(N_ROWS, SEQ))
    return {"input_ids": ids,
            "attention_mask": np.ones_like(ids, dtype=np.int32),
            "labels": ids.copy()}


def build_model():
    from flax import nnx

    from sparse_matrix_fine_tuning_tpu.models import (
        LlamaConfig, LlamaForCausalLM)
    from sparse_matrix_fine_tuning_tpu.peft import init_monarch

    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=512, max_position_embeddings=64,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    init_monarch(model, {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj"],
    }, rngs=nnx.Rngs(1))
    return cfg, model


def lm_loss(model, batch, train):
    logits = model(batch["input_ids"], attention_mask=batch["attention_mask"])
    return model.loss(logits, batch["labels"])


def make_trainer(model, data, mesh, output_dir):
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

    args = TrainingArgs(
        output_dir=output_dir, learning_rate=1e-3, max_steps=STEPS,
        per_device_train_batch_size=BS_LOCAL,
        gradient_accumulation_steps=ACCUM,
        logging_steps=0, log_param_steps=0)
    return Trainer(model, args, train_data=data, loss_fn=lm_loss, mesh=mesh)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    out_path, output_dir = sys.argv[4], sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sparse_matrix_fine_tuning_tpu.parallel import make_mesh, multihost

    multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    data = build_data()
    local = multihost.shard_data_for_process(data)
    assert len(local["input_ids"]) == N_ROWS // nproc

    _, model = build_model()
    tr = make_trainer(model, local, mesh, output_dir)
    tr.model.train()

    losses = []
    for batch, _ in tr._batches(local, BS_LOCAL, shuffle=False, accum=ACCUM):
        losses.append(float(tr._train_step_accum(
            tr.model, tr.optimizer, batch)))
    ckpt = tr.save_checkpoint(tag="mh")
    # exercise the multihost read path: every host loads what proc 0
    # wrote (barriers in training/checkpoint.py keep this race-free)
    tr.load_checkpoint(ckpt)

    # group_by_length under multihost: each host's shard has DIFFERENT
    # row lengths, so _trim_batch must agree on a cross-host trim length
    # or make_array_from_process_local_data diverges and collectives hang
    import numpy as np

    glens = np.asarray([4, 12, 6, 16, 9, 3, 14, 7] * (N_ROWS // 8))
    gmask = (np.arange(SEQ)[None, :] < glens[:, None]).astype(np.int32)
    gdata = dict(build_data(), attention_mask=gmask)
    glocal = multihost.shard_data_for_process(gdata)
    from sparse_matrix_fine_tuning_tpu.training import TrainingArgs, Trainer
    gargs = TrainingArgs(
        output_dir=sys.argv[5] + "-gbl", learning_rate=1e-3, max_steps=STEPS,
        per_device_train_batch_size=BS_LOCAL,
        gradient_accumulation_steps=ACCUM, logging_steps=0,
        log_param_steps=0, group_by_length=True, length_bucket=8)
    gtr = Trainer(tr.model, gargs, train_data=glocal, loss_fn=lm_loss,
                  mesh=mesh)
    gbl_shapes = []
    for batch, _ in gtr._batches(glocal, BS_LOCAL, shuffle=True,
                                 seed=0, accum=ACCUM):
        gbl_shapes.append(list(batch["input_ids"].shape))

    with open(out_path, "w") as f:
        json.dump({"process": pid, "losses": losses, "ckpt": ckpt,
                   "gbl_shapes": gbl_shapes,
                   "is_primary": multihost.is_primary()}, f)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    main()
