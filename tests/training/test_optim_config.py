"""Optimizer groups, schedules, config overrides, metrics, logging, sharding."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.training.optim import (
    build_schedule,
    param_group_label,
)
from sparse_matrix_fine_tuning_tpu.utils.config import (
    load_best_hp,
    override_config,
    save_best_hp,
)
from sparse_matrix_fine_tuning_tpu.utils.metrics import (
    accuracy,
    f1_score,
    glue_compute,
    matthews_corrcoef,
    pearson_corr,
    spearman_corr,
)
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def test_param_group_labels():
    # reference train_utils.py:316-323: no_decay = bias/LayerNorm; large_lr =
    # blkdiag2/blkdiag_mult (or scaler when use_scaler)
    assert param_group_label(("layer", "0", "blkdiag2")) == "large_lr"
    assert param_group_label(("x", "blkdiag_mult")) == "large_lr"
    assert param_group_label(("x", "blkdiag1")) == "decay"
    assert param_group_label(("attn", "query", "bias")) == "no_decay"
    assert param_group_label(("ln", "LayerNorm", "scale")) == "no_decay"
    assert param_group_label(("x", "scaler", "scaler"), use_scaler=True) == "large_lr"
    assert param_group_label(("x", "blkdiag2"), use_scaler=True) == "decay"
    assert param_group_label(("attn", "query", "kernel")) == "decay"


def test_schedules():
    lin = build_schedule(1e-3, 100, warmup_ratio=0.1, kind="linear")
    assert float(lin(0)) == 0.0
    assert abs(float(lin(10)) - 1e-3) < 1e-9      # end of warmup
    assert float(lin(100)) < 2e-5                 # decayed to ~0
    cos = build_schedule(1e-3, 100, warmup_ratio=0.0, kind="cosine")
    assert abs(float(cos(0)) - 1e-3) < 1e-9
    assert float(cos(100)) < 1e-5
    const = build_schedule(1e-3, 100, warmup_ratio=0.0, kind="constant")
    assert abs(float(const(99)) - 1e-3) < 1e-9
    with pytest.raises(ValueError):
        build_schedule(1e-3, 100, kind="bogus")


def test_override_config_types_and_extras():
    import dataclasses

    @dataclasses.dataclass
    class C:
        lr: float = 1e-3
        name: str = "x"
        flag: bool = False

    c = C()
    d = {"blk_r": 4}
    extra = override_config([c, d], ["--lr=0.01", "--flag=True", "--blk_r=8",
                                     "--unknown=zzz"])
    assert c.lr == 0.01 and c.flag is True and d["blk_r"] == 8
    assert extra == {"unknown": "zzz"}
    # int -> float coercion for lr-like fields
    override_config([c], ["--lr=1"])
    assert isinstance(c.lr, float)


def test_best_hp_roundtrip(tmp_path):
    hp = {"learning_rate": 3e-4, "blk_r": 8}
    save_best_hp(hp, str(tmp_path))
    assert load_best_hp(str(tmp_path)) == hp
    assert load_best_hp(str(tmp_path / "nope")) is None


def test_metrics_against_sklearn_and_scipy():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    p = np.where(rng.random(200) < 0.8, y, 1 - y)
    from sklearn.metrics import f1_score as skl_f1
    from sklearn.metrics import matthews_corrcoef as skl_mcc
    assert abs(matthews_corrcoef(p, y) - skl_mcc(y, p)) < 1e-9
    assert abs(f1_score(p, y) - skl_f1(y, p)) < 1e-9
    from scipy.stats import pearsonr, spearmanr
    a, b = rng.normal(size=100), rng.normal(size=100)
    b = b + 0.5 * a
    assert abs(pearson_corr(a, b) - pearsonr(a, b)[0]) < 1e-9
    assert abs(spearman_corr(a, b) - spearmanr(a, b)[0]) < 1e-6


def test_glue_compute_selection():
    p = np.array([0, 1, 1, 0])
    y = np.array([0, 1, 0, 0])
    assert "matthews_correlation" in glue_compute("cola", p, y)
    assert "f1" in glue_compute("mrpc", p, y)
    assert "pearson" in glue_compute("stsb", p.astype(float), y.astype(float))


def test_run_logger_jsonl(tmp_path):
    from sparse_matrix_fine_tuning_tpu.utils.logging import RunLogger, get_run_group
    logger = RunLogger(str(tmp_path), use_wandb=False, config={"lr": 1})
    logger.log({"step": 1, "loss": 0.5})
    logger.finish()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert any(l.get("loss") == 0.5 for l in lines)
    g = get_run_group("cola", do_tune=True, cur_time="t")
    assert g == "tune_cola_t"


def test_persist_run_group_resume(tmp_path):
    """A resumed run rejoins the group recorded in full_group.txt
    (reference run_glue.py:236-246, 571-575)."""
    from sparse_matrix_fine_tuning_tpu.utils.logging import persist_run_group
    g1 = persist_run_group(str(tmp_path), "tune_cola_08-16-10")
    assert g1 == "tune_cola_08-16-10"
    assert open(tmp_path / "full_group.txt").read() == g1
    # resume with a DIFFERENT freshly-computed group: the stored one wins
    g2 = persist_run_group(str(tmp_path), "tune_cola_08-17-11", resume=True)
    assert g2 == "tune_cola_08-16-10"
    # resume with no marker file: keeps the new group and records it
    g3 = persist_run_group(str(tmp_path / "fresh"), "tune_mnli_x", resume=True)
    assert g3 == "tune_mnli_x"


def test_watch_layers_stats():
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.layers import MonarchLinear
    from sparse_matrix_fine_tuning_tpu.utils.logging import watch_layers
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 32))

    class M(nnx.Module):
        def __init__(self):
            self.query = MonarchLinear(32, 32, weights=w, rngs=nnx.Rngs(0))

    stats = watch_layers(M())
    assert any("blkdiag1" in k for k in stats)


def test_fsdp_param_spec():
    from jax.sharding import PartitionSpec as P
    from sparse_matrix_fine_tuning_tpu.parallel.sharding import param_spec

    big = jnp.zeros((4096, 512))
    assert param_spec(big, fsdp_size=4) == P("fsdp", None)
    small = jnp.zeros((8, 8))
    assert param_spec(small, fsdp_size=4) == P()       # too small: replicate
    ragged = jnp.zeros((1031, 1031))                   # no divisible dim
    assert param_spec(ragged, fsdp_size=4) == P()


def test_sharded_base_actually_sharded(tmp_path):
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import (
        RobertaConfig, RobertaForSequenceClassification)
    from sparse_matrix_fine_tuning_tpu.parallel import make_mesh
    from sparse_matrix_fine_tuning_tpu.peft import init_monarch
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

    # hidden 256 so the dense weights (256x256 = 64k elements) cross the
    # replicate-below-this-size threshold in param_spec
    cfg = RobertaConfig.tiny(hidden_size=256, intermediate_size=512)
    model = fresh_model(RobertaForSequenceClassification, cfg)
    init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4,
                         "adapter": True, "target_modules": ["query", "value"]},
                 rngs=nnx.Rngs(1))
    mesh = make_mesh(dp=2, fsdp=4)
    data = {"input_ids": np.ones((16, 8), np.int32),
            "attention_mask": np.ones((16, 8), np.int32),
            "labels": np.zeros((16,), np.int32)}
    tr = Trainer(model, TrainingArgs(output_dir=str(tmp_path), max_steps=1,
                                     logging_steps=0, log_param_steps=0),
                 train_data=data, mesh=mesh)
    # a frozen dense weight must be sharded over fsdp; adapters replicated
    dense = model.roberta.layer[0].attention.self.query.dense[...]
    assert "fsdp" in str(dense.sharding.spec)
    bd1 = model.roberta.layer[0].attention.self.query.blkdiag1[...]
    assert bd1.sharding.spec == jax.sharding.PartitionSpec() or \
        all(s is None for s in bd1.sharding.spec)


def test_hpo_resume(tmp_path):
    """A crashed sweep resumes from its JSONL state without re-running
    completed trials (reference Ray resume semantics)."""
    from sparse_matrix_fine_tuning_tpu.training.hpo import (
        hyperparameter_search, uniform)
    state = str(tmp_path / "hpo_state.jsonl")
    calls = []

    def run_trial(hp, epochs):
        calls.append((round(hp["x"], 6), epochs))
        if len(calls) == 3:
            raise KeyboardInterrupt  # simulate crash mid-sweep
        return {"m": -abs(hp["x"] - 0.5)}

    try:
        hyperparameter_search(run_trial, {"x": uniform(0, 1)}, n_trials=4,
                              target_metric="m", mode="max", min_epochs=1,
                              max_epochs=1, state_path=state)
    except KeyboardInterrupt:
        pass
    first_calls = len(calls)
    assert first_calls == 3

    def run_trial2(hp, epochs):
        calls.append((round(hp["x"], 6), epochs))
        return {"m": -abs(hp["x"] - 0.5)}

    result = hyperparameter_search(run_trial2, {"x": uniform(0, 1)}, n_trials=4,
                                   target_metric="m", mode="max", min_epochs=1,
                                   max_epochs=1, state_path=state)
    # only the 2 remaining trials ran (2 were recorded before the crash)
    assert len(calls) == first_calls + 2
    assert "best_hyperparams" in result
