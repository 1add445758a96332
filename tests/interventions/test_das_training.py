"""End-to-end Distributed Alignment Search: train a toy MLP on a causal
task, then learn a low-rank rotation whose interchange reproduces the
CausalModel's counterfactual behavior (the reference pyvene DAS workflow,
tutorials + models/interventions.py, on this stack: causal-model data ->
ReftModel swap_forward -> AdapterParam-only optimization)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from sparse_matrix_fine_tuning_tpu.interventions.causal_model import CausalModel
from sparse_matrix_fine_tuning_tpu.interventions.das import (
    interchange_accuracy,
    train_das,
)
from sparse_matrix_fine_tuning_tpu.interventions.reft import (
    ReftConfig,
    get_reft_model,
)
from sparse_matrix_fine_tuning_tpu.models.toy import MLPModel, ToyConfig


def _sum_tree():
    """P = X+Y, Q = Z+W, O = 1[P >= Q]; inputs in {0,1,2}."""
    variables = ["X", "Y", "Z", "W", "P", "Q", "O"]
    vals = [0, 1, 2]
    values = {"X": vals, "Y": vals, "Z": vals, "W": vals,
              "P": [0, 1, 2, 3, 4], "Q": [0, 1, 2, 3, 4], "O": [0, 1]}
    parents = {"X": [], "Y": [], "Z": [], "W": [],
               "P": ["X", "Y"], "Q": ["Z", "W"], "O": ["P", "Q"]}
    functions = {"X": lambda: 0, "Y": lambda: 0, "Z": lambda: 0,
                 "W": lambda: 0,
                 "P": lambda x, y: x + y, "Q": lambda z, w: z + w,
                 "O": lambda p, q: int(p >= q)}
    return CausalModel(variables, values, parents, functions, seed=0)


def _train_base(model, cm, steps=300):
    """Fit the MLP on the factual task (full-parameter training)."""
    ds = cm.generate_factual_dataset(512)
    x = jnp.asarray(ds["input_ids"])        # (n, 4)
    y = jnp.asarray(ds["labels"][:, 0].astype(np.int32))
    opt = nnx.Optimizer(model, optax.adam(5e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt):
        def obj(m):
            return m.loss(m(x), y)
        loss, grads = nnx.value_and_grad(obj)(model)
        opt.update(model, grads)
        return loss

    for _ in range(steps):
        loss = step(model, opt)
    pred = jnp.argmax(model(x), axis=-1)
    return float((pred == y).mean()), float(loss)


@pytest.mark.slow
def test_das_finds_aligned_rotation():
    cm = _sum_tree()
    cfg = ToyConfig(hidden_size=32, num_hidden_layers=3, num_classes=2,
                    input_dim=1, max_positions=4)
    model = MLPModel(cfg, rngs=nnx.Rngs(0))
    base_acc, _ = _train_base(model, cm)
    assert base_acc > 0.9, f"base task did not train (acc={base_acc})"

    # counterfactual data: intervene on P only
    ds = cm.generate_counterfactual_dataset(
        256, intervention_id=lambda iv: 0, batch_size=8,
        intervention_sampler=lambda: {"P": cm._rng.choice(values := cm.values["P"])})
    base = jnp.asarray(ds["input_ids"])                 # (n, 4)
    source = jnp.asarray(ds["source_input_ids"][:, 0])  # (n, 4)
    labels = jnp.asarray(ds["labels"][:, 0].astype(np.int32))

    # P is a function of inputs X,Y (positions 0,1): search a low-rank
    # rotated subspace of the layer-1 hidden state at those positions
    reft = get_reft_model(model, ReftConfig(representations=[
        {"layer": 1, "component": "block_output",
         "intervention": "LowRankRotatedSpaceIntervention",
         "low_rank_dimension": 4}]), rngs=nnx.Rngs(7))
    locs = jnp.broadcast_to(jnp.asarray([0, 1], jnp.int32),
                            (base.shape[0], 1, 2))

    before = interchange_accuracy(reft, base, source, labels,
                                  base_locations=locs, source_locations=locs)
    history = train_das(reft, base, source, labels, base_locations=locs,
                        source_locations=locs, steps=150, learning_rate=1e-2)
    after = interchange_accuracy(reft, base, source, labels,
                                 base_locations=locs, source_locations=locs)

    assert history[-1] < history[0] * 0.8, \
        f"DAS loss did not improve: {history[0]:.3f} -> {history[-1]:.3f}"
    assert after > before + 0.05 or after > 0.85, \
        f"interchange accuracy did not improve ({before:.3f} -> {after:.3f})"
    # the base network is untouched: only AdapterParam trained
    pred = jnp.argmax(model(jnp.asarray(ds["input_ids"])), axis=-1)
    base_lab = jnp.asarray(ds["base_labels"][:, 0].astype(np.int32))
    assert float((pred == base_lab).mean()) > 0.85


def test_train_das_freezes_base_network():
    """train_das must leave every plain nnx.Param byte-identical."""
    cm = _sum_tree()
    cfg = ToyConfig(hidden_size=16, num_hidden_layers=2, num_classes=2)
    model = MLPModel(cfg, rngs=nnx.Rngs(0))
    reft = get_reft_model(model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "RotatedSpaceIntervention"}]), rngs=nnx.Rngs(3))
    ds = cm.generate_counterfactual_dataset(
        16, intervention_id=lambda iv: 0, batch_size=4)
    base = jnp.asarray(ds["input_ids"])
    source = jnp.asarray(ds["source_input_ids"][:, 0])
    labels = jnp.asarray(ds["labels"][:, 0].astype(np.int32))
    locs = jnp.zeros((16, 1, 1), jnp.int32)

    # the base model holds only plain nnx.Param leaves (the trainable skew
    # lives on reft.interventions as AdapterParam), so a straight
    # before/after comparison of the model state proves the freeze
    frozen_before = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(
        nnx.state(model, nnx.Param)) if hasattr(x, "shape")]
    skew_before = np.asarray(reft.interventions[0].skew[...]).copy()
    train_das(reft, base, source, labels, base_locations=locs,
              source_locations=locs, steps=5, learning_rate=1e-2)
    frozen_after = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        nnx.state(model, nnx.Param)) if hasattr(x, "shape")]
    assert len(frozen_before) == len(frozen_after)
    for a, b in zip(frozen_before, frozen_after):
        np.testing.assert_array_equal(a, b)
    assert not np.allclose(
        np.asarray(reft.interventions[0].skew[...]), skew_before), \
        "intervention did not train"
