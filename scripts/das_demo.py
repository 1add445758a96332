"""Distributed Alignment Search walkthrough (the pyvene DAS tutorial
workflow on this stack): define a high-level CausalModel, train a toy MLP
on its factual behavior, then learn a low-rank rotation whose interchange
intervention reproduces the causal model's counterfactuals -- evidence the
causal variable is linearly encoded at that location.

CPU-runnable in under a minute:  python scripts/das_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from sparse_matrix_fine_tuning_tpu.interventions import (
    CausalModel,
    ReftConfig,
    get_reft_model,
    interchange_accuracy,
    train_das,
)
from sparse_matrix_fine_tuning_tpu.models import MLPModel, ToyConfig


def main():
    # -- 1. the high-level model: P = X+Y, Q = Z+W, O = 1[P >= Q]
    vals = [0, 1, 2]
    cm = CausalModel(
        variables=["X", "Y", "Z", "W", "P", "Q", "O"],
        values={"X": vals, "Y": vals, "Z": vals, "W": vals,
                "P": [0, 1, 2, 3, 4], "Q": [0, 1, 2, 3, 4], "O": [0, 1]},
        parents={"X": [], "Y": [], "Z": [], "W": [],
                 "P": ["X", "Y"], "Q": ["Z", "W"], "O": ["P", "Q"]},
        functions={"X": lambda: 0, "Y": lambda: 0, "Z": lambda: 0,
                   "W": lambda: 0, "P": lambda x, y: x + y,
                   "Q": lambda z, w: z + w,
                   "O": lambda p, q: int(p >= q)},
        seed=0)
    print("causal graph:")
    print(cm.format_structure())

    # -- 2. train the low-level network on the factual task
    cfg = ToyConfig(hidden_size=32, num_hidden_layers=3, num_classes=2,
                    max_positions=4)
    model = MLPModel(cfg, rngs=nnx.Rngs(0))
    ds = cm.generate_factual_dataset(512)
    x = jnp.asarray(ds["input_ids"])
    y = jnp.asarray(ds["labels"][:, 0].astype(np.int32))
    opt = nnx.Optimizer(model, optax.adam(5e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt):
        loss, grads = nnx.value_and_grad(lambda m: m.loss(m(x), y))(model)
        opt.update(model, grads)
        return loss

    for i in range(300):
        loss = step(model, opt)
    acc = float((jnp.argmax(model(x), -1) == y).mean())
    print(f"\nbase task: loss {float(loss):.4f}, accuracy {acc:.3f}")

    # -- 3. counterfactual data intervening on the hidden variable P
    cds = cm.generate_counterfactual_dataset(
        256, intervention_id=lambda iv: 0, batch_size=8,
        intervention_sampler=lambda: {"P": cm._rng.choice(cm.values["P"])})
    base = jnp.asarray(cds["input_ids"])
    source = jnp.asarray(cds["source_input_ids"][:, 0])
    labels = jnp.asarray(cds["labels"][:, 0].astype(np.int32))

    # -- 4. DAS: learn a rank-4 rotated subspace at layer 1, positions of
    # P's parents (X at 0, Y at 1)
    reft = get_reft_model(model, ReftConfig(representations=[
        {"layer": 1, "component": "block_output",
         "intervention": "LowRankRotatedSpaceIntervention",
         "low_rank_dimension": 4}]), rngs=nnx.Rngs(7))
    locs = jnp.broadcast_to(jnp.asarray([0, 1], jnp.int32),
                            (base.shape[0], 1, 2))
    before = interchange_accuracy(reft, base, source, labels,
                                  base_locations=locs, source_locations=locs)
    history = train_das(reft, base, source, labels, base_locations=locs,
                        source_locations=locs, steps=150, learning_rate=1e-2,
                        log_every=50)
    after = interchange_accuracy(reft, base, source, labels,
                                 base_locations=locs, source_locations=locs)
    print(f"\ninterchange accuracy: {before:.3f} -> {after:.3f} "
          f"(loss {history[0]:.3f} -> {history[-1]:.3f})")
    print("=> the rotation aligns the network's layer-1 X/Y positions "
          "with the causal variable P" if after > before else
          "=> no alignment found at this location")


if __name__ == "__main__":
    main()
