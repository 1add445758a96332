"""HPO search-space semantics: reference-mirroring spec kinds (quniform,
grid, pinned constants) and the per-task budget / method-space tables
(reference run_glue.py:571-686; VERDICT r2 #7)."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from sparse_matrix_fine_tuning_tpu.training.hpo import (
    _build_trials,
    _sample,
    choice,
    grid,
    hyperparameter_search,
    quniform,
)


def test_quniform_quantises_to_step():
    rng = np.random.default_rng(0)
    vals = {_sample({"lr": quniform(1e-4, 6.6e-4, 2e-5)}, rng)["lr"]
            for _ in range(200)}
    for v in vals:
        assert 1e-4 - 1e-12 <= v <= 6.6e-4 + 1e-12
        # multiple of 2e-5
        assert abs(v / 2e-5 - round(v / 2e-5)) < 1e-9
    assert len(vals) > 5  # actually spans the quantised lattice


def test_constants_pass_through_unsampled():
    rng = np.random.default_rng(0)
    hp = _sample({"seed": 42, "lr_scheduler_type": "cosine",
                  "blk_r": 4, "wd": 0.1}, rng)
    assert hp == {"seed": 42, "lr_scheduler_type": "cosine",
                  "blk_r": 4, "wd": 0.1}


def test_grid_expands_cartesian_product():
    """The reference full-FT space is a pure 3x2x1 grid -> exactly 6 trials
    regardless of n_trials (reference run_glue.py:630-636)."""
    space = {
        "learning_rate": grid([1e-5, 2e-5, 3e-5]),
        "per_device_train_batch_size": grid([16, 32]),
        "weight_decay": choice([0.1]),
        "lr_scheduler_type": grid(["cosine"]),
    }
    for n_trials in (1, 15):  # explicit --n_trials must NOT multiply the grid
        trials = _build_trials(space, n_trials=n_trials,
                               rng=np.random.default_rng(0))
        assert len(trials) == 6, n_trials
        combos = {(t["hp"]["learning_rate"],
                   t["hp"]["per_device_train_batch_size"]) for t in trials}
        assert len(combos) == 6
        assert all(t["hp"]["weight_decay"] == 0.1 for t in trials)


def test_grid_with_stochastic_dim_multiplies_by_n_trials():
    """Ray num_samples semantics: a genuinely random dim alongside grids
    samples n_trials times per grid point."""
    space = {"lr": grid([1, 2]), "dropout": choice([0.0, 0.1])}
    trials = _build_trials(space, n_trials=3, rng=np.random.default_rng(0))
    assert len(trials) == 6  # 2 grid points x 3 samples


def test_grid_search_runs_all_combos_end_to_end():
    space = {"lr": grid([1, 2, 3]), "bs": grid([16, 32])}
    seen = []

    def run_trial(hp, epochs):
        seen.append((hp["lr"], hp["bs"]))
        return {"eval_accuracy": hp["lr"] * 10 + (1 if hp["bs"] == 32 else 0)}

    result = hyperparameter_search(
        run_trial, space, n_trials=1, target_metric="eval_accuracy",
        mode="max", min_epochs=1, max_epochs=1)
    assert len(set(seen)) == 6
    assert result["best_hyperparams"] == {"lr": 3, "bs": 32}


def test_reference_method_spaces_and_budgets():
    import types

    import run_glue

    train_args = types.SimpleNamespace(seed=42, weight_decay=0.01)

    # monarch: pinned blk shapes, quantised lr, batch choice, cosine pinned
    # (n_trials=None -> the method's reference budget)
    args = types.SimpleNamespace(boft=False, monarch=True, lora=False,
                                 n_trials=None, tune_blk_config=False)
    space, n = run_glue.build_search_space(
        args, {"blk_r": 8, "nblocks": 4}, train_args)
    assert n == 25
    assert space["blk_r"] == 8 and space["nblocks"] == 4
    assert space["lr_scheduler_type"] == "cosine"
    assert space["learning_rate"][0] == "quniform"
    assert space["per_device_train_batch_size"] == ("choice", [16, 32])

    # block-config NAS adds dims and 10 trials (reference :609-616)
    args.tune_blk_config = True
    space, n = run_glue.build_search_space(args, {"blk_r": 8}, train_args)
    assert n == 35
    assert space["blk_r"] == ("choice", [1, 2, 4, 8])
    assert space["blk_sz"] == ("choice", [64, 128, 512])
    # ... but an EXPLICIT --n_trials is exact, even with the NAS dims
    args.n_trials = 4
    _, n = run_glue.build_search_space(args, {"blk_r": 8}, train_args)
    assert n == 4
    args.n_trials, args.tune_blk_config = None, False

    # boft: lr-only, 15 trials by default; an EXPLICIT --n_trials overrides
    # the method budget
    args = types.SimpleNamespace(boft=True, monarch=True, lora=False,
                                 n_trials=None, tune_blk_config=False)
    space, n = run_glue.build_search_space(args, {}, train_args)
    assert n == 15 and set(space) == {"seed", "learning_rate"}
    args.n_trials = 5
    _, n = run_glue.build_search_space(args, {}, train_args)
    assert n == 5

    # full FT: pure grid (reference :628-636)
    args = types.SimpleNamespace(boft=False, monarch=False, lora=False,
                                 n_trials=None, tune_blk_config=False)
    space, n = run_glue.build_search_space(args, {}, train_args)
    assert space["learning_rate"] == ("grid", [1e-5, 2e-5, 3e-5])

    # per-task budgets (reference :637-646)
    assert run_glue.load_hpo_budget("cola") == {"max_t": 14, "grace": 3}
    assert run_glue.load_hpo_budget("stsb") == {"max_t": 11, "grace": 3}
    assert run_glue.load_hpo_budget("mrpc") == {"max_t": 12, "grace": 3}
    assert run_glue.load_hpo_budget("rte") == {"max_t": 15, "grace": 3}


def test_parallel_trials_pin_distinct_devices():
    """devices= pins concurrent trials round-robin via jax.default_device
    (thread-local), the Ray resources_per_trial analogue: on the 8-device
    virtual CPU mesh, 4 concurrent trials must commit their arrays to 4
    distinct devices."""
    import threading

    import jax
    import jax.numpy as jnp

    from sparse_matrix_fine_tuning_tpu.training.hpo import (
        hyperparameter_search, uniform)

    devs = jax.devices()[:4]
    seen = {}
    lock = threading.Lock()

    def run_trial(hp, epochs, trial_id):
        y = (jnp.asarray(hp["lr"]) * 2.0).block_until_ready()
        (dev,) = y.devices()
        with lock:
            seen[trial_id] = dev
        return {"eval_loss": hp["lr"]}

    res = hyperparameter_search(
        run_trial, {"lr": uniform(0.0, 1.0)}, n_trials=4,
        min_epochs=1, max_epochs=1, parallel_trials=4, devices=devs)
    assert len(res["trials"]) == 4
    assert set(seen.values()) == set(devs)
