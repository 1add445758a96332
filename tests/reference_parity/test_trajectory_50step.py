"""50-step bf16 PRODUCTION-path trajectory parity vs the reference's torch
training (VERDICT r4 #4): RoBERTa-base-like widths (768h/3072i/12-head),
causal-LM path with chunked CE, merged_training=on, our side in bf16
params+compute vs the reference's f32 `init_monarch` + AdamW
(reference train_utils.py:475-510).

The experiment body lives in scripts/exp_trajectory_parity.py (the same
code regenerates the committed on-chip artifact
results/trajectory_parity_50step.json); this test runs it on CPU and
asserts the tolerances.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "..", "scripts",
                      "exp_trajectory_parity.py")


@pytest.mark.slow
def test_50step_bf16_merged_chunked_trajectory_tracks_reference():
    spec = importlib.util.spec_from_file_location("exp_traj", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)

    rec = mod.run(steps=50)
    t = np.asarray(rec["torch_losses"])
    o = np.asarray(rec["our_losses"])

    # bf16 params+compute vs f32: per-step agreement at bf16 noise scale.
    # Measured 0.0014 max / 0.0003 mean over 50 steps once the factor
    # sync stopped aliasing torch storage (jax CPU zero-copy of .numpy()
    # views -- the synced init silently tracked torch's in-place AdamW
    # updates and this test compared SHIFTED trajectories); tolerances
    # leave ~10x headroom over the measured drift.
    assert rec["max_abs_loss_diff"] < 0.02, rec
    assert rec["mean_abs_loss_diff"] < 0.005, rec
    # both trainings actually moved, by comparable amounts
    assert rec["torch_total_decrease"] > 0.05, rec
    assert rec["our_total_decrease"] > 0.05, rec
    assert abs(rec["our_total_decrease"] - rec["torch_total_decrease"]) \
        < 0.3 * max(rec["torch_total_decrease"], rec["our_total_decrease"]), rec
    # trajectories are strongly correlated step-for-step, not just endpoint
    corr = np.corrcoef(t, o)[0, 1]
    assert corr > 0.98, corr
