"""LR-schedule parity vs HF transformers' get_scheduler.

The reference trains through HF Trainer, whose LR curve comes from
transformers.get_scheduler (linear / cosine with warmup -- reference
task_configs pin lr_scheduler_type).  Training-dynamics parity requires
the same curve step-for-step; this compares build_schedule against the
torch LambdaLR values at every step.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sparse_matrix_fine_tuning_tpu.training.optim import (  # noqa: E402
    build_schedule,
)


@pytest.mark.parametrize("kind", ["linear", "cosine"])
@pytest.mark.parametrize("total,warmup_ratio", [(100, 0.06), (37, 0.1),
                                                (20, 0.0)])
def test_schedule_matches_hf_step_for_step(kind, total, warmup_ratio):
    lr = 1.0
    warmup = int(total * warmup_ratio)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sch = transformers.get_scheduler(
        kind, opt, num_warmup_steps=warmup, num_training_steps=total)
    hf = []
    for _ in range(total):
        hf.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    ours = [float(build_schedule(lr, total, warmup_ratio, kind)(i))
            for i in range(total)]
    np.testing.assert_allclose(ours, hf, atol=1e-6)
