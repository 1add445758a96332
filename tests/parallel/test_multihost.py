"""Multi-host (pod) training: two-process CPU cluster vs single-process.

The reference is strictly single-process (SURVEY.md section 5.8).  Here
two subprocesses with 4 virtual CPU devices each join one 8-device
(dp2,fsdp2,tp2) global mesh via ``jax.distributed`` and run real Trainer
optimizer steps, each host feeding only ITS half of every global batch
(``parallel/multihost.py``).  Asserts:

* both hosts observe the identical loss trajectory (same SPMD program),
* it matches a single-process 8-device run fed the same global batch
  compositions,
* only process 0 writes the checkpoint; both return the same path.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    import _multihost_worker as w

    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"out{pid}.json")
        outs.append(out)
        env = dict(
            os.environ, JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_ENABLE_X64="0",
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), out,
             ckpt_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    recs = [json.load(open(o)) for o in outs]

    # identical trajectory on both hosts (it is one SPMD program)
    assert recs[0]["losses"] == recs[1]["losses"]
    assert len(recs[0]["losses"]) == w.STEPS
    assert recs[0]["losses"][-1] < recs[0]["losses"][0]

    # process-0-only checkpoint write; same path on both
    assert recs[0]["is_primary"] and not recs[1]["is_primary"]
    assert recs[0]["ckpt"] == recs[1]["ckpt"]
    assert os.path.exists(os.path.join(recs[0]["ckpt"], "trainable.npz"))

    # group_by_length: the per-host trim lengths must agree (cross-host
    # max in Trainer._trim_batch) -- divergent shapes would have hung the
    # workers long before this assert
    assert recs[0]["gbl_shapes"] == recs[1]["gbl_shapes"]
    assert len(recs[0]["gbl_shapes"]) > 1
    # and trimming actually happened (some batch shorter than full SEQ)
    assert any(s[-1] < w.SEQ for s in recs[0]["gbl_shapes"])

    # single-process 8-device reference with the SAME global batch
    # composition: multihost global batch i = [host0 rows, host1 rows]
    # (contiguous shards), i.e. a fixed permutation of the dataset
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the reference run")
    from sparse_matrix_fine_tuning_tpu.parallel import make_mesh

    data = w.build_data()
    half = w.N_ROWS // 2
    macro = w.BS_LOCAL * w.ACCUM
    perm = []
    for start in range(0, half, macro):
        for j in range(w.ACCUM):  # micro-batch j: both hosts' rows
            lo = start + j * w.BS_LOCAL
            perm += list(range(lo, lo + w.BS_LOCAL))
            perm += list(range(half + lo, half + lo + w.BS_LOCAL))
    ref_data = {k: v[np.asarray(perm)] for k, v in data.items()}

    _, model = w.build_model()
    tr = w.make_trainer(model, ref_data, make_mesh(dp=2, fsdp=2, tp=2),
                        str(tmp_path / "ref"))
    tr.model.train()
    ref_losses = []
    for batch, _ in tr._batches(ref_data, 2 * w.BS_LOCAL, shuffle=False,
                                accum=w.ACCUM):
        ref_losses.append(float(tr._train_step_accum(
            tr.model, tr.optimizer, batch)))
    np.testing.assert_allclose(recs[0]["losses"], ref_losses, rtol=5e-4)
