"""Pallas fused Monarch kernel vs jnp path (interpreter mode on CPU).

Mirrors the reference's kernel test (demos/test_triton.py:48-66): forward
outputs and all three gradients compared against the reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    monarch_kernel,
    monarch_kernel_supported,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply

CASES = [
    # (batch, K, Q, P, S) with L=K, R=Q
    (16, 4, 4, 32, 32),     # adapter config nblocks=4 blk_r=4
    (65, 4, 8, 16, 24),     # ragged batch (tests masking), rectangular out
    (8, 2, 16, 64, 64),     # larger rank
]


def _mk(batch, K, Q, P, S, dtype=jnp.float32, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(keys[0], (batch, K * P), dtype=dtype)
    w1 = jax.random.normal(keys[1], (K, Q, P), dtype=dtype)
    w2 = jax.random.normal(keys[2], (K, S, Q), dtype=dtype)
    return x, w1, w2


@pytest.mark.parametrize("batch,K,Q,P,S", CASES)
def test_forward_matches_xla(batch, K, Q, P, S):
    x, w1, w2 = _mk(batch, K, Q, P, S)
    assert monarch_kernel_supported(x.shape[-1], w1.shape, w2.shape)
    ref = blockdiag_butterfly_multiply(x, w1, w2)
    got = monarch_kernel(x, w1, w2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch,K,Q,P,S", CASES)
def test_grads_match_xla(batch, K, Q, P, S):
    x, w1, w2 = _mk(batch, K, Q, P, S, seed=1)
    cot = jax.random.normal(jax.random.PRNGKey(2), (batch, S * K))

    def loss_pallas(x, w1, w2):
        return jnp.sum(monarch_kernel(x, w1, w2, True) * cot)

    def loss_ref(x, w1, w2):
        return jnp.sum(blockdiag_butterfly_multiply(x, w1, w2) * cot)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_3d_batch_shape():
    x, w1, w2 = _mk(12, 4, 4, 16, 16, seed=3)
    x3 = x.reshape(3, 4, 64)
    out = monarch_kernel(x3, w1, w2, True)
    assert out.shape == (3, 4, 64)
    ref = blockdiag_butterfly_multiply(x3, w1, w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch,K,Q,P,S", CASES)
def test_fused_dw_matches_xla(batch, K, Q, P, S):
    """monarch_dw_fused (one-read Pallas dw pass) == ops.monarch.monarch_dw."""
    from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
        monarch_dw_fused, monarch_dw_fused_supported)
    from sparse_matrix_fine_tuning_tpu.ops.monarch import monarch_dw

    x, w1, w2 = _mk(batch, K, Q, P, S, seed=4)
    dout = jax.random.normal(jax.random.PRNGKey(5), (batch, S * K))
    ref1, ref2, _ = monarch_dw(x, dout, w1, w2)
    got1, got2 = monarch_dw_fused(x, dout, w1, w2, interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)


def test_runtime_gate_env_and_defaults(monkeypatch, tmp_path):
    """Gate: env force-on/off respected; non-TPU backend defaults to XLA;
    decision is cached in-process."""
    from sparse_matrix_fine_tuning_tpu.kernels import runtime_gate as rg

    monkeypatch.setenv("SMFT_PALLAS_DW", "on")
    rg._reset_for_tests()
    assert rg.use_fused_dw() is True

    monkeypatch.setenv("SMFT_PALLAS_DW", "off")
    rg._reset_for_tests()
    assert rg.use_fused_dw() is False

    # auto on the CPU test backend: no probe, XLA path
    monkeypatch.setenv("SMFT_PALLAS_DW", "auto")
    rg._reset_for_tests()
    assert rg.use_fused_dw() is False
    rg._reset_for_tests()


def test_merged_bwd_fused_dispatch(monkeypatch):
    """merged_apply's backward produces identical factor grads through the
    fused-Pallas branch (forced on, interpret mode) and the XLA branch."""
    from sparse_matrix_fine_tuning_tpu.kernels import (
        merged, monarch_pallas, runtime_gate as rg)

    B, n, K, r = 64, 512, 4, 4  # n >= 512: passes the fused-dispatch gate
    dtype = jnp.float32
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    x = jax.random.normal(ks[0], (B, n), dtype)
    wd = jax.random.normal(ks[1], (n, n), dtype) * 0.05
    w1 = jax.random.normal(ks[2], (K, r * K, n // K), dtype) * 0.05
    w2 = jax.random.normal(ks[3], (K, n // K, r * K), dtype) * 0.05
    wm, wm_t = merged.build_merged_operands(wd, w1, w2)

    def loss(w1_, w2_, x_):
        return jnp.sum(merged.merged_apply(x_, wm, wm_t, w1_, w2_) ** 2)

    g_xla = jax.grad(loss, argnums=(0, 1, 2))(w1, w2, x)

    real_fused = monarch_pallas.monarch_dw_fused
    monkeypatch.setattr(
        monarch_pallas, "monarch_dw_fused",
        lambda a, b, c, d: real_fused(a, b, c, d, interpret=True))
    monkeypatch.setenv("SMFT_PALLAS_DW", "on")
    rg._reset_for_tests()
    try:
        g_fused = jax.grad(loss, argnums=(0, 1, 2))(w1, w2, x)
    finally:
        rg._reset_for_tests()

    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_runtime_gate_probe_inside_trace(monkeypatch, tmp_path):
    """The first gate query can arrive while a train step is being TRACED
    (merged_apply's custom-vjp backward).  The probe must escape the trace
    (jax.ensure_compile_time_eval) so its timing fetch sees concrete values
    -- regression for a TracerArrayConversionError that silently forced the
    XLA path whenever the gate was first hit in-jit."""
    import numpy as np

    from sparse_matrix_fine_tuning_tpu.kernels import runtime_gate as rg

    monkeypatch.setenv("SMFT_PALLAS_DW", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(rg, "_cache_path",
                        lambda: str(tmp_path / "gate.json"))

    def fake_probe():
        # raises TracerArrayConversionError if executed inside the trace
        return bool(float(np.asarray(jnp.ones(()))))

    monkeypatch.setattr(rg, "_probe", fake_probe)
    rg._reset_for_tests()
    seen = {}
    try:
        @jax.jit
        def step(x):
            seen["verdict"] = rg.use_fused_dw()
            return x

        step(jnp.ones(()))
    finally:
        rg._reset_for_tests()
    assert seen["verdict"] is True


def test_runtime_gate_measured_verdict(monkeypatch, tmp_path):
    """Runtimes in the shipped verdict table answer WITHOUT probing (the
    tunnelled axon runtime's probe costs ~10 min of remote compiles)."""
    from sparse_matrix_fine_tuning_tpu.kernels import runtime_gate as rg

    monkeypatch.setenv("SMFT_PALLAS_DW", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    class FakeClient:
        platform_version = "PJRT C API\naxon 0.1.0; SerializedExecutable v9"

    class FakeDev:
        device_kind = "TPU v5 lite"
        client = FakeClient()

    monkeypatch.setattr(jax, "devices", lambda *a: [FakeDev()])

    def boom():
        raise AssertionError("probe must not run on a measured runtime")

    monkeypatch.setattr(rg, "_probe", boom)
    rg._reset_for_tests()
    try:
        assert rg.use_fused_dw() is False
    finally:
        rg._reset_for_tests()
