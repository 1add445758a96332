"""Fused int4 dequant-matmul kernel vs the dequantize-then-dot oracle.

Interpret-mode numerics only; Mosaic legality + perf are validated on the
real chip by scripts/verify_tpu_kernel.py (see that file's int4 section)
since interpret mode accepts relayouts Mosaic rejects.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import (
    int4_matmul, int4_matmul_supported)
from sparse_matrix_fine_tuning_tpu.quant import dequantize_int4, quantize_int4


def _mk(out_f, in_f, g, b, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(out_f, in_f)).astype(np.float32) * 0.1
    packed_t, scales = quantize_int4(w, g)
    x = jnp.asarray(rng.normal(size=(b, in_f)), dtype)
    return x, jnp.asarray(packed_t), jnp.asarray(scales)


@pytest.mark.parametrize("out_f,in_f,g,b", [
    (256, 256, 64, 4),      # decode-like tiny batch (f32dot branch)
    (384, 512, 64, 16),     # rectangular
    (128, 768, 32, 8),      # RoBERTa-ish in_features, small group
    (256, 256, 64, 96),     # training-size batch (bf16-operand branch)
])
def test_fwd_matches_dequant_oracle(out_f, in_f, g, b):
    x, packed_t, scales = _mk(out_f, in_f, g, b)
    assert int4_matmul_supported(x.shape, packed_t.shape, g)
    wd = dequantize_int4(packed_t, scales, g)           # (out, in) f32
    ref = np.asarray(x @ wd.T)
    got = np.asarray(int4_matmul(x, packed_t, scales, g, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5 * np.abs(ref).max())


def test_batched_3d_input():
    x, packed_t, scales = _mk(256, 256, 64, 6)
    x3 = x.reshape(2, 3, 256)
    wd = dequantize_int4(packed_t, scales, 64)
    ref = np.asarray(x3 @ wd.T)
    got = np.asarray(int4_matmul(x3, packed_t, scales, 64, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5 * np.abs(ref).max())


def test_dx_matches_oracle_and_frozen_weights_get_zero_cotangent():
    x, packed_t, scales = _mk(256, 512, 64, 8)
    wd = dequantize_int4(packed_t, scales, 64)

    def loss_kernel(x, s):
        return jnp.sum(int4_matmul(x, packed_t, s, 64, interpret=True) ** 2)

    def loss_ref(x):
        return jnp.sum((x @ wd.T) ** 2)

    dx, ds = jax.grad(loss_kernel, argnums=(0, 1))(x, scales)
    dx_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4 * np.abs(dx_ref).max())
    assert float(jnp.abs(ds).max()) == 0.0  # structural zeros (frozen base)


def test_unsupported_shapes_refused():
    x, packed_t, scales = _mk(256, 256, 64, 4)
    assert not int4_matmul_supported((4, 250), packed_t.shape, 64)   # in mismatch
    assert not int4_matmul_supported((4, 256), (128, 200), 64)       # out % 128
    assert not int4_matmul_supported((4, 256), (100, 256), 50)       # h % 32


def test_int8_fwd_and_dx_match_oracle():
    from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import (
        int8_matmul, int8_matmul_supported)
    from sparse_matrix_fine_tuning_tpu.quant import dequantize_int8, quantize_int8

    rng = np.random.default_rng(3)
    w = rng.normal(size=(384, 256)).astype(np.float32) * 0.1
    q_t, s = map(jnp.asarray, quantize_int8(w))
    assert q_t.shape == (256, 384) and s.shape == (1, 384)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    assert int8_matmul_supported(x.shape, q_t.shape)
    wd = dequantize_int8(q_t, s)
    ref = np.asarray(x @ wd.T)
    got = np.asarray(int8_matmul(x, q_t, s, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5 * np.abs(ref).max())
    dx = jax.grad(lambda x: jnp.sum(
        int8_matmul(x, q_t, s, interpret=True) ** 2))(x)
    dx_ref = jax.grad(lambda x: jnp.sum((x @ wd.T) ** 2))(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4 * np.abs(dx_ref).max())


def test_layer_int4_fallback_path_matches_oracle():
    """The XLA fallback inside MonarchLinear._dense_forward (non-TPU here)
    must equal dequantize-then-dot."""
    from flax import nnx

    from sparse_matrix_fine_tuning_tpu.layers import MonarchLinear
    from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base

    w = jax.random.normal(jax.random.PRNGKey(0), (96, 256)) * 0.1
    layer = MonarchLinear(256, 96, weights=w, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    monarch_only = np.asarray(layer(x) - layer._dense_forward(x))
    quantize_frozen_base(layer, bits=4, group_size=64)
    wd = dequantize_int4(layer.dense[...], layer.dense_scales[...], 64)
    ref = np.asarray(x @ wd.T) + monarch_only
    got = np.asarray(layer(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4 * np.abs(ref).max())


def test_supported_accounts_for_activation_itemsize():
    """The tile picker charges VMEM at the activation dtype's width: a
    7B-shaped layer fits at bf16 but must be rejected at f32 (the gate
    previously assumed 2 bytes and approved tilings that overflow VMEM)."""
    x_shape, packed_shape = (256, 11008), (5504, 4096)
    assert int4_matmul_supported(x_shape, packed_shape, 64, itemsize=2)
    assert not int4_matmul_supported(x_shape, packed_shape, 64, itemsize=4)


def test_supported_false_on_untuned_device_kind(monkeypatch):
    """Unknown TPU generations have no measured VMEM budget: every
    *_supported gate must return False (callers fall back to the XLA
    dequant path) instead of raising out of the default forward."""
    from sparse_matrix_fine_tuning_tpu.kernels import quant_matmul as qm
    from sparse_matrix_fine_tuning_tpu.kernels import monarch_pallas as mp

    monkeypatch.setattr(qm, "_vmem_budgets_or_none", lambda: None)
    assert not int4_matmul_supported((8, 256), (128, 256), 64)
    assert not qm.int8_matmul_supported((8, 256), (256, 256))

    monkeypatch.setattr(mp, "_vmem_budgets_or_none", lambda: None)
    assert not mp.monarch_kernel_supported(256, (4, 16, 64), (4, 64, 16))


def test_bwd_falls_back_to_xla_when_no_tile_plan(monkeypatch):
    """The forward gate guarantees only the forward tile plan; when the
    backward's own plan (resident f32 dx) does not fit, mm_bwd must fall
    back to exact XLA math instead of crashing at trace time."""
    from sparse_matrix_fine_tuning_tpu.kernels import quant_matmul as qm
    from sparse_matrix_fine_tuning_tpu.quant import (
        dequantize_int8, quantize_int8)

    x, packed_t, scales = _mk(256, 256, 64, 4, seed=3)
    wd = dequantize_int4(packed_t, scales, 64)
    dx_ref = jax.grad(lambda x: jnp.sum((x @ wd.T) ** 2))(x)

    real4 = qm._pick_fwd_tiles
    monkeypatch.setattr(
        qm, "_pick_fwd_tiles",
        lambda *a, bwd=False, **k: None if bwd else real4(*a, **k))
    dx = jax.grad(lambda x: jnp.sum(
        int4_matmul(x, packed_t, scales, 64, interpret=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4 * np.abs(dx_ref).max())

    rng = np.random.default_rng(4)
    w8 = rng.normal(size=(256, 256)).astype(np.float32) * 0.1
    q_t, s = map(jnp.asarray, quantize_int8(w8))
    x8 = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    wd8 = dequantize_int8(q_t, s)
    dx8_ref = jax.grad(lambda x: jnp.sum((x @ wd8.T) ** 2))(x8)
    real8 = qm._pick8_tiles
    monkeypatch.setattr(
        qm, "_pick8_tiles",
        lambda *a, bwd=False, **k: None if bwd else real8(*a, **k))
    dx8 = jax.grad(lambda x: jnp.sum(
        qm.int8_matmul(x, q_t, s, interpret=True) ** 2))(x8)
    np.testing.assert_allclose(np.asarray(dx8), np.asarray(dx8_ref),
                               rtol=1e-4, atol=1e-4 * np.abs(dx8_ref).max())
