"""Merged-training path: exactness vs dense+monarch, structured grads."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_fine_tuning_tpu.kernels.merged import (
    build_merged_operands,
    merged_apply,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply


def _setup(B=24, n=32, m=48, K=4, r=2, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (B, n), dtype)
    dense = jax.random.normal(ks[1], (m, n), dtype) * 0.05
    w1 = jax.random.normal(ks[2], (K, r * K, n // K), dtype) * 0.05
    w2 = jax.random.normal(ks[3], (K, m // K, r * K), dtype) * 0.05
    return x, dense, w1, w2


def _ref(x, dense, w1, w2):
    base = x @ dense.T
    return base + blockdiag_butterfly_multiply(x, w1, w2)


def test_merged_forward_matches_unfused():
    x, dense, w1, w2 = _setup()
    wm, wm_t = build_merged_operands(dense, w1, w2)
    np.testing.assert_allclose(np.asarray(merged_apply(x, wm, wm_t, w1, w2)),
                               np.asarray(_ref(x, dense, w1, w2)),
                               rtol=2e-5, atol=2e-5)


def test_merged_grads_match_unfused():
    x, dense, w1, w2 = _setup()
    wm, wm_t = build_merged_operands(dense, w1, w2)

    def loss_m(x, w1, w2):
        return jnp.sum(merged_apply(x, wm, wm_t, w1, w2) ** 2)

    def loss_r(x, w1, w2):
        return jnp.sum(_ref(x, dense, w1, w2) ** 2)

    gm = jax.grad(loss_m, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w1, w2)
    for name, a, b in zip(("dx", "dw1", "dw2"), gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_merged_batched_input():
    x, dense, w1, w2 = _setup()
    x3 = x.reshape(2, 12, -1)
    wm, wm_t = build_merged_operands(dense, w1, w2)
    out = merged_apply(x3, wm, wm_t, w1, w2)
    assert out.shape == (2, 12, dense.shape[0])
    np.testing.assert_allclose(np.asarray(out.reshape(24, -1)),
                               np.asarray(merged_apply(x, wm, wm_t, w1, w2)),
                               rtol=1e-6)


def test_merged_rectangular_blkr():
    x, dense, w1, w2 = _setup(n=64, m=32, K=4, r=4)
    wm, wm_t = build_merged_operands(dense, w1, w2)
    np.testing.assert_allclose(np.asarray(merged_apply(x, wm, wm_t, w1, w2)),
                               np.asarray(_ref(x, dense, w1, w2)),
                               rtol=2e-5, atol=2e-5)


def test_merged_padded_shapes():
    """Monarch factors wider than the dense (padded blocks) fold into the
    merge; factor grads run at the extended shapes."""
    n, m, K = 30, 20, 4   # in_blksz 8 -> ext 32; out_blksz ceil(8*20/30)=6 -> 24
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(ks[0], (16, n))
    dense = jax.random.normal(ks[1], (m, n)) * 0.05
    w1 = jax.random.normal(ks[2], (K, 3, 8)) * 0.05
    w2 = jax.random.normal(ks[3], (K, 6, 3)) * 0.05

    def ref(x, w1, w2):
        xp = jnp.pad(x, ((0, 0), (0, 2)))
        return x @ dense.T + blockdiag_butterfly_multiply(xp, w1, w2)[:, :m]

    wm, wm_t = build_merged_operands(dense, w1, w2)
    np.testing.assert_allclose(np.asarray(merged_apply(x, wm, wm_t, w1, w2)),
                               np.asarray(ref(x, w1, w2)), rtol=2e-5, atol=2e-5)
    gm = jax.grad(lambda a, b: jnp.sum(merged_apply(x, wm, wm_t, a, b) ** 2),
                  argnums=(0, 1))(w1, w2)
    gr = jax.grad(lambda a, b: jnp.sum(ref(x, a, b) ** 2), argnums=(0, 1))(w1, w2)
    for a, b in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
