"""BOFT: orthogonality, identity-at-init, surgery, trainability."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import (
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.peft import trainable_filter
from sparse_matrix_fine_tuning_tpu.peft.boft import BOFTLinear, cayley, init_boft
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

BOFT_CFG = {"boft_block_size": 8, "boft_block_num": 0,
            "boft_n_butterfly_factor": 2, "boft_dropout": 0.0,
            "target_modules": ["query", "value"]}


def test_cayley_orthogonal():
    S = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4))
    Q = cayley(S)
    for q in np.asarray(Q):
        np.testing.assert_allclose(q @ q.T, np.eye(4), atol=1e-5)


def test_identity_at_init():
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.1
    layer = BOFTLinear(16, 32, weights=w, block_size=8, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    np.testing.assert_allclose(np.asarray(layer(x)), np.asarray(x @ w.T),
                               rtol=1e-4, atol=1e-5)


def test_rotation_preserves_norm():
    w = jax.random.normal(jax.random.PRNGKey(3), (32, 16)) * 0.1
    layer = BOFTLinear(16, 32, weights=w, block_size=8, rngs=nnx.Rngs(0))
    layer.boft_R.set_value(jax.random.normal(
        jax.random.PRNGKey(4), layer.boft_R[...].shape) * 0.3)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
    base = np.asarray(x @ w.T)
    out = np.asarray(layer(x))
    # orthogonal rotation with unit scales: per-example norms preserved
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(base, axis=-1), rtol=1e-4)
    assert np.abs(out - base).max() > 1e-3  # but output actually rotated


def test_boft_surgery_and_training():
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 10), 0, cfg.vocab_size)
    before = model(ids)
    adapted = init_boft(model, BOFT_CFG, rngs=nnx.Rngs(1))
    assert len(adapted) == 4
    after = model(ids)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               rtol=1e-4, atol=1e-5)

    filt = trainable_filter()

    @nnx.jit
    def step(model, ids):
        def loss(m):
            logits = m(ids)
            return jnp.sum(logits ** 2)
        return nnx.value_and_grad(loss, argnums=nnx.DiffState(0, filt))(model)

    val, grads = step(model, ids)
    paths = ["/".join(map(str, p)) for p, _ in grads.flat_state()]
    assert any("boft_R" in p for p in paths)
    assert any("boft_s" in p for p in paths)
    assert not any("embeddings" in p for p in paths)
