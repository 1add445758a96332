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
    """peft-semantics BOFT rotates the INPUT features: with an identity
    dense and unit scales, the layer output is exactly x @ R for an
    orthogonal R -- per-example norms preserved, input actually rotated."""
    w = jnp.eye(16)
    layer = BOFTLinear(16, 16, weights=w, block_size=8, rngs=nnx.Rngs(0))
    layer.boft_R.set_value(jax.random.normal(
        jax.random.PRNGKey(4), layer.boft_R[...].shape) * 0.3)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
    out = np.asarray(layer(x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-4)
    assert np.abs(out - np.asarray(x)).max() > 1e-3  # actually rotated


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


def test_multiplicative_dropout_replaces_blocks_in_training_only():
    """peft MultiplicativeDropoutLayer semantics: training mode replaces a
    fraction of one factor's blocks with identity; eval is exact."""
    w = jnp.eye(16)
    layer = BOFTLinear(16, 16, weights=w, block_size=4,
                       n_butterfly_factor=1, dropout=0.5, rngs=nnx.Rngs(0))
    layer.boft_R.set_value(jax.random.normal(
        jax.random.PRNGKey(7), layer.boft_R[...].shape) * 0.5)
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 16))
    eval_out = np.asarray(layer(x))  # deterministic defaults True

    layer.deterministic = False  # what model.train() flips
    outs = {np.asarray(layer(x)).tobytes() for _ in range(8)}
    # dropout randomizes which blocks are identity: outputs vary across
    # calls and differ from the eval output for at least one draw
    assert len(outs) > 1
    assert any(o != eval_out.tobytes() for o in outs)

    layer.deterministic = True
    np.testing.assert_array_equal(np.asarray(layer(x)), eval_out)


def test_bias_all_marks_every_bias_trainable():
    """peft bias='all' trains every bias in the model, not just the
    adapted layers' (bias='boft_only' covers only those)."""
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    init_boft(model, dict(BOFT_CFG, bias="all"), rngs=nnx.Rngs(1))
    from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
        AdapterParam)
    n_bias = n_adapter_bias = 0
    for path, leaf in nnx.to_flat_state(nnx.state(model)):
        if path[-1] == "bias" and leaf.value is not None:
            n_bias += 1
            n_adapter_bias += isinstance(leaf, AdapterParam)
    assert n_bias > 0 and n_adapter_bias == n_bias
