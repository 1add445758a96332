"""fresh_model cache: independence, determinism, and donation safety."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import (
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def test_fresh_model_matches_direct_construction():
    cfg = RobertaConfig.tiny()
    direct = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(0))
    cached = fresh_model(RobertaForSequenceClassification, cfg)
    sd, sc = nnx.state(direct), nnx.state(cached)
    for (pd, vd), (pc, vc) in zip(
            nnx.to_flat_state(sd), nnx.to_flat_state(sc)):
        assert pd == pc
        if isinstance(vd.value, jax.Array):
            d, c = vd.value, vc.value
            if jnp.issubdtype(d.dtype, jax.dtypes.prng_key):
                d, c = jax.random.key_data(d), jax.random.key_data(c)
            np.testing.assert_array_equal(np.asarray(d), np.asarray(c))


def test_fresh_model_survives_donating_jit():
    """A donating jitted step on one copy must not delete buffers out from
    under the cache or later copies (nnx.clone aliases jax.Arrays; the
    factory hands out buffer-deep copies instead -- the round-3 slow-tier
    regression)."""
    cfg = RobertaConfig.tiny()
    m1 = fresh_model(RobertaForSequenceClassification, cfg)
    graphdef, state = nnx.split(m1)

    @jax.jit
    def bump(state):  # donated: consumes m1's buffers
        return jax.tree.map(
            lambda x: x + 1 if jnp.issubdtype(x.dtype, jnp.floating) else x,
            state)

    bump_donating = jax.jit(lambda s: bump(s), donate_argnums=0)
    _ = bump_donating(state)

    # a second copy still has live, original-valued buffers
    m2 = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jnp.ones((1, 4), jnp.int32)
    logits = m2(ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_fresh_model_copies_are_mutation_isolated():
    cfg = RobertaConfig.tiny()
    a = fresh_model(RobertaForSequenceClassification, cfg)
    b = fresh_model(RobertaForSequenceClassification, cfg)
    w = a.classifier.out_proj.kernel
    w.set_value(w[...] + 1.0)
    assert not np.allclose(np.asarray(a.classifier.out_proj.kernel[...]),
                           np.asarray(b.classifier.out_proj.kernel[...]))


def test_fresh_model_rejects_unfaithful_config_reprs():
    """A config whose repr is not a value encoding (default object.__repr__
    embeds an address; array reprs elide values with '...') must bypass the
    cache: two distinct configs could otherwise silently share one entry."""
    from sparse_matrix_fine_tuning_tpu.utils import testing as t

    class OpaqueCfg:  # default object.__repr__: '<... object at 0x...>'
        hidden_size = 8

    class TinyModel(nnx.Module):
        def __init__(self, config, rngs):
            self.w = nnx.Param(jax.random.normal(
                rngs.params(), (config.hidden_size,)))

    before = dict(t._CACHE)
    m1 = t.fresh_model(TinyModel, OpaqueCfg())
    m2 = t.fresh_model(TinyModel, OpaqueCfg())
    assert t._CACHE == before  # nothing cached under an address-based key
    # both built fresh from the same seed: equal values, independent buffers
    np.testing.assert_array_equal(np.asarray(m1.w[...]), np.asarray(m2.w[...]))
