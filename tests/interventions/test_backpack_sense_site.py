"""The Backpack ``sense_network_output`` intervention site through the
ReftModel engine (pyvene's one Backpack anchor,
modelings_intervenable_backpack_gpt2.py:14-21): interchange, collect, and
exactness vs a hand-built sense edit.  Pure JAX (the torch-weight-synced
model parity lives in tests/models/test_backpack_gpt2.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.interventions.reft import (
    ReftConfig,
    ReftModel,
)
from sparse_matrix_fine_tuning_tpu.models.backpack_gpt2 import (
    BackpackGPT2Config,
    BackpackGPT2LMHeadModel,
)

POS = (3, 7)


def _setup():
    cfg = BackpackGPT2Config.tiny()
    model = BackpackGPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    rm = ReftModel(model, ReftConfig(representations=[
        {"layer": 0, "component": "sense_network_output",
         "intervention": "VanillaIntervention"}]), rngs=nnx.Rngs(1))
    base_ids = jax.random.randint(jax.random.PRNGKey(2), (2, 10), 3,
                                  cfg.vocab_size)
    src_ids = jax.random.randint(jax.random.PRNGKey(3), (2, 10), 3,
                                 cfg.vocab_size)
    locs = jnp.broadcast_to(jnp.asarray(POS)[None, None, :], (2, 1, 2))
    return model, rm, base_ids, src_ids, locs


def test_sense_interchange_matches_manual_edit():
    """swap_forward at the sense site == manually splicing the source's
    sense vectors (all senses, the intervened token positions) into the
    base forward."""
    model, rm, base_ids, src_ids, locs = _setup()
    got = np.asarray(rm.swap_forward(
        base_ids, src_ids, base_locations=locs, source_locations=locs))

    src_senses = model.backpack.senses(src_ids)  # (b, nv, s, d)
    pos = list(POS)

    def splice(s):
        return s.at[:, :, pos].set(src_senses[:, :, pos])

    want = np.asarray(model(base_ids,
                            layer_hooks={"sense_network_output": splice}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # identical source == no-op
    same = np.asarray(rm.swap_forward(
        base_ids, base_ids, base_locations=locs, source_locations=locs))
    np.testing.assert_allclose(same, np.asarray(model(base_ids)),
                               rtol=1e-5, atol=1e-5)


def test_sense_collect_shape_and_values():
    """collect_activations at the sense site returns (b, nv, p, d) equal to
    the model's own sense tensor gathered at the positions."""
    model, rm, base_ids, _, locs = _setup()
    collected = rm.collect_activations(base_ids, locs)
    senses = np.asarray(model.backpack.senses(base_ids))
    want = senses[:, :, list(POS)]
    np.testing.assert_allclose(np.asarray(collected[0]), want,
                               rtol=1e-6, atol=1e-6)


def test_sense_site_trainable_intervention_grads_flow():
    """A trainable intervention at the sense site gets nonzero gradients
    through the contextualization product (the DAS-on-senses use case)."""
    cfg = BackpackGPT2Config.tiny()
    model = BackpackGPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    rm = ReftModel(model, ReftConfig(representations=[
        {"layer": 0, "component": "sense_network_output",
         "intervention": "LoreftIntervention",
         "low_rank_dimension": 2}]), rngs=nnx.Rngs(1))
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 3,
                             cfg.vocab_size)
    locs = jnp.broadcast_to(jnp.asarray(POS)[None, None, :], (2, 1, 2))

    def loss_fn(rm):
        logits = rm(ids, intervention_locations=locs)
        return rm.loss(logits, ids)

    loss, grads = nnx.value_and_grad(loss_fn)(rm)
    assert jnp.isfinite(loss)
    gflat = {"/".join(map(str, p)): g
             for p, g in nnx.state(grads).flat_state()}
    iv_grads = [v for k, v in gflat.items() if "interventions" in k]
    assert iv_grads and any(float(jnp.abs(g[...]).max()) > 0
                            for g in iv_grads)
