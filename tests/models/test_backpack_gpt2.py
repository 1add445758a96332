"""Backpack-GPT-2: parity vs the reference's OWN vendored modeling file
(pyreft/pyvene/pyvene/models/backpack_gpt2/modelings_backpack_gpt2.py),
weight-synced — logits, contextualization, custom-contextualization runs,
and the ``sense_network_output`` hook that is pyvene's one Backpack anchor
(modelings_intervenable_backpack_gpt2.py:14-16)."""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.backpack_gpt2 import (
    BackpackGPT2Config,
    BackpackGPT2LMHeadModel,
)
from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
    backpack_gpt2_config_from_hf,
    load_backpack_gpt2,
)

REF_MODELING = ("/root/reference/pyreft/pyvene/pyvene/models/"
                "backpack_gpt2/modelings_backpack_gpt2.py")


def _ref_module():
    """Import the reference modeling file standalone (it only needs
    torch + transformers; no package-relative imports)."""
    spec = importlib.util.spec_from_file_location(
        "ref_backpack_gpt2", REF_MODELING)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pair():
    ref = _ref_module()
    hf_cfg = ref.BackpackGPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        num_senses=4, sense_intermediate_scale=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    ref_model = ref.BackpackGPT2LMHeadModel(hf_cfg).eval()

    cfg = backpack_gpt2_config_from_hf(hf_cfg.to_dict())
    assert cfg.num_senses == 4 and cfg.scale_attn_by_inverse_layer_idx
    model = BackpackGPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    load_backpack_gpt2(model, dict(ref_model.state_dict()))
    model.eval()
    return ref_model, model


def _inputs(seed=1, b=2, t=12, vocab=256):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, vocab, size=(b, t))
    pos = np.broadcast_to(np.arange(t), (b, t)).copy()
    return ids, pos


def test_backpack_logits_and_contextualization_match_reference(pair):
    ref_model, model = pair
    ids, pos = _inputs()
    with torch.no_grad():
        want = ref_model(torch.tensor(ids), position_ids=torch.tensor(pos))
    got_logits, got_ctx = model.forward_with_contextualization(
        jnp.asarray(ids), positions=jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got_ctx),
                               want.contextualization.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_logits), want.logits.numpy(),
                               rtol=3e-3, atol=3e-3)


def test_backpack_custom_contextualization_matches_reference(pair):
    """run_with_custom_contextualization: swap in the contextualization of a
    DIFFERENT input — the reference's counterfactual-senses API."""
    ref_model, model = pair
    ids_a, pos = _inputs(seed=2)
    ids_b, _ = _inputs(seed=3)
    with torch.no_grad():
        ctx = ref_model(torch.tensor(ids_b),
                        position_ids=torch.tensor(pos)).contextualization
        want = ref_model.run_with_custom_contextualization(
            torch.tensor(ids_a), ctx).logits.numpy()
    got, _ = model.run_with_custom_contextualization(
        jnp.asarray(ids_a), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=3e-3)


def test_sense_network_output_hook_matches_torch_forward_hook(pair):
    """The functional ``sense_network_output`` hook must act exactly where
    pyvene's OUTPUT hook on backpack.sense_network acts (the mapping in
    modelings_intervenable_backpack_gpt2.py): zero half the senses both
    ways and compare logits."""
    ref_model, model = pair
    ids, pos = _inputs(seed=4)

    def torch_hook(_mod, _inp, out):  # out: (b, nv, s, d)
        out = out.clone()
        out[:, :2] = 0.0
        return out

    handle = ref_model.backpack.sense_network.register_forward_hook(torch_hook)
    try:
        with torch.no_grad():
            want = ref_model(torch.tensor(ids),
                             position_ids=torch.tensor(pos)).logits.numpy()
    finally:
        handle.remove()

    got = model(jnp.asarray(ids), positions=jnp.asarray(pos),
                layer_hooks={"sense_network_output":
                             lambda s: s.at[:, :2].set(0.0)})
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=3e-3)


def test_backpack_checkpoint_dir_roundtrip(tmp_path, pair):
    """save_pretrained dir -> from_pretrained_causal_lm routes by the
    Backpack architectures entry (model_type stays "gpt2")."""
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
        from_pretrained_causal_lm)
    ref_model, _ = pair
    d = tmp_path / "backpack"
    ref_model.save_pretrained(d, safe_serialization=False)
    cfg = (d / "config.json").read_text()
    assert "Backpack" in cfg
    model = from_pretrained_causal_lm(str(d), dtype=None)
    ids, pos = _inputs(seed=5)
    with torch.no_grad():
        want = ref_model(torch.tensor(ids),
                         position_ids=torch.tensor(pos)).logits.numpy()
    got = model(jnp.asarray(ids), positions=jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=3e-3)


def test_backpack_monarch_surgery_and_grads():
    """init_monarch reaches the Backpack body's HF-named linears (the GPT-2
    c_attn/c_fc plus the sense-network MLP c_fc) -- zero-init preserves the
    forward, grads reach the injected factors through the contextualization
    product."""
    import jax
    from sparse_matrix_fine_tuning_tpu.peft.surgery import init_monarch

    cfg = BackpackGPT2Config.tiny()
    model = BackpackGPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    before = model(ids)
    adapted = init_monarch(
        model, {"nblocks": 4, "blk_r": 2, "adapter": True,
                "target_modules": ["c_attn", "c_fc"]}, rngs=nnx.Rngs(1))
    # GPT-2 body: c_attn + c_fc per block; sense network: 2 MLP c_fc;
    # weight net: c_attn
    assert len(adapted) == 2 * cfg.num_hidden_layers + 3
    np.testing.assert_allclose(np.asarray(before), np.asarray(model(ids)),
                               rtol=1e-5, atol=1e-5)

    def loss_fn(m):
        return m.loss(m(ids), ids)

    loss, grads = nnx.value_and_grad(loss_fn)(model)
    assert jnp.isfinite(loss)
    gflat = {"/".join(map(str, p)): g
             for p, g in nnx.state(grads).flat_state()}
    sense_blk2 = [v for k, v in gflat.items()
                  if "sense_network" in k and "blkdiag2" in k]
    assert sense_blk2 and any(float(jnp.abs(g[...]).max()) > 0
                              for g in sense_blk2)


def test_backpack_training_loss_honors_pad_row_weights():
    """Regression: training_loss must thread the Trainer's pad-row weight
    mask (trainer.py _default_loss passes weights=batch["_valid"]) through
    to the shifted-CE loss instead of silently dropping it."""
    import jax

    cfg = BackpackGPT2Config.tiny()
    model = BackpackGPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (3, 8), 0, cfg.vocab_size)
    weights = jnp.array([1.0, 1.0, 0.0])  # row 2 is a pad row

    weighted = model.training_loss(ids, ids, weights=weights)
    unweighted = model.training_loss(ids, ids)
    # loss over the 2 valid rows only == training_loss on the sliced batch
    want = model.training_loss(ids[:2], ids[:2])
    np.testing.assert_allclose(np.asarray(weighted), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert abs(float(weighted) - float(unweighted)) > 1e-7

    # unsupported kwargs fail loudly now (no silent **_ swallowing)
    import pytest as _pytest
    with _pytest.raises(TypeError):
        model(ids, not_a_kwarg=1)
