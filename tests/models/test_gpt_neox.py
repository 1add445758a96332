"""GPT-NeoX/Pythia family: logit/decode parity vs HF torch (partial rotary,
parallel residual, interleaved fused qkv), plus surgery/ReFT composition
(the pyvene per-arch gpt_neox capability, reference
pyreft/pyvene/pyvene/models/gpt_neox/modelings_intervenable_gpt_neox.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.gpt_neox import (
    GPTNeoXConfig,
    GPTNeoXForCausalLM,
)
from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
    gpt_neox_config_from_hf,
    load_gpt_neox,
)

NEW = 10


def _hf_tiny(**kw):
    d = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
             num_attention_heads=4, intermediate_size=128,
             max_position_embeddings=128, rotary_pct=0.25,
             use_parallel_residual=True, hidden_act="gelu",
             attn_implementation="eager")
    d.update(kw)
    hf_cfg = transformers.GPTNeoXConfig(**d)
    torch.manual_seed(0)
    return transformers.GPTNeoXForCausalLM(hf_cfg).eval(), hf_cfg


def _convert(hf_model, hf_cfg):
    model = GPTNeoXForCausalLM(gpt_neox_config_from_hf(hf_cfg.to_dict()),
                               rngs=nnx.Rngs(0))
    load_gpt_neox(model, dict(hf_model.state_dict()))
    model.eval()
    return model


@pytest.fixture(scope="module")
def pair():
    hf_model, hf_cfg = _hf_tiny()
    return hf_model, _convert(hf_model, hf_cfg)


def test_gpt_neox_matches_hf(pair):
    hf_model, model = pair
    ids = np.random.default_rng(1).integers(2, 256, size=(2, 12))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_gpt_neox_sequential_residual_matches_hf():
    hf_model, hf_cfg = _hf_tiny(use_parallel_residual=False, rotary_pct=1.0)
    model = _convert(hf_model, hf_cfg)
    ids = np.random.default_rng(2).integers(2, 256, size=(2, 10))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_gpt_neox_greedy_decode_matches_hf(pair):
    from sparse_matrix_fine_tuning_tpu.models.generate import (
        GenerationConfig, generate)
    hf_model, model = pair
    rng = np.random.default_rng(4)
    ids = rng.integers(3, 256, size=(3, 9))
    mask = np.ones_like(ids)
    ids[1, :3] = 0
    mask[1, :3] = 0
    with torch.no_grad():
        want = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_new_tokens=NEW, do_sample=False, num_beams=1,
            eos_token_id=None, pad_token_id=0).numpy()
    got = np.asarray(generate(
        model, jnp.asarray(ids), jnp.asarray(mask),
        GenerationConfig(max_new_tokens=NEW, eos_token_id=None)))
    np.testing.assert_array_equal(got[:, -NEW:], want[:, -NEW:])


def test_gpt_neox_loader_routing(tmp_path):
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
        from_pretrained_causal_lm)
    hf_model, _ = _hf_tiny()
    hf_model.save_pretrained(tmp_path / "neox")
    got = from_pretrained_causal_lm(str(tmp_path / "neox"), dtype=None)
    assert isinstance(got, GPTNeoXForCausalLM)
    ids = np.random.default_rng(3).integers(2, 256, size=(2, 8))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(got(jnp.asarray(ids))), want,
                               rtol=3e-3, atol=3e-3)


def test_gpt_neox_monarch_surgery_and_reft():
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, get_reft_model)
    from sparse_matrix_fine_tuning_tpu.peft.surgery import init_monarch
    cfg = GPTNeoXConfig.tiny()
    model = GPTNeoXForCausalLM(cfg, rngs=nnx.Rngs(0))
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    before = model(ids)
    adapted = init_monarch(
        model, {"nblocks": 4, "blk_r": 2, "adapter": True,
                "target_modules": ["query_key_value", "dense_h_to_4h"]},
        rngs=nnx.Rngs(1))
    assert len(adapted) == 2 * cfg.num_hidden_layers
    np.testing.assert_allclose(np.asarray(before), np.asarray(model(ids)),
                               rtol=1e-5, atol=1e-5)

    def loss_fn(m):
        return m.loss(m(ids), ids)

    loss, grads = nnx.value_and_grad(loss_fn)(model)
    assert jnp.isfinite(loss)
    gflat = {"/".join(map(str, p)): g
             for p, g in nnx.state(grads).flat_state()}
    blk2 = [v for k, v in gflat.items() if "blkdiag2" in k]
    assert blk2 and any(float(jnp.abs(g[...]).max()) > 0 for g in blk2)

    reft = get_reft_model(model, ReftConfig(representations=[
        {"layer": 1, "component": "block_output",
         "intervention": "LoreftIntervention", "low_rank_dimension": 2}]),
        rngs=nnx.Rngs(5))
    locs = jnp.zeros((2, 1, 2), jnp.int32).at[:, 0, 1].set(1)
    edited = reft(ids, intervention_locations=locs)
    assert not np.allclose(np.asarray(model(ids)), np.asarray(edited))
