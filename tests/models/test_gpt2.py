"""GPT-2 family: logit/decode parity vs HF torch, checkpoint-dir loading,
and PEFT-surgery + ReFT composition (the pyvene per-arch GPT-2 capability,
reference pyreft/pyvene/pyvene/models/gpt2/modelings_intervenable_gpt2.py,
on this stack's layer_hooks contract)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
    from_pretrained_gpt2,
    gpt2_config_from_hf,
    load_gpt2,
)

NEW = 10


def _hf_tiny():
    hf_cfg = transformers.GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    return transformers.GPT2LMHeadModel(hf_cfg).eval(), hf_cfg


@pytest.fixture(scope="module")
def pair():
    hf_model, hf_cfg = _hf_tiny()
    model = GPT2LMHeadModel(gpt2_config_from_hf(hf_cfg.to_dict()),
                            rngs=nnx.Rngs(0))
    load_gpt2(model, dict(hf_model.state_dict()))
    model.eval()
    return hf_model, model


def test_gpt2_matches_hf(pair):
    hf_model, model = pair
    ids = np.random.default_rng(1).integers(2, 256, size=(2, 12))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_gpt2_greedy_decode_matches_hf(pair):
    """KV-cache decode with a left-padded row: wpe positions must follow the
    mask (HF computes position_ids = cumsum(mask)-1)."""
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


def test_gpt2_checkpoint_dir_roundtrip(tmp_path):
    hf_model, _ = _hf_tiny()
    d = tmp_path / "gpt2"
    hf_model.save_pretrained(d)
    model = from_pretrained_gpt2(str(d))
    ids = np.random.default_rng(3).integers(2, 256, size=(2, 10))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_causal_lm_loader_routes_by_model_type(tmp_path):
    """from_pretrained_causal_lm dispatches gpt2 vs llama-family from
    config.json (the harnesses' --model path)."""
    from sparse_matrix_fine_tuning_tpu.models import LlamaForCausalLM
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
        from_pretrained_causal_lm)
    hf_gpt2, _ = _hf_tiny()
    hf_gpt2.save_pretrained(tmp_path / "gpt2")
    got = from_pretrained_causal_lm(str(tmp_path / "gpt2"), dtype=None)
    assert isinstance(got, GPT2LMHeadModel)

    llama_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128)
    transformers.LlamaForCausalLM(llama_cfg).save_pretrained(tmp_path / "llama")
    got = from_pretrained_causal_lm(str(tmp_path / "llama"), dtype=None)
    assert isinstance(got, LlamaForCausalLM)


def test_gpt2_monarch_surgery_and_grads():
    """init_monarch targets the HF GPT-2 module names (c_attn fused qkv is
    rectangular 64->192); forward preserved at zero-init, grads reach the
    injected factors."""
    from sparse_matrix_fine_tuning_tpu.peft.surgery import init_monarch
    cfg = GPT2Config.tiny()
    model = GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    before = model(ids)
    adapted = init_monarch(
        model, {"nblocks": 4, "blk_r": 2, "adapter": True,
                "target_modules": ["c_attn", "c_fc"]}, rngs=nnx.Rngs(1))
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


def test_gpt2_reft_hooks():
    """ReftModel wraps GPT-2 unchanged: a block_output LoReFT edit at layer 0
    changes logits only at/after intervened positions' influence."""
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, get_reft_model)
    cfg = GPT2Config.tiny()
    model = GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    reft = get_reft_model(model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "LoreftIntervention", "low_rank_dimension": 2}]),
        rngs=nnx.Rngs(5))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    locs = jnp.zeros((2, 1, 2), jnp.int32).at[:, 0, 1].set(1)  # f2 positions
    plain = reft(ids)
    edited = reft(ids, intervention_locations=locs)
    assert plain.shape == edited.shape
    assert not np.allclose(np.asarray(plain), np.asarray(edited))
    # inner components addressed the pyvene way
    hooked = model(ids, layer_hooks={(1, "mlp_output"): lambda h: h * 0.0})
    assert not np.allclose(np.asarray(plain), np.asarray(hooked))
