"""GPT-Neo family: logit/decode parity vs HF torch (alternating global/
local attention, unscaled fp32 scores, unbiased q/k/v, tied head) plus
surgery composition (the pyvene per-arch gpt_neo capability, reference
pyreft/pyvene/pyvene/models/gpt_neo/modelings_intervenable_gpt_neo.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.gpt_neo import (
    GPTNeoConfig,
    GPTNeoForCausalLM,
)
from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
    gpt_neo_config_from_hf,
    load_gpt_neo,
)

NEW = 10


def _hf_tiny(**kw):
    # window_size=5 < seq lengths used below so the local mask bites
    d = dict(vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
             max_position_embeddings=128, window_size=5,
             attention_types=[[["global", "local"], 1]],
             resid_dropout=0.0, embed_dropout=0.0, attention_dropout=0.0,
             attn_implementation="eager")
    d.update(kw)
    hf_cfg = transformers.GPTNeoConfig(**d)
    torch.manual_seed(0)
    return transformers.GPTNeoForCausalLM(hf_cfg).eval(), hf_cfg


@pytest.fixture(scope="module")
def pair():
    hf_model, hf_cfg = _hf_tiny()
    model = GPTNeoForCausalLM(gpt_neo_config_from_hf(hf_cfg.to_dict()),
                              rngs=nnx.Rngs(0))
    load_gpt_neo(model, dict(hf_model.state_dict()))
    model.eval()
    return hf_model, model


def test_gpt_neo_config_mapping():
    _, hf_cfg = _hf_tiny()
    cfg = gpt_neo_config_from_hf(hf_cfg.to_dict())
    assert cfg.layer_types == ("global", "local")
    assert cfg.window_size == 5 and cfg.tie_word_embeddings


def test_gpt_neo_matches_hf(pair):
    hf_model, model = pair
    ids = np.random.default_rng(1).integers(2, 256, size=(2, 12))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_gpt_neo_greedy_decode_matches_hf(pair):
    """Decode passes the window boundary (9 prompt + 10 new > window 5) so
    the per-layer local mask shapes every step."""
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


def test_gpt_neo_loader_routing(tmp_path):
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
        from_pretrained_causal_lm)
    hf_model, _ = _hf_tiny()
    hf_model.save_pretrained(tmp_path / "neo")
    got = from_pretrained_causal_lm(str(tmp_path / "neo"), dtype=None)
    assert isinstance(got, GPTNeoForCausalLM)
    ids = np.random.default_rng(3).integers(2, 256, size=(2, 8))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(got(jnp.asarray(ids))), want,
                               rtol=3e-3, atol=3e-3)


def test_gpt_neo_monarch_surgery_and_grads():
    from sparse_matrix_fine_tuning_tpu.peft.surgery import init_monarch
    cfg = GPTNeoConfig.tiny()
    model = GPTNeoForCausalLM(cfg, rngs=nnx.Rngs(0))
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    before = model(ids)
    adapted = init_monarch(
        model, {"nblocks": 4, "blk_r": 2, "adapter": True,
                "target_modules": ["q_proj", "v_proj", "c_fc"]},
        rngs=nnx.Rngs(1))
    assert len(adapted) == 3 * cfg.num_hidden_layers
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
