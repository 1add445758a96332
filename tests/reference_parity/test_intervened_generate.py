"""Intervened generation parity vs the reference's own pyvene engine.

The reasoning eval's core mechanic is ``intervenable.generate(...,
intervene_on_prompt=True)`` (reference compute_metrics.py:158-187): hooks
fire on the prompt forward, decode proceeds from the steered KV state.
This test runs the reference's vendored pyvene ``IntervenableModel`` over a
tiny HF llama and this repo's ``ReftModel`` + ``generate`` over the same
weights with the same deterministic intervention (ZeroIntervention needs no
weight sync), and requires identical greedy and beam-4 token sequences.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.interventions.reft import (
    ReftConfig,
    ReftModel,
)
from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.models.generate import (
    GenerationConfig,
    generate,
)
from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_llama
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

NEW = 8
# include the FINAL prompt position so the steering provably changes the
# next-token distribution (zeroing early positions alone can leave the
# greedy argmax untouched in a tiny model).  Intervene at layer 0, NOT the
# last layer: zeroing the final block output at the last position collapses
# the logits to a constant (all-tied scores), and beam search over fully
# tied scores diverges on tie-break order alone.
POSITIONS = [0, 1, 8]
LAYER = 0


@pytest.fixture(scope="module")
def pv(ref):
    root = "/root/reference/pyreft/pyvene"
    if root not in sys.path:
        sys.path.append(root)
    import pyvene
    return pyvene


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model = fresh_model(LlamaForCausalLM, LlamaConfig.tiny())
    load_llama(model, dict(hf_model.state_dict()))
    model.eval()
    reft = ReftModel(model, ReftConfig(representations=[
        {"layer": LAYER, "component": "block_output",
         "intervention": "ZeroIntervention"}]), rngs=nnx.Rngs(1))
    return hf_model, reft


def _ref_generate(pv, hf_model, ids, num_beams):
    config = pv.IntervenableConfig(representations=[
        {"layer": LAYER, "component": "block_output",
         "low_rank_dimension": 1,
         "intervention": pv.ZeroIntervention(embed_dim=64)}])
    intervenable = pv.IntervenableModel(config, hf_model)
    intervenable.disable_model_gradients()
    locs = [[POSITIONS] * (ids.shape[0] * num_beams)]
    with torch.no_grad():
        _, steered = intervenable.generate(
            base={"input_ids": torch.tensor(ids),
                  "attention_mask": torch.ones(ids.shape, dtype=torch.long)},
            unit_locations={"sources->base": (None, locs)},
            intervene_on_prompt=True,
            max_new_tokens=NEW, do_sample=False, num_beams=num_beams,
            length_penalty=1.0, early_stopping=True,
            eos_token_id=None, pad_token_id=0)
    return steered.numpy()


def _our_generate(reft, ids, num_beams):
    locs = np.asarray(POSITIONS, np.int32)[None, None, :].repeat(
        ids.shape[0], axis=0)
    if num_beams > 1:
        locs = np.repeat(locs, num_beams, axis=0)
    gc = GenerationConfig(max_new_tokens=NEW, num_beams=num_beams,
                          length_penalty=1.0, early_stopping=True,
                          eos_token_id=None)
    return np.asarray(generate(reft, jnp.asarray(ids),
                               jnp.ones(ids.shape, jnp.int32), gc,
                               intervention_locations=locs))


def _prompts(batch=3, t=9):
    return np.random.default_rng(11).integers(3, 256, size=(batch, t))


def test_intervened_greedy_generate_matches_pyvene(pv, pair):
    hf_model, reft = pair
    ids = _prompts()
    want = _ref_generate(pv, hf_model, ids, num_beams=1)
    got = _our_generate(reft, ids, num_beams=1)
    np.testing.assert_array_equal(got[:, -NEW:], want[:, -NEW:])
    # sanity: the intervention actually changed the generation
    plain = np.asarray(generate(
        reft.model, jnp.asarray(ids), jnp.ones(ids.shape, jnp.int32),
        GenerationConfig(max_new_tokens=NEW, eos_token_id=None)))
    assert not np.array_equal(got[:, -NEW:], plain[:, -NEW:])


def test_intervened_beam4_generate_matches_pyvene(pv, pair):
    hf_model, reft = pair
    ids = _prompts()
    want = _ref_generate(pv, hf_model, ids, num_beams=4)
    got = _our_generate(reft, ids, num_beams=4)
    np.testing.assert_array_equal(got[:, -NEW:], want[:, -NEW:])
