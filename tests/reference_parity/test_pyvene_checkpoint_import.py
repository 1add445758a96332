"""Import a reference IntervenableModel.save checkpoint and match outputs.

The reference's reasoning flows persist trained interventions with pyvene's
``save`` (one intkey_*.bin per intervention + config, reference
intervenable_base.py:379-440, reft_trainer.py:48-67).  This test trains
nothing but randomizes the reference modules, saves with the reference's
own code, loads via ``interventions.load_pyvene_interventions`` into a
weight-synced ReftModel here, and requires the intervened logits to agree.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.interventions import (
    ReftConfig,
    ReftModel,
    load_pyvene_interventions,
)
from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_llama
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

D = 64
POSITIONS = [0, 1, 7]


@pytest.fixture(scope="module")
def pv(ref):
    root = "/root/reference/pyreft/pyvene"
    if root not in sys.path:
        sys.path.append(root)
    import pyvene
    return pyvene


@pytest.fixture(scope="module")
def ref_iv(ref, pv):
    spec = importlib.util.spec_from_file_location(
        "ref_pyreft_interventions_ckpt",
        "/root/reference/pyreft/pyreft/interventions.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _models():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=D, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model = fresh_model(LlamaForCausalLM, LlamaConfig.tiny())
    load_llama(model, dict(hf_model.state_dict()))
    model.eval()
    return hf_model, model


@pytest.mark.parametrize("name,r,positions", [
    ("Loreft", 4, POSITIONS),
    # the reference's Consreft lacks keep_last_dim: pyvene flattens the
    # gathered units, so it only runs with ONE position per intervention
    ("Consreft", 4, [7]),
    ("MoRe", 16, POSITIONS),
])
def test_pyvene_checkpoint_roundtrip(pv, ref_iv, tmp_path, name, r,
                                     positions):
    hf_model, model = _models()
    ref_cls = getattr(ref_iv, f"{name}Intervention")
    riv = ref_cls(embed_dim=D, low_rank_dimension=r, dtype=torch.float32,
                  dropout=0.0)
    # randomize so the checkpoint is non-trivial
    torch.manual_seed(3)
    with torch.no_grad():
        for p in riv.parameters():
            if p.ndim > 0:
                p.add_(0.05 * torch.randn_like(p))
    config = pv.IntervenableConfig(representations=[
        {"layer": 0, "component": "block_output", "low_rank_dimension": r,
         "intervention": riv}])
    intervenable = pv.IntervenableModel(config, hf_model)
    intervenable.disable_model_gradients()
    intervenable.save(str(tmp_path))

    reft = ReftModel(model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": f"{name}Intervention", "low_rank_dimension": r}]),
        rngs=nnx.Rngs(5))
    loaded, skipped = load_pyvene_interventions(reft, str(tmp_path))
    assert len(loaded) == 1 and not skipped

    ids = np.random.default_rng(2).integers(3, 256, size=(3, 9))
    locs = [[positions] * 3]
    with torch.no_grad():
        _, out = intervenable(
            base={"input_ids": torch.tensor(ids),
                  "attention_mask": torch.ones(ids.shape, dtype=torch.long)},
            unit_locations={"sources->base": (None, locs)})
    want = out.logits.numpy()
    got = np.asarray(reft(
        jnp.asarray(ids), jnp.ones(ids.shape, jnp.int32),
        intervention_locations=np.asarray(positions, np.int32)[None, None, :]
        .repeat(3, axis=0)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
    # the loaded intervention must actually differ from identity
    plain = np.asarray(model(jnp.asarray(ids), jnp.ones(ids.shape, jnp.int32)))
    assert np.abs(got - plain).max() > 1e-3


def test_pyvene_import_unmatched_binary_raises(pv, ref_iv, tmp_path):
    hf_model, model = _models()
    riv = ref_iv.LoreftIntervention(embed_dim=D, low_rank_dimension=4,
                                    dtype=torch.float32, dropout=0.0)
    config = pv.IntervenableConfig(representations=[
        {"layer": 1, "component": "block_output", "low_rank_dimension": 4,
         "intervention": riv}])
    pv.IntervenableModel(config, hf_model).save(str(tmp_path))
    # ReftModel targets a DIFFERENT layer: strict load must complain
    reft = ReftModel(model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": "LoreftIntervention", "low_rank_dimension": 4}]),
        rngs=nnx.Rngs(5))
    with pytest.raises(KeyError, match="no matching intervention"):
        load_pyvene_interventions(reft, str(tmp_path))
    loaded, skipped = load_pyvene_interventions(reft, str(tmp_path),
                                                strict=False)
    assert not loaded and len(skipped) == 1


@pytest.mark.parametrize("name,r,positions", [
    ("Loreft", 4, POSITIONS),
    ("Consreft", 4, [7]),
    ("MoRe", 16, POSITIONS),
])
def test_export_to_pyvene_load_intervention(pv, ref_iv, tmp_path, name, r,
                                            positions):
    """Reverse direction: our (randomly-initialized) intervention state
    exported as intkey bins loads onto the reference's IntervenableModel via
    its own ``load_intervention`` with logit parity."""
    from sparse_matrix_fine_tuning_tpu.interventions import (
        save_pyvene_interventions)

    hf_model, model = _models()
    reft = ReftModel(model, ReftConfig(representations=[
        {"layer": 0, "component": "block_output",
         "intervention": f"{name}Intervention", "low_rank_dimension": r}]),
        rngs=nnx.Rngs(11))
    written = save_pyvene_interventions(reft, str(tmp_path))
    assert written == ["intkey_layer.0.comp.block_output.unit.pos.nunit.1#0.bin"]

    ref_cls = getattr(ref_iv, f"{name}Intervention")
    riv = ref_cls(embed_dim=D, low_rank_dimension=r, dtype=torch.float32,
                  dropout=0.0)
    intervenable = pv.IntervenableModel(pv.IntervenableConfig(
        representations=[{"layer": 0, "component": "block_output",
                          "low_rank_dimension": r, "intervention": riv}]),
        hf_model)
    intervenable.disable_model_gradients()
    if name == "MoRe":
        # the reference's MoRe load_state_dict is broken upstream: it
        # assumes a parametrized rotate_layer but MonarchFactor's
        # parametrization is commented out (reference monarch_linear.py:
        # 365-371), so IntervenableModel.load_intervention raises
        # AttributeError.  Restore manually from the exported tensors --
        # which is exactly what a fixed loader would do.
        import os as _os
        sd = torch.load(_os.path.join(str(tmp_path),
                                      written[0]), weights_only=True)
        with torch.no_grad():
            riv.learned_source.weight.copy_(sd["learned_source.weight"])
            riv.rotate_layer.weight.copy_(sd["rotate_layer"])
    else:
        intervenable.load_intervention(str(tmp_path), include_model=False)

    ids = np.random.default_rng(6).integers(3, 256, size=(3, 9))
    locs = [[positions] * 3]
    with torch.no_grad():
        _, out = intervenable(
            base={"input_ids": torch.tensor(ids),
                  "attention_mask": torch.ones(ids.shape, dtype=torch.long)},
            unit_locations={"sources->base": (None, locs)})
    want = out.logits.numpy()
    got = np.asarray(reft(
        jnp.asarray(ids), jnp.ones(ids.shape, jnp.int32),
        intervention_locations=np.asarray(positions, np.int32)[None, None, :]
        .repeat(3, axis=0)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
    plain = np.asarray(model(jnp.asarray(ids), jnp.ones(ids.shape, jnp.int32)))
    assert np.abs(got - plain).max() > 1e-3
