"""Causal-model data generator: differential tests against the reference's
own pyvene CausalModel (reference
pyreft/pyvene/pyvene/data_generators/causal_model.py) plus toy-model
(MLP/GRU) interchange integration through ReftModel."""

import importlib.util
import random

import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.interventions.causal_model import CausalModel

REF_PATH = ("/root/reference/pyreft/pyvene/pyvene/data_generators/"
            "causal_model.py")


def _load_reference():
    """Load the reference module by file path (bypasses the pyvene package
    __init__, which drags in every per-arch torch model)."""
    try:
        spec = importlib.util.spec_from_file_location("ref_causal_model",
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception as e:  # missing matplotlib/networkx etc.
        pytest.skip(f"reference causal_model unavailable: {e}")


def _graph():
    """Shared example: inputs X,Y,Z -> intermediates P=X+Y, Q=Y*Z ->
    output O=(P>Q).  Small domains so exhaustive checks stay cheap."""
    variables = ["X", "Y", "Z", "P", "Q", "O"]
    values = {
        "X": [0, 1, 2], "Y": [0, 1, 2], "Z": [0, 1, 2],
        "P": [0, 1, 2, 3, 4], "Q": [0, 1, 2, 4],
        "O": [True, False],
    }
    parents = {"X": [], "Y": [], "Z": [],
               "P": ["X", "Y"], "Q": ["Y", "Z"], "O": ["P", "Q"]}
    functions = {
        "X": lambda: 0, "Y": lambda: 0, "Z": lambda: 0,
        "P": lambda x, y: x + y,
        "Q": lambda y, z: y * z,
        "O": lambda p, q: p > q,
    }
    return variables, values, parents, functions


def _all_inputs(values):
    import itertools
    for x, y, z in itertools.product(values["X"], values["Y"], values["Z"]):
        yield {"X": x, "Y": y, "Z": z}


@pytest.fixture(scope="module")
def ours():
    return CausalModel(*_graph(), seed=7)


@pytest.fixture(scope="module")
def ref():
    mod = _load_reference()
    return mod.CausalModel(*_graph())


class TestReferenceParity:
    def test_timesteps_and_ordering(self, ours, ref):
        assert ours.timesteps == ref.timesteps
        assert ours.variables == ref.variables
        assert ours.inputs == ref.inputs
        assert ours.outputs == ref.outputs

    def test_run_forward_exhaustive(self, ours, ref):
        for inp in _all_inputs(ours.values):
            assert dict(ours.run_forward(inp)) == dict(ref.run_forward(inp))

    def test_run_forward_with_intervention(self, ours, ref):
        for p in [0, 2, 4]:
            iv = {"X": 1, "Y": 1, "Z": 2, "P": p}
            assert dict(ours.run_forward(iv)) == dict(ref.run_forward(iv))

    def test_run_interchange(self, ours, ref):
        base = {"X": 2, "Y": 0, "Z": 1}
        sources = {"P": {"X": 0, "Y": 0, "Z": 2},
                   "Q": {"X": 1, "Y": 2, "Z": 2}}
        assert dict(ours.run_interchange(base, sources)) == \
            dict(ref.run_interchange(base, sources))

    def test_equiv_classes(self, ours, ref):
        assert ours.equiv_classes == ref.equiv_classes

    def test_find_live_paths(self, ours, ref):
        for inp in ({"X": 0, "Y": 0, "Z": 0}, {"X": 2, "Y": 1, "Z": 2}):
            assert ours.find_live_paths(inp) == ref.find_live_paths(inp)

    def test_input_output_arrays_match_tensor_layout(self, ours, ref):
        setting = ours.run_forward({"X": 2, "Y": 1, "Z": 0})
        np.testing.assert_allclose(ours.input_to_array(setting),
                                   ref.input_to_tensor(setting).numpy())
        np.testing.assert_allclose(ours.output_to_array(setting),
                                   ref.output_to_tensor(setting).numpy())

    def test_path_filters_agree(self, ours, ref):
        f_ours = ours.get_path_maxlen_filter([3])
        f_ref = ref.get_path_maxlen_filter([3])
        for inp in list(_all_inputs(ours.values))[:8]:
            total = ours.run_forward(inp)
            assert f_ours(total) == f_ref(total)


def _tree_graph():
    """Tree-shaped variant (P and Q have disjoint input parents): the
    balanced sampler is only exact on trees — same limitation as the
    reference's create_input overwrite (causal_model.py:219-226)."""
    variables = ["X", "Y", "Z", "W", "P", "Q", "O"]
    values = {"X": [0, 1], "Y": [0, 1], "Z": [0, 1], "W": [0, 1],
              "P": [0, 1, 2], "Q": [0, 1, 2], "O": [True, False]}
    parents = {"X": [], "Y": [], "Z": [], "W": [],
               "P": ["X", "Y"], "Q": ["Z", "W"], "O": ["P", "Q"]}
    functions = {"X": lambda: 0, "Y": lambda: 0, "Z": lambda: 0,
                 "W": lambda: 0,
                 "P": lambda x, y: x + y, "Q": lambda z, w: z + w,
                 "O": lambda p, q: p >= q}
    return variables, values, parents, functions


class TestSamplingAndDatasets:
    def test_balanced_sampler_realizes_value(self):
        tree = CausalModel(*_tree_graph(), seed=3)
        for want in (True, False):
            for _ in range(10):
                inp = tree.sample_input_tree_balanced("O", want)
                assert tree.run_forward(inp)["O"] == want

    def test_sample_input_targeted_kwargs(self, ours):
        inp = ours.sample_input(output_var="O", output_var_value=True)
        assert ours.run_forward(inp)["O"] is True

    def test_seeded_determinism(self):
        a = CausalModel(*_graph(), seed=11)
        b = CausalModel(*_graph(), seed=11)
        assert [a.sample_input() for _ in range(5)] == \
            [b.sample_input() for _ in range(5)]

    def test_factual_dataset_arrays(self, ours):
        ds = ours.generate_factual_dataset(16)
        assert ds["input_ids"].shape == (16, 3)
        assert ds["labels"].shape == (16, 1)
        for row, lab in zip(ds["input_ids"], ds["labels"]):
            inp = dict(zip(ours.inputs, row.tolist()))
            assert float(ours.run_forward(inp)["O"]) == lab[0]

    def test_counterfactual_dataset_labels_are_interchange(self, ours):
        iv_id = lambda iv: int("P" in iv) + 2 * int("Q" in iv)
        ds = ours.generate_counterfactual_dataset(12, iv_id, batch_size=3)
        assert ds["input_ids"].shape == (12, 3)
        assert ds["source_input_ids"].shape == (12, 2, 3)  # k=2 intermediates
        assert ds["labels"].shape == (12, 1)
        assert ds["intervention_id"].shape == (12,)
        raw = ours.generate_counterfactual_dataset(6, iv_id, batch_size=2,
                                                   return_arrays=False)
        for ex in raw:
            got = ours.run_interchange(ex["base"], ex["sources"])
            # every sampled source realizes its intervention value
            for var, src in ex["sources"].items():
                assert ours.run_forward(src)[var] == ex["intervention"][var]
            assert got["O"] in (True, False)

    def test_rejection_source_sampling_path(self, ours):
        # plain sample_input has no targeted kwargs beyond ours; force the
        # rejection branch via a sampler that rejects kwargs
        sampler = lambda: ours.sample_input()
        src = ours._sample_source(sampler, "P", 4)
        assert ours.run_forward(src)["P"] == 4

    def test_format_structure_ascii(self, ours):
        text = ours.format_structure()
        assert "t=0" in text and "O(P,Q)" in text


class TestToyModels:
    def _mlp(self):
        import jax.numpy as jnp
        from flax import nnx

        from sparse_matrix_fine_tuning_tpu.models.toy import MLPModel, ToyConfig
        cfg = ToyConfig(hidden_size=16, num_hidden_layers=3, num_classes=2)
        return MLPModel(cfg, rngs=nnx.Rngs(0)), jnp

    def test_mlp_forward_and_hook(self):
        model, jnp = self._mlp()
        x = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))
        base = model(x)
        assert base.shape == (4, 2)
        zeroed = model(x, layer_hooks={1: lambda h: h * 0.0})
        assert not np.allclose(np.asarray(base), np.asarray(zeroed))

    def test_gru_forward_and_hook(self):
        import jax.numpy as jnp
        from flax import nnx

        from sparse_matrix_fine_tuning_tpu.models.toy import GRUModel, ToyConfig
        cfg = ToyConfig(hidden_size=16, num_hidden_layers=2, num_classes=3)
        model = GRUModel(cfg, rngs=nnx.Rngs(1))
        x = jnp.asarray(np.random.RandomState(1).randn(2, 5).astype(np.float32))
        out = model(x)
        assert out.shape == (2, 3)
        hooked = model(x, layer_hooks={(0, "block_output"): lambda h: h + 1.0})
        assert not np.allclose(np.asarray(out), np.asarray(hooked))
        mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
        masked = model(x, attention_mask=mask)
        assert masked.shape == (2, 3)

    def test_reft_interchange_on_mlp(self, ours):
        """End-to-end IIT plumbing: counterfactual data from the causal
        model drives a source->base interchange through ReftModel on the
        toy MLP — the full reference workflow (causal_model dataset ->
        pyvene interchange forward) on this stack."""
        import jax.numpy as jnp
        from flax import nnx

        from sparse_matrix_fine_tuning_tpu.interventions.reft import (
            ReftConfig, get_reft_model)
        from sparse_matrix_fine_tuning_tpu.models.toy import MLPModel, ToyConfig

        cfg = ToyConfig(hidden_size=16, num_hidden_layers=3, num_classes=2)
        model = MLPModel(cfg, rngs=nnx.Rngs(0))
        reft = get_reft_model(model, ReftConfig(representations=[
            {"layer": 1, "component": "block_output",
             "intervention": "VanillaIntervention"}]), rngs=nnx.Rngs(2))

        iv_id = lambda iv: 0
        ds = ours.generate_counterfactual_dataset(4, iv_id, batch_size=2)
        base = jnp.asarray(ds["input_ids"])            # (4, 3)
        source = jnp.asarray(ds["source_input_ids"][:, 0, :])
        locs = jnp.zeros((4, 1, 1), jnp.int32)         # position 0, 1 iv
        swapped = reft.swap_forward(base, source, base_locations=locs,
                                    source_locations=locs)
        plain = reft(base)
        assert swapped.shape == plain.shape == (4, 2)
        assert not np.allclose(np.asarray(swapped), np.asarray(plain))

    def test_mlp_loss_grads_flow(self):
        import jax
        import jax.numpy as jnp
        from flax import nnx

        from sparse_matrix_fine_tuning_tpu.models.toy import MLPModel, ToyConfig
        cfg = ToyConfig(hidden_size=8, num_hidden_layers=2, num_classes=2)
        model = MLPModel(cfg, rngs=nnx.Rngs(0))
        x = jnp.asarray(np.random.RandomState(2).randn(6, 3).astype(np.float32))
        y = jnp.asarray([0, 1, 0, 1, 1, 0])

        def loss_fn(m):
            return m.loss(m(x), y)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
