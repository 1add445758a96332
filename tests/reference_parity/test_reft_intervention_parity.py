"""Parity of the pyreft interventions vs the reference's own code.

Imports the reference's pyreft/pyreft/interventions.py (which itself pulls
the vendored pyvene base classes and the reference MonarchFactor /
single_monarch_mult) and checks this repo's Loreft / Noreft / Consreft /
MoRe interventions (interventions/reft.py) produce identical outputs for
identical weights and inputs.  The rotation weights are copied from the
reference module's MATERIALIZED orthogonal matrices into this repo's
directly-parameterized factors (our Loreft rotate / MonarchFactor weight
are plain parameters, so the copy is exact).
"""

import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

torch = pytest.importorskip("torch")

from sparse_matrix_fine_tuning_tpu.interventions.reft import (  # noqa: E402
    ConsreftIntervention,
    LoreftIntervention,
    MoReIntervention,
    NoreftIntervention,
)

D, R = 32, 16


@pytest.fixture(scope="module")
def ref_iv(ref):
    """The reference's pyreft interventions module (file-path import: the
    pyreft package __init__ drags in its trainer stack, which is not under
    test).  Depends on the ``ref`` fixture so src.* is importable and the
    reference MonarchFactor's device default is already rebound to cpu."""
    pyvene_root = "/root/reference/pyreft/pyvene"
    if pyvene_root not in sys.path:
        sys.path.append(pyvene_root)
    spec = importlib.util.spec_from_file_location(
        "ref_pyreft_interventions",
        "/root/reference/pyreft/pyreft/interventions.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _base(seed=0, batch=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(batch, D)).astype(np.float32)


def test_loreft_matches_reference(ref_iv):
    b = _base(0)
    refm = ref_iv.LoreftIntervention(
        embed_dim=D, low_rank_dimension=R, dtype=torch.float32)
    want = refm(torch.tensor(b)).detach().numpy()

    ours = LoreftIntervention(D, R, rngs=nnx.Rngs(0))
    ours.rotate.set_value(jnp.asarray(
        refm.rotate_layer.weight.detach().numpy()))        # (D, R)
    ours.w.set_value(jnp.asarray(
        refm.learned_source.weight.detach().numpy().T))    # (R, D) -> (D, R)
    ours.b.set_value(jnp.asarray(
        refm.learned_source.bias.detach().numpy()))
    got = ours(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_noreft_matches_reference(ref_iv):
    b = _base(1)
    refm = ref_iv.NoreftIntervention(
        embed_dim=D, low_rank_dimension=R, add_bias=True, dtype=torch.float32)
    with torch.no_grad():  # default proj bias is zero; make it non-trivial
        refm.proj_layer.bias.uniform_(-0.1, 0.1)
    want = refm(torch.tensor(b)).detach().numpy()

    ours = NoreftIntervention(D, R, add_bias=True, rngs=nnx.Rngs(0))
    ours.proj.set_value(jnp.asarray(
        refm.proj_layer.weight.detach().numpy().T))
    ours.proj_b.set_value(jnp.asarray(
        refm.proj_layer.bias.detach().numpy()))
    ours.w.set_value(jnp.asarray(
        refm.learned_source.weight.detach().numpy().T))
    ours.b.set_value(jnp.asarray(
        refm.learned_source.bias.detach().numpy()))
    got = ours(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_consreft_matches_reference(ref_iv):
    b = _base(2)
    refm = ref_iv.ConsreftIntervention(embed_dim=D, low_rank_dimension=R)
    want = refm(torch.tensor(b)).detach().numpy()

    ours = ConsreftIntervention(D, R, rngs=nnx.Rngs(0))
    ours.rotate.set_value(jnp.asarray(
        refm.rotate_layer.weight.detach().numpy()))
    ours.source.set_value(jnp.asarray(
        refm.learned_source.detach().numpy()))
    got = ours(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_more_intervention_matches_reference(ref_iv):
    """MoRe: blockwise-orthogonal Monarch rotate + Monarch learned source,
    inverse rotation via transposed blocks.  The reference's MonarchFactor
    keeps its default nblocks=4/blk_r=4 (rotated dim 16) regardless of
    low_rank_dimension, so parity is at low_rank_dimension=16."""
    b = _base(3)
    refm = ref_iv.MoReIntervention(
        embed_dim=D, low_rank_dimension=16, dtype=torch.float32)
    want = refm(torch.tensor(b)).detach().numpy()

    ours = MoReIntervention(D, 16, nblocks=4, rngs=nnx.Rngs(0))
    ours.rotate_layer.weight.set_value(jnp.asarray(
        refm.rotate_layer.weight.detach().numpy()))   # (4, 4, D/4)
    ours.learned_source.weight.set_value(jnp.asarray(
        refm.learned_source.weight.detach().to(torch.float32).numpy()))
    got = ours(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
