"""SVD dense->Monarch projection parity vs the reference
(reference src/ops/blockdiag_butterfly_einsum.py:30-139, src/ops/low_rank.py).

SVD factor pairs are unique only up to a per-singular-direction sign flip
(both tails use LAPACK but need not pick the same signs), so factors are
compared after canonical sign normalisation -- making each Vt row's
largest-|.| element positive and flipping the matching U column -- while
products/reconstructions are compared directly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.ops.monarch import (
    blockdiag_butterfly_multiply,
    monarch_dense_equivalent,
)
from sparse_matrix_fine_tuning_tpu.ops.projection import (
    blockdiag_butterfly_project_einsum_rank,
    blockdiag_butterfly_project_einsum_simple,
    low_rank_project,
)

RTOL = ATOL = 1e-4


def _canon_uv(U, Vt):
    """Sign-canonicalise batched SVD factors U (..., l, r), Vt (..., r, i)."""
    idx = np.argmax(np.abs(Vt), axis=-1, keepdims=True)
    sign = np.sign(np.take_along_axis(Vt, idx, axis=-1))
    sign[sign == 0] = 1.0
    return U * np.swapaxes(sign, -1, -2), Vt * sign


def _canon_factors(w1, w2):
    """Sign-canonicalise projected monarch factors
    w1 (k, r*j, i), w2 (j, l, k*r): each (k, j, r) singular direction may
    flip sign jointly in w1[k, rj] and w2[j, :, kr]."""
    w1, w2 = np.array(w1), np.array(w2)
    k, rj, i = w1.shape
    j, l, kr = w2.shape
    r = rj // j
    w1v = w1.reshape(k, r, j, i)
    w2v = w2.reshape(j, l, k, r)
    sign = np.sign(np.take_along_axis(
        w1v, np.argmax(np.abs(w1v), axis=-1, keepdims=True), axis=-1))
    sign[sign == 0] = 1.0                      # (k, r, j, 1)
    w1v = w1v * sign
    w2v = w2v * sign[:, :, :, 0].transpose(2, 0, 1)[:, None]  # (j, 1, k, r)
    return w1v.reshape(k, rj, i), w2v.reshape(j, l, kr)


@pytest.mark.parametrize("shape,rank", [
    ((16, 16), 1), ((64, 64), 4), ((96, 64), 2), ((64, 96), 3),
])
def test_low_rank_project_matches_reference(ref, shape, rank):
    rng = np.random.default_rng(0)
    M = rng.standard_normal(shape).astype(np.float32)
    U_ref, Vt_ref = ref.low_rank.low_rank_project(torch.tensor(M), rank=rank)
    U, Vt = low_rank_project(jnp.asarray(M), rank)
    Uc, Vtc = _canon_uv(np.asarray(U), np.asarray(Vt))
    Urc, Vtrc = _canon_uv(U_ref.numpy(), Vt_ref.numpy())
    np.testing.assert_allclose(Uc, Urc, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(Vtc, Vtrc, rtol=RTOL, atol=ATOL)
    # reconstruction identical regardless of signs
    np.testing.assert_allclose(np.asarray(U @ Vt), (U_ref @ Vt_ref).numpy(),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("m,n,k,j,rank", [
    (16, 16, 4, 4, 1),
    (64, 64, 4, 4, 4),
    (96, 64, 4, 4, 2),    # rectangular
    (64, 96, 4, 4, 2),
    (48, 32, 4, 2, 3),    # k != j
])
def test_project_einsum_rank_factors_match_reference(ref, m, n, k, j, rank):
    rng = np.random.default_rng(1)
    M = rng.standard_normal((m, n)).astype(np.float32)
    w1_ref, w2_ref = ref.einsum.blockdiag_butterfly_project_einsum_rank(
        torch.tensor(M), k, j, rank)
    w1, w2 = blockdiag_butterfly_project_einsum_rank(jnp.asarray(M), k, j, rank)
    assert tuple(w1.shape) == tuple(w1_ref.shape)
    assert tuple(w2.shape) == tuple(w2_ref.shape)

    c1, c2 = _canon_factors(w1, w2)
    c1_ref, c2_ref = _canon_factors(w1_ref.numpy(), w2_ref.numpy())
    # factor-level tolerance 5e-4: LAPACK gesdd vs jnp.linalg.svd agree to
    # f32 roundoff in the rotated basis, slightly above the product check
    np.testing.assert_allclose(c1, c1_ref, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(c2, c2_ref, rtol=5e-4, atol=5e-4)

    # the projected monarch products agree (sign-invariant check; tolerance
    # reflects two f32 SVDs + reconstruction roundoff)
    np.testing.assert_allclose(
        np.asarray(monarch_dense_equivalent(w1, w2)),
        np.asarray(monarch_dense_equivalent(
            jnp.asarray(w1_ref.numpy()), jnp.asarray(w2_ref.numpy()))),
        rtol=1e-3, atol=5e-4)


def test_project_einsum_rank_reverse_residual_matches_reference(ref):
    """reverse=True residual (least-significant) factors
    (reference blockdiag_butterfly_einsum.py:133-139)."""
    rng = np.random.default_rng(2)
    M = rng.standard_normal((64, 64)).astype(np.float32)
    out_ref = ref.einsum.blockdiag_butterfly_project_einsum_rank(
        torch.tensor(M), 4, 4, 4, reverse=True)
    out = blockdiag_butterfly_project_einsum_rank(jnp.asarray(M), 4, 4, 4, reverse=True)
    assert len(out_ref) == len(out) == 4
    for ours, ref_t in zip(out, out_ref):
        assert tuple(ours.shape) == tuple(ref_t.shape)
    # main + residual products each agree
    for w1, w2, w1r, w2r in [(out[0], out[1], out_ref[0], out_ref[1]),
                             (out[2], out[3], out_ref[2], out_ref[3])]:
        np.testing.assert_allclose(
            np.asarray(monarch_dense_equivalent(w1, w2)),
            np.asarray(monarch_dense_equivalent(
                jnp.asarray(w1r.numpy()), jnp.asarray(w2r.numpy()))),
            rtol=RTOL, atol=ATOL)
    # main + residual sum to M exactly at full rank split (4 + 12 = 16)
    full = ref.einsum.blockdiag_butterfly_project_einsum_rank(
        torch.tensor(M), 4, 4, 16)
    np.testing.assert_allclose(
        np.asarray(monarch_dense_equivalent(out[0], out[1])
                   + monarch_dense_equivalent(out[2], out[3])),
        np.asarray(monarch_dense_equivalent(
            jnp.asarray(full[0].numpy()), jnp.asarray(full[1].numpy()))),
        rtol=1e-3, atol=1e-3)


def test_project_simple_matches_reference(ref):
    """Rank-1 special-case wrapper (reference blockdiag_butterfly_einsum.py:30-44)."""
    rng = np.random.default_rng(3)
    M = rng.standard_normal((32, 48)).astype(np.float32)
    w1_ref, w2_ref = ref.einsum.blockdiag_butterfly_project_einsum_simple(
        torch.tensor(M), 4, 4)
    w1, w2 = blockdiag_butterfly_project_einsum_simple(jnp.asarray(M), 4, 4)
    assert tuple(w1.shape) == tuple(w1_ref.shape)
    assert tuple(w2.shape) == tuple(w2_ref.shape)
    c1, c2 = _canon_factors(w1, w2)
    c1_ref, c2_ref = _canon_factors(w1_ref.numpy(), w2_ref.numpy())
    np.testing.assert_allclose(c1, c1_ref, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(c2, c2_ref, rtol=RTOL, atol=ATOL)


def test_projected_factors_multiply_like_reference_einsum(ref):
    """End-to-end: project with OUR code, multiply with the REFERENCE's
    einsum-rank oracle, and vice versa -- layout conventions interoperate."""
    rng = np.random.default_rng(4)
    M = rng.standard_normal((64, 64)).astype(np.float32)
    x = rng.standard_normal((5, 64)).astype(np.float32)

    w1, w2 = blockdiag_butterfly_project_einsum_rank(jnp.asarray(M), 4, 4, 4)
    out_ref = ref.einsum.blockdiag_butterfly_multiply_einsum_rank(
        torch.tensor(x), torch.tensor(np.asarray(w1)), torch.tensor(np.asarray(w2)))
    out_ours = blockdiag_butterfly_multiply(jnp.asarray(x), w1, w2)
    np.testing.assert_allclose(np.asarray(out_ours), out_ref.numpy(),
                               rtol=RTOL, atol=ATOL)

    w1_ref, w2_ref = ref.einsum.blockdiag_butterfly_project_einsum_rank(
        torch.tensor(M), 4, 4, 4)
    out2 = blockdiag_butterfly_multiply(
        jnp.asarray(x), jnp.asarray(w1_ref.numpy()), jnp.asarray(w2_ref.numpy()))
    ref_full = ref.einsum.blockdiag_butterfly_multiply_einsum_rank(
        torch.tensor(x), w1_ref, w2_ref)
    np.testing.assert_allclose(np.asarray(out2), ref_full.numpy(),
                               rtol=RTOL, atol=ATOL)
