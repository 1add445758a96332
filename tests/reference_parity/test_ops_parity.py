"""Forward/backward parity of the core ops vs the reference's own autograd
implementations (reference src/ops/blockdiag_butterfly_multiply.py:10-152),
run on CPU with identical factors.

Tolerance 1e-4 mirrors the reference's own test suite
(reference tests/ops/test_blockdiag_butterfly_multiply.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.ops.blockdiag import blockdiag_multiply
from sparse_matrix_fine_tuning_tpu.ops.monarch import (
    blockdiag_butterfly_multiply,
)

RTOL = ATOL = 1e-4


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32, requires_grad=True)


# (batch, n, w1 (k, q, p), w2 (l, s, r)) -- square, rectangular (expanding
# and contracting), non-square block counts, rank > 1, and blk_r < p.
MONARCH_SHAPES = [
    (3, 16, (4, 4, 4), (4, 4, 4)),          # square, reference default
    (5, 64, (4, 8, 16), (4, 24, 8)),        # expanding 64 -> 96
    (2, 96, (4, 8, 24), (4, 16, 8)),        # contracting 96 -> 64
    (7, 64, (8, 16, 8), (16, 4, 8)),        # k != l
    (4, 48, (4, 12, 12), (6, 10, 8)),       # odd sizes
    (6, 32, (4, 2, 8), (4, 8, 2)),          # blk_r=2 low-rank adapter shape
]


@pytest.mark.parametrize("batch,n,s1,s2", MONARCH_SHAPES)
def test_monarch_multiply_fwd_bwd_matches_reference(ref, batch, n, s1, s2):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    w1 = rng.standard_normal(s1).astype(np.float32)
    w2 = rng.standard_normal(s2).astype(np.float32)
    cot = rng.standard_normal((batch, s2[1] * s2[0])).astype(np.float32)

    xt, w1t, w2t = _t(x), _t(w1), _t(w2)
    out_ref = ref.bbm.blockdiag_butterfly_multiply(xt, w1t, w2t)
    gx_ref, g1_ref, g2_ref = torch.autograd.grad(
        (out_ref * torch.tensor(cot)).sum(), (xt, w1t, w2t))

    out = blockdiag_butterfly_multiply(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    np.testing.assert_allclose(np.asarray(out), out_ref.detach().numpy(),
                               rtol=RTOL, atol=ATOL)

    gx, g1, g2 = jax.grad(
        lambda x_, a, b: jnp.sum(blockdiag_butterfly_multiply(x_, a, b)
                                 * jnp.asarray(cot)),
        argnums=(0, 1, 2),
    )(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    np.testing.assert_allclose(np.asarray(gx), gx_ref.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(g1), g1_ref.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(g2), g2_ref.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("batch,n,s1,s2", MONARCH_SHAPES)
def test_monarch_multiply_matches_reference_einsum_oracle(ref, batch, n, s1, s2):
    """Our fast path vs the reference's slow einsum oracle (version 2,
    reference blockdiag_butterfly_multiply.py:184-187)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    w1 = rng.standard_normal(s1).astype(np.float32)
    w2 = rng.standard_normal(s2).astype(np.float32)
    out_ref = ref.bbm.blockdiag_butterfly_multiply_reference(
        torch.tensor(x), torch.tensor(w1), torch.tensor(w2), version=2)
    out = blockdiag_butterfly_multiply(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=RTOL, atol=ATOL)


BLOCKDIAG_SHAPES = [
    (4, 16, (4, 4, 4)),
    (3, 64, (4, 12, 16)),     # expanding
    (5, 96, (8, 4, 12)),      # contracting
    ((2, 3), 32, (4, 8, 8)),  # multi-dim batch
]


@pytest.mark.parametrize("batch,n,ws", BLOCKDIAG_SHAPES)
def test_single_factor_multiply_fwd_bwd_matches_reference(ref, batch, n, ws):
    """blockdiag_multiply vs reference single_monarch_mult
    (reference blockdiag_butterfly_multiply.py:10-58)."""
    rng = np.random.default_rng(2)
    batch_shape = (batch,) if isinstance(batch, int) else batch
    x = rng.standard_normal((*batch_shape, n)).astype(np.float32)
    w = rng.standard_normal(ws).astype(np.float32)
    cot = rng.standard_normal((*batch_shape, ws[0] * ws[1])).astype(np.float32)

    xt, wt = _t(x), _t(w)
    out_ref = ref.bbm.single_monarch_mult(xt, wt)
    gx_ref, gw_ref = torch.autograd.grad((out_ref * torch.tensor(cot)).sum(), (xt, wt))

    out = blockdiag_multiply(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out),
                               out_ref.detach().numpy().reshape(out.shape),
                               rtol=RTOL, atol=ATOL)

    gx, gw = jax.grad(
        lambda x_, w_: jnp.sum(blockdiag_multiply(x_, w_) * jnp.asarray(cot)),
        argnums=(0, 1),
    )(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), gx_ref.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(gw), gw_ref.numpy(), rtol=RTOL, atol=ATOL)


def test_monarch_multiply_complex_matches_reference(ref):
    """Complex support parity (the reference backward uses .conj();
    JAX's vjp of a holomorphic product is the pure transpose -- compare
    full complex gradients via real/imag cotangents)."""
    rng = np.random.default_rng(3)
    mk = lambda s: (rng.standard_normal(s) + 1j * rng.standard_normal(s)).astype(np.complex64)
    x, w1, w2 = mk((3, 16)), mk((4, 4, 4)), mk((4, 4, 4))

    xt = torch.tensor(x, requires_grad=True)
    w1t = torch.tensor(w1, requires_grad=True)
    w2t = torch.tensor(w2, requires_grad=True)
    out_ref = ref.bbm.blockdiag_butterfly_multiply(xt, w1t, w2t)
    out = blockdiag_butterfly_multiply(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    np.testing.assert_allclose(np.asarray(out), out_ref.detach().numpy(),
                               rtol=1e-3, atol=1e-3)

    # gradient of sum(|out|^2): well-defined real loss for both frameworks
    loss_ref = (out_ref.abs() ** 2).sum()
    gx_ref, g1_ref, g2_ref = torch.autograd.grad(loss_ref, (xt, w1t, w2t))
    gx, g1, g2 = jax.grad(
        lambda x_, a, b: jnp.sum(
            jnp.abs(blockdiag_butterfly_multiply(x_, a, b)) ** 2),
        argnums=(0, 1, 2), holomorphic=False,
    )(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    # torch convention: grad = conj(JAX Wirtinger grad)
    np.testing.assert_allclose(np.asarray(jnp.conj(gx)), gx_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.conj(g1)), g1_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.conj(g2)), g2_ref.numpy(), rtol=1e-3, atol=1e-3)
