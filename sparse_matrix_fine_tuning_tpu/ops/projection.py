"""SVD projection of dense matrices onto Monarch factors.

Given a dense matrix M (m, n), find block-diagonal factors (w1, w2) whose
Monarch product best approximates M in Frobenius norm.  The key fact (from
the Monarch paper) is that under the butterfly permutations the problem
decomposes into independent low-rank approximations of small (l, i) slices
of M, solved exactly by truncated SVD.

Layout conventions (identical to the reference so recipes/checkpoints map
1:1, reference: src/ops/blockdiag_butterfly_einsum.py:114-139 and
src/ops/low_rank.py:5-20):

  M viewed as blocks: M[(l j), (k i)] -> slice[k, j] of shape (l, i)
  slice[k, j] ~= U[k, j] @ Vt[k, j]  (rank-r truncated SVD, sqrt(S) split)
  w1 = Vt laid out as (k, (r j), i)
  w2 = U  laid out as (j, l, (k r))

With these layouts, ``blockdiag_butterfly_multiply(x, w1, w2) == x @ M^T``
up to the SVD truncation error (exact when rank >= min(l, i)).

NOTE on orientation: the reference's ``MonarchLinear.set_weights_from_dense_init``
projects ``w.T`` (src/layers/monarch_linear.py:243), which for a (out, in)
linear weight makes the monarch path approximate ``x @ w`` rather than the
layer's ``x @ w.T`` (benign only for symmetric/square layers).  Our layer
code projects ``w`` directly so the adapter approximates the actual linear
map; this module is orientation-agnostic (it just approximates M).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def factors(n: int):
    """All factor pairs (i, n//i) with i <= sqrt(n), ascending in i
    (reference src/ops/blockdiag_butterfly_projection.py:22-23)."""
    return [(i, n // i) for i in range(1, math.floor(math.sqrt(n)) + 1) if n % i == 0]


def low_rank_project(M: Array, rank: int, reverse: bool = False):
    """Batched rank-``rank`` truncation of M via SVD, splitting sqrt(S) into
    both factors (reference src/ops/low_rank.py:5-20).

    Returns (U, Vt) with U (..., l, rank), Vt (..., rank, i); if ``reverse``
    also returns the residual components (U_rev, Vt_rev) built from the
    trailing singular vectors.
    """
    # TPU: the SVD's internal matmuls truncate f32 to bf16 under the default
    # matmul precision, wrecking projection accuracy -- force full f32.
    with jax.default_matmul_precision("float32"):
        U, S, Vt = jnp.linalg.svd(M, full_matrices=False)
    s_sqrt = jnp.sqrt(S[..., :rank])
    U_r = U[..., :rank] * s_sqrt[..., None, :]
    Vt_r = s_sqrt[..., :, None] * Vt[..., :rank, :]
    if reverse:
        s_sqrt_rev = jnp.sqrt(S[..., rank:])
        U_rev = U[..., rank:] * s_sqrt_rev[..., None, :]
        Vt_rev = s_sqrt_rev[..., :, None] * Vt[..., rank:, :]
        return U_r, Vt_r, U_rev, Vt_rev
    return U_r, Vt_r


def _split_blocks(M: Array, nblocks1: int, nblocks2: int) -> Array:
    """rearrange(M, "(l j) (k i) -> k j l i")."""
    m, n = M.shape
    k, j = nblocks1, nblocks2
    l, i = m // j, n // k
    assert l * j == m and k * i == n, f"M {M.shape} not divisible by ({nblocks1}, {nblocks2})"
    return M.reshape(l, j, k, i).transpose(2, 1, 0, 3)  # (k, j, l, i)


def blockdiag_butterfly_project_einsum_rank(
    M: Array, nblocks1: int, nblocks2: int, rank: int, reverse: bool = False
):
    """Rank-``rank`` Monarch projection of a (possibly rectangular) M (m, n).

    Returns:
      w1: (nblocks1, rank * nblocks2, n // nblocks1)
      w2: (nblocks2, m // nblocks2, nblocks1 * rank)
    and, with ``reverse=True``, the factor pair built from the residual
    (least-significant) singular directions as well
    (reference src/ops/blockdiag_butterfly_einsum.py:114-139).
    """
    k, j = nblocks1, nblocks2
    blocks = _split_blocks(M, k, j)  # (k, j, l, i)
    if not reverse:
        U, Vt = low_rank_project(blocks, rank)
        w1 = Vt.transpose(0, 2, 1, 3).reshape(k, rank * j, -1)  # k j r i -> k (r j) i
        w2 = U.transpose(1, 2, 0, 3).reshape(j, -1, k * rank)   # k j l r -> j l (k r)
        return w1, w2
    U, Vt, U_rev, Vt_rev = low_rank_project(blocks, rank, reverse=True)
    w1 = Vt.transpose(0, 2, 1, 3).reshape(k, rank * j, -1)
    w2 = U.transpose(1, 2, 0, 3).reshape(j, -1, k * rank)
    rev_rank = Vt_rev.shape[-2]
    w1_rev = Vt_rev.transpose(0, 2, 1, 3).reshape(k, rev_rank * j, -1)
    w2_rev = U_rev.transpose(1, 2, 0, 3).reshape(j, -1, k * rev_rank)
    return w1, w2, w1_rev, w2_rev


def blockdiag_butterfly_project_einsum_simple(M: Array, nblocks1: int, nblocks2: int):
    """Rank-1 special case (reference src/ops/blockdiag_butterfly_einsum.py:30-44)."""
    return blockdiag_butterfly_project_einsum_rank(M, nblocks1, nblocks2, rank=1)


def blockdiag_butterfly_multiply_einsum_rank(x: Array, w1: Array, w2: Array) -> Array:
    """Einsum oracle for projected factors, output flat index (l j)
    (reference src/ops/blockdiag_butterfly_einsum.py:89-110).  Equals
    ``blockdiag_butterfly_multiply(x, w1, w2)`` -- kept as an independent
    test oracle for the projection layouts."""
    *batch, n = x.shape
    k, jr, i = w1.shape
    j, l, kr = w2.shape
    r = jr // j
    assert jr == j * r and kr == k * r and k * i == n
    xb = x.reshape(-1, k, i)
    w1_ = w1.reshape(k, r, j, i)
    w2_ = w2.reshape(j, l, k, r)
    out = jnp.einsum("bki,krji,jlkr->blj", xb, w1_, w2_)
    return out.reshape(*batch, l * j)


def blockdiag_butterfly_project(M: Array, sizes=None):
    """Square-matrix rank-1 projection in the alternative permuted layout used
    by the FFT factorisation (reference
    src/ops/blockdiag_butterfly_projection.py:27-49).

    Returns w1 (r, k, s), w2 (k, p, r) with n = r*s = p*k, k = sizes[1],
    r = sizes[0] (square blocks: p == r, s == k).
    """
    m, n = M.shape
    if m != n:
        raise NotImplementedError("Only square matrices supported")
    if sizes is None:
        f = factors(n)[-1]
        sizes = (f[1], f[0])
    assert n == sizes[0] * sizes[1]
    k, r = sizes[1], sizes[0]
    p, s = n // k, n // r
    # rearrange(M, "(p k) (r s) -> k r p s")
    blocks = M.reshape(p, k, r, s).transpose(1, 2, 0, 3)
    U, Vt = low_rank_project(blocks, rank=1)
    w1 = Vt[:, :, 0, :].transpose(1, 0, 2)  # "k r 1 s -> r k s"
    w2 = U[:, :, :, 0].transpose(0, 2, 1)   # "k r p 1 -> k p r"
    return w1, w2


def butterfly_fft_factors(n: int, direction: str = "fft", norm: str = "ortho", sizes=None):
    """Factorise the length-n (i)DFT as input-permutation + Monarch product
    (reference src/ops/blockdiag_butterfly_projection.py:52-74).

    Returns (perm, w1, w2) such that
    ``blockdiag_butterfly_multiply(x[..., perm], w1, w2) == fft(x, norm=norm)``
    exactly (for exact-rank-1-decomposable DFT block structure).
    """
    assert direction in ("fft", "ifft")
    if sizes is None:
        f = factors(n)[-1]
        sizes = (f[1], f[0])
    eye = jnp.eye(n, dtype=jnp.complex128)
    transform = jnp.fft.fft if direction == "fft" else jnp.fft.ifft
    dft = transform(eye, axis=-1, norm=norm).T  # mirror torch's fft(eye).t()
    perm = jnp.arange(n).reshape(-1, sizes[0]).T.reshape(-1)  # "(i j) -> (j i)"
    w1, w2 = blockdiag_butterfly_project(dft[:, perm], sizes=sizes)
    return perm, w1.astype(jnp.complex64), w2.astype(jnp.complex64)
