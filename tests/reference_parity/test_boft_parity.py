"""BOFT parity vs the installed peft library (the reference's BOFT source).

The reference builds BOFT with peft's BOFTConfig (train_utils.py:378-401).
peft without its CUDA extension forces n_butterfly_factor to 1, so the
direct weight-synced comparison runs at one factor; the multi-factor
butterfly path is checked against a pure-numpy replication of peft's
update_layer/forward formula (P_i @ blockdiag(Cayley) @ P_i^T products),
which the single-factor test anchors to the real library.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from sparse_matrix_fine_tuning_tpu.peft.boft import (  # noqa: E402
    BOFTLinear,
    _butterfly_perm,
    cayley,
)

IN_F, OUT_F, BS = 16, 12, 4


def _peft_boft_linear(base, block_size, n_factor):
    from peft.tuners.boft.layer import Linear as PeftBOFTLinear
    return PeftBOFTLinear(
        base, adapter_name="default", boft_block_size=block_size,
        boft_block_num=0, boft_n_butterfly_factor=n_factor,
        boft_dropout=0.0, init_weights=True)


def test_single_factor_matches_peft_with_synced_weights():
    torch.manual_seed(0)
    base = torch.nn.Linear(IN_F, OUT_F, bias=True)
    layer = _peft_boft_linear(base, BS, 1)
    # non-trivial weights
    with torch.no_grad():
        layer.boft_R["default"].normal_(0, 0.3)
        layer.boft_s["default"].uniform_(0.5, 1.5)
    layer.eval()
    x = torch.randn(5, IN_F)
    want = layer(x).detach().numpy()

    ours = BOFTLinear(
        IN_F, OUT_F, weights=base.weight.detach().numpy(),
        bias=base.bias.detach().numpy(), block_size=BS,
        n_butterfly_factor=1, rngs=nnx.Rngs(0))
    ours.boft_R.set_value(jnp.asarray(
        layer.boft_R["default"].detach().numpy()))
    ours.boft_s.set_value(jnp.asarray(
        layer.boft_s["default"].detach().numpy()[:, 0]))
    got = np.asarray(ours(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _numpy_peft_forward(x, W, b, R, s, n, block_size, F):
    """Pure-numpy replication of peft's multi-factor forward
    (boft/layer.py Linear.forward + update_layer's boft_P)."""
    block_num = n // block_size
    rot = np.eye(n)
    mats = []
    for i in range(F):
        perm = np.asarray(_butterfly_perm(
            n, block_num // (2 ** i), block_size // 2, F - 1))
        P = np.zeros((n, n))
        P[np.arange(n), perm] = 1.0
        S = 0.5 * (R[i] - np.swapaxes(R[i], -1, -2))
        eye = np.eye(block_size)
        Q = np.stack([(eye - s_) @ np.linalg.inv(eye + s_) for s_ in S])
        BD = np.zeros((n, n))
        for k in range(block_num):
            BD[k * block_size:(k + 1) * block_size,
               k * block_size:(k + 1) * block_size] = Q[k]
        mats.append(P @ BD @ P.T)
    for m in mats:
        rot = m @ rot
    rotated_weight = (rot @ W.T).T  # (out, in)
    return x @ (rotated_weight * s[:, None]).T + b


def test_multi_factor_matches_peft_formula():
    rng = np.random.default_rng(1)
    W = rng.normal(size=(OUT_F, IN_F)).astype(np.float32)
    b = rng.normal(size=(OUT_F,)).astype(np.float32)
    F = 2
    R = rng.normal(size=(F, IN_F // BS, BS, BS)).astype(np.float32) * 0.3
    s = rng.uniform(0.5, 1.5, size=(OUT_F,)).astype(np.float32)
    x = rng.normal(size=(5, IN_F)).astype(np.float32)
    want = _numpy_peft_forward(x, W, b, R, s, IN_F, BS, F)

    ours = BOFTLinear(IN_F, OUT_F, weights=W, bias=b, block_size=BS,
                      n_butterfly_factor=F, rngs=nnx.Rngs(0))
    ours.boft_R.set_value(jnp.asarray(R))
    ours.boft_s.set_value(jnp.asarray(s))
    got = np.asarray(ours(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_butterfly_perm_matches_peft():
    from peft.tuners.boft.layer import BOFTLayer
    for (n, bnum, r, f) in [(16, 4, 2, 1), (32, 8, 2, 2), (32, 4, 4, 1),
                            (64, 8, 4, 2)]:
        want = BOFTLayer.block_butterfly_perm(
            None, n, bnum, r, f).numpy()
        got = np.asarray(_butterfly_perm(n, bnum, r, f))
        np.testing.assert_array_equal(got, want, err_msg=str((n, bnum, r, f)))


def test_identity_at_init_and_orthogonal():
    rng = np.random.default_rng(2)
    W = rng.normal(size=(OUT_F, IN_F)).astype(np.float32)
    x = rng.normal(size=(3, IN_F)).astype(np.float32)
    ours = BOFTLinear(IN_F, OUT_F, weights=W, block_size=BS,
                      n_butterfly_factor=2, rngs=nnx.Rngs(0))
    np.testing.assert_allclose(np.asarray(ours(jnp.asarray(x))), x @ W.T,
                               rtol=1e-5, atol=1e-6)
    Q = np.asarray(cayley(jnp.asarray(
        rng.normal(size=(4, BS, BS)).astype(np.float32))))
    eye = np.eye(BS)
    for q in Q:
        np.testing.assert_allclose(q @ q.T, eye, atol=1e-5)
