"""Initialisation-distribution parity vs the reference:

* per-block Kaiming-uniform bounds on the monarch factors
  (reference monarch_linear.py:199-224: gain(leaky_relu, sqrt(5)) * sqrt(3)
  cancels to bound = 1/sqrt(block fan_in)),
* zero-init of blkdiag2 in plain adapter mode (LoRA-style identity start),
* bias uniform bound 1/sqrt(out_features) (reference structured_linear.py:40-44),
* MonarchFactor blockwise semi-orthogonal init (reference monarch_linear.py:361-371).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
    MonarchFactor,
    MonarchLinear,
)


def _uniform_bound_stats(samples):
    """(observed max |.|, std) of a flat sample array."""
    a = np.asarray(samples, dtype=np.float64).ravel()
    return np.abs(a).max(), a.std()


def test_kaiming_block_uniform_bounds_match_reference(ref):
    """Both sides draw U(-b, b) with b = 1/sqrt(block fan_in); check the
    observed support and std against each other and the closed form."""
    in_f, out_f, nblocks, blk_r = 256, 256, 4, 16
    # scaler=True makes the reference Kaiming-init blkdiag2 too
    cfg = {"nblocks": nblocks, "blk_r": blk_r, "blk_sz": None,
           "square": False, "adapter": True, "scaler": True}
    rl = ref.ml.MonarchLinear(in_f, out_f, nblocks=nblocks,
                              peft_config=cfg, device="cpu")
    ours = MonarchLinear(in_f, out_f, nblocks=nblocks, blk_r=blk_r,
                         peft_config={"scaler": True}, rngs=nnx.Rngs(0))

    for ref_p, our_p, fan_in in [
        (rl.blkdiag1, ours.blkdiag1[...], in_f // nblocks),
        (rl.blkdiag2, ours.blkdiag2[...], blk_r),
    ]:
        bound = 1.0 / np.sqrt(fan_in)
        ref_max, ref_std = _uniform_bound_stats(ref_p.detach().numpy())
        our_max, our_std = _uniform_bound_stats(our_p)
        assert ref_max <= bound * (1 + 1e-6)
        assert our_max <= bound * (1 + 1e-6)
        # uniform(-b, b) std = b/sqrt(3); generous tolerance for sample noise
        expect_std = bound / np.sqrt(3)
        assert abs(ref_std - expect_std) / expect_std < 0.15
        assert abs(our_std - expect_std) / expect_std < 0.15
        # the support is actually filled (not a narrower distribution)
        assert ref_max > bound * 0.95
        assert our_max > bound * 0.95


def test_plain_adapter_zero_inits_second_factor(ref):
    """No scaler => blkdiag2 starts at zero on both sides, so the adapter
    branch is the identity map at step 0 (reference reset_parameters:
    blkdiag2 joins the Kaiming list only when use_scaler or projection)."""
    cfg = {"nblocks": 4, "blk_r": 4, "blk_sz": None, "square": False,
           "adapter": True}
    rl = ref.ml.MonarchLinear(64, 64, nblocks=4, peft_config=cfg, device="cpu")
    ours = MonarchLinear(64, 64, nblocks=4, rngs=nnx.Rngs(0))
    assert np.all(rl.blkdiag2.detach().numpy() == 0)
    assert np.all(np.asarray(ours.blkdiag2[...]) == 0)
    assert np.abs(rl.blkdiag1.detach().numpy()).max() > 0
    assert np.abs(np.asarray(ours.blkdiag1[...])).max() > 0


def test_bias_init_bound_matches_reference(ref):
    """Reference bias: uniform(-1/sqrt(out), 1/sqrt(out))
    (structured_linear.py:40-44, fan_in = bias.shape[-1] = out_features)."""
    out_f = 4096
    cfg = {"nblocks": 4, "blk_r": 4, "blk_sz": None, "square": False,
           "adapter": True}
    rl = ref.ml.MonarchLinear(4096, out_f, nblocks=4, peft_config=cfg,
                              device="cpu")
    ours = MonarchLinear(4096, out_f, nblocks=4, use_bias=True,
                         rngs=nnx.Rngs(0))
    bound = 1.0 / np.sqrt(out_f)
    for b in (rl.bias.detach().numpy(), np.asarray(ours.bias[...])):
        bmax, bstd = _uniform_bound_stats(b)
        assert bmax <= bound * (1 + 1e-6)
        assert bmax > bound * 0.9
        assert abs(bstd - bound / np.sqrt(3)) / (bound / np.sqrt(3)) < 0.1


def test_monarch_factor_ortho_init_matches_reference(ref):
    """ortho=True: each block is row-orthonormal (W_blk @ W_blk^T = I),
    both sides (reference monarch_linear.py:361-371 via
    torch.nn.init.orthogonal_)."""
    nblocks, blk_r, in_f = 4, 8, 64
    rf = ref.ml.MonarchFactor(in_f, in_f, nblocks=nblocks, blk_r=blk_r,
                              ortho=True, device="cpu")
    ours = MonarchFactor(in_f, in_f, nblocks=nblocks, blk_r=blk_r,
                         ortho=True, rngs=nnx.Rngs(0))
    eye = np.eye(blk_r, dtype=np.float32)
    for w in (rf.weight.detach().numpy(), np.asarray(ours.weight[...])):
        assert w.shape == (nblocks, blk_r, in_f // nblocks)
        for blk in w:
            np.testing.assert_allclose(blk @ blk.T, eye, atol=1e-5)


def test_monarch_factor_default_init_matches_reference(ref):
    """Default (non-ortho) MonarchFactor init uses the same per-block
    Kaiming bound as the adapter factors."""
    nblocks, blk_r, in_f = 4, 32, 512
    rf = ref.ml.MonarchFactor(in_f, in_f, nblocks=nblocks, blk_r=blk_r,
                              device="cpu")
    ours = MonarchFactor(in_f, in_f, nblocks=nblocks, blk_r=blk_r,
                         rngs=nnx.Rngs(0))
    bound = 1.0 / np.sqrt(in_f // nblocks)
    for w in (rf.weight.detach().numpy(), np.asarray(ours.weight[...])):
        wmax, wstd = _uniform_bound_stats(w)
        assert wmax <= bound * (1 + 1e-6)
        assert wmax > bound * 0.93
        assert abs(wstd - bound / np.sqrt(3)) / (bound / np.sqrt(3)) < 0.1
