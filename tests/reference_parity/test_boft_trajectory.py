"""N-step BOFT training-trajectory parity vs torch + installed peft.

Completes the adapter-trajectory triad (Monarch: test_training_trajectory,
LoRA: test_lora_trajectory): identical frozen base, synced boft_R/boft_s,
identical batches and AdamW hyperparameters must produce the same loss
trajectory -- both sides parameterize the rotation with the same Cayley
transform, so gradients are directly comparable.  peft's CPU path caps
the butterfly factor at 1; the multi-factor math is covered by
test_boft_parity's formula test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402

from sparse_matrix_fine_tuning_tpu.peft.boft import BOFTLinear  # noqa: E402

IN_F, OUT_F, BS = 16, 4, 4
STEPS, LR = 10, 1e-2


def test_boft_training_trajectory_matches_torch_peft():
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(32, IN_F)).astype(np.float32)
    y_np = (x_np @ rng.normal(size=(IN_F, OUT_F)).astype(np.float32)
            + 0.1 * rng.normal(size=(32, OUT_F)).astype(np.float32))

    torch.manual_seed(0)
    base_t = torch.nn.Linear(IN_F, OUT_F, bias=False)
    from peft.tuners.boft.layer import Linear as PeftBOFTLinear
    layer_t = PeftBOFTLinear(
        base_t, adapter_name="default", boft_block_size=BS, boft_block_num=0,
        boft_n_butterfly_factor=1, boft_dropout=0.0, init_weights=True)
    with torch.no_grad():
        layer_t.boft_R["default"].normal_(0, 0.2)
    r0 = layer_t.boft_R["default"].detach().clone().numpy()
    layer_t.train()
    params_t = [layer_t.boft_R["default"], layer_t.boft_s["default"]]
    opt_t = torch.optim.AdamW(params_t, lr=LR, betas=(0.9, 0.999), eps=1e-8,
                              weight_decay=0.0)
    xt, yt = torch.tensor(x_np), torch.tensor(y_np)
    losses_t = []
    for _ in range(STEPS):
        opt_t.zero_grad()
        loss = ((layer_t(xt) - yt) ** 2).mean()
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    layer_j = BOFTLinear(IN_F, OUT_F,
                         weights=base_t.weight.detach().numpy(),
                         block_size=BS, n_butterfly_factor=1,
                         rngs=nnx.Rngs(0))
    layer_j.boft_R.set_value(jnp.asarray(r0))
    from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
        AdapterParam)
    opt_j = nnx.Optimizer(
        layer_j, optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=0.0), wrt=nnx.OfType(AdapterParam))
    xj, yj = jnp.asarray(x_np), jnp.asarray(y_np)

    @nnx.jit
    def step(model, opt):
        def loss_fn(model):
            return jnp.mean((model(xj) - yj) ** 2)
        val, grads = nnx.value_and_grad(
            loss_fn, argnums=nnx.DiffState(0, nnx.OfType(AdapterParam)))(model)
        opt.update(model, grads)
        return val

    losses_j = [float(step(layer_j, opt_j)) for _ in range(STEPS)]
    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-4, atol=1e-6)
