"""N-step LoRA training-trajectory parity vs torch + installed peft.

The Monarch-adapter trajectory test (test_training_trajectory.py) covers
the MoRe path; this covers the LoRA baseline surface (reference qlora.py /
run_glue --lora): identical frozen base + synced LoRA weights + identical
batches + AdamW(same hyperparameters) must produce the same loss
trajectory and adapter weights in both frameworks.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402

from sparse_matrix_fine_tuning_tpu.peft.surgery import ScaledLoRA  # noqa: E402

IN_F, OUT_F, R, ALPHA = 16, 4, 4, 8
STEPS, LR = 10, 1e-2


def _data(seed=0, n=32):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, IN_F)).astype(np.float32)
    w_true = rng.normal(size=(IN_F, OUT_F)).astype(np.float32)
    y = x @ w_true + 0.1 * rng.normal(size=(n, OUT_F)).astype(np.float32)
    return x, y


def test_lora_training_trajectory_matches_torch_peft():
    x_np, y_np = _data()

    # ---- torch + peft side
    torch.manual_seed(0)
    base_t = torch.nn.Linear(IN_F, OUT_F, bias=False)
    from peft import LoraConfig
    from peft.tuners.lora.layer import Linear as PeftLoRALinear
    cfg = LoraConfig(r=R, lora_alpha=ALPHA, lora_dropout=0.0,
                     target_modules=["x"])
    layer_t = PeftLoRALinear(base_t, adapter_name="default", config=cfg,
                             r=R, lora_alpha=ALPHA, lora_dropout=0.0)
    with torch.no_grad():
        layer_t.lora_A["default"].weight.normal_(0, 0.1)
        # B stays zero (peft init)
    a0 = layer_t.lora_A["default"].weight.detach().clone().numpy()
    params_t = [layer_t.lora_A["default"].weight,
                layer_t.lora_B["default"].weight]
    opt_t = torch.optim.AdamW(params_t, lr=LR, betas=(0.9, 0.999),
                              eps=1e-8, weight_decay=0.0)
    xt, yt = torch.tensor(x_np), torch.tensor(y_np)
    losses_t = []
    for _ in range(STEPS):
        opt_t.zero_grad()
        loss = ((layer_t(xt) - yt) ** 2).mean()
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    # ---- JAX side, weights synced from the torch init
    base_j = nnx.Linear(IN_F, OUT_F, use_bias=False, rngs=nnx.Rngs(0))
    base_j.kernel.set_value(jnp.asarray(base_t.weight.detach().numpy().T))
    lora_j = ScaledLoRA(IN_F, R, OUT_F, base_module=base_j, alpha=ALPHA,
                        rngs=nnx.Rngs(1))
    lora_j.lora_a.set_value(jnp.asarray(a0.T))  # torch (R, in) -> (in, R)
    lora_j.lora_b.set_value(jnp.zeros((R, OUT_F)))

    opt_j = nnx.Optimizer(
        lora_j, optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8,
                            weight_decay=0.0), wrt=nnx.LoRAParam)
    xj, yj = jnp.asarray(x_np), jnp.asarray(y_np)

    @nnx.jit
    def step(model, opt):
        def loss_fn(model):
            return jnp.mean((model(xj) - yj) ** 2)
        val, grads = nnx.value_and_grad(
            loss_fn, argnums=nnx.DiffState(0, nnx.LoRAParam))(model)
        opt.update(model, grads)
        return val

    losses_j = [float(step(lora_j, opt_j)) for _ in range(STEPS)]

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lora_j.lora_b[...]),
        layer_t.lora_B["default"].weight.detach().numpy().T,
        rtol=1e-3, atol=1e-5)
