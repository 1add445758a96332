"""LoRA parity vs the installed peft library (the reference's LoRA source).

The reference builds LoRA with peft's LoraConfig (train_utils.py:404-407,
qlora.py:366-372; GLUE config pins r=8, lora_alpha=16,
init_lora_weights="gaussian").  Weight-synced forward comparison plus
init-distribution checks.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from sparse_matrix_fine_tuning_tpu.peft.surgery import ScaledLoRA  # noqa: E402

IN_F, OUT_F, R, ALPHA = 24, 20, 8, 16


def test_forward_matches_peft_with_synced_weights():
    torch.manual_seed(0)
    base = torch.nn.Linear(IN_F, OUT_F, bias=True)
    from peft import LoraConfig
    from peft.tuners.lora.layer import Linear as PeftLoRALinear
    cfg = LoraConfig(r=R, lora_alpha=ALPHA, lora_dropout=0.0,
                     target_modules=["x"])
    layer = PeftLoRALinear(base, adapter_name="default", config=cfg, r=R,
                           lora_alpha=ALPHA, lora_dropout=0.0)
    with torch.no_grad():
        layer.lora_A["default"].weight.normal_(0, 0.2)  # (R, in)
        layer.lora_B["default"].weight.normal_(0, 0.2)  # (out, R)
    layer.eval()
    x = torch.randn(5, IN_F)
    want = layer(x).detach().numpy()

    base_nnx = nnx.Linear(IN_F, OUT_F, rngs=nnx.Rngs(0))
    base_nnx.kernel.set_value(jnp.asarray(base.weight.detach().numpy().T))
    base_nnx.bias.set_value(jnp.asarray(base.bias.detach().numpy()))
    ours = ScaledLoRA(IN_F, R, OUT_F, base_module=base_nnx, alpha=ALPHA,
                      rngs=nnx.Rngs(0))
    ours.lora_a.set_value(jnp.asarray(
        layer.lora_A["default"].weight.detach().numpy().T))  # (in, R)
    ours.lora_b.set_value(jnp.asarray(
        layer.lora_B["default"].weight.detach().numpy().T))  # (R, out)
    got = np.asarray(ours(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_b_zero_init_starts_at_base():
    base_nnx = nnx.Linear(IN_F, OUT_F, rngs=nnx.Rngs(1))
    ours = ScaledLoRA(IN_F, R, OUT_F, base_module=base_nnx, alpha=ALPHA,
                      rngs=nnx.Rngs(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (4, IN_F))
    np.testing.assert_allclose(np.asarray(ours(x)), np.asarray(base_nnx(x)),
                               rtol=1e-6)
    assert float(jnp.abs(ours.lora_b[...]).max()) == 0.0


def test_init_distributions_match_peft():
    """peft default A init = kaiming_uniform(a=sqrt(5)) -> U(+-1/sqrt(in));
    "gaussian" -> N(0, 1/r).  Check bounds/std over many draws."""
    n = 4000
    big_in = 64
    default = ScaledLoRA(big_in, R, OUT_F,
                         base_module=nnx.Linear(big_in, OUT_F, rngs=nnx.Rngs(0)),
                         rngs=nnx.Rngs(4))
    a = np.asarray(default.lora_a[...])
    bound = 1.0 / np.sqrt(big_in)
    assert np.abs(a).max() <= bound * 1.0001
    assert np.abs(a).max() >= bound * 0.95  # actually fills the range

    gauss = ScaledLoRA(n, R, OUT_F,
                       base_module=nnx.Linear(n, OUT_F, rngs=nnx.Rngs(0)),
                       init_lora_weights="gaussian", rngs=nnx.Rngs(5))
    a = np.asarray(gauss.lora_a[...])
    np.testing.assert_allclose(a.std(), 1.0 / R, rtol=0.05)


def test_scaling_is_alpha_over_r():
    base_nnx = nnx.Linear(IN_F, OUT_F, rngs=nnx.Rngs(6), use_bias=False)
    base_nnx.kernel.set_value(jnp.zeros((IN_F, OUT_F)))
    ours = ScaledLoRA(IN_F, R, OUT_F, base_module=base_nnx, alpha=ALPHA,
                      rngs=nnx.Rngs(7))
    ours.lora_a.set_value(jnp.ones((IN_F, R)))
    ours.lora_b.set_value(jnp.ones((R, OUT_F)))
    x = jnp.ones((1, IN_F))
    np.testing.assert_allclose(
        np.asarray(ours(x)), IN_F * R * (ALPHA / R) * np.ones((1, OUT_F)),
        rtol=1e-6)
