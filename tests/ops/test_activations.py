import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.ops.activations import geglu, swiglu


def _ref_geglu(a, b):
    return jax.nn.gelu(a, approximate=True) * b


def _ref_swiglu(a, b):
    return jax.nn.silu(a) * b


@pytest.mark.parametrize("fn,ref", [(geglu, _ref_geglu), (swiglu, _ref_swiglu)])
def test_forward_and_grad(fn, ref):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    a = jax.random.normal(keys[0], (8, 64))
    b = jax.random.normal(keys[1], (8, 64))
    cot = jax.random.normal(keys[2], (8, 64))
    np.testing.assert_allclose(np.asarray(fn(a, b)), np.asarray(ref(a, b)), rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda a, b: jnp.sum(fn(a, b) * cot), argnums=(0, 1))(a, b)
    g2 = jax.grad(lambda a, b: jnp.sum(ref(a, b) * cot), argnums=(0, 1))(a, b)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)
