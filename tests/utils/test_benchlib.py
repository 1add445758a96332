"""The anti-elision salt must actually change bits (regression: an
absolute +1e-30 nudge rounds away below one ulp of normally-scaled
values, leaving warmup and timed calls value-identical -- exactly the
tunnel cache key the salt exists to break)."""

import jax.numpy as jnp
import numpy as np

from sparse_matrix_fine_tuning_tpu.utils import benchlib


def _bits(a):
    return np.asarray(a).tobytes()


def test_salt_changes_bits_every_call():
    for dtype in (jnp.bfloat16, jnp.float32):
        a = jnp.asarray(np.random.default_rng(0).normal(size=(64,)) * 0.02,
                        dtype)
        s1 = benchlib._salted([a, jnp.int32(3)])
        s2 = benchlib._salted([a, jnp.int32(3)])
        assert _bits(s1[0]) != _bits(a), dtype          # differs from base
        assert _bits(s2[0]) != _bits(s1[0]), dtype      # consecutive differ
        assert _bits(s1[1]) == _bits(jnp.int32(3))      # non-float untouched


def test_salt_factor_is_timing_neutral():
    # the perturbation is a few ulps of 1.0 -- magnitudes preserved
    a = jnp.asarray(np.ones(16), jnp.float32)
    s = benchlib._salted([a])[0]
    np.testing.assert_allclose(np.asarray(s), 1.0, rtol=1e-4)
