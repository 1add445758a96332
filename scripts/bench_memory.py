"""Peak-memory comparison: fused vs unfused MonarchLinear fwd+bwd.

TPU analogue of the reference's activation-memory harness
(demos/test_triton.py:70-89; the Triton kernel claims ~33% activation
memory reduction, README.md:11).  Uses compiled-executable memory analysis
(cost analysis temp allocation) per path.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import monarch_add
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply

print("backend:", jax.default_backend())


def dense(x, wd):
    return jax.lax.dot_general(x, wd, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(x.dtype)


def report(tag, B, n, m, K, r):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, n), jnp.bfloat16)
    wd = jax.random.normal(ks[1], (m, n), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (K, r, n // K), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (K, m // K, r), jnp.bfloat16) * 0.02

    def l_fused(x, wd, w1, w2):
        return jnp.sum(monarch_add(dense(x, wd), x, w1, w2).astype(jnp.float32) ** 2)

    def l_xla(x, wd, w1, w2):
        return jnp.sum((dense(x, wd)
                        + blockdiag_butterfly_multiply(x, w1, w2)).astype(jnp.float32) ** 2)

    print(tag)
    for name, fn in (("fused", l_fused), ("xla", l_xla)):
        vg = jax.jit(jax.value_and_grad(fn, argnums=(0, 2, 3)))
        compiled = vg.lower(x, wd, w1, w2).compile()
        try:
            ma = compiled.memory_analysis()
            tmp = getattr(ma, "temp_size_in_bytes", None)
            out = getattr(ma, "output_size_in_bytes", None)
            arg = getattr(ma, "argument_size_in_bytes", None)
            print(f"  {name}: temp={tmp/2**20:.1f}MB out={out/2**20:.1f}MB "
                  f"args={arg/2**20:.1f}MB")
        except Exception as e:
            print(f"  {name}: memory_analysis unavailable ({type(e).__name__})")
    # NOTE: through the remote-compile tunnel both memory_analysis temp sizes
    # and device memory_stats() come back empty; the structural argument
    # stands in: the fused path's custom VJP saves only (x, w1, w2) and
    # recomputes the small intermediate in the backward, so no adapter
    # activations are stored at all (reference claims 33% activation savings
    # for the same design, README.md:11).


if __name__ == "__main__":
    report("llama qkv 2664x4096->4096 r4", 2664, 4096, 4096, 4, 4)
    report("micro 1024x1024 r16", 1024, 1024, 1024, 4, 16)
