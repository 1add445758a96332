"""Is the ~528us/iter a per-iteration dispatch overhead or harness memory
traffic?  Chain the loop dependency through a SMALL operand instead of x."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_small_chain(fn, args, chain_idx, iters=50):
    """Chain through args[chain_idx] (a small array); consume out via a sum."""
    @jax.jit
    def loop(*args):
        def body(i, carry):
            w, acc = carry
            cur = list(args)
            cur[chain_idx] = w
            out = fn(*cur)
            s = jnp.sum(out.astype(jnp.float32))
            w = w + (s * 1e-30).astype(w.dtype)
            return (w, acc + s)
        return jax.lax.fori_loop(0, iters, body,
                                 (args[chain_idx], jnp.float32(0)))[1]

    float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    B, n = 2664, 4096
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (B, n), jnp.bfloat16)
    w = jax.random.normal(ks[1], (n, 128), jnp.bfloat16)

    # floor: op touches only the small array
    t = time_small_chain(lambda x, w: w * 1.0000001, (x, w), 1, iters=50)
    print(f"small-op floor (touch w only):    {t*1e6:7.1f} us")

    # identity-ish op on x, chained through w: x read once by the sum? no --
    # out = x + w[0,0]: reads x, writes out, sum reads out
    t = time_small_chain(lambda x, w: x + w[0, 0], (x, w), 1, iters=50)
    print(f"elementwise on x via small chain: {t*1e6:7.1f} us")

    # matmul x @ w, chained through w: reads x (22MB) + writes (2664,128)
    t = time_small_chain(
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
        (x, w), 1, iters=50)
    print(f"skinny matmul via small chain:    {t*1e6:7.1f} us")

    for iters in (20, 100):
        t = time_small_chain(lambda x, w: w * 1.0000001, (x, w), 1, iters=iters)
        print(f"small-op floor iters={iters}:        {t*1e6:7.1f} us")


if __name__ == "__main__":
    main()
