"""Trustworthy TPU timing.

Two hazards through remote/async runtimes: repeat calls with identical args
can be elided, and ``block_until_ready`` may return before remote execution
finishes.  Recipe that measures true device time: run N iterations inside
ONE jitted ``lax.fori_loop`` whose carry chains each step's result into the
next step's input (a real data dependency), and time the FETCH of the final
scalar to host (np.asarray), after a warmup fetch drains the queue.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def time_grad_steps(loss_fn: Callable, args: Sequence, *, argnums=(0,),
                    iters: int = 20, warmup: bool = True) -> float:
    """Seconds per fwd+bwd of ``loss_fn(*args)``.

    loss_fn must return a scalar; args[argnums[0]] must be a float array
    (the gradient is chained into it between iterations).
    """
    args = list(args)
    vg = jax.value_and_grad(loss_fn, argnums=argnums)

    @jax.jit
    def loop(*args):
        def body(i, carry):
            a0, acc = carry
            cur = list(args)
            cur[argnums[0]] = a0
            loss, grads = vg(*cur)
            # chain: next input depends on this step's gradient
            a0 = a0 + grads[0].astype(a0.dtype) * jnp.asarray(1e-12, a0.dtype)
            return (a0, acc + loss)
        (a0, acc) = jax.lax.fori_loop(
            0, iters, body, (args[argnums[0]], jnp.float32(0)))[0:2]
        return acc

    import numpy as np
    if warmup:
        float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / iters


def time_fn(fn: Callable, args: Sequence, *, iters: int = 20,
            warmup: bool = True) -> float:
    """Seconds per forward of fn(*args) with a chained data dependency."""
    @jax.jit
    def loop(*args):
        def body(i, carry):
            a0, acc = carry
            cur = (a0,) + tuple(args[1:])
            out = fn(*cur)
            s = jnp.sum(out.astype(jnp.float32))
            a0 = a0 + jnp.asarray(s * 1e-20, a0.dtype)
            return (a0, acc + s)
        return jax.lax.fori_loop(0, iters, body,
                                 (args[0], jnp.float32(0)))[1]

    import numpy as np
    if warmup:
        float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / iters
