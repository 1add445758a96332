"""Trustworthy TPU timing.

Three hazards through remote/async runtimes, each observed on this chip:
  1. repeat calls with identical args can be elided;
  2. ``block_until_ready`` may return before remote execution finishes;
  3. every dispatched executable pays a LARGE fixed cost (~24 ms through
     the tunnel), which at 30-50 loop iterations adds 500-800 us/iter of
     pure noise to naive per-iter numbers -- enough to drown a 100 us op.

Recipe that measures true device time per iteration: run N iterations
inside ONE jitted ``lax.fori_loop`` whose carry chains each step's result
into the next step's input (a real data dependency, beats 1+2), time the
FETCH of the final scalar to host, and do this at TWO iteration counts --
the per-iteration time is the SLOPE (t_hi - t_lo) / (n_hi - n_lo), which
cancels the fixed dispatch cost exactly (beats 3).

The chained dependency flows through a caller-chosen argument; chain
through a SMALL operand (e.g. a weight factor) so the harness's own carry
traffic doesn't shadow a memory-bound op.
"""

from __future__ import annotations

import time
import warnings
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _tree_nudge(x, s):
    """x + tiny*s with a real runtime dependency on scalar s."""
    return jax.tree.map(lambda a: a + (s * 1e-30).astype(a.dtype), x)


def slope_time(loop, args, iters: int) -> float:
    """Seconds per iteration of a pre-built counted loop, as the SLOPE
    between an ``iters`` and a ``3*iters`` run -- cancels the fixed
    per-dispatch cost exactly.  ``loop(*args, n)`` must run n chained
    iterations and return a small fetchable value."""
    t_lo = _run_loop(loop, args, iters)
    t_hi = _run_loop(loop, args, iters * 3)
    return (t_hi - t_lo) / (iters * 2)


_salt_counter = [0]


def _salted(args):
    """Copy of args with the first float-array operand nudged by a unique
    RELATIVE amount, so no two timed calls ever have identical inputs.
    The tunnel serves REPEATED identical calls from cache (hazard 1) -- and
    it does so nondeterministically: the same harness has produced honest
    numbers one session and below-HBM-floor impossibilities the next.
    The nudge must change BITS: an absolute ``+ 1e-30`` rounds away below
    one ulp of any normally-scaled value, so the scale is multiplicative at
    k ulps of 1.0 (k*0.8% for bf16 -- irrelevant to timing, bit-distinct
    for every nonzero element).  It executes on device before timing
    starts, and always produces fresh buffers as well."""
    _salt_counter[0] += 1
    # k stays in [1, 97] so the factor 1 + k*eps lives in [1, 2), where
    # every eps step is exactly representable (beyond 2.0 the ulp doubles
    # and consecutive counters would collide back to identical factors);
    # 97 is prime, so consecutive calls always get distinct factors.
    k = _salt_counter[0] % 97 + 1
    out, done = [], False
    for a in args:
        if (not done and isinstance(a, jax.Array)
                and jnp.issubdtype(a.dtype, jnp.floating)):
            eps = jnp.asarray(jnp.finfo(a.dtype).eps, a.dtype)
            factor = jnp.ones((), a.dtype) + jnp.asarray(k, a.dtype) * eps
            a = a * factor
            done = True
        out.append(a)
    if not done:
        # no float operand to salt: warmup and timed calls would be
        # bit-identical -- exactly the tunnel cache key this exists to
        # break.  Loud, because the resulting number can be dishonest.
        warnings.warn(
            "benchlib._salted: no floating-point jax.Array operand found; "
            "repeated identical calls may be served from the tunnel cache "
            "and time dishonestly.  Add a float operand to the loop args.",
            stacklevel=3)
    return out


def _run_loop(loop, args, iters):
    # warmup run (compile + tunnel finalization); queue drained by the fetch
    float(np.asarray(loop(*_salted(args), jnp.int32(iters))))
    timed_args = _salted(args)
    jax.block_until_ready(timed_args)
    t0 = time.perf_counter()
    float(np.asarray(loop(*timed_args, jnp.int32(iters))))
    return time.perf_counter() - t0


def time_grad_steps(loss_fn: Callable, args: Sequence, *, argnums=(0,),
                    iters: int = 50,
                    chain_argnum: int | None = None) -> float:
    """Seconds per fwd+bwd of ``loss_fn(*args)`` (slope-based).

    loss_fn must return a scalar.  The gradient of args[chain] is chained
    into the next iteration's input; pass ``chain_argnum`` to select a small
    operand (defaults to argnums[0]).
    """
    args = list(args)
    chain = argnums[0] if chain_argnum is None else chain_argnum
    vg = jax.value_and_grad(loss_fn, argnums=argnums)

    @jax.jit
    def loop(*args_and_n):
        *args_, n = args_and_n

        def body(i, carry):
            a0, acc = carry
            cur = list(args_)
            cur[chain] = a0
            loss, grads = vg(*cur)
            # consume EVERY gradient so no backward branch is dead code
            s = sum(jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree.leaves(grads)) + loss
            a0 = _tree_nudge(a0, s)
            return (a0, acc + loss)

        a0, acc = jax.lax.fori_loop(0, n, body, (args_[chain], jnp.float32(0)))
        return acc

    lo, hi = iters, iters * 3
    t_lo = _run_loop(loop, args, lo)
    t_hi = _run_loop(loop, args, hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def time_fn(fn: Callable, args: Sequence, *, iters: int = 50,
            chain_argnum: int = 0) -> float:
    """Seconds per forward of fn(*args), slope-based, chained through
    args[chain_argnum] (choose a small operand for memory-bound ops)."""
    @jax.jit
    def loop(*args_and_n):
        *args_, n = args_and_n

        def body(i, carry):
            a0, acc = carry
            cur = list(args_)
            cur[chain_argnum] = a0
            out = fn(*cur)
            s = sum(jnp.sum(o.astype(jnp.float32))
                    for o in jax.tree.leaves(out))
            a0 = _tree_nudge(a0, s)
            return (a0, acc + s)

        return jax.lax.fori_loop(0, n, body,
                                 (args_[chain_argnum], jnp.float32(0)))[1]

    lo, hi = iters, iters * 3
    t_lo = _run_loop(loop, args, lo)
    t_hi = _run_loop(loop, args, hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)
