"""Fused Monarch multiply as a single Pallas TPU kernel, with custom VJP.

TPU-native replacement for the reference's fused Triton kernels
(reference src/ops/triton.py:197-310 forward, :37-187 backward): one kernel
performs both block-diagonal matmuls and the interleaving permutation with
the intermediate kept VMEM-resident -- it never round-trips to HBM.  The op
is strongly memory-bound for adapter ranks (arithmetic intensity ~ blk_r),
so the design goal is to read ``x`` once and write ``out`` once per pass.

Design: Mosaic cannot relayout the lane (minor) dimension inside a kernel
(splitting (ts, K*Q) -> (ts, R, L) is an unsupported shape cast), so instead
of performing the butterfly interleave as a data movement we *absorb the
permutations into the weights*: outside the kernel, XLA expands the factors
into two small dense matrices

  W1bd  (n,  K*Q)  block-diagonal layout of w1  (zeros off-block)
  W2hat (K*Q, m)   w2 scattered onto the interleaved index map
                   W2hat[r*L + l, s*L + l] = w2[l, s, r]

and the kernel is then two back-to-back MXU matmuls with no relayout at
all: ``out = (x @ W1bd) @ W2hat``.  The expansion costs K*L more MAC's on
the tiny inner dimension (K*Q instead of Q per stage), which for adapter
configs (K*Q <= a few hundred) is far below the HBM-bandwidth roofline --
and it *raises* MXU utilisation because the contraction dim grows from
blk_r (4-16) to nblocks*blk_r.  Construction/extraction of the expanded
weights is O(n * K*Q) elementwise XLA work, negligible next to the op.

Key TPU-vs-GPU differences:
  * Grid iterations on a TensorCore are sequential, so the backward's
    dW1bd/dW2hat reductions over sequence tiles accumulate into fp32 VMEM
    scratch across grid steps -- no atomics (the Triton kernel needed
    ``atomic_add``, src/ops/triton.py:149-187).
  * ``out1`` is recomputed in the backward from ``x`` (one extra small
    matmul) instead of being saved, so the only residuals are (x, w1, w2):
    activation memory matches the Triton kernel's saving claim
    (README.md:11).
  * fp32 accumulation on the MXU via preferred_element_type; bf16 inputs.

Supported shapes: any (K, Q, P), (L, S, R) with K*P == n, L*R == K*Q, as
long as the expanded weights fit VMEM (see ``monarch_kernel_supported``).
Shapes that fail the check fall back to the jnp path in ops/monarch.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply

Array = jax.Array

# Per-device-generation VMEM budgets, bytes: (weight budget for expanded
# factors + fp32 grad scratch, per-grid-step tile budget incl. Pallas
# double-buffering).  Tuned/validated on v5e (~16 MB/core VMEM); other
# generations must be measured before use -- mis-tiled kernels fail with
# opaque Mosaic errors or run slow, so unknown parts refuse loudly instead
# (VERDICT r2 #10).
_TUNED_VMEM_BUDGETS = {
    "TPU v5 lite": (6 * 1024 * 1024, 12 * 1024 * 1024),
    "TPU v5e": (6 * 1024 * 1024, 12 * 1024 * 1024),
}
# CPU / interpret mode: tiling only affects performance semantics, not
# correctness; use the v5e numbers.
_DEFAULT_VMEM_BUDGETS = (6 * 1024 * 1024, 12 * 1024 * 1024)


@functools.lru_cache(maxsize=1)
def _vmem_budgets_or_none():
    """Budgets for this device kind, or None when untuned.  ``*_supported``
    gates treat None as unsupported so every auto-dispatch path falls back
    to XLA on TPU generations we have not measured; only an EXPLICIT kernel
    opt-in refuses loudly (``_vmem_budgets``)."""
    if jax.default_backend() != "tpu":
        return _DEFAULT_VMEM_BUDGETS
    kind = jax.devices()[0].device_kind
    for prefix, budgets in _TUNED_VMEM_BUDGETS.items():
        if kind.startswith(prefix):
            return budgets
    return None


def _vmem_budgets() -> tuple:
    budgets = _vmem_budgets_or_none()
    if budgets is not None:
        return budgets
    raise NotImplementedError(
        f"Pallas monarch kernels have VMEM budgets tuned only for "
        f"{sorted(_TUNED_VMEM_BUDGETS)}; this runtime reports device_kind="
        f"{jax.devices()[0].device_kind!r}.  Measure this part's VMEM "
        f"capacity and add an entry to "
        f"kernels/monarch_pallas._TUNED_VMEM_BUDGETS (or use the XLA path, "
        f"impl='xla', which needs no tuning).")


def _expanded_bytes(n: int, m: int, kq: int, itemsize: int) -> int:
    return (n * kq + kq * m) * (itemsize + 4)  # weights + fp32 scratch


def monarch_kernel_supported(n_features: int, w1_shape, w2_shape, itemsize: int = 2) -> bool:
    k, q, p = w1_shape
    l, s, r = w2_shape
    if k * p != n_features or l * r != k * q:
        return False
    budgets = _vmem_budgets_or_none()
    if budgets is None:  # untuned TPU generation: auto paths use XLA
        return False
    return _expanded_bytes(n_features, s * l, k * q, itemsize) <= budgets[0]


def expand_monarch_factors(w1: Array, w2: Array):
    """Expand block-diagonal factors into the permuted-dense pair (W1bd, W2hat).

    W1bd[k*P + p, k*Q + q] = w1[k, q, p]; W2hat[r*L + l, s*L + l] = w2[l, s, r].
    ``monarch(x) == (x @ W1bd) @ W2hat`` exactly.
    """
    K, Q, P = w1.shape
    L, S, R = w2.shape
    eye_k = jnp.eye(K, dtype=w1.dtype)
    # (K, P, K, Q): block k on the diagonal, transposed to input-major
    w1bd = jnp.einsum("kc,kqp->kpcq", eye_k, w1).reshape(K * P, K * Q)
    eye_l = jnp.eye(L, dtype=w2.dtype)
    # (R, L, S, L): delta over the two L axes carries the interleave
    w2hat = jnp.einsum("lsr,lc->rlsc", w2, eye_l).reshape(R * L, S * L)
    return w1bd, w2hat


def _extract_dw(dW1bd: Array, dW2hat: Array, w1_shape, w2_shape):
    """Gather the block-diagonal/interleaved entries back out of the dense
    gradient accumulators (off-pattern entries are structural zeros of the
    parameterisation and are discarded)."""
    K, Q, P = w1_shape
    L, S, R = w2_shape
    d1 = dW1bd.reshape(K, P, K, Q)
    idx = jnp.arange(K)
    dw1 = d1[idx, :, idx, :].transpose(0, 2, 1)  # (K, P, Q) -> (K, Q, P)
    d2 = dW2hat.reshape(R, L, S, L)
    idx_l = jnp.arange(L)
    dw2 = d2[:, idx_l, :, idx_l]  # (L, R, S)
    return dw1, dw2.transpose(0, 2, 1)


def _pick_seq_tile(per_row_bytes: int, fixed_bytes: int = 0) -> int:
    """Sequence tile size: Pallas double-buffers every blocked operand, so
    the per-row budget is charged twice; fixed_bytes covers whole-array
    operands (expanded weights + fp32 grad scratch)."""
    budget = _vmem_budgets()[1] - fixed_bytes
    ts = budget // max(2 * per_row_bytes, 1)
    ts = (ts // 64) * 64
    return int(max(64, min(1024, ts)))


def _fwd_kernel(x_ref, w1bd_ref, w2hat_ref, out_ref):
    out1 = jnp.dot(x_ref[...], w1bd_ref[...], preferred_element_type=jnp.float32)
    out1 = out1.astype(x_ref.dtype)  # bf16 intermediate, fp32 MXU accum
    out_ref[...] = jnp.dot(out1, w2hat_ref[...], preferred_element_type=jnp.float32
                           ).astype(out_ref.dtype)


def _fwd_add_kernel(x_ref, base_ref, w1bd_ref, w2hat_ref, out_ref):
    """Adapter epilogue fused with the residual add: out = base + monarch(x)
    (saves one full HBM pass over the layer output in the hybrid layout)."""
    out1 = jnp.dot(x_ref[...], w1bd_ref[...], preferred_element_type=jnp.float32)
    out1 = out1.astype(x_ref.dtype)
    mon = jnp.dot(out1, w2hat_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = (base_ref[...].astype(jnp.float32) + mon).astype(out_ref.dtype)


def _bwd_kernel(x_ref, w1bd_ref, w2hat_ref, dout_ref, seqlen_ref,
                dx_ref, dw1bd_ref, dw2hat_ref):
    i = pl.program_id(0)
    ts = x_ref.shape[0]

    # accumulate straight into the fp32 output refs (they revisit the same
    # block every grid step, staying VMEM-resident) -- no extra scratch
    @pl.when(i == 0)
    def _init():
        dw1bd_ref[...] = jnp.zeros(dw1bd_ref.shape, dw1bd_ref.dtype)
        dw2hat_ref[...] = jnp.zeros(dw2hat_ref.shape, dw2hat_ref.dtype)

    # Mask rows beyond the true batch (the last tile may be padded); without
    # this the dw accumulators would sum garbage rows.
    valid = seqlen_ref[0] - i * ts
    rmask = jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0) < valid
    x = jnp.where(rmask, x_ref[...], 0)
    dout = jnp.where(rmask, dout_ref[...], 0)

    # Recompute the small intermediate rather than saving it.
    out1 = jnp.dot(x, w1bd_ref[...], preferred_element_type=jnp.float32
                   ).astype(x.dtype)
    # dW2hat += out1^T @ dout
    dw2hat_ref[...] += jax.lax.dot_general(
        out1, dout, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dout1 = dout @ W2hat^T
    dout1 = jax.lax.dot_general(
        dout, w2hat_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dx = dout1 @ W1bd^T
    dx_ref[...] = jax.lax.dot_general(
        dout1, w1bd_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    # dW1bd += x^T @ dout1
    dw1bd_ref[...] += jax.lax.dot_general(
        x, dout1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _monarch_pallas_fwd_call(x2d: Array, w1bd: Array, w2hat: Array, interpret: bool,
                             base2d: Array | None = None) -> Array:
    b, n = x2d.shape
    kq = w1bd.shape[1]
    m = w2hat.shape[1]
    itemsize = x2d.dtype.itemsize
    fixed = (n * kq + kq * m) * itemsize
    per_row = (n + m + (m if base2d is not None else 0)) * itemsize
    ts = _pick_seq_tile(per_row, fixed)
    grid = (pl.cdiv(b, ts),)
    in_specs = [pl.BlockSpec((ts, n), lambda i: (i, 0))]
    args = [x2d]
    kernel = _fwd_kernel
    if base2d is not None:
        in_specs.append(pl.BlockSpec((ts, m), lambda i: (i, 0)))
        args.append(base2d)
        kernel = _fwd_add_kernel
    in_specs += [
        pl.BlockSpec((n, kq), lambda i: (0, 0)),
        pl.BlockSpec((kq, m), lambda i: (0, 0)),
    ]
    args += [w1bd, w2hat]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ts, m), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * kq * (n + m),
            bytes_accessed=(b * n + b * m + n * kq + kq * m) * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _monarch_pallas_bwd_call(x2d, w1bd, w2hat, dout2d, interpret):
    b, n = x2d.shape
    kq = w1bd.shape[1]
    m = w2hat.shape[1]
    itemsize = x2d.dtype.itemsize
    # fixed residents (x2 for pipelining): bf16 weights + fp32 grad outputs
    fixed = (n * kq + kq * m) * 2 * (itemsize + 4)
    ts = _pick_seq_tile((2 * n + 2 * m) * itemsize, fixed)
    grid = (pl.cdiv(b, ts),)
    seqlen = jnp.array([b], dtype=jnp.int32)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, n), lambda i: (i, 0)),
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
            pl.BlockSpec((ts, m), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((ts, n), lambda i: (i, 0)),
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), x2d.dtype),
            jax.ShapeDtypeStruct((n, kq), jnp.float32),
            jax.ShapeDtypeStruct((kq, m), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, w1bd, w2hat, dout2d, seqlen)


@functools.lru_cache(maxsize=2)
def _monarch_kernel_vjp(interpret: bool):
    @jax.custom_vjp
    def mk(x, w1, w2):
        *batch, n = x.shape
        w1bd, w2hat = expand_monarch_factors(w1, w2)
        out = _monarch_pallas_fwd_call(x.reshape(-1, n), w1bd, w2hat, interpret)
        return out.reshape(*batch, out.shape[-1])

    def mk_fwd(x, w1, w2):
        return mk(x, w1, w2), (x, w1, w2)

    def mk_bwd(res, dout):
        x, w1, w2 = res
        *batch, n = x.shape
        m = dout.shape[-1]
        w1bd, w2hat = expand_monarch_factors(w1, w2)
        dx, dw1bd, dw2hat = _monarch_pallas_bwd_call(
            x.reshape(-1, n), w1bd, w2hat, dout.reshape(-1, m), interpret
        )
        dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1.shape, w2.shape)
        return dx.reshape(x.shape), dw1.astype(w1.dtype), dw2.astype(w2.dtype)

    mk.defvjp(mk_fwd, mk_bwd)
    return mk


@functools.lru_cache(maxsize=2)
def _monarch_add_vjp(interpret: bool):
    """base + monarch(x) with the add fused into the forward kernel.
    Backward: d_base = dout (no extra kernel); dx/dw via the monarch bwd."""

    @jax.custom_vjp
    def mk(base, x, w1, w2):
        *batch, n = x.shape
        w1bd, w2hat = expand_monarch_factors(w1, w2)
        out = _monarch_pallas_fwd_call(
            x.reshape(-1, n), w1bd, w2hat, interpret,
            base2d=base.reshape(-1, base.shape[-1]))
        return out.reshape(base.shape)

    def mk_fwd(base, x, w1, w2):
        return mk(base, x, w1, w2), (x, w1, w2)

    def mk_bwd(res, dout):
        x, w1, w2 = res
        *batch, n = x.shape
        m = dout.shape[-1]
        w1bd, w2hat = expand_monarch_factors(w1, w2)
        dx, dw1bd, dw2hat = _monarch_pallas_bwd_call(
            x.reshape(-1, n), w1bd, w2hat, dout.reshape(-1, m), interpret
        )
        dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1.shape, w2.shape)
        return dout, dx.reshape(x.shape), dw1.astype(w1.dtype), dw2.astype(w2.dtype)

    mk.defvjp(mk_fwd, mk_bwd)
    return mk


def monarch_add(base: Array, x: Array, w1: Array, w2: Array,
                interpret: bool = False) -> Array:
    """Fused ``base + monarch(x)`` (the hybrid MonarchLinear hot path)."""
    return _monarch_add_vjp(bool(interpret))(base, x, w1, w2)


def monarch_kernel(x: Array, w1: Array, w2: Array, interpret: bool = False) -> Array:
    """Fused Monarch multiply ``out = x @ Monarch(w1, w2)^T`` as one Pallas kernel.

    Same semantics as ``ops.monarch.blockdiag_butterfly_multiply``; callers
    should check ``monarch_kernel_supported`` and fall back to the jnp path
    for shapes whose expanded weights exceed the VMEM budget.

    Args:
      x: (..., n) bf16/f32 input.
      w1: (K, Q, P); w2: (L, S, R).
      interpret: run in Pallas interpreter mode (CPU testing).
    """
    return _monarch_kernel_vjp(bool(interpret))(x, w1, w2)


def _dw_only_kernel(x_ref, dout_ref, w1bd_ref, w2hat_ref, seqlen_ref,
                    dw1bd_ref, dw2hat_ref):
    """One-read factor-gradient pass: per sequence tile, read x and dout
    ONCE and accumulate both dense grads in fp32 VMEM across sequential
    grid steps (the TPU answer to the Triton backward's atomic_add
    reduction, reference src/ops/triton.py:149-187).  No dx output -- in
    merged training dx flows through the merged dense operand, so writing
    dx here would waste a full HBM pass over a (B, n) array."""
    i = pl.program_id(0)
    ts = x_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        dw1bd_ref[...] = jnp.zeros(dw1bd_ref.shape, dw1bd_ref.dtype)
        dw2hat_ref[...] = jnp.zeros(dw2hat_ref.shape, dw2hat_ref.dtype)

    valid = seqlen_ref[0] - i * ts
    rmask = jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0) < valid
    x = jnp.where(rmask, x_ref[...], 0)
    dout = jnp.where(rmask, dout_ref[...], 0)

    # recompute the small intermediate (one extra skinny matmul) instead of
    # saving it -- residuals stay (x, dout) only
    out1 = jnp.dot(x, w1bd_ref[...], preferred_element_type=jnp.float32
                   ).astype(x.dtype)
    dw2hat_ref[...] += jax.lax.dot_general(
        out1, dout, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dout1 = jax.lax.dot_general(
        dout, w2hat_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    dw1bd_ref[...] += jax.lax.dot_general(
        x, dout1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def monarch_dw_fused_supported(n: int, m: int, w1_shape, w2_shape,
                               itemsize: int = 2) -> bool:
    """Auto-dispatch feasibility of the fused dw kernel: expanded bf16
    weights + fp32 grad accumulators must fit the resident budget, and the
    feature dims must be lane-aligned production shapes (Mosaic needs
    128-multiple lane dims; below ~512 features the op is too small for
    the kernel to matter and tiny-lane tiles are the territory where
    interpret mode and real Mosaic diverge).  Direct calls with
    interpret=True (tests) bypass this gate."""
    k, q, p = w1_shape
    l, s, r = w2_shape
    if k * p != n or l * r != k * q or s * l != m:
        return False
    if n % 128 or m % 128 or n < 512 or m < 512:
        return False
    budgets = _vmem_budgets_or_none()
    if budgets is None:
        return False
    return _expanded_bytes(n, m, k * q, itemsize) <= budgets[0]


def monarch_dw_fused(x2d: Array, dout2d: Array, w1: Array, w2: Array,
                     interpret: bool = False):
    """Fused one-read factor gradients: (dw1, dw2) from (x, dout) in ONE
    Pallas pass (~44 MB of traffic at the 7B projection shape vs the XLA
    block path's relayout copies).  Production alternative to
    ``ops.monarch.monarch_dw`` for the merged-training backward, selected
    by ``kernels.runtime_gate.use_fused_dw()`` -- on runtimes where Pallas
    custom calls inside jitted scans pay a layout/scheduling penalty
    (this sandbox's tunnel runtime: ~175 us/call) the XLA path wins and
    the gate keeps it."""
    b, n = x2d.shape
    m = dout2d.shape[1]
    w1bd, w2hat = expand_monarch_factors(w1, w2)
    itemsize = x2d.dtype.itemsize
    kq = w1bd.shape[1]
    fixed = (n * kq + kq * m) * (itemsize + 4)
    ts = _pick_seq_tile((n + m) * itemsize, fixed)
    grid = (pl.cdiv(b, ts),)
    seqlen = jnp.array([b], dtype=jnp.int32)
    dw1bd, dw2hat = pl.pallas_call(
        _dw_only_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, n), lambda i: (i, 0)),
            pl.BlockSpec((ts, m), lambda i: (i, 0)),
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, kq), jnp.float32),
            jax.ShapeDtypeStruct((kq, m), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * kq * (2 * n + 2 * m),
            bytes_accessed=(b * n + b * m) * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, dout2d, w1bd, w2hat, seqlen)
    dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1.shape, w2.shape)
    return dw1.astype(w1.dtype), dw2.astype(w2.dtype)


def monarch_mm(x: Array, w1: Array, w2: Array, impl: str = "auto") -> Array:
    """Dispatch between the fused Pallas kernel and the jnp/XLA path.

    impl: "auto" (pallas on TPU when shapes supported), "pallas",
    "pallas_interpret", or "xla".
    """
    if impl == "xla":
        return blockdiag_butterfly_multiply(x, w1, w2)
    supported = monarch_kernel_supported(
        x.shape[-1], w1.shape, w2.shape, x.dtype.itemsize)
    if impl == "pallas":
        assert supported, "unsupported shapes for the Pallas kernel"
        return monarch_kernel(x, w1, w2)
    if impl == "pallas_interpret":
        assert supported
        return monarch_kernel(x, w1, w2, interpret=True)
    # auto: ALWAYS the XLA path.  Under honest (slope-based, fixed-dispatch-
    # cancelling) timing, XLA's "unfused" op runs at ~78% of the HBM
    # roofline at every shape tried and the expanded-weight kernel never
    # beats it (its K-fold FLOP expansion hits the MXU wall as blk_r grows;
    # see docs/BENCHMARKS.md "What we learned re-measuring round 1").  The
    # round-1 crossover was an artifact of ~24 ms/dispatch noise.  The
    # Pallas kernel remains opt-in (impl="pallas") and the fused-add /
    # merged-training layer paths are where real wins live.
    return blockdiag_butterfly_multiply(x, w1, w2)
