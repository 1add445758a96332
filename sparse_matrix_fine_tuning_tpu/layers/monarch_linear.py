"""MonarchLinear: the MoRe adapter layer (flax NNX).

Reimplements the reference's adapter module (src/layers/monarch_linear.py:88-381)
TPU-first:

  * Parameters: ``blkdiag1 (nblocks, blk_r, in_blksz)`` and
    ``blkdiag2 (nblocks, out_blksz, blk_r)``; adapter forward is
    ``y = x @ dense^T + monarch(x)`` with the frozen dense path.
  * Trainability is expressed through the variable type: adapter
    parameters are ``AdapterParam`` (an ``nnx.Param`` subclass) while the
    frozen dense weight / bias are plain ``nnx.Param`` -- optimizers filter
    on the type instead of mutating ``requires_grad`` flags
    (reference: train_utils.py:475-510 freezing walk).
  * Merge/unmerge are explicit methods (``merge_adapter`` /
    ``unmerge_adapter``) rather than ``train()``-flip side effects
    (reference monarch_linear.py:255-276), which also avoids the
    reference's re-merge-after-reload pitfall (qlora_monarch.py:828-833).
  * The monarch matmul runs the XLA path by default -- measured
    near-roofline; the standalone Pallas kernel (``impl="pallas"``) is
    OPT-IN only and never auto-selected (docs/BENCHMARKS.md; the
    reference's use_triton switch, monarch_linear.py:117).  The production
    wins live in merge-during-training (``enable_merged_training``) and
    the fused base+adapter add (``monarch_add``), both auto-selected.

Init parity (monarch_linear.py:199-224): per-block Kaiming-uniform with
bound 1/sqrt(block_fan_in) on blkdiag1; blkdiag2 is ZERO-initialised in
plain adapter mode (LoRA-style: the adapter starts as the identity map)
and Kaiming-initialised only when a scaler provides the zero gate or in
projection mode.

Orientation note: the reference projects ``w.T`` in
``set_weights_from_dense_init`` (monarch_linear.py:243), making the monarch
path approximate ``x @ w`` instead of the layer's ``x @ w^T`` (benign only
for square symmetric weights).  We project ``w`` directly so the adapter
approximates the actual linear map.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import monarch_mm
from sparse_matrix_fine_tuning_tpu.ops.blockdiag import blockdiag_multiply
from sparse_matrix_fine_tuning_tpu.ops.monarch import monarch_dense_equivalent
from sparse_matrix_fine_tuning_tpu.ops.projection import (
    blockdiag_butterfly_project_einsum_rank,
)

Array = jax.Array

# Reference defaults: src/layers/monarch_linear.py:79-85 plus the extended
# config surface read via peft_config.get(...) throughout __init__.
DEFAULT_PEFT_CONFIG: dict[str, Any] = {
    "nblocks": 4,
    "blk_r": 4,
    "blk_sz": None,
    "square": False,
    "adapter": True,
    "svd_init": False,
    "scaler": False,
    "scaler_type": "scaler",
    "layernorm": False,
    "affine": False,
    "lora_style_init": False,
    "use_mult_factor": False,
    "dropout": 0.0,
    # Compat: reproduce the reference's projection orientation bit-for-bit.
    # The reference's set_weights_from_dense_init projects ``w.T``
    # (reference monarch_linear.py:243), making the monarch path approximate
    # ``x @ w`` instead of the layer's ``x @ w^T`` (benign only for square
    # symmetric weights).  Default False = corrected orientation; set True to
    # reproduce reference-tuned projection/svd_init recipes exactly
    # (square layers only -- the reference path itself shape-errors on
    # rectangular weights, its shape assert is commented out).
    "reference_orientation": False,
}


class MergedCache(nnx.Variable):
    """Per-step cache of the merged dense+adapter operand (kernels/merged.py).
    Not an ``nnx.Param``: never trained, never checkpointed, refreshed by the
    trainer at the top of every optimizer step."""


class AdapterParam(nnx.Param):
    """Trainable adapter parameter.  Optimizers/surgery filter on this type;
    everything that is a plain ``nnx.Param`` stays frozen during PEFT."""


def _kaiming_block_uniform(key, shape, dtype):
    """Per-block Kaiming uniform: bound = 1/sqrt(fan_in of one block's row)
    -- gain(leaky_relu, sqrt(5)) * sqrt(3) cancels to exactly 1
    (reference monarch_linear.py:213-224)."""
    fan_in = shape[-1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class Scaler(nnx.Module):
    """Scale (scalar or per-feature) + LayerNorm gate on the adapter branch
    (reference monarch_linear.py:47-76; the reference's Scaler always
    applies LayerNorm regardless of the ``layernorm`` flag)."""

    def __init__(self, out_features: int, scaler_type: str = "scaler",
                 affine: bool = False, *, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        assert scaler_type in ("scaler", "diag")
        self.scaler_type = scaler_type
        shape = (1,) if scaler_type == "scaler" else (out_features,)
        self.scaler = AdapterParam(jnp.zeros(shape, param_dtype))
        self.norm = nnx.LayerNorm(
            out_features, epsilon=1e-5, use_bias=affine, use_scale=affine,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        if affine:
            # affine LN params train with the adapter
            self.norm.scale = AdapterParam(self.norm.scale[...])
            self.norm.bias = AdapterParam(self.norm.bias[...])

    def __call__(self, x: Array) -> Array:
        return self.norm(x * self.scaler[...].astype(x.dtype))


class MonarchLinear(nnx.Module):
    """Monarch (MoRe) adapter / structured linear layer."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        peft_config: Optional[dict] = None,
        weights: Optional[Array] = None,
        bias: Optional[Array] = None,
        use_bias: bool = False,
        nblocks: Optional[int] = None,
        blk_r: Optional[int] = None,
        blk_sz: Optional[int] = None,
        as_adapter: Optional[bool] = None,
        project_rank: int = 1,
        dtype=None,
        param_dtype=jnp.float32,
        impl: str = "auto",
        rngs: nnx.Rngs,
    ):
        """
        Args:
          peft_config: reference-compatible config dict (keys as in
            task_configs/*/peft_config.json).  Explicit kwargs override it.
          weights: dense (out_features, in_features) weight.  In adapter
            mode it becomes the frozen base; otherwise it is SVD-projected
            onto the factors (and with ``svd_init`` the residual is kept as
            the frozen dense part, reference monarch_linear.py:249-253).
          bias: optional dense bias (frozen).
          use_bias: create a zero-init bias when ``bias`` is None.
          project_rank: SVD rank for dense->Monarch projection.
        """
        cfg = dict(DEFAULT_PEFT_CONFIG)
        if peft_config:
            cfg.update({k: v for k, v in peft_config.items() if v is not None})
        self.in_features = in_features
        self.out_features = out_features
        self.dtype = dtype
        self.param_dtype = param_dtype
        self.impl = impl

        # --- shape resolution (reference monarch_linear.py:119-137) ---
        self.nblocks = nblocks if nblocks is not None else cfg["nblocks"]
        self.blk_r = blk_r if blk_r is not None else cfg["blk_r"]
        self.blk_sz = blk_sz if blk_sz is not None else cfg["blk_sz"]
        if self.blk_sz is None:
            self.blk_sz = int(math.ceil(in_features / self.nblocks))
        self.in_blksz = self.blk_sz
        if cfg["square"]:
            self.blk_r = self.in_blksz
        # drop fully-padded blocks / extend to cover the input
        self.nblocks = (in_features + self.in_blksz - 1) // self.in_blksz
        align = out_features / in_features
        self.out_blksz = int(math.ceil(self.in_blksz * align))

        self.as_adapter = cfg["adapter"] if as_adapter is None else as_adapter
        self.svd_init = cfg["svd_init"]
        self.reference_orientation = cfg.get("reference_orientation", False)
        self.lora_style_init = cfg["lora_style_init"]
        self.use_mult_factor = cfg["use_mult_factor"]
        use_scaler = cfg["scaler"] or self.use_mult_factor
        self.merged = False

        # --- factor init ---
        k1, k2, kb = jax.random.split(rngs.params(), 3)
        if self.lora_style_init:
            bd1 = jnp.zeros((self.nblocks, self.blk_r, self.in_blksz), param_dtype)
            bd2 = jnp.zeros((self.nblocks, self.out_blksz, self.blk_r), param_dtype)
        else:
            bd1 = _kaiming_block_uniform(
                k1, (self.nblocks, self.blk_r, self.in_blksz), param_dtype)
            if use_scaler or not self.as_adapter:
                bd2 = _kaiming_block_uniform(
                    k2, (self.nblocks, self.out_blksz, self.blk_r), param_dtype)
            else:
                # plain adapter: second factor zero => adapter starts as identity
                bd2 = jnp.zeros((self.nblocks, self.out_blksz, self.blk_r), param_dtype)

        if self.use_mult_factor:
            # M_mult multiplies the dense OUTPUT (x @ W @ M_mult, reference
            # monarch_linear.py:168-174), so its block algebra only closes
            # for square unpadded layers; validate here instead of crashing
            # with an opaque reshape error at the first forward
            if (self.nblocks * self.in_blksz != self.out_features
                    or self.in_blksz != self.out_blksz):
                raise ValueError(
                    "use_mult_factor requires a square layer with "
                    "out_features == nblocks * blk_sz (the factor is applied "
                    f"to the dense output); got in={in_features}, "
                    f"out={out_features}, nblocks={self.nblocks}, "
                    f"blk_sz=({self.in_blksz},{self.out_blksz})")
            eye = jnp.eye(self.out_blksz, self.in_blksz, dtype=param_dtype)
            self.blkdiag_mult = AdapterParam(
                jnp.tile(eye[None], (self.nblocks, 1, 1)))

        # --- dense base / projection ---
        dense_w = None
        if weights is not None:
            # keep the frozen base in ITS OWN storage dtype (a bf16 7B base
            # must not silently upcast to f32 -- that doubles HBM)
            w = jnp.asarray(weights)
            assert w.shape == (out_features, in_features), w.shape
            if self.as_adapter and not self.svd_init:
                dense_w = w  # frozen base
            else:
                bd1, bd2, dense_w = self._projected_values(
                    w.astype(jnp.float32), project_rank)

        self.blkdiag1 = AdapterParam(bd1)
        self.blkdiag2 = AdapterParam(bd2)
        self.dense = nnx.data(nnx.Param(dense_w) if dense_w is not None else None)
        # merged-training cache (kernels/merged.py); None until the trainer
        # enables it via enable_merged_training()
        self.wm_cache = nnx.data(None)
        self.wm_t_cache = nnx.data(None)
        self.quant_bits = 0  # set by quant.quantize_frozen_base
        self.quant_group = 0
        self.dense_scales = nnx.data(None)

        if bias is not None:
            self.bias = nnx.Param(jnp.asarray(bias))
        elif use_bias:
            bound = 1.0 / math.sqrt(out_features)
            self.bias = nnx.Param(jax.random.uniform(
                kb, (out_features,), param_dtype, minval=-bound, maxval=bound))
        else:
            self.bias = None

        # --- extras on the adapter branch ---
        dropout_rate = float(cfg.get("dropout") or 0.0)
        self.dropout = nnx.Dropout(rate=dropout_rate, deterministic=True, rngs=rngs) if dropout_rate > 0 else None
        if use_scaler:
            if self.lora_style_init:
                raise ValueError("LoRA-style init already zeroes the adapter; no scaler needed")
            self.scaler = Scaler(
                out_features, cfg["scaler_type"], cfg["affine"],
                dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        else:
            self.scaler = None

    # ------------------------------------------------------------------
    def _projected_values(self, w: Array, rank: int):
        """SVD-project dense w onto the factors; with svd_init also return
        the residual to keep as the frozen dense part (reference
        monarch_linear.py:235-253, orientation corrected -- see module
        docstring).  Returns (bd1, bd2, dense_residual_or_None)."""
        if self.reference_orientation:
            return self._projected_values_reference(w, rank)
        pad_out = self.nblocks * self.out_blksz - self.out_features
        pad_in = self.nblocks * self.in_blksz - self.in_features
        w_p = jnp.pad(w, ((0, pad_out), (0, pad_in)))
        bd1, bd2 = blockdiag_butterfly_project_einsum_rank(
            w_p, self.nblocks, self.nblocks, rank)
        bd1 = bd1.astype(self.param_dtype)
        bd2 = bd2.astype(self.param_dtype)
        dense_w = None
        if self.svd_init:
            approx = monarch_dense_equivalent(bd1, bd2)
            approx = approx[: self.out_features, : self.in_features]
            dense_w = (w - approx).astype(self.param_dtype)
        return bd1, bd2, dense_w

    def _projected_values_reference(self, w: Array, rank: int):
        """Compat path: the reference's exact projection semantics
        (reference monarch_linear.py:243-253) -- project ``w.T``, no
        padding, and with svd_init the residual ``w - monarch(I, bd1, bd2)``
        in the same mixed orientation.  Square layers only: the monarch path
        then maps a (.., out)-dim input to (.., in), which only typechecks
        when in_features == out_features (as in every reference projection
        recipe; the reference errors identically otherwise)."""
        from sparse_matrix_fine_tuning_tpu.ops.monarch import (
            blockdiag_butterfly_multiply,
        )
        if self.in_features != self.out_features:
            raise ValueError(
                "reference_orientation projection requires a square layer "
                f"(got {self.in_features} -> {self.out_features}); the "
                "reference's own w.T projection shape-errors on rectangular "
                "weights")
        if (self.nblocks * self.in_blksz != self.in_features
                or self.nblocks * self.out_blksz != self.out_features):
            raise ValueError(
                "reference_orientation projection requires block sizes that "
                "divide the features exactly (the reference does not pad)")
        bd1, bd2 = blockdiag_butterfly_project_einsum_rank(
            w.T, self.nblocks, self.nblocks, rank)
        bd1 = bd1.astype(self.param_dtype)
        bd2 = bd2.astype(self.param_dtype)
        dense_w = None
        if self.svd_init:
            eye = jnp.eye(self.in_features, dtype=w.dtype)
            approx = blockdiag_butterfly_multiply(eye, bd1.astype(w.dtype),
                                                  bd2.astype(w.dtype))
            dense_w = (w - approx).astype(self.param_dtype)
        return bd1, bd2, dense_w

    # ------------------------------------------------------------------
    def _preprocess(self, x: Array) -> Array:
        """Zero-pad the features up to nblocks*in_blksz
        (reference structured_linear.py:55-59)."""
        pad = self.nblocks * self.in_blksz - x.shape[-1]
        if pad > 0:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    def _postprocess(self, out: Array) -> Array:
        """Truncate features down to out_features
        (reference structured_linear.py:61-65)."""
        if out.shape[-1] > self.out_features:
            out = out[..., : self.out_features]
        return out

    def monarch_forward(self, x: Array, *, deterministic=None) -> Array:
        w1 = self.blkdiag1[...]
        w2 = self.blkdiag2[...]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w1 = w1.astype(self.dtype)
            w2 = w2.astype(self.dtype)
        else:
            w1 = w1.astype(x.dtype)
            w2 = w2.astype(x.dtype)
        out = monarch_mm(self._preprocess(x), w1, w2, impl=self.impl)
        out = self._postprocess(out)
        if self.dropout is not None:
            out = self.dropout(out, deterministic=deterministic)
        if self.scaler is not None:
            out = self.scaler(out)
        return out

    def _apply_mult(self, out: Array) -> Array:
        """x @ W @ M_mult: the multiplicative block-diagonal factor on the
        dense output (reference monarch_linear.py:284-285) -- ONE shared
        tail for every _dense_forward quant path."""
        if self.use_mult_factor:
            out = blockdiag_multiply(
                out, self.blkdiag_mult[...].astype(out.dtype))
        return out

    def _dense_forward(self, x: Array) -> Array:
        w = self.dense[...]
        compute = self.dtype if self.dtype is not None else x.dtype
        qbits = getattr(self, "quant_bits", 0)
        dims = lambda a: (((a.ndim - 1,), (1,)), ((), ()))
        if qbits == 4:
            # In-major packed-halves layout (quant/): w is packed_t
            # (in/2, out) uint8, scales (in/group, out).  On TPU the fused
            # Pallas kernel dequantizes in VMEM (HBM reads = packed bytes
            # only); elsewhere a split-dot y = x_lo @ W_lo + x_hi @ W_hi
            # whose dequant XLA materializes (still correct, ~5x the
            # kernel's traffic -- kernels/quant_matmul.py).
            from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import (
                int4_matmul, int4_matmul_supported)
            from sparse_matrix_fine_tuning_tpu.quant import (
                dequantize_int4_halves)
            scales = self.dense_scales[...]
            h, _ = w.shape
            g = self.quant_group
            xq = x.astype(compute)
            if (jax.default_backend() == "tpu"
                    and int4_matmul_supported(x.shape, w.shape, g,
                                              xq.dtype.itemsize)):
                out = int4_matmul(xq, w, scales, g).astype(x.dtype)
            else:
                def half_dot(xh, wd):  # wd (h, out) dequantized
                    return jax.lax.dot_general(
                        xh, wd,
                        dimension_numbers=(((xh.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                lo, hi = dequantize_int4_halves(w, scales, g, compute)
                out = (half_dot(xq[..., :h], lo) + half_dot(xq[..., h:], hi)
                       ).astype(x.dtype)
            return self._apply_mult(out)
        if qbits == 8:
            # in-major int8 (quant/): fused Pallas dequant-dot on TPU,
            # dequantize-then-dot elsewhere
            from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import (
                int8_matmul, int8_matmul_supported)
            scales = self.dense_scales[...]
            if getattr(self, "serve_w8a8", False):
                # serving-only w8a8 (quant.enable_w8a8_serving): per-token
                # activation quant + int8 MXU dot, no weight dequant work
                xf = x.astype(jnp.float32)
                sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
                sx = jnp.maximum(sx, 1e-12)
                xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, w, (((xq.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = (acc.astype(jnp.float32) * sx * scales).astype(x.dtype)
                return self._apply_mult(out)
            if (jax.default_backend() == "tpu"
                    and int8_matmul_supported(x.shape, w.shape,
                                              jnp.dtype(compute).itemsize)):
                out = int8_matmul(x.astype(compute), w, scales
                                  ).astype(x.dtype)
                return self._apply_mult(out)
            from sparse_matrix_fine_tuning_tpu.quant import dequantize_int8
            w = dequantize_int8(w, scales, compute)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        else:
            w = w.astype(x.dtype)
        out = jax.lax.dot_general(
            x, w, dimension_numbers=dims(x),
            preferred_element_type=jnp.float32).astype(x.dtype)
        return self._apply_mult(out)

    def _can_fuse_add(self, x: Array) -> bool:
        """Whether the hybrid hot path can use the fused base+monarch kernel:
        no branch transforms (dropout/scaler/mult-factor), no padding, TPU,
        and above the measured size crossover (docs/BENCHMARKS.md)."""
        from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
            monarch_kernel_supported)
        if (self.impl not in ("auto", "pallas") or self.dropout is not None
                or self.scaler is not None or self.use_mult_factor):
            return False
        # quantized bases are fine: the fused add consumes _dense_forward's
        # output like any other base (kernels/quant_matmul.py produces it)
        if (self.nblocks * self.in_blksz != self.in_features
                or self.nblocks * self.out_blksz != self.out_features):
            return False
        if jax.default_backend() != "tpu":
            return False
        b = 1
        for d in x.shape[:-1]:
            b *= d
        if self.impl == "auto" and b * (self.in_features + self.out_features) < (1 << 22):
            return False
        return monarch_kernel_supported(
            self.in_features, self.blkdiag1[...].shape,
            self.blkdiag2[...].shape, x.dtype.itemsize)

    # ------------------------------------------------------------------
    # merge-during-training (kernels/merged.py): the frozen dense and the
    # adapter collapse into ONE matmul operand refreshed once per optimizer
    # step -- forward and input-gradient adapter overhead drop to zero.
    def can_merge_train(self) -> bool:
        """Plain additive adapter only: output dropout/scaler/mult-factor
        wrap the monarch branch and cannot fold into the merged operand."""
        return (self.as_adapter and self.dense is not None
                and self.dropout is None and self.scaler is None
                and not self.use_mult_factor and not self.quant_bits)

    def _build_merged(self):
        from sparse_matrix_fine_tuning_tpu.kernels.merged import build_merged_operands
        dense = self.dense[...]
        if self.dtype is not None:
            dense = dense.astype(self.dtype)  # cache in compute dtype
        return build_merged_operands(
            dense, self.blkdiag1[...].astype(dense.dtype),
            self.blkdiag2[...].astype(dense.dtype))

    def enable_merged_training(self) -> None:
        assert self.can_merge_train()
        wm, wm_t = self._build_merged()
        self.wm_cache = MergedCache(wm)
        self.wm_t_cache = MergedCache(wm_t)

    def refresh_merged(self) -> None:
        """Rebuild the merged operands from the CURRENT factors; the trainer
        calls this (in-jit) at the top of every optimizer step, so the cache
        is never stale during training."""
        if self.wm_cache is None:
            return
        wm, wm_t = self._build_merged()
        self.wm_cache.set_value(wm)
        self.wm_t_cache.set_value(wm_t)

    def disable_merged_training(self) -> None:
        self.wm_cache = nnx.data(None)
        self.wm_t_cache = nnx.data(None)

    def _merged_forward(self, x: Array) -> Array:
        from sparse_matrix_fine_tuning_tpu.kernels.merged import merged_apply
        wm = self.wm_cache[...]  # already in compute dtype (_build_merged)
        x = x.astype(wm.dtype)
        return merged_apply(x, wm, self.wm_t_cache[...],
                            self.blkdiag1[...].astype(wm.dtype),
                            self.blkdiag2[...].astype(wm.dtype))

    def __call__(self, x: Array, *, deterministic=None) -> Array:
        if self.as_adapter:
            assert self.dense is not None, (
                "adapter mode requires frozen dense weights (pass `weights=`) "
                "or set as_adapter=False")
            if self.wm_cache is not None and not self.merged:
                out = self._merged_forward(x)
                if self.bias is not None:
                    out = out + self.bias[...].astype(out.dtype)
                return out
            out = self._dense_forward(x)
            if not self.merged and self._can_fuse_add(x):
                from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
                    monarch_add)
                w1 = self.blkdiag1[...].astype(out.dtype)
                w2 = self.blkdiag2[...].astype(out.dtype)
                out = monarch_add(out, x.astype(out.dtype), w1, w2)
            elif not self.merged:
                out = out + self.monarch_forward(x, deterministic=deterministic)
        else:
            out = self.monarch_forward(x, deterministic=deterministic)
        if self.bias is not None:
            out = out + self.bias[...].astype(out.dtype)
        return out

    # ------------------------------------------------------------------
    def adapter_dense_equivalent(self) -> Array:
        """The dense (out, in) matrix currently added by the adapter branch
        (including scaler; equals monarch_forward(I)^T as in reference
        monarch_linear.py:265,274)."""
        eye = jnp.eye(self.in_features, dtype=self.param_dtype)
        return self.monarch_forward(eye, deterministic=True).T

    def _check_mergeable(self) -> None:
        if getattr(self, "quant_bits", None):
            raise ValueError(
                "merge/unmerge on a quantized base: the dense holds packed "
                f"int{self.quant_bits} codes -- adding a float adapter delta "
                "into them would silently corrupt the weights.  Keep the "
                "adapter unmerged (the quantized hot path already fuses it), "
                "merge BEFORE quantize_frozen_base, or use the lossy "
                "serving-only quant.requantize_merge_adapters.")

    def merge_adapter(self) -> None:
        """Fold the adapter into the frozen dense weights for inference
        (reference train(False) branch, monarch_linear.py:271-276).

        With a Scaler the fold linearizes its LayerNorm at the identity
        probe, so merged outputs differ from unmerged ones on general
        inputs -- the reference's merge has the identical quirk, and the
        parity tests assert we reproduce it
        (tests/reference_parity/test_adapter_import.py)."""
        if not self.as_adapter or self.merged:
            return
        self._check_mergeable()
        dense = self.dense[...]
        # cast the DELTA to the dense's own dtype: a bf16 base must not
        # promote to f32 (doubles the frozen base's HBM)
        self.dense.set_value(
            dense + self.adapter_dense_equivalent().astype(dense.dtype))
        self.merged = True

    def unmerge_adapter(self) -> None:
        """Split the adapter back out for continued training
        (reference train(True) branch, monarch_linear.py:261-268)."""
        if not self.as_adapter or not self.merged:
            return
        self._check_mergeable()
        dense = self.dense[...]
        self.dense.set_value(
            dense - self.adapter_dense_equivalent().astype(dense.dtype))
        self.merged = False

    @property
    def saving(self) -> float:
        """Adapter-params / dense-params compression ratio
        (reference monarch_linear.py:312-314)."""
        return (self.blkdiag1[...].size + self.blkdiag2[...].size) / (
            self.in_features * self.out_features)


class MonarchFactor(nnx.Module):
    """A single trainable block-diagonal factor; used by ReFT's
    ``MoReIntervention`` as rotation / learned-source maps
    (reference monarch_linear.py:317-381)."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        nblocks: int = 4,
        blk_r: int = 4,
        use_bias: bool = False,
        ortho: bool = False,
        all_zero: bool = False,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert in_features % nblocks == 0, "in_features must divide by nblocks"
        self.in_features = in_features
        self.out_features = out_features
        self.nblocks = nblocks
        self.blk_r = blk_r
        self.in_blk_sz = in_features // nblocks
        shape = (nblocks, blk_r, self.in_blk_sz)
        key = rngs.params()
        if all_zero:
            w = jnp.zeros(shape, param_dtype)
        elif ortho:
            # per-block semi-orthogonal init, fp32 (reference :361-371)
            keys = jax.random.split(key, nblocks)
            w = jnp.stack([
                jax.nn.initializers.orthogonal()(keys[i], (blk_r, self.in_blk_sz), jnp.float32)
                for i in range(nblocks)
            ]).astype(param_dtype)
        else:
            w = _kaiming_block_uniform(key, shape, param_dtype)
        self.weight = AdapterParam(w)
        self.bias = AdapterParam(jnp.zeros((out_features,), param_dtype)) if use_bias else None

    def __call__(self, x: Array) -> Array:
        out = blockdiag_multiply(x, self.weight[...].astype(x.dtype))
        if self.bias is not None:
            out = out + self.bias[...].astype(out.dtype)
        return out
