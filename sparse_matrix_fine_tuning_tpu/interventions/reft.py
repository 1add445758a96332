"""ReFT-style activation interventions (TPU-native pyreft/pyvene core).

The reference vendors the full pyvene hook engine
(pyreft/pyvene/models/intervenable_base.py, 1691 LoC of forward-hook
machinery); its MoRe training path only ever intervenes on ``block_output``
at fixed token positions (loreft/train.py:177-206), so the TPU-native
engine is a functional hook: models expose ``layer_hooks`` at block
outputs, and ``ReftModel`` gathers the intervention positions, applies the
intervention module, and scatters back -- all inside the jit graph instead
of via runtime hooks.

Interventions (reference pyreft/pyreft/interventions.py:19-143):
  LoreftIntervention   h + R^T(act(W h + b) - R h)   R semi-orthogonal
  NoreftIntervention   h + W_proj^T(act(W h + b) - W_proj h)
  ConsreftIntervention h + R^T(b - R h)
  NoIntervention       identity (the MoRe production path)
  MoReIntervention     rotate/source are Monarch block-diagonal factors
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
    AdapterParam,
    MonarchFactor,
)
from sparse_matrix_fine_tuning_tpu.ops.blockdiag import blockdiag_multiply

Array = jax.Array


def _ortho_init(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


class LoreftIntervention(nnx.Module):
    def __init__(self, embed_dim: int, low_rank_dimension: int, *,
                 dropout: float = 0.0, act_fn=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        k1, k2, k3 = jax.random.split(rngs.params(), 3)
        # semi-orthogonal columns: rotate (d, r)
        self.rotate = AdapterParam(_ortho_init(k1, (embed_dim, low_rank_dimension),
                                               param_dtype))
        self.w = AdapterParam(jax.random.normal(k2, (embed_dim, low_rank_dimension),
                                                param_dtype) * 0.02)
        self.b = AdapterParam(jnp.zeros((low_rank_dimension,), param_dtype))
        self.act_fn = act_fn or (lambda x: x)
        self.dropout = nnx.Dropout(dropout, deterministic=True, rngs=rngs) if dropout > 0 else None

    def __call__(self, h: Array) -> Array:
        R = self.rotate[...].astype(h.dtype)
        src = self.act_fn(h @ self.w[...].astype(h.dtype)
                          + self.b[...].astype(h.dtype))
        out = h + (src - h @ R) @ R.T
        if self.dropout is not None:
            out = self.dropout(out)
        return out


class NoreftIntervention(nnx.Module):
    """h + P^T(act(W h + b) - (P h + p_b)): like Loreft but with an
    UNCONSTRAINED projection instead of a semi-orthogonal rotation
    (reference pyreft interventions.py:62-82).  The learned source always
    has a bias; ``add_bias`` gates the PROJECTION's bias, matching the
    reference's ``proj_layer = Linear(..., bias=add_bias)``."""

    def __init__(self, embed_dim: int, low_rank_dimension: int, *,
                 add_bias: bool = True, dropout: float = 0.0, act_fn=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        k1, k2 = jax.random.split(rngs.params())
        self.proj = AdapterParam(jax.random.normal(
            k1, (embed_dim, low_rank_dimension), param_dtype) * 0.02)
        self.proj_b = AdapterParam(jnp.zeros((low_rank_dimension,),
                                             param_dtype)) if add_bias else None
        self.w = AdapterParam(jax.random.normal(
            k2, (embed_dim, low_rank_dimension), param_dtype) * 0.02)
        self.b = AdapterParam(jnp.zeros((low_rank_dimension,), param_dtype))
        self.act_fn = act_fn or (lambda x: x)
        self.dropout = nnx.Dropout(dropout, deterministic=True, rngs=rngs) \
            if dropout > 0 else None

    def __call__(self, h: Array) -> Array:
        P = self.proj[...].astype(h.dtype)
        proj_base = h @ P
        if self.proj_b is not None:
            proj_base = proj_base + self.proj_b[...].astype(h.dtype)
        src = h @ self.w[...].astype(h.dtype) + self.b[...].astype(h.dtype)
        out = h + (self.act_fn(src) - proj_base) @ P.T
        # reference applies dropout to the intervention OUTPUT
        # (interventions.py:69,77)
        if self.dropout is not None:
            out = self.dropout(out)
        return out


class ConsreftIntervention(nnx.Module):
    def __init__(self, embed_dim: int, low_rank_dimension: int, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs, **_):
        # **_: tolerate shared rep kwargs like dropout, which Consreft has
        # no use for (the reference's ConstantSourceIntervention base
        # swallows unknown kwargs the same way)
        k1, k2 = jax.random.split(rngs.params())
        self.rotate = AdapterParam(_ortho_init(k1, (embed_dim, low_rank_dimension),
                                               param_dtype))
        self.source = AdapterParam(jax.random.uniform(
            k2, (low_rank_dimension,), param_dtype))

    def __call__(self, h: Array) -> Array:
        R = self.rotate[...].astype(h.dtype)
        return h + (self.source[...].astype(h.dtype) - h @ R) @ R.T


class NoIntervention(nnx.Module):
    """Identity -- the MoRe production path intervenes on nothing and lets
    the Monarch adapters do the work (math_monarch.sh:28)."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 rngs: Optional[nnx.Rngs] = None, **_):
        pass

    def __call__(self, h: Array) -> Array:
        return h


class MoReIntervention(nnx.Module):
    """ReFT with Monarch factors: blockwise-orthogonal rotate + learned
    source, inverse rotation via the transposed block-diagonal factor
    (reference interventions.py:104-143)."""

    def __init__(self, embed_dim: int, low_rank_dimension: int, *,
                 nblocks: int = 4, dropout: float = 0.0, act_fn=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        blk_r = max(low_rank_dimension // nblocks, 1)
        self.rotate_layer = MonarchFactor(
            embed_dim, low_rank_dimension, nblocks=nblocks, blk_r=blk_r,
            ortho=True, param_dtype=param_dtype, rngs=rngs)
        self.learned_source = MonarchFactor(
            embed_dim, low_rank_dimension, nblocks=nblocks, blk_r=blk_r,
            param_dtype=param_dtype, rngs=rngs)
        self.act_fn = act_fn or (lambda x: x)
        self.dropout = nnx.Dropout(dropout, deterministic=True, rngs=rngs) if dropout > 0 else None

    def __call__(self, h: Array) -> Array:
        rotated = self.rotate_layer(h)
        delta = self.act_fn(self.learned_source(h)) - rotated
        # inverse rotation: transposed blocks of the orthogonal factor
        w_t = jnp.swapaxes(self.rotate_layer.weight[...], -1, -2).astype(h.dtype)
        out = h + blockdiag_multiply(delta, w_t)
        if self.dropout is not None:
            out = self.dropout(out)
        return out


class VanillaIntervention(nnx.Module):
    """Replace base activations with SOURCE activations (pyvene's core
    interchange intervention, reference pyvene models/interventions.py
    VanillaIntervention): used through ``ReftModel.swap_forward``."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 subspace_partition=None, rngs: Optional[nnx.Rngs] = None, **_):
        self.subspace_partition = subspace_partition

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        mask = _subspace_mask(h.shape[-1], subspaces,
                              self.subspace_partition, h.dtype)
        return h + mask * (source.astype(h.dtype) - h)


class AdditionIntervention(nnx.Module):
    """base + source (reference pyvene AdditionIntervention)."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 subspace_partition=None, rngs: Optional[nnx.Rngs] = None, **_):
        self.subspace_partition = subspace_partition

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        mask = _subspace_mask(h.shape[-1], subspaces,
                              self.subspace_partition, h.dtype)
        return h + mask * source.astype(h.dtype)


class SubtractionIntervention(nnx.Module):
    """base - source (reference pyvene SubtractionIntervention)."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 subspace_partition=None, rngs: Optional[nnx.Rngs] = None, **_):
        self.subspace_partition = subspace_partition

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        mask = _subspace_mask(h.shape[-1], subspaces,
                              self.subspace_partition, h.dtype)
        return h - mask * source.astype(h.dtype)


class CollectIntervention(nnx.Module):
    """Collect activations without modifying them (reference pyvene
    CollectIntervention); ``ReftModel.collect_activations`` returns what
    these gather."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 rngs: Optional[nnx.Rngs] = None, **_):
        pass

    def __call__(self, h: Array, source: Optional[Array] = None) -> Array:
        return h


def _cayley_rotation(free: Array, dtype) -> Array:
    """Exactly-orthogonal (d, d) rotation from a free square parameter via
    the Cayley transform of its skew-symmetric part -- the TPU-native
    equivalent of torch's ``parametrizations.orthogonal`` (a pure function
    of trainable state instead of a stateful re-parametrization hook)."""
    a = free.astype(jnp.float32)
    skew = (a - a.T) / 2
    eye = jnp.eye(a.shape[0], dtype=jnp.float32)
    return jnp.linalg.solve(eye + skew, eye - skew).astype(dtype)


def _subspace_mask(dim: int, subspaces, subspace_partition, dtype) -> Array:
    """(dim,) 0/1 mask of rotated coordinates to swap.

    subspaces: None (swap everything -- pyvene's default interchange_dim),
    a sequence of coordinate indices, or (with subspace_partition) a
    sequence of partition ids whose index groups are unioned
    (reference pyvene models/interventions.py subspace handling)."""
    if subspaces is None:
        return jnp.ones((dim,), dtype)
    if subspace_partition is not None:
        idx = [i for s in subspaces for i in subspace_partition[s]]
    else:
        idx = list(subspaces)
    if not idx:
        return jnp.zeros((dim,), dtype)
    return jnp.zeros((dim,), dtype).at[jnp.asarray(idx)].set(1)


class RotatedSpaceIntervention(nnx.Module):
    """Interchange in a FULL rotated space (DAS; reference pyvene
    models/interventions.py:252-278): rotate base and source into R's
    basis, swap the selected coordinates, rotate back.

    R stays EXACTLY orthogonal throughout training via a Cayley transform
    of a free skew-symmetric parameter -- the TPU-native equivalent of
    torch's ``parametrizations.orthogonal`` (which the reference applies
    to its RotateLayer): a pure function of the trainable state instead of
    a stateful re-parametrization hook.
    """

    def __init__(self, embed_dim: int, low_rank_dimension: int = 0, *,
                 subspace_partition=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs, **_):
        self.skew = AdapterParam(jax.random.normal(
            rngs.params(), (embed_dim, embed_dim), param_dtype) * 0.01)
        self.subspace_partition = subspace_partition

    def _rotation(self, dtype) -> Array:
        return _cayley_rotation(self.skew[...], dtype)

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        R = self._rotation(h.dtype)
        rb = h @ R
        rs = source.astype(h.dtype) @ R
        mask = _subspace_mask(h.shape[-1], subspaces,
                              self.subspace_partition, h.dtype)
        return (rb + (rs - rb) * mask) @ R.T


class LowRankRotatedSpaceIntervention(nnx.Module):
    """DAS with a low-rank rotated subspace (reference pyvene
    models/interventions.py:396-448): project onto r semi-orthogonal
    directions, swap the selected ones, and add the difference back.
    Semi-orthogonality is maintained exactly via differentiable QR of a
    free (d, r) parameter."""

    def __init__(self, embed_dim: int, low_rank_dimension: int, *,
                 subspace_partition=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs, **_):
        self.free = AdapterParam(_ortho_init(
            rngs.params(), (embed_dim, low_rank_dimension), param_dtype))
        self.low_rank_dimension = low_rank_dimension
        self.subspace_partition = subspace_partition

    def _rotation(self, dtype) -> Array:
        q, r = jnp.linalg.qr(self.free[...].astype(jnp.float32))
        # fix the QR sign ambiguity so the map is continuous in the params
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        return q.astype(dtype)

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        R = self._rotation(h.dtype)  # (d, r)
        diff = (source.astype(h.dtype) - h) @ R  # (b, p, r)
        mask = _subspace_mask(self.low_rank_dimension, subspaces,
                              self.subspace_partition, h.dtype)
        return h + (diff * mask) @ R.T


class ZeroIntervention(nnx.Module):
    """Zero out the selected coordinates of the base (reference pyvene
    models/interventions.py:124-143: interchange with zeros_like(base));
    constant-source -- needs no source example."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 subspace_partition=None, rngs: Optional[nnx.Rngs] = None, **_):
        self.subspace_partition = subspace_partition

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        mask = _subspace_mask(h.shape[-1], subspaces,
                              self.subspace_partition, h.dtype)
        return h * (1 - mask)


class SkipIntervention(nnx.Module):
    """Skip the hooked layer's computation: interchange the base with the
    SAME example's input to the hooked layer (reference pyvene
    models/interventions.py:166-186, where ``source`` is the base example
    input to the hook -- NOT another example's activations).
    ``ReftModel._hooks`` wires the layer input automatically: block L's
    input is captured at block L-1's output (embeddings via the
    (0, "block_input") site for L=0)."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 subspace_partition=None, rngs: Optional[nnx.Rngs] = None, **_):
        self.subspace_partition = subspace_partition

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        mask = _subspace_mask(h.shape[-1], subspaces,
                              self.subspace_partition, h.dtype)
        return h + (source.astype(h.dtype) - h) * mask


class BoundlessRotatedSpaceIntervention(nnx.Module):
    """Boundless DAS (reference pyvene models/interventions.py:281-326):
    interchange in the full rotated space where the swapped-coordinate
    count is LEARNED -- a soft boundary mask
    ``sigmoid((pos - 0)/T) * sigmoid((boundary*d - pos)/T)`` over the
    rotated coordinate index (basic_utils.sigmoid_boundary), with the
    boundary fraction trainable and the temperature annealed externally
    via ``set_temperature``."""

    def __init__(self, embed_dim: int, low_rank_dimension: int = 0, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs, **_):
        self.skew = AdapterParam(jax.random.normal(
            rngs.params(), (embed_dim, embed_dim), param_dtype) * 0.01)
        # boundary fraction in (0, 1], init 0.5 (reference :288)
        self.intervention_boundaries = AdapterParam(
            jnp.asarray([0.5], param_dtype))
        # annealed by the trainer, not optimized (reference set_temperature)
        self.temperature = nnx.Variable(jnp.asarray(50.0, jnp.float32))
        self.embed_dim = embed_dim

    def set_temperature(self, temp: float) -> None:
        self.temperature.set_value(jnp.asarray(temp, jnp.float32))

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        R = _cayley_rotation(self.skew[...], h.dtype)
        rb = h @ R
        rs = source.astype(h.dtype) @ R
        boundary = jnp.clip(
            self.intervention_boundaries[...].astype(jnp.float32), 1e-3, 1.0)
        pos = jnp.arange(self.embed_dim, dtype=jnp.float32)
        temp = self.temperature[...]
        mask = (jax.nn.sigmoid((pos - 0.0) / temp)
                * jax.nn.sigmoid((boundary[0] * self.embed_dim - pos) / temp))
        return (rb + (rs - rb) * mask.astype(h.dtype)) @ R.T


class SigmoidMaskRotatedSpaceIntervention(nnx.Module):
    """Rotated-space interchange with a LEARNED per-coordinate sigmoid mask
    (reference pyvene models/interventions.py:328-365): masks init 100
    (mask ~ 1 everywhere), temperature 50, annealed externally."""

    def __init__(self, embed_dim: int, low_rank_dimension: int = 0, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs, **_):
        self.skew = AdapterParam(jax.random.normal(
            rngs.params(), (embed_dim, embed_dim), param_dtype) * 0.01)
        self.masks = AdapterParam(jnp.full((embed_dim,), 100.0, param_dtype))
        self.temperature = nnx.Variable(jnp.asarray(50.0, jnp.float32))

    def set_temperature(self, temp: float) -> None:
        self.temperature.set_value(jnp.asarray(temp, jnp.float32))

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        R = _cayley_rotation(self.skew[...], h.dtype)
        rb = h @ R
        rs = source.astype(h.dtype) @ R
        mask = jax.nn.sigmoid(
            self.masks[...].astype(jnp.float32) / self.temperature[...])
        return (rb + (rs - rb) * mask.astype(h.dtype)) @ R.T


class SigmoidMaskIntervention(nnx.Module):
    """Interchange in the ORIGINAL basis through a learned sigmoid mask
    (reference pyvene models/interventions.py:367-394): mask init 0
    (sigmoid = 0.5 everywhere), temperature 0.01."""

    def __init__(self, embed_dim: int, low_rank_dimension: int = 0, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs, **_):
        self.mask = AdapterParam(jnp.zeros((embed_dim,), param_dtype))
        self.temperature = nnx.Variable(jnp.asarray(0.01, jnp.float32))

    def set_temperature(self, temp: float) -> None:
        self.temperature.set_value(jnp.asarray(temp, jnp.float32))

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        sig = jax.nn.sigmoid(
            self.mask[...].astype(jnp.float32) / self.temperature[...])
        sig = sig.astype(h.dtype)
        return (1 - sig) * h + sig * source.astype(h.dtype)


class PCARotatedSpaceIntervention(nnx.Module):
    """Interchange in a FIXED PCA basis (reference pyvene
    models/interventions.py:448-485): standardize with the fitted
    mean/std, project onto the components, swap the selected component
    coordinates, project back, de-standardize.  Nothing is trainable."""

    def __init__(self, embed_dim: int = 0, low_rank_dimension: int = 0, *,
                 pca_components=None, pca_mean=None, pca_std=None,
                 subspace_partition=None, rngs: Optional[nnx.Rngs] = None,
                 param_dtype=jnp.float32, **_):
        if pca_components is None or pca_mean is None or pca_std is None:
            raise ValueError(
                "PCARotatedSpaceIntervention needs the fitted basis: pass "
                "pca_components (r, d), pca_mean (d,), pca_std (d,) in the "
                "representation dict (reference pyvene interventions.py:"
                "448-485 takes them as pca/pca_mean/pca_std kwargs)")
        self.components = nnx.Variable(jnp.asarray(pca_components,
                                                   jnp.float32))  # (r, d)
        self.mean = nnx.Variable(jnp.asarray(pca_mean, jnp.float32))
        self.std = nnx.Variable(jnp.asarray(pca_std, jnp.float32))
        self.subspace_partition = subspace_partition

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        if source is None:
            return h
        comps = self.components[...].astype(h.dtype)
        mean = self.mean[...].astype(h.dtype)
        std = self.std[...].astype(h.dtype)
        rb = ((h - mean) / std) @ comps.T
        rs = ((source.astype(h.dtype) - mean) / std) @ comps.T
        mask = _subspace_mask(comps.shape[0], subspaces,
                              self.subspace_partition, h.dtype)
        out = (rb + (rs - rb) * mask) @ comps
        return out * std + mean


class NoiseIntervention(nnx.Module):
    """Add a FIXED Gaussian noise pattern to the gathered positions
    (reference pyvene models/interventions.py:487-505, the ROME corruption:
    noise drawn once from ``np.random.RandomState(1)`` with shape
    (1, positions, d), scaled by ``noise_level``); constant-source."""

    def __init__(self, embed_dim: int, low_rank_dimension: int = 0, *,
                 positions: int = 4, noise_level: float = 0.13462981581687927,
                 rngs: Optional[nnx.Rngs] = None, **_):
        import numpy as _np
        rs = _np.random.RandomState(1)
        self.noise = nnx.Variable(jnp.asarray(
            rs.randn(1, positions, embed_dim), jnp.float32))
        self.noise_level = float(noise_level)

    def __call__(self, h: Array, source: Optional[Array] = None,
                 subspaces=None) -> Array:
        noise = self.noise[...].astype(h.dtype)
        return h + noise * jnp.asarray(self.noise_level, h.dtype)


INTERVENTION_TYPES = {
    "LoreftIntervention": LoreftIntervention,
    "NoreftIntervention": NoreftIntervention,
    "ConsreftIntervention": ConsreftIntervention,
    "NoIntervention": NoIntervention,
    "Nothing": NoIntervention,
    "MoReIntervention": MoReIntervention,
    "VanillaIntervention": VanillaIntervention,
    "AdditionIntervention": AdditionIntervention,
    "SubtractionIntervention": SubtractionIntervention,
    "CollectIntervention": CollectIntervention,
    "RotatedSpaceIntervention": RotatedSpaceIntervention,
    "LowRankRotatedSpaceIntervention": LowRankRotatedSpaceIntervention,
    "ZeroIntervention": ZeroIntervention,
    "SkipIntervention": SkipIntervention,
    "BoundlessRotatedSpaceIntervention": BoundlessRotatedSpaceIntervention,
    "SigmoidMaskRotatedSpaceIntervention": SigmoidMaskRotatedSpaceIntervention,
    "SigmoidMaskIntervention": SigmoidMaskIntervention,
    "PCARotatedSpaceIntervention": PCARotatedSpaceIntervention,
    "NoiseIntervention": NoiseIntervention,
}

# interventions whose edit is a function of a SOURCE example's activations
# (SkipIntervention is deliberately NOT here: its "source" is the same
# example's layer input, wired by ReftModel._hooks, never a source example)
SOURCE_BASED = (VanillaIntervention, AdditionIntervention,
                SubtractionIntervention, RotatedSpaceIntervention,
                LowRankRotatedSpaceIntervention,
                BoundlessRotatedSpaceIntervention,
                SigmoidMaskRotatedSpaceIntervention, SigmoidMaskIntervention,
                PCARotatedSpaceIntervention)


@dataclasses.dataclass
class ReftConfig:
    """representations: list of dicts {layer, component, low_rank_dimension,
    intervention (name or class)} (reference pyreft/pyreft/config.py:4-30)."""
    representations: Sequence[dict] = ()


def _subspaces_for(subspaces, i):
    """Resolve the static per-intervention subspace selection: None, a flat
    int list shared by all interventions, or one list (or None) per
    intervention, mirroring pyvene's forward(subspaces=...) broadcast."""
    if subspaces is None:
        return None
    if all(isinstance(s, int) for s in subspaces):
        return list(subspaces)
    return subspaces[i]


def _bind_subspaces(iv, sub):
    """Close a subspace selection over an intervention call.  Checked at
    hook-build (trace) time so unsupported classes fail with a clear error
    instead of a TypeError from deep inside the jit trace."""
    if sub is None:
        return iv
    import inspect
    if "subspaces" not in inspect.signature(type(iv).__call__).parameters:
        raise ValueError(
            f"{type(iv).__name__} does not support subspaces; use a "
            "subspace-aware intervention (Vanilla/Addition/Subtraction/"
            "RotatedSpace family)")
    return lambda h, source=None: iv(h, source=source, subspaces=sub)


def _chain(prev, fn):
    """Compose two same-site hooks in registration order (untied f+l
    positions register several interventions on one layer)."""
    return lambda x: fn(prev(x))


def _lift_over_senses(iv, locs, src, sub):
    """Lift a token-position intervention over the Backpack sense axis:
    the ``sense_network_output`` site tensor is (b, nv, s, d)
    (models/backpack_gpt2.py, pyvene's one Backpack anchor --
    modelings_intervenable_backpack_gpt2.py:14-16), and the intervention
    applies to EVERY sense's (b, s, d) slice at the same token positions;
    sources collected at this site are (b, nv, p, d).

    Semantic note vs upstream: pyvene's canonical Backpack demo
    (pyvene_101.ipynb) targets a single (sense, position) pair via its
    "sense.pos" unit; ReftModel's location machinery expresses token
    positions only, so this site intervenes on all senses at those
    positions.  Per-sense targeting remains available via a hand-written
    ``layer_hooks["sense_network_output"]`` fn that slices the nv axis."""
    bound = _bind_subspaces(iv, sub)
    if src is None:
        return lambda x: jax.vmap(
            lambda xs: apply_at_positions(xs, locs, bound),
            in_axes=1, out_axes=1)(x)
    return lambda x: jax.vmap(
        lambda xs, ss: apply_at_positions(xs, locs, bound, source=ss),
        in_axes=1, out_axes=1)(x, src)


def gather_positions(x: Array, locations: Array) -> Array:
    """(b, t, d) gathered at (b, p) positions -> (b, p, d); -1 pads map to
    position 0 (pyvene gather_neurons, reference modeling_utils.py:230)."""
    safe = jnp.maximum(locations, 0)
    return jnp.take_along_axis(x, safe[..., None], axis=1)


def apply_at_positions(x: Array, locations: Array, fn, source=None) -> Array:
    """Gather token positions, intervene, scatter back.

    x: (b, t, d); locations: (b, p) with -1 padding (positions produced by
    data.reasoning.get_intervention_locations).  The -1 slots map to
    position 0 but write back the untouched value, so they are no-ops.
    source: optional (b, p, d) source-example activations for
    interchange-style interventions.
    """
    b = x.shape[0]
    safe = jnp.maximum(locations, 0)
    gathered = jnp.take_along_axis(x, safe[..., None], axis=1)  # (b, p, d)
    edited = fn(gathered, source) if source is not None else fn(gathered)
    keep = (locations >= 0)[..., None]
    # scatter-ADD the delta: -1 pad slots (mapped to position 0) contribute
    # zero instead of racing a real edit at position 0
    delta = jnp.where(keep, edited - gathered, 0)
    return x.at[jnp.arange(b)[:, None], safe].add(delta)


class ReftModel(nnx.Module):
    """Wraps a base model with position-indexed block-output interventions
    (the capability of pyvene's IntervenableModel that the MoRe flows use,
    reference reft_model.py:9-55 + intervenable_base.py forward path)."""

    def __init__(self, model, config: ReftConfig, *, param_dtype=jnp.float32,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.model = model
        embed_dim = model.config.hidden_size
        layers, components, interventions = [], [], []
        for rep in config.representations:
            cls = rep.get("intervention", "NoIntervention")
            if isinstance(cls, str):
                cls = INTERVENTION_TYPES[cls]
            kw = {k: v for k, v in rep.items()
                  if k not in ("layer", "component", "intervention")}
            kw.setdefault("low_rank_dimension", 4)
            interventions.append(cls(embed_dim, param_dtype=param_dtype,
                                     rngs=rngs, **kw)
                                 if cls is not NoIntervention
                                 else NoIntervention())
            layers.append(int(rep["layer"]))
            components.append(rep.get("component", "block_output"))
        self.intervention_layers = tuple(layers)
        self.intervention_components = tuple(components)
        self.interventions = nnx.List(interventions)

    def _key(self, i):
        layer = self.intervention_layers[i]
        comp = self.intervention_components[i]
        if comp == "block_output":
            return layer
        if comp == "sense_network_output":
            # Backpack anchor: a model-level site (no layer), keyed by the
            # bare component string the model's layer_hooks contract uses
            return comp
        return (layer, comp)

    def _locs(self, intervention_locations, i):
        return intervention_locations[
            :, min(i, intervention_locations.shape[1] - 1)]

    def _hooks(self, intervention_locations, sources=None, subspaces=None):
        """intervention_locations: (b, num_interventions, p) from the data
        pipeline.  sources: optional {i: (b, p, d)} source activations for
        interchange interventions.  subspaces: optional static subspace
        selection (pyvene forward(subspaces=...)): a flat index/partition-id
        list shared by every intervention, or one list per intervention.
        Returns {layer_or_(layer, comp): fn}."""
        hooks = {}
        pending_captures = []
        for i, iv in enumerate(self.interventions):
            if isinstance(iv, NoIntervention):
                continue
            locs = self._locs(intervention_locations, i)
            sub = _subspaces_for(subspaces, i)
            if isinstance(iv, SkipIntervention):
                pending_captures.append(
                    self._add_skip_hooks(hooks, iv, i, locs, sub))
                continue
            src = (sources or {}).get(i)
            if self.intervention_components[i] == "sense_network_output":
                fn = _lift_over_senses(iv, locs, src, sub)
            else:
                fn = (lambda iv, locs, src, sub:
                      lambda x: apply_at_positions(x, locs,
                                                   _bind_subspaces(iv, sub),
                                                   source=src)
                      )(iv, locs, src, sub)
            prev = hooks.get(self._key(i))
            hooks[self._key(i)] = fn if prev is None else _chain(prev, fn)
        # Skip captures chain LAST at their site, after every edit hook
        # registered there (in pyvene, block L's input is block L-1's
        # output AFTER all interventions at that site ran -- regardless of
        # the order representations were listed in).  Sites execute in
        # forward order, so end-of-site captures still precede their skip.
        for cap_key, capture in pending_captures:
            prev = hooks.get(cap_key)
            hooks[cap_key] = capture if prev is None else _chain(prev, capture)
        return hooks

    def _add_skip_hooks(self, hooks, iv, i, locs, sub=None):
        """SkipIntervention's ``source`` is the SAME example's input to the
        hooked block (pyvene interventions.py:172).  The input to block L is
        block L-1's output, captured at that (remat-safe) block-output hook
        site; L=0 captures the embeddings via the (0, "block_input") inner
        site.  The captured value is a traced array of the same forward, so
        the skip hook closes over it within one trace.  Registers the skip
        hook in place; RETURNS (cap_key, capture) for the caller to chain
        after all edit hooks at the capture site."""
        layer = self.intervention_layers[i]
        comp = self.intervention_components[i]
        if comp != "block_output":
            raise NotImplementedError(
                "SkipIntervention is supported at component='block_output' "
                f"(got {comp!r}): its source is the block's input, which the "
                "engine captures at the previous block's output")
        if layer == 0 and getattr(self.model.config, "remat", False):
            raise NotImplementedError(
                "SkipIntervention at layer 0 of a remat'd model: the "
                "embeddings capture runs inside the rematerialized block and "
                "cannot escape to the block-output site; disable remat or "
                "skip a later layer")
        cap = {}

        def capture(x):
            cap["src"] = gather_positions(x, locs)
            return x

        def skip_fn(x):
            assert "src" in cap, (
                "SkipIntervention capture hook did not run before the skip "
                "site -- hook ordering bug")
            return apply_at_positions(x, locs, _bind_subspaces(iv, sub),
                                      source=cap["src"])

        cap_key = (0, "block_input") if layer == 0 else layer - 1
        prev = hooks.get(layer)
        hooks[layer] = skip_fn if prev is None else _chain(prev, skip_fn)
        return cap_key, capture

    def collect_activations(self, input_ids, locations, attention_mask=None,
                            **kw):
        """Run a forward and gather each intervention site's activations at
        ``locations`` (b, num_interventions, p) -- pyvene's Collect /
        source pass (reference intervenable_base.py source handling).
        Returns {i: (b, p, d)}; Backpack ``sense_network_output`` sites
        return the sense-axis form {i: (b, nv, p, d)}."""
        collected = {}
        hooks = {}
        for i in range(len(self.interventions)):
            locs = self._locs(locations, i)
            sense_site = (self.intervention_components[i]
                          == "sense_network_output")
            def make(i, locs, sense_site):
                def fn(x):
                    if sense_site:  # (b, nv, s, d) -> (b, nv, p, d)
                        collected[i] = jax.vmap(
                            lambda xs: gather_positions(xs, locs),
                            in_axes=1, out_axes=1)(x)
                    else:
                        collected[i] = gather_positions(x, locs)
                    return x
                return fn
            fn = make(i, locs, sense_site)
            prev = hooks.get(self._key(i))
            hooks[self._key(i)] = fn if prev is None else _chain(prev, fn)
        self.model(input_ids, attention_mask=attention_mask,
                   layer_hooks=hooks, **kw)
        return collected

    def swap_forward(self, base_ids, source_ids, *, base_locations,
                     source_locations, base_mask=None, source_mask=None,
                     subspaces=None, **kw):
        """pyvene's source->base interchange forward (reference
        intervenable_base.py:1186 ``unit_locations={"sources->base":
        (source_locs, base_locs)}``): activations collected from the SOURCE
        example at source_locations replace/combine into the BASE forward at
        base_locations, per each intervention's semantics.  ``subspaces``
        restricts the interchange to the given (static) coordinate indices
        or partition ids (pyvene forward(subspaces=...))."""
        sources = self.collect_activations(
            source_ids, source_locations, attention_mask=source_mask, **kw)
        hooks = self._hooks(base_locations, sources=sources,
                            subspaces=subspaces)
        return self.model(base_ids, attention_mask=base_mask,
                          layer_hooks=hooks, **kw)

    # -- intervention state save/load (reference intervenable_base.py:379-570)
    def save_interventions(self, directory: str) -> None:
        import json as _json
        import os as _os

        import numpy as _np
        _os.makedirs(directory, exist_ok=True)
        arrays = {}
        for i, iv in enumerate(self.interventions):
            flat, _ = jax.tree_util.tree_flatten_with_path(nnx.state(iv))
            for path, leaf in flat:
                if hasattr(leaf, "shape"):
                    key = f"{i}/" + "/".join(str(getattr(p, 'key', p)) for p in path)
                    arrays[key] = _np.asarray(leaf)
        _np.savez(_os.path.join(directory, "interventions.npz"), **arrays)
        meta = [{"layer": l, "component": c, "intervention": type(iv).__name__}
                for l, c, iv in zip(self.intervention_layers,
                                    self.intervention_components,
                                    self.interventions)]
        with open(_os.path.join(directory, "intervenable_config.json"), "w") as f:
            _json.dump(meta, f, indent=1)

    def load_interventions(self, directory: str) -> None:
        import os as _os

        import numpy as _np
        data = _np.load(_os.path.join(directory, "interventions.npz"))
        for i, iv in enumerate(self.interventions):
            state = nnx.state(iv)
            flat, treedef = jax.tree_util.tree_flatten_with_path(state)
            new = []
            for path, leaf in flat:
                key = f"{i}/" + "/".join(str(getattr(p, 'key', p)) for p in path)
                if key in data.files:
                    assert data[key].shape == tuple(leaf.shape), key
                    new.append(jnp.asarray(data[key], dtype=leaf.dtype))
                else:
                    new.append(leaf)
            nnx.update(iv, jax.tree_util.tree_unflatten(treedef, new))

    def __call__(self, input_ids, attention_mask=None,
                 intervention_locations=None, subspaces=None, **kw):
        hooks = self._hooks(intervention_locations, subspaces=subspaces) \
            if intervention_locations is not None else None
        # callers (e.g. generate's prefill) may pass pre-built layer_hooks
        extern = kw.pop("layer_hooks", None)
        if extern:
            hooks = {**(hooks or {}), **extern}
        return self.model(input_ids, attention_mask=attention_mask,
                          layer_hooks=hooks, **kw)

    def loss(self, logits, labels, **kw):
        return self.model.loss(logits, labels, **kw)

    @property
    def config(self):
        return self.model.config


def get_reft_model(model, reft_config: ReftConfig, *, rngs=None) -> ReftModel:
    """Factory mirroring reference pyreft.get_reft_model (utils.py:19-44)."""
    return ReftModel(model, reft_config, rngs=rngs)
