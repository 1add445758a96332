"""Toy intervenable models: MLP and GRU.

TPU-native equivalents of the reference's pyvene aux models
(pyreft/pyvene/pyvene/models/mlp/modelings_mlp.py,
models/gru/modelings_gru.py), used for interchange-intervention /
IIT experiments against a ``CausalModel`` and as cheap fixtures for the
intervention engine.  Instead of pyvene's per-arch hook-path mapping
tables (modelings_intervenable_mlp.py etc.), both models speak the same
functional ``layer_hooks`` contract as the production models
(models/llama.py:229): ``{layer_idx | (layer_idx, component): fn(hidden)}``
applied in-jit at block outputs — so ``ReftModel`` wraps them unchanged.

Hidden states carry a sequence axis ``(batch, positions, hidden)`` where
each position is one causal-model input variable — matching how pyvene's
IIT tutorials align MLP activations with causal variables — so
position-indexed interventions (``apply_at_positions``) work exactly as
they do on transformer tokens.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["ToyConfig", "MLPModel", "GRUModel"]


@dataclass
class ToyConfig:
    """Shared config (reference MLPConfig / GRUConfig surface, trimmed to
    the fields their tests exercise)."""
    hidden_size: int = 32
    num_hidden_layers: int = 3
    num_classes: int = 2
    input_dim: int = 1          # per-position feature width (float inputs)
    vocab_size: Optional[int] = None  # set to use int token inputs + embedding
    squeeze_output: bool = False      # logits (b,) for binary heads
    # learned absolute position embeddings (0 disables).  Positionwise
    # blocks + mean-pool are otherwise position-blind, which makes
    # position-sensitive causal tasks (e.g. X+Y >= Z+W) unlearnable.
    max_positions: int = 0


def _linear(din, dout, rngs):
    return nnx.Linear(din, dout, param_dtype=jnp.float32, rngs=rngs)


class _HookedStack(nnx.Module):
    """Shared hook application: ``layer_hooks`` keys are plain ints
    (= block_output, back-compat with models/llama.py:210) or
    ``(layer, "block_output")``."""

    @staticmethod
    def _block_hooks(layer_hooks):
        hooks = {}
        for key, fn in (layer_hooks or {}).items():
            if isinstance(key, tuple):
                i, comp = key
                if comp != "block_output":
                    raise ValueError(
                        f"toy models only expose block_output, got {comp!r}")
                hooks[int(i)] = fn
            else:
                hooks[int(key)] = fn
        return hooks


class MLPModel(_HookedStack):
    """Per-position MLP classifier (reference modelings_mlp.py MLPModel +
    MLPForClassification): embed/project each input position to
    ``hidden_size``, ``num_hidden_layers`` blocks of Linear+GELU applied
    positionwise, mean-pool, linear head."""

    def __init__(self, cfg: ToyConfig, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = cfg
        if cfg.vocab_size is not None:
            self.embed = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                   param_dtype=jnp.float32, rngs=rngs)
        else:
            self.embed = _linear(cfg.input_dim, cfg.hidden_size, rngs)
        self.wpe = (nnx.Embed(cfg.max_positions, cfg.hidden_size,
                              param_dtype=jnp.float32, rngs=rngs)
                    if cfg.max_positions else None)
        self.blocks = nnx.List([
            _linear(cfg.hidden_size, cfg.hidden_size, rngs)
            for _ in range(cfg.num_hidden_layers)])
        self.head = _linear(cfg.hidden_size, cfg.num_classes, rngs)

    def __call__(self, input_ids, attention_mask=None, layer_hooks=None):
        """input_ids: float (b, seq, input_dim) features or int (b, seq)
        tokens when vocab_size is set.  Returns logits (b, num_classes)."""
        hooks = self._block_hooks(layer_hooks)
        if self.config.vocab_size is not None:
            h = self.embed(input_ids)
        else:
            x = input_ids
            if x.ndim == 2:  # (b, seq) scalars -> (b, seq, 1)
                x = x[..., None]
            h = self.embed(x.astype(jnp.float32))
        if self.wpe is not None:
            h = h + self.wpe(jnp.arange(h.shape[1]))[None]
        for i, blk in enumerate(self.blocks):
            h = jax.nn.gelu(blk(h))
            if i in hooks:
                h = hooks[i](h)
        if attention_mask is not None:
            m = attention_mask[..., None].astype(h.dtype)
            pooled = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        else:
            pooled = h.mean(axis=1)
        logits = self.head(pooled)
        if self.config.squeeze_output and self.config.num_classes == 1:
            logits = logits[..., 0]
        return logits

    def loss(self, logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(
            logp, labels[:, None].astype(jnp.int32), axis=-1).mean()


class GRUCell(nnx.Module):
    """Standard GRU cell (update/reset/candidate gates), matching torch
    ``nn.GRU`` gate math (the reference GRUModel wraps it,
    modelings_gru.py)."""

    def __init__(self, din: int, dh: int, *, rngs: nnx.Rngs):
        self.wi = _linear(din, 3 * dh, rngs)
        self.wh = _linear(dh, 3 * dh, rngs)

    def __call__(self, h, x):
        gi, gh = self.wi(x), self.wh(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class GRUModel(_HookedStack):
    """Stacked GRU classifier (reference modelings_gru.py GRUModel +
    GRUForClassification).  Each layer scans its GRU cell over time with
    ``lax.scan`` (compiler-friendly recurrence, no Python loop over seq);
    ``layer_hooks`` fire on each layer's full output sequence
    (b, seq, hidden) — position-indexed interventions then address time
    steps."""

    def __init__(self, cfg: ToyConfig, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = cfg
        if cfg.vocab_size is not None:
            self.embed = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                   param_dtype=jnp.float32, rngs=rngs)
        else:
            self.embed = _linear(cfg.input_dim, cfg.hidden_size, rngs)
        self.cells = nnx.List([
            GRUCell(cfg.hidden_size, cfg.hidden_size, rngs=rngs)
            for _ in range(cfg.num_hidden_layers)])
        self.head = _linear(cfg.hidden_size, cfg.num_classes, rngs)

    def __call__(self, input_ids, attention_mask=None, layer_hooks=None):
        hooks = self._block_hooks(layer_hooks)
        if self.config.vocab_size is not None:
            h = self.embed(input_ids)
        else:
            x = input_ids
            if x.ndim == 2:
                x = x[..., None]
            h = self.embed(x.astype(jnp.float32))
        b = h.shape[0]
        for i, cell in enumerate(self.cells):
            graphdef, state = nnx.split(cell)

            def step(carry, xt, graphdef=graphdef, state=state):
                c = nnx.merge(graphdef, state)
                nxt = c(carry, xt)
                return nxt, nxt

            h0 = jnp.zeros((b, self.config.hidden_size), h.dtype)
            _, seq = jax.lax.scan(step, h0, jnp.swapaxes(h, 0, 1))
            h = jnp.swapaxes(seq, 0, 1)
            if i in hooks:
                h = hooks[i](h)
        if attention_mask is not None:
            # last valid timestep per example
            idx = jnp.maximum(attention_mask.sum(axis=1) - 1, 0).astype(jnp.int32)
            final = h[jnp.arange(b), idx]
        else:
            final = h[:, -1]
        logits = self.head(final)
        if self.config.squeeze_output and self.config.num_classes == 1:
            logits = logits[..., 0]
        return logits

    def loss(self, logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(
            logp, labels[:, None].astype(jnp.int32), axis=-1).mean()
