"""Memory-efficient causal-LM cross-entropy (chunked over tokens).

The straightforward loss materialises the full ``(B, T, V)`` logits tensor
in float32 twice (logits + log_softmax), which at recipe shapes
(B=4, T=512, V=32000) is ~0.5 GB of HBM traffic per micro-batch and the
single largest activation in the step — bigger than any transformer layer.
The reference pays the same cost through HF's ``CausalLMOutput`` logits
(reference qlora/qlora_monarch.py uses the stock HF loss; there is no
torch equivalent of this op in the reference — it is a TPU-side win).

``chunked_causal_lm_loss`` never materialises the full logits: it scans
over token chunks, computing each chunk's logits inside a
``jax.checkpoint``-ed body so the backward recomputes them chunk-by-chunk
instead of saving them.  Peak extra memory is one ``(chunk, V)`` float32
buffer; the gradient wrt the lm-head weights accumulates across the scan
automatically (closed-over parameters of a ``lax.scan`` body).

Numerics match the materialised path: both compute
``nll = logsumexp(logits_f32) - logits_f32[label]`` with max-subtraction,
mean-reduced over unmasked positions (HF shifted-CE semantics with
``ignore_index`` masking, reference pyreft/loreft/dataset.py:243-244).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def chunked_causal_lm_loss(
    hidden: Array,
    head: Callable[[Array], Array],
    labels: Array,
    *,
    ignore_index: int = -100,
    weights: Array | None = None,
    chunk_size: int = 1024,
) -> Array:
    """Shifted causal-LM cross-entropy without materialising full logits.

    Args:
      hidden: (B, T, H) final hidden states (pre-lm-head).
      head: callable mapping (N, H) -> (N, V) logits (e.g. the lm_head or
        tied-embedding projection).  Its parameters receive gradients
        accumulated across all chunks.
      labels: (B, T) int labels; positions equal to ``ignore_index`` are
        masked out.  Labels are shifted internally (position t predicts
        token t+1), matching ``LlamaForCausalLM.loss``.
      weights: optional (B,) 0/1 per-row mask for padded ragged-tail rows.
      chunk_size: tokens per scan step.  Each step materialises one
        (chunk_size, V) float32 logits buffer; 1024 keeps that at
        ~128 MB-of-traffic/chunk for V=32k while giving the MXU a full
        tile of rows.

    Returns: scalar mean NLL over unmasked positions (float32).
    """
    b, t, h = hidden.shape
    sh = hidden[:, :-1, :].reshape(b * (t - 1), h)
    sl = labels[:, 1:]
    mask = sl != ignore_index
    if weights is not None:
        mask = mask & (weights[:, None] != 0)
    sl = jnp.where(mask, sl, 0).reshape(-1)
    maskf = mask.reshape(-1).astype(jnp.float32)

    n = sh.shape[0]
    c = min(int(chunk_size), n)
    k = -(-n // c)
    pad = k * c - n
    if pad:
        sh = jnp.pad(sh, ((0, pad), (0, 0)))
        sl = jnp.pad(sl, (0, pad))
        maskf = jnp.pad(maskf, (0, pad))
    sh = sh.reshape(k, c, h)
    sl = sl.reshape(k, c)
    maskf = maskf.reshape(k, c)

    @jax.checkpoint
    def chunk_nll(x, y, m):
        logits = head(x).astype(jnp.float32)  # (c, V)
        zmax = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        lse = jnp.log(jnp.sum(jnp.exp(logits - zmax), axis=-1)) + zmax[:, 0]
        gold = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
        return jnp.sum((lse - gold) * m)

    def body(acc, xym):
        x, y, m = xym
        return acc + chunk_nll(x, y, m), None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (sh, sl, maskf))
    return total / jnp.maximum(jnp.sum(maskf), 1.0)


def model_training_loss(model, input_ids, labels, *, attention_mask=None,
                        positions=None, layer_hooks=None, segment_ids=None,
                        weights: Array | None = None,
                        ignore_index: int = -100) -> Array:
    """Forward + shifted CE for any causal-LM of this package (shared
    ``training_loss`` body: llama / gpt2 / gpt-neo / gpt-neox families).
    Dispatches to the chunked loss when ``model.config.loss_chunk > 0``;
    otherwise identical to ``model.loss(model(...), labels)``."""
    hidden, _ = model.model(
        input_ids, attention_mask, positions,
        layer_hooks=layer_hooks, segment_ids=segment_ids)
    chunk = getattr(model.config, "loss_chunk", 0)
    if chunk:
        return chunked_causal_lm_loss(
            hidden, model.logits, labels, ignore_index=ignore_index,
            weights=weights, chunk_size=chunk)
    return model.loss(model.logits(hidden), labels,
                      ignore_index=ignore_index, weights=weights)
