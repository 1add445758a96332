"""Distributed Alignment Search (DAS) training.

pyvene's headline workflow (reference pyvene tutorials +
models/interventions.py RotatedSpaceIntervention): given a high-level
:class:`CausalModel` and a trained neural network, learn a (low-rank)
rotation such that interchanging the rotated coordinates of a hidden state
reproduces the causal model's counterfactual behavior -- evidence that the
causal variable is linearly encoded at that location.

TPU-native shape: the whole search step is one jitted function -- the
source forward, the intervened base forward (functional ``layer_hooks``,
no torch hooks), the counterfactual loss, and an optimizer update over
ONLY the intervention's trainable parameters (``AdapterParam`` typing; the
wrapped network's plain ``nnx.Param`` weights stay frozen, the optimizer
never materializes state for them).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import AdapterParam

__all__ = ["train_das", "interchange_accuracy"]


def _default_loss(logits, labels):
    """Cross-entropy for integer class labels (b,)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(
        logp, labels[:, None].astype(jnp.int32), axis=-1).mean()


def train_das(reft, base_ids, source_ids, labels, *, base_locations,
              source_locations, steps: int = 200, learning_rate: float = 1e-2,
              loss_fn: Optional[Callable] = None, attention_mask=None,
              log_every: int = 0):
    """Fit the wrapped model's trainable interventions so that
    ``swap_forward(base, source)`` predicts the COUNTERFACTUAL ``labels``
    (e.g. from ``CausalModel.generate_counterfactual_dataset``).

    Only parameters typed ``AdapterParam`` train (every trainable
    intervention stores its weights that way); the base network is frozen
    by construction.  Returns the per-step loss history (list of float).
    """
    loss_fn = loss_fn or _default_loss
    tx = optax.adam(learning_rate)
    opt = nnx.Optimizer(reft, tx, wrt=nnx.OfType(AdapterParam))

    @nnx.jit
    def step(reft, opt, base, source, y):
        def objective(m):
            logits = m.swap_forward(base, source,
                                    base_locations=base_locations,
                                    source_locations=source_locations,
                                    base_mask=attention_mask,
                                    source_mask=attention_mask)
            return loss_fn(logits, y)

        loss, grads = nnx.value_and_grad(
            objective, argnums=nnx.DiffState(0, nnx.OfType(AdapterParam)))(reft)
        opt.update(reft, grads)
        return loss

    history = []
    for i in range(steps):
        loss = float(step(reft, opt, base_ids, source_ids, labels))
        history.append(loss)
        if log_every and i % log_every == 0:
            print(f"das step {i}: loss {loss:.4f}")
    return history


def interchange_accuracy(reft, base_ids, source_ids, labels, *,
                         base_locations, source_locations,
                         attention_mask=None) -> float:
    """Fraction of examples where the intervened forward's argmax equals
    the causal model's counterfactual label."""
    logits = reft.swap_forward(base_ids, source_ids,
                               base_locations=base_locations,
                               source_locations=source_locations,
                               base_mask=attention_mask,
                               source_mask=attention_mask)
    pred = jnp.argmax(logits, axis=-1)
    return float((pred == labels.astype(pred.dtype)).mean())
