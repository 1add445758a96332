"""Import intervention checkpoints saved by the reference's pyvene engine.

``IntervenableModel.save`` writes one ``intkey_layer.{l}.comp.{c}.unit.{u}
.nunit.{n}#{k}.bin`` torch state_dict per trainable intervention (reference
intervenable_base.py:379-440); the pyreft interventions override
``state_dict`` to store the MATERIALIZED rotation (reference pyreft
interventions.py:39-57,125-143), so most weights copy through directly:

* Loreft:  ``rotate_layer`` (d, r) -> rotate; ``weight`` (r, d) -> w.T;
  ``bias`` -> b
* Noreft:  default torch state_dict -- proj_layer/learned_source Linears
* Consreft: default torch state_dict -- the rotation is parametrized
  (``rotate_layer.parametrizations.weight.{original,0.base}``), so it is
  materialized by loading into a torch ``orthogonal``-parametrized module
  exactly the way the reference itself reloads it
* MoRe:    ``weight`` (learned-source MonarchFactor blocks) ->
  learned_source.weight; ``rotate_layer`` (materialized orthogonal blocks)
  -> rotate_layer.weight

Stateless interventions (No/Zero/Vanilla/...) have no binary and are
skipped.  This is import-only: our own round-trip format is
``ReftModel.save_interventions`` (npz).
"""

import os
import re
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["load_pyvene_interventions"]

_FNAME = re.compile(
    r"intkey_layer\.(\d+)\.comp\.([\w.]+)\.unit\.\w+\.nunit\.\d+#(\d+)\.bin$")


def _np(t) -> np.ndarray:
    return t.detach().cpu().float().numpy() if hasattr(t, "detach") \
        else np.asarray(t)


def _set(param, value: np.ndarray, what: str) -> None:
    cur = param[...]
    if tuple(cur.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch for {what}: checkpoint {tuple(value.shape)} vs "
            f"model {tuple(cur.shape)} -- was the ReftModel built with the "
            "same representations (layer/intervention/low_rank_dimension)?")
    param.set_value(jnp.asarray(value, dtype=cur.dtype))


def _materialize_orthogonal(sd, prefix: str) -> np.ndarray:
    """Materialize a torch ``parametrizations.orthogonal`` rotation from its
    saved ``original``/``base`` tensors, via torch itself (the same math the
    reference uses on reload)."""
    import torch

    orig = sd[f"{prefix}.parametrizations.weight.original"]
    d, r = orig.shape

    class _W(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.empty(d, r))

    mod = torch.nn.utils.parametrizations.orthogonal(_W())
    state = {"parametrizations.weight.original": orig}
    base_key = f"{prefix}.parametrizations.weight.0.base"
    if base_key in sd:
        state["parametrizations.weight.0.base"] = sd[base_key]
    mod.load_state_dict(state, strict=False)
    with torch.no_grad():
        return _np(mod.weight)


def _apply(iv, sd, key: str) -> None:
    """Map one reference intervention state_dict onto our module."""
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ConsreftIntervention,
        LoreftIntervention,
        MoReIntervention,
        NoreftIntervention,
    )
    if isinstance(iv, LoreftIntervention):
        _set(iv.rotate, _np(sd["rotate_layer"]), f"{key}: rotate")
        _set(iv.w, _np(sd["weight"]).T, f"{key}: w")
        _set(iv.b, _np(sd["bias"]), f"{key}: b")
    elif isinstance(iv, NoreftIntervention):
        _set(iv.proj, _np(sd["proj_layer.weight"]).T, f"{key}: proj")
        if "proj_layer.bias" in sd and iv.proj_b is not None:
            _set(iv.proj_b, _np(sd["proj_layer.bias"]), f"{key}: proj_b")
        _set(iv.w, _np(sd["learned_source.weight"]).T, f"{key}: w")
        _set(iv.b, _np(sd["learned_source.bias"]), f"{key}: b")
    elif isinstance(iv, ConsreftIntervention):
        _set(iv.source, _np(sd["learned_source"]), f"{key}: source")
        _set(iv.rotate, _materialize_orthogonal(sd, "rotate_layer"),
             f"{key}: rotate")
    elif isinstance(iv, MoReIntervention):
        _set(iv.learned_source.weight, _np(sd["weight"]),
             f"{key}: learned_source")
        if "bias" in sd and iv.learned_source.bias is not None:
            _set(iv.learned_source.bias, _np(sd["bias"]), f"{key}: bias")
        _set(iv.rotate_layer.weight, _np(sd["rotate_layer"]), f"{key}: rotate")
    else:
        raise KeyError(
            f"no import mapping for {type(iv).__name__} (checkpoint {key})")


def load_pyvene_interventions(reft_model, directory: str, *,
                              strict: bool = True) -> Tuple[List[str], List[str]]:
    """Load a reference ``IntervenableModel.save`` directory into a
    ``ReftModel`` built with the same representations.

    Binaries are matched to interventions by (layer, component) in
    registration order (pyvene's ``#k`` collision counter).  Returns
    (loaded_files, skipped_files); with ``strict`` unmatched binaries raise.
    """
    import torch

    by_site = {}
    for fname in sorted(os.listdir(directory)):
        m = _FNAME.match(fname)
        if not m:
            continue
        layer, comp, k = int(m.group(1)), m.group(2), int(m.group(3))
        by_site[(layer, comp, k)] = fname

    loaded, skipped = [], []
    counters = {}
    for iv, layer, comp in zip(reft_model.interventions,
                               reft_model.intervention_layers,
                               reft_model.intervention_components):
        k = counters.get((layer, comp), 0)
        counters[(layer, comp)] = k + 1
        fname = by_site.pop((layer, comp, k), None)
        if fname is None:
            continue  # stateless interventions have no binary
        sd = torch.load(os.path.join(directory, fname), map_location="cpu",
                        weights_only=True)
        try:
            _apply(iv, sd, fname)
        except KeyError:
            if strict:
                raise
            skipped.append(fname)
            continue
        loaded.append(fname)
    if by_site:
        stray = sorted(by_site.values())
        if strict:
            raise KeyError(
                f"checkpoint binaries with no matching intervention: {stray} "
                "-- build the ReftModel with the same representations")
        skipped.extend(stray)
    return loaded, skipped
