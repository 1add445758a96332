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
skipped.  ``save_pyvene_interventions`` is the reverse direction: it writes
the same ``intkey_*.bin`` files so a reference ``IntervenableModel`` can
``load_intervention`` states trained here.  (Our own round-trip format is
``ReftModel.save_interventions``, npz.)
"""

import os
import re
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["load_pyvene_interventions", "save_pyvene_interventions"]

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
        _set(iv.w, _np(sd.get("learned_source.weight", sd["weight"])).T,
             f"{key}: w")
        _set(iv.b, _np(sd.get("learned_source.bias", sd["bias"])),
             f"{key}: b")
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
        _set(iv.learned_source.weight,
             _np(sd.get("learned_source.weight", sd["weight"])),
             f"{key}: learned_source")
        b = sd.get("learned_source.bias", sd.get("bias"))
        if b is not None and iv.learned_source.bias is not None:
            _set(iv.learned_source.bias, _np(b), f"{key}: bias")
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


def _pyvene_key(layer: int, comp: str, k: int) -> str:
    """pyvene's representation key for the default pyreft config (unit
    "pos", max_number_of_units 1; reference intervenable_base.py:209-226)."""
    return f"layer.{layer}.comp.{comp}.unit.pos.nunit.1#{k}"


def _buffers(d: int):
    import torch
    return {"embed_dim": torch.tensor(d), "interchange_dim": torch.tensor(d)}


def _parametrized_rotation(R: np.ndarray):
    """Encode a materialized semi-orthogonal (d, r) rotation as the
    ``parametrizations.orthogonal`` state tensors torch's DEFAULT strict
    ``load_state_dict`` expects (Consreft has no custom loader), via the
    parametrization's own right_inverse."""
    import torch

    d, r = R.shape

    class _W(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.empty(d, r))

    mod = torch.nn.utils.parametrizations.orthogonal(_W())
    with torch.no_grad():
        mod.weight = torch.tensor(R)
    sd = mod.state_dict()
    return {f"rotate_layer.{k}": v for k, v in sd.items()}


def _export(iv, key: str):
    """Inverse of ``_apply``: one reference-format state_dict per class."""
    import torch

    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ConsreftIntervention,
        LoreftIntervention,
        MoReIntervention,
        NoreftIntervention,
    )

    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    # Loreft/MoRe save format note: the reference's own save writes the
    # learned source under bare "weight"/"bias" keys, which its reload
    # (``super().load_state_dict(sd, strict=False)``, interventions.py:49-57)
    # can never match against the module's "learned_source.*" paths -- the
    # reference silently restores ONLY the rotation.  We export BOTH
    # spellings: the bare keys for byte-compatibility with reference-written
    # checkpoints, and the prefixed keys so the reference's loader actually
    # restores the learned source from ours.
    if isinstance(iv, LoreftIntervention):
        w = t(iv.w[...]).T.contiguous()
        return {"weight": w, "bias": t(iv.b[...]),
                "learned_source.weight": w, "learned_source.bias": t(iv.b[...]),
                "rotate_layer": t(iv.rotate[...])}
    if isinstance(iv, MoReIntervention):
        w = t(iv.learned_source.weight[...])
        sd = {"weight": w, "learned_source.weight": w,
              "rotate_layer": t(iv.rotate_layer.weight[...])}
        if iv.learned_source.bias is not None:
            sd["bias"] = t(iv.learned_source.bias[...])
            sd["learned_source.bias"] = sd["bias"]
        return sd
    if isinstance(iv, NoreftIntervention):
        sd = {"proj_layer.weight": t(iv.proj[...]).T.contiguous(),
              "learned_source.weight": t(iv.w[...]).T.contiguous(),
              "learned_source.bias": t(iv.b[...]),
              **_buffers(iv.proj[...].shape[0])}
        if iv.proj_b is not None:
            sd["proj_layer.bias"] = t(iv.proj_b[...])
        return sd
    if isinstance(iv, ConsreftIntervention):
        R = np.asarray(iv.rotate[...], np.float32)
        return {"learned_source": t(iv.source[...]),
                **_buffers(R.shape[0]),
                **_parametrized_rotation(R)}
    return None  # stateless -- the reference writes no binary either


def save_pyvene_interventions(reft_model, directory: str) -> List[str]:
    """Write this ReftModel's intervention state as the reference's
    ``intkey_*.bin`` files, loadable onto a matching ``IntervenableModel``
    with ``load_intervention(directory, include_model=False)`` (reference
    intervenable_base.py:543-558).  Returns the filenames written."""
    import torch

    os.makedirs(directory, exist_ok=True)
    written = []
    counters = {}
    for iv, layer, comp in zip(reft_model.interventions,
                               reft_model.intervention_layers,
                               reft_model.intervention_components):
        k = counters.get((layer, comp), 0)
        counters[(layer, comp)] = k + 1
        sd = _export(iv, _pyvene_key(layer, comp, k))
        if sd is None:
            continue
        fname = f"intkey_{_pyvene_key(layer, comp, k)}.bin"
        torch.save(sd, os.path.join(directory, fname))
        written.append(fname)
    return written
