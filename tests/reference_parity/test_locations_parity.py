"""Differential test of intervention-location generation vs the reference.

The training signal of every ReFT run flows through
``get_intervention_locations`` (which token positions each per-layer
intervention edits, with -1/post padding); this imports the reference's
pyreft/pyreft/dataset.py by file path and sweeps both implementations
across the full argument grid.
"""

import importlib.machinery
import importlib.util
import sys
import types

import pytest

torch = pytest.importorskip("torch")

from sparse_matrix_fine_tuning_tpu.data.reasoning import (  # noqa: E402
    get_intervention_locations,
    parse_positions,
)


@pytest.fixture(scope="module")
def ref_ds():
    stubs = {}
    for name in ["datasets", "tqdm"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            if name == "datasets":
                mod.load_dataset = None
                mod.Dataset = object
            if name == "tqdm":
                mod.tqdm = lambda x, *a, **k: x
            sys.modules[name] = mod
            stubs[name] = mod
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_pyreft_dataset", "/root/reference/pyreft/pyreft/dataset.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    return mod


def test_parse_positions_matches_reference(ref_ds):
    for s in ["f7+l7", "f5", "l3", "f1+l0", "f0+l4", "f12+l12", "f0", "l0"]:
        assert parse_positions(s) == ref_ds.parse_positions(s), s


def test_get_intervention_locations_matches_reference_full_grid(ref_ds):
    checked = 0
    for last_position in [1, 2, 3, 5, 8, 14, 40]:
        for first_n, last_n in [(0, 0), (7, 7), (3, 0), (0, 3), (5, 2),
                                (1, 9), (20, 20)]:
            for num_interventions in [1, 2, 4, 8]:
                for share_weights in [False, True]:
                    for pad_mode in ["first", "last"]:
                        want = ref_ds.get_intervention_locations(
                            last_position=last_position, first_n=first_n,
                            last_n=last_n,
                            num_interventions=num_interventions,
                            share_weights=share_weights, pad_mode=pad_mode)
                        got = get_intervention_locations(
                            last_position=last_position, first_n=first_n,
                            last_n=last_n,
                            num_interventions=num_interventions,
                            share_weights=share_weights, pad_mode=pad_mode)
                        assert got == want, (
                            last_position, first_n, last_n,
                            num_interventions, share_weights, pad_mode)
                        checked += 1
    assert checked == 7 * 7 * 4 * 2 * 2
