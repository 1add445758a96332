import pytest
torch = pytest.importorskip("torch")
import importlib.util, sys

def test_probe(ref):
    pyvene_root = "/root/reference/pyreft/pyvene"
    if pyvene_root not in sys.path:
        sys.path.append(pyvene_root)
    spec = importlib.util.spec_from_file_location(
        "ref_pyreft_interventions",
        "/root/reference/pyreft/pyreft/interventions.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name in ("LoreftIntervention", "ConsreftIntervention",
                 "NoreftIntervention", "MoreftIntervention",
                 "MoReIntervention"):
        cls = getattr(mod, name, None)
        if cls is None:
            print(name, "-> absent")
            continue
        try:
            iv = cls(embed_dim=32, low_rank_dimension=4)
        except Exception as e:
            print(name, "init failed:", e)
            continue
        print(name, {k: tuple(v.shape) for k, v in iv.state_dict().items()})
