"""Reference-in-the-loop parity tests.

These tests import the reference's own PyTorch implementation from
/root/reference (read-only) and check this repo's JAX ops/layers against it
numerically -- forward, backward, SVD projection, init distributions, and
multi-step adapter training trajectories.  This is the strongest parity
evidence available in a sandbox with no pretrained weights: the comparison
target is the actual reference code, not a reimplementation of it.

The reference imports GPU-only / heavyweight packages at module scope
(`triton` in src/ops/triton.py:3, `bitsandbytes`/`ray`/`wandb` in
train_utils.py:24-29).  None of their functionality is exercised by the
CPU code paths under test, so minimal import stubs are installed here;
the reference's `MonarchLinear` hardcodes ``device="cuda"`` as a default
(src/layers/monarch_linear.py:100) which is rebound to "cpu".
"""

import importlib.machinery
import sys
import types

import pytest

REFERENCE_ROOT = "/root/reference"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (used by transformers'
    # integration probing) sees a well-formed module
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    """Install import stubs; returns the module names actually installed so
    callers can pop them again after the reference modules are imported.

    The stubs must NOT stay in sys.modules: torch/transformers probe for
    e.g. ``triton`` via find_spec and take different (broken) import paths
    when a fake is visible.  Reference modules keep working after the pop --
    their globals hold direct references to the stub objects.
    """
    installed = []
    # --- triton: src/ops/triton.py needs @triton.jit / tl.constexpr /
    # triton.Config / triton.cdiv at import time; kernels are never launched
    # on the CPU paths under test.
    if "triton" not in sys.modules:
        triton = types.ModuleType("triton")
        tl = types.ModuleType("triton.language")
        tl.constexpr = object

        class _StubKernel:
            def __init__(self, fn):
                self.fn = fn

            def __getitem__(self, grid):
                def launcher(*a, **k):
                    raise RuntimeError("triton stub: GPU kernels cannot run here")

                return launcher

        def jit(fn=None, **kw):
            if fn is None:
                return lambda f: _StubKernel(f)
            return _StubKernel(fn)

        triton.jit = jit
        triton.autotune = lambda *a, **k: (lambda fn: fn)
        triton.Config = type("Config", (), {"__init__": lambda self, *a, **k: None})
        triton.cdiv = lambda a, b: (a + b - 1) // b
        triton.language = tl
        triton.__spec__ = importlib.machinery.ModuleSpec("triton", loader=None)
        tl.__spec__ = importlib.machinery.ModuleSpec("triton.language", loader=None)
        sys.modules["triton"] = triton
        sys.modules["triton.language"] = tl
        installed += ["triton", "triton.language"]

    # --- train_utils.py module-scope imports never exercised by init_monarch
    for name, attrs in [
        ("bitsandbytes", {}),
        ("ray", {"tune": types.SimpleNamespace()}),
        ("wandb", {"run": None, "init": lambda *a, **k: None,
                   "log": lambda *a, **k: None,
                   "watch": lambda *a, **k: None, "config": {}}),
    ]:
        if name not in sys.modules:
            _stub_module(name, **attrs)
            installed.append(name)
    return installed


def _pop_stubs(installed):
    for name in installed:
        sys.modules.pop(name, None)


@pytest.fixture(scope="session")
def ref():
    """Namespace of reference modules (imported once, CPU-patched)."""
    installed = _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)  # append: never shadow this repo

    try:
        import src.ops.blockdiag_butterfly_multiply as bbm
        import src.ops.blockdiag_butterfly_einsum as einsum
        import src.ops.blockdiag_multiply as bdm
        import src.ops.low_rank as low_rank
        import src.layers.monarch_linear as ml
    finally:
        _pop_stubs(installed)

    # Rebind the reference's device="cuda" defaults to CPU (positional
    # defaults tuple: nblocks, weights, peft_config, device, dtype, use_triton)
    defaults = list(ml.MonarchLinear.__init__.__defaults__)
    ml.MonarchLinear.__init__.__defaults__ = tuple(
        "cpu" if d == "cuda" else d for d in defaults
    )
    mf_defaults = list(ml.MonarchFactor.__init__.__defaults__ or ())
    ml.MonarchFactor.__init__.__defaults__ = tuple(
        "cpu" if d == "cuda" else d for d in mf_defaults
    )

    return types.SimpleNamespace(
        bbm=bbm, einsum=einsum, bdm=bdm, low_rank=low_rank, ml=ml
    )


@pytest.fixture(scope="session")
def ref_train_utils(ref):
    """The reference's train_utils (init_monarch surgery); imported lazily
    because it drags in transformers' Trainer machinery."""
    # Fully load the transformers pieces train_utils needs BEFORE the stubs
    # go in: a visible fake `triton` flips torch/transformers availability
    # probes onto broken import paths.
    from transformers import Seq2SeqTrainer, Trainer, TrainerCallback  # noqa: F401
    from transformers.utils.import_utils import is_sagemaker_mp_enabled  # noqa: F401

    installed = _install_stubs()
    try:
        import train_utils
    finally:
        _pop_stubs(installed)
    return train_utils
