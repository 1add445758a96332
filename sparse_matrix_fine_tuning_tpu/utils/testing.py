"""Cached tiny-model factory for tests and demos.

Building even a ``.tiny()`` NNX model costs seconds of Python trace +
init work on one CPU core, while cloning an already-built model costs
milliseconds; a test suite that constructs ~50 tiny models pays minutes
for what is logically one build per distinct config.  ``fresh_model``
builds each (class, config, seed) once per process and hands every caller
an independent copy — bit-identical to a direct construction with the
same seed.

The copy duplicates every array buffer, not just the NNX variables:
plain ``nnx.clone`` aliases the cached instance's ``jax.Array``s, and a
donating jitted train step (``donate_argnums`` on the state) would delete
those shared buffers out from under the cache and every later clone.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
from flax import nnx

_CACHE: Dict[Tuple[str, str, str, int], Any] = {}

# default object.__repr__ (or any repr embedding an address) is not a value
# encoding: after GC an unrelated config can reuse the address and silently
# alias a cache entry; '...' means a numpy/jax array repr elided values
_UNFAITHFUL_REPR = re.compile(r" at 0x[0-9a-f]+>|\.\.\.")


def fresh_model(cls, config, seed: int = 0):
    """A fresh, independent instance of ``cls(config, rngs=nnx.Rngs(seed))``.

    The first call per (class, config, seed) builds and caches; later calls
    return a buffer-deep copy of the cached instance.  The config is keyed
    by ``repr`` (dataclass reprs cover every field), so two configs
    constructed with the same arguments share one build.  Configs whose
    repr is not a faithful value encoding (default ``object.__repr__``
    addresses, elided array reprs) are built fresh every call rather than
    risking a silent wrong-config cache hit.
    """
    key = (cls.__module__, cls.__qualname__, repr(config), seed)
    if _UNFAITHFUL_REPR.search(key[2]):
        return cls(config, rngs=nnx.Rngs(seed))
    if key not in _CACHE:
        _CACHE[key] = cls(config, rngs=nnx.Rngs(seed))
    graphdef, state = nnx.split(_CACHE[key])
    state = jax.tree.map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, state)
    return nnx.merge(graphdef, state)


def clear_model_cache() -> None:
    """Drop all cached builds (frees their parameter arrays)."""
    _CACHE.clear()
