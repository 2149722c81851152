"""Compilation utilities.

`aot_call`: ahead-of-time lower+compile a jitted function and invoke the
compiled executable directly. On standard backends this is equivalent to
calling the jit; on relay-style remote backends (e.g. the tunneled 'axon'
TPU platform) the plain jit dispatch path can hit an UNIMPLEMENTED
executable-serialization round-trip, while the AOT lower().compile()
path works reliably — so the solver drivers route their large programs
through this helper.
"""
from __future__ import annotations

import jax

_cache: dict = {}


def aot_call(fn, *args, static_argnames=(), key=None):
    """Compile fn for these args (cached by (fn, key/shapes)) and call it."""
    jitted = jax.jit(fn, static_argnames=static_argnames)
    if key is None:
        key = (id(fn), jax.tree_util.tree_structure(args),
               tuple((a.shape, str(a.dtype)) for a in jax.tree_util.tree_leaves(args)
                     if hasattr(a, "shape")))
    compiled = _cache.get(key)
    if compiled is None:
        compiled = jitted.lower(*args).compile()
        _cache[key] = compiled
    return compiled(*args)


def clear_cache():
    _cache.clear()
