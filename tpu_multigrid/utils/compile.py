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

import os

import jax

_cache: dict = {}

# Default on-disk XLA compilation cache location (enable_persistent_cache).
DEFAULT_CACHE_DIR = os.environ.get(
    "TPU_MG_COMPILE_CACHE", os.path.expanduser("~/.cache/tpu_multigrid_xla"))

_persistent_enabled = False


def enable_persistent_cache(path: str | None = None,
                            force: bool = False) -> str:
    """Enable JAX's on-disk XLA compilation cache (TPU platforms only
    unless force=True).

    Driver runs pay ~100 s of setup recompilation per process start
    (per-(cfg,shape) aot_call executables); with the persistent cache a
    second process start with the same shapes hits the disk cache and
    skips XLA compilation entirely — measured through the axon relay:
    114.5 s remote compile -> 0.58 s disk load. Safe to call multiple
    times. Set TPU_MG_COMPILE_CACHE=0 to disable. Returns the cache dir
    ('' if disabled).

    CPU gating: XLA:CPU AOT cache entries are specialized to the exact
    host CPU features — loading entries written by a different machine
    (or toolchain) warns 'could lead to execution errors such as
    SIGILL'. CPU compiles are fast anyway, so the cache only engages on
    tpu/axon."""
    global _persistent_enabled
    path = path or DEFAULT_CACHE_DIR
    if not path or path == "0":
        return ""
    if not force:
        try:
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return ""
        except Exception:
            return ""
    if not _persistent_enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_enable_compilation_cache", True)
        # cache every program: MG solves contain many medium programs
        # whose individual XLA compile times sit below the 1 s default
        # threshold (verified: with 0.2 nothing was written)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass     # knob renamed/absent in some jax versions
        _persistent_enabled = True
    return path


def disable_persistent_cache() -> None:
    """Turn the on-disk cache back off and drop jax's initialized cache
    object. Needed by tests that force-enable the cache on CPU: leaving
    it enabled makes every LATER large XLA:CPU compile in the process
    attempt an executable serialization into the cache dir — measured to
    segfault the interpreter flakily (crash inside
    compilation_cache.put_executable_and_time during an unrelated
    solve); runs only 'passed' when the entries already existed so the
    write path was skipped."""
    global _persistent_enabled
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass
    try:
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:
        pass
    _persistent_enabled = False

# TPU scoped-VMEM limit for compiled solver programs, KiB. The compiler's
# default stack limit is 16 MiB; our whole-lattice Pallas smoother kernels
# need ~20 MiB of scoped VMEM when embedded in a full MG-cycle program
# (observed: rbgs at n=4, L=128 inside solve_chunked asks for 19.43M and
# the compile fails deterministically under the default limit). v5e has
# 128 MiB of physical VMEM per core; 96 MiB (raised from 64 in r5 — the
# double-buffered links kernel at TX=128/L=4096 needs ~70 MiB, and the
# whole r5 kernel-tuner sweep compiled and validated at 96 MiB) still
# leaves room for XLA's own prefetch buffers. Override with
# TPU_MG_SCOPED_VMEM_KIB=0 to disable.
SCOPED_VMEM_KIB = int(os.environ.get("TPU_MG_SCOPED_VMEM_KIB", 98304))


def _tpu_compiler_options():
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return None
    if plat in ("tpu", "axon") and SCOPED_VMEM_KIB:
        return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
    return None


def _args_signature(args):
    """Shapes + dtypes + shardings of every array leaf, plus the platform.

    The sharding term is essential: a compiled executable is specialized to
    its input shardings, so the same fn/shapes compiled for single-device
    arrays must NOT be reused for mesh-sharded arrays (that exact collision
    broke the round-2 multichip dry run — a single-device `build_ntl`
    executable was served to `build_hierarchy_sharded`'s sharded args)."""
    leaves = []
    for a in jax.tree_util.tree_leaves(args):
        if hasattr(a, "shape"):
            sh = getattr(a, "sharding", None)
            leaves.append((a.shape, str(getattr(a, "dtype", "?")),
                           repr(sh) if sh is not None else None))
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "?"
    return (jax.tree_util.tree_structure(args), tuple(leaves), platform)


def aot_call(fn, *args, static_argnames=(), key=None):
    """Compile fn for these args and call the compiled executable.

    Cache key = (key or id(fn)) + full argument signature (shapes, dtypes,
    shardings, platform). A caller-supplied `key` is only a *prefix* — it
    can merge fewer things than the default (e.g. ignore id(fn) identity
    across closures) but can never merge args that need distinct
    executables."""
    jitted = jax.jit(fn, static_argnames=static_argnames)
    full_key = (key if key is not None else id(fn), _args_signature(args))
    compiled = _cache.get(full_key)
    if compiled is None:
        compiled = jitted.lower(*args).compile(_tpu_compiler_options())
        _cache[full_key] = compiled
    return compiled(*args)


def clear_cache():
    _cache.clear()
