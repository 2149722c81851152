"""Performance observability: per-kernel timing, bandwidth/roofline
accounting, and jax.profiler trace capture (SURVEY.md §5.1 — the
reference has no tracing at all; BASELINE requires roofline numbers).
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field, asdict
from typing import Callable, Dict, Optional

import jax
import numpy as np

from .config import MGConfig

# Peak HBM bandwidth per chip (bytes/s) by device_kind prefix.
HBM_PEAK = {
    "TPU v2": 700e9, "TPU v3": 900e9, "TPU v4": 1228e9,
    "TPU v5 lite": 819e9, "TPU v5": 2765e9,
    "TPU v6 lite": 1640e9, "TPU v6e": 1640e9,
}


def peak_bandwidth() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_PEAK.items():
        if kind.lower().startswith(k.lower()):
            return v
    return 819e9


def stencil_bytes(n: int, L: int, dtype_bytes: int = 8) -> int:
    """Minimum HBM traffic of one apply_D: read D + read v + write out."""
    return (5 * n * n + 2 * n) * L * L * dtype_bytes


def stencil_nnz(n: int, L: int) -> int:
    return 5 * n * n * L * L


def time_op(fn: Callable, *args, reps: int = 100, warmup: bool = True,
            passes: int = 3) -> float:
    """Best-of-passes seconds per call for a jittable fn, measured as a
    reps-long fori_loop to amortize dispatch.

    Timing discipline for the axon remote-compile relay: there
    `block_until_ready` neither synchronizes nor surfaces errors (both
    happen at first value FETCH), so each measurement fetches an f32
    scalar computed inside the jitted program, and the per-call time is
    the difference between a 2*reps and a reps loop — cancelling the
    (large, variable) dispatch + fetch round-trip latency.

    Programs are compiled via the AOT lower().compile() path (with the
    raised scoped-VMEM limit): on the relay the plain jit dispatch path
    intermittently fails with UNIMPLEMENTED executable-serialization
    errors that the AOT path avoids (utils/compile.aot_call)."""
    import jax.numpy as jnp
    from .utils.compile import _tpu_compiler_options

    def make(r):
        def many(*a):
            def body(i, x):
                return fn(*a[:-1], x)
            x = jax.lax.fori_loop(0, r, body, a[-1])
            return (jnp.real(x) ** 2 + jnp.imag(x) ** 2).sum().astype(
                jnp.float32)
        return jax.jit(many).lower(*args).compile(_tpu_compiler_options())

    best = []
    for g in (make(reps), make(2 * reps)):
        float(g(*args))   # compile + force execution (the value may
        # legitimately overflow — e.g. many smoother sweeps of an
        # indefinite operator — so only the fetch itself is checked)
        b = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            float(g(*args))                      # fetch = the only real sync
            b = min(b, time.perf_counter() - t0)
        best.append(b)
    return max((best[1] - best[0]) / reps, 1e-12)


@dataclass
class RooflineRow:
    name: str
    sec: float
    bytes: int
    flops: int = 0
    bw_frac: float = 0.0

    def finish(self, peak: float):
        self.bw_frac = self.bytes / self.sec / peak
        return self


def roofline_table(cfg: MGConfig, D, v, r=None) -> Dict:
    """Measure the hot kernels of one level against the HBM roofline."""
    from .ops.stencil import apply_D, site_inverse
    from .ops.smoothers import jacobi_sweep, rbgs_sweep

    n, L = v.shape[0], v.shape[-1]
    dbytes = 8 if cfg.dtype == "complex64" else 16
    peak = peak_bandwidth()
    Dinv = site_inverse(D[0])
    if r is None:
        r = v * 0
    rows = []
    rows.append(RooflineRow(
        "apply_D", time_op(lambda D, x: apply_D(D, x), D, v),
        stencil_bytes(n, L, dbytes)).finish(peak))
    rows.append(RooflineRow(
        "jacobi_sweep",
        time_op(lambda D, x: jacobi_sweep(D, Dinv, x, r), D, v),
        # hop reads D(4 dirs)+v, reads r and Dinv, writes out
        ((4 * n * n + n * n) + 3 * n) * L * L * dbytes).finish(peak))
    rows.append(RooflineRow(
        "rbgs_sweep",
        time_op(lambda D, x: rbgs_sweep(D, Dinv, x, r), D, v),
        2 * ((4 * n * n + n * n) + 3 * n) * L * L * dbytes).finish(peak))
    try:
        from .ops import pallas_stencil as ps
        if ps.use_pallas(v.dtype, n, L):
            rows.append(RooflineRow(
                "apply_D_pallas",
                time_op(lambda D, x: ps.apply_D_pallas(D, x), D, v),
                stencil_bytes(n, L, dbytes)).finish(peak))
            rows.append(RooflineRow(
                "jacobi_pallas",
                time_op(lambda D, x: ps.jacobi_smooth_pallas(D, Dinv, x, r,
                                                             1), D, v),
                ((4 * n * n + n * n) + 3 * n) * L * L * dbytes).finish(peak))
        elif ps.smoother_mode(v.dtype, n, L) == "tiled":
            rows.append(RooflineRow(
                "apply_D_pallas_tiled",
                time_op(lambda D, x: ps.apply_D_pallas_tiled(D, x), D, v),
                stencil_bytes(n, L, dbytes)).finish(peak))
            rows.append(RooflineRow(
                "jacobi_pallas_tiled",
                time_op(lambda D, x: ps.smooth_pallas_tiled(
                    D, Dinv, x, r, 1, "jacobi"), D, v),
                ((4 * n * n + n * n) + 3 * n) * L * L * dbytes).finish(peak))
    except Exception:
        pass
    return {"device": jax.devices()[0].device_kind,
            "peak_bytes_per_s": peak,
            "rows": [asdict(x) for x in rows]}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpumg_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
