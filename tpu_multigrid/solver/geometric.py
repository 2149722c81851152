"""Generation-1 capability: geometric multigrid for the free 2D Laplace
equation (real scalar field), reproducing the reference's
code/1_laplace_scalar/2D_laplace_Mgrid.cpp behaviors:

- operator:  (A phi)(x) = (1/a^2) [ sum_ngb phi - (4 + m^2 a^2) phi ]
  (2D_laplace_Mgrid.cpp:31-33; note m enters squared, unlike adaptive gens)
- lattice spacing doubles per level: a[l] = 2 a[l-1]  (:143)
- restriction: 4-point block average of the residual (:84-86)
- prolongation: piecewise-constant injection, additive (:96-101)
- smoother: phi <- scale (sum_ngb phi - r a^2), scale = 1/(4 + m^2 a^2) (:62-64)
- convergence: SUM of |r| (absolute L1, not relative) < threshold (:44-48)
- the coarsest level's residual is computed but never smoothed (gen-1
  quirk: down loop stops at nlevels-1, up loop starts there; :174-184)

Default config = the reference's hardcoded run: L=2048, m=0.002, 9 levels,
20 sweeps, threshold 1e-14 (:118-123) — BASELINE config 1 uses a 64^2
2-level variant with Jacobi.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GeoConfig:
    L: int = 2048
    m: float = 0.002
    nlevels: int = 9
    num_iters: int = 20
    max_iters: int = 10000
    res_threshold: float = 1.0e-14
    smoother: str = "rbgs"        # 'jacobi' | 'rbgs' | 'gs_lex'
    dtype: str = "float64"

    @property
    def sizes(self) -> Tuple[int, ...]:
        return tuple(self.L // (2 ** l) for l in range(self.nlevels + 1))

    @property
    def spacings(self) -> Tuple[float, ...]:
        return tuple(float(2 ** l) for l in range(self.nlevels + 1))

    @property
    def scales(self) -> Tuple[float, ...]:
        return tuple(1.0 / (4.0 + self.m ** 2 * a * a) for a in self.spacings)

    @property
    def rdtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32


def _ngb_sum(phi):
    return (jnp.roll(phi, -1, 0) + jnp.roll(phi, 1, 0)
            + jnp.roll(phi, -1, 1) + jnp.roll(phi, 1, 1))


def geo_residual(phi, b, level: int, cfg: GeoConfig):
    a = cfg.spacings[level]
    return b - (1.0 / (a * a)) * (_ngb_sum(phi) - phi / cfg.scales[level])


def geo_residue_l1(phi, b, cfg: GeoConfig):
    """Reference norm: sum |r| at level 0 (2D_laplace_Mgrid.cpp:44-48)."""
    return jnp.sum(jnp.abs(geo_residual(phi, b, 0, cfg)))


def _geo_sweep(phi, r, level, cfg, parity=None):
    a = cfg.spacings[level]
    upd = cfg.scales[level] * (_ngb_sum(phi) - r * a * a)
    if parity is None:
        return upd
    return jnp.where(parity, upd, phi)


def geo_smooth(phi, r, level: int, n_sweeps: int, cfg: GeoConfig):
    L = phi.shape[-1]
    if cfg.smoother == "jacobi":
        def body(_, phi):
            return _geo_sweep(phi, r, level, cfg)
    elif cfg.smoother == "gs_lex":
        # Exact in-place lexicographic GS (the reference's relax,
        # 2D_laplace_Mgrid.cpp:59-64, order for x { for y }) via the
        # anti-diagonal wavefront identity (see ops.smoothers.gs_lex_sweep).
        x = jnp.arange(L)[:, None]
        y = jnp.arange(L)[None, :]
        diag = x + y

        def body(_, phi):
            def wave(d, phi):
                return jnp.where(diag == d,
                                 _geo_sweep(phi, r, level, cfg), phi)
            return jax.lax.fori_loop(0, 2 * L - 1, wave, phi)
    else:  # red-black GS
        x = jnp.arange(L)[:, None]
        y = jnp.arange(L)[None, :]
        red = ((x + y) % 2) == 0

        def body(_, phi):
            phi = _geo_sweep(phi, r, level, cfg, red)
            return _geo_sweep(phi, r, level, cfg, ~red)

    return jax.lax.fori_loop(0, n_sweeps, body, phi)


def geo_restrict(res):
    """4-point average: [L, L] -> [L/2, L/2]."""
    L = res.shape[-1]
    return 0.25 * res.reshape(L // 2, 2, L // 2, 2).sum(axis=(1, 3))


def geo_prolong(coarse):
    """Constant injection: [Lc, Lc] -> [2Lc, 2Lc]."""
    Lc = coarse.shape[-1]
    out = jnp.broadcast_to(coarse[:, None, :, None], (Lc, 2, Lc, 2))
    return out.reshape(2 * Lc, 2 * Lc)


def geo_vcycle(phis: Tuple, b, cfg: GeoConfig) -> Tuple:
    """One gen-1 V-cycle (2D_laplace_Mgrid.cpp:171-184)."""
    n = cfg.nlevels
    phis = list(phis)
    rs = [b] + [None] * n
    for l in range(n):
        phis[l] = geo_smooth(phis[l], rs[l], l, cfg.num_iters, cfg)
        rs[l + 1] = geo_restrict(geo_residual(phis[l], rs[l], l, cfg))
        phis[l + 1] = jnp.zeros_like(phis[l + 1])
    # reference quirk: coarsest level is never smoothed (up loop starts
    # at nlevels-1)
    for l in range(n - 1, -1, -1):
        phis[l] = geo_smooth(phis[l], rs[l], l, cfg.num_iters, cfg)
        if l > 0:
            phis[l - 1] = phis[l - 1] + geo_prolong(phis[l])
            phis[l] = jnp.zeros_like(phis[l])
    return tuple(phis)


def geo_source(cfg: GeoConfig):
    """Reference sources (2D_laplace_Mgrid.cpp:163)."""
    b = jnp.zeros((cfg.L, cfg.L), cfg.rdtype)
    return b.at[0, 0].set(1.0).at[1, 0].set(2.0) \
            .at[2, 2].set(5.0).at[3, 3].set(7.5)


def geo_solve(b, cfg: GeoConfig, max_iters: Optional[int] = None,
              chunk: int = 5):
    """Chunked outer loop; returns (phi, iters, resmag, history)."""
    from ..utils.compile import aot_call
    max_iters = max_iters or cfg.max_iters
    phis = tuple(jnp.zeros((s, s), cfg.rdtype) for s in cfg.sizes)

    def run_chunk(phis, b):
        def body(_, phis):
            return geo_vcycle(phis, b, cfg)
        phis = jax.lax.fori_loop(0, chunk, body, phis)
        return phis, geo_residue_l1(phis[0], b, cfg)

    it = 0
    hist = []
    resmag = float("inf")
    while it < max_iters:
        phis, res = aot_call(run_chunk, phis, b, key=("geo", cfg, chunk))
        it += chunk
        resmag = float(res)
        hist.append(resmag)
        if resmag < cfg.res_threshold or resmag > 1e6 \
                or not np.isfinite(resmag):
            break
    return np.asarray(phis[0]), it, resmag, np.asarray(hist)
