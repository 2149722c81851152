"""Generation-1 1D capability: plain Jacobi / Gauss-Seidel solvers and the
1D geometric multigrid V-cycle (reference code/1_laplace_scalar/
1D_laplace_solvers.cpp and 1D_laplace_Mgrid.cpp).

Operator: (A phi)(x) = (1/a^2) [ phi(x+1) + phi(x-1) - (2 + m^2 a^2) phi(x) ]
on the periodic 1D lattice; scale[l] = 1/(2 + m^2 a_l^2), a_l = 2 a_{l-1}
(1D_laplace_Mgrid.cpp:116-135). Restriction = pairwise mean x 0.5? No —
0.5 * (r[2x] + r[2x+1]) (a plain average, :72); interpolation = constant
injection (:85-87); smoother phi <- scale (phi(x+1) + phi(x-1) - r a^2).

In 1D the in-place GS dependency chain is strictly sequential (no
wavefront parallelism), so gs_lex uses lax.scan over sites — fine for the
reference's L<=512.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Geo1DConfig:
    L: int = 512
    m: float = 0.005
    nlevels: int = 6
    num_iters: int = 80
    max_iters: int = 10000
    res_threshold: float = 1.0e-15
    smoother: str = "rbgs"   # 'jacobi' | 'rbgs' | 'gs_lex'

    @property
    def sizes(self):
        return tuple(self.L // (2 ** l) for l in range(self.nlevels + 1))

    @property
    def spacings(self):
        return tuple(float(2 ** l) for l in range(self.nlevels + 1))

    @property
    def scales(self):
        return tuple(1.0 / (2.0 + self.m ** 2 * a * a)
                     for a in self.spacings)


def _ngb(phi):
    return jnp.roll(phi, -1) + jnp.roll(phi, 1)


def residual_1d(phi, b, level, cfg):
    a = cfg.spacings[level]
    return b - (1.0 / (a * a)) * (_ngb(phi) - phi / cfg.scales[level])


def smooth_1d(phi, r, level, n_sweeps, cfg):
    a = cfg.spacings[level]
    s = cfg.scales[level]
    L = phi.shape[0]
    if cfg.smoother == "jacobi":
        def body(_, phi):
            return s * (_ngb(phi) - r * a * a)
    elif cfg.smoother == "gs_lex":
        def body(_, phi):
            def site(phi, x):
                new = s * (phi[(x + 1) % L] + phi[(x - 1) % L]
                           - r[x] * a * a)
                return phi.at[x].set(new), None
            phi, _ = jax.lax.scan(site, phi, jnp.arange(L))
            return phi
    else:  # red-black
        par = (jnp.arange(L) % 2) == 0

        def body(_, phi):
            upd = s * (_ngb(phi) - r * a * a)
            phi = jnp.where(par, upd, phi)
            upd = s * (_ngb(phi) - r * a * a)
            return jnp.where(~par, upd, phi)

    return jax.lax.fori_loop(0, n_sweeps, body, phi)


def restrict_1d(res):
    L = res.shape[0]
    return 0.5 * res.reshape(L // 2, 2).sum(axis=1)


def prolong_1d(coarse):
    return jnp.repeat(coarse, 2)


def vcycle_1d(phis, b, cfg):
    n = cfg.nlevels
    phis = list(phis)
    rs = [b] + [None] * n
    for l in range(n):
        phis[l] = smooth_1d(phis[l], rs[l], l, cfg.num_iters, cfg)
        rs[l + 1] = restrict_1d(residual_1d(phis[l], rs[l], l, cfg))
        phis[l + 1] = jnp.zeros_like(phis[l + 1])
    for l in range(n - 1, -1, -1):
        phis[l] = smooth_1d(phis[l], rs[l], l, cfg.num_iters, cfg)
        if l > 0:
            phis[l - 1] = phis[l - 1] + prolong_1d(phis[l])
            phis[l] = jnp.zeros_like(phis[l])
    return tuple(phis)


def solve_1d(b, cfg: Geo1DConfig, max_iters: Optional[int] = None,
             chunk: int = 10):
    from ..utils.compile import aot_call
    max_iters = max_iters or cfg.max_iters
    phis = tuple(jnp.zeros((s,), jnp.float64) for s in cfg.sizes)

    def run_chunk(phis, b):
        def body(_, phis):
            return vcycle_1d(phis, b, cfg)
        phis = jax.lax.fori_loop(0, chunk, body, phis)
        return phis, jnp.sum(jnp.abs(residual_1d(phis[0], b, 0, cfg)))

    it, resmag = 0, float("inf")
    while it < max_iters:
        phis, res = aot_call(run_chunk, phis, b, key=("geo1d", cfg, chunk))
        it += chunk
        resmag = float(res)
        if resmag < cfg.res_threshold or resmag > 1e6 \
                or not np.isfinite(resmag):
            break
    return np.asarray(phis[0]), it, resmag


def jacobi_1d(b, m: float, num_iters: int, L: int):
    """Plain 1D Jacobi on (2+m^2) diag operator (1D_laplace_solvers.cpp
    f_jacobi, :74-93; note a=1, b enters with MINUS sign there)."""
    phi = jnp.zeros((L,), jnp.float64)

    def body(_, phi):
        return (_ngb(phi) - b) / (2.0 + m * m)

    return jax.lax.fori_loop(0, num_iters, body, phi)


def gauss_seidel_1d(b, m: float, num_iters: int, L: int):
    """Plain in-place 1D GS (f_gauss, :55-68)."""
    phi = jnp.zeros((L,), jnp.float64)

    def sweep(_, phi):
        def site(phi, x):
            new = (phi[(x + 1) % L] + phi[(x - 1) % L] - b[x]) / (2 + m * m)
            return phi.at[x].set(new), None
        phi, _ = jax.lax.scan(site, phi, jnp.arange(L))
        return phi

    return jax.lax.fori_loop(0, num_iters, sweep, phi)
