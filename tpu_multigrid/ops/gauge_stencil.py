"""Spin-projected level-0 stencil: the gauge-compact fast path.

The generic stencil stores dense hop matrices ``D[5, n, n, L, L]`` —
required for Galerkin coarse levels, where the blocks really are dense.
At LEVEL 0, though, the reference's operators have closed forms
(level.h:131-175) whose per-site data is only the U(1) link phase:

  laplace: D_{+mu}(x) = U_mu(x)                  (1x1: the link itself)
  wilson:  D_{+mu}(x) = U_mu(x) * 1/2(1 - gamma_mu)
           D_{-mu}(x) = U_mu(x-mu)^* * 1/2(1 + gamma_mu)

and 1/2(1 -+ gamma_mu) are RANK-1 spinor projectors, so each hop only
needs one "half-spinor" component (the classic lattice-QCD spin
projection used by production codes):

  gamma1 = sigma_x: (1-g1)v = (a, -a), a = v0 - v1;  (1+g1)v = (b,  b),
                                                      b = v0 + v1
  gamma2 = sigma_y: (1-g2)v = (c, -ic), c = v0 + i v1; (1+g2)v = (d, id),
                                                       d = v0 - i v1

HBM traffic per site (complex words): dense wilson apply reads
5*4 (D) + 2 (v) + 2 (out) = 24; the compact form reads 4 (links) + 2 +
2 = 8 — a 3x traffic reduction for identical math (same flop count up
to reassociation). The diagonal is the scalar (2+m) (wilson) or
-(4+m) (laplace), so the smoother's D0^{-1} is a compile-time constant.

These functions are mathematically identical to
models.operators.assemble + ops.stencil.apply_D (pinned by
tests/test_gauge_stencil.py) and are used as the level-0 fast path in
benchmarks and (optionally) solvers. Coarse levels keep the dense form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _xp(f):     # value at (x+1, y)
    return jnp.roll(f, -1, axis=-2)


def _xm(f):
    return jnp.roll(f, 1, axis=-2)


def _yp(f):
    return jnp.roll(f, -1, axis=-1)


def _ym(f):
    return jnp.roll(f, 1, axis=-1)


def wilson_hop_u(U: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Off-diagonal (hopping) part of the Wilson operator from links only:
    hop(v)(x) = +1/2 sum_mu [U_mu(x)(1-g_mu)v(x+mu) +
                             U_mu(x-mu)^*(1+g_mu)v(x-mu)].
    The hop sign is PLUS: the reference stores D(x,mu) = U * 1/2(1 -+ g)
    with the hopping sign absorbed into its gamma convention
    (level.h:157-172; SURVEY.md Appendix A), and the dense assemble
    replicates that — pinned by tests/test_gauge_stencil.py.
    U: [2, L, L] complex links; v: [2, L, L] spinor field.
    """
    ux, uy = U[0], U[1]
    v0, v1 = v[0], v[1]
    ha = ux * _xp(v0 - v1)                      # +x, spin-up component
    hb = jnp.conj(_xm(ux)) * _xm(v0 + v1)       # -x
    hc = uy * _yp(v0 + 1j * v1)                 # +y
    hd = jnp.conj(_ym(uy)) * _ym(v0 - 1j * v1)  # -y
    out0 = 0.5 * (ha + hb + hc + hd)
    out1 = 0.5 * (-ha + hb - 1j * hc + 1j * hd)
    return jnp.stack([out0, out1])


def apply_wilson_u(U: jnp.ndarray, m: float, v: jnp.ndarray) -> jnp.ndarray:
    """(D v) for the Wilson operator, links-only representation.
    Identical math to apply_D(assemble_wilson(U, m), v)."""
    return (2.0 + m) * v + wilson_hop_u(U, v)


def laplace_hop_u(U: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Hopping part of the gauged Laplace (n=1): sum_mu U v(x+mu) + h.c."""
    w = v[0]
    out = (U[0] * _xp(w) + jnp.conj(_xm(U[0])) * _xm(w)
           + U[1] * _yp(w) + jnp.conj(_ym(U[1])) * _ym(w))
    return out[None]


def apply_laplace_u(U: jnp.ndarray, m: float, v: jnp.ndarray) -> jnp.ndarray:
    """(D v) for the gauged Laplace, links-only representation."""
    return -(4.0 + m) * v + laplace_hop_u(U, v)


def apply_u(stencil: str, U, m: float, v):
    return (apply_wilson_u if stencil == "wilson" else apply_laplace_u)(
        U, m, v)


def residual_u(stencil: str, U, m: float, phi, r):
    """r - D phi in the links-only representation (matches
    ops.stencil.residual on the assembled dense stencil)."""
    return r - apply_u(stencil, U, m, phi)


def _hop(stencil: str):
    return wilson_hop_u if stencil == "wilson" else laplace_hop_u


def _diag(stencil: str, m: float) -> float:
    return (2.0 + m) if stencil == "wilson" else -(4.0 + m)


def jacobi_sweep_u(stencil: str, U, m: float, phi, r, omega: float = 1.0):
    """phi <- -D0^{-1}(hop(phi) - r) with the scalar level-0 diagonal
    (matches ops.smoothers.jacobi_sweep on the assembled operator)."""
    new = -( _hop(stencil)(U, phi) - r) / _diag(stencil, m)
    if omega == 1.0:
        return new
    return phi + omega * (new - phi)


def rbgs_sweep_u(stencil: str, U, m: float, phi, r, omega: float = 1.0):
    """Red-black GS sweep (two masked half-updates), links-only."""
    L = phi.shape[-1]
    x = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    y = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    par = ((x + y) % 2).astype(phi.real.dtype)
    hop = _hop(stencil)
    d = _diag(stencil, m)
    for mask in (1.0 - par, par):
        upd = -(hop(U, phi) - r) / d
        phi = phi + omega * mask[None] * (upd - phi)
    return phi


def smooth_u(stencil: str, U, m: float, phi, r, n_sweeps: int,
             kind: str = "rbgs", omega: float = 1.0):
    """n_sweeps links-only smoother sweeps via lax.fori_loop."""
    fn = jacobi_sweep_u if kind == "jacobi" else rbgs_sweep_u

    def body(_, p):
        return fn(stencil, U, m, p, r, omega)

    return jax.lax.fori_loop(0, n_sweeps, body, phi)
