"""Stationary smoothers: Jacobi, red-black Gauss-Seidel, lexicographic GS.

Update rule (reference Level::f_relax, level.h:100-128):
    phi(x) <- -D0(x)^{-1} ( sum_{mu != 0} D_mu(x) phi(x+mu) - r(x) )

- ``jacobi``  : buffered update; bit-matches the reference gs_flag=0 path.
- ``rbgs``    : red/black-ordered Gauss-Seidel — the TPU-idiomatic GS with
  the same asymptotic smoothing factor as the reference's lexicographic GS
  (gs_flag=1) but a parallel iteration order.
- ``gs_lex``  : exact lexicographic GS via a wavefront scan over diagonals —
  slow, for trajectory-matching validation against the reference only.

D0^{-1} is precomputed per level (see ops/stencil.site_inverse).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .stencil import apply_hop, _site_matvec


def _local_solve(D0inv, hop, r):
    return -_site_matvec(D0inv, hop - r)


def jacobi_sweep(D, D0inv, phi, r, omega: float = 1.0):
    new = _local_solve(D0inv, apply_hop(D, phi), r)
    if omega == 1.0:
        return new
    return phi + omega * (new - phi)


def _parity_mask(L: int, dtype):
    x = jnp.arange(L)[:, None]
    y = jnp.arange(L)[None, :]
    return ((x + y) % 2).astype(dtype)  # 0 = red, 1 = black


def rbgs_sweep(D, D0inv, phi, r, omega: float = 1.0):
    L = phi.shape[-1]
    par = _parity_mask(L, phi.real.dtype)
    red = (1.0 - par)[None]
    black = par[None]
    upd = _local_solve(D0inv, apply_hop(D, phi), r)
    phi = phi + omega * red * (upd - phi)
    upd = _local_solve(D0inv, apply_hop(D, phi), r)
    phi = phi + omega * black * (upd - phi)
    return phi


def gs_lex_sweep(D, D0inv, phi, r, omega: float = 1.0):
    """Exact lexicographic Gauss-Seidel, matching the reference's site order
    (x fastest, then y; level.h:113-124). Implemented as a scan over rows of
    constant y with an inner scan over x — O(L^2) sequential steps; use only
    for small validation lattices.
    """
    L = phi.shape[-1]

    def row_body(phi, y):
        def col_body(phi, x):
            # hop at single site (x, y)
            xp, xm = (x + 1) % L, (x - 1) % L
            yp, ym = (y + 1) % L, (y - 1) % L
            h = (jnp.einsum("ij,j->i", D[1, :, :, x, y], phi[:, xp, y])
                 + jnp.einsum("ij,j->i", D[2, :, :, x, y], phi[:, xm, y])
                 + jnp.einsum("ij,j->i", D[3, :, :, x, y], phi[:, x, yp])
                 + jnp.einsum("ij,j->i", D[4, :, :, x, y], phi[:, x, ym]))
            new = -jnp.einsum("ij,j->i", D0inv[:, :, x, y], h - r[:, x, y])
            phi = phi.at[:, x, y].set(phi[:, x, y] + omega * (new - phi[:, x, y]))
            return phi, None

        phi, _ = jax.lax.scan(col_body, phi, jnp.arange(L))
        return phi, None

    phi, _ = jax.lax.scan(row_body, phi, jnp.arange(L))
    return phi


_SWEEPS = {"jacobi": jacobi_sweep, "rbgs": rbgs_sweep, "gs_lex": gs_lex_sweep}


def smooth(D, D0inv, phi, r, n_sweeps: int, kind: str = "rbgs",
           omega: float = 1.0):
    """Run n_sweeps smoother sweeps (reference f_relax's num_iter loop)."""
    sweep = _SWEEPS[kind]

    def body(_, phi):
        return sweep(D, D0inv, phi, r, omega)

    return jax.lax.fori_loop(0, n_sweeps, body, phi)
