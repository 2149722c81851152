"""Krylov accelerators: MG-preconditioned flexible GMRES.

The reference's outer iteration is a stationary MG cycle (f_perform_MG).
For near-critical / indefinite Wilson systems a stationary cycle can
stagnate or diverge even when the MG preconditioner is good; wrapping the
V-cycle in flexible GMRES (right preconditioning, Arnoldi over the
preconditioned directions) is the standard production pattern in lattice
multigrid (cf. the adaptive-MG literature in PAPERS.md). This extends the
reference's capability envelope toward its own near-critical target
regime.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MGConfig
from ..ops.stencil import apply_D
from ..utils.xfer import host_complex
from .cycles import cycle
from .hierarchy import Hierarchy, zero_fields


def _mg_precond(hier, v, cfg, n_cycles: int):
    """Approximate D^{-1} v by n_cycles MG cycles from zero."""
    phis = list(zero_fields(cfg))
    for _ in range(n_cycles):
        phis, _ = cycle(hier, tuple(phis), v, cfg)
        phis = list(phis)
    return phis[0]


def fgmres_solve(hier: Hierarchy, b: jnp.ndarray, cfg: MGConfig,
                 tol: Optional[float] = None, restart: int = 10,
                 max_restarts: int = 50, precond_cycles: int = 1):
    """Flexible GMRES(restart) right-preconditioned by MG cycles.

    Returns (phi, outer_iterations, rel_residual). Host-driven Arnoldi
    (restart <= ~20) with jitted operator/preconditioner applications —
    the small Hessenberg solves run on host in f64.
    """
    tol = tol or cfg.res_threshold
    apply = jax.jit(lambda h, v: apply_D(h.levels[0].D, v))
    prec = jax.jit(lambda h, v: _mg_precond(h, v, cfg, precond_cycles))

    from ..utils.xfer import device_zeros_like
    bnorm = float(jnp.linalg.norm(b.ravel()))
    x = device_zeros_like(b)
    total_iters = 0

    for outer in range(max_restarts):
        r = b - apply(hier, x)
        beta = float(jnp.linalg.norm(r.ravel()))
        if beta / bnorm < tol:
            return host_complex(x), total_iters, beta / bnorm
        V = [r / beta]
        Z = []
        H = np.zeros((restart + 1, restart), dtype=np.complex128)
        g = np.zeros(restart + 1, dtype=np.complex128)
        g[0] = beta
        k_done = 0
        for k in range(restart):
            z = prec(hier, V[k])
            w = apply(hier, z)
            Z.append(z)
            # modified Gram-Schmidt
            for i in range(k + 1):
                hik = complex(jnp.vdot(V[i].ravel(), w.ravel()))
                H[i, k] = hik
                w = w - hik * V[i]
            hk1 = float(jnp.linalg.norm(w.ravel()))
            H[k + 1, k] = hk1
            k_done = k + 1
            total_iters += 1
            if hk1 < 1e-14 * bnorm:
                break
            V.append(w / hk1)
            # cheap residual estimate via least squares
            y, res_ls, *_ = np.linalg.lstsq(H[:k + 2, :k + 1], g[:k + 2],
                                            rcond=None)
            est = np.linalg.norm(H[:k + 2, :k + 1] @ y - g[:k + 2])
            if est / bnorm < tol:
                break
        y, *_ = np.linalg.lstsq(H[:k_done + 1, :k_done], g[:k_done + 1],
                                rcond=None)
        dx = sum(complex(y[i]) * Z[i] for i in range(k_done))
        x = x + dx

    r = b - apply(hier, x)
    rel = float(jnp.linalg.norm(r.ravel())) / bnorm
    return host_complex(x), total_iters, rel
