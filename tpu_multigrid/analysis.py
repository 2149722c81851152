"""Numerical-analysis utilities replacing the reference's validation
notebooks (SURVEY.md §4.3: code/analysis_nbks/):

- dense operator materialization + eigenspectra
  (2_spectral_analysis_solution.ipynb, spectrum_calc/1_compute_spectrum)
- analytic free-field spectra for laplace / wilson
- mode-resolved (FFT) error decomposition vs iteration — the plot family
  showing MG killing the low modes plain relaxation stalls on
  (2a_/2b_/3a_ notebooks)
- convergence-history loading from the results files / jsonl metrics
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import MGConfig
from .ops.stencil import apply_D


def dense_operator(D: jnp.ndarray) -> np.ndarray:
    """Materialize the stencil as a dense (n L^2) x (n L^2) matrix by
    applying it to the standard basis (column-batched with vmap)."""
    s, n, _, L, _ = D.shape
    N = n * L * L
    eye = jnp.eye(N, dtype=D.dtype).reshape(N, n, L, L)
    cols = jax.vmap(lambda v: apply_D(D, v))(eye)
    return np.asarray(cols.reshape(N, N)).T


def spectrum(D: jnp.ndarray) -> np.ndarray:
    """Full eigenvalue spectrum of the (small) operator."""
    return np.linalg.eigvals(dense_operator(D))


def laplace_free_spectrum(L: int, m: float) -> np.ndarray:
    """-(4+m) + 2 cos kx + 2 cos ky over the Brillouin zone."""
    k = 2.0 * np.pi * np.arange(L) / L
    kx, ky = np.meshgrid(k, k, indexing="ij")
    return (-(4.0 + m) + 2 * np.cos(kx) + 2 * np.cos(ky)).ravel()


def mode_error_spectrum(phi: np.ndarray, phi_exact: np.ndarray) -> np.ndarray:
    """|FFT(error)| per momentum mode, summed over dof: [L, L] real."""
    err = np.asarray(phi) - np.asarray(phi_exact)
    f = np.fft.fft2(err, axes=(-2, -1))
    return np.sqrt((np.abs(f) ** 2).sum(axis=0))


def mode_resolved_convergence(hier, b, cfg: MGConfig, n_iters: int = 20,
                              modes: Optional[List[tuple]] = None):
    """Track per-mode error amplitudes across MG cycles.

    Returns (modes, history[n_iters, n_modes]) — the data behind the
    reference's spectral-analysis notebooks. phi_exact from a dense solve
    (small lattices only).
    """
    from .solver.hierarchy import zero_fields
    from .solver.cycles import cycle

    A = dense_operator(hier.levels[0].D)
    n, L = b.shape[0], b.shape[-1]
    exact = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(n, L, L)
    if modes is None:
        modes = [(0, 0), (1, 0), (0, 1), (1, 1), (L // 4, L // 4),
                 (L // 2, L // 2)]
    phis = zero_fields(cfg)
    hist = []
    step = jax.jit(lambda h, p, bb: cycle(h, p, bb, cfg)[0])
    for _ in range(n_iters):
        phis = step(hier, phis, b)
        spec = mode_error_spectrum(np.asarray(phis[0]), exact)
        hist.append([spec[kx, ky] for (kx, ky) in modes])
    return modes, np.asarray(hist)


def load_results_phi(path: str, L: int, ndof: int):
    """Parse a results_phi.txt / results_res_lvl-*.txt file back into
    [iters, n, L, L] complex (the notebooks' f_get_data)."""
    iters, fields = [], []
    with open(path) as f:
        for line in f:
            parts = [p for p in line.strip().split(",") if p]
            if not parts:
                continue
            iters.append(int(parts[0]))
            vals = []
            for tok in parts[1:]:
                re, _, im = tok.partition("+i")
                vals.append(complex(float(re), float(im)))
            arr = np.asarray(vals).reshape(L, L, ndof)   # x, y, dof
            fields.append(np.transpose(arr, (2, 0, 1)))
    return np.asarray(iters), np.asarray(fields)


def load_metrics_jsonl(path: str):
    import json
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    return rows
