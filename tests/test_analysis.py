"""Analysis-layer tests: spectra, mode-resolved convergence, results-file
round-trip, and the gauge-invariance-of-the-solve property (§4.2)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid import analysis, testing
from tpu_multigrid.config import MGConfig
from tpu_multigrid.models import gauge, operators
from tpu_multigrid.solver.hierarchy import build_hierarchy, point_source


def test_laplace_spectrum_matches_analytic():
    L, m = 8, 0.3
    D = operators.assemble_laplace(gauge.identity_gauge(L), m)
    ev = np.sort(analysis.spectrum(D).real)
    want = np.sort(analysis.laplace_free_spectrum(L, m))
    np.testing.assert_allclose(ev, want, atol=1e-10)


def test_mode_resolved_convergence_kills_low_modes():
    cfg = MGConfig(L=16, stencil="laplace", m=0.1, nlevels=2, num_iters=6,
                   null_iters=60, smoother="rbgs")
    D = operators.assemble("laplace", gauge.identity_gauge(16, cfg.cdtype),
                           cfg.m)
    hier = build_hierarchy(D, cfg, check=False)
    b = point_source(cfg)
    modes, hist = analysis.mode_resolved_convergence(hier, b, cfg,
                                                     n_iters=8)
    # every tracked mode's error decreases by orders of magnitude
    assert (hist[-1] < 1e-3 * hist[0] + 1e-12).all()


def test_results_phi_roundtrip(tmp_path, rng):
    from tpu_multigrid.utils.io import ResultsWriter
    from tpu_multigrid.solver.hierarchy import zero_fields
    cfg = MGConfig(L=8, stencil="laplace", m=0.2, nlevels=1, null_iters=40)
    D = operators.assemble("laplace", gauge.identity_gauge(8, cfg.cdtype),
                           cfg.m)
    hier = build_hierarchy(D, cfg, check=False)
    b = point_source(cfg)
    phis = tuple(jnp.asarray(rng.normal(size=p.shape) + 0j)
                 for p in zero_fields(cfg))
    w = ResultsWriter(cfg, str(tmp_path))
    w.record(1, hier, phis, b, np.zeros(4, complex))
    w.close()
    iters, fields = analysis.load_results_phi(
        str(tmp_path / "results_phi.txt"), 8, 1)
    assert iters.tolist() == [1]
    np.testing.assert_allclose(fields[0], np.asarray(phis[0]), rtol=1e-12)


def test_gauge_invariance_of_solve(rng):
    cfg = MGConfig(L=16, stencil="wilson", m=0.1, nlevels=2, num_iters=8,
                   null_iters=60, res_threshold=1e-10, smoother="rbgs")
    U = gauge.gauge_from_phases(0.3 * rng.normal(size=(2, 16, 16)),
                                cfg.cdtype)
    omega = jnp.asarray(np.exp(1j * rng.uniform(-np.pi, np.pi, (16, 16))),
                        dtype=cfg.cdtype)
    viol = testing.test_gauge_invariance_solve(cfg, U, omega)
    assert viol < 1e-8, viol


def test_staggered_and_naive_spectra():
    """The spectrum-calc notebook's other fermion discretizations
    (spectrum_calc/1_compute_spectrum.ipynb f_get_A): free staggered and
    naive operators are anti-hermitian + m, so their spectra are
    m + i*(imaginary); naive fermions show the 2D doublers (each
    eigenvalue 4x degenerate at L even); staggered eigenvalues are
    m +- i sqrt(sin^2 kx + sin^2 ky) over a halved Brillouin zone."""
    from tpu_multigrid import analysis
    L, m = 8, 0.1
    for A in (analysis.staggered_dense(L, m), analysis.naive_dense(L, m)):
        ev = np.linalg.eigvals(A)
        assert np.allclose(ev.real, m, atol=1e-10)
    ev_n = np.linalg.eigvals(analysis.naive_dense(L, m))
    # doubling: the naive operator's eigenvalues are those of the
    # analytic dispersion i*sqrt(sin^2 kx + sin^2 ky) with multiplicity
    k = 2.0 * np.pi * np.arange(L) / L
    kx, ky = np.meshgrid(k, k, indexing="ij")
    disp = np.sqrt(np.sin(kx) ** 2 + np.sin(ky) ** 2).ravel()
    want = np.concatenate([disp, -disp])
    np.testing.assert_allclose(np.sort(ev_n.imag), np.sort(want), atol=1e-9)


def test_wilson_free_spectrum_conventions():
    from tpu_multigrid import analysis
    from tpu_multigrid.models import operators
    np.testing.assert_allclose(
        np.sort_complex(analysis.wilson_free_spectrum(8, 0.1)),
        np.sort_complex(operators.wilson_free_spectrum(8, 0.1)))
    nb = analysis.wilson_free_spectrum(8, 0.1, convention="notebook")
    assert nb.shape == (128,)
