"""Spectral estimators (solver/eigs.py) and the Chebyshev smoother."""
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import analysis
from tpu_multigrid.solver import eigs


def _op(stencil, L, m, seed=0, phase_scale=0.3):
    cfg = mg.MGConfig(L=L, stencil=stencil, m=m, nlevels=1)
    rng = np.random.default_rng(seed)
    U = mg.models.gauge.gauge_from_phases(
        phase_scale * rng.normal(size=(2, L, L)), cfg.cdtype)
    return cfg, mg.models.operators.assemble(stencil, U, m)


@pytest.mark.parametrize("stencil", ["laplace", "wilson"])
def test_lanczos_extremes_match_dense(stencil):
    """Matrix-free Lanczos extremes of the Hermitian form (D for laplace,
    gamma5 D for wilson) match the dense eigendecomposition at small L."""
    cfg, D = _op(stencil, L=8, m=0.1)
    lmin, lmax = eigs.spectral_interval(D, stencil, k=80)

    A = analysis.dense_operator(D)
    if stencil == "wilson":
        n = cfg.n_dof[0]
        g5 = np.kron(np.asarray(mg.models.operators.gamma5(n)),
                     np.eye(A.shape[0] // n))
        # dense_operator flattens dof-major [n, L, L] -> dof blocks first
        A = g5 @ A
    ev = np.linalg.eigvalsh(0.5 * (A + A.conj().T))
    assert abs(lmax - ev[-1]) < 5e-3 * max(1.0, abs(ev[-1]))
    assert abs(lmin - ev[0]) < 5e-3 * max(1.0, abs(ev[0]))


def test_power_extreme_matches_dense():
    cfg, D = _op("laplace", L=8, m=0.2)
    from tpu_multigrid.ops.stencil import apply_D
    rng = np.random.default_rng(1)
    v0 = jnp.asarray(rng.normal(size=(1, 8, 8))
                     + 1j * rng.normal(size=(1, 8, 8)))
    lam, _ = eigs.power_extreme(lambda v: apply_D(D, v), v0, iters=300)
    ev = np.abs(np.linalg.eigvals(analysis.dense_operator(D)))
    assert abs(float(lam) - ev.max()) < 1e-3 * ev.max()


def test_indefiniteness_detection():
    """lambda_min of gamma5 D flips sign across the critical mass — the
    on-device analog of the dense m_c measurement in PARITY.md."""
    _, D_safe = _op("wilson", L=16, m=0.2)
    lmin_safe, _ = eigs.spectral_interval(D_safe, "wilson", k=64)
    # gamma5 D is Hermitian INDEFINITE for any m (gamma5 has both signs):
    # definiteness is not the signal; instead check the interval brackets
    # the known dense spectrum edges.
    A = analysis.dense_operator(D_safe)
    g5 = np.kron(np.asarray(mg.models.operators.gamma5(2)),
                 np.eye(A.shape[0] // 2))
    ev = np.linalg.eigvalsh(g5 @ A)
    assert lmin_safe <= ev[0] + 1e-2 * abs(ev[0]) + 1e-9
    assert abs(lmin_safe - ev[0]) < 5e-2 * abs(ev[0]) + 1e-6


def test_chebyshev_smoother_converges_faster_than_jacobi():
    """MG with the Chebyshev smoother (same stencil-apply count per
    half-cycle) converges in no more cycles than Jacobi on laplace."""
    L, m = 32, 0.05
    cfg = mg.MGConfig(L=L, stencil="laplace", m=m, nlevels=2,
                      num_iters=4, null_iters=80, smoother="jacobi",
                      res_threshold=1e-10)
    rng = np.random.default_rng(3)
    U = mg.models.gauge.gauge_from_phases(
        0.3 * rng.normal(size=(2, L, L)), cfg.cdtype)
    D = mg.models.operators.assemble(cfg.stencil, U, cfg.m)
    hier = mg.build_hierarchy(D, cfg, check=False)
    b = mg.point_source(cfg)

    out_j = mg.solve(hier, b, cfg, max_iters=200)
    assert out_j.converged

    cfg_c = eigs.chebyshev_config(cfg, hier)
    assert len(cfg_c.cheby_lmax) == cfg.nlevels + 1
    out_c = mg.solve(hier, b, cfg_c, max_iters=200)
    assert out_c.converged
    assert out_c.iters <= out_j.iters


def test_chebyshev_config_validation():
    with pytest.raises(ValueError, match="chebyshev"):
        mg.MGConfig(L=16, smoother="chebyshev", nlevels=2)
