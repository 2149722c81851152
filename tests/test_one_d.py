"""1D solver tests (gen-1 1D programs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.solver import one_d


def test_1d_mg_converges():
    cfg = one_d.Geo1DConfig(L=128, m=0.5, nlevels=4, num_iters=20,
                            res_threshold=1e-13)
    b = jnp.zeros((128,), jnp.float64).at[0].set(1.0).at[5].set(2.5)
    phi, iters, res = one_d.solve_1d(b, cfg, max_iters=500)
    assert res < 1e-13
    # verify against dense solve of the same operator
    L, m = 128, 0.5
    A = (np.diag(np.ones(L - 1), 1) + np.diag(np.ones(L - 1), -1)
         - (2 + m * m) * np.eye(L))
    A[0, L - 1] = A[L - 1, 0] = 1.0
    exact = np.linalg.solve(A, np.asarray(b))
    np.testing.assert_allclose(phi, exact, atol=1e-10)


def test_1d_gs_beats_jacobi():
    L, m = 64, 0.05
    b = jnp.zeros((L,), jnp.float64).at[L // 2].set(1.0)
    pj = one_d.jacobi_1d(b, m, 200, L)
    pg = one_d.gauss_seidel_1d(b, m, 200, L)
    # residual of phi for A phi = b with the solvers' sign convention
    def res(phi):
        return float(np.sum(np.abs(
            np.asarray(b) - (np.roll(phi, -1) + np.roll(phi, 1)
                             - (2 + m * m) * np.asarray(phi)))))
    assert res(pg) < res(pj)


@pytest.mark.parametrize("sm", ["jacobi", "rbgs", "gs_lex"])
def test_1d_smoothers_reduce_residual(sm):
    cfg = one_d.Geo1DConfig(L=64, m=0.3, nlevels=0, num_iters=50,
                            smoother=sm)
    b = jnp.zeros((64,), jnp.float64).at[3].set(1.0)
    phi0 = jnp.zeros_like(b)
    phi = one_d.smooth_1d(phi0, b, 0, 50, cfg)
    r0 = float(jnp.sum(jnp.abs(one_d.residual_1d(phi0, b, 0, cfg))))
    r1 = float(jnp.sum(jnp.abs(one_d.residual_1d(phi, b, 0, cfg))))
    assert r1 < 0.2 * r0
