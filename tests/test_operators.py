"""Operator assembly and SpMV tests: hermiticity (reference test3/test4),
free-field spectra vs analytic formulas, and dense-matrix cross-checks
(the reference validates against dense numpy operators in
analysis_nbks/2_spectral_analysis_solution.ipynb)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.config import MGConfig
from tpu_multigrid.models import gauge, operators
from tpu_multigrid.ops import stencil
from tpu_multigrid import testing


def random_u1(L, seed=0, dtype=jnp.complex128):
    rng = np.random.default_rng(seed)
    return gauge.gauge_from_phases(rng.uniform(-np.pi, np.pi, (2, L, L)),
                                   dtype)


def dense_matrix(D):
    """Materialize the stencil as a dense (n L^2) x (n L^2) matrix by
    applying it to basis vectors — ground truth for small lattices."""
    s, n, _, L, _ = D.shape
    N = n * L * L
    eye = jnp.eye(N, dtype=D.dtype).reshape(N, n, L, L)
    cols = jax.vmap(lambda v: stencil.apply_D(D, v))(eye)
    return np.asarray(cols.reshape(N, N)).T


@pytest.mark.parametrize("st", ["laplace", "wilson"])
def test_hermiticity_gauged(st):
    L, m = 8, 0.3
    U = random_u1(L)
    D = operators.assemble(st, U, m)
    assert float(testing.test3_hermiticity(D, st)) < 1e-12
    key = jax.random.PRNGKey(7)
    n = D.shape[1]
    v = (jax.random.normal(key, (n, L, L))
         + 1j * jax.random.normal(jax.random.PRNGKey(8), (n, L, L))
         ).astype(jnp.complex128)
    assert float(testing.test4_hermiticity_full(D, v, st)) < 1e-10


def test_laplace_free_spectrum():
    """Free-field gauged-Laplace eigenvalues: -(4+m) + 2cos kx + 2cos ky."""
    L, m = 8, 0.25
    U = gauge.identity_gauge(L)
    D = operators.assemble_laplace(U, m)
    A = dense_matrix(D)
    ev = np.sort_complex(np.linalg.eigvals(A))
    k = 2 * np.pi * np.arange(L) / L
    kx, ky = np.meshgrid(k, k, indexing="ij")
    expected = np.sort_complex(
        (-(4 + m) + 2 * np.cos(kx) + 2 * np.cos(ky)).ravel().astype(complex))
    np.testing.assert_allclose(ev, expected, atol=1e-10)


def test_wilson_free_spectrum():
    """Wilson eigenvalues match the analytic formula (reference
    spectrum_calc/1_compute_spectrum.ipynb)."""
    L, m = 8, -0.07
    U = gauge.identity_gauge(L)
    D = operators.assemble_wilson(U, m)
    A = dense_matrix(D)
    ev = np.linalg.eigvals(A)
    expected = operators.wilson_free_spectrum(L, m)
    # compare as sorted complex multisets (round to break degenerate ties
    # consistently before lexsorting)
    def canon(z):
        zr = np.round(z.real, 9)
        zi = np.round(z.imag, 9)
        order = np.lexsort((zi, zr))
        return z[order]
    np.testing.assert_allclose(canon(ev), canon(expected), atol=1e-9)


def test_apply_d_matches_dense():
    L, m = 6, 0.1
    U = random_u1(L, seed=3)
    D = operators.assemble_wilson(U, m)
    A = dense_matrix(D)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(2, L, L)) + 1j * rng.normal(size=(2, L, L))
    out = np.asarray(stencil.apply_D(D, jnp.asarray(v)))
    ref = (A @ v.reshape(-1)).reshape(2, L, L)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_gauge_covariance():
    """Gauge transform commutes with the operator:
    D[U'] (Omega v) = Omega (D[U] v) with componentwise Omega action."""
    L, m = 8, 0.2
    U = random_u1(L, seed=5)
    rng = np.random.default_rng(11)
    omega = jnp.asarray(np.exp(1j * rng.uniform(-np.pi, np.pi, (L, L))))
    U2 = gauge.gauge_transform(U, omega)
    for st in ("laplace", "wilson"):
        D1 = operators.assemble(st, U, m)
        D2 = operators.assemble(st, U2, m)
        n = D1.shape[1]
        v = jnp.asarray(rng.normal(size=(n, L, L))
                        + 1j * rng.normal(size=(n, L, L)))
        lhs = stencil.apply_D(D2, omega[None] * v)
        rhs = omega[None] * stencil.apply_D(D1, v)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-12)


def test_plaquette_identity_and_transform_invariance():
    L = 8
    U = gauge.identity_gauge(L)
    assert abs(complex(gauge.plaquette(U)) - 1.0) < 1e-14
    U = random_u1(L, seed=9)
    p1 = complex(gauge.plaquette(U))
    rng = np.random.default_rng(2)
    omega = jnp.asarray(np.exp(1j * rng.uniform(-np.pi, np.pi, (L, L))))
    p2 = complex(gauge.plaquette(gauge.gauge_transform(U, omega)))
    assert abs(p1 - p2) < 1e-12


def test_site_inverse():
    L = 4
    U = random_u1(L, seed=2)
    D = operators.assemble_wilson(U, -0.1)
    inv = stencil.site_inverse(D[0])
    prod = jnp.einsum("ijxy,jkxy->ikxy", D[0], inv)
    eye = np.zeros((2, 2, L, L), dtype=complex)
    eye[0, 0] = eye[1, 1] = 1.0
    np.testing.assert_allclose(np.asarray(prod), eye, atol=1e-12)
