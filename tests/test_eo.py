"""Even-odd (Schur-complement) preconditioned solves (solver/eo.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid.config import SAME
from tpu_multigrid.ops.stencil import apply_D, site_inverse
from tpu_multigrid.solver import eo


def _setup(stencil, L, m, seed=0):
    cfg = mg.MGConfig(L=L, stencil=stencil, m=m, nlevels=1)
    rng = np.random.default_rng(seed)
    U = mg.models.gauge.gauge_from_phases(
        0.3 * rng.normal(size=(2, L, L)), cfg.cdtype)
    D = mg.models.operators.assemble(stencil, U, m)
    n = cfg.n_dof[0]
    x = jnp.asarray(rng.normal(size=(n, L, L))
                    + 1j * rng.normal(size=(n, L, L))).astype(cfg.cdtype)
    return cfg, D, x


@pytest.mark.parametrize("stencil", ["laplace", "wilson"])
def test_schur_identity(stencil):
    """If D x = b then S x_e = b_e - Deo Doo^{-1} b_o (Schur identity) and
    back-substitution recovers x exactly."""
    cfg, D, x = _setup(stencil, L=8, m=0.1)
    b = apply_D(D, x)
    D0inv = site_inverse(D[SAME])
    even = eo.parity_mask(cfg.L, x.real.dtype)

    be_hat, bo = eo.eo_reduce(D, D0inv, b)
    lhs = eo.schur_apply(D, D0inv, x * even)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(be_hat),
                               atol=1e-12)

    x_back = eo.eo_reconstruct(D, D0inv, x * even, bo)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                               atol=1e-12)


def test_schur_parity_support():
    """schur_apply of an even-supported field is even-supported (the hop
    flips parity twice) with no explicit masking."""
    cfg, D, x = _setup("wilson", L=8, m=0.1)
    even = eo.parity_mask(cfg.L, x.real.dtype)
    out = eo.schur_apply(D, site_inverse(D[SAME]), x * even)
    np.testing.assert_allclose(np.asarray(out * (1.0 - even)), 0.0,
                               atol=1e-14)


@pytest.mark.parametrize("stencil,m", [("laplace", 0.05), ("wilson", 0.05)])
def test_eo_mr_solves_and_beats_full_mr(stencil, m):
    """eo_mr_solve reaches the tolerance on the FULL system and needs no
    more iterations than unpreconditioned MR on the full operator (the
    Schur system contracts ~twice as fast per iteration and each
    iteration touches half the sites)."""
    cfg, D, x = _setup(stencil, L=16, m=m)
    b = apply_D(D, x)

    xs, it_eo, rel_eo = eo.eo_mr_solve(D, b, tol=1e-8, max_iters=20000,
                                       chunk=50)
    assert rel_eo < 1e-8
    # independent full-system residual check
    res = b - apply_D(D, jnp.asarray(xs))
    rel = float(jnp.linalg.norm(res.ravel()) / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-8

    _, it_mr, rel_mr = mg.mr_solve(D, b, tol=1e-8, max_iters=20000,
                                   chunk=50)
    assert rel_mr < 1e-8
    assert it_eo <= it_mr
