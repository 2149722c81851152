"""Full adaptive-setup tests: build the hierarchy and run the reference's
self-test suite (tests 1-4) at every level, for both stencils, telescoping
and non-telescoping (reference f_MG_tests, tests.h:250-295)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.config import MGConfig
from tpu_multigrid.models import gauge, operators
from tpu_multigrid import testing
from tpu_multigrid.solver.hierarchy import build_hierarchy
from tpu_multigrid.ops.galerkin import coarse_operator


def make_hier(stencil, L=16, nlevels=2, ntl=False, m=0.5, seed=0,
              gauged=True, null_iters=60):
    cfg = MGConfig(L=L, stencil=stencil, m=m, nlevels=nlevels, ntl=ntl,
                   null_iters=null_iters, smoother="rbgs")
    if gauged:
        rng = np.random.default_rng(seed)
        U = gauge.gauge_from_phases(
            0.3 * rng.normal(size=(2, L, L)), cfg.cdtype)
    else:
        U = gauge.identity_gauge(L, cfg.cdtype)
    D = operators.assemble(stencil, U, m)
    hier = build_hierarchy(D, cfg)
    return cfg, hier


@pytest.mark.parametrize("stencil,ntl", [
    ("laplace", False), ("laplace", True),
    ("wilson", False), ("wilson", True),
])
def test_mg_selftests(stencil, ntl):
    cfg, hier = make_hier(stencil, ntl=ntl)
    results = testing.run_mg_tests(hier, cfg)
    bad = {k: v for k, v in results.items() if v > testing.EPSILON}
    assert not bad, f"self-test violations: {bad}"


def test_galerkin_matches_loop_reference(rng):
    """coarse_operator vs a brute-force triple-loop Galerkin built from
    dense restriction: D_c = R A R^H on the flattened space."""
    from tpu_multigrid.ops import stencil as st
    from tpu_multigrid.ops.transfer import restrict, prolong

    L, b, nf, nc, quad = 8, 2, 2, 4, 3
    Lc = L // b
    U = gauge.gauge_from_phases(rng.normal(size=(2, L, L)) * 0.4)
    D = operators.assemble_wilson(U, -0.1)
    pn = jnp.asarray(rng.normal(size=(nc, nf, L, L))
                     + 1j * rng.normal(size=(nc, nf, L, L)))
    Dc = coarse_operator(D, pn, quad, b, b)

    # Ground truth by matrix-free composition on a coarse basis.
    Nc = nc * Lc * Lc
    eye = jnp.eye(Nc, dtype=D.dtype).reshape(Nc, nc, Lc, Lc)
    cols_ref = jax.vmap(
        lambda v: restrict(pn, st.apply_D(D, prolong(pn, v, quad, b, b)),
                           quad, b, b))(eye)
    cols_new = jax.vmap(lambda v: st.apply_D(Dc, v))(eye)
    np.testing.assert_allclose(np.asarray(cols_new), np.asarray(cols_ref),
                               atol=1e-11)


def test_coarse_stencil_keeps_format():
    cfg, hier = make_hier("wilson", L=16, nlevels=2)
    for lvl in range(1, cfg.nlevels + 1):
        D = hier.levels[lvl].D
        assert D.shape == (5, cfg.n_dof[lvl], cfg.n_dof[lvl],
                           cfg.sizes[lvl], cfg.sizes[lvl])


def test_wilson_chiral_structure():
    """Wilson near-null rows are chirality-blocked: rows < nc/2 vanish on
    lower spinor components, rows >= nc/2 on upper (level.h:238-246)."""
    cfg = MGConfig(L=8, stencil="wilson", m=-0.1, nlevels=1, null_iters=40)
    U = gauge.identity_gauge(8, cfg.cdtype)
    D = operators.assemble("wilson", U, cfg.m)
    from tpu_multigrid.ops.nearnull import (random_starts, relax_null_vectors,
                                            candidates_to_phi_null)
    from tpu_multigrid.ops.stencil import site_inverse
    key = jax.random.PRNGKey(0)
    starts = random_starts(key, 2, 2, 8, cfg.cdtype)
    vecs = relax_null_vectors(D, site_inverse(D[0]), starts, 40, 4, "rbgs")
    pn = candidates_to_phi_null(vecs, "wilson", 4)
    assert pn.shape == (4, 2, 8, 8)
    np.testing.assert_array_equal(np.asarray(pn[:2, 1:]), 0)
    np.testing.assert_array_equal(np.asarray(pn[2:, :1]), 0)


def test_near_null_quality():
    """Relaxed vectors should be much closer to the null space than random
    ones: ||D v|| / ||v|| reduced by a large factor."""
    from tpu_multigrid.ops.nearnull import random_starts, relax_null_vectors
    from tpu_multigrid.ops.stencil import site_inverse, apply_D
    cfg = MGConfig(L=16, stencil="laplace", m=0.01, nlevels=1)
    U = gauge.identity_gauge(16, cfg.cdtype)
    D = operators.assemble("laplace", U, cfg.m)
    starts = random_starts(jax.random.PRNGKey(1), 2, 1, 16, cfg.cdtype)
    vecs = relax_null_vectors(D, site_inverse(D[0]), starts, 200, 4, "rbgs")
    for v0, v1 in zip(starts, vecs):
        r0 = float(jnp.linalg.norm(apply_D(D, v0 / jnp.linalg.norm(v0))))
        r1 = float(jnp.linalg.norm(apply_D(D, v1)))
        assert r1 < 0.05 * r0


def test_deep_coarsening_joint_qr():
    """Reference-style independent candidate relaxation degenerates on a
    4^2 setup level (both candidates contract onto the single lowest
    mode; the reference's f_ortho guards exit(1) on the same math) —
    MGConfig.null_joint_qr=True orthonormalizes the candidate set during
    generation (block power iteration) and makes 2^2-coarsest
    hierarchies buildable and convergent."""
    import tpu_multigrid as mg
    from tpu_multigrid.models import gauge, operators

    cfg = mg.MGConfig(L=8, stencil="laplace", m=0.01, nlevels=2,
                      num_iters=4, null_iters=100, smoother="rbgs",
                      dtype="complex128", null_joint_qr=True,
                      res_threshold=1e-8)
    U = gauge.identity_gauge(8, cfg.cdtype)
    D = operators.assemble("laplace", U, cfg.m)
    # The reference-style path (independent candidates) either trips the
    # NaN/ortho guards or — fp-borderline — builds a near-degenerate
    # basis (both candidates have inner product ~1); which of the two
    # happens varies with accumulated process state, so accept either.
    try:
        mg.build_hierarchy(D, cfg.replace(null_joint_qr=False), check=True)
    except FloatingPointError:
        pass
    hier = mg.build_hierarchy(D, cfg, check=True)
    t = mg.testing.run_mg_tests(hier, cfg)
    assert max(t.values()) < 1e-10
    out = mg.solve_with_history(hier, mg.point_source(cfg), cfg,
                                max_iters=100)
    assert out.converged
