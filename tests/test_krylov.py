"""MG-preconditioned FGMRES: convergence on systems where the stationary
cycle struggles (near-critical Wilson) and equivalence on easy systems."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.config import MGConfig
from tpu_multigrid.models import gauge, operators
from tpu_multigrid.solver.hierarchy import build_hierarchy, point_source
from tpu_multigrid.solver.driver import solve
from tpu_multigrid.solver.krylov import fgmres_solve
from tpu_multigrid.ops.stencil import residual_norm_ratio


def test_fgmres_easy_system():
    cfg = MGConfig(L=16, stencil="laplace", m=0.2, nlevels=2, num_iters=6,
                   null_iters=60, res_threshold=1e-9)
    D = operators.assemble("laplace", gauge.identity_gauge(16, cfg.cdtype),
                           cfg.m)
    hier = build_hierarchy(D, cfg, check=False)
    b = point_source(cfg)
    phi, iters, rel = fgmres_solve(hier, b, cfg, tol=1e-9)
    assert rel < 1e-9
    assert float(residual_norm_ratio(D, jnp.asarray(phi), b)) < 1e-8


def test_fgmres_rescues_hard_wilson():
    """At m=-0.02 on a beta=32 ensemble the Wilson operator is mildly
    indefinite: the stationary MG iteration diverges, but the same MG
    cycle as an FGMRES preconditioner converges."""
    theta = gauge.heatbath_ensemble(16, 32.0, 60, 7)
    cfg = MGConfig(L=16, stencil="wilson", m=-0.02, nlevels=2, num_iters=6,
                   null_iters=150, res_threshold=1e-8)
    U = gauge.gauge_from_phases(theta, cfg.cdtype)
    D = operators.assemble("wilson", U, cfg.m)
    hier = build_hierarchy(D, cfg, check=False)
    b = point_source(cfg)

    stat = solve(hier, b, cfg, max_iters=60)
    phi, iters, rel = fgmres_solve(hier, b, cfg, tol=1e-8, restart=15,
                                   max_restarts=20)
    assert rel < 1e-8, rel
    # and it must be the rescue: either the stationary solve failed or
    # FGMRES needed far fewer operator applications
    assert (not stat.converged) or iters <= stat.iters
