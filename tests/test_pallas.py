"""Pallas TPU kernel correctness in interpreter mode (runs on CPU; the
compiled path is exercised on real TPU hardware by bench.py)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from tpu_multigrid.config import MGConfig
from tpu_multigrid.models import gauge, operators
from tpu_multigrid.ops import stencil
from tpu_multigrid.ops import pallas_stencil as ps
from tpu_multigrid.ops.smoothers import smooth


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def _setup(st, L=32):
    cfg = MGConfig(L=L, stencil=st, m=-0.07 if st == "wilson" else 0.05,
                   nlevels=1, dtype="complex64")
    rng = np.random.default_rng(3)
    U = gauge.gauge_from_phases(0.2 * rng.normal(size=(2, L, L)), cfg.cdtype)
    D = operators.assemble(st, U, cfg.m)
    n = cfg.n_dof[0]
    v = jnp.asarray(rng.normal(size=(n, L, L))
                    + 1j * rng.normal(size=(n, L, L))).astype(cfg.cdtype)
    return cfg, D, v


@pytest.mark.parametrize("st", ["laplace", "wilson"])
def test_apply_d_pallas(interpret_pallas, st):
    cfg, D, v = _setup(st)
    out_p = ps.apply_D_pallas(D, v)
    out_x = stencil.apply_D(D, v)
    rel = float(jnp.max(jnp.abs(out_p - out_x)) / jnp.max(jnp.abs(out_x)))
    assert rel < 1e-5


@pytest.mark.parametrize("st", ["laplace", "wilson"])
def test_jacobi_pallas(interpret_pallas, st):
    cfg, D, v = _setup(st)
    Dinv = stencil.site_inverse(D[0])
    r = jnp.zeros_like(v).at[0, 2, 2].set(5.0)
    phi_p = ps.jacobi_smooth_pallas(D, Dinv, v, r, 3)
    phi_x = smooth(D, Dinv, v, r, 3, "jacobi")
    rel = float(jnp.max(jnp.abs(phi_p - phi_x)) / jnp.max(jnp.abs(phi_x)))
    assert rel < 1e-5


def test_fits_vmem():
    assert ps.fits_vmem(2, 256)       # wilson 256^2
    assert ps.fits_vmem(1, 256)       # laplace 256^2
    assert not ps.fits_vmem(2, 1024)  # too big -> XLA fallback


@pytest.mark.parametrize("st,TX", [("wilson", 16), ("laplace", 8)])
def test_apply_d_pallas_tiled(interpret_pallas, st, TX):
    """x-tiled kernel with wrapped halo rows matches XLA across tiles."""
    cfg, D, v = _setup(st, L=64)
    out_t = ps.apply_D_pallas_tiled(D, v, TX=TX)
    out_x = stencil.apply_D(D, v)
    rel = float(jnp.max(jnp.abs(out_t - out_x)) / jnp.max(jnp.abs(out_x)))
    assert rel < 1e-5


@pytest.mark.parametrize("st", ["laplace", "wilson"])
@pytest.mark.parametrize("kind", ["jacobi", "rbgs"])
def test_smooth_pallas_tiled(interpret_pallas, st, kind):
    """x-tiled smoother (grid over row-tiles, wrapped phi halos) matches
    the XLA smoother across tile boundaries and sweeps. TX=8 forces a
    4-tile grid at L=32 so the inter-tile halo splice and the global
    red-black parity offset (program_id*TX) are exercised in CI."""
    cfg, D, v = _setup(st, L=32)
    Dinv = stencil.site_inverse(D[0])
    r = jnp.zeros_like(v).at[0, 2, 2].set(5.0)
    phi_t = ps.smooth_pallas_tiled(D, Dinv, v, r, 2, kind, TX=8)
    phi_x = smooth(D, Dinv, v, r, 2, kind)
    rel = float(jnp.max(jnp.abs(phi_t - phi_x)) / jnp.max(jnp.abs(phi_x)))
    assert rel < 1e-5


def test_tile_pickers_aligned():
    """Tile pickers only return multiples of 8 that divide L; sizes with
    no such divisor (or not 8-aligned) return 0 -> XLA fallback."""
    for n, L in [(2, 96), (4, 96), (2, 1024), (4, 192), (1, 2048)]:
        for pick in (ps._pick_tile, ps._pick_smoother_tile):
            tx = pick(n, L)
            if tx:
                assert tx % 8 == 0 and L % tx == 0, (n, L, tx)
    assert ps._pick_tile(2, 100) == 0          # 100 has no mult-of-8 divisor
    assert ps._pick_smoother_tile(2, 12) == 0
    assert ps.smoother_mode(jnp.complex128, 2, 256) is None


@pytest.mark.parametrize("st", ["laplace", "wilson"])
def test_rbgs_pallas(interpret_pallas, st):
    cfg, D, v = _setup(st)
    Dinv = stencil.site_inverse(D[0])
    r = jnp.zeros_like(v).at[0, 2, 2].set(5.0)
    phi_p = ps.rbgs_smooth_pallas(D, Dinv, v, r, 2)
    phi_x = smooth(D, Dinv, v, r, 2, "rbgs")
    rel = float(jnp.max(jnp.abs(phi_p - phi_x)) / jnp.max(jnp.abs(phi_x)))
    assert rel < 1e-5


@pytest.mark.parametrize("TX", [8, 32])
def test_apply_wilson_u_pallas_tiled(interpret_pallas, TX):
    """Spin-projected (links-only) tiled kernel == dense XLA apply."""
    cfg, D, v = _setup("wilson", L=32)
    rng = np.random.default_rng(3)
    U = gauge.gauge_from_phases(0.2 * rng.normal(size=(2, 32, 32)),
                                cfg.cdtype)
    out_p = ps.apply_wilson_u_pallas(U, cfg.m, v, TX=TX)
    out_x = stencil.apply_D(D, v)
    err = float(jnp.max(jnp.abs(out_p - out_x))
                / jnp.max(jnp.abs(out_x)))
    assert err < 2e-6


def _setup_u(L=32, seed=3):
    cfg, D, v = _setup("wilson", L=L)
    rng = np.random.default_rng(seed)
    U = gauge.gauge_from_phases(0.2 * rng.normal(size=(2, L, L)),
                                cfg.cdtype)
    D = operators.assemble("wilson", U, cfg.m)
    return cfg, U, D, v


def test_apply_wilson_u_pallas_vmem(interpret_pallas):
    """Whole-VMEM links-only kernel == dense XLA apply."""
    cfg, U, D, v = _setup_u()
    out_p = ps.apply_wilson_u_pallas_vmem(U, cfg.m, v)
    out_x = stencil.apply_D(D, v)
    err = float(jnp.max(jnp.abs(out_p - out_x)) / jnp.max(jnp.abs(out_x)))
    assert err < 2e-6


@pytest.mark.parametrize("mode", ["vmem", "tiled"])
def test_wilson_u_residual_pallas(interpret_pallas, mode):
    """Fused links-only residual kernels == r - D phi (XLA)."""
    cfg, U, D, v = _setup_u()
    r = jnp.zeros_like(v).at[0, 2, 2].set(5.0)
    res_p = ps.wilson_u_residual_pallas(U, cfg.m, v, r, mode,
                                        TX=8 if mode == "tiled" else None)
    res_x = stencil.residual(D, v, r)
    err = float(jnp.max(jnp.abs(res_p - res_x)) / jnp.max(jnp.abs(v)))
    assert err < 2e-6


@pytest.mark.parametrize("kind", ["jacobi", "rbgs"])
def test_wilson_u_smooth_pallas_vmem(interpret_pallas, kind):
    """Whole-VMEM links-only smoother == dense XLA smoother (identical
    math: the level-0 diagonal is the scalar 2+m)."""
    cfg, U, D, v = _setup_u()
    Dinv = stencil.site_inverse(D[0])
    r = jnp.zeros_like(v).at[0, 2, 2].set(5.0)
    phi_p = ps.wilson_u_smooth_pallas(U, cfg.m, v, r, 3, kind)
    phi_x = smooth(D, Dinv, v, r, 3, kind)
    rel = float(jnp.max(jnp.abs(phi_p - phi_x)) / jnp.max(jnp.abs(phi_x)))
    assert rel < 2e-5


@pytest.mark.parametrize("kind", ["jacobi", "rbgs"])
def test_wilson_u_smooth_pallas_tiled(interpret_pallas, kind):
    """x-tiled links-only smoother (TX=8 -> 4-tile grid at L=32: exercises
    the inter-tile halo splice and global parity offset)."""
    cfg, U, D, v = _setup_u()
    Dinv = stencil.site_inverse(D[0])
    r = jnp.zeros_like(v).at[0, 2, 2].set(5.0)
    phi_p = ps.wilson_u_smooth_pallas_tiled(U, cfg.m, v, r, 2, kind, TX=8)
    phi_x = smooth(D, Dinv, v, r, 2, kind)
    rel = float(jnp.max(jnp.abs(phi_p - phi_x)) / jnp.max(jnp.abs(phi_x)))
    assert rel < 2e-5


def test_u_mode_gating():
    """Links-kernel dispatch: c64-only, vmem below the plane budget,
    tiled above, XLA for unalignable sizes."""
    assert ps.u_fits_vmem(256) and ps.u_fits_vmem(384)
    assert not ps.u_fits_vmem(512)
    assert ps._pick_tile_u(2048) % 8 == 0
    assert ps.u_mode(jnp.complex128, 256) is None  # c128 -> XLA
