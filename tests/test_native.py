"""Native C++ layer tests: build, heat-bath physics, fast I/O parity."""
import numpy as np
import pytest

from tpu_multigrid.utils import native
from tpu_multigrid.models import gauge

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain / build failed")


def test_heatbath_weak_coupling_plaquette():
    """U(1) weak coupling: <Re P> ~ 1 - 1/(2 beta) (here beta=32 -> 0.984).
    The reference runs at beta=32.0 (params.h:66)."""
    th = native.heatbath_run(np.zeros((2, 16, 16)), beta=32.0, sweeps=150,
                             seed=12345)
    p = native.mean_plaquette(th)
    expected = 1.0 - 1.0 / (2.0 * 32.0)
    assert abs(p - expected) < 0.01, (p, expected)
    # python-side plaquette agrees with native
    import jax.numpy as jnp
    U = gauge.gauge_from_phases(th)
    p2 = float(jnp.real(gauge.plaquette(U)))
    assert abs(p - p2) < 1e-12


def test_heatbath_python_fallback_agrees_statistically():
    thn = native.heatbath_run(np.zeros((2, 12, 12)), beta=8.0, sweeps=120,
                              seed=1)
    thp = gauge.heatbath_ensemble(12, 8.0, n_sweeps=120, seed=1,
                                  prefer_native=False)
    pn = native.mean_plaquette(thn)
    pp = native.mean_plaquette(np.ascontiguousarray(thp))
    expected = 1.0 - 1.0 / (2.0 * 8.0)
    assert abs(pn - expected) < 0.03
    assert abs(pp - expected) < 0.03


def test_native_complex_io_roundtrip(tmp_path, rng):
    vals = rng.normal(size=200) + 1j * rng.normal(size=200)
    path = str(tmp_path / "c.txt")
    native.write_complex_text(path, vals)
    back = native.read_complex_text(path, 500)
    np.testing.assert_allclose(back, vals, rtol=1e-15)


def test_native_matches_python_parser(tmp_path, rng):
    """Native parser reads Python-written files and vice versa."""
    from tpu_multigrid.utils import io as mio
    from tpu_multigrid.config import MGConfig
    cfg = MGConfig(L=8, stencil="laplace", m=0.1, nlevels=2)
    arrs = [rng.normal(size=(2, 1, 8, 8)) + 1j * rng.normal(size=(2, 1, 8, 8)),
            rng.normal(size=(2, 2, 4, 4)) + 1j * rng.normal(size=(2, 2, 4, 4))]
    path = str(tmp_path / mio.near_null_filename(cfg))
    mio.save_near_null_text(path, arrs)         # native writer
    back = mio.load_near_null_text(path, cfg)   # native reader
    for a, b in zip(arrs, back):
        np.testing.assert_allclose(a, b, rtol=1e-15)


def test_native_phase_file(tmp_path, rng):
    th = rng.uniform(-np.pi, np.pi, (2, 8, 8))
    path = str(tmp_path / "phase_8_b32.0.dat")
    gauge.write_heatbath_file(path, th)
    vals = native.read_phase_text(path, 1000)
    assert vals.size == 2 * 8 * 8
