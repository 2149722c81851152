"""Transfer-operator unit tests: quadrant block geometry, block
normalization, Gram-Schmidt orthogonalization, restriction/prolongation
adjointness (reference near_null.h behaviors)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.ops import transfer
from tpu_multigrid.ops.transfer import QUAD_OFFSETS


def random_phi_null(rng, nc, nf, L):
    return jnp.asarray(rng.normal(size=(nc, nf, L, L))
                       + 1j * rng.normal(size=(nc, nf, L, L)))


@pytest.mark.parametrize("quad", [1, 2, 3, 4])
def test_block_frame_roundtrip(quad, rng):
    v = jnp.asarray(rng.normal(size=(3, 8, 8)))
    out = transfer.from_block_frame(transfer.to_block_frame(v, quad), quad)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(v))


@pytest.mark.parametrize("quad", [1, 2, 3, 4])
def test_block_frame_matches_reference_base_site(quad, rng):
    """Block (Xc, Yc) in the block frame must contain exactly the fine sites
    {(base + (a, b)) mod L} with base from f_get_base_site
    (modules_indiv.h:6-14)."""
    L, b = 8, 2
    v = jnp.asarray(rng.normal(size=(1, L, L)))
    vb = np.asarray(transfer.to_block_frame(v, quad))
    ox, oy = QUAD_OFFSETS[quad]
    for xc in range(L // b):
        for yc in range(L // b):
            for a in range(b):
                for c in range(b):
                    xf = (b * xc + ox + a) % L
                    yf = (b * yc + oy + c) % L
                    assert vb[0, b * xc + a, b * yc + c] == np.asarray(v)[0, xf, yf]


@pytest.mark.parametrize("quad", [1, 3])
def test_block_normalize(quad, rng):
    L, b = 8, 2
    v = jnp.asarray(rng.normal(size=(2, L, L)) + 1j * rng.normal(size=(2, L, L)))
    vn = transfer.block_normalize(v, quad, b, b)
    norms = np.asarray(transfer.block_norms(vn, quad, b, b))
    np.testing.assert_allclose(norms, 1.0, atol=1e-13)


@pytest.mark.parametrize("quad", [1, 2, 3, 4])
def test_ortho_rows_orthonormal(quad, rng):
    L, b, nc, nf = 8, 2, 4, 4
    pn = random_phi_null(rng, nc, nf, L)
    pn = transfer.normalize_rows(pn, quad, b, b)
    pn = transfer.ortho_pass(pn, quad, b, b)
    pn = transfer.ortho_pass(pn, quad, b, b)
    assert float(transfer.check_ortho(pn, quad, b, b)) < 1e-12
    for d in range(nc):
        n = np.asarray(transfer.block_norms(pn[d], quad, b, b))
        np.testing.assert_allclose(n, 1.0, atol=1e-12)


@pytest.mark.parametrize("quad", [1, 2, 3, 4])
def test_restrict_prolong_adjoint(quad, rng):
    """<R u_f, v_c> == <u_f, P v_c> with P = R^dagger."""
    L, b, nc, nf = 8, 2, 2, 1
    pn = random_phi_null(rng, nc, nf, L)
    uf = jnp.asarray(rng.normal(size=(nf, L, L)) + 1j * rng.normal(size=(nf, L, L)))
    vc = jnp.asarray(rng.normal(size=(nc, L // b, L // b))
                     + 1j * rng.normal(size=(nc, L // b, L // b)))
    # <v_c, R u_f> == <P v_c, u_f>  (P = R^dagger)
    lhs = complex(jnp.sum(jnp.conj(vc) * transfer.restrict(pn, uf, quad, b, b)))
    rhs = complex(jnp.sum(jnp.conj(transfer.prolong(pn, vc, quad, b, b)) * uf))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


@pytest.mark.parametrize("quad", [1, 2, 3, 4])
def test_restriction_matches_loop_reference(quad, rng):
    """Brute-force per-block loop implementation of f_restriction
    (near_null.h:217-240) vs the vectorized version."""
    L, b, nc, nf = 4, 2, 2, 2
    pn = random_phi_null(rng, nc, nf, L)
    vf = jnp.asarray(rng.normal(size=(nf, L, L)) + 1j * rng.normal(size=(nf, L, L)))
    got = np.asarray(transfer.restrict(pn, vf, quad, b, b))
    ox, oy = QUAD_OFFSETS[quad]
    Lc = L // b
    want = np.zeros((nc, Lc, Lc), dtype=complex)
    pnn, vfn = np.asarray(pn), np.asarray(vf)
    for xc in range(Lc):
        for yc in range(Lc):
            for a in range(b):
                for c in range(b):
                    xf = (b * xc + ox + a) % L
                    yf = (b * yc + oy + c) % L
                    want[:, xc, yc] += pnn[:, :, xf, yf] @ vfn[:, xf, yf]
    np.testing.assert_allclose(got, want, atol=1e-12)
