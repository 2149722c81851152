"""Pallas TPU kernels for the gauged 5-point stencil.

Complex arithmetic is expressed as paired float32 planes (Pallas has no
complex dtype; SURVEY.md §7.3), and the whole SpMV is ONE fused VMEM pass:
the 4 neighbor shifts are `pltpu.roll`s of VMEM-resident planes, so each
element of D and v is read exactly once from HBM — the XLA fallback path
materializes 4 rolled copies of v through HBM.

Kernels:
- apply_D:      out = D v
- jacobi_sweep: phi' = -D0^{-1} (hop(phi) - r), fused with the hop —
  one kernel per smoother sweep instead of ~15 XLA HLOs.

Whole-lattice-in-VMEM strategy: valid while the operand footprint fits
VMEM (~16 MB/core): wilson c64 up to 256^2, laplace up to 512^2 — which
covers every benchmark lattice. Larger lattices fall back to the XLA path
(select via `use_pallas`/`PALLAS_MIN_FIT`); a y-tiled grid variant is the
planned extension.

Restricted to complex64 (the roofline mode); complex128 runs use XLA.

These wrappers are deliberately NOT decorated with jax.jit: they are
always called inside jitted/AOT solver programs, where a nested jit
becomes a closed_call — and closed_call lowering of these kernels under
jax_enable_x64 hits an infinite-recursion bug in the lowering cache
(measured: solve_ir's fused step with rbgs_smooth_pallas inside
RecursionErrors at any lattice size with x64 on). Inlined jaxprs lower
fine. Eager callers (tests) still work — pallas_call executes eagerly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SAME, XP, XM, YP, YM

# direction -> (shift, lattice axis index within [L, L]) for neighbor value
# value(x+1) = roll(v, -1, axis=0) on the [L, L] planes
_DIR_SHIFTS = {XP: (-1, 0), XM: (1, 0), YP: (-1, 1), YM: (1, 1)}

VMEM_BYTES = 16 * 1024 * 1024


def _footprint(n: int, L: int) -> int:
    # Dr+Di [5,n,n,L,L] + vr,vi,or,oi [n,L,L] in f32
    return 4 * (2 * 5 * n * n + 4 * n) * L * L


def fits_vmem(n: int, L: int) -> bool:
    return _footprint(n, L) <= int(0.75 * VMEM_BYTES)


def _roll2(p, shift, axis):
    # p: [n, L, L]; roll along lattice axis (axis+1 accounting for dof
    # dim). pltpu.roll requires a non-negative shift.
    L = p.shape[axis + 1]
    return pltpu.roll(p, shift % L, axis + 1)


def _apply_d_kernel(n, dr_ref, di_ref, vr_ref, vi_ref, or_ref, oi_ref):
    vr = vr_ref[:]
    vi = vi_ref[:]
    acc_r = [jnp.zeros_like(vr[0]) for _ in range(n)]
    acc_i = [jnp.zeros_like(vi[0]) for _ in range(n)]
    for s in (SAME, XP, XM, YP, YM):
        if s == SAME:
            nr, ni = vr, vi
        else:
            sh, ax = _DIR_SHIFTS[s]
            nr = _roll2(vr, sh, ax)
            ni = _roll2(vi, sh, ax)
        for i in range(n):
            for j in range(n):
                dr = dr_ref[s, i, j]
                di = di_ref[s, i, j]
                acc_r[i] += dr * nr[j] - di * ni[j]
                acc_i[i] += dr * ni[j] + di * nr[j]
    or_ref[:] = jnp.stack(acc_r)
    oi_ref[:] = jnp.stack(acc_i)


def _jacobi_kernel(n, n_sweeps, dr_ref, di_ref, ir_ref, ii_ref, pr_ref,
                   pi_ref, rr_ref, ri_ref, or_ref, oi_ref):
    """n_sweeps x { phi' = -D0inv (hop(phi) - r) }, all VMEM-resident:
    D is fetched from HBM once per smooth, not once per sweep."""
    pr = pr_ref[:]
    pi = pi_ref[:]
    for _ in range(n_sweeps):
        hr = [jnp.zeros_like(pr[0]) for _ in range(n)]
        hi = [jnp.zeros_like(pi[0]) for _ in range(n)]
        for s in (XP, XM, YP, YM):
            sh, ax = _DIR_SHIFTS[s]
            nr = _roll2(pr, sh, ax)
            ni = _roll2(pi, sh, ax)
            for i in range(n):
                for j in range(n):
                    dr = dr_ref[s, i, j]
                    di = di_ref[s, i, j]
                    hr[i] += dr * nr[j] - di * ni[j]
                    hi[i] += dr * ni[j] + di * nr[j]
        for i in range(n):
            hr[i] = hr[i] - rr_ref[i]
            hi[i] = hi[i] - ri_ref[i]
        out_r, out_i = [], []
        for i in range(n):
            rr = jnp.zeros_like(pr[0])
            ii = jnp.zeros_like(pr[0])
            for j in range(n):
                dr = ir_ref[i, j]
                di = ii_ref[i, j]
                rr += dr * hr[j] - di * hi[j]
                ii += dr * hi[j] + di * hr[j]
            out_r.append(-rr)
            out_i.append(-ii)
        pr = jnp.stack(out_r)
        pi = jnp.stack(out_i)
    or_ref[:] = pr
    oi_ref[:] = pi


def _rbgs_kernel(n, n_sweeps, dr_ref, di_ref, ir_ref, ii_ref, pr_ref,
                 pi_ref, rr_ref, ri_ref, or_ref, oi_ref):
    """n_sweeps red-black GS sweeps (red half-update then black
    half-update), entirely VMEM-resident: D is fetched from HBM once per
    smooth, and the redundant masked FLOPs are free — the sweep is
    HBM-bandwidth-bound."""
    L = pr_ref.shape[-1]
    x = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    y = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    red = ((x + y) % 2 == 0)

    def half(pr, pi, mask):
        hr = [jnp.zeros_like(pr[0]) for _ in range(n)]
        hi = [jnp.zeros_like(pi[0]) for _ in range(n)]
        for s in (XP, XM, YP, YM):
            sh, ax = _DIR_SHIFTS[s]
            nr = _roll2(pr, sh, ax)
            ni = _roll2(pi, sh, ax)
            for i in range(n):
                for j in range(n):
                    dr = dr_ref[s, i, j]
                    di = di_ref[s, i, j]
                    hr[i] += dr * nr[j] - di * ni[j]
                    hi[i] += dr * ni[j] + di * nr[j]
        out_r, out_i = [], []
        for i in range(n):
            rr = jnp.zeros_like(pr[0])
            ii = jnp.zeros_like(pr[0])
            for j in range(n):
                dr = ir_ref[i, j]
                di = ii_ref[i, j]
                ar = hr[j] - rr_ref[j]
                ai = hi[j] - ri_ref[j]
                rr += dr * ar - di * ai
                ii += dr * ai + di * ar
            out_r.append(jnp.where(mask, -rr, pr[i]))
            out_i.append(jnp.where(mask, -ii, pi[i]))
        return jnp.stack(out_r), jnp.stack(out_i)

    pr, pi = pr_ref[:], pi_ref[:]
    for _ in range(n_sweeps):
        pr, pi = half(pr, pi, red)
        pr, pi = half(pr, pi, jnp.logical_not(red))
    or_ref[:] = pr
    oi_ref[:] = pi


def rbgs_smooth_pallas(D, D0inv, phi, r, n_sweeps: int = 1):
    """n_sweeps fused red-black GS sweeps in ONE kernel call (matches
    ops.smoothers rbgs_sweep with omega=1); every operand crosses HBM
    once per smooth, not once per sweep."""
    n = phi.shape[0]
    dr, di = _split(D)
    ir, ii = _split(D0inv)
    rr, ri = _split(r)
    pr, pi = _split(phi)
    kern = functools.partial(_rbgs_kernel, n, n_sweeps)
    pr, pi = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(phi.shape, jnp.float32),
                   jax.ShapeDtypeStruct(phi.shape, jnp.float32)),
        in_specs=_vmem_specs(8),
        out_specs=tuple(_vmem_specs(2)),
    )(dr, di, ir, ii, pr, pi, rr, ri)
    return (pr + 1j * pi).astype(phi.dtype)


def _split(z):
    return jnp.real(z).astype(jnp.float32), jnp.imag(z).astype(jnp.float32)


def _vmem_specs(k):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(k)]


def apply_D_pallas(D: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused SpMV; D [5,n,n,L,L] c64, v [n,L,L] c64 -> [n,L,L] c64."""
    n, L = v.shape[0], v.shape[-1]
    dr, di = _split(D)
    vr, vi = _split(v)
    kern = functools.partial(_apply_d_kernel, n)
    out_r, out_i = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(v.shape, jnp.float32),
                   jax.ShapeDtypeStruct(v.shape, jnp.float32)),
        in_specs=_vmem_specs(4),
        out_specs=tuple(_vmem_specs(2)),
    )(dr, di, vr, vi)
    return (out_r + 1j * out_i).astype(v.dtype)


def jacobi_smooth_pallas(D, D0inv, phi, r, n_sweeps: int = 1):
    """n_sweeps fused Jacobi sweeps in ONE kernel call (matches
    ops.smoothers.jacobi_sweep); every operand crosses HBM once per
    smooth, not once per sweep."""
    n = phi.shape[0]
    dr, di = _split(D)
    ir, ii = _split(D0inv)
    rr, ri = _split(r)
    pr, pi = _split(phi)
    kern = functools.partial(_jacobi_kernel, n, n_sweeps)
    pr, pi = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(phi.shape, jnp.float32),
                   jax.ShapeDtypeStruct(phi.shape, jnp.float32)),
        in_specs=_vmem_specs(8),
        out_specs=tuple(_vmem_specs(2)),
    )(dr, di, ir, ii, pr, pi, rr, ri)
    return (pr + 1j * pi).astype(phi.dtype)


def _tiled_apply_kernel(n, TX, dr_ref, di_ref, vr_ref, vi_ref,
                        upr_ref, upi_ref, dnr_ref, dni_ref,
                        or_ref, oi_ref):
    """One x-tile of the SpMV. Tile inputs:
    v*_ref   [n, TX, L] — the tile rows
    up*_ref  [n, 8, L]  — 8-row block starting at global row
                          (i*TX + TX) mod L; row 0 is the x+1 halo
    dn*_ref  [n, 8, L]  — 8-row block starting at (i*TX - 8) mod L;
                          row 7 is the x-1 halo
    (Pallas TPU requires the last two block dims to be (8,128)-tile
    aligned, so single-row halo blocks are not expressible — fetch the
    aligned 8-row block containing the halo row and slice in-kernel.)
    d*_ref   [5, n, n, TX, L]
    """
    vr = vr_ref[:]
    vi = vi_ref[:]
    # neighbor values in x: shift rows within the tile, splice halo rows
    xp_r = jnp.concatenate([vr[:, 1:, :], upr_ref[:, 0:1, :]], axis=1)
    xp_i = jnp.concatenate([vi[:, 1:, :], upi_ref[:, 0:1, :]], axis=1)
    xm_r = jnp.concatenate([dnr_ref[:, 7:8, :], vr[:, :-1, :]], axis=1)
    xm_i = jnp.concatenate([dni_ref[:, 7:8, :], vi[:, :-1, :]], axis=1)
    # y-direction is fully inside the tile: periodic roll on the last axis
    L = vr.shape[-1]
    yp_r, yp_i = pltpu.roll(vr, L - 1, 2), pltpu.roll(vi, L - 1, 2)
    ym_r, ym_i = pltpu.roll(vr, 1, 2), pltpu.roll(vi, 1, 2)
    nbrs = {SAME: (vr, vi), XP: (xp_r, xp_i), XM: (xm_r, xm_i),
            YP: (yp_r, yp_i), YM: (ym_r, ym_i)}
    acc_r = [jnp.zeros_like(vr[0]) for _ in range(n)]
    acc_i = [jnp.zeros_like(vi[0]) for _ in range(n)]
    for s in (SAME, XP, XM, YP, YM):
        nr, ni = nbrs[s]
        for i in range(n):
            for j in range(n):
                dr = dr_ref[s, i, j]
                di = di_ref[s, i, j]
                acc_r[i] += dr * nr[j] - di * ni[j]
                acc_i[i] += dr * ni[j] + di * nr[j]
    or_ref[:] = jnp.stack(acc_r)
    oi_ref[:] = jnp.stack(acc_i)


def _tile_candidates(L: int, start: int):
    """Row-tile sizes, descending: multiples of 8 (the f32 sublane tile —
    the wrapped-halo BlockSpecs index 8-row blocks, so TX % 8 == 0 is a
    correctness requirement, not a preference) that divide L exactly."""
    top = (min(start, L) // 8) * 8
    return [t for t in range(top, 7, -8) if L % t == 0]


def _pick_tile(n: int, L: int) -> int:
    """Largest valid row-tile whose operand footprint fits the raised
    scoped-VMEM budget; 0 if no multiple-of-8 divisor of L fits (caller
    falls back to XLA).

    Budget: 28 MB per block — Pallas double-buffers the pipeline, so the
    scoped allocation is ~2x this, inside the 64 MiB limit aot_call
    requests on TPU (utils/compile.SCOPED_VMEM_KIB). Measured at L=2048
    (kernel_tune.json): TX=64 (27 MB/block) 0.81 of roofline vs TX=8
    0.74; TX=128 exceeds the scoped limit."""
    for tx in _tile_candidates(L, min(L, 64)):
        bytes_needed = 4 * (2 * 5 * n * n * tx + 4 * n * (tx + 2)
                            + 2 * n * tx) * L
        if bytes_needed <= 28 * 1024 * 1024:
            return tx
    return 0


def apply_D_pallas_tiled(D: jnp.ndarray, v: jnp.ndarray,
                         TX: int | None = None) -> jnp.ndarray:
    """x-tiled fused SpMV for lattices too large for whole-in-VMEM.

    Grid over row-tiles; halo rows are delivered per tile by wrapped
    BlockSpec index_maps (block row (i*TX±...) mod L), so the periodic
    boundary costs no extra passes.
    """
    n, L = v.shape[0], v.shape[-1]
    TX = TX or _pick_tile(n, L)
    if not TX or TX % 8 or L % TX:
        raise ValueError(
            f"no valid x-tile for L={L} (need TX % 8 == 0 and L % TX == 0); "
            "use the XLA path")
    grid = (L // TX,)
    dr, di = _split(D)
    vr, vi = _split(v)

    # halo blocks are 8-row aligned (block units of 8 rows); TX is a
    # multiple of 8 so (i*TX ± TX) is 8-aligned
    def up_map(i):
        return (0, ((i * TX + TX) % L) // 8, 0)

    def dn_map(i):
        return (0, ((i * TX - 8) % L) // 8, 0)

    vspec = pl.BlockSpec((n, TX, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    hspec_up = pl.BlockSpec((n, 8, L), up_map, memory_space=pltpu.VMEM)
    hspec_dn = pl.BlockSpec((n, 8, L), dn_map, memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((5, n, n, TX, L), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_tiled_apply_kernel, n, TX)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct(v.shape, jnp.float32),
                   jax.ShapeDtypeStruct(v.shape, jnp.float32)),
        in_specs=[dspec, dspec, vspec, vspec, hspec_up, hspec_up,
                  hspec_dn, hspec_dn],
        out_specs=(vspec, vspec),
    )(dr, di, vr, vi, vr, vi, vr, vi)
    return (out_r + 1j * out_i).astype(v.dtype)


def apply_D_pallas_auto(D: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Whole-in-VMEM kernel when it fits, x-tiled kernel otherwise."""
    n, L = v.shape[0], v.shape[-1]
    if fits_vmem(n, L):
        return apply_D_pallas(D, v)
    return apply_D_pallas_tiled(D, v)


# --- tiled smoothers --------------------------------------------------------

def _tiled_update_kernel(n, TX, color, dhr_ref, dhi_ref, ir_ref, ii_ref,
                         rr_ref, ri_ref, pr_ref, pi_ref,
                         upr_ref, upi_ref, dnr_ref, dni_ref,
                         or_ref, oi_ref):
    """One x-tile of phi' = -D0inv (hop(phi) - r).

    color: None -> write every site (Jacobi); 0/1 -> update only sites
    with (x+y)%2 == color (one half of a red-black sweep), keep phi
    elsewhere. dh*_ref are the 4 hop planes D[1:5] ([4,n,n,TX,L]); halo
    refs carry 8-row aligned blocks around the wrapped x±1 rows of phi
    (row 0 of up = x+1 halo, row 7 of dn = x-1 halo; see
    _tiled_apply_kernel for the alignment rationale).
    """
    pr = pr_ref[:]
    pi = pi_ref[:]
    xp_r = jnp.concatenate([pr[:, 1:, :], upr_ref[:, 0:1, :]], axis=1)
    xp_i = jnp.concatenate([pi[:, 1:, :], upi_ref[:, 0:1, :]], axis=1)
    xm_r = jnp.concatenate([dnr_ref[:, 7:8, :], pr[:, :-1, :]], axis=1)
    xm_i = jnp.concatenate([dni_ref[:, 7:8, :], pi[:, :-1, :]], axis=1)
    L = pr.shape[-1]
    yp_r, yp_i = pltpu.roll(pr, L - 1, 2), pltpu.roll(pi, L - 1, 2)
    ym_r, ym_i = pltpu.roll(pr, 1, 2), pltpu.roll(pi, 1, 2)
    nbrs = ((xp_r, xp_i), (xm_r, xm_i), (yp_r, yp_i), (ym_r, ym_i))
    hr = [jnp.zeros_like(pr[0]) for _ in range(n)]
    hi = [jnp.zeros_like(pi[0]) for _ in range(n)]
    for s in range(4):          # dh index: 0=+x,1=-x,2=+y,3=-y (D[1:5])
        nr, ni = nbrs[s]
        for i in range(n):
            for j in range(n):
                dr = dhr_ref[s, i, j]
                di = dhi_ref[s, i, j]
                hr[i] += dr * nr[j] - di * ni[j]
                hi[i] += dr * ni[j] + di * nr[j]
    if color is not None:
        x0 = pl.program_id(0) * TX
        x = x0 + jax.lax.broadcasted_iota(jnp.int32, (TX, L), 0)
        y = jax.lax.broadcasted_iota(jnp.int32, (TX, L), 1)
        mask = ((x + y) % 2 == color)
    out_r, out_i = [], []
    for i in range(n):
        rr = jnp.zeros_like(pr[0])
        ii = jnp.zeros_like(pr[0])
        for j in range(n):
            dr = ir_ref[i, j]
            di = ii_ref[i, j]
            ar = hr[j] - rr_ref[j]
            ai = hi[j] - ri_ref[j]
            rr += dr * ar - di * ai
            ii += dr * ai + di * ar
        if color is None:
            out_r.append(-rr)
            out_i.append(-ii)
        else:
            out_r.append(jnp.where(mask, -rr, pr[i]))
            out_i.append(jnp.where(mask, -ii, pi[i]))
    or_ref[:] = jnp.stack(out_r)
    oi_ref[:] = jnp.stack(out_i)


def _tiled_update_call(dhr, dhi, ir, ii, rr, ri, pr, pi, color, TX):
    n, L = pr.shape[0], pr.shape[-1]
    grid = (L // TX,)
    vspec = pl.BlockSpec((n, TX, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    hspec_up = pl.BlockSpec((n, 8, L),
                            lambda i: (0, ((i * TX + TX) % L) // 8, 0),
                            memory_space=pltpu.VMEM)
    hspec_dn = pl.BlockSpec((n, 8, L),
                            lambda i: (0, ((i * TX - 8) % L) // 8, 0),
                            memory_space=pltpu.VMEM)
    dhspec = pl.BlockSpec((4, n, n, TX, L), lambda i: (0, 0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((n, n, TX, L), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_tiled_update_kernel, n, TX, color)
    return pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct(pr.shape, jnp.float32),
                   jax.ShapeDtypeStruct(pi.shape, jnp.float32)),
        in_specs=[dhspec, dhspec, ispec, ispec, vspec, vspec, vspec, vspec,
                  hspec_up, hspec_up, hspec_dn, hspec_dn],
        out_specs=(vspec, vspec),
    )(dhr, dhi, ir, ii, rr, ri, pr, pi, pr, pi, pr, pi)


def _pick_smoother_tile(n: int, L: int) -> int:
    """Largest valid row-tile for the tiled smoother; 0 if no multiple-of-8
    divisor of L fits VMEM (caller falls back to XLA)."""
    for tx in _tile_candidates(L, 256):
        bytes_needed = 4 * ((2 * 4 + 2) * n * n + 8 * n + 4) * tx * L
        if bytes_needed <= int(0.5 * VMEM_BYTES):
            return tx
    return 0


def smooth_pallas_tiled(D, D0inv, phi, r, n_sweeps: int = 1,
                        kind: str = "jacobi", TX: int | None = None):
    """n_sweeps fused x-tiled smoother sweeps for lattices too large for
    the whole-in-VMEM kernels. kind: 'jacobi' (one masked-free pass per
    sweep) or 'rbgs' (red half-pass then black half-pass per sweep;
    matches ops.smoothers rbgs_sweep with omega=1)."""
    n, L = phi.shape[0], phi.shape[-1]
    TX = TX or _pick_smoother_tile(n, L)
    if not TX or TX % 8 or L % TX:
        raise ValueError(
            f"no valid x-tile for L={L} (need TX % 8 == 0 and L % TX == 0); "
            "use the XLA path")
    dhr, dhi = _split(D[1:])
    ir, ii = _split(D0inv)
    rr, ri = _split(r)
    pr, pi = _split(phi)

    def body(_, carry):
        pr, pi = carry
        if kind == "jacobi":
            return _tiled_update_call(dhr, dhi, ir, ii, rr, ri, pr, pi,
                                      None, TX)
        pr, pi = _tiled_update_call(dhr, dhi, ir, ii, rr, ri, pr, pi,
                                    0, TX)
        return _tiled_update_call(dhr, dhi, ir, ii, rr, ri, pr, pi,
                                  1, TX)

    pr, pi = jax.lax.fori_loop(0, n_sweeps, body, (pr, pi))
    return (pr + 1j * pi).astype(phi.dtype)


# --- spin-projected (links-only) wilson kernel ------------------------------

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _wilson_u_kernel(TX, m, uxr_ref, uxi_ref, uyr_ref, uyi_ref,
                     dnxr_ref, dnxi_ref, vr_ref, vi_ref,
                     upr_ref, upi_ref, dnr_ref, dni_ref, or_ref, oi_ref):
    """One x-tile of the spin-projected Wilson SpMV
    (ops.gauge_stencil.apply_wilson_u math; 4 link planes instead of the
    dense 20 D planes — ~4x less HBM traffic for identical math).

    Refs: ux/uy tiles [TX, L]; dnx*_ref [8, L] is the 8-row block holding
    the wrapped x-1 link row (row 7); v*_ref [2, TX, L] with up/dn halo
    blocks [2, 8, L] as in _tiled_apply_kernel.
    """
    L = vr_ref.shape[-1]
    v0r, v0i = vr_ref[0], vi_ref[0]
    v1r, v1i = vr_ref[1], vi_ref[1]
    uxr, uxi = uxr_ref[:], uxi_ref[:]
    uyr, uyi = uyr_ref[:], uyi_ref[:]

    def splice_xp(p_tile, p_up):
        return jnp.concatenate([p_tile[1:, :], p_up[0:1, :]], axis=0)

    def splice_xm(p_tile, p_dn):
        return jnp.concatenate([p_dn[7:8, :], p_tile[:-1, :]], axis=0)

    # +x: h_a = ux(x) * (v0 - v1)(x+1)
    ar = splice_xp(v0r - v1r, upr_ref[0] - upr_ref[1])
    ai = splice_xp(v0i - v1i, upi_ref[0] - upi_ref[1])
    har, hai = _cmul(uxr, uxi, ar, ai)
    # -x: h_b = conj(ux(x-1)) * (v0 + v1)(x-1)
    br = splice_xm(v0r + v1r, dnr_ref[0] + dnr_ref[1])
    bi = splice_xm(v0i + v1i, dni_ref[0] + dni_ref[1])
    uxmr = splice_xm(uxr, dnxr_ref[:])
    uxmi = splice_xm(uxi, dnxi_ref[:])
    hbr, hbi = _cmul(uxmr, -uxmi, br, bi)
    # +y: h_c = uy(x) * (v0 + i v1)(y+1)
    cr = pltpu.roll(v0r - v1i, L - 1, 1)
    ci = pltpu.roll(v0i + v1r, L - 1, 1)
    hcr, hci = _cmul(uyr, uyi, cr, ci)
    # -y: h_d = conj(uy(y-1)) * (v0 - i v1)(y-1)
    dr = pltpu.roll(v0r + v1i, 1, 1)
    di = pltpu.roll(v0i - v1r, 1, 1)
    uymr = pltpu.roll(uyr, 1, 1)
    uymi = pltpu.roll(uyi, 1, 1)
    hdr, hdi = _cmul(uymr, -uymi, dr, di)

    s = 2.0 + m
    out0r = s * v0r + 0.5 * (har + hbr + hcr + hdr)
    out0i = s * v0i + 0.5 * (hai + hbi + hci + hdi)
    # out1 = s*v1 + 0.5*(-ha + hb - i*hc + i*hd);  -i*h = (hi, -hr)
    out1r = s * v1r + 0.5 * (-har + hbr + hci - hdi)
    out1i = s * v1i + 0.5 * (-hai + hbi - hcr + hdr)
    or_ref[:] = jnp.stack([out0r, out1r])
    oi_ref[:] = jnp.stack([out0i, out1i])


def _pick_tile_u(L: int) -> int:
    """Row tile for the links-only kernel: ~14 f32 planes of [TX, L]."""
    for tx in _tile_candidates(L, 256):
        if 4 * 14 * tx * L <= int(0.5 * VMEM_BYTES):
            return tx
    return 0


def apply_wilson_u_pallas(U: jnp.ndarray, m: float, v: jnp.ndarray,
                          TX: int | None = None) -> jnp.ndarray:
    """x-tiled spin-projected Wilson SpMV; U [2,L,L] c64, v [2,L,L] c64.

    Identical math to ops.gauge_stencil.apply_wilson_u (and therefore to
    apply_D on the assembled dense stencil); streams the 4 link planes
    instead of the 20 dense-D planes.
    """
    L = v.shape[-1]
    TX = TX or _pick_tile_u(L)
    if not TX or TX % 8 or L % TX:
        raise ValueError(f"no valid x-tile for L={L}; use the XLA path")
    grid = (L // TX,)
    uxr, uxi = _split(U[0])
    uyr, uyi = _split(U[1])
    vr, vi = _split(v)

    def up_map(i):
        return (0, ((i * TX + TX) % L) // 8, 0)

    def dn_map(i):
        return (0, ((i * TX - 8) % L) // 8, 0)

    uspec = pl.BlockSpec((TX, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    udn = pl.BlockSpec((8, L), lambda i: (((i * TX - 8) % L) // 8, 0),
                       memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((2, TX, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    hup = pl.BlockSpec((2, 8, L), up_map, memory_space=pltpu.VMEM)
    hdn = pl.BlockSpec((2, 8, L), dn_map, memory_space=pltpu.VMEM)
    kern = functools.partial(_wilson_u_kernel, TX, m)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct(v.shape, jnp.float32),
                   jax.ShapeDtypeStruct(v.shape, jnp.float32)),
        in_specs=[uspec, uspec, uspec, uspec, udn, udn,
                  vspec, vspec, hup, hup, hdn, hdn],
        out_specs=(vspec, vspec),
    )(uxr, uxi, uyr, uyi, uxr, uxi, vr, vi, vr, vi, vr, vi)
    return (out_r + 1j * out_i).astype(v.dtype)


def _on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    if jax.config.jax_enable_x64:
        # Pallas Mosaic lowering is broken under jax_enable_x64 in this
        # jax version: whole-VMEM kernels fail an internal verification
        # error and x-tiled kernels send convert_element_type lowering
        # into infinite recursion (measured 2026-08-21; the kernels
        # themselves contain no f64). x64 runs (e.g. solve_ir's outer
        # f64 loop process) therefore dispatch to the XLA path.
        return False
    return plat in ("tpu", "axon")


def use_pallas(dtype, n: int, L: int) -> bool:
    """Whether the whole-in-VMEM Pallas path applies: complex64 + fits in
    VMEM + on TPU."""
    return dtype == jnp.complex64 and fits_vmem(n, L) and _on_tpu()


def smoother_mode(dtype, n: int, L: int):
    """Pallas smoother dispatch: 'vmem' (whole-lattice fused kernels),
    'tiled' (x-tiled kernels for large lattices), or None (XLA path)."""
    if dtype != jnp.complex64 or not _on_tpu():
        return None
    if fits_vmem(n, L):
        return "vmem"
    if _pick_smoother_tile(n, L):   # valid tile: TX % 8 == 0 and L % TX == 0
        return "tiled"
    return None
