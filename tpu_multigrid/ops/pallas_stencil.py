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


# --- spin-projected (links-only) wilson kernels -----------------------------
#
# Level-0 fast path: the Wilson hop matrices are rank-1 spinor projectors
# ⊗ a U(1) phase (reference level.h:155-172; ops/gauge_stencil.py has the
# math and the XLA twin), so the operator streams 2 complex link planes
# instead of the 20 dense-D planes. Operand layout (round 5, measured on
# hardware — see docs/PERF.md §8b):
#   ul [4, L, L] f32 — [uxr, uxi, uyr, uyi] × 0.5 (the hop's 1/2 factor
#       is folded into the static link planes at trace time).
#   vp [4, L, L] f32 — [v0r, v1r, v0i, v1i] spinor planes.
# Round-4 shipped 14 small operands (0.33 of roofline); a round-5
# pre-shifted-uym 6-plane variant measured the levers on hardware:
# in-kernel lane rolls, x-splices and the complex arithmetic are each
# FREE (removing all rolls changed timing by 0.3%), the pipeline is
# DMA-bound — so uym is recomputed in-kernel by a (free) roll and the
# streamed planes are exactly the 12-plane minimum (ul 4 + vp 4 +
# out 4) plus three small 8-row halo blocks.

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def u_link_planes(U: jnp.ndarray) -> jnp.ndarray:
    """U [2,L,L] complex -> ul [4,L,L] f32 = 0.5*[uxr, uxi, uyr, uyi].
    Traced (XLA) — called once per smooth/apply wrapper, outside the
    sweep loop, so the split pass amortizes over sweeps."""
    ux, uy = 0.5 * U[0], 0.5 * U[1]
    return jnp.stack([jnp.real(ux), jnp.imag(ux), jnp.real(uy),
                      jnp.imag(uy)]).astype(jnp.float32)


def _v_planes(v: jnp.ndarray) -> jnp.ndarray:
    """v [2,L,L] complex -> vp [4,L,L] f32 = [v0r, v1r, v0i, v1i]."""
    return jnp.concatenate([jnp.real(v), jnp.imag(v)], axis=0
                           ).astype(jnp.float32)


# Halo delivery note (round-5 tuning archaeology, measured on v5e at
# L=4096/TX=128): the wrapped MODULAR halo index maps below cost ~30%
# of pipeline throughput (2858 us vs 1997 us with halos pinned to a
# static block — wrong math, identical DMA volume). Every realizable
# affine-halo scheme nets ZERO on this XLA/Mosaic version, so the
# modular maps stay: (a) TX-left-padded operands — the pad concat does
# NOT fuse into the plane-split pass (+8 plane-passes, 3703 us);
# (b) jnp row-gather compact halo arrays — pathological gather
# lowering (3796 us); (c) strided-slice + block-roll compact halo
# arrays — build cost equals the pipelining gain (2920 us). The
# remaining structural ceiling is the DMA pipeline itself: a pure-DMA
# twin of this kernel (no shifts/arithmetic) runs at 0.68 of peak
# independent of TX and dimension_semantics, vs ~0.81 for the dense
# kernel's 2x-larger per-step volume; TX=256 exceeds even a 112 MiB
# scoped-VMEM limit. See docs/PERF.md §8b for the full account.


def _v_unplanes(p: jnp.ndarray, dtype) -> jnp.ndarray:
    return (p[:2] + 1j * p[2:]).astype(dtype)


def _u_hop_core(ul4, cmb, yshift):
    """Spin-projected hop from 4 half-scaled link planes + shifted
    combined fields.

    ul4: (uxr, uxi, uyr, uyi) planes, PRE-multiplied by 0.5.
    cmb: dict with the x-shifted combined fields and uxm planes
         (built by the caller: whole-lattice rolls or tile splices).
    yshift(p, up): lane shift — up=True gives value at y+1 (measured
    free on v5e; the kernel is DMA-bound).
    Returns (h0r, h1r, h0i, h1i) matching the vp plane order.
    """
    uxr, uxi, uyr, uyi = ul4
    uymr = yshift(uyr, False)       # U_y at y-1, recomputed (free)
    uymi = yshift(uyi, False)
    # +x: h_a = ux/2 * (v0 - v1)(x+1)
    har, hai = _cmul(uxr, uxi, cmb["ar"], cmb["ai"])
    # -x: h_b = conj(ux(x-1))/2 * (v0 + v1)(x-1)
    hbr, hbi = _cmul(cmb["uxmr"], -cmb["uxmi"], cmb["br"], cmb["bi"])
    # +y: h_c = uy/2 * (v0 + i v1)(y+1)
    hcr, hci = _cmul(uyr, uyi, yshift(cmb["cr"], True),
                     yshift(cmb["ci"], True))
    # -y: h_d = conj(uy(y-1))/2 * (v0 - i v1)(y-1)
    hdr, hdi = _cmul(uymr, -uymi, yshift(cmb["dr"], False),
                     yshift(cmb["di"], False))
    h0r = har + hbr + hcr + hdr
    h0i = hai + hbi + hci + hdi
    # h1 = -ha + hb - i*hc + i*hd;  -i*h = (hi, -hr), +i*h = (-hi, hr)
    h1r = -har + hbr + hci - hdi
    h1i = -hai + hbi - hcr + hdr
    return h0r, h1r, h0i, h1i


def _u_hop_vmem(ul_ref, vp):
    """Whole-lattice hop: x shifts are sublane rolls, y shifts lane rolls."""
    L = vp[0].shape[-1]
    ul4 = tuple(ul_ref[k] for k in range(4))
    v0r, v1r, v0i, v1i = vp

    def xp(p):
        return pltpu.roll(p, L - 1, 0)

    def xm(p):
        return pltpu.roll(p, 1, 0)

    cmb = dict(
        ar=xp(v0r - v1r), ai=xp(v0i - v1i),
        br=xm(v0r + v1r), bi=xm(v0i + v1i),
        uxmr=xm(ul4[0]), uxmi=xm(ul4[1]),
        cr=v0r - v1i, ci=v0i + v1r,
        dr=v0r + v1i, di=v0i - v1r,
    )

    def yshift(p, up):
        return pltpu.roll(p, L - 1 if up else 1, 1)

    return _u_hop_core(ul4, cmb, yshift)


def _u_hop_tile(ul_ref, uld_ref, vp, up_ref, dn_ref):
    """One x-tile hop: x shifts splice 8-row-aligned wrapped halo blocks
    (see _tiled_apply_kernel for the alignment rationale), y shifts are
    in-tile lane rolls (periodic: the tile spans the full y extent).
    uld_ref [2, 8, L]: the 8-row block holding the wrapped x-1 link row
    (ux planes only)."""
    L = vp[0].shape[-1]
    ul4 = tuple(ul_ref[k] for k in range(4))
    v0r, v1r, v0i, v1i = vp

    def sxp(t, h):      # value at x+1: halo row 0 of the up block
        return jnp.concatenate([t[1:, :], h], axis=0)

    def sxm(t, h):      # value at x-1: halo row 7 of the down block
        return jnp.concatenate([h, t[:-1, :]], axis=0)

    up = up_ref[:]      # [4, 8, L]
    dn = dn_ref[:]
    cmb = dict(
        ar=sxp(v0r - v1r, up[0, 0:1] - up[1, 0:1]),
        ai=sxp(v0i - v1i, up[2, 0:1] - up[3, 0:1]),
        br=sxm(v0r + v1r, dn[0, 7:8] + dn[1, 7:8]),
        bi=sxm(v0i + v1i, dn[2, 7:8] + dn[3, 7:8]),
        uxmr=sxm(ul4[0], uld_ref[0, 7:8]),
        uxmi=sxm(ul4[1], uld_ref[1, 7:8]),
        cr=v0r - v1i, ci=v0i + v1r,
        dr=v0r + v1i, di=v0i - v1r,
    )

    def yshift(p, up_):
        return pltpu.roll(p, L - 1 if up_ else 1, 1)

    return _u_hop_core(ul4, cmb, yshift)


def _u_out(mode, m, vp, h, rp=None, mask=None):
    """Combine hop planes into the mode's output planes.
    apply:    s v + h
    residual: r - s v - h
    jacobi:   (r - h)/s          (phi' = -D0^{-1}(hop - r), D0 = s I)
    rb:       where(mask, (r - h)/s, v)
    """
    s = 2.0 + m
    if mode == "apply":
        return [s * vp[k] + h[k] for k in range(4)]
    if mode == "residual":
        return [rp[k] - s * vp[k] - h[k] for k in range(4)]
    upd = [(rp[k] - h[k]) * (1.0 / s) for k in range(4)]
    if mode == "jacobi":
        return upd
    return [jnp.where(mask, upd[k], vp[k]) for k in range(4)]


# -- whole-VMEM kernels --

def _u_apply_vmem_kernel(m, ul_ref, vp_ref, o_ref):
    vp = tuple(vp_ref[k] for k in range(4))
    h = _u_hop_vmem(ul_ref, vp)
    o_ref[:] = jnp.stack(_u_out("apply", m, vp, h))


def _u_resid_vmem_kernel(m, ul_ref, vp_ref, rp_ref, o_ref):
    vp = tuple(vp_ref[k] for k in range(4))
    h = _u_hop_vmem(ul_ref, vp)
    rp = tuple(rp_ref[k] for k in range(4))
    o_ref[:] = jnp.stack(_u_out("residual", m, vp, h, rp))


def _u_smooth_vmem_kernel(m, n_sweeps, kind, ul_ref, rp_ref, vp_ref, o_ref):
    """n_sweeps links-only smoother sweeps, all VMEM-resident: per smooth,
    every operand crosses HBM once (links 6 + r 4 + phi 4 + out 4 planes
    = 18 f32 planes ~ 4.5 complex words/site vs the dense smoother's
    ~26)."""
    vp = tuple(vp_ref[k] for k in range(4))
    rp = tuple(rp_ref[k] for k in range(4))
    L = vp[0].shape[-1]
    if kind == "rbgs":
        x = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        y = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        red = ((x + y) % 2 == 0)
    for _ in range(n_sweeps):
        if kind == "jacobi":
            h = _u_hop_vmem(ul_ref, vp)
            vp = tuple(_u_out("jacobi", m, vp, h, rp))
        else:
            h = _u_hop_vmem(ul_ref, vp)
            vp = tuple(_u_out("rb", m, vp, h, rp, red))
            h = _u_hop_vmem(ul_ref, vp)
            vp = tuple(_u_out("rb", m, vp, h, rp, jnp.logical_not(red)))
    o_ref[:] = jnp.stack(vp)


# -- x-tiled kernels --

def _u_apply_tile_kernel(m, ul_ref, uld_ref, vp_ref, up_ref, dn_ref, o_ref):
    vp = tuple(vp_ref[k] for k in range(4))
    h = _u_hop_tile(ul_ref, uld_ref, vp, up_ref, dn_ref)
    out = _u_out("apply", m, vp, h)
    for k in range(4):          # per-plane writes: no 4-plane stack temp
        o_ref[k] = out[k]


def _u_resid_tile_kernel(m, ul_ref, uld_ref, vp_ref, up_ref, dn_ref,
                         rp_ref, o_ref):
    vp = tuple(vp_ref[k] for k in range(4))
    h = _u_hop_tile(ul_ref, uld_ref, vp, up_ref, dn_ref)
    rp = tuple(rp_ref[k] for k in range(4))
    o_ref[:] = jnp.stack(_u_out("residual", m, vp, h, rp))


def _u_update_tile_kernel(m, TX, color, ul_ref, uld_ref, rp_ref, vp_ref,
                          up_ref, dn_ref, o_ref):
    """One x-tile of the links-only smoother update. color None -> Jacobi,
    0/1 -> the red/black half-sweep (global parity from program_id)."""
    vp = tuple(vp_ref[k] for k in range(4))
    rp = tuple(rp_ref[k] for k in range(4))
    h = _u_hop_tile(ul_ref, uld_ref, vp, up_ref, dn_ref)
    if color is None:
        o_ref[:] = jnp.stack(_u_out("jacobi", m, vp, h, rp))
        return
    L = vp[0].shape[-1]
    x0 = pl.program_id(0) * TX
    x = x0 + jax.lax.broadcasted_iota(jnp.int32, (TX, L), 0)
    y = jax.lax.broadcasted_iota(jnp.int32, (TX, L), 1)
    mask = ((x + y) % 2 == color)
    o_ref[:] = jnp.stack(_u_out("rb", m, vp, h, rp, mask))


# -- wrappers & dispatch --

U_VMEM_PLANES = 16      # ul 4 + vp 4 + rp 4 + out 4


def u_fits_vmem(L: int) -> bool:
    return 4 * U_VMEM_PLANES * L * L <= int(0.75 * VMEM_BYTES)


def _pick_tile_u(L: int) -> int:
    """Row tile for the links-only tiled kernels: ~12 f32 [TX, L] planes
    + 10 8-row halo planes per grid step, double-buffered by the
    pipeline — budgeted against the raised scoped-VMEM limit
    utils/compile.aot_call requests (TX sweep on v5e: TX=256 at L=2048
    and TX=128 at L=4096 are the measured best AND the largest that
    compile; the old 0.5x16MiB budget picked 4x smaller tiles)."""
    from ..utils.compile import SCOPED_VMEM_KIB
    scoped = (SCOPED_VMEM_KIB * 1024) or VMEM_BYTES
    budget = int(0.8 * scoped) // 2       # /2: double buffering
    for tx in _tile_candidates(L, 256):
        if 4 * L * (12 * tx + 10 * 8) <= budget:
            return tx
    return 0


def _u_tile_specs(TX: int, L: int):
    """BlockSpecs over the packed [4, L, L] plane arrays; halo 8-row
    blocks use wrapped modular index maps into the SAME arrays (uld
    reads the first dim-0 block — the ux planes — of ul). See the halo
    delivery note above for why the modular maps stay."""
    ulspec = pl.BlockSpec((4, TX, L), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    uldspec = pl.BlockSpec((2, 8, L),
                           lambda i: (0, ((i * TX - 8) % L) // 8, 0),
                           memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((4, TX, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    hup = pl.BlockSpec((4, 8, L),
                       lambda i: (0, ((i * TX + TX) % L) // 8, 0),
                       memory_space=pltpu.VMEM)
    hdn = pl.BlockSpec((4, 8, L),
                       lambda i: (0, ((i * TX - 8) % L) // 8, 0),
                       memory_space=pltpu.VMEM)
    return ulspec, uldspec, vspec, hup, hdn


def _u_check_tile(L: int, TX: int | None) -> int:
    TX = TX or _pick_tile_u(L)
    if not TX or TX % 8 or L % TX:
        raise ValueError(f"no valid x-tile for L={L}; use the XLA path")
    return TX


def apply_wilson_u_pallas(U: jnp.ndarray, m: float, v: jnp.ndarray,
                          TX: int | None = None, ul=None,
                          r: jnp.ndarray | None = None) -> jnp.ndarray:
    """x-tiled spin-projected Wilson SpMV; U [2,L,L] c64, v [2,L,L] c64.

    Identical math to ops.gauge_stencil.apply_wilson_u (and therefore to
    apply_D on the assembled dense stencil); streams 2 complex link
    planes instead of the 20 dense-D planes. With r, returns r - D v
    (fused residual, no extra pass). ul: precomputed
    u_link_planes_padded(U, TX) — pass it (with an explicit TX) to hoist
    the static link-plane build out of a timed loop.
    """
    L = v.shape[-1]
    TX = _u_check_tile(L, TX)
    grid = (L // TX,)
    ul = u_link_planes(U) if ul is None else ul
    vp = _v_planes(v)
    ulspec, uldspec, vspec, hup, hdn = _u_tile_specs(TX, L)
    out_sd = jax.ShapeDtypeStruct((4, L, L), jnp.float32)
    if r is None:
        out = pl.pallas_call(
            functools.partial(_u_apply_tile_kernel, m),
            grid=grid,
            out_shape=out_sd,
            in_specs=[ulspec, uldspec, vspec, hup, hdn],
            out_specs=vspec,
        )(ul, ul, vp, vp, vp)
    else:
        out = pl.pallas_call(
            functools.partial(_u_resid_tile_kernel, m),
            grid=grid,
            out_shape=out_sd,
            in_specs=[ulspec, uldspec, vspec, hup, hdn, vspec],
            out_specs=vspec,
        )(ul, ul, vp, vp, vp, _v_planes(r))
    return _v_unplanes(out, v.dtype)


def apply_wilson_u_pallas_vmem(U: jnp.ndarray, m: float, v: jnp.ndarray,
                               ul=None, r: jnp.ndarray | None = None
                               ) -> jnp.ndarray:
    """Whole-lattice-in-VMEM links-only SpMV (optionally fused residual)."""
    ul = u_link_planes(U) if ul is None else ul
    vp = _v_planes(v)
    if r is None:
        out = pl.pallas_call(
            functools.partial(_u_apply_vmem_kernel, m),
            out_shape=jax.ShapeDtypeStruct(vp.shape, jnp.float32),
            in_specs=_vmem_specs(2),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ul, vp)
    else:
        out = pl.pallas_call(
            functools.partial(_u_resid_vmem_kernel, m),
            out_shape=jax.ShapeDtypeStruct(vp.shape, jnp.float32),
            in_specs=_vmem_specs(3),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ul, vp, _v_planes(r))
    return _v_unplanes(out, v.dtype)


def wilson_u_residual_pallas(U, m, phi, r, mode: str, TX: int | None = None):
    """r - D phi via the links-only kernels; mode 'vmem' or 'tiled'."""
    if mode == "vmem":
        return apply_wilson_u_pallas_vmem(U, m, phi, r=r)
    return apply_wilson_u_pallas(U, m, phi, TX=TX, r=r)


def wilson_u_smooth_pallas(U, m, phi, r, n_sweeps: int = 1,
                           kind: str = "jacobi"):
    """n_sweeps fused links-only smoother sweeps in ONE whole-VMEM kernel
    (matches gauge_stencil.smooth_u with omega=1, hence the dense
    smoothers — pinned by tests/test_gauge_stencil.py)."""
    ul = u_link_planes(U)
    vp = _v_planes(phi)
    rp = _v_planes(r)
    kern = functools.partial(_u_smooth_vmem_kernel, m, n_sweeps, kind)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(vp.shape, jnp.float32),
        in_specs=_vmem_specs(3),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ul, rp, vp)
    return _v_unplanes(out, phi.dtype)


def wilson_u_smooth_pallas_tiled(U, m, phi, r, n_sweeps: int = 1,
                                 kind: str = "jacobi",
                                 TX: int | None = None):
    """n_sweeps x-tiled links-only smoother sweeps (one pallas_call per
    colored pass so cross-tile halos always read the updated field; the
    updated field is re-padded between passes — an extra copy the
    affine-halo pipelining more than pays for, see _v_planes_padded)."""
    L = phi.shape[-1]
    TX = _u_check_tile(L, TX)
    grid = (L // TX,)
    ul = u_link_planes(U)
    rp = _v_planes(r)
    vp = _v_planes(phi)
    ulspec, uldspec, vspec, hup, hdn = _u_tile_specs(TX, L)

    def call(vp, color):
        kern = functools.partial(_u_update_tile_kernel, m, TX, color)
        return pl.pallas_call(
            kern,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((4, L, L), jnp.float32),
            in_specs=[ulspec, uldspec, vspec, vspec, hup, hdn],
            out_specs=vspec,
        )(ul, ul, rp, vp, vp, vp)

    def body(_, vp):
        if kind == "jacobi":
            return call(vp, None)
        return call(call(vp, 0), 1)

    vp = jax.lax.fori_loop(0, n_sweeps, body, vp)
    return _v_unplanes(vp, phi.dtype)


def u_mode(dtype, L: int):
    """Links-only kernel dispatch: 'vmem', 'tiled', or None (XLA path)."""
    if dtype != jnp.complex64 or not _on_tpu():
        return None
    if u_fits_vmem(L):
        return "vmem"
    if _pick_tile_u(L):
        return "tiled"
    return None


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
