"""On-TPU numerics check: Pallas kernels vs the XLA reference, and the
reference's compiled-in self-test suite (tests 1-4), on the REAL device.

The interpret-mode pytest (tests/test_pallas.py) can't catch TPU lowering
rules (e.g. (8,128) block-tile alignment of halo BlockSpecs), so this
banks a per-kernel max relative error measured on hardware to
bench_rungs/tpu_numerics.json — the artifact VERDICT r3 item 7 asked for.

Relay discipline: every comparison is ONE fused on-device program
compiled via utils/compile.aot_call (plain jit dispatch and complex jit
constants are documented relay failure classes); only f32 scalars are
fetched. Run under scripts/tpu_when_healthy.py gating, or directly in a
healthy window:  python scripts/tpu_numerics_check.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_rungs", "tpu_numerics.json")


def main():
    import jax
    import jax.numpy as jnp
    import tpu_multigrid as mg
    from tpu_multigrid.ops.stencil import (apply_D, apply_D_unrolled,
                                           site_inverse)
    from tpu_multigrid.ops.gauge_stencil import apply_wilson_u
    from tpu_multigrid.ops import pallas_stencil as ps
    from tpu_multigrid.ops.smoothers import smooth
    from tpu_multigrid.utils.xfer import device_complex
    from tpu_multigrid.utils.compile import aot_call

    out = {"device_kind": jax.devices()[0].device_kind,
           "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "kernels": {}, "self_tests": {}, "ok": False}

    def relerr(name, f, ref_fn, args, tol=2e-6):
        """max |f - ref| / max |ref| in one fused on-device program."""
        try:
            e = float(aot_call(
                lambda *a: (jnp.max(jnp.abs(f(*a) - ref_fn(*a)))
                            / jnp.max(jnp.abs(ref_fn(*a)))
                            ).astype(jnp.float32),
                *args, key=("numcheck", name)))
            out["kernels"][name] = {"rel_err": e, "pass": bool(e < tol)}
        except Exception as ex:
            out["kernels"][name] = {"error": str(ex)[:150]}

    rng = np.random.default_rng(3)
    m = -0.07
    for L in (256, 512, 1024):
        U = mg.models.gauge.gauge_from_phases(
            0.2 * rng.normal(size=(2, L, L)), jnp.complex64)
        D = mg.models.operators.assemble("wilson", U, m)
        v = device_complex(rng.normal(size=(2, L, L))
                           + 1j * rng.normal(size=(2, L, L)), jnp.complex64)
        D0inv = site_inverse(D[0])
        n = 2
        zero = 0.0 * v

        relerr(f"xla_unroll_{L}", apply_D_unrolled, apply_D, (D, v))
        relerr(f"wilson_u_{L}",
               lambda U, v, D: apply_wilson_u(U, m, v),
               lambda U, v, D: apply_D(D, v), (U, v, D))
        if ps.use_pallas(v.dtype, n, L):
            relerr(f"pallas_vmem_{L}", ps.apply_D_pallas, apply_D, (D, v))
            relerr(f"pallas_jacobi_{L}",
                   lambda D, Di, p, r: ps.jacobi_smooth_pallas(D, Di, p, r, 2),
                   lambda D, Di, p, r: smooth(D, Di, p, r, 2, "jacobi"),
                   (D, D0inv, zero, v))
            relerr(f"pallas_rbgs_{L}",
                   lambda D, Di, p, r: ps.rbgs_smooth_pallas(D, Di, p, r, 2),
                   lambda D, Di, p, r: smooth(D, Di, p, r, 2, "rbgs"),
                   (D, D0inv, zero, v))
        if ps._pick_tile(n, L):
            relerr(f"pallas_tiled_{L}", ps.apply_D_pallas_tiled, apply_D,
                   (D, v))
        if ps._pick_smoother_tile(n, L):
            relerr(f"pallas_tiled_jacobi_{L}",
                   lambda D, Di, p, r: ps.smooth_pallas_tiled(
                       D, Di, p, r, 2, "jacobi"),
                   lambda D, Di, p, r: smooth(D, Di, p, r, 2, "jacobi"),
                   (D, D0inv, zero, v))
            relerr(f"pallas_tiled_rbgs_{L}",
                   lambda D, Di, p, r: ps.smooth_pallas_tiled(
                       D, Di, p, r, 2, "rbgs"),
                   lambda D, Di, p, r: smooth(D, Di, p, r, 2, "rbgs"),
                   (D, D0inv, zero, v))
        if ps._pick_tile_u(L):
            relerr(f"pallas_u_{L}",
                   lambda U, v: ps.apply_wilson_u_pallas(U, m, v),
                   lambda U, v: apply_wilson_u(U, m, v), (U, v))
            relerr(f"pallas_u_resid_tiled_{L}",
                   lambda U, p, r: ps.wilson_u_residual_pallas(
                       U, m, p, r, "tiled"),
                   lambda U, p, r: r - apply_wilson_u(U, m, p), (U, v, zero))
            relerr(f"pallas_u_smooth_tiled_{L}",
                   lambda U, D, Di, p, r: ps.wilson_u_smooth_pallas_tiled(
                       U, m, p, r, 2, "rbgs"),
                   lambda U, D, Di, p, r: smooth(D, Di, p, r, 2, "rbgs"),
                   (U, D, D0inv, zero, v))
        if ps.u_fits_vmem(L):
            relerr(f"pallas_u_vmem_{L}",
                   lambda U, v: ps.apply_wilson_u_pallas_vmem(U, m, v),
                   lambda U, v: apply_wilson_u(U, m, v), (U, v))
            relerr(f"pallas_u_resid_vmem_{L}",
                   lambda U, p, r: ps.wilson_u_residual_pallas(
                       U, m, p, r, "vmem"),
                   lambda U, p, r: r - apply_wilson_u(U, m, p), (U, v, zero))
            for kind in ("jacobi", "rbgs"):
                relerr(f"pallas_u_smooth_{kind}_{L}",
                       lambda U, D, Di, p, r, k=kind:
                           ps.wilson_u_smooth_pallas(U, m, p, r, 2, k),
                       lambda U, D, Di, p, r, k=kind:
                           smooth(D, Di, p, r, 2, k),
                       (U, D, D0inv, zero, v))

    # reference self-test suite (tests.h tests 1-4) on the real device,
    # flagship shape: wilson NTL 32^2 / 3 levels, complex64
    try:
        cfg = mg.MGConfig(L=32, stencil="wilson", m=-0.005, nlevels=3,
                          ntl=True, num_iters=4, null_iters=40,
                          dtype="complex64", smoother="rbgs")
        U = mg.models.gauge.gauge_from_phases(
            0.2 * rng.normal(size=(2, 32, 32)), cfg.cdtype)
        D = mg.models.operators.assemble("wilson", U, cfg.m)
        hier = mg.build_hierarchy(D, cfg, check=False)
        res = mg.testing.run_mg_tests(hier, cfg)
        worst = max(res.values())
        top = sorted(res.items(), key=lambda kv: -kv[1])[:6]
        out["self_tests"] = {"worst": worst, "n": len(res),
                             "worst_checks": dict(top),
                             "pass": bool(worst < 1e-4)}  # c64 tolerance
    except Exception as ex:
        import traceback
        tb = traceback.format_exc().splitlines()
        out["self_tests"] = {"error": str(ex)[:150],
                             "traceback_tail": tb[-12:]}

    kern_ok = all(k.get("pass") for k in out["kernels"].values())
    out["ok"] = bool(kern_ok and out["self_tests"].get("pass"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
