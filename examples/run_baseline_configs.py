"""Run the five BASELINE.json reference configurations end-to-end.

  1. 2D Laplace, 64^2, 2-level V-cycle, Jacobi smoother  (geometric mode)
  2. Complex-scalar U(1) gauged Laplace, 128^2, adaptive near-null setup
  3. Scalar 2D non-telescoping MG with minimal residual, 128^2
  4. Wilson-operator multigrid, 128^2, mass near critical
  5. Non-telescoping Wilson MG, 256^2 (sub-mesh concurrency exercised on
     a virtual device mesh when >1 device is available)

Usage:  python examples/run_baseline_configs.py [--quick] [--platform cpu]
--quick shrinks lattices/iterations for a fast smoke run.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="complex128")
    ap.add_argument("--out", default=None,
                    help="write the results JSON (with run metadata) here")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "complex128":
        jax.config.update("jax_enable_x64", True)

    import tpu_multigrid as mg
    from tpu_multigrid.solver import geometric as geo
    from tpu_multigrid.models import gauge

    q = args.quick
    results = {}

    # ---- config 1: geometric-MG Laplace, Jacobi
    # omega=0.8: undamped Jacobi does not smooth the checkerboard modes
    # at small m (GeoConfig.omega note) — the m=0.05 run stalls at 4e-5
    # with omega=1. Two variants: the literal BASELINE 2-level cycle
    # (coarsest 32^2 grid only smoothed -> slow but converges) and the
    # full-depth hierarchy (coarsest 2^2, the reference gen-1 shape).
    for tag, nl in [("1_geometric_laplace_64", 2),
                    ("1b_geometric_laplace_64_deep", 5)]:
        t0 = time.time()
        gcfg = geo.GeoConfig(L=64, m=0.5 if q else 0.05,
                             nlevels=2 if q else nl, num_iters=20,
                             res_threshold=1e-10, smoother="jacobi",
                             omega=1.0 if q else 0.8)
        b = geo.geo_source(gcfg)
        phi, iters, res, hist = geo.geo_solve(b, gcfg, max_iters=500)
        results[tag] = {
            "iters": iters, "res": res, "converged": res < 1e-10,
            "nlevels": gcfg.nlevels, "omega": gcfg.omega,
            "history": [float(h) for h in hist],
            "seconds": time.time() - t0}
        if q:
            break

    def adaptive(name, **kw):
        t0 = time.time()
        cfg = mg.MGConfig(dtype=args.dtype, **kw)
        rng = np.random.default_rng(cfg.seed)
        theta = gauge.heatbath_ensemble(cfg.L, cfg.beta,
                                        20 if q else 100, cfg.seed)
        U = gauge.gauge_from_phases(theta, cfg.cdtype)
        D = mg.models.operators.assemble(cfg.stencil, U, cfg.m)
        hier = mg.build_hierarchy(D, cfg, check=False)
        out = mg.solve_with_history(hier, mg.point_source(cfg), cfg,
                                    max_iters=500)
        results[name] = {"iters": out.iters, "res": out.resmag,
                         "converged": out.converged,
                         "history": [float(h) for h in out.history],
                         "plaquette": float(np.real(
                             np.asarray(gauge.plaquette(U)))),
                         "seconds": time.time() - t0}

    L2 = 32 if q else 128
    ni = 60 if q else 500
    thr = 1e-9 if args.dtype == "complex128" else 1e-7

    # ---- config 2: gauged Laplace, adaptive setup
    adaptive("2_gauged_laplace_adaptive", L=L2, stencil="laplace", m=0.01,
             nlevels=2 if q else 4, num_iters=10, null_iters=ni,
             res_threshold=thr)

    # ---- config 3: scalar NTL + min-res
    adaptive("3_ntl_minres_laplace", L=L2, stencil="laplace", m=0.01,
             nlevels=2 if q else 4, ntl=True, n_copies=4, min_res=True,
             num_iters=10, null_iters=ni, res_threshold=thr)

    # ---- config 4: Wilson near-critical
    adaptive("4_wilson_near_critical", L=L2, stencil="wilson", m=-0.005,
             nlevels=2 if q else 3, num_iters=10, null_iters=ni,
             res_threshold=thr)

    # ---- config 5: NTL Wilson 256^2 (sub-mesh concurrency if >1 device)
    L5 = 32 if q else 256
    cfg5 = mg.MGConfig(L=L5, stencil="wilson", m=-0.005,
                       nlevels=2 if q else 3, ntl=True, n_copies=4,
                       num_iters=6, null_iters=ni, res_threshold=thr,
                       dtype=args.dtype)
    theta = gauge.heatbath_ensemble(cfg5.L, cfg5.beta, 20 if q else 100,
                                    cfg5.seed)
    U = gauge.gauge_from_phases(theta, cfg5.cdtype)
    D = mg.models.operators.assemble(cfg5.stencil, U, cfg5.m)
    hier = mg.build_hierarchy(D, cfg5, check=False)
    t0 = time.time()
    if len(jax.devices()) > 1:
        from tpu_multigrid.parallel import sharded
        ndev = len(jax.devices())
        mx = int(np.floor(np.sqrt(ndev)))
        while ndev % mx:
            mx -= 1
        mesh = sharded.make_mesh((mx, ndev // mx))
        solver = sharded.make_sharded_solver(cfg5, mesh, max_iters=300)(hier)
        hier_s = sharded.shard_hierarchy(hier, cfg5, mesh)
        phis, iters, resv = solver(hier_s, mg.zero_fields(cfg5),
                                   mg.point_source(cfg5))
        results["5_ntl_wilson_submesh"] = {
            "iters": int(iters), "res": float(resv),
            "converged": float(resv) < cfg5.res_threshold,
            "mesh": [mx, ndev // mx], "seconds": time.time() - t0}
    else:
        out = mg.solve_chunked(hier, mg.point_source(cfg5), cfg5,
                               max_iters=300, chunk=5)
        results["5_ntl_wilson_submesh"] = {
            "iters": out.iters, "res": out.resmag,
            "converged": out.converged, "mesh": [1, 1],
            "seconds": time.time() - t0}

    print(json.dumps(results, indent=2, default=float))
    ok = all(r.get("converged") for r in results.values())
    print("ALL CONVERGED" if ok else "SOME FAILED")
    if args.out:
        rec = {"measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "device_kind": jax.devices()[0].device_kind,
               "dtype": args.dtype, "quick": bool(q),
               "all_converged": ok, "configs": results}
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2, default=float)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
