"""Benchmark harness: stencil-SpMV roofline on the current accelerator.

Prints ONE JSON line:
  {"metric": "wilson_stencil_spmv_nnz_per_s", "value": ..., "unit": "nnz/s",
   "vs_baseline": <achieved HBM bandwidth / peak HBM bandwidth>}

The headline is the HBM-STREAMING regime (L=1024: the 201 MB working set
cannot live in VMEM, so every apply genuinely streams D and v from HBM —
the roofline fraction is an honest bandwidth fraction; BASELINE.json
target: >= 0.60 of the speed of light for the gauged 5-point stencil
SpMV). The solver regime (L=256: D stays VMEM-resident across smoother
sweeps, sustaining MORE than nominal HBM bandwidth) is reported separately
in bench_details.json — that regime is what the MG solver actually runs
in, but its >1 "fraction" is an effective-bandwidth figure, not a roofline
fraction. MG-vs-MR cycle counts are also in bench_details.json.

Robustness: the tunneled TPU backend can fail transiently on large
programs (see .claude/skills/verify/SKILL.md); every measurement retries
in fresh subprocesses before giving up.
"""
import json
import os
import sys
import time

import numpy as np

# HBM peak bandwidth per chip, bytes/s.
HBM_PEAK = {
    "TPU v2": 700e9,
    "TPU v3": 900e9,
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,       # v5e
    "TPU v5": 2765e9,           # v5p
    "TPU v6 lite": 1640e9,      # v6e (Trillium)
    "TPU v6e": 1640e9,
    "cpu": 100e9,               # placeholder for host runs
}


# One-time measurement of the reference gen-1 binary's headline run
# (L=2048, m=0.002, 9 levels, 20 GS sweeps, sum|r| < 1e-14) on this host,
# single thread, g++ -O2 (scripts/reference_oracle.run_gen1). Filled in
# when measured; compared against the geo2048 phase.
_REF_GEN1_CPU = None


def device_peak_bw():
    import jax
    kind = jax.devices()[0].device_kind
    for k, v in HBM_PEAK.items():
        if kind.lower().startswith(k.lower()):
            return v, kind
    return 819e9, kind


def bench_stencil(L=256, stencil="wilson", dtype="complex64", reps=100,
                  tries=4):
    """Time reps x apply_D (XLA path, and the fused Pallas kernels where
    applicable — whole-in-VMEM at small L, x-tiled at large L) in one
    jitted fori_loop; return (best_seconds/apply, n, {path: seconds}, err)."""
    import jax
    import jax.numpy as jnp
    import tpu_multigrid as mg
    from tpu_multigrid.ops.stencil import apply_D
    from tpu_multigrid.ops import pallas_stencil as ps

    cfg = mg.MGConfig(L=L, stencil=stencil, m=-0.07, nlevels=1,
                      dtype=dtype)
    rng = np.random.default_rng(7)
    U = mg.models.gauge.gauge_from_phases(
        0.2 * rng.normal(size=(2, L, L)), cfg.cdtype)
    D = mg.models.operators.assemble(stencil, U, cfg.m)
    n = cfg.n_dof[0]
    v = jnp.asarray(rng.normal(size=(n, L, L))
                    + 1j * rng.normal(size=(n, L, L))).astype(cfg.cdtype)

    scale = 1.0 / (4.0 + cfg.m)
    paths = {"xla": lambda D, v: apply_D(D, v) * scale}
    if ps.use_pallas(v.dtype, n, L):
        paths["pallas"] = lambda D, v: ps.apply_D_pallas(D, v) * scale
    elif v.dtype == jnp.complex64 and ps._on_tpu():
        paths["pallas_tiled"] = (
            lambda D, v: ps.apply_D_pallas_tiled(D, v) * scale)

    last_err = None
    times = {}
    for attempt in range(tries):
        r = reps + attempt  # perturb program content on retry
        for name, f in paths.items():
            if name in times:
                continue
            # each path measured + retried independently: a Pallas path
            # failing to lower on the relay must not forfeit the XLA
            # measurement (the headline is min over surviving paths)
            try:
                def many(D, v, f=f):
                    def body(i, v):
                        return f(D, v)
                    return jax.lax.fori_loop(0, r, body, v)

                fn = jax.jit(many)
                jax.block_until_ready(fn(D, v))   # warmup & compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(D, v))
                    best = min(best, (time.perf_counter() - t0) / r)
                times[name] = best
            except Exception as e:  # transient backend failure: retry
                last_err = f"{name}: " + str(e)[:100]
        if "xla" in times and len(times) == len(paths):
            break
        if "xla" in times and attempt >= 1:
            break   # give failing alt paths one extra shot, then move on
        time.sleep(3)
    if not times:
        raise RuntimeError(
            f"stencil bench failed after {tries} tries: {last_err}")
    return min(times.values()), n, times, last_err


def bench_mg_vs_mr(L=256, tries=3):
    """Wilson MG solve to 1e-8 vs unpreconditioned MR (cycle counts).

    complex128: the complex64 rounding plateau of the MG residual sits
    right at the 1e-8 target (a tiny-L CPU run stalls at ~2e-7), so the
    convergence race runs in f64 — the cycle-count reduction is the
    metric, not raw seconds. Fallback ladder for the flaky remote TPU
    backend (CLAUDE.md): L -> L/2 -> L/4; the cycle-reduction metric is
    meaningful at every rung.
    """
    import jax
    import tpu_multigrid as mg

    jax.config.update("jax_enable_x64", True)
    ladder = [L, L // 2, L // 4][:max(tries, 1)]
    err = None
    for Lr in ladder:
        cfg = mg.MGConfig(L=Lr, stencil="wilson", m=-0.005, nlevels=3,
                          ntl=True, num_iters=4, null_iters=100,
                          dtype="complex128", res_threshold=1e-8,
                          smoother="rbgs")
        rng = np.random.default_rng(cfg.seed)
        U = mg.models.gauge.gauge_from_phases(
            0.2 * rng.normal(size=(2, Lr, Lr)), cfg.cdtype)
        D = mg.models.operators.assemble(cfg.stencil, U, cfg.m)
        b = mg.point_source(cfg)
        try:
            hier = mg.build_hierarchy(D, cfg, check=False)
            t0 = time.perf_counter()
            out = mg.solve_chunked(hier, b, cfg, max_iters=500, chunk=5)
            t_solve = time.perf_counter() - t0
            _, mr_iters, mr_rel = mg.mr_solve(D, b, tol=1e-8,
                                              max_iters=300000, chunk=100)
            return {
                "L": Lr, "dtype": "complex128",
                "mg_cycles": out.iters, "mg_res": out.resmag,
                "mg_converged": out.converged, "mg_seconds": t_solve,
                "mr_iters": mr_iters, "mr_res": mr_rel,
                "cycle_reduction": (mr_iters / max(out.iters, 1)),
            }
        except Exception as e:
            err = f"L={Lr}: " + str(e)[:100]
            time.sleep(3)
    return {"error": err}


def bench_geo2048(tries=2):
    """The reference's own headline run (gen 1: geometric MG, L=2048,
    m=0.002, 9 levels, 20 sweeps/level, sum|r| < 1e-14 — hardcoded at
    2D_laplace_Mgrid.cpp:118-123) end-to-end on this chip, vs the
    compiled reference binary's single-thread CPU wall time measured once
    on this host (see bench_details.json 'reference_cpu')."""
    import jax
    from tpu_multigrid.solver.geometric import GeoConfig, geo_source, geo_solve

    jax.config.update("jax_enable_x64", True)  # sum|r| < 1e-14 needs f64
    cfg = GeoConfig()  # reference defaults
    b = geo_source(cfg)
    err = None
    for attempt in range(tries):
        try:
            t0 = time.perf_counter()
            phi, iters, resmag, hist = geo_solve(b, cfg, chunk=2)
            t_total = time.perf_counter() - t0
            # compile is in the first chunk; re-run for the warm number
            t0 = time.perf_counter()
            phi, iters, resmag, _ = geo_solve(b, cfg, chunk=2)
            t_warm = time.perf_counter() - t0
            return {"L": cfg.L, "nlevels": cfg.nlevels,
                    "iters": iters, "final_res_l1": resmag,
                    "converged": resmag < cfg.res_threshold,
                    "seconds_cold": t_total, "seconds_warm": t_warm}
        except Exception as e:
            err = str(e)[:100]
            time.sleep(3)
    return {"error": err}


def phase_stencil(L=256, reps=200):
    peak, kind = device_peak_bw()
    dt, n, times, warn = bench_stencil(L=L, reps=reps)
    csize = 8  # complex64 bytes
    bytes_per_apply = (5 * n * n + 2 * n) * L * L * csize
    nnz = 5 * n * n * L * L
    streaming = bytes_per_apply > 64 * 1024 * 1024   # can't live in VMEM
    out = {"device_kind": kind, "hbm_peak_bytes_per_s": peak,
           "L": L, "n": n, "sec_per_apply": dt,
           "sec_per_apply_by_path": times,
           "bytes_per_apply": bytes_per_apply,
           "achieved_bytes_per_s": bytes_per_apply / dt,
           "nnz_per_s": nnz / dt,
           "regime": "hbm_streaming" if streaming else "vmem_resident",
           "transient_errors": warn}
    frac = bytes_per_apply / dt / peak
    if streaming:
        out["roofline_fraction"] = frac
    else:
        # D stays VMEM-resident across fori_loop iterations: the effective
        # bandwidth exceeds nominal HBM BW; not a roofline fraction.
        out["effective_bw_fraction"] = frac
    return out


_CANARY = ("import jax, jax.numpy as jnp; "
           "x = jnp.ones((128, 128), jnp.float32); "
           "jax.block_until_ready(jax.jit(lambda a: (a @ a).sum())(x)); "
           "print('ok')")


def _canary_ok():
    """Tiny-program health probe: in the relay's bad windows even tiny
    jitted programs fail (CLAUDE.md); don't burn a phase attempt then."""
    import subprocess
    try:
        r = subprocess.run([sys.executable, "-c", _CANARY],
                           capture_output=True, text=True, timeout=240)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_phase_subprocess(phase: str, tries: int = 4,
                          patience_s: float = None):
    """Each phase runs in its own interpreter: the tunneled backend can
    poison a process after one transient failure, and cold compiles of
    large programs may exceed the remote service's time limit — a retry
    hits a warm server-side cache and completes fast. Between attempts,
    wait (bounded by patience_s) until a canary probe passes, so a bad
    window costs waiting rather than the measurement."""
    import subprocess
    if patience_s is None:
        patience_s = float(os.environ.get("BENCH_PATIENCE_S", 1500))
    out_file = f"/tmp/bench_phase_{phase}.json"
    deadline = time.time() + patience_s
    stderr = ""
    attempt = 0
    while attempt < tries:
        attempt += 1
        r = subprocess.run([sys.executable, __file__, "--phase", phase,
                            "--out", out_file], capture_output=True,
                           text=True, timeout=1800)
        if r.returncode == 0:
            with open(out_file) as f:
                return json.load(f)
        stderr = r.stderr[-500:]
        while time.time() < deadline:
            if _canary_ok():
                break
            time.sleep(45)
        else:
            break   # patience exhausted
    return {"error": f"phase {phase} failed after {attempt} attempts",
            "stderr": stderr}


def main():
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        out = sys.argv[sys.argv.index("--out") + 1]
        result = {"stencil": lambda: phase_stencil(L=256, reps=200),
                  "stencil_stream": lambda: phase_stencil(L=1024, reps=30),
                  "mg_vs_mr": lambda: bench_mg_vs_mr(L=256),
                  "geo2048": bench_geo2048}[phase]()
        if "error" in result:
            sys.exit(1)
        with open(out, "w") as f:
            json.dump(result, f, default=float)
        return

    details = {}
    stream = _run_phase_subprocess("stencil_stream")
    details["stencil_stream_1024"] = stream
    details["stencil_resident_256"] = _run_phase_subprocess("stencil")
    details["mg_vs_mr_256"] = _run_phase_subprocess("mg_vs_mr")
    details["geo2048"] = _run_phase_subprocess("geo2048")
    if _REF_GEN1_CPU:
        details["geo2048"]["reference_cpu"] = _REF_GEN1_CPU

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2, default=float)

    if "error" in stream:
        print(json.dumps({"metric": "wilson_stencil_spmv_nnz_per_s",
                          "value": 0.0, "unit": "nnz/s",
                          "vs_baseline": 0.0}))
        return
    print(json.dumps({
        "metric": "wilson_stencil_spmv_nnz_per_s",
        "value": float(stream["nnz_per_s"]),
        "unit": "nnz/s",
        "vs_baseline": float(stream["roofline_fraction"]),
    }))


if __name__ == "__main__":
    main()
