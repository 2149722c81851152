"""Patient TPU measurement runner for the flaky remote-compile tunnel.

Probes service health with a medium-size compile; when healthy, runs the
outstanding TPU measurements, each in its own subprocess:
  1. pallas vs XLA kernel benchmark   -> /tmp/pallas_bench.json
  2. bench.py mg_vs_mr phase          -> /tmp/bench_phase_mg_vs_mr.json
  3. __graft_entry__ entry() check    -> /tmp/entry_check.json
Retries each until success or the deadline.
"""
import json
import os
import subprocess
import sys
import time

# Tiny-program probe: in shaky windows small programs pass while larger
# compiles fail/hang — but each task child is subprocess-isolated and
# retried, so ANY responsive window is worth attempting. (The heavier
# 32^2-smoother probe missed windows the tiny canary would have caught,
# observed 2026-08-20 ~10:42.) Must FETCH a value: on the axon relay
# block_until_ready neither synchronizes nor surfaces errors.
PROBE = r'''
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.float32)
v = float(jax.jit(lambda a: (a @ a).sum())(x))
assert v == 128 * 128 * 128, v
print("healthy", v)
'''

ENTRY = r'''
import json, jax
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
with open("/tmp/entry_check.json", "w") as f:
    json.dump({"ok": True, "res": float(out[2])}, f)
print("entry ok")
'''

# complex64 production fast path: full NTL solve with the Pallas smoother
# kernels in-cycle (exercises the scoped-VMEM compile fix end-to-end).
# Target 1e-6, above the c64 rounding plateau.
SOLVE64 = r'''
import json, time
import numpy as np
import jax
import tpu_multigrid as mg
L = 256
cfg = mg.MGConfig(L=L, stencil="wilson", m=-0.005, nlevels=3, ntl=True,
                  num_iters=4, null_iters=100, dtype="complex64",
                  res_threshold=1e-6, smoother="rbgs")
rng = np.random.default_rng(cfg.seed)
U = mg.models.gauge.gauge_from_phases(0.2*rng.normal(size=(2, L, L)), cfg.cdtype)
D = mg.models.operators.assemble(cfg.stencil, U, cfg.m)
b = mg.point_source(cfg)
t0 = time.perf_counter()
hier = mg.build_hierarchy(D, cfg, check=False)
jax.block_until_ready(hier.levels[0].D)
t_setup = time.perf_counter() - t0
t0 = time.perf_counter()
out = mg.solve_chunked(hier, b, cfg, max_iters=200, chunk=5)
t_solve = time.perf_counter() - t0
assert out.converged, (out.iters, out.resmag)
with open("/tmp/solve64_check.json", "w") as f:
    json.dump({"ok": True, "iters": out.iters, "res": out.resmag,
               "setup_s": t_setup, "solve_s": t_solve}, f)
print("solve64 ok", out.iters, out.resmag)
'''


# x-tiled Pallas kernels (lattices beyond whole-in-VMEM): numerics vs the
# XLA path at L=512/1024 on the real chip (the interpret-mode pytest can't
# catch TPU lowering rules like the (8,128) block-tile alignment of halo
# blocks — see ops/pallas_stencil._tiled_apply_kernel).
TILED = r'''
import json
import numpy as np
import jax, jax.numpy as jnp
import tpu_multigrid as mg
from tpu_multigrid.ops.stencil import apply_D, site_inverse
from tpu_multigrid.ops import pallas_stencil as ps
from tpu_multigrid.ops.smoothers import smooth
out = {}
for L in (512, 1024):
    rng = np.random.default_rng(3)
    U = mg.models.gauge.gauge_from_phases(0.2*rng.normal(size=(2,L,L)),
                                          jnp.complex64)
    D = mg.models.operators.assemble("wilson", U, -0.07)
    from tpu_multigrid.utils.xfer import device_complex
    v = device_complex(rng.normal(size=(2,L,L))
                       + 1j*rng.normal(size=(2,L,L)), jnp.complex64)
    ref = apply_D(D, v)
    got = ps.apply_D_pallas_tiled(D, v)
    err = float(jnp.max(jnp.abs(got-ref))/jnp.max(jnp.abs(ref)))
    assert err < 2e-6, (L, "apply", err)
    out[f"apply_{L}"] = err
    D0inv = site_inverse(D[0])
    for kind in ("jacobi", "rbgs"):
        o1 = ps.smooth_pallas_tiled(D, D0inv, 0*v, v, 2, kind)
        o2 = smooth(D, D0inv, 0*v, v, 2, kind)
        err = float(jnp.max(jnp.abs(o1-o2))/jnp.max(jnp.abs(o2)))
        assert err < 2e-6, (L, kind, err)
        out[f"{kind}_{L}"] = err
with open("/tmp/tiled_check.json", "w") as f:
    json.dump(out, f)
print("tiled ok", out)
'''


def run_sub(code_or_args, timeout, is_code=True):
    cmd = ([sys.executable, "-c", code_or_args] if is_code
           else [sys.executable] + code_or_args)
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd="/root/repo")
        return r.returncode == 0, (r.stdout + r.stderr)[-300:]
    except subprocess.TimeoutExpired:
        return False, "timeout"


def main():
    deadline = time.time() + float(os.environ.get("TPU_HEALTH_BUDGET",
                                                  7200))
    def bench_phase(name, tmo):
        # bench.py --phase persists successful results to bench_rungs/
        # (cross-invocation cache the driver's bench run can fall back on)
        return (["bench.py", "--phase", name, "--out",
                 f"/tmp/bench_phase_{name}.json"],
                os.path.join("/root/repo/bench_rungs", f"{name}.json"), tmo)

    # Expected-value order for short healthy windows: bank the small
    # fast-compiling rungs first (any real nnz/s beats the 0.0 fallback),
    # then escalate program size toward the ideal L=1024 stream and the
    # end-to-end solves. _best_partial prefers streaming/roofline results
    # regardless of landing order, so banking small rungs first never
    # worsens the eventual headline.
    tasks = {
        "stencil": bench_phase("stencil", 900),
        "stencil_128": bench_phase("stencil_128", 600),
        "stencil_batch_3": bench_phase("stencil_batch_3", 900),
        "stencil_stream_384": bench_phase("stencil_stream_384", 900),
        "stencil_batch": bench_phase("stencil_batch", 900),
        "stencil_batch_16": bench_phase("stencil_batch_16", 900),
        "stencil_stream_512": bench_phase("stencil_stream_512", 900),
        "stencil_stream_768": bench_phase("stencil_stream_768", 900),
        "stencil_stream": bench_phase("stencil_stream", 1200),
        "stencil_stream_2048": bench_phase("stencil_stream_2048", 1200),
        "entry": (ENTRY, "/tmp/entry_check.json", 900),
        "solve64": (SOLVE64, "/tmp/solve64_check.json", 1500),
        "solve256": bench_phase("solve256", 1500),
        "solve256_ir": bench_phase("solve256_ir", 2400),
        "ensemble8": bench_phase("ensemble8", 1500),
        "geo2048": bench_phase("geo2048", 1800),
        "tiled": (TILED, "/tmp/tiled_check.json", 1200),
        "tpu_numerics": (["scripts/tpu_numerics_check.py"],
                         "/root/repo/bench_rungs/tpu_numerics.json", 1800),
        "pallas": (["scripts/pallas_bench_loop.py"], "/tmp/pallas_bench.json",
                   1200),
        "mg_vs_mr": bench_phase("mg_vs_mr", 1200),
    }
    def task_done(name, marker):
        if not os.path.exists(marker):
            return False
        # a kernel-comparison rung is only complete once >= 3 paths have
        # measured AND no path is still erroring (merge-and-skip makes a
        # re-run cheap: banked paths are skipped, only missing ones run)
        if name.startswith("stencil"):
            try:
                with open(marker) as f:
                    r = json.load(f)
                return (len(r.get("paths", {})) >= 3
                        and not r.get("transient_errors"))
            except Exception:
                return False
        return True

    done = {k: task_done(k, v[1]) for k, v in tasks.items()}
    while time.time() < deadline and not all(done.values()):
        ok, msg = run_sub(PROBE, 180)
        if not ok:
            print(f"[{time.strftime('%H:%M:%S')}] unhealthy: {msg[-60:]}",
                  flush=True)
            time.sleep(45)
            continue
        print(f"[{time.strftime('%H:%M:%S')}] healthy; running tasks",
              flush=True)
        fails = 0
        for name, (payload, marker, tmo) in tasks.items():
            if done[name]:
                continue
            is_code = isinstance(payload, str)
            ok, msg = run_sub(payload, tmo, is_code=is_code)
            done[name] = task_done(name, marker)
            print(f"  task {name}: ok={ok} done={done[name]} {msg[-80:]}",
                  flush=True)
            if not (ok or done[name]):
                fails += 1
                # after two failures re-check the window before burning
                # the remaining (large-program) task timeouts on a relay
                # that has gone bad mid-lap
                if fails >= 2:
                    ok2, _ = run_sub(PROBE, 180)
                    if not ok2:
                        print("  window closed mid-lap; backing off",
                              flush=True)
                        break
                    fails = 0
        time.sleep(30)
    print("final:", done, flush=True)


if __name__ == "__main__":
    main()
