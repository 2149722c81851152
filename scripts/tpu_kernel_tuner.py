"""Stencil-kernel tuning sweep on the real TPU (run in a healthy relay
window; see scripts/tpu_when_healthy.py for the canary pattern).

Measures, each in a fresh subprocess (a relay failure poisons a process):
  - XLA apply_D at L in {512, 768, 1024}
  - tiled Pallas apply_D at the same L over a TX ladder
  - whole-lattice Pallas apply_D at L=512 with the VMEM fit limit raised
    (v5e has more physical VMEM than the conservative 16 MiB assumption;
    the scoped-VMEM compile limit is raised via TPU_MG_SCOPED_VMEM_KIB)

Writes /tmp/kernel_tune.json incrementally. Use the results to pick
PALLAS defaults (_pick_tile start, VMEM_BYTES) for the bench headline.
"""
import itertools
import json
import os
import subprocess
import sys
import time

WORKER = r'''
import json, sys, numpy as np
import jax, jax.numpy as jnp
import tpu_multigrid as mg
from tpu_multigrid.ops import stencil, pallas_stencil as ps
from tpu_multigrid.profiling import time_op, peak_bandwidth
from tpu_multigrid.utils.xfer import device_complex
from tpu_multigrid.utils.compile import aot_call

mode, L, TX = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
cfg = mg.MGConfig(L=L, stencil="wilson", m=-0.07, nlevels=1, dtype="complex64")
rng = np.random.default_rng(7)
U = mg.models.gauge.gauge_from_phases(0.2*rng.normal(size=(2,L,L)), cfg.cdtype)
D = mg.models.operators.assemble("wilson", U, cfg.m)
# complex ingress via real/imag planes (relay rejects complex transfers)
v = device_complex(rng.normal(size=(2,L,L)) + 1j*rng.normal(size=(2,L,L)),
                   cfg.cdtype)
n = 2
args = (D, v)
nbytes = (5*n*n + 2*n) * L * L * 8
if mode == "xla":
    f = lambda D, v: stencil.apply_D(D, v)
elif mode == "tiled":
    f = lambda D, v: ps.apply_D_pallas_tiled(D, v, TX=TX)
elif mode == "vmem":
    ps.VMEM_BYTES = 256 * 1024 * 1024   # let the fit check pass; the real
    f = lambda D, v: ps.apply_D_pallas(D, v)  # limit is the compile option
elif mode == "xlau":        # spin-projected links-only (XLA)
    from tpu_multigrid.ops.gauge_stencil import apply_wilson_u
    f = lambda U, v: apply_wilson_u(U, cfg.m, v)
    args = (U, v)
    nbytes = (2 + 2*n) * L * L * 8
elif mode == "pallas_u":    # spin-projected links-only (Pallas tiled)
    # ul (4 half-scaled link planes) precomputed OUTSIDE the timed
    # loop, as the bench does; min-traffic bytes stay the 6-word honest
    # minimum
    ul = jax.jit(ps.u_link_planes)(U)
    f = lambda ul, v: ps.apply_wilson_u_pallas(None, cfg.m, v,
                                               TX=TX or None, ul=ul)
    args = (ul, v)
    nbytes = (2 + 2*n) * L * L * 8
else:
    raise SystemExit(2)
# numerics guard vs the XLA path before timing: one fused on-device
# program via the AOT path (plain jit dispatch + complex jit constants
# are the relay failure classes — see bench.bench_stencil._validated)
err = float(aot_call(
    lambda D, v, *a: (jnp.max(jnp.abs(f(*a) - stencil.apply_D(D, v)))
                      / jnp.max(jnp.abs(stencil.apply_D(D, v)))
                      ).astype(jnp.float32),
    D, v, *args, key=("tune_val", mode, L, TX)))
assert err < 2e-6, f"numerics mismatch {err}"
# >= ~0.3 s r-loop at roofline speed (2r-vs-r differencing needs the
# loop to dwarf the relay's ms-scale round-trip jitter; bench.py reps
# discipline)
reps = max(100, int(2.5e11 / nbytes))
dt = time_op(f, *args, reps=reps)
bw = nbytes / dt
nnzps = 5*n*n * L * L / dt
print(json.dumps({"mode": mode, "L": L, "TX": TX, "us": dt*1e6,
                  "GBps": bw/1e9, "frac": bw/peak_bandwidth(),
                  "nnz_per_s": nnzps, "rel_err": err}))
'''

CANARY = ("import jax, jax.numpy as jnp; "
          "v = float(jax.jit(lambda a: (a @ a).sum())"
          "(jnp.ones((128,128), jnp.float32))); assert v == 128**3; "
          "print('ok')")


def canary_ok(timeout_s=120):
    try:
        r = subprocess.run([sys.executable, "-c", CANARY],
                           capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # L=2048 is the honest streaming regime for BOTH representations
    # (dense 800 MB, links-only 201 MB); the TX ladder leans large now
    # that the 64 MiB scoped-VMEM compile limit admits big tiles.
    # Round-5 focus: the rewritten links-only kernel (packed ul/vp
    # operands, pre-shifted uym — 4 lane rolls instead of 6) at its
    # honest streaming scale L=4096 (805 MB set; VERDICT r4 item 2
    # target bw_fraction >= 0.60) and the 2048 rung, over a TX ladder.
    # TX=0 -> the _pick_tile_u default.
    items = []
    for TX in (0, 64, 128, 256, 32, 512):
        items.append(("pallas_u", 4096, TX))
    for TX in (0, 128, 256, 64, 512):
        items.append(("pallas_u", 2048, TX))
    for TX in (0, 64):
        items.append(("tiled", 2048, TX))
    results = []
    env = dict(os.environ)
    env["TPU_MG_SCOPED_VMEM_KIB"] = env.get("TPU_MG_SCOPED_VMEM_KIB",
                                            "98304")
    deadline = time.time() + float(os.environ.get("TUNE_BUDGET_S", 3600))
    pending = list(items)
    while pending and time.time() < deadline:
        requeue = []
        fails_in_a_row = 0
        for mode, L, TX in pending:
            if time.time() > deadline:
                requeue.extend([(mode, L, TX)])
                continue
            if fails_in_a_row >= 3:
                # bad window: stop burning items, requeue the rest
                requeue.append((mode, L, TX))
                continue
            while not canary_ok() and time.time() < deadline:
                time.sleep(60)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", WORKER, mode, str(L), str(TX)],
                    capture_output=True, text=True, timeout=420, env=env)
                if r.returncode == 0:
                    row = json.loads(r.stdout.strip().splitlines()[-1])
                else:
                    row = {"mode": mode, "L": L, "TX": TX,
                           "error": r.stderr[-200:]}
            except subprocess.TimeoutExpired:
                row = {"mode": mode, "L": L, "TX": TX, "error": "timeout"}
            row["wall_s"] = time.time() - t0
            print(row, flush=True)
            if "error" in row:
                fails_in_a_row += 1
                requeue.append((mode, L, TX))
            else:
                fails_in_a_row = 0
                results.append(row)
                out = os.environ.get(
                    "TUNE_OUT", os.path.join(
                        os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))),
                        "bench_rungs", "kernel_tune.json"))
                with open(out, "w") as f:
                    json.dump({"measured_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%S"), "rows": results}, f, indent=1)
        if requeue and len(requeue) == len(pending):
            time.sleep(300)   # nothing succeeded this lap: wait a window
        pending = requeue


if __name__ == "__main__":
    main()
