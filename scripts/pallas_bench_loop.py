"""Patient Pallas-vs-XLA benchmark: waits out tunnel flakiness by probing
with a minimal kernel, then measures and writes /tmp/pallas_bench.json.
Each attempt runs in a subprocess (a failed attempt poisons its process).
"""
import json
import subprocess
import sys
import time

WORKER = r'''
import jax, time, json, numpy as np, jax.numpy as jnp
import tpu_multigrid as mg
from tpu_multigrid.ops import stencil, pallas_stencil as ps
from tpu_multigrid.ops.smoothers import jacobi_sweep
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# health probe: minimal kernel must compile+run quickly
def k(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 1, 0) * 2.0
x = jnp.ones((256, 256), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
assert float(y.sum()) == 2.0 * 256 * 256   # fetch: the only real sync
print("probe ok", flush=True)

L, st = 256, "wilson"
cfg = mg.MGConfig(L=L, stencil=st, m=-0.07, nlevels=1, dtype="complex64")
rng = np.random.default_rng(3)
U = mg.models.gauge.gauge_from_phases(0.2*rng.normal(size=(2,L,L)), cfg.cdtype)
D = mg.models.operators.assemble(st, U, cfg.m)
from tpu_multigrid.utils.xfer import device_complex
v = device_complex(rng.normal(size=(2,L,L)) + 1j*rng.normal(size=(2,L,L)), cfg.cdtype)
# numerics gate in ONE fused AOT program (plain jit dispatch and eager
# complex comparisons are relay failure classes; see bench._validated)
from tpu_multigrid.utils.compile import aot_call
err = float(aot_call(
    lambda D, v: (jnp.max(jnp.abs(ps.apply_D_pallas(D, v)
                                  - stencil.apply_D(D, v)))
                  / jnp.max(jnp.abs(stencil.apply_D(D, v)))
                  ).astype(jnp.float32), D, v, key=("pb_val",)))
assert err < 1e-4, f"pallas numerics mismatch {err}"
Dinv = stencil.site_inverse(D[0]); r = mg.point_source(cfg)

# fetch-based timing (relay block_until_ready is a no-op; see profiling)
from tpu_multigrid.profiling import time_op
def timeit(f, reps=200):
    return time_op(f, D, v, reps=reps)

res = {"rel_err": err}
res["pallas_apply_us"] = timeit(lambda D,v: ps.apply_D_pallas(D,v)) * 1e6
res["xla_apply_us"] = timeit(lambda D,v: stencil.apply_D(D,v)) * 1e6
res["pallas_jacobi_us"] = timeit(lambda D,v: ps.jacobi_smooth_pallas(D, Dinv, v, r, 1)) * 1e6
res["xla_jacobi_us"] = timeit(lambda D,v: jacobi_sweep(D, Dinv, v, r)) * 1e6
with open("/tmp/pallas_bench.json", "w") as f:
    json.dump(res, f)
print(json.dumps(res), flush=True)
'''


def main():
    deadline = time.time() + 3000
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", WORKER],
                               capture_output=True, text=True, timeout=600,
                               cwd="/root/repo")
            if r.returncode == 0 and "pallas_apply_us" in r.stdout:
                print(r.stdout.splitlines()[-1])
                return 0
            print(f"attempt {attempt} rc={r.returncode}: "
                  f"{(r.stderr or r.stdout)[-200:]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"attempt {attempt}: timeout", flush=True)
        time.sleep(60)
    return 1


if __name__ == "__main__":
    sys.exit(main())
