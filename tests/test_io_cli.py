"""I/O round-trips (near-null checkpoints in npz + reference text format,
gauge files) and the CLI driver end-to-end."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.config import MGConfig
from tpu_multigrid.models import gauge
from tpu_multigrid.utils import io as mio


def test_near_null_text_roundtrip(tmp_path, rng):
    cfg = MGConfig(L=8, stencil="wilson", m=0.1, nlevels=2)
    arrs = []
    for lvl in range(cfg.nlevels):
        L = cfg.sizes[lvl]
        nf, nc = cfg.n_dof[lvl], cfg.n_dof[lvl + 1]
        arrs.append(rng.normal(size=(nc, nf, L, L))
                    + 1j * rng.normal(size=(nc, nf, L, L)))
    path = str(tmp_path / mio.near_null_filename(cfg))
    mio.save_near_null_text(path, arrs)
    back = mio.load_near_null_text(path, cfg)
    for a, b in zip(arrs, back):
        np.testing.assert_allclose(a, b, rtol=1e-15)


def test_near_null_npz_roundtrip(tmp_path, rng):
    arrs = [rng.normal(size=(2, 1, 8, 8)) + 0j,
            rng.normal(size=(2, 2, 4, 4)) + 0j]
    path = str(tmp_path / "nn.npz")
    mio.save_near_null_npz(path, arrs)
    back = mio.load_near_null_npz(path)
    for a, b in zip(arrs, back):
        np.testing.assert_array_equal(a, b)


def test_gauge_file_roundtrips(tmp_path, rng):
    L = 8
    th = rng.uniform(-np.pi, np.pi, (2, L, L))
    p1 = str(tmp_path / "phase_8_b32.0.dat")
    gauge.write_heatbath_file(p1, th)
    U = gauge.read_heatbath_file(p1, L)
    np.testing.assert_allclose(np.asarray(U), np.exp(1j * th), atol=1e-14)

    p2 = str(tmp_path / "Uphases.txt")
    gauge.write_gauge_text(p2, U)
    U2 = gauge.read_gauge_text(p2, L)
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U), atol=1e-18)


def test_cli_end_to_end(tmp_path):
    from tpu_multigrid import cli
    rc = cli.main(["--L", "16", "--stencil", "laplace", "--m", "0.1",
                   "--nlevels", "2", "--num-iters", "8",
                   "--null-iters", "60", "--res-threshold", "1e-9",
                   "--max-iters", "200", "--out-dir", str(tmp_path),
                   "--gauge", "random"])
    assert rc == 0
    for fname in ["results_phi.txt", "results_NTL_weights.txt",
                  "results_res_lvl-0.txt", "metrics.jsonl",
                  "solve_summary.json", "results_gen_scaling.txt"]:
        assert (tmp_path / fname).exists(), fname
    import json
    summary = json.loads((tmp_path / "solve_summary.json").read_text())
    assert summary["converged"]


def test_cli_reference_argv(tmp_path):
    """Reference positional style: L num_iters block gen_null m nlevels
    t_flag n_copies (wilson stencil hardcoded in reference)."""
    from tpu_multigrid import cli
    rc = cli.main(["16", "8", "2", "1", "0.3", "2", "1", "4",
                   "--out-dir", str(tmp_path), "--null-iters", "60",
                   "--res-threshold", "1e-8", "--max-iters", "200",
                   "--skip-tests"])
    assert rc == 0


def test_cli_checkpoint_roundtrip(tmp_path):
    from tpu_multigrid import cli
    ckpt = str(tmp_path / "nn.npz")
    rc = cli.main(["--L", "16", "--stencil", "laplace", "--m", "0.2",
                   "--nlevels", "2", "--num-iters", "8",
                   "--null-iters", "60", "--res-threshold", "1e-8",
                   "--max-iters", "100", "--out-dir", str(tmp_path / "a"),
                   "--checkpoint", ckpt, "--skip-tests"])
    assert rc == 0 and os.path.exists(ckpt)
    rc = cli.main(["--L", "16", "--stencil", "laplace", "--m", "0.2",
                   "--nlevels", "2", "--num-iters", "8",
                   "--gen-null", "0", "--res-threshold", "1e-8",
                   "--max-iters", "100", "--out-dir", str(tmp_path / "b"),
                   "--checkpoint", ckpt, "--skip-tests"])
    assert rc == 0


def test_scan_orchestrator(tmp_path):
    """Parameter-scan analog of 0_submit_2d_laplace.ipynb: cartesian grid,
    per-point scaling lines + jsonl summary, failures non-fatal."""
    import json
    from tpu_multigrid import scan
    rc = scan.main(["--L", "16", "--m", "0.05,0.2", "--nlevels", "2",
                    "--num-iters", "8", "--stencil", "laplace",
                    "--null-iters", "60", "--res-threshold", "1e-9",
                    "--max-iters", "300", "--out-dir", str(tmp_path)])
    assert rc == 0
    rows = [json.loads(x) for x in
            (tmp_path / "scan_summary.jsonl").read_text().splitlines()]
    assert len(rows) == 2 and all(r["converged"] for r in rows)
    # heavier mass converges in fewer cycles (scaling-notebook invariant)
    assert rows[1]["iters"] <= rows[0]["iters"]
    lines = (tmp_path / "results_gen_scaling.txt").read_text().splitlines()
    assert len(lines) == 2 and lines[0].startswith("16\t8\t0.05")


def test_cli_mesh_solve(tmp_path):
    """--mesh runs the full distributed shard_map solver (8 CPU devices)."""
    from tpu_multigrid import cli
    rc = cli.main(["--L", "16", "--stencil", "laplace", "--m", "0.1",
                   "--nlevels", "2", "--num-iters", "8",
                   "--null-iters", "60", "--res-threshold", "1e-8",
                   "--max-iters", "200", "--gauge", "random",
                   "--mesh", "2,2", "--skip-tests",
                   "--out-dir", str(tmp_path)])
    assert rc == 0


def test_cli_resume_solve(tmp_path):
    """--resume checkpoints solver state and resumes from it."""
    import json
    from tpu_multigrid import cli
    state = str(tmp_path / "state.npz")
    args = ["--L", "16", "--stencil", "laplace", "--m", "0.1",
            "--nlevels", "2", "--num-iters", "8", "--null-iters", "60",
            "--res-threshold", "1e-10", "--max-iters", "40",
            "--checkpoint-every", "10", "--resume", state,
            "--skip-tests", "--out-dir", str(tmp_path)]
    rc = cli.main(args)
    assert (tmp_path / "state.npz").exists()
    s1 = json.loads((tmp_path / "solve_summary.json").read_text())
    rc2 = cli.main(args)   # resumes from the saved state
    s2 = json.loads((tmp_path / "solve_summary.json").read_text())
    assert s2["resmag"] <= s1["resmag"]


def test_cli_geometric_modes(tmp_path):
    from tpu_multigrid import cli
    rc = cli.main(["--mode", "geo2", "--ntl", "--L", "16", "--m", "0.5",
                   "--nlevels", "2", "--num-iters", "4",
                   "--res-threshold", "1e-10", "--max-iters", "100",
                   "--out-dir", str(tmp_path)])
    assert rc == 0
    import json
    summary = json.loads((tmp_path / "solve_summary.json").read_text())
    assert summary["mode"] == "geo2" and summary["converged"]
    assert summary["res_l1"] < 1e-10
    rc = cli.main(["--mode", "geo", "--L", "16", "--m", "0.5",
                   "--nlevels", "2", "--num-iters", "4",
                   "--res-threshold", "1e-10", "--max-iters", "100",
                   "--out-dir", str(tmp_path)])
    assert rc == 0


def test_fmt_byte_parity_with_reference(tmp_path, rng):
    """Our _fmt_c must be byte-identical to the reference's
    %25.20e+i%25.20e printf (modules_main.h:65-79, level.h:288-300).
    Compile a one-line C probe using that exact format spec and diff."""
    import subprocess
    vals = np.concatenate([
        rng.normal(size=16), -rng.normal(size=16),
        [0.0, -0.0, 1e-300, -1e-300, 1e300, 5.0, -3.14159e-7]])
    zs = vals[: len(vals) // 2 * 2].reshape(-1, 2)
    src = tmp_path / "probe.c"
    src.write_text(
        '#include <stdio.h>\n#include <stdlib.h>\n'
        'int main(int c, char**v){\n'
        '  for (int i = 1; i + 1 < c; i += 2)\n'
        '    printf("%25.20e+i%25.20e\\n", atof(v[i]), atof(v[i+1]));\n'
        '  return 0;\n}\n')
    exe = tmp_path / "probe"
    subprocess.run(["gcc", "-O0", str(src), "-o", str(exe)], check=True)
    argv = [str(exe)] + [repr(float(x)) for x in zs.reshape(-1)]
    ref_lines = subprocess.run(argv, capture_output=True, text=True,
                               check=True).stdout.splitlines()
    ours = [mio._fmt_c(complex(a, b)) for a, b in zs]
    assert ours == ref_lines


def test_native_text_writer_matches_python(tmp_path, rng):
    """native.write_complex_text and the Python fallback must emit
    byte-identical files (both the reference %25.20e+i%25.20e format)."""
    from tpu_multigrid.utils import native
    if not native.available():
        pytest.skip("native lib not built")
    vals = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(complex)
    p_native = tmp_path / "n.txt"
    native.write_complex_text(str(p_native), vals)
    p_py = tmp_path / "p.txt"
    with open(p_py, "w") as f:
        for z in vals:
            f.write(mio._fmt_c(z) + "\n")
    assert p_native.read_bytes() == p_py.read_bytes()
