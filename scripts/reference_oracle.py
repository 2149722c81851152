"""Build and run the reference's generation-1 geometric-MG program as a
golden oracle (BASELINE.md: "goldens will be produced by compiling and
running the reference itself").

The gen-1 source (code/1_laplace_scalar/2D_laplace_Mgrid.cpp) hardcodes
its parameters; this harness copies it to a temp dir, patches L / m /
nlevels / num_iters / threshold / print-interval textually, compiles with
plain g++ (no dependencies), runs it, and parses the residual history.
Nothing from the reference enters the repo — only measured outputs.
"""
from __future__ import annotations

import os
import re
import subprocess
import tempfile

REF = "/root/reference/code/1_laplace_scalar/2D_laplace_Mgrid.cpp"
REF_FINAL_DIR = ("/root/reference/code/6_ntl-mg_new_code/"
                 "3_combining_laplace_and_wilson")
EIGEN_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "eigen_shim")


def run_gen1(L: int, m: float, nlevels: int, num_iters: int,
             threshold: float = 1e-14, max_iters: int = 10000,
             timeout: int = 600):
    """Returns (history list of (iter, resmag), converged_iter or None)."""
    with open(REF) as f:
        src = f.read()
    src = re.sub(r"L=2048;", f"L={L};", src)
    src = re.sub(r"p\.m=0\.002;", f"p.m={m!r};", src)
    src = re.sub(r"p\.nlevels=9;", f"p.nlevels={nlevels};", src)
    src = re.sub(r"int num_iters=20;", f"int num_iters={num_iters};", src)
    src = re.sub(r"res_threshold=1\.0e-14;", f"res_threshold={threshold!r};",
                 src)
    src = re.sub(r"int max_iters=10000;", f"int max_iters={max_iters};", src)
    src = re.sub(r"iter%10==0", "iter%1==0", src)  # print every iteration

    with tempfile.TemporaryDirectory() as td:
        cpp = os.path.join(td, "gen1.cpp")
        exe = os.path.join(td, "gen1")
        with open(cpp, "w") as f:
            f.write(src)
        subprocess.run(["g++", "-O2", cpp, "-o", exe, "-lm"], check=True,
                       capture_output=True)
        r = subprocess.run([exe], capture_output=True, text=True,
                           timeout=timeout)
    hist = []
    converged = None
    for line in r.stdout.splitlines():
        mm = re.search(r"At iteration (\d+), the mag residue is ([\d.eE+-]+)",
                       line)
        if mm:
            hist.append((int(mm.group(1)), float(mm.group(2))))
        mm = re.search(r"Loop breaks at iteration (\d+) with residue "
                       r"([\d.eE+-]+)", line)
        if mm:
            converged = (int(mm.group(1)), float(mm.group(2)))
    return hist, converged


REF_GEN2_DIR = "/root/reference/code/2_scalar_2d_nontelescoping"


def run_gen2(L: int, m: float, nlevels: int, num_iters: int, t_flag: int,
             threshold: float = 1e-13, max_iters: int = 5000,
             variant: str = "main", n_single: int = 1, timeout: int = 600):
    """Build & run the reference's generation-2 NTL prototype
    (telescoping_2d_laplace_Mgrid.cpp; argv: L m nlevels num_iters t_flag)
    as a golden oracle. variant='single' builds the _singleinterpolation
    program (its committed t_flag is a hardcoded 0, so it is patched to
    the requested value to exercise the variant's NTL branch).

    Returns (history, converged): history[k] = (k, sum|r| after k cycles)
    — gen 2 prints at the TOP of the outer loop, one cycle BEHIND gen 1's
    print placement; converged = (iter, resmag) or None.
    """
    name = ("telescoping_2d_laplace_Mgrid.cpp" if variant == "main"
            else "telescoping_2d_laplace_Mgrid_singleinterpolation.cpp")
    with open(os.path.join(REF_GEN2_DIR, name)) as f:
        src = f.read()
    src = re.sub(r"res_threshold=1\.0e-13;", f"res_threshold={threshold!r};",
                 src)
    src = re.sub(r"int max_iters=5000;", f"int max_iters={max_iters};", src)
    if variant == "single":
        src = src.replace("t_flag=0;", f"t_flag={t_flag};")
        src = src.replace("int nn=1;", f"int nn={n_single};")

    with tempfile.TemporaryDirectory() as td:
        cpp = os.path.join(td, "gen2.cpp")
        exe = os.path.join(td, "gen2")
        with open(cpp, "w") as f:
            f.write(src)
        subprocess.run(["g++", "-O2", cpp, "-o", exe, "-lm"], check=True,
                       capture_output=True)
        argv = [exe, str(L), repr(m), str(nlevels), str(num_iters)]
        if variant == "main":       # 'single' takes only 4 args
            argv.append(str(t_flag))
        r = subprocess.run(argv, capture_output=True, text=True,
                           timeout=timeout, cwd=td)
    hist = []
    converged = None
    for line in r.stdout.splitlines():
        mm = re.search(r"At iteration (\d+), the mag residue is "
                       r"([\d.eE+-]+|nan|inf)", line)
        if mm:
            hist.append((int(mm.group(1)), float(mm.group(2))))
        mm = re.search(r"Loop breaks at iteration (\d+) with residue "
                       r"([\d.eE+-]+)", line)
        if mm:
            converged = (int(mm.group(1)), float(mm.group(2)))
    return hist, converged


def run_final_gen(L: int, num_iters: int, block: int, m: float,
                  nlevels: int, t_flag: int, n_copies: int,
                  stencil: str = "wilson", gen_null: int = 1,
                  gauge_phases=None, seed: int = 4302529,
                  timeout: int = 900, workdir: str | None = None):
    """Build & run the reference's FINAL generation (adaptive laplace +
    wilson + NTL) against our minimal Eigen-compatible shim
    (scripts/eigen_shim) — the real Eigen is not in this environment.

    gauge_phases: [2, L, L] phases for the heat-bath file the program
    reads; generated with our heat-bath if None.

    Returns dict with 'history' [(iter, resmag)], 'converged'
    (iter, resmag) or None, 'weights' per-iteration NTL weight tuples,
    and 'workdir' (kept if workdir given) with the results_*.txt files.
    """
    import shutil
    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="refbuild_")
    try:
        src_dir = os.path.join(workdir, "src")
        os.makedirs(src_dir, exist_ok=True)
        for f in os.listdir(REF_FINAL_DIR):
            if f.endswith((".h", ".cpp")):
                shutil.copy(os.path.join(REF_FINAL_DIR, f), src_dir)
        if stencil != "wilson":
            pth = os.path.join(src_dir, "params.h")
            with open(pth) as f:
                s = f.read()
            s = s.replace('stencil        = "wilson";',
                          f'stencil        = "{stencil}";')
            with open(pth, "w") as f:
                f.write(s)
        # timestamp every iteration print (CPU seconds since process
        # start — clock() is CPU time, which equals wall time for the
        # single-threaded reference) so seconds/cycle and setup-vs-solve
        # split can be measured; the patched copy lives only in the temp
        # build dir
        pmm = os.path.join(src_dir, "modules_main.h")
        with open(pmm) as f:
            s = f.read()
        if "#include <ctime>" not in s:
            # clock()/CLOCKS_PER_SEC need <ctime>; don't rely on a
            # transitive libstdc++ include
            s = "#include <ctime>\n" + s
        s = s.replace(
            'printf("\\nAt iteration %d, the mag residue is %g",iter,'
            'resmag);',
            'printf("\\nAt iteration %d, the mag residue is %g '
            '[t=%.3f]",iter,resmag,'
            '(double)clock()/CLOCKS_PER_SEC);')
        with open(pmm, "w") as f:
            f.write(s)
        exe = os.path.join(src_dir, "mgrid_ntl")
        subprocess.run(["g++", "-O2", "-std=c++17", f"-I{EIGEN_SHIM}",
                        os.path.join(src_dir, "mgrid_ntl.cpp"), "-lm",
                        "-o", exe], check=True, capture_output=True)

        # gauge config file, read at ../gauge_config_files relative to cwd
        gdir = os.path.join(workdir, "gauge_config_files")
        os.makedirs(gdir, exist_ok=True)
        if gauge_phases is None:
            import sys as _sys
            _sys.path.insert(0, "/root/repo")
            from tpu_multigrid.models.gauge import heatbath_ensemble
            gauge_phases = heatbath_ensemble(L, 32.0, 100, seed)
        import numpy as np
        ph = np.transpose(np.asarray(gauge_phases), (1, 2, 0)).reshape(-1)
        np.savetxt(os.path.join(gdir, f"phase_{L}_b32.0.dat"), ph,
                   fmt="%.18e")

        run_dir = os.path.join(workdir, "run")
        os.makedirs(run_dir, exist_ok=True)
        r = subprocess.run(
            [exe, str(L), str(num_iters), str(block), str(gen_null),
             repr(m), str(nlevels), str(t_flag), str(n_copies)],
            capture_output=True, text=True, timeout=timeout, cwd=run_dir)

        hist, weights, times = [], [], []
        converged = None
        for line in r.stdout.splitlines():
            mm = re.search(r"At iteration (\d+), the mag residue is "
                           r"([\d.eE+-]+|nan|inf)(?: \[t=([\d.]+)\])?", line)
            if mm and mm.group(1) != "0":
                hist.append((int(mm.group(1)), float(mm.group(2))))
                if mm.group(3):
                    times.append((int(mm.group(1)), float(mm.group(3))))
            mm = re.search(r"Loop breaks at iteration (\d+) with residue "
                           r"([\d.eE+-]+)", line)
            if mm:
                converged = (int(mm.group(1)), float(mm.group(2)))
            if line.startswith("i=0"):
                ws = re.findall(r"\(([-\d.e+]+),([-\d.e+]+)\)", line)
                weights.append([complex(float(a), float(b))
                                for a, b in ws])
        return {"history": hist, "converged": converged,
                "weights": weights, "times": times, "workdir": workdir,
                "stdout_tail": r.stdout[-500:]}
    finally:
        if own_tmp:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    import json
    import sys
    L, m, nl, ni = (int(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3]),
                    int(sys.argv[4]))
    hist, conv = run_gen1(L, m, nl, ni)
    print(json.dumps({"history": hist, "converged": conv}))
