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


if __name__ == "__main__":
    import json
    import sys
    L, m, nl, ni = (int(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3]),
                    int(sys.argv[4]))
    hist, conv = run_gen1(L, m, nl, ni)
    print(json.dumps({"history": hist, "converged": conv}))
