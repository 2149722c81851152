"""Regenerate the reference notebooks' signature validation plots
(SURVEY.md §4.3) from live runs:

1. residual-vs-iteration convergence curves for MG depths 0..nlevels
   (notebook family 1_/2c_/3c_ scaling studies)
2. mode-resolved error decay: |FFT error| per momentum mode across MG
   cycles — MG kills the low modes plain relaxation stalls on
   (2_/2a_/2b_/3a_ spectral-analysis notebooks)
3. NTL min-res weight trajectories (7a_single_run_analysis)

Writes PNGs into --out (default ./plots).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plots")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--L", type=int, default=32)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import tpu_multigrid as mg
    from tpu_multigrid import analysis
    from tpu_multigrid.models import gauge, operators

    os.makedirs(args.out, exist_ok=True)
    L = args.L

    theta = gauge.heatbath_ensemble(L, 32.0, 100, 4302529)
    U = gauge.gauge_from_phases(theta)

    # --- 1. convergence vs MG depth -------------------------------------
    fig, ax = plt.subplots(figsize=(7, 5))
    for nlevels in range(0, 4):
        cfg = mg.MGConfig(L=L, stencil="laplace", m=0.01, nlevels=nlevels,
                          num_iters=10, null_iters=300,
                          res_threshold=1e-13)
        D = operators.assemble("laplace", U.astype(cfg.cdtype), cfg.m)
        hier = mg.build_hierarchy(D, cfg, check=False)
        out = mg.solve_with_history(hier, mg.point_source(cfg), cfg,
                                    max_iters=60)
        ax.semilogy(np.arange(1, len(out.history) + 1), out.history,
                    marker="o", ms=3, label=f"nlevels={nlevels}")
    ax.set_xlabel("V-cycle")
    ax.set_ylabel("relative residual")
    ax.set_title(f"Gauged Laplace {L}x{L}, m=0.01: convergence vs MG depth")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(os.path.join(args.out, "convergence_vs_depth.png"),
                dpi=120, bbox_inches="tight")

    # --- 2. mode-resolved error decay -----------------------------------
    cfg = mg.MGConfig(L=16, stencil="laplace", m=0.05, nlevels=2,
                      num_iters=6, null_iters=200)
    D16 = operators.assemble("laplace",
                             gauge.identity_gauge(16, cfg.cdtype), cfg.m)
    hier = mg.build_hierarchy(D16, cfg, check=False)
    modes, hist = analysis.mode_resolved_convergence(
        hier, mg.point_source(cfg), cfg, n_iters=10)
    fig, ax = plt.subplots(figsize=(7, 5))
    for j, (kx, ky) in enumerate(modes):
        ax.semilogy(np.arange(1, hist.shape[0] + 1), hist[:, j],
                    marker="s", ms=3, label=f"k=({kx},{ky})")
    ax.set_xlabel("V-cycle")
    ax.set_ylabel("|error mode amplitude|")
    ax.set_title("Mode-resolved error decay (MG kills low modes)")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.savefig(os.path.join(args.out, "mode_resolved_decay.png"),
                dpi=120, bbox_inches="tight")

    # --- 3. NTL weights trajectory --------------------------------------
    cfg = mg.MGConfig(L=L, stencil="wilson", m=-0.005, nlevels=2,
                      ntl=True, num_iters=8, null_iters=300,
                      res_threshold=1e-12)
    Dw = operators.assemble("wilson", U.astype(cfg.cdtype), cfg.m)
    hier = mg.build_hierarchy(Dw, cfg, check=False)
    out = mg.solve_with_history(hier, mg.point_source(cfg), cfg,
                                max_iters=60)
    w = out.ntl_weights
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    for q in range(w.shape[1]):
        axes[0].plot(np.abs(w[:, q]), marker="o", ms=3, label=f"|a_{q}|")
        axes[1].plot(np.angle(w[:, q]), marker="o", ms=3,
                     label=f"arg a_{q}")
    axes[0].set_title("NTL min-res weight magnitudes")
    axes[1].set_title("NTL weight phases")
    for a in axes:
        a.set_xlabel("V-cycle")
        a.legend(fontsize=8)
        a.grid(alpha=0.3)
    fig.savefig(os.path.join(args.out, "ntl_weights.png"), dpi=120,
                bbox_inches="tight")

    print(f"wrote 3 plots to {args.out}/")


if __name__ == "__main__":
    main()
