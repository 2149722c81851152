"""Smoke test for the notebook-parity plot generators (SURVEY §4.3 /
§7.2 step 9): the committed plots/ artifacts are produced by these
scripts; this pins that they still run end-to-end at a tiny size."""
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convergence_plots_smoke(tmp_path, monkeypatch):
    pytest.importorskip("matplotlib")
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    import convergence_plots

    monkeypatch.setattr(sys, "argv",
                        ["convergence_plots", "--out", str(tmp_path),
                         "--L", "16"])
    convergence_plots.main()
    for name in ("convergence_vs_depth.png", "mode_resolved_decay.png",
                 "ntl_weights.png"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 1000, name


def test_scan_plots_committed():
    """The scaling-study artifacts (scripts/run_scans.py) are committed:
    bench_rungs/scans.json with its trend checks, and the plots."""
    import json
    scans = os.path.join(ROOT, "bench_rungs", "scans.json")
    assert os.path.exists(scans)
    d = json.load(open(scans))
    tr = d["trends"]
    # MG grows far sub-linearly in 1/m (notebook 1_: ~log vs the
    # relaxation baseline's ~1/m)
    g = tr["mg_mass_growth"]
    assert g["ratio"] < 0.5 * g["mass_ratio"]
    # MG beats plain relaxation at the same mass
    c = tr["mg_vs_relax_at_same_m"]
    assert c["mg_iters"] < c["relax_iters"]
    # 4-copy NTL never worse than 1-copy
    assert tr["ntl_4_le_1"]
    # compiled-reference trend agreement on identical gauge configs
    assert tr["oracle_trend_corr"] > 0.95
    assert tr["oracle_max_cycle_gap"] <= 2
    for name in ("scaling_mass.png", "scaling_levels.png",
                 "scaling_ntl_copies.png"):
        assert os.path.exists(os.path.join(ROOT, "plots", name)), name
