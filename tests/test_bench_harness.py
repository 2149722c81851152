"""Unit tests for bench.py's cross-invocation rung persistence and
headline-candidate selection (the round-3 canary-gate/cache harness).

bench.py is a script, but its persistence helpers are pure functions of
module state — import it with a patched RUNG_DIR and exercise them
without any TPU.
"""
import importlib
import json
import sys

import pytest


@pytest.fixture
def bench(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as b
    importlib.reload(b)
    monkeypatch.setattr(b, "RUNG_DIR", str(tmp_path / "rungs"))
    # isolate from live bench/patient-runner partials in the real /tmp
    monkeypatch.setattr(b, "PARTIAL_DIR", str(tmp_path))
    # rung banking is opt-in (--bank / BENCH_BANK=1; driver laps run
    # without it so they never dirty the committed bench_rungs/)
    monkeypatch.setenv("BENCH_BANK", "1")
    return b


def test_save_rung_requires_banking(bench, monkeypatch):
    """Without BENCH_BANK=1 (the driver's post-commit lap), successful
    measurements are NOT persisted into bench_rungs/."""
    monkeypatch.delenv("BENCH_BANK")
    bench._save_rung("stencil", {"nnz_per_s": 1e11})
    assert bench._load_rung("stencil") is None


def test_rung_roundtrip(bench):
    bench._save_rung("stencil", {"nnz_per_s": 1e11,
                                 "roofline_fraction": 0.7})
    r = bench._load_rung("stencil")
    assert r["nnz_per_s"] == 1e11
    assert r["phase"] == "stencil"
    assert "measured_at" in r


def test_save_rung_skips_errors(bench):
    bench._save_rung("stencil", {"error": "UNIMPLEMENTED"})
    assert bench._load_rung("stencil") is None


def test_best_partial_prefers_streaming_and_cached_fallback(bench):
    # no fresh partials, no cache -> None
    assert bench._best_partial() is None
    assert bench._best_partial(include_cached=True) is None
    # cached rungs: a streaming rung must beat a higher-fraction
    # vmem-resident one
    bench._save_rung("stencil", {"nnz_per_s": 9e11,
                                 "effective_bw_fraction": 1.4})
    bench._save_rung("stencil_batch", {"nnz_per_s": 2e11,
                                       "roofline_fraction": 0.65})
    assert bench._best_partial() is None          # fresh-only: nothing
    best = bench._best_partial(include_cached=True)
    assert best["cached"] is True
    assert best["roofline_fraction"] == 0.65      # streaming outranks


def test_stencil_result_regime_labels(bench):
    peak = 819e9
    out = bench._stencil_result(
        2048, 2, peak, "TPU v5 lite",
        {"xla": 4e-3}, {"xla": int(800e6)})
    assert out["regime"] == "hbm_streaming"
    assert 0 < out["roofline_fraction"] < 1.0
    # protocol v3.1: 1-2x VMEM is the boundary regime (partial residency
    # measured above nominal peak there) — effective bw, no roofline
    outb = bench._stencil_result(
        1024, 2, peak, "TPU v5 lite",
        {"xla": 1e-3}, {"xla": int(200e6)})
    assert outb["regime"] == "vmem_boundary"
    assert "roofline_fraction" not in outb
    out2 = bench._stencil_result(
        128, 2, peak, "TPU v5 lite",
        {"xla": 1e-5}, {"xla": int(3e6)})
    assert out2["regime"] == "vmem_resident"
    assert "effective_bw_fraction" in out2


def test_stencil_result_headline_from_best_streaming_path(bench):
    # links-only path is faster on nnz/s but VMEM-resident at L=2048-
    # dense scale (201 MB < 2x physical VMEM); the headline must stay an
    # honest roofline (best path whose working set exceeds STREAM_MIN),
    # with the non-streaming winner reported as the solver-regime figure
    peak = 819e9
    out = bench._stencil_result(
        2048, 2, peak, "TPU v5 lite",
        {"xla": 4e-3, "xla_u": 4e-4},
        {"xla": int(800e6), "xla_u": int(50e6)})
    assert out["best_path"] == "xla"
    assert out["regime"] == "hbm_streaming"
    assert 0 < out["roofline_fraction"] < 1.0
    assert out["solver_regime_best"]["path"] == "xla_u"
    # all-resident phase: unchanged behavior, no solver_regime_best split
    out2 = bench._stencil_result(
        128, 2, peak, "TPU v5 lite",
        {"xla": 1e-5, "xla_u": 3e-6},
        {"xla": int(3e6), "xla_u": int(8e5)})
    assert out2["best_path"] == "xla_u"
    assert "effective_bw_fraction" in out2
    assert "solver_regime_best" not in out2


def test_stencil_result_headline_best_fraction_not_best_nnz(bench):
    """Protocol v3/v3.1 (docs/PERF.md §9): the headline is the best
    ROOFLINE FRACTION among truly-streaming (> 2x VMEM) paths; the
    faster-in-absolute-nnz/s links-only path (201 MB = boundary regime)
    is reported as solver_regime_best, not the headline."""
    peak = 819e9
    # pallas_u: 201 MB at 5.7e-4 (boundary, nnz/s high);
    # pallas_tiled: 800 MB at 1.17e-3 (streaming, frac 0.84)
    out = bench._stencil_result(
        2048, 2, peak, "TPU v5 lite",
        {"pallas_u": 5.7e-4, "pallas_tiled": 1.17e-3},
        {"pallas_u": int(201e6), "pallas_tiled": int(800e6)})
    assert out["best_path"] == "pallas_tiled"
    assert out["roofline_fraction"] > 0.6
    assert out["solver_regime_best"]["path"] == "pallas_u"


def test_streaming_threshold_is_2x_physical_vmem(bench):
    # a 100 MB set can be kept on-chip (vmem_resident) and a 201 MB set
    # partially so (vmem_boundary; measured 1.07x peak) — neither gets a
    # roofline; only > 2x physical VMEM (256 MiB) does (protocol v3.1)
    peak = 819e9
    out = bench._stencil_result(
        256, 2, peak, "TPU v5 lite",
        {"xla_batch": 1e-4}, {"xla_batch": int(100e6)}, batch=8)
    assert out["regime"] == "vmem_resident"
    assert "roofline_fraction" not in out
    out2 = bench._stencil_result(
        256, 2, peak, "TPU v5 lite",
        {"xla_batch": 3e-4}, {"xla_batch": int(201e6)}, batch=16)
    assert out2["regime"] == "vmem_boundary"
    assert "roofline_fraction" not in out2
    out3 = bench._stencil_result(
        256, 2, peak, "TPU v5 lite",
        {"xla_batch": 6e-4}, {"xla_batch": int(400e6)}, batch=32)
    assert out3["regime"] == "hbm_streaming"


def test_load_rung_rejects_cpu_for_tpu_phases(bench):
    bench._save_rung("stencil", {"nnz_per_s": 1e11, "device_kind": "cpu"})
    assert bench._load_rung("stencil") is None
    bench._save_rung("mg_vs_mr", {"cycle_reduction": 80.0,
                                  "device_kind": "cpu"})
    assert bench._load_rung("mg_vs_mr") is not None   # CPU by design
    bench._save_rung("stencil_batch", {"nnz_per_s": 1e11,
                                       "device_kind": "TPU v5 lite"})
    assert bench._load_rung("stencil_batch") is not None
