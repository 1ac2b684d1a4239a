"""bench.py last-known-good merging: a knob-reduced quick capture must not
clobber sections a prior full capture measured (observed 2026-08-19: a
SCALING=0/EXTRA=0 ensemble A/B erased batch_scaling/brats/unet3d/inference
from bench_last_good.json)."""

import importlib.util
import json
import os

import pytest

BENCH_PATH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test",
                                                  BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "LAST_GOOD_PATH",
                        str(tmp_path / "bench_last_good.json"))
    return mod


FULL = {
    "metric": "hippocampus_train_throughput",
    "value": 5394.34, "unit": "images/sec",
    "baseline_measured_images_per_sec": 202.07, "vs_baseline": 26.695,
    "batch_scaling": {"20": 5394.34, "128": 19794.9},
    "best": {"batch": 128, "images_per_sec": 19794.9},
    "brats": {"images_per_sec": 344.29},
    "unet3d": {"vols_per_sec": 31.81},
    "inference": {"images_per_sec": 16658.9},
    "captured_at": "2026-08-19T12:30:57Z",
}

THIN = {
    "metric": "hippocampus_train_throughput",
    "value": 5174.44, "unit": "images/sec",
    "vs_baseline": 51.744, "vs_baseline_is_estimate": True,
    "best": {"batch": 20, "images_per_sec": 5174.44},
    "ensemble_train": {"members": 4, "member_mode": "scan"},
    "captured_at": "2026-08-19T14:46:59Z",
}


def _write_last_good(bench, payload):
    with open(bench.LAST_GOOD_PATH, "w") as f:
        json.dump(payload, f)


def test_no_prior_capture_is_identity(bench):
    assert bench._merge_last_good(dict(THIN)) == THIN


def test_thin_capture_retains_full_sections(bench):
    _write_last_good(bench, FULL)
    merged = bench._merge_last_good(dict(THIN))
    # headline keys come from the fresh run
    assert merged["value"] == THIN["value"]
    assert merged["captured_at"] == THIN["captured_at"]
    # skipped sections survive, provenance recorded
    for key in ("batch_scaling", "brats", "unet3d", "inference"):
        assert merged[key] == FULL[key], key
        assert merged["retained_from"][key] == FULL["captured_at"]
    # fresh-only sections survive too
    assert merged["ensemble_train"] == THIN["ensemble_train"]


def test_degenerate_best_does_not_shadow_sweep_best(bench):
    """A SCALING=0 run emits best == the parity batch; the prior
    sweep-derived best must win."""
    _write_last_good(bench, FULL)
    merged = bench._merge_last_good(dict(THIN))
    assert merged["best"]["batch"] == 128
    assert "best" in merged["retained_from"]


def test_vs_baseline_recomputed_from_retained_denominator(bench):
    _write_last_good(bench, FULL)
    merged = bench._merge_last_good(dict(THIN))
    assert merged["vs_baseline"] == round(
        THIN["value"] / FULL["baseline_measured_images_per_sec"], 3)
    assert "vs_baseline_is_estimate" not in merged


def test_full_capture_overwrites_everything(bench):
    _write_last_good(bench, THIN)
    fresh = dict(FULL, captured_at="2026-08-19T18:00:00Z")
    merged = bench._merge_last_good(dict(fresh))
    assert merged["best"]["batch"] == 128
    assert merged["vs_baseline"] == FULL["vs_baseline"]
    # the old thin run's estimate flag must not qualify the fresh
    # measured vs_baseline
    assert "vs_baseline_is_estimate" not in merged
    # only thin-run-only sections are retained
    assert set(merged["retained_from"]) == {"ensemble_train"}


def test_stale_prior_is_ignored(bench):
    _write_last_good(bench, dict(FULL, stale=True))
    assert bench._merge_last_good(dict(THIN)) == THIN


def test_readme_perf_table_current():
    """The README headline table is RENDERED from bench_last_good.json
    (tools/perf_tables.py), never hand-copied — this fails when a new
    capture lands without regenerating (VERDICT r4 weak #6: '23 vols/s'
    prose vs measured 32.1)."""
    import importlib.util
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "perf_tables.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr


def test_perf_table_renders_all_families(tmp_path):
    """The rendered block carries every model family's parity + best
    numbers from the capture."""
    import importlib.util

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "perf_tables", os.path.join(root, "tools", "perf_tables.py")
    )
    pt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pt)
    with open(os.path.join(root, "bench_last_good.json")) as f:
        bench = json.load(f)
    table = pt.render_table(bench)
    for needle in (
        f"{bench['value']:,.0f} @ {bench['batch']}",
        f"{bench['best']['images_per_sec']:,.0f}",
        f"{bench['brats']['images_per_sec']:,.0f}",
        f"{bench['unet3d']['vols_per_sec']:,.1f}",
        f"{bench['vs_baseline']:.1f}",
    ):
        assert needle in table, needle
