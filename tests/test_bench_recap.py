"""Driver-proofing of bench.py: recap ordering, emit, deadline gating.

The driver records only the LAST 2000 chars of bench output and parses
the final JSON line; these tests pin the recap contract that keeps every
metric inside that tail with the north-star metric last.
"""

import importlib.util
import json
import sys


def _load_bench(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "HERACLES_BENCH_RECAP", str(tmp_path / "recap.jsonl")
    )
    monkeypatch.setenv("HERACLES_BENCH_T0", "0")
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_recap_orders_north_star_last(tmp_path, monkeypatch, capsys):
    bench = _load_bench(tmp_path, monkeypatch)
    for name in ("spin0_n4096_l3000", "ingest_2Mrows_2of8cols",
                 "pipeline_n4096_l3000"):
        bench._emit({"metric": name, "value": 1.0, "unit": "ms",
                     "vs_baseline": None, "baseline": "x"})
    capsys.readouterr()
    bench._print_recap()
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("# ====")
    metrics = [json.loads(ln)["metric"] for ln in out[1:]]
    # reversed CONFIGS order: pipeline before ingest before spin0
    assert metrics == ["pipeline_n4096_l3000", "ingest_2Mrows_2of8cols",
                       "spin0_n4096_l3000"]
    # the driver parses the LAST line: must be the north-star metric
    assert json.loads(out[-1])["metric"] == "spin0_n4096_l3000"


def test_recap_dedupes_latest_wins(tmp_path, monkeypatch, capsys):
    bench = _load_bench(tmp_path, monkeypatch)
    bench._emit({"metric": "spin0_n4096_l3000", "value": 1.0,
                 "unit": "error", "vs_baseline": None, "baseline": "f"})
    bench._emit({"metric": "spin0_n4096_l3000", "value": 320.0,
                 "unit": "ms", "vs_baseline": 2.0, "baseline": "x"})
    capsys.readouterr()
    bench._print_recap()
    out = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(ln) for ln in out[1:]]
    assert len(recs) == 1 and recs[0]["value"] == 320.0


def test_recap_fits_driver_tail(tmp_path, monkeypatch, capsys):
    """All metrics' recap lines must fit the driver's 2000-char tail."""
    bench = _load_bench(tmp_path, monkeypatch)
    for name in bench.CONFIGS:
        bench._emit({"metric": name, "value": 12345.678, "unit": "ms",
                     "vs_baseline": 123.456, "baseline": "cpu_1core_scaled",
                     "vs_node_model": 0.123, "cold": True})
    capsys.readouterr()
    bench._print_recap()
    out = capsys.readouterr().out
    assert len(out) < 2000, f"recap is {len(out)} chars; driver keeps 2000"


def test_deadline_estimates_fit_budget(tmp_path, monkeypatch):
    """Sum of per-metric estimates must fit the default deadline, so no
    metric is starved when every estimate holds."""
    bench = _load_bench(tmp_path, monkeypatch)
    total = sum(cfg.get("est", 60) for cfg in bench.CONFIGS.values())
    assert total + 120 <= 1650, total
