"""bench.py's driver contract: the JSON must survive stdout noise (sidecar
file) and the emitted line must parse. Pure-Python pieces only — the full
run is exercised by the per-round driver."""

from __future__ import annotations

import importlib.util
import json
import os


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sidecar_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench()
    out = tmp_path / "bench_out.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out))
    payload = {"metric": "headline_queries_total_wall", "value": 1.5,
               "queries": {"q01_pricing_summary": 1.5}}
    bench._write_sidecar(json.dumps(payload))
    assert json.loads(out.read_text()) == payload


def test_sidecar_write_failure_is_nonfatal(tmp_path, monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_OUT", str(tmp_path / "no" / "such" / "dir" / "x.json")
    )
    bench._write_sidecar("{}")  # must not raise — stdout still carries it
    assert "sidecar write failed" in capsys.readouterr().err


def test_headline_names_are_registered():
    bench = _load_bench()
    from compass_query_optimizer_spark.registry import all_queries

    names = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, f"HEADLINE references unknown queries: {missing}"
