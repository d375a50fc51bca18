"""Unit semantics + plan shape for the temporal operators.

The oracle test (tests/test_oracle.py) proves parity with DuckDB's native
ASOF JOIN / interval join on real data; these tests pin the edge-case
semantics on hand-built rows and lock the scale-critical plan shapes:
keyed (never SinglePartition) window for as-of, equi-join (never a nested
loop) for the bucketed range join.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from compass_query_optimizer_spark.operators.temporal import (
    asof_join,
    range_join_count,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2026-01-01T10:00:00")),  # after r@09:00 → 100.0
            (2, "u1", _ts("2026-01-01T11:00:00")),  # after r@11:00 (equal ts → inclusive) → 110.0
            (3, "u1", _ts("2026-01-01T08:00:00")),  # before any right row → null
            (4, "u2", _ts("2026-01-01T10:00:00")),  # key with no right rows → null
        ],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01T09:00:00"), 100.0),
            ("u1", _ts("2026-01-01T11:00:00"), 110.0),
            ("u1", _ts("2026-01-01T12:00:00"), 120.0),  # future — never picked
        ],
        "k string, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {r["id"]: r["asof_v"] for r in out.collect()}
    assert got == {1: 100.0, 2: 110.0, 3: None, 4: None}


def test_asof_join_window_is_keyed(spark):
    left = spark.createDataFrame([("u1", _ts("2026-01-01T10:00:00"))], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts("2026-01-01T09:00:00"), 1.0)], "k string, ts timestamp, v double"
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the carry-forward window must partition on the join key, not sort
    # the whole dataset through one task
    assert "SinglePartition" not in plan


def test_range_join_count_semantics(spark):
    # window = 60 s; right rows straddle a bucket boundary relative to left
    left = spark.createDataFrame(
        [(1, "u1", _ts("2026-01-01T10:01:10"))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01T10:00:09")),  # 61 s before → outside
            ("u1", _ts("2026-01-01T10:00:10")),  # exactly W before → inclusive
            ("u1", _ts("2026-01-01T10:00:59")),  # previous bucket → counted
            ("u1", _ts("2026-01-01T10:01:05")),  # same bucket → counted
            ("u1", _ts("2026-01-01T10:01:10")),  # equal ts → excluded (strict <)
            ("u2", _ts("2026-01-01T10:01:00")),  # other key → excluded
        ],
        "k string, ts timestamp",
    )
    out = range_join_count(
        left, right, on=["k"], left_ts="ts", right_ts="ts", window_seconds=60, row_key="id"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_in_range"] == 3


def test_range_join_no_nested_loop(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2026-01-01T10:01:10"))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame([("u1", _ts("2026-01-01T10:01:00"))], "k string, ts timestamp")
    out = range_join_count(
        left, right, on=["k"], left_ts="ts", right_ts="ts", window_seconds=60, row_key="id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# --- randomized differential: Spark plan vs Python brute force ----------

import random

import pytest


def _random_events(seed: int, n: int):
    rng = random.Random(seed)
    base = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                f"u{rng.randrange(8)}",
                base + dt.timedelta(seconds=rng.randrange(0, 3600), microseconds=rng.randrange(0, 1_000_000)),
                float(rng.randrange(1000)),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_asof_join_matches_bruteforce(spark, seed):
    rows = _random_events(seed, 240)
    left_rows = rows[: len(rows) // 2]
    right_rows = rows[len(rows) // 2 :]
    # unique (k, ts) on the right — dedupe keeping max id (the documented
    # precondition; matches the registered query's max_by pre-aggregation)
    best: dict = {}
    for i, k, ts, v in right_rows:
        if (k, ts) not in best or i > best[(k, ts)][0]:
            best[(k, ts)] = (i, v)
    right_rows = [(k, ts, v) for (k, ts), (i, v) in best.items()]

    left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp, lv double")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {r["id"]: r["asof_v"] for r in out.collect()}

    for i, k, ts, _ in left_rows:
        cands = [(rts, v) for rk, rts, v in right_rows if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, ts)


@pytest.mark.parametrize("seed", [7, 42])
def test_range_join_matches_bruteforce(spark, seed):
    rows = _random_events(seed, 240)
    left_rows = rows[: len(rows) // 2]
    right_rows = [(k, ts) for _, k, ts, _ in rows[len(rows) // 2 :]]
    W = 120
    left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp, lv double")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp")
    out = range_join_count(
        left, right, on=["k"], left_ts="ts", right_ts="ts", window_seconds=W, row_key="id"
    )
    got = {r["id"]: r["n_in_range"] for r in out.collect()}
    for i, k, ts, _ in left_rows:
        lo = ts - dt.timedelta(seconds=W)
        want = sum(1 for rk, rts in right_rows if rk == k and lo <= rts < ts)
        assert got[i] == want, (i, k, ts)


@pytest.mark.parametrize(
    "seed,direction,tol",
    [(7, "backward", None), (7, "forward", None),
     (42, "backward", 300.0), (42, "forward", 300.0)],
)
def test_asof_direction_tolerance_bruteforce(spark, seed, direction, tol):
    rows = _random_events(seed, 200)
    left_rows = rows[: len(rows) // 2]
    best: dict = {}
    for i, k, ts, v in rows[len(rows) // 2 :]:
        if (k, ts) not in best or i > best[(k, ts)][0]:
            best[(k, ts)] = (i, v)
    right_rows = [(k, ts, v) for (k, ts), (i, v) in best.items()]

    left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp, lv double")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["v"], direction=direction, tolerance_seconds=tol,
    )
    got = {r["id"]: r["asof_v"] for r in out.collect()}

    for i, k, ts, _ in left_rows:
        if direction == "backward":
            cands = [
                (rts, v) for rk, rts, v in right_rows
                if rk == k and rts <= ts
                and (tol is None or (ts - rts).total_seconds() <= tol)
            ]
            want = max(cands)[1] if cands else None
        else:
            cands = [
                (rts, v) for rk, rts, v in right_rows
                if rk == k and rts >= ts
                and (tol is None or (rts - ts).total_seconds() <= tol)
            ]
            want = min(cands)[1] if cands else None
        assert got[i] == want, (i, k, ts, direction, tol)


def test_gap_fill_semantics(spark):
    """Hand-built series: a 3-hour hole carries the last value forward and
    flags the synthetic rows; each series gets its OWN grid span; a
    single-bucket series yields exactly one unfilled row."""
    from compass_query_optimizer_spark.operators.temporal import gap_fill

    buckets = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01T00:00:00"), 1.0),
            ("a", _ts("2026-01-01T04:00:00"), 5.0),  # hole: 01,02,03
            ("b", _ts("2026-01-01T10:00:00"), 7.0),  # single bucket
        ],
        "s string, hr timestamp, v double",
    )
    rows = gap_fill(buckets, "s", "hr", "v").collect()
    got = [(r["s"], r["hr"].hour, r["avg_value"], r["filled"]) for r in rows]
    assert got == [
        ("a", 0, 1.0, False),
        ("a", 1, 1.0, True),
        ("a", 2, 1.0, True),
        ("a", 3, 1.0, True),
        ("a", 4, 5.0, False),
        ("b", 10, 7.0, False),
    ]
