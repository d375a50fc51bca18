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
