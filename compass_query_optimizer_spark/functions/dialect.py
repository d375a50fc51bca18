"""MapD SQL dialect shim → Spark SQL.

The reference's SQL surface is Calcite-parsed MapD dialect (SURVEY.md §2.8):
`ILIKE`, `NOW()`, `DATETIME('NOW')`, `DATEADD/DATEDIFF/DATEPART`
(QueryEngine/DateAdd.h:42-57, RelAlgTranslator.cpp:831,1004-1010),
`UNNEST` (RelAlgTranslator.cpp:1016), `TRUNCATE(x, d)` /
`ROUND_TO_DIGIT(x, d)` (QueryEngine/ExtensionFunctions.hpp:35-235).
Spark-first mapping: rewrite to built-in Spark SQL so everything stays
inside whole-stage codegen — zero Python UDFs.

The rewriter is a real tokenizer-lite: function calls are located by name
and their argument lists split on top-level commas with balanced parens and
quote awareness, so nested calls (``DATEADD('day', DATEPART('day', a), b)``)
rewrite correctly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# MapD datepart field tokens (DateAdd.h / ExtractFromTime.h) → ANSI field
_FIELD = {
    "year": "YEAR",
    "quarter": "QUARTER",
    "month": "MONTH",
    "week": "WEEK",
    "day": "DAY",
    "hour": "HOUR",
    "minute": "MINUTE",
    "second": "SECOND",
    "dow": "DOW",
    "isodow": "ISODOW",
    "doy": "DOY",
    "epoch": "EPOCH",
    "millennium": "MILLENNIUM",
    "century": "CENTURY",
    "decade": "DECADE",
}


def _split_args(arglist: str) -> list[str]:
    """Split on top-level commas; respects parens and single quotes."""
    args, depth, cur, i = [], 0, [], 0
    while i < len(arglist):
        ch = arglist[i]
        if ch == "'":
            cur.append(ch)
            i += 1
            while i < len(arglist):
                cur.append(arglist[i])
                if arglist[i] == "'":
                    break
                i += 1
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if "".join(cur).strip():
        args.append("".join(cur).strip())
    return args


def _rewrite_calls(sql: str, fname: str, emit) -> str:
    """Replace every call of ``fname(...)`` (case-insensitive, balanced
    parens) with ``emit(args) -> str``. Processes right-to-left so nested
    same-name calls rewrite inside-out."""
    pat = re.compile(rf"\b{fname}\s*\(", re.I)
    while True:
        spans = [
            (q.start(), q.end()) for q in re.finditer(r"'(?:[^']|'')*'", sql)
        ]
        matches = [
            m
            for m in pat.finditer(sql)
            if not any(a <= m.start() < b for a, b in spans)
        ]
        if not matches:
            return sql
        m = matches[-1]
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "'":
                i += 1
                while i < len(sql) and sql[i] != "'":
                    i += 1
            elif sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner = sql[m.end() : i - 1]
        sql = sql[: m.start()] + emit(_split_args(inner)) + sql[i:]


def _field(tok: str) -> str:
    t = tok.strip().strip("'").lower()
    if t not in _FIELD:
        raise ValueError(f"unsupported datepart field: {tok!r}")
    return _FIELD[t]


def to_spark_sql(sql: str) -> str:
    """Translate MapD-dialect SQL to Spark SQL (pure string rewrite)."""
    # DATEADD('field', n, ts) → TIMESTAMPADD(FIELD, n, ts)
    sql = _rewrite_calls(
        sql, "DATEADD", lambda a: f"TIMESTAMPADD({_field(a[0])}, {a[1]}, {a[2]})"
    )
    # DATEDIFF('field', start, end) → TIMESTAMPDIFF(FIELD, start, end)
    sql = _rewrite_calls(
        sql, "DATEDIFF", lambda a: f"TIMESTAMPDIFF({_field(a[0])}, {a[1]}, {a[2]})"
    )
    # DATEPART('field', ts) → EXTRACT(FIELD FROM ts)
    sql = _rewrite_calls(
        sql, "DATEPART", lambda a: f"EXTRACT({_field(a[0])} FROM {a[1]})"
    )
    # TRUNCATE(x, d) → truncate-toward-zero at d digits (ExtensionFunctions
    # .hpp Truncate uses std::trunc); TRUNCATE(x) → toward-zero integer
    def _trunc(a: list[str]) -> str:
        if len(a) == 1:
            return f"(CAST({a[0]} AS BIGINT))"
        x, d = a
        return (
            f"(CASE WHEN ({x}) >= 0 THEN FLOOR(({x}) * POW(10, {d})) "
            f"ELSE CEIL(({x}) * POW(10, {d})) END / POW(10, {d}))"
        )

    sql = _rewrite_calls(sql, "TRUNCATE", _trunc)
    # ROUND_TO_DIGIT(x, d) → ROUND(x, d)
    sql = _rewrite_calls(sql, "ROUND_TO_DIGIT", lambda a: f"ROUND({a[0]}, {a[1]})")
    # DATETIME('NOW') / NOW() → CURRENT_TIMESTAMP
    sql = _rewrite_calls(sql, "DATETIME", lambda a: "CURRENT_TIMESTAMP")
    sql = _rewrite_calls(sql, "NOW", lambda a: "CURRENT_TIMESTAMP")
    # UNNEST(arr) → EXPLODE(arr)  (RelAlgTranslator.cpp:1016 → generator)
    sql = _rewrite_calls(sql, "UNNEST", lambda a: f"EXPLODE({a[0]})")
    # LIKELY/UNLIKELY(cond) → (cond): selectivity hints are semantic
    # no-ops (RelAlgTranslator.cpp:995-999 passthrough)
    sql = _rewrite_calls(sql, "LIKELY", lambda a: f"({a[0]})")
    sql = _rewrite_calls(sql, "UNLIKELY", lambda a: f"({a[0]})")
    # ILIKE / LIKE / REGEXP_LIKE / CHAR_LENGTH / LENGTH / EXTRACT /
    # DATE_TRUNC / math fns are native Spark SQL — passthrough.
    return sql


_FPD_COUNT_RE = re.compile(
    r"^\s*SELECT\s+COUNT\(\s*\*\s*\)(?:\s+AS\s+(\w+))?\s*\bFROM\b", re.I | re.S
)


def compass_sql(
    spark: SparkSession,
    sql: str,
    sf_dir: str | None = None,
    fpd: bool = False,
) -> DataFrame:
    """Engine entry: run MapD-dialect SQL against the catalog tables.

    ``fpd=True`` is the reference's ``\\fpd`` session toggle
    (mapd-core/README.md:56, RelAlgExecutor.cpp COMPASS path): a
    JOB-shaped multi-join ``COUNT(*)`` is routed through the sketch
    optimizer (push-down → order search → enforced left-deep chain);
    any query the COMPASS parser rejects falls through to plain
    Catalyst execution, exactly as the reference falls back to its
    normal executor for non-eligible plans."""
    from compass_query_optimizer_spark.catalog import load_tables

    if sf_dir is not None:
        load_tables(spark, sf_dir, register=True)
    if fpd:
        m = _FPD_COUNT_RE.match(sql)
        if m:
            from compass_query_optimizer_spark.plans.graph import parse_join_query

            try:
                spec = parse_join_query(sql)
            except ValueError:
                spec = None
            if spec is not None and len(spec.tables) >= 2:
                from pyspark.sql import functions as F

                from compass_query_optimizer_spark.plans.optimizer import (
                    CompassOptimizer,
                )

                out = CompassOptimizer(spark).execute_count(spec, sf_dir)
                return out.select(F.col("cnt").alias(m.group(1) or "cnt"))
    return spark.sql(to_spark_sql(sql))
