"""PII scan/redaction semantics on hand-built rows (the synthetic corpus
contains no PII, so the oracle row only proves the no-op path — these
rows prove real matches redact identically to the documented patterns)."""

from __future__ import annotations

from compass_query_optimizer_spark.operators.privacy import pii_scan


def test_pii_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "contact alice.smith+x@example.co.uk or bob@test.org today"),
            (2, "server at 10.0.0.1 and 192.168.001.200, port 8080"),
            (3, "account 123456789 ref 000042, short 12345 stays"),
            (4, "clean text with no identifiers at all"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert rows[1]["email_hits"] == 2 and "<EMAIL>" in rows[1]["redacted"]
    assert "alice" not in rows[1]["redacted"] and "bob@" not in rows[1]["redacted"]
    assert rows[2]["ipv4_hits"] == 2 and rows[2]["redacted"].count("<IP>") == 2
    assert "8080" in rows[2]["redacted"]  # port: 4 digits, below ID threshold
    assert rows[3]["id_hits"] == 2  # 123456789 and 000042; 12345 is too short
    assert "12345 stays" in rows[3]["redacted"]
    assert rows[4]["email_hits"] == rows[4]["ipv4_hits"] == rows[4]["id_hits"] == 0
    assert rows[4]["redacted"] == rows[4]["text"]


def test_pii_scan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = pii_scan(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: scan + project only
