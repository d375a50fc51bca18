"""Registry-level lint: no oracle may return a DuckDB HUGEINT column.

DuckDB types ``SUM(BIGINT)`` as HUGEINT, which crosses Arrow as
decimal128(38, 0); the driver's value-hash is type-sensitive, so a query
whose Spark side returns bigint fails the hash even when every value is
identical (this is exactly how ``events_variant_extract`` shipped red in
round 4 despite correct answers). The repo convention is to wrap every
integer SUM as ``CAST(SUM(...) AS BIGINT)``; this test enforces it for all
current and future oracles by executing each one at sf0.001 and asserting
the Arrow schema carries no decimal128(38, 0) — a type no oracle here
produces intentionally.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from compass_query_optimizer_spark.registry import all_queries
from tests.conftest import SF_DIR, make_duck

SPECS = all_queries()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck_tiny():
    return make_duck(SF_DIR)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_has_no_hugeint_column(name, duck_tiny):
    schema = duck_tiny.execute(SPECS[name].oracle_text()).arrow().schema
    offenders = [
        f.name
        for f in schema
        if pa.types.is_decimal(f.type)
        and f.type.precision == 38
        and f.type.scale == 0
    ]
    assert not offenders, (
        f"{name}: oracle column(s) {offenders} come back from DuckDB as "
        "HUGEINT/decimal128(38,0) — almost certainly a bare SUM(<integer>); "
        "wrap as CAST(SUM(...) AS BIGINT) so the driver value-hash matches "
        "the Spark bigint"
    )
