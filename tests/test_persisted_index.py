"""Persisted ANN index round-trip: the incremental IVF index's claim is
that (cents, index_members) are a parquet-persistable artifact. Prove it
end-to-end: fold once, write both tables to parquet, RELOAD them, and
serve arrival batches through the identical probe path — results must be
row-identical to the in-memory fold, and a second, different batch must
serve correctly from the same persisted files (no refold)."""

from __future__ import annotations

from pyspark.sql import functions as F

from compass_query_optimizer_spark.catalog import load_tables
from compass_query_optimizer_spark.operators.similarity import (
    _quantized_with_norm,
    incremental_standing_parts,
    serve_arrivals,
)
from tests.conftest import SF_DIR, SF_DIR_ORACLE


def test_persisted_incremental_index_roundtrip(spark, tmp_path):
    cents, members = incremental_standing_parts(spark, SF_DIR)
    cents.write.parquet(str(tmp_path / "cents"))
    members.write.parquet(str(tmp_path / "members"))

    cents2 = spark.read.parquet(str(tmp_path / "cents"))
    members2 = spark.read.parquet(str(tmp_path / "members"))

    n = _quantized_with_norm(load_tables(spark, SF_DIR)["embeddings"])
    arrivals = n.filter(F.col("vec_id") % 10 == 0)

    from compass_query_optimizer_spark.registry import all_queries

    direct = all_queries()["sim_ann_incremental"].build(spark, SF_DIR).collect()
    served = (
        serve_arrivals(arrivals, cents2, members2)
        .orderBy("arrival_id", "rnk")
        .collect()
    )
    assert [tuple(r) for r in served] == [tuple(r) for r in direct]
    assert len(served) > 0


def test_persisted_index_serves_a_second_batch(spark, tmp_path):
    """A later batch probes the SAME persisted files — the serving path
    never refolds the corpus. Batch-2 queries are standing vectors, so
    each must retrieve itself at rank 1 with cosine 1.0 (its own cell is
    its nearest cell, and it is a member of that cell)."""
    cents, members = incremental_standing_parts(spark, SF_DIR)
    cents.write.parquet(str(tmp_path / "cents"))
    members.write.parquet(str(tmp_path / "members"))
    cents2 = spark.read.parquet(str(tmp_path / "cents"))
    members2 = spark.read.parquet(str(tmp_path / "members"))

    n = _quantized_with_norm(load_tables(spark, SF_DIR)["embeddings"])
    batch2 = n.filter(F.col("vec_id") % 10 == 5)
    out = serve_arrivals(batch2, cents2, members2)
    top1 = {r["arrival_id"]: r for r in out.filter(F.col("rnk") == 1).collect()}
    n_batch2 = batch2.count()
    assert len(top1) == n_batch2 > 0
    for arrival_id, row in top1.items():
        assert row["neighbor_id"] == arrival_id, row
        assert row["cos"] == 1.0, row


def test_registered_persisted_entry_matches_in_session_fold(spark):
    """The registered sim_ann_persisted entry (write → reload → serve
    batch vec_id%10==5) must be row-identical to serving the same batch
    from the in-session fold — the parquet round-trip adds nothing and
    loses nothing."""
    from compass_query_optimizer_spark.registry import all_queries

    cents, members = incremental_standing_parts(spark, SF_DIR)
    n = _quantized_with_norm(load_tables(spark, SF_DIR)["embeddings"])
    batch5 = n.filter(F.col("vec_id") % 10 == 5)
    in_session = (
        serve_arrivals(batch5, cents, members.localCheckpoint(eager=True))
        .orderBy("arrival_id", "rnk")
        .collect()
    )
    via_entry = (
        all_queries()["sim_ann_persisted"]
        .build(spark, SF_DIR)
        .orderBy("arrival_id", "rnk")
        .collect()
    )
    assert [tuple(r) for r in via_entry] == [tuple(r) for r in in_session]
    assert len(via_entry) > 0


def test_ann_assign_paths_agree(spark):
    """Round 11: nearest_cells has two implementations — the default
    Arrow path (vectorized float64 BLAS matmul per chunk; exact because
    every product and 64-term sum of quantized coordinates sits ~4
    decades under 2^53) and the round-9/10 JVM path (packed-argmin
    HashAggregate / row_number window). They must return IDENTICAL
    (id, crk, cid) rows for both the argmin (nprobe=1) and top-n
    (nprobe=2) shapes, including d2 ties broken on smallest cid."""
    from compass_query_optimizer_spark.operators.similarity import (
        nearest_cells,
    )

    n = _quantized_with_norm(load_tables(spark, SF_DIR)["embeddings"])
    standing = n.filter(F.col("vec_id") % 10 != 0)
    cents = standing.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    for nprobe in (1, 2):
        arrow = sorted(
            tuple(r)
            for r in nearest_cells(
                standing, cents, nprobe=nprobe, impl="arrow"
            ).collect()
        )
        jvm = sorted(
            tuple(r)
            for r in nearest_cells(
                standing, cents, nprobe=nprobe, impl="jvm"
            ).collect()
        )
        assert arrow == jvm
        assert len(arrow) == standing.count() * nprobe


def test_ann_serve_paths_agree(spark):
    """Round 11: serve_arrivals' per-cell cogrouped-matmul rerank must
    return rows IDENTICAL to the JVM cosine-lambda path — including the
    float cos values (integer dots are exact in float64 and the final
    multiply-then-divide is the same IEEE sequence on both sides) and
    rank ties broken on neighbor_id."""
    from compass_query_optimizer_spark.operators.similarity import (
        serve_arrivals,
    )

    n = _quantized_with_norm(load_tables(spark, SF_DIR)["embeddings"])
    arrivals = n.filter(F.col("vec_id") % 10 == 0)
    cents, members = incremental_standing_parts(spark, SF_DIR)
    members = members.localCheckpoint(eager=True)
    arrow = serve_arrivals(arrivals, cents, members, impl="arrow").collect()
    jvm = serve_arrivals(arrivals, cents, members, impl="jvm").collect()
    assert [tuple(r) for r in arrow] == [tuple(r) for r in jvm]
    assert len(arrow) > 0


def test_pq_encode_paths_agree(spark):
    """Round 11: PQ code assignment has two implementations — the default
    Arrow path (pq_codes_arrow: one mapInPandas scoring all M subspaces
    per chunk against the collected sub-codebooks) and the JVM
    broadcast-join + combiner-argmin expansion. They must return
    IDENTICAL (vec_id, s, code) rows, including d2 ties broken on the
    smallest centroid id."""
    from compass_query_optimizer_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        pq_codes_arrow,
    )

    n = _quantized_with_norm(load_tables(spark, SF_DIR)["embeddings"])
    subs = n.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("qv"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for s in range(PQ_M)
                ]
            )
        ).alias("s", "sv"),
    )
    cents = subs.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("cid"), "s", F.col("sv").alias("cv")
    )
    arrow = sorted(
        tuple(r)
        for r in pq_codes_arrow(n, cents, subdim=PQ_SUBDIM).collect()
    )
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    jvm = sorted(
        tuple(r)
        for r in subs.join(F.broadcast(cents), "s")
        .select("vec_id", "s", "cid", d2.alias("d2"))
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select("vec_id", "s", F.col("m.cid").alias("code"))
        .collect()
    )
    assert arrow == jvm
    assert len(arrow) == n.count() * PQ_M


def test_dup_lsh_paths_agree(spark, monkeypatch, tmp_path):
    """Round 11: dedup_embedding_lsh's exact verify has two
    implementations — the default per-bucket chunked-matmul path
    (_bucket_pairs_arrow) and the JVM pair-join + cosine-lambda path.
    They must return IDENTICAL (id_a, id_b, cos) rows: integer dots are
    exact in float64 and the divide is the same IEEE sequence, so the
    threshold cut and the rounding agree bit-for-bit. The driver
    fixtures plant no embedding near-dups (the entry is green at 0 rows
    there), so this gate generates a corpus with planted ≥0.95-cosine
    pairs to exercise the verify non-vacuously."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from compass_query_optimizer_spark.operators import similarity
    from compass_query_optimizer_spark.registry import all_queries

    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 64).astype(np.float32)
    # plant near-duplicates: tiny perturbation keeps cosine ~0.9999 and
    # identical hyperplane sign codes, so candidates AND the threshold
    # cut both fire
    for i in range(0, 60, 2):
        vecs[i + 1] = vecs[i] + rng.randn(64).astype(np.float32) * 1e-3
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    build = all_queries()["dedup_embedding_lsh"].build
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "arrow")
    arrow = [tuple(r) for r in build(spark, str(tmp_path)).collect()]
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "jvm")
    jvm = [tuple(r) for r in build(spark, str(tmp_path)).collect()]
    assert arrow == jvm
    assert len(arrow) >= 30


def test_semantic_paths_agree(spark, monkeypatch, tmp_path):
    """Round 11: dedup_semantic's in-cell pairwise verify has two
    implementations — the default per-(cell, sub) chunked-matmul path and
    the JVM self-join + cosine-lambda path. Row-identical on a corpus
    with planted ≥0.95-cosine near-dups (the driver fixtures plant none,
    so the entry's oracle gate alone is value-vacuous)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from compass_query_optimizer_spark.operators import similarity
    from compass_query_optimizer_spark.registry import all_queries

    rng = np.random.RandomState(11)
    vecs = rng.randn(300, 64).astype(np.float32)
    for i in range(0, 60, 2):
        vecs[i + 1] = vecs[i] + rng.randn(64).astype(np.float32) * 1e-3
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    build = all_queries()["dedup_semantic"].build
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "arrow")
    arrow = [tuple(r) for r in build(spark, str(tmp_path)).collect()]
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "jvm")
    jvm = [tuple(r) for r in build(spark, str(tmp_path)).collect()]
    assert arrow == jvm
    assert sum(1 for r in arrow if not r[2]) >= 30  # planted dups dropped


def test_plane_codes_paths_agree(spark, monkeypatch):
    """Round 11: the hyperplane code pass has two implementations — the
    default mapInPandas ±1-matmul and the JVM posexplode + conditional-sum
    aggregate. Identical (vec_id, t, c) rows across multiple tables and
    widths (the ≥ 0 sign test is exact on both sides)."""
    from compass_query_optimizer_spark.operators import similarity
    from compass_query_optimizer_spark.operators.similarity import (
        _DUP_PLANES,
        _plane_dot_codes,
        _plane_dot_codes_jvm,
    )

    n = _quantized_with_norm(load_tables(spark, SF_DIR)["embeddings"])
    tables = [p[:9] for p in _DUP_PLANES]
    arrow = sorted(
        tuple(r) for r in _plane_dot_codes(n, tables).collect()
    )
    jvm = sorted(
        tuple(r) for r in _plane_dot_codes_jvm(n, tables).collect()
    )
    assert arrow == jvm
    assert len(arrow) == n.count() * len(tables)


def test_ivfpq_fused_paths_agree(spark, monkeypatch):
    """Round 12: sim_ann_ivfpq's fused coarse-assign + residual-encode
    mapInPandas must produce results row-identical to the JVM path
    (packed-argmin crossJoin assignment + broadcast-join combiner-argmin
    encode) end to end — same codes, same ADC algebra inputs, same final
    cos values and rank tie-breaks."""
    from compass_query_optimizer_spark.operators import similarity
    from compass_query_optimizer_spark.registry import all_queries

    build = all_queries()["sim_ann_ivfpq"].build
    sf = SF_DIR_ORACLE  # sf0.001 is below the operator's corpus-size bar
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "arrow")
    arrow = [tuple(r) for r in build(spark, sf).collect()]
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "jvm")
    jvm = [tuple(r) for r in build(spark, sf).collect()]
    assert arrow == jvm
    assert len(arrow) > 0


def test_knn_paths_agree(spark, monkeypatch):
    """Round 11: emb_knn_graph's per-bucket top-k matmul (boundary ties
    all emitted, exact window cut downstream) must be row-identical to
    the JVM bucket self-join + cosine-lambda + window path — including
    rank ties broken on neighbor_id."""
    from compass_query_optimizer_spark.operators import similarity
    from compass_query_optimizer_spark.registry import all_queries

    build = all_queries()["emb_knn_graph"].build
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "arrow")
    arrow = [tuple(r) for r in build(spark, SF_DIR).collect()]
    monkeypatch.setattr(similarity, "_ANN_ASSIGN", "jvm")
    jvm = [tuple(r) for r in build(spark, SF_DIR).collect()]
    assert arrow == jvm
    assert len(arrow) > 0
