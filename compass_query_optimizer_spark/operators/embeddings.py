"""Embedding-pipeline operators: k-means iteration and int8 quantization.

Two building blocks every large-scale embedding pipeline needs beyond
search/dedup (operators/similarity.py, operators/dedup.py):

- ``emb_kmeans_iter``: one Lloyd iteration of k-means — assign every vector
  to its nearest centroid, then summarize the new clusters. This is the
  canonical *iterative* distributed algorithm; a full training loop is this
  operator applied repeatedly (exactly how Spark MLlib structures it). The
  iteration is fully declarative: centroids (vec_id < K, the deterministic
  seed rule) are broadcast, the assign step is a broadcast cross join whose
  N×K intermediate never materializes (map-side min_by combine), and the
  update step is a K-group aggregation. No driver-side data path at all.
- ``emb_quantize_int8``: global-scale symmetric int8 quantization (the
  compression step before shipping vectors to an ANN serving index):
  scale = 127/max|x| over the corpus — one scalar aggregate broadcast back
  over a single scan. Reports a per-vector code checksum and the max
  reconstruction error.

Cross-engine determinism: vectors are quantized to ×10⁴ integers (same
contract as the dedup/similarity operators) so distances, argmins, and
checksums are exact integer arithmetic — bit-identical in Spark and the
DuckDB oracle. The only doubles are final ratios, rounded on both sides.

Scale notes (100 TB): assign shuffles N rows once (keyed by vec_id for the
argmin combine) and K rows once; centroid count K bounds every broadcast.
Quantization shuffles nothing but one scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compass_query_optimizer_spark.catalog import load_tables, spread
from compass_query_optimizer_spark.operators.dedup import QUANT, quantized
from compass_query_optimizer_spark.registry import query

N_CLUSTERS = 8  # centroids = vectors with vec_id < K (deterministic seed)


def _row_checksum(qv):
    """Position-weighted exact-integer checksum: Σ i·qv[i] (1-based).

    Summing it per cluster equals the checksum of the element-wise sum
    vector, so it verifies the new centroid means without 64 output
    columns."""
    return F.aggregate(
        F.zip_with(qv, F.sequence(F.lit(1), F.size(qv)), lambda x, i: x * i),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@query(
    "emb_kmeans_iter",
    f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {N_CLUSTERS}),
    pairs AS (
      SELECT a.vec_id, c.cid,
             list_sum(list_transform(range(1, len(a.qv) + 1),
                 i -> (a.qv[i] - c.cv[i]) * (a.qv[i] - c.cv[i]))) AS dist2,
             list_sum(list_transform(range(1, len(a.qv) + 1),
                 i -> a.qv[i] * i)) AS row_chk
      FROM q a CROSS JOIN cent c
    ),
    assigned AS (
      SELECT vec_id, cid, dist2, row_chk,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist2, cid) AS rn
      FROM pairs
    )
    SELECT cid AS cluster_id,
           COUNT(*) AS n_members,
           CAST(SUM(dist2) AS BIGINT) AS inertia,
           CAST(SUM(row_chk) AS BIGINT) AS centroid_checksum
    FROM assigned WHERE rn = 1
    GROUP BY cid ORDER BY cid
    """,
    doc="one distributed k-means (Lloyd) iteration: broadcast K centroids, "
    "argmin assignment via map-side min_by combine (the N*K intermediate "
    "never materializes), K-group update summary. Exact integer distances",
    tags=("embeddings", "clustering"),
)
def emb_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    q = spread(t["embeddings"]).select(
        "vec_id", quantized(F.col("embedding")).alias("qv")
    )
    cent = q.filter(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = q.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        dist2.alias("dist2"),
        _row_checksum(F.col("qv")).alias("row_chk"),
    )
    # min(struct) = argmin with deterministic (dist2, cid) tie-break;
    # combines map-side, so the shuffle carries one row per vector
    assigned = pairs.groupBy("vec_id").agg(
        F.min(F.struct("dist2", "cid")).alias("m"),
        F.min("row_chk").alias("row_chk"),  # identical across the K copies
    )
    return (
        assigned.groupBy(F.col("m.cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("m.dist2").alias("inertia"),
            F.sum("row_chk").alias("centroid_checksum"),
        )
        .orderBy("cluster_id")
    )


@query(
    "emb_quantize_int8",
    """
    WITH g AS (
      SELECT MAX(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE))))) AS gmax
      FROM embeddings
    ),
    coded AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / g.gmax))
                      AS BIGINT)) AS qc,
             (127.0 / g.gmax) AS scale
      FROM embeddings, g
    )
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, len(qc) + 1),
                i -> qc[i] * i)) AS BIGINT) AS code_checksum,
           ROUND(list_max(list_transform(range(1, len(qc) + 1),
                i -> abs(CAST(embedding[i] AS DOUBLE) - qc[i] / scale))), 6)
               AS max_abs_err
    FROM coded
    ORDER BY vec_id
    """,
    doc="symmetric int8 quantization with a global scale (127/max|x|): one "
    "scalar aggregate broadcast over one scan — no other shuffle. Emits "
    "code checksum + max reconstruction error per vector",
    tags=("embeddings", "quantization"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = spread(t["embeddings"])
    gmax = emb.agg(
        F.max(
            F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
        ).alias("gmax")
    )
    coded = emb.crossJoin(F.broadcast(gmax)).select(
        "vec_id",
        "embedding",
        (F.lit(127.0) / F.col("gmax")).alias("scale"),
    )
    qc = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.col("scale")).cast("long"),
    )
    coded = coded.select("vec_id", "embedding", "scale", qc.alias("qc"))
    err = F.array_max(
        F.zip_with(
            F.col("embedding"),
            F.col("qc"),
            lambda x, q: F.abs(x.cast("double") - q / F.col("scale")),
        )
    )
    return coded.select(
        "vec_id",
        _row_checksum(F.col("qc")).alias("code_checksum"),
        F.round(err, 6).alias("max_abs_err"),
    ).orderBy("vec_id")


@query(
    "emb_standardize",
    """
    WITH dims AS (
      SELECT unnest(range(1, 1 + len(embedding))) AS i
      FROM (SELECT embedding FROM embeddings LIMIT 1)
    ),
    means AS (
      SELECT i, AVG(embedding[i]) AS m FROM embeddings, dims GROUP BY i
    )
    SELECT e.vec_id,
           ROUND(SQRT(SUM((embedding[i] - m) * (embedding[i] - m))), 4)
             AS centered_norm
    FROM embeddings e, means
    GROUP BY e.vec_id
    ORDER BY e.vec_id
    """,
    doc="embedding standardization (mean-centering): per-dimension means "
    "via posexplode + one combiner-friendly aggregate (shuffle carries "
    "dim-count rows, not vectors), folded into a single broadcast mean "
    "array; each vector's centered norm then computes scan-side with "
    "zip_with/aggregate higher-order functions — the second pass never "
    "explodes rows. The preprocessing step before whitening/PCA in an "
    "embedding pipeline",
    tags=("embeddings",),
)
def emb_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    means = (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg("v").alias("m"))
    )
    mean_arr = means.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("means")
    )
    centered = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.col("means"),
        lambda v, m: (v - m) * (v - m),
    )
    norm = F.sqrt(F.aggregate(centered, F.lit(0.0), lambda acc, x: acc + x))
    return (
        emb.crossJoin(F.broadcast(mean_arr))
        .select("vec_id", F.round(norm, 4).alias("centered_norm"))
        .orderBy("vec_id")
    )


# truncate-toward-zero integer division, identical in both engines. Spark's
# `div` operator (IntegralDivide) already truncates toward zero on int64 —
# exact at ANY magnitude, unlike `/` + cast, whose double intermediate
# rounds across integer boundaries past 2^53 (1339999999999999990/1e14
# gives 13400, not 13399, once stage sums reach ~1e16). DuckDB `//` floors,
# so its twin spells out the sign-aware form.
def _tzdiv(col, div):
    return F.call_function("div", col.cast("long"), div.cast("long"))


def _duck_tzdiv(expr: str, div: str) -> str:
    return (
        f"CASE WHEN ({expr}) >= 0 THEN ({expr}) // ({div}) "
        f"ELSE -((-({expr})) // ({div})) END"
    )


# Self-normalizing stage scale: divide a stage vector by the power of ten
# that caps its max |component| below 1e5. Data-adaptive (random-sign
# cancellation makes fixed shifts either overflow or zero out), exact in
# both engines (digit count of a BIGINT via its decimal string; POWER(10,
# k) is an exact double for k <= 15).
PCA_KEEP_DIGITS = 5


def _stage_scale(col):
    digits = F.length(F.greatest(F.abs(col), F.lit(1)).cast("string"))
    return F.pow(
        F.lit(10.0), F.greatest(digits - F.lit(PCA_KEEP_DIGITS), F.lit(0))
    ).cast("long")


def _duck_stage_scale(expr: str) -> str:
    return (
        f"CAST(POWER(10, GREATEST(length(CAST(GREATEST(ABS({expr}), 1) "
        f"AS VARCHAR)) - {PCA_KEEP_DIGITS}, 0)) AS BIGINT)"
    )


@query(
    "emb_pca_power",
    f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, g.j, qv[g.j] AS qj
      FROM q, unnest(range(1, len(qv) + 1)) AS g(j)
    ),
    d0 AS (
      SELECT vec_id, CAST(SUM(qj) AS BIGINT) AS d0 FROM ex GROUP BY vec_id
    ),
    s1p AS (
      SELECT j, CAST(SUM(e.qj * d.d0) AS BIGINT) AS s1p
      FROM ex e JOIN d0 d USING (vec_id) GROUP BY j
    ),
    m1 AS (SELECT MAX(ABS(s1p)) AS m FROM s1p),
    s1 AS (
      SELECT j, {_duck_tzdiv("s1p", _duck_stage_scale("m1.m"))} AS s1
      FROM s1p CROSS JOIN m1
    ),
    d1p AS (
      SELECT e.vec_id, CAST(SUM(e.qj * s.s1) AS BIGINT) AS d1p
      FROM ex e JOIN s1 s USING (j) GROUP BY e.vec_id
    ),
    m2 AS (SELECT MAX(ABS(d1p)) AS m FROM d1p),
    d1 AS (
      SELECT vec_id, {_duck_tzdiv("d1p", _duck_stage_scale("m2.m"))} AS d1
      FROM d1p CROSS JOIN m2
    ),
    s2 AS (
      SELECT j, CAST(SUM(e.qj * d.d1) AS BIGINT) AS s2
      FROM ex e JOIN d1 d USING (vec_id) GROUP BY j
    )
    SELECT s1.j AS dim, s1.s1 AS power1, s2.s2 AS power2
    FROM s1 JOIN s2 USING (j) ORDER BY dim
    """,
    doc="top principal direction via two power-iteration steps "
    "(v_k+1 = X^T (X v_k), v_0 = 1): the canonical distributed "
    "linear-algebra kernel under PCA/whitening/spectral methods. All "
    "arithmetic is EXACT int64 — vectors quantized x1e4; between stages "
    "each vector is downscaled by the data-adaptive power of ten that "
    "caps components below 1e5 (digit-count of the max |component|), so "
    "magnitudes stay bounded at any corpus size without zeroing out "
    "under random-sign cancellation — both engines agree bit-for-bit, "
    "no float tolerance. Scale shape: per-stage shuffles alternate "
    "between dim-keyed (64 cells, combiner-friendly) and vec-keyed "
    "partial sums; the 64-row direction vectors and scalar maxima "
    "broadcast back",
    tags=("embeddings", "pca", "linear-algebra"),
)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_tables(spark, sf_dir)["embeddings"])
    q = emb.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    ex = q.select(
        "vec_id", F.posexplode("qv").alias("j0", "qj")
    ).select("vec_id", (F.col("j0") + 1).alias("j"), "qj")
    d0 = ex.groupBy("vec_id").agg(F.sum("qj").cast("long").alias("d0"))
    s1p = (
        ex.join(d0, "vec_id")
        .groupBy("j")
        .agg(F.sum(F.col("qj") * F.col("d0")).cast("long").alias("s1p"))
    )
    m1 = s1p.agg(F.max(F.abs(F.col("s1p"))).alias("m"))
    s1 = s1p.crossJoin(F.broadcast(m1)).select(
        "j", _tzdiv(F.col("s1p"), _stage_scale(F.col("m"))).alias("s1")
    )
    d1p = (
        ex.join(F.broadcast(s1), "j")
        .groupBy("vec_id")
        .agg(F.sum(F.col("qj") * F.col("s1")).cast("long").alias("d1p"))
    )
    m2 = d1p.agg(F.max(F.abs(F.col("d1p"))).alias("m"))
    d1 = d1p.crossJoin(F.broadcast(m2)).select(
        "vec_id", _tzdiv(F.col("d1p"), _stage_scale(F.col("m"))).alias("d1")
    )
    s2 = (
        ex.join(d1, "vec_id")
        .groupBy("j")
        .agg(F.sum(F.col("qj") * F.col("d1")).cast("long").alias("s2"))
    )
    return (
        s1.join(s2, "j")
        .select(
            F.col("j").alias("dim"),
            F.col("s1").alias("power1"),
            F.col("s2").alias("power2"),
        )
        .orderBy("dim")
    )


# prefix dims audited: how much of each vector's energy the first k
# dimensions carry (Matryoshka truncation quality, Kusupati et al.,
# NeurIPS'22 — MRL-trained embeddings front-load information so serving
# can truncate; this measures whether a given corpus's vectors actually do)
PREFIX_KS = (8, 16, 32)
PREFIX_GOOD = 0.9  # "k dims suffice" threshold on the norm ratio


@query(
    "emb_prefix_norm",
    f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    r AS (
      SELECT vec_id, ks.k AS k,
             sqrt(CAST(list_sum(list_transform(qv[1:ks.k], x -> x * x)) AS DOUBLE))
               / sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))
               AS ratio
      FROM q CROSS JOIN (VALUES {", ".join(f"({k})" for k in PREFIX_KS)}) AS ks(k)
    )
    SELECT k,
           ROUND(AVG(ratio), 4) AS avg_ratio,
           ROUND(MIN(ratio), 6) AS min_ratio,
           CAST(SUM(CASE WHEN ratio >= {PREFIX_GOOD} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_good,
           COUNT(*) AS n_vectors
    FROM r GROUP BY k ORDER BY k
    """,
    doc="Matryoshka-style truncation audit: per vector, the fraction of "
    f"L2 norm captured by the first k dims (k in {PREFIX_KS}); reports "
    f"avg/min ratio and how many vectors clear {PREFIX_GOOD} per k — the "
    "go/no-go check before serving truncated embeddings. Per-vector "
    "ratios are sqrt/div over EXACT integer sums (bit-identical doubles "
    "in both engines); one scan, one k-keyed aggregate, zero joins",
    tags=("embedding", "quality"),
)
def emb_prefix_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_tables(spark, sf_dir)["embeddings"])
    qv = quantized(F.col("embedding"))

    def _sq_sum(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + x * x
        )

    full = _sq_sum(qv)
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"),
                    (
                        F.sqrt(_sq_sum(F.slice(qv, 1, k)).cast("double"))
                        / F.sqrt(full.cast("double"))
                    ).alias("ratio"),
                )
                for k in PREFIX_KS
            ]
        )
    )
    r = emb.select(bands.alias("b")).select("b.k", "b.ratio")
    return (
        r.groupBy("k")
        .agg(
            F.round(F.avg("ratio"), 4).alias("avg_ratio"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.sum(
                F.when(F.col("ratio") >= PREFIX_GOOD, 1).otherwise(0)
            ).cast("long").alias("n_good"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Label-centroid similarity matrix: cosine between per-label mean vectors —
# the cluster-separability diagnostic run before trusting an embedding
# space (a confusion matrix for the geometry). cos(mean_a, mean_b) equals
# cos(sum_a, sum_b) because the 1/n factors cancel, so the whole matrix is
# exact integer arithmetic over SUM vectors (int64 sums, decimal(38,0)
# products): no mean is ever materialized, no float accumulates, and the
# oracle reproduces it bit-for-bit.
# ---------------------------------------------------------------------------


@query(
    "emb_label_centroid_sim",
    f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    dims AS (
      SELECT label, j, SUM(qv[j]) AS s
      FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS j)
      GROUP BY label, j
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.s * b.s) AS dot,
             SUM(a.s * a.s) AS na, SUM(b.s * b.s) AS nb
      FROM dims a JOIN dims b USING (j)
      WHERE a.label <= b.label
      GROUP BY a.label, b.label
    )
    SELECT label_a, label_b,
           ROUND(dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
               AS cos
    FROM pairs ORDER BY label_a, label_b
    """,
    doc="label-centroid cosine matrix (embedding-space separability "
    "diagnostic): cos between per-label MEAN vectors computed as cos "
    "between per-label SUM vectors (the 1/n factors cancel), so the "
    "whole matrix is exact integer arithmetic: int64 per-dim sums widened "
    "to decimal(38,0) before the products (int64 alone overflows near "
    "~38k same-sign vectors per label) — one (label, dim) combiner agg "
    "(labels x 64 rows), a dim-keyed self-join over those cells, and a "
    "labels² output. Vector rows shuffle once as (label, dim, partial "
    "sum); at any corpus size the join input is label-count x 64 rows",
    tags=("embeddings", "diagnostic"),
)
def emb_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_tables(spark, sf_dir)["embeddings"])
    dims = (
        emb.select(
            "label",
            F.posexplode(quantized(F.col("embedding"))).alias("j0", "x"),
        )
        .groupBy("label", (F.col("j0") + 1).alias("j"))
        .agg(F.sum("x").alias("s"))
    )
    # decimal(38,0) before the products: per-dim sums are O(n*QUANT), so
    # int64 products overflow around ~38k same-sign vectors per label
    # (the star-CC checksum uses the same widening for the same reason);
    # DuckDB's SUM(BIGINT) is already HUGEINT, so this keeps the two
    # engines exact at ANY per-label cardinality, not just fixture scale
    a = dims.select(
        F.col("label").alias("label_a"),
        "j",
        F.col("s").cast("decimal(38,0)").alias("sa"),
    )
    b = dims.select(
        F.col("label").alias("label_b"),
        "j",
        F.col("s").cast("decimal(38,0)").alias("sb"),
    )
    pairs = (
        a.join(b, "j")
        .filter(F.col("label_a") <= F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).alias("na"),
            F.sum(F.col("sb") * F.col("sb")).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(
            F.col("dot")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
            6,
        ).alias("cos"),
    ).orderBy("label_a", "label_b")


@query(
    "emb_norm_outliers",
    f"""
    WITH q AS (
      SELECT vec_id, label,
             list_sum(list_transform(
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)),
               x -> x * x)) AS nrm2
      FROM embeddings
    ),
    stats AS (
      SELECT AVG(CAST(nrm2 AS DOUBLE)) AS mu, STDDEV_SAMP(CAST(nrm2 AS DOUBLE)) AS sd
      FROM q
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN ABS(CAST(nrm2 AS DOUBLE) - s.mu) > 2.5 * s.sd
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM q CROSS JOIN stats s
    GROUP BY label ORDER BY label
    """,
    doc="embedding-norm outlier QC (the events_anomaly pattern applied to "
    "vectors): squared norms are exact int64 scan-side, the corpus "
    "mean/stddev is ONE scalar aggregate broadcast back, and vectors "
    "beyond 2.5σ count per label — degenerate embeddings (zeroed, "
    "exploded, unnormalized batches) show up as per-label outlier spikes "
    "before they poison an ANN index. Two scans, one scalar broadcast, "
    "labels-sized output",
    tags=("embeddings", "quality"),
)
def emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_tables(spark, sf_dir)["embeddings"])
    q = emb.select(
        "label",
        F.aggregate(
            quantized(F.col("embedding")),
            F.lit(0).cast("long"),
            lambda a, x: a + x * x,
        ).alias("nrm2"),
    )
    stats = q.agg(
        F.avg(F.col("nrm2").cast("double")).alias("mu"),
        F.stddev_samp(F.col("nrm2").cast("double")).alias("sd"),
    )
    return (
        q.crossJoin(F.broadcast(stats))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.when(
                    F.abs(F.col("nrm2").cast("double") - F.col("mu"))
                    > 2.5 * F.col("sd"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("label")
    )


@query(
    "emb_dim_variance",
    f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    dims AS (
      SELECT j, CAST(SUM(qv[j]) AS BIGINT) AS s,
             CAST(SUM(qv[j] * qv[j]) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS j)
      GROUP BY j
    ),
    v AS (
      SELECT j, (s2 - s * s * 1.0 / n) / (n - 1) AS var
      FROM dims
    ),
    mv AS (SELECT AVG(var) AS mean_var FROM v)
    SELECT CAST(v.j AS INTEGER) AS dim, ROUND(v.var, 4) AS variance,
           (v.var < 0.01 * mv.mean_var) AS dead
    FROM v CROSS JOIN mv
    ORDER BY dim
    """,
    doc="per-dimension variance profile (dead-dimension detector): a "
    "dimension whose variance collapses relative to the mean carries no "
    "signal — the symptom of truncated checkpoints or collapsed training. "
    "Sums and squared sums are exact int64 per dimension (one combiner "
    "aggregate over (dim) cells, 64-row output); variance derives from the "
    "exact moments so both engines compute the identical double",
    tags=("embeddings", "quality"),
)
def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_tables(spark, sf_dir)["embeddings"])
    dims = (
        emb.select(F.posexplode(quantized(F.col("embedding"))).alias("j0", "x"))
        .groupBy((F.col("j0") + 1).alias("j"))
        .agg(
            F.sum("x").cast("long").alias("s"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    var = dims.select(
        "j",
        (
            (F.col("s2") - F.col("s") * F.col("s") * 1.0 / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    mv = var.agg(F.avg("var").alias("mean_var"))
    return (
        var.crossJoin(F.broadcast(mv))
        .select(
            F.col("j").cast("int").alias("dim"),
            F.round("var", 4).alias("variance"),
            (F.col("var") < 0.01 * F.col("mean_var")).alias("dead"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (Achlioptas JCSS 2003: a ±1 sign
# matrix satisfies the JL lemma): project 64-dim vectors to JL_K dims and
# AUDIT the lemma — for vector pairs, E‖Rx−Ry‖² = k·‖x−y‖², so the ratio
# ‖Δp‖²/(k·‖Δx‖²) concentrates around 1 with std ≈ √(2/k). The cheap
# dimensionality-reduction step before sketching/clustering when PCA's
# data-dependent pass is too expensive; the audit row is the operator's
# own proof it preserved geometry. The ±1 matrix is a compile-time
# literal (md5-derived, the LSH plane_signs scheme) so both engines
# project identically; everything is exact int64 until the final ratios.
# ---------------------------------------------------------------------------

JL_K = 16  # projected dimensions
JL_PAIRS = 200  # consecutive-id vector pairs audited
_JL_SIGNS = None  # built lazily to avoid import-order cost


def _jl_signs():
    global _JL_SIGNS
    if _JL_SIGNS is None:
        from compass_query_optimizer_spark.functions.hashing import plane_signs

        _JL_SIGNS = plane_signs(JL_K, 64, salt="jl")
    return _JL_SIGNS


def _jl_oracle() -> str:
    rows = []
    for k, signs in enumerate(_jl_signs()):
        arr = "[" + ", ".join(str(s) for s in signs) + "]"
        rows.append(
            f"list_sum(list_transform(range(1, 65), "
            f"j -> qv[j] * ({arr}::BIGINT[])[j]))"
        )
    pv = "list_value(" + ", ".join(rows) + ")"
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
      WHERE vec_id < {2 * JL_PAIRS}
    ),
    proj AS (SELECT vec_id, qv, {pv} AS pv FROM q),
    pairs AS (
      SELECT a.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS dx2,
             list_sum(list_transform(range(1, {JL_K} + 1),
               i -> (a.pv[i] - b.pv[i]) * (a.pv[i] - b.pv[i]))) AS dp2
      FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0
    ),
    r AS (
      SELECT dp2 * 1.0 / ({JL_K} * dx2) AS ratio FROM pairs WHERE dx2 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ratio), 4) AS avg_ratio,
           ROUND(MIN(ratio), 4) AS min_ratio,
           ROUND(MAX(ratio), 4) AS max_ratio,
           CAST(SUM(CASE WHEN ratio BETWEEN 0.3 AND 1.7 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_2sigma
    FROM r
    """


@query(
    "emb_random_projection",
    None,  # generated below (inlines the sign matrix)
    doc=f"Johnson-Lindenstrauss ±1 random projection 64→{JL_K} dims "
    "(Achlioptas JCSS 2003) with the lemma audited in-engine: for "
    f"{JL_PAIRS} consecutive-id vector pairs the squared-distance ratio "
    f"‖Δp‖²/({JL_K}·‖Δx‖²) must concentrate around 1 (std √(2/k) ≈ "
    "0.35). One scan, 16 zip_with aggregates per row (JVM codegen, no "
    "explode — the projection never becomes 64×16 rows), one keyed "
    "self-join over the audited pair ids, exact int64 until the final "
    "ratios. The matrix is a hash-derived compile-time literal, so the "
    "operator is reproducible across engines and re-runs",
    tags=("embeddings", "projection", "jl"),
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread(): the audit touches only 2·JL_PAIRS rows — the filter
    # pushes to the scan and a widening exchange would cost more than the
    # 16 aggregates it parallelizes
    emb = load_tables(spark, sf_dir)["embeddings"].filter(
        F.col("vec_id") < 2 * JL_PAIRS
    )
    q = emb.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    # ONE server-side expression string per projection (round 12): the
    # Column-built form created 16×64 F.lit(...).cast("long") objects ≈
    # 1,100 py4j round trips and measured 2.8-3.2 s of DRIVER-side build
    # time against 0.35 s of execution. The parsed expressions are
    # literal-for-literal identical (array of BIGINT literals, same
    # zip_with/aggregate lambdas), so plan and results are unchanged.
    pks = [
        F.expr(
            "aggregate(zip_with(qv, array("
            + ",".join(f"{s}L" for s in signs)
            + "), (x, s) -> x * s), 0L, (acc, x) -> acc + x)"
        ).alias(f"p{k}")
        for k, signs in enumerate(_jl_signs())
    ]
    proj = q.select("vec_id", "qv", F.array(*pks).alias("pv"))
    a = proj.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("ida"), F.col("qv").alias("qa"), F.col("pv").alias("pa")
    )
    b = proj.select(
        F.col("vec_id").alias("idb"), F.col("qv").alias("qb"), F.col("pv").alias("pb")
    )
    sq = lambda u, v: F.expr(  # noqa: E731
        f"aggregate(zip_with({u}, {v}, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, x) -> acc + x)"
    )
    pairs = a.join(b, F.col("idb") == F.col("ida") + 1).select(
        sq("qa", "qb").alias("dx2"),
        sq("pa", "pb").alias("dp2"),
    )
    r = pairs.filter(F.col("dx2") > 0).select(
        (F.col("dp2") * 1.0 / (JL_K * F.col("dx2"))).alias("ratio")
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("ratio"), 4).alias("avg_ratio"),
        F.round(F.min("ratio"), 4).alias("min_ratio"),
        F.round(F.max("ratio"), 4).alias("max_ratio"),
        F.sum(
            F.when(F.col("ratio").between(0.3, 1.7), 1).otherwise(0)
        ).cast("long").alias("n_within_2sigma"),
    )


from compass_query_optimizer_spark import registry as _registry  # noqa: E402

_registry._REGISTRY["emb_random_projection"].oracle = _jl_oracle()


# ---------------------------------------------------------------------------
# Davies-Bouldin cluster validity (Davies & Bouldin, IEEE TPAMI 1979) over
# the label clustering — the eval metric a curation pipeline runs after
# k-means / semantic dedup to decide whether the clustering is usable.
# Everything reduces to exact integer moments so both engines agree
# bit-for-bit: per-(label, dim) sums s and squared sums s2 are int64,
# the within-cluster scatter numerator Σ_d (n·s2_d − s_d²) and the
# between-centroid distance numerator Σ_d (s_d^i·n_j − s_d^j·n_i)² are
# decimal(38,0) integer sums (order-independent — no float accumulation
# ever crosses dimensions), and the only float ops are final sqrt/divide
# on identical inputs. The decimal widening holds to ~3e7 vectors per
# label ((n²·QUANT)² ≤ 1e38); past that, drop QUANT a decade or move the
# pair step to double. Output: per label, its scatter S_i, the worst
# peer j = argmax R_ij = (S_i+S_j)/M_ij, and that R — DB index = AVG(r).
# ---------------------------------------------------------------------------


@query(
    "emb_davies_bouldin",
    f"""
    WITH q AS (
      SELECT label,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    dims AS (
      SELECT label, j, SUM(qv[j]) AS s, SUM(qv[j] * qv[j]) AS s2,
             COUNT(*) AS n
      FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS j)
      GROUP BY label, j
    ),
    scat AS (
      SELECT label, MAX(n) AS n, SUM(n * s2 - s * s) AS num
      FROM dims GROUP BY label
    ),
    s_i AS (
      SELECT label, n,
             sqrt(CAST(num AS DOUBLE)) / n / {QUANT} AS s_val
      FROM scat
    ),
    m2 AS (
      SELECT a.label AS la, b.label AS lb, sa.n AS na, sb.n AS nb,
             SUM((a.s * sb.n - b.s * sa.n) * (a.s * sb.n - b.s * sa.n)) AS num
      FROM dims a
      JOIN dims b ON a.j = b.j AND a.label <> b.label
      JOIN scat sa ON sa.label = a.label
      JOIN scat sb ON sb.label = b.label
      GROUP BY a.label, b.label, sa.n, sb.n
    ),
    r AS (
      SELECT m2.la, m2.lb,
             (si.s_val + sj.s_val)
               / (sqrt(CAST(m2.num AS DOUBLE)) / (m2.na * m2.nb) / {QUANT})
               AS r_ij
      FROM m2
      JOIN s_i si ON si.label = m2.la
      JOIN s_i sj ON sj.label = m2.lb
    ),
    best AS (
      SELECT la, lb, r_ij,
             ROW_NUMBER() OVER (PARTITION BY la ORDER BY r_ij DESC, lb) AS k
      FROM r
    )
    SELECT CAST(b.la AS INTEGER) AS label, CAST(s_i.n AS BIGINT) AS n_vecs,
           ROUND(s_i.s_val, 6) AS scatter,
           CAST(b.lb AS INTEGER) AS worst_peer, ROUND(b.r_ij, 6) AS r
    FROM best b JOIN s_i ON s_i.label = b.la
    WHERE b.k = 1 ORDER BY label
    """,
    doc="Davies-Bouldin cluster validity over the label clustering: "
    "per-label scatter S_i = sqrt(Σ_d(n·s2−s²))/n, between-centroid "
    "separation from the exact cross-moment Σ_d(s_i·n_j − s_j·n_i)², "
    "worst peer ratio R = (S_i+S_j)/M_ij per label (DB index = mean R). "
    "ONE (label, dim) combiner aggregate over N vectors, then all "
    "remaining work happens on the labels×64 cell table and a labels² "
    "matrix — corpus size never reaches the join. Exact int64/decimal "
    "moments keep both engines bit-identical (float scatter sums would "
    "diverge with aggregation order); bound ~3e7 vectors/label before "
    "the decimal widening saturates, documented with the fallback",
    tags=("embeddings", "clustering", "eval"),
)
def emb_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = spread(load_tables(spark, sf_dir)["embeddings"])
    dims = (
        emb.select(
            "label",
            F.posexplode(quantized(F.col("embedding"))).alias("j0", "x"),
        )
        .groupBy("label", (F.col("j0") + 1).alias("j"))
        .agg(
            F.sum("x").cast("decimal(38,0)").alias("s"),
            F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    scat = dims.groupBy("label").agg(
        F.max("n").alias("n"),
        F.sum(
            F.col("n").cast("decimal(38,0)") * F.col("s2")
            - F.col("s") * F.col("s")
        ).alias("num"),
    )
    s_i = scat.select(
        "label",
        "n",
        (
            F.sqrt(F.col("num").cast("double")) / F.col("n") / F.lit(QUANT)
        ).alias("s_val"),
    )
    a = dims.select(
        F.col("label").alias("la"), "j", F.col("s").alias("s_a")
    )
    b = dims.select(
        F.col("label").alias("lb"), "j", F.col("s").alias("s_b")
    )
    na = scat.select(F.col("label").alias("la"), F.col("n").alias("na"))
    nb = scat.select(F.col("label").alias("lb"), F.col("n").alias("nb"))
    m2 = (
        a.join(b, "j")
        .filter(F.col("la") != F.col("lb"))
        .join(F.broadcast(na), "la")
        .join(F.broadcast(nb), "lb")
        .groupBy("la", "lb", "na", "nb")
        .agg(
            F.sum(
                (
                    F.col("s_a") * F.col("nb").cast("decimal(38,0)")
                    - F.col("s_b") * F.col("na").cast("decimal(38,0)")
                )
                * (
                    F.col("s_a") * F.col("nb").cast("decimal(38,0)")
                    - F.col("s_b") * F.col("na").cast("decimal(38,0)")
                )
            ).alias("num")
        )
    )
    si = s_i.select(F.col("label").alias("la"), F.col("s_val").alias("sv_a"))
    sj = s_i.select(F.col("label").alias("lb"), F.col("s_val").alias("sv_b"))
    r = (
        m2.join(F.broadcast(si), "la")
        .join(F.broadcast(sj), "lb")
        .select(
            "la",
            "lb",
            (
                (F.col("sv_a") + F.col("sv_b"))
                / (
                    F.sqrt(F.col("num").cast("double"))
                    / (F.col("na") * F.col("nb"))
                    / F.lit(QUANT)
                )
            ).alias("r_ij"),
        )
    )
    w = Window.partitionBy("la").orderBy(F.desc("r_ij"), "lb")
    return (
        r.withColumn("k", F.row_number().over(w))
        .filter(F.col("k") == 1)
        .join(
            F.broadcast(
                s_i.select(F.col("label").alias("la"), "n", "s_val")
            ),
            "la",
        )
        .select(
            F.col("la").cast("int").alias("label"),
            F.col("n").cast("long").alias("n_vecs"),
            F.round("s_val", 6).alias("scatter"),
            F.col("lb").cast("int").alias("worst_peer"),
            F.round("r_ij", 6).alias("r"),
        )
        .orderBy("label")
    )
