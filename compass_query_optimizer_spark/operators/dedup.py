"""Deduplication operators for large-scale training-data pipelines.

Five dedup strategies over the `documents` / `embeddings` tables, each a
registered oracle-checked query:

- exact: hash-groupBy on normalized text (one shuffle on a 128-bit key)
- minhash_lsh: word-shingle → K minhash values → banded LSH bucket join
  (the classic near-dup pipeline; shuffle keys are (band, band_key) so
  candidate generation never goes quadratic)
- simhash: 32-bit sign-aggregated fingerprint + 4-block pigeonhole join
  (guarantees full recall for hamming ≤ 3)
- ngram_jaccard: character-3-gram Jaccard via gram-level equi-join
- embedding cosine near-dup: quantized-int dot products (bit-identical
  across engines), pair generation by self-join

Determinism note: all hashing is the portable md5-based scheme from
functions/hashing.py so the DuckDB oracle reproduces results bit-for-bit;
embeddings are quantized to ints (×10⁴) so dot products are exact integers
and cosine is a single IEEE division — identical in both engines.

Scale note: the LSH variants are the 100 TB path (bucketed joins); the
brute-force pair generators (ngram pairs, embedding cross join) are
correctness baselines whose oracle checks validate the LSH variants'
candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from compass_query_optimizer_spark.catalog import load_tables
from compass_query_optimizer_spark.functions.hashing import (
    P31,
    cw_params,
    duck_cw_hash,
    duck_portable_hash,
    spark_cw_hash,
    spark_portable_hash,
)
from compass_query_optimizer_spark.registry import query

MINHASH_K = 12  # number of minhash functions
MINHASH_R = 3  # rows per band → 4 bands
SHINGLE_W = 3  # words per shingle
_MH_PARAMS = cw_params(MINHASH_K, salt="minhash")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    """
    SELECT md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS text_key,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS n_dups
    FROM documents
    GROUP BY 1
    ORDER BY text_key
    """,
    doc="exact dedup: group by md5 of normalized text, keep min doc_id "
    "(single shuffle on the hash key; at 100 TB pre-aggregate per "
    "partition then shuffle only (key, min, count))",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    norm = F.array_join(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0), " "
    )
    return (
        t["documents"]
        .groupBy(F.md5(norm).alias("text_key"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("text_key")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _spark_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct word-W shingles, JVM higher-order fns."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (SHINGLE_W - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE_W)),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h{K-1}): K minhash values per doc, wide format.

    K min-aggregates over the shingle hashes in ONE groupBy — no per-hash
    explode, so the pre-shuffle row count is the shingle count (not K×) and
    map-side partial aggregation reduces each partition to one row per doc
    before the exchange. All hash arithmetic is codegen'd integer math.
    """
    grams = _spark_shingles(docs).select(
        "doc_id", spark_portable_hash(F.col("shingle")).alias("g")
    )
    return grams.groupBy("doc_id").agg(
        *[
            F.min(spark_cw_hash(F.col("g"), a, b)).alias(f"h{i}")
            for i, (a, b) in enumerate(_MH_PARAMS)
        ]
    )


@query(
    "dedup_minhash_lsh",
    None,  # generated below (needs the hash constants inlined)
    doc="MinHash+LSH near-dup candidates: word-3-shingles → 12 minhashes → "
    "4 bands of 3 → bucket self-join; emits candidate doc pairs",
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sigs = minhash_signatures(t["documents"])
    n_bands = MINHASH_K // MINHASH_R
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{band * MINHASH_R + r}").cast("string")
                        for r in range(MINHASH_R)
                    ],
                ).alias("band_key"),
            )
            for band in range(n_bands)
        ]
    )
    bands = sigs.select(
        "doc_id", F.explode(band_structs).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_key"
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _minhash_oracle() -> str:
    params = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_MH_PARAMS))
    g = duck_portable_hash("shingle")
    return f"""
    WITH params(i, a, b) AS (VALUES {params}),
    toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             tok[s.i] || ' ' || tok[s.i+1] || ' ' || tok[s.i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(tok) - {SHINGLE_W - 2}, 1))) AS s(i)
    ),
    grams AS (SELECT doc_id, {g} AS g FROM shingles),
    sigs AS (
      SELECT doc_id, p.i, MIN((p.a * (g % {P31}) + p.b) % {P31}) AS minh
      FROM grams CROSS JOIN params p
      GROUP BY doc_id, p.i
    ),
    bands AS (
      SELECT doc_id, CAST(i // {MINHASH_R} AS INTEGER) AS band,
             string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i) AS band_key
      FROM sigs GROUP BY 1, 2
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
    WHERE a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4  # pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 blocks identical
SIMHASH_MAXDIST = 3


def simhash_codes(docs: DataFrame) -> DataFrame:
    """(doc_id, code): 32-bit simhash over word tokens (with multiplicity).

    One shuffle: 32 conditional-sum aggregates (one per bit) in a single
    groupBy — no per-bit explode, so the pre-shuffle row count is the token
    count, not 32× it, and map-side partial aggregation reduces each
    partition to one row per doc before the exchange."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    )
    h = spark_portable_hash(F.col("word"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = toks.groupBy("doc_id").agg(*bit_sums)
    code = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        code = code + F.when(
            F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select("doc_id", code.alias("code"))


@query(
    "dedup_simhash",
    None,  # generated below
    doc="SimHash near-dup pairs: 32-bit sign-aggregated fingerprint, "
    "4-block pigeonhole bucket join, exact for hamming ≤ 3",
    tags=("dedup", "lsh"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    codes = simhash_codes(t["documents"])
    blocks = codes.select(
        "doc_id",
        "code",
        F.explode(
            F.array(*[F.lit(k) for k in range(SIMHASH_BLOCKS)])
        ).alias("blk"),
    ).withColumn("blk_key", F.expr("shiftright(code, blk * 8) & CAST(255 AS BIGINT)"))
    a = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("code").alias("code_a"), "blk", "blk_key"
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("code").alias("code_b"), "blk", "blk_key"
    )
    return (
        a.join(b, ["blk", "blk_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("code_a").bitwiseXOR(F.col("code_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAXDIST)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _simhash_oracle() -> str:
    h = duck_portable_hash("word")
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      FROM documents
    ),
    hashed AS (SELECT doc_id, {h} AS h FROM toks),
    per_bit AS (
      SELECT doc_id, j.j AS j,
             SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS tot
      FROM hashed, UNNEST(range(0, {SIMHASH_BITS})) AS j(j)
      GROUP BY 1, 2
    ),
    codes AS (
      SELECT doc_id,
             SUM(CASE WHEN tot > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS code
      FROM per_bit GROUP BY doc_id
    ),
    blocks AS (
      SELECT doc_id, code, k.k AS blk, (code >> (k.k * 8)) & 255 AS blk_key
      FROM codes, UNNEST(range(0, {SIMHASH_BLOCKS})) AS k(k)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.code, b.code)) AS INTEGER) AS hamming
    FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.blk_key = b.blk_key
    WHERE a.doc_id < b.doc_id AND bit_count(xor(a.code, b.code)) <= {SIMHASH_MAXDIST}
    ORDER BY doc_a, doc_b
    """


# ---------------------------------------------------------------------------
# character n-gram Jaccard
# ---------------------------------------------------------------------------
JACCARD_N = 3
JACCARD_THRESHOLD = 0.55


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH grams AS (
      SELECT DISTINCT doc_id, substr(lower(text), s.i, {JACCARD_N}) AS gram
      FROM documents, UNNEST(range(1, greatest(length(text) - {JACCARD_N - 2}, 1))) AS s(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
    doc="char-3-gram Jaccard near-dup pairs via gram-level equi-join "
    "(set-similarity join; intersection counted by join, union by "
    "inclusion-exclusion — no quadratic cross join)",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    txt = F.lower(F.col("text"))
    grams_arr = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(txt) - (JACCARD_N - 1), F.lit(0))
        ),
        lambda i: txt.substr(i, F.lit(JACCARD_N)),
    )
    grams = t["documents"].select(
        "doc_id", F.explode(F.array_distinct(grams_arr)).alias("gram")
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    b = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (quantized-int exact arithmetic)
# ---------------------------------------------------------------------------
COSINE_DUP_THRESHOLD = 0.95
QUANT = 10_000


def quantized(col):
    """array<float> → array<long>: round(x·10⁴) — makes dot products exact
    integers so cosine is bit-identical across engines."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


@query(
    "dedup_embedding_cosine",
    f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, qv,
             list_sum(list_transform(qv, x -> x * x)) AS nrm2
      FROM q
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_sum(list_transform(range(1, len(a.qv) + 1),
                                          i -> a.qv[i] * b.qv[i]))
                 / (sqrt(CAST(a.nrm2 AS DOUBLE)) * sqrt(CAST(b.nrm2 AS DOUBLE))), 6) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i]))
          / (sqrt(CAST(a.nrm2 AS DOUBLE)) * sqrt(CAST(b.nrm2 AS DOUBLE))) >= {COSINE_DUP_THRESHOLD}
    ORDER BY id_a, id_b
    """,
    doc="embedding near-dup pairs: quantized-int dot product + cosine ≥ "
    f"{COSINE_DUP_THRESHOLD}; brute-force pair join (correctness baseline "
    "for the LSH-bucketed ANN in operators/similarity.py)",
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    q = t["embeddings"].select("vec_id", quantized(F.col("embedding")).alias("qv"))
    n = q.select(
        "vec_id",
        "qv",
        F.aggregate(
            F.col("qv"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("nrm2"),
    )
    a = n.select(
        F.col("vec_id").alias("id_a"), F.col("qv").alias("qa"), F.col("nrm2").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("id_b"), F.col("qv").alias("qb"), F.col("nrm2").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= COSINE_DUP_THRESHOLD)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


# patch in the generated oracles
from compass_query_optimizer_spark import registry as _registry  # noqa: E402

_registry._REGISTRY["dedup_minhash_lsh"].oracle = _minhash_oracle()
_registry._REGISTRY["dedup_simhash"].oracle = _simhash_oracle()
