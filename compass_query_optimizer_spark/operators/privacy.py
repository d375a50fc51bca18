"""PII detection and redaction over the documents table.

A training-data pipeline must strip personally-identifying strings before
corpus release. This is expressed entirely as a JVM-side regexp projection
(`regexp_count` / `regexp_replace` in whole-stage codegen): zero shuffles,
zero Python — at 100 TB it is a pure scan whose cost is I/O-bound, and the
filter/projection pushes column pruning to the parquet reader.

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB oracle): character classes, bounded repetition, and word
boundaries only — no lookaround or backreferences — so both engines match
identically. Counts are computed per pattern on the ORIGINAL text;
redaction is applied sequentially (emails first, since an address may
embed a digit run).

The synthetic documents corpus contains no real PII, so the oracle row
for every doc reports zero hits and an unchanged-text hash — the unit
test in tests/test_privacy.py exercises real matches on hand-built rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from compass_query_optimizer_spark.catalog import load_tables
from compass_query_optimizer_spark.registry import query

# Java-regex ∩ RE2 portable patterns
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONG_ID_RE = r"\b\d{6,}\b"  # SSN-/account-number-like digit runs

REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("email_hits", EMAIL_RE, "<EMAIL>"),
    ("ipv4_hits", IPV4_RE, "<IP>"),
    ("id_hits", LONG_ID_RE, "<ID>"),
)


def redact_pii(text: Column) -> Column:
    """Sequentially redact every configured PII pattern from `text`."""
    out = text
    for _, pat, repl in REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-pattern hit counts and a `redacted` text column."""
    out = df
    for alias, pat, _ in REDACTIONS:
        # long, to match the oracle's len() type
        out = out.withColumn(
            alias, F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
    return out.withColumn("redacted", redact_pii(F.col(text_col)))


@query(
    "text_pii_redact",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS email_hits,
           len(regexp_extract_all(text, '{IPV4_RE}')) AS ipv4_hits,
           len(regexp_extract_all(text, '{LONG_ID_RE}')) AS id_hits,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
               '{LONG_ID_RE}', '<ID>', 'g')) AS redacted_md5
    FROM documents
    ORDER BY doc_id
    """,
    doc="PII detection + redaction: email/IPv4/long-digit-run counts and "
    "the md5 of the sequentially-redacted text; pure codegen regexp "
    "projection, zero shuffles",
    tags=("text", "privacy"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        pii_scan(docs, "text")
        .select(
            "doc_id",
            "email_hits",
            "ipv4_hits",
            "id_hits",
            F.md5(F.col("redacted")).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (Sweeney, IJUFKS 2002): before a corpus ships, count
# quasi-identifier equivalence classes smaller than k — the classes whose
# members a linker can re-identify. QI here = (lang, source, length bucket);
# swapping in other columns leaves the plan unchanged. ONE combiner
# aggregate over QI cells does all the work; the k-threshold sweep runs
# over the (small) class table, so corpus cardinality never reaches the
# explode. The 100 TB shape: class counting is the only event-cardinality
# shuffle, identical to dedup_exact's.
# ---------------------------------------------------------------------------
_K_THRESHOLDS = [2, 5, 10]


@query(
    "privacy_k_anonymity",
    """
    WITH qi AS (
      SELECT lang, source, n_chars // 500 AS len_bucket,
             COUNT(*) AS class_size
      FROM documents GROUP BY lang, source, n_chars // 500
    )
    SELECT k.k AS k,
           CAST(COUNT(*) FILTER (class_size < k.k) AS BIGINT)
               AS classes_below_k,
           CAST(COALESCE(SUM(class_size) FILTER (class_size < k.k), 0)
                AS BIGINT) AS rows_at_risk
    FROM qi CROSS JOIN (SELECT UNNEST([2, 5, 10]) AS k) k
    GROUP BY k.k ORDER BY k.k
    """,
    doc="k-anonymity audit over the (lang, source, length-bucket) "
    "quasi-identifier: per k in {2, 5, 10}, the number of QI classes "
    "below k and the documents at re-identification risk inside them — "
    "the release gate a governance pipeline runs next to PII redaction. "
    "One QI-keyed combiner aggregate; the threshold sweep explodes only "
    "the class table",
    tags=("privacy", "governance"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    qi = docs.groupBy(
        "lang", "source", F.expr("n_chars div 500").alias("len_bucket")
    ).agg(F.count(F.lit(1)).alias("class_size"))
    ks = qi.select(
        F.explode(F.array(*[F.lit(k) for k in _K_THRESHOLDS])).alias("k"),
        "class_size",
    )
    return (
        ks.groupBy("k")
        .agg(
            F.sum(F.when(F.col("class_size") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("classes_below_k"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("class_size") < F.col("k"), F.col("class_size")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("rows_at_risk"),
        )
        .orderBy("k")
    )


@query(
    "privacy_l_diversity",
    """
    WITH qi AS (
      SELECT source, n_chars // 500 AS len_bucket,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(*) AS class_size
      FROM documents GROUP BY source, n_chars // 500
    )
    SELECT l.l AS l,
           CAST(COUNT(*) FILTER (n_langs < l.l) AS BIGINT)
               AS classes_below_l,
           CAST(COALESCE(SUM(class_size) FILTER (n_langs < l.l), 0)
                AS BIGINT) AS rows_at_risk
    FROM qi CROSS JOIN (SELECT UNNEST([2, 3]) AS l) l
    GROUP BY l.l ORDER BY l.l
    """,
    doc="l-diversity audit (Machanavajjhala et al., TKDD 2007 — the "
    "k-anonymity refinement): a QI class can be large yet still leak if "
    "every member shares one sensitive value, so count classes whose "
    "sensitive attribute (lang) has < l distinct values. Same one-"
    "aggregate shape as privacy_k_anonymity: COUNT(DISTINCT lang) rides "
    "the QI-keyed combiner aggregate, the l sweep explodes only classes",
    tags=("privacy", "governance"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    qi = docs.groupBy(
        "source", F.expr("n_chars div 500").alias("len_bucket")
    ).agg(
        F.count_distinct("lang").alias("n_langs"),
        F.count(F.lit(1)).alias("class_size"),
    )
    ls = qi.select(
        F.explode(F.array(F.lit(2), F.lit(3))).alias("l"),
        "n_langs",
        "class_size",
    )
    return (
        ls.groupBy("l")
        .agg(
            F.sum(F.when(F.col("n_langs") < F.col("l"), 1).otherwise(0))
            .cast("long")
            .alias("classes_below_l"),
            F.coalesce(
                F.sum(
                    F.when(F.col("n_langs") < F.col("l"), F.col("class_size"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("rows_at_risk"),
        )
        .orderBy("l")
    )


# ---------------------------------------------------------------------------
# t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) — completes the
# release-gate trio with k-anonymity and l-diversity: a QI class can be
# large (k-anonymous) AND diverse (l-diverse) yet still leak if its
# sensitive-value DISTRIBUTION deviates from the corpus's (e.g. a class
# that is 90% one language in a 20%-uniform corpus). For a categorical
# sensitive attribute the earth-mover distance reduces to total variation:
# TVD = ½ Σ_v |p_class(v) − p_global(v)|. Computed EXACTLY: the numerator
# Σ_v |cnt_cl(v)·n_g − cnt_g(v)·n_cl| is int64 (order-independent sum),
# the threshold test cross-multiplies the rational t = p/q (q·num >
# 2·p·n_cl·n_g) so no float ever decides a flag, and the reported tvd is
# one exact division rounded for display. Work: one (class, lang) combiner
# aggregate, then classes × |langs| rows — corpus-sized data never reaches
# the distance computation.
# ---------------------------------------------------------------------------

_T_CLOSENESS = [(1, 5), (7, 20)]  # thresholds t = 0.2, 0.35 as rationals


@query(
    "privacy_t_closeness",
    f"""
    WITH cl AS (
      SELECT source, n_chars // 500 AS len_bucket, lang, COUNT(*) AS cnt
      FROM documents GROUP BY source, n_chars // 500, lang
    ),
    sizes AS (
      SELECT source, len_bucket, SUM(cnt) AS n_cl FROM cl
      GROUP BY source, len_bucket
    ),
    gdist AS (SELECT lang, COUNT(*) AS cnt_g FROM documents GROUP BY lang),
    tot AS (SELECT COUNT(*) AS n_g FROM documents),
    cells AS (
      SELECT s.source, s.len_bucket, s.n_cl, g.lang, g.cnt_g, t.n_g,
             COALESCE(c.cnt, 0) AS cnt_cl
      FROM sizes s CROSS JOIN gdist g CROSS JOIN tot t
      LEFT JOIN cl c ON c.source = s.source AND c.len_bucket = s.len_bucket
                    AND c.lang = g.lang
    ),
    tvd AS (
      SELECT source, len_bucket, MAX(n_cl) AS n_cl, MAX(n_g) AS n_g,
             SUM(ABS(cnt_cl * n_g - cnt_g * n_cl)) AS num
      FROM cells GROUP BY source, len_bucket
    )
    SELECT t.p * 1.0 / t.q AS t,
           CAST(COUNT(*) FILTER (q * num > 2 * p * n_cl * n_g) AS BIGINT)
               AS classes_above_t,
           CAST(COALESCE(SUM(n_cl) FILTER (q * num > 2 * p * n_cl * n_g), 0)
                AS BIGINT) AS rows_at_risk,
           ROUND(MAX(num * 1.0 / (2 * n_cl * n_g)), 6) AS worst_tvd
    FROM tvd CROSS JOIN (
      VALUES {", ".join(f"({p}, {q})" for p, q in _T_CLOSENESS)}
    ) t(p, q)
    GROUP BY t.p, t.q ORDER BY t
    """,
    doc="t-closeness release gate (Li et al., ICDE 2007) — the third leg "
    "of the privacy trio: flags QI classes whose sensitive-value "
    "distribution deviates from the corpus by total-variation distance "
    "> t. The TVD numerator is an exact int64 cross-multiplication and "
    "the threshold test is rational (q·num > 2·p·n_cl·n_g) — no float "
    "decides a flag; one (class, lang) combiner aggregate, distance work "
    "on classes × |langs| rows only",
    tags=("privacy", "governance"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    cl = docs.groupBy(
        "source", F.expr("n_chars div 500").alias("len_bucket"), "lang"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    sizes = cl.groupBy("source", "len_bucket").agg(
        F.sum("cnt").alias("n_cl")
    )
    glob = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt_g"))
    tot = docs.agg(F.count(F.lit(1)).alias("n_g"))
    cells = (
        sizes.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cl, ["source", "len_bucket", "lang"], "left")
        .withColumn("cnt_cl", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    tvd = cells.groupBy("source", "len_bucket").agg(
        F.max("n_cl").alias("n_cl"),
        F.max("n_g").alias("n_g"),
        F.sum(
            F.abs(
                F.col("cnt_cl") * F.col("n_g") - F.col("cnt_g") * F.col("n_cl")
            )
        ).alias("num"),
    )
    ts = tvd.crossJoin(
        F.broadcast(spark.createDataFrame(_T_CLOSENESS, "p int, q int"))
    )
    above = F.col("q") * F.col("num") > 2 * F.col("p") * F.col("n_cl") * F.col("n_g")
    return (
        ts.groupBy((F.col("p") * 1.0 / F.col("q")).alias("t"))
        .agg(
            F.sum(F.when(above, 1).otherwise(0)).cast("long").alias(
                "classes_above_t"
            ),
            F.coalesce(F.sum(F.when(above, F.col("n_cl"))), F.lit(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.round(
                F.max(F.col("num") * 1.0 / (2 * F.col("n_cl") * F.col("n_g"))),
                6,
            ).alias("worst_tvd"),
        )
        .orderBy("t")
    )
