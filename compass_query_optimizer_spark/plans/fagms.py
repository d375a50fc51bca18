"""Fast-AGMS sketches for online join-size estimation (COMPASS core).

Re-expression of the reference's sketch layer (mapd-core/QueryEngine/
Sketch/Sketches.h:15-26, XIS.h; SIGMOD 2021 COMPASS paper §3) on Spark:

- a sketch is ROWS × BUCKETS counters per join attribute; every surviving
  tuple adds ±1 to one counter per row (bucket chosen by a 2-universal
  Carter–Wegman hash, sign by a 3-wise-independent EH3 hash);
- the two-way join size estimate is the median over rows of the bucket-wise
  dot product of the two sketches (Sketches.h:155-176);
- k-way estimates multiply k column planes bucket-wise (Sketches.h:178-204,
  zero counters replaced by 1e-4, absolute values).

The *build* runs distributed: a single Spark aggregation per table pass —
explode over ROWS row-indices (the same per-tuple work the reference's
kFAGMS_SKETCH aggregate does in RuntimeFunctions.cpp:318-340), compute
bucket and sign with JVM bit arithmetic inside whole-stage codegen, and
groupBy(col, row, bucket) with map-side partial aggregation so the shuffle
is at most COLS×ROWS×BUCKETS tiny rows regardless of table size. Estimation
and join-order search happen driver-side in numpy.

EH3 (public scheme, Rusu & Dobra "Pseudo-Random Number Generation for
Sketch-Based Estimations", TODS 2007): for seed (s0, sv) and 32-bit key x,
  sign(x) = +1 iff  s0 ⊕ parity(sv & x) ⊕ parity((x>>1) & x & 0x55555555)
is even — 3-wise independent, one AND/POPCNT chain per evaluation.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference defaults: COMPASS_init_variables.txt:1-2 (73 rows × 1021 buckets)
SKETCH_ROWS = 73
SKETCH_BUCKETS = 1021

P31 = 2_147_483_647
_MASK32 = 0xFFFFFFFF
_PAIR_MASK = 0x55555555


def seeds_for_class(class_key: str, rows: int = SKETCH_ROWS) -> "SketchSeeds":
    """Deterministic per-equivalence-class seeds.

    The reference shares seeds across all join columns of the same
    transitive equality class so sketches of different tables are
    comparable (FilterPushDownSketch.cpp:1280-1373). We key the seeds on
    the class id: same class → same seeds, on every table, every session.
    """

    def h(tag: str, i: int, mod: int, lo: int = 0) -> int:
        v = int(hashlib.md5(f"fagms-{class_key}-{tag}-{i}".encode()).hexdigest()[:12], 16)
        return lo + v % (mod - lo)

    return SketchSeeds(
        s0=np.array([h("s0", i, 2) for i in range(rows)], dtype=np.int64),
        sv=np.array([h("sv", i, 1 << 32) for i in range(rows)], dtype=np.int64),
        a=np.array([h("a", i, P31, 1) for i in range(rows)], dtype=np.int64),
        b=np.array([h("b", i, P31) for i in range(rows)], dtype=np.int64),
    )


@dataclass
class SketchSeeds:
    s0: np.ndarray  # rows; EH3 constant bit
    sv: np.ndarray  # rows; EH3 32-bit linear mask
    a: np.ndarray  # rows; CW bucket multiplier (1..P-1)
    b: np.ndarray  # rows; CW bucket offset


@dataclass
class Sketch:
    """ROWS×BUCKETS counter matrix for one join attribute of one table."""

    counters: np.ndarray  # (rows, buckets) float64
    seeds: SketchSeeds

    @property
    def self_join_size(self) -> float:
        return float(np.median((self.counters**2).sum(axis=1)))


def numpy_update(sketch: Sketch, keys: np.ndarray) -> None:
    """Reference-semantics sketch update, vectorized (driver-side twin of
    the Spark build; also the kernel inside the mapInPandas build).

    Kernel shape is dictated by measured numpy behavior on the target
    hardware: 64-bit integer multiply, stride-0 broadcast multiply, and
    large-quotient fmod are all pathological there, while flat contiguous
    float64 mul/add and int64 bitwise ops run at full speed. So: loop the 73
    estimator rows in Python; per row do flat float64 hash arithmetic with
    exact mod-by-reciprocal (products < 2^53 stay exact in float64) and an
    int64 XOR-fold parity; accumulate with one ``np.bincount`` per row."""
    s = sketch.seeds
    x_i = keys.astype(np.int64) & _MASK32
    # a*(x mod P) reaches 2^62 — beyond float64's exact 2^53 range — so
    # split x mod P into 16-bit halves: a*(hi<<16 + lo) ≡ ((a*hi mod P)<<16
    # + a*lo) mod P with every intermediate < 2^48, exact in float64.
    xm = _exact_mod(x_i.astype(np.float64), float(P31)).astype(np.int64)
    x_hi = (xm >> 16).astype(np.float64)
    x_lo = (xm & 0xFFFF).astype(np.float64)
    # pair-bit parity of (x>>1)&x&0x5555... is row-independent: hoist it
    pp = (x_i >> 1) & x_i & _PAIR_MASK
    for sh in (16, 8, 4, 2, 1):
        pp ^= pp >> sh
    pp &= 1
    a = s.a.astype(np.float64)
    b = s.b.astype(np.float64)
    for r in range(SKETCH_ROWS):
        t1 = _exact_mod(a[r] * x_hi, float(P31))
        m = _exact_mod(t1 * 65536.0 + a[r] * x_lo + b[r], float(P31))
        bucket = _exact_mod(m, float(SKETCH_BUCKETS)).astype(np.int64)
        lin = int(s.sv[r]) & x_i
        for sh in (16, 8, 4, 2, 1):
            lin ^= lin >> sh
        sign = 1.0 - 2.0 * ((int(s.s0[r]) + lin + pp) & 1)
        sketch.counters[r] += np.bincount(
            bucket, weights=sign, minlength=SKETCH_BUCKETS
        )


def _exact_mod(m: np.ndarray, p: float) -> np.ndarray:
    """m mod p for exact-integer-valued float64 m < 2^53: reciprocal-multiply
    + floor, with a one-ulp correction pass (plain ``%`` hits a slow fmod
    path for large quotients on the target CPU)."""
    r = m - np.floor(m * (1.0 / p)) * p
    r[r >= p] -= p
    r[r < 0] += p
    return r


def estimate_two_way(s1: Sketch, s2: Sketch) -> float:
    """Median over rows of bucket-wise dot product (Sketches.h:155-176)."""
    return max(0.0, float(np.median((s1.counters * s2.counters).sum(axis=1))))


def estimate_multi_way(sketches: list[Sketch]) -> float:
    """k-way product estimate (Sketches.h:178-204): bucket-wise product of
    |counters| with zeros floored to 1e-4, summed, median over rows."""
    if len(sketches) == 2:
        return estimate_two_way(sketches[0], sketches[1])
    prod = None
    for sk in sketches:
        c = np.abs(sk.counters)
        c = np.where(c == 0.0, 1e-4, c)
        prod = c if prod is None else prod * c
    return max(0.0, float(np.median(prod.sum(axis=1))))


# ---------------------------------------------------------------------------
# Distributed build
# ---------------------------------------------------------------------------


def _lit_arr(vals: np.ndarray) -> Column:
    return F.array(*[F.lit(int(v)).cast("long") for v in vals])


def build_sketches(
    df: DataFrame, col_seeds: dict[str, SketchSeeds]
) -> tuple[int, dict[str, Sketch]]:
    """One distributed pass over ``df``: returns (row_count, sketch per
    join column). The analog of the reference's kFAGMS_SKETCH pseudo-
    aggregate that counts survivors AND updates sketches in one kernel
    (RelAlgExecutor.cpp:1623 getFilteredCountAllAndUpdateSketch).

    Plan shape: project join cols → explode ROWS indices → per-column
    bucket/sign bit arithmetic (codegen) → partial-agg groupBy. Shuffle
    volume is bounded by COLS×ROWS×BUCKETS regardless of |df|.
    """
    cols = list(col_seeds)
    proj = df.select(*[F.col(c).cast("long").alias(f"_k{j}") for j, c in enumerate(cols)])
    exploded = proj.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(SKETCH_ROWS - 1))).alias("r")
    )

    per_col = []
    for j, c in enumerate(cols):
        s = col_seeds[c]
        x = F.col(f"_k{j}").bitwiseAND(F.lit(_MASK32))
        a = F.element_at(_lit_arr(s.a), F.col("r") + 1)
        b = F.element_at(_lit_arr(s.b), F.col("r") + 1)
        sv = F.element_at(_lit_arr(s.sv), F.col("r") + 1)
        s0 = F.element_at(_lit_arr(s.s0), F.col("r") + 1)
        bucket = ((a * (x % F.lit(P31)) + b) % F.lit(P31)) % F.lit(SKETCH_BUCKETS)
        parity = (
            s0
            + F.bit_count(sv.bitwiseAND(x))
            + F.bit_count(
                F.shiftright(x, 1).bitwiseAND(x).bitwiseAND(F.lit(_PAIR_MASK))
            )
        ) % F.lit(2)
        sign = F.lit(1) - F.lit(2) * parity
        # null join keys never join (the Arrow build drops them the same
        # way): route them to sentinel bucket -1 with sign 0 so they still
        # count as survivors but never touch a counter
        per_col.append(
            F.struct(
                F.lit(j).alias("c"),
                F.coalesce(bucket, F.lit(-1).cast("long")).alias("bucket"),
                F.coalesce(sign.cast("long"), F.lit(0).cast("long")).alias("sign"),
            )
        )

    updates = exploded.select(
        "r", F.explode(F.array(*per_col)).alias("u")
    ).select("r", F.col("u.c").alias("c"), F.col("u.bucket").alias("bucket"), F.col("u.sign").alias("sign"))

    agg = (
        updates.groupBy("c", "r", "bucket")
        .agg(F.sum("sign").alias("v"), F.count(F.lit(1)).alias("n"))
        .collect()
    )

    sketches = {c: Sketch(np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)), col_seeds[c]) for c in cols}
    count = 0
    for row in agg:
        if row["bucket"] >= 0:  # -1 = null-key sentinel: count-only
            sketches[cols[row["c"]]].counters[row["r"], row["bucket"]] = row["v"]
        if row["c"] == 0 and row["r"] == 0:
            count += row["n"]
    if not cols:
        count = df.count()
    return count, sketches


def build_sketches_arrow(
    df: DataFrame,
    col_seeds: dict[str, SketchSeeds],
    nrows_hint: int | None = None,
) -> tuple[int, dict[str, Sketch]]:
    """Arrow-batched sketch build: ``mapInPandas`` computes a per-partition
    partial counter matrix with the vectorized numpy update, the driver sums
    partials. One scan, no shuffle at all — each task ships back exactly one
    ROWS×BUCKETS matrix per join column (≈0.6 MB) regardless of partition
    size. This is the Spark analog of the reference's per-GPU-block sketch
    copies merged host-side (cuda_mapd_rt.cu:766-804, Execute.cpp:1820-1835),
    and beats the JVM groupBy build ~10× at sf0.1 (see bench notes).
    """
    cols = list(col_seeds)
    if not cols:
        return df.count(), {}
    proj = df.select(
        *[F.col(c).cast("long").alias(f"_k{j}") for j, c in enumerate(cols)]
    )
    # Partition goal: ~100k keys per task — enough to amortize the Python
    # worker round-trip, few enough tasks that collecting one 0.6 MB counter
    # blob per (task, column) stays small. Small-SF parquet often lands in
    # one partition (kernel would run single-threaded); cluster-scale inputs
    # already have plenty, so we only repartition when it pays.
    if nrows_hint is not None:
        target = max(1, min(
            df.sparkSession.sparkContext.defaultParallelism,
            -(-nrows_hint // 100_000),
        ))
        cur = proj.rdd.getNumPartitions()
        if cur < target:
            proj = proj.repartition(target)
        elif cur > 4 * target:
            proj = proj.coalesce(target)
    seeds_list = [col_seeds[c] for c in cols]

    def partial_sketches(batches):
        import pandas as pd

        # concatenate the partition's batches first: one kernel pass per
        # column over the whole partition, not 73 rows × per-10k-batch
        # ufunc overhead
        chunks: list[list[np.ndarray]] = [[] for _ in cols]
        n = 0
        for pdf in batches:
            n += len(pdf)
            for j in range(len(cols)):
                keys = pdf[f"_k{j}"].to_numpy()
                keys = keys[~pd.isna(keys)]  # null keys never join; skip
                if len(keys):
                    chunks[j].append(keys.astype(np.int64))
        partials = [
            Sketch(np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)), s) for s in seeds_list
        ]
        for j in range(len(cols)):
            if chunks[j]:
                numpy_update(partials[j], np.concatenate(chunks[j]))
        # raw little-endian bytes: ~100× cheaper through Arrow than a
        # 74k-element list column
        yield pd.DataFrame(
            {
                "c": list(range(len(cols))),
                "n": [n] * len(cols),
                "counters": [
                    p.counters.astype("<i8").tobytes() for p in partials
                ],
            }
        )

    out = proj.mapInPandas(
        partial_sketches, schema="c int, n long, counters binary"
    ).collect()

    sketches = {
        c: Sketch(np.zeros((SKETCH_ROWS, SKETCH_BUCKETS)), col_seeds[c]) for c in cols
    }
    count = 0
    for row in out:
        sketches[cols[row["c"]]].counters += np.frombuffer(
            row["counters"], dtype="<i8"
        ).reshape(SKETCH_ROWS, SKETCH_BUCKETS)
        if row["c"] == 0:
            count += row["n"]
    return count, sketches
