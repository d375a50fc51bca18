"""Measured scale sweep for the dedup/ANN operator family.

Round-6 verdict #4: the auto-width claims (auto_bits, sem_cell_bits,
simhash block bits, bloom_cell_bits) were argued and spot-measured; this
harness measures them — the pipeline-operator analog of the JOB scale-20
sweep that made the eager-count claim credible. It generates deterministic
documents/embeddings fixtures at 5k / 50k / 250k rows (10× and 50× the
sf0.1 bench corpus), runs each operator end-to-end (collect), and prints a
markdown table for SCALE.md.

The generator mirrors the driver testdata's shape (word-salad text over a
small vocabulary, ~10% planted exact duplicates, unit-ish float32[64]
embeddings) so bucket statistics behave like the bench fixtures. Numpy
RandomState is seeded — identical fixtures every run.

Usage:  python tools/scale_sweep.py [--sizes 5000,50000,250000] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector join shuffle broadcast skew salt bucket code plan cost"
).split()
LANGS = ["en", "de", "fr", "zh", "es"]

SWEEP_OPS = [
    "dedup_exact",
    "dedup_clusters_hardened",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_bloom",
    "dedup_semantic",
    "dedup_embedding_lsh",
    "sim_ann_lsh",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "text_winnowing",
    "dedup_substring_spans",
    "dedup_span_removal",
    "dedup_keep_best",
    "emb_pq_distortion",
    "sim_ann_recall",
    "emb_knn_graph",
    "text_tfidf_keywords",
    "text_bm25_mlt",
    "emb_davies_bouldin",
    "events_triangle_count",
    "events_pagerank",
]


def gen_fixture(
    out_dir: str, n_docs: int, n_vecs: int, dim: int = 64, flood_pct: int = 0
) -> None:
    """``flood_pct`` > 0 additionally plants floor(n·pct/100) byte-identical
    copies of ONE document at the front — the mirror-flood pathology the
    hardened clustering path must stay flat under (a one-stage LSH pair
    join would see C(flood,2) pairs through a single bucket)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(42)
    texts = []
    n_flood = n_docs * flood_pct // 100
    flood_text = "the same press release mirrored across ten thousand hosts " * 3
    for i in range(n_docs):
        if i < n_flood:
            texts.append(flood_text)
            continue
        if i % 10 == 3 and i > 10 + n_flood:
            texts.append(texts[i - 7])  # ~10% planted exact duplicates
            continue
        n_words = 10 + int(rng.randint(0, 50))
        words = [VOCAB[int(w)] for w in rng.randint(0, len(VOCAB), n_words)]
        texts.append(" ".join(words))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n_docs)]),
            "source": pa.array([f"src{i % 10}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    vecs = rng.randn(n_vecs, dim).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                (np.arange(n_vecs) % 8).astype(np.int32), pa.int32()
            ),
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    # events for the graph/temporal operators: user population scales with
    # n but the time range scales too, so per-hour co-purchase buckets stay
    # bounded (~100 events/hour) — the shape a real behavior log has, and
    # the property the hour-bucketed edge join's cost model assumes (the
    # repo documents hot-bucket capping for the adversarial case)
    n_events = n_docs
    n_users = max(n_events // 20, 10)
    etypes = ["view", "click", "purchase", "signup", "refund", "share"]
    ets = rng.randint(0, len(etypes), n_events)
    base_us = 1_700_000_000_000_000  # fixed epoch start, microseconds
    tss = base_us + (
        np.sort(rng.randint(0, max(n_events // 100, 1) * 3600, n_events))
        * 1_000_000
    ).astype(np.int64)
    events = pa.table(
        {
            "event_id": pa.array(range(n_events), pa.int64()),
            "ts": pa.array(tss, pa.timestamp("us")),
            "user_id": pa.array(
                rng.randint(0, n_users, n_events).astype(np.int64), pa.int64()
            ),
            "event_type": pa.array([etypes[int(i)] for i in ets]),
            "value": pa.array(
                np.round(rng.rand(n_events) * 100, 2), pa.float64()
            ),
            "props": pa.array(['{"k": 1}'] * n_events),
        }
    )
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,50000,250000")
    ap.add_argument("--out", default="/tmp/compass_scale_sweep")
    ap.add_argument("--ops", default=",".join(SWEEP_OPS))
    ap.add_argument("--flood", type=int, default=0,
                    help="plant this %% of docs as one identical flood")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    ops = args.ops.split(",")

    from compass_query_optimizer_spark.registry import all_queries
    from compass_query_optimizer_spark.session import get_spark

    spark = get_spark(
        app_name="scale-sweep", extra_conf={"spark.ui.enabled": "false"}
    )
    specs = all_queries()

    dirs = {}
    for n in sizes:
        tag = f"n{n}" if not args.flood else f"n{n}_flood{args.flood}"
        d = os.path.join(args.out, tag)
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            t0 = time.time()
            gen_fixture(d, n_docs=n, n_vecs=n, flood_pct=args.flood)
            print(f"# generated {d} in {time.time() - t0:.1f}s")
        dirs[n] = d

    # one warmup query absorbs JVM/codegen cold start so the smallest
    # size isn't misread as expensive
    specs["dedup_exact"].build(spark, dirs[sizes[0]]).collect()

    results: dict[str, dict[int, float]] = {}
    rows_out: dict[str, dict[int, int]] = {}
    for op in ops:
        results[op] = {}
        rows_out[op] = {}
        for n in sizes:
            t0 = time.time()
            out = specs[op].build(spark, dirs[n]).collect()
            results[op][n] = time.time() - t0
            rows_out[op][n] = len(out)
            print(
                f"# {op} n={n}: {results[op][n]:.1f}s rows={len(out)}",
                flush=True,
            )

    hdr = " | ".join(f"{n//1000}k" for n in sizes)
    print(f"\n| operator | {hdr} | growth {sizes[0]//1000}k→{sizes[-1]//1000}k |")
    print("|---|" + "---|" * (len(sizes) + 1))
    for op in ops:
        cells = " | ".join(f"{results[op][n]:.1f} s" for n in sizes)
        g = results[op][sizes[-1]] / max(results[op][sizes[0]], 1e-9)
        print(f"| `{op}` | {cells} | {g:.1f}× over {sizes[-1]//sizes[0]}× rows |")


if __name__ == "__main__":
    main()
