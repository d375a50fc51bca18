"""The correctness driver samples a PREFIX of queries() dict order (50
entries in round 4), so the registry's ordering is part of the driver
contract: operators that still lack driver evidence must sit in the prefix,
and the ordering must stay a clean permutation of the registry."""

from __future__ import annotations

import glob
import json
import os

from compass_query_optimizer_spark.registry import _SAMPLE_PRIORITY, all_queries

# entries new or changed in round 8 — each needs a fresh driver row this
# round, so they lead the prefix
CHANGED_THIS_ROUND = {
    "compass_count_distinct_auto",    # new: plan-time carrier routing
    "compass_count_distinct_bitmap",  # new: packed-bitmap carrier
    "dedup_clusters_hardened",        # new: composed hardened clustering
    "compass_grouped_distinct_auto",  # new: grouped auto-routed distinct
    "compass_sum_distinct",           # new: SUM(DISTINCT) measure class
    "events_attribution",             # new: attribution models
    "q38_qualify",                    # new: QUALIFY surface
    "emb_random_projection",          # new: JL projection audit
    "q39_range_frames",               # new: RANGE-interval frames
    "q40_percentile_within_group",    # new: ordered-set percentiles
    "stream_late_data_drop",          # new: watermark drop proof
    "text_gopher_rules",              # new: Gopher rule battery
    "docs_dataset_fingerprint",       # new: corpus fingerprint
    "mm_scene_change",                # new: scene-change detection
    "mm_audio_energy",                # new: windowed audio energy
    "events_forecast_baseline",       # new: forecast backtest
    "text_kl_drift",                  # regex-tokenizer parity fix
    "text_hash_classifier",           # regex-tokenizer parity fix
    "text_curriculum_stages",         # regex-tokenizer parity fix
    "text_epoch_budget",              # regex-tokenizer parity fix
    "emb_label_centroid_sim",         # decimal(38,0) product widening
    "sim_ann_ivfpq",                  # tiny-corpus loud guard
    # second/third batch of round-8 additions
    "text_tfidf_keywords",            # new: integer-exact tf-idf keywords
    "text_bm25_mlt",                  # new: fixed-point BM25 retrieval
    "events_triangle_count",          # new: degree-oriented triangles
    "events_pagerank",                # new: exact integer PageRank
    "emb_davies_bouldin",             # new: cluster-validity index
    "q45_window_distinct_count",      # new: windowed DISTINCT surface
    "q46_ignore_nulls_fill",          # new: IGNORE NULLS surface
    "dedup_containment",              # new: asymmetric containment dedup
    "emb_knn_graph",                  # new: LSH-bucketed k-NN graph
    "q47_unpivot",                    # new: UNPIVOT surface
    "stream_minhash_dedup",           # new: streaming near-dup dedup
    "sim_hybrid_rrf",                 # new: hybrid RRF retrieval
    "events_ab_test",                 # new: A/B z-test readout
    "privacy_t_closeness",            # new: t-closeness release gate
    "sim_ann_incremental",            # new: standing-IVF arrival probe
    "mm_bmp_decode",                  # new: BMP native decode
    "text_bpe_train",                 # new: iterative BPE merge loop
    "events_funnel_latency",          # new: conversion-delay percentiles
}

# Never-sampled entries deliberately queued for the round-9 prefix: the
# driver samples 50 entries per round and round 8 registered 53 new ones.
# Queue policy: hold back the thin SQL-surface entries (single-scan
# window/Expand plans the local differential covers every run); every
# operator with new machinery keeps a sampled slot.
NEXT_ROUND_QUEUE = {
    "q45_window_distinct_count",
    # percentile-over-user-reduction readout; exact PERCENTILE_DISC is
    # already sampled via q40, and the funnel reduction via events_funnel
    "events_funnel_latency",
    "q46_ignore_nulls_fill",
    "q47_unpivot",
    # single-rollup arithmetic readout; its degenerate-arm guard is
    # exercised by the local differential at every SF
    "events_ab_test",
    # the fourth native decoder: siblings mm_image_decode/mm_audio_decode/
    # mm_scene_change are sampled, the BMP permutation roundtrip is
    # unit-tested incl. padded widths (test_multimodal_stub)
    "mm_bmp_decode",
}

# Changed entries that do NOT get a prefix slot this round: the second
# batch of new operators plus the r4-evidence retirement filled all 50.
# These five are tokenizer/widening PARITY fixes whose implementation and
# oracle moved together; each is re-proven by tests/test_advice_r8.py and
# the full local differential (tests/test_oracle.py), and each keeps its
# r7 green driver row. sim_ann_ivfpq (the one fix that changed runtime
# BEHAVIOR — the tiny-corpus loud guard) keeps its prefix slot.
HELD_OUT_FIXES = {
    "text_kl_drift",
    "text_hash_classifier",
    "text_curriculum_stages",
    "text_epoch_budget",
    "emb_label_centroid_sim",
    # the third new-operator batch consumed the last prefix slots; the
    # tiny-corpus guard only changes behavior on corpora below IVF_K rows
    # (loud failure instead of a vacuous empty result) and is pinned by
    # tests/test_advice_r8.py::test_ivfpq_tiny_corpus_fails_loudly
    "sim_ann_ivfpq",
}


def _driver_sampled() -> set:
    """Every query name with a driver row in any recorded round."""
    root = os.path.join(os.path.dirname(__file__), "..")
    names: set = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        names |= set(json.load(open(path)))
    return names


def test_priority_names_all_registered():
    names = set(all_queries())
    unknown = [n for n in _SAMPLE_PRIORITY if n not in names]
    assert not unknown, f"_SAMPLE_PRIORITY names not in registry: {unknown}"
    assert len(set(_SAMPLE_PRIORITY)) == len(_SAMPLE_PRIORITY), "duplicates"


def test_prefix_serves_the_evidence_gap():
    """The 50-entry prefix must (a) re-sample everything changed this
    round, (b) spend its remaining slots on entries whose newest driver
    evidence is oldest — concretely, every prefix slot not taken by a
    changed entry or job_corpus goes to an entry that was NOT sampled in
    the latest recorded round."""
    prefix = list(all_queries())[:50]
    missing = (CHANGED_THIS_ROUND - HELD_OUT_FIXES - NEXT_ROUND_QUEUE) - set(
        prefix
    )
    assert not missing, f"round-8-changed entries outside the prefix: {missing}"
    # the held-out fixes must still be covered by their dedicated gate
    import os.path as _p

    assert _p.exists(
        _p.join(_p.dirname(__file__), "test_advice_r8.py")
    ), "held-out fixes lost their dedicated local gate"

    # pinned to the round this rotation was designed against (re-pin when
    # re-rotating the priority list next round)
    root = os.path.join(os.path.dirname(__file__), "..")
    latest = set(json.load(open(os.path.join(root, "CORRECTNESS_r07.json"))))
    rotated = [
        n for n in prefix
        if n not in CHANGED_THIS_ROUND and n != "job_corpus"
    ]
    stale = [n for n in rotated if n in latest]
    assert not stale, (
        f"prefix slots wasted on entries already green last round: {stale}"
    )


def test_every_registered_query_has_driver_evidence_or_prefix_slot():
    """No registered query may be unsampled across all recorded rounds AND
    outside the sampling prefix — that combination means it can never earn
    driver evidence."""
    names = list(all_queries())
    sampled = _driver_sampled()
    orphans = [n for n in names if n not in sampled and n not in names[:50]]
    # entries in the explicit round-9 queue are allowed to wait one round —
    # they must sit immediately after the prefix so the next rotation
    # reaches them first
    stragglers = [n for n in orphans if n not in NEXT_ROUND_QUEUE]
    assert not stragglers, f"queries that can never be sampled: {stragglers}"
    for n in orphans:
        assert n in names[:60], f"queued entry {n} too deep for round 9"


def test_order_is_a_permutation_of_the_registry():
    names = list(all_queries())
    assert len(names) == len(set(names))
    assert set(names) == set(all_queries())


def test_every_builder_has_the_query_signature():
    """A misplaced @query decorator can silently register a helper whose
    signature isn't (spark, sf_dir) — the round-8 flood sweep caught one.
    Pin it structurally: every registered builder must take exactly two
    positional parameters named like the contract."""
    import inspect

    for name, spec in all_queries().items():
        params = list(inspect.signature(spec.build).parameters)
        assert len(params) == 2, (name, params)
        assert params[0] == "spark" and params[1] in ("sf_dir",), (name, params)
