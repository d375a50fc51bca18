"""The correctness driver samples a PREFIX of queries() dict order (50
entries since round 4), so the registry's ordering is part of the driver
contract: operators that still lack driver evidence must sit in the prefix,
and the ordering must stay a clean permutation of the registry.

Round 11 retires the LAST pre-r7 driver evidence: the prefix leads with the
13 deferred r6-evidence workload queries (q21..q33, queued by round 10),
then everything changed in round 11 (ivfpq auto-K, scratch-path hardening,
the compass chain's collapse-frame store + measures-branch probe), then 31
of the 46 remaining r7-evidence entries, closing with job_corpus as the
113-count differential over the changed planner. The 15 r7 entries that
didn't fit are the round-12 queue.
"""

from __future__ import annotations

import glob
import json
import os

from compass_query_optimizer_spark.registry import _SAMPLE_PRIORITY, all_queries

# entries new or changed in round 11 — each needs a fresh driver row
CHANGED_THIS_ROUND = {
    "sim_ann_ivfpq",                  # auto-sqrt(N) coarse K + packed argmin
    "sim_ann_persisted",              # scratch-path hardening
    "bucket_clustered_scan",          # scratch-path hardening
    "compass_count_multijoin",        # chain: frame store + probe fix
    "compass_avg_multijoin",          # measures branch: NDV probe landed
    "job_corpus",                     # 113-count differential: planner gate
}

# the round-10 rotation's explicit queue: the 13 r6-evidence workload
# queries that MUST lead the round-11 prefix (the last pre-r7 evidence)
R6_QUEUE = {
    "q21_cross_join_small",
    "q22_math_functions",
    "q23_events_rollup",
    "q24_sessionization",
    "q25_window_functions",
    "q26_set_operations",
    "q27_grouping_rollup",
    "q28_not_exists_anti_join",
    "q29_full_outer_join",
    "q30_pivot",
    "q31_market_basket",
    "q32_correlated_agg_subquery",
    "q33_lateral_topn",
}

# r7-evidence entries deferred to round 12 (the 50 slots ran out), all
# re-proven by the local differential (tests/test_oracle.py) every pytest
# run. They sit directly after the prefix so the next rotation reaches
# them first.
NEXT_ROUND_QUEUE = {
    "q37_listagg",
    "sim_ann_ivf",
    "sim_ann_pq",
    "stream_approx_distinct",
    "stream_sliding_count",
    "text_curriculum_stages",
    "text_epoch_budget",
    "text_fingerprint",
    "text_hash_classifier",
    "text_kl_drift",
    "text_ngram_novelty",
    "text_quality",
    "text_source_lang_entropy",
    "text_tokens",
    "text_weighted_sample",
}


def _driver_sampled() -> set:
    """Every query name with a driver row in any recorded round."""
    root = os.path.join(os.path.dirname(__file__), "..")
    names: set = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        names |= set(json.load(open(path)))
    return names


def _latest_evidence() -> dict:
    """name -> most recent round with a driver row."""
    root = os.path.join(os.path.dirname(__file__), "..")
    latest: dict = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_priority_names_all_registered():
    names = set(all_queries())
    unknown = [n for n in _SAMPLE_PRIORITY if n not in names]
    assert not unknown, f"_SAMPLE_PRIORITY names not in registry: {unknown}"
    assert len(set(_SAMPLE_PRIORITY)) == len(_SAMPLE_PRIORITY), "duplicates"


def test_prefix_serves_the_evidence_gap():
    """The 50-entry prefix must (a) lead with the queued r6 tail, (b)
    contain everything new/changed in round 11, (c) spend every other slot
    on the stalest driver evidence — nothing already green in the latest
    recorded round (r10) may consume a slot unless round 11 changed it."""
    prefix = list(all_queries())[:50]
    missing = (R6_QUEUE | CHANGED_THIS_ROUND) - set(prefix)
    assert not missing, f"round-11 must-sample entries outside the prefix: {missing}"
    assert set(prefix[:13]) == R6_QUEUE, prefix[:13]

    # pinned to the round this rotation was designed against (re-pin when
    # re-rotating the priority list next round)
    root = os.path.join(os.path.dirname(__file__), "..")
    latest = set(json.load(open(os.path.join(root, "CORRECTNESS_r10.json"))))
    rotated = [n for n in prefix if n not in CHANGED_THIS_ROUND]
    stale = [n for n in rotated if n in latest]
    assert not stale, (
        f"prefix slots wasted on entries already green last round: {stale}"
    )


def test_prefix_retires_the_pre_r7_tail():
    """After this round no registered entry may sit on pre-r7 driver
    evidence at all: the prefix must contain every entry whose latest
    evidence predates round 7 — the round-11 rotation is the one that
    finishes the multi-round debt."""
    latest = _latest_evidence()
    registered = set(all_queries())
    stale = {n for n, r in latest.items() if r < 7 and n in registered}
    prefix = set(list(all_queries())[:50])
    left_out = stale - prefix
    assert not left_out, f"pre-r7-evidence entries missing from the prefix: {left_out}"


def test_every_registered_query_has_driver_evidence_or_prefix_slot():
    """No registered query may be unsampled across all recorded rounds AND
    outside the sampling prefix — that combination means it can never earn
    driver evidence."""
    names = list(all_queries())
    sampled = _driver_sampled()
    orphans = [n for n in names if n not in sampled and n not in names[:50]]
    assert not orphans, f"queries that can never be sampled: {orphans}"


def test_deferred_queue_sits_directly_after_the_prefix():
    """The round-12 queue (15 deferred r7 entries) must occupy slots 51-65
    so the next rotation reaches it before anything with fresher
    evidence."""
    names = list(all_queries())
    assert set(names[50:65]) == NEXT_ROUND_QUEUE, (
        "round-12 queue not immediately after the prefix: "
        f"{names[50:65]}"
    )


def test_job_corpus_closes_the_prefix():
    """job_corpus is the most expensive single entry (113-query count
    differential) AND the gate over the round-11 collapse-frame store —
    it must be in the prefix, last, so the cheaper entries are never
    starved by it."""
    names = list(all_queries())
    assert names[49] == "job_corpus", names[45:50]


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
