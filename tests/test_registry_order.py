"""The correctness driver samples a PREFIX of queries() dict order (50
entries since round 4), so the registry's ordering is part of the driver
contract: operators that still lack driver evidence must sit in the prefix,
and the ordering must stay a clean permutation of the registry.

Round 12 rotation: the prefix leads with everything whose execution path
changed in round 12 (fused ivfpq assign+encode, expression-string
rewrites, lazy-checkpoint CC loops, the pagerank single-DAG loop, the
codegen-cache conf behind text_winnowing's drift), then the six entries
whose round-11 Arrow conversions landed AFTER that round's prefix froze
(the r11 verdict's one named evidence gap), then the 15-entry r7 queue
round 11 left, then the stalest remaining evidence (r8) up to 50 slots.
The r8 remainder sits directly after the prefix as the round-13 queue.
"""

from __future__ import annotations

import glob
import json
import os

from compass_query_optimizer_spark.registry import _SAMPLE_PRIORITY, all_queries

# entries whose execution path changed in round 12 — each needs a fresh
# driver row over the new path
CHANGED_THIS_ROUND = {
    "sim_ann_ivfpq",                  # fused Arrow assign+encode
    "emb_random_projection",          # expression-string rewrite
    "dedup_simhash",                  # expression-string rewrite
    "events_pagerank",                # single-DAG iteration loop
    "dedup_clusters",                 # lazy-checkpoint CC loop
    "dedup_clusters_star",            # lazy-checkpoint star CC
    "dedup_clusters_twostage",        # lazy-checkpoint CC loop
    "dedup_clusters_hardened",        # lazy-checkpoint star CC
    "dedup_semantic",                 # bucket-verify zero-norm guard
    "text_winnowing",                 # codegen-cache drift fix evidence
}

# round-11 Arrow conversions that missed the r11 oracle sample (the r11
# prefix froze before commits 28c428e..b3b504f landed): the driver's
# oracle has never seen their Arrow-path output — r11 verdict item #3
R11_ARROW_GAP = {
    "sim_ann_ivf",
    "sim_ann_pq",
    "sim_ann_lsh",
    "emb_knn_graph",
    "dedup_embedding_lsh",
    "sim_ann_incremental",
}

# the r7-evidence queue round 11 left (minus sim_ann_ivf/sim_ann_pq,
# promoted into R11_ARROW_GAP above)
R7_QUEUE = {
    "q37_listagg",
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

# r8-evidence entries deferred to round 13 (the 50 slots ran out), all
# re-proven by the local differential (tests/test_oracle.py) every pytest
# run. They sit directly after the prefix so the next rotation reaches
# them first.
NEXT_ROUND_QUEUE = {
    "events_triangle_count",
    "mm_audio_energy",
    "mm_phash_dedup",
    "mm_scene_change",
    "pipeline_multimodal",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_t_closeness",
    "q38_qualify",
    "q39_range_frames",
    "q40_percentile_within_group",
    "q41_pivot",
    "q42_recursive_cte",
    "q43_grouping_sets",
    "q44_session_window",
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
    """The 50-entry prefix must (a) contain everything changed in round
    12, (b) contain the six r11 Arrow conversions the r11 sample missed,
    (c) contain the whole r7 queue, and (d) spend every other slot on the
    stalest driver evidence — nothing already green in the latest recorded
    round (r11) may consume a slot unless round 12 changed it."""
    prefix = list(all_queries())[:50]
    missing = (CHANGED_THIS_ROUND | R11_ARROW_GAP | R7_QUEUE) - set(prefix)
    assert not missing, f"round-12 must-sample entries outside the prefix: {missing}"

    # pinned to the round this rotation was designed against (re-pin when
    # re-rotating the priority list next round)
    root = os.path.join(os.path.dirname(__file__), "..")
    latest = set(json.load(open(os.path.join(root, "CORRECTNESS_r11.json"))))
    rotated = [n for n in prefix if n not in CHANGED_THIS_ROUND]
    stale = [n for n in rotated if n in latest]
    assert not stale, (
        f"prefix slots wasted on entries already green last round: {stale}"
    )


def test_prefix_retires_the_r7_tail():
    """After this rotation no registered entry may sit on pre-r8 driver
    evidence: the prefix must contain every entry whose latest evidence
    predates round 8."""
    latest = _latest_evidence()
    registered = set(all_queries())
    stale = {n for n, r in latest.items() if r < 8 and n in registered}
    prefix = set(list(all_queries())[:50])
    left_out = stale - prefix
    assert not left_out, f"pre-r8-evidence entries missing from the prefix: {left_out}"


def test_every_registered_query_has_driver_evidence_or_prefix_slot():
    """No registered query may be unsampled across all recorded rounds AND
    outside the sampling prefix — that combination means it can never earn
    driver evidence."""
    names = list(all_queries())
    sampled = _driver_sampled()
    orphans = [n for n in names if n not in sampled and n not in names[:50]]
    assert not orphans, f"queries that can never be sampled: {orphans}"


def test_deferred_queue_sits_directly_after_the_prefix():
    """The round-13 queue (15 deferred r8 entries) must occupy slots 51-65
    so the next rotation reaches it before anything with fresher
    evidence."""
    names = list(all_queries())
    assert set(names[50:65]) == NEXT_ROUND_QUEUE, (
        "round-13 queue not immediately after the prefix: "
        f"{names[50:65]}"
    )


def test_changed_entries_lead_the_prefix():
    """The entries whose execution path changed this round carry the
    highest correctness risk — they must head the prefix so a truncated
    sample still covers them."""
    names = list(all_queries())
    assert set(names[:10]) == CHANGED_THIS_ROUND, names[:10]
    assert set(names[10:16]) == R11_ARROW_GAP, names[10:16]


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
