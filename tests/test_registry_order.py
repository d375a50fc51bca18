"""The correctness driver samples a PREFIX of queries() dict order (50
entries in round 4), so the registry's ordering is part of the driver
contract: operators that still lack driver evidence must sit in the prefix,
and the ordering must stay a clean permutation of the registry.

Round 9 is the evidence-rotation round the last two verdicts asked for:
the prefix spends its slots on (a) the six round-8 entries the driver
never reached, (b) entries new or plan-changed in round 9, (c) the entire
r4-evidence tail, (d) 35 of the 45 r5-evidence entries. The 10 deferred
r5 entries are single-scan text profiles queued first for round 10.
"""

from __future__ import annotations

import glob
import json
import os

from compass_query_optimizer_spark.registry import _SAMPLE_PRIORITY, all_queries

# entries new or plan-changed in round 9 — each needs a fresh driver row
CHANGED_THIS_ROUND = {
    "skew_salted_join",               # new: salted hot-key join gate
    "bucket_clustered_scan",          # new: clustered-write round-trip
    "mm_resize_roundtrip",            # new: nearest-neighbor resize gate
    "sim_ann_incremental",            # standing-fold argmin rewrite
}

# round-8 entries that never got a driver row (the 50-slot prefix ended
# before them) — they lead the round-9 prefix unconditionally
NEVER_SAMPLED = {
    "events_funnel_latency",
    "q45_window_distinct_count",
    "q46_ignore_nulls_fill",
    "q47_unpivot",
    "events_ab_test",
    "mm_bmp_decode",
}

# r5-evidence entries deferred to round 10 (the 50 slots ran out): all are
# single-scan text profiles with 4-rounds-green history, re-proven by the
# local differential (tests/test_oracle.py) every run. They sit directly
# after the prefix so the round-10 rotation reaches them first.
NEXT_ROUND_QUEUE = {
    "text_chunk",
    "text_langid_confusion",
    "text_length_histogram",
    "text_ngram_profile",
    "text_percentile_approx",
    "text_quality_percentile",
    "text_source_cap",
    "text_vocabulary",
    "text_zipf_coverage",
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
    """The 50-entry prefix must (a) lead with the never-sampled round-8
    entries and everything new/changed in round 9, (b) spend every other
    slot on the stalest driver evidence — nothing already green in the
    latest recorded round (r8) may consume a slot."""
    prefix = list(all_queries())[:50]
    missing = (NEVER_SAMPLED | CHANGED_THIS_ROUND) - set(prefix)
    assert not missing, f"round-9 must-sample entries outside the prefix: {missing}"

    # pinned to the round this rotation was designed against (re-pin when
    # re-rotating the priority list next round)
    root = os.path.join(os.path.dirname(__file__), "..")
    latest = set(json.load(open(os.path.join(root, "CORRECTNESS_r08.json"))))
    rotated = [n for n in prefix if n not in CHANGED_THIS_ROUND]
    stale = [n for n in rotated if n in latest]
    assert not stale, (
        f"prefix slots wasted on entries already green last round: {stale}"
    )


def test_prefix_retires_the_pre_r6_tail():
    """After this round no registered entry may sit on pre-r6 driver
    evidence except the explicitly queued round-10 text profiles: the
    prefix must contain every r4-evidence entry and every r5-evidence
    entry outside NEXT_ROUND_QUEUE."""
    root = os.path.join(os.path.dirname(__file__), "..")
    latest: dict = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    registered = set(all_queries())
    stale = {n for n, r in latest.items() if r < 6 and n in registered}
    prefix = set(list(all_queries())[:50])
    left_out = stale - prefix - NEXT_ROUND_QUEUE
    assert not left_out, f"pre-r6-evidence entries missing from the prefix: {left_out}"


def test_every_registered_query_has_driver_evidence_or_prefix_slot():
    """No registered query may be unsampled across all recorded rounds AND
    outside the sampling prefix — that combination means it can never earn
    driver evidence."""
    names = list(all_queries())
    sampled = _driver_sampled()
    orphans = [n for n in names if n not in sampled and n not in names[:50]]
    assert not orphans, f"queries that can never be sampled: {orphans}"


def test_deferred_queue_sits_directly_after_the_prefix():
    """The round-10 queue must occupy slots 51-59 so the next rotation
    reaches it before anything with fresher evidence."""
    names = list(all_queries())
    assert set(names[50:59]) == NEXT_ROUND_QUEUE, (
        "round-10 queue not immediately after the prefix: "
        f"{names[50:59]}"
    )


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
