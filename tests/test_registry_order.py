"""The correctness driver samples a PREFIX of queries() dict order (50
entries in round 4), so the registry's ordering is part of the driver
contract: operators that still lack driver evidence must sit in the prefix,
and the ordering must stay a clean permutation of the registry."""

from __future__ import annotations

from compass_query_optimizer_spark.registry import _SAMPLE_PRIORITY, all_queries

# every entry with no driver sample in CORRECTNESS_r01..r04 — these need
# their first hard evidence, so they must be reachable by a 50-entry prefix
NEVER_SAMPLED_THROUGH_R4 = {
    "dedup_embedding_lsh", "text_stratified_sample", "text_pack_sequences",
    "pipeline_curate", "text_mixture_sample", "text_vocabulary",
    "text_source_cap", "text_quality_percentile", "text_percentile_approx",
    "text_ngram_profile", "text_length_histogram", "text_repetition",
    "text_contamination", "emb_kmeans_iter", "emb_quantize_int8",
    "emb_standardize", "stream_enrich_join", "stream_dedup_events",
    "stream_stream_join", "stream_session_window",
}


def test_priority_names_all_registered():
    names = set(all_queries())
    unknown = [n for n in _SAMPLE_PRIORITY if n not in names]
    assert not unknown, f"_SAMPLE_PRIORITY names not in registry: {unknown}"
    assert len(set(_SAMPLE_PRIORITY)) == len(_SAMPLE_PRIORITY), "duplicates"


def test_unsampled_entries_fit_driver_prefix():
    prefix = list(all_queries())[:50]
    missing = NEVER_SAMPLED_THROUGH_R4 - set(prefix)
    assert not missing, f"never-sampled entries outside the prefix: {missing}"
    # the one round-4 red row must get re-sampled after its oracle fix
    assert "events_variant_extract" in prefix


def test_order_is_a_permutation_of_the_registry():
    names = list(all_queries())
    assert len(names) == len(set(names))
    assert set(names) == set(all_queries())
