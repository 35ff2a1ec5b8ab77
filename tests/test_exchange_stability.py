"""r4-verdict #6: N-run hash-stability sweep over EVERY query that
crosses the manual hash exchange (`ops.bucket_map_groups`) — the class
whose per-bucket fn sees its group's rows in nondeterministic ORDER
across runs (block arrival order is scheduler-dependent), so any
order-sensitive fn (unsorted "first", float accumulation, positional
tie-break) shows up as a value-hash flip.

The user list is DISCOVERED, not curated: tools/find_exchange_users.py
runs the full registry at sf0.001 with the `ops._exchange_spy` hook set
and prints every crossing query.  Re-run it after adding pipelines and
refresh _EXCHANGE_USERS; the spy-based consistency test below fails
loudly if a NEW exchange user is registered without being listed here
(cheap: it inspects the priority window only — the full discovery run
is the tool's job).

Default run: 2 runs per query (a flip between two scheduler-dependent
executions was how full_outer_join_sides manifested in r3/r4).  Set
EXCHANGE_STABILITY_RUNS to raise.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest

# output of tools/find_exchange_users.py at sf0.001 (r5 registry, 335
# queries -> 93 exchange users)
_EXCHANGE_USERS = [
    "abandoned_clicks",
    "adaptive_recrawl_schedule",
    "anchor_text_per_host",
    "attribution_first_touch",
    "attribution_position_based",
    "bigram_logprob_docs",
    "bigram_next_word_accuracy",
    "boilerplate_remove_docs",
    "boilerplate_stats_by_source",
    "boolean_retrieval_docs",
    "bpe_encode_docs",
    "bpe_train_merges",
    "cap_docs_per_source",
    "ccnet_perplexity_buckets",
    "cep_sequence_matches",
    "classifier_agreement_kappa",
    "clustering_coeff_graph",
    "cohort_ltv_curve",
    "concat_token_blocks",
    "containment_dup_pairs",
    "cross_corpus_decontaminate",
    "data_quality_checks",
    "dedup_keep_best",
    "dedup_keep_canonical",
    "dup_cluster_size_hist",
    "entity_resolution_parts",
    "event_trigram_paths",
    "events_debounce",
    "events_ewma_user",
    "events_gaps_islands",
    "events_hampel_outliers",
    "events_interarrival_hist",
    "events_interval_selfjoin",
    "events_ks_test",
    "events_lag_features",
    "events_mannwhitney",
    "events_max_drawdown",
    "events_rolling_median",
    "frequent_brand_triples",
    "frequent_part_pairs",
    "full_outer_join_sides",
    "funnel_time_to_convert",
    "fuzzy_join_names",
    "gdpr_delete_events",
    "hapax_share_by_source",
    "heaps_vocab_growth",
    "host_assortativity",
    "host_cocitation_pairs",
    "host_reciprocity",
    "inverted_index_roundtrip",
    "item_item_cosine_topk",
    "kaplan_meier_retention",
    "keyness_terms_by_source",
    "kneser_ney_logprob_docs",
    "line_dedup_docs",
    "lsh_near_dup_pairs",
    "media_audio_dup_pairs",
    "media_phash_dedup_keep",
    "media_phash_dup_pairs",
    "merge_upsert_customers",
    "nb_langid_confusion",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "ngram_novelty_docs",
    "orders_median_gap_days",
    "pagination_chains",
    "pdf_image_phash_dedup_keep",
    "phrase_search_top_bigram",
    "rank_dense_rank_orders",
    "resolve_redirect_chains",
    "resource_allocation_linkpred",
    "rfm_user_scores",
    "rolling_distinct_users_1h",
    "sample_per_lang_bottomk",
    "scd2_as_of_state",
    "scd2_priority_history",
    "session_conversion_by_entry",
    "simhash_near_dup_pairs",
    "snapshot_content_diff",
    "sorted_neighborhood_pairs",
    "source_dup_report",
    "source_vocab_js",
    "source_vocab_kl",
    "span_dup_stats",
    "spearman_qty_price",
    "split_leakage_report",
    "substring_dedup_docs",
    "term_burstiness",
    "textrank_keywords",
    "tfidf_top_terms",
    "triangle_count_graph",
    "unigram_logprob_docs",
    "unigram_tok_train",
    "unigram_tokenize_docs",
    "user_overlap_by_type",
    "vocab_top_words",
    "word_cooccur_pmi",
    "zipf_slope_vocab",
]

_N_RUNS = int(os.environ.get("EXCHANGE_STABILITY_RUNS", "2"))


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    kinds = ",".join(f"{c}:{df[c].dtype.kind}" for c in df.columns)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    body = kinds + "\n" + df.to_csv(index=False, float_format="%.6g")
    return hashlib.sha256(body.encode()).hexdigest()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, (rd.Dataset, pa.Table)):
        return res.to_pandas()
    return pd.DataFrame(res)


@pytest.mark.parametrize("name", _EXCHANGE_USERS)
def test_exchange_user_hash_stable(name, sf_tiny):
    from document_ai_ray.pipelines import registry

    fn = registry.queries()[name]
    hashes = {_value_hash(_to_pandas(fn(sf_tiny))) for _ in range(_N_RUNS)}
    assert len(hashes) == 1, f"{name}: nondeterministic across {_N_RUNS} runs"


def test_exchange_spy_hook_exists():
    """The discovery tool depends on the `_exchange_spy` hook staying
    wired inside bucket_map_groups; pin it."""
    import inspect

    from document_ai_ray.pipelines import ops

    assert hasattr(ops, "_exchange_spy")
    src = inspect.getsource(ops.bucket_map_groups)
    assert "_exchange_spy" in src
