"""Query catalog: every operator from SURVEY.md §2 (plus the LLM-pipeline
operators) exposed as a named query over the driver's TPC-H-ish tables,
each paired with an ANSI-SQL oracle that DuckDB can run.

Registry contract (consumed by ``__spark_entry__.py``):
- ``QUERIES[name].fn(spark, sf_dir) -> DataFrame``
- ``QUERIES[name].oracle`` — equivalent SQL, or None for non-SQL-expressible
  operators (the driver then records a weaker rows-only check).

Determinism conventions (both sides MUST follow them or value-hashes drift):
- money/measure sums go through ``decimal(18,2)``/``decimal(18,6)`` so
  distributed summation order cannot change results; final numeric columns
  are cast to DOUBLE (exact decimal→double, identical bits in both engines);
- outputs of transcendental functions (ln, log1p, …) are rounded to 6 d.p.
  — BUT for transcendental-heavy models (thousands of entries, where some
  value eventually lands within an ulp of a rounding boundary) use the
  engine-portable ratio log (``functions/portable_math.py``): libm ln
  differs across engines in the last ulp (observed: ln(3/29));
- a mean of a decimal sum divided by an integer hits EXACT round-half
  boundaries by construction, and ROUND(double) is tie-divergent across
  engines — emit such means at integer micro-scale with explicit
  round-half-away integer arithmetic ((2s+n) div 2n);
- every array output is deterministically sorted AND '|'-serialized;
- no raw TIMESTAMP outputs (cast to DATE or string);
- every ranking has a unique tiebreak key;
- IEEE-exact operations (+ - * / sqrt on identical operands, integer ops,
  md5) need no scaffolding — they are bit-identical everywhere.
"""

from __future__ import annotations

from platform_etl_backend_spark.catalog.registry import QUERIES, QuerySpec, register

# Import for side effects: each module registers its queries.
from platform_etl_backend_spark.catalog import relational  # noqa: E402,F401
from platform_etl_backend_spark.catalog import events  # noqa: E402,F401
from platform_etl_backend_spark.catalog import graphs  # noqa: E402,F401
from platform_etl_backend_spark.catalog import olap  # noqa: E402,F401
from platform_etl_backend_spark.catalog import multimodal  # noqa: E402,F401
from platform_etl_backend_spark.catalog import text  # noqa: E402,F401
from platform_etl_backend_spark.catalog import vectors  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window ordering. The correctness harness verifies the FIRST 50
# registered queries only, and its evidence is cumulative across rounds
# (CORRECTNESS_r01.json: 43 green; CORRECTNESS_r02.json: 49 green + 1
# rows-only-by-design). The catalog registers 111 queries. The round-3
# window (this file) rotates in everything without driver evidence: the 6
# registered past position 50 in round 2 (q_asof_forward, q_asof_nearest,
# q_time_weighted_avg, q_cap_per_group, q_corpus_pipeline,
# q_ann_multitable) and the 6 round-3 additions (q_dup_spans, q_pagerank,
# q_triangle_count, q_bigram_logprob, q_stratified_sample,
# q_ann_ivf_nprobe). Displaced to make room: the 6 OLAP rows green in r02
# and the 6 serialized-contract rows green in r02 (q_collect_set,
# q_flatten_collect, q_topk_banded_labels, q_sorted_names_array,
# q_flatten_cat_labels, q_running_collect) — their green record is
# cumulative and they stay replica-checked at two scale factors via
# scripts/check_oracle.py. Queries whose implementation changed this round
# (as-of family, graph components, multimodal decode) are kept IN the
# window for re-verification. Late round-3 additions (q_semantic_dedup,
# q_exists_subquery, q_scalar_subquery) displace three more r02-green
# unchanged rows (q_zscore_norm, q_decontaminate, q_bottomk_sample), and
# q_doc_chunks/q_pack_sequences/q_lm_quantile_filter displace
# q_embedding_quantize/q_unigram_surprisal/q_ann_multiprobe, and
# q_count_min displaces q_hash_split, and q_range_frame_avg /
# q_fuzzy_token_join displace q_tfidf_top_terms / q_bm25_top_terms (same
# rule), and q_locf_fill / q_percentile_cont / q_fuzzy_damerau displace
# q_text_quality / q_langid_confusion / q_gopher_rules, and q_variant_json
# displaces q_pii_scrub (same rule). The 11 late-round-3 additions
# (q_cohort_retention, q_funnel_stages, q_scd2_intervals, q_ewma,
# q_mad_outliers, q_inverted_index, q_pmi_cooccur, q_source_mix_weights,
# q_bfs_distance, q_vector_centroids, q_matryoshka_topk) displace 11 more
# r02-green unchanged rows (q_multimodal_frames, q_multimodal_features,
# q_crossencoder_rerank, q_dedup_exact, q_fingerprint_groups,
# q_ngram_jaccard, q_minhash_lsh, q_simhash, q_winnow_fingerprint,
# q_doc_tokens, q_label_keys), and the 4 after them (q_lateral_topk,
# q_sliding_dau, q_entropy_by_source, q_label_propagation) displace
# q_repetition_ngrams, q_cosine_topk, q_ann_bucketed, q_ann_ivf (same
# rule), and q_stupid_backoff / q_prefix_jaccard displace
# q_ann_ivf_kmeans / q_embedding_near_dup (same rule), and q_tpch_q10
# displaces q_montecarlo_critical (rows-only by design — its no_oracle
# status is already on record in CORRECTNESS_r02; nothing new to learn).
# With r03 green, 136 of 158 queries have cumulative driver evidence; the
# 22 without are the round-4 rotation TODO below (every oracle-paired
# one replica-green at both SFs via scripts/check_oracle.py; q_approx_percentile is rows-only by design like the HLL row) and nothing else.
# ---------------------------------------------------------------------------
# Round-4 rotation TODO: q_tpch_q5, q_tpch_q14, q_assoc_rules,
# q_profile_table, q_funnel_windowed, q_chi_square, q_dedup_keep_best,
# q_sequence_match, q_autocorr_lag1, q_winsorized_mean, q_rag_retrieve,
# q_weighted_sample, q_kl_divergence, q_linear_trend, q_mode_per_group,
# q_count_min_narrow, q_interp_lm, q_sssp, q_item_cooccur,
# q_conversion_latency, q_approx_percentile (rows-only),
# q_snapshot_diff into positions
# 0-49 (every oracle-paired one replica-green at both SFs).
# q_pmi_cooccur and q_entropy_by_source were hardened onto the portable
# ln AFTER entering the window this round — re-verified at both SFs
# post-change.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW: tuple[str, ...] = (
    # flagship (also used by entry())
    "q_agg_basic",
    # (a) round-3 additions — no driver evidence yet
    "q_dup_spans",
    "q_pagerank",
    "q_triangle_count",
    "q_bigram_logprob",
    "q_stratified_sample",
    "q_ann_ivf_nprobe",
    # (b) never driver-checked: time-series joins, graph, OLAP
    "q_asof_join",
    "q_range_join",
    "q_graph_closure",
    # (b) round-3 rotation: the 6 queries with no driver evidence yet
    "q_asof_forward",
    "q_asof_nearest",
    "q_time_weighted_avg",
    "q_cap_per_group",
    "q_corpus_pipeline",
    "q_ann_multitable",
    "q_semantic_dedup",
    # (a) late round-3 additions — no driver evidence yet
    "q_cohort_retention",
    "q_funnel_stages",
    "q_scd2_intervals",
    "q_ewma",
    "q_mad_outliers",
    "q_inverted_index",
    "q_pmi_cooccur",
    "q_source_mix_weights",
    "q_bfs_distance",
    "q_vector_centroids",
    "q_matryoshka_topk",
    "q_lateral_topk",
    "q_sliding_dau",
    "q_entropy_by_source",
    "q_label_propagation",
    "q_stupid_backoff",
    "q_prefix_jaccard",
    # (b) dedup family (clusters changed this round — kept for re-verify)
    "q_dedup_clusters",
    # (b) text analysis / quality / scoring / split
    "q_locf_fill",
    "q_percentile_cont",
    "q_fuzzy_damerau",
    "q_variant_json",
    "q_range_frame_avg",
    "q_count_min",
    "q_fuzzy_token_join",
    # TPC-H star-join addition (Q5/Q14 stay outside this round — replica-green
    # at both SFs, rotate in next round; Q10 is the most complex shape)
    "q_tpch_q10",
    # (c) new round-2 operators (no prior driver evidence)
    "q_image_decode",
    "q_audio_decode",
    "q_exists_subquery",
    "q_scalar_subquery",
    "q_doc_chunks",
    "q_pack_sequences",
    "q_lm_quantile_filter",
)


def _apply_driver_window() -> None:
    assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
    assert len(set(_DRIVER_WINDOW)) == 50
    ordered = {name: QUERIES[name] for name in _DRIVER_WINDOW}
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_window()

__all__ = ["QUERIES", "QuerySpec", "register"]
