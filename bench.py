#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}. Each query is forced end-to-end with a
noop-format write (full computation, no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_agg_basic",
    "q_scalar_filter_sum",
    "q_join_multi",
    "q_join_lut_broadcast",
    "q_left_join_fill",
    "q_rank_topk",
    "q_latest_order_per_customer",
    "q_sessionize",
    "q_time_buckets",
    "q_llr_contingency",
    "q_minhash_lsh",
    "q_simhash",
    "q_cosine_topk",
    "q_ann_bucketed",
    "q_doc_tokens",
    "q_asof_join",
    "q_range_join",
    "q_tfidf_top_terms",
    "q_repetition_ngrams",
    # round-2 additions (keep prior names stable for cross-round deltas)
    "q_bm25_top_terms",
    "q_unigram_surprisal",
    "q_image_decode",
    # round-3 additions
    "q_dup_spans",
    "q_bigram_logprob",
    "q_pagerank",
    "q_triangle_count",
    "q_stratified_sample",
    "q_count_min",
    "q_doc_chunks",
    "q_fuzzy_token_join",
    # round-3 continuation additions
    "q_funnel_stages",
    "q_sliding_dau",
    "q_cohort_retention",
    "q_ewma",
    "q_label_propagation",
    "q_inverted_index",
    "q_pmi_cooccur",
    "q_stupid_backoff",
    "q_tpch_q5",
    "q_tpch_q10",
    # round-4 additions
    "q_sentence_split",
    "q_bpe_vocab",
    "q_bpe_encode",
    "q_rouge_overlap",
    "q_skipgram_pairs",
    "q_tpch_q3",
    "q_tpch_q18",
    "q_text_normalize",
    "q_embedding_covariance",
    "q_interval_overlap",
    "q_kneser_ney",
    "q_hard_negatives",
    "q_feature_hashing",
    # round-4 session-2 additions
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q13",
    "q_attribution",
    "q_conversion_paths",
    "q_cdc_chunks",
    "q_cdc_dedup_ratio",
    "q_bloom_probe",
    "q_hll_estimate",
    "q_html_extract",
    "q_rrf_fusion",
    "q_tpch_q22",
    "q_window_distribution",
    "q_seasonal_naive",
    "q_kcore",
    "q_merge_upsert",
    "q_bmp_decode",
    "q_moving_median",
    "q_kmv_set_estimates",
    "q_jl_projection",
    "q_pq_adc_topk",
    "q_dq_checks",
    "q_linear_interpolate",
    "q_gif_roundtrip",
    "q_skyline_2d",
    "q_item_similarity",
    "q_quantile_normalize",
    "q_containment_join",
    "q_cuped",
    "q_ab_ztest",
    "q_textrank_keywords",
    "q_cusum_changepoint",
    "q_kaplan_meier",
    "q_rolling_zscore",
    "q_rfm_segments",
    "q_gini",
    "q_cohort_ltv",
    "q_zipf_fit",
    # round-5 additions
    "q_quality_classifier",
    "q_unigram_tokenize",
    "q_unigram_em_costs",
    "q_mp3_frame_walk",
    "q_jpeg_progressive",
    "q_markov_transitions",
    "q_double_exp_smoothing",
    "q_sax_symbols",
    "q_multi_pattern_match",
    "q_grid_cluster",
    "q_dsir_weights",
    "q_pca_power",
    "q_mann_whitney",
    "q_ks_test",
    "q_ams_sketch",
    "q_recursive_cte",
    "q_welch_ttest",
    "q_acf_multilag",
    "q_seasonal_indices",
    "q_spearman_corr",
    "q_hits",
    "q_readability",
    "q_rake_keywords",
    "q_wordpiece_encode",
    "q_phonetic_blocking",
    "q_fellegi_sunter",
    "q_personalized_pagerank",
    "q_paragraph_dedup",
    "q_epoch_shuffle",
    "q_anova_f",
    "q_bh_fdr",
    "q_theil_sen",
    "q_adamic_adar",
    "q_mmr_rerank",
    "q_mp4_box_walk",
    "q_distributed_topk",
    "q_mergeable_quantiles",
    "q_modularity",
    "q_collocations",
    "q_classifier_eval",
    "q_bootstrap_ci",
    "q_mann_kendall",
    # round 6
    "q_kendall_tau",
    "q_jaro_winkler",
    "q_isotonic_fit",
    "q_burst_detection",
    "q_ktruss",
    "q_equidepth_histogram",
    "q_holt_winters",
    "q_roc_auc",
    "q_calibration_bins",
    "q_target_encoding",
    "q_rendezvous_sharding",
    "q_shapley_attribution",
    "q_seasonal_decompose",
    "q_k_anonymity",
    "q_dp_noisy_counts",
    "q_length_buckets",
    "q_sequential_patterns",
    "q_minhash_recall",
    "q_scc",
    "q_quantile_rank_error",
    "q_stratified_ate",
    "q_wasserstein_1d",
    "q_gini_split",
    # round 7
    "q_scc_fwbw",
    "q_weighted_minhash",
    "q_weighted_minhash_recall",
    "q_transformer_rerank",
    # round-7 session-2
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
    "q_lorenz_gini",
    "q_herfindahl",
    "q_cramers_v",
    "q_hill_tail_index",
    "q_heaps_law",
    "q_naive_bayes",
    "q_retrieval_eval",
    "q_pacf",
    "q_harmonic_centrality",
    "q_lift_curve",
    "q_cvm_test",
    "q_token_fertility",
    "q_degree_assortativity",
    "q_distance_distribution",
    "q_betweenness",
    "q_ridge_regression",
    "q_nb_crossval",
    "q_periodogram",
    "q_mix_shift",
    "q_betweenness_sampled",
    "q_anderson_darling",
    "q_nelson_aalen",
    "q_map_eval",
    "q_theil_index",
    "q_entropy_rate",
    # round 8
    "q_approx_percentile_envelope",
    "q_kruskal_wallis",
    "q_levene_test",
    "q_scd2_history",
    "q_t_closeness",
    "q_friedman_test",
    "q_silhouette_cells",
    "q_bipartite_check",
    "q_jonckheere",
    "q_page_trend",
    "q_davies_bouldin",
    "q_cochran_q",
    "q_hodges_lehmann",
    # round 9: the remaining classic TPC-H shapes join the headline
    # (q2/q11/q16/q21 — ~2.2s each in the BENCH_FULL_r09 survey), so the
    # whole implemented TPC-H family is under per-round min-of-3 watch
    "q_tpch_q2",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q21",
]

# Documented non-headline heavies (SCALE.md): timed and reported under
# "tracked" so their optimizations/regressions stay visible round-over-round,
# but excluded from the headline total — each is the exact/quality path
# beside a registered scale twin (q_prefix_jaccard vs the shared-shingle
# baseline corpus trade-off; q_semantic_dedup at the catalog's deliberate
# k=8 with its sum(cell^2)-by-construction verify).
TRACKED = [
    "q_prefix_jaccard",
    "q_semantic_dedup",
    # the synthetic digit-pattern customer names are the ADVERSARIAL
    # entity-resolution input: every name is edit-distance-1 from many
    # others, so the graph collapses into one giant component and the
    # composite pays ~14 large-star/small-star rounds (~13s at sf0.1) —
    # exactly the case the O(log n) algorithm exists for; tracked, not
    # headline, per the documented-heavies protocol
    "q_entity_resolution",
]

# Surveyed heavies (round-8 VERDICT #2 adjudication of the BENCH_FULL_r09
# full-catalog survey): every non-headline query the survey read at >= 4s,
# each with a documented reason it is expensive BY CONSTRUCTION. Timed
# ONCE per bench run (a drift alarm, not a steady-state estimator — the
# full min-of-3 treatment on ~100s of heavies would triple bench cost);
# the per-round BENCH_FULL survey remains the complete map.
# Round 11 (VERDICT #6): the round-10 kernel/plan rewires made the former
# surveyed heavies cheap enough for the headline set (fuzzy_damerau
# 17.9->4.3, embedding_near_dup 15.8->~2 with the planted pairs, the IVF
# family 1.3-3.0, graph_closure 3.8, dedup_clusters 1.7, winnow ~3) —
# keeping them surveyed just hid them from the round-over-round headline
# trend. They are appended to HEADLINE below; headline totals re-base
# this round (n grows 214 -> 223, noted in DEVNOTES).
SURVEYED = []

HEADLINE.extend([
    "q_embedding_near_dup",
    "q_fuzzy_damerau",
    "q_ann_ivf_nprobe",
    "q_ann_ivf_kmeans",
    "q_ann_ivf",
    "q_ann_multiprobe",
    "q_dedup_clusters",
    "q_graph_closure",
    "q_winnow_fingerprint",
])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from platform_etl_backend_spark.engine.session import get_spark
    from platform_etl_backend_spark.catalog import QUERIES

    # SPARK_GRAFT_BENCH_SET=full (round-8 VERDICT #2): time EVERY
    # registered query — the ~140 non-headline queries otherwise have no
    # committed cost number and are a regression blind spot. Full mode is
    # a single-pass SURVEY by convention (set PASSES for more): it skips
    # the tracked/quiet extra passes (every query is already in the map)
    # and reports metric full_catalog_queries_total_wall. Committed per
    # round as BENCH_FULL_r{N}.json via SPARK_GRAFT_BENCH_DETAIL.
    full_mode = os.environ.get("SPARK_GRAFT_BENCH_SET", "headline") == "full"
    bench_names = sorted(QUERIES) if full_mode else HEADLINE
    metric = ("full_catalog_queries_total_wall" if full_mode
              else "headline_queries_total_wall")

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus), 8)),
            # the PySpark local-mode default heap is 1g: with 32 executor
            # threads and ~70 queries x 3 passes, leaked persist/checkpoint
            # blocks OOM'd the shared JVM before the ContextCleaner caught
            # up (observed at the round-4 headline width). The bench box
            # has 128 GiB; give the JVM a real heap.
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_BENCH_HEAP", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up outside timing, standard steady-state benchmarking practice:
    # run every headline query once against the tiny sf0.001 copy of the same
    # tables. The plans are structurally identical (same schemas), so this
    # hits the whole-stage-codegen cache, JIT-compiles the generated classes,
    # and warms the parquet-datasource + noop-sink code paths — without
    # touching the benchmarked inputs. Cold-start JIT is a fixed per-process
    # cost that would otherwise be charged entirely to the first query
    # (~2.5s of a ~1.1s query); at cluster scale it amortizes to zero.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in (bench_names if full_mode else HEADLINE + TRACKED):
            try:
                QUERIES[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass  # warm-up is best-effort; the timed run surfaces real errors

    # Absorb per-input fixed costs (parquet footer reads, file-index
    # construction, page-cache faults on the benchmarked files) that would
    # otherwise land entirely on whichever query happens to run first:
    # touch every table in sf_dir once. count() is metadata-only on parquet
    # (no page decode), so this warms footers without pre-computing results.
    import glob

    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(p).count()
        except Exception:
            pass  # e.g. nanos-timestamp tables need reader-specific conf

    # Timed passes per query (default 3), report the MIN — the standard
    # steady-state estimator: the minimum over repetitions is the
    # least-noise measurement of a deterministic computation's cost (OS
    # jitter, GC pauses, and page-cache evictions only ever ADD time; this
    # VM's run-to-run noise is ±15%, see DEVNOTES bench protocol). Still
    # full end-to-end noop-write execution, never cached results (noop
    # re-computes every pass).
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    def time_once(name: str) -> float:
        fn = QUERIES[name].fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        # drop persisted frames a query pinned (e.g. the prefix-jaccard doc
        # table) so block-manager memory cannot accumulate across the run;
        # per-query plans never reuse another query's cache, so this does
        # not distort timings
        spark.catalog.clearCache()
        return dt

    def time_min(name: str) -> float:
        return round(min(time_once(name) for _ in range(passes)), 3)

    # PASS-MAJOR sweeps with a checkpoint artifact after each completed
    # pass: at 190+ headline queries a 3-pass run can exceed an external
    # wall-clock budget (observed: a 10-minute kill left NO artifact).
    # After every full sweep the compact JSON line is printed AND
    # $SPARK_GRAFT_BENCH_OUT is rewritten, so a killed run still leaves a
    # complete-coverage min-of-k artifact for the passes that finished.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    # Full per-query detail artifact (round-7 VERDICT #2): the driver's
    # tail capture truncates the compact line's per-query dict at ~190
    # queries, so round-over-round comparisons lost most of the map.
    # Rewritten after every pass; committed per round as
    # BENCH_DETAIL_r{N}.json so regressions stay auditable.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )

    def write_detail(payload: dict) -> None:
        with open(detail_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")

    # surveyed heavies run FIRST (right after warmup): measured round-9,
    # a single pass taken at the END of a ~700-execution bench session
    # reads 2-11x high (q_winnow 83s session-tail vs 8.5s fresh-JVM cold /
    # 4.1s warm) — late-JVM codegen-cache/GC state, not the queries. Up
    # front the reading is a clean cold-ish number and the ~90s of work
    # doubles as extra warmup for the min-of-3 headline passes.
    surveyed = {} if full_mode else {name: round(time_once(name), 3)
                                     for name in SURVEYED}

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for p in range(passes):
        for qi, name in enumerate(bench_names):
            # full mode surveys EVERY registered query in one long pass:
            # one raising query must not abort the other ~350 (warmup
            # already swallows exceptions; the timed loop must too).
            # Headline mode keeps fail-fast — its queries are the curated
            # always-green set and a silent hole there hides a regression.
            if full_mode:
                try:
                    dt = time_once(name)
                except Exception as exc:  # noqa: BLE001 - survey resilience
                    failures[name] = f"{type(exc).__name__}: {exc}"[:300]
                    continue
            else:
                dt = time_once(name)
            prior = timings.get(name)
            timings[name] = dt if prior is None else min(prior, dt)
            # full mode is one long pass over ~350 queries: checkpoint the
            # detail artifact every 25 so an external kill still leaves a
            # usable partial survey (the pass-major checkpoint below only
            # fires at pass END — worthless for a single-pass mode)
            if full_mode and qi % 25 == 24:
                write_detail({
                    "sf": sf, "passes": p, "partial": True, "agg": "min",
                    "n_done": qi + 1,
                    "queries": {k: round(v, 3) for k, v in timings.items()},
                    **({"failures": failures} if failures else {}),
                })
        ckpt = json.dumps({
            "metric": metric,
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "n_queries": len(timings),
            "sf": sf,
            "passes": p + 1,
            "agg": "min",
            "partial": p + 1 < passes,
            **({"n_failed": len(failures)} if failures else {}),
        })
        print(ckpt, flush=True)
        if out_path:
            with open(out_path, "w") as fh:
                fh.write(ckpt + "\n")
        write_detail({
            "sf": sf,
            "passes": p + 1,
            "partial": p + 1 < passes,
            "agg": "min",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            **({"failures": failures} if failures else {}),
        })
    timings = {k: round(v, 3) for k, v in timings.items()}
    # Full-mode quiet adjudication (round-9 VERDICT #6): every query whose
    # single-pass survey reading exceeds 5 s gets min-of-`passes` extra
    # runs right here, so session-tail inflation (r9: q_minhash_recall
    # 13.45 s survey vs 1.69 s quiet) is adjudicated by the artifact
    # itself instead of by hand each round.
    full_quiet = {}
    if full_mode:
        quiet_n = max(passes, 3)  # a quiet number is min-of->=3 by definition
        for name, dt in sorted(timings.items(), key=lambda kv: -kv[1]):
            if dt <= 5.0:
                break
            try:
                full_quiet[name] = round(
                    min(time_once(name) for _ in range(quiet_n)), 3
                )
            except Exception as exc:  # noqa: BLE001 - survey resilience
                failures[name] = f"quiet: {type(exc).__name__}: {exc}"[:300]
    tracked = {} if full_mode else {name: time_min(name) for name in TRACKED}

    # "tracked_quiet" (round-6 VERDICT ask): the four load-sensitive
    # heavies get EXTRA passes at the end of the run and report the min
    # over ALL passes — more samples push the min toward the true quiet
    # cost, so round-over-round comparisons stop relitigating ambient-load
    # artifacts (this VM's run-to-run noise is ±15%+; the min over 6
    # passes is far more stable than over 3).
    QUIET = ["q_prefix_jaccard", "q_semantic_dedup",
             "q_entity_resolution", "q_grid_cluster",
             # round-7 VERDICT #3: quiet-baseline the two-pass-rank
             # rewires + the ambient-drift suspects so a TRUE regression
             # cannot hide behind session noise
             "q_roc_auc", "q_calibration_bins", "q_equidepth_histogram",
             "q_gini_split", "q_wasserstein_1d",
             "q_quantile_rank_error", "q_minhash_recall"]
    quiet_passes = (0 if full_mode else
                    int(os.environ.get("SPARK_GRAFT_BENCH_QUIET_PASSES", "3")))
    tracked_quiet = {}
    for name in (() if full_mode else QUIET):
        prior = timings.get(name, tracked.get(name))
        fn = QUERIES[name].fn
        best = prior
        for _ in range(quiet_passes):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        tracked_quiet[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # stop the context before printing so the JSON is the last thing WE
    # write — and, because the forked JVM's stdout is forwarded
    # asynchronously (GC warnings can interleave at any time), also write
    # the JSON to $SPARK_GRAFT_BENCH_OUT when set, which is immune to
    # interleaving. The driver's parser scans for the JSON line; both
    # channels carry it.
    spark.stop()
    line = json.dumps({
        "metric": metric,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "tracked": tracked,
        "tracked_quiet": tracked_quiet,
        "surveyed": surveyed,
        "sf": sf,
        "passes": passes,
        "agg": "min",
        **({"quiet": full_quiet} if full_quiet else {}),
        **({"failures": failures} if failures else {}),
    })
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    write_detail({
        "sf": sf,
        "passes": passes,
        "partial": False,
        "agg": "min",
        "queries": timings,
        "tracked": tracked,
        "tracked_quiet": tracked_quiet,
        "surveyed": surveyed,
        **({"quiet": full_quiet} if full_quiet else {}),
        **({"failures": failures} if failures else {}),
    })
    print(line)
    # BENCH_r04 lesson: the full line above now exceeds the driver's
    # tail-capture window at 90+ queries, and since "value" precedes the
    # per-query dict the total got front-truncated away ("parsed": null).
    # The LAST printed line always wins tail capture, so emit a compact
    # summary line after the full one — small forever, no matter how many
    # queries the headline set grows to. The full per-query dict stays on
    # the previous line and in $SPARK_GRAFT_BENCH_OUT.
    print(json.dumps({
        "metric": metric,
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf,
        "passes": passes,
        "agg": "min",
        **({"n_failed": len(failures)} if failures else {}),
    }))


if __name__ == "__main__":
    main()
