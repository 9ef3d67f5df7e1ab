#!/usr/bin/env python
"""Dump the formatted physical plan of the most expensive headline queries
to PLANS.md — the per-round audit trail for "explain, then iterate until
it's the plan you'd want". Re-run after any operator change:

    python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# the queries whose plans carry the scale argument: the most expensive in
# the headline bench plus every round-3 flagship
AUDIT = [
    "d29_minhash_near_dup",
    "d29_simhash_pairs",
    "d33_ols_mse",
    "d09_q9_product_profit",
    "d04_q3_shipping",
    "d30_pq_ann",
    "d31_repetition",
    "d31_unigram_logprob",
    "d31_bm25",
    "d34_sequence_pack",
    "d29_pagerank_2iter",
    "d27_retention",
    "d34_llm_dataprep",
    "d35_upsert_cdc",
    # round-3 second wave
    "d29_decontaminate",
    "d29_triangle_count",
    "d31_vocab_topk",
    "d31_chunk_text",
    "d35_snapshot_diff",
    "d14_zscore_outliers",
    "d24_mapinarrow",
    # round-4 additions
    "d02_weighted_sample",
    "d10_skew_report",
    "d27_funnel",
    "d34_global_shuffle",
    "d02_group_sample",
    "d31_hash_features",
    "d35_schema_evolution",
    "d23_cogrouped_map",
    # round-4 third wave
    "d34_token_budget",
    "d27_attribution",
    "d14_linear_interpolate",
    "d31_block_dedup",
    "d30_filtered_knn",
    "d30_range_search",
    "d10_corr_matrix",
    "d02_temperature_mix",
    "d35_cdc_deletes",
    # round-4 session waves: the plans that carry this round's scale story
    "d03_bucketed_join",
    "d01_dynamic_pruning",
    "d07_interval_join",
    "d14_time_range_sum",
    "d10_psi_drift",
    "d34_dataset_card",
    "d34_repro_fingerprint",
    "d31_gopher_filter",
    "d31_unicode_clean",
    "d14_mad_outliers",
    "d27_top_paths",
    "d30_mips_topk",
    "d19_decimal_exact",
    "d29_incremental_dedup",
    "d31_html_strip",
    "d14_locf_fill",
    "d12_grouping_flags",
    "d10_histogram",
    "d21_map_funcs",
    "d19_try_arithmetic",
    "d30_matryoshka_knn",
    # round-5 additions
    "d24_arrow_native_udtf",
    # round-6: the remaining round-5 batch queries (streaming TWS/stream
    # source queries execute eagerly — audited by batch-equivalence oracles)
    "d10_expectations",
    "d17_collation",
    "d27_markov_transitions",
    "d30_hybrid_rrf",
    "d31_sentence_dedup",
    "d35_vacuum_retention",
    # round-6 additions (d33_fpgrowth_pairs' result plan is the fitted
    # model's local freqItemsets relation — audited by its oracle instead)
    "d30_hamming_topk",
    "d14_date_bin_rollup",
    "d06_lateral_topn",
    "d24_udtf_analyze",
    "d01_nested_pruning",
    "d21_xml_roundtrip",
    "d35_deletion_vectors",
    "d31_url_parse",
    # round-6 wave 3
    "d15_skyline",
    "d16_recursive_cte",
    "d10_benford",
    "d27_multi_touch",
    "d14_cusum",
    "d24_udtf_table_partition",
    "d34_curriculum_order",
    "d31_containment",
    "d20_sparse_dot",
    "d17_soundex",
    "d30_mmr_rerank",
    "d09_conditional_agg",
    "d18_calendar_dim",
    "d29_fuzzy_join",
    "d10_equidepth",
    "d32_image_ahash",
    "d27_rfm_segmentation",
    "d14_seasonal_profile",
    # round-6 wave 6
    "d10_ks_drift",
    "d09_weighted_median",
    "d14_autocorr",
    "d19_bitwise",
    "d17_regexp_battery",
    "d35_minmax_file_skip",
    "d18_timezone",
    "d31_bigram_logprob",
    "d34_chat_template",
    "d35_clustering_depth",
    "d11_countmin",
    "d14_theil_sen",
    "d16_sql_scripting",
    "d01_parameterized_sql",
    "d27_kaplan_meier",
    "d18_business_days",
    "d22_sql_udf",
    "d09_pareto_abc",
    "d20_centroid_cosine",
    "d10_entropy_profile",
    "d10_mutual_info",
    "d02_class_balance",
    "d14_group_ols",
    "d19_npv",
    "d01_bucket_pruning",
    "d14_ohlc",
    "d27_dau_mau",
    "d09_listagg",
    # round-6 wave 7 (d33_chisq_select's result plan is a driver-local
    # relation like d33_fpgrowth_pairs — audited by its exact oracle)
    "d34_bpe_encode",
    "d34_quality_classifier",
    "d34_pref_pairs",
    "d11_kmv_sketch",
    "d11_theta_setops",
    "d10_gini",
    "d14_holt_linear",
    "d25_state_reader",
    # round-6 wave 8
    "d27_cohort_ltv",
    "d02_poisson_bootstrap",
    "d32_image_patchify",
    "d32_audio_energy",
    "d31_readability",
    # round-6 wave 9 (d33_naive_bayes is a driver-local model readout —
    # oracle-certified like fpgrowth/chisq)
    "d11_bloom_filter",
    "d08_asof_nearest",
    "d15_diversified_topk",
    "d07_band_join",
    "d16_pipe_syntax",
    "d14_rolling_ols",
    "d31_zipf_fit",
    "d30_maxsim",
    "d34_span_corruption",
    "d02_kfold",
    # round-7 additions (VERDICT r6 ask #4)
    "d01_python_pushdown",
    # round-7 wave 1
    "d19_logsumexp",
    "d10_js_divergence",
    "d27_path_entropy",
    "d14_bollinger",
    "d09_hhi",
    "d17_jaro_winkler",
    "d34_loss_mask",
    # round-7 wave 2 (d35_zorder_interleave moved to AUX_PLANS in r10:
    # the registered query now materializes the file-count-bounded zone
    # map and releases its persist before returning, so the interesting
    # distributed plan lives on the internal _zorder_zone_map split)
    "d31_pii_scrub",
    "d10_modal_values",
    # round-7 wave 3
    "d30_recall_eval",
    "d02_negative_downsample",
    "d33_calibration_ece",
    # round-7 wave 4
    "d34_pack_attention_spans",
    "d30_ndcg_eval",
    # round-7 wave 5
    "d14_period_growth",
    "d02_temporal_split",
    "d33_regression_metrics",
    # round-7 wave 6
    "d34_vocab_coverage",
    "d30_embedding_audit",
    "d10_key_discovery",
    "d35_stats_merge",
    # round-9 additions (d26_stream_session_window is excluded like the
    # other true streaming queries: its returned DataFrame is the memory
    # sink read, not the streaming plan)
    "d27_retention_cohorts",
    "d35_compaction_plan",
    "d34_fim_transform",
    "d31_perplexity_buckets",
    "d34_tokenizer_fertility",
    "d10_wasserstein_drift",
    # round-10 additions
    "d10_cramers_v",
    "d10_stable_moments",
    "d27_interval_merge",
    "d29_shard_dup_matrix",
    "d34_seq_len_histogram",
    "d14_twap",
    "d14_winsorize",
    "d27_audience_overlap",
    "d34_soft_dedup_weights",
    # round-11 additions
    "d29_exact_substr",
    "d29_substr_span_drop",
    "d09_gini",
    "d14_rolling_corr",
    "d31_pmi_collocations",
    "d30_centroid_assign",
    "d27_user_lifecycle",
    "d14_drawdown",
    "d31_heaps_law",
    "d30_mrr_eval",
    "d29_lpa_communities",
    "d09_topk_share",
    "d14_kalman_1d",
    "d02_ab_assignment",
    # round-12 additions
    "d29_ppr_2iter",
    "d33_prefixspan_journeys",
    "d11_quantile_sketch_merge",
    "d14_rolling_skew",
    "d27_circadian_profile",
    "d29_kcore",
    "d30_binary_quantize",
    "d34_domain_reweight",
    "d34_bucketed_batching",
    "d29_degree_assortativity",
    "d14_sax",
    "d35_bloom_file_skip",
    "d29_link_prediction",
]


def _aux_bpe_train_round(spark, sf_dir):
    """One BPE training round's pair-count plan (the shape that iterates):
    exactly one (pair, partial-count) exchange around a partial+final
    HashAggregate pair over the persisted vocabulary table — proving no
    text re-tokenization happens across rounds (the corpus collapses to
    the word table ONCE; see pipeline.d34_bpe_train)."""
    from pyspark.sql import functions as F

    from conceptnetwork_spark.operators.pipeline import (
        BPE_SEP,
        bpe_word_table,
    )

    words = bpe_word_table(spark, sf_dir)
    n = F.size("syms")
    return (
        words.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n - 1),
                    F.slice("syms", 2, n - 1),
                    lambda x, y: F.concat_ws(BPE_SEP, x, y),
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pc"))
    )


def _aux_python_stream_source(spark, sf_dir):
    """The UN-STARTED streaming read from the custom Python source — the
    lazy plan pins the PythonMicroBatchStream scan node + the filter above
    it (the executed query in d01_python_stream_source wraps this in a
    memory sink with a per-run uuid name, which would flap the drift
    radar)."""
    from pyspark.sql import functions as F

    from conceptnetwork_spark.sources.pydatasource import (
        STREAM_CHUNK,
        SYNTH_N,
        register_python_source,
    )

    register_python_source(spark)
    return (
        spark.readStream.format("synthrange")
        .option("n", str(SYNTH_N))
        .option("chunk", str(STREAM_CHUNK))
        .load()
        .where(F.col("v") < 50)
    )


# queries whose AUDITABLE plan is not the returned DataFrame: iterative
# operators (pin the per-round shape) and eagerly-executed streaming
# queries (pin the un-started source plan)
def _aux_zorder_zone_map(spark, sf_dir):
    """The distributed plan d35_zorder_interleave executes after its
    KB-sized bucket-count job: two deterministic-bucket hash-exchange
    numbering arms (mapInPandas kernels that pre-aggregate zone stats
    per file inside the partition) unioned into one file-count-bounded
    final aggregate — no persist, no broadcast join, no SinglePartition
    anywhere (also pinned in tests/test_plans.py)."""
    from conceptnetwork_spark.operators.pipeline import _zorder_zone_map

    return _zorder_zone_map(spark, sf_dir)


def _aux_gini_rank_partials(spark, sf_dir):
    """The distributed plan d09_gini executes before its KB-sized readout:
    revenue hash-agg -> range exchange on (rev, custkey) -> map-only
    pandas partials (count, sum x, sum rank*x per sorted range). The
    registered query returns a one-row local relation, so the audit pins
    this split instead."""
    from conceptnetwork_spark.operators.relational import _gini_rank_partials

    return _gini_rank_partials(spark, sf_dir)


AUX_PLANS = {
    "d09_gini@rank-partials-plan": _aux_gini_rank_partials,
    "d35_zorder_interleave@zone-map-plan": _aux_zorder_zone_map,
    "d34_bpe_train@per-round-pair-count-shape": _aux_bpe_train_round,
    "d01_python_stream_source@unstarted-stream-plan": _aux_python_stream_source,
}


def main() -> None:
    from conceptnetwork_spark import get_spark, registry

    # explicit query args AUGMENT the audit list rather than replacing it:
    # PLANS.md is regenerated whole, so a single-query invocation must not
    # truncate the committed audit trail to one plan (happened in r5)
    names = AUDIT + [n for n in sys.argv[1:] if n not in AUDIT]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    out = [
        "# PLANS — physical-plan audit of the expensive headline queries",
        "",
        f"Generated by `tools/explain_audit.py` at {os.path.basename(sf_dir)}.",
        "What to look for per plan: `PushedFilters`/`ReadSchema` at every",
        "scan (pushdown + pruning), `BroadcastHashJoin` for dimension sides,",
        "partial+final `HashAggregate` pairs around each shuffle, and no",
        "`CartesianProduct`. Streaming queries execute eagerly and are",
        "audited by their batch-equivalence oracles instead.",
        "",
    ]
    builders = {n: qs[n] for n in names}
    builders.update(AUX_PLANS)
    for name, build in builders.items():
        try:
            df = build(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # streaming/eager queries have no lazy plan
            out += [f"## {name}", "", f"(not auditable lazily: {ex})", ""]
            continue
        out += [f"## {name}", "", "```", plan.strip(), "```", ""]
    with open(os.path.join(ROOT, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(builders)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
