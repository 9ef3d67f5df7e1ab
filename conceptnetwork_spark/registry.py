"""Declared-query registry: name -> (Spark builder, optional DuckDB oracle).

Every operator the engine claims (SURVEY §2.2) registers here. The driver
contract (``__spark_entry__.py``) is generated from this registry:
``queries()`` returns the builders, ``oracle_sql()`` the ANSI-SQL oracles.

Builders have signature ``(spark, sf_dir) -> DataFrame`` and must:
- end with a total-order ``orderBy`` over a key suffix,
- ``ROUND(x, 4)`` every float column,
- alias every computed column identically to the oracle SQL.

Ops with engine-specific semantics (approx sketches, LSH, streaming) register
with ``oracle=None`` -> the driver records a weaker rows-only check, and the
pytest suite carries the real assertion (tolerance / recall / equivalence).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# oracle is either the SQL string itself or a zero-arg callable producing it
# at RESOLUTION time — lazy oracles let sources stage their fixture files
# when the oracle is actually requested instead of as an import side effect.
OracleSpec = "str | Callable[[], str] | None"


@dataclass(frozen=True)
class Declared:
    name: str
    fn: QueryFn
    oracle: object
    doc: str


REGISTRY: dict[str, Declared] = {}


def register(name: str, oracle: "str | Callable[[], str] | None" = None):
    """Decorator declaring one engine query with its oracle SQL (a string,
    or a zero-arg callable resolved lazily when oracles() is called)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = Declared(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {d.name: d.fn for d in REGISTRY.values()}


def oracles() -> dict[str, str]:
    _load_all()
    return {
        d.name: (d.oracle() if callable(d.oracle) else d.oracle)
        for d in REGISTRY.values()
        if d.oracle is not None
    }


_LOADED = False

# Certification-first ordering. The driver's CORRECTNESS window checks the
# FIRST 50 registry entries, so this list ROTATES per round: it leads with
# oracle queries that have never hash-matched in any prior driver window
# (cumulative ledger: CERTIFIED.md), then re-certifications of fixed
# queries, then canaries — one previously-green query per component not
# already represented. All 50 slots carry oracles; D11's approx sketches
# are oracle-less BY DESIGN (5%-tolerance pytest instead) and deliberately
# stay outside the window. ROUND-4 window: 49 never-checked oracle
# queries (the 32 from the round-3 plan + 4 round-4 headliners + 13 from
# the later waves, taking the slots of canaries whose components are
# already multiply-certified with r2/r3 recency) + the
# d34_dataprep_summary re-cert (round-3's one red row, oracle CAST
# fixed). The later round-4 waves grew the registry past 50 unchecked,
# so the ledger closes over r4+r5 instead of r4 alone; the r5 remainder
# is the comment list below.
CERT_FIRST: tuple[str, ...] = (
    # -- the final 32 never-driver-checked oracle queries --
    "d01_orc_source",
    "d01_partitioned_read",
    "d01_csv_corrupt",
    "d01_python_datasource",
    "d02_domain_mix",
    "d09_group_mode",
    "d10_observed_scan",
    "d13_percent_rank",
    "d14_rolling_median",
    "d14_zscore_outliers",
    "d16_except_all",
    "d17_levenshtein",
    "d24_mapinarrow",
    "d24_python_udtf",
    "d25_stream_upsert",
    "d25_stream_outer_join",
    "d26_append_finalize",
    "d27_retention",
    "d29_pagerank_2iter",
    "d29_triangle_count",
    "d29_decontaminate",
    "d31_pii_redact",
    "d31_unigram_logprob",
    "d31_ngram_profile",
    "d31_vocab_topk",
    "d31_chunk_text",
    "d32_audio_decode",
    "d35_snapshot_at",
    "d35_mv_merge",
    "d35_snapshot_diff",
    "d35_compact_files",
    "d35_zorder_key",
    # -- re-certification: round-3's one red row, oracle CAST fixed (1) --
    "d34_dataprep_summary",
    # -- NEW in round 4 (4): weighted sampling, skew report, funnel,
    #    deterministic global shuffle --
    "d02_weighted_sample",
    "d10_skew_report",
    "d27_funnel",
    "d34_global_shuffle",
    # -- 13 more never-driver-checked queries in place of canaries: every
    #    component those canaries covered (D04/D06/D08/D18-D21/D33) already
    #    holds >=2 cumulative certifications with r2/r3 recency, so the
    #    slots go to first-time certifications instead — one per component
    #    wherever a component still had an unchecked member --
    "d05_null_safe_join",
    "d07_interval_join",
    "d14_running_distinct",
    "d16_intersect_all",
    "d22_iter_udf",
    "d23_cogrouped_map",
    "d24_posexplode",
    "d27_dynamic_gap_session",
    "d28_dedup_within_watermark",
    "d30_mips_topk",
    "d32_jpeg_meta",
    "d34_shard_manifest",
    "d35_partition_stats",
)
# Round-4 wave additions NOT in this round's 50-slot window
# (pytest-oracle-green now, the declared ROUND-5 rotation — 50 oracle
# queries, exactly one more full window; count cross-checked against
# CERTIFIED.md's never-checked set):
# d02_group_sample (per-domain cap), d31_hash_features (hashing-trick
# featurization), d35_schema_evolution (mergeSchema read),
# d25_stream_semi_join (stream-stream LEFT SEMI join),
# d01_text_source (spark.read.text vs DuckDB read_text, same staged files),
# d01_binary_source (binaryFile whole-file ingest vs read_blob/read_text),
# d14_linear_interpolate (time-weighted gap repair, one WindowExec),
# d26_update_mode (UPDATE output mode, parity-split multi-batch state),
# d27_attribution (join-free last-touch credit assignment),
# d34_token_budget (per-domain greedy-until-exceed mixture enforcement),
# d30_filtered_knn (pre-filter metadata kNN, equi-key broadcast),
# d31_block_dedup (repeated 12-word-block removal, ownership window),
# d10_corr_matrix (C(n,2) Pearson correlations in one aggregate pass),
# d30_range_search (similarity-floor radius search, window-free),
# d02_temperature_mix (alpha=0.5 language rebalancing, data-derived
# IEEE-exact keep rates, md5-bucket admission),
# d26_chained_agg (hourly->daily chained stateful aggregation, Spark-4
# multi-stateful-operator support, closed-form watermark oracle),
# d25_stream_full_outer (stream-stream FULL OUTER — completes the join
# matrix; per-side eviction bounds measured at two SFs),
# d35_cdc_deletes (tombstone-aware last-change-wins MERGE),
# d35_write_audit_publish (staged write, checksum audit, atomic rename),
# d35_dynamic_overwrite (partition-scoped backfill, dynamic mode),
# d23_grouped_arrow (Spark-4 applyInArrow grouped map),
# d31_keywords (integer-exact tf/df keyword top-k),
# d12_unpivot (melt via Expand, inverse of d12_pivot),
# d10_psi_drift (population-stability drift gate, smoothed bins),
# d34_dataset_card (per-slice datasheet stats, exact percentiles),
# d31_unicode_clean (NFC + control scrub, byte-equality md5 oracle),
# d22_arrow_udf (useArrow=True row-semantics UDF, completes the ladder),
# d31_gopher_filter (published Gopher quality-rule battery),
# d14_mad_outliers (median/MAD robust outlier twin of zscore),
# d14_time_range_sum (interval-bounded RANGE frame, epoch-us exact),
# d27_top_paths (frequent first-3 event journeys, one-shuffle agg),
# d24_inline (typed generator over array<struct>, fused field select),
# d03_join_hints (merge-hint strategy override, plan-asserted SMJ),
# d15_paginate (total-order OFFSET/LIMIT page, keyset guidance),
# d19_decimal_exact (DECIMAL(18,4) money sums, canonical-string oracle),
# d31_langid_eval (confusion matrix + per-class recall of lang-ID),
# d03_bucketed_join (bucket-aligned SMJ + agg, zero hash exchanges),
# d01_dynamic_pruning (runtime partition filter injected from the dim),
# d34_repro_fingerprint (order-independent XOR content fingerprint),
# d01_json_corrupt (DROPMALFORMED NDJSON vs ignore_errors, same bytes),
# d33_standard_scaler (closed-form z-score oracle for a real Estimator),
# d21_map_funcs (map_from_entries/map_filter/transform_values/explode),
# d25_stream_right_outer (fifth stream-join type; purchase-side eviction
# bound reused verbatim from the measured full-outer),
# d29_incremental_dedup (new-batch-vs-corpus-index admit/reject verdict),
# d10_histogram (equi-width profile, width_bucket parity),
# d31_html_strip (comment/tag strip + entity unescape, md5 byte oracle),
# d14_locf_fill (last_value IGNORE NULLS forward fill, step repair),
# d12_grouping_flags (data-null vs subtotal-null disambiguation),
# d19_try_arithmetic (try_cast/try_divide dirty-data salvage, audited),
# d30_matryoshka_knn (truncated-dim prefix retrieval, exact on 16/64).
# Non-oracle, pytest-pinned: d33_cross_validation (seeded 2-fold CV,
# determinism + unregularized-winner assertions), d11_freq_items
# (KPS heavy hitters, no-false-negative property), d33_als_recs
# (seeded rank-4 implicit ALS, determinism + coverage),
# d26_late_drop_metrics (numRowsDroppedByWatermark as a queryable
# observable, measured post-aggregation semantics pinned).
# Non-oracle by design, pytest-pinned: d33_logreg_auc (seeded linear
# probe over embeddings, determinism + AUC-floor assertions),
# d33_kmeans (seeded k-means||, determinism + scatter-reduction
# assertions, size-ranked output invariant to cluster-id assignment).


def _load_all() -> None:
    """Import every module that registers declared queries, then reorder the
    registry so the certification set occupies the first slots."""
    global _LOADED
    if _LOADED:
        return
    from conceptnetwork_spark.operators import (  # noqa: F401
        relational,
        subqueries,
        composite2,
        composite3,
        graph,
        sampling,
        scalar,
        udf,
        dedup,
        similarity,
        text,
        multimodal,
        ml,
        pipeline,
    )
    from conceptnetwork_spark.sources import formats, pydatasource  # noqa: F401
    from conceptnetwork_spark.streaming import ops, stateful  # noqa: F401

    if not stateful.TWSP_AVAILABLE:
        # driver-side only (module import would re-warn from every Python
        # UDF worker): surface the one env-gated query loudly, once
        import warnings

        warnings.warn(
            "d25_first_seen_tws (transformWithStateInPandas) NOT "
            "registered: google.protobuf is unavailable in this "
            "environment; the operator is implemented and oracle-backed "
            "but requires cluster deps",
            RuntimeWarning,
            stacklevel=2,
        )

    missing = [n for n in CERT_FIRST if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"CERT_FIRST names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in CERT_FIRST}
    ordered.update((n, d) for n, d in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)

    _LOADED = True
