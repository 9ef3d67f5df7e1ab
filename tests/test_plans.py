"""Physical-plan shape assertions: the scale-critical properties must be
visible in `.explain` output — pushdown reaching the parquet scan, dimension
broadcasts, top-k avoiding a global sort (SURVEY §4)."""

from conceptnetwork_spark.registry import queries
from tests.conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    df = queries()[name](spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_d01_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "d01_scan_filter")
    assert "PushedFilters" in plan and "l_quantity" in plan
    # column pruning: the scan must not read the 16-col lineitem schema
    assert "l_comment" not in plan
    assert "ReadSchema" in plan


def test_d04_dimensions_broadcast(spark):
    plan = _plan(spark, "d04_star_join")
    assert "BroadcastHashJoin" in plan


def test_d15_topk_no_global_sort(spark):
    plan = _plan(spark, "d15_topk")
    assert "TakeOrderedAndProject" in plan


def test_d04_q3_composite_plan(spark):
    """Q3 shape: filters pushed to every scan, top-k without global sort."""
    plan = _plan(spark, "d04_q3_shipping")
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan and "c_mktsegment" in plan
    # partial+final agg around the shuffle
    assert plan.count("HashAggregate") >= 2


def test_d04_q18_preagg_as_join_reducer(spark):
    """Q18: the HAVING aggregate must run before (and feed) the orders join
    — partial+final agg pair present, no raw-lineitem join."""
    plan = _plan(spark, "d04_q18_big_orders")
    assert plan.count("HashAggregate") >= 2
    assert "Join" in plan


def test_d08_asof_single_shuffle_window(spark):
    """The as-of union-sort form: one running-last window, no nested-loop or
    cartesian fallback (the join+filter+rank form would show one)."""
    plan = _plan(spark, "d08_asof_join")
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d09_q17_decorrelated(spark):
    """The correlated scalar subquery must be rewritten to aggregate+join —
    no per-outer-row subquery node may survive in the physical plan."""
    plan = _plan(spark, "d09_q17_small_qty")
    assert "Subquery" not in plan
    assert plan.count("HashAggregate") >= 4  # inner avg + outer sum, partial+final


def test_d09_partial_aggregation(spark):
    plan = _plan(spark, "d09_hash_agg")
    # partial (map-side) + final aggregate pair
    assert plan.count("HashAggregate") >= 2


def test_d06_semi_join_operator(spark):
    plan = _plan(spark, "d06_semi_join")
    assert "LeftSemi" in plan


def test_dataprep_parse_codegen(spark, tmp_path):
    """The dataprep parse path must stay inside WholeStageCodegen (no Python
    in the hot path)."""
    p = tmp_path / "lines.txt"
    p.write_text("1,m\n2,f\n\nbad\n")
    from conceptnetwork_spark.sources.dataprep import parse_lines, read_text

    df = parse_lines(read_text(spark, str(p)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" is the simpleString marker for a WholeStageCodegen span
    assert "WholeStageCodegen" in plan or "*(1)" in plan, plan
    assert df.count() == 2


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key join with NO Exchange on either
    side — the write-time shuffle is amortized across every later join."""
    from conceptnetwork_spark.sources.bucketed import cocluster_join, write_bucketed

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "t_orders_b", "custkey", str(tmp_path / "ob"), n_buckets=8,
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "t_customer_b", "custkey", str(tmp_path / "cb"), n_buckets=8,
    )
    try:
        # planner's choice: never a shuffle exchange (may broadcast locally)
        joined = cocluster_join(spark, "t_orders_b", "t_customer_b", "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # the 100 TB plan: forced sort-merge over aligned buckets — no
        # Exchange of any kind, bucket layout actually used
        merged = cocluster_join(
            spark, "t_orders_b", "t_customer_b", "custkey", force_merge=True
        )
        mplan = merged._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in mplan, mplan
        assert "Exchange" not in mplan, mplan
        assert "Bucketed: true" in mplan, mplan
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_d09_q15_view_reuse_no_subquery_probe(spark):
    """Q15: the revenue view's max must be a broadcast scalar join, never a
    per-row subquery; date filter pushed to the lineitem scan."""
    plan = _plan(spark, "d09_q15_top_supplier")
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_d09_q21_no_correlated_probes(spark):
    """Q21: the double-EXISTS must be decorrelated to per-order aggregates —
    partial+final agg pairs, no nested-loop fallback."""
    plan = _plan(spark, "d09_q21_waiting")
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d09_q14_broadcast_pruned_dim(spark):
    """Q14: part broadcasts, and the broadcast side reads only the two
    columns the query touches (pruning reaches the dim scan)."""
    plan = _plan(spark, "d09_q14_promo")
    assert "BroadcastHashJoin" in plan
    assert "p_retailprice" not in plan  # pruned from the part scan


def test_d04_q8_single_agg_pass(spark):
    """Q8: numerator and denominator of the market-share ratio come from ONE
    aggregation pass (no double scan of the joined fact)."""
    plan = _plan(spark, "d04_q8_market_share")
    # exactly one partial+final pair over the join output (plus AQE copies)
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan and "p_type" in plan


def test_d09_q6_pure_scan_plan(spark):
    """Q6 is the pushdown litmus test: all predicates reach the scan, the
    ReadSchema is the 4 touched columns, and there is no join or exchange
    beyond the single-row final agg."""
    plan = _plan(spark, "d09_q6_forecast_revenue")
    assert "PushedFilters" in plan
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in plan
    assert "Join" not in plan
    assert "l_returnflag" not in plan  # pruned
    assert plan.count("HashAggregate") >= 2  # partial+final


def test_d04_q2_decorrelated_broadcast_min(spark):
    """Q2: the correlated per-region min must be a broadcast agg join, not
    a per-row subquery probe or nested loop."""
    plan = _plan(spark, "d04_q2_min_acctbal_supplier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_d09_q9_selective_dim_broadcast(spark):
    """Q9: the p_name filter is on the broadcast part side; lineitem rows
    are pruned at the probe before the orders shuffle."""
    plan = _plan(spark, "d09_q9_product_profit")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan and "p_name" in plan


def test_d06_q20_semi_join_from_aggregate(spark):
    """Q20: the qty>avg threshold set feeds a semi join; no nested-loop
    fallback anywhere in the chain."""
    plan = _plan(spark, "d06_q20_heavy_suppliers")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_d12_pivot_no_value_discovery_job(spark):
    """Explicit pivot values: the plan must be pure aggregates over the
    joins — no separate distinct-collection pass (which an implicit pivot
    runs driver-side before planning), and the dims stay broadcast."""
    plan = _plan(spark, "d12_pivot")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_d30_quantize_single_pass(spark):
    """Normalize+quantize is per-row math: exactly one exchange (the
    presentation sort), no aggregate, no join."""
    plan = _plan(spark, "d30_quantize_int8")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_d09_arg_max_partial_final(spark):
    """max_by aggregates partial+final around one shuffle — no window sort
    of the whole table (the row_number formulation's cost). Struct-keyed
    max_by compiles to SortAggregate (structs aren't hash-aggregable); the
    scale property is the partial_max_by before the exchange."""
    plan = _plan(spark, "d09_arg_max")
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_d16_union_by_name_pushed_filters(spark):
    """Both union branches keep their filters at the scans."""
    plan = _plan(spark, "d16_union_by_name")
    assert "Union" in plan
    assert plan.count("PushedFilters: [IsNotNull") >= 1 or "PushedFilters" in plan


def test_d10_distinct_partial_final(spark):
    """Row-level distinct compiles to partial+final hash aggregate over the
    pruned 2-column projection — never a global shuffle of full rows."""
    plan = _plan(spark, "d10_distinct")
    assert plan.count("HashAggregate") >= 2
    assert "c_name" not in plan  # pruned


def test_d34_dataprep_fused_plan(spark):
    """The end-to-end dataprep composite must stay one fused declarative
    plan: no Python eval anywhere (every stage is codegen'd SQL), the
    dedup agg partial+final, and no cartesian/BNLJ fallback from the
    semi-join."""
    plan = _plan(spark, "d34_llm_dataprep")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # column pruning: untouched documents columns must not be read
    assert "ReadSchema" in plan


def test_d23_mean_center_broadcast_join(spark):
    """The scalable D23 headline must broadcast the tiny per-key means back
    onto the stream — no low-cardinality grouped shuffle of the full rows,
    no Python workers anywhere in the plan."""
    plan = _plan(spark, "d23_mean_center")
    assert "BroadcastHashJoin" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_d01_csv_source_no_inference_scan(spark):
    """CSV connector: explicit schema (no inference job) and the filter
    evaluated over the parsed columns."""
    plan = _plan(spark, "d01_csv_source")
    assert "Scan csv" in plan
    assert "n_comment" not in plan  # projection pruned before the plan


def test_d31_pii_redact_map_only(spark):
    """PII redaction is pure per-row regexp work until the presentation
    sort: exactly one Exchange (the final orderBy) may appear."""
    plan = _plan(spark, "d31_pii_redact")
    assert plan.count("Exchange") <= 1
    # all three outputs are regexp expressions over the pruned 2-col scan
    assert "regexp_extract_all" in plan and "ReadSchema: struct<doc_id" in plan


def test_d31_repetition_partial_aggregation(spark):
    """The (doc_id, term) word-count aggregate must map-side-combine: a
    partial+final HashAggregate pair per groupBy level."""
    plan = _plan(spark, "d31_repetition")
    assert plan.count("HashAggregate") >= 4  # two groupBys x partial+final


def test_d34_sequence_pack_single_window_shuffle(spark):
    """Packing shuffles once on (split, shard) for the cumulative sum; the
    token count and bucket assignment are map-side."""
    plan = _plan(spark, "d34_sequence_pack")
    assert "Window" in plan
    # window exchange + presentation sort exchange, nothing else
    assert plan.count("Exchange") <= 2


def test_d13_percent_rank_filter_pushed(spark):
    plan = _plan(spark, "d13_percent_rank")
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_d35_snapshot_time_predicate_pushed(spark):
    """The AS-OF time cutoff must reach the scan (partition pruning on a
    date-partitioned log at scale)."""
    plan = _plan(spark, "d35_snapshot_at")
    assert "PushedFilters" in plan and "ts" in plan


def test_d31_unigram_vocab_join_shape(spark):
    """tf joins vocab on term as a real shuffle join (both sides corpus-
    sized at scale); the corpus-total scalar must broadcast."""
    plan = _plan(spark, "d31_unigram_logprob")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("HashAggregate") >= 4


def test_d27_retention_partial_finals(spark):
    """Both aggregates (first-seen, matrix rollup) must map-side-combine;
    no cartesian anywhere in the join chain."""
    plan = _plan(spark, "d27_retention")
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_d29_pagerank_broadcast_scalars(spark):
    """The node-count scalar must ride as a broadcast, never a cartesian;
    rank state joins shuffle on the key."""
    plan = _plan(spark, "d29_pagerank_2iter")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_d35_mv_merge_partial_states(spark):
    """Base, delta, and merge aggregates must all map-side-combine (three
    partial+final pairs); the merge never rescans raw events."""
    plan = _plan(spark, "d35_mv_merge")
    assert plan.count("HashAggregate") >= 6
    assert "CartesianProduct" not in plan


def test_d31_ngram_profile_no_self_join(spark):
    """Bigrams come from a map-side array zip — the plan must contain no
    join at all before the top-k window."""
    plan = _plan(spark, "d31_ngram_profile")
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 2


def test_d31_vocab_topk_partial_agg_and_topk(spark):
    """Term counting must map-side-combine over the exploded token stream;
    the top-k runs over the reduced unique-term table, never raw tokens."""
    plan = _plan(spark, "d31_vocab_topk")
    assert plan.count("HashAggregate") >= 2
    assert "Generate" in plan  # explode stays in the scan stage
    assert "Window" in plan


def test_d31_chunk_text_map_only(spark):
    """Chunking is embarrassingly parallel: no join, no aggregate, no
    exchange before the presentation sort."""
    plan = _plan(spark, "d31_chunk_text")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Generate" in plan


def test_d29_decontaminate_broadcasts_benchmark(spark):
    """The benchmark n-gram set must ride as a broadcast; the candidate
    (corpus) side must NOT shuffle before the hash join."""
    plan = _plan(spark, "d29_decontaminate")
    assert "BroadcastExchange" in plan
    assert "BroadcastHashJoin" in plan


def test_d14_zscore_broadcasts_stats(spark):
    """Per-key (mu, sigma) is a tiny agg broadcast back onto the stream —
    the events themselves must not shuffle for the join."""
    plan = _plan(spark, "d14_zscore_outliers")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # partial+final stats agg


def test_d35_snapshot_diff_single_scan_no_join(spark):
    """Both AS-OF states come from ONE scan and ONE partial+final agg
    (conditional max(struct) per snapshot) — no window, no self-join."""
    plan = _plan(spark, "d35_snapshot_diff")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    # struct-keyed max_by aggregates as SortAggregate (struct buffers are
    # not hash-aggregable) — the load-bearing property is partial+final
    # combine, i.e. exactly two aggregate nodes around one exchange
    assert plan.count("Aggregate") == 2
    assert "ts" in plan and "PushedFilters" in plan  # T2 cutoff at the scan


def test_d29_triangle_count_no_cartesian(spark):
    """Pair generation and the triangle closure are equi-joins only."""
    plan = _plan(spark, "d29_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or plan.count("BroadcastNestedLoopJoin") <= 2  # 1-row agg crossJoins only


def test_d01_orc_pushdown(spark):
    """The ORC scan must carry the acctbal predicate as a pushed filter and
    prune to the 3 projected columns."""
    plan = _plan(spark, "d01_orc_source")
    assert "Scan orc" in plan
    assert "PushedFilters" in plan and "s_acctbal" in plan


def test_d01_partitioned_read_prunes(spark):
    """The partition predicate must become a PartitionFilter (directory
    pruning), NOT a row-level PushedFilter over all partitions."""
    plan = _plan(spark, "d01_partitioned_read")
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan


def test_d09_group_mode_two_stacked_partial_aggs(spark):
    """Both aggregations (count per pair, arg-min per key) must map-side-
    combine; no window/sort in the plan."""
    plan = _plan(spark, "d09_group_mode")
    assert plan.count("Aggregate") >= 4  # two partial+final pairs
    assert "Window" not in plan


def test_d24_mapinarrow_jvm_prefilter(spark):
    """The returnflag filter and 5-column projection must run BEFORE the
    Python crossing (pushed to the scan), and the crossing must be the
    Arrow-native operator."""
    plan = _plan(spark, "d24_mapinarrow")
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "PythonMapInArrow" in plan
    assert "PushedFilters" in plan and "l_returnflag" in plan


def test_d35_compact_layout(spark, tmp_path):
    """Compaction must produce <= target files with disjoint event_id ranges
    (range clustering, so post-compaction scans prune by file min/max)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from conceptnetwork_spark.operators.pipeline import (
        COMPACT_TARGET_FILES,
        compact_dir,
    )

    frag = str(tmp_path / "frag")
    packed = str(tmp_path / "packed")
    spark.read.parquet(f"{SF_ORACLE}/events.parquet").repartition(32).write.parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) == 32
    compact_dir(spark, frag, packed, COMPACT_TARGET_FILES)
    files = sorted(glob.glob(os.path.join(packed, "*.parquet")))
    assert 1 <= len(files) <= COMPACT_TARGET_FILES
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["event_id"])
        ids = t.column("event_id").to_pylist()
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"


def test_d35_zorder_pure_codegen(spark):
    """The Morton interleave must stay inside WholeStageCodegen — no UDF, no
    exchange before the presentation sort."""
    plan = _plan(spark, "d35_zorder_key")
    assert "Python" not in plan
    assert "HashAggregate" not in plan and "Join" not in plan


def test_d24_python_udtf_prefiltered(spark):
    """The partkey filter must run BEFORE the Python UDTF crossing (pushed
    to the parquet scan), bounding what crosses into Python."""
    plan = _plan(spark, "d24_python_udtf")
    assert "PythonUDTF" in plan
    assert "PushedFilters" in plan and "p_partkey" in plan


def test_d01_python_datasource_partitioned_scan(spark):
    """The custom source must appear as a planned BatchScan (DSv2) and honor
    its partitions() split plan (8 tasks, checked via the RDD)."""
    from conceptnetwork_spark.operators import relational  # noqa: F401  (registry load)
    from conceptnetwork_spark.registry import queries

    df = queries()["d01_python_datasource"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan synthrange" in plan
    from conceptnetwork_spark.sources.pydatasource import SYNTH_PARTS, SynthRangeSource  # noqa: F401

    src = spark.read.format("synthrange").load()
    assert src.rdd.getNumPartitions() == SYNTH_PARTS


def test_d10_observed_scan_metrics(spark):
    """The observe metrics must equal an independent aggregation, and the
    observation must not add a job or exchange to the plan."""
    from conceptnetwork_spark.registry import queries

    df = queries()["d10_observed_scan"](spark, SF_ORACLE)
    n = df.count()  # action completes the observation
    metrics = df._cn_observation.get
    assert metrics["n_rows"] == n
    import pyspark.sql.functions as F

    direct = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .where(F.col("o_totalprice") > 150000)
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
        .collect()[0]["s"]
    )
    assert metrics["total_price"] == direct
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan


def test_d02_weighted_sample_topk_heap(spark):
    """Efraimidis–Spirakis selection must be a TakeOrderedAndProject (per-
    partition heaps + driver merge of K rows), never a global sort of the
    scored corpus; the scoring itself is pure codegen (no Python)."""
    plan = _plan(spark, "d02_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
    assert "Join" not in plan and "HashAggregate" not in plan


def test_d10_skew_report_topk_and_broadcast_total(spark):
    """Heavy-hitter selection is a top-k over the reduced (key, count)
    table; the 2-scalar total rides as a broadcast; the count agg
    map-side-combines."""
    plan = _plan(spark, "d10_skew_report")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_d27_funnel_cokeyed_aggs(spark):
    """All three stage aggregations key on user_id (exchange reuse across
    stages); conditional MINs map-side-combine; no cartesian, no window
    over the raw log."""
    plan = _plan(spark, "d27_funnel")
    assert plan.count("partial_min") >= 2
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_d34_global_shuffle_single_shard_exchange(spark):
    """The permutation must cost ONE hash exchange on the shard key plus
    the presentation sort — no global sort of the corpus by the shuffle
    key, no Python."""
    plan = _plan(spark, "d34_global_shuffle")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan
    assert "Window" in plan


def test_d02_group_sample_partitioned_window(spark):
    """The per-domain cap is a PARTITIONED window (parallel across
    domains), never a global sort; rank assignment is pure codegen."""
    plan = _plan(spark, "d02_group_sample")
    assert "Window" in plan
    assert "Python" not in plan
    assert "partitionBy" not in plan or True  # spec renders inside Window node
    assert plan.count("Exchange hashpartitioning") == 1


def test_d31_hash_features_partial_agg_no_vocab(spark):
    """Hashing-trick features: the (doc, bucket) count map-side-combines
    and there is NO join (no vocabulary/dictionary pass anywhere)."""
    plan = _plan(spark, "d31_hash_features")
    assert "partial_count" in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_d35_schema_evolution_scan_prunes(spark):
    """The merged-schema scan still projects only the 4 output columns and
    stays a plain parquet scan (evolution is metadata-only)."""
    plan = _plan(spark, "d35_schema_evolution")
    assert "Scan parquet" in plan
    assert "props" not in plan  # never read; schema merge adds no columns
    assert "Join" not in plan and "HashAggregate" not in plan


def test_d14_interpolate_single_window_pass(spark):
    """All four IGNORE-NULLS carries must evaluate in ONE WindowExec (same
    partitioning+ordering), with the event_type filter at the scan and no
    join against the non-null subset."""
    plan = _plan(spark, "d14_linear_interpolate")
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "click" in plan  # filter reached the scan


def test_d27_attribution_join_free(spark):
    """Last-touch attribution must be the single-window spelling: no join,
    one user_id exchange + the output sort, IN-filter at the scan."""
    plan = _plan(spark, "d27_attribution")
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_d34_token_budget_single_window_shuffle(spark):
    """Budget admission = one per-source running sum: exactly one window,
    no join, no aggregate pass before it."""
    plan = _plan(spark, "d34_token_budget")
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_d01_text_source_filter_at_scan(spark):
    """The non-empty-line predicate must reach the text scan (no separate
    filter stage over raw lines)."""
    plan = _plan(spark, "d01_text_source")
    assert "FileScan text" in plan
    assert "length(value" in plan


def test_d01_binary_source_prunes_columns(spark):
    """binaryFile scan must prune to path/length/content — reading
    modificationTime would widen every file's row unnecessarily."""
    plan = _plan(spark, "d01_binary_source")
    assert "FileScan binaryFile" in plan
    assert "modificationTime" not in plan


def test_d30_filtered_knn_prefilter_equi_broadcast(spark):
    """The label predicate must fold INTO the broadcast join as an equi-key
    (BroadcastHashJoin) — pre-filter semantics; a post-filter plan would
    nested-loop the full corpus (BroadcastNestedLoopJoin) and filter after
    scoring."""
    plan = _plan(spark, "d30_filtered_knn")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_d31_block_dedup_no_self_join(spark):
    """Block ownership is a window over the exploded blocks — one shuffle
    on the block key, never a self-join of the corpus against itself."""
    plan = _plan(spark, "d31_block_dedup")
    assert "Join" not in plan
    assert "Generate" in plan  # the explode producing blocks


def test_d10_corr_matrix_single_scan(spark):
    """All six correlations must come from ONE pass over lineitem
    (partial+final agg pair) — the per-pair loop would scan six times."""
    plan = _plan(spark, "d10_corr_matrix")
    assert plan.count("FileScan") == 1
    assert plan.count("HashAggregate") >= 2


def test_d30_range_search_no_window(spark):
    """Radius search must be scan -> broadcast-join -> filter: no per-query
    top-k window, no corpus shuffle (the one Exchange is the output sort)."""
    plan = _plan(spark, "d30_range_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_d05_null_safe_join_stays_hash_join(spark):
    """<=> must plan as a hash join (null hashes to a regular bucket) —
    a nested-loop fallback would be a scale killer on the fact side."""
    plan = _plan(spark, "d05_null_safe_join")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_d07_interval_join_is_bucketized_equi_join(spark):
    """The point-in-interval join must plan as a HASH join on the month
    bucket (broadcast here; shuffle-hash at scale) — the naive BETWEEN
    theta join would be a BroadcastNestedLoopJoin over the whole fact."""
    plan = _plan(spark, "d07_interval_join")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_d12_unpivot_is_map_side_expand(spark):
    """Unpivot must plan as a codegen Expand projection — no join, no
    aggregate; the only exchange is the final presentation sort."""
    plan = _plan(spark, "d12_unpivot")
    assert "Expand" in plan
    assert "Join" not in plan


def test_d31_unicode_clean_is_arrow_batched(spark):
    """The NFC cleaner must cross to Python via Arrow batches
    (ArrowEvalPython), never the row-at-a-time pickle path."""
    plan = _plan(spark, "d31_unicode_clean")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_d03_join_hints_forces_sort_merge(spark):
    """The merge hint must override the optimizer's broadcast choice
    (customer is small enough to broadcast at test SF) and plan a
    SortMergeJoin — proving strategy hints actually steer the planner."""
    plan = _plan(spark, "d03_join_hints")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_d03_bucketed_join_has_no_hash_exchange(spark):
    """Both sides bucket-aligned on the join key: the SortMergeJoin AND
    the downstream groupBy on the same key must run with ZERO hash
    exchanges — the only Exchange allowed is the final presentation
    sort's range partitioning."""
    plan = _plan(spark, "d03_bucketed_join")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan


def test_d01_dynamic_pruning_injects_runtime_filter(spark):
    """With the selective predicate on the DIM side only, the partitioned
    fact scan must carry a dynamicpruningexpression partition filter —
    proof the optimizer prunes partitions at RUNTIME from the broadcast."""
    plan = _plan(spark, "d01_dynamic_pruning")
    assert "dynamicpruning" in plan.lower()


def test_aqe_coalesces_shuffle_partitions(spark):
    """AQE must collapse the 32 configured shuffle partitions of a small
    aggregate into few actual partitions at runtime — the mechanism that
    right-sizes reducer counts per-stage at 100 TB without hand-tuning
    spark.sql.shuffle.partitions per query."""
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 100_000, 1, 8)
        .groupBy((F.col("id") % 100).alias("k"))
        .count()
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan
    assert df.rdd.getNumPartitions() < 32


def test_aqe_splits_skewed_join_partition(spark):
    """With one join key holding 90% of the rows, AQE's skew-join must
    split the oversized shuffle partition (SortMergeJoin(skew=true)) —
    the runtime complement to the manual salting of
    d03_salted_skew_join. Thresholds are lowered to make toy data
    exceed them; restored after."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 500_000, 1, 8).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.range(0, 1_000, 1, 4).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(small, "k")
        assert len(j.collect()) == 450_100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:800]
    finally:
        for k in confs:
            spark.conf.unset(k)


def test_d24_arrow_udtf_filter_below_python_crossing(spark):
    """The Arrow-native UDTF plan must keep the id filter JVM-side BELOW
    the ArrowEvalPythonUDTF crossing (pushed to the parquet scan) and
    prune the part schema to the three consumed columns — the Python
    boundary only ever sees pre-filtered Arrow batches."""
    plan = _plan(spark, "d24_arrow_native_udtf")
    assert "ArrowEvalPythonUDTF" in plan
    assert "PushedFilters" in plan and "p_partkey" in plan
    assert "p_comment" not in plan  # pruned
    crossing = plan.index("ArrowEvalPythonUDTF")
    scan = plan.index("Scan parquet")
    assert scan > crossing  # tree prints top-down: scan (leaf) below UDTF


def test_d30_hybrid_rrf_limits_below_windows(spark):
    """Both rank legs must get their top-100 limit pushed BELOW the
    row_number window (LimitPushDownThroughWindow -> TakeOrderedAndProject
    under each Window), so the global rank never sorts the full corpus;
    fusion is a full-outer join of two <=100-row rank lists."""
    plan = _plan(spark, "d30_hybrid_rrf")
    # one final top-20 + one pushed top-100 per leg
    assert plan.count("TakeOrderedAndProject") >= 3
    assert plan.count("Window [") == 2
    assert "FullOuter" in plan
    # the pushed limits sit BELOW their windows (tree prints top-down)
    first_window = plan.index("Window [")
    assert plan.index("TakeOrderedAndProject(limit=100", first_window) > first_window


def test_d27_markov_single_user_exchange(spark):
    """The journey sequence (lead window) is the only per-user shuffle;
    the pair counting partial-aggregates map-side before its exchange and
    the row-probability window runs over the tiny (src,dst) table."""
    import re

    plan = _plan(spark, "d27_markov_transitions")
    assert len(re.findall(r"Exchange hashpartitioning\(user_id", plan)) == 1
    assert "partial_count" in plan  # map-side combine before the pair agg
    assert plan.count("Window [") == 2  # lead + per-src sum, nothing more


def test_d10_expectations_fused_scans(spark):
    """All single-table rules fuse into one conditional-aggregation scan
    per table; referential integrity computes checked+orphans in ONE
    lineitem pass via a left join. No per-rule rescans: exactly 2 scans
    of orders (rules + join build) and 2 of lineitem (rules + ref leg)."""
    plan = _plan(spark, "d10_expectations")
    assert plan.count("orders.parquet") == 2
    assert plan.count("lineitem.parquet") == 2
    assert "partial_sum" in plan  # conditional aggs combine map-side


def test_d31_sentence_dedup_hash_only_ownership_exchange(spark):
    """The global sentence-ownership shuffle must carry only (doc_id, pos,
    xxhash64) — the sentence text itself never rides the ownership
    exchange; reconstruction re-reads it colocated with the doc."""
    import re

    plan = _plan(spark, "d31_sentence_dedup")
    m = re.search(
        r"Project \[doc_id#\d+L, pos0#\d+, xxhash64\(seg#\d+, 42\) AS h#\d+L\]",
        plan,
    )
    assert m, "ownership exchange input must be the 3-column hash projection"
    assert "Exchange hashpartitioning(h#" in plan


def test_d06_lateral_decorrelated_to_ranked_join(spark):
    """The correlated LATERAL (ORDER BY + LIMIT 2 per customer) must be
    decorrelated into a ranked join — WindowGroupLimit top-2 on the orders
    side, broadcast of the pruned customer segment — never a per-row
    re-execution or a cartesian."""
    plan = _plan(spark, "d06_lateral_topn")
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan and "BUILDING" in plan  # segment at scan


def test_d14_date_bin_single_agg_no_window_exchange(spark):
    """The 6-hour bucket is codegen'd arithmetic on the scan; the rollup is
    hash aggregation only (the distinct-user expansion adds the standard
    second level) — no window operator, no join."""
    plan = _plan(spark, "d14_date_bin_rollup")
    assert "Window [" not in plan
    assert "Join" not in plan
    assert "partial_count" in plan  # map-side combine
    assert plan.count("HashAggregate") >= 4  # two-level distinct expansion


def test_d30_hamming_partial_topk_pushdown(spark):
    """The Hamming scan must keep the 8-byte signature form: sig built in
    the scan-side project, top-10 rank limited map-side (partial
    WindowGroupLimit) before the single qid exchange."""
    plan = _plan(spark, "d30_hamming_topk")
    assert "bit_count" in plan
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final
    assert "BroadcastNestedLoopJoin" in plan  # 5-query side broadcast


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime bloom-filter join pruning (Spark's row-level runtime
    filtering): with a selective filter on the orders side of a shuffle
    join, the optimizer must inject a bloom_filter_agg on the build side
    and a might_contain probe into the lineitem scan filter — at 100 TB
    this prunes most of the fact-side shuffle before it happens. Scoped
    confs lower the size thresholds the sf0.01 inputs can't meet."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = SF_ORACLE
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{sf}/orders.parquet").where(
            "o_totalprice > 400000"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
        assert j.count() > 0  # the filtered join still returns rows
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_d01_nested_schema_pruning(spark):
    """The nested scan must read ONLY the referenced struct subfields:
    customer.o_custkey + the filtered customer.o_orderstatus +
    pricing.o_totalprice — pricing.o_orderpriority / pricing.o_orderdate
    never appear in ReadSchema, and the nested predicate reaches
    PushedFilters."""
    plan = _plan(spark, "d01_nested_pruning")
    assert "ReadSchema" in plan
    assert "o_orderpriority" not in plan
    assert "o_orderdate" not in plan
    assert "o_custkey" in plan and "o_totalprice" in plan
    assert "PushedFilters" in plan and "customer.o_orderstatus" in plan


def test_d35_deletion_vectors_broadcast_anti(spark):
    """DV application must be a broadcast LEFT ANTI on (file_name,
    row_index) — the base files stream through one scan, the tombstone
    side broadcasts; no shuffle of the base table."""
    plan = _plan(spark, "d35_deletion_vectors")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "row_index" in plan and "file_name" in plan
    assert "SortMergeJoin" not in plan


def test_d31_url_parse_map_only(spark):
    """URL build + parse_url decomposition is embarrassingly parallel:
    no join, no aggregate, no exchange before the presentation sort."""
    plan = _plan(spark, "d31_url_parse")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "ParseUrlEvaluator" in plan  # parse_url prints as its evaluator
    assert "PushedFilters" in plan and "2000" in plan  # id bound at the scan


def test_d15_skyline_map_only_candidate_pruning(spark):
    """Distributed skyline: phase 1 MUST be a map-only MapInPandas on the
    scan (no exchange below it — local pruning happens before any data
    crosses the wire); phase 2 is the single-group FlatMapGroupsInPandas
    over the tiny candidate set. No join anywhere — a NOT-EXISTS spelling
    would show a nested-loop join."""
    plan = _plan(spark, "d15_skyline")
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    # the local-skyline MapInPandas sits directly on the scan (map-only):
    # the plan prints top-down, so nothing between the MapInPandas node
    # and the FileScan below it may be an Exchange
    seg = plan[plan.index("MapInPandas") : plan.index("FileScan")]
    assert "Exchange" not in seg


def test_d16_recursive_cte_no_join_fixpoint(spark):
    """The recursive-CTE walk is filter+project iteration: the physical
    plan must contain a recursion node (UnionLoop) and NO join — a
    driver-loop translation would materialize joins per step."""
    plan = _plan(spark, "d16_recursive_cte")
    assert "UnionLoop" in plan or "Recursion" in plan or "CTE" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_d14_cusum_agg_before_window(spark):
    """CUSUM: the per-day hash agg (partial+final) must run BEFORE the
    single-task window — the window sees #days rows, never raw orders."""
    plan = _plan(spark, "d14_cusum")
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan
    # windows operate on the agg output: the agg appears below the window
    assert plan.index("Window") < plan.index("HashAggregate")


def test_d27_multi_touch_single_user_exchange(spark):
    """Multi-touch attribution: journeys shuffle on user_id ONCE — the
    first-purchase aggregate and the position windows reuse the same
    hashpartitioning(user_id) exchange."""
    plan = _plan(spark, "d27_multi_touch")
    import re

    user_exchanges = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(user_exchanges) <= 2  # one per side of the self-join max
    assert "CartesianProduct" not in plan


def test_d31_containment_no_cartesian_hashed_grams(spark):
    """Containment: the pair join must be an equi-join on the gram hash
    (xxhash64 LONG), never a cartesian; raw text must not appear in any
    exchange (only hashes and ids cross the wire)."""
    plan = _plan(spark, "d31_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "xxhash64" in plan


def test_d34_curriculum_distributed_row_number(spark):
    """Curriculum order: the wave numbering must use the two-pass pattern —
    a RANGE exchange on (bucket, doc_id) plus per-range window — never a
    single global-window row_number over the whole table (which would show
    an Exchange SinglePartition directly under the big Window). Since r12
    the numbered relation sits behind a lazy localCheckpoint (shared-RDD
    lineage cut), so the numbering shape is pinned on the pre-checkpoint
    subtree and the declared plan is pinned to carry the cut."""
    from conceptnetwork_spark.operators.pipeline import _curriculum_numbered

    sub = _curriculum_numbered(spark, SF_ORACLE)
    subplan = sub._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(bucket" in subplan
    # pass-2 numbering is a map-only mapInPandas directly on the range
    # exchange — no second exchange (a Window.partitionBy(pid) spelling
    # would re-hash on pid right after the range shuffle)
    end = subplan.rfind("\n", 0, subplan.index("rangepartitioning(bucket"))
    seg = subplan[subplan.index("MapInPandas") : end]
    assert "Exchange" not in seg
    assert "Window [row_number()" not in subplan
    # declared query: numbering happens exactly once behind the lineage
    # cut (a Scan ExistingRDD with the numbered schema), never re-derived
    # per consumer, and still no global row_number window downstream
    plan = _plan(spark, "d34_curriculum_order")
    assert "Scan ExistingRDD[doc_id" in plan
    assert "MapInPandas" not in plan
    assert "Window [row_number()" not in plan


# ---- round-6 wave-6 additions ------------------------------------------------


def test_d14_autocorr_no_join(spark):
    """The lag fan-out must be the single-window + inline-unpivot form —
    a rn-self-join would plan as BroadcastNestedLoopJoin (rn = prn + lag
    mixes both sides and defeats hash-key extraction)."""
    plan = _plan(spark, "d14_autocorr")
    assert "Join" not in plan
    assert "Generate" in plan  # the inline unpivot
    assert "Window" in plan


def test_d35_minmax_file_skip_pure_aggregate(spark):
    plan = _plan(spark, "d35_minmax_file_skip")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final per-file stats


def test_d31_bigram_logprob_persists_shared_base(spark):
    """The (doc, bigram) aggregate feeds three consumers; without the
    persist Catalyst re-tokenizes the corpus once per consumer."""
    plan = _plan(spark, "d31_bigram_logprob")
    assert "InMemoryTableScan" in plan


def test_d22_sql_udf_fully_inlined(spark):
    """SQL-defined functions must cost nothing at runtime: no Python
    evaluation node of any kind may appear — Catalyst inlines both the
    scalar body and the table-function body into the caller's plan."""
    plan = _plan(spark, "d22_sql_udf")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas"):
        assert marker not in plan, marker


def test_d01_parameterized_sql_pushdown(spark):
    """Named-parameter binding happens before optimization: the bound
    predicates must reach the parquet scan like inline literals."""
    plan = _plan(spark, "d01_parameterized_sql")
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_d34_chat_template_no_window(spark):
    """Turn ordering runs as collect-sort-slice inside the user_id
    aggregate (codegen array expressions), never as a global window."""
    plan = _plan(spark, "d34_chat_template")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_d09_pareto_abc_preaggregates(spark):
    """The fact must collapse to per-part revenue BEFORE the global
    cumulative window — the window sees #parts rows, not lineitem."""
    plan = _plan(spark, "d09_pareto_abc")
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_d01_bucket_pruning_selects_one_bucket(spark):
    """The key predicates on the bucketing key must prune the scan to at
    most one bucket per key — visible as SelectedBucketsCount."""
    plan = _plan(spark, "d01_bucket_pruning")
    assert "SelectedBucketsCount" in plan
    import re
    m = re.search(r"SelectedBucketsCount: (\d+) out of 8", plan)
    assert m and int(m.group(1)) <= 3, plan[:500]


def test_d34_bpe_encode_map_only_pruned_scan(spark):
    """The whole encoder folds into codegen'd projections: the only
    exchange is the presentation orderBy, and the scan reads exactly
    (doc_id, text)."""
    plan = _plan(spark, "d34_bpe_encode")
    assert plan.count("Exchange") == 1, plan[:800]
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_d34_quality_classifier_map_only(spark):
    """Inference-as-expression: no shuffle besides the presentation sort,
    no Python eval node — the model runs inside WholeStageCodegen."""
    plan = _plan(spark, "d34_quality_classifier")
    assert plan.count("Exchange") == 1, plan[:800]
    assert "Python" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_d34_pref_pairs_single_agg_exchange(spark):
    """Preference pairs = ONE aggregation keyed by the group id with a
    partial (map-side) pass before the shuffle — no window, no self-join."""
    plan = _plan(spark, "d34_pref_pairs")
    assert "partial_max_by" in plan and "partial_min_by" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]
    assert "Window" not in plan and "Join" not in plan


def test_d11_kmv_topk_never_global_sort(spark):
    """The K smallest hashes must flow through TakeOrderedAndProject
    (per-partition top-K, K rows per partition to the driver) — a global
    Sort under the limit would be the 100 TB failure mode."""
    plan = _plan(spark, "d11_kmv_sketch")
    assert "TakeOrderedAndProject(limit=64" in plan
    assert "Sort [h" not in plan
    # the one-row aggregates combine via broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan


def test_d11_theta_setops_topk_and_broadcasts(spark):
    plan = _plan(spark, "d11_theta_setops")
    assert "TakeOrderedAndProject(limit=64" in plan
    assert "SortMergeJoin" not in plan


def test_d10_gini_preagg_then_one_window(spark):
    """Revenue pre-aggregates per (segment, customer) with a map-side
    partial before any window; the orders join broadcasts the customer
    dimension; sums stay DECIMAL through the aggregates."""
    plan = _plan(spark, "d10_gini")
    assert "partial_sum(cast(o_totalprice" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") == 1
    assert "decimal(12,2)" in plan


def test_d14_holt_grouped_map_after_daily_preagg(spark):
    """The sequential recurrence runs as ONE grouped-map over series keys,
    fed by a map-side-combined daily pre-aggregate — the grouped map sees
    days, not raw events."""
    plan = _plan(spark, "d14_holt_linear")
    assert "FlatMapGroupsInPandas" in plan
    assert "partial_min(value" in plan
    # exactly one exchange feeds the grouped map (plus the daily agg's own
    # and the presentation sort)
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_d27_cohort_ltv_window_on_grid_not_events(spark):
    """The running LTV window must run on the (cohort, age) grid after the
    aggregate; revenue sums stay DECIMAL; the cohort side broadcasts."""
    plan = _plan(spark, "d27_cohort_ltv")
    assert plan.count("Window") == 1
    assert "decimal(12,2)" in plan
    assert "BroadcastHashJoin" in plan


def test_d02_poisson_bootstrap_single_agg_after_explode(spark):
    """All 16 replicates come from ONE scan: the replicate dimension
    explodes map-side into a map-side-combined aggregate — one shuffle of
    16 partial cells, no per-replicate rescan."""
    plan = _plan(spark, "d02_poisson_bootstrap")
    assert "Generate explode" in plan
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]
    assert plan.count("FileScan") == 1


def test_d32_patchify_map_only_fanout(spark):
    """Patch tokenization must be map-only: synth -> decode -> block-sum all
    inside chained mapInPandas tasks, no shuffle before the presentation
    sort, and the scan reads only doc_id."""
    plan = _plan(spark, "d32_image_patchify")
    assert plan.count("Exchange hashpartitioning") == 0, plan[:800]
    assert "MapInPandas" in plan


def test_d32_audio_energy_map_only(spark):
    plan = _plan(spark, "d32_audio_energy")
    assert plan.count("Exchange hashpartitioning") == 0, plan[:800]
    assert "MapInPandas" in plan


def test_d31_readability_map_only(spark):
    """The whole scorer is one codegen'd projection: no shuffle besides the
    presentation sort, no Python eval, scan pruned to (doc_id, text)."""
    plan = _plan(spark, "d31_readability")
    assert plan.count("Exchange hashpartitioning") == 0, plan[:800]
    assert "Python" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_d11_bloom_broadcast_only(spark):
    """The bit relation and member set are broadcast — the probe stream
    never shuffles (no sort-merge join anywhere in the plan)."""
    plan = _plan(spark, "d11_bloom_filter")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_d08_asof_nearest_union_sort_no_join(spark):
    """Nearest-as-of must use the union-sort formulation: one shuffle on
    the key, window carries, and NO join node (the quadratic pair-join is
    the oracle's job, not the engine's)."""
    plan = _plan(spark, "d08_asof_nearest")
    assert "Join" not in plan, plan[:800]
    # two keyed exchanges: the view-side (user, ts) dedup aggregate and the
    # union's user_id window shuffle — never a third
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Window" in plan and "Union" in plan


def test_d15_diversified_topk_group_limit_pushdown(spark):
    """rank<=3 must plan as WindowGroupLimit (map-side per-key pruning) and
    the global limit as TakeOrderedAndProject — never a full sort."""
    plan = _plan(spark, "d15_diversified_topk")
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_d07_band_join_pure_equi_join(spark):
    """The band predicate must NOT plan as a nested-loop range join: the
    bucketed decomposition yields a hash/sort equi-join with the exact
    |Δt| filter applied post-join."""
    plan = _plan(spark, "d07_band_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_d14_rolling_ols_one_window_exec(spark):
    """All five frame sums must share ONE WindowExec over the pre-reduced
    daily series (the raw stream never reaches a window)."""
    plan = _plan(spark, "d14_rolling_ols")
    assert plan.count("Window [") <= 2  # row_number + fused frame sums
    assert "partial_sum(cast(value" in plan  # daily pre-agg is map-side


def test_d31_zipf_topk_no_global_sort(spark):
    """The vocabulary top-100 must flow through TakeOrderedAndProject."""
    plan = _plan(spark, "d31_zipf_fit")
    assert "TakeOrderedAndProject" in plan


def test_d34_span_corruption_map_only(spark):
    """The corruptor is one codegen'd projection of indexed array lambdas:
    no shuffle besides the presentation sort, no Python eval."""
    plan = _plan(spark, "d34_span_corruption")
    assert plan.count("Exchange hashpartitioning") == 0, plan[:800]
    assert "Python" not in plan


def test_d09_hhi_dims_broadcast_fact_single_shuffle(spark):
    """HHI: supplier + nation dims must broadcast; the fact table shuffles
    once — to the (nation, supplier) revenue grid — never into a sort-merge
    against a dimension."""
    plan = _plan(spark, "d09_hhi")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_d31_pii_scrub_map_side_only(spark):
    """PII scrub: customer broadcasts into the probe; templating + regex
    redaction are map-side expressions — the only exchange is the final
    presentation sort (rangepartitioning), no hash-partitioned shuffle."""
    plan = _plan(spark, "d31_pii_scrub")
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan


def test_d35_zorder_no_cartesian(spark):
    """Z-order demo: the Morton code must be codegen'd arithmetic on the
    scan (no Python), neither layout arm may plan a cartesian or
    nested-loop join, and — the point of the distributed two-pass
    row-number — NOTHING may funnel through a single-partition exchange
    (no single-reducer NTILE, no driver-side window over the data).
    The builder runs a KB-sized bucket-count job eagerly and returns the
    LAZY number+assign+aggregate plan, which the pin inspects via the
    _zorder_zone_map split (no persist anywhere — the buckets are
    deterministic fixed-width slices, so pass 2 recomputes them
    bit-identically)."""
    from conceptnetwork_spark.operators.pipeline import _zorder_zone_map

    agg = _zorder_zone_map(spark, SF_ORACLE)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "SinglePartition" not in plan


def test_d30_eval_harness_broadcast_query_bag(spark):
    """Both eval arms (recall + NDCG) score the corpus against a BROADCAST
    5-row query bag — the corpus must never shuffle into a join against
    the queries."""
    from conceptnetwork_spark.operators.similarity import (
        _ndcg_parts,
        _recall_eval_per,
    )

    # the declared plans hide the arms behind a lazy lineage cut (the
    # |Q|-row eval table feeds both union branches) — inspect the UNCUT
    # factored subtrees for the broadcast shape, and the declared plans
    # for the cut + no cartesian
    for factored in (_recall_eval_per, _ndcg_parts):
        plan = factored(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
        assert (
            "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        ), factored.__name__
        assert "CartesianProduct" not in plan, factored.__name__
    for name in ("d30_recall_eval", "d30_ndcg_eval"):
        plan = _plan(spark, name)
        assert "Scan ExistingRDD" in plan, name  # the lineage cut
        assert "CartesianProduct" not in plan, name


def test_d19_logsumexp_broadcast_max_join(spark):
    """The max-shift join must broadcast the |types|-row max table; the
    event scan aggregates partially before any exchange."""
    plan = _plan(spark, "d19_logsumexp")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 4  # daily partial+final, lse partial+final


def test_d34_fim_map_side_only(spark):
    """FIM restructuring must be pure codegen string arithmetic on the
    scan: no Python eval, no hash shuffle — the only exchange is the
    presentation sort (rangepartitioning)."""
    plan = _plan(spark, "d34_fim_transform")
    assert "Python" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SinglePartition" not in plan


def test_d35_compaction_plan_metadata_sized(spark):
    """Compaction planning runs over the FILE LIST, never the data: the
    window partitions per-partition file stats (no global sort over a
    single reducer), and nothing drops to Python."""
    plan = _plan(spark, "d35_compaction_plan")
    assert "Python" not in plan
    assert "SinglePartition" not in plan


def test_d27_retention_single_user_exchange(spark):
    """Retention cohorts: the first-event timestamp is a window MIN over
    the user partitioning — exactly ONE hashpartitioning exchange may
    carry event-volume data (user_id), and the cohort size is a window
    over the counts table, so NO join may appear (a join on a derived
    base table would re-evaluate the event scan into its build side)."""
    plan = _plan(spark, "d27_retention_cohorts")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan[:600]
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_d34_fertility_join_free_single_agg(spark):
    """Tokenizer fertility: lang rides the encode projection — NO join
    (a doc_id self-join would broadcast billions of rows at scale), no
    Python, exactly one aggregation exchange over |langs| groups."""
    plan = _plan(spark, "d34_tokenizer_fertility")
    assert "Join" not in plan
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# Round-10 additions
# ---------------------------------------------------------------------------
def test_d10_cramers_v_cells_only_shuffle(spark):
    """Cramér's V: each fact scan reads ONLY the two categorical columns
    (pruning pin) and aggregates map-side before its exchange — the
    windows and final agg run on the tiny cell relation. No joins of any
    kind; per pair = partial+final agg, so >=4 HashAggregates."""
    plan = _plan(spark, "d10_cramers_v")
    assert "l_comment" not in plan and "l_quantity" not in plan
    assert "o_totalprice" not in plan
    assert plan.count("HashAggregate") >= 4
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_d10_stable_moments_broadcast_means(spark):
    """Two-pass moments: the |groups|-row mean table must BROADCAST back
    onto the fact scan (never a shuffle join on the 3-value skew key),
    and both passes keep partial+final aggregation."""
    plan = _plan(spark, "d10_stable_moments")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 4


def test_d27_interval_merge_single_exchange(spark):
    """Gaps-and-islands: ONE user_id hash exchange must serve both
    windows and both groupBys (HashPartitioning(user_id) satisfies the
    (user_id, island) clustering) — a second hash exchange means Catalyst
    lost the subset-distribution reuse and the plan re-shuffles the fact
    table."""
    plan = _plan(spark, "d27_interval_merge")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Window") >= 2


def test_d29_shard_dup_matrix_no_allpairs(spark):
    """Shard dup matrix: the self-join runs on the AGGREGATED
    (block, shard, n) relation — bounded fanout, no cartesian/BNLJ —
    and the documents scan reads only (doc_id, text)."""
    plan = _plan(spark, "d29_shard_dup_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "BatchEvalPython" not in plan


def test_d34_seq_len_histogram_map_side_tokenize(spark):
    """Sequence-length histogram: tokenize+bucket must stay in codegen
    (no Python), ONE map-combinable hash exchange carries the bucket
    rows; the cumulative window's single-partition pass runs on the
    |buckets|-row relation only (the one sanctioned SinglePartition)."""
    plan = _plan(spark, "d34_seq_len_histogram")
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ReadSchema: struct<text:string>" in plan


def test_d14_twap_single_exchange(spark):
    """TWAP: one event_type exchange serves the LEAD window and the final
    aggregate (subset-distribution reuse); no Python, no join."""
    plan = _plan(spark, "d14_twap")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_d14_winsorize_broadcast_fences(spark):
    """Winsorize: the |types|-row fence table must broadcast back onto the
    fact scan (map-side clamp), never a shuffle join on the type key; the
    scan reads only (event_type, value)."""
    plan = _plan(spark, "d14_winsorize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ReadSchema: struct<event_type:string,value:double>" in plan


def test_d27_audience_overlap_bounded_fanout(spark):
    """Audience overlap: the self-join must run on the DISTINCTed
    (type, user) relation — per-user fanout bounded by |types|² — with the
    set-size table broadcast; no cartesian anywhere, scan pruned to two
    columns."""
    from conceptnetwork_spark.operators.relational import _audience_sets

    plan = _plan(spark, "d27_audience_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan  # the shared-distinct lineage cut
    # the pruned two-column scan sits behind the cut — check the factored
    # uncut relation
    sub = _audience_sets(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<user_id:bigint,event_type:string>" in sub


def test_d34_soft_dedup_weights_block_dedup_skeleton(spark):
    """Soft-dedup weights: same exchange skeleton as d31_block_dedup (one
    block-key window pass), per-doc rollup, and a join that re-admits
    blockless docs; everything codegen, no Python."""
    plan = _plan(spark, "d34_soft_dedup_weights")
    assert "BatchEvalPython" not in plan
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_d29_exact_substr_anchor_join_no_allpairs(spark):
    """ExactSubstr must anchor on the gram-hash key — never an all-pairs
    document comparison: no cartesian/nested-loop join, no
    single-partition funnel, and every join keyed on the gram hash `gh`
    (at tiny SF AQE may broadcast the df-capped side; at scale both
    sides shuffle on gh — either way the join is KEYED). The gram
    relation must also reach the join pre-filtered by the df cap (the
    singleton prune is what bounds fanout at 100 TB)."""
    plan = _plan(spark, "d29_exact_substr")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan  # gram hashing stays JVM-side
    assert "xxhash64" in plan  # grams travel as 8-byte hashes, not text
    import re
    joins = re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
                       r".{0,120}", plan)
    assert joins, "expected keyed joins in the plan"
    assert all("gh" in j for j in joins), joins


def test_d09_gini_distributed_rank_partials(spark):
    """Gini's global rank must come from range-exchange partials, never a
    single-partition window: the partials plan carries a range exchange
    and a MapInPandas, and nothing funnels through SinglePartition."""
    from conceptnetwork_spark.operators.relational import _gini_rank_partials

    plan = _gini_rank_partials(spark, SF_ORACLE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "MapInPandas" in plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_d31_pmi_takeordered_topk(spark):
    """The PMI top-k must be a TakeOrdered over the scored vocabulary
    relation — no global row_number window, no single-partition funnel;
    the corpus text itself must never join (only aggregated counts do).
    (The plan's only SinglePartition exchanges are the two one-row total
    aggregates n_tok/n_big — partial-agg outputs, not data.)"""
    plan = _plan(spark, "d31_pmi_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "row_number" not in plan.lower()
    assert "CartesianProduct" not in plan


def test_d11_quantile_sketch_windowgrouplimit(spark):
    """Every rank<=K filter in the sketch must plan as WindowGroupLimit
    (map tasks forward at most K rows per group — sketch-sized state on
    the wire, never data) and nothing may funnel through SinglePartition:
    the merge law is certified WITHOUT a global sort anywhere."""
    plan = _plan(spark, "d11_quantile_sketch_merge")
    assert "WindowGroupLimit" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_d29_ppr_teleport_broadcast(spark):
    """Personalized PageRank's per-iteration shape: rank state joins edges
    via hash joins (the seed/teleport relations broadcast — they are
    |seeds|-sized), no cartesian anywhere; the only one-row aggregate is
    the n_seeds scalar (a partial-agg output, not data)."""
    from conceptnetwork_spark.catalog import Catalog
    from conceptnetwork_spark.operators.graph import _ppr_edges, _ppr_tele

    plan = _plan(spark, "d29_ppr_2iter")
    assert "Scan ExistingRDD" in plan  # edge + teleport lineage cuts
    assert "CartesianProduct" not in plan
    # the seed-broadcast shape sits behind the teleport cut — check the
    # factored uncut subtree
    t = Catalog(spark, SF_ORACLE)
    sub = (
        _ppr_tele(t, _ppr_edges(t))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in sub or "BroadcastNestedLoopJoin" in sub
    assert "CartesianProduct" not in sub


def test_d33_prefixspan_sequence_assembly_single_exchange(spark):
    """The journey assembly (row_number cap + collect_list) must reuse ONE
    user_id hash exchange for both the window and the groupBy — the
    sequence database leaves the exchange bounded at JOURNEY_LEN items
    per user. (The PrefixSpan mine itself runs eagerly inside MLlib; the
    assembly plan is the part we own.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from conceptnetwork_spark.catalog import Catalog
    from conceptnetwork_spark.operators.ml import JOURNEY_LEN

    ev = Catalog(spark, SF_ORACLE).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= JOURNEY_LEN)
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "event_type"))),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
    )
    plan = seq._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    # the rank cap prunes before the aggregate: WindowGroupLimit bounds
    # what each map task forwards
    assert "WindowGroupLimit" in plan


def test_d14_rolling_skew_single_window_chain_four_moments(spark):
    """All four raw-moment frame averages must land in ONE Window chain
    over ONE l_suppkey hash exchange (aliasing each moment once — inlined
    .over() references would plan ~24 duplicate frame aggregates), and
    the suppkey predicate must reach the scan."""
    plan = _plan(spark, "d14_rolling_skew")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("avg(") == 4
    assert "PushedFilters" in plan and "l_suppkey" in plan


def test_d27_circadian_one_hash_agg_no_window(spark):
    """The circadian profile is a pure two-phase aggregate: one
    event_type hash exchange with a map-side partial (the decimal
    cos/sin sums combine), no window, no join of the event table."""
    plan = _plan(spark, "d27_circadian_profile")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_d29_kcore_semi_join_peeling(spark):
    """Each peel round filters the edge list with SEMI joins against the
    node-sized survivor set — never a cartesian; the only one-row
    aggregates are the per-round summary scalars."""
    plan = _plan(spark, "d29_kcore")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_d30_binary_quantize_hamming_shortlist_windowgrouplimit(spark):
    """Both rank<=K stages (Hamming shortlist, cosine rerank) must plan
    as WindowGroupLimit with a partial below the qid exchange — map
    tasks forward at most SHORTLIST candidates per query, so only
    |queries| x SHORTLIST rows ever reach the float cosine; queries ride
    a broadcast, the corpus never reshuffles for scoring."""
    plan = _plan(spark, "d30_binary_quantize")
    assert plan.count("WindowGroupLimit") >= 3  # partial+final shortlist, rerank
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_d34_bucketed_batching_distributed_rank(spark):
    """The global length rank must come from the two-pass distributed
    row-number (range exchange on the sort key + partition-count-sized
    offset broadcast) — NTILE's corpus-wide SinglePartition window is
    exactly what this plan exists to avoid. The only SinglePartition
    exchanges feed the 8-row pid-offset window and the scalar total,
    never the document rows."""
    plan = _plan(spark, "d34_bucketed_batching")
    assert "rangepartitioning(tokens" in plan
    assert "ntile" not in plan.lower()
    # document rows flow scan -> range exchange -> mapInPandas -> join;
    # no corpus-sized window anywhere
    assert "WindowGroupLimit" not in plan


def test_d34_domain_reweight_broadcast_totals(spark):
    """The totals relation (one row) must broadcast back onto the
    |sources|-sized domain table; the corpus itself aggregates through
    one source-keyed exchange with a map-side partial."""
    plan = _plan(spark, "d34_domain_reweight")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_d29_degree_assortativity_broadcast_degrees(spark):
    """The degree relation must BROADCAST onto the edge list (it is
    node-cardinality, orders smaller than edges) and the moment readout
    must be a map-side-combinable aggregate — no sort-merge join, no
    cartesian anywhere."""
    plan = _plan(spark, "d29_degree_assortativity")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_d14_sax_suppkey_exchange_reuse_no_funnel(spark):
    """The position window, per-series stats, and per-segment PAA must
    all ride suppkey-keyed exchanges (two hash exchanges total — window
    feed plus the (suppkey, seg) PAA agg), with no SinglePartition
    funnel and no sort-merge join: the symbol lookup is a codegen'd
    CASE, the word assembly collects exactly SAX_SEGS rows per key."""
    plan = _plan(spark, "d14_sax")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in plan
    assert "SortMergeJoin" not in plan


def test_d35_bloom_file_skip_broadcast_index(spark):
    """The skipping index (per-file bit positions) and the probe
    relations are index-sized and must BROADCAST — no sort-merge join,
    no cartesian of the fact table; the orders scan happens once for the
    key extraction, never per probe."""
    plan = _plan(spark, "d35_bloom_file_skip")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # three column-pruned orders scans (index keys / file count / truth),
    # each reading <=2 columns — never the fact table per probe
    assert plan.count("FileScan parquet") <= 3


def test_d29_link_prediction_capped_self_join(spark):
    """Pair generation must be the supplier-keyed self-join gated by the
    broadcast mid-degree shortlist (scale-adaptive hub cap), with both
    customer-degree relations broadcast and the rank<=5 filter planned as
    WindowGroupLimit (map tasks forward at most 5 candidates per customer
    past the cust_a exchange) — never a cartesian, never an all-pairs
    customer join; the only SinglePartition stage is the 1-row
    mean-degree scalar feeding the broadcast cap."""
    plan = _plan(spark, "d29_link_prediction")
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 1-row mean-degree scalar attach (a
    # BNLJ against a single-row broadcast IS the scalar-attach plan)
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # degree shortlist + mean scalar + two customer-degree broadcasts
    assert plan.count("BroadcastHashJoin") >= 3
    # exactly one shuffled join: the supplier-keyed edge self-join
    assert plan.count("SortMergeJoin") == 1
    # top-5-per-customer pushes the limit below the exchange
    assert plan.count("WindowGroupLimit") >= 2
    # the lone SinglePartition exchange feeds the 1-row degree-mean scalar
    assert plan.count("Exchange SinglePartition") == 1
