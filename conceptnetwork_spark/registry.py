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
# (cumulative ledger: CERTIFIED.md). All 50 slots carry oracles; D11's
# approx sketches are oracle-less BY DESIGN (5%-tolerance pytest instead)
# and _load_all() pins every oracle-less query to the registry TAIL so no
# driver window can ever sample one into an oracle comparison.
#
# ROUND-12 window: the FIFTEEN round-12 pending slots lead — the 13
# early-round operators, d14_rolling_corr (r11's ONLY red: a DuckDB
# -0.0 vs Spark +0.0 stringified-hash edge, now normalized with + 0.0
# in both engines, and therefore the one never-certified oracle query),
# and the late-round d29_link_prediction — then the stalest greens in
# staleness order (verdict r11 ask #4, draining ROUNDCLOSE_r11's
# 104-entry stale_certs list stalest-first: the seven remaining r3-era
# certs, then r4-era rows to fill 50). All 50 are
# rehearsed in driver order by tools/window_rehearsal.py AFTER the
# final code edit of the round (the r8 lesson: any post-rehearsal edit
# to a registered query re-runs that query's oracle + plan tests
# before commit).
CERT_FIRST: tuple[str, ...] = (
    # round-12 additions + the never-certified r11 fix — certified
    # the round they land / re-land (r9 ask #8); the ten late-round-12
    # operators displace the ten least-stale fill rows (returned to the
    # r13 rotation queue below)
    "d29_ppr_2iter",
    "d33_prefixspan_journeys",
    "d11_quantile_sketch_merge",
    "d14_rolling_skew",
    "d27_circadian_profile",
    "d29_kcore",
    "d30_binary_quantize",
    "d34_domain_reweight",
    "d34_bucketed_batching",
    "d26_stream_drift_psi",
    "d29_degree_assortativity",
    "d14_sax",
    "d35_bloom_file_skip",
    "d14_rolling_corr",
    "d29_link_prediction",
    # stalest re-certifications, staleness order (last green r3, then
    # the oldest r4-era rows — ROUNDCLOSE_r11 stale_certs head)
    "d13_ntile",
    "d14_ewma",
    "d27_batch_sessionize",
    "d31_bm25",
    "d31_repetition",
    "d32_image_decode",
    "d34_sequence_pack",
    "d01_csv_corrupt",
    "d01_orc_source",
    "d01_partitioned_read",
    "d01_python_datasource",
    "d02_domain_mix",
    "d02_weighted_sample",
    "d05_null_safe_join",
    "d07_interval_join",
    "d09_group_mode",
    "d10_observed_scan",
    "d10_skew_report",
    "d13_percent_rank",
    "d14_rolling_median",
    "d14_running_distinct",
    "d14_zscore_outliers",
    "d16_except_all",
    "d16_intersect_all",
    "d17_levenshtein",
    "d22_iter_udf",
    "d23_cogrouped_map",
    "d24_mapinarrow",
    "d24_posexplode",
    "d24_python_udtf",
    "d25_stream_outer_join",
    "d25_stream_upsert",
    "d26_append_finalize",
    "d27_dynamic_gap_session",
    "d27_funnel",
)
# Queued for the r13 rotation head (d27_retention — displaced by the
# round-12 d29_link_prediction addition — then the ten r4-era greens
# displaced by the late-round-12 operators — d28_dedup_within_watermark,
# d29_decontaminate, d29_pagerank_2iter, d29_triangle_count,
# d30_mips_topk, d31_chunk_text, d31_ngram_profile, d31_pii_redact,
# d31_unigram_logprob, d31_vocab_topk — then the next-stalest):
# d32_audio_decode, d32_jpeg_meta, d34_dataprep_summary,
# d34_global_shuffle, d34_shard_manifest, d35_compact_files,
# d35_mv_merge, d35_partition_stats, d35_snapshot_at, d35_snapshot_diff,
# d35_zorder_key, d01_binary_source, d01_dynamic_pruning, ...
# With this window green, the r3-era certs are fully drained and the
# stale backlog shrinks by ~46 (cumulative ledger: CERTIFIED.md,
# regenerated by tools/roundclose.py from CORRECTNESS_r01..r12).
# The 27 oracle-less queries (approx sketches, seeded LSH/IVF/PQ ANN,
# streaming-only semantics, d30_mmr_rerank, d30_ivf_pq, d34_bpe_train,
# d33_pca_spectrum, ...) are pytest-pinned instead (tolerance / recall /
# determinism / equivalence; see non_oracle_queries()) and are ordered
# after ALL oracle-backed queries, so a driver oracle window can never
# sample them.

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
            "the four transformWithStateInPandas queries "
            "(d25_first_seen_tws, d25_topk_tws, d25_type_counts_tws, "
            "d25_cohort_timer_tws) NOT registered: no usable protobuf "
            "runtime (neither a real google.protobuf install nor the "
            "vendored shim imported); the operators are implemented and "
            "oracle-backed",
            RuntimeWarning,
            stacklevel=2,
        )

    missing = [n for n in CERT_FIRST if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"CERT_FIRST names not registered: {missing}")
    # three tiers: certification window, then the remaining oracle-backed
    # queries, then ALL oracle-less queries — a driver window (first-N
    # sample) therefore only ever sees queries it can actually hash-check
    ordered = {n: REGISTRY[n] for n in CERT_FIRST}
    ordered.update(
        (n, d) for n, d in REGISTRY.items() if n not in ordered and d.oracle is not None
    )
    ordered.update((n, d) for n, d in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)

    _LOADED = True


def non_oracle_queries() -> dict[str, str]:
    """The declared-by-design oracle-less queries (approx sketches, seeded
    ML, recall-tested ANN, streaming metrics) with their docstrings — each
    carries a pytest assertion (tolerance / recall / determinism) instead of
    a DuckDB hash oracle, and sorts after every oracle-backed query so the
    driver's first-N oracle window never samples one."""
    _load_all()
    return {d.name: d.doc for d in REGISTRY.values() if d.oracle is None}
