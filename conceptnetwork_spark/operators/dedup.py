"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

SURVEY §2.2 D29 + the mandated LLM-dataprep extensions. Scale stance
(100 TB): never all-pairs — exact dedup is one hash-groupBy shuffle; fuzzy
dedup is LSH-bucketed (candidates only within equal band buckets); exact
Jaccard verification runs only on LSH candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from conceptnetwork_spark.catalog import Catalog, ensure_parallelism
from conceptnetwork_spark.lineage import lineage_cut
from conceptnetwork_spark.registry import register

# --------------------------------------------------------------------------
# D29a — exact dedup (hash-groupBy)
# --------------------------------------------------------------------------
@register(
    "d29_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    ORDER BY keep_id
    """,
)
def d29_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate collapse keyed on md5(text): keep the min doc_id per
    content hash. One shuffle on a 128-bit key; at 100 TB the md5 groupBy is
    near-uniform (no skew) and partial aggregation keeps the shuffle tiny."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    )


# --------------------------------------------------------------------------
# D29b — MinHash signatures + banded LSH, all in native Spark SQL
# --------------------------------------------------------------------------
# MinHash with k hash slots via Kirsch-Mitzenmacher double hashing: each
# shingle is hashed TWICE (xxhash64 seeds 0/1, top 56 bits), and slot i uses
# h_i = h1 + i*h2 — 2 string hashes per shingle instead of k, with the same
# collision behavior for min-wise sketching. The 8-bit right shift keeps
# h1 + 31*h2 < 2^62, safe under ANSI overflow checking. Banding groups the
# signature into b bands of r rows; docs sharing any band bucket are
# candidates. Everything is explode/groupBy — no UDF, no all-pairs.

def shingles(col, n: int = 5):
    """Word n-gram shingle array from raw text (lower, whitespace-split)."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")
    # sliding n-grams via transform over index range; drop ragged tail.
    # Docs shorter than n tokens yield an EMPTY array: with k=0,
    # F.sequence(0, k-1) would count DOWN to -1 and slice() would throw
    # INVALID_PARAMETER_VALUE.START, killing the whole job on one short doc.
    k = F.size(toks) - F.lit(n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """doc_id -> array<long> MinHash signature, computed as one explode +
    groupBy(doc) of per-slot mins (partial agg does the min map-side, so the
    shuffle is #docs × num_hashes longs — the same size as the output
    signatures themselves; the shingle strings never shuffle).

    Measured design note (round 2): a zero-shuffle per-row alternative —
    hash the shingle array twice with ``transform`` and take num_hashes
    ``array_min(zip_with(...))`` reductions — is semantically identical but
    measured 40% SLOWER here (2.0 s vs 1.4 s at sf0.1): Spark evaluates
    higher-order-function lambdas interpreted per element, while the explode
    form's hash-aggregate min updates are whole-stage-codegen'd. The shuffle
    it saves is only signature-sized, so codegen wins.

    At-scale persistence policy: the OUTPUT of this function (num_hashes
    longs per doc) is the only LSH intermediate that may ever be persisted
    or checkpointed — callers must never cache the exploded shingle
    relation (corpus-sized × shingle fan-out; it exists only inside this
    one partial+final aggregate and never leaves the stage). See
    d29_minhash_near_dup for the enforcing persist(MEMORY_AND_DISK_DESER)."""
    base = ensure_parallelism(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")))
    sh = base.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), shingle_n))).alias("sh")
    )
    hashed = sh.select(
        "doc_id",
        F.shiftrightunsigned(F.xxhash64("sh", F.lit(0)), 8).alias("h1"),
        F.shiftrightunsigned(F.xxhash64("sh", F.lit(1)), 8).alias("h2"),
    )
    mins = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"h{i}") for i in range(num_hashes)
    ]
    agg = hashed.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 2
) -> DataFrame:
    """Banded LSH: bucket = hash(band slice); self-join per (band, bucket).

    Output (doc_a < doc_b) candidate pairs, distinct. The join key
    (band, bucket) is high-cardinality -> shuffle is balanced; no pair is
    ever formed across different buckets (never all-pairs).

    Defaults (16 bands x 2 rows over a 32-hash signature) detect
    Jaccard>=0.5 pairs with p=0.99; halving the signature width vs 64
    hashes halves the codegen'd aggregate, the dominant one-shot cost.
    """
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice("signature", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (join twice to attach
    shingle sets, compute |∩|/|∪| with array ops).

    Shingling runs ONLY on docs that appear in a candidate pair (left-semi
    prefilter): LSH prunes the corpus to a small candidate set, so the
    expensive array build touches |candidates| docs, not |corpus|."""
    ids = (
        pairs.select(F.col("doc_a").alias("sid"))
        .union(pairs.select(F.col("doc_b").alias("sid")))
        .distinct()
    )
    cand_docs = docs.join(ids, F.col(id_col) == F.col("sid"), "left_semi")
    # NOTE (r12, measured): checkpointing/persisting this relation to share
    # it across the two pair-join sides was tried and is a PESSIMIZATION
    # (1.44 s -> 2.18 s noop at sf0.1): the rows are WIDE (full distinct
    # shingle-string arrays), so materializing them costs more than the
    # second LSH-candidate-bounded shingling pass it saves. Narrow
    # relations (signatures, pair ids) are persisted by the callers; the
    # wide shingle sets deliberately stay recomputed-per-side.
    sets = ensure_parallelism(cand_docs).select(
        F.col(id_col).alias("sid"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("sset"),
    )
    out = (
        pairs.join(sets.withColumnRenamed("sid", "doc_a").withColumnRenamed("sset", "set_a"), "doc_a")
        .join(sets.withColumnRenamed("sid", "doc_b").withColumnRenamed("sset", "set_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


@register("d29_minhash_near_dup", oracle=None)
def d29_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup pipeline: shingle -> minhash -> banded LSH -> exact
    Jaccard verify on candidates. Non-oracle (LSH banding is engine-defined);
    pytest checks pair-recall against planted near-dups."""
    from pyspark import StorageLevel

    d = Catalog(spark, sf_dir).documents
    # persist the two small intermediates: signatures feed both sides of the
    # LSH self-join, and the candidate set is referenced three times by the
    # verify stage (pair join + the semi-join prefilter) — without an explicit
    # materialization Spark recomputes the whole shingle->hash pipeline per
    # reference. Both are tiny relative to the corpus (#docs x 33 longs and
    # the LSH-pruned pair list), so this is cheap at any scale.
    #
    # Cache discipline (the guard, not just a note): an explicit
    # MEMORY_AND_DISK_DESER (the deserialized disk-spilling level), never
    # MEMORY_ONLY — at 100 TB an evicted MEMORY_ONLY partition silently
    # re-runs the whole shingle->hash pipeline for that partition (the
    # exact recompute the persist exists to prevent), while DISK spill
    # costs one sequential write of signature-sized rows. ONLY derived
    # narrow tables (signatures, candidate ids) are ever persisted; raw
    # shingles stay inside the single codegen'd aggregate and are never
    # cached or shuffled (see minhash_signatures). At petabyte corpus
    # sizes, swap persist() for a parquet checkpoint of the SAME
    # signature relation — the shape is already storage-friendly.
    sigs = minhash_signatures(d).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    cands = lsh_candidate_pairs(sigs).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    return jaccard_verify(d, cands, threshold=0.5).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# D29c — n-gram Jaccard (exact, oracle-checked on a bounded candidate set)
# --------------------------------------------------------------------------
@register(
    "d29_ngram_jaccard",
    oracle="""
    WITH sets AS (
      SELECT doc_id,
             list_distinct(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS toks
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def d29_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over a bounded id range (oracle-checkable
    form of the verify stage; the scale path never runs this all-pairs —
    see d29_minhash_near_dup)."""
    d = Catalog(spark, sf_dir).documents.where(F.col("doc_id") < 40)
    toks = F.array_distinct(
        F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")
    )
    sets = d.select(F.col("doc_id"), toks.alias("toks"))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ta", "tb"))
                / F.size(F.array_distinct(F.concat("ta", "tb"))).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# D29d — SimHash (64-bit), fully JVM-side (no UDF)
# --------------------------------------------------------------------------
# 2^k constants for bit assembly; bit 63 is the long sign bit.
_POW2 = [(1 << k) if k < 63 else -(1 << 63) for k in range(64)]


def simhash64(col) -> Column:
    """64-bit SimHash over whitespace tokens as a single JVM column
    expression: xxhash64 per token (computed once), a 64-slot bit-vote
    accumulated with ``aggregate``/``zip_with``, then majority bits OR'd
    into one long. Map-only — no shuffle, no Python worker; near-dup docs
    land within a small Hamming distance and are bucketed by 16-bit chunks
    at scale (see simhash_near_dup_pairs)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    hs = F.transform(toks, lambda t: F.xxhash64(t))
    bits = F.sequence(F.lit(0), F.lit(63))
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc, bits, lambda a, k: a + F.when(F.bit_get(h, k) == 1, 1).otherwise(-1)
        ),
    )
    pows = F.array(*[F.lit(p).cast("long") for p in _POW2])
    return F.aggregate(
        F.zip_with(votes, pows, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, b: a.bitwiseOR(b),
    )


@F.pandas_udf(LongType())
def _simhash_from_hashes(hs: pd.Series) -> pd.Series:
    """Bit-vote -> majority -> bit-pack, vectorized per document. Input is
    the per-token xxhash64 array (computed JVM-side); output is bit-identical
    to the simhash64 column expression (asserted in tests), but the 64-slot
    vote accumulation runs as numpy per Arrow batch instead of interpreted
    array lambdas (~20x on the document corpus)."""
    ks = np.arange(64, dtype=np.uint64)
    out = []
    for arr in hs:
        h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
        if len(h) == 0:
            out.append(0)
            continue
        ones = ((h[:, None] >> ks) & 1).sum(axis=0)  # per-bit 1-votes
        maj = (2 * ones > len(h))  # vote = ones - (len-ones) > 0
        packed = int((maj.astype(np.uint64) << ks).sum(dtype=np.uint64))
        out.append(packed - (1 << 64) if packed >= (1 << 63) else packed)
    return pd.Series(out, dtype="int64")


def simhash64_fast(col) -> Column:
    """SimHash with JVM-side tokenize+hash (one codegen'd pass) and
    Arrow-batched vote accumulation — same bits as ``simhash64``, used on
    the hot paths."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    return _simhash_from_hashes(F.transform(toks, lambda t: F.xxhash64(t)))


@register("d29_simhash", oracle=None)
def d29_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 64-bit SimHash fingerprints. Non-oracle (hash definition is
    engine-internal); pytest asserts determinism + near-dup Hamming locality."""
    d = ensure_parallelism(Catalog(spark, sf_dir).documents)
    return d.select("doc_id", simhash64_fast(F.col("text")).alias("simhash")).orderBy(
        "doc_id"
    )


@register("d29_simhash_pairs", oracle=None)
def d29_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs over documents (chunk-bucketed, then
    Hamming-verified). Non-oracle (hash definition is engine-internal);
    pytest asserts the Hamming bound and pair ordering."""
    d = Catalog(spark, sf_dir).documents
    return simhash_near_dup_pairs(d, max_hamming=10).orderBy("doc_a", "doc_b")


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Scale path for SimHash dedup: bucket by each of four 16-bit chunks
    (pigeonhole: any pair within Hamming<=6 shares at least one exact chunk
    when distance is spread, and chunk-equality prunes the search space);
    verify Hamming on candidates only."""
    # lazy lineage cut on the (doc_id, sh) pair — two longs per doc. The
    # self-join references this subtree twice and the planner otherwise
    # duplicates it (and splits the Arrow UDF around an isnotnull filter,
    # evaluating the signature 4x); the checkpoint computes it exactly once
    # inside the first action and both join sides read the same RDD. The
    # LogicalRDD keeps the originating plan's size stats, so the join
    # strategy stays size-driven: broadcast at fixture scale, chunk-keyed
    # shuffle (identical subtrees, one reused exchange) at corpus scale.
    sh = (
        ensure_parallelism(docs)
        .select("doc_id", simhash64_fast(F.col("text")).alias("sh"))
        .transform(lineage_cut)
    )
    chunks = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(*[F.shiftrightunsigned("sh", k * 16).bitwiseAND(F.lit(0xFFFF)) for k in range(4)])
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


# --------------------------------------------------------------------------
# D29g — benchmark decontamination (n-gram overlap vs a held-out set)
# --------------------------------------------------------------------------
# The pretraining-hygiene pass: before training, every candidate document is
# scored for n-gram overlap against the evaluation/benchmark corpus, and
# high-overlap documents are dropped so the benchmark is not leaked into the
# training set. Here the "benchmark" is the deterministic doc_id % 17 == 0
# slice of the corpus; the contamination signal is the fraction of a
# document's DISTINCT word 5-grams that appear anywhere in the benchmark.
DECON_MOD = 17
DECON_N = 5
DECON_THRESHOLD = 0.2


@register(
    "d29_decontaminate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(lower(trim(
               regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + {DECON_N - 1}), ' ') AS g
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - {DECON_N - 1})) AS i
            FROM tok)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {DECON_MOD} = 0),
    cand AS (SELECT doc_id, g FROM grams WHERE doc_id % {DECON_MOD} <> 0)
    SELECT c.doc_id,
           COUNT(*)                                               AS n_grams,
           CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4)                   AS contamination,
           (SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE)) >= {DECON_THRESHOLD}      AS contaminated
    FROM cand c LEFT JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)
def d29_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction of its
    distinct word 5-grams that occur in the held-out benchmark slice
    (doc_id % DECON_MOD == 0), with a >= DECON_THRESHOLD contamination flag.

    Scale shape (100 TB): the benchmark n-gram set is tiny relative to the
    corpus (eval suites are MBs, training data is TBs), so it is distincted
    and BROADCAST; the candidate side streams map-side through the hash
    join — the corpus never shuffles raw text — and the per-doc groupBy
    partially aggregates (count, hit-count) before the final shuffle, which
    carries 3 numbers per document. No all-pairs stage anywhere. Gram
    membership travels as xxhash64 LONGS, not strings: the broadcast table
    and the dedup shuffle carry 8 bytes per gram instead of ~30, and the
    64-bit space makes a cross-doc collision (the only thing that could
    perturb a count) vanishingly unlikely at eval-suite scale. The split
    filters run BEFORE shingling, so each document is shingled exactly
    once (the naive shared-grams form shingled every doc in both branches),
    and the doc scan is fanned out to the full core count first — the
    corpus lands as ONE file partition locally and interpreted-HOF
    shingling on a single task dominated the wall clock (measured 4.1 s
    -> 0.9 s warm at sf0.1)."""
    d = ensure_parallelism(Catalog(spark, sf_dir).documents)

    def gram_ids(df: DataFrame) -> DataFrame:
        g = df.select("doc_id", F.explode(shingles(F.col("text"), DECON_N)).alias("g"))
        return g.select("doc_id", F.xxhash64("g").alias("gh")).distinct()

    bench = (
        gram_ids(d.where(F.col("doc_id") % DECON_MOD == 0))
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = gram_ids(d.where(F.col("doc_id") % DECON_MOD != 0))
    hits = cand.join(F.broadcast(bench), "gh", "left")
    contamination = F.sum("hit") / F.count(F.lit(1)).cast("double")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce(contamination, F.lit(0.0)), 4).alias("contamination"),
            (F.coalesce(contamination, F.lit(0.0)) >= DECON_THRESHOLD).alias(
                "contaminated"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# D29 extension — INCREMENTAL dedup (new batch vs existing corpus):
# the steady-state form of exact dedup once a corpus is live
# --------------------------------------------------------------------------
INCR_SPLIT = 350  # doc_id < SPLIT = existing corpus, >= SPLIT = new batch


@register(
    "d29_incremental_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT md5(text) AS h FROM documents WHERE doc_id < {INCR_SPLIT}
    ), batch AS (
      SELECT doc_id, md5(text) AS h FROM documents
      WHERE doc_id >= {INCR_SPLIT}
    ), in_batch_keep AS (
      SELECT MIN(doc_id) AS doc_id FROM batch GROUP BY h
    )
    SELECT b.doc_id,
           (b.doc_id IN (SELECT doc_id FROM in_batch_keep)
            AND b.h NOT IN (SELECT h FROM corpus)) AS admit
    FROM batch b ORDER BY doc_id
    """,
)
def d29_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL exact dedup — the form that actually runs once a corpus
    is live: a new batch is admitted doc-by-doc iff (a) it is the first
    copy of its content WITHIN the batch (min-id canonical, same rule as
    d29_exact_dedup) and (b) its content hash does not already exist in
    the corpus index. Emits the full admit/reject verdict per batch doc
    so the ingest log is auditable.

    Scale shape: the corpus side reduces to its distinct hash INDEX
    (16-byte keys — the thing a production pipeline keeps MATERIALIZED
    between runs instead of rescanning 100 TB of text); the batch
    deduplicates within itself via one hash-groupBy, then a LEFT ANTI
    join against the index. The anti join shuffles only 16-byte keys on
    both sides; with the index stored bucketed by hash (d03_bucketed_join
    layout) the index side never reshuffles across batches, and each
    ingest pays one small-batch shuffle."""
    d = Catalog(spark, sf_dir).documents
    corpus_idx = (
        d.where(F.col("doc_id") < INCR_SPLIT)
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
    )
    batch = d.where(F.col("doc_id") >= INCR_SPLIT).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    first_in_batch = batch.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    admitted = (
        first_in_batch.join(corpus_idx, "h", "left_anti")
        .select("doc_id")
        .withColumn("admit", F.lit(True))
    )
    return (
        batch.select("doc_id")
        .join(admitted, "doc_id", "left")
        .select("doc_id", F.coalesce("admit", F.lit(False)).alias("admit"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# D29 (cont.) — fuzzy string join: q-gram blocking + edit-distance verify
# [round-6 wave 3]
# --------------------------------------------------------------------------
FUZZY_Q = 3        # character q-gram width for the blocking key
FUZZY_MAXDIST = 2  # Levenshtein acceptance threshold


@register(
    "d29_fuzzy_join",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT string_split(p_name, ' ')[1] AS word FROM part
    ), g AS (
      SELECT word, substr(word, i, {FUZZY_Q}) AS q
      FROM (SELECT word, UNNEST(generate_series(1, len(word) - {FUZZY_Q - 1}))
                     AS i
            FROM w WHERE len(word) >= {FUZZY_Q})
    ), cand AS (
      SELECT DISTINCT a.word AS word_a, b.word AS word_b
      FROM g a JOIN g b ON a.q = b.q AND a.word < b.word
    )
    SELECT word_a, word_b,
           CAST(levenshtein(word_a, word_b) AS INTEGER) AS dist
    FROM cand
    WHERE levenshtein(word_a, word_b) <= {FUZZY_MAXDIST}
    ORDER BY word_a, word_b
    """,
)
def d29_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical fuzzy string join: q-gram BLOCKING (words sharing any
    character 3-gram become candidates) followed by exact Levenshtein
    VERIFICATION (edit distance <= 2) — never an all-pairs distance
    matrix. This is the scalable spelling of 'join on approximately equal
    strings'; the same block-then-verify shape as the MinHash (set) and
    SimHash (vector) families, here for edit distance.

    Blocking is a HEURISTIC at these parameters, not a guarantee: the
    classic count-filter bound (strings within edit distance k share >=
    max_len - q + 1 - k*q grams) only forces a shared gram while
    len < q*(k+1) + q - 1; with q=3, k=2 two longer words with spread
    edits (e.g. 'abcdef' vs 'aXcdeY') can share NO 3-gram and the pair is
    missed. The oracle applies the IDENTICAL candidate generator, so the
    certification is of block+verify as a unit — not recall against
    ground-truth edit distance. Guaranteed-recall variants would lower q,
    partition words into k+1 segments (pigeonhole), or length-band.

    Scale shape (100 TB): grams explode map-side; the candidate join is an
    equi-join on the q-gram key whose fanout is bounded by gram frequency
    (names, not stopwords — skew would be salted per d03); Levenshtein
    runs ONLY on candidates, codegen'd JVM-side. The distinct-pair dedup
    shuffles (word_a, word_b) ids once."""
    w = (
        Catalog(spark, sf_dir)
        .part.select(F.split(F.col("p_name"), " ").getItem(0).alias("word"))
        .distinct()
        .where(F.length("word") >= FUZZY_Q)
    )
    g = w.select(
        "word",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - (FUZZY_Q - 1)),
                lambda i: F.col("word").substr(i, F.lit(FUZZY_Q)),
            )
        ).alias("q"),
    )
    a = g.select(F.col("word").alias("word_a"), "q")
    b = g.select(F.col("word").alias("word_b"), "q")
    cand = (
        a.join(b, "q")
        .where(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    dist = F.levenshtein("word_a", "word_b")
    return (
        cand.where(dist <= FUZZY_MAXDIST)
        .select("word_a", "word_b", dist.cast("int").alias("dist"))
        .orderBy("word_a", "word_b")
    )


# --------------------------------------------------------------------------
# D29 extension (round 10) — cross-shard duplicate-incidence matrix (the
# planning readout that decides shard-local vs global dedup)
# --------------------------------------------------------------------------
N_DUP_SHARDS = 4  # documents sharded by doc_id % N (stand-in for file/dump shards)


@register(
    "d29_shard_dup_matrix",
    # block granularity (12-word normalized blocks, d31_block_dedup's
    # contract) because the synthetic corpus has zero WHOLE-document
    # duplicates at every SF — block-level repeats are where its real
    # duplication lives, and the matrix semantics are identical either way
    oracle="""
    WITH w AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                          ' ') AS toks
      FROM documents
    ), b AS (
      SELECT DISTINCT doc_id % 4 AS shard, doc_id,
             array_to_string(toks[(i * 12 + 1):(i * 12 + 12)], ' ') AS block
      FROM w, LATERAL unnest(generate_series(0,
             CAST(ceil(len(toks) / 12.0) - 1 AS BIGINT))) AS t(i)
      WHERE len(toks) - i * 12 >= 12
    ), c AS (
      SELECT block, shard, COUNT(*) AS n FROM b GROUP BY 1, 2
    )
    SELECT a.shard AS shard_a, b.shard AS shard_b,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN a.shard = b.shard
                         THEN a.n * (a.n - 1) / 2
                         ELSE a.n * b.n END) AS BIGINT) AS n_pairs
    FROM c a JOIN c b
      ON a.block = b.block
     AND (a.shard < b.shard OR (a.shard = b.shard AND a.n >= 2))
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def d29_shard_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard duplicate-incidence matrix: shard the corpus by doc_id
    (stand-in for the dump/file sharding a 100 TB corpus arrives in),
    fingerprint every normalized 12-word block (d31_block_dedup's unit),
    and count, for every shard pair, how many duplicated blocks span it
    (`n_blocks`) and how many doc-level candidate pairs they induce
    (`n_pairs`: cross-shard n_a x n_b, within-shard C(n,2)). This is the
    PLANNING pass run before a dedup campaign: a near-diagonal matrix
    means shard-local dedup (embarrassingly parallel, no global shuffle)
    captures almost everything; heavy off-diagonal mass is the
    measurement that justifies paying for the global pass.

    Scale shape (100 TB): block construction is map-side; ONE exchange on
    (block, shard) builds per-shard multiplicities (partial agg combines
    repeats inside a doc split before the wire); the self-join runs on
    the aggregated (block, shard, n) relation — at most |shards| rows per
    block key, so join fanout is bounded by shards², never by corpus
    size. The block string is folded to xxhash64 BEFORE the first
    exchange — no readout exposes block text, so every shuffle carries
    8-byte keys while the DuckDB oracle keeps the raw strings (identical
    matrices; a 2^-64-per-pair collision is below corpus noise — the
    d31_block_dedup note, applied rather than deferred). Output is
    |shards|² rows."""
    d = Catalog(spark, sf_dir).documents
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " "
    )
    nblocks = F.ceil(F.size(F.col("toks")) / F.lit(12.0)).cast("int")
    b = (
        d.select((F.col("doc_id") % N_DUP_SHARDS).alias("shard"), "doc_id",
                 toks.alias("toks"))
        .select(
            "shard",
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), nblocks - 1)).alias("i"),
        )
        .where(F.size("toks") - F.col("i") * 12 >= 12)
        .select(
            "shard",
            "doc_id",
            F.xxhash64(
                F.concat_ws(
                    " ", F.slice(F.col("toks"), F.col("i") * 12 + 1, 12)
                )
            ).alias("block"),
        )
        .distinct()
    )
    c = b.groupBy("block", "shard").agg(F.count(F.lit(1)).alias("n"))
    a = c.select(
        F.col("block"), F.col("shard").alias("shard_a"), F.col("n").alias("na")
    )
    bb = c.select(
        F.col("block"), F.col("shard").alias("shard_b"), F.col("n").alias("nb")
    )
    pairs = a.join(bb, "block").where(
        (F.col("shard_a") < F.col("shard_b"))
        | ((F.col("shard_a") == F.col("shard_b")) & (F.col("na") >= 2))
    )
    return (
        pairs.groupBy("shard_a", "shard_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(
                F.when(
                    F.col("shard_a") == F.col("shard_b"),
                    F.col("na") * (F.col("na") - 1) / 2,
                ).otherwise(F.col("na") * F.col("nb"))
            ).cast("long").alias("n_pairs"),
        )
        .orderBy("shard_a", "shard_b")
    )


# --------------------------------------------------------------------------
# D29h — suffix/exact-substring dedup (round 11): arbitrary-offset verbatim
# overlap, the ExactSubstr family (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — public). d31_block_dedup catches
# 12-word-ALIGNED repeats and d31_sentence_dedup whole sentences; this
# operator reports every cross-doc verbatim overlap of >= ES_L tokens at
# ANY offset, with its exact maximal length.
# --------------------------------------------------------------------------
ES_L = 20  # minimum overlap length in tokens (Lee et al. use 50; the
# synthetic docs average ~54 tokens, so 20 keeps the fixture informative)
ES_DFMAX = 50  # anchor-gram occurrence cap: a gram this frequent is
# boilerplate whose pair fanout (df^2) would dominate the join; the cap is
# applied IDENTICALLY in the oracle, so it is declared semantics, not an
# approximation (the d31_containment precedent)

_ES_TOKS = (
    "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
)

# shared oracle CTE prefix: documents -> sliding L-grams -> df-capped
# occurrences -> cross-doc anchors -> diagonal islands (gaps-and-islands);
# d29_exact_substr aggregates runs per pair, d29_substr_span_drop projects
# the covered token intervals of the LATER doc
_ES_RUNS_SQL = f"""
    WITH w AS (
      SELECT doc_id, {_ES_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             array_to_string(toks[i:(i + {ES_L} - 1)], ' ') AS gram
      FROM w, LATERAL unnest(generate_series(1, len(toks) - {ES_L} + 1))
           AS t(i)
      WHERE len(toks) >= {ES_L}
    ), keep AS (
      SELECT gram FROM g GROUP BY gram
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {ES_DFMAX}
    ), occ AS (
      SELECT g.* FROM g JOIN keep USING (gram)
    ), anchors AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.pos AS pa, x.pos - y.pos AS diag
      FROM occ x JOIN occ y USING (gram)
      WHERE x.doc_id < y.doc_id
    ), runs AS (
      SELECT doc_a, doc_b, diag,
             pa - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS island,
             pa
      FROM anchors
    )"""


def _es_diag_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared ExactSubstr core: (doc_a, doc_b, diag, island, pa) rows,
    one per cross-doc anchor gram, island-numbered so consecutive anchors
    on one alignment diagonal group into maximal verbatim runs. See
    d29_exact_substr for the reduction argument and scale shape."""
    from pyspark.sql import Window

    d = Catalog(spark, sf_dir).documents
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " "
    )
    g = (
        d.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= ES_L)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - ES_L + 1)
            ).alias("pos"),
            F.col("toks"),
        )
        .select(
            "doc_id",
            "pos",
            F.xxhash64(
                F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), ES_L))
            ).alias("gh"),
        )
    )
    keep = (
        g.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= ES_DFMAX))
        .select("gh")
    )
    occ = g.join(keep, "gh")
    x = occ.select(
        "gh", F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa")
    )
    y = occ.select(
        "gh", F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    anchors = (
        x.join(y, "gh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag")
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    return anchors.select(
        "doc_a", "doc_b", "diag", "pa",
        (F.col("pa") - F.row_number().over(w)).alias("island"),
    )


@register(
    "d29_exact_substr",
    # reduction: two docs share a verbatim run of >= M >= L tokens iff they
    # share M-L+1 CONSECUTIVE sliding L-grams on one alignment diagonal
    # (diag = pos_a - pos_b), so max_overlap = longest diagonal run + L - 1
    # — exact longest-common-substring >= L, via gaps-and-islands
    oracle=f"""{_ES_RUNS_SQL}, spans AS (
      SELECT doc_a, doc_b, COUNT(*) AS run_len
      FROM runs GROUP BY doc_a, doc_b, diag, island
    )
    SELECT doc_a, doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(run_len) AS BIGINT) AS n_anchors,
           CAST(MAX(run_len) + {ES_L} - 1 AS BIGINT) AS max_overlap_tokens
    FROM spans GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b
    """,
)
def d29_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (ExactSubstr, Lee et al. 2022): every pair of
    documents sharing a verbatim token run of >= ES_L tokens at ARBITRARY
    offsets, with the exact maximal overlap length. Sliding L-grams (stride
    1) anchor the overlap — any >= L-token shared substring shares at least
    one full L-gram — and consecutive anchors on one alignment diagonal
    (pos_a - pos_b) chain into maximal runs, so max run + L - 1 is the true
    longest common substring, not an estimate. Output per dup pair: number
    of maximal shared spans, anchor count, and max overlap in tokens — the
    audit a training-data curation run acts on (Lee et al. drop one side of
    each span).

    Scale shape (100 TB): grams travel as xxhash64 longs, never text (the
    d31_containment trick — 8-byte keys; collision odds 2^-64 per pair are
    below corpus noise, and the oracle's string-keyed run certifies the
    hash-keyed plan at test SFs). The occurrence relation shuffles ONCE on
    the gram key; the df-cap prefilter (2 <= df <= ES_DFMAX) both bounds
    the self-join fanout to df^2 <= 2500 per gram AND prunes ~95% of grams
    (singletons) before the join, with ReuseExchange serving both join
    sides from the same exchange. The diagonal-run window partitions by
    (doc_a, doc_b, diag) — key cardinality ~= anchor count, no hot key by
    construction (a pathological all-same-token doc is killed by the df
    cap). Suffix arrays (the single-node Lee et al. implementation) are
    deliberately NOT used: the gram-anchor reduction expresses the same
    exact semantics as two shuffles of bounded width, which is the shape
    that survives 1000 executors. Reference parity: the reference
    (conceptnetwork, Beam+TF) has no dedup at all — this is part of the
    declared LLM-dataprep extension surface."""
    runs = _es_diag_runs(spark, sf_dir)
    spans = runs.groupBy("doc_a", "doc_b", "diag", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        spans.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("run_len").cast("long").alias("n_anchors"),
            (F.max("run_len") + ES_L - 1).cast("long").alias(
                "max_overlap_tokens"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "d29_substr_span_drop",
    # the curation ACTION for d29_exact_substr's findings (Lee et al. 2022
    # drop one side of every duplicated span): the LATER doc (larger
    # doc_id) loses the tokens covered by any shared >= L run; coverage is
    # the union of per-span intervals (interval-merge islands, so nested /
    # overlapping spans never double-count)
    oracle=f"""{_ES_RUNS_SQL}, ivl AS (
      SELECT doc_b AS doc_id,
             MIN(pa) - diag AS s,
             MAX(pa) - diag + {ES_L} - 1 AS e
      FROM runs GROUP BY doc_a, doc_b, diag, island
    ), ord AS (
      SELECT doc_id, s, e,
             MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM ivl
    ), isl AS (
      SELECT doc_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
      FROM ord
    ), cov AS (
      SELECT doc_id, MAX(e) - MIN(s) + 1 AS covered
      FROM isl GROUP BY doc_id, grp
    ), dropped AS (
      SELECT doc_id, SUM(covered) AS n_dropped FROM cov GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(len(w.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(len(w.toks) - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
    FROM w LEFT JOIN dropped d USING (doc_id)
    ORDER BY doc_id
    """,
)
def d29_substr_span_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL (the action Lee et al. 2022 take on what
    d29_exact_substr finds): for every cross-doc verbatim run of >= ES_L
    tokens, the LATER document (larger doc_id — earliest-wins, the same
    rule d29_exact_dedup and d31_block_dedup use) drops the covered
    tokens. Per-doc audit: tokens before, dropped, kept — the corpus-size
    accounting a curation run reports before rewriting the corpus.
    Covered positions are the UNION of span intervals: per-doc
    interval-merge (the d27_interval_merge gaps-and-islands skeleton) so
    overlapping spans from different partners never double-count.

    Scale shape (100 TB): everything through the diagonal runs is shared
    with d29_exact_substr (hash-keyed anchor join, df-capped fanout); the
    interval union adds one window partitioned by doc_id over SPAN rows
    (bounded by anchor count, not corpus size) and the final audit is a
    LEFT join of the documents scan against the per-doc drop counts — a
    key-partitioned join whose right side is duplicate-doc-bounded. No
    all-pairs, no SinglePartition."""
    from pyspark.sql import Window

    runs = _es_diag_runs(spark, sf_dir)
    ivl = runs.groupBy("doc_a", "doc_b", "diag", "island").agg(
        (F.min("pa") - F.col("diag")).alias("s"),
        (F.max("pa") - F.col("diag") + ES_L - 1).alias("e"),
    ).select(F.col("doc_b").alias("doc_id"), "s", "e")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = ivl.withColumn("prev_max", F.max("e").over(w_prev)).withColumn(
        "grp",
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    dropped = (
        isl.groupBy("doc_id", "grp")
        .agg((F.max("e") - F.min("s") + 1).alias("covered"))
        .groupBy("doc_id")
        .agg(F.sum("covered").alias("n_dropped"))
    )
    d = Catalog(spark, sf_dir).documents
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " "
    )
    docs = d.select("doc_id", F.size(toks).alias("n_tokens"))
    return (
        docs.join(dropped, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias(
                "n_dropped"
            ),
            (
                F.col("n_tokens") - F.coalesce(F.col("n_dropped"), F.lit(0))
            ).cast("long").alias("n_kept"),
        )
        .orderBy("doc_id")
    )
