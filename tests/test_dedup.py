"""Fuzzy-dedup behavior tests: MinHash-LSH recall on planted near-dups,
SimHash locality, scalable pair pruning."""

import pytest

from pyspark.sql import functions as F

from conceptnetwork_spark.operators import dedup
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def true_pairs(spark, docs):
    """Ground-truth near-dup pairs: exact 5-gram SHINGLE-Jaccard >= 0.5 over
    all pairs (feasible at test scale only). Shingle sets — not token sets —
    are what MinHash approximates; the testdata's tiny vocabulary makes
    token-set Jaccard high for nearly every random pair."""
    toks = F.array_distinct(dedup.shingles(F.col("text")))
    sets = docs.select(F.col("doc_id"), toks.alias("toks"))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    pairs = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("ta", "tb"))
            / F.size(F.array_union("ta", "tb")).cast("double"),
        )
        .where(F.col("j") >= 0.5)
        .select("doc_a", "doc_b")
    )
    return {(r.doc_a, r.doc_b) for r in pairs.collect()}


def test_shingles_short_doc_is_empty_not_error(spark):
    """Docs with fewer than n tokens must yield an EMPTY shingle array —
    before the guard, k=0 made F.sequence(0, -1) count DOWN and slice()
    threw INVALID_PARAMETER_VALUE.START, killing the whole job on one
    short/empty doc (a corpus-hygiene pass over real text always has some)."""
    rows = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "a b c d e"), (5, "a b c d e f")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.sh
        for r in rows.select(
            "doc_id", dedup.shingles(F.col("text")).alias("sh")
        ).collect()
    }
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["a b c d e"]
    assert got[5] == ["a b c d e", "b c d e f"]


def test_minhash_lsh_recall(spark, docs, true_pairs):
    sigs = dedup.minhash_signatures(docs)
    cands = dedup.lsh_candidate_pairs(sigs)
    found = {(r.doc_a, r.doc_b) for r in cands.collect()}
    assert true_pairs, "testdata should contain planted near-dups"
    recall = len(true_pairs & found) / len(true_pairs)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(true_pairs)} pairs"


def test_jaccard_verify_filters_false_positives(spark, docs):
    sigs = dedup.minhash_signatures(docs)
    cands = dedup.lsh_candidate_pairs(sigs)
    verified = dedup.jaccard_verify(docs, cands, threshold=0.5)
    rows = verified.collect()
    assert all(r.jaccard >= 0.5 for r in rows)


def test_simhash_deterministic_and_local(spark, docs):
    a = {r.doc_id: r.simhash for r in docs.select("doc_id", dedup.simhash64("text").alias("simhash")).collect()}
    b = {r.doc_id: r.simhash for r in docs.select("doc_id", dedup.simhash64("text").alias("simhash")).collect()}
    assert a == b, "simhash must be deterministic"


def test_simhash_near_dup_pairs_runs(spark, docs):
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=10)
    rows = pairs.collect()
    assert all(r.hamming <= 10 for r in rows)


def test_minhash_signature_shape(spark, docs):
    sigs = dedup.minhash_signatures(docs, num_hashes=16)
    row = sigs.first()
    assert len(row.signature) == 16


def test_simhash_fast_matches_reference(spark, docs):
    """The Arrow-batched vote accumulation must be bit-identical to the pure
    column-expression form on every document."""
    from pyspark.sql import functions as F

    cmp = docs.select(
        dedup.simhash64(F.col("text")).alias("a"),
        dedup.simhash64_fast(F.col("text")).alias("b"),
    )
    assert cmp.where(F.col("a") != F.col("b")).count() == 0


def test_minhash_pair_recall_at_largest_local_sf(spark):
    """VERDICT r3 item 6: the banded-LSH parameters must hold off the toy
    corpus. Ground truth at sf0.1 (5000 docs) is EXACT shingle-Jaccard
    computed scalably — inverted-index equi-join on shingle for the
    intersection count, then J = c / (|A| + |B| - c); pairs sharing zero
    shingles have J = 0 and can never clear the 0.5 threshold, so the join
    is exhaustive over qualifying pairs without an all-pairs product
    (the same candidate-confinement shape the engine itself uses)."""
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    sets = docs.select(
        "doc_id", F.array_distinct(dedup.shingles(F.col("text"))).alias("sh")
    ).where(F.size("sh") > 0)
    sizes = sets.select("doc_id", F.size("sh").alias("n"))
    inv = sets.select("doc_id", F.explode("sh").alias("g"))
    a = inv.select(F.col("doc_id").alias("doc_a"), "g")
    b = inv.select(F.col("doc_id").alias("doc_b"), "g")
    common = (
        a.join(b, "g")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .where(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")) >= 0.5)
        .select("doc_a", "doc_b")
    )
    true_pairs = {(r.doc_a, r.doc_b) for r in truth.collect()}
    assert true_pairs, "sf0.1 should contain planted near-dups"

    sigs = dedup.minhash_signatures(docs)
    cands = dedup.lsh_candidate_pairs(sigs)
    found = {(r.doc_a, r.doc_b) for r in cands.collect()}
    recall = len(true_pairs & found) / len(true_pairs)
    assert recall >= 0.8, (
        f"LSH pair recall {recall:.2f} over {len(true_pairs)} true pairs at sf0.1"
    )


def test_connected_components_topologies(spark):
    """Chain, triangle, and isolated pair must each collapse to their min
    node id; the algorithm's output is (node -> component-min) for every
    node that touches an edge."""
    from conceptnetwork_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4, triangle 10-11-12 (+dup edge), pair 20-21
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (12, 10), (21, 20)],
        "src long, dst long",
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cluster_documents_singletons(spark):
    """Docs with no near-dup pair are their own cluster; doc_id==cluster_id
    picks exactly one canonical doc per cluster."""
    from pyspark.sql import functions as F

    from conceptnetwork_spark.operators.graph import cluster_documents

    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
    out = cluster_documents(docs, pairs)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}
    keepers = out.where(F.col("doc_id") == F.col("cluster_id")).count()
    assert keepers == 4  # {0,3,5} + three singletons


def test_lsh_clusters_capture_exact_duplicates(spark):
    """Identical normalized texts have identical MinHash signatures, land in
    the same LSH buckets, and verify at Jaccard 1.0 — so every exact-dup
    group MUST be contained in one LSH-path cluster (a guaranteed recall
    floor, unlike near-dups where banding is probabilistic)."""
    from pyspark.sql import functions as F

    from conceptnetwork_spark.catalog import Catalog
    from conceptnetwork_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from conceptnetwork_spark.operators.graph import cluster_documents
    from tests.conftest import SF_ORACLE

    # the driver testdata plants near-dups but no byte-identical dups, so
    # plant our own on top of a real-corpus sample
    base = (
        Catalog(spark, SF_ORACLE)
        .documents.where(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    clones = base.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    docs = base.union(clones)
    dup_groups = [[i, i + 1000] for i in range(10)]

    sigs = minhash_signatures(docs)
    pairs = jaccard_verify(docs, lsh_candidate_pairs(sigs), threshold=0.9)
    lsh = {
        r.doc_id: r.cluster_id for r in cluster_documents(docs, pairs).collect()
    }
    for members in dup_groups:
        assert len({lsh[d] for d in members}) == 1, members


def test_exact_substr_unaligned_overlap(spark, tmp_path):
    """The reason d29_exact_substr exists: a verbatim run that is NOT
    12-word-block-aligned (d31_block_dedup's blind spot) must still be
    found, at its exact maximal length. Plant a 25-token run shared
    between two docs at offsets 3 and 9 (different diagonals than any
    aligned scheme), plus a decoy pair sharing only 19 tokens (< ES_L)
    that must NOT appear."""
    L = dedup.ES_L  # 20
    run = [f"run{i}" for i in range(25)]
    decoy = [f"dk{i}" for i in range(19)]
    docs = [
        (1, " ".join([f"a{i}" for i in range(3)] + run + ["atail"])),
        (2, " ".join([f"b{i}" for i in range(9)] + run + ["btail", "b2"])),
        (3, " ".join([f"c{i}" for i in range(5)] + decoy)),
        (4, " ".join(decoy + [f"d{i}" for i in range(7)])),
    ]
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(out)
    res = dedup.d29_exact_substr(spark, str(tmp_path)).collect()
    assert len(res) == 1
    r = res[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["max_overlap_tokens"] == 25
    # a 25-token run yields 25 - L + 1 = 6 consecutive anchors, one span
    assert r["n_spans"] == 1 and r["n_anchors"] == 25 - L + 1


def test_exact_substr_multi_span_and_self_repeat(spark, tmp_path):
    """Two DISJOINT shared runs on different diagonals are two spans; a
    within-doc repeat (same doc twice) must never pair with itself."""
    L = dedup.ES_L
    run1 = [f"x{i}" for i in range(L)]        # exactly L -> 1 anchor
    run2 = [f"y{i}" for i in range(L + 4)]    # L+4 -> 5 anchors
    docs = [
        (10, " ".join(run1 + ["gap1", "gap2"] + run2)),
        (20, " ".join(["pre"] + run2 + ["mid"] + run1)),
        # doc 30 contains run1 TWICE (self-repeat): pairs only against
        # docs 10/20, never (30, 30)
        (30, " ".join(run1 + ["z"] + run1)),
    ]
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(out)
    rows = {(r["doc_a"], r["doc_b"]): r
            for r in dedup.d29_exact_substr(spark, str(tmp_path)).collect()}
    assert set(rows) == {(10, 20), (10, 30), (20, 30)}
    r = rows[(10, 20)]
    assert r["n_spans"] == 2
    assert r["max_overlap_tokens"] == L + 4
    # self-repeat doc: run1 appears twice in doc 30, so (10, 30) carries
    # two single-anchor spans (one per copy), max overlap exactly L
    r = rows[(10, 30)]
    assert r["max_overlap_tokens"] == L and r["n_spans"] == 2


def test_substr_span_drop_interval_union(spark, tmp_path):
    """Span removal must charge the LATER doc only, and overlapping spans
    from DIFFERENT partners must merge before counting (no double
    charge). Doc 3 shares tokens 1..25 with doc 1 and tokens 6..30 with
    doc 2 -> union 1..30, so n_dropped = 30, not 50."""
    L = dedup.ES_L
    base = [f"t{i}" for i in range(30)]  # doc 3's first 30 tokens
    docs = [
        (1, " ".join(base[:25] + ["one_a", "one_b"])),
        (2, " ".join(["two_pre"] + base[5:30] + ["two_tail"])),
        (3, " ".join(base + [f"u{i}" for i in range(10)])),
    ]
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(out)
    rows = {r["doc_id"]: r
            for r in dedup.d29_substr_span_drop(spark, str(tmp_path)).collect()}
    # doc 1 is the earliest in both its pairs -> keeps everything
    assert rows[1]["n_dropped"] == 0 and rows[1]["n_tokens"] == 27
    # doc 2 vs doc 1: shared run base[5:25] = 20 tokens at offset 2
    assert rows[2]["n_dropped"] == 20
    # doc 3: union of [1,25] (vs doc 1) and [6,30] (vs doc 2) = 30
    assert rows[3]["n_dropped"] == 30
    assert rows[3]["n_kept"] == rows[3]["n_tokens"] - 30
