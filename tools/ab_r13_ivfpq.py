#!/usr/bin/env python
"""Interleaved A/B settling VERDICT r12 ask #3 for d30_ivf_pq: the r12
rerank-join change (explicit F.broadcast on the bounded candidate side,
commit 6235fa3) vs the pre-r12 plain join, alternated in one session.
Only the rerank join differs; everything upstream is the registry code."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import DoubleType  # noqa: E402

from conceptnetwork_spark import get_spark, registry  # noqa: E402
from conceptnetwork_spark.catalog import Catalog  # noqa: E402
from conceptnetwork_spark.operators.similarity import (  # noqa: E402
    IVF_K,
    IVF_NPROBE,
    PQ_M,
    PQ_RERANK,
    PQ_RERANK_CAP,
    PQ_RERANK_FRAC,
    _cosine_batch,
    _ivf_index,
    _pq_index,
    _sqdist,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ivf_pq(spark, sf_dir, broadcast_cand: bool):
    k, nprobe = IVF_K, IVF_NPROBE
    e = Catalog(spark, sf_dir).embeddings
    centers, assigned = _ivf_index(spark, sf_dir, e)
    books, codes_flat = _pq_index(spark, sf_dir, e)
    codes = codes_flat.join(assigned.select("vec_id", "cell"), "vec_id")
    rerank = min(
        PQ_RERANK_CAP, max(PQ_RERANK, int(e.count() * PQ_RERANK_FRAC))
    )
    cent_df = spark.createDataFrame(
        [(int(c), [float(x) for x in centers[c]]) for c in range(k)],
        "cell int, cvec array<double>",
    )
    d2q = F.aggregate(
        F.zip_with(
            F.col("qvec").cast("array<double>"),
            F.col("cvec"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wp = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("cell"))
    q = (
        e.where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("d2", d2q)
        .withColumn("prank", F.row_number().over(wp))
        .where(F.col("prank") <= nprobe)
        .select("qid", "qvec", "cell")
    )
    b_books = spark.sparkContext.broadcast(books)

    @F.pandas_udf(DoubleType())
    def adc_dist(qvec: pd.Series, codes_s: pd.Series) -> pd.Series:
        bk = b_books.value
        dsub = bk.shape[2]
        qm = np.vstack(qvec.to_numpy()).astype(np.float64)
        c = np.vstack(codes_s.to_numpy()).astype(np.int64)
        uq, inv = np.unique(qm, axis=0, return_inverse=True)
        out = np.zeros(len(qm))
        for m in range(PQ_M):
            tbl = _sqdist(uq[:, m * dsub : (m + 1) * dsub], bk[m])
            out += tbl[inv, c[:, m]]
        return pd.Series(out)

    scored = codes.join(F.broadcast(q), ["cell"]).where(
        F.col("qid") != F.col("vec_id")
    )
    wc = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    cand = (
        scored.withColumn("adc", adc_dist("qvec", "codes"))
        .withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= rerank)
        .select("qid", "qvec", "vec_id")
    )
    left = F.broadcast(cand) if broadcast_cand else cand
    rer = left.join(
        e.select(F.col("vec_id"), F.col("embedding").alias("cvec")), "vec_id"
    ).withColumn("sim", F.round(_cosine_batch("qvec", "cvec"), 4))
    w2 = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= 10)
        .select("qid", "rank", "vec_id", "sim")
        .orderBy("qid", "rank")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="ab-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry.queries()["d30_ivf_pq"]
    a = ivf_pq(spark, SF, broadcast_cand=False).collect()
    b = ivf_pq(spark, SF, broadcast_cand=True).collect()
    c = reg(spark, SF).collect()
    assert a == b == c, "results differ"
    print(f"results identical ({len(a)} rows); registry == broadcast shape")
    reps = int(os.environ.get("AB_REPS", "6"))
    t_old, t_new = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"ivfpq:plain:{i}")
        t0 = time.perf_counter(); noop(ivf_pq(spark, SF, False)); t_old.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"ivfpq:broadcast:{i}")
        t0 = time.perf_counter(); noop(ivf_pq(spark, SF, True)); t_new.append(time.perf_counter() - t0)
    print(f"plain-join min={min(t_old):.3f} med={sorted(t_old)[len(t_old)//2]:.3f} | "
          f"broadcast min={min(t_new):.3f} med={sorted(t_new)[len(t_new)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
