"""Text-analysis behavior tests (language-ID accuracy on real multilingual
snippets; fingerprint/dedup properties) and the MLlib pipeline surface
(fit/transform/evaluate/save/load)."""

import pytest

from pyspark.sql import functions as F

from conceptnetwork_spark.operators import ml, text
from conceptnetwork_spark.operators.multimodal import (
    extract_media_metadata,
    fake_feature_extract,
)

REAL_SNIPPETS = [
    ("the cat sat on the mat and it is warm in that house", "en"),
    ("der hund ist nicht mit der katze und das ist ein problem", "de"),
    ("el perro es un animal que vive en la casa con los gatos", "es"),
    ("le chien est dans la maison et les chats sont une famille", "fr"),
    ("今天天气很好我们去公园散步", "zh"),
]


def test_lang_id_on_real_snippets(spark):
    df = spark.createDataFrame(REAL_SNIPPETS, ["text", "expected"])
    out = df.select("expected", text.lang_id(F.col("text")).alias("pred")).collect()
    for r in out:
        assert r.pred == r.expected, f"lang_id({r.expected}) -> {r.pred}"


def test_lang_id_unknown(spark):
    df = spark.createDataFrame([("zzz qqq xxx",)], ["text"])
    assert df.select(text.lang_id(F.col("text")).alias("p")).collect()[0].p == "und"


def test_ols_pipeline_save_load(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(100)], ["x", "y"]
    )
    model, preds, mse = ml.fit_transform_evaluate(df, ["x"], "y")
    assert mse == pytest.approx(0.0, abs=1e-6)
    lrm = model.stages[-1]
    assert float(lrm.coefficients[0]) == pytest.approx(2.0, abs=1e-6)
    assert float(lrm.intercept) == pytest.approx(1.0, abs=1e-6)
    # R3 checkpoint hook: save + restore must predict identically
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    restored = PipelineModel.load(path)
    p1 = [r.prediction for r in model.transform(df).collect()]
    p2 = [r.prediction for r in restored.transform(df).collect()]
    assert p1 == p2


def test_ols_grouped_wls_equals_raw_row_fit(spark):
    """Pin for the d33_ols_mse optimization (r12): fitting WLS on per-x
    sufficient statistics (count, mean-y per distinct x) must reproduce the
    raw-row OLS solution — the weighted normal equations expand to the
    raw-row ones, so any drift here is an implementation bug, not noise.
    Uses duplicated x values with distinct y so the grouping is non-trivial."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.regression import LinearRegression

    rows = [
        (float(x % 7), 2.5 * (x % 7) - 4.0 + ((x * 37) % 11 - 5) * 0.3)
        for x in range(500)
    ]
    df = spark.createDataFrame(rows, ["x", "y"])
    raw = ml.build_ols_pipeline(["x"], "y").fit(df).stages[-1]

    g = df.groupBy("x").agg(
        F.count(F.lit(1)).cast("double").alias("w"), F.avg("y").alias("ybar")
    )
    assembled = g.select(
        array_to_vector(F.array(F.col("x"))).alias("features"), "ybar", "w"
    )
    wls = LinearRegression(
        featuresCol="features",
        labelCol="ybar",
        weightCol="w",
        solver="normal",
        regParam=0.0,
        standardization=False,
    ).fit(assembled)
    assert float(wls.coefficients[0]) == pytest.approx(
        float(raw.coefficients[0]), rel=1e-9
    )
    assert float(wls.intercept) == pytest.approx(float(raw.intercept), rel=1e-9)


def test_gbt_pipeline_nonlinear_beats_linear(spark, tmp_path):
    """M2 parity: the reference network is dense(100, relu) -> dense(n) —
    nonlinear. On a quadratic relation the GBT stage must (a) be exactly
    deterministic across fits given the seed, (b) save/load to identical
    predictions (R3), and (c) beat the linear stage's training MSE."""
    df = spark.createDataFrame(
        [(float(x), 0.5 * x * x - 3.0 * x + 2.0) for x in range(200)], ["x", "y"]
    )
    m1 = ml.build_pipeline(["x"], "y", model="gbt").fit(df)
    m2 = ml.build_pipeline(["x"], "y", model="gbt").fit(df)
    p1 = [r.prediction for r in m1.transform(df).collect()]
    p2 = [r.prediction for r in m2.transform(df).collect()]
    assert p1 == p2, "seeded GBT fit must be deterministic"

    path = str(tmp_path / "gbt_model")
    m1.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    restored = PipelineModel.load(path)
    p3 = [r.prediction for r in restored.transform(df).collect()]
    assert p1 == p3, "restored model must predict identically"

    def mse(model):
        return (
            model.transform(df)
            .agg(F.avg(F.pow(F.col("y") - F.col("prediction"), 2)).alias("m"))
            .collect()[0]["m"]
        )

    lin = ml.build_pipeline(["x"], "y", model="linear").fit(df)
    assert mse(m1) < mse(lin) / 10, "nonlinear stage must fit the quadratic"


def test_gbt_declared_query_deterministic(spark):
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = queries()["d33_gbt_mse"](spark, SF_SMOKE).collect()
    b = queries()["d33_gbt_mse"](spark, SF_SMOKE).collect()
    assert a == b and a[0].mse >= 0.0


def test_media_metadata_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"hello")), (2, bytearray(b"\x00\x01\x02"))],
        "doc_id long, payload binary",
    )
    meta = {r.doc_id: r for r in extract_media_metadata(df).collect()}
    assert meta[1].n_bytes == 5
    assert meta[1].sha.startswith("2cf24dba")  # sha256('hello')
    assert meta[2].head_hex == "000102"


def test_fake_feature_extract_shape(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abcdefgh"))], "doc_id long, payload binary"
    )
    row = fake_feature_extract(df, n_features=4).collect()[0]
    assert len(row.features) == 4
    assert sum(row.features) == 8


def test_ppm_codec_round_trip():
    import numpy as np

    from conceptnetwork_spark.operators.multimodal import decode_ppm, encode_ppm

    a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_ppm(encode_ppm(a)) == a).all()
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)  # P5 grayscale
    d = decode_ppm(encode_ppm(g))
    assert d.shape == (3, 4, 1) and (d.squeeze(-1) == g).all()
    # full netpbm header grammar: comments + arbitrary whitespace
    hdr = b"P6\n# comment\n 3  2 # trailing\n255\n" + bytes(range(18))
    assert decode_ppm(hdr).shape == (2, 3, 3)
    with pytest.raises(ValueError, match="netpbm"):
        decode_ppm(b"JFIF....")


def test_resize_nearest_center_aligned():
    import numpy as np

    from conceptnetwork_spark.operators.multimodal import _resize_nearest

    a = np.arange(8, dtype=np.uint8)[:, None].repeat(4, axis=1)  # 8x4, v=row
    r = _resize_nearest(a, 2, 2)
    # center-aligned nearest: rows floor(0.5*8/2)=2 and floor(1.5*8/2)=6
    assert r.shape == (2, 2) and list(r[:, 0]) == [2, 6]


def test_decode_resize_spark_kernels(spark):
    from conceptnetwork_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        resize_image,
    )
    import numpy as np

    imgs = [
        (1, bytearray(encode_ppm(np.full((4, 6, 3), 9, dtype=np.uint8)))),
        (2, bytearray(encode_ppm(np.zeros((8, 2), dtype=np.uint8)))),  # P5
    ]
    df = spark.createDataFrame(imgs, "doc_id long, payload binary")
    stats = {r.doc_id: r for r in decode_image(df).collect()}
    assert (stats[1].width, stats[1].height, stats[1].channels) == (6, 4, 3)
    assert stats[1].mean_r == 9.0 and stats[1].px_sum == 4 * 6 * 3 * 9
    assert (stats[2].width, stats[2].height, stats[2].channels) == (2, 8, 1)
    rs = {r.doc_id: r for r in decode_image(resize_image(df, 3, 2)).collect()}
    assert (rs[1].width, rs[1].height) == (3, 2)
    assert (rs[2].width, rs[2].height, rs[2].channels) == (3, 2, 1)


def test_tfidf_pipeline_deterministic(spark):
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = queries()["d31_tfidf"](spark, SF_SMOKE).collect()
    b = queries()["d31_tfidf"](spark, SF_SMOKE).collect()
    assert a == b, "TF-IDF featurization must be deterministic"
    assert all(r.nnz > 0 for r in a), "every doc should have features"


def test_frame_sample_plumbing(spark):
    from conceptnetwork_spark.operators.multimodal import fake_frame_sample

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(64)))), (2, bytearray(b"tiny"))],
        "doc_id long, payload binary",
    )
    out = fake_frame_sample(df, n_frames=4, frame_bytes=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, bytes(r.frame)))
    assert len(by_doc[1]) == 4 and by_doc[1][0][1] == bytes(range(8))
    assert len(by_doc[2]) == 4  # short payload still yields frames


def test_mlp_deterministic_and_better_than_majority(spark):
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = queries()["d33_mlp_accuracy"](spark, SF_SMOKE).collect()[0].accuracy
    b = queries()["d33_mlp_accuracy"](spark, SF_SMOKE).collect()[0].accuracy
    assert a == b, "seeded MLP fit must be deterministic"
    assert a > 0.5, f"MLP must beat the majority class (got {a})"


def test_wav_codec_round_trip():
    import numpy as np

    from conceptnetwork_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav,
    )

    samples = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int64)
    payload = encode_wav(samples, sample_rate=44100)
    sr, back = decode_wav_bytes(payload)
    assert sr == 44100
    assert back.tolist() == samples.tolist()


def test_wav_decode_walks_extra_chunks():
    """A LIST/INFO chunk between fmt and data (common in real files) must
    not break the chunk walk; odd-length chunks are word-aligned."""
    import struct

    import numpy as np

    from conceptnetwork_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav,
    )

    base = encode_wav(np.array([1, 2, 3], dtype=np.int64))
    fmt_chunk = base[12:36]          # 'fmt ' + 16-byte body
    data_chunk = base[36:]
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd, padded
    payload = base[:12] + fmt_chunk + extra + data_chunk
    sr, back = decode_wav_bytes(payload)
    assert sr == 8000 and back.tolist() == [1, 2, 3]


def test_wav_decode_rejects_malformed():
    import pytest

    from conceptnetwork_spark.operators.multimodal import decode_wav_bytes

    with pytest.raises(ValueError):
        decode_wav_bytes(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError):
        # stereo flagged in fmt -> unsupported, must raise not mis-decode
        import struct

        hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 40, b"WAVE",
            b"fmt ", 16, 1, 2, 8000, 32000, 4, 16,
            b"data", 4,
        )
        decode_wav_bytes(hdr + b"\x00\x00\x00\x00")


def test_logreg_deterministic_and_above_chance(spark):
    """The linear probe over the embedding table must be reproducible
    run-to-run and clearly separate class 0 from the rest (AUC floor 0.7
    — chance is 0.5; the planted clusters make the class linearly
    separable well above that)."""
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = queries()["d33_logreg_auc"](spark, SF_SMOKE).collect()[0].auc
    b = queries()["d33_logreg_auc"](spark, SF_SMOKE).collect()[0].auc
    assert a == b, f"non-deterministic logreg: {a} vs {b}"
    assert a >= 0.7, f"AUC {a} below floor"


def test_jpeg_header_walker():
    """The marker walker must recover SOF0 dimensions through preceding
    variable-length segments, reject non-JPEG bytes, and reject JPEGs
    with no frame header."""
    from conceptnetwork_spark.operators.multimodal import (
        make_jpeg_bytes,
        parse_jpeg_header,
    )

    for w, h in [(64, 48), (1920, 1080), (161, 97)]:
        assert parse_jpeg_header(make_jpeg_bytes(w, h, 75)) == (w, h, 3)
    assert parse_jpeg_header(b"") is None
    assert parse_jpeg_header(b"\x89PNG\r\n\x1a\n") is None
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None  # SOI+EOI only
    # truncated mid-segment: must not raise
    jpg = make_jpeg_bytes(640, 480, 80)
    assert parse_jpeg_header(jpg[:6]) is None


def test_kmeans_deterministic_and_clusters_structure(spark):
    """Seeded KMeans must be reproducible run-to-run, its size-ranked
    output must cover every embedding exactly once, and total
    within-cluster scatter must be strictly below the k=1 scatter. (In
    64-d the noise dims dominate the planted cluster shift, so the
    reduction is small but must be real — a broken assignment would tie
    or exceed the single-blob scatter.)"""
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = [r.asDict() for r in queries()["d33_kmeans"](spark, SF_SMOKE).collect()]
    b = [r.asDict() for r in queries()["d33_kmeans"](spark, SF_SMOKE).collect()]
    assert a == b, "seeded KMeans fit must be deterministic"

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = emb.count()
    assert sum(r["n_points"] for r in a) == n, "clusters must partition the table"

    # k=1 baseline scatter = total variance around the global centroid
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    v = emb.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("f")
    )
    mean_var = v.select(
        Summarizer.mean(F.col("f")).alias("m"), Summarizer.variance(F.col("f")).alias("s")
    ).collect()[0]
    k1_wss = sum(mean_var.s.toArray()) * (n - 1)
    k8_wss = sum(r["wss"] for r in a)
    assert k8_wss < 0.98 * k1_wss, f"k=8 scatter {k8_wss} not below k=1 {k1_wss}"


def test_cross_validation_deterministic_and_picks_unregularized(spark):
    """Seeded CV over [regParam 0, 100] on an exactly-linear target must
    be run-to-run deterministic and select regParam=0 (any ridge penalty
    strictly hurts a noiseless linear fit)."""
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = queries()["d33_cross_validation"](spark, SF_SMOKE).collect()[0]
    b = queries()["d33_cross_validation"](spark, SF_SMOKE).collect()[0]
    assert a == b, "seeded CrossValidator must be deterministic"
    assert a.best_reg_param == 0.0
    assert a.mse_reg0 < a.mse_reg100


def test_freq_items_contains_true_mode(spark):
    """freqItems' no-false-negative guarantee: the genuine modal priority
    must be in the returned set at support 0.25."""
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    got = {
        r.o_orderpriority
        for r in queries()["d11_freq_items"](spark, SF_SMOKE).collect()
    }
    true_mode = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .groupBy("o_orderpriority")
        .count()
        .orderBy(F.desc("count"))
        .first()
        .o_orderpriority
    )
    assert true_mode in got, f"{true_mode} not in {got}"


def test_als_deterministic_and_better_than_chance(spark):
    """Seeded ALS must reproduce exactly run-to-run and emit a scored
    top-1 recommendation for every requested user (coldStart=drop means
    a missing score would silently shrink the output)."""
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = [r.asDict() for r in queries()["d33_als_recs"](spark, SF_SMOKE).collect()]
    b = [r.asDict() for r in queries()["d33_als_recs"](spark, SF_SMOKE).collect()]
    assert a == b, "seeded ALS must be deterministic"
    assert len(a) > 0 and all(r["score"] is not None for r in a)


def test_bpe_train_matches_reference_exactly(spark):
    """d34_bpe_train vs a single-node Sennrich BPE on the same vocabulary:
    the merge SEQUENCE (pairs and counts, in order) and the final symbol
    count must agree exactly. Tie-break parity note: Spark orders the
    joined pair string 'a\\x1fb'; because the \\x1f separator sorts below
    every symbol character, string order equals (a, b) tuple order, which
    is what the reference uses."""
    from collections import Counter

    from conceptnetwork_spark.operators.pipeline import (
        BPE_ITERS,
        bpe_word_table,
    )
    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_ORACLE

    rows = queries()["d34_bpe_train"](spark, SF_ORACLE).collect()
    assert len(rows) == BPE_ITERS

    wt = {
        r["word"]: r["cnt"]
        for r in bpe_word_table(spark, SF_ORACLE).collect()
    }
    vocab: dict[tuple, int] = {}
    for w, c in wt.items():
        k = tuple(list(w) + ["</w>"])
        vocab[k] = vocab.get(k, 0) + c
    merges = []
    for _ in range(BPE_ITERS):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == a and s == b:
                    out.append(a + b)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            k = tuple(out)
            new[k] = new.get(k, 0) + c
        vocab = new

    got = [(r["left"], r["right"], r["pair_count"]) for r in rows]
    assert got == merges, f"merge sequence diverged: {got} vs {merges}"
    final_syms = {s for syms in vocab for s in syms}
    assert rows[0]["final_symbols"] == len(final_syms)


def test_pca_spectrum_matches_numpy(spark):
    """MLlib's explained-variance ratios vs numpy eigh on the same sample
    covariance matrix: agreement to 1e-6 (sign-invariant spectrum only)."""
    import numpy as np

    from conceptnetwork_spark.registry import queries
    from tests.conftest import SF_ORACLE

    rows = queries()["d33_pca_spectrum"](spark, SF_ORACLE).collect()
    got = [r["explained"] for r in rows]

    import pyarrow.parquet as pq

    X = np.array(
        pq.read_table(f"{SF_ORACLE}/embeddings.parquet")
        .to_pandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False)  # sample covariance, ddof=1 like MLlib
    w = np.linalg.eigvalsh(C)[::-1]
    want = (w / w.sum())[:8]
    assert np.allclose(got, np.round(want, 6), atol=2e-6), (got, want[:8])
