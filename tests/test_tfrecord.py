"""TFRecord source/sink round-trip (reference S2/S3/S4/S5 fidelity,
``conceptnetwork/concept.py:75-121`` smoke-test shape: N copies of a fixture
record through the sink and back through schema-on-read parse)."""

import glob
import gzip
import io

import pytest

from pyspark.sql import functions as F

from conceptnetwork_spark.sources import tfrecord as tfr


def test_crc32c_known_vectors():
    # public CRC-32C check values
    assert tfr.crc32c(b"") == 0
    assert tfr.crc32c(b"123456789") == 0xE3069283


def test_example_proto_round_trip():
    feats = {
        "candidate_id": [42.0],
        "gender": [1.0],
        "name": ["alice"],
        "counts": [1, 2, 3],
    }
    buf = tfr.encode_example(feats)
    back = tfr.decode_example(buf)
    assert back["candidate_id"] == pytest.approx([42.0])
    assert back["gender"] == pytest.approx([1.0])
    assert back["name"] == [b"alice"]
    assert back["counts"] == [1, 2, 3]


def test_framing_round_trip():
    fh = io.BytesIO()
    recs = [b"abc", b"", b"x" * 1000]
    for r in recs:
        tfr.write_record(fh, r)
    fh.seek(0)
    assert list(tfr.read_records(fh)) == recs


def test_framing_detects_corruption():
    fh = io.BytesIO()
    tfr.write_record(fh, b"hello world")
    corrupted = bytearray(fh.getvalue())
    corrupted[14] ^= 0xFF  # flip a data byte
    with pytest.raises(ValueError, match="CRC"):
        list(tfr.read_records(io.BytesIO(bytes(corrupted))))


def test_dataframe_round_trip(spark, tmp_path):
    """Fixture rows -> gzip TFRecord shards -> binaryFile+decode -> equality
    (the reference writes 32 copies of one record and reads them back)."""
    rows = [(float(i), i % 2, f"user{i}", [0.1 * i, 0.2 * i]) for i in range(32)]
    df = spark.createDataFrame(
        rows, "candidate_id double, flag long, name string, emb array<double>"
    )
    out = str(tmp_path / "tfr")
    n = tfr.write_tfrecords(df.repartition(4), out)
    assert n == 32
    shards = glob.glob(f"{out}/part-*.tfrecord.gz")
    assert shards, "expected gzip shards"
    with gzip.open(shards[0], "rb") as fh:
        fh.read(1)  # really gzip

    back = tfr.read_tfrecords(
        spark, out, "candidate_id double, flag long, name string, emb array<double>"
    )
    got = sorted(
        (r.candidate_id, r.flag, r.name, [round(x, 5) for x in r.emb])
        for r in back.collect()
    )
    want = sorted(
        (cid, flag, name, [round(float(f"{x:.7g}"), 5) for x in emb])
        for cid, flag, name, emb in rows
    )
    # float32 storage: compare at reduced precision
    for g, w in zip(got, want):
        assert g[0] == pytest.approx(w[0], abs=1e-5)
        assert g[1] == w[1]
        assert g[2] == w[2]
        assert g[3] == pytest.approx(w[3], abs=1e-4)


def test_schema_projection_drops_features(spark, tmp_path):
    """S4 schema-on-read: requesting a column subset parses only those."""
    df = spark.createDataFrame([(1.0, "a"), (2.0, "b")], "x double, s string")
    out = str(tmp_path / "proj")
    tfr.write_tfrecords(df, out)
    back = tfr.read_tfrecords(spark, out, "x double")
    assert back.columns == ["x"]
    assert sorted(r.x for r in back.collect()) == pytest.approx([1.0, 2.0])
