"""Reference-faithful data-model tests: Concept/Network round-trips
(the reference's ``_test`` smoke protocol, conceptnetwork/concept.py:75-121,
upgraded with real assertions per SURVEY §5)."""

import pytest

from pyspark.sql import functions as F

from conceptnetwork_spark.concept import Concept, short_repr
from conceptnetwork_spark.network import Network
from conceptnetwork_spark.schema import FeatureSpec, FLOAT, flatten, unflatten


class MinimalConcept(Concept):
    """Faithful re-expression of examples/trainer/concepts/minimal_concept.py:
    '123,m' -> {candidate_id: 123.0, gender: 0.0}; unknown sex -> -1.0
    (the reference's Concept.NA_INTEGER default branch, minus its latent
    undefined-attribute bug)."""

    version = "1.1"
    NA = -1.0
    GENDER_MAP = {"m": 0.0, "male": 0.0, "f": 1.0, "female": 1.0}

    def featdef(self) -> FeatureSpec:
        return FeatureSpec().add("candidate_id", FLOAT).add("gender", FLOAT)

    def preprocess(self, raw):
        parts = F.split(raw, ",")
        sex = F.lower(F.element_at(parts, 2))
        gender_expr = F.lit(self.NA)
        for k, v in sorted(self.GENDER_MAP.items()):
            gender_expr = F.when(sex == k, F.lit(v)).otherwise(gender_expr)
        return F.struct(
            F.element_at(parts, 1).cast("double").alias("candidate_id"),
            gender_expr.alias("gender"),
        )


@pytest.fixture
def net():
    return (
        Network()
        .add(MinimalConcept("origin"))
        .add(MinimalConcept("tgt", target=True))
    )


def test_concept_parse_and_default(spark):
    c = MinimalConcept("origin")
    df = spark.createDataFrame(
        [("123,m",), ("77,Female",), ("5,x",)], ["raw"]
    ).select(c.preprocess(F.col("raw")).alias("origin"))
    rows = {r.origin.candidate_id: r.origin.gender for r in df.collect()}
    assert rows == {123.0: 0.0, 77.0: 1.0, 5.0: -1.0}


def test_concept_round_trip(spark, tmp_path):
    c = MinimalConcept("origin")
    back = c.run_round_trip(spark, ["123,m"] * 32, str(tmp_path / "rt"))
    assert back.count() == 32
    row = back.collect()[0]
    assert row.origin.candidate_id == 123.0 and row.origin.gender == 0.0


def test_network_schema_and_split(net):
    assert net.feature_names == ["origin"]
    assert net.target_names == ["tgt"]
    schema = net.schema()
    assert [f.name for f in schema.fields] == ["origin", "tgt"]
    assert [f.name for f in schema["origin"].dataType.fields] == [
        "candidate_id",
        "gender",
    ]


def test_network_preprocess_write_read(spark, net, tmp_path):
    raw = spark.createDataFrame([("1,m", "2,f")], ["a", "b"])
    enc = net.preprocess(raw, {"origin": "a", "tgt": "b"})
    net.write(enc, str(tmp_path / "net"))
    back = net.read(spark, str(tmp_path / "net"))
    r = back.collect()[0]
    assert (r.origin.candidate_id, r.origin.gender) == (1.0, 0.0)
    assert (r.tgt.candidate_id, r.tgt.gender) == (2.0, 1.0)
    feats = net.select_features(back)
    tgts = net.select_targets(back)
    assert feats.columns == ["origin"] and tgts.columns == ["tgt"]


def test_flatten_unflatten_round_trip(spark, net):
    raw = spark.createDataFrame([("1,m", "2,f")], ["a", "b"])
    enc = net.preprocess(raw, {"origin": "a", "tgt": "b"})
    flat = flatten(enc, ["origin", "tgt"])
    assert set(flat.columns) == {
        "origin_candidate_id",
        "origin_gender",
        "tgt_candidate_id",
        "tgt_gender",
    }
    nested = unflatten(flat, net.featdef())
    assert nested.select("origin.candidate_id").collect()[0][0] == 1.0


def test_underscore_concept_name_unambiguous(spark):
    """The reference's split('_') prefix-strip (network.py:42,207) breaks for
    concept names containing '_'; the struct model must not."""
    net = Network().add(MinimalConcept("my_concept"))
    raw = spark.createDataFrame([("9,f",)], ["a"])
    enc = net.preprocess(raw, {"my_concept": "a"})
    flat = flatten(enc, ["my_concept"])
    assert "my_concept_candidate_id" in flat.columns
    nested = unflatten(flat, net.featdef())
    assert nested.select("my_concept.gender").collect()[0][0] == 1.0


def test_r2_naming(net):
    # R2: repr = class+version (dots stripped) + concept short-reprs
    assert repr(net) == "Network10minconmincon"
    assert short_repr("MinimalConcept") == "mincon"


def test_inference_vector(spark):
    c = MinimalConcept("origin")
    df = spark.createDataFrame([("3,f",)], ["raw"]).select(
        c.preprocess(F.col("raw")).alias("origin")
    )
    vec = df.select(c.inference(F.col("origin")).alias("v")).collect()[0].v
    assert vec == [3.0, 1.0]


def test_network_feature_vectors_and_tfrecord_write(spark, tmp_path):
    """M1/P10 inference fan-out + TFRecord write path through the Network API."""
    net = Network().add(MinimalConcept("origin")).add(MinimalConcept("tgt", target=True))
    raw = spark.createDataFrame([("1,m",), ("2,f",)], ["value"])
    enc = net.preprocess(raw, {"origin": "value", "tgt": "value"})

    vecs = net.feature_vectors(enc)
    assert vecs.columns == ["origin_vec"]
    row = vecs.orderBy("origin_vec").first()
    assert row.origin_vec == [1.0, 0.0]

    tvecs = net.feature_vectors(enc, targets=True)
    assert tvecs.columns == ["tgt_vec"]

    out = str(tmp_path / "tfr_net")
    net.write(enc, out, fmt="tfrecord")
    from conceptnetwork_spark.sources.tfrecord import read_tfrecords

    back = read_tfrecords(
        spark, out,
        "origin_candidate_id double, origin_gender double, "
        "tgt_candidate_id double, tgt_gender double",
    )
    got = sorted((r.origin_candidate_id, r.origin_gender) for r in back.collect())
    assert got == [(1.0, 0.0), (2.0, 1.0)]


def test_runner_e2e_chain(spark, tmp_path, capsys):
    """Reference-faithful E2E chain (examples/trainer/runner.py:52-114,
    test -> dataprep -> train) through ONE runner invocation: raw lines ->
    MinimalConcept dataprep -> R2-named parquet -> D33 OLS fit. Second run
    without --force-dataprep must hit the cache (the reference's
    --dfnetwork output-reuse semantics, runner.py:62-66)."""
    import os

    from conceptnetwork_spark import runner

    inp = tmp_path / "lines.txt"
    # blank + malformed lines are dropped by the parse phase; 'x' -> NA
    inp.write_text("1,m\n2,f\n\n3,x\nbad\n")
    out_root = str(tmp_path / "run")

    rc = runner.main(
        ["--input", str(inp), "--output", out_root, "--notest", "--train"]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    out_dir = os.path.join(out_root, "Network10minconmincon")
    assert f"dataprep output: {out_dir}" in printed
    assert "train mse:" in printed
    mse = float(printed.rsplit("train mse:", 1)[1].strip())
    assert mse < 1e-6  # y == x: OLS must fit exactly

    enc = spark.read.parquet(out_dir)
    got = sorted(
        (r.origin.candidate_id, r.origin.gender) for r in enc.collect()
    )
    assert got == [(1.0, 0.0), (2.0, 1.0), (3.0, -1.0)]

    # cache-hit: rerun must NOT rewrite the output (mtime fingerprint)
    before = os.path.getmtime(os.path.join(out_dir, "_SUCCESS"))
    rc2 = runner.main(
        ["--input", str(inp), "--output", out_root, "--notest"]
    )
    assert rc2 == 0
    assert os.path.getmtime(os.path.join(out_dir, "_SUCCESS")) == before
