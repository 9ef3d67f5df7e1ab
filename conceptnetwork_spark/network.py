"""Network: a named registry of Concepts composed into one record schema.

Reference parity (``conceptnetwork/network.py``):
- ``self.concepts = dict()`` registry (``network.py:12-16``) -> ``add()``.
- default ``preprocess`` concatenates per-concept features under a prefix
  namespace (``network.py:74-87``) -> here one nested struct column per
  concept (see schema.py rationale).
- feature/target partition by per-concept ``target`` flag
  (``network.py:18-35``) -> ``feature_names``/``target_names`` +
  ``select_features``/``select_targets``.
- ``build_input_fn`` (glob->read->parse->split, ``network.py:165-216``) ->
  ``read``: schema-projected parquet scan + two selects.
- ``build_model_fn`` mode dispatch (``network.py:135-163``) -> the MLlib
  pipeline in ``operators/ml.py``; ``feature_engineering_fn``
  (``network.py:116-122``) -> per-concept hook application in ``transform``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from conceptnetwork_spark.concept import Concept, short_repr
from conceptnetwork_spark.schema import FeatureSpec, network_schema


class Network:
    version = "1.0"

    def __init__(self):
        self.concepts: dict[str, Concept] = {}

    def add(self, concept: Concept) -> "Network":
        self.concepts[concept.name] = concept
        return self

    # -- column partition (network.py:18-35) --------------------------------
    @property
    def feature_names(self) -> list[str]:
        return [n for n, c in self.concepts.items() if not c.target]

    @property
    def target_names(self) -> list[str]:
        return [n for n, c in self.concepts.items() if c.target]

    # -- schema (network.py:89-100) -----------------------------------------
    def featdef(self) -> dict[str, FeatureSpec]:
        return {n: c.featdef() for n, c in self.concepts.items()}

    def schema(self):
        return network_schema(self.featdef())

    # -- encode a raw-input DataFrame (network.py:74-87; P2) -----------------
    def preprocess(self, df: DataFrame, raw_cols: dict[str, str]) -> DataFrame:
        """One raw input column per concept -> one struct column per concept.

        ``raw_cols`` maps concept name -> source column, mirroring the
        per-concept raw_input dict at ``network.py:76-84``.
        """
        out = [
            c.preprocess(F.col(raw_cols[name])).alias(name)
            for name, c in self.concepts.items()
        ]
        return df.select(*out)

    # -- feature engineering fan-out (network.py:45-59,116-122; P10/P11) -----
    def transform(self, df: DataFrame) -> DataFrame:
        cols: list[Column] = []
        for name, c in self.concepts.items():
            cols.append(c.feature_engineering(F.col(name)).alias(name))
        return df.select(*cols)

    # -- per-concept inference fan-out (network.py:45-59; P10/M1) ------------
    def feature_vectors(self, df: DataFrame, targets: bool = False) -> DataFrame:
        """``get_featurevectors``/``get_targetvectors`` analogue: one vector
        (array<double>) column per (non-)target concept via each concept's
        ``inference`` hook — the M1 embedding surface feeding the model."""
        names = self.target_names if targets else self.feature_names
        cols = [
            self.concepts[n].inference(F.col(n)).alias(f"{n}_vec") for n in names
        ]
        return df.select(*cols)

    # -- feature/target projection (network.py:204-214; P7/P8) ---------------
    def select_features(self, df: DataFrame) -> DataFrame:
        return df.select(*self.feature_names)

    def select_targets(self, df: DataFrame) -> DataFrame:
        return df.select(*self.target_names)

    # -- input pipeline (network.py:165-216; S3/S4) ---------------------------
    def read(self, spark: SparkSession, path: str, shuffle_seed: int | None = None) -> DataFrame:
        """Schema-projected scan; optional deterministic shuffle (B2,
        ``network.py:199`` randomize_input)."""
        df = spark.read.schema(self.schema()).parquet(path)
        if shuffle_seed is not None:
            df = df.orderBy(F.rand(shuffle_seed))
        return df

    def write(self, df: DataFrame, path: str, fmt: str = "parquet") -> None:
        """Materialize encoded records (S2). Parquet is canonical
        (SURVEY §1.4); ``fmt='tfrecord'`` writes the reference's gzip
        TFRecord format via the hand-rolled sink (flattened to the
        reference's ``<concept>_<feature>`` layout first, since Example
        features are a flat namespace)."""
        if fmt == "tfrecord":
            from conceptnetwork_spark.schema import flatten
            from conceptnetwork_spark.sources.tfrecord import write_tfrecords

            write_tfrecords(flatten(df, list(self.concepts)), path)
        else:
            df.write.mode("overwrite").parquet(path)

    def __repr__(self) -> str:  # R2 composite naming (network.py:61-65)
        parts = [f"{type(self).__name__}{self.version.replace('.', '')}"]
        parts += [short_repr(type(c).__name__) for c in self.concepts.values()]
        return "".join(parts)
