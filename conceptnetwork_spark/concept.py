"""Concept: per-entity feature encoder (reference ``conceptnetwork/concept.py``).

A Concept turns one raw input column into a struct of named, typed features
(``concept.py:34-39`` preprocess contract), declares its schema
(``concept.py:41-46`` featdef), optionally marks itself as the training
target (``concept.py:11-17``), and exposes a feature-engineering hook with
identity default (``concept.py:48-51``).

Engine expression: ``preprocess`` is a *Column expression builder* — it takes
the raw input Column and returns a struct Column built from
``pyspark.sql.functions`` (JVM-side, codegen'd). Python/pandas UDFs are the
explicitly-opt-in slow path (``preprocess_pandas``) for encoders that can't
be expressed relationally; the base class keeps everything declarative so
Catalyst sees through it.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conceptnetwork_spark.schema import FeatureSpec


def short_repr(name: str) -> str:
    """Deterministic short name: first 3 chars of each CamelCase word.

    Reference R2 naming (``concept.py:19-25``): used as the lineage/cache key
    for run outputs (``examples/trainer/runner.py:78-80,99-101``).
    """
    words = re.findall(r"[A-Z][a-z0-9]*|[a-z0-9]+", name)
    return "".join(w[:3].lower() for w in words)


class Concept:
    """Named feature encoder. Subclasses override ``featdef``/``preprocess``."""

    version = "1.0"

    def __init__(self, name: str, target: bool = False, checkpoint_path: str | None = None):
        # target and checkpoint_path are mutually exclusive (concept.py:13-15)
        if target and checkpoint_path:
            raise ValueError("a target concept cannot restore from a checkpoint")
        self.name = name
        self.target = target
        self.checkpoint_path = checkpoint_path

    # -- schema ------------------------------------------------------------
    def featdef(self) -> FeatureSpec:
        raise NotImplementedError

    # -- encode (P2/P3) ----------------------------------------------------
    def preprocess(self, raw: Column) -> Column:
        """raw input Column -> struct Column matching ``featdef()``."""
        raise NotImplementedError

    # -- feature engineering hook (P9), identity default -------------------
    def feature_engineering(self, features: Column) -> Column:
        return features

    # -- inference hook (M1): features struct -> vector column --------------
    def inference(self, features: Column) -> Column:
        """Default: stack declared float features into an array (M1/P13)."""
        spec = self.featdef()
        return F.array(
            *[features.getField(n).cast("double") for n in spec.names()]
        )

    def __repr__(self) -> str:  # R2: class name + version, dots stripped
        return f"{type(self).__name__}{self.version.replace('.', '')}"

    # -- round-trip smoke test (reference _test, concept.py:75-121) ---------
    def run_round_trip(self, spark, raw_values: list[str], tmp_path: str) -> DataFrame:
        """fixture rows -> encode -> parquet -> read back. Success = no raise
        + schema equality; the caller asserts values."""
        df = spark.createDataFrame([(v,) for v in raw_values], ["raw"])
        encoded = df.select(self.preprocess(F.col("raw")).alias(self.name))
        encoded.write.mode("overwrite").parquet(tmp_path)
        back = spark.read.parquet(tmp_path)
        # parquet read-back relaxes nullability; compare names+types only
        assert back.schema.simpleString() == encoded.schema.simpleString(), (
            back.schema,
            encoded.schema,
        )
        return back
