"""Feature schema layer: FeatureSpec ⇄ Spark StructType.

Reference parity:
- ``featdef()`` returned ``{name: tf.FixedLenFeature(shape, dtype)}``
  (``conceptnetwork/concept.py:41-46``); here a ``FeatureSpec`` maps
  feature name -> (kind, shape) and compiles to a ``StructType``.
- The three physical types are exactly the reference's
  ``tf.train.Example`` value lists (``examples/trainer/concepts/util.py:17-29``):
  float -> DoubleType, int64 -> LongType, bytes -> StringType; non-scalar
  shapes become ArrayType of the element type.
- The network-level schema namespaced features per concept with a string
  prefix ``<concept>_<feature>`` (``conceptnetwork/network.py:74-87``) and
  stripped it back by splitting on '_' (``network.py:37-43,206-211``) —
  ambiguous when concept names contain '_'. The engine instead nests one
  struct column per concept; ``SELECT <concept>.*`` reproduces
  ``_select_features`` without the ambiguity. ``flatten``/``unflatten``
  convert to/from the reference's flat physical layout for round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# feature kinds (mirror util.py:17-29 constructors)
FLOAT = "float"
INT64 = "int64"
BYTES = "bytes"

_KIND_TO_TYPE: dict[str, DataType] = {
    FLOAT: DoubleType(),
    INT64: LongType(),
    BYTES: StringType(),
}


@dataclass(frozen=True)
class Feature:
    """One declared feature: scalar (shape=None) or fixed-length list."""

    kind: str
    shape: int | None = None  # None => scalar; n => array of length n

    def spark_type(self) -> DataType:
        elem = _KIND_TO_TYPE[self.kind]
        return elem if self.shape is None else ArrayType(elem, containsNull=False)


@dataclass
class FeatureSpec:
    """Ordered mapping feature name -> Feature (the ``featdef()`` analogue)."""

    features: dict[str, Feature] = field(default_factory=dict)

    def add(self, name: str, kind: str, shape: int | None = None) -> "FeatureSpec":
        self.features[name] = Feature(kind, shape)
        return self

    def struct_type(self) -> StructType:
        return StructType(
            [StructField(n, f.spark_type(), nullable=True) for n, f in self.features.items()]
        )

    def names(self) -> list[str]:
        return list(self.features)


def network_schema(concept_specs: dict[str, FeatureSpec]) -> StructType:
    """Network record schema: one struct column per concept.

    Mirrors the union-of-prefixed-featdefs at ``network.py:89-100``.
    """
    return StructType(
        [
            StructField(cname, spec.struct_type(), nullable=True)
            for cname, spec in concept_specs.items()
        ]
    )


def flatten(df, concept_names: list[str]):
    """Nested struct columns -> reference flat layout ``<concept>_<feature>``.

    Inverse of the struct model; matches ``network.py:74-87``.
    """
    cols = []
    for cname in concept_names:
        schema = df.schema[cname].dataType
        for f in schema.fields:
            cols.append(F.col(f"{cname}.{f.name}").alias(f"{cname}_{f.name}"))
    other = [c for c in df.columns if c not in concept_names]
    return df.select(*[F.col(c) for c in other], *cols)


def unflatten(df, concept_specs: dict[str, FeatureSpec]):
    """Reference flat layout -> nested structs (``_select_features`` analogue).

    Prefix resolution is by declared spec, not by ``split('_')``, so concept
    names containing '_' are unambiguous (fixes the latent issue at
    ``network.py:42,207``).
    """
    cols = []
    for cname, spec in concept_specs.items():
        cols.append(
            F.struct(
                *[F.col(f"{cname}_{fname}").alias(fname) for fname in spec.names()]
            ).alias(cname)
        )
    flat_names = {f"{c}_{f}" for c, s in concept_specs.items() for f in s.names()}
    other = [c for c in df.columns if c not in flat_names]
    return df.select(*[F.col(c) for c in other], *cols)
