"""Multimodal (binary payload) columns: schema, ingest, metadata extraction
(SURVEY §2.2 D32).

Design: image/audio/video payloads are opaque ``BinaryType`` columns with a
typed metadata struct alongside. Real decode (PIL/librosa/ffmpeg) is NOT
available in this environment, so the decode kernels are stubbed behind
``NotImplementedError`` with a deterministic fake path — but the Spark-side
plumbing (schemas, mapInPandas batch shape, partitioning) is real and
tested. At 100 TB: payloads are read via ``binaryFile`` datasource (one row
per object, streamed in 128 MB partitions) and metadata extraction is a pure
map — no shuffle.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conceptnetwork_spark.catalog import Catalog
from conceptnetwork_spark.registry import register

# metadata schema attached to every payload column
MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, crc32 long, sha string, head_hex string"
)


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched metadata extraction over binary payloads."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "crc32": payloads.map(lambda b: zlib.crc32(b) & 0xFFFFFFFF),
                "sha": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                "head_hex": payloads.map(lambda b: b[:8].hex()),
            }
        )


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """payload:binary -> typed metadata rows via mapInPandas (D32 core)."""
    return df.select("doc_id", "payload").mapInPandas(
        _extract_meta, schema=MEDIA_META_SCHEMA
    )


def decode_image(df: DataFrame) -> DataFrame:
    """STUB: real image decode requires PIL/opencv (not in this container).

    The production kernel is a mapInPandas with schema
    ``doc_id long, width int, height int, pixels array<int>`` — plumbing
    identical to extract_media_metadata.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_feature_extract for deterministic testing"
    )


def fake_feature_extract(df: DataFrame, n_features: int = 8) -> DataFrame:
    """Deterministic stand-in for a decode+featurize kernel: byte-value
    histogram over the payload, Arrow-batched. Exercises the exact batch
    shape / schema a real decoder would use."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = [
                list(
                    np.bincount(
                        np.frombuffer(b, dtype=np.uint8) % n_features,
                        minlength=n_features,
                    ).astype("int64")
                )
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(
        gen, schema="doc_id long, features array<long>"
    )


@register(
    "d32_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text)                               AS sha
    FROM documents ORDER BY doc_id
    """,
)
def d32_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata extraction. The testdata has no real media
    files, so payload := utf-8 bytes of documents.text — the plumbing
    (binary column -> mapInPandas -> typed metadata) is the real operator;
    n_bytes/sha are oracle-checkable against DuckDB's blob functions."""
    d = Catalog(spark, sf_dir).documents
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    meta = extract_media_metadata(payloads)
    return meta.select("doc_id", "n_bytes", "sha").orderBy("doc_id")


@register("d32_feature_extract", oracle=None)
def d32_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode+featurize kernel shape over binary payloads (deterministic
    byte-histogram stand-in for the real image/audio featurizer; see
    decode_image for the stubbed production kernel). Rows-only check: the
    output is deterministic but DuckDB has no mapInPandas equivalent."""
    d = Catalog(spark, sf_dir).documents
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return fake_feature_extract(payloads).orderBy("doc_id")


@register("d32_frame_sample", oracle=None)
def d32_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sample kernel shape (one->many mapInPandas): slice each
    payload into 4 evenly-spaced byte windows, one output row per frame.
    Rows-only check; frames surfaced as hex so the schema is string-stable."""
    d = Catalog(spark, sf_dir).documents
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return (
        fake_frame_sample(payloads, n_frames=4, frame_bytes=16)
        .select("doc_id", "frame_idx", F.hex("frame").alias("frame_hex"))
        .orderBy("doc_id", "frame_idx")
    )


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: real resize requires PIL/opencv (not in this container). The
    production kernel is mapInPandas with schema
    ``doc_id long, payload binary`` (payload re-encoded at WxH)."""
    raise NotImplementedError(
        "image resize requires an imaging library not present in this "
        "environment; use fake_frame_sample for plumbing-shape testing"
    )


def fake_frame_sample(
    df: DataFrame, n_frames: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """Deterministic stand-in for a video frame-sample kernel: slice the
    payload into n_frames evenly-spaced byte windows (one output row per
    frame — the one->many batch shape a real ffmpeg sampler produces)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(b) // n_frames, 1)
                for i in range(min(n_frames, len(b))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(b[i * step : i * step + frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select("doc_id", "payload").mapInPandas(
        gen, schema="doc_id long, frame_idx int, frame binary"
    )


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Real media ingest path: one row per file with content:binary +
    path/length metadata (Spark binaryFile source; splittable listing,
    payload streamed per-task)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path"),
            F.col("length").alias("n_bytes"),
            F.col("content").alias("payload"),
        )
    )
