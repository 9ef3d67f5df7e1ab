"""Gzip TFRecord source/sink for ``tf.train.Example`` records.

Reference fidelity for S2/S3/S4 (SURVEY §2.1): the reference materializes
training data as gzip-compressed TFRecord files of serialized Example
protos (``examples/trainer/networks/preprocess.py:61-67`` write side;
``conceptnetwork/network.py:184-203`` read side with schema-on-read via
``featdef()``). Parquet stays the engine's canonical format (SURVEY §1.4);
this module provides the interchange path so data produced for/by a
TensorFlow input pipeline round-trips.

Everything is hand-rolled from the public wire formats — no tensorflow or
protobuf dependency:

- TFRecord framing: ``[len:uint64le][masked_crc32c(len):uint32le][data]
  [masked_crc32c(data):uint32le]`` with the TensorFlow CRC mask
  ``((crc >> 15 | crc << 17) + 0xa282ead8)``; CRC32C (Castagnoli) is
  table-driven numpy.
- ``Example`` protobuf: varint-encoded messages
  ``Example{1: Features{1: map<string, Feature{1: BytesList | 2: FloatList
  (packed) | 3: Int64List (packed)}>}}`` — exactly the three value-list
  types the reference's feature constructors emit
  (``examples/trainer/concepts/util.py:17-29``).

Scale stance: write is one shard per partition (executor-side, no driver
collect); read is ``binaryFile`` source -> ``mapInPandas`` decode, so each
file decodes where it lands and schema projection drops unrequested
features before they reach the JVM row.
"""

from __future__ import annotations

import gzip
import io
import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

# -- CRC32C (Castagnoli), table-driven -------------------------------------

_CRC_TABLE = None


def _crc32c_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table[i] = c
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return int(crc ^ 0xFFFFFFFF)


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# -- protobuf varint primitives --------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _len_delim(field_no: int, payload: bytes) -> bytes:
    return _varint(field_no << 3 | 2) + _varint(len(payload)) + payload


# -- tf.train.Example encode ------------------------------------------------


def _encode_feature(value) -> bytes:
    """Python value -> Feature proto bytes. Lists/np arrays of ints ->
    Int64List, floats -> FloatList (packed), str/bytes -> BytesList."""
    if not isinstance(value, (list, tuple, np.ndarray)):
        value = [value]
    if len(value) and isinstance(value[0], (str, bytes)):
        payload = b"".join(
            _len_delim(1, v.encode("utf-8") if isinstance(v, str) else bytes(v))
            for v in value
        )
        return _len_delim(1, payload)  # bytes_list = field 1
    if len(value) and (
        isinstance(value[0], (float, np.floating))
    ):
        packed = np.asarray(value, dtype="<f4").tobytes()
        return _len_delim(2, _varint(1 << 3 | 2) + _varint(len(packed)) + packed)
    packed = b"".join(
        _varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in value
    )
    return _len_delim(3, _varint(1 << 3 | 2) + _varint(len(packed)) + packed)


def encode_example(features: dict) -> bytes:
    """dict of name -> value(s) => serialized tf.train.Example."""
    entries = b""
    for name in sorted(features):
        key = _len_delim(1, name.encode("utf-8"))
        val = _len_delim(2, _encode_feature(features[name]))
        entries += _len_delim(1, key + val)  # Features.feature map entry
    return _len_delim(1, entries)  # Example.features = field 1


# -- tf.train.Example decode ------------------------------------------------


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field_no, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field_no, wire, v
        elif wire == 5:
            yield field_no, wire, buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            yield field_no, wire, buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _decode_value_list(buf: bytes) -> list:
    """Feature proto bytes -> python list (bytes/float/int)."""
    for field_no, wire, payload in _iter_fields(buf):
        if field_no == 1:  # BytesList
            return [
                v for f, w, v in _iter_fields(payload) if f == 1
            ]
        if field_no == 2:  # FloatList
            vals: list[float] = []
            for f, w, v in _iter_fields(payload):
                if f == 1 and w == 2:
                    vals.extend(np.frombuffer(v, dtype="<f4").tolist())
                elif f == 1 and w == 5:
                    vals.append(struct.unpack("<f", v)[0])
            return vals
        if field_no == 3:  # Int64List
            vals = []
            for f, w, v in _iter_fields(payload):
                if f == 1 and w == 2:
                    pos = 0
                    while pos < len(v):
                        x, pos = _read_varint(v, pos)
                        if x >= 1 << 63:
                            x -= 1 << 64
                        vals.append(x)
                elif f == 1 and w == 0:
                    vals.append(v if v < 1 << 63 else v - (1 << 64))
            return vals
    return []


def decode_example(buf: bytes) -> dict:
    """Serialized tf.train.Example -> dict of name -> list of values."""
    out: dict = {}
    for field_no, _w, features_buf in _iter_fields(buf):
        if field_no != 1:
            continue
        for f, _w2, entry in _iter_fields(features_buf):
            if f != 1:
                continue
            key, val = None, []
            for ef, _w3, ev in _iter_fields(entry):
                if ef == 1:
                    key = ev.decode("utf-8")
                elif ef == 2:
                    val = _decode_value_list(ev)
            if key is not None:
                out[key] = val
    return out


# -- TFRecord framing --------------------------------------------------------


def write_record(fh, data: bytes) -> None:
    header = struct.pack("<Q", len(data))
    fh.write(header)
    fh.write(struct.pack("<I", _masked_crc(header)))
    fh.write(data)
    fh.write(struct.pack("<I", _masked_crc(data)))


def read_records(fh) -> Iterator[bytes]:
    while True:
        header = fh.read(8)
        if len(header) < 8:
            return
        (length,) = struct.unpack("<Q", header)
        (got_hcrc,) = struct.unpack("<I", fh.read(4))
        if got_hcrc != _masked_crc(header):
            raise ValueError("TFRecord length CRC mismatch")
        data = fh.read(length)
        (got_dcrc,) = struct.unpack("<I", fh.read(4))
        if got_dcrc != _masked_crc(data):
            raise ValueError("TFRecord data CRC mismatch")
        yield data


# -- DataFrame sink/source ---------------------------------------------------


def write_tfrecords(df: DataFrame, out_dir: str, compress: bool = True) -> int:
    """S2: write one gzip TFRecord shard per partition (executor-side IO,
    nothing through the driver). Each row's columns become Example features;
    array columns become multi-valued features. Returns total record count."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".tfrecord.gz" if compress else ".tfrecord"
    cols = df.columns

    def write_partition(idx: int, rows) -> Iterator[int]:
        path = os.path.join(out_dir, f"part-{idx:05d}{suffix}")
        opener = gzip.open if compress else open
        n = 0
        with opener(path, "wb") as fh:
            for row in rows:
                feats = {c: row[c] for c in cols if row[c] is not None}
                write_record(fh, encode_example(feats))
                n += 1
        if n == 0:
            os.remove(path)
        yield n

    total = df.rdd.mapPartitionsWithIndex(write_partition).sum()
    # match the parquet sink's commit marker so run_dataprep caching works
    open(os.path.join(out_dir, "_SUCCESS"), "wb").close()
    return int(total)


def read_tfrecords(
    spark: SparkSession, path_glob: str, schema: str
) -> DataFrame:
    """S3/S4: binaryFile source (globbing, parallel read, file pruning from
    Spark) -> mapInPandas decode of framing + Example protos, projected to
    ``schema`` (a DDL string — the ``featdef()`` schema-on-read contract).

    Scalar fields take the first list element (the reference's
    FixedLenFeature([]) parse shape); array fields keep the full list.
    """
    files = spark.read.format("binaryFile").load(path_glob)
    target = spark.createDataFrame([], schema).schema
    names = [f.name for f in target.fields]
    scalars = {
        f.name: not f.dataType.typeName().startswith("array") for f in target.fields
    }
    stringly = {f.name: "string" in f.dataType.simpleString() for f in target.fields}

    def _conv(v, name):
        if stringly[name] and isinstance(v, bytes):
            return v.decode("utf-8")
        return v

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for _, file_row in pdf.iterrows():
                raw = bytes(file_row["content"])
                if file_row["path"].endswith(".gz"):
                    raw = gzip.decompress(raw)
                for rec in read_records(io.BytesIO(raw)):
                    ex = decode_example(rec)
                    row = {}
                    for n in names:
                        v = ex.get(n, [])
                        if scalars[n]:
                            row[n] = _conv(v[0], n) if v else None
                        else:
                            row[n] = [_conv(x, n) for x in v]
                    out.append(row)
            yield pd.DataFrame(out, columns=names) if out else pd.DataFrame(
                columns=names
            )

    return files.select("path", "content").mapInPandas(decode, schema=schema)
