"""Length-prefixed compressed frame source — the PBF framing contract.

Reproduces the reference's wire-layer semantics
(/root/reference/core/src/main/scala/fs2/osm/core/PbfReader.scala:11-29:
repeat: read 4-byte big-endian length -> header -> datasize bytes -> blob;
core/src/main/scala/fs2/osm/core/package.scala:27-44: zlib inflate ->
columnar block) as a Spark `binaryFile` scan + vectorized frame parser.

The container has no protobuf library, so the blob payload uses a
documented fixed-layout binary codec (struct-packed little-endian arrays)
carrying exactly the PrimitiveBlock fields the decode contract needs:
delta-coded ids/lats/lons, 0-delimited keys_vals, string table,
granularity/offsets. The framing (length prefix, zlib, raw-size check) and
everything downstream (delta decode, scaling, tag dictionary) match the
reference semantics; only the serialization of the block struct differs.

File layout per frame:
  [4B BE frame_len] [frame: zlib([8B BE raw_size] payload)]
payload:
  i32 n_nodes, i32 granularity, i64 lat_offset, i64 lon_offset,
  i64[n] ids, i64[n] lats, i64[n] lons,
  i32 n_kv, i32[n_kv] keys_vals,
  i32 n_strings, { i32 len, utf8 bytes } * n_strings
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fs2_osm_spark.sources.dense_decode import (
    DECODED_NODES_SCHEMA,
    decode_dense_block_np,
)


def encode_block(
    ids: list[int],
    lats: list[int],
    lons: list[int],
    keys_vals: list[int],
    string_table: list[str],
    granularity: int = 100,
    lat_offset: int = 0,
    lon_offset: int = 0,
) -> bytes:
    n = len(ids)
    out = bytearray()
    out += struct.pack("<iiqq", n, granularity, lat_offset, lon_offset)
    out += np.asarray(ids, "<i8").tobytes()
    out += np.asarray(lats, "<i8").tobytes()
    out += np.asarray(lons, "<i8").tobytes()
    out += struct.pack("<i", len(keys_vals))
    out += np.asarray(keys_vals, "<i4").tobytes()
    out += struct.pack("<i", len(string_table))
    for s in string_table:
        b = s.encode("utf-8")
        out += struct.pack("<i", len(b)) + b
    return bytes(out)


def decode_block(payload: bytes) -> dict:
    n, gran, lat_off, lon_off = struct.unpack_from("<iiqq", payload, 0)
    pos = 24
    ids = np.frombuffer(payload, "<i8", n, pos); pos += 8 * n
    lats = np.frombuffer(payload, "<i8", n, pos); pos += 8 * n
    lons = np.frombuffer(payload, "<i8", n, pos); pos += 8 * n
    (n_kv,) = struct.unpack_from("<i", payload, pos); pos += 4
    keys_vals = np.frombuffer(payload, "<i4", n_kv, pos); pos += 4 * n_kv
    (n_str,) = struct.unpack_from("<i", payload, pos); pos += 4
    strings = []
    for _ in range(n_str):
        (ln,) = struct.unpack_from("<i", payload, pos); pos += 4
        strings.append(payload[pos : pos + ln].decode("utf-8")); pos += ln
    return {
        "ids": ids, "lats": lats, "lons": lons, "keys_vals": keys_vals,
        "string_table": strings, "granularity": gran,
        "lat_offset": lat_off, "lon_offset": lon_off,
    }


def write_frames(path: str, blocks: list[bytes]) -> None:
    """blocks: encoded payloads -> framed + zlib'd file."""
    with open(path, "wb") as f:
        for payload in blocks:
            raw = struct.pack(">q", len(payload)) + payload
            frame = zlib.compress(raw, 6)
            f.write(struct.pack(">i", len(frame)))
            f.write(frame)


def iter_frames(data: bytes) -> Iterator[bytes]:
    """The PbfReader repeat-pull: 4B BE length -> frame -> inflate ->
    raw-size check -> payload."""
    pos = 0
    while pos < len(data):
        (ln,) = struct.unpack_from(">i", data, pos)
        pos += 4
        raw = zlib.decompress(data[pos : pos + ln])
        pos += ln
        (raw_size,) = struct.unpack_from(">q", raw, 0)
        payload = raw[8:]
        if len(payload) != raw_size:
            raise ValueError(f"frame raw size mismatch: {len(payload)} != {raw_size}")
        yield payload


def read_nodes_from_frames(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan -> per-file frame parse -> dense decode -> nodes.

    One file = one task; at scale the extract is split into many frame
    files (the reference's input is likewise a sequence of independent
    blobs), so parallelism = file count."""
    files = spark.read.format("binaryFile").load(path)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for content in pdf["content"]:
                for payload in iter_frames(bytes(content)):
                    b = decode_block(payload)
                    outs.append(
                        decode_dense_block_np(
                            b["ids"], b["lats"], b["lons"], b["keys_vals"],
                            b["string_table"], b["granularity"],
                            b["lat_offset"], b["lon_offset"],
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return files.select("content").mapInPandas(fn, DECODED_NODES_SCHEMA)
