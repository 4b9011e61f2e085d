"""Minimal pure-python protobuf wire codec for the OSM PBF subset.

The container has no protobuf library, so this module implements the wire
format directly (varint / zigzag / length-delimited fields) for exactly the
messages the engine reads and writes:

- fileformat.proto (/root/reference/core/src/main/protobuf/fileformat.proto:29-52):
  BlobHeader {type=1 string, datasize=3 int32},
  Blob {raw=1 bytes, raw_size=2 int32, zlib_data=3 bytes}
- osmformat.proto (/root/reference/core/src/main/protobuf/osmformat.proto:97-239):
  PrimitiveBlock {stringtable=1, primitivegroup=2, granularity=17,
                  lat_offset=19, lon_offset=20},
  StringTable {s=1 repeated bytes},
  PrimitiveGroup {dense=2},
  DenseNodes {id=1 packed sint64, lat=8 packed sint64, lon=9 packed sint64,
              keys_vals=10 packed int32}

Unknown fields are skipped by wire type, so blocks written by other OSM
tools (with DenseInfo, date_granularity, ways/relations groups, ...) parse
without error — the standard protobuf forward-compatibility contract.
"""

from __future__ import annotations

import numpy as np

# wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


# ------------------------------------------------------------- varints -----
def write_varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1  # negative int32/int64 values use 10-byte two's complement
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _to_signed32(v: int) -> int:
    v &= (1 << 64) - 1
    v &= (1 << 32) - 1
    return v - (1 << 32) if v >= (1 << 31) else v


# -------------------------------------------------------------- fields -----
def _tag(out: bytearray, field: int, wire: int) -> None:
    write_varint(out, (field << 3) | wire)


def write_len_field(out: bytearray, field: int, payload: bytes) -> None:
    _tag(out, field, _LEN)
    write_varint(out, len(payload))
    out += payload


def write_varint_field(out: bytearray, field: int, v: int) -> None:
    _tag(out, field, _VARINT)
    write_varint(out, v)


def write_packed_sint64(out: bytearray, field: int, values) -> None:
    body = bytearray()
    for v in values:
        write_varint(body, zigzag(int(v)))
    write_len_field(out, field, bytes(body))


def write_packed_int32(out: bytearray, field: int, values) -> None:
    body = bytearray()
    for v in values:
        write_varint(body, int(v))
    write_len_field(out, field, bytes(body))


def iter_fields(data: bytes):
    """Yield (field_no, wire_type, value, next_pos) over a message body.
    value is int for varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == _VARINT:
            v, pos = read_varint(data, pos)
        elif wire == _LEN:
            ln, pos = read_varint(data, pos)
            v = data[pos : pos + ln]
            pos += ln
        elif wire == _I64:
            v = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        elif wire == _I32:
            v = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def read_packed_varints(body: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(body):
        v, pos = read_varint(body, pos)
        out.append(v)
    return out


# ------------------------------------------------------ OSM PBF messages ---
def encode_dense_info(
    versions, timestamps, changesets, uids, user_sids
) -> bytes:
    """DenseInfo (osmformat.proto:154-170): versions plain packed int32;
    timestamp/changeset/uid/user_sid packed sint DELTA-coded (deltas are
    the caller's responsibility, matching the dense id/lat/lon contract)."""
    out = bytearray()
    if len(versions):
        write_packed_int32(out, 1, versions)
    if len(timestamps):
        write_packed_sint64(out, 2, timestamps)
    if len(changesets):
        write_packed_sint64(out, 3, changesets)
    if len(uids):
        write_packed_sint64(out, 4, uids)  # sint32 shares the varint coding
    if len(user_sids):
        write_packed_sint64(out, 5, user_sids)
    return bytes(out)


def encode_info(
    version: int = -1,
    timestamp: int | None = None,
    changeset: int | None = None,
    uid: int | None = None,
    user_sid: int | None = None,
) -> bytes:
    """Entity-level Info (osmformat.proto:139-152, the non-dense metadata
    carried by Way/Relation/Node field 4 — reference model.scala:81-105
    decodes it for every entity kind): plain varint fields, NOT delta-coded
    (delta chains only exist in DenseInfo)."""
    out = bytearray()
    if version != -1:
        write_varint_field(out, 1, version)
    if timestamp is not None:
        write_varint_field(out, 2, timestamp)
    if changeset is not None:
        write_varint_field(out, 3, changeset)
    if uid is not None:
        write_varint_field(out, 4, uid)
    if user_sid is not None:
        write_varint_field(out, 5, user_sid)
    return bytes(out)


def decode_info(data: bytes) -> dict:
    """Info message -> {version, timestamp, changeset, uid, user_sid}
    (missing fields keep the proto defaults: version -1, others None)."""
    info = {
        "version": -1, "timestamp": None, "changeset": None,
        "uid": None, "user_sid": None,
    }
    for field, wire, v in iter_fields(data):
        if wire != _VARINT:
            continue
        if field == 1:
            info["version"] = _to_signed32(v)
        elif field == 2:
            info["timestamp"] = _to_signed64(v)
        elif field == 3:
            info["changeset"] = _to_signed64(v)
        elif field == 4:
            info["uid"] = _to_signed32(v)
        elif field == 5:
            info["user_sid"] = v
    return info


def encode_primitive_block(
    ids,
    lats,
    lons,
    keys_vals,
    string_table: list[str],
    granularity: int = 100,
    lat_offset: int = 0,
    lon_offset: int = 0,
    dense_info: bytes | None = None,
    date_granularity: int = 1000,
) -> bytes:
    """PrimitiveBlock bytes; ids/lats/lons are the DELTA-coded arrays
    (the proto stores deltas — same contract as the decode kernel)."""
    st = bytearray()
    for s in string_table:
        write_len_field(st, 1, s.encode("utf-8"))

    dense = bytearray()
    write_packed_sint64(dense, 1, ids)
    if dense_info is not None:
        write_len_field(dense, 5, dense_info)
    write_packed_sint64(dense, 8, lats)
    write_packed_sint64(dense, 9, lons)
    if len(keys_vals):
        write_packed_int32(dense, 10, keys_vals)

    group = bytearray()
    write_len_field(group, 2, bytes(dense))

    block = bytearray()
    write_len_field(block, 1, bytes(st))
    write_len_field(block, 2, bytes(group))
    if granularity != 100:
        write_varint_field(block, 17, granularity)
    if date_granularity != 1000:
        write_varint_field(block, 18, date_granularity)
    if lat_offset:
        write_varint_field(block, 19, lat_offset)
    if lon_offset:
        write_varint_field(block, 20, lon_offset)
    return bytes(block)


def decode_primitive_block(data: bytes) -> dict:
    """PrimitiveBlock bytes -> the columnar dict the decode kernel consumes
    (delta-coded numpy arrays + string table + granularity/offsets)."""
    strings: list[str] = []
    ids: list[int] = []
    lats: list[int] = []
    lons: list[int] = []
    keys_vals: list[int] = []
    ways: list[dict] = []
    relations: list[dict] = []
    info: dict[str, list[int]] = {}
    granularity, lat_offset, lon_offset = 100, 0, 0
    date_granularity = 1000  # osmformat.proto field 18 default (ms per unit)

    for field, wire, v in iter_fields(data):
        if field == 1 and wire == _LEN:  # stringtable
            for f2, w2, s in iter_fields(v):
                if f2 == 1 and w2 == _LEN:
                    strings.append(s.decode("utf-8"))
        elif field == 2 and wire == _LEN:  # primitivegroup
            for f2, w2, g in iter_fields(v):
                if f2 == 2 and w2 == _LEN:  # dense
                    for f3, w3, d in iter_fields(g):
                        if f3 == 1 and w3 == _LEN:
                            ids.extend(unzigzag(x) for x in read_packed_varints(d))
                        elif f3 == 5 and w3 == _LEN:  # DenseInfo
                            for f4, w4, di in iter_fields(d):
                                if w4 != _LEN:
                                    continue
                                vals = read_packed_varints(di)
                                if f4 == 1:
                                    info["versions"] = [_to_signed32(x) for x in vals]
                                elif f4 == 2:
                                    info["timestamps"] = [unzigzag(x) for x in vals]
                                elif f4 == 3:
                                    info["changesets"] = [unzigzag(x) for x in vals]
                                elif f4 == 4:
                                    info["uids"] = [unzigzag(x) for x in vals]
                                elif f4 == 5:
                                    info["user_sids"] = [unzigzag(x) for x in vals]
                        elif f3 == 8 and w3 == _LEN:
                            lats.extend(unzigzag(x) for x in read_packed_varints(d))
                        elif f3 == 9 and w3 == _LEN:
                            lons.extend(unzigzag(x) for x in read_packed_varints(d))
                        elif f3 == 10 and w3 == _LEN:
                            keys_vals.extend(
                                _to_signed32(x) for x in read_packed_varints(d)
                            )
                elif f2 == 3 and w2 == _LEN:  # ways group
                    ways.append(_decode_way(g))
                elif f2 == 4 and w2 == _LEN:  # relations group
                    relations.append(_decode_relation(g))
        elif field == 17 and wire == _VARINT:
            granularity = _to_signed32(v)
        elif field == 18 and wire == _VARINT:
            date_granularity = _to_signed32(v)
        elif field == 19 and wire == _VARINT:
            lat_offset = _to_signed64(v)
        elif field == 20 and wire == _VARINT:
            lon_offset = _to_signed64(v)

    return {
        "ids": np.asarray(ids, np.int64),
        "lats": np.asarray(lats, np.int64),
        "lons": np.asarray(lons, np.int64),
        "keys_vals": np.asarray(keys_vals, np.int32),
        "string_table": strings,
        "granularity": granularity,
        "date_granularity": date_granularity,
        "lat_offset": lat_offset,
        "lon_offset": lon_offset,
        "ways": ways,
        "relations": relations,
        "dense_info": info,
    }


# -------------------------------------------------- ways / relations -------
MEMBER_TYPES = ("node", "way", "relation")  # osmformat.proto Relation.MemberType


def encode_way(
    way_id: int,
    keys: list[int],
    vals: list[int],
    refs: list[int],
    info: bytes | None = None,
) -> bytes:
    """Way message (osmformat.proto:230-239); refs are DELTA-coded sint64;
    optional Info metadata rides as field 4."""
    out = bytearray()
    write_varint_field(out, 1, way_id)
    if keys:
        write_packed_int32(out, 2, keys)
    if vals:
        write_packed_int32(out, 3, vals)
    if info is not None:
        write_len_field(out, 4, info)
    if refs:
        write_packed_sint64(out, 8, refs)
    return bytes(out)


def encode_relation(
    rel_id: int,
    keys: list[int],
    vals: list[int],
    roles_sid: list[int],
    memids: list[int],
    types: list[int],
    info: bytes | None = None,
) -> bytes:
    """Relation message (osmformat.proto:241-258); memids DELTA-coded;
    optional Info metadata rides as field 4."""
    out = bytearray()
    write_varint_field(out, 1, rel_id)
    if keys:
        write_packed_int32(out, 2, keys)
    if vals:
        write_packed_int32(out, 3, vals)
    if info is not None:
        write_len_field(out, 4, info)
    if roles_sid:
        write_packed_int32(out, 8, roles_sid)
    if memids:
        write_packed_sint64(out, 9, memids)
    if types:
        write_packed_int32(out, 10, types)
    return bytes(out)


def encode_entity_group(
    string_table: list[str],
    ways: list[bytes] = (),
    relations: list[bytes] = (),
) -> bytes:
    """PrimitiveBlock carrying a ways (field 3) / relations (field 4) group."""
    st = bytearray()
    for s in string_table:
        write_len_field(st, 1, s.encode("utf-8"))
    group = bytearray()
    for w in ways:
        write_len_field(group, 3, w)
    for r in relations:
        write_len_field(group, 4, r)
    block = bytearray()
    write_len_field(block, 1, bytes(st))
    write_len_field(block, 2, bytes(group))
    return bytes(block)


def _decode_way(data: bytes) -> dict:
    way_id, keys, vals, refs, info = 0, [], [], [], None
    for field, wire, v in iter_fields(data):
        if field == 1 and wire == _VARINT:
            way_id = _to_signed64(v)
        elif field == 2 and wire == _LEN:
            keys = read_packed_varints(v)
        elif field == 3 and wire == _LEN:
            vals = read_packed_varints(v)
        elif field == 4 and wire == _LEN:
            info = decode_info(v)
        elif field == 8 and wire == _LEN:
            refs = [unzigzag(x) for x in read_packed_varints(v)]
    return {
        "way_id": way_id, "keys": keys, "vals": vals, "refs": refs,
        "info": info,
    }


def _decode_relation(data: bytes) -> dict:
    rel_id, keys, vals, roles, memids, types, info = 0, [], [], [], [], [], None
    for field, wire, v in iter_fields(data):
        if field == 1 and wire == _VARINT:
            rel_id = _to_signed64(v)
        elif field == 2 and wire == _LEN:
            keys = read_packed_varints(v)
        elif field == 3 and wire == _LEN:
            vals = read_packed_varints(v)
        elif field == 4 and wire == _LEN:
            info = decode_info(v)
        elif field == 8 and wire == _LEN:
            roles = read_packed_varints(v)
        elif field == 9 and wire == _LEN:
            memids = [unzigzag(x) for x in read_packed_varints(v)]
        elif field == 10 and wire == _LEN:
            types = read_packed_varints(v)
    return {
        "rel_id": rel_id, "keys": keys, "vals": vals,
        "roles_sid": roles, "memids": memids, "types": types,
        "info": info,
    }


# --------------------------------------------------------- file framing ----
def encode_blob_header(type_: str, datasize: int) -> bytes:
    out = bytearray()
    write_len_field(out, 1, type_.encode("utf-8"))
    write_varint_field(out, 3, datasize)
    return bytes(out)


def decode_blob_header(data: bytes) -> tuple[str, int]:
    type_, datasize = "", -1
    for field, wire, v in iter_fields(data):
        if field == 1 and wire == _LEN:
            type_ = v.decode("utf-8")
        elif field == 3 and wire == _VARINT:
            datasize = _to_signed32(v)
    return type_, datasize


def encode_blob(zlib_data: bytes, raw_size: int) -> bytes:
    out = bytearray()
    write_varint_field(out, 2, raw_size)
    write_len_field(out, 3, zlib_data)
    return bytes(out)


def decode_blob(data: bytes) -> tuple[bytes | None, int, bytes | None]:
    """-> (raw, raw_size, zlib_data)."""
    raw, raw_size, zdata = None, -1, None
    for field, wire, v in iter_fields(data):
        if field == 1 and wire == _LEN:
            raw = v
        elif field == 2 and wire == _VARINT:
            raw_size = _to_signed32(v)
        elif field == 3 and wire == _LEN:
            zdata = v
    return raw, raw_size, zdata
