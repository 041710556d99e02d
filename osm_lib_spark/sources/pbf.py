"""Byte-level OSM PBF source and sink (reference S1/K1).

From-scratch implementation of the public OSM PBF container format
(fileformat.proto / osmformat.proto wire layout): a stream of
[4-byte big-endian length][BlobHeader][Blob] records, where each Blob
holds a zlib-compressed (or raw) OSMHeader / OSMData block. OSMData is
a PrimitiveBlock: a per-block string table plus primitive groups of
dense nodes (delta-coded id/lat/lon + 0-terminated keys_vals), ways
(delta-coded refs), and relations (delta-coded memids).

Semantics mirrored from the reference (cited for parity, not copied —
this is a numpy wire codec, the reference drives the osmosis protobuf
library):

* dense-node delta decode + string-table tag lookup —
  PBFInput.java:88-121
* way ref delta decode — PBFInput.java:124-152
* relation memid delta decode + member types — PBFInput.java:155-195
* fixed-point conversion: degrees = 1e-9*(offset + granularity*raw),
  fixed = (int)(degrees * 1e7) truncating toward zero (osmosis
  BinaryParser.parseLat semantics + Node.java:26-29)
* sink block structure: ≤8000 entities per block, one primitive group
  per block, per-block string table with "" at index 0, type
  transitions force a new block, dense nodes always — that is, blocks
  are type-pure — PBFOutput.java:54-135
* zlib-deflate each block, store raw if deflate doesn't shrink it —
  PBFOutput.java:96-120,142-157

Spark-first dataflow:

* READ: the blob directory scan (`scan_blobs`) reads only the ~32-byte
  headers (seek + skip), yielding a (path, offset, size, seq) blob
  table. Blobs are the parallelism unit — `mapInPandas` tasks seek
  into the file and decode their own blobs, so a planet file fans out
  across executors without ever landing whole on the driver. Varint
  decode of the hot packed arrays (ids, lats, lons, refs, memids,
  keys_vals) is numpy-vectorized (no per-value Python).
* WRITE: entities are range-partitioned type-major by id,
  `mapInPandas` encodes independent ≤8k-entity blocks (PBF blocks
  share no state — delta coding and string tables reset per block), and
  the driver streams the encoded blobs to the file in (type, first_id)
  order. At object-store scale the same blob rows would be PUT as
  parts and composed; the sequential tail is only the final
  concatenation, not the encode.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# protobuf wire primitives (numpy-vectorized for packed arrays)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Scalar varint — for message framing only, never per-entity data."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def np_decode_varints(buf: np.ndarray) -> np.ndarray:
    """Decode a packed varint byte array → uint64 values, vectorized.

    Varint boundaries are the bytes without the continuation bit; each
    byte contributes its 7-bit payload shifted by its offset within its
    varint. One pass of numpy ops, no Python loop over values.
    """
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    cont = (buf & 0x80) != 0
    ends = np.flatnonzero(~cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    idx = np.arange(len(buf), dtype=np.int64)
    gid = np.searchsorted(ends, idx)
    shift = ((idx - starts[gid]) * 7).astype(np.uint64)
    vals = (buf & 0x7F).astype(np.uint64) << shift
    out = np.zeros(len(ends), dtype=np.uint64)
    np.add.at(out, gid, vals)
    return out


def np_unzigzag(u: np.ndarray) -> np.ndarray:
    """uint64 zigzag → int64: (u >> 1) ^ -(u & 1)."""
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (~(u & np.uint64(1)) + np.uint64(1))).astype(
        np.int64
    )


def np_zigzag(v: np.ndarray) -> np.ndarray:
    """int64 → uint64 zigzag: (v << 1) ^ (v >> 63)."""
    v = v.astype(np.int64)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).astype(np.uint64)


def np_encode_varints(vals: np.ndarray) -> np.ndarray:
    """uint64 values → packed varint bytes, vectorized.

    Computes per-value byte lengths, then scatters the i-th byte of
    every value in ≤10 vectorized passes.
    """
    v = np.asarray(vals, dtype=np.uint64)
    if len(v) == 0:
        return np.zeros(0, dtype=np.uint8)
    lens = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while (tmp != 0).any():
        lens += (tmp != 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    out = np.zeros(int(lens.sum()), dtype=np.uint8)
    for i in range(int(lens.max())):
        sel = lens > i
        byte = ((v[sel] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        more = (lens[sel] - 1 > i).astype(np.uint8) << 7
        out[offs[sel] + i] = byte | more
    return out


def _fields(data: bytes) -> Iterator[tuple[int, int, object]]:
    """Walk a protobuf message: yields (field_no, wire_type, value).

    wire 0 → int value; wire 2 → bytes; wire 1/5 → raw fixed bytes.
    """
    pos, n = 0, len(data)
    while pos < n:
        key, pos = _read_varint(data, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(data, pos)
        elif wt == 2:
            ln, pos = _read_varint(data, pos)
            val = data[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = data[pos : pos + 4]
            pos += 4
        elif wt == 1:
            val = data[pos : pos + 8]
            pos += 8
        else:  # pragma: no cover — groups are not used by PBF
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


def _packed_u64(wt: int, val: object, out: list) -> None:
    """Accumulate a packed-or-single varint field occurrence."""
    if wt == 2:
        out.append(np_decode_varints(np.frombuffer(val, dtype=np.uint8)))
    else:
        out.append(np.array([val], dtype=np.uint64))


def _cat(parts: list, dtype=np.uint64) -> np.ndarray:
    if not parts:
        return np.zeros(0, dtype=dtype)
    return np.concatenate(parts).astype(dtype)


# ---------------------------------------------------------------------------
# encode helpers
# ---------------------------------------------------------------------------


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_field_varint(fno: int, val: int) -> bytes:
    return _enc_varint(fno << 3) + _enc_varint(val)


def _enc_field_bytes(fno: int, val: bytes) -> bytes:
    return _enc_varint((fno << 3) | 2) + _enc_varint(len(val)) + val


def _enc_packed(fno: int, vals: np.ndarray) -> bytes:
    """Packed repeated varint field (empty → omitted)."""
    if len(vals) == 0:
        return b""
    payload = np_encode_varints(vals).tobytes()
    return _enc_field_bytes(fno, payload)


# ---------------------------------------------------------------------------
# blob framing
# ---------------------------------------------------------------------------

_ACCEPTED_FEATURES = {"OsmSchema-V0.6", "DenseNodes"}


def scan_blobs(path: str) -> list[tuple[str, int, int, str, int]]:
    """Index a PBF file's blobs WITHOUT reading blob payloads.

    Reads each [len][BlobHeader], seeks past the datasize, and returns
    (path, payload_offset, payload_size, kind, seq) rows — the
    parallelism unit for the distributed read. I/O is O(#blobs · 32B).
    """
    rows = []
    seq = 0
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            header = f.read(hlen)
            kind, datasize = "", 0
            for fno, wt, val in _fields(header):
                if fno == 1:
                    kind = val.decode("utf-8")
                elif fno == 3:
                    datasize = val
            offset = f.tell()
            rows.append((path, offset, datasize, kind, seq))
            seq += 1
            f.seek(offset + datasize)
    return rows


def _inflate_blob(data: bytes) -> bytes:
    """Blob → uncompressed block bytes (raw=1, zlib_data=3)."""
    raw, zdata = None, None
    for fno, wt, val in _fields(data):
        if fno == 1:
            raw = val
        elif fno == 3:
            zdata = val
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("blob has neither raw nor zlib_data")


def check_header_block(data: bytes) -> None:
    """Raise on required features we do not implement (PBFInput
    HeaderBlock handling analog)."""
    for fno, wt, val in _fields(data):
        if fno == 4:  # required_features
            feat = val.decode("utf-8")
            if feat not in _ACCEPTED_FEATURES:
                raise ValueError(f"unsupported required PBF feature: {feat}")


# ---------------------------------------------------------------------------
# PrimitiveBlock decode → entity dicts
# ---------------------------------------------------------------------------


def _fixed_from_raw(raw: np.ndarray, granularity: int, offset: int) -> np.ndarray:
    """raw coordinate units → int32 fixed-point, bit-matching the
    reference's double math: trunc(1e-9*(offset + granularity*raw) * 1e7)
    (osmosis parseLat + Node.setLatLon truncation)."""
    nano = offset + granularity * raw.astype(np.int64)  # exact in int64
    deg = nano.astype(np.float64) * 1e-9
    return (deg * 1e7).astype(np.int64).astype(np.int32)


def decode_primitive_block(data: bytes) -> dict:
    """PrimitiveBlock bytes → columnar entity arrays.

    Returns {nodes: (ids, fixed_lat, fixed_lon, tags), ways: (ids,
    refs_list, tags), relations: (ids, members_list, tags)} with numpy
    arrays for all numeric columns; tags are python lists of
    (key, value) tuples (ragged), built from vectorized string-table
    takes.
    """
    strings: list[str] = []
    groups: list[bytes] = []
    granularity, lat_offset, lon_offset = 100, 0, 0
    for fno, wt, val in _fields(data):
        if fno == 1:  # stringtable
            strings = [s.decode("utf-8") for f2, w2, s in _fields(val) if f2 == 1]
        elif fno == 2:
            groups.append(val)
        elif fno == 17:
            granularity = val
        elif fno == 19:
            lat_offset = val
        elif fno == 20:
            lon_offset = val
    stab = np.array(strings, dtype=object) if strings else np.zeros(0, object)

    out = {
        "node_id": [], "node_lat": [], "node_lon": [], "node_tags": [],
        "way_id": [], "way_refs": [], "way_tags": [],
        "rel_id": [], "rel_members": [], "rel_tags": [],
    }

    def tags_from(keys: np.ndarray, vals: np.ndarray) -> list:
        if len(keys) == 0:
            return []
        return list(zip(stab[keys.astype(np.int64)], stab[vals.astype(np.int64)]))

    for group in groups:
        for fno, wt, val in _fields(group):
            if fno == 2:  # dense nodes
                ids_p, lats_p, lons_p, kv_p = [], [], [], []
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        _packed_u64(w2, v2, ids_p)
                    elif f2 == 8:
                        _packed_u64(w2, v2, lats_p)
                    elif f2 == 9:
                        _packed_u64(w2, v2, lons_p)
                    elif f2 == 10:
                        _packed_u64(w2, v2, kv_p)
                ids = np.cumsum(np_unzigzag(_cat(ids_p)))
                lats = np.cumsum(np_unzigzag(_cat(lats_p)))
                lons = np.cumsum(np_unzigzag(_cat(lons_p)))
                kv = _cat(kv_p).astype(np.int64)  # int32, plain varint
                # keys_vals: int32, 0-terminated runs of (key, val) pairs
                # per node (PBFInput.java:105-114); absent ⇒ no tags at all
                tags_per_node: list
                if len(kv) == 0:
                    tags_per_node = [[] for _ in range(len(ids))]
                else:
                    tags_per_node = []
                    pos = 0
                    for _ in range(len(ids)):
                        start = pos
                        while kv[pos] != 0:
                            pos += 2
                        pair_idx = kv[start:pos]
                        if len(pair_idx):
                            ks = stab[pair_idx[0::2]]
                            vs = stab[pair_idx[1::2]]
                            tags_per_node.append(list(zip(ks, vs)))
                        else:
                            tags_per_node.append([])
                        pos += 1
                out["node_id"].append(ids)
                out["node_lat"].append(_fixed_from_raw(lats, granularity, lat_offset))
                out["node_lon"].append(_fixed_from_raw(lons, granularity, lon_offset))
                out["node_tags"].extend(tags_per_node)
            elif fno == 1:  # non-dense nodes (rare; PBFInput.java:65-80)
                nid, nlat, nlon = 0, 0, 0
                keys = vals = np.zeros(0, np.uint64)
                kp, vp = [], []
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        nid = np_unzigzag(np.array([v2], np.uint64))[0]
                    elif f2 == 8:
                        nlat = np_unzigzag(np.array([v2], np.uint64))[0]
                    elif f2 == 9:
                        nlon = np_unzigzag(np.array([v2], np.uint64))[0]
                    elif f2 == 2:
                        _packed_u64(w2, v2, kp)
                    elif f2 == 3:
                        _packed_u64(w2, v2, vp)
                out["node_id"].append(np.array([nid], np.int64))
                out["node_lat"].append(
                    _fixed_from_raw(np.array([nlat], np.int64), granularity, lat_offset)
                )
                out["node_lon"].append(
                    _fixed_from_raw(np.array([nlon], np.int64), granularity, lon_offset)
                )
                out["node_tags"].append(tags_from(_cat(kp), _cat(vp)))
            elif fno == 3:  # way
                wid = 0
                kp, vp, rp = [], [], []
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        _packed_u64(w2, v2, kp)
                    elif f2 == 3:
                        _packed_u64(w2, v2, vp)
                    elif f2 == 8:
                        _packed_u64(w2, v2, rp)
                refs = np.cumsum(np_unzigzag(_cat(rp)))
                out["way_id"].append(wid)
                out["way_refs"].append(refs)
                out["way_tags"].append(tags_from(_cat(kp), _cat(vp)))
            elif fno == 4:  # relation
                rid = 0
                kp, vp, roles_p, mem_p, types_p = [], [], [], [], []
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        _packed_u64(w2, v2, kp)
                    elif f2 == 3:
                        _packed_u64(w2, v2, vp)
                    elif f2 == 8:
                        _packed_u64(w2, v2, roles_p)
                    elif f2 == 9:
                        _packed_u64(w2, v2, mem_p)
                    elif f2 == 10:
                        _packed_u64(w2, v2, types_p)
                memids = np.cumsum(np_unzigzag(_cat(mem_p)))
                roles = _cat(roles_p).astype(np.int64)
                types = _cat(types_p).astype(np.int64)
                tnames = np.array(["NODE", "WAY", "RELATION"], dtype=object)
                members = [
                    (str(tnames[t]), int(m), str(stab[r]))
                    for t, m, r in zip(types, memids, roles)
                ]
                out["rel_id"].append(rid)
                out["rel_members"].append(members)
                out["rel_tags"].append(tags_from(_cat(kp), _cat(vp)))
    return out


# ---------------------------------------------------------------------------
# PrimitiveBlock encode ← pandas frames
# ---------------------------------------------------------------------------


class _StringTable:
    """Per-block string table; index 0 is reserved for "" (the
    keys_vals delimiter convention — PBFOutput's StringTable analog)."""

    def __init__(self) -> None:
        self.index: dict[str, int] = {"": 0}
        self.strings: list[str] = [""]

    def code(self, s: str) -> int:
        if s is None:
            s = ""
        got = self.index.get(s)
        if got is None:
            got = len(self.strings)
            self.index[s] = got
            self.strings.append(s)
        return got

    def encode(self) -> bytes:
        return b"".join(
            _enc_field_bytes(1, s.encode("utf-8")) for s in self.strings
        )


def _as_list(x) -> list:
    """Arrow hands array columns to pandas as numpy arrays (or None);
    normalize to a plain list."""
    if x is None or (isinstance(x, float) and np.isnan(x)):
        return []
    return list(x)


def _encode_block(kind: str, frame: pd.DataFrame) -> bytes:
    """One type-pure PrimitiveBlock (≤8000 rows) → block bytes."""
    st = _StringTable()
    group = b""
    if kind == "node":
        ids = frame["id"].to_numpy(np.int64)
        lats = frame["fixed_lat"].to_numpy(np.int64)
        lons = frame["fixed_lon"].to_numpy(np.int64)
        kv: list[int] = []
        for tags in frame["tags"]:
            for t in _as_list(tags):
                kv.append(st.code(t["key"]))
                kv.append(st.code(t["value"]))
            kv.append(0)
        dense = (
            _enc_packed(1, np_zigzag(np.diff(ids, prepend=0)))
            + _enc_packed(8, np_zigzag(np.diff(lats, prepend=0)))
            + _enc_packed(9, np_zigzag(np.diff(lons, prepend=0)))
            + _enc_packed(10, np.array(kv, dtype=np.uint64))
        )
        group = _enc_field_bytes(2, dense)
    elif kind == "way":
        msgs = []
        for _, row in frame.iterrows():
            tags = _as_list(row["tags"])
            keys = [st.code(t["key"]) for t in tags]
            vals = [st.code(t["value"]) for t in tags]
            refs = np.asarray(_as_list(row["node_ids"]), dtype=np.int64)
            msg = (
                _enc_field_varint(1, int(row["id"]))
                + _enc_packed(2, np.array(keys, np.uint64))
                + _enc_packed(3, np.array(vals, np.uint64))
                + _enc_packed(8, np_zigzag(np.diff(refs, prepend=0)))
            )
            msgs.append(_enc_field_bytes(3, msg))
        group = b"".join(msgs)
    elif kind == "relation":
        tcode = {"NODE": 0, "WAY": 1, "RELATION": 2}
        msgs = []
        for _, row in frame.iterrows():
            tags = _as_list(row["tags"])
            keys = [st.code(t["key"]) for t in tags]
            vals = [st.code(t["value"]) for t in tags]
            members = _as_list(row["members"])
            roles = [st.code(m["role"]) for m in members]
            memids = np.asarray([m["member_id"] for m in members], dtype=np.int64)
            types = [tcode[m["type"]] for m in members]
            msg = (
                _enc_field_varint(1, int(row["id"]))
                + _enc_packed(2, np.array(keys, np.uint64))
                + _enc_packed(3, np.array(vals, np.uint64))
                + _enc_packed(8, np.array(roles, np.uint64))
                + _enc_packed(9, np_zigzag(np.diff(memids, prepend=0)))
                + _enc_packed(10, np.array(types, np.uint64))
            )
            msgs.append(_enc_field_bytes(4, msg))
        group = b"".join(msgs)
    else:  # pragma: no cover
        raise ValueError(kind)
    return _enc_field_bytes(1, st.encode()) + _enc_field_bytes(2, group)


def _blob_bytes(kind_str: str, block: bytes) -> bytes:
    """block → framed [len][BlobHeader][Blob] bytes (zlib, raw if
    deflate doesn't shrink — PBFOutput.writeOneBlob semantics)."""
    deflated = zlib.compress(block)
    if len(block) > 0 and len(deflated) < len(block):
        blob = _enc_field_varint(2, len(block)) + _enc_field_bytes(3, deflated)
    else:
        blob = _enc_field_bytes(1, block)
    header = _enc_field_bytes(1, kind_str.encode()) + _enc_field_varint(
        3, len(blob)
    )
    return struct.pack(">I", len(header)) + header + blob


def encode_header_block(writing_program: str = "osm_lib_spark") -> bytes:
    block = _enc_field_bytes(4, b"OsmSchema-V0.6") + _enc_field_bytes(
        4, b"DenseNodes"
    ) + _enc_field_bytes(16, writing_program.encode())
    return _blob_bytes("OSMHeader", block)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

ENTITY_SCHEMA = (
    "entity_type string, id long, fixed_lat int, fixed_lon int, "
    "tags array<struct<key:string,value:string>>, node_ids array<long>, "
    "members array<struct<type:string,member_id:long,role:string>>"
)

BLOCK_SIZE = 8000  # PBFOutput.java:128 — ≤8k entities per block


def read_pbf(spark, path: str, blobs_per_task: int = 4):
    """Distributed PBF read → unified entity DataFrame.

    The driver indexes blob offsets (header-only scan); executors seek
    + inflate + decode their own blobs via ``mapInPandas``. At planet
    scale each blob is ~8k entities, so task granularity is tuned with
    ``blobs_per_task`` and Spark's own partitioning of the index table.
    """
    from pyspark.sql import functions as F  # noqa: N812

    rows = scan_blobs(path)
    header_blobs = [r for r in rows if r[3] == "OSMHeader"]
    with open(path, "rb") as f:
        for _, off, size, _, _ in header_blobs:
            f.seek(off)
            check_header_block(_inflate_blob(f.read(size)))
    data_rows = [r for r in rows if r[3] == "OSMData"]
    n_part = max(1, min(len(data_rows) // blobs_per_task + 1, 256))
    idx = spark.createDataFrame(
        data_rows, "path string, offset long, size long, kind string, seq long"
    ).repartition(n_part, "seq")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                with open(r["path"], "rb") as f:
                    f.seek(int(r["offset"]))
                    data = f.read(int(r["size"]))
                block = decode_primitive_block(_inflate_blob(data))
                frames = []
                if block["node_id"]:
                    ids = np.concatenate(block["node_id"])
                    frames.append(
                        pd.DataFrame(
                            {
                                "entity_type": "node",
                                "id": ids,
                                "fixed_lat": np.concatenate(block["node_lat"]),
                                "fixed_lon": np.concatenate(block["node_lon"]),
                                "tags": [
                                    [{"key": k, "value": v} for k, v in ts]
                                    for ts in block["node_tags"]
                                ],
                                "node_ids": None,
                                "members": None,
                            }
                        )
                    )
                if block["way_id"]:
                    frames.append(
                        pd.DataFrame(
                            {
                                "entity_type": "way",
                                "id": np.array(block["way_id"], np.int64),
                                "fixed_lat": None,
                                "fixed_lon": None,
                                "tags": [
                                    [{"key": k, "value": v} for k, v in ts]
                                    for ts in block["way_tags"]
                                ],
                                "node_ids": [list(map(int, r)) for r in block["way_refs"]],
                                "members": None,
                            }
                        )
                    )
                if block["rel_id"]:
                    frames.append(
                        pd.DataFrame(
                            {
                                "entity_type": "relation",
                                "id": np.array(block["rel_id"], np.int64),
                                "fixed_lat": None,
                                "fixed_lon": None,
                                "tags": [
                                    [{"key": k, "value": v} for k, v in ts]
                                    for ts in block["rel_tags"]
                                ],
                                "node_ids": None,
                                "members": [
                                    [
                                        {"type": t, "member_id": m, "role": ro}
                                        for t, m, ro in ms
                                    ]
                                    for ms in block["rel_members"]
                                ],
                            }
                        )
                    )
                for fr in frames:
                    yield fr

    return idx.mapInPandas(decode, schema=ENTITY_SCHEMA)


def pbf_nodes(entities):
    from pyspark.sql import functions as F  # noqa: N812

    return entities.where(F.col("entity_type") == "node").select(
        "id", "fixed_lat", "fixed_lon", "tags"
    )


def pbf_ways(entities):
    from pyspark.sql import functions as F  # noqa: N812

    return entities.where(F.col("entity_type") == "way").select(
        "id", "node_ids", "tags"
    )


def pbf_relations(entities):
    from pyspark.sql import functions as F  # noqa: N812

    return entities.where(F.col("entity_type") == "relation").select(
        "id", "members", "tags"
    )


def write_pbf(path: str, nodes, ways, relations, block_size: int = BLOCK_SIZE):
    """Distributed PBF sink: encode independent blocks in executors,
    stream them to the file in (type, first_id) order on the driver.

    PBF blocks share NO state (per-block string table + delta reset),
    so the encode is embarrassingly parallel; only the byte
    concatenation is sequential — the same shape as a multipart
    object-store compose.
    """
    from pyspark.sql import functions as F  # noqa: N812

    blob_schema = "type_rank int, first_id long, blob binary"

    def encoder(kind: str):
        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            rank = {"node": 0, "way": 1, "relation": 2}[kind]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values("id").reset_index(drop=True)
                for lo in range(0, len(pdf), block_size):
                    chunk = pdf.iloc[lo : lo + block_size]
                    blob = _blob_bytes("OSMData", _encode_block(kind, chunk))
                    yield pd.DataFrame(
                        {
                            "type_rank": [rank],
                            "first_id": [int(chunk["id"].iloc[0])],
                            "blob": [blob],
                        }
                    )

        return enc

    parts = []
    for kind, df in (("node", nodes), ("way", ways), ("relation", relations)):
        if df is None:
            continue
        n_part = max(1, min(df.sparkSession.sparkContext.defaultParallelism, 64))
        arranged = df.repartitionByRange(n_part, F.col("id")).sortWithinPartitions("id")
        parts.append(arranged.mapInPandas(encoder(kind), schema=blob_schema))
    blobs = parts[0]
    for p in parts[1:]:
        blobs = blobs.unionByName(p)
    ordered = blobs.orderBy("type_rank", "first_id").collect()
    with open(path, "wb") as f:
        f.write(encode_header_block())
        for r in ordered:
            f.write(bytes(r.blob))
    return len(ordered)
