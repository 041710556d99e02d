"""Byte-level VEX source and sink (reference S2/K2).

VEX is the reference's own streaming format (VEXBlock.java:24-110,
VexInput.java:64-150, VexOutput.java:40-175): a headerless
concatenation of blocks, each framed as

    [4-byte ASCII type "VEXN"|"VEXW"|"VEXR"]
    [4-byte big-endian entity count]
    [4-byte big-endian deflated size]
    [zlib data, inflating to ≤ 1 MiB]

The inflated payload is a varint stream. Per block, the delta-coding
state (entity id, way ref, node fixedLat/fixedLon) resets to zero
(VexInput.java:65-66); WITHIN a block the way-ref accumulator carries
across entities (VexInput.java:118-124 — `ref` is a stream field, not
per-way). Records:

    node     = sint64 Δid, tags, sint64 ΔfixedLat, sint64 ΔfixedLon
    way      = sint64 Δid, tags, uint32 nRefs, nRefs × sint64 Δref
    relation = sint64 Δid, tags, uint32 nMembers, members ×
               (sint64 memberId ABSOLUTE, uint32 typeOrdinal
                [NODE=0, WAY=1, RELATION=2 — OSMEntity.java:13],
                string role)
    tags     = uint32 count, count × (string key, string value)
    string   = uint32 byteLen, UTF-8 bytes

Blocks are fully self-contained, so the Spark dataflow mirrors the PBF
codec: a header-only offset scan indexes blocks, ``mapInPandas`` tasks
seek + inflate + decode their own blocks in parallel, and the sink
encodes independent blocks in executors with the driver only
concatenating framed bytes in (type, first_id) order. The payload is a
sequential varint/string stream (records are not columnar like PBF's
dense nodes — strings interleave the varints, blocking the batched
numpy passes the PBF codec uses), so per-entity decode is Python
within each ≤1 MiB block; block parallelism keeps it distributed.
Measured at sf0.1 (2.9M entities, 360 blocks, local[32]): encode
~0.33M entities/s, decode ~0.71M entities/s.
"""

from __future__ import annotations

import os
import struct
import tempfile
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from osm_lib_spark.sources.pbf import ENTITY_SCHEMA, _as_list

VEX_BUFFER_SIZE = 1 << 20  # VEXBlock.java:25 — inflated blocks ≤ 1 MiB
_TYPES = {b"VEXN": "node", b"VEXW": "way", b"VEXR": "relation"}
_HEADERS = {"node": b"VEXN", "way": b"VEXW", "relation": b"VEXR"}
_MEMBER_TYPES = ["NODE", "WAY", "RELATION"]  # ordinal order, OSMEntity.java:13
_MEMBER_ORD = {t: i for i, t in enumerate(_MEMBER_TYPES)}


# ---------------------------------------------------------------------------
# varint stream primitives (scalar — VEX records interleave strings)
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def u64(self) -> int:
        buf, pos = self.buf, self.pos
        result = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                self.pos = pos
                return result
            shift += 7

    def s64(self) -> int:
        u = self.u64()
        return (u >> 1) ^ -(u & 1)

    def string(self) -> str:
        n = self.u64()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def tags(self) -> list[tuple[str, str]]:
        n = self.u64()
        if n > 500:  # corruption guard, VexInput.java:88-90
            raise ValueError(f"entity has {n} tags — corrupted VEX data")
        return [(self.string(), self.string()) for _ in range(n)]

    def exhausted(self) -> bool:
        return self.pos >= len(self.buf)


class _Writer:
    __slots__ = ("out",)

    def __init__(self) -> None:
        self.out = bytearray()

    def u64(self, n: int) -> None:
        out = self.out
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    def s64(self, v: int) -> None:
        self.u64(((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))

    def string(self, s: str) -> None:
        b = (s or "").encode("utf-8")
        self.u64(len(b))
        self.out.extend(b)

    def tags(self, tags: list) -> None:
        tags = _as_list(tags)
        self.u64(len(tags))
        for t in tags:
            self.string(t["key"])
            self.string(t["value"] if t["value"] is not None else "")


# ---------------------------------------------------------------------------
# block framing
# ---------------------------------------------------------------------------


def scan_vex_blocks(path: str) -> list[tuple[str, int, int, str, int, int]]:
    """Index block payload offsets without reading payloads:
    (path, offset, deflated_size, kind, n_entities, seq)."""
    rows = []
    seq = 0
    with open(path, "rb") as f:
        while True:
            head = f.read(12)
            if len(head) < 12:
                break
            kind = _TYPES.get(head[:4])
            if kind is None:
                raise ValueError(f"unrecognized VEX block type {head[:4]!r}")
            n_entities, n_bytes = struct.unpack(">ii", head[4:12])
            if not (0 <= n_bytes <= VEX_BUFFER_SIZE and 0 <= n_entities <= VEX_BUFFER_SIZE):
                raise ValueError("impossible VEX block header — corrupted file")
            offset = f.tell()
            rows.append((path, offset, n_bytes, kind, n_entities, seq))
            seq += 1
            f.seek(offset + n_bytes)
    return rows


def decode_vex_block(kind: str, n_entities: int, payload: bytes) -> pd.DataFrame:
    """One inflated block → entity rows in the unified schema."""
    r = _Reader(payload)
    eid = 0
    ids, tags_col = [], []
    lats, lons = [], []
    refs_col, members_col = [], []
    if kind == "node":
        lat = lon = 0
        for _ in range(n_entities):
            eid += r.s64()
            tags = r.tags()
            lat += r.s64()
            lon += r.s64()
            ids.append(eid)
            tags_col.append([{"key": k, "value": v} for k, v in tags])
            lats.append(lat)
            lons.append(lon)
        return pd.DataFrame(
            {
                "entity_type": "node",
                "id": np.array(ids, np.int64),
                "fixed_lat": np.array(lats, np.int32),
                "fixed_lon": np.array(lons, np.int32),
                "tags": tags_col,
                "node_ids": None,
                "members": None,
            }
        )
    if kind == "way":
        ref = 0  # carries ACROSS ways within a block (VexInput.java:23,118)
        for _ in range(n_entities):
            eid += r.s64()
            tags = r.tags()
            n = r.u64()
            rr = []
            for _ in range(n):
                ref += r.s64()
                rr.append(ref)
            ids.append(eid)
            tags_col.append([{"key": k, "value": v} for k, v in tags])
            refs_col.append(rr)
        return pd.DataFrame(
            {
                "entity_type": "way",
                "id": np.array(ids, np.int64),
                "fixed_lat": None,
                "fixed_lon": None,
                "tags": tags_col,
                "node_ids": refs_col,
                "members": None,
            }
        )
    if kind == "relation":
        for _ in range(n_entities):
            eid += r.s64()
            tags = r.tags()
            n = r.u64()
            ms = []
            for _ in range(n):
                mid = r.s64()  # absolute, VexInput.java:140
                mtype = _MEMBER_TYPES[r.u64()]
                role = r.string()
                ms.append({"type": mtype, "member_id": mid, "role": role})
            ids.append(eid)
            tags_col.append([{"key": k, "value": v} for k, v in tags])
            members_col.append(ms)
        return pd.DataFrame(
            {
                "entity_type": "relation",
                "id": np.array(ids, np.int64),
                "fixed_lat": None,
                "fixed_lon": None,
                "tags": tags_col,
                "node_ids": None,
                "members": members_col,
            }
        )
    raise ValueError(kind)


def _frame_block(kind: str, n_entities: int, payload: bytes) -> bytes:
    """payload → framed deflated block bytes (VEXBlock.writeDeflated)."""
    deflated = zlib.compress(payload)
    return (
        _HEADERS[kind]
        + struct.pack(">ii", n_entities, len(deflated))
        + deflated
    )


def encode_vex_rows(kind: str, frame: pd.DataFrame, max_bytes: int = 900_000):
    """Encode id-sorted entity rows into 1+ framed blocks, splitting
    before the 1 MiB inflated cap. Yields (first_id, framed_bytes)."""
    w = _Writer()
    prev_id = prev_lat = prev_lon = prev_ref = 0
    n_in_block = 0
    first_id = None

    def flush():
        nonlocal w, prev_id, prev_lat, prev_lon, prev_ref, n_in_block, first_id
        out = None
        if n_in_block:
            out = (first_id, _frame_block(kind, n_in_block, bytes(w.out)))
        w = _Writer()
        prev_id = prev_lat = prev_lon = prev_ref = 0
        n_in_block = 0
        first_id = None
        return out

    for row in frame.itertuples(index=False):
        if first_id is None:
            first_id = int(row.id)
        w.s64(int(row.id) - prev_id)
        prev_id = int(row.id)
        w.tags(row.tags)
        if kind == "node":
            w.s64(int(row.fixed_lat) - prev_lat)
            w.s64(int(row.fixed_lon) - prev_lon)
            prev_lat, prev_lon = int(row.fixed_lat), int(row.fixed_lon)
        elif kind == "way":
            refs = _as_list(row.node_ids)
            w.u64(len(refs))
            for ref in refs:
                w.s64(int(ref) - prev_ref)
                prev_ref = int(ref)
        else:
            members = _as_list(row.members)
            w.u64(len(members))
            for m in members:
                w.s64(int(m["member_id"]))
                w.u64(_MEMBER_ORD[m["type"]])
                w.string(m["role"])
        n_in_block += 1
        if len(w.out) >= max_bytes:
            yield flush()
    done = flush()
    if done:
        yield done


# ---------------------------------------------------------------------------
# Spark integration (same dataflow as sources/pbf.py)
# ---------------------------------------------------------------------------


def read_vex(spark, path: str, blobs_per_task: int = 4):
    """Distributed VEX read → unified entity DataFrame (blocks are the
    parallelism unit; tasks seek + inflate + decode their own blocks)."""
    rows = scan_vex_blocks(path)
    n_part = max(1, min(len(rows) // blobs_per_task + 1, 256))
    idx = spark.createDataFrame(
        rows,
        "path string, offset long, size long, kind string, n_entities long, seq long",
    ).repartition(n_part, "seq")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                with open(r["path"], "rb") as f:
                    f.seek(int(r["offset"]))
                    payload = zlib.decompress(f.read(int(r["size"])))
                if len(payload) > VEX_BUFFER_SIZE:
                    raise ValueError("VEX block inflates past the 1 MiB cap")
                yield decode_vex_block(r["kind"], int(r["n_entities"]), payload)

    return idx.mapInPandas(decode, schema=ENTITY_SCHEMA)


def write_vex(path: str, nodes, ways, relations):
    """Distributed VEX sink: executors encode independent blocks
    (delta state resets per block — VexOutput.beginBlock), the driver
    concatenates framed bytes type-major in (type, first_id) order."""
    from pyspark.sql import functions as F  # noqa: N812

    blob_schema = "type_rank int, first_id long, blob binary"

    def encoder(kind: str):
        rank = {"node": 0, "way": 1, "relation": 2}[kind]

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values("id").reset_index(drop=True)
                for first_id, blob in encode_vex_rows(kind, pdf):
                    yield pd.DataFrame(
                        {"type_rank": [rank], "first_id": [first_id], "blob": [blob]}
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
        for r in ordered:
            f.write(bytes(r.blob))
    return len(ordered)
