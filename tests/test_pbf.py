"""PBF byte-codec tests: reference golden counts on the REAL
bangor_maine.osm.pbf fixture (OSMTest.java:14-17), full entity
roundtrip through our own sink+source, and wire-primitive properties.
"""

import os

import numpy as np
import pandas as pd
import pytest

from osm_lib_spark.sources.pbf import (
    _inflate_blob,
    decode_primitive_block,
    np_decode_varints,
    np_encode_varints,
    np_unzigzag,
    np_zigzag,
    pbf_nodes,
    pbf_relations,
    pbf_ways,
    read_pbf,
    scan_blobs,
    write_pbf,
)

BANGOR = "/root/reference/src/test/resources/bangor_maine.osm.pbf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BANGOR), reason="reference fixture not present"
)


def test_varint_roundtrip_property():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.integers(0, 1 << 7, 100, dtype=np.uint64),
            rng.integers(0, 1 << 14, 100, dtype=np.uint64),
            rng.integers(0, 1 << 35, 100, dtype=np.uint64),
            rng.integers(0, np.iinfo(np.int64).max, 100, dtype=np.uint64),
            np.array([0, 1, 127, 128, 16383, 16384, (1 << 64) - 1], dtype=np.uint64),
        ]
    )
    enc = np_encode_varints(vals)
    dec = np_decode_varints(enc)
    np.testing.assert_array_equal(dec, vals)


def test_zigzag_roundtrip_property():
    rng = np.random.default_rng(4)
    v = rng.integers(-(1 << 62), 1 << 62, 500).astype(np.int64)
    v = np.concatenate([v, np.array([0, -1, 1, np.iinfo(np.int64).min + 1], np.int64)])
    np.testing.assert_array_equal(np_unzigzag(np_zigzag(v)), v)
    # zigzag mapping convention: 0→0, -1→1, 1→2, -2→3
    np.testing.assert_array_equal(
        np_zigzag(np.array([0, -1, 1, -2, 2], np.int64)), [0, 1, 2, 3, 4]
    )


def _pure_python_counts(path):
    n = w = r = 0
    with open(path, "rb") as f:
        for _, off, size, kind, _ in scan_blobs(path):
            if kind != "OSMData":
                continue
            f.seek(off)
            b = decode_primitive_block(_inflate_blob(f.read(size)))
            n += sum(len(a) for a in b["node_id"])
            w += len(b["way_id"])
            r += len(b["rel_id"])
    return n, w, r


def test_bangor_reference_golden_counts():
    """The reference's own hard oracle: 35747 nodes / 2976 ways / 34
    relations in bangor_maine.osm.pbf (OSMTest.java:14-17)."""
    assert _pure_python_counts(BANGOR) == (35747, 2976, 34)


@pytest.fixture(scope="module")
def bangor_entities(spark):
    return read_pbf(spark, BANGOR).cache()


def test_bangor_spark_counts(bangor_entities):
    counts = {
        r.entity_type: r.n
        for r in bangor_entities.groupBy("entity_type").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == {"node": 35747, "way": 2976, "relation": 34}


def test_bangor_relation_member_closure(bangor_entities):
    """OSMTest.java:20-31 analog: every relation member id of type WAY
    must appear in ways (etc.) — checks memid delta decode globally."""
    from pyspark.sql import functions as F

    rels = pbf_relations(bangor_entities)
    members = rels.select(F.explode("members").alias("m")).select(
        F.col("m.type").alias("t"), F.col("m.member_id").alias("mid")
    )
    ways = pbf_ways(bangor_entities).select(F.col("id").alias("mid"))
    dangling_ways = (
        members.where(F.col("t") == "WAY").join(ways, "mid", "left_anti").count()
    )
    # bangor is a clipped extract: node/way members may fall outside the
    # clip, but the reference asserts the INDEX contains every member —
    # our equivalent check is on relation-type members, which are closed
    rel_ids = rels.select(F.col("id").alias("mid"))
    dangling_rels = (
        members.where(F.col("t") == "RELATION")
        .join(rel_ids, "mid", "left_anti")
        .count()
    )
    assert dangling_rels == 0
    # way members resolve almost entirely; decode bugs would zero this
    resolved_ways = (
        members.where(F.col("t") == "WAY").join(ways, "mid", "left_semi").count()
    )
    assert resolved_ways > 0 and dangling_ways < members.count()


def test_bangor_roundtrip_exact(spark, tmp_path, bangor_entities):
    """read(bangor) → write(our PBF) → read back: every entity equal
    (the RoundTripTest.java:12-89 contract, entity-level equality per
    Node/Way/Relation.equals + ordered tagsEqual)."""
    out = str(tmp_path / "rt.pbf")
    n_blobs = write_pbf(
        out,
        pbf_nodes(bangor_entities),
        pbf_ways(bangor_entities),
        pbf_relations(bangor_entities),
    )
    assert n_blobs >= 35747 // 8000 + 1
    back = read_pbf(spark, out).cache()
    a = bangor_entities.toPandas()
    b = back.toPandas()

    def canon(df):
        df = df.copy()
        df["tags"] = df["tags"].map(
            lambda ts: tuple((t["key"], t["value"]) for t in ts) if ts is not None else ()
        )
        df["node_ids"] = df["node_ids"].map(
            lambda ns: tuple(ns) if ns is not None else ()
        )
        df["members"] = df["members"].map(
            lambda ms: tuple((m["type"], m["member_id"], m["role"]) for m in ms)
            if ms is not None
            else ()
        )
        return df.sort_values(["entity_type", "id"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(a), canon(b))
    back.unpersist()


def test_synthetic_roundtrip_from_span_entities(spark, docs_xs, tmp_path):
    """Entities parsed from the synthetic span fixture survive a PBF
    write→read cycle bit-for-bit (links the span codec and the byte
    codec end to end)."""
    from pyspark.sql import functions as F

    from osm_lib_spark.sources.span_codec import (
        parse_nodes,
        parse_relations,
        parse_ways,
    )

    nodes = parse_nodes(docs_xs)
    ways = parse_ways(docs_xs)
    # PBF member type vocabulary is NODE/WAY/RELATION (already ours)
    rels = parse_relations(docs_xs)
    out = str(tmp_path / "syn.pbf")
    write_pbf(out, nodes, ways, rels)
    back = read_pbf(spark, out).cache()

    assert pbf_nodes(back).count() == nodes.count()
    assert pbf_ways(back).count() == ways.count()
    assert pbf_relations(back).count() == rels.count()

    # value-level check on nodes (id → coords+tags) and ways (id → refs)
    a = nodes.orderBy("id").toPandas()
    b = pbf_nodes(back).orderBy("id").toPandas()
    np.testing.assert_array_equal(a["id"].to_numpy(), b["id"].to_numpy())
    np.testing.assert_array_equal(a["fixed_lat"].to_numpy(), b["fixed_lat"].to_numpy())
    np.testing.assert_array_equal(a["fixed_lon"].to_numpy(), b["fixed_lon"].to_numpy())
    ta = a["tags"].map(lambda ts: tuple((t["key"], t["value"]) for t in ts))
    tb = b["tags"].map(lambda ts: tuple((t["key"], t["value"]) for t in ts))
    assert (ta == tb).all()
    wa = parse_ways(docs_xs).orderBy("id").toPandas()
    wb = pbf_ways(back).orderBy("id").toPandas()
    assert (wa["node_ids"].map(tuple) == wb["node_ids"].map(tuple)).all()
    ra = rels.orderBy("id").toPandas()
    rb = pbf_relations(back).orderBy("id").toPandas()
    ma = ra["members"].map(lambda ms: tuple((m["type"], m["member_id"], m["role"]) for m in ms))
    mb = rb["members"].map(lambda ms: tuple((m["type"], m["member_id"], m["role"]) for m in ms))
    assert (ma == mb).all()
    back.unpersist()


def test_non_dense_nodes_and_granularity():
    """Wire variants bangor never exercises: plain (non-dense) Node
    messages and a non-default granularity/offset — the fixed-point
    math must mirror osmosis' double order exactly."""
    import numpy as np

    from osm_lib_spark.sources.pbf import (
        _enc_field_bytes,
        _enc_field_varint,
        _enc_packed,
        np_zigzag,
    )

    # stringtable: [""(reserved), "amenity", "cafe"]
    st = b"".join(_enc_field_bytes(1, s) for s in [b"", b"amenity", b"cafe"])
    # Node: id=42 (sint64), keys=[1], vals=[2], lat=447730578, lon=-688692696
    node_msg = (
        _enc_field_varint(1, int(np_zigzag(np.array([42]))[0]))
        + _enc_packed(2, np.array([1], np.uint64))
        + _enc_packed(3, np.array([2], np.uint64))
        + _enc_field_varint(8, int(np_zigzag(np.array([447730578]))[0]))
        + _enc_field_varint(9, int(np_zigzag(np.array([-688692696]))[0]))
    )
    group = _enc_field_bytes(1, node_msg)
    block = (
        _enc_field_bytes(1, st)
        + _enc_field_bytes(2, group)
        + _enc_field_varint(17, 100)  # granularity (default, explicit)
    )
    b = decode_primitive_block(block)
    assert list(b["node_id"][0]) == [42]
    assert list(b["node_lat"][0]) == [447730578]
    assert list(b["node_lon"][0]) == [-688692696]
    assert b["node_tags"][0] == [("amenity", "cafe")]
    # arrow path agrees
    from osm_lib_spark.sources.pbf import decode_block_arrow

    (batch,) = decode_block_arrow(block)
    row = batch.to_pylist()[0]
    assert row["id"] == 42 and row["fixed_lat"] == 447730578
    assert row["tags"] == [{"key": "amenity", "value": "cafe"}]

    # granularity=1000, lat_offset: degrees = 1e-9*(offset + 1000*raw);
    # fixed = trunc(deg*1e7) in the same float64 op order
    raw_lat, raw_lon = 44773057, -68869269
    off = 500
    dense = (
        _enc_packed(1, np_zigzag(np.array([7])))
        + _enc_packed(8, np_zigzag(np.array([raw_lat])))
        + _enc_packed(9, np_zigzag(np.array([raw_lon])))
    )
    block2 = (
        _enc_field_bytes(1, _enc_field_bytes(1, b""))
        + _enc_field_bytes(2, _enc_field_bytes(2, dense))
        + _enc_field_varint(17, 1000)
        + _enc_field_varint(19, off)
        + _enc_field_varint(20, off)
    )
    b2 = decode_primitive_block(block2)
    exp_lat = int(np.float64(off + 1000 * raw_lat) * 1e-9 * 1e7)
    exp_lon = int(np.float64(off + 1000 * raw_lon) * 1e-9 * 1e7)
    assert list(b2["node_lat"][0]) == [exp_lat]
    assert list(b2["node_lon"][0]) == [exp_lon]
