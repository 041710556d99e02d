"""Delta/zigzag codec + enrichment operator unit tests."""

from pyspark.sql import functions as F

from osm_lib_spark.functions.delta import (
    delta_decode,
    delta_encode,
    zigzag_decode,
    zigzag_encode,
)
from osm_lib_spark.functions.tags import parse_tags, render_tags, retain_keys
from osm_lib_spark.operators.enrich import enrich_tags


def test_delta_roundtrip_with_block_reset(spark):
    df = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 13), (0, 3, 11), (1, 1, 100), (1, 2, 250)],
        "block int, seq int, v long",
    )
    enc = delta_encode(df, "v", "block", "seq")
    got = {(r.block, r.seq): r.delta for r in enc.collect()}
    # first row of each block carries the full value (per-block reset,
    # VexInput.java:102-108); negatives allowed
    assert got == {(0, 1): 10, (0, 2): 3, (0, 3): -2, (1, 1): 100, (1, 2): 150}
    dec = delta_decode(enc, "delta", "block", "seq", out_col="v2")
    assert all(r.v == r.v2 for r in dec.collect())


def test_zigzag_matches_reference_examples(spark):
    # VarInt.java:57-75 mapping: 0→0, -1→1, 1→2, -2→3, 2→4 ...
    df = spark.createDataFrame([(0,), (-1,), (1,), (-2,), (2,), (-(1 << 40),)], "n long")
    out = df.select(
        "n", zigzag_encode(F.col("n")).alias("z"),
        zigzag_decode(zigzag_encode(F.col("n"))).alias("back"),
    ).collect()
    mapping = {r.n: r.z for r in out}
    assert mapping[0] == 0 and mapping[-1] == 1 and mapping[1] == 2
    assert mapping[-2] == 3 and mapping[2] == 4
    assert all(r.back == r.n for r in out)


def test_enrich_tags_replace_and_append(spark):
    entities = spark.createDataFrame(
        [(1, "maxspeed=30;name=A;"), (2, "name=B;"), (3, "")],
        "id long, ts string",
    ).select("id", parse_tags(F.col("ts")).alias("tags"))
    updates = spark.createDataFrame([(1, "99"), (3, "50")], "id long, value string")
    got = {
        r.id: r.t
        for r in enrich_tags(entities, updates, "maxspeed")
        .select("id", render_tags(F.col("tags")).alias("t"))
        .collect()
    }
    assert got[1] == "maxspeed=99;name=A;"  # replaced IN PLACE
    assert got[2] == "name=B;"  # untouched
    assert got[3] == "maxspeed=50;"  # appended to empty


def test_retain_keys(spark):
    df = spark.createDataFrame([("highway=x;foo=1;name=N;",)], ["s"]).select(
        parse_tags(F.col("s")).alias("tags")
    )
    got = df.select(
        render_tags(retain_keys(F.col("tags"), ["highway", "name"])).alias("t")
    ).first()
    assert got.t == "highway=x;name=N;"
