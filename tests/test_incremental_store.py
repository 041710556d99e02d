"""Incremental way_tiles store maintenance (ST3 end-to-end):
apply a change batch, rewrite ONLY the dirty Hilbert buckets, and the
result must equal a from-scratch rebuild — with every untouched
bucket's files physically left in place."""

import os

import pytest
from pyspark.sql import functions as F

from osm_lib_spark.operators.indexes import (
    build_way_tiles,
    update_way_tiles_store,
    write_way_tiles_store,
)
from osm_lib_spark.sources.span_codec import parse_nodes, parse_ways
from osm_lib_spark.streaming.changes import affected_tiles, apply_changes


def _store_files(path: str) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for d in os.listdir(path):
        if d.startswith("cell_bucket="):
            out[d] = {
                f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
            }
    return out


def _rows(spark, path):
    return sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .select("cell_bucket", "cell_key", "xtile", "ytile", "way_id")
            .collect(),
        )
    )


@pytest.fixture(scope="module")
def xs_entities(docs_xs):
    return parse_nodes(docs_xs).cache(), parse_ways(docs_xs).cache()


def test_incremental_equals_rebuild(spark, xs_entities, tmp_path_factory):
    nodes, ways = xs_entities
    store_path = str(tmp_path_factory.mktemp("wt") / "store")
    write_way_tiles_store(build_way_tiles(ways, nodes, with_hilbert=True), store_path)
    before = _store_files(store_path)
    assert len(before) > 1  # the fixture spans multiple buckets

    # change batch: move a slice of nodes ~0.5 degrees, delete a slice
    # of ways, add clones of another slice (same shapes as the osc gate)
    node_changes = (
        nodes.where(F.col("id") % 211 == 0)
        .withColumn("fixed_lat", F.col("fixed_lat") + F.lit(5_000_000))
        .select(F.lit("modify").alias("action"), "id", "fixed_lat", "fixed_lon", "tags")
    )
    nodes2 = apply_changes(nodes, node_changes, key="id")
    way_deletes = ways.where(F.col("id") % 97 == 0).select(
        F.lit("delete").alias("action"), "id", "node_ids", "tags"
    )
    way_adds = ways.where(F.col("id") % 101 == 0).select(
        F.lit("add").alias("action"),
        (F.col("id") + F.lit(10_000_000_000_000)).alias("id"),
        "node_ids",
        "tags",
    )
    ways2 = apply_changes(ways, way_deletes.unionByName(way_adds), key="id")

    # changed ways: deleted + added + any way whose FIRST node moved
    moved = node_changes.select(F.col("id").alias("nid"))
    first_node = ways2.unionByName(ways).select(
        F.col("id").alias("way_id"), F.element_at("node_ids", 1).alias("fn")
    )
    touched_by_node = first_node.join(
        moved, first_node.fn == moved.nid, "left_semi"
    ).select("way_id")
    changed = (
        way_deletes.select(F.col("id").alias("way_id"))
        .unionByName(way_adds.select(F.col("id").alias("way_id")))
        .unionByName(touched_by_node)
        .distinct()
    )

    from osm_lib_spark.plans.lineage import LineageLog

    log = LineageLog(str(tmp_path_factory.mktemp("lin")))
    res = update_way_tiles_store(store_path, nodes2, ways2, changed, lineage=log)
    assert res["dirty_buckets"], "the change batch must dirty some buckets"

    # equality with a from-scratch rebuild
    rebuild_path = str(tmp_path_factory.mktemp("wt") / "rebuild")
    write_way_tiles_store(
        build_way_tiles(ways2, nodes2, with_hilbert=True), rebuild_path
    )
    assert _rows(spark, store_path) == _rows(spark, rebuild_path)

    # partition-scoped rewrite: untouched buckets keep their exact files
    after = _store_files(store_path)
    dirty_dirs = {f"cell_bucket={b}" for b in res["dirty_buckets"]}
    for d, files in before.items():
        if d not in dirty_dirs:
            assert after.get(d) == files, f"clean bucket {d} was rewritten"
    # and per-bucket contents agree with the rebuild bucket-for-bucket
    assert set(after) == set(_store_files(rebuild_path))

    # lineage digest audit: the appended per-bucket digests must equal
    # the rebuilt store's digests for the same buckets — incremental ==
    # rebuild is checkable from lineage rows alone
    from osm_lib_spark.operators.indexes import way_tiles_bucket_digests

    lin = log.read()
    lin_digests = {
        int(r.partition_id): (int(r.row_count), int(r.digest))
        for r in lin.itertuples()
        if r.stage == "way_tiles_update"
    }
    rebuild_digests = way_tiles_bucket_digests(
        spark.read.parquet(rebuild_path), res["dirty_buckets"]
    )
    for b in res["dirty_buckets"]:
        assert lin_digests[b] == rebuild_digests.get(b, (0, 0)), f"bucket {b} digest"
    # cell ranges are the fixed Hilbert intervals
    for r in lin.itertuples():
        assert r.cell_min == r.partition_id << 14
        assert r.cell_max == ((r.partition_id + 1) << 14) - 1

    # the affected-tile set (cache invalidation granularity) covers the
    # dirty buckets' tiles change
    old_wt = build_way_tiles(ways, nodes)
    new_wt = build_way_tiles(ways2, nodes2)
    dirty_tiles = affected_tiles(old_wt, new_wt, changed)
    assert dirty_tiles.count() > 0
