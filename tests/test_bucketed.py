"""Bucketed entity store: id joins must be shuffle-free on the bucketed
side, results identical to the plain path; affected_tiles (ST3) test."""

import pandas as pd
from pyspark.sql import functions as F

from osm_lib_spark.operators.indexes import build_way_tiles, write_entities_bucketed
from osm_lib_spark.sources.span_codec import parse_nodes, parse_relations, parse_ways
from osm_lib_spark.streaming.changes import affected_tiles, apply_changes


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_is_shuffle_free(spark, docs_xs):
    nodes, ways, rels = parse_nodes(docs_xs), parse_ways(docs_xs), parse_relations(docs_xs)
    write_entities_bucketed(nodes, ways, rels, database_prefix="t_osm", n_buckets=8)
    bnodes = spark.table("t_osm_nodes")
    bways = spark.table("t_osm_ways")

    refs = bways.select(F.col("id").alias("way_id"), F.explode("node_ids").alias("ref"))
    joined = refs.join(
        bnodes.select(F.col("id").alias("ref"), "fixed_lat").hint("MERGE"), "ref"
    )
    plan = _explain(joined)
    # the bucketed nodes side must NOT re-shuffle: exactly ONE Exchange
    # node (the exploded refs side, which is not bucketed by ref)
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 1, plan[:2000]

    # results identical to the unbucketed computation
    got = (
        joined.groupBy("way_id").agg(F.count("*").alias("n"))
        .toPandas().sort_values("way_id").reset_index(drop=True)
    )
    plain = (
        ways.select(F.col("id").alias("way_id"), F.explode("node_ids").alias("ref"))
        .join(nodes.select(F.col("id").alias("ref"), "fixed_lat"), "ref")
        .groupBy("way_id").agg(F.count("*").alias("n"))
        .toPandas().sort_values("way_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, plain, check_dtype=False)


def test_affected_tiles_st3(spark, docs_xs):
    """ST3 deferred re-index: a moved way's OLD and NEW tiles are both
    flagged; untouched ways flag nothing."""
    nodes, ways = parse_nodes(docs_xs), parse_ways(docs_xs)
    wt_old = build_way_tiles(ways, nodes)

    # move one way's first node ref to a node in a different tile:
    # pick way w and retarget to the first node of a far-away way
    sample = ways.limit(50).collect()
    w = sample[0]
    other_first = None
    old_tile = {r.way_id: (r.xtile, r.ytile) for r in wt_old.collect()}
    for cand in sample[1:]:
        if (
            cand.id in old_tile
            and w.id in old_tile
            and old_tile[cand.id] != old_tile[w.id]
        ):
            other_first = cand.node_ids[0]
            new_tile = old_tile[cand.id]
            break
    assert other_first is not None

    changes = spark.createDataFrame(
        [("modify", w.id, [other_first] + list(w.node_ids[1:]), w.tags)],
        "action string, id long, node_ids array<long>, tags array<struct<key:string,value:string>>",
    )
    ways_new = apply_changes(ways, changes)
    wt_new = build_way_tiles(ways_new, nodes)
    changed = spark.createDataFrame([(w.id,)], "way_id long")

    tiles = {(r.xtile, r.ytile) for r in affected_tiles(wt_old, wt_new, changed).collect()}
    assert old_tile[w.id] in tiles and new_tile in tiles
    assert len(tiles) == 2
