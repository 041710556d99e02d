"""Bounding-box tile extract — the flagship query.

Re-expresses the reference's `GET /minLat,minLon,maxLat,maxLon.pbf`
pipeline (TileOSMSource.java:49-143) as one declarative DataFrame DAG:

    bbox → z12 tile range (y-inverted, TileOSMSource.java:43-45)
         → way_tiles range filter            (S5: partition-pruned scan)
         → ways semi-join                    (J2)
         → explode refs → nodes inner join   (J1 + J6 dedup)
         → relation semi-joins by node/way   (J3/J4, INTENDED semantics)
         → upward relation closure           (J5, semi-naive iteration)
         → type-major ordered output         (O1)

Documented deviations from the reference (SURVEY §5.4 — reference bugs,
we implement the intended semantics): the node→relation lookup keys on
nodeId (the reference accidentally uses wayId, TileOSMSource.java:87-89),
relations are emitted once (not once per pass), and the closure frontier
tests the discovered id (TileOSMSource.java:127).

Scale design: the tile filter reaches the way_tiles parquet scan
(min/max row-group skipping via the Hilbert-sorted layout); the J1 join
deduplicates probe keys first so both join sides are key-unique (no
skew); AQE picks broadcast at runtime when the bbox is small and its
way-id set is tiny; the closure loop is semi-naive (joins only the
frontier, not the whole seen set) and localCheckpoints each round to
keep the plan from growing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.tiles import bbox_tile_range
from osm_lib_spark.operators.indexes import build_way_tiles, rel_member_indexes

MAX_CLOSURE_ITERATIONS = 50


@dataclass
class Extract:
    nodes: DataFrame
    ways: DataFrame
    relations: DataFrame

    def ids(self) -> DataFrame:
        """(entity_type, id) union in type-major order (O1,
        OSMEntitySource.java:10-13): nodes, then ways, then relations."""
        u = (
            self.nodes.select(F.lit("node").alias("entity_type"), "id")
            .unionByName(self.ways.select(F.lit("way").alias("entity_type"), "id"))
            .unionByName(
                self.relations.select(F.lit("relation").alias("entity_type"), "id")
            )
        )
        type_rank = (
            F.when(F.col("entity_type") == "node", 0)
            .when(F.col("entity_type") == "way", 1)
            .otherwise(2)
        )
        return u.orderBy(type_rank, "id")


def ways_in_bbox(
    way_tiles: DataFrame, bbox: tuple[float, float, float, float]
) -> DataFrame:
    """Tile-range scan (S5, TileOSMSource.java:59-68) → way_id frame.

    The between-predicates are plain column filters, so they push down
    into the parquet/Iceberg scan and prune row groups when way_tiles is
    stored Hilbert-sorted (write_way_tiles_partitioned).
    """
    min_x, min_y, max_x, max_y = bbox_tile_range(*bbox)
    return way_tiles.where(
        F.col("xtile").between(min_x, max_x) & F.col("ytile").between(min_y, max_y)
    ).select("way_id")


def bbox_extract(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    bbox: tuple[float, float, float, float],
    way_tiles: DataFrame | None = None,
) -> Extract:
    """Full extract. ``bbox`` = (min_lat, min_lon, max_lat, max_lon).

    ``way_tiles`` may be a pre-built (ideally Hilbert-partitioned) index
    table; if None it is derived on the fly from ways+nodes.
    """
    if way_tiles is None:
        way_tiles = build_way_tiles(ways, nodes)
    hit_ways = ways_in_bbox(way_tiles, bbox)

    # J2: fetch way rows. left_semi keeps the probe side lean.
    extract_ways = ways.join(hit_ways, ways.id == hit_ways.way_id, "left_semi")

    # J1 + J6: resolve refs → nodes, dedup before the join so both sides
    # are key-unique (orphan refs drop out via the inner join, the
    # logged-and-skipped semantics of TileOSMSource.java:80-82).
    ref_ids = extract_ways.select(F.explode("node_ids").alias("ref_id")).distinct()
    extract_nodes = nodes.join(ref_ids, nodes.id == ref_ids.ref_id, "left_semi")

    # J3/J4: relations referencing extracted nodes (by nodeId — intended
    # semantics) or extracted ways.
    idx = rel_member_indexes(relations)
    rel_by_node = idx["node"].join(
        extract_nodes.select(F.col("id").alias("nid")),
        F.col("member_id") == F.col("nid"),
        "left_semi",
    )
    rel_by_way = idx["way"].join(
        extract_ways.select(F.col("id").alias("wid")),
        F.col("member_id") == F.col("wid"),
        "left_semi",
    )
    seen = (
        rel_by_node.select("relation_id")
        .unionByName(rel_by_way.select("relation_id"))
        .distinct()
    )

    # J5: upward closure — relations that reference already-seen
    # relations, semi-naive to fixpoint (TileOSMSource.java:112-132).
    by_rel = idx["relation"].localCheckpoint(eager=True)
    seen = seen.localCheckpoint(eager=True)
    frontier = seen
    for _ in range(MAX_CLOSURE_ITERATIONS):
        frontier_ids = frontier.select(F.col("relation_id").alias("member_rel_id"))
        parents = (
            by_rel.join(
                frontier_ids, by_rel.member_id == frontier_ids.member_rel_id, "left_semi"
            )
            .select(F.col("relation_id"))
            .distinct()
        )
        new = parents.join(seen, "relation_id", "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            break
        seen = seen.unionByName(new).localCheckpoint(eager=True)
        frontier = new

    extract_rels = relations.join(
        seen, relations.id == seen.relation_id, "left_semi"
    )
    return Extract(nodes=extract_nodes, ways=extract_ways, relations=extract_rels)
