"""Point-in-polygon via ray casting in vectorized Arrow batches.

Engine addition (no reference analog; BASELINE.json north_star mandates
"ray-casting point-in-polygon in pandas batches"). The polygon set is
small (broadcast via closure capture); points stream through a scalar
pandas UDF in Arrow batches — numpy does V vector operations per batch
for a V-vertex polygon, never per-row Python.

The numpy kernel (ray_cast_contains) is shared with the pure-pandas
oracle so engine and golden fixtures agree bit-for-bit; the kernel
itself is unit-tested against hand-computed cases in tests/test_geo.py.

Multipolygon-with-holes convention: even-odd across all rings (a point
is inside iff it is inside an odd number of rings), matching the
multipolygon relation fixture (role=outer/inner members).

Scale path: pre-filter points to the polygon's bbox tiles first (a
prunable column predicate) so the UDF only sees candidate rows, then
ray-cast. For polygon sets too large to broadcast, bucket polygons by
covering tile and join points to polygon buckets on tile key before
the per-bucket ray cast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_lib_spark.functions.geo import from_fixed
from osm_lib_spark.sources.oracle import ray_cast_contains


def points_in_polygons(
    nodes: DataFrame, polygons: dict[int, list[np.ndarray]]
) -> DataFrame:
    """→ (poly_id, node_id) for every node inside each polygon.

    ``polygons``: poly_id → [ring, ...], each ring an (V, 2) float64
    array of (lat, lon) vertices.
    """
    # serialize rings to plain lists for closure pickling (small)
    poly_items = [
        (int(pid), [np.asarray(r, dtype=np.float64) for r in rings])
        for pid, rings in sorted(polygons.items())
    ]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def containing_polys(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64)
        lo = lon.to_numpy(dtype=np.float64)
        hits: list[list[int]] = [[] for _ in range(len(la))]
        for pid, rings in poly_items:
            inside = np.zeros(len(la), dtype=bool)
            for ring in rings:
                inside ^= ray_cast_contains(ring, la, lo)
            for i in np.nonzero(inside)[0]:
                hits[i].append(pid)
        return pd.Series(hits)

    # bbox prefilter: cheap column predicate cuts the UDF input to
    # candidates only (pushdown-friendly); union of all polygon bboxes.
    all_lat = np.concatenate([r[:, 0] for _, rings in poly_items for r in rings])
    all_lon = np.concatenate([r[:, 1] for _, rings in poly_items for r in rings])
    pts = nodes.select(
        F.col("id").alias("node_id"),
        from_fixed(F.col("fixed_lat")).alias("lat"),
        from_fixed(F.col("fixed_lon")).alias("lon"),
    ).where(
        F.col("lat").between(float(all_lat.min()), float(all_lat.max()))
        & F.col("lon").between(float(all_lon.min()), float(all_lon.max()))
    )

    return (
        pts.withColumn("poly_ids", containing_polys(F.col("lat"), F.col("lon")))
        .where(F.size("poly_ids") > 0)
        .select(F.explode("poly_ids").alias("poly_id"), "node_id")
    )


def polygon_rings_from_relation(
    relations: DataFrame, ways: DataFrame, nodes: DataFrame, relation_id: int
) -> dict[int, list[np.ndarray]]:
    """Resolve a type=multipolygon relation's member ways into rings.

    Way→node resolution with order restored via posexplode + sort
    (the J1 join, TileOSMSource.java:77-84): member ways' node_ids are
    looked up and each way's coordinate sequence becomes one ring.
    Returns {relation_id: [outer_ring, inner_ring, ...]} with rings in
    member order (role=outer first by convention of the fixture).
    """
    members = (
        relations.where(F.col("id") == relation_id)
        .select(F.posexplode("members").alias("m_pos", "m"))
        .where(F.col("m.type") == "WAY")
        .select("m_pos", F.col("m.member_id").alias("way_id"), F.col("m.role").alias("role"))
    )
    way_pts = (
        members.join(ways, members.way_id == ways.id, "inner")
        .select("m_pos", "way_id", F.posexplode("node_ids").alias("n_pos", "ref_id"))
        .join(
            nodes.select(
                F.col("id").alias("nid"),
                from_fixed(F.col("fixed_lat")).alias("lat"),
                from_fixed(F.col("fixed_lon")).alias("lon"),
            ),
            F.col("ref_id") == F.col("nid"),
            "inner",
        )
        .groupBy("m_pos", "way_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("n_pos", "lat", "lon"))
            ).alias("pts")
        )
        .orderBy("m_pos")
        .collect()
    )
    rings = [
        np.array([[p.lat, p.lon] for p in row.pts], dtype=np.float64)
        for row in way_pts
        if len(row.pts) >= 3
    ]
    return {relation_id: rings}
