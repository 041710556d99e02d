"""Hierarchical cell-id algebra (S2-style quad hierarchy on the z-grid)."""

from pyspark.sql import functions as F

from osm_lib_spark.functions.cells import (
    cell_ancestor,
    cell_at,
    cell_children,
    cell_parent,
    cell_x,
    cell_y,
    cell_zoom,
    is_ancestor,
)


def test_cell_roundtrip_and_hierarchy(spark):
    pts = [(47.6, -122.3), (0.0, 0.0), (-33.9, 151.2), (84.9, 179.9), (-84.9, -179.9)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    c12 = cell_at(F.col("lat"), F.col("lon"), 12)
    c8 = cell_at(F.col("lat"), F.col("lon"), 8)
    rows = df.select(
        c12.alias("c12"),
        c8.alias("c8"),
        cell_zoom(c12).alias("z"),
        cell_x(c12).alias("x"),
        cell_y(c12).alias("y"),
        cell_ancestor(c12, 8).alias("anc8"),
        cell_parent(c12).alias("p"),
        cell_zoom(cell_parent(c12)).alias("pz"),
        is_ancestor(c8, c12).alias("contains"),
        is_ancestor(c12, c8).alias("reverse"),
        cell_children(cell_parent(c12)).alias("siblings"),
    ).collect()
    for r in rows:
        assert r.z == 12
        # the z8 cell computed directly equals the z12 cell's ancestor
        assert r.anc8 == r.c8
        assert r.pz == 11
        assert r.contains and not r.reverse
        # a cell is among its parent's 4 children
        assert r.c12 in r.siblings and len(r.siblings) == 4
        # parent coords halve
        px = (r.p >> 29) & ((1 << 29) - 1)
        assert px == r.x // 2


def test_is_ancestor_rejects_cousins(spark):
    # z8 tiles are 360/256 = 1.40625° wide: 3° east is a different branch
    df = spark.createDataFrame(
        [(10.0, 10.0, 10.0, 13.0)], "a double, b double, c double, d double"
    )
    r = df.select(
        is_ancestor(
            cell_at(F.col("a"), F.col("b"), 8),
            cell_at(F.col("c"), F.col("d"), 12),
        ).alias("x")
    ).first()
    assert not r.x
