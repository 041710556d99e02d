"""Storage layout + physical plan assertions: the parts of "fast at
100 TB" that are checkable at test scale — filters reach the scan,
Hilbert layout keeps tile stats tight, codegen covers the parse path.
"""

import io
import json
import os

import pytest
from pyspark.sql import functions as F

from osm_lib_spark.operators.extract import bbox_extract_batch, ways_in_bbox
from osm_lib_spark.operators.indexes import build_way_tiles, write_way_tiles_partitioned
from osm_lib_spark.operators.raster import rasterize_nodes, vectorize_raster
from osm_lib_spark.sources.span_codec import parse_nodes, parse_relations, parse_ways
from tests.conftest import golden


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def meta_xs(fixture_xs):
    with open(os.path.join(fixture_xs, "meta.json")) as f:
        return json.load(f)


def test_partitioned_way_tiles_pruning(spark, docs_xs, meta_xs, tmp_path_factory):
    """Tile-range predicates must reach the parquet scan of the
    Hilbert-partitioned way_tiles store (the reference's B-tree range
    scan analog, TileOSMSource.java:59-68) — and results must equal the
    unpartitioned computation exactly."""
    out = str(tmp_path_factory.mktemp("wt") / "way_tiles")
    nodes, ways = parse_nodes(docs_xs), parse_ways(docs_xs)
    wt = build_way_tiles(ways, nodes)
    write_way_tiles_partitioned(wt, out, num_partitions=8)

    stored = spark.read.parquet(out)
    bbox = tuple(meta_xs["bboxes"]["dense"])
    plan = _explain_str(ways_in_bbox(stored, bbox))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(xtile" in plan and "LessThanOrEqual(ytile" in plan

    got = sorted(r.way_id for r in ways_in_bbox(stored, bbox).collect())
    exp = sorted(r.way_id for r in ways_in_bbox(wt, bbox).collect())
    assert got == exp and len(got) > 0

    # Hilbert layout: each file's xtile stats should cover far less than
    # the global range (spatial locality → row-group skipping works)
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) > 1
    global_min = stored.agg(F.min("xtile")).first()[0]
    global_max = stored.agg(F.max("xtile")).first()[0]
    spans = []
    for f in files:
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        col = {md.schema.column(i).name: i for i in range(md.num_columns)}["xtile"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((max(maxs) - min(mins)) / max(1, global_max - global_min))
    assert sum(spans) / len(spans) < 0.8  # files are spatially local


def test_parse_path_is_codegen(spark, docs_xs):
    """The hot parse path must stay inside WholeStageCodegen (no Python
    boundary): assert the plan has codegen stages and no Arrow eval."""
    plan = _explain_str(parse_nodes(docs_xs))
    assert "codegen id" in plan  # stages fused into whole-stage codegen
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_extract_batch_single_broadcast_of_bboxes(spark, docs_xs, meta_xs):
    """The bbox dimension table must broadcast (never shuffle)."""
    nodes, ways, rels = parse_nodes(docs_xs), parse_ways(docs_xs), parse_relations(docs_xs)
    boxes = [tuple(meta_xs["bboxes"]["dense"]), tuple(meta_xs["bboxes"]["wide"])]
    plan = _explain_str(bbox_extract_batch(nodes, ways, rels, boxes))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rasterize_matches_way_tiles_math(spark, docs_xs, fixture_xs):
    """Raster grid counts must be consistent with the golden tile math:
    summing n_points over tiles equals the node count."""
    nodes = parse_nodes(docs_xs)
    raster = rasterize_nodes(nodes)
    assert raster.agg(F.sum("n_points")).first()[0] == nodes.count()

    vec = vectorize_raster(raster, min_points=5)
    row = vec.first()
    assert row.wkt.startswith("POLYGON ((") and row.wkt.endswith("))")
    # ring is closed: first point == last point
    pts = row.wkt[len("POLYGON (("):-2].split(", ")
    assert len(pts) == 5 and pts[0] == pts[-1]


def test_new_operator_joins_are_hash_joins(spark, docs_xs):
    """Round-2 operators must never plan nested-loop/cartesian joins:
    the k-ring strip join, the LSH-banded embedding dedup, and the
    prefix-filtered Jaccard candidates are all equi-joins."""
    import re

    from osm_lib_spark.functions.tiles import NTILES, tile_y_col
    from osm_lib_spark.operators.dedup import ngram_prefix_candidates
    from osm_lib_spark.operators.knn import _frontier_strips, _nodes_with_coords
    from osm_lib_spark.operators.similarity import embedding_dup_pairs

    bad = re.compile(r"BroadcastNestedLoopJoin|CartesianProduct")

    nodes = parse_nodes(docs_xs)
    coords = (
        _nodes_with_coords(nodes)
        .withColumn(
            "xtile",
            F.pmod(
                F.floor((F.col("lon") + 180.0) / 360.0 * NTILES).cast("int"),
                F.lit(NTILES),
            ),
        )
        .withColumn("ytile", tile_y_col(F.col("lat")))
    )
    strips = _frontier_strips(
        spark, [dict(query_id=0, qlat=10.0, qlon=10.0, qx=2000, qy=2000, radius=4)]
    )
    cand = coords.join(F.broadcast(strips), "xtile").where(
        F.col("ytile").between(F.col("ymin"), F.col("ymax"))
    )
    plan = _explain_str(cand)
    assert "BroadcastHashJoin" in plan and not bad.search(plan)

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, -0.5], i % 3) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    plan = _explain_str(embedding_dup_pairs(emb, threshold=0.3, dim=3))
    assert not bad.search(plan)

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i}") for i in range(30)], "doc_id long, text string"
    )
    plan = _explain_str(ngram_prefix_candidates(docs))
    assert not bad.search(plan)
