"""Bbox tile-extract job — the reference's `GET /bbox.pbf` as a Spark job.

Usage:
    spark-submit --py-files . jobs/extract.py \
        --docs fixtures/sf-xs/docs.parquet \
        --bbox minLat,minLon,maxLat,maxLon \
        --out /tmp/extract_out

Reads the interleaved docs table, parses entities, builds the way_tiles
index, runs the bbox extract (way→node resolution + relation closure),
and writes nodes/ways/relations parquet in type-major order plus a
summary JSON line to stdout. Bbox parse/validation mirrors
VanillaExtract.java:110-127.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_lib_spark.operators.extract import bbox_extract  # noqa: E402
from osm_lib_spark.operators.indexes import build_way_tiles  # noqa: E402
from osm_lib_spark.session import get_spark  # noqa: E402
from osm_lib_spark.sources.span_codec import (  # noqa: E402
    parse_nodes,
    parse_relations,
    parse_ways,
)


def parse_bbox(s: str) -> tuple[float, float, float, float]:
    """Parse + validate 'minLat,minLon,maxLat,maxLon' (VanillaExtract.java:110-127)."""
    parts = s.split(",")
    if len(parts) != 4:
        raise ValueError(f"bbox must be minLat,minLon,maxLat,maxLon — got {s!r}")
    min_lat, min_lon, max_lat, max_lon = (float(p) for p in parts)
    if not (-90 <= min_lat <= 90 and -90 <= max_lat <= 90):
        raise ValueError(f"latitude out of range in {s!r}")
    if not (-180 <= min_lon <= 180 and -180 <= max_lon <= 180):
        raise ValueError(f"longitude out of range in {s!r}")
    if min_lat >= max_lat or min_lon >= max_lon:
        raise ValueError(f"min must be < max in {s!r}")
    return min_lat, min_lon, max_lat, max_lon


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="path to docs parquet")
    ap.add_argument("--bbox", required=True, help="minLat,minLon,maxLat,maxLon")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--way-tiles",
        default=None,
        help="path to a prebuilt Hilbert-partitioned way_tiles store "
        "(write_way_tiles_partitioned); skips deriving the index",
    )
    ap.add_argument(
        "--checkpoint",
        action="store_true",
        help="checkpoint each stage with lineage rows; a re-run resumes "
        "from the last committed stage (north-rule resume semantics)",
    )
    ap.add_argument(
        "--fail-after",
        default=None,
        help="TESTING: abort (exit 3) after this stage commits — "
        "simulates a mid-job kill for resume tests",
    )
    ap.add_argument(
        "--format",
        choices=("parquet", "pbf", "vex"),
        default="parquet",
        help="output format: parquet tables (default), or a single "
        ".pbf/.vex file — the reference's own `GET /bbox.pbf` and "
        "`GET /bbox.vex` surfaces (VanillaExtract.java:102-148)",
    )
    args = ap.parse_args(argv)

    try:
        bbox = parse_bbox(args.bbox)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    spark = get_spark("extract", master=args.master)
    t0 = time.time()
    docs = spark.read.parquet(args.docs)

    if args.checkpoint:
        from osm_lib_spark.plans.lineage import run_stage

        job_root = args.out
        job_id = "extract"

        def staged(stage, compute):
            df = run_stage(spark, job_root, job_id, stage, compute)
            if args.fail_after == stage:
                print(f"aborting after stage {stage} (--fail-after)", file=sys.stderr)
                sys.exit(3)
            return df

        nodes = staged("entities_nodes", lambda: parse_nodes(docs))
        ways = staged("entities_ways", lambda: parse_ways(docs))
        relations = staged("entities_relations", lambda: parse_relations(docs))
        if args.way_tiles:
            way_tiles = spark.read.parquet(args.way_tiles)
        else:
            way_tiles = staged("way_tiles", lambda: build_way_tiles(ways, nodes))
        ext = bbox_extract(nodes, ways, relations, bbox, way_tiles=way_tiles)
        out_nodes = staged("extract_nodes", lambda: ext.nodes)
        out_ways = staged("extract_ways", lambda: ext.ways)
        out_rels = staged("extract_relations", lambda: ext.relations)
        counts = {
            "nodes": out_nodes.count(),
            "ways": out_ways.count(),
            "relations": out_rels.count(),
        }
    else:
        nodes = parse_nodes(docs)
        ways = parse_ways(docs)
        relations = parse_relations(docs)
        if args.way_tiles:
            way_tiles = spark.read.parquet(args.way_tiles)
        else:
            way_tiles = build_way_tiles(ways, nodes)

        ext = bbox_extract(nodes, ways, relations, bbox, way_tiles=way_tiles)
        counts = {}
        if args.format in ("pbf", "vex"):
            os.makedirs(args.out, exist_ok=True)
            path = os.path.join(args.out, f"extract.{args.format}")
            if args.format == "pbf":
                from osm_lib_spark.sources.pbf import write_pbf as write_fmt
            else:
                from osm_lib_spark.sources.vex import write_vex as write_fmt
            write_fmt(path, ext.nodes, ext.ways, ext.relations)
            counts = {
                "nodes": ext.nodes.count(),
                "ways": ext.ways.count(),
                "relations": ext.relations.count(),
                "file": path,
            }
        else:
            for name, df in (
                ("nodes", ext.nodes),
                ("ways", ext.ways),
                ("relations", ext.relations),
            ):
                df.orderBy("id").write.mode("overwrite").parquet(os.path.join(args.out, name))
                counts[name] = spark.read.parquet(os.path.join(args.out, name)).count()

    print(
        json.dumps(
            {
                "bbox": list(bbox),
                "out": args.out,
                "counts": counts,
                "elapsed_sec": round(time.time() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
