"""Extract CLI (the reference's `GET /bbox.pbf` surface): bbox
validation and the PBF/VEX output formats decode to the golden
extract."""

import json
import os

import pytest

from jobs.extract import main as extract_main, parse_bbox


def test_parse_bbox_validation():
    assert parse_bbox("1,2,3,4") == (1.0, 2.0, 3.0, 4.0)
    for bad in ("bogus", "1,2,3", "10,-5,9,5", "95,0,96,1", "0,179,1,181"):
        with pytest.raises(ValueError):
            parse_bbox(bad)


def test_cli_pbf_format_matches_golden(spark, fixture_xs, tmp_path, capsys):
    """--format pbf writes a real .pbf whose decoded (entity_type, id)
    set equals the golden parquet extract."""
    import duckdb

    from osm_lib_spark.sources.pbf import read_pbf

    with open(os.path.join(fixture_xs, "meta.json")) as f:
        meta = json.load(f)
    bbox = ",".join(str(round(x, 6)) for x in meta["bboxes"]["dense"])
    out = str(tmp_path / "cli_pbf")
    rc = extract_main(
        [
            "--docs", os.path.join(fixture_xs, "docs.parquet"),
            "--bbox", bbox,
            "--out", out,
            "--format", "pbf",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    path = summary["counts"]["file"]
    ents = read_pbf(spark, path)
    got = {(r.entity_type, r.id) for r in ents.select("entity_type", "id").collect()}
    exp = {
        (r[0], r[1])
        for r in duckdb.sql(
            f"SELECT entity_type, id FROM read_parquet('{fixture_xs}/golden/extract_dense.parquet')"
        ).fetchall()
    }
    assert got == exp
