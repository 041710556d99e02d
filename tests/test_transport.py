"""Replication transport (S6) end-to-end over a file:// mirror.

The mirror under tmp_path has the EXACT planet.osm.org layout
(``<timescale>/state.txt`` + ``<timescale>/AAA/BBB/CCC.state.txt`` /
``.osc.gz``); the transport code path (urllib over the planner's URL
math) is byte-identical to what would run against the real feed — only
the base URL differs. Covers: fetch-miss → None (the backward walk's
stop condition), plan → download → merge → watermark, and the batched
single-merge path's equality with the reference's sequential per-diff
loop (Updater.java:73-240)."""

import gzip
import os
from datetime import datetime, timezone

from osm_lib_spark.streaming.replication import sequence_path
from osm_lib_spark.streaming.transport import (
    catch_up,
    make_fetch_state,
    url_fetch,
)

NODE_SCHEMA = (
    "id long, fixed_lat int, fixed_lon int, "
    "tags array<struct<key:string,value:string>>"
)


def _state_txt(seq: int, ts: int) -> str:
    stamp = datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H\\:%M\\:%SZ"
    )
    return f"#replication state\nsequenceNumber={seq}\ntimestamp={stamp}\n"


def _osc(body: str) -> bytes:
    return gzip.compress(
        (
            "<?xml version='1.0' encoding='UTF-8'?>\n"
            f'<osmChange version="0.6" generator="test">{body}</osmChange>'
        ).encode()
    )


def _write_mirror(root: str, timescale: str, diffs: dict[int, tuple[int, bytes]]):
    """diffs: seq -> (timestamp, osc_gz_bytes). Writes per-seq state +
    diff files and the rolling state.txt for the latest seq."""
    tdir = os.path.join(root, timescale)
    for seq, (ts, payload) in diffs.items():
        path = os.path.join(tdir, sequence_path(seq))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".state.txt", "w") as f:
            f.write(_state_txt(seq, ts))
        with open(path + ".osc.gz", "wb") as f:
            f.write(payload)
    latest = max(diffs)
    with open(os.path.join(tdir, "state.txt"), "w") as f:
        f.write(_state_txt(latest, diffs[latest][0]))


def test_url_fetch_file_scheme_and_miss(tmp_path):
    p = tmp_path / "state.txt"
    p.write_text("sequenceNumber=7\n")
    assert url_fetch(f"file://{p}") == b"sequenceNumber=7\n"
    assert url_fetch(f"file://{tmp_path}/absent.txt") is None


def test_make_fetch_state_over_mirror(tmp_path):
    base_ts = 1_755_000_000
    _write_mirror(
        str(tmp_path), "minute", {1: (base_ts, _osc("")), 2: (base_ts + 60, _osc(""))}
    )
    base = f"file://{tmp_path}/"
    fetch_state = make_fetch_state(base)
    latest = fetch_state("minute", 0)
    assert latest.sequence_number == 2 and latest.timestamp == base_ts + 60
    assert latest.url == f"{base}minute/000/000/002.osc.gz"
    st1 = fetch_state("minute", 1)
    assert (st1.sequence_number, st1.timestamp) == (1, base_ts)
    # walk past the feed horizon and into a missing timescale: both None
    assert fetch_state("minute", 3) is None
    assert fetch_state("hour", 0) is None


def test_catch_up_end_to_end_batched_equals_sequential(spark, tmp_path):
    base_ts = 1_755_000_000
    tags = '<tag k="highway" v="crossing"/>'
    diffs = {
        1: (base_ts, _osc('<create><node id="1" lat="1.0" lon="1.0"/></create>')),
        2: (
            base_ts + 60,
            _osc(
                f'<modify><node id="1" lat="1.5" lon="1.5">{tags}</node></modify>'
                '<create><node id="100" lat="10.0" lon="20.0"/></create>'
            ),
        ),
        3: (
            base_ts + 120,
            _osc(
                '<delete><node id="100" lat="0" lon="0"/></delete>'
                '<modify><node id="2" lat="2.5" lon="2.5"/></modify>'
            ),
        ),
        4: (
            base_ts + 180,
            _osc(
                '<create><node id="100" lat="33.0" lon="44.0"/>'
                '<node id="101" lat="5.0" lon="6.0"/></create>'
            ),
        ),
    }
    _write_mirror(str(tmp_path), "minute", diffs)
    base = f"file://{tmp_path}/"

    target = spark.createDataFrame(
        [(1, 10_000_000, 10_000_000, []), (2, 20_000_000, 20_000_000, [])],
        NODE_SCHEMA,
    )
    # watermark = diff 1's ts → plan is diffs 2,3,4; now is ~2h later so
    # the hour stage probes the (absent) hour timescale first and must
    # come back empty without derailing the minute catch-up
    db_ts, now = base_ts, base_ts + 2 * 3600

    merged, wm, plan = catch_up(
        spark, target, db_ts, now, base=base, cache_dir=str(tmp_path / "c1")
    )
    assert [d.sequence_number for d in plan] == [2, 3, 4]
    assert wm == base_ts + 180
    got = {(r.id, r.fixed_lat, r.fixed_lon) for r in merged.collect()}
    # 1 modified by diff 2; 2 modified by diff 3; 100 deleted by diff 3
    # then re-added by diff 4 (cross-file last-wins); 101 added by diff 4
    assert got == {
        (1, 15_000_000, 15_000_000),
        (2, 25_000_000, 25_000_000),
        (100, 330_000_000, 440_000_000),
        (101, 50_000_000, 60_000_000),
    }
    tag_row = {r.id: r.tags for r in merged.collect()}[1]
    assert [t.asDict() for t in tag_row] == [{"key": "highway", "value": "crossing"}]

    seq_merged, seq_wm, _ = catch_up(
        spark,
        target,
        db_ts,
        now,
        base=base,
        cache_dir=str(tmp_path / "c2"),
        batched=False,
    )
    assert seq_wm == wm
    assert {
        (r.id, r.fixed_lat, r.fixed_lon) for r in seq_merged.collect()
    } == got

    # already current: no plan, no merge, watermark untouched
    same, wm2, plan2 = catch_up(spark, target, base_ts + 180, now, base=base)
    assert plan2 == [] and wm2 == base_ts + 180 and same is target


def test_replicate_cli_end_to_end(spark, tmp_path, capsys):
    """jobs/replicate.py over the fixture docs + a file:// mirror:
    a delete of a real fixture node and two adds land in the merged
    parquet, the watermark advances, and bad --since exits 2."""
    import json as _json

    from jobs.replicate import main as replicate_main
    from osm_lib_spark.sources.span_codec import parse_nodes

    docs = "fixtures/sf-xs/docs.parquet"
    nodes = parse_nodes(spark.read.parquet(docs))
    n0 = nodes.count()
    victim = nodes.select("id").orderBy("id").first().id

    base_ts = 1_755_000_000
    diffs = {
        1: (
            base_ts + 60,
            _osc(f'<delete><node id="{victim}" lat="0" lon="0"/></delete>'),
        ),
        2: (
            base_ts + 120,
            _osc(
                '<create><node id="900000000001" lat="1.0" lon="2.0"/>'
                '<node id="900000000002" lat="3.0" lon="4.0"/></create>'
            ),
        ),
    }
    _write_mirror(str(tmp_path), "minute", diffs)

    out = str(tmp_path / "rep")
    rc = replicate_main(
        [
            "--docs", docs,
            "--base", f"file://{tmp_path}",
            "--since", str(base_ts),
            "--now", str(base_ts + 600),
            "--out", out,
        ]
    )
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["applied_diffs"] == 2 and summary["sequences"] == [1, 2]
    assert summary["watermark"] == base_ts + 120
    assert summary["rows"] == n0 + 1  # -1 delete, +2 adds

    merged = spark.read.parquet(os.path.join(out, "node"))
    ids = {r.id for r in merged.select("id").collect()}
    assert victim not in ids
    assert {900000000001, 900000000002} <= ids

    assert replicate_main(
        ["--docs", docs, "--base", "x", "--since", "bogus", "--out", out]
    ) == 2
