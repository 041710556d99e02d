"""Byte-level OSC XML parsing (S3 wire format) + end-to-end diff
application through apply_changes."""

import gzip
import os

from osm_lib_spark.sources.osc import (
    osc_node_changes,
    osc_way_changes,
    parse_osc_bytes,
    read_osc,
)
from osm_lib_spark.streaming.changes import apply_changes

OSC = b"""<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="test">
  <modify>
    <node id="1" lat="44.7730578" lon="-68.8692696" version="2">
      <tag k="railway" v="level_crossing"/>
    </node>
    <way id="10" version="3">
      <nd ref="1"/><nd ref="2"/><nd ref="3"/>
      <tag k="highway" v="residential"/>
    </way>
  </modify>
  <delete>
    <node id="2" lat="0.0" lon="0.0"/>
  </delete>
  <create>
    <node id="5" lat="-33.5" lon="151.2"/>
    <relation id="99">
      <member type="way" ref="10" role="outer"/>
      <member type="node" ref="1" role=""/>
      <tag k="type" v="multipolygon"/>
    </relation>
  </create>
</osmChange>
"""


def test_parse_osc_bytes_semantics():
    df = parse_osc_bytes("x.osc", OSC)
    assert list(df["action"]) == ["modify", "modify", "delete", "add", "add"]
    assert list(df["seq"]) == [0, 1, 2, 3, 4]
    node = df.iloc[0]
    # fixed-point truncation parity with Java's (int)(parseDouble * 1e7):
    # 44.7730578 * 1e7 = 447730577.99999994 in float64 → truncates to
    # ...577 — one ulp BELOW the PBF-decoded value for the same
    # coordinate, a discrepancy inherent in the reference's own math
    # (Node.setLatLon double path vs PBF's exact integer path)
    assert node["fixed_lat"] == 447730577 and node["fixed_lon"] == -688692696
    assert node["tags"] == [{"key": "railway", "value": "level_crossing"}]
    way = df.iloc[1]
    assert way["node_ids"] == [1, 2, 3]
    rel = df.iloc[4]
    # intended semantics: members ARE parsed (the reference's SAX
    # handler drops them — OSMChangeParser.java:55-63)
    assert rel["members"] == [
        {"type": "WAY", "member_id": 10, "role": "outer"},
        {"type": "NODE", "member_id": 1, "role": ""},
    ]


def test_read_osc_gzip_and_apply(spark, tmp_path):
    p = os.path.join(tmp_path, "diff.osc.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(OSC))
    changes = read_osc(spark, [p])
    assert changes.count() == 5

    nodes = spark.createDataFrame(
        [(1, 0, 0, []), (2, 5, 5, []), (3, 6, 6, [])],
        "id long, fixed_lat int, fixed_lon int, tags array<struct<key:string,value:string>>",
    )
    merged = apply_changes(nodes, osc_node_changes(changes))
    got = {r.id: (r.fixed_lat, r.fixed_lon) for r in merged.collect()}
    # node 1 modified, node 2 deleted, node 3 untouched, node 5 added
    assert set(got) == {1, 3, 5}
    assert got[1] == (447730577, -688692696)
    assert got[5] == (-335000000, 1512000000)

    ways = spark.createDataFrame(
        [(10, [9, 9], []), (11, [1], [])],
        "id long, node_ids array<long>, tags array<struct<key:string,value:string>>",
    )
    wmerged = apply_changes(ways, osc_way_changes(changes))
    wgot = {r.id: list(r.node_ids) for r in wmerged.collect()}
    assert wgot == {10: [1, 2, 3], 11: [1]}
