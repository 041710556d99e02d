"""Deterministic synthetic world + interleaved-docs fixture generator.

Implements FIXTURES.md: a seeded (42) "bangor-analog" world of OSM-style
entities embedded as text spans in interleaved text+media documents of
exactly the driver's input_hint shape:

    docs(doc_id string,
         spans array<struct<kind,text,media_ref string, offset int>>)

and golden expected-output parquet computed by the pure-pandas oracle
(osm_lib_spark.sources.oracle) for differential testing — the analog of
the reference's golden-count test (OSMTest.java:14-17).

Everything is reproducible from the seed; no external data.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from osm_lib_spark.sources import oracle

SEED = 42

SCALES = {
    # sf-xs: smoke; sf-s: correctness oracle; sf-m: bench;
    # sf-l: 4x bench — scaling-efficiency measurements only (generated
    # WITHOUT golden oracles: pass light=True / the CLI does)
    "xs": dict(docs=1_000, nodes=5_000, ways=800, relations=40, clusters=4),
    "s": dict(docs=20_000, nodes=100_000, ways=15_000, relations=600, clusters=16),
    "m": dict(docs=500_000, nodes=2_500_000, ways=400_000, relations=15_000, clusters=64),
    "l": dict(docs=2_000_000, nodes=10_000_000, ways=1_600_000, relations=60_000, clusters=128),
}
SCALE_OFFSET = {"xs": 0, "s": 1, "m": 2, "l": 3}

WAY_ID_BASE = 6_000_000_000
REL_ID_BASE = 7_000_000_000
ORPHAN_ID_BASE = 999_000_000_000
HIGH_NODE_ID_BASE = 1 << 32  # NodeTracker >2^32 range analog (NodeTrackerTest.java:19)

_HIGHWAY_VALUES = ["residential", "primary", "secondary", "service", "footway"]
_HIGHWAY_P = [0.45, 0.25, 0.15, 0.1, 0.05]
_NAMES = ["Main St", "Oak Ave", "High St", "Park Rd", "1st Ave", "Mill Ln"]
_SPEEDS = ["30", "50", "80", "100"]
_AMENITIES = ["cafe", "school", "bench", "parking"]
_WORDS = (
    "the a spark tile node way relation extract corpus doc span media "
    "street city map query join shuffle partition index range scan".split()
)


@dataclass
class World:
    nodes: pd.DataFrame  # id, fixed_lat(int32), fixed_lon(int32), tags(list[(k,v)])
    ways: pd.DataFrame  # id, node_ids(list[int]), tags
    relations: pd.DataFrame  # id, members(list[(type,mid,role)]), tags
    centers: np.ndarray  # (K, 2) lat, lon
    scale: str


def _trunc_fixed(deg: np.ndarray) -> np.ndarray:
    """Java (int)(deg*1e7): truncate toward zero (Node.java:26-29)."""
    return np.trunc(np.asarray(deg, dtype=np.float64) * 1e7).astype(np.int32)


def _rand_tags(rng: np.random.Generator, n: int) -> list[list[tuple[str, str]]]:
    """Zipf-ish tag dictionary draw; 60% of entities untagged."""
    has = rng.random(n) < 0.4
    n_tags = rng.integers(1, 4, size=n)
    hw = rng.choice(_HIGHWAY_VALUES, size=n, p=_HIGHWAY_P)
    nm = rng.choice(_NAMES, size=n)
    sp = rng.choice(_SPEEDS, size=n)
    am = rng.choice(_AMENITIES, size=n)
    out: list[list[tuple[str, str]]] = []
    for i in range(n):
        if not has[i]:
            out.append([])
            continue
        tags = [("highway", hw[i]), ("name", nm[i]), ("maxspeed", sp[i]), ("amenity", am[i])]
        out.append(tags[: n_tags[i]])
    return out


_EDGE_NODES = [
    # (lat, lon) — tile boundaries, Mercator limits, truncation edge cases
    (0.0, 0.0),
    (0.0, -90.0),
    (85.0511, 179.9999999),
    (-85.0511, -179.9999999),
    (0.00000006, -0.00000006),  # trunc→0 both, floor would give -1 on lon
    (-0.00000006, 0.00000006),
    (47.6062095, -122.3320708),
    (-33.8688197, 151.2092955),
]

_EDGE_TAGS = [
    [("note", "")],  # empty value (Tag ctor null→'', OSMEntity.java:20-23)
    [("k", "a"), ("k", "b")],  # duplicate keys, order-significant
    [("名前", "駅前通り")],  # non-ASCII UTF-8
    [("name", "Main St East"), ("ref", "I=5")],  # spaces + '=' in value
    [("b", "1"), ("a", "2")],  # order-significant pair
]


def generate_world(scale: str) -> World:
    cfg = SCALES[scale]
    rng = np.random.default_rng(SEED + SCALE_OFFSET[scale])
    k = cfg["clusters"]

    centers = np.column_stack(
        [rng.uniform(-60, 60, size=k), rng.uniform(-170, 170, size=k)]
    )

    # --- nodes -----------------------------------------------------------
    n = cfg["nodes"]
    # dense cluster 0 gets 30% (skew fixture); 5% rural uniform
    probs = np.full(k, 0.70 / (k - 1))
    probs[0] = 0.30
    cluster = rng.choice(k, size=n, p=probs)
    rural = rng.random(n) < 0.05
    lat = centers[cluster, 0] + rng.normal(0, 0.09, size=n)
    lon = centers[cluster, 1] + rng.normal(0, 0.09, size=n)
    lat[rural] = rng.uniform(-84.9, 84.9, size=int(rural.sum()))
    lon[rural] = rng.uniform(-179.9, 179.9, size=int(rural.sum()))
    lat = np.clip(lat, -85.05, 85.05)
    lon = np.clip(lon, -179.9999999, 179.9999999)
    cluster[rural] = -1

    ids = np.arange(1, n + 1, dtype=np.int64)
    n_high = max(1, n // 100)
    ids[-n_high:] = HIGH_NODE_ID_BASE + np.arange(n_high, dtype=np.int64)

    tags = _rand_tags(rng, n)
    # splice edge cases over the first few node slots (deterministic)
    for i, (elat, elon) in enumerate(_EDGE_NODES):
        lat[i], lon[i] = elat, elon
        cluster[i] = -1
    for i, etags in enumerate(_EDGE_TAGS):
        tags[len(_EDGE_NODES) + i] = etags

    nodes = pd.DataFrame(
        {
            "id": ids,
            "fixed_lat": _trunc_fixed(lat),
            "fixed_lon": _trunc_fixed(lon),
            "tags": tags,
        }
    )

    # --- ways ------------------------------------------------------------
    w = cfg["ways"]
    cluster_nodes = {c: ids[cluster == c] for c in range(k)}
    way_cluster = rng.choice(k, size=w, p=probs)
    lengths = rng.integers(2, 31, size=w)
    way_tags = _rand_tags(rng, w)
    is_building = rng.random(w) < 0.15
    closed = rng.random(w) < 0.02
    share_endpoint = rng.random(w) < 0.10
    orphan = rng.random(w) < 0.01

    way_ids = WAY_ID_BASE + np.arange(1, w + 1, dtype=np.int64)
    refs_list: list[np.ndarray] = []
    prev_last: dict[int, int] = {}
    orphan_seq = 0
    for i in range(w):
        pool = cluster_nodes[way_cluster[i]]
        ln = min(lengths[i], len(pool))
        start = int(rng.integers(0, max(1, len(pool) - ln)))
        refs = pool[start : start + ln].astype(np.int64).copy()
        if share_endpoint[i] and way_cluster[i] in prev_last:
            refs[0] = prev_last[way_cluster[i]]
        if closed[i] and len(refs) >= 3:
            refs = np.append(refs, refs[0])
        if orphan[i] and len(refs) >= 2:
            orphan_seq += 1
            refs[int(rng.integers(1, len(refs)))] = ORPHAN_ID_BASE + orphan_seq
        prev_last[way_cluster[i]] = int(refs[-1])
        refs_list.append(refs)
        if is_building[i]:
            way_tags[i] = [("building", "yes")] + way_tags[i]
    # 3 designated ways with an ORPHAN FIRST node → excluded from way_tiles
    # (OSM.java:316-319 silently skips unresolvable first nodes)
    for j in range(3):
        refs_list[j] = refs_list[j].copy()
        refs_list[j][0] = ORPHAN_ID_BASE + 900 + j

    ways = pd.DataFrame(
        {"id": way_ids, "node_ids": [r.tolist() for r in refs_list], "tags": way_tags}
    )

    # --- relations ---------------------------------------------------------
    r = cfg["relations"]
    rel_ids = REL_ID_BASE + np.arange(1, r + 1, dtype=np.int64)
    members_list: list[list[tuple[str, int, str]]] = []
    rel_tags = _rand_tags(rng, r)
    roles = ["", "outer", "inner", "stop"]
    for i in range(r):
        kind = rng.random()
        members: list[tuple[str, int, str]] = []
        n_m = int(rng.integers(2, 11))
        if kind < 0.70:  # ways only
            for mid in rng.choice(way_ids, size=n_m, replace=False):
                members.append(("WAY", int(mid), roles[int(rng.integers(0, 4))]))
        elif kind < 0.90:  # mixed node+way
            for mid in rng.choice(way_ids, size=max(1, n_m // 2), replace=False):
                members.append(("WAY", int(mid), ""))
            for mid in rng.choice(ids, size=max(1, n_m // 2), replace=False):
                members.append(("NODE", int(mid), ""))
        else:  # references an earlier relation (closure fixture)
            target = rel_ids[int(rng.integers(0, max(1, i)))] if i else rel_ids[0]
            members.append(("RELATION", int(target), ""))
            for mid in rng.choice(way_ids, size=max(1, n_m - 1), replace=False):
                members.append(("WAY", int(mid), ""))
        members_list.append(members)
    if r >= 6:
        # 3-deep chain: r-1 contains r-2 contains r-3
        members_list[r - 1] = [("RELATION", int(rel_ids[r - 2]), "")]
        members_list[r - 2] = [("RELATION", int(rel_ids[r - 3]), "")]
        members_list[r - 3] = [("WAY", int(way_ids[0]), "chain")]
        # 2-cycle: r-4 <-> r-5 (closure must terminate)
        members_list[r - 4] = [("RELATION", int(rel_ids[r - 5]), "")]
        members_list[r - 5] = [("RELATION", int(rel_ids[r - 4]), ""), ("WAY", int(way_ids[1]), "")]
        # nonexistent way member
        members_list[0] = members_list[0] + [("WAY", int(ORPHAN_ID_BASE + 500_000), "")]
        # multipolygon with hole (pip fixture): outer = way 2, inner = way 3
        rel_tags[1] = [("type", "multipolygon")]
        members_list[1] = [("WAY", int(way_ids[2]), "outer"), ("WAY", int(way_ids[3]), "inner")]

    relations = pd.DataFrame({"id": rel_ids, "members": members_list, "tags": rel_tags})
    return World(nodes, ways, relations, centers, scale)


# ---------------------------------------------------------------------------
# Entity → span text (the generator-side codec; ground truth by construction)
# ---------------------------------------------------------------------------


def node_text(row) -> str:
    base = f"{row.id} {row.fixed_lat} {row.fixed_lon}"
    ts = oracle.render_tags_str(row.tags)
    return f"{base} {ts}" if ts else base


def way_text(row) -> str:
    refs = ",".join(str(int(x)) for x in row.node_ids)
    base = f"{row.id} {refs}"
    ts = oracle.render_tags_str(row.tags)
    return f"{base} {ts}" if ts else base


def relation_text(row) -> str:
    mem = "|".join(f"{t}:{m}:{role}" for t, m, role in row.members)
    base = f"{row.id} {mem}"
    ts = oracle.render_tags_str(row.tags)
    return f"{base} {ts}" if ts else base


def build_docs(world: World) -> pa.Table:
    """Interleave entity/text/media spans into docs (input_hint shape)."""
    cfg = SCALES[world.scale]
    rng = np.random.default_rng(SEED + 100 + SCALE_OFFSET[world.scale])
    d = cfg["docs"]

    span_rows: list[tuple[int, str, str, str]] = []  # (doc_idx, kind, text, media_ref)
    for df, kind, render in (
        (world.nodes, "node", node_text),
        (world.ways, "way", way_text),
        (world.relations, "relation", relation_text),
    ):
        docs_idx = rng.integers(0, d, size=len(df))
        for i, row in enumerate(df.itertuples(index=False)):
            span_rows.append((int(docs_idx[i]), kind, render(row), ""))

    # one text span per doc (so no doc is empty) + extra prose + media
    for doc_idx in range(d):
        n_words = int(rng.integers(3, 12))
        prose = " ".join(rng.choice(_WORDS, size=n_words))
        span_rows.append((doc_idx, "text", prose, ""))
    n_media = d // 2
    media_docs = rng.integers(0, d, size=n_media)
    for j in range(n_media):
        # 2:1:1 image:audio:video mix so the media operators' container
        # sniffing and all three real codecs (PNG + WAV + APNG) are
        # exercised
        kind = "audio" if j % 4 == 3 else ("vid" if j % 4 == 2 else "img")
        span_rows.append((int(media_docs[j]), "media", "", f"media://{kind}/{j}"))

    spans = pd.DataFrame(span_rows, columns=["doc_idx", "kind", "text", "media_ref"])
    spans["shuffle_key"] = rng.random(len(spans))
    spans = spans.sort_values(["doc_idx", "shuffle_key"], kind="stable").reset_index(drop=True)
    # offsets: start char position of each span within its doc (strictly
    # increasing — the O4 span-order invariant key). Vectorized: global
    # cumsum of lengths minus each group's first start.
    lens = spans["text"].str.len().to_numpy() + 1
    starts = lens.cumsum() - lens
    group_base = pd.Series(starts).groupby(spans["doc_idx"]).transform("first").to_numpy()
    spans["offset"] = (starts - group_base).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(spans["kind"], type=pa.string()),
            pa.array(spans["text"], type=pa.string()),
            pa.array(spans["media_ref"], type=pa.string()),
            pa.array(spans["offset"], type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    # list boundaries per doc (spans are sorted by doc_idx)
    counts = spans.groupby("doc_idx", sort=True).size().to_numpy()
    offsets = np.concatenate([[0], counts.cumsum()]).astype(np.int32)
    uniq_docs = np.sort(spans["doc_idx"].unique())
    list_arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    doc_id_arr = pa.array([f"doc-{i:08d}" for i in uniq_docs], type=pa.string())
    return pa.table({"doc_id": doc_id_arr, "spans": list_arr})


# ---------------------------------------------------------------------------
# Fixture writer: docs + golden oracle outputs + meta
# ---------------------------------------------------------------------------


def _fixed_bboxes(world: World) -> dict[str, list[float]]:
    dense_lat, dense_lon = world.centers[0]
    other_lat, other_lon = world.centers[1 % len(world.centers)]
    return {
        "dense": [dense_lat - 0.15, dense_lon - 0.15, dense_lat + 0.15, dense_lon + 0.15],
        "wide": [
            min(dense_lat, other_lat) - 1.0,
            min(dense_lon, other_lon) - 1.0,
            max(dense_lat, other_lat) + 1.0,
            max(dense_lon, other_lon) + 1.0,
        ],
        "world": [-85.0, -180.0, 85.0, 179.9999999],
        "empty": [79.0, 170.0, 79.01, 170.01],
        "equator": [-2.0, dense_lon - 2.0, 2.0, dense_lon + 2.0],
    }


def _knn_points(world: World) -> list[tuple[int, float, float]]:
    c0 = world.centers[0]
    c1 = world.centers[1 % len(world.centers)]
    return [
        (1, float(c0[0]), float(c0[1])),  # dense cluster center
        (2, float(c1[0]), float(c1[1])),
        (3, 0.0, -140.0),  # open ocean
        (4, 80.0, 10.0),  # near-polar
        (5, 0.0, 0.0),
    ]


def _polygons(world: World) -> dict[int, list[list[list[float]]]]:
    """(lat, lon) rings: 1=convex box, 2=concave L-shape, 3=box with hole."""
    clat, clon = (float(x) for x in world.centers[0])
    s = 0.12
    convex = [[clat - s, clon - s], [clat - s, clon + s], [clat + s, clon + s], [clat + s, clon - s]]
    concave = [
        [clat - s, clon - s],
        [clat - s, clon + s],
        [clat, clon + s],
        [clat, clon],
        [clat + s, clon],
        [clat + s, clon - s],
    ]
    outer = [[clat - s, clon - s], [clat - s, clon + s], [clat + s, clon + s], [clat + s, clon - s]]
    hole = [
        [clat - s / 3, clon - s / 3],
        [clat - s / 3, clon + s / 3],
        [clat + s / 3, clon + s / 3],
        [clat + s / 3, clon - s / 3],
    ]
    return {1: [convex], 2: [concave], 3: [outer, hole]}


def write_fixture(scale: str, out_dir: str, light: bool = False) -> None:
    """``light=True`` writes docs.parquet + meta.json only — for the
    sf-l scaling fixture, which is a throughput measurement input, not
    a correctness oracle (golden recomputation at 10M nodes is pure
    generation cost with no consumer)."""
    world = generate_world(scale)
    os.makedirs(os.path.join(out_dir, "golden"), exist_ok=True)

    docs = build_docs(world)
    # small row groups: Spark parallelizes a parquet scan at row-group
    # granularity — one giant row group would serialize every scan
    pq.write_table(docs, os.path.join(out_dir, "docs.parquet"), row_group_size=10_000)

    if light:
        meta = {
            "scale": scale,
            "seed": SEED,
            "bboxes": _fixed_bboxes(world),
            "knn_points": _knn_points(world),
            "polygons": _polygons(world),
            "counts": {
                "nodes": len(world.nodes),
                "ways": len(world.ways),
                "relations": len(world.relations),
            },
        }
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        return

    g = os.path.join(out_dir, "golden")

    nodes_g = world.nodes.copy()
    nodes_g["tags_str"] = nodes_g["tags"].map(oracle.render_tags_str)
    nodes_g.drop(columns=["tags"]).astype(
        {"id": "int64", "fixed_lat": "int32", "fixed_lon": "int32"}
    ).to_parquet(os.path.join(g, "nodes.parquet"), index=False)

    ways_g = world.ways.copy()
    ways_g["tags_str"] = ways_g["tags"].map(oracle.render_tags_str)
    ways_g["node_ids_str"] = ways_g["node_ids"].map(
        lambda r: ",".join(str(int(x)) for x in r)
    )
    ways_g["first_node"] = ways_g["node_ids"].map(lambda r: int(r[0]))
    ways_g["n_nodes"] = ways_g["node_ids"].map(len).astype("int32")
    ways_g["is_building"] = world.ways["tags"].map(oracle._is_building)
    ways_g[["id", "node_ids", "node_ids_str", "first_node", "n_nodes", "is_building", "tags_str"]].to_parquet(
        os.path.join(g, "ways.parquet"), index=False
    )

    rels_g = world.relations.copy()
    rels_g["tags_str"] = rels_g["tags"].map(oracle.render_tags_str)
    rels_g["members_str"] = rels_g["members"].map(
        lambda ms: "|".join(f"{t}:{m}:{role}" for t, m, role in ms)
    )
    rels_g["n_members"] = rels_g["members"].map(len).astype("int32")
    rels_g[["id", "members_str", "n_members", "tags_str"]].to_parquet(
        os.path.join(g, "relations.parquet"), index=False
    )

    oracle.oracle_way_tiles(world.ways, world.nodes).to_parquet(
        os.path.join(g, "way_tiles.parquet"), index=False
    )
    oracle.oracle_intersections(world.ways).to_parquet(
        os.path.join(g, "intersections.parquet"), index=False
    )
    for key, df in oracle.oracle_rel_members(world.relations).items():
        df.to_parquet(os.path.join(g, f"rel_members_by_{key}.parquet"), index=False)

    bboxes = _fixed_bboxes(world)
    for name, bbox in bboxes.items():
        oracle.oracle_bbox_extract(
            tuple(bbox), world.nodes, world.ways, world.relations
        ).to_parquet(os.path.join(g, f"extract_{name}.parquet"), index=False)

    knn_points = _knn_points(world)
    oracle.oracle_knn(world.nodes, knn_points, k=10).to_parquet(
        os.path.join(g, "knn.parquet"), index=False
    )
    polys = _polygons(world)
    oracle.oracle_pip(
        world.nodes, {pid: [np.array(r) for r in rings] for pid, rings in polys.items()}
    ).to_parquet(os.path.join(g, "pip.parquet"), index=False)

    # golden for the bucketed (many-polygon) PIP scale path: the same
    # deterministic grid polygon set the gate query builds
    from osm_lib_spark.operators.pip import grid_polygons

    pip_centers = [
        (float(world.centers[0][0]), float(world.centers[0][1])),
        (float(world.centers[1 % len(world.centers)][0]), float(world.centers[1 % len(world.centers)][1])),
    ]
    oracle.oracle_pip_bboxed(world.nodes, grid_polygons(pip_centers)).to_parquet(
        os.path.join(g, "pip_many.parquet"), index=False
    )

    counts = pd.DataFrame(
        {
            "entity_type": ["node", "way", "relation"],
            "n": [len(world.nodes), len(world.ways), len(world.relations)],
        }
    )
    counts.to_parquet(os.path.join(g, "counts.parquet"), index=False)

    meta = {
        "scale": scale,
        "seed": SEED,
        "bboxes": bboxes,
        "knn_points": knn_points,
        "polygons": polys,
        "counts": {"nodes": len(world.nodes), "ways": len(world.ways), "relations": len(world.relations)},
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures")


def scale_for_sf_dir(sf_dir: str) -> str:
    """Map driver sf dirs to fixture scales (sf0.001→xs, sf0.01→s, sf0.1→m)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "xs", "sf0.01": "s", "sf0.1": "m"}.get(base, "s")


def fixture_dir(scale: str, root: str = FIXTURE_ROOT) -> str:
    return os.path.join(root, f"sf-{scale}")


def ensure_fixture(scale: str, root: str = FIXTURE_ROOT) -> str:
    """Generate the fixture if absent (idempotent; deterministic)."""
    d = fixture_dir(scale, root)
    if not os.path.exists(os.path.join(d, "meta.json")):
        write_fixture(scale, d)
    return d


if __name__ == "__main__":
    import sys

    for sc in sys.argv[1:] or ["xs", "s"]:
        write_fixture(sc, fixture_dir(sc), light=(sc == "l"))
        print("wrote", fixture_dir(sc))
