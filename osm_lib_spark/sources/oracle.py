"""Pure pandas/numpy oracle — an INDEPENDENT implementation of the
reference semantics used to compute golden fixtures and differential-
test the Spark engine (mirrors the reference's own test strategy:
golden counts OSMTest.java:14-17, round-trip RoundTripTest.java:91-107).

Nothing in here touches Spark. The Spark engine implements the same
semantics with DataFrame operators; tests assert equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from osm_lib_spark.functions.geo import np_haversine_m
from osm_lib_spark.functions.tiles import np_tile_x, np_tile_y

FIXED = 1e7


def oracle_way_tiles(ways: pd.DataFrame, nodes: pd.DataFrame) -> pd.DataFrame:
    """First-node z12 tile assignment (OSM.java:311-324).

    Ways whose first node is unknown are silently left out
    (OSM.java:316-319). ways.node_ids is a list column.
    """
    first = ways[["id"]].copy()
    first["first_node"] = ways["node_ids"].map(lambda r: r[0])
    nd = nodes.set_index("id")
    joined = first.join(nd[["fixed_lat", "fixed_lon"]], on="first_node", how="inner")
    lat = joined["fixed_lat"].to_numpy() / FIXED
    lon = joined["fixed_lon"].to_numpy() / FIXED
    out = pd.DataFrame(
        {
            "way_id": joined["id"].to_numpy(),
            "xtile": np_tile_x(lon),
            "ytile": np_tile_y(lat),
        }
    )
    return out.sort_values("way_id").reset_index(drop=True)


def _is_building(tags: list[tuple[str, str]]) -> bool:
    """hasTag('building') — key presence (OSM.java:354, OSMEntity.java:50-52)."""
    return any(k == "building" for k, _ in tags)


def oracle_intersections(ways: pd.DataFrame) -> pd.DataFrame:
    """Nodes referenced ≥2 times by non-building ways (OSM.java:353-362).

    Pure ID counting at ingest — refs to nonexistent nodes still count,
    and a node repeated within one way (closed loop) counts twice.
    """
    keep = ways[~ways["tags"].map(_is_building)]
    refs = np.concatenate(keep["node_ids"].to_list()) if len(keep) else np.array([], dtype=np.int64)
    vals, counts = np.unique(refs, return_counts=True)
    return pd.DataFrame({"node_id": np.sort(vals[counts >= 2])})


def oracle_rel_members(relations: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """The three (member_id, relation_id) secondary indexes (OSM.java:160-167)."""
    rows = {"NODE": [], "WAY": [], "RELATION": []}
    for rid, members in zip(relations["id"], relations["members"]):
        for mtype, mid, _role in members:
            rows[mtype].append((mid, rid))
    out = {}
    for mtype, key in (("NODE", "node"), ("WAY", "way"), ("RELATION", "relation")):
        df = pd.DataFrame(rows[mtype], columns=["member_id", "relation_id"]).astype(
            {"member_id": "int64", "relation_id": "int64"}
        )
        out[key] = df.sort_values(["member_id", "relation_id"]).reset_index(drop=True)
    return out


def oracle_bbox_extract(
    bbox: tuple[float, float, float, float],
    nodes: pd.DataFrame,
    ways: pd.DataFrame,
    relations: pd.DataFrame,
) -> pd.DataFrame:
    """Bbox tile extract with INTENDED reference semantics.

    Pipeline per TileOSMSource.java:49-143 (bbox → tile range with
    y-inversion → ways in range → their nodes → containing relations →
    upward closure), with the documented bug fixes (SURVEY §5.4):
    node→relation lookup keyed by nodeId (not wayId), relations emitted
    once, closure frontier tested on the discovered id.

    Returns DataFrame(entity_type ∈ {node,way,relation}, id), where the
    node set is every RESOLVABLE node referenced by an in-range way
    (nodes outside the bbox included — the reference never filters
    nodes by coordinate), and ways keep orphan refs (the way itself is
    still emitted, TileOSMSource.java:96-97).
    """
    min_lat, min_lon, max_lat, max_lon = bbox
    min_x = int(np_tile_x(np.array([min_lon]))[0])
    max_x = int(np_tile_x(np.array([max_lon]))[0])
    min_y = int(np_tile_y(np.array([max_lat]))[0])  # y-inversion
    max_y = int(np_tile_y(np.array([min_lat]))[0])

    wt = oracle_way_tiles(ways, nodes)
    in_range = wt[
        (wt["xtile"] >= min_x)
        & (wt["xtile"] <= max_x)
        & (wt["ytile"] >= min_y)
        & (wt["ytile"] <= max_y)
    ]
    way_ids = set(in_range["way_id"].tolist())

    known_nodes = set(nodes["id"].tolist())
    node_ids: set[int] = set()
    for refs in ways.loc[ways["id"].isin(way_ids), "node_ids"]:
        node_ids.update(r for r in refs if r in known_nodes)

    idx = oracle_rel_members(relations)
    by_node = idx["node"]
    by_way = idx["way"]
    by_rel = idx["relation"]
    rel_ids = set(
        by_node.loc[by_node["member_id"].isin(node_ids), "relation_id"].tolist()
    ) | set(by_way.loc[by_way["member_id"].isin(way_ids), "relation_id"].tolist())
    # Upward closure: add relations that reference already-seen relations
    # until fixpoint (TileOSMSource.java:112-132, set-based so cycle-safe).
    while True:
        parents = set(
            by_rel.loc[by_rel["member_id"].isin(rel_ids), "relation_id"].tolist()
        )
        new = parents - rel_ids
        if not new:
            break
        rel_ids |= new

    frames = [
        pd.DataFrame({"entity_type": "node", "id": sorted(node_ids)}),
        pd.DataFrame({"entity_type": "way", "id": sorted(way_ids)}),
        pd.DataFrame({"entity_type": "relation", "id": sorted(rel_ids)}),
    ]
    out = pd.concat(frames, ignore_index=True)
    out["id"] = out["id"].astype("int64")
    return out


def oracle_knn(
    nodes: pd.DataFrame, query_points: list[tuple[int, float, float]], k: int = 10
) -> pd.DataFrame:
    """Exact k-nearest nodes by haversine, ties broken by node id."""
    lat = nodes["fixed_lat"].to_numpy() / FIXED
    lon = nodes["fixed_lon"].to_numpy() / FIXED
    ids = nodes["id"].to_numpy()
    rows = []
    for qid, qlat, qlon in query_points:
        d = np_haversine_m(np.full_like(lat, qlat), np.full_like(lon, qlon), lat, lon)
        order = np.lexsort((ids, d))[:k]
        for rank, i in enumerate(order, start=1):
            rows.append((qid, rank, int(ids[i])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "node_id"]).astype(
        {"query_id": "int64", "rank": "int32", "node_id": "int64"}
    )


def ray_cast_contains(
    poly: np.ndarray, lat: np.ndarray, lon: np.ndarray
) -> np.ndarray:
    """Even-odd ray casting, vectorized over points.

    ``poly`` is (V, 2) array of (lat, lon) ring vertices (closed
    implicitly). Points on an edge follow the even-odd convention
    (documented; FIXTURES.md §4.8). Shared by oracle and engine kernel —
    unit-tested separately against hand-computed cases.
    """
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(x.shape, dtype=bool)
    v = np.asarray(poly, dtype=np.float64)
    n = len(v)
    for i in range(n):
        y1, x1 = v[i]
        y2, x2 = v[(i + 1) % n]
        crosses = (y1 > y) != (y2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        inside ^= crosses & (x < xi)
    return inside


def oracle_pip(
    nodes: pd.DataFrame, polygons: dict[int, list[np.ndarray]]
) -> pd.DataFrame:
    """Point-in-polygon with holes: inside outer ring XOR inside any hole.

    ``polygons`` maps poly_id → [outer_ring, hole_ring, ...], each a
    (V, 2) (lat, lon) array. Even-odd across all rings (multipolygon
    convention for the relation-with-hole fixture).
    """
    lat = nodes["fixed_lat"].to_numpy() / FIXED
    lon = nodes["fixed_lon"].to_numpy() / FIXED
    ids = nodes["id"].to_numpy()
    rows = []
    for pid, rings in polygons.items():
        inside = np.zeros(len(ids), dtype=bool)
        for ring in rings:
            inside ^= ray_cast_contains(ring, lat, lon)
        for nid in np.sort(ids[inside]):
            rows.append((pid, int(nid)))
    return pd.DataFrame(rows, columns=["poly_id", "node_id"]).astype(
        {"poly_id": "int64", "node_id": "int64"}
    )


def oracle_pip_bboxed(
    nodes: pd.DataFrame, polygons: dict[int, list[np.ndarray]]
) -> pd.DataFrame:
    """``oracle_pip`` with an exact per-polygon bbox prefilter — same
    result (a point outside the union bbox of a polygon's rings cannot
    be inside under even-odd), O(N) bbox masks instead of O(N·V) ray
    casts per polygon. Used for LARGE golden polygon sets (pip_many)."""
    lat = nodes["fixed_lat"].to_numpy() / FIXED
    lon = nodes["fixed_lon"].to_numpy() / FIXED
    ids = nodes["id"].to_numpy()
    rows = []
    for pid, rings in polygons.items():
        allv = np.concatenate([np.asarray(r, dtype=np.float64) for r in rings])
        mask = (
            (lat >= allv[:, 0].min())
            & (lat <= allv[:, 0].max())
            & (lon >= allv[:, 1].min())
            & (lon <= allv[:, 1].max())
        )
        idx = np.nonzero(mask)[0]
        if not len(idx):
            continue
        inside = np.zeros(len(idx), dtype=bool)
        for ring in rings:
            inside ^= ray_cast_contains(
                np.asarray(ring, dtype=np.float64), lat[idx], lon[idx]
            )
        for nid in np.sort(ids[idx[inside]]):
            rows.append((pid, int(nid)))
    return pd.DataFrame(rows, columns=["poly_id", "node_id"]).astype(
        {"poly_id": "int64", "node_id": "int64"}
    )


def render_tags_str(tags: list[tuple[str, str]]) -> str:
    """Canonical 'k=v;k=v;' rendering ('' if no tags) — TextOutput.java:24-34."""
    if not tags:
        return ""
    return ";".join(f"{k}={v}" for k, v in tags) + ";"
