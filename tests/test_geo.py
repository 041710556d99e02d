"""kNN + point-in-polygon tests (vs golden oracle and hand-computed)."""

import json
import os

import numpy as np
import pytest

from osm_lib_spark.operators.knn import knn_brute_force, knn_kring
from osm_lib_spark.operators.pip import points_in_polygons
from osm_lib_spark.sources.oracle import ray_cast_contains
from osm_lib_spark.sources.span_codec import parse_nodes
from tests.conftest import assert_df_equal, golden


@pytest.fixture(scope="module")
def meta_xs(fixture_xs):
    with open(os.path.join(fixture_xs, "meta.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def nodes_xs(docs_xs):
    return parse_nodes(docs_xs).cache()


def test_ray_cast_hand_computed():
    square = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
    lat = np.array([5.0, 5.0, 15.0, -1.0, 9.999])
    lon = np.array([5.0, 10.5, 5.0, 5.0, 9.999])
    np.testing.assert_array_equal(
        ray_cast_contains(square, lat, lon), [True, False, False, False, True]
    )
    # concave: L-shape — the notch is outside
    lshape = np.array([[0, 0], [0, 10], [5, 10], [5, 5], [10, 5], [10, 0]], dtype=float)
    lat = np.array([2.0, 7.0, 7.0])
    lon = np.array([2.0, 2.0, 7.0])
    np.testing.assert_array_equal(ray_cast_contains(lshape, lat, lon), [True, True, False])


def test_knn_brute_force_vs_golden(nodes_xs, fixture_xs, meta_xs):
    pts = [tuple(p) for p in meta_xs["knn_points"]]
    got = knn_brute_force(nodes_xs, pts, k=10)
    assert_df_equal(got, golden(fixture_xs, "knn"), sort_cols=["query_id", "rank"])


def test_knn_kring_matches_brute_force(nodes_xs, meta_xs):
    # ALL query points — includes the near-polar and open-ocean ones
    # whose ring bound degrades to 0 (conservative full expansion)
    pts = [tuple(p) for p in meta_xs["knn_points"]]
    brute = (
        knn_brute_force(nodes_xs, pts, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ring = (
        knn_kring(nodes_xs, pts, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(brute, ring, check_dtype=False)


def test_pip_vs_golden(nodes_xs, fixture_xs, meta_xs):
    polys = {
        int(pid): [np.array(r, dtype=np.float64) for r in rings]
        for pid, rings in meta_xs["polygons"].items()
    }
    got = points_in_polygons(nodes_xs, polys)
    assert_df_equal(got, golden(fixture_xs, "pip"), sort_cols=["poly_id", "node_id"])
