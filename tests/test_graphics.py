"""Headless graphics sink (K5 analog): density render → PGM roundtrip,
cluster visibility, bounded output."""

import os

import numpy as np

from osm_lib_spark.operators.graphics import (
    node_density_pixels,
    read_pgm,
    render_density_pgm,
)
from osm_lib_spark.sources.span_codec import parse_nodes


def test_density_render_pgm_roundtrip(spark, docs_xs, tmp_path, fixture_xs):
    import json

    nodes = parse_nodes(docs_xs)
    width, height = 256, 128
    out = os.path.join(tmp_path, "world.pgm")
    pix = render_density_pgm(nodes, out, width, height)
    back = read_pgm(out)
    np.testing.assert_array_equal(pix, back)
    assert back.shape == (height, width)
    assert back.max() == 255  # densest pixel saturates the scale

    # pixel aggregation is bounded by the viewport, not the corpus
    assert node_density_pixels(nodes, width, height).count() <= width * height

    # the fixture's dense cluster must light up its pixel
    with open(os.path.join(fixture_xs, "meta.json")) as f:
        meta = json.load(f)
    b = meta["bboxes"]["dense"]
    clat, clon = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
    px = min(max(int((clon + 180.0) / 360.0 * width), 0), width - 1)
    py = min(max(int((90.0 - clat) / 180.0 * height), 0), height - 1)
    region = back[max(py - 1, 0) : py + 2, max(px - 1, 0) : px + 2]
    assert region.max() > 0
