"""Headless graphics sink (reference K5 analog).

The reference's GraphicsSink draws each node as a point on a Swing
canvas for debugging (display/GraphicsSink.java:36-44 — lon/lat mapped
straight to the viewport; ways are ignored). The headless Spark analog
renders a node-density image: a distributed pixel aggregation (the
same shape as ``operators/raster``) followed by a bounded collect of
at most width×height pixel rows, written as a binary PGM (P5) with
pure numpy — no imaging libraries needed.

Scale shape: the groupBy reduces the corpus to ≤ width·height rows
regardless of input size; only the image crosses to the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.geo import from_fixed


def node_density_pixels(
    nodes: DataFrame, width: int = 512, height: int = 256
) -> DataFrame:
    """(px, py, n) — equirectangular projection of node coordinates
    onto a width×height viewport (lon → x, lat → y, y inverted like a
    screen), counted per pixel. Pure Column expressions."""
    lat = from_fixed(F.col("fixed_lat"))
    lon = from_fixed(F.col("fixed_lon"))
    px = F.least(
        F.greatest(
            F.floor((lon + 180.0) / 360.0 * width).cast("int"), F.lit(0)
        ),
        F.lit(width - 1),
    )
    py = F.least(
        F.greatest(
            F.floor((90.0 - lat) / 180.0 * height).cast("int"), F.lit(0)
        ),
        F.lit(height - 1),
    )
    return (
        nodes.select(px.alias("px"), py.alias("py"))
        .groupBy("px", "py")
        .agg(F.count("*").alias("n"))
    )


def render_density_pgm(
    nodes: DataFrame, path: str, width: int = 512, height: int = 256
) -> np.ndarray:
    """Render nodes to a binary PGM (P5) density image; returns the
    pixel array. Intensity is log-scaled to 0..255 (dense urban pixels
    would otherwise clip everything else to black)."""
    rows = node_density_pixels(nodes, width, height).collect()
    img = np.zeros((height, width), dtype=np.float64)
    for r in rows:
        img[r.py, r.px] = r.n
    with np.errstate(divide="ignore"):
        scaled = np.where(img > 0, np.log1p(img), 0.0)
    mx = scaled.max()
    pix = (
        (scaled / mx * 255.0).astype(np.uint8)
        if mx > 0
        else np.zeros_like(scaled, dtype=np.uint8)
    )
    with open(path, "wb") as f:
        f.write(f"P5\n{width} {height}\n255\n".encode("ascii"))
        f.write(pix.tobytes())
    return pix


def read_pgm(path: str) -> np.ndarray:
    """Decode the P5 PGM written above (test helper)."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"P5":
            raise ValueError("not a binary PGM")
        dims = f.readline().split()
        width, height = int(dims[0]), int(dims[1])
        maxval = int(f.readline())
        if maxval != 255:
            raise ValueError("only 8-bit PGM supported")
        data = np.frombuffer(f.read(width * height), dtype=np.uint8)
    return data.reshape(height, width)
