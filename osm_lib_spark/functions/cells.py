"""S2-style hierarchical cell IDs over the Web-Mercator tile grid.

The north star calls for an "H3/S2 cell key" index. The engine's base
grid is the reference-parity z12 WebMercator tiling (functions/tiles);
this module adds the S2-like HIERARCHY on top: a single int64 cell id
that encodes (zoom, xtile, ytile) with parent/child/ancestor algebra as
pure bit-op Column expressions, so multi-resolution spatial joins
(coarse-cell blocking → fine-cell refinement) are plain equi-joins.

Layout (int64, always positive):
    cell_id = (zoom << 58) | (x << 29) | y      zoom ∈ [0, 29], x/y < 2^29

Algebra (all codegen Column exprs):
    parent(c)      = zoom-1, x>>1, y>>1
    ancestor(c, z) = zoom z, x >> (zoom-z), y >> (zoom-z)
    is_ancestor(a, c) ⇔ ancestor(c, zoom(a)) == a

This is the "coarse join key" machinery: block a join on ancestor
cells at a low zoom (few, broadcastable), refine within blocks at high
zoom — the hex-grid H3 equivalent on a quad grid, with exact
parent/child nesting (which hexagons do not have).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from osm_lib_spark.functions.tiles import tile_x_col, tile_y_col

# x/y occupy 29 bits, so zoom-29 tile coords (< 2^29) are the deepest
# that fit without overflowing into the zoom field; cell_ancestor's
# exact-division trick also requires dz <= 29.
MAX_ZOOM = 29
_ZSHIFT = 58
_XSHIFT = 29


def cell_at(lat: Column, lon: Column, zoom: int) -> Column:
    """(lat, lon) → cell id at ``zoom`` (int64 Column)."""
    if not 0 <= zoom <= MAX_ZOOM:
        raise ValueError(f"zoom must be in [0, {MAX_ZOOM}], got {zoom}")
    x = tile_x_col(lon, zoom).cast("long")
    y = tile_y_col(lat, zoom).cast("long")
    return (
        F.shiftleft(F.lit(zoom).cast("long"), _ZSHIFT)
        .bitwiseOR(F.shiftleft(x, _XSHIFT))
        .bitwiseOR(y)
    )


def cell_zoom(cell: Column) -> Column:
    return F.shiftright(cell, _ZSHIFT).cast("int")


def cell_x(cell: Column) -> Column:
    return F.shiftright(cell, _XSHIFT).bitwiseAND(F.lit((1 << _XSHIFT) - 1)).cast("int")


def cell_y(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit((1 << _XSHIFT) - 1)).cast("int")


def cell_ancestor(cell: Column, zoom: int) -> Column:
    """Ancestor of ``cell`` at (coarser) ``zoom``; cells must be deeper."""
    dz = cell_zoom(cell) - F.lit(zoom)
    x = cell_x(cell).cast("long")
    y = cell_y(cell).cast("long")
    # shiftright needs a literal shift → emulate v >> dz as v / 2^dz:
    # dz ≤ 30 so 2^dz is exact in double and the truncating cast gives
    # exact integer division for non-negative v
    denom = F.pow(F.lit(2.0), dz).cast("long")
    ax = (x / denom).cast("long")
    ay = (y / denom).cast("long")
    return (
        F.shiftleft(F.lit(zoom).cast("long"), _ZSHIFT)
        .bitwiseOR(F.shiftleft(ax, _XSHIFT))
        .bitwiseOR(ay)
    )


def cell_parent(cell: Column) -> Column:
    """Immediate parent (one zoom coarser) — pure bit ops."""
    z = cell_zoom(cell).cast("long")
    x = F.shiftright(cell_x(cell).cast("long"), 1)
    y = F.shiftright(cell_y(cell).cast("long"), 1)
    return (
        F.shiftleft(z - 1, _ZSHIFT).bitwiseOR(F.shiftleft(x, _XSHIFT)).bitwiseOR(y)
    )


def cell_children(cell: Column) -> Column:
    """Array of the 4 child cells (one zoom finer)."""
    z = cell_zoom(cell).cast("long") + 1
    x = F.shiftleft(cell_x(cell).cast("long"), 1)
    y = F.shiftleft(cell_y(cell).cast("long"), 1)

    def child(dx, dy):
        return (
            F.shiftleft(z, _ZSHIFT)
            .bitwiseOR(F.shiftleft(x + dx, _XSHIFT))
            .bitwiseOR(y + dy)
        )

    return F.array(child(0, 0), child(0, 1), child(1, 0), child(1, 1))


def is_ancestor(ancestor: Column, cell: Column) -> Column:
    """True iff ``ancestor`` contains ``cell`` (strict or equal)."""
    za = cell_zoom(ancestor)
    zc = cell_zoom(cell)
    dz = (zc - za).cast("long")
    denom = F.pow(F.lit(2.0), dz).cast("long")
    same_x = (cell_x(cell).cast("long") / denom).cast("long") == cell_x(ancestor).cast("long")
    same_y = (cell_y(cell).cast("long") / denom).cast("long") == cell_y(ancestor).cast("long")
    return (za <= zc) & same_x & same_y
