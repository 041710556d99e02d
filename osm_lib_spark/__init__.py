"""osm_lib_spark — a PySpark-native spatial analytics engine.

A brand-new engine (NOT a port) reproducing the query semantics of
conveyal/osm-lib — bounding-box tile extracts, way→node resolution,
relation closure, intersection detection, format round-trips — as
DataFrame / Catalyst operations over tables of interleaved text+media
documents, plus the large-scale training-data operators (dedup,
similarity search, text analysis) such a corpus engine needs.

Reference semantics are cited per-function as ``file:line`` into the
reference checkout (read-only, at /root/reference).

Layout:
  functions/   scalar/column function library (tags, tiles, geo)
  sources/     span codec (docs <-> entities), synthetic world generator
  operators/   extract, intersections, indexes, knn, pip, dedup, similarity, text
  plans/       lineage / checkpoint-resume layer
  streaming/   incremental change application (OSC-style merge)
"""

__version__ = "0.1.0"
