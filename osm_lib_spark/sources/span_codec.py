"""Span codec: interleaved documents ⇄ OSM-style entity DataFrames.

Input table shape (driver input_hint):
    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

Geometry-bearing spans carry entities in a text form derived from the
reference's own text codec (TextOutput.java:47-78) and tag-string
format (setTagsFromString, OSMEntity.java:73-82):

    kind='node'      text = "<id> <fixedLat> <fixedLon> [k=v;k=v;]"
    kind='way'       text = "<id> <ref,ref,...> [k=v;]"
    kind='relation'  text = "<id> <TYPE:mid:role|TYPE:mid:role> [k=v;]"
    kind='text'      free prose (opaque)
    kind='media'     text='', media_ref="media://..."

The per-document span sequence (kind, text, media_ref, offset-order) is
the engine-wide invariant: ``reassemble_docs(parse(docs)) == docs``
span-for-span (analog of the reference round-trip contract,
RoundTripTest.java:91-107).

Everything here is Column-expression only — parsing runs JVM-side in
whole-stage codegen; at 100 TB the scan + parse is the dominant cost
and must not cross into Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.tags import parse_tags, render_tags

ENTITY_KINDS = ("node", "way", "relation")

DOCS_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def explode_spans(docs: DataFrame) -> DataFrame:
    """docs → one row per span with its position rank.

    posexplode preserves the array order as an explicit column so the
    sequence survives any later shuffle (ordered-array discipline —
    never rely on implicit row order).
    """
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_pos", "span")
    ).select(
        "doc_id",
        "span_pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def spans_of_kind(docs: DataFrame, kind: str) -> DataFrame:
    """One-kind span rows, filtering the spans ARRAY before exploding.

    ``explode(filter(spans, ...))`` generates only the matching rows —
    explode-then-filter materialized a row for EVERY span per parse
    pass (3 passes × all spans for the entity parses). No ``span_pos``
    column: positions would index the filtered array, so consumers that
    need original order (reassemble_docs) must use ``explode_spans``.
    """
    return docs.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] == F.lit(kind))).alias("span"),
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def parse_nodes(docs: DataFrame) -> DataFrame:
    """Extract nodes(id, fixed_lat, fixed_lon, tags) from node spans.

    Node text = "<id> <fixedLat> <fixedLon> [tags]" — split with limit 4
    so tag values may contain spaces (reference tag values are free-form
    UTF-8, OSMEntity.java:20-23).
    """
    return _parse_node_rows(spans_of_kind(docs, "node"))


def parse_ways(docs: DataFrame) -> DataFrame:
    """Extract ways(id, node_ids, tags) from way spans."""
    return _parse_way_rows(spans_of_kind(docs, "way"))


def parse_relations(docs: DataFrame) -> DataFrame:
    """Extract relations(id, members, tags) from relation spans.

    Member text = "TYPE:mid:role|..." with TYPE ∈ {NODE,WAY,RELATION}
    (reference Relation.Member, Relation.java:13-44); role may be ''.
    """
    return _parse_relation_rows(spans_of_kind(docs, "relation"))


# ---------------------------------------------------------------------------
# Inverse codec: entities → span text (TextOutput analog, TextOutput.java:47-83)
# ---------------------------------------------------------------------------


def render_node_text(df: DataFrame) -> DataFrame:
    """nodes → (id, text) in the codec's node format."""
    return df.select(
        "id",
        F.concat_ws(
            " ",
            F.col("id").cast("string"),
            F.col("fixed_lat").cast("string"),
            F.col("fixed_lon").cast("string"),
            render_tags(F.col("tags")),
        ).alias("text"),
    ).withColumn("text", F.rtrim("text"))


def render_way_text(df: DataFrame) -> DataFrame:
    return df.select(
        "id",
        F.concat_ws(
            " ",
            F.col("id").cast("string"),
            F.array_join(
                F.transform(F.col("node_ids"), lambda r: r.cast("string")), ","
            ),
            render_tags(F.col("tags")),
        ).alias("text"),
    ).withColumn("text", F.rtrim("text"))


def render_relation_text(df: DataFrame) -> DataFrame:
    return df.select(
        "id",
        F.concat_ws(
            " ",
            F.col("id").cast("string"),
            F.array_join(
                F.transform(
                    F.col("members"),
                    lambda m: F.concat_ws(
                        ":", m["type"], m["member_id"].cast("string"), m["role"]
                    ),
                ),
                "|",
            ),
            render_tags(F.col("tags")),
        ).alias("text"),
    ).withColumn("text", F.rtrim("text"))


def reassemble_docs(docs: DataFrame) -> DataFrame:
    """Round-trip: explode → (parse entity spans → re-render) → regroup.

    Non-entity spans pass through untouched; entity spans are fully
    parsed and re-rendered, so equality with the input proves the codec
    is lossless (the RoundTripTest.java:91-107 analog). Span order is
    re-established explicitly via sort_array over (span_pos, ...).
    """
    spans = explode_spans(docs)
    # Parse + re-render inline per kind (no id-join needed: each span row
    # carries its own doc_id/span_pos key through the transformation).
    node_rows = spans.where(F.col("kind") == "node").withColumn(
        "text", _rerender_node(F.col("text"))
    )
    way_rows = spans.where(F.col("kind") == "way").withColumn(
        "text", _rerender_way(F.col("text"))
    )
    rel_rows = spans.where(F.col("kind") == "relation").withColumn(
        "text", _rerender_relation(F.col("text"))
    )
    other = spans.where(~F.col("kind").isin(*ENTITY_KINDS))
    all_spans = node_rows.unionByName(way_rows).unionByName(rel_rows).unionByName(other)

    return (
        all_spans.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("span_pos").alias("pos"),
                        F.struct(
                            F.col("kind").alias("kind"),
                            F.col("text").alias("text"),
                            F.col("media_ref").alias("media_ref"),
                            F.col("offset").alias("offset"),
                        ).alias("span"),
                    )
                )
            ).alias("ordered")
        )
        .select(
            "doc_id", F.transform(F.col("ordered"), lambda s: s["span"]).alias("spans")
        )
    )


def _rerender_node(text):
    parts = F.split(text, " ", 4)
    tags = parse_tags(F.coalesce(F.get(parts, 3), F.lit("")))
    return F.rtrim(
        F.concat_ws(
            " ", F.get(parts, 0), F.get(parts, 1), F.get(parts, 2), render_tags(tags)
        )
    )


def _rerender_way(text):
    parts = F.split(text, " ", 3)
    tags = parse_tags(F.coalesce(F.get(parts, 2), F.lit("")))
    refs = F.array_join(
        F.transform(
            F.split(F.get(parts, 1), ","), lambda r: r.try_cast("long").cast("string")
        ),
        ",",
    )
    return F.rtrim(F.concat_ws(" ", F.get(parts, 0), refs, render_tags(tags)))


def _rerender_relation(text):
    parts = F.split(text, " ", 3)
    tags = parse_tags(F.coalesce(F.get(parts, 2), F.lit("")))
    members = F.array_join(
        F.transform(
            F.filter(F.split(F.get(parts, 1), "\\|"), lambda m: m != F.lit("")),
            lambda m: F.concat_ws(
                ":",
                F.get(F.split(m, ":", 3), 0),
                F.get(F.split(m, ":", 3), 1).try_cast("long").cast("string"),
                F.coalesce(F.get(F.split(m, ":", 3), 2), F.lit("")),
            ),
        ),
        "|",
    )
    return F.rtrim(F.concat_ws(" ", F.get(parts, 0), members, render_tags(tags)))


# Internal row-level parsers reused by reassemble (operate on exploded spans)
def _parse_node_rows(spans: DataFrame) -> DataFrame:
    parts = F.split(F.col("text"), " ", 4)
    return spans.select(
        F.get(parts, 0).try_cast("long").alias("id"),
        F.get(parts, 1).try_cast("int").alias("fixed_lat"),
        F.get(parts, 2).try_cast("int").alias("fixed_lon"),
        parse_tags(F.coalesce(F.get(parts, 3), F.lit(""))).alias("tags"),
    )


def _parse_way_rows(spans: DataFrame) -> DataFrame:
    parts = F.split(F.col("text"), " ", 3)
    return spans.select(
        F.get(parts, 0).try_cast("long").alias("id"),
        F.transform(F.split(F.get(parts, 1), ","), lambda r: r.try_cast("long")).alias(
            "node_ids"
        ),
        parse_tags(F.coalesce(F.get(parts, 2), F.lit(""))).alias("tags"),
    )


def _parse_relation_rows(spans: DataFrame) -> DataFrame:
    parts = F.split(F.col("text"), " ", 3)
    return spans.select(
        F.get(parts, 0).try_cast("long").alias("id"),
        F.transform(
            F.filter(F.split(F.get(parts, 1), "\\|"), lambda m: m != F.lit("")),
            lambda m: F.struct(
                F.get(F.split(m, ":", 3), 0).alias("type"),
                F.get(F.split(m, ":", 3), 1).try_cast("long").alias("member_id"),
                F.coalesce(F.get(F.split(m, ":", 3), 2), F.lit("")).alias("role"),
            ),
        ).alias("members"),
        parse_tags(F.coalesce(F.get(parts, 2), F.lit(""))).alias("tags"),
    )
