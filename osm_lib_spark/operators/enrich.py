"""Entity enrichment: ID-keyed tag upsert from a side table (SURVEY J7).

Reference analog: SpeedSetter (main/SpeedSetter.java:28-31) reads a CSV
of (osmWayId, speed) and rewrites each way's ``maxspeed`` tag in place.
The Spark expression: broadcast/hash join ways to the enrichment table,
rewrite the tag array with add_or_replace_tag (first case-insensitive
key match replaced in position, else appended — OSMEntity.java:91-102),
and keep untouched ways as-is. On a cluster this is the MERGE INTO
update arm; here it returns the updated DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.tags import TAG_SCHEMA


def enrich_tags(
    entities: DataFrame, updates: DataFrame, key_tag: str, id_col: str = "id",
    update_id_col: str = "id", update_value_col: str = "value",
) -> DataFrame:
    """Upsert tag ``key_tag`` = updates.value on matching entity ids.

    ``updates`` is small (broadcast); non-matching entities pass through
    unchanged. Tag rewrite preserves order and replaces only the first
    case-insensitive match, appending otherwise.
    """
    upd = updates.select(
        F.col(update_id_col).alias("_uid"),
        F.col(update_value_col).cast("string").alias("_uval"),
    )
    joined = entities.join(
        F.broadcast(upd), entities[id_col] == upd._uid, "left"
    )
    k = F.lit(key_tag)
    tags = F.coalesce(F.col("tags"), F.array().cast(TAG_SCHEMA))
    lowered = F.transform(tags, lambda t: F.lower(t["key"]))
    first_idx = F.array_position(lowered, F.lower(k))
    replaced = F.zip_with(
        tags,
        F.sequence(F.lit(1), F.size(tags)),
        lambda t, i: F.when(
            i == first_idx, F.struct(t["key"].alias("key"), F.col("_uval").alias("value"))
        ).otherwise(t),
    )
    appended = F.concat(
        tags, F.array(F.struct(k.alias("key"), F.col("_uval").alias("value")))
    )
    new_tags = (
        F.when(F.col("_uval").isNull(), F.col("tags"))
        .when(first_idx > 0, replaced)
        .otherwise(appended)
    )
    return joined.withColumn("tags", new_tags).drop("_uid", "_uval")
