"""Incremental change application — the OSC replication path
(reference S3/ST1-ST3: OSMChangeParser.java:33-99, Updater.java:73-240).

The reference applies gzipped XML diffs (<add>/<modify>/<delete>) to
its B-tree maps in chronological order and re-indexes modified ways at
end-of-diff (OSMChangeParser.java:109-119). The Spark engine expresses
one diff batch as a MERGE:

    target' = (target ANTI-JOIN touched_ids) UNION upserts

which is exactly Iceberg's ``MERGE INTO`` (delete + insert); here it is
emulated with DataFrame ops over parquet snapshots so it runs without
the Iceberg jars. Derived tables (way_tiles) are recomputed for
affected partitions only — the deferred-reindex semantics (ST3).

``stream_changes`` wires the same batch function into Structured
Streaming via foreachBatch: each micro-batch of change rows is applied
in order, and the replication watermark (max batch timestamp,
Updater.java:142-167 analog) is carried in the lineage log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_SCHEMA_DOC = """change rows: (action string in add|modify|delete,
id long, payload columns matching the target table)"""


def apply_changes(target: DataFrame, changes: DataFrame, key: str = "id") -> DataFrame:
    """One diff batch against one entity table.

    <delete> removes the id; <add>/<modify> upsert the new row
    (reference applies them identically — a put — per
    OSMChangeParser.java:72-85). Within one batch the LAST change per
    id wins, mirroring in-order application; ordering inside a batch is
    by the change sequence column ``seq`` (``read_osc`` makes seq
    globally ordered across diff files). A TIE on the winning (id, seq)
    — two changes to the same id with equal seq — has no defined order
    and raises at execution time rather than keeping an arbitrary row.
    A batch WITHOUT ``seq`` must have unique ids — "last wins" is
    undefined without an order, and silently keeping an arbitrary row
    (old dropDuplicates fallback) made delete-then-add
    nondeterministic. Such batches raise.
    """
    order_col = "seq" if "seq" in changes.columns else None
    if order_col:
        from pyspark.sql import Window

        w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
        wt = Window.partitionBy(key, order_col)
        # the tie check rides the same window shuffle and stays lazy:
        # raise_error fires only if the WINNING seq is duplicated (ties
        # below the max don't affect last-wins)
        changes = (
            changes.withColumn("_rn", F.row_number().over(w))
            .withColumn("_nties", F.count("*").over(wt))
            .where(F.col("_rn") == 1)
            .where(
                F.when(
                    F.col("_nties") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"apply_changes: multiple changes tie on ({key}, seq)=("
                            ),
                            F.col(key).cast("string"),
                            F.lit(", "),
                            F.col(order_col).cast("string"),
                            F.lit(") — application order is ambiguous"),
                        )
                    ).cast("boolean"),
                ).otherwise(F.lit(True))
            )
            .drop("_rn", "_nties")
        )
    else:
        dup = (
            changes.groupBy(key)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"apply_changes: batch has multiple changes for {key}="
                f"{dup[0][key]} but no 'seq' ordering column; per-batch "
                "order is undefined — add a seq column"
            )

    touched = changes.select(key).distinct()
    survivors = target.join(touched, key, "left_anti")
    upserts = changes.where(F.col("action") != "delete").select(*target.columns)
    return survivors.unionByName(upserts)


def affected_tiles(
    old_way_tiles: DataFrame, new_way_tiles: DataFrame, changed_way_ids: DataFrame
) -> DataFrame:
    """Tiles whose contents changed (ST3 deferred re-index): union of a
    changed way's old and new tile — only these partitions need
    rewriting in the spatial index."""
    old_hit = old_way_tiles.join(changed_way_ids, "way_id", "left_semi")
    new_hit = new_way_tiles.join(changed_way_ids, "way_id", "left_semi")
    return (
        old_hit.select("xtile", "ytile")
        .unionByName(new_hit.select("xtile", "ytile"))
        .distinct()
    )


def stream_changes(
    spark,
    change_dir: str,
    schema: str,
    apply_batch,
    checkpoint_dir: str,
):
    """Structured-Streaming wrapper: watch ``change_dir`` for change
    batches, apply each micro-batch in order via ``apply_batch(df,
    epoch_id)``. Ordering matches the reference's strictly-chronological
    diff application (ST4 — no event-time lateness semantics needed)."""
    stream = spark.readStream.schema(schema).parquet(change_dir)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
