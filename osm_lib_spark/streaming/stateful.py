"""Custom stateful streaming operator: per-entity current-state
tracking over a change stream (ST2 as a STREAMING operator rather than
a batch MERGE).

The reference applies replication diffs to its B-tree maps in
arrival order (OSMChangeParser.java:72-98, Updater.applyDiffs) — the
database IS the keyed state. The Structured-Streaming analog keeps one
state row per entity id with ``applyInPandasWithState`` (Arrow-batched
GroupState; the north-star's "custom stateful operators" path):

* state = (seq, payload, deleted) of the highest sequence number seen;
* each micro-batch's rows for an id are reduced by max-seq (last wins,
  same contract as ``changes.apply_changes``);
* deletes keep a tombstone (deleted=true) so late lower-seq changes
  for the id cannot resurrect it — the streaming generalization of the
  batch anti-join;
* every update emits the entity's NEW current state, so the sink sees
  a changelog of current values (outputMode="update").

Scale shape: state is hash-partitioned by id across executors (uniform
keys — entity ids), one Arrow batch per group set; at 100 TB the state
store is RocksDB-backed with changelog checkpointing to the lineage
layer.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

STATE_SCHEMA = "seq long, payload string, deleted boolean"
OUTPUT_SCHEMA = "id long, seq long, payload string, deleted boolean"


def _track(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
    """GroupState reducer: keep the max-seq change per entity id."""
    (eid,) = key
    if state.exists:
        seq, payload, deleted = state.get
    else:
        seq, payload, deleted = -1, None, False
    for pdf in pdf_iter:
        for row in pdf.sort_values("seq").itertuples(index=False):
            if row.seq <= seq:
                continue  # stale change — state already newer
            seq = int(row.seq)
            if row.action == "delete":
                payload, deleted = None, True
            else:
                payload, deleted = row.payload, False
    state.update((seq, payload, deleted))
    yield pd.DataFrame(
        {"id": [eid], "seq": [seq], "payload": [payload], "deleted": [deleted]}
    )


def entity_state_stream(changes):
    """change stream (action, id, payload, seq) → current-state
    changelog stream via applyInPandasWithState."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return changes.groupBy("id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_entity_state_stream(spark, change_dir: str, checkpoint_dir: str, sink):
    """Wire the stateful operator to a file source + a foreachBatch
    ``sink(batch_df, epoch_id)`` (availableNow: drain everything then
    stop — test/batch-catch-up mode; a live deployment uses a
    continuous trigger). foreachBatch — unlike the memory sink —
    supports restarting from the checkpoint, which is what exercises
    state recovery."""
    changes = (
        spark.readStream.schema("action string, id long, payload string, seq long")
        .parquet(change_dir)
    )
    return (
        entity_state_stream(changes)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
