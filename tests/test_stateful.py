"""applyInPandasWithState entity-state tracker: last-seq-wins across
micro-batches, tombstones block stale resurrections, state survives a
stream restart via the checkpoint."""

import os

import pandas as pd

from osm_lib_spark.streaming.stateful import run_entity_state_stream


def _write_batch(change_dir, name, rows):
    pd.DataFrame(rows, columns=["action", "id", "payload", "seq"]).to_parquet(
        os.path.join(change_dir, name), index=False
    )


def test_entity_state_stream_last_wins_and_tombstones(spark, tmp_path):
    change_dir = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(change_dir)
    _write_batch(
        change_dir,
        "b1.parquet",
        [("add", 1, "v1", 1), ("add", 2, "w1", 2), ("modify", 1, "v2", 3)],
    )
    out: dict = {}

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            out[r.id] = (r.seq, r.payload, r.deleted)

    q = run_entity_state_stream(spark, change_dir, ckpt, sink)
    q.awaitTermination()
    got = dict(out)
    # within one batch the max-seq change wins
    assert got[1] == (3, "v2", False)
    assert got[2] == (2, "w1", False)

    # second batch: delete id 1, stale modify for id 2 (seq below state)
    _write_batch(
        change_dir,
        "b2.parquet",
        [("delete", 1, None, 4), ("modify", 2, "stale", 1), ("add", 3, "x1", 5)],
    )
    out.clear()
    q2 = run_entity_state_stream(spark, change_dir, ckpt, sink)
    q2.awaitTermination()
    got2 = dict(out)
    # tombstone emitted for 1; stale change for 2 ignored (state kept
    # seq 2 from the checkpointed first run); 3 added
    assert got2[1] == (4, None, True)
    assert got2[2] == (2, "w1", False)
    assert got2[3] == (5, "x1", False)
