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


def test_session_stream_matches_batch_and_survives_restart(spark, tmp_path):
    """Streaming sessionization == batch sessionize minus each user's
    still-open last session; an OPEN session spanning a stream RESTART
    closes correctly from checkpointed state."""
    from pyspark.sql import functions as F

    from osm_lib_spark.operators.sessions import sessionize
    from osm_lib_spark.streaming.sessions import run_session_stream

    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt_sess")
    os.makedirs(events_dir)

    def _write(name, rows):
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts"]).assign(
            ts=lambda d: pd.to_datetime(d["ts"]).astype("datetime64[us]")
        ).to_parquet(os.path.join(events_dir, name), index=False)

    # user 1: session A (2 events), big gap, session B starts (1 event)
    _write(
        "b1.parquet",
        [
            (1, 1, "2026-01-15 12:00:00"),
            (2, 1, "2026-01-15 12:10:00"),
            (3, 1, "2026-01-15 14:00:00"),
            (4, 2, "2026-01-15 09:00:00"),
        ],
    )
    got = []

    def sink(batch_df, epoch_id):
        got.extend(
            (r.user_id, r.session_seq, r.n_events, r.span_us) for r in batch_df.collect()
        )

    q = run_session_stream(spark, events_dir, ckpt, sink)
    q.awaitTermination()
    # only user 1's session A is CLOSED so far
    assert got == [(1, 1, 2, 10 * 60 * 1_000_000)]

    # second batch AFTER RESTART: extends user 1's open session B, then
    # a gap closes it; user 2's open session also closes via a gap
    _write(
        "b2.parquet",
        [
            (5, 1, "2026-01-15 14:05:00"),
            (6, 1, "2026-01-15 16:00:00"),
            (7, 2, "2026-01-15 11:00:00"),
        ],
    )
    got.clear()
    q2 = run_session_stream(spark, events_dir, ckpt, sink)
    q2.awaitTermination()
    assert sorted(got) == [
        (1, 2, 2, 5 * 60 * 1_000_000),   # session B: events 3 + 5, span 5 min
        (2, 1, 1, 0),                     # user 2's first session closed by the gap
    ]

    # batch-equivalence: closed streaming sessions == batch result minus
    # each user's LAST (still-open) session
    all_events = spark.read.parquet(events_dir).select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    batch = sessionize(all_events).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    closed_batch = sorted(
        (r.user_id, r.session_seq, r.n_events, r.span_us)
        for r in batch
        if r.session_seq < last_seq[r.user_id]
    )
    streamed = sorted([(1, 1, 2, 10 * 60 * 1_000_000)] + got)
    assert closed_batch == streamed
