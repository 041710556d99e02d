"""Streaming gap-based sessionization — the live twin of
``operators.sessions.sessionize`` as a custom stateful operator
(``applyInPandasWithState``, the north-star's "custom stateful
operators" path).

State per user = the OPEN session (session_seq, start_us, last_us,
n_events). Each event either extends the open session or — when its
gap from the previous event exceeds ``gap_us`` — CLOSES it (the closed
session is emitted downstream, append semantics) and opens the next.
A user's final session stays open in the state store until more events
arrive; ``closed_sessions_equal_batch`` in the tests pins the exact
contract: emitted rows == the batch operator's result minus each
user's last (still-open) session.

Ordering contract (ST4 parity with the changes stream): events must
arrive in per-user time order across micro-batches — an out-of-order
event RAISES rather than silently corrupting session boundaries
(within a batch, rows are sorted by (us, event_id) first).

Scale shape: state is hash-partitioned by user_id (uniform keys), one
Arrow batch per group set per micro-batch; at 100 TB the state store
is RocksDB-backed and the emitted closed-session stream appends to the
lineage-tracked sessions table.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from osm_lib_spark.operators.sessions import SESSION_GAP_US

SESS_STATE_SCHEMA = "session_seq long, start_us long, last_us long, n_events long"
SESS_OUTPUT_SCHEMA = "user_id long, session_seq long, n_events long, span_us long"
_OUT_COLS = ["user_id", "session_seq", "n_events", "span_us"]


def _session_reducer(gap_us: int):
    def reduce(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            seq, start, last, n = state.get
        else:
            seq, start, last, n = 0, None, None, 0
        closed = []
        for pdf in pdf_iter:
            for row in pdf.sort_values(["us", "event_id"]).itertuples(index=False):
                us = int(row.us)
                if last is not None and us < last:
                    raise ValueError(
                        f"session stream for user {uid} went back in time "
                        f"({us} < {last}) — per-user event order is a contract"
                    )
                if last is None:
                    seq += 1
                    start, n = us, 0
                elif us - last > gap_us:
                    closed.append((uid, seq, n, last - start))
                    seq += 1
                    start, n = us, 0
                last = us
                n += 1
        state.update((seq, start, last, n))
        yield pd.DataFrame(closed, columns=_OUT_COLS)

    return reduce


def session_stream(events, gap_us: int = SESSION_GAP_US):
    """(user_id, event_id, us) stream → closed-session stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _session_reducer(gap_us),
        outputStructType=SESS_OUTPUT_SCHEMA,
        stateStructType=SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_session_stream(spark, events_dir: str, checkpoint_dir: str, sink, gap_us: int = SESSION_GAP_US):
    """File-source wiring: watch ``events_dir`` for event batches
    (event_id, user_id, ts as TIMESTAMP_NTZ), sessionize statefully,
    deliver closed sessions to ``sink(batch_df, epoch_id)``. availableNow
    + foreachBatch so a restart resumes the open sessions from the
    checkpointed state (exercised in tests)."""
    from pyspark.sql import functions as F

    from osm_lib_spark.operators.sessions import _ntz_micros

    events = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp_ntz")
        .parquet(events_dir)
        .select("event_id", "user_id", _ntz_micros(F.col("ts")).alias("us"))
    )
    return (
        session_stream(events, gap_us)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
