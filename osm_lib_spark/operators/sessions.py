"""Gap-based sessionization over the events table.

Groups each user's events into sessions separated by inactivity gaps —
the batch analog of Structured Streaming's session windows (the
streaming path lives in streaming/stateful.py; this is the historical
backfill formulation, pure window algebra so Catalyst plans one
per-user sort + running sum).

Cross-engine determinism: timestamps are compared as integer
MICROSECONDS composed from the NTZ timestamp's FIELDS (day number,
hour, minute, second, fractional micros) — field extraction is
session-timezone-proof, unlike epoch casts, and equals DuckDB's
``epoch_us`` on the same naive timestamps; event_id breaks ties, so
the oracle reproduces session boundaries exactly with no float time
arithmetic anywhere.

Scale shape: two window functions over the same (user_id) partitioning
— ONE hash exchange + one in-partition sort total (Catalyst reuses the
sort for both lag and the running sum), then a partial-aggregated
groupBy on the same keys. Skewed users (bots with millions of events)
bound the partition sort; for those, pre-split by (user_id, day) and
merge boundary sessions, same as any session-window engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _ntz_micros(ts) -> "F.Column":
    """TIMESTAMP_NTZ → integer microseconds since epoch via field
    extraction (tz-proof: no cast through the session timezone)."""
    return (
        F.unix_date(F.to_date(ts)).cast("long") * F.lit(86_400_000_000)
        + F.hour(ts).cast("long") * F.lit(3_600_000_000)
        + F.minute(ts).cast("long") * F.lit(60_000_000)
        + F.second(ts).cast("long") * F.lit(1_000_000)
        + F.date_format(ts, "SSSSSS").cast("long")
    )


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """(user_id, session_seq, n_events, span_us): one row per session.

    A new session starts at a user's first event and at every event
    whose gap from the previous event exceeds ``gap_us``; session_seq
    numbers a user's sessions from 1 in time order; span_us is the
    session's last-minus-first event time.
    """
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        _ntz_micros(F.col("ts")).alias("us"),
    ).withColumn(
        "new_s",
        F.when(
            F.col("us") - F.lag("us").over(w) > F.lit(gap_us), F.lit(1)
        ).otherwise(F.when(F.lag("us").over(w).isNull(), F.lit(1)).otherwise(F.lit(0))),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )
