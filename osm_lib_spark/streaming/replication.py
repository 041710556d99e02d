"""Replication catch-up driver (reference S6 + F9/F10), transport-free.

The reference's Updater (Updater.java:73-240) keeps a database current
against the OSM replication feed: per timescale (minute/hour/day) it
reads `state.txt` files keyed by a sequence number, walks BACKWARD from
the latest sequence collecting every diff newer than the database
watermark, reverses the list into chronological order, applies each
diff, and advances the watermark to the applied diff's timestamp. The
escalation policy (Updater.run, Updater.java:207-218) catches up with
day-scale diffs when > 24h behind, then hour-scale when > 1h behind,
then minutely.

Everything here reproduces those semantics against a pluggable
``fetch_state(timescale, sequence)`` callable — in the sandbox a local
directory or dict stands in for the HTTP feed (no network); the
catch-up/ordering logic, URL path math (F10, Updater.java:79-87) and
date formatting (F9) are the reference-parity surface.

The actual diff application is ``streaming/changes.apply_changes`` (the
anti-join+union MERGE), already oracle-gated as ``osc_merge``.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

BASE_URL = "https://planet.openstreetmap.org/replication/"  # Updater.java:37
TIMESCALES = ("minute", "hour", "day")

DAY_SECONDS = 60 * 60 * 24
HOUR_SECONDS = 60 * 60


def sequence_path(sequence_number: int) -> str:
    """Sequence → 'AAA/BBB/CCC' directory path (Updater.java:80-83)."""
    a = sequence_number // 1_000_000
    b = (sequence_number - a * 1_000_000) // 1_000
    c = sequence_number - a * 1_000_000 - b * 1_000
    return f"{a:03d}/{b:03d}/{c:03d}"


def replication_url(timescale: str, sequence_number: int, base: str = BASE_URL) -> str:
    """Changeset (diff) URL for (timescale, sequence):
    '<base><timescale>/AAA/BBB/CCC.osc.gz' — Updater.fetchState appends
    '.osc.gz' to the sequence path (Updater.java:79-86). Sequence 0 has
    no changeset; it resolves to the timescale's current state.txt, the
    same probe fetchState makes when called with sequenceNumber 0."""
    if timescale not in TIMESCALES:
        raise ValueError(f"timescale must be one of {TIMESCALES}")
    root = f"{base}{timescale}/"
    if sequence_number > 0:
        return root + sequence_path(sequence_number) + ".osc.gz"
    return root + "state.txt"


def state_url(timescale: str, sequence_number: int, base: str = BASE_URL) -> str:
    """State-file URL for (timescale, sequence):
    '<base><timescale>/AAA/BBB/CCC.state.txt' for a specific sequence
    (Updater.java:88-92 — the '.osc.gz' suffix is replaced, keeping the
    dot), or the timescale's rolling 'state.txt' for sequence 0."""
    if timescale not in TIMESCALES:
        raise ValueError(f"timescale must be one of {TIMESCALES}")
    root = f"{base}{timescale}/"
    if sequence_number > 0:
        return root + sequence_path(sequence_number) + ".state.txt"
    return root + "state.txt"


def date_string(seconds_since_epoch: float) -> str:
    """UTC 'yyyy-MM-dd HH:mm:ss' render of a watermark — exact
    Updater.getDateString format (Updater.java:124-128)."""
    return datetime.fromtimestamp(seconds_since_epoch, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


@dataclass
class DiffState:
    """One replication state row (Updater.Diff analog)."""

    timescale: str
    sequence_number: int
    timestamp: int  # seconds since epoch
    url: str = ""


def parse_state_txt(text: str, timescale: str = "minute") -> DiffState:
    """Parse the key=value state file (Updater.java:97-113): unescapes
    '\\:' in the timestamp, reads sequenceNumber."""
    kvs = {}
    for line in text.splitlines():
        if "=" in line and not line.startswith("#"):
            k, _, v = line.partition("=")
            kvs[k.strip()] = v.strip()
    ts = kvs["timestamp"].replace("\\:", ":")
    epoch = int(
        datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )
    seq = int(kvs["sequenceNumber"])
    return DiffState(timescale, seq, epoch, replication_url(timescale, seq))


def find_diffs(fetch_state, timescale: str, db_timestamp: int) -> list[DiffState]:
    """Chronologically ordered diffs newer than the watermark
    (Updater.findDiffs, Updater.java:134-153): check the latest state,
    then walk backward collecting states until one is ≤ the watermark,
    and reverse."""
    latest = fetch_state(timescale, 0)
    if latest is None:
        return []
    work: list[DiffState] = []
    if latest.timestamp > db_timestamp:
        for seq in range(latest.sequence_number, 0, -1):
            diff = fetch_state(timescale, seq)
            if diff is None or diff.timestamp <= db_timestamp:
                break
            work.append(diff)
    work.reverse()
    return work


def catch_up_plan(fetch_state, db_timestamp: int, now: int) -> list[DiffState]:
    """The escalation policy of Updater.run (Updater.java:207-218):
    day-scale first when > 24h behind, then hour-scale when > 1h
    behind, then minutely — each stage advancing the watermark the next
    stage sees. Returns the full ordered application plan."""
    plan: list[DiffState] = []
    watermark = db_timestamp
    if now - watermark > DAY_SECONDS:
        plan += find_diffs(fetch_state, "day", watermark)
        if plan:
            watermark = plan[-1].timestamp
    if now - watermark > HOUR_SECONDS:
        step = find_diffs(fetch_state, "hour", watermark)
        plan += step
        if step:
            watermark = step[-1].timestamp
    plan += find_diffs(fetch_state, "minute", watermark)
    return plan


def apply_plan(target, plan: list[DiffState], load_diff, key: str = "id"):
    """Apply a catch-up plan in order (Updater.applyDiffs semantics):
    ``load_diff(state) -> change DataFrame`` stands in for the gzipped
    OSC download; each diff merges via apply_changes and the watermark
    advances to the applied diff's timestamp. Returns (df, watermark).
    """
    from osm_lib_spark.streaming.changes import apply_changes

    watermark = None
    for state in plan:
        target = apply_changes(target, load_diff(state), key=key).localCheckpoint(
            eager=True
        )
        watermark = state.timestamp
    return target, watermark
