"""Replication catch-up semantics (S6/F9/F10) against an in-memory
feed — URL math, state parsing, backward-walk diff discovery, the
day/hour/minute escalation policy, and ordered application."""

from pyspark.sql import functions as F

from osm_lib_spark.streaming.replication import (
    DiffState,
    apply_plan,
    catch_up_plan,
    date_string,
    find_diffs,
    parse_state_txt,
    replication_url,
    state_url,
    sequence_path,
)

DAY = 86400
HOUR = 3600


def test_sequence_path_math():
    # Updater.java:80-83 decimal digit-group math
    assert sequence_path(0) == "000/000/000"
    assert sequence_path(1) == "000/000/001"
    assert sequence_path(1_234_567) == "001/234/567"
    assert sequence_path(999_999_999) == "999/999/999"
    assert replication_url("minute", 4_419_061).endswith("minute/004/419/061.osc.gz")
    assert state_url("minute", 4_419_061).endswith("minute/004/419/061.state.txt")
    assert state_url("hour", 0).endswith("hour/state.txt")
    assert replication_url("hour", 0).endswith("hour/state.txt")


def test_state_txt_parse_and_date_string():
    txt = "#Sat Aug 16 12:00:00 UTC 2026\nsequenceNumber=12345\ntimestamp=2026-08-16T11\\:59\\:00Z\n"
    st = parse_state_txt(txt, "minute")
    assert st.sequence_number == 12345
    assert date_string(st.timestamp) == "2026-08-16 11:59:00"  # Updater.getDateString format
    assert st.url.endswith("minute/000/012/345.osc.gz")


def _feed(timescale_states):
    """dict: timescale -> {seq: timestamp}; seq 0 = latest."""

    def fetch(timescale, seq):
        states = timescale_states.get(timescale, {})
        if not states:
            return None
        if seq == 0:
            seq = max(states)
        if seq not in states:
            return None
        return DiffState(timescale, seq, states[seq])

    return fetch


def test_find_diffs_backward_walk_chronological():
    fetch = _feed({"minute": {1: 100, 2: 160, 3: 220, 4: 280}})
    got = find_diffs(fetch, "minute", db_timestamp=160)
    assert [(d.sequence_number, d.timestamp) for d in got] == [(3, 220), (4, 280)]
    # watermark at latest → nothing
    assert find_diffs(fetch, "minute", db_timestamp=280) == []


def test_catch_up_escalation_day_hour_minute():
    t0 = 1_000_000
    feed = _feed(
        {
            "day": {10: t0 + DAY, 11: t0 + 2 * DAY},
            "hour": {100: t0 + 2 * DAY + HOUR, 101: t0 + 2 * DAY + 2 * HOUR},
            "minute": {
                500: t0 + 2 * DAY + 2 * HOUR + 60,
                501: t0 + 2 * DAY + 2 * HOUR + 120,
            },
        }
    )
    now = t0 + 2 * DAY + 2 * HOUR + 150
    plan = catch_up_plan(feed, db_timestamp=t0, now=now)
    kinds = [(d.timescale, d.sequence_number) for d in plan]
    assert kinds == [
        ("day", 10),
        ("day", 11),
        ("hour", 100),
        ("hour", 101),
        ("minute", 500),
        ("minute", 501),
    ]
    # timestamps strictly increasing = chronological application order
    ts = [d.timestamp for d in plan]
    assert ts == sorted(ts)
    # nearly-current database skips day+hour scales entirely
    plan2 = catch_up_plan(feed, db_timestamp=now - 130, now=now)
    assert {d.timescale for d in plan2} == {"minute"}


def test_apply_plan_orders_and_advances_watermark(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")
    plan = [
        DiffState("minute", 1, 1000),
        DiffState("minute", 2, 1060),
    ]

    def load_diff(state):
        if state.sequence_number == 1:
            return spark.createDataFrame(
                [("modify", 1, "A", 1)], "action string, id long, val string, seq int"
            )
        return spark.createDataFrame(
            [("delete", 1, None, 1), ("add", 3, "c", 2)],
            "action string, id long, val string, seq int",
        )

    out, watermark = apply_plan(target, plan, load_diff)
    assert watermark == 1060
    got = {(r.id, r.val) for r in out.collect()}
    # diff 1 modifies id 1; diff 2 then deletes it and adds id 3 —
    # order matters, and the later diff wins
    assert got == {(2, "b"), (3, "c")}
