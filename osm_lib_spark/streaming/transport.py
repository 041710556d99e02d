"""Replication transport — the download half of the reference's
Updater (Updater.java:73-120), composed with the transport-free
planner in ``streaming/replication.py``.

``url_fetch`` is a plain urllib GET over the URLs the planner's
``state_url``/``replication_url`` math produces, so the SAME code path
serves both regimes: in production ``base`` is the reference's
``BASE_URL`` (planet.openstreetmap.org, Updater.java:37); in the
sandbox the tests exercise it over a ``file://`` mirror with the
identical ``<timescale>/AAA/BBB/CCC`` layout — there is no separate
"test transport", only a different base URL.

``catch_up`` is the full Updater.run analog (plan → download → merge →
watermark), with one Spark-first improvement over the reference's
diff-at-a-time loop: because ``read_osc`` assigns a GLOBALLY ordered
``seq`` across files (file order = chronological plan order) and
``apply_changes`` resolves last-wins on that seq, the entire plan can
be applied as ONE batched merge — a single shuffle for the whole
catch-up, provably equal to sequential application (asserted in
tests/test_transport.py). ``batched=False`` keeps the reference's
per-diff loop for comparison. At 100 TB the batched path is the one
that matters: N minutely diffs become one scan + one merge instead of
N driver-sequenced jobs.
"""

from __future__ import annotations

import os
import tempfile
from urllib.error import HTTPError, URLError
from urllib.request import urlopen

from osm_lib_spark.streaming.replication import (
    BASE_URL,
    DiffState,
    apply_plan,
    catch_up_plan,
    parse_state_txt,
    replication_url,
    state_url,
)

ENTITY_NARROWERS = ("node", "way", "relation")


def url_fetch(url: str, timeout: float = 30.0) -> bytes | None:
    """GET one replication URL; None for a missing resource (HTTP 404
    or a missing file:// path), mirroring Updater.fetchState's
    null-on-IOException contract (Updater.java:93-96) so the planner's
    backward walk stops cleanly at the feed's horizon."""
    try:
        with urlopen(url, timeout=timeout) as resp:  # noqa: S310 — feed URLs
            return resp.read()
    except (HTTPError, URLError, OSError):
        return None


def make_fetch_state(base: str = BASE_URL, fetch=url_fetch):
    """A ``fetch_state(timescale, seq)`` callable for the planner,
    backed by ``fetch``. seq 0 probes the timescale's rolling
    state.txt (the fetchState(0) probe, Updater.java:79-92); the
    returned DiffState's url points at the matching .osc.gz under
    ``base``."""

    def fetch_state(timescale: str, seq: int) -> DiffState | None:
        data = fetch(state_url(timescale, seq, base))
        if data is None:
            return None
        st = parse_state_txt(data.decode("utf-8"), timescale)
        st.url = replication_url(timescale, st.sequence_number, base)
        return st

    return fetch_state


def download_plan(plan: list[DiffState], cache_dir: str, fetch=url_fetch) -> list[str]:
    """Download every diff in a catch-up plan to ``cache_dir``,
    returning local paths IN PLAN ORDER (chronological — the order
    ``read_osc`` turns into its global seq). A diff that disappears
    between planning and download raises: applying a plan with a hole
    would silently skip changes the watermark then claims to cover."""
    os.makedirs(cache_dir, exist_ok=True)
    paths = []
    for st in plan:
        data = fetch(st.url)
        if data is None:
            raise FileNotFoundError(
                f"replication diff vanished after planning: {st.url}"
            )
        path = os.path.join(cache_dir, f"{st.timescale}_{st.sequence_number:09d}.osc.gz")
        with open(path, "wb") as f:
            f.write(data)
        paths.append(path)
    return paths


def _narrow(changes, entity: str):
    from osm_lib_spark.sources import osc

    if entity == "node":
        return osc.osc_node_changes(changes)
    if entity == "way":
        return osc.osc_way_changes(changes)
    return osc.osc_relation_changes(changes)


def catch_up(
    spark,
    target,
    db_timestamp: int,
    now: int,
    base: str = BASE_URL,
    entity: str = "node",
    cache_dir: str | None = None,
    fetch=url_fetch,
    batched: bool = True,
):
    """Full Updater.run catch-up over a live feed: escalation-planned
    diff discovery (day→hour→minute, Updater.java:207-218), download,
    merge, watermark advance. Returns ``(df, watermark, plan)``;
    watermark is ``db_timestamp`` unchanged when already current.

    batched=True (default, the scale path) merges the whole plan in one
    ``apply_changes`` call on read_osc's cross-file global seq;
    batched=False replays the reference's sequential per-diff loop.
    """
    if entity not in ENTITY_NARROWERS:
        raise ValueError(f"entity must be one of {ENTITY_NARROWERS}")
    plan = catch_up_plan(make_fetch_state(base, fetch), db_timestamp, now)
    if not plan:
        return target, db_timestamp, plan
    cache_dir = cache_dir or tempfile.mkdtemp(prefix="osm_replication_")
    paths = download_plan(plan, cache_dir, fetch)
    from osm_lib_spark.sources.osc import read_osc
    from osm_lib_spark.streaming.changes import apply_changes

    if batched:
        changes = _narrow(read_osc(spark, paths), entity)
        merged = apply_changes(target, changes)
        return merged, plan[-1].timestamp, plan

    def load_diff(st: DiffState):
        path = paths[plan.index(st)]
        return _narrow(read_osc(spark, [path]), entity)

    merged, watermark = apply_plan(target, plan, load_diff)
    return merged, watermark, plan
