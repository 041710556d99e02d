"""Every oracle_sql() entry must PARSE AND BIND in DuckDB.

Regression net for the gate harness itself: the oracles are composed
from shared CTE-chain helpers, and a refactor of one composition once
left a CTE body empty (`mh_pairs AS ( )`) — valid Python, green pytest,
48/50 at the driver. EXPLAIN is planning-only (no execution), so this
covers all 50 oracles in seconds and fails on any syntax/binding drift
without re-running the full check_correctness harness.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_registry_shape():
    e = _entry()
    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) == 50
    # every oracle key must gate a registered query
    assert set(oracles) <= set(qs)


def test_every_oracle_binds(con):
    e = _entry()
    failures = {}
    for name, sql in e.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 — collect all, report once
            failures[name] = str(ex).splitlines()[0]
    assert not failures, failures


def test_no_empty_cte_bodies():
    """A structurally emptied CTE (`name AS (\\s*)` followed by ',' or
    ')') is the exact shape the mh_pairs slice bug produced; EXPLAIN
    catches it too, but this pins the failure to a readable message."""
    import re

    e = _entry()
    pat = re.compile(r"AS \(\s*[,)]")
    bad = {n: m.group(0) for n, sql in e.oracle_sql().items() if (m := pat.search(sql))}
    assert not bad, bad
