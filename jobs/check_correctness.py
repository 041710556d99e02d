"""Self-check harness replicating the driver's correctness gate:
run every queries()[name] at sf=0.01 AND its oracle_sql()[name] in
DuckDB, compare row count + sorted column names + order-insensitive
value hash. Prints one line per query and a summary.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash: sort columns by name, stringify values
    verbatim (no float reformatting — the driver's gate stringifies
    as-is, so "1.0" vs "1" is a real mismatch; collapsing via %.9g here
    previously masked an oracle HUGEINT->float64 dtype drift locally
    that then failed the driver gate), sort rows, sha256."""
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        d[c] = d[c].astype(str)
    rows = sorted("\x1f".join(r) for r in d.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None

    import __spark_entry__ as e
    from osm_lib_spark.session import get_spark

    spark = get_spark("check_correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex)[:200]}")
            failures.append(name)
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok    {name} ({len(got)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{checked - len(failures)}/{checked} ok; failures: {failures or 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
