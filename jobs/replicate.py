"""Replication catch-up job — the reference Updater's CLI surface
(Updater.java:36-71 main + run), Spark-first.

Usage:
    spark-submit --py-files dist_osm_lib_spark.zip jobs/replicate.py \
        --docs fixtures/sf-xs/docs.parquet \
        --base file:///path/to/replication/mirror/ \
        --since "2026-08-16T11:59:00Z" --out /tmp/replicated

Parses the requested entity table from the docs store, plans the
day/hour/minute escalated catch-up against the replication feed at
``--base`` (planet.osm.org layout; any http(s):// or file:// base),
downloads the planned diffs, applies them as ONE batched merge (a
single shuffle for the whole plan — see streaming/transport.py), and
writes the merged table + a one-line JSON summary with the advanced
watermark. ``--sequential`` replays the reference's per-diff loop
instead. ``--now`` (epoch seconds or the same ISO form as --since)
pins the escalation clock for reproducible runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_lib_spark.session import get_spark  # noqa: E402
from osm_lib_spark.sources.span_codec import (  # noqa: E402
    parse_nodes,
    parse_relations,
    parse_ways,
)
from osm_lib_spark.streaming.replication import date_string  # noqa: E402
from osm_lib_spark.streaming.transport import catch_up  # noqa: E402

PARSERS = {"node": parse_nodes, "way": parse_ways, "relation": parse_relations}


def parse_when(s: str) -> int:
    """Epoch seconds from either a raw integer or the replication
    state.txt ISO form 'yyyy-MM-ddTHH:mm:ssZ' (F9 format family)."""
    s = s.strip()
    if s.lstrip("-").isdigit():
        return int(s)
    try:
        return int(
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )
    except ValueError:
        raise ValueError(f"not epoch seconds or yyyy-MM-ddTHH:mm:ssZ: {s!r}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="path to docs parquet")
    ap.add_argument("--base", required=True, help="replication feed base URL")
    ap.add_argument("--since", required=True, help="db watermark (epoch or ISO Z)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--entity", default="node", choices=sorted(PARSERS))
    ap.add_argument("--now", default=None, help="escalation clock override")
    ap.add_argument("--sequential", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    try:
        since = parse_when(args.since)
        now = parse_when(args.now) if args.now else int(time.time())
    except ValueError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    if not args.base.endswith("/"):
        args.base += "/"

    spark = get_spark("replicate_job", master=args.master)
    t0 = time.time()
    target = PARSERS[args.entity](spark.read.parquet(args.docs))
    merged, watermark, plan = catch_up(
        spark,
        target,
        since,
        now,
        base=args.base,
        entity=args.entity,
        cache_dir=os.path.join(args.out, "_diff_cache"),
        batched=not args.sequential,
    )
    dest = os.path.join(args.out, args.entity)
    merged.write.mode("overwrite").parquet(dest)
    print(
        json.dumps(
            {
                "entity": args.entity,
                "applied_diffs": len(plan),
                "sequences": [d.sequence_number for d in plan],
                "watermark": watermark,
                "watermark_utc": date_string(watermark),
                "rows": spark.read.parquet(dest).count(),
                "out": dest,
                "elapsed_sec": round(time.time() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
