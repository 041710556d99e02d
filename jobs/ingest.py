"""Incremental corpus-ingest job — dedup a new document batch against
the persisted corpus MinHash index, keep the survivors, optionally
admit them to the index.

Usage:
    spark-submit --py-files dist_osm_lib_spark.zip jobs/ingest.py \
        --batch new_docs.parquet --index /warehouse/corpus_mh \
        --out /tmp/ingest_out --append

    # one-time corpus bootstrap (then every future batch is O(batch)):
    spark-submit ... jobs/ingest.py --batch new_docs.parquet \
        --corpus corpus_docs.parquet --build-index \
        --index /warehouse/corpus_mh --out /tmp/ingest_out

The steady-state ingest DAG touches the corpus ONLY through its
persisted band table (candidate equi-join) and the candidate docs'
shingle files (verify, file-skip pruned) — never the corpus text — so
per-batch cost is O(batch) + O(collisions) regardless of corpus size:

  1. batch-internal dedup: MinHash+LSH pairs over the batch alone,
     connected components, keep the min-doc_id canonical per cluster;
  2. batch-vs-corpus dedup: probe the persisted index
     (``dedup_batch_against_index``), drop every batch doc with a
     verified corpus duplicate;
  3. survivors = internal-canonical ∧ corpus-novel, written to
     <out>/survivors/ with <out>/cross_pairs/ and
     <out>/internal_components/ as the audit trail;
  4. ``--append``: admit the survivors' band/shingle rows to the index
     (new files only, existing corpus files untouched).

One JSON summary line on stdout. At 100 TB the index directories are
Iceberg tables (bands bucketed on (band, band_sig), shingles sorted by
doc_id) and --append is the per-batch commit; the parquet layout here
preserves the identical pruning structure without a metastore.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_lib_spark.operators.dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    append_to_minhash_index,
    build_minhash_index,
    components_from_pairs,
    dedup_batch_against_index,
    minhash_dup_pairs,
)
from osm_lib_spark.session import get_spark  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", required=True, help="new documents parquet")
    ap.add_argument("--index", required=True, help="corpus MinHash index dir")
    ap.add_argument("--corpus", default=None, help="corpus documents parquet (with --build-index)")
    ap.add_argument(
        "--build-index",
        action="store_true",
        help="bootstrap the index from --corpus before ingesting",
    )
    ap.add_argument(
        "--append",
        action="store_true",
        help="admit the survivors to the index after deduping",
    )
    ap.add_argument("--threshold", type=float, default=JACCARD_THRESHOLD)
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    if not (0.0 < args.threshold <= 1.0):
        print(f"error: --threshold must be in (0, 1], got {args.threshold}", file=sys.stderr)
        return 2
    if args.build_index and not args.corpus:
        print("error: --build-index requires --corpus", file=sys.stderr)
        return 2
    if not args.build_index and not os.path.exists(
        os.path.join(args.index, "index_meta.json")
    ):
        print(
            f"error: no index at {args.index!r} (run once with --corpus --build-index)",
            file=sys.stderr,
        )
        return 2

    spark = get_spark("ingest_job", master=args.master)
    t0 = time.time()
    batch = spark.read.parquet(args.batch)
    if args.build_index:
        build_minhash_index(spark.read.parquet(args.corpus), args.index)

    # 1. batch-internal canonicalization
    internal_pairs = minhash_dup_pairs(batch, args.threshold).select("doc_a", "doc_b")
    comp = components_from_pairs(batch, internal_pairs)
    comp.write.mode("overwrite").parquet(os.path.join(args.out, "internal_components"))

    # 2. batch-vs-corpus probe (corpus text never read). The pair
    # table is re-read from its own parquet before anything downstream:
    # every later step (survivor join, counts) must see the index AS IT
    # WAS at probe time, not as a lazy DAG that --append would mutate
    # underneath.
    cross = dedup_batch_against_index(batch, args.index, args.threshold)
    cross.write.mode("overwrite").parquet(os.path.join(args.out, "cross_pairs"))
    cross_out = spark.read.parquet(os.path.join(args.out, "cross_pairs"))

    # 3. survivors: internal-canonical AND corpus-novel (two semi-joins
    # on the unique doc_id key — no row explosion, AQE broadcasts the
    # small sides at this scale, plain shuffles at 100 TB)
    keepers = comp.where(F.col("keep") == 1).select("doc_id")
    matched = cross_out.select(F.col("doc_a").alias("doc_id")).distinct()
    n_batch, n_keep, n_matched = batch.count(), keepers.count(), matched.count()
    survivors = (
        batch.join(keepers, "doc_id", "left_semi")
        .join(matched, "doc_id", "left_anti")
    )
    survivors.write.mode("overwrite").parquet(os.path.join(args.out, "survivors"))
    survivors_out = spark.read.parquet(os.path.join(args.out, "survivors"))
    n_surv = survivors_out.count()

    if args.append:
        append_to_minhash_index(survivors_out, args.index)
    print(
        json.dumps(
            {
                "batch_docs": n_batch,
                "corpus_matched": n_matched,
                "internal_dropped": n_batch - n_keep,
                "survivors": n_surv,
                "appended": bool(args.append),
                "index": args.index,
                "out": args.out,
                "elapsed_sec": round(time.time() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
