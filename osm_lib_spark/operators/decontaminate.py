"""Benchmark decontamination: flag corpus documents that share word
n-gram shingles with an evaluation/benchmark set.

The standard training-data hygiene pass (engine addition — the
reference has no text pipeline): before a corpus ships, every document
overlapping the held-out benchmark by ≥1 shingle is flagged so exact
and near matches of eval data can be dropped or audited.

Scale shape (the part that matters at 100 TB): benchmarks are tiny
relative to the corpus, so the eval side reduces to a DISTINCT shingle
set that BROADCASTS; the corpus side is a map-only explode + broadcast
hash semi-probe followed by one partial-aggregated groupBy(doc_id) —
the only exchange carries ≤ one row per contaminated doc-shingle hit,
never the corpus text. No self-join, no skew (shingle keys only probe
a broadcast hash set). For benchmark suites too large to broadcast,
the identical plan degrades gracefully to a shuffled semi-join on the
shingle hash: the operator no longer FORCES a broadcast hint — with
AQE on (session default) the runtime sizes the built eval-shingle set
and picks broadcast-hash when it fits ``autoBroadcastJoinThreshold``,
shuffled join when it doesn't, instead of OOMing on a forced
broadcast of an oversized benchmark table.

Shares ``shingles_col`` with the dedup family so the DuckDB oracle's
shingle CTE reproduces tokenization bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.operators.dedup import SHINGLE_N, shingles_col

EVAL_MOD = 97  # deterministic synthetic eval set: doc_id % EVAL_MOD == 0


def decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame | None = None,
    n: int = SHINGLE_N,
    eval_mod: int = EVAL_MOD,
) -> DataFrame:
    """(doc_id, n_shared, contaminated) for every CORPUS document.

    ``eval_docs`` is the benchmark table (doc_id, text); when None, a
    deterministic synthetic eval split (doc_id % eval_mod == 0) is
    carved out of ``documents`` and the remainder is the corpus —
    the gate/oracle configuration. n_shared counts the DISTINCT word
    n-gram shingles the document shares with the union of all eval
    docs; contaminated = 1 iff n_shared > 0.
    """
    if eval_docs is None:
        eval_docs = documents.where(F.col("doc_id") % eval_mod == 0)
        corpus = documents.where(F.col("doc_id") % eval_mod != 0)
    else:
        corpus = documents
    eval_shingles = (
        eval_docs.select(F.explode(shingles_col(F.col("text"), n)).alias("shingle"))
        .distinct()
    )
    hits = (
        corpus.select(
            "doc_id", F.explode(shingles_col(F.col("text"), n)).alias("shingle")
        )
        # no broadcast hint: AQE sizes the distinct eval-shingle set at
        # runtime and picks broadcast only when it actually fits (a
        # forced hint would OOM on an oversized benchmark table)
        .join(eval_shingles, "shingle")
        # shingles_col is already distinct per doc, so count(*) is the
        # distinct shared-shingle count without a count_distinct pass
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0)
            .cast("long")
            .alias("contaminated"),
        )
    )
