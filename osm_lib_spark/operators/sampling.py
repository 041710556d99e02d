"""Deterministic stratified sampling over the documents corpus.

A training-data pipeline rarely ships every document: it downsamples
per stratum (language, source, quality bucket) to hit a target mix.
Random sampling is not reproducible across runs/engines; hash-based
sampling is: keep a document iff

    md5_int(doc_id) % DENOM  <  rate(stratum) · DENOM

The md5-prefix hash (functions.hashing) is bit-identical in Spark,
DuckDB and numpy, so the SAMPLE ITSELF — not just its size — is
reproducible anywhere, survives reruns/restarts, and needs no state.

Scale shape: pure map-side Column expressions (hash + literal CASE on
the stratum), no shuffle, no UDF; the filter pushes down past column
pruning so a 100-TB scan reads only (doc_id, stratum) pages for
rejected rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.hashing import md5_int_col

SAMPLE_DENOM = 1_000_000  # rate resolution: 1e-6


def sample_stratified(
    documents: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
) -> DataFrame:
    """Documents surviving per-stratum deterministic sampling.

    ``rates`` maps stratum value → keep probability in [0, 1]; strata
    not listed fall back to ``default_rate``. The keep decision is a
    pure function of doc_id, so resampling with a higher rate yields a
    SUPERSET of a lower-rate sample (nested samples — handy for
    scaling-law subset curves).
    """
    thresh = F.lit(int(default_rate * SAMPLE_DENOM))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * SAMPLE_DENOM))
        ).otherwise(thresh)
    return documents.where(
        md5_int_col(F.col("doc_id").cast("string")) % SAMPLE_DENOM < thresh
    )
