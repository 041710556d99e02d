"""End-to-end corpus curation: the query a training-data pipeline
actually ships, composed from the gated building blocks —

    keep a document iff it
      (1) is its duplicate cluster's canonical survivor
          (``dedup.dup_components``: MinHash pairs → connected
          components → min-doc_id survivor),
      (2) passes the quality gate (``text.quality_scores``), and
      (3) survives deterministic stratified sampling
          (``sampling.sample_stratified``).

Order matters semantically: dedup runs over the FULL corpus (a
duplicate cluster must see all its members before sampling thins
them), quality is per-document, and the sample is a pure function of
doc_id — so the three filters commute executionally and Catalyst is
free to push the cheap hash filter below the semi joins.

Scale shape: two left-semi joins on doc_id (uniform keys) against the
survivor and quality sets plus a map-side hash filter; the expensive
part is the components fixpoint, which is shared infrastructure (its
output would be a materialized, lineage-tracked table in a real
pipeline, not recomputed per curation run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.operators.dedup import dup_components
from osm_lib_spark.operators.sampling import sample_stratified
from osm_lib_spark.operators.text import quality_scores


def curate_corpus(
    documents: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    max_dup_word_x1000: int = 650,
    max_dup_2gram_x1000: int = 100,
) -> DataFrame:
    """(doc_id, lang): documents surviving dedup-canonical + quality +
    repetition + stratified-sample filters.

    The repetition gates are the Gopher-style filters over
    ``quality_scores``' duplicate-word / duplicate-2-gram fractions
    (×1000 integers): a doc is dropped when repeated words exceed
    ``max_dup_word_x1000``‰ or repeated word-2-grams exceed
    ``max_dup_2gram_x1000``‰. Defaults are tuned to the synthetic
    fixture's small vocabulary (word repetition runs high there;
    650/100 each exclude a real slice at gate scale) — production
    corpora use the published ~300/180 settings via the parameters.
    """
    survivors = dup_components(documents).where(F.col("keep") == 1).select("doc_id")
    quality = (
        quality_scores(documents)
        .where(
            (F.col("is_quality") == 1)
            & (F.col("dup_word_x1000") <= max_dup_word_x1000)
            & (F.col("dup_2gram_x1000") <= max_dup_2gram_x1000)
        )
        .select("doc_id")
    )
    return (
        sample_stratified(documents, rates, default_rate)
        .join(survivors, "doc_id", "left_semi")
        .join(quality, "doc_id", "left_semi")
        .select("doc_id", "lang")
    )
