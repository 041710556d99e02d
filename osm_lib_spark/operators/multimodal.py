"""Multimodal (media) column handling.

Media spans are opaque references (``media_ref``) with typed metadata
derived by parsing; binary payloads at scale would be a sibling
``binary`` column / object-store pointer — the Spark-side plumbing
(schemas, partitioning, Arrow batch shapes, mapInPandas signatures) is
real and tested; the actual image/audio DECODE is stubbed because the
codec libraries are not in this container.

``decode_media_features`` shows the pattern: a ``mapInPandas``
partition-iterator operator that would call PIL/libav per Arrow batch;
here the decode function is swapped for a deterministic md5-derived
fake (clearly marked) so the distributed plumbing is exercised and the
output is oracle-checkable. Swap ``_decode_batch`` for a real decoder
to productionize — nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.sources.span_codec import explode_spans

N_FAKE_FEATURES = 4

MEDIA_FEATURE_SCHEMA = (
    "doc_id string, media_ref string, "
    + ", ".join(f"f{i} long" for i in range(N_FAKE_FEATURES))
)


def media_catalog(docs: DataFrame) -> DataFrame:
    """All media spans with parsed metadata:
    (doc_id, media_ref, scheme, media_kind, media_id, sig).

    media_ref convention: ``scheme://kind/id``. sig is a 16-hex content
    signature placeholder (md5 of the ref; a real pipeline hashes the
    payload bytes).
    """
    spans = explode_spans(docs).where(F.col("kind") == "media")
    parts = F.split(F.col("media_ref"), "://", 2)
    path = F.split(F.coalesce(F.get(parts, 1), F.lit("")), "/", 2)
    return spans.select(
        "doc_id",
        "media_ref",
        F.get(parts, 0).alias("scheme"),
        F.get(path, 0).alias("media_kind"),
        F.get(path, 1).try_cast("long").alias("media_id"),
        F.substring(F.md5(F.col("media_ref")), 1, 16).alias("sig"),
    )


def _decode_batch(refs: pd.Series) -> pd.DataFrame:
    """STUB decoder. A real implementation would fetch + decode the
    payload (PIL.Image.open / soundfile / pyav frame sampling) and emit
    embedding-ready features. This deterministic fake derives
    N_FAKE_FEATURES int64 features from md5(ref + '#i') so tests and
    oracles can verify the plumbing end-to-end.
    """
    try:  # pragma: no cover - decode libs absent in this environment
        import PIL  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired; remove the stub in _decode_batch"
        )
    except ImportError:
        pass
    cols = {}
    for i in range(N_FAKE_FEATURES):
        cols[f"f{i}"] = [
            int(hashlib.md5(f"{r}#{i}".encode()).hexdigest()[:8], 16) for r in refs
        ]
    return pd.DataFrame(cols)


def decode_media_features(docs: DataFrame) -> DataFrame:
    """mapInPandas media 'decode': (doc_id, media_ref, f0..f3).

    Partition-iterator operator: each Arrow batch is decoded as a unit
    (the real-codec batching shape); deterministic fake features here.
    """
    media = explode_spans(docs).where(F.col("kind") == "media").select(
        "doc_id", "media_ref"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(pdf["media_ref"])
            yield pd.concat(
                [pdf[["doc_id", "media_ref"]].reset_index(drop=True), feats], axis=1
            )

    return media.mapInPandas(op, schema=MEDIA_FEATURE_SCHEMA)
