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


RESIZE_SCHEMA = "doc_id string, media_ref string, width int, height int, resized_sig long"


def resize_media(docs: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing: one output row per media span with the
    target geometry and a content signature of the resized payload.

    STUB semantics (no codec libs in this container): resized_sig =
    md5-prefix of ``ref@WxH`` — deterministic, SQL-recomputable. A real
    implementation decodes the binary column, resizes per Arrow batch
    (PIL/libvips), and signs the output bytes; schema, batching, and
    partitioning are identical.
    """
    media = explode_spans(docs).where(F.col("kind") == "media").select(
        "doc_id", "media_ref"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "media_ref"]].reset_index(drop=True)
            out["width"] = width
            out["height"] = height
            out["resized_sig"] = [
                int(hashlib.md5(f"{r}@{width}x{height}".encode()).hexdigest()[:15], 16)
                for r in out["media_ref"]
            ]
            yield out

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id string, media_ref string, frame_idx int, frame_sig long"


def sample_frames(
    docs: DataFrame, every_n: int = 5, media_kind: str | None = None
) -> DataFrame:
    """Frame sampling: ONE media row fans out to MANY frame rows (the
    1→N mapInPandas shape a real pyav sampler has). ``media_kind``
    restricts to e.g. 'video' refs; None samples every media span
    (the synthetic fixtures carry img refs only — the fan-out plumbing
    is what's exercised and gated).

    STUB semantics: the 'clip length' is a deterministic function of
    the ref (10 + md5₈(ref) mod 40 frames); every ``every_n``-th frame
    is emitted with an md5-derived frame signature — all recomputable
    in SQL, so the fan-out plumbing itself is oracle-gated.
    """
    media = explode_spans(docs).where(F.col("kind") == "media")
    if media_kind is not None:
        media = media.where(F.col("media_ref").contains(f"://{media_kind}/"))
    media = media.select("doc_id", "media_ref")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_ref": [], "frame_idx": [], "frame_sig": []}
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                n_frames = 10 + int(hashlib.md5(ref.encode()).hexdigest()[:8], 16) % 40
                for idx in range(0, n_frames, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(idx)
                    rows["frame_sig"].append(
                        int(hashlib.md5(f"{ref}#frame{idx}".encode()).hexdigest()[:15], 16)
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=FRAME_SCHEMA)
