"""Multimodal (media) column handling.

Media spans are opaque references (``media_ref``); the binary payload
is a sibling ``binary`` column materialized by ``media_payloads`` (at
scale: an object-store fetch keyed by the ref — here a deterministic
synthetic PNG writer stands in for the fetch, clearly marked). The
DECODE is REAL: ``functions/png.py`` is a from-scratch PNG codec
(signature/chunk/CRC walk, zlib inflate, all five row filters, pure
numpy — no PIL in this container), so ``decode_media_features`` and
``resize_media`` actually parse compressed image bytes per Arrow batch
and compute features / resized signatures FROM DECODED PIXELS.

Oracle-checkability: the synthetic payload for a ref is a w×h RGB
gradient pixel[y,x,c] = base_c + x + y with (base_c, w, h) read from
md5(ref) bytes — so per-channel pixel SUMS have closed forms the
DuckDB oracle recomputes from md5 alone. If the decoder (or resize)
mis-reads even one pixel, the gate hash breaks: the decode path itself
is end-to-end verified, not just the plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.png import png_decode, png_encode, resize_nearest
from osm_lib_spark.sources.span_codec import explode_spans

N_FEATURES = 4

MEDIA_FEATURE_SCHEMA = (
    "doc_id string, media_ref string, "
    + ", ".join(f"f{i} long" for i in range(N_FEATURES))
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


def synth_payload(ref: str) -> bytes:
    """Deterministic 'object-store fetch' stand-in: the payload for a
    ref is a real zlib-compressed PNG of a w×h RGB gradient with
    pixel[y, x, c] = base_c + x + y, where (base_0..2, w, h) come from
    md5(ref) bytes 0-4 (base_c = byte_c % 128, dims = 8 + byte % 25;
    max pixel value 127+31+31 = 189 < 256, no wraparound — per-channel
    sums therefore have md5-derivable closed forms the oracle checks).
    At scale this function is the only thing a production build
    replaces (S3/GCS ranged GET by ref)."""
    d = hashlib.md5(ref.encode()).digest()
    base = [d[0] % 128, d[1] % 128, d[2] % 128]
    w, h = 8 + d[3] % 25, 8 + d[4] % 25
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([b + xx + yy for b in base], axis=2).astype(np.uint8)
    return png_encode(img)


PAYLOAD_SCHEMA = "doc_id string, media_ref string, payload binary, n_bytes long"


def media_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, media_ref, payload, n_bytes): the binary media column.

    mapInPandas fetch: one Arrow batch of refs in, one batch of PNG
    byte payloads out — the batching/partitioning shape of a real
    object-store fetch stage (payload bytes never touch the driver)."""
    media = explode_spans(docs).where(F.col("kind") == "media").select(
        "doc_id", "media_ref"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "media_ref"]].reset_index(drop=True)
            payloads = [synth_payload(r) for r in out["media_ref"]]
            out["payload"] = payloads
            out["n_bytes"] = [len(p) for p in payloads]
            yield out

    return media.mapInPandas(op, schema=PAYLOAD_SCHEMA)


def decode_media_features(docs: DataFrame) -> DataFrame:
    """REAL media decode: (doc_id, media_ref, f0..f3) where f0/f1 are
    the decoded image's width/height (from the PNG IHDR) and f2/f3 are
    the pixel SUMS of channels 0/1 of the decoded array — recomputed by
    the oracle from the synthetic payload's closed form, so a decoder
    bug breaks the gate hash.

    mapInPandas partition-iterator: each Arrow batch fetches payload
    bytes and decodes them (zlib inflate + unfilter per image, numpy)
    — the exact batching shape of a PIL/libvips decoder.
    """
    pay = media_payloads(docs)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "media_ref"]].reset_index(drop=True)
            f0, f1, f2, f3 = [], [], [], []
            for raw in pdf["payload"]:
                img = png_decode(bytes(raw))
                f0.append(img.shape[1])
                f1.append(img.shape[0])
                f2.append(int(img[:, :, 0].astype(np.int64).sum()))
                f3.append(int(img[:, :, 1].astype(np.int64).sum()))
            out["f0"], out["f1"], out["f2"], out["f3"] = f0, f1, f2, f3
            yield out

    return pay.mapInPandas(op, schema=MEDIA_FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id string, media_ref string, width int, height int, resized_sig long"


def resize_media(docs: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """REAL image resize: decode the payload, nearest-neighbor resample
    to (width, height) by integer index mapping (src = (dst·in)//out),
    and sign the result with the channel-0 pixel sum of the RESIZED
    array — which the oracle recomputes in SQL from the synthetic
    payload's closed form plus the same floor index map. A wrong
    resample (off-by-one index math, wrong rounding) breaks the hash.
    """
    pay = media_payloads(docs)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "media_ref"]].reset_index(drop=True)
            sigs = []
            for raw in pdf["payload"]:
                resized = resize_nearest(png_decode(bytes(raw)), width, height)
                sigs.append(int(resized[:, :, 0].astype(np.int64).sum()))
            out["width"] = width
            out["height"] = height
            out["resized_sig"] = sigs
            yield out

    return pay.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id string, media_ref string, frame_idx int, frame_sig long"


def sample_frames(
    docs: DataFrame, every_n: int = 5, media_kind: str | None = None
) -> DataFrame:
    """Frame sampling: ONE media row fans out to MANY frame rows (the
    1→N mapInPandas shape a real pyav sampler has). ``media_kind``
    restricts to e.g. 'video' refs; None samples every media span
    (the synthetic fixtures carry img refs only).

    The fan-out is driven by the DECODED payload, not the ref string:
    the 'clip length' is 10 + (w·h) % 40 frames with (w, h) read from
    the decoded image, and every sampled frame's signature is
    sum(channel 0)·64 + frame_idx — so a decoder bug changes both the
    ROW COUNT and the values, and the oracle (which re-derives w/h and
    the pixel sum from the synthetic payload's closed form) catches
    either.
    """
    pay = media_payloads(docs)
    if media_kind is not None:
        pay = pay.where(F.col("media_ref").contains(f"://{media_kind}/"))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_ref": [], "frame_idx": [], "frame_sig": []}
            for doc_id, ref, raw in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                img = png_decode(bytes(raw))
                h, w = img.shape[:2]
                sum_c0 = int(img[:, :, 0].astype(np.int64).sum())
                n_frames = 10 + (w * h) % 40
                for idx in range(0, n_frames, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(idx)
                    rows["frame_sig"].append(sum_c0 * 64 + idx)
            yield pd.DataFrame(rows)

    return pay.mapInPandas(op, schema=FRAME_SCHEMA)
