"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small)
  query set, score every candidate with a left-fold double dot product
  in pure Column expressions (functions.hashing.dot_fold_col — bit-
  identical to the DuckDB oracle), per-query top-k window. The O(Q·N)
  correctness baseline.

* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH. Signatures
  are sign-bits of plane dot products (same fold kernel), candidates
  share a signature in ≥1 band, exact cosine reranks. Returns exactly
  top-k among candidates — approximate overall (recall measured in
  tests), deterministic given the seed.

* ``embedding_dup_pairs`` — near-duplicate pairs (cosine ≥ threshold)
  blocked by the SAME random-hyperplane LSH bands as ``ann_lsh_topk``:
  a pair is compared iff it collides in ≥1 band, then filtered by
  exact cosine. Band buckets are bounded by the hash (uniform sign
  bits), unlike value-blocking keys (label) whose hot blocks degrade
  to all-pairs crosses. Deterministic given the seed, and the DuckDB
  oracle recomputes the banding independently from literal plane
  constants.

Scale notes: brute force distributes perfectly (map-only over
candidates, broadcast queries, top-k via partial per-partition heaps in
the window agg). The LSH bucket join shuffles on (band, signature) —
uniform md5/hyperplane bits mean no skew; AQE handles stragglers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_lib_spark.functions.hashing import cosine_fold_col, dot_fold_np

ANN_SEED = 7
ANN_BITS = 16
ANN_BANDS = 4  # 4 bits per band


def _queries(embeddings: DataFrame, n_queries: int) -> DataFrame:
    return embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


def cosine_topk(
    embeddings: DataFrame, k: int = 10, n_queries: int = 10
) -> DataFrame:
    """(query_id, rank, neighbor_id): exact top-k by cosine, self excluded,
    ties broken by neighbor_id."""
    q = _queries(embeddings, n_queries)
    cand = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_fold_col(F.col("q_emb"), F.col("c_emb")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
        )
    )


def hyperplanes(dim: int, bits: int = ANN_BITS, seed: int = ANN_SEED) -> np.ndarray:
    """Deterministic (bits, dim) float64 hyperplane normals."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_signature_udf(planes: np.ndarray):
    """Vectorized Arrow UDF: embedding → int signature (sign bits).

    Uses the same left-fold dot kernel as the oracle so bucket
    assignment is deterministic and replayable.
    """

    @F.pandas_udf(T.LongType())
    def sig(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # (batch, dim) float32
        out = np.zeros(len(mat), dtype=np.int64)
        for j in range(planes.shape[0]):
            d = dot_fold_np(mat, planes[j])
            out |= (d > 0).astype(np.int64) << j
        return pd.Series(out)

    return sig


def _dim_of(embeddings: DataFrame, dim: int | None) -> int:
    """Embedding dimensionality without a per-call driver action when
    the caller knows it (the old unconditional `.first()` was a needless
    Spark job on every invocation)."""
    if dim is not None:
        return dim
    return len(embeddings.select("embedding").first()[0])


def _banded(embeddings: DataFrame, bits: int, bands: int, dim: int | None) -> DataFrame:
    """(vec_id, embedding, band, band_sig) — shared LSH banding stage."""
    planes = hyperplanes(_dim_of(embeddings, dim), bits)
    sig = lsh_signature_udf(planes)
    rows = bits // bands
    signed = embeddings.select(
        "vec_id", "embedding", sig(F.col("embedding")).alias("sig")
    )
    band_arr = F.array(
        *[
            F.shiftright(F.col("sig"), bnd * rows).bitwiseAND(F.lit((1 << rows) - 1))
            for bnd in range(bands)
        ]
    )
    return signed.select(
        "vec_id", "embedding", F.posexplode(band_arr).alias("band", "band_sig")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 10,
    bits: int = ANN_BITS,
    bands: int = ANN_BANDS,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH band, exact rerank."""
    banded = _banded(embeddings, bits, bands, dim)
    q = banded.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "band",
        "band_sig",
    )
    c = banded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "band",
        "band_sig",
    )
    cands = (
        q.join(c, ["band", "band_sig"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_emb", "c_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_fold_col(F.col("q_emb"), F.col("c_emb")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
        )
    )


IVF_NLIST = 16
IVF_NPROBE = 4
IVF_STRIDE = 31  # centroid j = embedding of vec_id j*stride (16*31=496 fits all scales)


def ivf_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 10,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors to ``nlist``
    centroid lists, probe the ``nprobe`` closest lists per query, exact
    cosine rerank within the probed lists.

    Centroid 'training' is a deterministic sample (vec_id = j·stride) so
    the numpy golden oracle reproduces the index bit-for-bit; a real
    deployment would k-means on a sample — the dataflow is identical.
    Scale shape: assignment is a broadcast(Nlist)×N map + max_by agg
    (one shuffle on vec_id); the query path touches only nprobe/nlist
    of the corpus — the standard IVF selectivity.
    """
    cent = (
        embeddings.where(
            (F.col("vec_id") % IVF_STRIDE == 0)
            & (F.col("vec_id") < nlist * IVF_STRIDE)
        )
        .select(
            (F.col("vec_id") / IVF_STRIDE).cast("int").alias("list_id"),
            F.col("embedding").alias("c_emb"),
        )
    )
    # assignment: argmax cosine over centroids (broadcast cross join)
    scored = embeddings.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "list_id",
        cosine_fold_col(F.col("embedding"), F.col("c_emb")).alias("ccos"),
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by("list_id", F.struct(F.col("ccos"), -F.col("list_id"))).alias("list_id"),
        F.first("embedding").alias("embedding"),
    )
    # query probes: top-nprobe lists per query
    q = assign.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qprobe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_emb",
            "list_id",
            cosine_fold_col(F.col("q_emb"), F.col("c_emb")).alias("ccos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("list_id").asc())
    probes = (
        qprobe.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= nprobe)
        .select("query_id", "q_emb", "list_id")
    )
    cands = (
        probes.join(assign.select("vec_id", "list_id", "embedding"), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    rescored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_fold_col(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
        )
    )


_QUANT = 1 << 20  # centroid quantization: ~1e-6 resolution


def _assign_lists(embeddings: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, embedding, list_id): argmax-cosine assignment against a
    broadcast centroid table (ties → smaller list_id)."""
    scored = embeddings.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "list_id",
        cosine_fold_col(F.col("embedding"), F.col("c_emb")).alias("ccos"),
    )
    return scored.groupBy("vec_id").agg(
        F.max_by("list_id", F.struct(F.col("ccos"), -F.col("list_id"))).alias("list_id"),
        F.first("embedding").alias("embedding"),
    )


def _lloyd_step(assign: DataFrame) -> DataFrame:
    """One k-means (Lloyd) centroid update, DETERMINISTIC at any
    parallelism: per-dimension sums run over integer-quantized values
    (round(x·2²⁰) as long), so the aggregation order cannot change the
    result — float sums are order-dependent, integer sums are not.
    Mean = (sum/n)/2²⁰ in fixed double op order, reproducible in SQL.
    """
    # floor(x·Q + 0.5): explicit half-up rounding — identical semantics
    # in Spark and DuckDB (their round() tie-breaking conventions differ)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(float(_QUANT)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    sums = (
        assign.select("list_id", F.posexplode(q).alias("pos", "qv"))
        .groupBy("list_id", "pos")
        .agg(F.sum("qv").alias("s"), F.count("*").alias("n"))
    )
    comp = sums.select(
        "list_id",
        "pos",
        (
            F.col("s").cast("double") / F.col("n").cast("double") / F.lit(float(_QUANT))
        ).alias("v"),
    )
    return (
        comp.groupBy("list_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(
            "list_id",
            F.transform(F.col("pv"), lambda x: x.getField("v")).alias("c_emb"),
        )
    )


def ivf_kmeans_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 10,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF ANN with a REAL k-means step: stride-sample init → argmax
    assignment → one deterministic Lloyd centroid update → reassignment
    → nprobe probing → exact rerank. The quantized-integer mean makes
    the trained index bit-reproducible across engines and cluster
    sizes, so the DuckDB oracle recomputes the whole pipeline.
    """
    cent0 = embeddings.where(
        (F.col("vec_id") % IVF_STRIDE == 0) & (F.col("vec_id") < nlist * IVF_STRIDE)
    ).select(
        (F.col("vec_id") / IVF_STRIDE).cast("int").alias("list_id"),
        F.col("embedding").alias("c_emb"),
    )
    a0 = _assign_lists(embeddings, cent0)
    cent1 = _lloyd_step(a0).localCheckpoint(eager=False)
    assign = _assign_lists(embeddings, cent1)

    q = assign.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qprobe = q.crossJoin(F.broadcast(cent1)).select(
        "query_id",
        "q_emb",
        "list_id",
        cosine_fold_col(F.col("q_emb"), F.col("c_emb")).alias("ccos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("list_id").asc())
    probes = (
        qprobe.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= nprobe)
        .select("query_id", "q_emb", "list_id")
    )
    cands = (
        probes.join(assign.select("vec_id", "list_id", "embedding"), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    rescored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_fold_col(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
        )
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = ANN_BITS,
    bands: int = ANN_BANDS,
    dim: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b): pairs colliding in ≥1 LSH band with exact
    cosine ≥ threshold.

    The blocker is the same banded sign-bit join as ``ann_lsh_topk``
    (uniform hash keys → bounded buckets at any scale). The earlier
    label-equality blocking had unbounded block sizes: one hot label
    degenerated to an all-pairs cross within the block.
    """
    banded = _banded(embeddings, bits, bands, dim)
    a = banded.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "band", "band_sig"
    )
    b = banded.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "band", "band_sig"
    )
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
        .where(cosine_fold_col(F.col("ea"), F.col("eb")) >= threshold)
        .select("vec_a", "vec_b")
    )
