"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Engine additions for the training-data pipeline. Design notes per
operator (scale-first):

* exact         — one hash aggregate on md5(text); fully shuffled
                  partial+final agg, no skew (md5 keys are uniform).
* minhash_lsh   — shingle → 60-bit md5 hashes → P permutations
                  ((a_i·h + b_i) mod prime) folded with array_min, ALL
                  in Column expressions (no Python); band keys explode
                  → self-equi-join on (band, band_sig) → candidate
                  pairs → exact-Jaccard verify. The band join is the
                  only quadratic-risk step and it only pairs docs that
                  collide in a band — the standard LSH bound.
* simhash       — 60-bit sign-vote fingerprint in Column expressions;
                  near-dups = equal 15-hex-digit prefix bands (cheap
                  grouping analog of hamming-distance buckets).
* ngram_jaccard — exact Jaccard via distinct-shingle self-join:
                  |A∩B| from a join on shingle, sizes from a groupBy;
                  expressible in pure SQL (the DuckDB oracle re-derives
                  it independently).

All integer arithmetic is md5-prefix based (functions.hashing) so
DuckDB/numpy oracles agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_lib_spark.functions.hashing import md5_int_col

MINHASH_PRIME = (1 << 31) - 1  # Mersenne; a_i·h + b_i stays < 2^62
NUM_PERM = 32
NUM_BANDS = 8  # 4 rows per band
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5


def _perm_coeffs(num_perm: int = NUM_PERM, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic permutation coefficients (odd a, any b), seed-fixed."""
    rng = np.random.default_rng(seed)
    a = (rng.integers(1, MINHASH_PRIME, size=num_perm, dtype=np.int64) | 1).tolist()
    b = rng.integers(0, MINHASH_PRIME, size=num_perm, dtype=np.int64).tolist()
    return a, b


def shingles_col(text, n: int = SHINGLE_N):
    """Distinct word n-gram shingles of a text column (array<string>)."""
    toks = F.split(F.trim(text), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(grams)


def exact_duplicates(documents: DataFrame, min_count: int = 2) -> DataFrame:
    """(text_md5, n_dups, keep_id): content groups by exact text;
    keep_id = min doc_id (the canonical survivor). min_count=2 lists
    duplicate groups only; min_count=1 is the full dedup table."""
    return (
        documents.groupBy(F.md5(F.col("text").cast("binary")).alias("text_md5"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_dups") >= min_count)
    )


def minhash_signatures(documents: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, sig: array<long>) — all JVM-side; one pass over shingles.

    sig_i = min over shingles s of (a_i·h60(s) + b_i) mod prime, with
    h60(s) reduced mod prime first so products fit in int64.
    """
    a, b = _perm_coeffs(num_perm)
    a_arr = F.array(*[F.lit(x) for x in a])
    b_arr = F.array(*[F.lit(x) for x in b])
    sh = shingles_col(F.col("text"))
    hashes = F.transform(sh, lambda s: md5_int_col(s, 15) % MINHASH_PRIME)
    # Materialization barrier: without it CollapseProject inlines the
    # md5 hash array into EVERY permutation lambda (num_perm× md5 per
    # shingle) and later consumers inline the whole signature again —
    # measured 50× slowdown. localCheckpoint cuts the logical plan so
    # hashes are computed once per row.
    hashed = documents.select("doc_id", hashes.alias("h")).localCheckpoint(eager=True)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("h"),
                lambda h: (F.element_at(a_arr, i + 1) * h + F.element_at(b_arr, i + 1))
                % MINHASH_PRIME,
            )
        ),
    )
    return hashed.select("doc_id", sig.alias("sig"))


def minhash_candidate_pairs(
    documents: DataFrame, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS
) -> DataFrame:
    """LSH banding: docs sharing any band signature → candidate pairs
    (doc_a < doc_b). Band key is the band's signature slice rendered as
    a string (exact, no second-level hashing)."""
    rows = num_perm // num_bands
    # banding happens INSIDE the same projection as the signature (the
    # transform references `sig` as a lambda variable, so it is computed
    # once per row — no second materialization barrier needed; the only
    # eager checkpoint is the md5 hash array inside minhash_signatures)
    sigs = minhash_signatures(documents, num_perm)
    band_of = lambda sig_col: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda bnd: F.array_join(
            F.transform(
                F.slice(sig_col, bnd * rows + 1, rows), lambda v: v.cast("string")
            ),
            ",",
        ),
    )
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(F.array(F.col("sig")), band_of).getItem(0)
        ).alias("band", "band_sig"),
    )
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    # pure equi-join on (band, band_sig) — the doc_a < doc_b predicate is
    # a post-filter, NOT part of the join condition, so Catalyst plans a
    # hash join (folding it in can demote the plan to a nested loop)
    return (
        left.join(right, ["band", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dup_pairs(
    documents: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Candidates verified by EXACT shingle Jaccard ≥ threshold.

    Verification joins each candidate pair back to its distinct-shingle
    sets and computes |A∩B| / |A∪B| exactly — LSH only prunes, it never
    decides. Output: (doc_a, doc_b, inter, size_a, size_b), ints only.
    """
    cands = minhash_candidate_pairs(documents).localCheckpoint(eager=False)
    sh = documents.select(
        "doc_id", F.explode(shingles_col(F.col("text"))).alias("shingle")
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))

    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), "doc_b")
        .where(
            F.col("inter")
            >= F.lit(threshold) * (F.col("size_a") + F.col("size_b") - F.col("inter"))
        )
    )
    return out.select("doc_a", "doc_b", "inter", "size_a", "size_b")


def simhash(documents: DataFrame, bits: int = 60) -> DataFrame:
    """(doc_id, simhash) — sign-vote over token 60-bit hashes.

    bit_j = 1 iff Σ_tokens (2·bit_j(h(t)) − 1) > 0. Duplicate tokens
    vote multiply (standard simhash weighting by term frequency).
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    hashes = F.transform(toks, lambda t: md5_int_col(t, 15))
    # shift amounts must be Python ints (F.shiftright takes a literal),
    # so the bit loop unrolls at plan-build time — still one JVM pass.
    def _vote_fn(j):
        # closure, not a default arg: PySpark maps lambda arity to
        # higher-order-function parameters
        return lambda v, h: v + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)

    bit_terms = []
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_fn(j))
        bit_terms.append(F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(0))
    sim = bit_terms[0]
    for term in bit_terms[1:]:
        sim = sim + term
    return documents.select("doc_id", sim.alias("simhash"))


def simhash_bucket_pairs(documents: DataFrame, prefix_hex: int = 8) -> DataFrame:
    """Near-dup candidates: equal high-prefix simhash bucket join.

    (The hamming-ball expansion is a multi-probe refinement; prefix
    bucketing is the scale-path first stage.)
    """
    s = simhash(documents).withColumn(
        "bucket", F.shiftright(F.col("simhash"), 60 - prefix_hex * 4)
    )
    a = s.select(F.col("doc_id").alias("doc_a"), "bucket", F.col("simhash").alias("sim_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), "bucket", F.col("simhash").alias("sim_b"))
    return (
        a.join(b, ["bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = SHINGLE_N, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ threshold via shingle equi-join.

    No LSH — the join on shingle only pairs docs sharing ≥1 shingle;
    with selective shingles this is the exact-but-prunable baseline the
    SQL oracle re-derives independently.
    """
    sh = documents.select(
        "doc_id", F.explode(shingles_col(F.col("text"), n)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), "doc_b")
        .where(
            F.col("inter")
            >= F.lit(threshold) * (F.col("size_a") + F.col("size_b") - F.col("inter"))
        )
        .select("doc_a", "doc_b", "inter", "size_a", "size_b")
    )
