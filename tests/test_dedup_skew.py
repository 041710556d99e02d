"""Hot-shingle skew: prefix filtering must bound candidate pairs where
the naive shingle self-join blows up quadratically, while returning the
exact same threshold-Jaccard pair set (verified against a pure-python
all-pairs recomputation).
"""

import itertools

import pytest

from osm_lib_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    SHINGLE_N,
    ngram_jaccard_pairs,
    ngram_prefix_candidates,
)

HOT = "lorem ipsum dolor sit amet consectetur"  # 6 tokens → 4 hot shingles
N_DOCS = 400


def _doc_text(i: int) -> str:
    if i in (0, 1):  # planted near-dup pair: differs by one token
        uniq = " ".join(f"shared{j}" for j in range(12)) + f" tail{i}"
    elif i in (2, 3):  # planted exact dup pair
        uniq = " ".join(f"twin{j}" for j in range(12))
    else:
        uniq = " ".join(f"u{i}x{j}" for j in range(8))
    return f"{HOT} {uniq}"


def _py_shingles(text: str, n: int = SHINGLE_N) -> frozenset:
    toks = text.split()
    return frozenset(
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)
    )


def _py_expected_pairs(texts: dict[int, str], t: float) -> set:
    out = set()
    sets = {i: _py_shingles(s) for i, s in texts.items()}
    for a, b in itertools.combinations(sorted(texts), 2):
        inter = len(sets[a] & sets[b])
        if inter >= t * len(sets[a] | sets[b]):
            out.add((a, b))
    return out


@pytest.fixture(scope="module")
def skew_docs(spark):
    rows = [(i, _doc_text(i)) for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_prefix_filter_bounds_candidates_under_skew(skew_docs):
    """Every doc shares the 4 hot shingles, so the naive self-join
    produces ≥ 4·C(400,2) ≈ 319k intersection rows. Prefix filtering
    must keep candidates within a small multiple of the true pairs."""
    n_cands = ngram_prefix_candidates(skew_docs).count()
    naive_pairs = N_DOCS * (N_DOCS - 1) // 2
    assert n_cands < naive_pairs * 0.01, n_cands  # >99% pruned
    assert n_cands < 50


def test_prefix_filter_exact_under_skew(skew_docs):
    texts = {i: _doc_text(i) for i in range(N_DOCS)}
    expected = _py_expected_pairs(texts, JACCARD_THRESHOLD)
    assert expected  # the planted dups are really above threshold
    got = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(skew_docs).collect()
    }
    assert got == expected


def test_simhash_hamming_pairs_exact(spark):
    """Pigeonhole banding must find EXACTLY the brute-force Hamming
    ball: planted docs with 0-3 token substitutions around a base text
    plus distant random docs."""
    import itertools

    from osm_lib_spark.operators.dedup import simhash, simhash_hamming_pairs

    base = " ".join(f"tok{j}" for j in range(40))
    rows = [(0, base)]
    for i in range(1, 5):  # light edits → small hamming
        toks = base.split()
        for j in range(i):
            toks[j * 7] = f"edit{i}_{j}"
        rows.append((i, " ".join(toks)))
    for i in range(5, 30):  # unrelated docs
        rows.append((i, " ".join(f"u{i}w{j}" for j in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sims = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    expected = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for a, b in itertools.combinations(sorted(sims), 2)
        if bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_hamming_pairs(docs, max_hamming=3).collect()
    }
    assert got == expected
    assert expected  # the planted near-dups really are within the ball
