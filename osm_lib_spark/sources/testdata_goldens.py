"""Golden oracles for the training-data operators whose semantics are
not practical to re-derive in DuckDB SQL (MinHash-LSH candidate
generation, hyperplane-LSH ANN). Computed over the driver's sf0.01
tables with integer-exact / fold-exact numpy+pandas replications of the
documented algorithms (functions.hashing), written once to
fixtures/testdata_golden/.

These are same-algorithm, different-engine oracles: they validate the
distributed Spark execution (shuffles, joins, Arrow batching), while
the algorithm definitions themselves are pinned by unit tests on tiny
hand-checked inputs (tests/test_trainingdata.py).
"""

from __future__ import annotations

import hashlib
import os
from itertools import combinations

import numpy as np
import pandas as pd

from osm_lib_spark.functions.hashing import dot_fold_np, md5_int_py
from osm_lib_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_PRIME,
    NUM_BANDS,
    NUM_PERM,
    SHINGLE_N,
    _perm_coeffs,
)
from osm_lib_spark.operators.similarity import ANN_BANDS, ANN_BITS, hyperplanes

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "testdata_golden",
)
SF_DIR = "/root/testdata/sf0.01"


def _shingles(text: str, n: int = SHINGLE_N) -> list[str]:
    toks = text.strip().split()
    upper = max(len(toks) - n, 0)
    grams = [" ".join(toks[i : i + n]) for i in range(upper + 1)]
    # preserve first-seen order like F.array_distinct
    seen, out = set(), []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def golden_minhash_pairs(documents: pd.DataFrame) -> pd.DataFrame:
    a, b = _perm_coeffs(NUM_PERM)
    a = np.array(a, dtype=np.int64)
    b = np.array(b, dtype=np.int64)
    rows = NUM_PERM // NUM_BANDS

    doc_ids = documents["doc_id"].to_numpy()
    sh_sets: dict[int, set[str]] = {}
    band_map: dict[tuple[int, str], list[int]] = {}
    for did, text in zip(doc_ids, documents["text"]):
        sh = _shingles(text)
        sh_sets[did] = set(sh)
        hs = np.array([md5_int_py(s, 15) % MINHASH_PRIME for s in sh], dtype=np.int64)
        sig = (a[:, None] * hs[None, :] + b[:, None]) % MINHASH_PRIME
        sig = sig.min(axis=1)
        for bnd in range(NUM_BANDS):
            key = ",".join(str(v) for v in sig[bnd * rows : (bnd + 1) * rows])
            band_map.setdefault((bnd, key), []).append(did)

    cands: set[tuple[int, int]] = set()
    for ids in band_map.values():
        if len(ids) > 1:
            for x, y in combinations(sorted(ids), 2):
                cands.add((x, y))

    out = []
    for x, y in sorted(cands):
        inter = len(sh_sets[x] & sh_sets[y])
        sa, sb = len(sh_sets[x]), len(sh_sets[y])
        if inter >= JACCARD_THRESHOLD * (sa + sb - inter):
            out.append((x, y, inter, sa, sb))
    return pd.DataFrame(
        out, columns=["doc_a", "doc_b", "inter", "size_a", "size_b"]
    ).astype("int64")


def golden_ann_lsh_topk(
    embeddings: pd.DataFrame, k: int = 10, n_queries: int = 10
) -> pd.DataFrame:
    mat = np.stack(embeddings["embedding"].to_numpy()).astype(np.float64)
    ids = embeddings["vec_id"].to_numpy()
    planes = hyperplanes(mat.shape[1], ANN_BITS)
    sig = np.zeros(len(mat), dtype=np.int64)
    for j in range(ANN_BITS):
        sig |= (dot_fold_np(mat, planes[j]) > 0).astype(np.int64) << j
    rows = ANN_BITS // ANN_BANDS

    norms = np.sqrt(dot_fold_np(mat, mat))
    out = []
    for q in range(n_queries):
        qi = int(np.nonzero(ids == q)[0][0])
        cand_mask = np.zeros(len(mat), dtype=bool)
        for bnd in range(ANN_BANDS):
            band = (sig >> (bnd * rows)) & ((1 << rows) - 1)
            cand_mask |= band == band[qi]
        cand_mask[qi] = False
        cand_idx = np.nonzero(cand_mask)[0]
        cos = dot_fold_np(mat[cand_idx], mat[qi]) / (norms[cand_idx] * norms[qi])
        order = np.lexsort((ids[cand_idx], -cos))[:k]
        for rank, oi in enumerate(order, start=1):
            out.append((q, rank, int(ids[cand_idx][oi])))
    return pd.DataFrame(out, columns=["query_id", "rank", "neighbor_id"]).astype(
        "int64"
    )


def golden_ivf_topk(
    embeddings: pd.DataFrame, k: int = 10, n_queries: int = 10
) -> pd.DataFrame:
    from osm_lib_spark.operators.similarity import IVF_NLIST, IVF_NPROBE, IVF_STRIDE

    mat = np.stack(embeddings["embedding"].to_numpy()).astype(np.float64)
    ids = embeddings["vec_id"].to_numpy()
    order = np.argsort(ids)
    mat, ids = mat[order], ids[order]
    norms = np.sqrt(dot_fold_np(mat, mat))

    cent_ids = [j * IVF_STRIDE for j in range(IVF_NLIST)]
    cent_idx = [int(np.nonzero(ids == c)[0][0]) for c in cent_ids]
    # assignment: argmax cosine over centroids (first max = smallest list)
    cos_cent = np.stack(
        [
            dot_fold_np(mat, mat[ci]) / (norms * norms[ci])
            for ci in cent_idx
        ],
        axis=1,
    )
    assign = np.argmax(cos_cent, axis=1)

    out = []
    for qv in range(n_queries):
        qi = int(np.nonzero(ids == qv)[0][0])
        probe_scores = cos_cent[qi]
        probes = np.lexsort((np.arange(IVF_NLIST), -probe_scores))[:IVF_NPROBE]
        cand_mask = np.isin(assign, probes)
        cand_mask[qi] = False
        ci = np.nonzero(cand_mask)[0]
        cos = dot_fold_np(mat[ci], mat[qi]) / (norms[ci] * norms[qi])
        top = np.lexsort((ids[ci], -cos))[:k]
        for rank, oi in enumerate(top, start=1):
            out.append((qv, rank, int(ids[ci][oi])))
    return pd.DataFrame(out, columns=["query_id", "rank", "neighbor_id"]).astype("int64")


def write_goldens(sf_dir: str = SF_DIR, out_dir: str = GOLDEN_DIR) -> None:
    os.makedirs(out_dir, exist_ok=True)
    documents = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    embeddings = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    golden_minhash_pairs(documents).to_parquet(
        os.path.join(out_dir, "minhash_pairs.parquet"), index=False
    )
    golden_ann_lsh_topk(embeddings).to_parquet(
        os.path.join(out_dir, "ann_lsh_topk.parquet"), index=False
    )
    golden_ivf_topk(embeddings).to_parquet(
        os.path.join(out_dir, "ann_ivf_topk.parquet"), index=False
    )


if __name__ == "__main__":
    write_goldens()
    print("wrote", GOLDEN_DIR)
