"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k per batch against a broadcast query
matrix (one NumPy matmul per batch) + tiny partial-top-k merge — the
same no-shuffle pattern as spatial kNN. Scale path: IVF-style coarse
quantizer (deterministic centroids) bucketing vectors so each query
only scans its probe buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0, 1.0, norms)


def cosine_topk_batch(
    vec_ids: np.ndarray, vectors: np.ndarray, queries: np.ndarray, k: int
) -> pd.DataFrame:
    """Local top-k per query for one batch. vectors (N, D), queries (Q, D)."""
    vn = _normalize(vectors.astype(np.float64))
    qn = _normalize(queries.astype(np.float64))
    sims = qn @ vn.T  # (Q, N)
    n = sims.shape[1]
    kk = min(k, n)
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    rows = []
    for q in range(sims.shape[0]):
        idx = part[q]
        order = np.lexsort((vec_ids[idx], -sims[q, idx]))
        sel = idx[order]
        rows.append(
            pd.DataFrame(
                {
                    "query_id": np.int64(q),
                    "vec_id": vec_ids[sel],
                    "cosine": sims[q, sel],
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    df = partials.copy()
    df["neg"] = -df["cosine"]
    df = df.sort_values(["query_id", "neg", "vec_id"], kind="mergesort").drop(columns="neg")
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def ann_dataset(ds, queries: np.ndarray, k: int, id_col="vec_id", vec_col="embedding"):
    """Dataset-level brute-force cosine top-k (map_batches + merge)."""

    def batch_fn(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df[vec_col].to_numpy())
        return cosine_topk_batch(df[id_col].to_numpy(), vecs, queries, k)

    partials = ds.map_batches(batch_fn, batch_format="pandas")
    return merge_topk(partials.to_pandas(), k)


class IVFIndex:
    """IVF-style bucketing: deterministic centroids (first C distinct
    vectors, normalized), nprobe-bucket search. Assignment runs per
    batch (map_batches); the index is broadcast actor state."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids.astype(np.float64))

    @classmethod
    def train(cls, sample: np.ndarray, n_centroids: int, iters: int = 5):
        cents = _normalize(sample[:n_centroids].astype(np.float64))
        data = _normalize(sample.astype(np.float64))
        for _ in range(iters):
            assign = np.argmax(data @ cents.T, axis=1)
            for c in range(len(cents)):
                members = data[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
            cents = _normalize(cents)
        return cls(cents)

    def assign(self, vectors: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(vectors.astype(np.float64)) @ self.centroids.T, axis=1)

    def probe_lists(self, queries: np.ndarray, nprobe: int) -> np.ndarray:
        sims = _normalize(queries.astype(np.float64)) @ self.centroids.T
        # stable: ties resolve to the lower centroid id (matches the
        # SQL oracle's ORDER BY cosine DESC, centroid_id)
        return np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
