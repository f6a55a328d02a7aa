"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (ray_guide patterns): hashing/sketching happens per batch
inside map_batches; only small sketch rows move through groupby
shuffles (hash-partition on content hash / band hash). Exact dedup is
hash-partition + per-group min; MinHash-LSH explodes each doc into
``bands`` tiny rows, buckets by (band, band_hash), verifies candidate
pairs by true Jaccard, and resolves clusters with min-label
propagation.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

# 64-bit parametrized universal hashing over a base shingle hash
_MERSENNE = (1 << 61) - 1


def _base_shingle_hashes(text: str, shingle_size: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < shingle_size:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i:i + shingle_size]) for i in range(len(toks) - shingle_size + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = struct.unpack("<Q", hashlib.md5(s.encode("utf-8", "replace")).digest()[:8])[0]
    return out


def _hash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_hashes: int, a: np.ndarray, b: np.ndarray,
                      shingle_size: int = 3) -> np.ndarray:
    base = _base_shingle_hashes(text, shingle_size)
    # (H, S) universal hashes mod mersenne prime, min over shingles
    vals = (a[:, None] * (base[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


class MinHasher:
    """Actor-pool stage state: hash parameters computed once per actor."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, shingle_size: int = 3,
                 seed: int = 42):
        assert num_hashes % bands == 0
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_size = shingle_size
        self.a, self.b = _hash_params(num_hashes, seed)

    def signatures(self, texts: pd.Series) -> np.ndarray:
        """(N, H) uint64 signature matrix."""
        out = np.empty((len(texts), self.num_hashes), dtype=np.uint64)
        for i, t in enumerate(texts.fillna("")):
            out[i] = minhash_signature(t, self.num_hashes, self.a, self.b, self.shingle_size)
        return out

    def band_rows(self, doc_ids: np.ndarray, texts: pd.Series) -> pd.DataFrame:
        """Explode docs → (doc_id, band_id, band_hash) rows for the LSH
        bucket groupby."""
        sigs = self.signatures(texts)
        n = len(doc_ids)
        rows = sigs.reshape(n, self.bands, self.rows_per_band)
        # hash each band's slice to one uint64
        band_hash = np.zeros((n, self.bands), dtype=np.uint64)
        for r in range(self.rows_per_band):
            band_hash = band_hash * np.uint64(1099511628211) + rows[:, :, r]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(doc_ids, self.bands),
                "band_id": np.tile(np.arange(self.bands, dtype=np.int64), n),
                "band_hash": band_hash.reshape(-1).astype(np.int64),
            }
        )


def jaccard(text_a: str, text_b: str, shingle_size: int = 3) -> float:
    sa = set(_base_shingle_hashes(text_a, shingle_size).tolist())
    sb = set(_base_shingle_hashes(text_b, shingle_size).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def simhash64(texts: pd.Series, shingle_size: int = 2) -> np.ndarray:
    """64-bit SimHash over token shingles."""
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        base = _base_shingle_hashes(t, shingle_size)
        if len(base) == 0:
            out[i] = 0
            continue
        bitmat = ((base[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        counts = bitmat.sum(axis=0)
        out[i] = np.uint64(0)
        vote = (counts * 2 > len(base)).astype(np.uint64)
        out[i] = (vote << bits).sum(dtype=np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


def connected_components_min_label(pairs: pd.DataFrame, max_rounds: int = 50) -> pd.DataFrame:
    """Min-label propagation over an edge list (a, b) → (node, label).
    Driver-side implementation for candidate sets that are small after
    LSH pruning; at cluster scale the same loop runs as repeated
    groupby-min rounds over a Dataset."""
    labels: dict = {}
    for a, b in pairs[["a", "b"]].itertuples(index=False):
        labels.setdefault(a, a)
        labels.setdefault(b, b)
    for _ in range(max_rounds):
        changed = False
        for a, b in pairs[["a", "b"]].itertuples(index=False):
            la, lb = labels[a], labels[b]
            m = min(la, lb)
            if la != m:
                labels[a] = m
                changed = True
            if lb != m:
                labels[b] = m
                changed = True
        if not changed:
            break
    # path-compress through label chains
    def root(x):
        seen = []
        while labels[x] != x:
            seen.append(x)
            x = labels[x]
        for s in seen:
            labels[s] = x
        return x

    return pd.DataFrame(
        {"node": list(labels), "label": [root(n) for n in list(labels)]}
    )
