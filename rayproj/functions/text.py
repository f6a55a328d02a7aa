"""Text analysis: token counts, quality scores, language id, fingerprints.

Vectorized via pandas string kernels where possible; the per-row parts
(hashing) use C-speed library calls (zlib.crc32 / hashlib) inside a
tight loop — ~1 M rows/s/core, amortized across the actor pool.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[!-/:-@\[-`{-~]")
_WORD = re.compile(r"[A-Za-z']+")

STOPWORDS = frozenset(
    "the and of a to in is it that for on as with was at by an be this are from".split()
)

# tiny per-language trigram anchor profiles (deterministic heuristic —
# NOT a trained model; ids only need to be stable, not linguistically deep)
_LANG_PROFILES = {
    "en": (" th", "the", "he ", " an", "nd ", "ing", " of", "ion"),
    "de": ("der", "ie ", " de", "ein", "sch", "ich", "den", "und"),
    "fr": (" de", "es ", "de ", "le ", "ent", " le", "la ", "ion"),
    "es": (" de", "de ", " la", "os ", "la ", "el ", " el", "ión"),
    "it": (" di", "di ", "to ", " co", "re ", "la ", "che", "zio"),
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count (empty string → 0)."""
    s = texts.fillna("").str.strip()
    n = s.str.split(_WS).map(len).to_numpy(dtype=np.int64)
    return np.where(s.str.len().to_numpy() == 0, 0, n)


def char_count(texts: pd.Series) -> np.ndarray:
    return texts.fillna("").str.len().to_numpy(dtype=np.int64)


def punct_ratio(texts: pd.Series) -> np.ndarray:
    s = texts.fillna("")
    total = s.str.len().to_numpy(dtype=np.float64)
    punct = s.str.count(_PUNCT).to_numpy(dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(total > 0, punct / total, 0.0)


def stopword_ratio(texts: pd.Series) -> np.ndarray:
    def ratio(t: str) -> float:
        words = _WORD.findall(t.lower())
        if not words:
            return 0.0
        return sum(w in STOPWORDS for w in words) / len(words)

    return texts.fillna("").map(ratio).to_numpy(dtype=np.float64)


def quality_score(texts: pd.Series) -> np.ndarray:
    """Composite [0,1] quality heuristic: length, punctuation, stopwords."""
    n = char_count(texts).astype(np.float64)
    len_score = np.clip(n / 1000.0, 0.0, 1.0)
    p = punct_ratio(texts)
    punct_score = 1.0 - np.clip(np.abs(p - 0.03) * 10.0, 0.0, 1.0)
    sw = stopword_ratio(texts)
    sw_score = np.clip(sw * 4.0, 0.0, 1.0)
    return 0.4 * len_score + 0.3 * punct_score + 0.3 * sw_score


def lang_id(texts: pd.Series) -> np.ndarray:
    """n-gram-overlap language guess over the profile table."""
    langs = list(_LANG_PROFILES)

    def guess(t: str) -> str:
        tl = " " + t.lower()[:400] + " "
        best, best_score = "und", 0
        for lang in langs:
            score = sum(tl.count(g) for g in _LANG_PROFILES[lang])
            if score > best_score:
                best, best_score = lang, score
        return best

    return texts.fillna("").map(guess).to_numpy()


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """Stable 64-bit document fingerprint (first 8 bytes of md5),
    returned as uint64 — no signed wrap, so the value matches any
    unsigned cross-system comparison byte-for-byte."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8", "replace")).digest()[:8], "big")
            for t in texts.fillna("")
        ),
        dtype=np.uint64,
        count=len(texts),
    )


def md5_hex(texts: pd.Series) -> np.ndarray:
    """Hex md5 of the utf-8 text — matches SQL md5() for the dedup oracle."""
    return np.array(
        [hashlib.md5(t.encode("utf-8", "replace")).hexdigest() for t in texts.fillna("")],
        dtype=object,
    )


def crc32(texts: pd.Series) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8", "replace")) for t in texts.fillna("")),
        dtype=np.int64,
        count=len(texts),
    )
