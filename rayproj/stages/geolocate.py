"""Deterministic geolocation stage: (url | doc_id, lang) → (lon, lat).

Per FIXTURES.md F1: coordinates derive deterministically from the key,
clustered per language around that language's anchor region so
groupby(cell) exhibits realistic Zipfian hot-cell skew. Two variants:

* ``geolocate_ids`` — pure integer arithmetic on an int64 key, exactly
  reproducible in ANSI SQL (the driver's oracle path).
* ``geolocate_urls`` — crc32 of the url (the production path for the
  Common-Crawl-style page table).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# per-language anchor regions (lon, lat, spread_deg) — Zipf-skewed usage
LANG_ANCHORS = {
    "en": (-95.0, 38.0, 25.0),
    "de": (10.0, 51.0, 8.0),
    "fr": (2.0, 47.0, 8.0),
    "es": (-4.0, 40.0, 12.0),
    "it": (12.0, 43.0, 6.0),
    "pt": (-48.0, -12.0, 12.0),
    "nl": (5.0, 52.0, 4.0),
    "ru": (50.0, 56.0, 20.0),
    "ja": (138.0, 36.0, 5.0),
    "zh": (110.0, 33.0, 15.0),
}
DEFAULT_ANCHOR = (0.0, 20.0, 40.0)


def geolocate_ids(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer-arithmetic geolocation — ANSI-SQL-reproducible:
    lon = ((id*9973) % 35000)/100 − 175 + 0.005
    lat = ((id*7919) % 16000)/100 −  80 + 0.005
    """
    ids = np.asarray(ids, dtype=np.int64)
    lon = ((ids * 9973) % 35000) / 100.0 - 175.0 + 0.005
    lat = ((ids * 7919) % 16000) / 100.0 - 80.0 + 0.005
    return lon, lat


def geolocate_urls(urls, langs) -> tuple[np.ndarray, np.ndarray]:
    """crc32(url) scattered around the language's anchor region."""
    h = np.fromiter(
        (zlib.crc32(u.encode("utf-8", "replace")) for u in urls),
        dtype=np.uint64,
        count=len(urls),
    )
    u1 = (h & np.uint64(0xFFFF)).astype(np.float64) / 65535.0
    u2 = ((h >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.float64) / 65535.0
    lon = np.empty(len(urls))
    lat = np.empty(len(urls))
    langs = np.asarray(langs)
    for lang in np.unique(langs):
        ax, ay, spread = LANG_ANCHORS.get(str(lang), DEFAULT_ANCHOR)
        m = langs == lang
        lon[m] = ax + (u1[m] - 0.5) * 2 * spread
        lat[m] = ay + (u2[m] - 0.5) * spread
    np.clip(lon, -179.99, 179.99, out=lon)
    np.clip(lat, -84.99, 84.99, out=lat)
    return lon, lat


def geolocate_batch_arrow(batch: pa.Table, key_col: str = "url",
                          lang_col: str = "lang") -> pa.Table:
    """map_batches UDF: append lon/lat columns."""
    if pa.types.is_integer(batch.schema.field(key_col).type):
        lon, lat = geolocate_ids(batch.column(key_col).to_numpy())
    else:
        urls = batch.column(key_col).to_numpy(zero_copy_only=False)
        langs = batch.column(lang_col).to_numpy(zero_copy_only=False)
        lon, lat = geolocate_urls(urls, langs)
    out = batch.append_column("lon", pa.array(lon, type=pa.float64()))
    return out.append_column("lat", pa.array(lat, type=pa.float64()))
