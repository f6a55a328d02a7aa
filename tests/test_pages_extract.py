"""Byte-identity invariant of the pages pipeline (BASELINE.json
input_hint): extracted text per url must equal the stored text column
byte-for-byte, via BOTH the scalar reference extractor and the
vectorized Arrow kernel, and the fixture must regenerate
deterministically."""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayproj.sources.pages import (
    ensure_pages_fixture,
    extract_text_arrow,
    extract_text_from_html,
    make_pages_block,
)


def test_scalar_extractor_roundtrip():
    t = make_pages_block(7, 0, 400)
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    assert [extract_text_from_html(h) for h in htmls] == texts


def test_arrow_extractor_matches_scalar_and_truth():
    t = make_pages_block(7, 1000, 400)
    out = extract_text_arrow(t.column("html"))
    assert out.to_pylist() == t.column("text").to_pylist()


def test_entities_actually_exercised():
    # the corpus must contain pages whose html needed escaping,
    # otherwise the decode path is vacuous
    t = make_pages_block(7, 0, 2000)
    joined = b"|".join(t.column("html").to_pylist())
    for ent in (b"&amp;", b"&lt;", b"&gt;", b"&quot;", b"&#39;"):
        assert ent in joined, ent


def test_fixture_deterministic_and_idempotent():
    import pyarrow.parquet as pq

    p = ensure_pages_fixture()
    a = pq.read_table(p)
    mtime = os.path.getmtime(p)
    assert ensure_pages_fixture() == p
    assert os.path.getmtime(p) == mtime  # second call is a no-op
    b = make_pages_block(42, 0, a.num_rows)
    assert a.column("text").to_pylist() == b.column("text").to_pylist()
    assert a.column("url").to_pylist() == b.column("url").to_pylist()
