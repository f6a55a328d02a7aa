"""The round-2 scale-killer regression test: a corpus dominated by
identical/empty documents (all sketch to the same value — empty -> 0)
must flow through simhash_neardup in linear time/output, not as an
O(n^2) all-pairs group."""

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayproj.functions.dedup import simhash_neardup_pipeline


def test_empty_doc_skew_linear(ray_session):
    import ray.data as rd

    n = 100_000
    ids = np.arange(n, dtype=np.int64)
    # 99.99% of docs sketch to 0 (the empty-document class) + planted
    # near-identical sketches at hamming 1 and 2, plus one far sketch
    sk = np.zeros(n, dtype=np.int64)
    sk[0] = 0x1234_5678_9ABC_0000
    sk[1] = 0x1234_5678_9ABC_0001  # hamming 1 from sk[0]
    sk[2] = 0x1234_5678_9ABC_0003  # hamming 2 from sk[0]
    sk[3] = 0x7654_1111_2222_3333  # far from everything
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "simhash": sk}))

    t0 = time.monotonic()
    out = simhash_neardup_pipeline(ds).to_pandas()
    elapsed = time.monotonic() - t0

    # linear output: every empty doc pairs once with the class rep
    zero = out[out["hamming"] == 0]
    n_empty = int((sk == 0).sum())
    assert len(zero) == n_empty - 1
    assert (zero["doc_a"] == zero["doc_b"].map(lambda _: zero["doc_a"].min())).all()
    # the planted near-identical pair survives at hamming 1..3
    near = out[out["hamming"] > 0]
    assert {(0, 1)} <= set(zip(near["doc_a"], near["doc_b"]))
    # O(n): far under any quadratic blow-up budget
    assert elapsed < 120, f"skew path took {elapsed:.1f}s"


def test_identical_docs_one_class(ray_session):
    import ray.data as rd

    n = 5000
    sk = np.full(n, 12345, dtype=np.int64)
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "simhash": sk})
    )
    out = simhash_neardup_pipeline(ds).to_pandas()
    assert len(out) == n - 1
    assert (out["hamming"] == 0).all()
    assert (out["doc_a"] == 0).all()
    assert sorted(out["doc_b"]) == list(range(1, n))
