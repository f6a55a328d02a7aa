"""Checkpoint-resume + per-partition lineage + the byte-identity
invariant (north rule: byte-identical extracted text per url/doc)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from rayproj.pipelines.lineage import checkpointed_flagship

SRC = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "flagship_out")


def test_checkpoint_run_resume_and_byte_identity(ray_session, out_dir):
    recs, skipped = checkpointed_flagship(SRC, out_dir, n_partitions=4)
    assert len(recs) == 4 and skipped == []
    assert sum(r["metrics"]["rows"] for r in recs) == 500
    for r in recs:
        assert "seconds" in r["metrics"] and r["digest"]

    # full re-run: everything skips
    recs2, skipped2 = checkpointed_flagship(SRC, out_dir, n_partitions=4)
    assert recs2 == [] and skipped2 == [0, 1, 2, 3]

    # invalidate one partition -> only that one recomputes
    os.remove(os.path.join(out_dir, "_lineage", "part=2.json"))
    recs3, skipped3 = checkpointed_flagship(SRC, out_dir, n_partitions=4)
    assert [r["part"] for r in recs3] == [2]
    assert skipped3 == [0, 1, 3]

    # byte-identity: text column of the concatenated output == input
    src = pq.read_table(SRC, columns=["doc_id", "text"]).sort_by("doc_id")
    parts = []
    for p in range(4):
        parts.append(pq.read_table(os.path.join(out_dir, f"part={p}", "data.parquet"),
                                   columns=["doc_id", "text"]))
    import pyarrow as pa

    got = pa.concat_tables(parts).sort_by("doc_id")
    assert got.column("doc_id").equals(src.column("doc_id"))
    assert got.column("text").equals(src.column("text"))  # byte-identical

    # lineage records carry version + input signature
    rec = json.load(open(os.path.join(out_dir, "_lineage", "part=0.json")))
    assert rec["pipeline_version"] == "1" and rec["input_sig"].startswith("documents.parquet")


def test_version_bump_invalidates(ray_session, out_dir):
    checkpointed_flagship(SRC, out_dir, n_partitions=2)
    recs, skipped = checkpointed_flagship(SRC, out_dir, n_partitions=2,
                                          pipeline_version="2")
    assert [r["part"] for r in recs] == [0, 1] and skipped == []


def test_multifile_directory_input(ray_session, tmp_path):
    """Directory input: one partition per file; resume skips all."""
    import pyarrow.parquet as pq

    src_dir = tmp_path / "shards"
    src_dir.mkdir()
    tbl = pq.read_table(SRC)
    for i in range(3):
        pq.write_table(tbl.slice(i * 100, 100), str(src_dir / f"s{i}.parquet"))
    out = str(tmp_path / "out")
    recs, skipped = checkpointed_flagship(str(src_dir), out, key_col="doc_id")
    assert len(recs) == 3 and not skipped
    assert sum(r["metrics"]["rows"] for r in recs) == 300
    recs2, skipped2 = checkpointed_flagship(str(src_dir), out, key_col="doc_id")
    assert not recs2 and len(skipped2) == 3
