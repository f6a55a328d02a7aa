"""Per-partition lineage records + checkpoint-resume output layout.

North-rule ops design (SURVEY.md §4): output is partitioned
``out/part={i}/`` directories, each written atomically (tmp dir +
rename) together with a ``_lineage/part={i}.json`` record holding the
input shard, row count, op versions and a content digest. A re-run
skips partitions whose lineage record exists and validates — that is
what "resumable from checkpoint" means for a batch pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


class LineageWriter:
    def __init__(self, out_dir: str, pipeline_version: str = "1"):
        self.out_dir = out_dir
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        self.pipeline_version = pipeline_version
        os.makedirs(self.lineage_dir, exist_ok=True)

    def part_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, f"part={part}")

    def record_path(self, part: int) -> str:
        return os.path.join(self.lineage_dir, f"part={part}.json")

    def is_complete(self, part: int, input_sig: str) -> bool:
        """True if this partition was already produced from the same
        input signature and pipeline version."""
        path = self.record_path(part)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (
            rec.get("input_sig") == input_sig
            and rec.get("pipeline_version") == self.pipeline_version
            and os.path.isdir(self.part_dir(part))
        )

    def write_part(self, part: int, input_sig: str, write_fn, metrics: dict | None = None):
        """Atomically write one output partition: write_fn(tmp_dir) must
        produce the files; the directory is renamed into place and the
        lineage record written last (commit point)."""
        final = self.part_dir(part)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        result_metrics = write_fn(tmp) or {}
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        digest = _dir_digest(final)
        rec = {
            "part": part,
            "input_sig": input_sig,
            "pipeline_version": self.pipeline_version,
            "completed_at": time.time(),
            "digest": digest,
            "metrics": {**(metrics or {}), **result_metrics},
        }
        tmp_rec = self.record_path(part) + ".tmp"
        with open(tmp_rec, "w") as f:
            json.dump(rec, f)
        os.replace(tmp_rec, self.record_path(part))
        return rec


def _dir_digest(path: str) -> str:
    h = hashlib.md5()
    for name in sorted(os.listdir(path)):
        fp = os.path.join(path, name)
        h.update(name.encode())
        h.update(str(os.path.getsize(fp)).encode())
    return h.hexdigest()
