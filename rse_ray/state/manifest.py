"""Atomic JSON manifests for resumable builds.

Every durable partition (a docs bucket, a partial segment, the merged
shard set) gets a small JSON manifest written atomically (tmp + rename)
AFTER its data file is durably in place. Resume = list manifests, skip
partitions whose manifest says ``done``, rebuild the rest (SURVEY §4
checkpoint/resume row). Manifests carry lineage (input files) and
metrics (doc/term/byte counts) per the north_rule.
"""

from __future__ import annotations

import json
import os
import tempfile


def write_json_atomic(path: str, obj: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True, default=str)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_file_atomic(path: str, write_fn) -> None:
    """Write a data file atomically: ``write_fn(tmp_path)`` then rename.
    Retried/replayed Ray tasks therefore never leave partial output —
    the idempotence the reference gets from its SQL upsert
    (crawler.go:217-228)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp.{os.getpid()}.{os.path.basename(path)}")
    try:
        write_fn(tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class PartitionManifests:
    """A directory of per-partition manifests for one build stage."""

    def __init__(self, stage_dir: str) -> None:
        self.dir = os.path.join(stage_dir, "_manifests")

    def path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.json")

    def is_done(self, key: str) -> bool:
        m = read_json(self.path(key))
        return bool(m and m.get("status") == "done")

    def mark_done(self, key: str, **fields) -> dict:
        obj = {"status": "done", "partition": key, **fields}
        write_json_atomic(self.path(key), obj)
        return obj

    def load_all(self) -> list[dict]:
        if not os.path.isdir(self.dir):
            return []
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                m = read_json(os.path.join(self.dir, name))
                if m:
                    out.append(m)
        return out
