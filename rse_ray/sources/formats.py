"""Source-format breadth: the same tables served from JSONL and CSV
instead of Parquet, so every pipeline in the repo can ingest whichever
layout a corpus actually arrives in (web crawls ship as JSONL far more
often than Parquet).

Each helper materializes a deterministic sibling of the Parquet fixture
under /tmp ONCE (atomic tmp+rename, re-entry is a no-op — the file is a
pure function of the source path), then returns a lazy
``ray.data.read_json`` / ``read_csv`` Dataset. The conversion is
fixture plumbing; the part under test is the READ path: schema mapping,
timestamp parsing, and that downstream operators are layout-agnostic.

At fleet scale the /tmp rewrite disappears — corpora already live as
JSONL/CSV shards — and the readers stream per-file exactly like
read_parquet, minus Parquet's column pruning (JSONL/CSV always
materialize whole rows; the project step right after the read is the
earliest possible prune, which is why Parquet stays the preferred
layout and these readers are the compatibility path).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

_CACHE_ROOT = "/tmp/rse_ray_cache"


def _sibling(src: str, ext: str) -> str:
    import hashlib

    key = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
    base = os.path.splitext(os.path.basename(src))[0]
    return os.path.join(_CACHE_ROOT, f"{base}_{key}.{ext}")


def _write_once(path: str, write_fn) -> None:
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    write_fn(tmp)
    os.rename(tmp, path)


def documents_jsonl(sf_dir: str):
    """documents.parquet -> newline-delimited JSON, read back with
    ray.data.read_json. Returns the lazy Dataset."""
    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    path = _sibling(src, "jsonl")

    def write(tmp: str) -> None:
        df = pq.read_table(src).to_pandas()
        df.to_json(tmp, orient="records", lines=True,
                   force_ascii=False)

    _write_once(path, write)
    return ray.data.read_json(path)


def events_csv(sf_dir: str):
    """events.parquet -> CSV (ISO-8601 microsecond timestamps), read
    back with ray.data.read_csv under an EXPLICIT Arrow schema — CSV
    carries no types, so inference is pinned rather than trusted."""
    from pyarrow import csv as pacsv

    import ray.data

    src = os.path.join(sf_dir, "events.parquet")
    path = _sibling(src, "csv")

    def write(tmp: str) -> None:
        df = pq.read_table(src).to_pandas()
        df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        df.to_csv(tmp, index=False)

    _write_once(path, write)
    types = {
        "event_id": pa.int64(),
        "ts": pa.timestamp("us"),
        "user_id": pa.int64(),
        "event_type": pa.string(),
        "value": pa.float64(),
        "props": pa.string(),
    }
    # Arrow's strptime lacks %f; the ISO8601 fast parser handles the
    # fractional seconds and is what the writer emits
    return ray.data.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(
            column_types=types,
            timestamp_parsers=[pacsv.ISO8601]))


def pushdown_scan(sf_dir: str, table: str = "events", *,
                  event_type: str = "purchase", min_value: float = 100.0):
    """Predicate + projection pushdown at the READ: the filter and the
    3-column projection are handed to ray.data.read_parquet itself, so
    row groups whose statistics exclude the predicate are never read
    and non-projected columns never leave storage — the prune-at-read
    discipline every 100 TB scan lives or dies by (at fleet scale this
    is the difference between scanning 3 columns of qualifying row
    groups and scanning the corpus). Returns the lazy filtered
    Dataset: (event_id, user_id, value)."""
    import pyarrow.dataset as pads
    import ray.data

    expr = ((pads.field("event_type") == event_type)
            & (pads.field("value") >= min_value))
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"),
        columns=["event_id", "user_id", "value"],
        filter=expr,
    )
