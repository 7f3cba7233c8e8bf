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


def documents_warc(sf_dir: str, *, num_shards: int = 4):
    """documents.parquet -> WARC-style binary record shards, read back
    as a parsed Dataset — the layout Common-Crawl-shaped corpora
    actually arrive in (ISO 28500: a header block of key:value lines,
    Content-Length, blank line, then exactly that many payload bytes).

    The fixture writer cuts the table into ``num_shards`` record
    streams (atomic tmp+rename, re-entry no-op); the READ path under
    test is ray.data.read_binary_files over the shard directory — one
    task per shard, embarrassingly parallel like real WARC — followed
    by a map_batches parser that walks records BY CONTENT-LENGTH (never
    by payload delimiters, so payload bytes are unconstrained) and
    emits (doc_id, text, lang, source). At fleet scale shards number
    in the millions and the same two stages stream unchanged; a
    length-aware splitting datasource (mid-file record boundaries)
    would be the upgrade if single shards outgrew a task."""
    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = __import__("hashlib").md5(
        f"{os.path.abspath(src)}|s={num_shards}".encode()).hexdigest()[:12]
    shard_dir = os.path.join(_CACHE_ROOT, f"documents_warc_{key}")

    if not os.path.exists(shard_dir):
        os.makedirs(_CACHE_ROOT, exist_ok=True)
        tmp = shard_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        t = pq.read_table(src, columns=["doc_id", "text", "lang",
                                        "source"])
        rows = t.to_pylist()
        outs = [open(os.path.join(tmp, f"docs_{s:04d}.warc"), "wb")
                for s in range(num_shards)]
        try:
            for r in rows:
                payload = ("" if r["text"] is None
                           else r["text"]).encode("utf-8")
                head = (f"WARC/1.0\r\n"
                        f"WARC-Type: conversion\r\n"
                        f"WARC-Record-ID: doc:{r['doc_id']}\r\n"
                        f"X-Lang: {r['lang']}\r\n"
                        f"X-Source: {r['source']}\r\n"
                        f"Content-Length: {len(payload)}\r\n"
                        f"\r\n").encode("ascii")
                outs[r["doc_id"] % num_shards].write(
                    head + payload + b"\r\n\r\n")
        finally:
            for f in outs:
                f.close()
        os.rename(tmp, shard_dir)

    def parse(batch) -> pa.Table:
        o_id, o_text, o_lang, o_src = [], [], [], []
        for blob in batch["bytes"]:
            buf = bytes(blob)
            pos = 0
            while pos < len(buf):
                hdr_end = buf.index(b"\r\n\r\n", pos)
                headers = {}
                for line in buf[pos:hdr_end].decode("ascii") \
                        .split("\r\n")[1:]:
                    k, _, v = line.partition(": ")
                    headers[k] = v
                n = int(headers["Content-Length"])
                payload = buf[hdr_end + 4:hdr_end + 4 + n]
                pos = hdr_end + 4 + n + 4  # trailing \r\n\r\n
                o_id.append(int(headers["WARC-Record-ID"][4:]))
                o_text.append(payload.decode("utf-8"))
                o_lang.append(headers["X-Lang"])
                o_src.append(headers["X-Source"])
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "text": pa.array(o_text, type=pa.string()),
            "lang": pa.array(o_lang, type=pa.string()),
            "source": pa.array(o_src, type=pa.string()),
        })

    return ray.data.read_binary_files(shard_dir).map_batches(
        parse, batch_format="numpy")


def documents_arrow_ipc(sf_dir: str, *, num_shards: int = 4):
    """documents.parquet -> Arrow IPC (Feather v2) shard files, read
    back as a Dataset: ray.data.read_binary_files over the shard dir,
    then a per-file IPC decode inside map_batches — the zero-copy
    interchange format a Ray-Data-native engine should speak natively
    alongside parquet/jsonl/csv/WARC. Rows shard by doc_id % shards
    (deterministic, order-stable within a shard). Returns the lazy
    parsed Dataset with the documents schema."""
    import hashlib

    import pyarrow.ipc as ipc
    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{num_shards}".encode()
    ).hexdigest()[:12]
    shard_dir = os.path.join(_CACHE_ROOT, f"ipc_docs_{key}_v1")

    done = os.path.join(shard_dir, "_DONE")
    if not os.path.exists(done):
        os.makedirs(shard_dir, exist_ok=True)
        t = pq.read_table(src)
        ids = t.column("doc_id").to_numpy()
        for s in range(num_shards):
            part = t.filter(pa.array(ids % num_shards == s))
            tmp = os.path.join(shard_dir, f"shard_{s:03d}.arrow.tmp")
            with ipc.new_file(tmp, part.schema) as w:
                w.write_table(part)
            os.rename(tmp,
                      os.path.join(shard_dir, f"shard_{s:03d}.arrow"))
        with open(done + ".tmp", "w") as f:
            f.write("done")
        os.rename(done + ".tmp", done)

    def parse(batch) -> pa.Table:
        tables = []
        for payload in batch["bytes"]:
            buf = pa.BufferReader(payload.tobytes()
                                  if hasattr(payload, "tobytes")
                                  else bytes(payload))
            tables.append(ipc.open_file(buf).read_all())
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    shards = sorted(
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
        if f.endswith(".arrow"))
    return ray.data.read_binary_files(shards) \
        .map_batches(parse, batch_format="numpy")
