"""Resumable partitioned Parquet sink.

The reference's page-upsert sink (crawler.go's INSERT ... ON CONFLICT)
gives it idempotent re-ingest; the Ray-native analog for BULK output is
a content-partitioned directory where every partition commits atomically
and a re-run SKIPS finished partitions — a failed 100 TB job resumes
from the partition boundary instead of byte zero.

Layout:

    out_dir/
      part_00000.parquet     one file per hash partition of ``key``
      _manifests/part_00000.json   {rows, fingerprint, cols}
      _DONE.json             written last; marks the whole sink complete

Rows route by content (int64 key mod P, string key by the same fixed
siphash every exchange in this repo uses), NEVER by block order, so a
re-run reproduces each partition's row SET exactly; the manifest
fingerprint is order-invariant (uint64 sum of row hashes) because Ray's
delivery order within a partition is not deterministic.

Resume contract: partitions with a manifest are dropped at the MAP
stage — their rows never enter the shuffle, so a 99%%-done re-run
shuffles 1%% of the data. Crash safety: file + manifest both land via
tmp+rename, manifest strictly after its file.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rse_ray.state.manifest import (PartitionManifests, read_json,
                                    write_file_atomic, write_json_atomic)


def _route(col: pa.ChunkedArray | pa.Array, P: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(object)
        return (pd.util.hash_array(v) % P).astype(np.int64)
    v = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.mod(v, P).astype(np.int64)


def _fingerprint(tbl: pa.Table) -> int:
    """Order-invariant content hash: uint64 wrap-sum of per-row hashes
    over all columns (stringified — stable and type-agnostic)."""
    if tbl.num_rows == 0:
        return 0
    df = tbl.to_pandas()
    h = np.zeros(len(df), dtype=np.uint64)
    for c in sorted(df.columns):
        h ^= pd.util.hash_array(df[c].astype(str).to_numpy(dtype=object))
    return int(np.sum(h, dtype=np.uint64))


def write_partitioned(ds, out_dir: str, *, key: str,
                      num_parts: int | None = None) -> dict:
    """Write ``ds`` as ``num_parts`` hash partitions of ``key`` under
    ``out_dir``; finished partitions (manifest present) are skipped on
    re-entry, and their rows are dropped before the shuffle. Returns
    {'partitions': P, 'written': n_new, 'skipped': n_done, 'rows': total}.
    """
    import ray.data

    from rse_ray.util import parts_for, plan_rows

    os.makedirs(out_dir, exist_ok=True)
    man = PartitionManifests(out_dir)
    done_marker = os.path.join(out_dir, "_DONE.json")
    prior = read_json(done_marker)
    if prior is not None:
        return {**prior, "written": 0,
                "skipped": int(prior["partitions"])}

    P = num_parts if num_parts is not None else parts_for(plan_rows(ds))
    done = sorted(int(k) for k in
                  (m["partition"] for m in man.load_all()))
    done_arr = np.array(done, dtype=np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        part = _route(batch.column(key), P)
        keep = ~np.isin(part, done_arr) if len(done_arr) else \
            np.ones(len(part), dtype=bool)
        return batch.filter(pa.array(keep)).append_column(
            "__part", pa.array(part[keep]))

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["__part"].iloc[0])
        tbl = pa.Table.from_pandas(g.drop(columns="__part"),
                                   preserve_index=False)
        path = os.path.join(out_dir, f"part_{p:05d}.parquet")
        write_file_atomic(path, lambda tmp: pq.write_table(tbl, tmp))
        man.mark_done(str(p), rows=tbl.num_rows,
                      fingerprint=_fingerprint(tbl),
                      cols=sorted(tbl.column_names))
        return pd.DataFrame({"partition": [p], "rows": [tbl.num_rows]})

    written = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__part").map_groups(write_part, batch_format="pandas") \
        .to_pandas()
    if "partition" not in written.columns:  # nothing pending
        written = pd.DataFrame({"partition": pd.array([], dtype="int64")})

    # partitions with NO rows still need a manifest (else a resume
    # could not distinguish "empty" from "pending")
    seen = set(done) | set(int(x) for x in written["partition"])
    for p in range(P):
        if p not in seen:
            man.mark_done(str(p), rows=0, fingerprint=0, cols=[])

    rows_total = int(sum(m["rows"] for m in man.load_all()))
    summary = {"partitions": P, "written": int(len(written)),
               "skipped": len(done), "rows": rows_total}
    write_json_atomic(done_marker, {"partitions": P, "rows": rows_total})
    return summary


def partition_summary(out_dir: str) -> pd.DataFrame:
    """(partition, rows, fingerprint) per manifest — the audit face of
    the sink (what a resume believes exists)."""
    man = PartitionManifests(out_dir)
    rows = sorted(man.load_all(), key=lambda m: int(m["partition"]))
    return pd.DataFrame(
        {"partition": pd.array([int(m["partition"]) for m in rows],
                               dtype="int64"),
         "rows": pd.array([int(m["rows"]) for m in rows], dtype="int64"),
         "fingerprint": pd.array([int(m["fingerprint"]) for m in rows],
                                 dtype="uint64")})


def write_webdataset(ds, out_dir: str, *, num_shards: int = 8,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """WebDataset-layout tar shards — the de-facto large-scale
    training-data container (one `{key}.txt` member per sample,
    samples grouped into fixed-count shards, shard-local ordering by
    key): shard = doc_id % num_shards (the same deterministic routing
    every pipeline here uses), one `shard-{s:06d}.tar` per shard,
    members named `{doc_id:012d}.txt`, written atomically
    (tmp + rename) so a re-run simply overwrites byte-identical
    shards. Returns the per-shard stats table
    (shard, n_docs, n_text_chars) — hashes against the SQL twin, so
    the routed CONTENT (not just file presence) is oracle-checked.

    Scale shape: one groupby(shard) shuffle, one writer task per
    shard streaming its members into the tar; the driver sees only
    the stats rows. Shard count is the parallelism knob a loader
    fleet consumes (each trainer rank reads a disjoint shard
    subset)."""
    import io
    import tarfile

    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            id_col: pa.array(ids),
            text_col: batch.column(text_col),
            "__shard": pa.array(ids % num_shards)})

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = int(g["__shard"].iloc[0])
        g = g.sort_values(id_col)
        path = os.path.join(out_dir, f"shard-{s:06d}.tar")
        tmp = path + ".tmp"
        n_chars = 0
        with tarfile.open(tmp, "w") as tf:
            for did, text in zip(g[id_col], g[text_col]):
                data = ("" if text is None else str(text)) \
                    .encode("utf-8")
                n_chars += 0 if text is None else len(str(text))
                info = tarfile.TarInfo(name=f"{int(did):012d}.txt")
                info.size = len(data)
                info.mtime = 0  # deterministic bytes
                tf.addfile(info, io.BytesIO(data))
        os.replace(tmp, path)
        return pd.DataFrame({
            "shard": pd.array([s], dtype="int64"),
            "n_docs": pd.array([len(g)], dtype="int64"),
            "n_text_chars": pd.array([n_chars], dtype="int64")})

    out = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__shard") \
        .map_groups(write_shard, batch_format="pandas").to_pandas()
    return out.sort_values("shard").reset_index(drop=True)
