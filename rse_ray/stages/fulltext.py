"""Batch transforms + actor classes for the inverted-index build.

Pipeline shape (pipelines/build.py):

    read_parquet(pages, columns=[url, warc_ts, html])     # prune at read
      -> map_batches(extract_batch, pyarrow, zero-copy)   # M3/M4: html->text
      -> map_batches(add_bucket)                          # crc32(url) % B
      -> groupby(bucket).map_groups(DocBucketWriter)      # D1 dedup + docIDs
      -> [per-bucket docs parquet on disk = checkpoint]
    from_items(pending buckets)
      -> map_batches(SegmentWriter actor pool)            # tokenize + encode
      -> [per-bucket partial segment parquet = checkpoint]
    read_parquet(partial segments)
      -> map_batches(add salt_group = bucket // K)        # skew salting
      -> groupby(term, salt_group).map_groups(merge_runs) # THE term shuffle
      -> write_parquet(shards)                            # term-range files

Scale notes (100 TB / 10^12 docs):
  * The only all-to-all exchanges are the bucket groupby (dedup) and the
    term groupby (merge). The merge shuffle moves delta+varint-compressed
    runs, not raw (term, doc, tf) rows — ~5-10x less traffic.
  * Head-term skew (Zipf: a stopword's posting list ~= corpus size) is
    bounded by salting the merge key with salt_group = bucket // K: a
    term with runs in all B buckets lands on B/K reducers instead of 1,
    each producing one contiguous, docID-sorted chunk of the final list
    (runs partition the docID space by bucket, so chunks stay mergeable
    by simple ordered concat at query time). Tail terms appear in few
    buckets and so produce few groups — no fan-out overhead. This is the
    FP-Hadoop-style repartition-the-reduce pattern (PAPERS.md).
  * SegmentWriter is a callable CLASS (actor pool): the Porter stem
    cache (~99% hit rate on Zipfian vocab) and output-dir handles are
    built once per actor, reused across buckets (reference analog: the
    per-process DB pool, SURVEY §2.3 ST3).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rse_ray.functions.codec import block_meta, encode_run
from rse_ray.functions.extract import extract
from rse_ray.functions.ids import DOC_BUCKET_BITS, url_buckets
from rse_ray.functions.tokenizer import StemCache, tokenize
from rse_ray.state.manifest import PartitionManifests, write_file_atomic

DOCS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
    ]
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.int32()),
        ("df", pa.int64()),
        ("min_doc", pa.int64()),
        ("max_doc", pa.int64()),
        ("payload", pa.binary()),
        ("blockmeta", pa.binary()),
    ]
)

SHARD_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt_group", pa.int32()),
        ("df", pa.int64()),
        ("min_doc", pa.int64()),
        ("max_doc", pa.int64()),
        ("payload", pa.binary()),
        ("blockmeta", pa.binary()),
    ]
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """M3/M4: html -> text. Stateless, zero-copy in; the html column is
    dropped on output so the (dominant) raw bytes never travel further
    down the pipeline (SURVEY §4 memory row)."""
    html_col = batch.column("html")
    texts = [extract(h.as_py())["text"] for h in html_col]
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def make_add_bucket(num_buckets: int):
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = url_buckets(batch.column("url").to_pylist(), num_buckets)
        return batch.append_column("bucket", pa.array(b, type=pa.int32()))

    return add_bucket


class DocBucketWriter:
    """map_groups callable for one url-bucket: exact dedup by url keeping
    the max-warc_ts row (upsert last-writer-wins, crawler.go:217-221),
    deterministic docID assignment, atomic per-bucket docs parquet.
    Emits one manifest row. Skips buckets already marked done (resume)."""

    def __init__(self, docs_dir: str) -> None:
        self.docs_dir = docs_dir
        self.manifests = PartitionManifests(docs_dir)
        self.__name__ = "DocBucketWriter"  # map_groups wants a named fn

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        key = f"bucket_{bucket:06d}"
        out_path = os.path.join(self.docs_dir, f"{key}.parquet")
        from rse_ray.state.manifest import read_json

        prev = read_json(self.manifests.path(key))
        if prev and prev.get("status") == "done":
            return _manifest_row(
                bucket, prev["num_docs"], prev["num_input_rows"], out_path
            )

        # sort by (url asc, warc_ts asc) then keep the LAST row per url;
        # text as final key so fully-tied rows dedup deterministically
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("url", "ascending"),
                ("warc_ts", "ascending"),
                ("text", "ascending"),
            ],
        )
        g = group.take(idx)
        urls = g.column("url").to_pylist()
        n = len(urls)
        keep = np.ones(n, dtype=bool)
        keep[:-1] = np.array(urls[:-1]) != np.array(urls[1:]) if n > 1 else []
        g = g.filter(pa.array(keep))
        n_docs = g.num_rows
        doc_ids = (bucket << DOC_BUCKET_BITS) | np.arange(n_docs, dtype=np.int64)
        docs = pa.table(
            {
                "bucket": pa.array(np.full(n_docs, bucket, dtype=np.int32)),
                "doc_id": pa.array(doc_ids),
                "url": g.column("url"),
                "warc_ts": g.column("warc_ts"),
                "text": g.column("text"),
            },
            schema=DOCS_SCHEMA,
        )
        write_file_atomic(out_path, lambda tmp: pq.write_table(docs, tmp))
        self.manifests.mark_done(
            key,
            bucket=bucket,
            num_docs=n_docs,
            num_input_rows=n,
            path=out_path,
            bytes=os.path.getsize(out_path),
        )
        return _manifest_row(bucket, n_docs, n, out_path)


def _manifest_row(bucket: int, n_docs: int, n_input: int, path: str) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([bucket], type=pa.int32()),
            "num_docs": pa.array([n_docs], type=pa.int64()),
            "num_input_rows": pa.array([n_input], type=pa.int64()),
            "path": pa.array([path]),
        }
    )


class SegmentWriter:
    """Actor-pool stage: docs bucket -> partial segment.

    One __call__ handles a small batch of {bucket, path} work items; for
    each it reads the bucket's docs parquet, tokenizes (cached Porter),
    builds term -> (docIDs, tfs, dls) posting runs (docs arrive in
    ascending doc_id order, so runs are born sorted — no sort needed),
    delta+varint-encodes them and writes one term-sorted partial segment
    parquet atomically, plus a lineage/metrics manifest.

    Returns manifest rows (bucket, num_docs, num_tokens, num_terms,
    payload_bytes) — the inputs to global stats (N, avgdl).
    """

    def __init__(self, segments_dir: str, *, stem: bool = True) -> None:
        self.segments_dir = segments_dir
        self.stem = stem
        self.stemmer = StemCache() if stem else None
        self.manifests = PartitionManifests(segments_dir)

    def __call__(self, items: dict) -> pa.Table:
        out = {
            "bucket": [], "num_docs": [], "num_tokens": [],
            "num_terms": [], "payload_bytes": [], "path": [],
        }
        for bucket, path in zip(items["bucket"], items["path"]):
            m = self._build_one(int(bucket), str(path))
            for k in out:
                out[k].append(m[k])
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], type=pa.int32()),
                "num_docs": pa.array(out["num_docs"], type=pa.int64()),
                "num_tokens": pa.array(out["num_tokens"], type=pa.int64()),
                "num_terms": pa.array(out["num_terms"], type=pa.int64()),
                "payload_bytes": pa.array(out["payload_bytes"], type=pa.int64()),
                "path": pa.array(out["path"]),
            }
        )

    def _build_one(self, bucket: int, docs_path: str) -> dict:
        key = f"bucket_{bucket:06d}"
        seg_path = os.path.join(self.segments_dir, f"{key}.parquet")
        from rse_ray.state.manifest import read_json

        prev = read_json(self.manifests.path(key))
        if prev and prev.get("status") == "done":
            return {k: prev[k] for k in
                    ("bucket", "num_docs", "num_tokens", "num_terms",
                     "payload_bytes", "path")}

        docs = pq.read_table(docs_path, columns=["doc_id", "text"])
        doc_ids = docs.column("doc_id").to_numpy()
        texts = docs.column("text").to_pylist()

        runs: dict[str, list[list[int]]] = {}
        num_tokens = 0
        for did, text in zip(doc_ids, texts):
            toks = tokenize(text, stem=self.stem, _stemmer=self.stemmer)
            num_tokens += len(toks)
            dl = len(toks)
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for term, tf in counts.items():
                run = runs.get(term)
                if run is None:
                    run = [[], [], []]
                    runs[term] = run
                run[0].append(int(did))
                run[1].append(tf)
                run[2].append(dl)

        terms = sorted(runs)
        rows = {k: [] for k in ("term", "bucket", "df", "min_doc", "max_doc",
                                "payload", "blockmeta")}
        payload_bytes = 0
        for term in terms:
            ids, tfs, dls = runs[term]
            ids_a = np.asarray(ids, dtype=np.int64)
            tfs_a = np.asarray(tfs, dtype=np.int32)
            dls_a = np.asarray(dls, dtype=np.int32)
            payload = encode_run(ids_a, tfs_a, dls_a)
            payload_bytes += len(payload)
            rows["term"].append(term)
            rows["bucket"].append(bucket)
            rows["df"].append(len(ids))
            rows["min_doc"].append(int(ids_a[0]) if len(ids) else 0)
            rows["max_doc"].append(int(ids_a[-1]) if len(ids) else 0)
            rows["payload"].append(payload)
            rows["blockmeta"].append(block_meta(ids_a, tfs_a, dls_a))

        seg = pa.table(
            {
                "term": pa.array(rows["term"], type=pa.string()),
                "bucket": pa.array(rows["bucket"], type=pa.int32()),
                "df": pa.array(rows["df"], type=pa.int64()),
                "min_doc": pa.array(rows["min_doc"], type=pa.int64()),
                "max_doc": pa.array(rows["max_doc"], type=pa.int64()),
                "payload": pa.array(rows["payload"], type=pa.binary()),
                "blockmeta": pa.array(rows["blockmeta"], type=pa.binary()),
            },
            schema=SEGMENT_SCHEMA,
        )
        write_file_atomic(seg_path, lambda tmp: pq.write_table(seg, tmp))
        manifest = self.manifests.mark_done(
            key,
            bucket=bucket,
            num_docs=len(doc_ids),
            num_tokens=num_tokens,
            num_terms=len(terms),
            payload_bytes=payload_bytes,
            path=seg_path,
            lineage=[docs_path],
        )
        return {k: manifest[k] for k in
                ("bucket", "num_docs", "num_tokens", "num_terms",
                 "payload_bytes", "path")}


def make_add_salt(buckets_per_group: int):
    def add_salt(batch: pa.Table) -> pa.Table:
        salt = pc.divide(batch.column("bucket"), buckets_per_group)
        return batch.append_column(
            "salt_group", pc.cast(salt, pa.int32())
        )

    return add_salt


def merge_runs(group: pa.Table) -> pa.Table:
    """Merge one (term, salt_group) group: decode the per-bucket runs,
    concatenate in bucket order (bucket order == docID order by the
    doc_id layout), re-encode once. Pure vectorized numpy."""
    from rse_ray.functions.codec import decode_run

    idx = pc.sort_indices(group, sort_keys=[("bucket", "ascending")])
    g = group.take(idx)
    term = g.column("term")[0].as_py()
    salt = int(g.column("salt_group")[0].as_py())
    ids_parts, tf_parts, dl_parts = [], [], []
    for payload in g.column("payload"):
        d, t, l = decode_run(payload.as_py())
        ids_parts.append(d)
        tf_parts.append(t)
        dl_parts.append(l)
    ids = np.concatenate(ids_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    payload = encode_run(ids, tfs, dls)
    return pa.table(
        {
            "term": pa.array([term], type=pa.string()),
            "salt_group": pa.array([salt], type=pa.int32()),
            "df": pa.array([len(ids)], type=pa.int64()),
            "min_doc": pa.array([int(ids[0])], type=pa.int64()),
            "max_doc": pa.array([int(ids[-1])], type=pa.int64()),
            "payload": pa.array([payload], type=pa.binary()),
            "blockmeta": pa.array([block_meta(ids, tfs, dls)], type=pa.binary()),
        },
        schema=SHARD_SCHEMA,
    )
