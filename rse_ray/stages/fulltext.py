"""Batch transforms + actor classes for the inverted-index build.

Pipeline shape (pipelines/build.py):

    read_parquet(pages, columns=[url, warc_ts, html])     # prune at read
      -> map_batches(extract_batch, pyarrow, zero-copy)   # M3/M4: html->text
      -> map_batches(add_bucket)                          # crc32(url) % B
      -> groupby(bucket).map_groups(DocBucketWriter)      # D1 dedup + docIDs
         [fused: write_segment in the same reduce task]   # tokenize + encode
      -> [per-bucket docs + segment parquet = checkpoints]
    (resume sweep: from_items(pending buckets)
      -> map_batches(segment_write_batch_fn tasks))
    read_parquet(partial segments)
      -> map_batches(add salt_group, add range part)      # skew + routing keys
      -> groupby(part).map_groups(ShardPartWriter)        # THE term shuffle;
         each reduce task writes its term-contiguous      # splice-merge, no
         shard file + manifest, returns a route row       # posting decode

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
  * The segment build amortizes its Porter stem cache (~99% hit rate on
    Zipfian vocab) per worker PROCESS via a module global
    (_worker_stemmer) — actor-grade state reuse on the already-warm task
    worker pool, with no actor startup on the critical path (reference
    analog: the per-process DB pool, SURVEY §2.3 ST3). SegmentWriter
    remains as the explicit actor-pool form of the same stage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rse_ray.functions.codec import block_meta, encode_pos_runs, encode_runs
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

# positional variants (BuildConfig.positions=True): one extra binary
# column holding each term run's encoded position stream (codec
# encode_pos_runs). Kept as separate schemas so default builds stay
# byte-identical to pre-positional ones.
SEGMENT_SCHEMA_POS = SEGMENT_SCHEMA.append(pa.field("pospayload", pa.binary()))
SHARD_SCHEMA_POS = SHARD_SCHEMA.append(pa.field("pospayload", pa.binary()))


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
    Emits one manifest row. Skips buckets already marked done (resume).

    With ``segments_dir`` set, the bucket's partial segment is built in
    the SAME reduce task (write_segment on the in-memory table): the
    docs checkpoint and the tokenize stage then share one task wave —
    no barrier, no bucket re-read, half the task scheduling."""

    def __init__(self, docs_dir: str, segments_dir: str | None = None,
                 *, stem: bool = True, overwrite: bool = False,
                 positions: bool = False) -> None:
        self.docs_dir = docs_dir
        self.segments_dir = segments_dir
        self.stem = stem
        self.positions = positions
        # refresh_index upserts over existing done buckets: the atomic
        # tmp+rename write replaces them without any pre-delete window
        self.overwrite = overwrite
        self.manifests = PartitionManifests(docs_dir)
        self.__name__ = "DocBucketWriter"  # map_groups wants a named fn

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        key = f"bucket_{bucket:06d}"
        out_path = os.path.join(self.docs_dir, f"{key}.parquet")
        from rse_ray.state.manifest import read_json

        prev = None if self.overwrite else read_json(self.manifests.path(key))
        if prev and prev.get("status") == "done":
            if self.segments_dir is not None:
                write_segment(bucket, out_path, self.segments_dir,
                              stem=self.stem, positions=self.positions
                              )  # no-op if its manifest is done
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
        # watermark = newest warc_ts in the bucket: the M8 recency
        # contract — refresh_index only re-feeds rows NEWER than this
        wm = pc.max(docs.column("warc_ts")).as_py() if n_docs else None
        self.manifests.mark_done(
            key,
            bucket=bucket,
            num_docs=n_docs,
            num_input_rows=n,
            path=out_path,
            bytes=os.path.getsize(out_path),
            watermark=wm.isoformat() if wm is not None else None,
        )
        if self.segments_dir is not None:
            write_segment(bucket, out_path, self.segments_dir,
                          stem=self.stem, docs_table=docs,
                          positions=self.positions)
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


_WORKER_STEMMER: "StemCache | None" = None


def _worker_stemmer() -> StemCache:
    """Per-worker-PROCESS stem cache (module global): gives the same
    once-per-worker amortization as actor state (~99% hit rate on
    Zipfian vocab) without paying actor-pool startup — segment builds
    run as plain tasks on the already-warm worker pool (the reference
    analog is still the per-process DB pool, SURVEY §2.3 ST3)."""
    global _WORKER_STEMMER
    if _WORKER_STEMMER is None:
        _WORKER_STEMMER = StemCache()
    return _WORKER_STEMMER


def write_segment(bucket: int, docs_path: str, segments_dir: str,
                  *, stem: bool = True, docs_table: pa.Table | None = None,
                  return_table: bool = False, positions: bool = False):
    """Build one bucket's partial segment: read the bucket docs parquet,
    tokenize (cached Porter), build term -> (docIDs, tfs, dls) posting
    runs (docs arrive in ascending doc_id order, so runs are born
    sorted), delta+varint-encode and write a term-sorted partial segment
    parquet atomically, plus a lineage/metrics manifest.

    The manifest also carries this bucket's content-determined term
    SAMPLE (crc32(term#sample) % 61 == 0) so the merge stage derives its
    range boundaries for free instead of re-reading every segment.
    Skips buckets whose manifest is already done (resume)."""
    import zlib

    manifests = PartitionManifests(segments_dir)
    key = f"bucket_{bucket:06d}"
    seg_path = os.path.join(segments_dir, f"{key}.parquet")
    from rse_ray.state.manifest import read_json

    prev = read_json(manifests.path(key))
    if (prev and prev.get("status") == "done"
            and bool(prev.get("positions", False)) == positions):
        # .get: manifests written before the 'sampled' field existed
        # must still resume cleanly (build.py falls back to a sampling
        # pass when any manifest lacks samples). A positions-flag
        # MISMATCH falls through to a rebuild: a resumed build whose
        # config toggled positions must not reuse segments of the
        # other shape (mixed schemas would break the merge, and a
        # positional stats.json over positionless shards would lie).
        stats = {k: prev.get(k) for k in
                 ("bucket", "num_docs", "num_tokens", "num_terms",
                  "payload_bytes", "path", "sampled")}
        return (stats, pq.read_table(seg_path)) if return_table else stats

    stemmer = _worker_stemmer() if stem else None
    docs = (docs_table if docs_table is not None
            else pq.read_table(docs_path, columns=["doc_id", "text"]))
    doc_ids = docs.column("doc_id").to_numpy()
    texts = docs.column("text").to_pylist()

    runs: dict[str, list[list[int]]] = {}
    num_tokens = 0
    from collections import Counter

    for did, text in zip(doc_ids, texts):
        toks = tokenize(text, stem=stem, _stemmer=stemmer)
        num_tokens += len(toks)
        dl = len(toks)
        if positions:
            # positional build: collect each term's token offsets; tf
            # falls out as len(positions). A per-token Python loop —
            # the cost of carrying positions, paid only when asked.
            pos_in_doc: dict[str, list[int]] = {}
            for i, tok in enumerate(toks):
                got = pos_in_doc.get(tok)
                if got is None:
                    pos_in_doc[tok] = [i]
                else:
                    got.append(i)
            for term, plist in pos_in_doc.items():
                run = runs.get(term)
                if run is None:
                    run = [[], [], [], []]
                    runs[term] = run
                run[0].append(int(did))
                run[1].append(len(plist))
                run[2].append(dl)
                run[3].extend(plist)
            continue
        counts = Counter(toks)  # C-level counting
        for term, tf in counts.items():
            run = runs.get(term)
            if run is None:
                run = [[], [], []]
                runs[term] = run
            run[0].append(int(did))
            run[1].append(tf)
            run[2].append(dl)

    terms = sorted(runs)
    T = len(terms)
    # batch varint encode: ONE vectorized pass per stream across every
    # term's run (encode_runs), instead of ~4 scalar varint calls per
    # term — tail terms (df 1-3, ~90% of vocabulary) dominate and paid
    # pure per-call overhead (measured ~3-4x on real buckets)
    run_cols = [runs[t] for t in terms]
    payload_buf, payload_off = encode_runs(
        [r[0] for r in run_cols], [r[1] for r in run_cols],
        [r[2] for r in run_cols])
    payload_mv = memoryview(payload_buf)
    payload_bytes = int(payload_off[-1])
    if payload_bytes >= 2**31:  # int32 offsets in the zero-copy column
        raise ValueError(
            f"bucket {bucket} payload is {payload_bytes} bytes, beyond "
            "int32 binary offsets — lower num_buckets' docs per bucket")

    pos_arr = None
    if positions:
        pos_buf, pos_off = encode_pos_runs(
            [r[3] for r in run_cols], [r[1] for r in run_cols])
        if int(pos_off[-1]) >= 2**31:
            raise ValueError(
                f"bucket {bucket} position payload beyond int32 offsets "
                "— lower num_buckets' docs per bucket")
        pos_arr = pa.BinaryArray.from_buffers(
            pa.binary(), T,
            [None, pa.py_buffer(pos_off.astype(np.int32)),
             pa.py_buffer(pos_buf)])
        pos_mv = memoryview(pos_buf)

    dfs = np.fromiter((len(r[0]) for r in run_cols), dtype=np.int64,
                      count=T)
    content_crc = 0
    sampled = []
    min_doc = np.zeros(T, dtype=np.int64)
    max_doc = np.zeros(T, dtype=np.int64)
    blockmeta = []
    for i, term in enumerate(terms):
        ids, tfs, dls = run_cols[i][:3]
        ids_a = np.asarray(ids, dtype=np.int64)
        tfs_a = np.asarray(tfs, dtype=np.int32)
        dls_a = np.asarray(dls, dtype=np.int32)
        # rolling content checksum (terms + payload bytes): the merge
        # fingerprint must change whenever segment CONTENT changes,
        # even at identical term/byte counts (e.g. two docs' texts
        # swapped by an incremental refresh)
        content_crc = zlib.crc32(term.encode("utf-8"), content_crc)
        content_crc = zlib.crc32(
            payload_mv[payload_off[i]:payload_off[i + 1]], content_crc)
        if positions:
            content_crc = zlib.crc32(
                pos_mv[pos_off[i]:pos_off[i + 1]], content_crc)
        if zlib.crc32(term.encode("utf-8") + b"#sample") % 61 == 0:
            sampled.append(term)
        min_doc[i] = ids_a[0]
        max_doc[i] = ids_a[-1]
        blockmeta.append(block_meta(ids_a, tfs_a, dls_a))

    # payload column straight from the batch buffers — no per-term
    # bytes copies (int32 offsets: a bucket's payload is MBs)
    payload_arr = pa.BinaryArray.from_buffers(
        pa.binary(), T,
        [None, pa.py_buffer(payload_off.astype(np.int32)),
         pa.py_buffer(payload_buf)])
    cols = {
        "term": pa.array(terms, type=pa.string()),
        "bucket": pa.array(np.full(T, bucket, dtype=np.int32)),
        "df": pa.array(dfs),
        "min_doc": pa.array(min_doc),
        "max_doc": pa.array(max_doc),
        "payload": payload_arr,
        "blockmeta": pa.array(blockmeta, type=pa.binary()),
    }
    if positions:
        cols["pospayload"] = pos_arr
    seg = pa.table(cols, schema=SEGMENT_SCHEMA_POS if positions
                   else SEGMENT_SCHEMA)
    write_file_atomic(seg_path, lambda tmp: pq.write_table(seg, tmp))
    manifest = manifests.mark_done(
        key,
        bucket=bucket,
        num_docs=len(doc_ids),
        num_tokens=num_tokens,
        num_terms=len(terms),
        payload_bytes=payload_bytes,
        content_crc=content_crc,
        path=seg_path,
        sampled=sampled,
        positions=positions,
        lineage=[docs_path],
    )
    stats = {k: manifest[k] for k in
             ("bucket", "num_docs", "num_tokens", "num_terms",
              "payload_bytes", "path", "sampled")}
    return (stats, seg) if return_table else stats


def segment_write_batch_fn(segments_dir: str, *, stem: bool = True,
                           positions: bool = False):
    """Task-form map_batches fn over {buckets, paths} work-item GROUPS
    (one LPT-balanced bin of buckets per item)."""

    def fn(items: dict) -> pa.Table:
        out = {"bucket": [], "num_docs": [], "num_tokens": [],
               "num_terms": [], "payload_bytes": [], "path": [],
               "sampled": []}
        for buckets, paths in zip(items["buckets"], items["paths"]):
            for bucket, path in zip(buckets, paths):
                m = write_segment(int(bucket), str(path), segments_dir,
                                  stem=stem, positions=positions)
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
                "sampled": pa.array(out["sampled"],
                                    type=pa.list_(pa.string())),
            }
        )

    return fn


def segment_rows_batch_fn(segments_dir: str, *, stem: bool = True,
                          positions: bool = False):
    """Task-form map_batches fn over {bucket, path} work items that
    emits the built segment's TERM ROWS (not just stats): the chained
    fresh build feeds these in-memory rows straight into the merge
    shuffle, so the segment parquet is written once (checkpoint) and
    never re-listed or re-read within the same build."""

    def fn(items: dict) -> pa.Table:
        tables = []
        for buckets, paths in zip(items["buckets"], items["paths"]):
            for bucket, path in zip(buckets, paths):
                _stats, seg = write_segment(int(bucket), str(path),
                                            segments_dir, stem=stem,
                                            return_table=True,
                                            positions=positions)
                tables.append(seg)
        if not tables:
            return (SEGMENT_SCHEMA_POS if positions
                    else SEGMENT_SCHEMA).empty_table()
        return pa.concat_tables(tables)

    return fn


class SegmentWriter:
    """Actor-pool form of the segment build stage (kept for pipelines
    that prefer explicit actor state; the default build uses the task
    form segment_write_batch_fn + worker-global stem cache, which gives
    identical output without actor startup cost)."""

    def __init__(self, segments_dir: str, *, stem: bool = True,
                 positions: bool = False) -> None:
        self._fn = segment_write_batch_fn(segments_dir, stem=stem,
                                          positions=positions)

    def __call__(self, items: dict) -> pa.Table:
        return self._fn(items)


def make_add_salt(buckets_per_group: int):
    def add_salt(batch: pa.Table) -> pa.Table:
        salt = pc.divide(batch.column("bucket"), buckets_per_group)
        return batch.append_column(
            "salt_group", pc.cast(salt, pa.int32())
        )

    return add_salt


def sample_terms(batch: pa.Table) -> pa.Table:
    """Content-determined ~1/61 sample of segment term rows (kept iff
    crc32(term#sample) % 61 == 0): the sample — and therefore the merge
    range boundaries derived from it — depends only on the input ROWS,
    never on block layout or parallelism, so builds at any CPU count
    partition identically (SURVEY §7.5 hard part 5)."""
    import zlib

    terms = batch.column("term").to_pylist()
    keep = [t for t in terms
            if zlib.crc32(t.encode("utf-8") + b"#sample") % 61 == 0]
    return pa.table({"term": pa.array(keep, type=pa.string())})


def term_range_boundaries(sampled_terms: list[str], num_parts: int) -> list[str]:
    """P-1 upper-exclusive boundaries from the (df-weighted: one sample
    row per term PER BUCKET, so head terms weigh more) sampled terms —
    quantile splitting balances merge-reducer ROW counts, not vocab."""
    s = sorted(sampled_terms)
    if not s or num_parts <= 1:
        return []
    step = len(s) / num_parts
    bounds = []
    for i in range(1, num_parts):
        b = s[min(len(s) - 1, int(i * step))]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds


def split_segments_for_merge(boundaries: list[str], buckets_per_group: int,
                             num_parts: int, *srcs):
    """Map side of the DIRECT merge exchange: salt + range-route a
    GROUP of segments' term rows and return one table per merge part
    (tuple of ``num_parts`` tables, empties included — Ray fans them
    out via ``num_returns``). Replaces the repartition + sort-based
    groupby all-to-all: the range boundaries are content-determined
    and known BEFORE the exchange (they ride in the stage-B
    manifests), so each map task can slice its rows for every reducer
    directly and each reducer concatenates exactly its slices — no
    boundary sampling, no global sort. Sources are grouped so the
    exchange stays ~R x R objects (one table per source would put
    |buckets| x R tiny objects through the store — measured slower
    than the sort path at 512 buckets). merge_partition re-sorts each
    part in full, so the output is invariant to slice arrival order
    and to the grouping (proven by shard equality tests against the
    sort path)."""
    tables = [pq.read_table(s) if isinstance(s, str) else s for s in srcs]
    t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
    t = make_add_salt(buckets_per_group)(t)
    t = make_add_range_part(boundaries)(t)
    part = t.column("part")
    if isinstance(part, pa.ChunkedArray):
        part = part.combine_chunks()
    part_np = part.to_numpy()
    order = np.argsort(part_np, kind="stable")
    t2 = t.take(pa.array(order, type=pa.int64()))
    # combine_chunks so each outgoing slice serializes only its own
    # rows' buffers, not the whole concatenated table's
    t2 = t2.combine_chunks()
    cuts = np.searchsorted(part_np[order], np.arange(num_parts + 1))
    return tuple(
        t2.slice(int(cuts[p]), int(cuts[p + 1] - cuts[p]))
        for p in range(num_parts)
    )


def write_merge_part(writer: "ShardPartWriter", *slices):
    """Reduce side of the direct merge exchange: concat this part's
    slices (Ray resolved the refs) and run the ordinary ShardPartWriter
    (merge + atomic write + manifest). Returns its route-row table, or
    None for an empty part."""
    tables = [s for s in slices if s.num_rows]
    if not tables:
        return None
    return writer(pa.concat_tables(tables))


def make_add_range_part(boundaries: list[str]):
    """part = term's range bucket (binary search over the sampled
    boundaries). Range (not hash) partitioning keeps every output file
    term-contiguous, which the query side's footer min/max routing
    (ShardFiles) depends on."""
    import bisect

    def add_part(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        parts = np.fromiter(
            (bisect.bisect_right(boundaries, t) for t in terms),
            dtype=np.int32, count=len(terms),
        )
        return batch.append_column("part", pa.array(parts, type=pa.int32()))

    return add_part


def merge_partition(group: pa.Table) -> pa.Table:
    """Merge ONE part's worth of (term, salt_group, bucket) runs.

    Sorts the partition once, walks contiguous (term, salt_group) spans,
    and for the (dominant) single-run tail terms passes payload/blockmeta
    through untouched; multi-bucket spans are merged by BYTE SPLICING
    (codec.splice_runs: only each run's first doc varint is re-coded) —
    no posting is ever decoded in the merge. Bucket ascending == docID
    ascending by the doc_id layout, so merged runs stay sorted (delta
    coding + WAND both rely on it)."""
    from rse_ray.functions.codec import splice_block_meta, splice_runs

    idx = pc.sort_indices(
        group,
        sort_keys=[("term", "ascending"), ("salt_group", "ascending"),
                   ("bucket", "ascending")],
    )
    g = group.take(idx)
    n = g.num_rows
    terms = g.column("term").to_pylist()
    salts = g.column("salt_group").to_numpy()
    dfs = g.column("df").to_numpy()
    min_docs = g.column("min_doc").to_numpy()
    max_docs = g.column("max_doc").to_numpy()
    payloads = g.column("payload").to_pylist()
    metas = g.column("blockmeta").to_pylist()
    has_pos = "pospayload" in g.schema.names
    pos_payloads = g.column("pospayload").to_pylist() if has_pos else None

    # span boundaries where (term, salt_group) changes
    change = np.ones(n, dtype=bool)
    if n > 1:
        same_term = np.array(
            [terms[i] == terms[i - 1] for i in range(1, n)], dtype=bool
        )
        change[1:] = ~(same_term & (salts[1:] == salts[:-1]))
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)

    o_term, o_salt, o_df, o_min, o_max, o_pay, o_meta = [], [], [], [], [], [], []
    o_pos = [] if has_pos else None
    for s, e in zip(starts, ends):
        o_term.append(terms[s])
        o_salt.append(int(salts[s]))
        if e - s == 1:  # single run: pass through, no recode
            o_df.append(int(dfs[s]))
            o_min.append(int(min_docs[s]))
            o_max.append(int(max_docs[s]))
            o_pay.append(payloads[s])
            o_meta.append(metas[s])
            if has_pos:
                o_pos.append(pos_payloads[s])
        else:
            o_df.append(int(dfs[s:e].sum()))
            o_min.append(int(min_docs[s]))
            o_max.append(int(max_docs[e - 1]))
            o_pay.append(
                splice_runs(payloads[s:e], min_docs[s:e], max_docs[s:e])
            )
            o_meta.append(splice_block_meta(metas[s:e]))
            if has_pos:
                # position streams have no cross-doc continuity: the
                # doc-ascending sort order makes splice = concatenation
                o_pos.append(b"".join(pos_payloads[s:e]))
    cols = {
        "term": pa.array(o_term, type=pa.string()),
        "salt_group": pa.array(o_salt, type=pa.int32()),
        "df": pa.array(o_df, type=pa.int64()),
        "min_doc": pa.array(o_min, type=pa.int64()),
        "max_doc": pa.array(o_max, type=pa.int64()),
        "payload": pa.array(o_pay, type=pa.binary()),
        "blockmeta": pa.array(o_meta, type=pa.binary()),
    }
    if has_pos:
        cols["pospayload"] = pa.array(o_pos, type=pa.binary())
    return pa.table(cols, schema=SHARD_SCHEMA_POS if has_pos
                    else SHARD_SCHEMA)


class ShardPartWriter:
    """map_groups callable for one merge range-part: runs
    merge_partition and writes the part's term-contiguous shard parquet
    ITSELF (atomic tmp+rename + per-part manifest), emitting only a
    route row (file, term_min, term_max, num_rows).

    Compared to a trailing write_parquet operator this (a) removes the
    driver-side parquet-footer scan — the route comes back with the
    task, (b) gives the merge per-PART resume (a killed merge skips
    finished parts on re-run), matching the doc/segment stages'
    checkpoint granularity.

    ``fingerprint`` identifies the merge configuration (range
    boundaries, partition count, input segment set): a resumed merge
    only reuses a done part whose manifest carries the SAME
    fingerprint — a crash resumed with different merge_partitions or
    changed segments rebuilds the part instead of silently splicing a
    stale file keyed by the same part number."""

    def __init__(self, shards_dir: str, fingerprint: str | None = None) -> None:
        self.shards_dir = shards_dir
        self.fingerprint = fingerprint
        self.manifests = PartitionManifests(shards_dir)
        self.__name__ = "ShardPartWriter"

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        key = f"part_{part:05d}"
        fname = f"{key}.parquet"
        out_path = os.path.join(self.shards_dir, fname)
        from rse_ray.state.manifest import read_json

        prev = read_json(self.manifests.path(key))
        if (prev and prev.get("status") == "done"
                and prev.get("fingerprint") == self.fingerprint):
            return self._route_row(prev["file"], prev["term_min"],
                                   prev["term_max"], prev["num_rows"])
        merged = merge_partition(group)
        # small row groups: the query path point-reads ONE term's
        # payload via its row group (_FileTermIndex._payload_row), so
        # the row group is the cold-IO unit — at 4096 rows/rg a single
        # head-term lookup dragged the part's entire multi-MB payload
        # column chunk; 256 keeps point reads ~KBs-to-1-term-sized at
        # negligible metadata overhead
        write_file_atomic(
            out_path,
            lambda tmp: pq.write_table(merged, tmp, row_group_size=256),
        )
        tmin = merged.column("term")[0].as_py() if merged.num_rows else None
        tmax = merged.column("term")[-1].as_py() if merged.num_rows else None
        self.manifests.mark_done(
            key, part=part, file=fname, term_min=tmin, term_max=tmax,
            num_rows=merged.num_rows, bytes=os.path.getsize(out_path),
            fingerprint=self.fingerprint,
        )
        return self._route_row(fname, tmin, tmax, merged.num_rows)

    @staticmethod
    def _route_row(fname, tmin, tmax, num_rows) -> pa.Table:
        return pa.table(
            {"file": pa.array([fname], type=pa.string()),
             "term_min": pa.array([tmin], type=pa.string()),
             "term_max": pa.array([tmax], type=pa.string()),
             "num_rows": pa.array([int(num_rows)], type=pa.int64())}
        )
