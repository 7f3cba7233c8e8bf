"""BM25 top-k retrieval over the built index.

Reference query path being re-expressed (SURVEY §3.2, api/main.go:48-119):
tokenize -> retrieve posting lists (union over terms, ≙ the
`word = ANY(...)` semi-join J1) -> score -> rank. The reference's
frequency*frequency relevance (api/main.go:86-95) is superseded by BM25
per the north_star; rank order + scores are the oracle-pinned contract.

Scoring spec (must stay bit-identical to tests/oracle.py — same
expression shapes, same accumulation order, SURVEY §7.5 hard part 3):

    idf     = ln(1 + (N - df + 0.5) / (df + 0.5))        # Lucene form
    tf_part = (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))
    score   = sum over query terms IN SORTED TERM ORDER of
              qtf * idf * tf_part
    k1=1.2, b=0.75; ties broken by ascending doc_id.

Two scorers:
  * ``taat``  — exhaustive term-at-a-time, fully vectorized; per-doc
    accumulation via stable sort + np.add.reduceat so the add order per
    doc equals sorted-term order (fp determinism).
  * ``bmw``   — block-max WAND document-at-a-time with per-block upper
    bounds (codec block meta); skips blocks that cannot reach the heap
    threshold. Returns exactly the taat top-k (asserted in tests).

Deployment shapes:
  * ``Searcher`` — driver-side, reads shard parquet directly (tests,
    batch oracles).
  * ``ShardSearcherActor`` — long-lived Ray actors each owning a
    contiguous term-range slice of the shard files (ST5 pattern);
    ``DistributedSearcher`` scatter-gathers per-term partial results.
    At fleet scale each actor mmaps only its slice; queries touch
    |query terms| actors, not all of them.
"""

from __future__ import annotations

import bisect
import math
import os

import numpy as np
import pyarrow.parquet as pq

from rse_ray.functions.codec import decode_block_meta, decode_run
from rse_ray.functions.tokenizer import tokenize
from rse_ray.state.manifest import read_json

K1 = 1.2
B = 0.75


# --------------------------------------------------------------------------
# shard access
# --------------------------------------------------------------------------

class ShardFiles:
    """Term-range routing over the merged shard parquet files. The merge
    groupby is sort-based, so files are term-range partitioned; routing
    is a binary search over footer min/max stats (no data read)."""

    def __init__(self, index_dir: str) -> None:
        self.shards_dir = os.path.join(index_dir, "shards")
        manifest = read_json(os.path.join(index_dir, "_MANIFEST.json"))
        if manifest and "shards" in manifest:
            routes = manifest["shards"]
        else:
            routes = self._scan_footers()
        routes = [r for r in routes if r["term_min"] is not None]
        routes.sort(key=lambda r: (r["term_min"], r["term_max"]))
        self.files = [os.path.join(self.shards_dir, r["file"]) for r in routes]
        self.term_min = [r["term_min"] for r in routes]
        self.term_max = [r["term_max"] for r in routes]

    def _scan_footers(self) -> list[dict]:
        routes = []
        for f in sorted(os.listdir(self.shards_dir)):
            if not f.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(self.shards_dir, f))
            tmin = tmax = None
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(0).statistics
                if st is not None and st.has_min_max:
                    tmin = st.min if tmin is None else min(tmin, st.min)
                    tmax = st.max if tmax is None else max(tmax, st.max)
            routes.append({"file": f, "term_min": tmin, "term_max": tmax})
        return routes

    def files_for_term(self, term: str) -> list[str]:
        # candidate files: term_min <= term <= term_max; ranges are
        # sorted and (nearly) disjoint -> binary search + local scan
        out = []
        hi = bisect.bisect_right(self.term_min, term)
        for i in range(hi - 1, -1, -1):
            if self.term_max[i] >= term:
                out.append(self.files[i])
            elif self.term_min[i] < term and self.term_max[i] < term:
                break
        return out[::-1]

    def files_for_prefix(self, prefix: str) -> list[str]:
        """Files whose term range can contain a term starting with
        ``prefix`` — i.e. [term_min, term_max] intersects
        [prefix, prefix + U+10FFFF). Shards are term-range partitioned,
        so a prefix touches a CONTIGUOUS run of files; at fleet scale
        this is the dictionary range scan, never a full-index sweep."""
        hi_key = prefix + "\U0010ffff"
        return [f for f, tmin, tmax
                in zip(self.files, self.term_min, self.term_max)
                if tmax >= prefix and tmin <= hi_key]


class _FileTermIndex:
    """Postings lookup inside one shard file. Only the term directory
    (term, min_doc, df — a few bytes/row) loads eagerly; the payload /
    blockmeta columns are fetched lazily per ROW GROUP on first touch
    (parquet row groups are the I/O unit), so opening a shard costs
    milliseconds and a query touches only the row groups its terms live
    in. Actor-resident state at fleet scale."""

    def __init__(self, path: str) -> None:
        self.pf = pq.ParquetFile(path)
        self.has_pos = "pospayload" in self.pf.schema_arrow.names
        self._pos_rg_cache: dict[int, object] = {}
        t = self.pf.read(columns=["term", "min_doc", "df"])
        self.terms = t.column("term").to_pylist()
        self.min_doc = t.column("min_doc").to_numpy()
        self.df = t.column("df").to_numpy()
        self.by_term: dict[str, list[int]] = {}
        for i, term in enumerate(self.terms):
            self.by_term.setdefault(term, []).append(i)
        # row-group row offsets for row -> row-group routing
        md = self.pf.metadata
        self._rg_starts = np.cumsum(
            [0] + [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        )
        self._rg_cache: dict[int, tuple] = {}

    def _payload_row(self, i: int) -> tuple[bytes, bytes]:
        rg = int(np.searchsorted(self._rg_starts, i, side="right")) - 1
        got = self._rg_cache.get(rg)
        if got is None:
            t = self.pf.read_row_group(rg, columns=["payload", "blockmeta"])
            got = (t.column("payload"), t.column("blockmeta"))
            self._rg_cache[rg] = got
        off = i - int(self._rg_starts[rg])
        return got[0][off].as_py(), got[1][off].as_py()

    def _pos_row(self, i: int) -> bytes:
        # position streams read + cache SEPARATELY from the main
        # payload: a pure BM25 query over a positional index must not
        # pay the (usually larger) pospayload bytes per row group
        rg = int(np.searchsorted(self._rg_starts, i, side="right")) - 1
        got = self._pos_rg_cache.get(rg)
        if got is None:
            got = self.pf.read_row_group(
                rg, columns=["pospayload"]).column("pospayload")
            self._pos_rg_cache[rg] = got
        return got[i - int(self._rg_starts[rg])].as_py()

    def runs(self, term: str) -> list[tuple[int, bytes, bytes, int]]:
        """[(min_doc, payload, blockmeta, df)] for a term, unordered."""
        out = []
        for i in self.by_term.get(term, ()):
            payload, bm = self._payload_row(i)
            out.append((int(self.min_doc[i]), payload, bm, int(self.df[i])))
        return out

    def pos_runs(self, term: str) -> list[tuple[int, bytes]]:
        """[(min_doc, pospayload)] for a term (positional indexes)."""
        return [(int(self.min_doc[i]), self._pos_row(i))
                for i in self.by_term.get(term, ())]

    def terms_with_prefix(self, prefix: str) -> list[str]:
        """Distinct terms in this file's directory starting with
        ``prefix``. The directory is term-sorted on disk (merge output),
        so this is a bisect range scan, not a full directory sweep."""
        if getattr(self, "_vocab", None) is None:
            # sorted-unique view built lazily on first prefix query
            self._vocab = sorted(self.by_term)
        lo = bisect.bisect_left(self._vocab, prefix)
        hi = bisect.bisect_right(self._vocab, prefix + "\U0010ffff")
        return self._vocab[lo:hi]


class IndexReader:
    """Driver-side postings access: term -> globally docID-sorted
    (doc_ids, tfs, dls) + global df."""

    # decoded-postings LRU: head (Zipf) terms recur across queries, and
    # re-decoding a multi-MB posting run per query dominated p95. Budget
    # is in postings (bounds memory: ~16B/posting decoded -> ~1 GiB).
    # Must comfortably exceed one query's terms or warm queries thrash.
    CACHE_POSTINGS_BUDGET = 64_000_000

    def __init__(self, index_dir: str) -> None:
        from collections import OrderedDict

        self.index_dir = index_dir
        self.stats = read_json(os.path.join(index_dir, "stats.json"))
        self.shards = ShardFiles(index_dir)
        self._file_cache: dict[str, _FileTermIndex] = {}
        self._term_cache: OrderedDict[str, tuple] = OrderedDict()
        self._cache_postings = 0
        self._pos_cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._cache_positions = 0

    def _file(self, path: str) -> _FileTermIndex:
        fi = self._file_cache.get(path)
        if fi is None:
            fi = _FileTermIndex(path)
            self._file_cache[path] = fi
        return fi

    def _decoded(self, term: str):
        """-> (ids, tfs, dls, (block_last, block_max_tf, block_min_dl),
        df) or None, LRU-cached. Arrays are the globally docID-sorted
        concatenation of the term's salt chunks, decoded jointly (one
        vectorized varint pass per stream, codec.decode_runs_joint)."""
        got = self._term_cache.get(term)
        if got is not None:
            self._term_cache.move_to_end(term)
            return got
        runs = []
        for path in self.shards.files_for_term(term):
            runs.extend(self._file(path).runs(term))
        if not runs:
            return None
        runs.sort(key=lambda r: r[0])  # salt chunks are doc-range disjoint
        from rse_ray.functions.codec import decode_runs_joint

        ids, tfs, dls = decode_runs_joint([r[1] for r in runs])
        metas = [decode_block_meta(r[2]) for r in runs]
        block_meta = (
            np.concatenate([m[0] for m in metas]),
            np.concatenate([m[1] for m in metas]),
            np.concatenate([m[2] for m in metas]),
        )
        df = int(sum(r[3] for r in runs))
        got = (ids, tfs, dls, block_meta, df)
        self._term_cache[term] = got
        self._cache_postings += len(ids)
        while (self._cache_postings > self.CACHE_POSTINGS_BUDGET
               and len(self._term_cache) > 1):
            _, old = self._term_cache.popitem(last=False)
            self._cache_postings -= len(old[0])
        return got

    def postings(self, term: str):
        got = self._decoded(term)
        if got is None:
            return None
        ids, tfs, dls, _, df = got
        return (ids, tfs, dls, df)

    def postings_with_blocks(self, term: str):
        """Like postings() but with the concatenated block metadata."""
        return self._decoded(term)

    def positions(self, term: str):
        """-> (ids, tfs, pos_flat) or None. pos_flat holds doc i's
        positions at [cum_tf[i-1], cum_tf[i]) — pos runs are sorted by
        min_doc like the main payload's, so the (LRU-cached) _decoded
        tfs drive one vectorized joint position decode. Decoded
        position streams get their own LRU (warm phrase re-queries
        skip the varint pass). Raises on an index built without
        positions=True."""
        from rse_ray.functions.codec import decode_pos_runs_joint

        got = self._decoded(term)
        if got is None:
            return None
        ids, tfs, _dls, _bm, _df = got
        pos = self._pos_cache.get(term)
        if pos is not None:
            self._pos_cache.move_to_end(term)
            return ids, tfs, pos
        pruns = []
        for path in self.shards.files_for_term(term):
            fi = self._file(path)
            if not fi.has_pos:
                raise ValueError(
                    "positional query on an index built without "
                    "BuildConfig(positions=True)")
            pruns.extend(fi.pos_runs(term))
        pruns.sort(key=lambda r: r[0])
        pos = decode_pos_runs_joint([r[1] for r in pruns], tfs)
        self._pos_cache[term] = pos
        self._cache_positions += len(pos)
        while (self._cache_positions > self.CACHE_POSTINGS_BUDGET
               and len(self._pos_cache) > 1):
            _, old = self._pos_cache.popitem(last=False)
            self._cache_positions -= len(old)
        return ids, tfs, pos

    def df(self, term: str) -> int:
        """Global document frequency from the term DIRECTORIES alone —
        no payload row-group read, so tf-idf term selection (e.g.
        more-like-this) costs directory lookups only."""
        total = 0
        for path in self.shards.files_for_term(term):
            fi = self._file(path)
            for i in fi.by_term.get(term, ()):
                total += int(fi.df[i])
        return total

    def expand_prefix(self, prefix: str) -> list[str]:
        """Sorted distinct index terms starting with ``prefix`` — the
        wildcard-query dictionary expansion (`pre*`). Touches only the
        shard files whose term range intersects the prefix interval and
        bisects each file's sorted directory."""
        out: set[str] = set()
        for path in self.shards.files_for_prefix(prefix):
            out.update(self._file(path).terms_with_prefix(prefix))
        return sorted(out)


# --------------------------------------------------------------------------
# scoring
# --------------------------------------------------------------------------

def _query_weights(query: str, stem: bool):
    """-> sorted [(term, qtf)]; sorted order fixes fp accumulation."""
    toks = tokenize(query, stem=stem)
    qtf: dict[str, int] = {}
    for t in toks:
        qtf[t] = qtf.get(t, 0) + 1
    return sorted(qtf.items())


def _idf(N: int, df: int) -> float:
    return math.log(1 + (N - df + 0.5) / (df + 0.5))


def _rank_topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """Top-k by (score desc, doc_id asc), deterministic. Pre-filters
    with an O(n) partition so the exact lexsort runs on ~k rows, not
    millions (>= keeps every kth-score tie, so tie-breaks stay exact)."""
    n = len(doc_ids)
    if n == 0:
        return []
    if n > max(4096, 4 * k):
        kth = np.partition(scores, n - k)[n - k]
        sel = np.flatnonzero(scores >= kth)
        doc_ids, scores = doc_ids[sel], scores[sel]
    order = np.lexsort((doc_ids, -scores))
    top = order[:k]
    return [(int(doc_ids[i]), float(scores[i])) for i in top]


class _DenseDocMap:
    """doc_id <-> dense [0, N) mapping from the docs-checkpoint
    manifests (doc_id = bucket << BITS | rank, ranks dense per bucket).
    Enables an O(N)-array scatter-add accumulator instead of
    unique+searchsorted over multi-million-row posting unions. Note:
    sized by corpus doc count — a driver/actor-local accumulator is an
    explicitly single-node shortcut; the scatter-gather path shards it."""

    def __init__(self, index_dir: str) -> None:
        from rse_ray.functions.ids import DOC_BUCKET_BITS
        from rse_ray.state.manifest import PartitionManifests

        rows = PartitionManifests(os.path.join(index_dir, "docs")).load_all()
        if not rows:
            raise FileNotFoundError("no docs manifests")
        self._bits = DOC_BUCKET_BITS
        self._mask = (1 << DOC_BUCKET_BITS) - 1
        buckets = sorted((int(r["bucket"]), int(r["num_docs"])) for r in rows)
        sizes = np.zeros(buckets[-1][0] + 1, dtype=np.int64)
        for b, nd in buckets:
            sizes[b] = nd
        self.offsets = np.concatenate(([0], np.cumsum(sizes)))
        self.N = int(self.offsets[-1])

    def dense(self, ids: np.ndarray) -> np.ndarray:
        return self.offsets[ids >> self._bits] + (ids & self._mask)

    def docids(self, dense_idx: np.ndarray) -> np.ndarray:
        b = np.searchsorted(self.offsets, dense_idx, side="right") - 1
        return (b.astype(np.int64) << self._bits) | (dense_idx - self.offsets[b])


def _accumulate_topk_dense(id_parts, contrib_parts, k, dmap: _DenseDocMap):
    """Same sums and fp order as _accumulate_topk (one scatter-add per
    term, sorted-term order), but into a dense corpus-sized array: no
    unique/searchsorted over the posting union. Matched docs always
    score > 0 (idf > 0, tf_part > 0), so acc > 0 == matched."""
    if not id_parts:
        return []
    acc = np.zeros(dmap.N, dtype=np.float64)
    for ids, contrib in zip(id_parts, contrib_parts):
        acc[dmap.dense(ids)] += contrib
    n = dmap.N
    kth = np.partition(acc, n - k)[n - k] if n > k else 0.0
    cand = np.flatnonzero(acc >= kth) if kth > 0 else np.flatnonzero(acc > 0)
    docids = dmap.docids(cand)
    scores = acc[cand]
    order = np.lexsort((docids, -scores))[:k]
    return [(int(docids[i]), float(scores[i])) for i in order]


def _accumulate_topk(id_parts, contrib_parts, k):
    """Sum per-term contribution arrays into per-doc scores with ONE
    scatter-add per term, applied in the parts' (sorted-term) order —
    the per-doc fp accumulation order is then exactly the oracle's
    sequential sorted-term order (np.add.reduceat would NOT be: it sums
    pairwise). Each term's docs are unique, so fancy-indexed += is safe."""
    if not id_parts:
        return []
    uniq = np.unique(np.concatenate(id_parts))
    acc = np.zeros(len(uniq), dtype=np.float64)
    for ids, contrib in zip(id_parts, contrib_parts):
        acc[np.searchsorted(uniq, ids)] += contrib
    return _rank_topk(uniq, acc, k)


def fetch_doc_texts(index_dir: str, doc_ids) -> dict[int, str]:
    """Point-lookup texts of a handful of docs via the bucket-routed
    docmap: one bucket parquet read per distinct bucket, never a
    corpus scan — the shared retrieval-tail helper behind PRF
    expansion and snippet generation."""
    from rse_ray.functions.ids import DOC_BUCKET_BITS

    docs_dir = os.path.join(index_dir, "docs")
    by_bucket: dict[int, list[int]] = {}
    for did in doc_ids:
        by_bucket.setdefault(int(did) >> DOC_BUCKET_BITS, []).append(int(did))
    out: dict[int, str] = {}
    for b, dids in sorted(by_bucket.items()):
        t = pq.read_table(
            os.path.join(docs_dir, f"bucket_{b:06d}.parquet"),
            columns=["doc_id", "text"])
        ids = t.column("doc_id").to_numpy()
        for did in dids:
            row = int(np.searchsorted(ids, did))
            if row >= len(ids) or int(ids[row]) != did:
                raise KeyError(f"doc_id {did} not in docmap")
            out[did] = t.column("text")[row].as_py() or ""
    return out


def index_stats(index_dir: str) -> dict:
    """Index-level metrics from METADATA alone — the A6 doc/term/byte
    counters surfaced as a queryable op, proven against corpus ground
    truth by the driver's SQL twin: num_docs / num_tokens come from
    stats.json (the build's segment counters — nothing is recomputed
    from the corpus), num_terms / num_postings from the shard files'
    term DIRECTORIES ((term, df) — a few bytes per dictionary entry;
    posting payloads are never touched). avgdl is re-derived as
    num_tokens/num_docs and rounded at 9dp so the SQL twin divides
    identically. Driver-side dictionary aggregation is
    metadata-scale (the term dictionary, not the corpus)."""
    stats = read_json(os.path.join(index_dir, "stats.json"))
    df_by_term: dict[str, int] = {}
    for path in ShardFiles(index_dir).files:
        t = pq.read_table(path, columns=["term", "df"])
        for term, df in zip(t.column("term").to_pylist(),
                            t.column("df").to_numpy()):
            df_by_term[term] = df_by_term.get(term, 0) + int(df)
    n_docs = int(stats["num_docs"])
    n_tokens = int(stats["num_tokens"])
    avgdl = round(n_tokens / n_docs, 9) if n_docs else 0.0
    return {
        "num_docs": n_docs,
        "num_tokens": n_tokens,
        "avgdl": avgdl,
        "num_terms": len(df_by_term),
        "num_postings": int(sum(df_by_term.values())),
    }


def delete_urls(index_dir: str, urls: list[str]) -> int:
    """Tombstone deletes (the Lucene model): resolve each url to its
    doc_id via the bucket-routed docmap (point lookups — crc32 names
    the ONE bucket file per url, no docmap scan) and append to
    ``tombstones.parquet`` atomically. Query paths mask tombstoned
    docs out of every result; corpus stats (N, avgdl, df) stay stale
    until the next full/refresh build, exactly like Lucene deletes
    before a segment merge. Returns the total distinct tombstone
    count after the append (re-deleting is a no-op)."""
    import pyarrow as pa

    from rse_ray.functions.ids import url_bucket
    from rse_ray.state.manifest import write_file_atomic

    stats = read_json(os.path.join(index_dir, "stats.json"))
    nb = int(stats["num_buckets"])
    docs_dir = os.path.join(index_dir, "docs")
    by_bucket: dict[int, list[str]] = {}
    for u in urls:
        by_bucket.setdefault(url_bucket(u, nb), []).append(u)
    got_urls, got_ids = [], []
    for bucket, us in by_bucket.items():
        path = os.path.join(docs_dir, f"bucket_{bucket:06d}.parquet")
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, columns=["doc_id", "url"])
        pos = {u: int(d) for d, u in zip(t.column("doc_id").to_numpy(),
                                         t.column("url").to_pylist())}
        for u in us:
            if u in pos:
                got_urls.append(u)
                got_ids.append(pos[u])
    ts_path = os.path.join(index_dir, "tombstones.parquet")
    if os.path.exists(ts_path):
        old = pq.read_table(ts_path)
        got_urls = old.column("url").to_pylist() + got_urls
        got_ids = old.column("doc_id").to_pylist() + got_ids
    seen: dict[int, str] = dict(zip(got_ids, got_urls))
    ids_sorted = sorted(seen)
    t = pa.table({"url": pa.array([seen[i] for i in ids_sorted],
                                  type=pa.string()),
                  "doc_id": pa.array(ids_sorted, type=pa.int64())})
    write_file_atomic(ts_path, lambda tmp: pq.write_table(t, tmp))
    return len(seen)


class Searcher:
    def __init__(self, index_dir: str) -> None:
        self.index_dir = index_dir
        self.reader = IndexReader(index_dir)
        self.N = int(self.reader.stats["num_docs"])
        self.avgdl = float(self.reader.stats["avgdl"])
        self.stem = bool(self.reader.stats.get("stem", True))
        try:
            self.dmap = _DenseDocMap(index_dir)
        except (FileNotFoundError, OSError):
            self.dmap = None  # index without docs checkpoint
        ts_path = os.path.join(index_dir, "tombstones.parquet")
        self.deleted = None  # sorted doc_ids masked from every result
        if os.path.exists(ts_path):
            d = pq.read_table(ts_path, columns=["doc_id"]) \
                .column("doc_id").to_numpy()
            if len(d):
                self.deleted = np.sort(d.astype(np.int64))

    def _keep_mask(self, ids: np.ndarray, allowed=None):
        """Boolean keep-mask applying tombstones and (optionally) an
        ``allowed`` sorted doc_id whitelist; None = keep everything."""
        m = None
        if self.deleted is not None:
            m = ~np.isin(ids, self.deleted, assume_unique=True)
        if allowed is not None:
            ma = np.isin(ids, allowed, assume_unique=True)
            m = ma if m is None else (m & ma)
        return m

    def _excluded_ids(self, excluded) -> np.ndarray | None:
        """Sorted doc_id union of the posting lists of ``excluded``
        (raw terms, tokenized with the index's stem setting) — the
        boolean-NOT mask set. Terms absent from the index contribute
        nothing."""
        if not excluded:
            return None
        parts = []
        for raw in excluded:
            for t in set(tokenize(raw, stem=self.stem)):
                got = self.reader.postings(t)
                if got is not None:
                    parts.append(got[0])
        if not parts:
            return None
        return np.unique(np.concatenate(parts))

    # ---- exhaustive TAAT (the rank-identity oracle-matching path) -------
    def search(self, query: str, k: int = 10, *, mode: str = "taat",
               conjunctive: bool = False, allowed=None, excluded=None,
               min_match: int | None = None):
        """``conjunctive=True`` is boolean-AND retrieval: only docs
        containing EVERY distinct query term are scored (the same BM25
        contributions, restricted to the posting-list intersection —
        rank-identical to TAAT filtered to all-terms docs). A query
        term absent from the index makes the result empty.

        ``allowed`` (sorted doc_id array) is attribute-filtered
        retrieval: only whitelisted docs are scored/ranked.
        ``excluded`` (list of raw terms) is boolean-NOT retrieval: any
        doc containing ANY excluded term is dropped before scoring
        (Lucene MUST_NOT semantics — idf/avgdl stay full-corpus).
        ``min_match`` is minimum-should-match retrieval (Lucene
        minimumShouldMatch): only docs containing >= min_match
        DISTINCT query terms are scored, each by the contributions of
        the terms it actually has — conjunctive is the
        min_match = n_terms special case, plain OR is min_match = 1.
        Tombstoned docs (delete_urls) are always masked. Any
        restriction forces the TAAT path (BMW's block bounds describe
        the unmasked lists)."""
        if (mode == "bmw" and self.deleted is None and allowed is None
                and not conjunctive and not excluded
                and min_match in (None, 1)):
            # min_match=1 IS plain OR retrieval — keep the BMW fast path
            return self.search_bmw(query, k)
        excl = self._excluded_ids(excluded)
        terms = _query_weights(query, self.stem)
        id_parts, contrib_parts = [], []
        for term, qtf in terms:
            got = self.reader.postings(term)
            if got is None:
                if conjunctive:
                    return []  # a missing term empties the AND result
                continue
            ids, tfs, dls, df = got
            m = self._keep_mask(ids, allowed)
            if excl is not None:
                me = ~np.isin(ids, excl, assume_unique=True)
                m = me if m is None else (m & me)
            if m is not None:
                ids, tfs, dls = ids[m], tfs[m], dls[m]
                if not len(ids):
                    if conjunctive:
                        return []
                    continue
            w = qtf * _idf(self.N, df)
            tf_part = (tfs * (K1 + 1)) / (tfs + K1 * (1 - B + B * dls / self.avgdl))
            id_parts.append(ids)
            contrib_parts.append(w * tf_part)
        if conjunctive and id_parts:
            # posting ids are unique per term; intersect then mask each
            # term's rows down to the all-terms doc set
            inter = id_parts[0]
            for ids in id_parts[1:]:
                inter = inter[np.isin(inter, ids, assume_unique=True)]
            keep = [np.isin(ids, inter, assume_unique=True)
                    for ids in id_parts]
            id_parts = [ids[m] for ids, m in zip(id_parts, keep)]
            contrib_parts = [c[m] for c, m in zip(contrib_parts, keep)]
        if min_match is not None and min_match > 1 and id_parts:
            # ids are unique within a term's postings, so per-doc
            # multiplicity across parts == distinct matched terms
            uniq, cnt = np.unique(np.concatenate(id_parts),
                                  return_counts=True)
            ok = uniq[cnt >= min_match]
            keep = [np.isin(ids, ok, assume_unique=True)
                    for ids in id_parts]
            id_parts = [ids[m] for ids, m in zip(id_parts, keep)]
            contrib_parts = [c[m] for c, m in zip(contrib_parts, keep)]
        if self.dmap is not None:
            return _accumulate_topk_dense(id_parts, contrib_parts, k, self.dmap)
        return _accumulate_topk(id_parts, contrib_parts, k)

    def total_hits(self, query: str) -> int:
        """The search API's `total` field: how many live docs match
        >= 1 query term (posting-union cardinality, tombstones
        masked) — computed without scoring or ranking anything."""
        parts = []
        for term, _ in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is not None:
                parts.append(got[0])
        if not parts:
            return 0
        ids = np.unique(np.concatenate(parts))
        m = self._keep_mask(ids)
        return int(len(ids) if m is None else m.sum())

    def search_lm(self, query: str, k: int | None = None, *,
                  mu: float = 2000.0):
        """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
        Lafferty 2004; mu=2000 is the classic default) — the standard
        alternative to BM25 served from the SAME index arrays:

            score(d) = sum_t qtf_t * ln((tf_td + mu*cf_t/T)
                                        / (dl_d + mu))

        over candidates = docs matching >= 1 query term, where cf_t is
        the term's collection frequency (sum of tf over its full
        posting list) and T the corpus token count (stats.json). Docs
        lacking a term still pay its smoothed tf=0 contribution — the
        per-doc dl coupling that makes LM scoring different from a
        per-posting accumulate. Scores are negative log-likelihoods;
        ranking is (score desc, doc_id asc). Tombstoned docs are
        masked from candidates; cf/T stay full-corpus (idf-analog
        stays stable under deletes, same policy as BM25's df)."""
        T = float(self.reader.stats["num_tokens"])
        posts = []
        for term, qtf in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, _df = got
            posts.append((qtf, ids, tfs, dls, float(tfs.sum())))
        if not posts or T <= 0:
            return []
        cand = np.unique(np.concatenate([p[1] for p in posts]))
        m = self._keep_mask(cand)
        if m is not None:
            cand = cand[m]
        if not len(cand):
            return []

        def rows_in_cand(ids):
            r = np.searchsorted(cand, ids)
            ok = r < len(cand)
            ok[ok] = cand[r[ok]] == ids[ok]
            return r, ok

        dl = np.zeros(len(cand), dtype=np.float64)
        for _, ids, _, dls, _ in posts:
            r, ok = rows_in_cand(ids)
            dl[r[ok]] = dls[ok]
        score = np.zeros(len(cand), dtype=np.float64)
        denom = dl + mu
        for qtf, ids, tfs, _, cf in posts:
            tf_vec = np.zeros(len(cand), dtype=np.float64)
            r, ok = rows_in_cand(ids)
            tf_vec[r[ok]] = tfs[ok]
            # (mu * cf) / T, matching the SQL twin's left-associative
            # mu*cf/t — the two groupings differ in the last ulp
            score += qtf * np.log((tf_vec + (mu * cf) / T) / denom)
        return _rank_topk(cand, score, k if k is not None else len(cand))

    def search_lm_jm(self, query: str, k: int | None = None, *,
                     lam: float = 0.1):
        """Query-likelihood retrieval with Jelinek-Mercer smoothing
        (Zhai & Lafferty 2004; lambda=0.1 is their short-query
        default) — the fixed-interpolation sibling of search_lm:

            score(d) = sum_t qtf_t * ln((1-lam) * tf_td / dl_d
                                        + lam * cf_t / T)

        Same candidate set, delete-masking, cf/T policy and
        (score desc, doc_id asc) ranking as search_lm; only the
        smoothing differs (document-length-independent mixture weight
        instead of Dirichlet's mu/(dl+mu))."""
        T = float(self.reader.stats["num_tokens"])
        posts = []
        for term, qtf in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, _df = got
            posts.append((qtf, ids, tfs, dls, float(tfs.sum())))
        if not posts or T <= 0:
            return []
        cand = np.unique(np.concatenate([p[1] for p in posts]))
        m = self._keep_mask(cand)
        if m is not None:
            cand = cand[m]
        if not len(cand):
            return []

        def rows_in_cand(ids):
            r = np.searchsorted(cand, ids)
            ok = r < len(cand)
            ok[ok] = cand[r[ok]] == ids[ok]
            return r, ok

        dl = np.zeros(len(cand), dtype=np.float64)
        for _, ids, _, dls, _ in posts:
            r, ok = rows_in_cand(ids)
            dl[r[ok]] = dls[ok]
        score = np.zeros(len(cand), dtype=np.float64)
        for qtf, ids, tfs, _, cf in posts:
            tf_vec = np.zeros(len(cand), dtype=np.float64)
            r, ok = rows_in_cand(ids)
            tf_vec[r[ok]] = tfs[ok]
            # groupings mirror the SQL twin's left-associativity:
            # (1-lam)*(tf/dl) + (lam*cf)/T
            score += qtf * np.log((1.0 - lam) * (tf_vec / dl)
                                  + (lam * cf) / T)
        return _rank_topk(cand, score, k if k is not None else len(cand))

    def search_dfr_pl2(self, query: str, k: int | None = None, *,
                       c: float = 1.0):
        """Divergence-from-randomness retrieval, PL2 model (Amati &
        van Rijsbergen 2002; Terrier's default DFR instance) — a
        FOURTH scoring family on the same index arrays (BM25,
        Dirichlet LM, JM LM, DFR):

            tfn      = tf * log2(1 + c * avgdl / dl)
            lambda_t = cf_t / N          (mean term freq per doc)
            score(d) = sum_t qtf_t * (1 / (tfn + 1)) *
                       (tfn * log2(tfn / lambda_t)
                        + (lambda_t - tfn) * log2(e)
                        + 0.5 * log2(2 * pi * tfn))

        Unlike the LM scorers, an absent term contributes 0 (tf = 0
        never enters), so this is a per-posting accumulate like BM25.
        Candidates, delete-masking, cf policy and (score desc,
        doc_id asc) ranking follow the sibling scorers; cf/N stay
        full-corpus under deletes (the stable-idf policy)."""
        log2e = np.log2(np.e)
        two_pi = 2.0 * np.pi
        id_parts, contrib_parts = [], []
        for term, qtf in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, _df = got
            lam = float(tfs.sum()) / self.N
            m = self._keep_mask(ids)
            if m is not None:
                ids, tfs, dls = ids[m], tfs[m], dls[m]
                if not len(ids):
                    continue
            tfn = tfs * np.log2(1.0 + (c * self.avgdl) / dls)
            gain = (tfn * np.log2(tfn / lam)
                    + (lam - tfn) * log2e
                    + 0.5 * np.log2(two_pi * tfn))
            id_parts.append(ids)
            contrib_parts.append(qtf * gain / (tfn + 1.0))
        if not id_parts:
            return []
        cand = np.unique(np.concatenate(id_parts))
        score = np.zeros(len(cand), dtype=np.float64)
        for ids, contrib in zip(id_parts, contrib_parts):
            score[np.searchsorted(cand, ids)] += contrib
        return _rank_topk(cand, score, k if k is not None else len(cand))

    def search_maxscore(self, query: str, k: int = 10, *,
                        stats: dict | None = None):
        """MaxScore dynamic pruning (Turtle & Flood 1995, TAAT form):
        rank-identical to exhaustive search() (scores agree up to fp
        re-association — terms accumulate in ub order here, term order
        there — which the 6dp result contract absorbs), but term lists are
        processed in DESCENDING max-contribution order and (a) docs
        whose partial score plus the remaining terms' summed upper
        bounds cannot reach the running k-th score are dropped, (b)
        once the remaining bound itself falls below the threshold, new
        docs stop being admitted — later (cheaper) lists only update
        already-admitted docs. The other classic pruning family next
        to the block-max WAND path (search_bmw): WAND skips inside
        lists, MaxScore skips whole tails of the term set. Exactness
        argument: scores only grow, so the k-th largest partial is a
        valid lower bound on the final k-th score; a doc is dropped
        (or never admitted) only when even its full remaining upper
        bound cannot cross that lower bound. ``stats`` (optional dict)
        receives admitted/pruned/skipped counters for tests."""
        posts = []
        for term, qtf in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, df = got
            m = self._keep_mask(ids)
            if m is not None:
                ids, tfs, dls = ids[m], tfs[m], dls[m]
                if not len(ids):
                    continue
            w = qtf * _idf(self.N, df)
            contrib = w * (tfs * (K1 + 1)) / (
                tfs + K1 * (1 - B + B * dls / self.avgdl))
            posts.append((float(contrib.max()), ids, contrib))
        if not posts:
            return []
        posts.sort(key=lambda p: -p[0])
        ubs = np.array([p[0] for p in posts])
        remaining = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:],
                                    [0.0]])
        cand = np.empty(0, dtype=np.int64)
        score = np.empty(0, dtype=np.float64)
        theta = -np.inf
        admitted = pruned = skipped_new = 0
        for j, (ub, ids, contrib) in enumerate(posts):
            pos = np.searchsorted(cand, ids)
            pos_c = np.clip(pos, 0, max(len(cand) - 1, 0))
            known = np.zeros(len(ids), dtype=bool)
            if len(cand):
                known = cand[pos_c] == ids
            np.add.at(score, pos_c[known], contrib[known])
            new = ~known
            if new.any():
                if ub + remaining[j] >= theta or len(cand) < k:
                    order = np.argsort(
                        np.concatenate([cand, ids[new]]), kind="stable")
                    cand = np.concatenate([cand, ids[new]])[order]
                    score = np.concatenate([score, contrib[new]])[order]
                    admitted += int(new.sum())
                else:
                    skipped_new += int(new.sum())
            if len(score) >= k:
                theta = np.partition(score, len(score) - k)[len(score) - k]
                keep = score + remaining[j] >= theta
                pruned += int(len(keep) - keep.sum())
                cand, score = cand[keep], score[keep]
        if stats is not None:
            stats.update(admitted=admitted, pruned=pruned,
                         skipped_new=skipped_new)
        return _rank_topk(cand, score, k)

    def search_champions(self, query: str, k: int = 10, *, m: int = 16):
        """Champion-list retrieval (static index pruning, Manning IR
        ch.7): each term contributes only its top-``m`` postings by
        (tf desc, doc_id asc) — the 'champion list' a pruned tier
        would have precomputed — and docs are scored by the terms
        whose champion list contains them. Approximate by design
        (long-tail docs of head terms can't surface), but fully
        deterministic: the champion cut, BM25 contributions (full-
        corpus df/avgdl, like every pruned tier) and (score desc,
        doc_id asc) ranking are all exactly reproducible, so the SQL
        twin expresses the SAME pruned result, not a tolerance band.
        Tombstones are masked BEFORE the cut (a deleted doc must not
        eat a champion slot)."""
        id_parts, contrib_parts = [], []
        for term, qtf in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, df = got
            mk = self._keep_mask(ids)
            if mk is not None:
                ids, tfs, dls = ids[mk], tfs[mk], dls[mk]
                if not len(ids):
                    continue
            if len(ids) > m:
                # exact top-m by tf desc; ties AT the boundary tf
                # resolve by URL — the only cross-engine-stable order
                # (internal dense docIDs follow crc32-bucket layout,
                # and for doc:// corpora URL order IS the table's
                # doc_id order the SQL twin cuts by). A real pruned
                # tier precomputes this at BUILD time; doing it at
                # query time keeps one index on disk while the cut
                # semantics stay identical.
                order = np.argsort(-tfs, kind="stable")
                btf = tfs[order[m - 1]]
                sure = order[tfs[order] > btf]
                cand = order[tfs[order] == btf]
                need = m - len(sure)
                if len(cand) > need:
                    ranked = hydrate_urls(
                        self.index_dir,
                        [(int(ids[i]), 0.0) for i in cand])
                    url_of = {d: u for d, _, u in ranked}
                    cand = np.array(
                        sorted(cand,
                               key=lambda i: url_of[int(ids[i])])
                        [:need], dtype=np.int64)
                keep = np.concatenate(
                    [sure, cand]).astype(np.int64)
                ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            w = qtf * _idf(self.N, df)
            tf_part = (tfs * (K1 + 1)) / (
                tfs + K1 * (1 - B + B * dls / self.avgdl))
            id_parts.append(ids)
            contrib_parts.append(w * tf_part)
        return _accumulate_topk(id_parts, contrib_parts, k)

    def search_bm25plus(self, query: str, k: int | None = None, *,
                        delta: float = 1.0):
        """BM25+ (Lv & Zhai, CIKM 2011): lower-bounds the term-
        frequency normalization so very long docs can't zero out a
        matched term's contribution —

            score(d) = sum_t qtf_t * ln((N+1)/df_t) *
                       ((k1+1)*tfn/(k1 + tfn) + delta),
            tfn = tf / (1 - b + b*dl/avgdl)

        over docs actually containing the term (the +delta applies to
        MATCHED terms only, per the paper). Same k1/b, tombstone
        masking and (score desc, doc_id asc) ranking as search()."""
        id_parts, contrib_parts = [], []
        for term, qtf in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, df = got
            m = self._keep_mask(ids)
            if m is not None:
                ids, tfs, dls = ids[m], tfs[m], dls[m]
                if not len(ids):
                    continue
            w = qtf * math.log((self.N + 1) / df)
            tfn = tfs / (1 - B + B * dls / self.avgdl)
            id_parts.append(ids)
            contrib_parts.append(
                w * ((K1 + 1) * tfn / (K1 + tfn) + delta))
        n = self.N if k is None else k
        return _accumulate_topk(id_parts, contrib_parts, n)

    def ltr_features(self, query: str):
        """Learning-to-rank feature extraction served from the index:
        for every candidate doc (>= 1 query term, tombstones masked)
        return the classic LTR feature block — bm25 (the full qtf-
        weighted score), dl, n_match (distinct query terms present),
        sum_tf / max_tf over matched terms, and sum_idf of the matched
        terms. One pass over the same posting arrays BM25 scores from;
        this is the offline feature-join that feeds a downstream
        ranker (LambdaMART et al.), so it returns EVERY candidate, not
        a top-k. -> (cand_ids, {feature: np.ndarray})."""
        posts = []
        for term, qtf in _query_weights(query, self.stem):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, df = got
            posts.append((qtf, ids, tfs, dls, df))
        if not posts:
            return np.empty(0, dtype=np.int64), {}
        cand = np.unique(np.concatenate([p[1] for p in posts]))
        m = self._keep_mask(cand)
        if m is not None:
            cand = cand[m]
        if not len(cand):
            return cand, {}

        def rows_in_cand(ids):
            r = np.searchsorted(cand, ids)
            ok = r < len(cand)
            ok[ok] = cand[r[ok]] == ids[ok]
            return r, ok

        n = len(cand)
        feats = {
            "bm25": np.zeros(n, dtype=np.float64),
            "dl": np.zeros(n, dtype=np.int64),
            "n_match": np.zeros(n, dtype=np.int64),
            "sum_tf": np.zeros(n, dtype=np.int64),
            "max_tf": np.zeros(n, dtype=np.int64),
            "sum_idf": np.zeros(n, dtype=np.float64),
        }
        for qtf, ids, tfs, dls, df in posts:
            r, ok = rows_in_cand(ids)
            rr = r[ok]
            feats["dl"][rr] = dls[ok]
            idf = _idf(self.N, df)
            tf_part = (tfs * (K1 + 1)) / (
                tfs + K1 * (1 - B + B * dls / self.avgdl))
            feats["bm25"][rr] += qtf * idf * tf_part[ok]
            feats["n_match"][rr] += 1
            feats["sum_tf"][rr] += tfs[ok]
            np.maximum.at(feats["max_tf"], rr, tfs[ok])
            feats["sum_idf"][rr] += idf
        return cand, feats

    def search_after(self, query: str, k: int = 10, after=None):
        """Cursor pagination (Lucene search_after): return the next
        ``k`` hits STRICTLY after the ``after`` cursor — a
        (score, doc_id) pair from a previous page's last hit — in the
        global (score desc, doc_id asc) order. Deep pagination stays
        O(matching docs) per page here; at fleet scale the cursor
        score doubles as a BMW threshold seed so later pages prune
        MORE than page one, not less."""
        full = self.search(query, k=self.N)
        if after is None:
            return full[:k]
        a_score, a_doc = float(after[0]), int(after[1])
        out = []
        for d, s in full:
            if s < a_score or (s == a_score and d > a_doc):
                out.append((d, s))
                if len(out) == k:
                    break
        return out

    # ---- index-backed phrase retrieval -----------------------------------
    def search_phrase(self, phrase: str):
        """Exact phrase occurrences served from the POSITIONAL index
        (BuildConfig(positions=True)): intersect the phrase terms'
        posting lists, then count positions p with tokens[p+j] ==
        phrase[j] for all j via per-doc sorted-array intersections.
        Returns [(doc_id, n_matches)] in ascending doc_id, overlapping
        matches counted — the same contract as the corpus-scan
        pipelines.text.phrase_match, so the two share one oracle.
        Repeated phrase terms decode once and intersect per occurrence
        offset."""
        toks = tokenize(phrase, stem=self.stem)
        if not toks:
            raise ValueError("empty phrase")
        info: dict[str, tuple] = {}
        for t in set(toks):
            got = self.reader.positions(t)
            if got is None:
                return []
            ids, tfs, pos = got
            starts = np.zeros(len(ids) + 1, dtype=np.int64)
            np.cumsum(tfs, out=starts[1:])
            info[t] = (ids, starts, pos)
        inter = info[toks[0]][0]
        for t in set(toks[1:]):
            inter = inter[np.isin(inter, info[t][0], assume_unique=True)]
        m = self._keep_mask(inter)
        if m is not None:
            inter = inter[m]
        out = []
        # per-term row index of each intersected doc (posting ids are
        # sorted + unique -> searchsorted)
        row_of = {t: np.searchsorted(info[t][0], inter) for t in info}
        for i, did in enumerate(inter.tolist()):
            cand = None
            for j, t in enumerate(toks):
                ids, starts, pos = info[t]
                r = row_of[t][i]
                p = pos[starts[r]:starts[r + 1]] - j
                cand = p if cand is None else np.intersect1d(
                    cand, p, assume_unique=True)
                if not len(cand):
                    break
            if cand is not None and len(cand):
                out.append((int(did), int(len(cand))))
        return out

    def search_proximity(self, term_a: str, term_b: str):
        """Minimum token distance between two terms per doc, served
        from the positional index (NEAR/k ranking signal). Returns
        [(doc_id, min_dist)] ascending doc_id for docs holding BOTH
        terms — the contract of pipelines.text.term_proximity, so the
        two share one oracle. Per doc: sorted-positions searchsorted
        merge, O((na+nb) log), never the na x nb grid."""
        ta = tokenize(term_a, stem=self.stem)
        tb = tokenize(term_b, stem=self.stem)
        if len(ta) != 1 or len(tb) != 1:
            raise ValueError("search_proximity takes single terms")
        got_a = self.reader.positions(ta[0])
        got_b = self.reader.positions(tb[0])
        if got_a is None or got_b is None:
            return []
        ids_a, tfs_a, pos_a = got_a
        ids_b, tfs_b, pos_b = got_b
        starts_a = np.zeros(len(ids_a) + 1, dtype=np.int64)
        np.cumsum(tfs_a, out=starts_a[1:])
        starts_b = np.zeros(len(ids_b) + 1, dtype=np.int64)
        np.cumsum(tfs_b, out=starts_b[1:])
        inter = ids_a[np.isin(ids_a, ids_b, assume_unique=True)]
        m = self._keep_mask(inter)
        if m is not None:
            inter = inter[m]
        ra = np.searchsorted(ids_a, inter)
        rb = np.searchsorted(ids_b, inter)
        out = []
        for i, did in enumerate(inter.tolist()):
            pa_ = pos_a[starts_a[ra[i]]:starts_a[ra[i] + 1]]
            pb_ = pos_b[starts_b[rb[i]]:starts_b[rb[i] + 1]]
            j = np.searchsorted(pb_, pa_)
            lo = np.clip(j - 1, 0, len(pb_) - 1)
            hi = np.clip(j, 0, len(pb_) - 1)
            best = int(np.minimum(np.abs(pa_ - pb_[lo]),
                                  np.abs(pa_ - pb_[hi])).min())
            out.append((int(did), best))
        return out

    def search_span_near(self, term_a: str, term_b: str, *,
                         slop: int = 3):
        """Ordered span-near query (Lucene SpanNearQuery with
        inOrder=true): per doc, count positions of ``term_a`` that are
        followed by ``term_b`` within ``slop`` intervening tokens
        (gap <= slop, i.e. pos_b - pos_a in [1, slop+1]). Returns
        [(doc_id, n_spans)] ascending doc_id for docs with >= 1 span,
        served from the positional index. Per doc it's two
        searchsorted probes per a-position (window emptiness test) —
        O((na+nb) log nb), never the na x nb grid."""
        ta = tokenize(term_a, stem=self.stem)
        tb = tokenize(term_b, stem=self.stem)
        if len(ta) != 1 or len(tb) != 1:
            raise ValueError("search_span_near takes single terms")
        got_a = self.reader.positions(ta[0])
        got_b = self.reader.positions(tb[0])
        if got_a is None or got_b is None:
            return []
        ids_a, tfs_a, pos_a = got_a
        ids_b, tfs_b, pos_b = got_b
        starts_a = np.zeros(len(ids_a) + 1, dtype=np.int64)
        np.cumsum(tfs_a, out=starts_a[1:])
        starts_b = np.zeros(len(ids_b) + 1, dtype=np.int64)
        np.cumsum(tfs_b, out=starts_b[1:])
        inter = ids_a[np.isin(ids_a, ids_b, assume_unique=True)]
        m = self._keep_mask(inter)
        if m is not None:
            inter = inter[m]
        ra = np.searchsorted(ids_a, inter)
        rb = np.searchsorted(ids_b, inter)
        out = []
        for i, did in enumerate(inter.tolist()):
            pa_ = pos_a[starts_a[ra[i]]:starts_a[ra[i] + 1]]
            pb_ = pos_b[starts_b[rb[i]]:starts_b[rb[i] + 1]]
            lo = np.searchsorted(pb_, pa_, side="right")
            hi = np.searchsorted(pb_, pa_ + slop + 1, side="right")
            n = int(np.count_nonzero(hi > lo))
            if n:
                out.append((int(did), n))
        return out

    def search_phrase_gap(self, term_a: str, term_b: str, *,
                          gap: int = 1):
        """Wildcard-slot phrase query ("a * b" with exactly ``gap``
        wildcard tokens between): per doc, count positions of
        ``term_a`` whose matching ``term_b`` sits at EXACTLY
        pos_a + gap + 1 — the fixed-distance sibling of
        search_span_near's <= slop window. Returns [(doc_id,
        n_spans)] ascending doc_id for docs with >= 1 span. One
        searchsorted equality probe per a-position."""
        ta = tokenize(term_a, stem=self.stem)
        tb = tokenize(term_b, stem=self.stem)
        if len(ta) != 1 or len(tb) != 1:
            raise ValueError("search_phrase_gap takes single terms")
        got_a = self.reader.positions(ta[0])
        got_b = self.reader.positions(tb[0])
        if got_a is None or got_b is None:
            return []
        ids_a, tfs_a, pos_a = got_a
        ids_b, tfs_b, pos_b = got_b
        starts_a = np.zeros(len(ids_a) + 1, dtype=np.int64)
        np.cumsum(tfs_a, out=starts_a[1:])
        starts_b = np.zeros(len(ids_b) + 1, dtype=np.int64)
        np.cumsum(tfs_b, out=starts_b[1:])
        inter = ids_a[np.isin(ids_a, ids_b, assume_unique=True)]
        m = self._keep_mask(inter)
        if m is not None:
            inter = inter[m]
        ra = np.searchsorted(ids_a, inter)
        rb = np.searchsorted(ids_b, inter)
        out = []
        for i, did in enumerate(inter.tolist()):
            pa_ = pos_a[starts_a[ra[i]]:starts_a[ra[i] + 1]]
            pb_ = pos_b[starts_b[rb[i]]:starts_b[rb[i] + 1]]
            want = pa_ + gap + 1
            j = np.searchsorted(pb_, want)
            ok = (j < len(pb_)) & (pb_[np.minimum(j, len(pb_) - 1)]
                                   == want)
            n = int(np.count_nonzero(ok))
            if n:
                out.append((int(did), n))
        return out

    # ---- more-like-this (related docs) -----------------------------------
    def more_like_this(self, doc_id: int, *, m: int = 5, k: int = 20):
        """Related-document retrieval (the Lucene MoreLikeThis shape):
        fetch the source doc's text from the bucket-routed docmap
        (point lookup), rank its terms by tf * idf (ties by term asc),
        and run the top-m as an OR query with qtf=1, excluding the
        source doc. df comes from the term directories alone — no
        posting decode during term selection."""
        toks = tokenize(
            fetch_doc_texts(self.reader.index_dir, [doc_id])[doc_id],
            stem=self.stem)
        tf: dict[str, int] = {}
        for tk in toks:
            tf[tk] = tf.get(tk, 0) + 1
        scored = sorted(
            ((tfv * _idf(self.N, self.reader.df(term)), term)
             for term, tfv in tf.items()),
            key=lambda st: (-st[0], st[1]))
        top_terms = [term for _, term in scored[:m]]
        id_parts, contrib_parts = [], []
        for term in sorted(top_terms):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids_t, tfs, dls, df = got
            keep = ids_t != doc_id
            msk = self._keep_mask(ids_t)
            if msk is not None:
                keep &= msk
            ids_t, tfs, dls = ids_t[keep], tfs[keep], dls[keep]
            if not len(ids_t):
                continue
            w = _idf(self.N, df)
            tf_part = (tfs * (K1 + 1)) / (tfs + K1 * (1 - B + B * dls / self.avgdl))
            id_parts.append(ids_t)
            contrib_parts.append(w * tf_part)
        if self.dmap is not None:
            return _accumulate_topk_dense(id_parts, contrib_parts, k, self.dmap)
        return _accumulate_topk(id_parts, contrib_parts, k)

    # ---- pseudo-relevance feedback (Rocchio) ------------------------------
    def search_prf(self, query: str, k: int = 10, *, fb_docs: int = 10,
                   fb_terms: int = 5, beta: float = 0.5):
        """Rocchio pseudo-relevance feedback (two-round retrieval, the
        classic query-expansion loop): round 1 is plain TAAT BM25; the
        top ``fb_docs`` hits are ASSUMED relevant, their terms are
        ranked by offer weight sum_fb(tf) * idf (query terms excluded,
        ties by term asc), and the top ``fb_terms`` re-enter the query
        at weight ``beta`` next to the original terms at their qtf —
        round 2 scores the expanded weighted query. Fully
        deterministic, so the whole loop is SQL-twinnable.

        Scale shape: feedback texts are ``fb_docs`` point lookups via
        the bucket-routed docmap (one bucket parquet read per distinct
        bucket, never a corpus scan); expansion dfs come from the term
        directories alone; round 2 is a normal OR query over
        len(query terms) + fb_terms posting lists."""
        first = self.search(query, fb_docs)
        if not first:
            return []
        qterms = dict(_query_weights(query, self.stem))
        texts = fetch_doc_texts(self.reader.index_dir,
                                [did for did, _score in first])
        tf_sum: dict[str, int] = {}
        for text in texts.values():
            for tk in tokenize(text, stem=self.stem):
                tf_sum[tk] = tf_sum.get(tk, 0) + 1
        # Rocchio offer weight: feedback-summed tf x idf
        scored = sorted(
            ((float(tfv) * _idf(self.N, self.reader.df(term)), term)
             for term, tfv in tf_sum.items() if term not in qterms),
            key=lambda st: (-st[0], st[1]))
        weights = {t: float(q) for t, q in qterms.items()}
        for _w, term in scored[:fb_terms]:
            weights[term] = beta
        return self._search_weighted(weights, k)

    def _search_weighted(self, weights: dict[str, float], k: int):
        """OR retrieval with explicit per-term query weights —
        contributions accumulate in sorted-term order (the TAAT fp
        contract), w = weight * idf."""
        id_parts, contrib_parts = [], []
        for term, wq in sorted(weights.items()):
            got = self.reader.postings(term)
            if got is None:
                continue
            ids, tfs, dls, df = got
            m = self._keep_mask(ids)
            if m is not None:
                ids, tfs, dls = ids[m], tfs[m], dls[m]
                if not len(ids):
                    continue
            w = wq * _idf(self.N, df)
            tf_part = (tfs * (K1 + 1)) / (tfs + K1 * (1 - B + B * dls / self.avgdl))
            id_parts.append(ids)
            contrib_parts.append(w * tf_part)
        if self.dmap is not None:
            return _accumulate_topk_dense(id_parts, contrib_parts, k, self.dmap)
        return _accumulate_topk(id_parts, contrib_parts, k)

    # ---- query-aware snippets ---------------------------------------------
    def best_snippets(self, query: str, k: int = 10, *, width: int = 12):
        """Result-page snippet selection: for each top-k BM25 hit, the
        ``width``-token window holding the MOST DISTINCT query terms
        (ties -> earliest window; docs shorter than width are one
        whole-doc window). Returns [(doc_id, win_start, n_terms,
        snippet)]; snippet is the tokenizer's view (lowercased
        whitespace tokens joined by ' ') so a SQL twin replays it.
        Texts come as k bucket-routed point lookups (fetch_doc_texts);
        per doc the window scan is len(query terms) prefix-sum passes,
        O(n) each — never the n x width rescan."""
        hits = self.search(query, k)
        if not hits:
            return []
        qset = sorted({t for t, _ in _query_weights(query, self.stem)})
        texts = fetch_doc_texts(self.reader.index_dir,
                                [d for d, _ in hits])
        out = []
        for did, _score in hits:
            toks = tokenize(texts[did], stem=self.stem)
            n = len(toks)
            if n == 0:
                out.append((did, 0, 0, ""))
                continue
            w = min(width, n)
            arr = np.array(toks, dtype=object)
            counts = np.zeros(n - w + 1, dtype=np.int64)
            for term in qset:
                pref = np.r_[0, np.cumsum((arr == term).astype(np.int64))]
                counts += (pref[w:] - pref[:-w] > 0)
            s = int(np.argmax(counts))    # first max = earliest tie
            out.append((did, s, int(counts[s]), " ".join(toks[s:s + w])))
        return out

    # ---- wildcard / prefix retrieval -------------------------------------
    def search_prefix(self, prefix: str, k: int = 10):
        """Wildcard retrieval (`pre*`): expand the prefix against the
        term dictionary (range scan over the term-sorted shard
        directories), then score the expanded terms as an OR query with
        qtf=1 each — per-doc score = sum over matching terms of
        idf * tf_part, accumulated in sorted term order (same fp
        contract as TAAT, so a SQL twin with round-6 agrees)."""
        prefix = prefix.lower().strip()
        if not prefix:
            raise ValueError("empty prefix")
        id_parts, contrib_parts = [], []
        for term in self.reader.expand_prefix(prefix):
            ids, tfs, dls, df = self.reader.postings(term)
            m = self._keep_mask(ids)
            if m is not None:
                ids, tfs, dls = ids[m], tfs[m], dls[m]
                if not len(ids):
                    continue
            w = _idf(self.N, df)
            tf_part = (tfs * (K1 + 1)) / (tfs + K1 * (1 - B + B * dls / self.avgdl))
            id_parts.append(ids)
            contrib_parts.append(w * tf_part)
        if self.dmap is not None:
            return _accumulate_topk_dense(id_parts, contrib_parts, k, self.dmap)
        return _accumulate_topk(id_parts, contrib_parts, k)

    # ---- block-max WAND -------------------------------------------------
    def search_bmw(self, query: str, k: int = 10):
        terms = _query_weights(query, self.stem)
        cursors = []
        for term, qtf in terms:
            got = self.reader.postings_with_blocks(term)
            if got is None:
                continue
            ids, tfs, dls, (last_docs, bmax_tf, bmin_dl), df = got
            w = qtf * _idf(self.N, df)
            # per-block upper bounds from stored (last_doc, max_tf, min_dl)
            max_tf = bmax_tf.astype(np.float64)
            min_dl = bmin_dl.astype(np.float64)
            ub = w * (max_tf * (K1 + 1)) / (
                max_tf + K1 * (1 - B + B * min_dl / self.avgdl)
            )
            cursors.append(
                _TermCursor(term, w, ids, tfs, dls, None,
                            last_docs, ub, self.avgdl)
            )
        if not cursors:
            return []
        if len(cursors) == 1:
            # single-term: block bounds cannot prune (every posting's
            # score is independent of other terms), so the segment
            # machinery is pure overhead — score in one vectorized pass
            # (identical kernel and fp order as TAAT -> identical ranks)
            c = cursors[0]
            tf_part = (c.tfs * (K1 + 1)) / (
                c.tfs + K1 * (1 - B + B * c.dls / c.avgdl)
            )
            return _rank_topk(c.ids, c.w * tf_part, k)
        return _bmw_topk(cursors, k, dmap=self.dmap)


class _TermCursor:
    __slots__ = ("term", "w", "ids", "tfs", "dls", "block_starts",
                 "block_last", "block_ub", "avgdl", "pos", "max_ub")

    def __init__(self, term, w, ids, tfs, dls, block_starts, block_last,
                 block_ub, avgdl):
        self.term = term
        self.w = w
        self.ids = ids
        self.tfs = tfs
        self.dls = dls
        self.block_starts = block_starts
        self.block_last = block_last
        self.block_ub = block_ub
        self.avgdl = avgdl
        self.pos = 0
        self.max_ub = float(block_ub.max()) if len(block_ub) else 0.0

    def current(self) -> int:
        return int(self.ids[self.pos]) if self.pos < len(self.ids) else 1 << 62

    def exhausted(self) -> bool:
        return self.pos >= len(self.ids)

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target (galloping via searchsorted)."""
        if self.pos < len(self.ids) and self.ids[self.pos] < target:
            self.pos += int(
                np.searchsorted(self.ids[self.pos:], target, side="left")
            )

    def block_upper_at(self, doc: int) -> float:
        """Upper bound of the block that would contain ``doc`` (the first
        block whose last_doc >= doc). Non-mutating."""
        b = int(np.searchsorted(self.block_last, doc, side="left"))
        if b >= len(self.block_last):
            return 0.0
        return float(self.block_ub[b])

    def block_end_at(self, doc: int) -> int:
        """First docID after the block containing ``doc``. Non-mutating."""
        b = int(np.searchsorted(self.block_last, doc, side="left"))
        if b >= len(self.block_last):
            return 1 << 62
        return int(self.block_last[b]) + 1

    def score_current(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        tf_part = (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / self.avgdl))
        return self.w * tf_part


def _bmw_topk(cursors: list[_TermCursor], k: int, dmap=None):
    """Vectorized block-max top-k (the BMW idea executed segment-at-a-
    time instead of doc-at-a-time, so the hot path is numpy, not a
    Python heap loop per posting).

    The docID space is partitioned into segments at the union of all
    cursors' block boundaries (so each segment maps to at most one
    block per cursor, and per-segment upper bound = sum of the covering
    blocks' BM25 bounds). Segments are processed in DESCENDING upper-
    bound order, maintaining the running top-k threshold; the first
    segment whose bound is below the threshold ends the search (bounds
    are sorted, nothing after it can qualify). Surviving segments are
    scored exactly with the same vector kernels and sorted-term fp
    accumulation order as TAAT, so results are bit-identical to the
    TAAT/oracle path (tests/test_build_search.py::test_bmw_equals_taat).
    """
    import heapq

    cursors = sorted(cursors, key=lambda c: c.term)  # fp accumulation order
    bounds = np.unique(np.concatenate([c.block_last for c in cursors]))
    nseg = len(bounds)
    seg_ub = np.zeros(nseg, dtype=np.float64)
    for c in cursors:
        bi = np.searchsorted(c.block_last, bounds, side="left")
        valid = bi < len(c.block_last)
        seg_ub[valid] += c.block_ub[bi[valid]]
    seg_starts = np.empty(nseg, dtype=np.int64)
    seg_starts[0] = -1
    seg_starts[1:] = bounds[:-1]  # segment i covers (seg_starts[i], bounds[i]]

    # flat-bounds fast exit: when the upper bounds barely vary (uniform
    # tf/dl distributions), the threshold can never overtake them and
    # block skipping degenerates to exhaustive scoring with overhead —
    # score everything in one TAAT-identical dense pass instead
    if dmap is not None and nseg > 512:
        top_ub = float(seg_ub.max())
        med_ub = float(np.partition(seg_ub, nseg // 2)[nseg // 2])
        if med_ub >= 0.5 * top_ub:
            id_parts = [c.ids for c in cursors]
            contrib_parts = []
            for c in cursors:
                tf_part = (c.tfs * (K1 + 1)) / (
                    c.tfs + K1 * (1 - B + B * c.dls / c.avgdl)
                )
                contrib_parts.append(c.w * tf_part)
            return _accumulate_topk_dense(id_parts, contrib_parts, k, dmap)

    # per-cursor posting ranges of every segment, one searchsorted pass
    cur_lo = [np.searchsorted(c.ids, seg_starts, side="right") for c in cursors]
    cur_hi = [np.searchsorted(c.ids, bounds, side="right") for c in cursors]

    heap: list[tuple[float, int]] = []  # (score, -doc_id), min-heap of k best
    threshold = -math.inf
    order = np.argsort(-seg_ub, kind="stable")
    CHUNK = 128  # segments scored together: amortizes numpy call overhead
    BULK_AFTER = 4  # chunks before giving up on skipping (see below)
    pos = 0
    n_chunks = 0
    while pos < nseg:
        chunk = order[pos:pos + CHUNK]
        pos += CHUNK
        n_chunks += 1
        if len(heap) == k:
            if seg_ub[chunk[0]] < threshold:
                break  # descending bounds: nothing later can qualify
            if n_chunks > BULK_AFTER:
                # the threshold hasn't caught up with the bounds after
                # several chunks — this query's blocks are unprunable
                # (uniform bounds), so chunked processing is pure
                # overhead. Finish in ONE vectorized pass over every
                # remaining above-threshold segment: identical scoring,
                # TAAT-like cost.
                rest = order[pos - CHUNK:]
                chunk = rest[seg_ub[rest] >= threshold]
                pos = nseg
            else:
                chunk = chunk[seg_ub[chunk] >= threshold]
            if len(chunk) == 0:
                continue
        id_parts, contrib_parts = [], []
        for ci, c in enumerate(cursors):
            los, his = cur_lo[ci][chunk], cur_hi[ci][chunk]
            sel = los < his
            if not sel.any():
                continue
            lens = his[sel] - los[sel]
            # vectorized multi-range arange (no per-segment Python)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            take = (np.arange(int(lens.sum()), dtype=np.int64)
                    - np.repeat(starts, lens) + np.repeat(los[sel], lens))
            tfs = c.tfs[take]
            dls = c.dls[take]
            tf_part = (tfs * (K1 + 1)) / (
                tfs + K1 * (1 - B + B * dls / c.avgdl)
            )
            id_parts.append(c.ids[take])
            contrib_parts.append(c.w * tf_part)
        if not id_parts:
            continue
        if dmap is not None and sum(len(p) for p in id_parts) > 65536:
            # large chunk (the bulk finish, typically): dense scatter-add
            # instead of unique+searchsorted over the posting union —
            # same adds in the same sorted-term order, same sums
            acc_d = np.zeros(dmap.N, dtype=np.float64)
            for ids, contrib in zip(id_parts, contrib_parts):
                acc_d[dmap.dense(ids)] += contrib
            if len(heap) == k:
                cand_d = np.flatnonzero(acc_d >= max(threshold, 1e-300))
            else:
                cand_d = np.flatnonzero(acc_d > 0)
            uniq = dmap.docids(cand_d)
            acc = acc_d[cand_d]
        else:
            uniq = np.unique(np.concatenate(id_parts))
            acc = np.zeros(len(uniq), dtype=np.float64)
            for ids, contrib in zip(id_parts, contrib_parts):
                acc[np.searchsorted(uniq, ids)] += contrib
        if len(heap) == k:
            cand = np.flatnonzero(acc >= threshold)
        else:
            cand = np.arange(len(acc))
        if len(cand) > 4 * max(k, 16):
            # keep only the k best (plus kth-score ties) before the
            # Python heap loop — exact, since anything below the kth
            # score in this chunk can never enter the final top-k
            sc = acc[cand]
            if len(cand) > k:
                kth = np.partition(sc, len(sc) - k)[len(sc) - k]
                cand = cand[sc >= kth]
        for i in cand:
            item = (float(acc[i]), -int(uniq[i]))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
        if len(heap) == k:
            threshold = heap[0][0]

    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return [(-nd, s) for s, nd in out]


# --------------------------------------------------------------------------
# actor-hosted shards (scatter-gather)
# --------------------------------------------------------------------------

def make_shard_searcher_actor():
    """Defined lazily so importing this module never touches Ray."""
    import ray

    @ray.remote(max_restarts=-1, max_task_retries=-1)
    class ShardSearcherActor:
        """Owns a slice of shard files; resolves terms to (ids, contribs)
        partials. State (decoded file indexes) loads once per actor —
        the ST5 'open once, serve many queries' pattern. Read-only and
        rebuilt from the on-disk index on restart, so infinite
        restarts + task retries make shard resolution crash-proof."""

        CACHE_POSTINGS_BUDGET = 32_000_000  # same rationale as IndexReader

        def __init__(self, index_dir: str, file_paths: list[str],
                     N: int, avgdl: float, deleted=None):
            from collections import OrderedDict

            self.indexes = [_FileTermIndex(p) for p in file_paths]
            self.N = N
            self.avgdl = avgdl
            # tombstones (search.delete_urls): masked at decode so every
            # downstream path (driver merge, accumulators) is clean —
            # rank/score-identical to the driver Searcher's masking
            self.deleted = (np.sort(np.asarray(deleted, dtype=np.int64))
                            if deleted is not None and len(deleted)
                            else None)
            self._cache: OrderedDict[str, tuple] = OrderedDict()
            self._cache_postings = 0

        def _decode(self, term: str):
            # per-actor decoded-postings LRU: head (Zipf) terms recur
            # across queries; without it every query re-pays a multi-MB
            # varint decode per head term
            got = self._cache.get(term)
            if got is not None:
                self._cache.move_to_end(term)
                return got
            runs = []
            for fi in self.indexes:
                runs.extend(fi.runs(term))
            if not runs:
                return None
            runs.sort(key=lambda r: r[0])
            from rse_ray.functions.codec import decode_runs_joint

            ids, tfs, dls = decode_runs_joint([r[1] for r in runs])
            df = int(sum(r[3] for r in runs))  # stale across deletes,
            # like the driver Searcher (Lucene semantics)
            if self.deleted is not None:
                keep = ~np.isin(ids, self.deleted, assume_unique=True)
                ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            tf_part = (tfs * (K1 + 1)) / (
                tfs + K1 * (1 - B + B * dls / self.avgdl)
            )
            got = (ids, tf_part, df)
            self._cache[term] = got
            self._cache_postings += len(ids)
            while (self._cache_postings > self.CACHE_POSTINGS_BUDGET
                   and len(self._cache) > 1):
                _, old = self._cache.popitem(last=False)
                self._cache_postings -= len(old[0])
            return got

        def term_partial(self, term: str):
            """-> (ids, tf_part, df_partial) or None. The idf weight is
            applied by the DRIVER with the global df (a term at a file
            boundary can span two actors, so local df is partial)."""
            return self._decode(term)

        def term_partial_split(self, term: str, bound_docs):
            """Range-sharded form: -> (df, part_0, ..., part_{R-1})
            where part_j = (ids, tf_part) restricted to doc-range j
            (bound_docs = R-1 ascending split docIDs) or None. Called
            with num_returns=R+1, so each accumulator actor receives
            ONLY its slice through the object store — the driver sees
            refs + dfs, never postings."""
            got = self._decode(term)
            R = len(bound_docs) + 1
            if got is None:
                return (None,) + (None,) * R
            ids, tf_part, df = got
            cuts = np.searchsorted(ids, bound_docs)
            parts = []
            prev = 0
            for c in list(cuts) + [len(ids)]:
                c = int(c)
                parts.append((ids[prev:c], tf_part[prev:c])
                             if c > prev else None)
                prev = c
            return (df, *parts)

        def term_directory(self, min_df: int = 1,
                           top_n: int | None = None):
            """-> [(term, df_partial)] over this actor's files: the
            vocabulary with PARTIAL document frequencies (summed over a
            term's salt-chunk rows within and across this actor's
            files). Cheap — the (term, df) directory is already
            actor-resident from _FileTermIndex.__init__; no payload
            bytes are touched. ``top_n`` truncates to the actor's
            highest-df terms: shard actors own disjoint TERM RANGES
            (a term spans two actors only at a file boundary), so
            per-actor partial dfs ≈ global dfs and the union of
            per-actor top-N supersets the global top-N — the driver
            never receives the multi-million-term full vocabulary.
            DistributedSearcher.warmup sums these across actors into
            global dfs and prefetches the head."""
            agg: dict[str, int] = {}
            for fi in self.indexes:
                for term, rows in fi.by_term.items():
                    agg[term] = agg.get(term, 0) + int(
                        sum(fi.df[i] for i in rows)
                    )
            out = [(t, d) for t, d in agg.items() if d >= min_df]
            if top_n is not None and len(out) > top_n:
                out.sort(key=lambda td: (-td[1], td[0]))
                out = out[:top_n]
            return out

    return ShardSearcherActor


ACC_POSTINGS_BUDGET_DEFAULT = 16_000_000  # per range-accumulator actor


def make_accumulator_actor():
    """Per-doc-range dense accumulator (defined lazily: no Ray at
    import). Each actor owns a contiguous dense slice [lo, hi) of the
    corpus docID space, so the O(N) scatter-add array is sharded R ways
    — no process ever allocates corpus-sized memory, and only k rows
    per actor return to the driver.

    Scoring is BLOCK-MAX PRUNED (round-2 VERDICT item 1): the dense
    slice is cut into fixed 2^DENSE_BLOCK_BITS-cell blocks; every term
    slice carries per-block max tf_part (computed once at store time).
    A query processes blocks in descending sum-of-upper-bounds order,
    maintaining its local top-k threshold, and stops at the first block
    whose bound cannot reach it — a head-term query touches only the
    blocks that can still qualify instead of O(postings) work. Local
    top-k is EXACT (a skipped doc's score <= its block bound < the kth
    local score), and surviving docs are scored with the identical
    scatter-add kernel and sorted-term fp order as the exhaustive path,
    so the global merge stays rank- and score-identical to TAAT."""
    import ray

    @ray.remote(max_restarts=-1, max_task_retries=-1)
    class AccumulatorActor:
        CACHE_POSTINGS_BUDGET = ACC_POSTINGS_BUDGET_DEFAULT
        DENSE_BLOCK_BITS = 10               # 1024 dense docs per block
        CHUNK = 32                          # blocks scored per round
        BULK_AFTER = 4                      # rounds before bulk finish

        def __init__(self, offsets, bits: int, bucket_lo: int,
                     bucket_hi: int, budget: int | None = None):
            from collections import OrderedDict

            if budget is not None:
                self.CACHE_POSTINGS_BUDGET = budget
            self.offsets = np.asarray(offsets, dtype=np.int64)
            self.bits = bits
            self.mask = (1 << bits) - 1
            self.lo = int(self.offsets[bucket_lo])
            self.hi = int(self.offsets[bucket_hi])
            self.acc = np.zeros(self.hi - self.lo, dtype=np.float64)
            # term -> [part]: a term's slice ships ONCE from the shard
            # actors; warm queries send only (term, w). part =
            # (dense, tf_part, blk_ids, blk_starts, blk_ends, blk_max)
            self._terms: OrderedDict[str, list] = OrderedDict()
            self._cached_postings = 0
            # instrumentation: postings actually scored vs. candidate
            # postings across all queries (pruning evidence)
            self.scored_postings = 0
            self.candidate_postings = 0

        def _part_meta(self, ids, tf_part):
            """Densify a shipped (ids, tf_part) slice and attach block
            metadata: for each dense block present, the [start, end)
            posting range and the max tf_part. dense is strictly
            increasing (docid order == dense order), so blocks are
            found with one diff pass and maxes with one reduceat."""
            dense = (self.offsets[ids >> self.bits]
                     + (ids & self.mask) - self.lo)
            blocks = dense >> self.DENSE_BLOCK_BITS
            starts = np.flatnonzero(np.diff(blocks)) + 1
            starts = np.concatenate(([0], starts))
            ends = np.concatenate((starts[1:], [len(dense)]))
            return (dense, tf_part, blocks[starts],
                    starts, ends, np.maximum.reduceat(tf_part, starts))

        def _ingest(self, term, parts, stored):
            """Densify a freshly shipped slice and keep it if the
            postings budget allows (NO eviction — a stored term stays
            valid for the driver forever). Appends to ``stored`` when
            the term ends up resident; returns the densified slice
            list for immediate scoring. The single ingest path for
            both query-time cold ops and warmup store_terms, so the
            residency/budget protocol cannot diverge between them."""
            got = []
            added = 0
            for part in parts:
                if part is None:
                    continue
                ids, tf_part = part
                got.append(self._part_meta(ids, tf_part))
                added += len(ids)
            if (self._cached_postings + added
                    <= self.CACHE_POSTINGS_BUDGET):
                self._terms[term] = got
                self._cached_postings += added
                stored.append(term)
            return got

        def accumulate_and_topk(self, k: int, *ops):
            """``ops`` is a flat [term, w, n, part_1..part_n, term, w,
            n, ...] stream in sorted-term order (the per-doc fp
            accumulation order must match the TAAT oracle). n=0 means
            "use your cached slice" (warm fast path: no posting bytes
            move). Freshly shipped slices are densified once and kept
            if the postings budget allows — there is NO eviction, so a
            stored term stays valid for the driver forever; the return
            carries which terms were stored so the driver only marks
            those as shipped. Returns (topk, stored_terms)."""
            stored: list[str] = []
            entries: list[tuple[float, list]] = []  # sorted-term order
            i = 0
            while i < len(ops):
                term, w, n = ops[i], ops[i + 1], int(ops[i + 2])
                parts = ops[i + 3 : i + 3 + n]
                i += 3 + n
                got = self._terms.get(term)
                if got is not None:
                    # already resident here; reporting it keeps the
                    # driver's residency view converging even when the
                    # first store only landed on some accumulators
                    stored.append(term)
                else:
                    if n == 0:
                        # defensive: a warm op for a term we never
                        # stored must not fabricate (and cache) an
                        # empty slice — contribute nothing
                        continue
                    got = self._ingest(term, parts, stored)
                if got:
                    entries.append((w, got))
            return self._topk_pruned(k, entries), stored

        def store_terms(self, *ops):
            """Residency-only ingest for warmup: ``ops`` is a flat
            [term, n, part_1..part_n, ...] stream. Same densify +
            budget logic as accumulate_and_topk's cold branch, no
            scoring. Returns the terms resident here afterwards
            (including ones that already were), so the driver's
            residency view converges under the same protocol."""
            stored: list[str] = []
            i = 0
            while i < len(ops):
                term, n = ops[i], int(ops[i + 1])
                parts = ops[i + 2 : i + 2 + n]
                i += 2 + n
                if term in self._terms:
                    stored.append(term)
                    continue
                self._ingest(term, parts, stored)
            return stored

        def _gather_chunk(self, entries, chunk):
            """Scatter-add every posting that falls in ``chunk``'s
            blocks (chunk ascending-sorted block ids), in entries
            (sorted-term) order — each cell lives in exactly one block,
            so its fp add order equals the exhaustive path's. Returns
            the touched dense cells (unique) and their scores, and
            resets those cells."""
            touched = []
            for w, parts in entries:
                for dense, tf_part, blk_ids, bstarts, bends, _ in parts:
                    pos = np.searchsorted(blk_ids, chunk)
                    valid = pos < len(blk_ids)
                    pc = pos[valid]
                    hit = pc[blk_ids[pc] == chunk[valid]]
                    if len(hit) == 0:
                        continue
                    los, his = bstarts[hit], bends[hit]
                    lens = his - los
                    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    take = (np.arange(int(lens.sum()), dtype=np.int64)
                            - np.repeat(starts, lens)
                            + np.repeat(los, lens))
                    d = dense[take]
                    self.acc[d] += w * tf_part[take]
                    touched.append(d)
                    self.scored_postings += len(d)
            if not touched:
                return None, None
            t = np.unique(np.concatenate(touched))
            scores = self.acc[t].copy()
            self.acc[t] = 0.0  # reset touched cells only: O(matched)
            return t, scores

        def _topk_pruned(self, k: int, entries):
            if not entries:
                return []
            self.candidate_postings += sum(
                len(p[0]) for _, parts in entries for p in parts
            )
            nblocks = ((self.hi - self.lo) >> self.DENSE_BLOCK_BITS) + 1
            ub = np.zeros(nblocks, dtype=np.float64)
            for w, parts in entries:
                for _, _, blk_ids, _, _, blk_max in parts:
                    # blk_ids unique per part -> fancy += is safe; for a
                    # multi-part term the sum of part maxes is a valid
                    # (looser) bound, and multi-part terms are the rare
                    # file-boundary case
                    ub[blk_ids] += w * blk_max
            present = np.flatnonzero(ub)
            if len(present) == 0:
                return []
            pub = ub[present]
            if len(present) > 256:
                # flat-bounds fast exit (same rationale as the driver
                # BMW): when bounds barely vary, the threshold can never
                # overtake them and chunking is pure overhead — score
                # everything in one pass
                top_ub = float(pub.max())
                if float(np.median(pub)) >= 0.5 * top_ub:
                    t, scores = self._gather_chunk(entries, present)
                    return self._finish(k, t, scores)
            order = present[np.argsort(-pub, kind="stable")]
            cand_d = np.empty(0, dtype=np.int64)
            cand_s = np.empty(0, dtype=np.float64)
            threshold = -math.inf
            pos = 0
            n_chunks = 0
            while pos < len(order):
                chunk = order[pos:pos + self.CHUNK]
                pos += self.CHUNK
                n_chunks += 1
                if len(cand_d) >= k:
                    if ub[chunk[0]] < threshold:
                        break  # descending bounds: nothing later qualifies
                    if n_chunks > self.BULK_AFTER:
                        # threshold hasn't caught the bounds: unprunable
                        # query — finish every remaining above-threshold
                        # block in ONE vectorized pass
                        rest = order[pos - self.CHUNK:]
                        chunk = rest[ub[rest] >= threshold]
                        pos = len(order)
                    else:
                        chunk = chunk[ub[chunk] >= threshold]
                    if len(chunk) == 0:
                        continue
                t, scores = self._gather_chunk(entries, np.sort(chunk))
                if t is None:
                    continue
                cand_d = np.concatenate([cand_d, t])
                cand_s = np.concatenate([cand_s, scores])
                if len(cand_d) > k:
                    keep = np.lexsort((cand_d, -cand_s))[:k]
                    cand_d, cand_s = cand_d[keep], cand_s[keep]
                if len(cand_d) >= k:
                    # kth-best local score; dropped ties lose on docid
                    # to a kept equal-score doc, and a skipped block's
                    # docs score strictly below this — exactness holds
                    threshold = float(cand_s.min())
            return self._finish(k, cand_d, cand_s)

        def _finish(self, k: int, t, scores):
            if t is None or len(t) == 0:
                return []
            g = t + self.lo
            b = np.searchsorted(self.offsets, g, side="right") - 1
            docids = (b.astype(np.int64) << self.bits) | (g - self.offsets[b])
            order = np.lexsort((docids, -scores))[:k]
            return [(int(docids[i]), float(scores[i])) for i in order]

        def pruning_stats(self):
            return {"scored_postings": self.scored_postings,
                    "candidate_postings": self.candidate_postings}

    return AccumulatorActor


class DistributedSearcher:
    """Scatter-gather BM25: terms are routed to the actors owning their
    term range.

    Two merge paths:
      * driver merge (``accumulator_actors=0``): per-term partials ship
        to the driver, which accumulates with the same sorted-term
        order as the local TAAT path. Fine for small indexes.
      * sharded accumulators (``accumulator_actors=R > 0``): shard
        actors SPLIT each term's partial at R-1 docID boundaries
        (``num_returns`` — each slice is its own object), accumulator
        actor j scatter-adds slice j into its own dense range array
        (size ~N/R) and returns its local top-k; the driver touches
        only object refs, dfs, and k*R result rows. No corpus-sized
        array on any single process, no posting bytes through the
        driver — the fleet-scale query path (VERDICT round 1 item 9).

    THREAD-SAFE for concurrent ``search()`` calls (round-4 VERDICT
    item 4): the only driver-side mutable state is the residency
    bookkeeping (``_resident`` / ``_term_df``), read as a snapshot
    and written back under ``_lock``; the expensive scatter-gather
    (``ray.get`` on shard decodes and accumulator ops) runs outside
    the lock, so concurrent queries genuinely overlap. The actors
    themselves serialize per-call (Ray actors are single-threaded)
    and every ``accumulate_and_topk`` op stream is self-contained,
    so interleaving is safe. Two threads cold-shipping the same term
    concurrently is benign: the accumulator keeps the first slice
    and discards the duplicate (``_terms`` hit in ``_ingest``),
    costing one redundant decode, never a wrong score. A stale
    residency snapshot is likewise safe — the per-query failover
    loop re-ships any term an accumulator no longer (or never)
    holds.
    """

    def __init__(self, index_dir: str, num_actors: int = 4,
                 accumulator_actors: int = 0,
                 acc_budget: int | None = None) -> None:
        import ray

        self.stats = read_json(os.path.join(index_dir, "stats.json"))
        self.N = int(self.stats["num_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.stem = bool(self.stats.get("stem", True))
        shards = ShardFiles(index_dir)
        files = shards.files
        num_actors = max(1, min(num_actors, len(files)))
        ts_path = os.path.join(index_dir, "tombstones.parquet")
        deleted = None
        if os.path.exists(ts_path):
            d = pq.read_table(ts_path, columns=["doc_id"]) \
                .column("doc_id").to_numpy()
            deleted = np.sort(d.astype(np.int64)) if len(d) else None
        Actor = make_shard_searcher_actor()
        self.actor_ranges = []  # (term_min, term_max, actor)
        per = (len(files) + num_actors - 1) // num_actors
        for a in range(num_actors):
            chunk = files[a * per : (a + 1) * per]
            if not chunk:
                continue
            lo = shards.term_min[a * per]
            hi = shards.term_max[min(len(files), (a + 1) * per) - 1]
            actor = Actor.remote(index_dir, chunk, self.N, self.avgdl,
                                 deleted)
            self.actor_ranges.append((lo, hi, actor))

        self.accs = []
        self.bound_docs = None
        self._acc_budget = (acc_budget if acc_budget is not None
                            else ACC_POSTINGS_BUDGET_DEFAULT)
        import threading

        self._term_df: dict[str, int] = {}   # global df per seen term
        self._resident: set[str] = set()     # slices on EVERY accumulator
        self._lock = threading.Lock()        # guards the two dicts above
        if accumulator_actors > 0:
            from rse_ray.functions.ids import DOC_BUCKET_BITS

            dmap = _DenseDocMap(index_dir)
            R = max(1, min(accumulator_actors, len(dmap.offsets) - 1))
            # bucket boundaries at ~equal dense-doc counts
            targets = (np.arange(1, R) * dmap.N) // R
            cut_buckets = np.unique(
                np.searchsorted(dmap.offsets, targets, side="left")
            )
            cut_buckets = cut_buckets[(cut_buckets > 0)
                                      & (cut_buckets < len(dmap.offsets) - 1)]
            edges = [0, *cut_buckets.tolist(), len(dmap.offsets) - 1]
            Acc = make_accumulator_actor()
            for lo_b, hi_b in zip(edges[:-1], edges[1:]):
                self.accs.append(
                    Acc.remote(dmap.offsets, DOC_BUCKET_BITS, lo_b, hi_b,
                               acc_budget)
                )
            # split docIDs: first docID of each boundary bucket
            self.bound_docs = np.asarray(
                [b << DOC_BUCKET_BITS for b in edges[1:-1]], dtype=np.int64
            )

    def _actors_for(self, term: str):
        return [a for lo, hi, a in self.actor_ranges if lo <= term <= hi] or [
            a for _, _, a in self.actor_ranges
        ]

    def warmup(self, top_n: int = 512, min_df: int = 2,
               batch_terms: int = 64):
        """Prefetch the head of the vocabulary into the accumulators so
        first-touch queries skip the cold slice-shipping path (~2 s per
        query on a 3.2M-doc index when each query ships its own
        multi-MB head-term slices serially). Global dfs come from the
        shard actors' term directories (already actor-resident, no
        payload read); the ``top_n`` highest-df non-resident terms ship
        through the same term_partial_split -> store path a cold query
        uses, ALL shard actors decoding concurrently instead of
        query-by-query. A budget-full accumulator simply doesn't store
        and those terms stay non-resident, so correctness is unchanged
        (the residency protocol below re-ships them per query).
        Shipping stops once the accumulators' aggregate postings
        capacity (R x per-actor budget, estimated by cumulative df —
        a term's slices total exactly df postings) is reached: without
        the cap, head terms past capacity are decoded and shipped only
        to be rejected (measured: 2,000 shipped / 60 stored on the
        3.17M index). Batched so at most ``batch_terms`` decoded
        slices are in flight. Returns {considered, resident} counts;
        no-op without accumulator actors."""
        import ray

        if not self.accs:
            return {"considered": 0, "resident": 0}
        dirs = ray.get([a.term_directory.remote(min_df, top_n)
                        for _, _, a in self.actor_ranges])
        df: dict[str, int] = {}
        for d in dirs:
            for term, pdf in d:
                df[term] = df.get(term, 0) + int(pdf)
        # NOTE these sums are only approximate under the top_n
        # truncation (a file-boundary term can lose one actor's
        # partial) — good enough to RANK the head, but not to score
        # with: every shipped term's _term_df entry is overwritten
        # below with the authoritative df from term_partial_split,
        # and non-resident terms always re-resolve df at query time
        with self._lock:
            resident0 = set(self._resident)
        head = sorted((t for t in df if t not in resident0),
                      key=lambda t: (-df[t], t))[:top_n]
        capacity = len(self.accs) * self._acc_budget
        todo = []
        cum = 0
        for t in head:
            if cum + df[t] > capacity:
                continue  # full slices would be rejected; smaller may fit
            todo.append(t)
            cum += df[t]
        R = len(self.accs)
        for at in range(0, len(todo), batch_terms):
            batch = todo[at:at + batch_terms]
            per_term_refs = []
            for term in batch:
                refs_list = [
                    actor.term_partial_split.options(
                        num_returns=R + 1
                    ).remote(term, self.bound_docs)
                    for actor in self._actors_for(term)
                ]
                per_term_refs.append((term, refs_list))
            acc_ops: list[list] = [[] for _ in range(R)]
            for term, refs_list in per_term_refs:
                for j in range(R):
                    parts = [refs[1 + j] for refs in refs_list]
                    acc_ops[j].extend((term, len(parts), *parts))
            results = ray.get([
                acc.store_terms.remote(*acc_ops[j])
                for j, acc in enumerate(self.accs)
            ])
            # authoritative global dfs for the shipped terms (the
            # directory ranking above may be partial for terms spanning
            # a shard-actor file boundary; a resident term's weight
            # comes from _term_df, so it must be exact)
            true_dfs = {}
            for term, refs_list in per_term_refs:
                true_dfs[term] = sum(
                    int(v) for v in ray.get([r[0] for r in refs_list])
                    if v is not None
                )
            everywhere = set(results[0])
            for stored in results[1:]:
                everywhere &= set(stored)
            with self._lock:
                self._term_df.update(true_dfs)
                self._resident |= everywhere
        with self._lock:
            n_res = len(self._resident)
        return {"considered": len(todo), "resident": n_res}

    def search(self, query: str, k: int = 10):
        import ray

        if self.accs:
            return self._search_sharded(query, k)
        terms = _query_weights(query, self.stem)
        futures = []  # (term_index, future)
        for ti, (term, _) in enumerate(terms):
            for actor in self._actors_for(term):
                futures.append((ti, actor.term_partial.remote(term)))
        results = ray.get([f for _, f in futures])
        # regroup per term: sum partial dfs, then weight each partial
        per_term: dict[int, list] = {}
        for (ti, _), got in zip(futures, results):
            if got is not None:
                per_term.setdefault(ti, []).append(got)
        id_parts, contrib_parts = [], []
        for ti in sorted(per_term):   # sorted-term accumulation order
            parts = per_term[ti]
            df = sum(p[2] for p in parts)
            w = terms[ti][1] * _idf(self.N, df)
            for ids, tf_part, _ in parts:
                id_parts.append(ids)
                contrib_parts.append(w * tf_part)
        return _accumulate_topk(id_parts, contrib_parts, k)

    def _search_sharded(self, query: str, k: int,
                        max_attempts: int = 3):
        import ray

        terms = _query_weights(query, self.stem)
        R = len(self.accs)
        bounds = self.bound_docs
        for _attempt in range(max_attempts):
            # SNAPSHOT the residency view under the lock (concurrent
            # queries mutate it); everything expensive below runs on
            # the snapshot, outside the lock. Staleness is safe: a
            # term that went resident after the snapshot just ships
            # a duplicate slice the accumulator discards; a term that
            # got dropped is caught by the failover loop.
            with self._lock:
                resident = set(self._resident)
                tdf = {t: self._term_df.get(t) for t, _ in terms}
            # resolve postings only for terms not yet resident on the
            # accumulators: a term's slices ship ONCE; warm queries
            # move no posting bytes at all (only (term, weight) pairs
            # + top-k). re-ship until RESIDENT (stored on every
            # accumulator): keying on the df cache alone would send a
            # warm n=0 op for a term a budget-full accumulator never
            # stored, silently dropping its contribution for that
            # doc range
            calls: list[tuple[int, tuple]] = []
            for ti, (term, _) in enumerate(terms):
                if term in resident or tdf.get(term) == 0:
                    continue  # resident, or known-absent
                for actor in self._actors_for(term):
                    refs = actor.term_partial_split.options(
                        num_returns=R + 1
                    ).remote(term, bounds)
                    calls.append((ti, refs))
            if calls:
                dfs = ray.get([refs[0] for _, refs in calls])
                fresh: dict[int, int] = {}
                called = {ti for ti, _ in calls}
                for (ti, _), df in zip(calls, dfs):
                    if df is not None:
                        fresh[ti] = fresh.get(ti, 0) + int(df)
                with self._lock:
                    for ti, (term, _) in enumerate(terms):
                        if ti in called:
                            tdf[term] = fresh.get(ti, 0)
                            self._term_df[term] = tdf[term]
            per_ti_refs: dict[int, list] = {}
            for ti, refs in calls:
                per_ti_refs.setdefault(ti, []).append(refs)

            warm_sent: set[str] = set()
            acc_ops: list[list] = [[] for _ in range(R)]
            for ti, (term, qtf) in enumerate(terms):  # sorted order
                df = tdf.get(term) or 0
                if df <= 0:
                    continue
                w = qtf * _idf(self.N, df)
                if term in resident:
                    warm_sent.add(term)
                    for j in range(R):
                        acc_ops[j].extend((term, w, 0))
                else:
                    refs_list = per_ti_refs.get(ti, [])
                    for j in range(R):
                        parts = [refs[1 + j] for refs in refs_list]
                        acc_ops[j].extend((term, w, len(parts),
                                           *parts))
            results = ray.get([
                acc.accumulate_and_topk.remote(k, *acc_ops[j])
                for j, acc in enumerate(self.accs)
            ])
            # FAILOVER: an accumulator that restarted (actor crash)
            # comes back with an empty slice cache; a warm (n=0) op
            # for a term it no longer holds contributes NOTHING and
            # the term is absent from its stored list. Detect exactly
            # that — a warm-sent term missing from ANY accumulator's
            # stored set — drop it from the residency view and rerun
            # the query, which re-resolves and re-ships the slices.
            stored_sets = [set(stored) for _, stored in results]
            lost = {t for t in warm_sent
                    if any(t not in s for s in stored_sets)}
            if lost and _attempt < max_attempts - 1:
                with self._lock:
                    self._resident -= lost
                continue
            stored_everywhere = None
            for s in stored_sets:
                stored_everywhere = (s if stored_everywhere is None
                                     else stored_everywhere & s)
            if stored_everywhere:
                with self._lock:
                    self._resident |= stored_everywhere
            # ranges are disjoint: global top-k = best k of the union
            merged = [t for part, _ in results for t in part]
            merged.sort(key=lambda t: (-t[1], t[0]))
            return merged[:k]


# --------------------------------------------------------------------------
# result hydration (doc_id -> url), J2-free by design (SURVEY §2.4)
# --------------------------------------------------------------------------

class UrlHydrator:
    """Warm doc_id -> url hydration for the SERVING face: bucket
    docmap columns LRU-cache in-process as (sorted ids ndarray, url
    list) pairs, so repeated queries stop paying a parquet read per
    request — `hydrate_urls` below re-reads its bucket file every
    call, which is right for batch pipelines (each runs once) and
    wrong for a warm server (measured: hydration was ~half of the
    16 ms p50 at 1 client). Thread-safe: the serve face handles
    requests on threads. Capacity is in BUCKETS (LRU) — at the
    playbook's 10^6 docs/bucket one cached bucket is ~an int64 array
    + url list, so the default 64 bounds the cache to a few GB worst
    case and far less on fixture indexes."""

    def __init__(self, index_dir: str, max_buckets: int = 64) -> None:
        import threading
        from collections import OrderedDict

        self.docs_dir = os.path.join(index_dir, "docs")
        self.max_buckets = max_buckets
        self._cache: OrderedDict[int, tuple] = OrderedDict()
        self._lock = threading.Lock()

    def _bucket(self, bucket: int):
        with self._lock:
            got = self._cache.get(bucket)
            if got is not None:
                self._cache.move_to_end(bucket)
                return got
        path = os.path.join(self.docs_dir,
                            f"bucket_{bucket:06d}.parquet")
        t = pq.read_table(path, columns=["doc_id", "url"])
        ids = t.column("doc_id").to_numpy()
        order = np.argsort(ids)
        urls = t.column("url").to_pylist()
        entry = (ids[order], [urls[i] for i in order])
        with self._lock:
            self._cache[bucket] = entry
            self._cache.move_to_end(bucket)
            while len(self._cache) > self.max_buckets:
                self._cache.popitem(last=False)
        return entry

    def __call__(self, hits: list[tuple[int, float]]):
        """Same contract as hydrate_urls: [(doc_id, score, url)]."""
        from rse_ray.functions.ids import DOC_BUCKET_BITS

        out = []
        for did, score in hits:
            ids, urls = self._bucket(did >> DOC_BUCKET_BITS)
            pos = int(np.searchsorted(ids, did))
            out.append((did, score, urls[pos]))
        return out


def hydrate_urls(index_dir: str, hits: list[tuple[int, float]]):
    """Join top-k doc_ids back to urls via the bucket-routed docmap:
    doc_id >> 40 names the one docs file to read (point lookup, no scan
    of the full docmap even at 10^12 docs)."""
    from rse_ray.functions.ids import DOC_BUCKET_BITS

    by_bucket: dict[int, list[int]] = {}
    for did, _ in hits:
        by_bucket.setdefault(did >> DOC_BUCKET_BITS, []).append(did)
    urls: dict[int, str] = {}
    docs_dir = os.path.join(index_dir, "docs")
    for bucket, dids in by_bucket.items():
        path = os.path.join(docs_dir, f"bucket_{bucket:06d}.parquet")
        t = pq.read_table(path, columns=["doc_id", "url"])
        ids = t.column("doc_id").to_numpy()
        us = t.column("url").to_pylist()
        pos = {int(d): u for d, u in zip(ids, us)}
        for d in dids:
            urls[d] = pos[d]
    return [(did, score, urls[did]) for did, score in hits]
