"""Link-graph capability: extraction, backlink counts, and the
reference's own relevance + rank formulas.

Re-expresses the reference's link pipeline (SURVEY §2.2 M5, §2.4 J3,
§2.5 A2-A4):

  * link extraction — crawler-side `extractLinks` + resolve + validate
    (crawler/src/crawler/crawler/crawler.go:294-349): each <a>'s FIRST
    href, RFC 3986-resolved against the page url, kept only for
    http(s) schemes with empty fragment and non-empty host. In the
    reference the links feed the Redis frontier (crawler.go:207-213);
    here they land in a (src_url, dst_url) table.
  * backlink counts — `backlinks[src]++` over pages
    (api/main.go:74-83) as a pre-aggregated groupby (A2).
  * relevance — `score = Σ_term queryFreq(t) × pageFreq(t)`
    (api/main.go:86-95): integer dot product of query tf and page tf
    over the matched pages (J1 semi-join keeps pages with ≥1 query
    term). This is the reference's scoring function, kept alongside
    BM25 (which supersedes it for the north-star rank contract).
  * rank — the degenerate single-iteration PageRank
    (api/main.go:97-111): `rank(p) = (1.0 + Σ_{b≠p}
    relevance[b]/backlinkCount[b]) × 0.85` where the sum runs over ALL
    backlink-source ids seen across the hit set except p itself (the
    reference's exact — buggy-looking but normative — loop shape), and
    relevance[b] is 0 for ids outside the hit set (Go map default).

Scale notes: link extraction is a stateless flat-map (rows out ≫ rows
in); backlink counting pre-reduces per batch and shuffles only
(dst_url, partial) rows; the rank stage broadcasts the hit set (query
results are small by construction — they fit the driver in the
reference too) and never moves the full link table to the driver.
"""

from __future__ import annotations

import math

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

RANKER_CONSTANT = 0.85   # api/main.go:99
RATING_FACTOR = 1.0      # api/main.go:98


# --------------------------------------------------------------------------
# M5: link extraction (pages -> links table)
# --------------------------------------------------------------------------

def extract_links(pages_ds):
    """(url, html) -> (src_url, dst_url), one row per kept link.
    Flat-map: a batch of pages yields a batch of links (possibly more
    rows than pages, possibly zero)."""
    from rse_ray.functions.extract import extract, resolve_links

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src, dst = [], []
        for u, h in zip(urls, htmls):
            for link in resolve_links(u, extract(h)["hrefs"]):
                src.append(u)
                dst.append(link)
        return pa.table(
            {"src_url": pa.array(src, type=pa.string()),
             "dst_url": pa.array(dst, type=pa.string())}
        )

    return pages_ds.select_columns(["url", "html"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def anchor_terms(pages_ds):
    """Anchor-text index -> (dst_url, term, n_mentions): the classic
    ranking signal the reference's extractor almost exposes (it walks
    every <a> for hrefs, crawler.go:294-324, and throws the text
    away) — text ABOUT a page, written by the pages that link to it
    (Brin & Page 1998). For each KEPT link (same resolve + validate
    contract as extract_links / resolve_one), the anchor's text
    content (depth-first concat under the <a>, getTextContent shape)
    tokenizes with the query tokenizer (stem=False) and counts per
    (dst, term). Pre-aggregated per batch so the shuffle moves
    (dst, term, partial) rows, never raw anchors."""
    from ray.data.aggregate import Sum

    from rse_ray.functions.extract import extract, resolve_one
    from rse_ray.functions.tokenizer import tokenize

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        c: Counter = Counter()
        for u, h in zip(urls, htmls):
            for href, atext in extract(h)["anchors"]:
                link = resolve_one(u, href)
                if link is None:
                    continue
                for term in tokenize(atext, stem=False):
                    c[(link, term)] += 1
        keys = sorted(c)
        return pa.table({
            "dst_url": pa.array([k[0] for k in keys], type=pa.string()),
            "term": pa.array([k[1] for k in keys], type=pa.string()),
            "n_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    return pages_ds.select_columns(["url", "html"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["dst_url", "term"]).aggregate(
        Sum("n_p", alias_name="n_mentions"))


# --------------------------------------------------------------------------
# A2 / J3: backlink counts (how many pages link to each target)
# --------------------------------------------------------------------------

def backlink_counts(links_ds):
    """(src_url, dst_url) -> (dst_url, n_backlinks). Pre-aggregated per
    batch so the shuffle moves (dst, partial) not raw edges."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch.column("dst_url").to_pylist())
        keys = sorted(c)
        return pa.table(
            {"dst_url": pa.array(keys, type=pa.string()),
             "n_p": pa.array([c[k] for k in keys], type=pa.int64())}
        )

    return links_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "dst_url"
    ).aggregate(Sum("n_p", alias_name="n_backlinks"))


# --------------------------------------------------------------------------
# A3: the reference's relevance score (query tf × page tf)
# --------------------------------------------------------------------------

def reference_relevance(ds, query: str, *, stem: bool = False,
                        id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) -> (id, relevance) for rows sharing ≥1 query term —
    the J1 semi-join plus api/main.go:86-95's integer dot product.
    Shuffle-free: the query's tf map rides into every task as a plain
    closure constant (broadcast-small-side)."""
    from rse_ray.functions.tokenizer import tokenize

    qtf = dict(Counter(tokenize(query, stem=stem)))

    def fn(batch: pa.Table) -> pa.Table:
        id_type = batch.column(id_col).type
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_ids, out_scores = [], []
        for i, t in zip(ids, texts):
            tf = Counter(tokenize(t, stem=stem))
            if not any(w in tf for w in qtf):
                continue  # not matched by the J1 semi-join
            score = sum(q * tf[w] for w, q in qtf.items() if w in tf)
            out_ids.append(i)
            out_scores.append(score)
        return pa.table(
            {id_col: pa.array(out_ids, type=id_type),
             "relevance": pa.array(out_scores, type=pa.int64())}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# A4: the reference's page rank over a hit set
# --------------------------------------------------------------------------

def reference_search(pages_ds, links_ds, query: str, *,
                     stem: bool = True) -> pd.DataFrame:
    """The reference's full query path (api/main.go:48-119) over a
    pages table + links table: tokenize -> semi-join hit set ->
    relevance -> backlink map over the hit set -> rank -> sort.

    Returns (url, relevance, rank) sorted by rank desc, url asc (the
    Go sort leaves ties unspecified; url asc pins them).

    Partitioning assumption: the HIT SET (pages matching ≥1 query
    term) fits in driver memory — true in the reference, which
    materializes `[]CompletePage` per request. The links table itself
    is only ever filtered/aggregated distributed-side.
    """
    rel = reference_relevance(
        pages_ds, query, stem=stem, id_col="url", text_col="text"
    ).rename_columns({"url": "hit_url"})
    hits = rel.to_pandas()  # small by construction (see docstring)
    if hits.empty:
        return pd.DataFrame({"url": [], "relevance": [], "rank": []})

    hit_urls = set(hits["hit_url"])
    relevance = dict(zip(hits["hit_url"], hits["relevance"]))

    # backlinks map (api/main.go:74-83): for each hit page, count its
    # backlink SOURCES: backlinks[src]++ over edges whose dst is a hit.
    def edges_into_hits(batch: pa.Table) -> pa.Table:
        src = batch.column("src_url").to_pylist()
        dst = batch.column("dst_url").to_pylist()
        c = Counter(s for s, d in zip(src, dst) if d in hit_urls)
        keys = sorted(c)
        return pa.table(
            {"src_url": pa.array(keys, type=pa.string()),
             "n_p": pa.array([c[k] for k in keys], type=pa.int64())}
        )

    from ray.data.aggregate import Sum

    bl = (
        links_ds.map_batches(edges_into_hits, batch_format="pyarrow")
        .groupby("src_url")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    # Σ over the whole backlinks map of relevance[src]/count[src]
    # (relevance 0 for non-hit sources — Go map default, main.go:106).
    contrib = {
        s: relevance.get(s, 0) / n for s, n in zip(bl["src_url"], bl["n"])
    }
    total = float(sum(contrib.values()))
    ranks = np.empty(len(hits), dtype=np.float64)
    for i, u in enumerate(hits["hit_url"]):
        # exclude p's own term (the `backlinkID == page.ID` continue)
        ranks[i] = (RATING_FACTOR + total - contrib.get(u, 0.0)) * RANKER_CONSTANT
    out = pd.DataFrame(
        {"url": hits["hit_url"], "relevance": hits["relevance"], "rank": ranks}
    )
    return out.sort_values(["rank", "url"], ascending=[False, True]).reset_index(
        drop=True
    )


def domain_counts(pages_ds):
    """Per-host page counts + total html bytes — the aggregation that
    sizes crawl budgets and per-domain quality decisions at web scale
    (the reference's frontier is URL-granular; host granularity is the
    scale unit). Host = netloc via one vectorized pandas str.split per
    batch; per-batch pre-aggregation so the groupby shuffles (host,
    partials), never pages. Output: (host, n_pages, html_bytes),
    deterministic."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("url").to_pandas()
        host = s.str.split("/", n=3).str[2].fillna("")
        sizes = pd.Series(
            [len(b) for b in batch.column("html").to_pylist()],
            index=host.index)
        g = pd.DataFrame({"host": host, "b": sizes}).groupby(
            "host", sort=False).agg(n_p=("b", "size"), b_p=("b", "sum"))
        return pa.table({
            "host": pa.array(g.index.to_numpy(), type=pa.string()),
            "n_p": pa.array(g["n_p"].to_numpy(np.int64)),
            "b_p": pa.array(g["b_p"].to_numpy(np.int64)),
        })

    return pages_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n_p", alias_name="n_pages"),
                                   Sum("b_p", alias_name="html_bytes"))


def anchor_boosted_rank(pages_ds, query: str, *, w: float = 0.25,
                        stem: bool = False):
    """Content + anchor evidence fusion — the classic web-ranking
    upgrade the reference's relevance loop (api/main.go:86-95) is one
    join away from: score(url) = content_relevance(url) +
    w * anchor_relevance(url), where content relevance is the
    reference's integer dot product over the page's OWN text and
    anchor relevance is the same dot product over the anchor texts of
    links POINTING AT the url (anchors describe the target — Brin &
    Page 1998). Candidates = urls with either evidence kind (a page
    can rank on anchors alone — how new/unfetched pages surface).
    Output (url, relevance, anchor, score), w=0.25 exact in fp.

    Scale shape: ONE extract+tokenize pass over the pages emits both
    evidence kinds as tagged (url, rel, anc) partial rows — the page
    row carries its own content score, each kept link carries its
    anchor contribution to the TARGET — and ONE groupby(url) fuses.
    The query rides as a closure constant; no broadcast table, no
    second corpus pass, no join."""
    from rse_ray.functions.extract import extract, resolve_one
    from rse_ray.functions.tokenizer import tokenize

    qtf = dict(Counter(tokenize(query, stem=stem)))

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        o_url, o_rel, o_anc = [], [], []
        for u, h in zip(urls, htmls):
            ext = extract(h)
            tf = Counter(tokenize(ext["text"], stem=stem))
            rel = sum(q * tf[t] for t, q in qtf.items() if t in tf)
            if rel:
                o_url.append(u)
                o_rel.append(rel)
                o_anc.append(0)
            for href, atext in ext["anchors"]:
                link = resolve_one(u, href)
                if link is None:
                    continue
                c = Counter(tokenize(atext, stem=stem))
                a = sum(q * c[t] for t, q in qtf.items() if t in c)
                if a:
                    o_url.append(link)
                    o_rel.append(0)
                    o_anc.append(a)
        return pa.table({
            "url": pa.array(o_url, type=pa.string()),
            "rel": pa.array(o_rel, type=pa.int64()),
            "anc": pa.array(o_anc, type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    comb = pages_ds.select_columns(["url", "html"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("url").aggregate(Sum("rel", alias_name="relevance"),
                                  Sum("anc", alias_name="anchor"))

    def score(batch: pa.Table) -> pa.Table:
        rel = batch.column("relevance").to_numpy().astype(np.int64)
        anc = batch.column("anchor").to_numpy().astype(np.int64)
        return pa.table({
            "url": batch.column("url"),
            "relevance": pa.array(rel),
            "anchor": pa.array(anc),
            "score": pa.array(rel + w * anc),
        })

    return comb.map_batches(score, batch_format="pyarrow")


DDL_LIMITS = (("url", 8192), ("title", 256), ("description", 1024))


def ddl_quarantine(pages_ds):
    """The reference's schema enforces field widths (init_db.sql:4-7:
    url VARCHAR(8192), title VARCHAR(256), description VARCHAR(1024))
    and its upsert would ERROR mid-crawl on an oversized row. The
    batch-scale shape is QUARANTINE-not-crash: run the REAL extraction
    and emit one (url, field, length, limit_) row per violated limit —
    the poison-row report a 100 TB ingest routes to a side sink while
    clean rows flow on. Python len() counts characters like Postgres
    VARCHAR(n). Stateless map_batches, no shuffle."""
    from rse_ray.functions.extract import extract

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        out = {"url": [], "field": [], "length": [], "limit_": []}
        for u, h in zip(urls, htmls):
            ext = extract(h)
            vals = {"url": u, "title": ext["title"],
                    "description": ext["description"]}
            for field, lim in DDL_LIMITS:
                n = len(vals[field])
                if n > lim:
                    out["url"].append(u)
                    out["field"].append(field)
                    out["length"].append(n)
                    out["limit_"].append(lim)
        return pa.table({
            "url": pa.array(out["url"], type=pa.string()),
            "field": pa.array(out["field"], type=pa.string()),
            "length": pa.array(out["length"], type=pa.int64()),
            "limit_": pa.array(out["limit_"], type=pa.int64()),
        })

    return pages_ds.select_columns(["url", "html"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def frontier_prep(pages_ds, rules_ds, *, num_parts: int | None = None):
    """The reference's crawl-loop tail restated as ONE lazy Dataset
    chain (crawler.go fetch(): extractLinks -> resolve/validate ->
    visited? -> robots? -> LPush): extract links from the fetched
    pages, dedup targets (visited-set semantics, D1), drop urls the
    corpus already holds (distributed ANTI join against the pages'
    own urls — never a driver-side set), keep robots-allowed targets
    (rules broadcast, robots_filter precedence), and assign each
    survivor a politeness WAVE: its rank within its host by url
    order — wave w holds at most one url per host, so draining waves
    in order IS per-host round-robin crawl politeness (the scheduling
    discipline the reference's unbounded-goroutine fan-out lacks).
    Output (url, host, wave).

    Scale shape: extract/validate are stateless map_batches; the
    visited check is ONE hash co-partition anti join (hash_join
    how='anti' — each side ships keys once); robots rules broadcast
    via ray.put; the wave rank is one hash(host) exchange with a
    per-partition sort + cumcount (no per-host Python)."""
    from rse_ray.pipelines.relational import hash_join
    from rse_ray.util import parts_for, plan_rows

    cand = extract_links(pages_ds).map_batches(
        lambda b: pa.table({"url": b.column("dst_url")}),
        batch_format="pyarrow") \
        .groupby("url").count().select_columns(["url"])
    fresh = hash_join(cand, pages_ds.select_columns(["url"]),
                      left_on="url", right_on="url", right_cols=[],
                      num_parts=num_parts, how="anti")
    kept = robots_filter(fresh, rules_ds).map_batches(
        lambda b: b.filter(b.column("allowed")).select(["url"]),
        batch_format="pyarrow")

    P = num_parts if num_parts is not None else \
        parts_for(plan_rows(pages_ds), rows_per_part=200_000)

    def tag(batch: pa.Table) -> pa.Table:
        from urllib.parse import urlsplit

        urls = batch.column("url")
        # urlsplit netloc — the SAME host notion robots_filter and the
        # SQL twin use (a str.split('/')[2] would glue ?query onto the
        # host for path-less urls and split the politeness bucket)
        host = np.array([urlsplit(u).netloc for u in urls.to_pylist()],
                        dtype=object)
        part = (_pr_url_hash(host) % P).astype(np.int64)
        return pa.table({"url": urls,
                         "host": pa.array(host, type=pa.string()),
                         "part": pa.array(part)})

    def wave(g) -> pa.Table:
        d = g.sort_values(["host", "url"])
        w = d.groupby("host", sort=False).cumcount()
        return pa.table({
            "url": pa.array(d["url"].to_numpy(), type=pa.string()),
            "host": pa.array(d["host"].to_numpy(), type=pa.string()),
            "wave": pa.array(w.to_numpy(np.int64)),
        })

    return kept.map_batches(tag, batch_format="pyarrow") \
        .groupby("part").map_groups(wave, batch_format="pandas")


_TRACKING_PARAM = ("utm_", "fbclid", "gclid", "ref")


def _canonicalize_url(u: str) -> str:
    """One url -> its canonical form. The PINNED contract (the SQL
    twin replays it step for step):
      scheme lowercase; host lowercase with a leading 'www.' stripped;
      default ports dropped (http:80, https:443), others kept; path
      trailing slashes stripped (empty path -> '/'); fragment dropped;
      query params split on '&', empties and tracking params (utm_*,
      fbclid, gclid, ref) removed, the rest SORTED lexicographically.
    Userinfo/IPv6 netlocs are out of contract (treated as host[:port])."""
    from urllib.parse import urlsplit

    sp = urlsplit(u)
    scheme = sp.scheme.lower()
    hostport = sp.netloc.lower()
    if ":" in hostport:
        host, _, port = hostport.rpartition(":")
    else:
        host, port = hostport, ""
    if host.startswith("www."):
        host = host[4:]
    if (scheme, port) in (("http", "80"), ("https", "443")) or port == "":
        portpart = ""
    else:
        portpart = f":{port}"
    path = sp.path.rstrip("/")
    if path == "":
        path = "/"
    params = [p for p in sp.query.split("&")
              if p != "" and not any(
                  p == t or p.startswith(t + "=") or
                  (t == "utm_" and p.startswith(t))
                  for t in _TRACKING_PARAM)]
    qs = "&".join(sorted(params))
    return (f"{scheme}://{host}{portpart}{path}"
            + (f"?{qs}" if qs else ""))


def canonical_urls(urls_ds, *, url_col: str = "url"):
    """URL canonicalization — the crawl-hygiene normalizer that turns
    the reference's exact-string visited set (crawler.go:147-155,
    which treats http://www.X/?utm=.. and https://x/ as different
    pages) into a dedup-ready key. Output (url, canonical_url);
    stateless map_batches, no shuffle — compose with exact_dedup on
    the canonical column for visited-set semantics at scale."""
    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        return pa.table({
            url_col: batch.column(url_col),
            "canonical_url": pa.array(
                [_canonicalize_url(u) for u in urls], type=pa.string()),
        })

    return urls_ds.map_batches(fn, batch_format="pyarrow")


def robots_filter(urls_ds, rules_ds, *, url_col: str = "url"):
    """Batch analog of the reference's robots.txt gate (crawler.go:
    351-383 fetches and tests one URL at a time; at batch scale the
    crawl-policy table is a SMALL broadcast side): a url is allowed
    iff the LONGEST matching path-prefix rule for its host allows it
    — the Google robots.txt precedence spec (most specific rule wins,
    allow wins an exact length tie), default ALLOW when no rule
    matches (the reference fails open on robots errors too).
    ``rules_ds``: (host, prefix, allow:bool). Output (url, allowed).

    Scale shape: rules materialize ONCE into a per-host dict shipped
    via ray.put (read from the object store in every task, never
    re-serialized per batch); urls stream through a stateless
    map_batches — no shuffle at all."""
    import ray

    by_host: dict[str, list] = {}
    for r in rules_ds.take_all():     # small side by contract
        by_host.setdefault(r["host"], []).append(
            (r["prefix"], bool(r["allow"])))
    for h in by_host:
        # longest prefix first; allow before deny on equal length
        by_host[h].sort(key=lambda pr: (-len(pr[0]), not pr[1]))
    rules_ref = ray.put(by_host)

    def fn(batch: pa.Table) -> pa.Table:
        from urllib.parse import urlsplit

        rules = ray.get(rules_ref)
        urls = batch.column(url_col).to_pylist()
        allowed = np.ones(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            sp = urlsplit(u)
            rl = rules.get(sp.netloc)
            if not rl:
                continue
            path = sp.path or "/"
            for prefix, allow in rl:
                if path.startswith(prefix):
                    allowed[i] = allow
                    break
        return pa.table({url_col: batch.column(url_col),
                         "allowed": pa.array(allowed)})

    return urls_ds.map_batches(fn, batch_format="pyarrow")


def pagerank(links_ds, *, iters: int = 5, damping: float = 0.85,
             src_col: str = "src_url", dst_col: str = "dst_url",
             engine: str = "pregel", personalize_pred=None):
    """TRUE iterative PageRank over the link graph — the principled
    version of the reference's degenerate rank loop (api/main.go rank
    handler, mirrored by reference_search): power iteration with
    damping and dangling-mass redistribution,
    r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} r_t(u)/odeg(u) + dang_t/N),
    dang_t = 1 - sum(all contributions) (rank mass of sink nodes).
    Output (url, rank) for every node (src ∪ dst), rank rounded 6dp.

    ``engine='pregel'`` (default) runs the iteration as hash-sharded
    actor supersteps (see ``_pagerank_pregel``) — the right engine for
    an iterative algorithm, where per-iteration state must NOT re-enter
    the full Dataset executor. ``engine='dataset'`` keeps the
    Dataset-composed form (hash join + groupby per iteration) as the
    reference implementation; the two are asserted equal in tests.

    ``personalize_pred`` (urls ndarray -> bool mask) switches to
    PERSONALIZED PageRank (topic-sensitive, Haveliwala 2002): the
    teleport distribution s is uniform over the seed set instead of
    uniform over all nodes — r_{t+1} = (1-d)·s + d·(A^T r_t +
    dang_t·s), r_0 = s — ranking pages by proximity to the seeds.
    Pregel engine only (the seed mask lives shard-local)."""
    if engine == "pregel":
        return _pagerank_pregel(links_ds, iters=iters, damping=damping,
                                src_col=src_col, dst_col=dst_col,
                                personalize_pred=personalize_pred)
    if personalize_pred is not None:
        raise ValueError("personalized PageRank runs on the pregel "
                         "engine only")
    if engine != "dataset":
        raise ValueError(f"engine={engine!r}")
    return _pagerank_dataset(links_ds, iters=iters, damping=damping,
                             src_col=src_col, dst_col=dst_col)


def _pagerank_dataset(links_ds, *, iters: int, damping: float,
                      src_col: str, dst_col: str):
    """Dataset-composed power iteration (reference engine): every
    iteration is ONE distributed hash join (edge src -> current rank)
    and ONE groupby(dst) contribution sum (zero-seeded so the full
    node set falls out of the shuffle) — all hash-partitioned, nothing
    driver-side except two O(1) scalars. Correct and fully streaming,
    but each iteration pays a full Dataset-executor launch, which is
    why the pregel engine is the default for the iterate-k-times
    shape."""
    import pyarrow.compute as pc

    from rse_ray.pipelines.relational import hash_join
    from rse_ray.util import parts_for, plan_rows

    links = links_ds.map_batches(
        lambda b: pa.table({"src": b.column(src_col),
                            "dst": b.column(dst_col)}),
        batch_format="pyarrow").materialize()
    # one shared fan-out for every join/groupby in the loop, derived
    # from the edge count ONCE (a per-join count() would add a full
    # pass per iteration)
    P = parts_for(plan_rows(links))

    def halves(b: pa.Table) -> pa.Table:
        return pa.table(
            {"url": pa.concat_arrays([
                b.column("src").combine_chunks().cast(pa.string()),
                b.column("dst").combine_chunks().cast(pa.string())])})

    nodes = links.map_batches(halves, batch_format="pyarrow") \
        .groupby("url").count().drop_columns(["count()"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:  # edge-free graph: same empty result as pregel
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], type=pa.string()),
             "rank": pa.array([], type=pa.float64())}))

    deg = links.groupby("src").count()
    edges = hash_join(links, deg.map_batches(
        lambda b: b.rename_columns(["s2", "odeg"]), batch_format="pyarrow"),
        left_on="src", right_on="s2", right_cols=["odeg"],
        num_parts=P).materialize()

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, 1.0 / n_nodes))),
        batch_format="pyarrow").materialize()

    # zero-contribution seed rows — unioned into every iteration's
    # groupby so EVERY node (including sinks with no in-links) comes
    # out of the single shuffle, replacing a second left join per
    # iteration; zeros are invisible to the dangling-mass total
    zero_seed = nodes.map_batches(
        lambda b: pa.table({"dst": b.column("url"),
                            "c": pa.array(
                                np.zeros(b.num_rows, dtype=np.float64))}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = hash_join(
            edges,
            ranks.map_batches(
                lambda b: b.rename_columns(["u2", "rank"]),
                batch_format="pyarrow"),
            left_on="src", right_on="u2", right_cols=["rank"],
            num_parts=P)
        contribs = joined.map_batches(
            lambda b: pa.table(
                {"dst": b.column("dst"),
                 "c": pc.divide(b.column("rank"),
                                pc.cast(b.column("odeg"), pa.float64()))}),
            batch_format="pyarrow")
        # ONE shuffle per iteration beyond the join: groupby(dst) over
        # contributions + zero seeds yields the full per-node table
        agg = contribs.union(zero_seed).groupby("dst").sum("c") \
            .materialize()
        # dangling mass from the AGGREGATED table (O(nodes) rows), not
        # a second full pass over the per-edge contributions
        tot = agg.sum("sum(c)") or 0.0
        dang_per_node = (1.0 - tot) / n_nodes
        base = (1.0 - damping) / n_nodes

        # bind the scalars at def time: ranks is LAZY now, so `step`
        # executes inside the NEXT iteration — late-binding closure
        # cells would hand it that iteration's dangling mass
        def step(b: pa.Table, *, base=base,
                 dang=dang_per_node) -> pa.Table:
            c = b.column("sum(c)").to_numpy()
            r = base + damping * (c + dang)
            return pa.table({"url": b.column("dst"), "rank": pa.array(r)})

        # lazy: the rank update rides into the next iteration's join
        # execution (agg is materialized, so nothing replays)
        ranks = agg.map_batches(step, batch_format="pyarrow")

    return ranks.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "rank": pa.array(
                                np.round(b.column("rank").to_numpy(), 6))}),
        batch_format="pyarrow")


def _pr_url_hash(urls: np.ndarray) -> np.ndarray:
    """Deterministic vectorized url -> uint64 hash (same fixed-key
    siphash hash_join routes string keys with), stable across
    processes and cluster sizes."""
    return pd.util.hash_array(urls.astype(object))


def _route_links(tbl: pa.Table, P: int, full_dst_rows: bool = False) -> list:
    """Map side of the graph exchange: route edges by hash(src), and
    by hash(dst) either as dst node stubs (PageRank/BFS/CC need only
    the node id) or as full edge rows (HITS pushes in both
    directions); returns 2P tables (by-src then by-dst)."""
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        # an all-empty upstream block can arrive schema-less (Ray
        # drops the schema on empty map outputs — seen once in a
        # 297-query bench run); it routes nothing everywhere
        empty_edge = pa.table({"src": pa.array([], type=pa.string()),
                               "dst": pa.array([], type=pa.string())})
        empty_dst = empty_edge if full_dst_rows \
            else pa.table({"dst": pa.array([], type=pa.string())})
        return [empty_edge] * P + [empty_dst] * P
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    h_src = (_pr_url_hash(src) % P).astype(np.int64)
    h_dst = (_pr_url_hash(dst) % P).astype(np.int64)
    out = []
    for p in range(P):
        out.append(tbl.filter(pa.array(h_src == p)))
    for p in range(P):
        m = pa.array(h_dst == p)
        out.append(tbl.filter(m) if full_dst_rows
                   else pa.table({"dst": tbl.column("dst").filter(m)}))
    return out


def _partition_graph(links_ds, src_col: str, dst_col: str,
                     num_parts: int | None,
                     full_dst_rows: bool = False):
    """Shared graph-sharding prologue for the pregel engines: project
    to (src, dst), materialize once (count + block refs share blocks),
    and run the M x R routing exchange. Returns (parts, M, P) where
    parts[m] is the list of 2P refs from mapper m; M == 0 signals an
    edge-free graph."""
    import ray

    from rse_ray.util import parts_for

    links = links_ds.map_batches(
        lambda b: pa.table(
            {"src": b.column(src_col).combine_chunks().cast(pa.string()),
             "dst": b.column(dst_col).combine_chunks().cast(pa.string())}),
        batch_format="pyarrow").materialize()
    block_refs = links.to_arrow_refs()
    n_edges = links.count()
    if len(block_refs) == 0 or n_edges == 0:
        return [], 0, 1
    P = num_parts if num_parts is not None else \
        parts_for(n_edges, rows_per_part=200_000)
    split = ray.remote(_route_links)
    # num_returns >= 2 always, so each entry is a list of 2P refs
    parts = [split.options(num_returns=2 * P).remote(r, P, full_dst_rows)
             for r in block_refs]
    return parts, len(block_refs), P


def _pagerank_pregel(links_ds, *, iters: int, damping: float,
                     src_col: str, dst_col: str,
                     num_parts: int | None = None,
                     personalize_pred=None):
    """Pregel-style PageRank: the graph is hash-partitioned ONCE by
    node (shard(u) = siphash(u) mod P; every edge lives with its SRC,
    so out-degrees are shard-local), each shard is an actor holding
    its edge slice and rank vector, and an iteration is two actor
    rounds: step() — every shard emits per-destination-shard
    pre-aggregated contribution tables straight into the object store
    (an M x R exchange, the same shape as the index build's merge
    exchange) — then apply() folds the received tables plus the two
    global scalars into the new rank vector. State stays resident in
    the actors across supersteps: no Dataset-executor launch, no
    re-shuffle of the edge set, per iteration — the property the
    Dataset-composed engine can't offer, and why iterative graph
    algorithms are the canonical raw-actor case.

    Partitioning assumptions, explicit: (1) a node's full out-edge
    list fits one shard (holds unless a single page has ~billions of
    outlinks); (2) each shard's node set + edges fit actor memory —
    P = parts_for(edges) grows with the graph, so shard size is
    bounded by the same rows/part rule as every other exchange here.
    The rank/contribution math is identical to _pagerank_dataset and
    the SQL twin; the three agree to the 6dp output rounding."""
    import ray

    parts, M, P = _partition_graph(links_ds, src_col, dst_col, num_parts)
    if M == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], type=pa.string()),
             "rank": pa.array([], type=pa.float64())}))

    @ray.remote
    class _PrShard:
        def __init__(self, p: int, P: int, edge_refs, dst_refs):
            self.p, self.P = p, P
            edges = pa.concat_tables(ray.get(list(edge_refs)))
            dsts = pa.concat_tables(ray.get(list(dst_refs)))
            src = edges.column("src").to_numpy(zero_copy_only=False)
            dst = edges.column("dst").to_numpy(zero_copy_only=False)
            own_dst = dsts.column("dst").to_numpy(zero_copy_only=False)
            # shard-local node set: own-hash srcs (by construction all
            # of them) plus own-hash dst stubs
            self.urls = np.array(
                sorted(set(src.tolist()) | set(own_dst.tolist())),
                dtype=object)
            src_idx = np.searchsorted(self.urls, src)
            # out-degree is exact shard-locally: ALL edges of a src
            # live here
            _, inv, cnt = np.unique(src_idx, return_inverse=True,
                                    return_counts=True)
            self.src_idx = src_idx
            self.inv_odeg = (1.0 / cnt[inv]) if len(src) else \
                np.empty(0, dtype=np.float64)
            # pre-group outgoing edges by destination shard, and
            # pre-aggregate within (dst, shard): contributions then
            # reduce to one scatter-add per superstep
            dshard = (_pr_url_hash(dst) % P).astype(np.int64) if len(dst) \
                else np.empty(0, dtype=np.int64)
            self.out = []
            for q in range(P):
                m = dshard == q
                self.out.append((dst[m], src_idx[m],
                                 self.inv_odeg[m]))
            self.rank = None

        def n_local(self) -> int:
            return len(self.urls)

        def init_ranks(self, n_nodes: int) -> None:
            self.n_nodes = n_nodes
            self.rank = np.full(len(self.urls), 1.0 / n_nodes)

        def count_seeds(self, pred) -> int:
            """Personalization: mark this shard's seed nodes; the
            driver sums the counts to normalize s."""
            self.seed_mask = pred(self.urls) if len(self.urls) else \
                np.zeros(0, dtype=bool)
            return int(self.seed_mask.sum())

        def init_ppr(self, n_seeds: int) -> None:
            self.s = self.seed_mask.astype(np.float64) / n_seeds
            self.rank = self.s.copy()

        def apply_ppr(self, damping: float, dang_tot: float,
                      *tables) -> None:
            csum = np.zeros(len(self.urls))
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.urls, t.column("dst").to_numpy(
                        zero_copy_only=False))
                np.add.at(csum, idx, t.column("c").to_numpy())
            self.rank = (1.0 - damping) * self.s \
                + damping * (csum + dang_tot * self.s)

        def step(self):
            """Superstep send half: per-destination-shard contribution
            tables, pre-aggregated by dst; [0] is this shard's total
            contribution mass (for the dangling term)."""
            out = []
            tot = 0.0
            for q in range(self.P):
                dst, src_idx, inv_odeg = self.out[q]
                if len(dst) == 0:
                    out.append(pa.table(
                        {"dst": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.float64())}))
                    continue
                c = self.rank[src_idx] * inv_odeg
                u, inv2 = np.unique(dst, return_inverse=True)
                csum = np.zeros(len(u))
                np.add.at(csum, inv2, c)
                tot += float(csum.sum())
                out.append(pa.table({"dst": pa.array(u, type=pa.string()),
                                     "c": pa.array(csum)}))
            return [tot] + out

        def apply(self, base: float, damping: float,
                  dang_per_node: float, *tables) -> None:
            csum = np.zeros(len(self.urls))
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.urls, t.column("dst").to_numpy(
                        zero_copy_only=False))
                np.add.at(csum, idx, t.column("c").to_numpy())
            self.rank = base + damping * (csum + dang_per_node)

        def result(self) -> pa.Table:
            return pa.table({"url": pa.array(self.urls, type=pa.string()),
                             "rank": pa.array(np.round(self.rank, 6))})

    shards = [
        _PrShard.remote(
            p, P,
            [parts[m][p] for m in range(M)],
            [parts[m][P + p] for m in range(M)])
        for p in range(P)
    ]
    n_nodes = sum(ray.get([s.n_local.remote() for s in shards]))
    if personalize_pred is not None:
        n_seeds = sum(ray.get([s.count_seeds.remote(personalize_pred)
                               for s in shards]))
        if n_seeds == 0:
            raise ValueError("personalize_pred selected no seed nodes")
        ray.get([s.init_ppr.remote(n_seeds) for s in shards])
    else:
        ray.get([s.init_ranks.remote(n_nodes) for s in shards])
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        outs = [s.step.options(num_returns=P + 1).remote()
                for s in shards]
        tot = sum(ray.get([o[0] for o in outs]))
        if personalize_pred is not None:
            ray.get([
                s.apply_ppr.remote(damping, 1.0 - tot,
                                   *[outs[p][q + 1] for p in range(P)])
                for q, s in enumerate(shards)
            ])
            continue
        dang_per_node = (1.0 - tot) / n_nodes
        ray.get([
            s.apply.remote(base, damping, dang_per_node,
                           *[outs[p][q + 1] for p in range(P)])
            for q, s in enumerate(shards)
        ])
    import ray.data

    res_refs = [s.result.remote() for s in shards]
    # block until the result tables exist in the object store: the
    # shard actors are released when this function returns, and a
    # pending task on a dead actor would poison the refs
    ray.wait(res_refs, num_returns=len(res_refs))
    return ray.data.from_arrow_refs(res_refs)


def degree_distribution(links_ds, *, src_col: str = "src_url",
                        dst_col: str = "dst_url"):
    """Out-degree histogram over the FULL node set (src ∪ dst):
    (out_degree, n_nodes), including the degree-0 row for sink-only
    nodes. Two small shuffles — per-batch partial counts -> per-node
    degree -> histogram — plus one driver-side subtraction for the
    zero row (|nodes| and |srcs| are scalars; no corpus
    materialization)."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # a row with EITHER endpoint null is no edge (consistent with
        # the other graph ops), so it feeds neither degree nor nodes
        t = pa.table({"url": batch.column(src_col).cast(pa.string()),
                      "_d": batch.column(dst_col).cast(pa.string())}) \
            .drop_null()
        g = t.group_by("url").aggregate([([], "count_all")])
        return pa.table({"url": g.column("url"),
                         "c": g.column("count_all")})

    deg = links_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("url").aggregate(Sum("c", alias_name="out_degree"))

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"out_degree": pc.cast(batch.column("out_degree"),
                                            pa.int64())}) \
            .group_by("out_degree").aggregate([([], "count_all")])
        return pa.table({"out_degree": g.column("out_degree"),
                         "n": g.column("count_all")})

    hist = deg.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("out_degree").aggregate(Sum("n", alias_name="n_nodes")) \
        .to_pandas()
    if "n_nodes" not in hist.columns:  # edge-free (or all-null) graph
        hist = pd.DataFrame({"out_degree": pd.array([], dtype="int64"),
                             "n_nodes": pd.array([], dtype="int64")})
    hist["n_nodes"] = hist["n_nodes"].astype("int64")
    hist["out_degree"] = hist["out_degree"].astype("int64")

    # degree-0 nodes = |src ∪ dst| − |distinct src| (both scalar
    # aggregates; unique() is the one unavoidable node-set shuffle)
    def node_union(b: pa.Table) -> pa.Table:
        t = pa.table({"s": b.column(src_col).cast(pa.string()),
                      "d": b.column(dst_col).cast(pa.string())}) \
            .drop_null()
        return pa.table({"url": pa.concat_arrays(
            [t.column("s").combine_chunks(),
             t.column("d").combine_chunks()])})

    both = links_ds.map_batches(node_union, batch_format="pyarrow")
    uniq = both.unique("url")  # None on a fully-empty dataset
    n_nodes = len(uniq) if uniq is not None else 0
    n_src = int(hist["n_nodes"].sum())
    if n_nodes > n_src:
        hist = pd.concat([hist, pd.DataFrame(
            {"out_degree": [0], "n_nodes": [n_nodes - n_src]})],
            ignore_index=True)
    return hist.sort_values("out_degree").reset_index(drop=True)


def reciprocal_links(links_ds, *, src_col: str = "src_url",
                     dst_col: str = "dst_url"):
    """Mutual-link pairs: (url_a, url_b), a < b, where BOTH a->b and
    b->a exist (self-loops excluded, duplicate edges collapsed). One
    shuffle on the canonical unordered pair key: per-batch partial
    collapses each (min, max) pair to direction flags, the global
    groupby ORs them, and a pair qualifies when both directions were
    seen. Fully vectorized; no driver-side edge materialization."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"s": batch.column(src_col).cast(pa.string()),
                      "d": batch.column(dst_col).cast(pa.string())}) \
            .drop_null()  # a null endpoint is no edge
        s, d = t.column("s"), t.column("d")
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        fwd = pc.cast(pc.equal(s, lo), pa.int64())  # lo->hi direction
        g = pa.table({"url_a": lo, "url_b": hi, "f": fwd,
                      "r": pc.subtract(pa.scalar(1, pa.int64()), fwd)}) \
            .group_by(["url_a", "url_b"]) \
            .aggregate([("f", "max"), ("r", "max")])
        return pa.table({"url_a": g.column("url_a"),
                         "url_b": g.column("url_b"),
                         "f": g.column("f_max"), "r": g.column("r_max")})

    both = links_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["url_a", "url_b"]) \
        .aggregate(Max("f", alias_name="f"), Max("r", alias_name="r"))
    return both.map_batches(
        lambda b: b.filter(pc.and_(pc.equal(b.column("f"), 1),
                                   pc.equal(b.column("r"), 1)))
                   .select(["url_a", "url_b"]),
        batch_format="pyarrow")


def triangle_count(links_ds, *, src_col: str = "src_url",
                   dst_col: str = "dst_url",
                   num_parts: int | None = None):
    """Triangles in the undirected simple graph (self-loops dropped,
    duplicate/reverse edges collapsed), counted with the degree-ordered
    node-iterator on shard ACTORS + raw M x P object-store exchanges
    (the pregel engines' shape) instead of chained Dataset
    sort-shuffles — each phase is one vectorized hop:

      E0  canonicalize each block and route every (lo, hi) pair to
          BOTH endpoint shards (hash(lo), hash(hi)),
      P1  per-shard: dedup pairs; EXACT degree of owned nodes (every
          edge incident to u reaches shard(u)); forward the lo-owned
          edge copy as (lo, hi, deg_lo) routed by hash(hi),
      P2  per-shard: attach deg_hi from local state, ORIENT each edge
          from its (degree, url)-smaller endpoint — oriented
          out-degree is O(sqrt(E)) even at hubs — route by hash(src),
      P3  per-shard: wedge enumeration as ONE pandas self-merge on
          src (each unordered wedge kept once via the (deg, url)
          half-filter); wedges and oriented edges both route by the
          (a, b) pair hash,
      P4  per-shard: a wedge is a triangle iff its closing oriented
          edge co-landed (exact two-column merge) -> local count.

    The driver sees P integers. Partitioning assumptions, explicit:
    a node's incident edges fit one shard (bounded by max raw degree);
    each shard's slice of every exchange fits actor memory
    (P = parts_for(edges) grows with the graph)."""
    import ray

    from rse_ray.util import parts_for

    links = links_ds.map_batches(
        lambda b: pa.table(
            {"src": b.column(src_col).cast(pa.string()),
             "dst": b.column(dst_col).cast(pa.string())}),
        batch_format="pyarrow").materialize()
    n_edges = links.count()
    if n_edges == 0:
        return pd.DataFrame({"n_triangles": pd.array([0], dtype="int64")})
    P = num_parts if num_parts is not None else \
        parts_for(n_edges, rows_per_part=200_000)

    def route_pairs(tbl: pa.Table, P: int) -> list:
        if tbl.num_rows == 0 or "src" not in tbl.column_names:
            # schema-less empty block (see _route_links): routes
            # nothing everywhere
            e = pa.table({"lo": pa.array([], type=pa.string()),
                          "hi": pa.array([], type=pa.string())})
            return [e] * max(P, 2)
        tbl = tbl.drop_null()  # a null endpoint is no edge
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d  # self-loops close no triangle
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        h_lo = (_pr_url_hash(lo) % P).astype(np.int64)
        h_hi = (_pr_url_hash(hi) % P).astype(np.int64)
        out = []
        for p in range(P):
            m = (h_lo == p) | (h_hi == p)
            out.append(pa.table({"lo": pa.array(lo[m], type=pa.string()),
                                 "hi": pa.array(hi[m], type=pa.string())}))
        if P == 1:  # ray num_returns floor of 2: pad with an empty table
            out.append(out[0].slice(0, 0))
        return out

    block_refs = links.to_arrow_refs()
    split = ray.remote(route_pairs)
    routed = [split.options(num_returns=max(P, 2)).remote(r, P)
              for r in block_refs]

    def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return _pr_url_hash(a + "\x00" + b)

    @ray.remote
    class _TriShard:
        def __init__(self, p: int, P: int, pair_refs):
            self.p, self.P = p, P
            t = pa.concat_tables(ray.get(list(pair_refs)))
            df = pd.DataFrame(
                {"lo": t.column("lo").to_numpy(zero_copy_only=False),
                 "hi": t.column("hi").to_numpy(zero_copy_only=False)}
            ).drop_duplicates(ignore_index=True)
            self.lo = df["lo"].to_numpy()
            self.hi = df["hi"].to_numpy()
            own_lo = (_pr_url_hash(self.lo) % P) == p
            own_hi = (_pr_url_hash(self.hi) % P) == p
            ends = np.concatenate([self.lo[own_lo], self.hi[own_hi]])
            self.deg_urls, cnt = np.unique(ends, return_counts=True)
            self.deg = cnt.astype(np.int64)
            self.own_lo = own_lo

        def _deg_of(self, urls: np.ndarray) -> np.ndarray:
            idx = np.searchsorted(self.deg_urls, urls)
            return self.deg[idx]

        def send_lo(self):
            """P1: the lo-owned edge copies, with deg(lo) attached,
            routed by hash(hi). [0] pads num_returns >= 2."""
            lo, hi = self.lo[self.own_lo], self.hi[self.own_lo]
            dl = self._deg_of(lo)
            h = (_pr_url_hash(hi) % self.P).astype(np.int64)
            out = [int(len(lo))]
            for q in range(self.P):
                m = h == q
                out.append(pa.table(
                    {"lo": pa.array(lo[m], type=pa.string()),
                     "hi": pa.array(hi[m], type=pa.string()),
                     "deg_lo": pa.array(dl[m])}))
            return out

        def orient(self, *tables):
            """P2: attach deg(hi) (owned here), orient from the
            (deg, url)-smaller endpoint, route by hash(src)."""
            live = [x for x in tables if x.num_rows]
            t = pa.concat_tables(live) if live else None
            if t is None:
                empty = pa.table({"src": pa.array([], type=pa.string()),
                                  "dst": pa.array([], type=pa.string()),
                                  "dst_deg": pa.array([], type=pa.int64())})
                return [0] + [empty] * self.P
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            dl = t.column("deg_lo").to_numpy().astype(np.int64)
            dh = self._deg_of(hi)
            lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
            src = np.where(lo_first, lo, hi)
            dst = np.where(lo_first, hi, lo)
            ddeg = np.where(lo_first, dh, dl)
            h = (_pr_url_hash(src) % self.P).astype(np.int64)
            out = [int(len(src))]
            for q in range(self.P):
                m = h == q
                out.append(pa.table(
                    {"src": pa.array(src[m], type=pa.string()),
                     "dst": pa.array(dst[m], type=pa.string()),
                     "dst_deg": pa.array(ddeg[m])}))
            return out

        def wedges(self, *tables):
            """P3: one self-merge on src -> wedge pairs (kept once via
            the (deg, url) half-filter); wedges AND this shard's
            oriented edges route onward by the (a, b) pair hash.
            Returns [count, w_0..w_{P-1}, e_0..e_{P-1}]."""
            live = [x for x in tables if x.num_rows]
            t = pa.concat_tables(live) if live else pa.table(
                {"src": pa.array([], type=pa.string()),
                 "dst": pa.array([], type=pa.string()),
                 "dst_deg": pa.array([], type=pa.int64())})
            df = pd.DataFrame(
                {"src": t.column("src").to_numpy(zero_copy_only=False),
                 "dst": t.column("dst").to_numpy(zero_copy_only=False),
                 "deg": t.column("dst_deg").to_numpy()})
            m = df.merge(df, on="src", suffixes=("_a", "_b"))
            keep = (m["deg_a"].to_numpy() < m["deg_b"].to_numpy()) | (
                (m["deg_a"].to_numpy() == m["deg_b"].to_numpy())
                & (m["dst_a"].to_numpy() < m["dst_b"].to_numpy()))
            wa = m["dst_a"].to_numpy()[keep]
            wb = m["dst_b"].to_numpy()[keep]
            hw = (_pair_key(wa, wb) % self.P).astype(np.int64)
            ea = df["src"].to_numpy()
            eb = df["dst"].to_numpy()
            he = (_pair_key(ea, eb) % self.P).astype(np.int64) \
                if len(ea) else np.empty(0, dtype=np.int64)
            out = [int(len(wa))]
            for q in range(self.P):
                mq = hw == q
                out.append(pa.table(
                    {"a": pa.array(wa[mq], type=pa.string()),
                     "b": pa.array(wb[mq], type=pa.string())}))
            for q in range(self.P):
                mq = he == q
                out.append(pa.table(
                    {"a": pa.array(ea[mq], type=pa.string()),
                     "b": pa.array(eb[mq], type=pa.string())}))
            return out

        def close_count(self, wedge_refs, edge_refs) -> int:
            """P4: exact two-column membership — wedges whose closing
            oriented edge co-landed here are triangles."""
            w = pa.concat_tables(ray.get(list(wedge_refs)))
            e = pa.concat_tables(ray.get(list(edge_refs)))
            if w.num_rows == 0 or e.num_rows == 0:
                return 0
            wdf = pd.DataFrame(
                {"a": w.column("a").to_numpy(zero_copy_only=False),
                 "b": w.column("b").to_numpy(zero_copy_only=False)})
            edf = pd.DataFrame(
                {"a": e.column("a").to_numpy(zero_copy_only=False),
                 "b": e.column("b").to_numpy(zero_copy_only=False)})
            return int(len(wdf.merge(edf, on=["a", "b"])))

    shards = [_TriShard.remote(p, P, [routed[m][p] for m in range(len(routed))])
              for p in range(P)]
    s1 = [s.send_lo.options(num_returns=P + 1).remote() for s in shards]
    s2 = [s.orient.options(num_returns=P + 1).remote(
        *[s1[p][q + 1] for p in range(P)]) for q, s in enumerate(shards)]
    s3 = [s.wedges.options(num_returns=2 * P + 1).remote(
        *[s2[p][q + 1] for p in range(P)]) for q, s in enumerate(shards)]
    counts = ray.get([
        s.close_count.remote([s3[p][q + 1] for p in range(P)],
                             [s3[p][P + q + 1] for p in range(P)])
        for q, s in enumerate(shards)])
    return pd.DataFrame({"n_triangles": pd.array([int(sum(counts))],
                                                 dtype="int64")})



def connected_components(links_ds, *, max_iters: int = 128,
                         src_col: str = "src_url", dst_col: str = "dst_url",
                         num_parts: int | None = None):
    """Undirected connected components over the link graph — "which
    pages form one browsing island" (the reference's crawler reaches
    exactly one component from its seed; this labels all of them).
    Pregel min-label propagation on the SAME shard layout as
    `pagerank`/`crawl_depth`: the edge set is symmetrized up front
    (both directions emitted, so out-edge propagation == undirected),
    every node starts labeled with its own url, and each superstep
    sends min-label deltas along out-edges; a node adopts the minimum
    label it has seen. Fixpoint = every node labeled with the
    LEXICOGRAPHIC MIN URL of its component — a deterministic,
    cluster-size-independent component id the SQL twin can reproduce.
    Delta propagation: only nodes whose label changed last superstep
    send, so total message volume is O(E * diameter) worst case but
    O(E) per label-decrease in practice. Terminates at global
    no-change (<= diameter supersteps) or ``max_iters``. The same two
    partitioning assumptions as `pagerank` apply."""
    import ray

    sym = links_ds.map_batches(
        lambda b, s=src_col, d=dst_col: pa.concat_tables([
            pa.table({"src": b.column(s).cast(pa.string()),
                      "dst": b.column(d).cast(pa.string())}),
            pa.table({"src": b.column(d).cast(pa.string()),
                      "dst": b.column(s).cast(pa.string())}),
        ]).drop_null(),  # a null endpoint is no edge
        batch_format="pyarrow")
    parts, M, P = _partition_graph(sym, "src", "dst", num_parts)
    if M == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], type=pa.string()),
             "component": pa.array([], type=pa.string())}))

    _SENTINEL = "\U0010ffff"  # > any real url, the scatter-min identity

    @ray.remote
    class _CcShard:
        def __init__(self, p: int, P: int, edge_refs, dst_refs):
            self.P = P
            edges = pa.concat_tables(ray.get(list(edge_refs)))
            dsts = pa.concat_tables(ray.get(list(dst_refs)))
            src = edges.column("src").to_numpy(zero_copy_only=False)
            dst = edges.column("dst").to_numpy(zero_copy_only=False)
            own_dst = dsts.column("dst").to_numpy(zero_copy_only=False)
            self.urls = np.array(
                sorted(set(src.tolist()) | set(own_dst.tolist())),
                dtype=object)
            self.src_idx = np.searchsorted(self.urls, src)
            self.dst = dst
            self.dst_shard = (_pr_url_hash(dst) % P).astype(np.int64) \
                if len(dst) else np.empty(0, dtype=np.int64)
            self.label = self.urls.copy()
            # every node is dirty before the first superstep
            self.changed = np.ones(len(self.urls), dtype=bool)

        def step(self):
            """Send half: per-destination-shard (dst, min incoming
            label) tables from edges whose SRC label changed last
            superstep. [0] is the frontier edge count (num_returns >=
            2 convention)."""
            frontier = self.changed[self.src_idx] if len(self.src_idx) \
                else np.empty(0, dtype=bool)
            self.changed[:] = False
            out = [int(frontier.sum())]
            for q in range(self.P):
                m = frontier & (self.dst_shard == q)
                if not m.any():
                    out.append(pa.table(
                        {"dst": pa.array([], type=pa.string()),
                         "lbl": pa.array([], type=pa.string())}))
                    continue
                lab = self.label[self.src_idx[m]]
                u, inv = np.unique(self.dst[m], return_inverse=True)
                mn = np.full(len(u), _SENTINEL, dtype=object)
                np.minimum.at(mn, inv, lab)
                out.append(pa.table({"dst": pa.array(u, type=pa.string()),
                                     "lbl": pa.array(mn, type=pa.string())}))
            return out

        def apply(self, *tables) -> int:
            """Scatter-min arrivals into the local labels; marks
            lowered nodes dirty and returns how many changed."""
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.urls,
                    t.column("dst").to_numpy(zero_copy_only=False))
                lbl = t.column("lbl").to_numpy(zero_copy_only=False)
                lower = lbl < self.label[idx]
                self.label[idx[lower]] = lbl[lower]
                self.changed[idx[lower]] = True
            return int(self.changed.sum())

        def result(self) -> pa.Table:
            return pa.table(
                {"url": pa.array(self.urls, type=pa.string()),
                 "component": pa.array(self.label, type=pa.string())})

    shards = [
        _CcShard.remote(
            p, P,
            [parts[m][p] for m in range(M)],
            [parts[m][P + p] for m in range(M)])
        for p in range(P)
    ]
    for _ in range(max_iters):
        outs = [s.step.options(num_returns=P + 1).remote()
                for s in shards]
        n_changed = sum(ray.get([
            s.apply.remote(*[outs[p][q + 1] for p in range(P)])
            for q, s in enumerate(shards)
        ]))
        if n_changed == 0:
            break

    import ray.data

    res_refs = [s.result.remote() for s in shards]
    ray.wait(res_refs, num_returns=len(res_refs))
    return ray.data.from_arrow_refs(res_refs)


def coreness(links_ds, *, src_col: str = "src_url",
             dst_col: str = "dst_url", num_parts: int | None = None):
    """k-core decomposition over the UNDIRECTED simple link graph ->
    (url, coreness): coreness(v) = the largest k such that v survives
    iterative removal of all nodes with degree < k (Matula & Beck
    1983 peeling) — the classic crawl-frontier density measure next
    to PageRank/HITS. Self-loops and duplicate/reverse-duplicate
    edges are ignored (simple-graph contract, like triangle_count).

    Scale shape: the pregel shard layout shared with pagerank/CC —
    edges symmetrize then partition ONCE by hash(src) (each node's
    undirected degree is shard-local after dedup); a peel round at
    level k kills local nodes with deg < k and ships one decrement
    row per (killed edge, destination shard), pre-aggregated as
    (dst, count) — every edge sends EXACTLY ONE decrement ever (at
    its source's death), so total message volume is O(E) across the
    whole run, and the driver sees only per-round removal counts.
    Levels advance when a round removes nothing; the run ends when
    no node is alive (k reaches the graph's degeneracy + 1)."""
    import pandas as pd
    import ray

    def symmetrize(b: pa.Table) -> pa.Table:
        t = pa.table({"src": b.column(src_col).cast(pa.string()),
                      "dst": b.column(dst_col).cast(pa.string())}) \
            .drop_null()
        t = t.filter(pc.invert(pc.equal(t.column("src"),
                                        t.column("dst"))))  # no self-loops
        return pa.concat_tables([
            t, pa.table({"src": t.column("dst"), "dst": t.column("src")})])

    sym = links_ds.map_batches(symmetrize, batch_format="pyarrow")
    parts, M, P = _partition_graph(sym, "src", "dst", num_parts)
    if M == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], type=pa.string()),
             "coreness": pa.array([], type=pa.int64())}))

    @ray.remote
    class _CoreShard:
        def __init__(self, p: int, P: int, edge_refs, dst_refs):
            self.P = P
            edges = pa.concat_tables(ray.get(list(edge_refs)))
            dsts = pa.concat_tables(ray.get(list(dst_refs)))
            df = pd.DataFrame({
                "src": edges.column("src").to_numpy(zero_copy_only=False),
                "dst": edges.column("dst").to_numpy(zero_copy_only=False),
            }).drop_duplicates()            # simple-graph dedup (local ==
            src = df["src"].to_numpy()      # global: all of src's edges
            dst = df["dst"].to_numpy()      # live in this shard)
            own_dst = dsts.column("dst").to_numpy(zero_copy_only=False)
            self.urls = np.array(
                sorted(set(src.tolist()) | set(own_dst.tolist())),
                dtype=object)
            self.src_idx = np.searchsorted(self.urls, src)
            self.dst = dst
            self.dst_shard = (_pr_url_hash(dst) % P).astype(np.int64) \
                if len(dst) else np.empty(0, dtype=np.int64)
            # symmetrized + dedup'd: local out-degree == undirected degree
            self.deg = np.bincount(self.src_idx,
                                   minlength=len(self.urls)).astype(np.int64)
            self.alive = np.ones(len(self.urls), dtype=bool)
            self.core = np.zeros(len(self.urls), dtype=np.int64)

        def n_nodes(self) -> int:
            return len(self.urls)

        def peel(self, k: int):
            """Kill alive nodes with deg < k; [0] = kill count, then P
            per-destination-shard (dst, c) decrement tables."""
            rem = self.alive & (self.deg < k)
            self.core[rem] = k - 1
            self.alive[rem] = False
            out = [int(rem.sum())]
            m_edges = rem[self.src_idx] if len(self.src_idx) \
                else np.empty(0, dtype=bool)
            for q in range(self.P):
                mq = m_edges & (self.dst_shard == q)
                if not mq.any():
                    out.append(pa.table(
                        {"dst": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.int64())}))
                    continue
                u, cnt = np.unique(self.dst[mq], return_counts=True)
                out.append(pa.table(
                    {"dst": pa.array(u, type=pa.string()),
                     "c": pa.array(cnt.astype(np.int64))}))
            return out

        def apply(self, *tables) -> None:
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.urls,
                    t.column("dst").to_numpy(zero_copy_only=False))
                self.deg[idx] -= t.column("c").to_numpy()

        def result(self) -> pa.Table:
            return pa.table(
                {"url": pa.array(self.urls, type=pa.string()),
                 "coreness": pa.array(self.core)})

    shards = [
        _CoreShard.remote(
            p, P,
            [parts[m][p] for m in range(M)],
            [parts[m][P + p] for m in range(M)])
        for p in range(P)
    ]
    n_alive = sum(ray.get([s.n_nodes.remote() for s in shards]))
    k = 1
    while n_alive > 0:
        outs = [s.peel.options(num_returns=P + 1).remote(k)
                for s in shards]
        ray.get([s.apply.remote(*[outs[p][q + 1] for p in range(P)])
                 for q, s in enumerate(shards)])
        removed = sum(ray.get([outs[p][0] for p in range(P)]))
        n_alive -= removed
        if removed == 0:
            k += 1      # level fixpoint -> next core level

    import ray.data

    res_refs = [s.result.remote() for s in shards]
    ray.wait(res_refs, num_returns=len(res_refs))
    return ray.data.from_arrow_refs(res_refs)


def crawl_depth(links_ds, *, seed_pred, max_depth: int = 32,
                src_col: str = "src_url", dst_col: str = "dst_url",
                num_parts: int | None = None):
    """BFS hop distance from a seed set over the directed link graph —
    the reference's crawl-frontier notion made explicit (crawler.go's
    queue discovers pages in exactly this breadth order from its seed
    urls): depth(u) = min hops from any seed, computed as pregel
    supersteps on the same shard layout as `pagerank`. Output
    (url, depth) for nodes REACHABLE within ``max_depth``; unreachable
    nodes are omitted. ``seed_pred(urls: np.ndarray) -> bool mask``
    picks seeds from the node set content-deterministically (e.g. an
    md5-mod gate), so the same seeds are chosen on any cluster size.

    Each superstep: shards send the frontier's out-neighbors to their
    owning shards (M x R object-store exchange of url lists, deduped
    at the sender); a node settles at FIRST arrival — BFS order makes
    that the minimum depth. The loop ends when no shard settles a new
    node or at ``max_depth``, so cycles terminate naturally. State
    (edges, depth vector) stays actor-resident across supersteps; the
    same two partitioning assumptions as `pagerank` apply."""
    import ray

    parts, M, P = _partition_graph(links_ds, src_col, dst_col, num_parts)
    if M == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], type=pa.string()),
             "depth": pa.array([], type=pa.int64())}))

    @ray.remote
    class _BfsShard:
        def __init__(self, p: int, P: int, edge_refs, dst_refs):
            self.P = P
            edges = pa.concat_tables(ray.get(list(edge_refs)))
            dsts = pa.concat_tables(ray.get(list(dst_refs)))
            src = edges.column("src").to_numpy(zero_copy_only=False)
            dst = edges.column("dst").to_numpy(zero_copy_only=False)
            own_dst = dsts.column("dst").to_numpy(zero_copy_only=False)
            self.urls = np.array(
                sorted(set(src.tolist()) | set(own_dst.tolist())),
                dtype=object)
            self.src_idx = np.searchsorted(self.urls, src)
            self.dst = dst
            self.dst_shard = (_pr_url_hash(dst) % P).astype(np.int64) \
                if len(dst) else np.empty(0, dtype=np.int64)
            self.depth = np.full(len(self.urls), -1, dtype=np.int64)

        def n_local(self) -> int:
            return len(self.urls)

        def seed(self, pred) -> int:
            if len(self.urls):
                m = np.asarray(pred(self.urls), dtype=bool)
                self.depth[m] = 0
                return int(m.sum())
            return 0

        def step(self, d: int):
            """Send half of superstep d: the out-neighbors of nodes at
            depth d, one deduped url table per destination shard.
            [0] is the local frontier edge count (keeps num_returns
            >= 2, same convention as the pagerank shard)."""
            frontier = self.depth[self.src_idx] == d
            out = [int(frontier.sum())]
            for q in range(self.P):
                m = frontier & (self.dst_shard == q)
                urls = np.unique(self.dst[m]) if m.any() else \
                    np.empty(0, dtype=object)
                out.append(pa.table(
                    {"url": pa.array(urls, type=pa.string())}))
            return out

        def apply(self, d_new: int, *tables) -> int:
            """Settle arrivals at depth d_new; returns #newly settled
            (first arrival == min depth, by BFS order)."""
            settled = 0
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.urls,
                    t.column("url").to_numpy(zero_copy_only=False))
                fresh = self.depth[idx] < 0
                self.depth[idx[fresh]] = d_new
                settled += int(fresh.sum())
            return settled

        def result(self) -> pa.Table:
            m = self.depth >= 0
            return pa.table(
                {"url": pa.array(self.urls[m], type=pa.string()),
                 "depth": pa.array(self.depth[m])})

    shards = [
        _BfsShard.remote(
            p, P,
            [parts[m][p] for m in range(M)],
            [parts[m][P + p] for m in range(M)])
        for p in range(P)
    ]
    n_seeded = sum(ray.get([s.seed.remote(seed_pred) for s in shards]))
    d = 0
    while n_seeded and d < max_depth:
        outs = [s.step.options(num_returns=P + 1).remote(d)
                for s in shards]
        new = ray.get([
            s.apply.remote(d + 1, *[outs[p][q + 1] for p in range(P)])
            for q, s in enumerate(shards)
        ])
        if not sum(new):
            break
        d += 1

    import ray.data

    res_refs = [s.result.remote() for s in shards]
    ray.wait(res_refs, num_returns=len(res_refs))
    return ray.data.from_arrow_refs(res_refs)


def _r9_half_away(x):
    """Half-away-from-zero rounding at 9dp (SQL round semantics;
    HITS scores are non-negative). Pins the fp state each half-step
    so both engines iterate from identical values — the kmeans
    trick."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e9 + 0.5) / 1e9


def hits_scores(links_ds, *, iters: int = 5,
                src_col: str = "src_url", dst_col: str = "dst_url",
                round_to: int = 6,
                num_parts: int | None = None):
    """HITS (Kleinberg 1999) hubs-and-authorities over the link graph
    -> (url, hub, authority), the classic query-independent relevance
    pair next to PageRank. Each iteration: authority = in-edge sum of
    hub scores, hub = out-edge sum of authority scores, each half-step
    L2-normalized. Raw sums AND normalized scores round half-away to
    9dp so distributed summation order cannot compound across
    iterations and the unrolled SQL twin (_hits_sql) reproduces the
    scores exactly.

    Scale shape: the pregel shard engine (same as _pagerank_pregel —
    a Dataset-composed version measured ~25x slower from executor
    launches alone): edges partition ONCE in both directions
    (hash(src) for the hub push, hash(dst) for the authority push —
    2x edge memory buys locality for both traversal directions),
    state stays actor-resident, and an iteration is four actor rounds
    (push/fold per half-step) with per-destination-shard
    pre-aggregated tables in the object store. The driver sees one
    O(1) norm scalar per half-step."""
    import ray

    parts, M, P = _partition_graph(links_ds, src_col, dst_col, num_parts,
                                   full_dst_rows=True)
    if M == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], type=pa.string()),
             "hub": pa.array([], type=pa.float64()),
             "authority": pa.array([], type=pa.float64())}))

    @ray.remote
    class _HitsShard:
        def __init__(self, p: int, P: int, src_refs, dst_refs):
            es = pa.concat_tables(ray.get(list(src_refs)))
            ed = pa.concat_tables(ray.get(list(dst_refs)))
            s_src = es.column("src").to_numpy(zero_copy_only=False)
            s_dst = es.column("dst").to_numpy(zero_copy_only=False)
            d_src = ed.column("src").to_numpy(zero_copy_only=False)
            d_dst = ed.column("dst").to_numpy(zero_copy_only=False)
            self.urls = np.array(
                sorted(set(s_src.tolist()) | set(d_dst.tolist())),
                dtype=object)
            # forward push (hub -> authority): own-src edges grouped
            # by destination shard
            src_idx = np.searchsorted(self.urls, s_src)
            qf = (_pr_url_hash(s_dst) % P).astype(np.int64) if len(s_dst) \
                else np.empty(0, dtype=np.int64)
            self.fwd = [(s_dst[qf == q], src_idx[qf == q])
                        for q in range(P)]
            # reverse push (authority -> hub): own-dst edges grouped
            # by source shard
            dst_idx = np.searchsorted(self.urls, d_dst)
            qr = (_pr_url_hash(d_src) % P).astype(np.int64) if len(d_src) \
                else np.empty(0, dtype=np.int64)
            self.rev = [(d_src[qr == q], dst_idx[qr == q])
                        for q in range(P)]
            self.h = self.a = None
            self._raw = None

        def n_local(self) -> int:
            return len(self.urls)

        def init_scores(self, init: float) -> None:
            self.h = np.full(len(self.urls), init)
            self.a = np.zeros(len(self.urls))

        def _push(self, groups, vec):
            out = []
            for keys, idx in groups:
                if len(keys) == 0:
                    out.append(pa.table(
                        {"u": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.float64())}))
                    continue
                c = vec[idx]
                u, inv = np.unique(keys, return_inverse=True)
                csum = np.zeros(len(u))
                np.add.at(csum, inv, c)
                out.append(pa.table({"u": pa.array(u, type=pa.string()),
                                     "c": pa.array(csum)}))
            return out

        def push_h(self):
            return self._push(self.fwd, self.h)

        def push_a(self):
            return self._push(self.rev, self.a)

        def fold(self, *tables) -> float:
            """Scatter-add received contributions, round to 9dp, and
            return this shard's sum of squares for the global norm."""
            raw = np.zeros(len(self.urls))
            # at P=1 a push ref wraps the whole 1-element list
            tables = [t for item in tables
                      for t in (item if isinstance(item, list) else [item])]
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.urls,
                    t.column("u").to_numpy(zero_copy_only=False))
                np.add.at(raw, idx, t.column("c").to_numpy())
            self._raw = _r9_half_away(raw)
            return float((self._raw ** 2).sum())

        def norm_a(self, z: float) -> None:
            self.a = _r9_half_away(self._raw / z) if z > 0 \
                else np.zeros(len(self.urls))

        def norm_h(self, z: float) -> None:
            self.h = _r9_half_away(self._raw / z) if z > 0 \
                else np.zeros(len(self.urls))

        def result(self, round_to: int) -> pa.Table:
            scale = 10.0 ** round_to
            return pa.table(
                {"url": pa.array(self.urls, type=pa.string()),
                 "hub": pa.array(np.floor(self.h * scale + 0.5) / scale),
                 "authority": pa.array(
                     np.floor(self.a * scale + 0.5) / scale)})

    shards = [
        _HitsShard.remote(
            p, P,
            [parts[m][p] for m in range(M)],
            [parts[m][P + p] for m in range(M)])
        for p in range(P)
    ]
    n_nodes = sum(ray.get([s.n_local.remote() for s in shards]))
    init = float(_r9_half_away(1.0 / np.sqrt(n_nodes))[()])
    ray.get([s.init_scores.remote(init) for s in shards])
    for _ in range(iters):
        for push, norm in (("push_h", "norm_a"), ("push_a", "norm_h")):
            # num_returns=1 yields a bare ref, not a 1-list
            outs = [getattr(s, push).options(num_returns=P).remote()
                    for s in shards]
            if P == 1:
                outs = [[o] for o in outs]
            sq = ray.get([
                s.fold.remote(*[outs[p][q] for p in range(P)])
                for q, s in enumerate(shards)
            ])
            z = float(np.sqrt(sum(sq)))
            ray.get([getattr(s, norm).remote(z) for s in shards])
    import ray.data

    res_refs = [s.result.remote(round_to) for s in shards]
    ray.wait(res_refs, num_returns=len(res_refs))
    return ray.data.from_arrow_refs(res_refs)


def related_pages(links_ds, *, src_col: str = "src_url",
                  dst_col: str = "dst_url", max_out: int = 100,
                  min_common: int = 1, round_to: int = 6):
    """Co-citation related pages (Dean & Henzinger 1999 shape): two
    pages are related when the same source links to both; the score is
    the Jaccard of their in-neighbor sets, |in(a) & in(b)| /
    |in(a) | in(b)|, restricted to INFORMATIVE sources — distinct
    out-degree in [2, max_out]. A source with one link co-cites
    nothing, and a mega-hub (directory page) co-cites everything, so
    both are excluded deterministically; in-degrees are measured over
    the same kept-source edge set, making the score self-consistent.

    Output (url_a, url_b, common, jaccard), url_a < url_b,
    common >= min_common.

    Scale shape: ONE hash(src)-partition shuffle co-locates each
    source's edges; every partition task does global edge dedup, the
    degree filter and VECTORIZED pair generation for its whole slice
    of sources (pair fan-out bounded at max_out^2 per source), and
    pre-aggregates its pair/degree counts before the groupby(pair)
    exchange; in-degrees attach via ``auto_join`` (the degree table
    is node-cardinality — broadcast under the planner threshold,
    co-partitioned beyond; round 5 — never a driver-side degree map
    built by this operator). No stage materializes edges on the
    driver."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from rse_ray.pipelines.relational import auto_join
    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(links_ds), rows_per_part=200_000)

    def clean(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": batch.column(src_col).cast(pa.string()),
                      "dst": batch.column(dst_col).cast(pa.string())}) \
            .drop_null()
        # per-batch partial dedup shrinks the shuffle; the partition
        # task finishes it globally (a src never straddles partitions)
        t = t.group_by(["src", "dst"]).aggregate([])
        part = (_pr_url_hash(t.column("src").to_numpy(
            zero_copy_only=False)) % P).astype(np.int64)
        return t.append_column("part", pa.array(part))

    _triu_cache: dict = {}

    def gen_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["src", "dst"]).sort_values(["src", "dst"])
        dst = df["dst"].to_numpy()
        _, starts, counts = np.unique(df["src"].to_numpy(),
                                      return_index=True,
                                      return_counts=True)
        u1p, u2p, degp = [], [], []
        for s0, c in zip(starts, counts):
            if c < 2 or c > max_out:
                continue
            if c not in _triu_cache:
                _triu_cache[c] = np.triu_indices(c, k=1)
            iu, ju = _triu_cache[c]
            sl = dst[s0:s0 + c]
            u1p.append(sl[iu])
            u2p.append(sl[ju])
            degp.append(sl)
        if not u1p:
            return pd.DataFrame({"u1": pd.Series([], dtype=str),
                                 "u2": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        # partial counts INSIDE the partition: pair rows collapse by
        # (u1, u2), degree rows (u2 = NULL sentinel) by node
        pairs = pd.DataFrame({"u1": np.concatenate(u1p),
                              "u2": np.concatenate(u2p)})
        pc_ = pairs.groupby(["u1", "u2"], sort=False).size() \
            .reset_index(name="n")
        dn, dc = np.unique(np.concatenate(degp), return_counts=True)
        degs = pd.DataFrame({"u1": dn, "u2": None, "n": dc})
        return pd.concat([pc_, degs], ignore_index=True)

    emitted = links_ds.map_batches(clean, batch_format="pyarrow") \
        .groupby("part").map_groups(gen_part, batch_format="pandas") \
        .materialize()

    pairs = emitted.map_batches(
            lambda b: b.filter(pc.is_valid(b.column("u2")))
                       .select(["u1", "u2", "n"]),
            batch_format="pyarrow") \
        .groupby(["u1", "u2"]).aggregate(Sum("n", alias_name="common"))
    if min_common > 1:
        pairs = pairs.filter(expr=f"common >= {min_common}")
    deg = emitted.map_batches(
            lambda b: b.filter(pc.is_null(b.column("u2")))
                       .select(["u1", "n"]),
            batch_format="pyarrow") \
        .groupby("u1").aggregate(Sum("n", alias_name="d")) \
        .materialize()

    d1 = deg.map_batches(
        lambda b: pa.table({"url": b.column("u1"), "d1": b.column("d")}),
        batch_format="pyarrow")
    d2 = deg.map_batches(
        lambda b: pa.table({"url": b.column("u1"), "d2": b.column("d")}),
        batch_format="pyarrow")
    joined = auto_join(pairs, d1, left_on="u1", right_on="url",
                       right_cols=["d1"])
    joined = auto_join(joined, d2, left_on="u2", right_on="url",
                       right_cols=["d2"])

    scale = 10.0 ** round_to

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("common").to_numpy().astype(np.float64)
        d1v = batch.column("d1").to_numpy().astype(np.float64)
        d2v = batch.column("d2").to_numpy().astype(np.float64)
        j = c / (d1v + d2v - c)
        return pa.table({
            "url_a": batch.column("u1"),
            "url_b": batch.column("u2"),
            "common": batch.column("common").cast(pa.int64()),
            "jaccard": pa.array(np.floor(j * scale + 0.5) / scale),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# public-suffix registrable domains
# --------------------------------------------------------------------------

def registrable_domains(hosts_ds, rules: list[str], *,
                        host_col: str = "host"):
    """Registrable-domain (eTLD+1) extraction under the Public Suffix
    List ALGORITHM (publicsuffix.org/list): rules are plain suffixes,
    ``*.x`` wildcards (the * consumes exactly one label) or ``!y``
    exceptions (public suffix = the exception rule minus its first
    label); among matching rules an exception wins, else the one with
    most labels; no match falls back to the implicit ``*`` rule (last
    label). registrable = public suffix + one more label, or null when
    the host IS a public suffix. This is the host -> site grouping
    every per-site crawl policy (politeness, dedup, quotas) keys on —
    naive 'last two labels' grouping breaks on co.uk-style suffixes.

    The rule list is broadcast inside the map function's closure
    (compiled once per task; at fleet scale, ray.put the compiled
    table) — map-only, no shuffle."""
    parsed = []
    for r in rules:
        exc = r.startswith("!")
        base = r[1:] if exc else (r[2:] if r.startswith("*.") else r)
        wild = r.startswith("*.")
        parsed.append((tuple(base.split(".")), wild, exc))

    def ps_labels(hl: tuple[str, ...]) -> int:
        best = 1          # implicit '*' rule
        best_exc = None
        for base, wild, exc in parsed:
            nb = len(base)
            if wild:
                if len(hl) >= nb + 1 and tuple(hl[-nb:]) == base:
                    n = nb + 1
                else:
                    continue
            else:
                if len(hl) >= nb and tuple(hl[-nb:]) == base:
                    n = nb
                else:
                    continue
            if exc:
                best_exc = n - 1 if best_exc is None else min(best_exc,
                                                              n - 1)
            else:
                best = max(best, n)
        return best_exc if best_exc is not None else best

    def fn(batch: pa.Table) -> pa.Table:
        hosts = batch.column(host_col).to_pylist()
        out = []
        for h in hosts:
            if h is None:
                out.append(None)
                continue
            hl = tuple(h.lower().split("."))
            n = ps_labels(hl)
            out.append(".".join(hl[-(n + 1):]) if len(hl) > n else None)
        return pa.table({
            host_col: batch.column(host_col),
            "registrable": pa.array(out, type=pa.string()),
        })

    return hosts_ds.map_batches(fn, batch_format="pyarrow")


def canonical_dedup(urls_ds, *, url_col: str = "url"):
    """The visited-set composition canonical_urls' docstring promises:
    group by canonical form, keep the lexicographically smallest
    variant as representative -> (canonical_url, rep_url, n_variants).
    One groupby(canonical) shuffle of (canonical, url) rows — exactly
    the reference's Redis visited set, but canonicalization-aware and
    hash-partitioned instead of a single shared set."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "canonical_url": [g["canonical_url"].iloc[0]],
            "rep_url": [g[url_col].min()],
            "n_variants": [np.int64(len(g))],
        })

    return (canonical_urls(urls_ds, url_col=url_col)
            .groupby("canonical_url")
            .map_groups(fold, batch_format="pandas"))


def scc(links_ds, *, max_rounds: int = 64, max_iters: int = 128,
        src_col: str = "src_url", dst_col: str = "dst_url",
        num_parts: int | None = None):
    """Strongly connected components of the DIRECTED link graph by
    forward-backward coloring (Orzan's distributed SCC: the
    MapReduce/Pregel-standard algorithm — Tarjan is inherently
    sequential): repeat on the still-unassigned subgraph

      1. fwd(v) = min url over alive ancestors of v (min-label
         propagation along edge direction, same delta-propagation
         engine as connected_components),
      2. bwd(v) = min url over alive descendants (same, reversed),
      3. every v with fwd(v) == bwd(v) == x is assigned scc_id = x —
         sound in EVERY round (x reaches v and v reaches x), and each
         round assigns at least SCC(min alive url), so rounds <=
         #SCCs (shallow in practice: the peel order follows the
         condensation DAG, not component count).

    -> (url, scc_id) with scc_id = LEXICOGRAPHIC MIN member url, the
    same deterministic component id contract as connected_components.

    Scale shape: the graph is hash-partitioned ONCE (edges live with
    their src for the forward pass and with their dst — full rows,
    ``full_dst_rows`` — for the backward pass, so BOTH directions
    propagate without re-shuffling); labels/alive masks stay resident
    in the shard actors across all rounds; each superstep is the same
    M x R pre-aggregated exchange as pagerank. Dead (assigned) nodes
    stop sending and receiving, so later rounds touch only the
    shrinking frontier subgraph. Partitioning assumptions identical
    to pagerank (per-node edge lists fit a shard)."""
    import ray

    parts, M, P = _partition_graph(links_ds, src_col, dst_col,
                                   num_parts, full_dst_rows=True)
    import ray.data

    empty = pa.table({"url": pa.array([], type=pa.string()),
                      "scc_id": pa.array([], type=pa.string())})
    if M == 0:
        return ray.data.from_arrow(empty)

    _SENT = "\U0010ffff"  # > any real url: the scatter-min identity

    @ray.remote
    class _SccShard:
        def __init__(self, p: int, P: int, src_refs, dst_refs):
            self.P = P
            fe = pa.concat_tables(ray.get(list(src_refs)))
            be = pa.concat_tables(ray.get(list(dst_refs)))
            f_src = fe.column("src").to_numpy(zero_copy_only=False)
            f_dst = fe.column("dst").to_numpy(zero_copy_only=False)
            b_src = be.column("src").to_numpy(zero_copy_only=False)
            b_dst = be.column("dst").to_numpy(zero_copy_only=False)
            # owned nodes: hash-p urls seen as src (src-routed rows)
            # or as dst (dst-routed rows)
            self.urls = np.array(
                sorted(set(f_src.tolist()) | set(b_dst.tolist())),
                dtype=object)
            n = len(self.urls)
            # forward: propagate src -> dst along src-routed edges
            self.f_idx = np.searchsorted(self.urls, f_src)
            self.f_to = f_dst
            self.f_shard = (_pr_url_hash(f_dst) % P).astype(np.int64) \
                if len(f_dst) else np.empty(0, dtype=np.int64)
            # backward: propagate dst -> src along dst-routed edges
            self.b_idx = np.searchsorted(self.urls, b_dst)
            self.b_to = b_src
            self.b_shard = (_pr_url_hash(b_src) % P).astype(np.int64) \
                if len(b_src) else np.empty(0, dtype=np.int64)
            self.alive = np.ones(n, dtype=bool)
            self.lf = self.urls.copy()
            self.lb = self.urls.copy()
            self.cf = self.alive.copy()
            self.cb = self.alive.copy()

        def reset(self) -> None:
            self.lf = np.where(self.alive, self.urls, _SENT)
            self.lb = np.where(self.alive, self.urls, _SENT)
            self.cf = self.alive.copy()
            self.cb = self.alive.copy()

        def _step(self, idx, to, to_shard, label, changed):
            frontier = (changed[idx] & self.alive[idx]) if len(idx) \
                else np.empty(0, dtype=bool)
            changed[:] = False
            out = [int(frontier.sum())]
            for q in range(self.P):
                m = frontier & (to_shard == q)
                if not m.any():
                    out.append(pa.table(
                        {"to": pa.array([], type=pa.string()),
                         "lbl": pa.array([], type=pa.string())}))
                    continue
                lab = label[idx[m]]
                u, inv = np.unique(to[m], return_inverse=True)
                mn = np.full(len(u), _SENT, dtype=object)
                np.minimum.at(mn, inv, lab)
                out.append(pa.table(
                    {"to": pa.array(u, type=pa.string()),
                     "lbl": pa.array(mn, type=pa.string())}))
            return out

        def _apply(self, tables, label, changed) -> int:
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.urls,
                    t.column("to").to_numpy(zero_copy_only=False))
                lbl = t.column("lbl").to_numpy(zero_copy_only=False)
                lower = (lbl < label[idx]) & self.alive[idx]
                label[idx[lower]] = lbl[lower]
                changed[idx[lower]] = True
            return int(changed.sum())

        def step_f(self):
            return self._step(self.f_idx, self.f_to, self.f_shard,
                              self.lf, self.cf)

        def apply_f(self, *tables) -> int:
            return self._apply(tables, self.lf, self.cf)

        def step_b(self):
            return self._step(self.b_idx, self.b_to, self.b_shard,
                              self.lb, self.cb)

        def apply_b(self, *tables) -> int:
            return self._apply(tables, self.lb, self.cb)

        def harvest(self):
            """Assign fwd==bwd alive nodes; returns (assigned table,
            remaining alive count)."""
            m = self.alive & (self.lf == self.lb)
            tbl = pa.table(
                {"url": pa.array(self.urls[m], type=pa.string()),
                 "scc_id": pa.array(self.lf[m], type=pa.string())})
            self.alive[m] = False
            return tbl, int(self.alive.sum())

    shards = [
        _SccShard.remote(p, P,
                         [parts[m][p] for m in range(M)],
                         [parts[m][P + p] for m in range(M)])
        for p in range(P)
    ]

    def fixpoint(step_name: str, apply_name: str) -> None:
        for _ in range(max_iters):
            outs = [getattr(s, step_name)
                    .options(num_returns=P + 1).remote()
                    for s in shards]
            n = sum(ray.get([
                getattr(s, apply_name)
                .remote(*[outs[p][q + 1] for p in range(P)])
                for q, s in enumerate(shards)
            ]))
            if n == 0:
                return

    out_refs = []
    for _ in range(max_rounds):
        ray.get([s.reset.remote() for s in shards])
        fixpoint("step_f", "apply_f")
        fixpoint("step_b", "apply_b")
        res = [s.harvest.options(num_returns=2).remote()
               for s in shards]
        out_refs.extend(r[0] for r in res)
        if sum(ray.get([r[1] for r in res])) == 0:
            break
    return ray.data.from_arrow_refs(out_refs)


def condensation_layers(links_ds, *, max_depth: int = 256,
                        src_col: str = "src_url",
                        dst_col: str = "dst_url",
                        num_parts: int | None = None):
    """Topological LAYERING of the SCC condensation — the DAG view a
    crawl scheduler / incremental recompute planner needs (everything
    in layer k depends only on layers < k): contract each SCC (via
    ``scc``) to one node, drop intra-SCC edges, and assign each
    condensation node its LONGEST-path depth from any source
    (layer(v) = 0 for sources, else 1 + max over predecessors).
    -> (scc_id, layer, n_members).

    Scale shape: scc ids attach to both edge endpoints via
    ``auto_join`` (the node map is a dimension of the page graph —
    broadcast under the planner threshold, co-partitioned beyond;
    round 5 — the explicit hash_join here was two full page-graph
    exchanges at every fixture size) and the distinct cross-SCC edge
    set materializes ONCE; the layer sweep then runs on RESIDENT
    shard actors (the pagerank/scc engine): every scc node lives on
    shard hash(scc_id), edges live with their src, and a superstep is
    one pre-aggregated max exchange — so the per-round cost is actor
    messaging, not a fresh Dataset execution per round. The sweep's
    shard count derives from the CONDENSATION size, not the page
    count (a 69-node condensation used to spawn 32 actors for the
    sweep). Max-propagation over a DAG is monotone and bounded by
    depth, so fixpoint = a round with no raises; ``max_depth`` is the
    runaway cap (a cycle would mean scc() was wrong)."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from rse_ray.pipelines.relational import auto_join
    from rse_ray.util import parts_for

    sccs = scc(links_ds, src_col=src_col, dst_col=dst_col,
               num_parts=num_parts).materialize()
    n_nodes = sccs.count()
    empty = pa.table({"scc_id": pa.array([], type=pa.string()),
                      "layer": pa.array([], type=pa.int64()),
                      "n_members": pa.array([], type=pa.int64())})
    if n_nodes == 0:
        return ray.data.from_arrow(empty)
    P = num_parts if num_parts is not None \
        else parts_for(n_nodes, rows_per_part=200_000)

    members = sccs.groupby("scc_id").aggregate(Count()).materialize()

    edges = links_ds.map_batches(
        lambda b: pa.table(
            {"src": b.column(src_col).cast(pa.string()),
             "dst": b.column(dst_col).cast(pa.string())}).drop_null(),
        batch_format="pyarrow").materialize()
    e1 = auto_join(edges, sccs, left_on="src", right_on="url",
                   right_cols=["scc_id"], how="inner",
                   num_parts=P).map_batches(
        lambda b: (pa.table({"dst": b.column("dst"),
                             "src_scc": b.column("scc_id")})
                   if "dst" in b.column_names else
                   pa.table({"dst": pa.array([], type=pa.string()),
                             "src_scc": pa.array([],
                                                 type=pa.string())})),
        batch_format="pyarrow")
    e2 = auto_join(e1, sccs, left_on="dst",
                   right_on="url", right_cols=["scc_id"], how="inner",
                   num_parts=P)

    def cross_only(batch: pa.Table) -> pa.Table:
        if "src_scc" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"src": pa.array([], type=pa.string()),
                             "dst": pa.array([], type=pa.string())})
        t = pa.table({"src": batch.column("src_scc"),
                      "dst": batch.column("scc_id")})
        return t.filter(pc.invert(pc.equal(t.column("src"),
                                           t.column("dst"))))

    def first_row(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    cond = e2.map_batches(cross_only, batch_format="pyarrow") \
        .groupby(["src", "dst"]) \
        .map_groups(first_row, batch_format="pyarrow").materialize()

    # the layer sweep's shard count follows the CONDENSATION node
    # count (~50k cond nodes per shard actor): page-count-derived P
    # spawned 32 resident actors for a fixture whose condensation has
    # dozens of nodes, and actor spawn dominated the sweep
    n_cond = members.count()
    Pl = max(1, min(P, -(-int(n_cond) // 50_000)))

    # route members by hash(scc_id), cond edges by hash(src)
    def route_members(tbl: pa.Table, P: int) -> list:
        if "scc_id" not in tbl.column_names:
            e = pa.table({"scc_id": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
            return [e] * P
        t = pa.table({"scc_id": tbl.column("scc_id"),
                      "n": pc.cast(tbl.column("count()"), pa.int64())})
        h = (_pr_url_hash(t.column("scc_id")
                          .to_numpy(zero_copy_only=False))
             % P).astype(np.int64)
        return [t.filter(pa.array(h == p)) for p in range(P)]

    def route_cond(tbl: pa.Table, P: int) -> list:
        if "src" not in tbl.column_names:
            e = pa.table({"src": pa.array([], type=pa.string()),
                          "dst": pa.array([], type=pa.string())})
            return [e] * P
        h = (_pr_url_hash(tbl.column("src")
                          .to_numpy(zero_copy_only=False))
             % P).astype(np.int64)
        return [tbl.filter(pa.array(h == p)) for p in range(P)]

    rm = ray.remote(route_members)
    rc = ray.remote(route_cond)
    mem_parts = [rm.options(num_returns=Pl).remote(r, Pl)
                 for r in members.to_arrow_refs()]
    cond_parts = [rc.options(num_returns=Pl).remote(r, Pl)
                  for r in cond.to_arrow_refs()]
    if Pl == 1:
        mem_parts = [[r] for r in mem_parts]
        cond_parts = [[r] for r in cond_parts]

    @ray.remote
    class _LayerShard:
        def __init__(self, p: int, P: int, mem_refs, edge_refs):
            self.P = P

            def tables(refs):
                # num_returns=1 hands back ONE ref resolving to the
                # router's 1-element LIST (P==1 path); flatten both
                got, out = ray.get(list(refs)), []
                for g in got:
                    out.extend(g) if isinstance(g, list) \
                        else out.append(g)
                return out

            mem = pa.concat_tables(tables(mem_refs))
            ed = pa.concat_tables(tables(edge_refs))
            self.ids = mem.column("scc_id") \
                .to_numpy(zero_copy_only=False)
            order = np.argsort(self.ids, kind="stable")
            self.ids = self.ids[order]
            self.n_members = mem.column("n") \
                .to_numpy(zero_copy_only=False)[order]
            src = ed.column("src").to_numpy(zero_copy_only=False)
            dst = ed.column("dst").to_numpy(zero_copy_only=False)
            self.src_idx = np.searchsorted(self.ids, src)
            self.dst = dst
            self.dst_shard = (_pr_url_hash(dst) % P).astype(np.int64) \
                if len(dst) else np.empty(0, dtype=np.int64)
            self.layer = np.zeros(len(self.ids), dtype=np.int64)
            self.changed = np.ones(len(self.ids), dtype=bool)

        def step(self):
            frontier = self.changed[self.src_idx] if len(self.src_idx) \
                else np.empty(0, dtype=bool)
            self.changed[:] = False
            out = [int(frontier.sum())]
            for q in range(self.P):
                m = frontier & (self.dst_shard == q)
                if not m.any():
                    out.append(pa.table(
                        {"to": pa.array([], type=pa.string()),
                         "cand": pa.array([], type=pa.int64())}))
                    continue
                cand = self.layer[self.src_idx[m]] + 1
                u, inv = np.unique(self.dst[m], return_inverse=True)
                mx = np.zeros(len(u), dtype=np.int64)
                np.maximum.at(mx, inv, cand)
                out.append(pa.table(
                    {"to": pa.array(u, type=pa.string()),
                     "cand": pa.array(mx, type=pa.int64())}))
            return out

        def apply(self, *tables) -> int:
            for t in tables:
                if t.num_rows == 0:
                    continue
                idx = np.searchsorted(
                    self.ids,
                    t.column("to").to_numpy(zero_copy_only=False))
                cand = t.column("cand").to_numpy()
                raise_ = cand > self.layer[idx]
                self.layer[idx[raise_]] = cand[raise_]
                self.changed[idx[raise_]] = True
            return int(self.changed.sum())

        def result(self) -> pa.Table:
            return pa.table(
                {"scc_id": pa.array(self.ids, type=pa.string()),
                 "layer": pa.array(self.layer, type=pa.int64()),
                 "n_members": pa.array(self.n_members,
                                       type=pa.int64())})

    shards = [
        _LayerShard.remote(p, Pl,
                           [mp[p] for mp in mem_parts],
                           [cp[p] for cp in cond_parts])
        for p in range(Pl)
    ]
    for _ in range(max_depth):
        outs = [s.step.options(num_returns=Pl + 1).remote()
                for s in shards]
        n = sum(ray.get([
            s.apply.remote(*[outs[p][q + 1] for p in range(Pl)])
            for q, s in enumerate(shards)
        ]))
        if n == 0:
            break
    res_refs = [s.result.remote() for s in shards]
    ray.wait(res_refs, num_returns=len(res_refs))
    return ray.data.from_arrow_refs(res_refs)


def deterministic_walks(links_ds, *, steps: int = 3,
                        src_col: str = "src_url",
                        dst_col: str = "dst_url",
                        num_parts: int | None = None):
    """Hash-seeded graph walk sampling (the node2vec/DeepWalk corpus
    generator, made REPRODUCIBLE): from every node, walk ``steps``
    hops where hop k moves from u to the out-neighbor v minimizing
    md5('walk:k:u>v') — a content-determined 'random' choice both
    engines can replay exactly (tie-break v ASC; a walk ending at a
    sink pads the remaining hops with nulls). -> (start_url, hop_1..
    hop_k).

    Scale shape: ALL hop tables N_k(src -> argmin-hash dst) come out
    of ONE hash(src)-partition pass over the edge set (the per-step
    md5 keys differ but the grouping is identical, so step k's argmin
    is just another column of the same in-partition reduce — round 5;
    the previous shape re-shuffled the full edge set once per step);
    the walk then composes by ``steps`` co-partitioned LEFT hash
    joins of the node-cardinality frontier against the
    node-cardinality hop table — never a broadcast of the edge set.
    Total cost: one edge partition pass + steps x (one
    node-cardinality join)."""
    import pandas as pd

    from rse_ray.pipelines.relational import hash_join
    from rse_ray.pipelines.sketch import _md5_u64
    from rse_ray.util import parts_for, plan_rows

    edges = links_ds.map_batches(
        lambda b: pa.table(
            {"src": b.column(src_col).cast(pa.string()),
             "dst": b.column(dst_col).cast(pa.string())}).drop_null(),
        batch_format="pyarrow").materialize()
    P = num_parts if num_parts is not None else \
        parts_for(plan_rows(edges), rows_per_part=500_000)

    def parted(batch: pa.Table) -> pa.Table:
        part = (_pr_url_hash(batch.column("src")
                             .to_numpy(zero_copy_only=False)) % P) \
            .astype(np.int64)
        return batch.append_column("part", pa.array(part))

    edges_p = edges.map_batches(parted,
                                batch_format="pyarrow").materialize()

    def next_hops_all(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["src", "dst"])
        out = None
        for k in range(1, steps + 1):
            h = _md5_u64([f"walk:{k}:{s}>{d}"
                          for s, d in zip(df["src"], df["dst"])])
            dk = df.assign(h=h).sort_values(["src", "h", "dst"])
            keep = dk.groupby("src", sort=False).head(1)[
                ["src", "dst"]].rename(columns={"dst": f"nxt{k}"})
            # every src has >=1 dst in every step (same edge set), so
            # this merge is total — left == inner by construction
            out = keep if out is None else out.merge(keep, on="src")
        return out

    nh_all = edges_p.groupby("part").map_groups(
        next_hops_all, batch_format="pandas").materialize()

    # start frontier: every distinct node (srcs ∪ dsts)
    def nodes(batch: pa.Table) -> pa.Table:
        u = pa.concat_arrays([
            batch.column("src").combine_chunks(),
            batch.column("dst").combine_chunks()])
        return pa.table({"start_url": u}) \
            .group_by(["start_url"]).aggregate([])

    walk = edges.map_batches(nodes, batch_format="pyarrow") \
        .groupby("start_url").map_groups(
            lambda g: g.slice(0, 1), batch_format="pyarrow") \
        .materialize()

    cur = "start_url"
    for k in range(1, steps + 1):
        walk = hash_join(walk, nh_all, left_on=cur,
                         right_on="src",
                         right_cols=[f"nxt{k}"], how="left")
        walk = walk.map_batches(
            lambda b, _k=k: b.rename_columns(
                [f"hop_{_k}" if c == f"nxt{_k}" else c
                 for c in b.column_names]),
            batch_format="pyarrow").materialize()
        cur = f"hop_{k}"

    cols = ["start_url"] + [f"hop_{k}" for k in range(1, steps + 1)]
    return walk.map_batches(
        lambda b: (b.select(cols) if set(cols)
                   <= set(b.column_names) else
                   pa.table({c: pa.array([], type=pa.string())
                             for c in cols})),
        batch_format="pyarrow")


HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/]+)"


def host_edges(links_ds, *, src_col: str = "src_url",
               dst_col: str = "dst_url"):
    """Collapse a page-level link table to the HOST graph: host =
    lowercased URL authority with userinfo and :port stripped (the
    same RE2 contract as the DuckDB twin), self-loop edges dropped,
    edges deduplicated. -> (src_host, dst_host) distinct rows.

    Scale shape: vectorized RE2 extraction per batch, then ONE
    groupby on the (src, dst) pair — host-graph cardinality is
    orders below the page graph, so everything downstream of this
    shuffle runs on the collapsed table."""

    def to_hosts(batch: pa.Table) -> pa.Table:
        out = {}
        for name, col in (("src_host", src_col),
                          ("dst_host", dst_col)):
            h = pc.extract_regex(batch.column(col),
                                 HOST_RE.replace("([^/]+)",
                                                 "(?P<h>[^/]+)"))
            hs = pc.struct_field(h, "h")
            hs = pc.utf8_lower(hs)
            hs = pc.replace_substring_regex(hs, "^[^@]*@", "")
            hs = pc.replace_substring_regex(hs, ":[0-9]+$", "")
            out[name] = hs
        t = pa.table(out)
        keep = pc.and_(
            pc.and_(t.column("src_host").is_valid(),
                    t.column("dst_host").is_valid()),
            pc.not_equal(t.column("src_host"),
                         t.column("dst_host")))
        return t.filter(keep)

    return links_ds.map_batches(to_hosts, batch_format="pyarrow") \
        .groupby(["src_host", "dst_host"]).count() \
        .drop_columns(["count()"])


def host_pagerank(links_ds, *, iters: int = 5,
                  damping: float = 0.85):
    """PageRank over the HOST graph (the classic site-level authority
    signal — crawl schedulers budget per host, not per page):
    host_edges() collapses the page links, then the shared pagerank
    power iteration runs on the collapsed graph. -> (host, rank)
    rounded 6dp."""
    ranks = pagerank(host_edges(links_ds), iters=iters,
                     damping=damping, src_col="src_host",
                     dst_col="dst_host")
    return ranks.map_batches(
        lambda b: b.rename_columns(["host", "rank"]),
        batch_format="pyarrow")


def adamic_adar(links_ds, *, src_col: str = "src_url",
                dst_col: str = "dst_url", max_out: int = 100,
                round_to: int = 6):
    """Adamic-Adar link prediction (Adamic & Adar 2003) over the
    co-citation graph: for every NON-adjacent page pair (a, b), the
    score sums 1/ln(out_degree(v)) over common in-linkers v — rare
    co-citers count more than directory hubs. Sources are windowed to
    distinct out-degree in [2, max_out] exactly like related_pages
    (a 1-link source co-cites nothing; a mega-hub's 1/ln(d) weight is
    noise that costs d^2 pairs to compute). Pairs that ARE already
    linked (either direction, over the full distinct edge set) are
    excluded — those aren't predictions. Output (url_a, url_b,
    common, aa), url_a < url_b, aa rounded to ``round_to``.

    Scale shape: the same ONE hash(src)-partition shuffle as
    related_pages; the weight 1/ln(deg(src)) is known INSIDE the
    partition task (deg = the source's own distinct fan-out), so
    pairs carry pre-summed (weight, count) partials into the
    groupby(pair) exchange — no degree join at all; the
    already-linked exclusion is a hash-partitioned ANTI join against
    the undirected edge key set. Nothing touches the driver."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from rse_ray.pipelines.relational import hash_join
    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(links_ds), rows_per_part=200_000)
    SEP = "\x1f"

    def clean(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": batch.column(src_col).cast(pa.string()),
                      "dst": batch.column(dst_col).cast(pa.string())}) \
            .drop_null()
        t = t.group_by(["src", "dst"]).aggregate([])
        part = (_pr_url_hash(t.column("src").to_numpy(
            zero_copy_only=False)) % P).astype(np.int64)
        return t.append_column("part", pa.array(part))

    _triu_cache: dict = {}

    def gen_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["src", "dst"]).sort_values(
            ["src", "dst"])
        dst = df["dst"].to_numpy()
        _, starts, counts = np.unique(df["src"].to_numpy(),
                                      return_index=True,
                                      return_counts=True)
        u1p, u2p, wp = [], [], []
        for s0, c in zip(starts, counts):
            if c < 2 or c > max_out:
                continue
            if c not in _triu_cache:
                _triu_cache[c] = np.triu_indices(c, k=1)
            iu, ju = _triu_cache[c]
            sl = dst[s0:s0 + c]
            u1p.append(sl[iu])
            u2p.append(sl[ju])
            wp.append(np.full(len(iu), 1.0 / math.log(c)))
        if not u1p:
            return pd.DataFrame({"u1": pd.Series([], dtype=str),
                                 "u2": pd.Series([], dtype=str),
                                 "w": pd.Series([], dtype=np.float64),
                                 "n": pd.Series([], dtype=np.int64)})
        pairs = pd.DataFrame({"u1": np.concatenate(u1p),
                              "u2": np.concatenate(u2p),
                              "w": np.concatenate(wp)})
        out = pairs.groupby(["u1", "u2"], sort=False).agg(
            w=("w", "sum"), n=("w", "size")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    pairs = links_ds.map_batches(clean, batch_format="pyarrow") \
        .groupby("part").map_groups(gen_part, batch_format="pandas") \
        .groupby(["u1", "u2"]).aggregate(
            Sum("w", alias_name="aa_raw"),
            Sum("n", alias_name="common"))

    def keyed(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("u1").cast(pa.string()),
            batch.column("u2").cast(pa.string()), SEP)
        return batch.append_column("pair_key", key)

    def edge_keys(batch: pa.Table) -> pa.Table:
        t = pa.table({"s": batch.column(src_col).cast(pa.string()),
                      "d": batch.column(dst_col).cast(pa.string())}) \
            .drop_null()
        t = t.filter(pc.invert(pc.equal(t.column("s"),
                                        t.column("d"))))
        lo = pc.min_element_wise(t.column("s"), t.column("d"))
        hi = pc.max_element_wise(t.column("s"), t.column("d"))
        k = pc.binary_join_element_wise(lo, hi, SEP)
        return pa.table({"pair_key": pc.unique(k)})

    edges = links_ds.map_batches(edge_keys, batch_format="pyarrow")
    unlinked = hash_join(
        pairs.map_batches(keyed, batch_format="pyarrow"), edges,
        left_on="pair_key", right_on="pair_key", right_cols=[],
        how="anti", num_parts=P)

    scale = 10.0 ** round_to

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 \
                or "aa_raw" not in batch.column_names:
            return pa.table({
                "url_a": pa.array([], type=pa.string()),
                "url_b": pa.array([], type=pa.string()),
                "common": pa.array([], type=pa.int64()),
                "aa": pa.array([], type=pa.float64())})
        w = batch.column("aa_raw").to_numpy()
        return pa.table({
            "url_a": batch.column("u1"),
            "url_b": batch.column("u2"),
            "common": batch.column("common").cast(pa.int64()),
            "aa": pa.array(np.floor(w * scale + 0.5) / scale)})

    return unlinked.map_batches(finish, batch_format="pyarrow")


def url_templates(pages_ds, *, url_col: str = "url"):
    """URL template mining — the crawl-scale structure discovery that
    decides which URL patterns are worth frontier budget: every
    path segment digit run collapses to ``{n}`` (so /p/17 and
    /p/2041 share one template while the host keeps its name),
    templates are counted and carry their
    lexicographically-first example. -> (template, n_urls, example).

    Scale shape: one vectorized regex per batch
    (pc.replace_substring_regex, compiled once by Arrow), per-batch
    (template, count, min-example) partials, ONE groupby over the
    template space — templates number in the thousands where URLs
    number in the billions, so the shuffle is tiny by construction."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col)
        tmpl = pc.replace_substring_regex(urls, r"/[0-9]+", "/{n}")
        g = pa.table({"template": tmpl, "url": urls}) \
            .group_by(["template"]) \
            .aggregate([([], "count_all"), ("url", "min")])
        return pa.table({
            "template": g.column("template"),
            "c_p": pc.cast(g.column("count_all"), pa.int64()),
            "e_p": g.column("url_min")})

    return pages_ds.select_columns([url_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("template") \
        .aggregate(Sum("c_p", alias_name="n_urls"),
                   Min("e_p", alias_name="example"))


def jaccard_links(links_ds, *, src_col: str = "src_url",
                  dst_col: str = "dst_url", max_out: int = 100,
                  round_to: int = 6):
    """Jaccard-coefficient link prediction — adamic_adar's
    set-overlap sibling: for every NON-adjacent page pair (a, b),

        J(a, b) = |I(a) ∩ I(b)| / |I(a) ∪ I(b)|
                = common / (indeg(a) + indeg(b) - common),

    where I(x) is x's in-linker set restricted to the SAME windowed
    sources (distinct out-degree in [2, max_out]) that generate the
    common counts, so numerator and denominator live on one universe.
    Already-linked pairs (either direction) are excluded. ->
    (url_a, url_b, common, jaccard), url_a < url_b.

    Scale shape: adamic_adar's hash(src)-partition pair generation
    (pre-summed partials, one groupby(pair)); windowed in-degrees are
    one extra (dst, count) aggregate attached to the pair table by
    the ADAPTIVE join (broadcast while the page universe is small,
    co-partitioned at web scale); the linked-pair exclusion is the
    same anti join. The division is a single float op on exact int64
    counts — identical in both engines."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from rse_ray.pipelines.relational import auto_join, hash_join
    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(links_ds), rows_per_part=200_000)
    SEP = "\x1f"

    def clean(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": batch.column(src_col).cast(pa.string()),
                      "dst": batch.column(dst_col).cast(pa.string())}) \
            .drop_null()
        t = t.group_by(["src", "dst"]).aggregate([])
        part = (_pr_url_hash(t.column("src").to_numpy(
            zero_copy_only=False)) % P).astype(np.int64)
        return t.append_column("part", pa.array(part))

    cleaned = links_ds.map_batches(clean,
                                   batch_format="pyarrow") \
        .materialize()

    _triu_cache: dict = {}

    def gen_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["src", "dst"]).sort_values(
            ["src", "dst"])
        dst = df["dst"].to_numpy()
        _, starts, counts = np.unique(df["src"].to_numpy(),
                                      return_index=True,
                                      return_counts=True)
        u1p, u2p = [], []
        for s0, c in zip(starts, counts):
            if c < 2 or c > max_out:
                continue
            if c not in _triu_cache:
                _triu_cache[c] = np.triu_indices(c, k=1)
            iu, ju = _triu_cache[c]
            sl = dst[s0:s0 + c]
            u1p.append(sl[iu])
            u2p.append(sl[ju])
        if not u1p:
            return pd.DataFrame({"u1": pd.Series([], dtype=str),
                                 "u2": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        pairs = pd.DataFrame({"u1": np.concatenate(u1p),
                              "u2": np.concatenate(u2p)})
        out = pairs.groupby(["u1", "u2"], sort=False) \
            .size().rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    # pinned: auto_join's schema probe fully executes an all-to-all
    # upstream, so an unpinned pair table would pay the quadratic
    # pair generation once for the probe and again for the join
    pairs = cleaned.groupby("part") \
        .map_groups(gen_part, batch_format="pandas") \
        .groupby(["u1", "u2"]) \
        .aggregate(Sum("n", alias_name="common")).materialize()

    # windowed in-degree: only sources with distinct fan-out in
    # [2, max_out] contribute — the same universe as the pairs
    def indeg_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["src", "dst"])
        cnt = df.groupby("src")["dst"].transform("size")
        keep = df[(cnt >= 2) & (cnt <= max_out)]
        out = keep.groupby("dst").size().rename("i").reset_index()
        out["i"] = out["i"].astype(np.int64)
        return out

    # pinned: both u1 and u2 attaches consume this aggregate — one
    # execution instead of one per join
    indeg = cleaned.groupby("part") \
        .map_groups(indeg_part, batch_format="pandas") \
        .groupby("dst").aggregate(Sum("i", alias_name="ind")) \
        .materialize()

    j1 = auto_join(pairs, indeg, left_on="u1", right_on="dst",
                   right_cols=["ind"], how="inner", num_parts=P)
    j1 = j1.map_batches(
        lambda b: b.rename_columns(
            [c if c != "ind" else "ind_a" for c in b.column_names]),
        batch_format="pyarrow")
    j2 = auto_join(j1, indeg, left_on="u2", right_on="dst",
                   right_cols=["ind"], how="inner", num_parts=P)

    def keyed(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("u1").cast(pa.string()),
            batch.column("u2").cast(pa.string()), SEP)
        return batch.append_column("pair_key", key)

    def edge_keys(batch: pa.Table) -> pa.Table:
        t = pa.table({"s": batch.column("src"),
                      "d": batch.column("dst")})
        t = t.filter(pc.invert(pc.equal(t.column("s"),
                                        t.column("d"))))
        lo = pc.min_element_wise(t.column("s"), t.column("d"))
        hi = pc.max_element_wise(t.column("s"), t.column("d"))
        k = pc.binary_join_element_wise(lo, hi, SEP)
        return pa.table({"pair_key": pc.unique(k)})

    edges = cleaned.map_batches(edge_keys, batch_format="pyarrow")
    unlinked = hash_join(
        j2.map_batches(keyed, batch_format="pyarrow"), edges,
        left_on="pair_key", right_on="pair_key", right_cols=[],
        how="anti", num_parts=P)

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 \
                or "common" not in batch.column_names:
            return pa.table({
                "url_a": pa.array([], type=pa.string()),
                "url_b": pa.array([], type=pa.string()),
                "common": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64())})
        c = batch.column("common").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ia = batch.column("ind_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ib = batch.column("ind").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # half-AWAY like adamic_adar: x/2^k ratios land exactly on
        # half-ulp boundaries where np.round's half-even disagrees
        # with the oracle
        scale = 10.0 ** round_to
        j = np.floor((c / (ia + ib - c)) * scale + 0.5) / scale
        return pa.table({
            "url_a": batch.column("u1"),
            "url_b": batch.column("u2"),
            "common": pa.array(c),
            "jaccard": pa.array(j)})

    return unlinked.map_batches(finish, batch_format="pyarrow")


def crawl_budget(pages_ds, *, budget: int = 1000,
                 url_col: str = "url"):
    """Proportional crawl-budget apportionment across hosts by the
    largest-remainder (Hamilton) method — the frontier-scheduling
    decision a polite crawler makes every cycle: host h with c_h of
    the N known pages gets floor(budget * c_h / N) slots, and the
    leftover slots go to the largest remainders (budget * c_h mod N,
    ties by host asc — fully integer arithmetic, so both engines
    apportion identically). -> (host, n_pages, alloc); sum(alloc) ==
    budget exactly.

    Scale shape: one vectorized host-extract + per-batch count
    partials, ONE groupby over hosts (bounded by the host universe,
    not pages); the apportionment runs driver-side on the host
    table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            batch.column(url_col), r"^[a-z]+://([^/]*).*$", r"\1")
        g = pa.table({"host": host}).group_by(["host"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            "host": g.column("host"),
            "c_p": pc.cast(g.column("count_all"), pa.int64())})

    counts = pages_ds.select_columns([url_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("c_p", alias_name="n_pages")) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    if counts.empty:
        return pd.DataFrame({
            "host": pd.Series([], dtype=object),
            "n_pages": pd.Series([], dtype=np.int64),
            "alloc": pd.Series([], dtype=np.int64)})
    c = counts["n_pages"].to_numpy(dtype=np.int64)
    N = int(c.sum())
    base = (budget * c) // N
    rem = (budget * c) % N
    left = budget - int(base.sum())
    # largest remainders win the leftover slots; ties by host asc
    order = np.lexsort((counts["host"].to_numpy(), -rem))
    extra = np.zeros(len(c), dtype=np.int64)
    extra[order[:left]] = 1
    return pd.DataFrame({
        "host": counts["host"],
        "n_pages": pd.Series(c, dtype=np.int64),
        "alloc": pd.Series(base + extra, dtype=np.int64)})


def diameter_estimate(links_ds, *, max_depth: int = 32,
                      src_col: str = "src_url",
                      dst_col: str = "dst_url"):
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib
    2009) on the directed link graph: BFS from the lexicographically
    smallest source node, take the farthest reached node (max depth,
    ties by url asc), BFS again from it — the second eccentricity is
    a tight diameter lower bound at two BFS costs, the standard
    estimator where an exact all-pairs diameter is 10^12-node
    impossible. -> one row (seed, far_node, ecc1, diameter_lb,
    n_reached1, n_reached2).

    Scale shape: two crawl_depth runs on the shared pregel shard
    layout (edges route once per run, supersteps are vectorized
    frontier expansions); only per-run (url, depth) tables — bounded
    by reachable nodes — leave the actors, and the argmax runs on
    those."""
    def _min_src() -> str:
        from ray.data.aggregate import Min

        m = links_ds.map_batches(
            lambda b: pa.table({
                "s": pc.cast(b.column(src_col), pa.string())}),
            batch_format="pyarrow").aggregate(Min("s",
                                              alias_name="m"))
        return str(m["m"])

    seed = _min_src()

    def seed_eq(val):
        def pred(urls: np.ndarray) -> np.ndarray:
            return urls == val
        return pred

    d1 = crawl_depth(links_ds, seed_pred=seed_eq(seed),
                     max_depth=max_depth, src_col=src_col,
                     dst_col=dst_col).to_pandas()
    d1 = d1.sort_values(["depth", "url"],
                        ascending=[False, True])
    far = str(d1["url"].iloc[0])
    ecc1 = int(d1["depth"].iloc[0])
    d2 = crawl_depth(links_ds, seed_pred=seed_eq(far),
                     max_depth=max_depth, src_col=src_col,
                     dst_col=dst_col).to_pandas()
    lb = int(d2["depth"].max())
    return pd.DataFrame({
        "seed": [seed], "far_node": [far],
        "ecc1": pd.array([ecc1], dtype="int64"),
        "diameter_lb": pd.array([lb], dtype="int64"),
        "n_reached1": pd.array([len(d1)], dtype="int64"),
        "n_reached2": pd.array([len(d2)], dtype="int64")})
