"""Link-graph pipeline vs golden links + pure-Python oracles.

Golden semantics are the reference's crawler-side link extraction
(crawler.go:294-349) and api-side relevance/rank loops
(api/main.go:86-111); the oracle below re-implements those loops
naively and never imports the distributed code paths it checks.
"""

from collections import Counter

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def link_corpus(tmp_path_factory):
    from rse_ray.sources.fixtures import generate_pages

    root = tmp_path_factory.mktemp("linkfix")
    pages_dir = root / "pages"
    golden = root / "golden_links.parquet"
    generate_pages(str(pages_dir), n_rows=300, n_dup_pairs=0, seed=7,
                   golden_links_path=str(golden))
    return {"pages_dir": str(pages_dir), "golden": str(golden)}


def _links_df(path_or_ds):
    df = path_or_ds.to_pandas() if hasattr(path_or_ds, "to_pandas") else path_or_ds
    return (df.sort_values(["src_url", "dst_url"]).reset_index(drop=True))


def test_extract_links_matches_golden(ray_session, link_corpus):
    import ray.data

    from rse_ray.pipelines.linkgraph import extract_links

    got = _links_df(extract_links(ray.data.read_parquet(link_corpus["pages_dir"])))
    want = _links_df(pq.read_table(link_corpus["golden"]).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_backlink_counts(ray_session, link_corpus):
    import ray.data

    from rse_ray.pipelines.linkgraph import backlink_counts, extract_links

    links = extract_links(ray.data.read_parquet(link_corpus["pages_dir"]))
    got = (backlink_counts(links).to_pandas()
           .sort_values("dst_url").reset_index(drop=True))
    golden = pq.read_table(link_corpus["golden"]).to_pandas()
    want = (golden.groupby("dst_url").size().rename("n_backlinks")
            .reset_index().sort_values("dst_url").reset_index(drop=True))
    want["n_backlinks"] = want["n_backlinks"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_reference_relevance_oracle(ray_session):
    import ray.data

    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.linkgraph import reference_relevance

    sf = "/root/testdata/sf0.001"
    query = "spark window merge window"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
    got = (reference_relevance(ds, query, stem=False).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    qtf = Counter(tokenize(query, stem=False))
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        tf = Counter(tokenize(text, stem=False))
        if any(w in tf for w in qtf):
            rows.append((int(did), sum(q * tf[w] for w, q in qtf.items())))
    want = (pd.DataFrame(rows, columns=["doc_id", "relevance"])
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_reference_search_full_oracle(ray_session, link_corpus):
    """End-to-end A3+A4: distributed pipeline == naive replica of the
    Go loops (api/main.go:48-119) on the same corpus."""
    import ray.data

    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.linkgraph import extract_links, reference_search

    pages = ray.data.read_parquet(link_corpus["pages_dir"])
    links = extract_links(pages)
    # head-vocab query so the hit set is non-trivial
    from rse_ray.sources.fixtures import make_vocab

    vocab = make_vocab(10_000, 7)
    query = f"{vocab[0]} {vocab[1]} {vocab[0]}"
    got = reference_search(pages, links, query, stem=True)
    assert len(got) > 0

    # --- naive oracle ---
    pdf = pq.read_table(link_corpus["pages_dir"]).to_pandas()
    ldf = pq.read_table(link_corpus["golden"]).to_pandas()
    qtf = Counter(tokenize(query, stem=True))
    relevance = {}
    for url, text in zip(pdf["url"], pdf["text"]):
        tf = Counter(tokenize(text, stem=True))
        if any(w in tf for w in qtf):
            relevance[url] = sum(q * tf[w] for w, q in qtf.items())
    backlinks = Counter()
    hit = set(relevance)
    for s, d in zip(ldf["src_url"], ldf["dst_url"]):
        if d in hit:
            backlinks[s] += 1
    ranks = {}
    for p in relevance:
        rank = 1.0
        for b, n in backlinks.items():
            if b == p:
                continue
            rank += relevance.get(b, 0) / n
        ranks[p] = rank * 0.85
    want = (pd.DataFrame(
        {"url": list(relevance), "relevance": list(relevance.values()),
         "rank": [ranks[u] for u in relevance]})
        .sort_values(["rank", "url"], ascending=[False, True])
        .reset_index(drop=True))
    want["relevance"] = want["relevance"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_anchor_boosted_rank_fusion(ray_session):
    """Content-only, anchor-only and mixed-evidence urls all rank;
    score = relevance + 0.25 * anchor."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import anchor_boosted_rank

    pages = pd.DataFrame([
        # p1: content 'apple apple' (rel=2 for q apple) + links to p9
        # with anchor 'apple pie' (anc 1 -> p9)
        ("https://e.ex/p1",
         b'<html><body><p>apple apple</p>'
         b'<a href="https://e.ex/p9">apple pie</a></body></html>'),
        # p2: no content match, links to p1 with anchor 'apple'
        ("https://e.ex/p2",
         b'<html><body><p>nothing here</p>'
         b'<a href="https://e.ex/p1">apple</a></body></html>'),
    ], columns=["url", "html"])
    got = anchor_boosted_rank(ray.data.from_pandas(pages), "apple",
                              w=0.25).to_pandas().set_index("url")
    assert got.loc["https://e.ex/p1"].tolist() == [2, 1, 2.25]
    assert got.loc["https://e.ex/p9"].tolist() == [0, 1, 0.25]
    assert "https://e.ex/p2" not in got.index   # no evidence either kind


def test_ddl_quarantine_limits(ray_session):
    """One row per violated limit; clean rows emit nothing; limits
    follow the reference DDL (title 256, description 1024, url 8192)."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import ddl_quarantine

    big_t = "t" * 300
    big_d = "d" * 1100
    pages = pd.DataFrame([
        ("https://ok.ex/a",
         f"<html><head><title>fine</title></head></html>".encode()),
        ("https://bad.ex/t",
         f"<html><head><title>{big_t}</title>"
         f'<meta name="description" content="{big_d}">'
         "</head></html>".encode()),
        ("https://" + "u" * 8200 + ".ex/",
         b"<html><head><title>x</title></head></html>"),
    ], columns=["url", "html"])
    got = ddl_quarantine(ray.data.from_pandas(pages)).to_pandas() \
        .sort_values(["url", "field"]).reset_index(drop=True)
    assert list(zip(got["field"], got["length"], got["limit_"])) == [
        ("description", 1100, 1024), ("title", 300, 256),
        ("url", 8212, 8192)]


def test_frontier_prep_composition(ray_session):
    """links - visited, robots-filtered, per-host waves: each wave
    holds at most one url per host and ranks follow url order."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import frontier_prep

    def page(url, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (url, f"<html><body>{body}</body></html>".encode())

    pages = pd.DataFrame([
        page("https://h1.ex/a", ["https://h1.ex/b", "https://h1.ex/c",
                                 "https://h2.ex/z", "https://h1.ex/a"]),
        page("https://h2.ex/z", ["https://h2.ex/blocked/x",
                                 "https://h1.ex/b"]),
    ], columns=["url", "html"])
    rules = pd.DataFrame([("h2.ex", "/blocked", False)],
                         columns=["host", "prefix", "allow"])
    got = frontier_prep(ray.data.from_pandas(pages),
                        ray.data.from_pandas(rules)).to_pandas() \
        .sort_values(["host", "wave"]).reset_index(drop=True)
    # visited (h1.ex/a, h2.ex/z) and robots-blocked urls are out;
    # dups collapse; waves rank within host by url order
    assert list(zip(got["url"], got["host"], got["wave"])) == [
        ("https://h1.ex/b", "h1.ex", 0),
        ("https://h1.ex/c", "h1.ex", 1),
    ]


def test_canonical_urls_contract():
    """Pin the canonicalization contract case by case."""
    from rse_ray.pipelines.linkgraph import _canonicalize_url as c

    assert c("HTTP://WWW.Site.Example/Path/") == "http://site.example/Path"
    assert c("http://site.example:80/") == "http://site.example/"
    assert c("https://www.site.example:443/a/b/?utm_source=t&q=1") == \
        "https://site.example/a/b?q=1"
    assert c("https://site.example:8443/x") == "https://site.example:8443/x"
    assert c("http://site.example") == "http://site.example/"
    # params sort; tracking params drop; 'referrer' is NOT 'ref'
    assert c("https://s.example/p?b=2&a=1&fbclid=z&ref=h&gclid=9") == \
        "https://s.example/p?a=1&b=2"
    assert c("https://s.example/p?referrer=keep&a=1") == \
        "https://s.example/p?a=1&referrer=keep"
    assert c("https://n.example/story//") == "https://n.example/story"
    assert c("https://n.example/story#sec") == "https://n.example/story"
    assert c("https://n.example/story?") == "https://n.example/story"
    assert c("https://a.example/v1?utm_") == "https://a.example/v1"
    assert c("https://a.example/v1?utm") == "https://a.example/v1?utm"


def test_robots_filter_precedence(ray_session):
    """Robots precedence: longest prefix wins, allow beats deny on an
    exact length tie, no-rule hosts and no-match paths default to
    allow, bare-host urls normalize to path '/'."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import robots_filter

    rules = pd.DataFrame([
        ("a.example", "/private/", False),
        ("a.example", "/private/open", True),
        ("a.example", "/dup", False),
        ("a.example", "/dup", True),
        ("b.example", "/", False),
    ], columns=["host", "prefix", "allow"])
    urls = pd.DataFrame({"url": [
        "https://a.example/private/x",        # denied subtree
        "https://a.example/private/open/d",   # longer allow overrides
        "https://a.example/dup/z",            # tie -> allow
        "https://a.example/elsewhere",        # no match -> allow
        "https://b.example",                  # bare host -> '/' -> denied
        "https://c.example/anything",         # no rules host -> allow
    ]})
    got = robots_filter(ray.data.from_pandas(urls),
                        ray.data.from_pandas(rules)).to_pandas()
    want = [False, True, True, True, False, True]
    assert dict(zip(got["url"], got["allowed"])) == \
        dict(zip(urls["url"], want))


def test_coreness_peeling_oracle(ray_session):
    """Pregel k-core == driver peeling on a handcrafted graph: a
    triangle (coreness 2) with a pendant tail (coreness 1), duplicate
    + reverse-duplicate edges and a self-loop all ignored; multi-part
    run matches the single-part run."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import coreness

    edges = [
        ("t1", "t2"), ("t2", "t3"), ("t3", "t1"),   # triangle -> 2
        ("t1", "p1"), ("p1", "p2"),                 # pendant tail -> 1
        ("t2", "t1"),                               # reverse duplicate
        ("t1", "t2"),                               # duplicate
        ("p2", "p2"),                               # self-loop
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src_url", "dst_url"]))
    want = {"t1": 2, "t2": 2, "t3": 2, "p1": 1, "p2": 1}
    for parts in (1, 3):
        got = coreness(ds, num_parts=parts).to_pandas()
        assert dict(zip(got["url"], got["coreness"])) == want


def test_coreness_planted_spectrum(ray_session):
    """The planted core fixture decomposes into the designed spectrum:
    pendants 1, ring 2, K5 clique 4, K8 clique 7."""
    import ray.data

    from rse_ray.pipelines.linkgraph import coreness
    from rse_ray.sources.fixtures import generate_core_graph

    path = "/tmp/rse_ray_cache/graph_core_v1/links.parquet"
    generate_core_graph(path)
    got = coreness(ray.data.read_parquet(path)).to_pandas()
    hist = got["coreness"].value_counts().to_dict()
    assert hist == {1: 60, 2: 200, 4: 5, 7: 8}


def test_connected_components_union_find_oracle(ray_session):
    """Pregel min-label CC == driver union-find on a handcrafted graph:
    two multi-node components (one a cycle, one a chain with a
    reversed edge) plus a self-loop singleton; component id is the
    lexicographic min url."""
    import ray.data

    from rse_ray.pipelines.linkgraph import connected_components

    edges = [
        # component min=a1: cycle a1->a2->a3->a1
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        # component min=b1: chain with one reversed edge b4->b3
        ("b1", "b2"), ("b2", "b3"), ("b4", "b3"),
        # self-loop singleton
        ("z9", "z9"),
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src_url", "dst_url"]))
    got = connected_components(ds, num_parts=3).to_pandas() \
        .sort_values("url").reset_index(drop=True)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for u in parent:
        comp.setdefault(find(u), []).append(u)
    want_rows = sorted(
        (u, min(members))
        for members in comp.values() for u in members)
    want = pd.DataFrame(want_rows, columns=["url", "component"])
    pd.testing.assert_frame_equal(got, want)
    # an edge-free graph yields the empty (url, component) table
    empty = connected_components(ray.data.from_pandas(pd.DataFrame(
        {"src_url": pd.Series([], dtype=str),
         "dst_url": pd.Series([], dtype=str)})))
    assert empty.count() == 0


def test_degree_distribution_and_reciprocal_links(ray_session):
    """Handcrafted graph: degrees {a:3 (dup edge collapses? no — raw
    out-edges count), sink-only nodes get the 0 row; reciprocal pairs
    detected across batches and self-loops/dups ignored."""
    import ray.data

    from rse_ray.pipelines.linkgraph import (degree_distribution,
                                             reciprocal_links)

    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),     # deg(a)=3
        ("b", "a"),                             # reciprocal with a->b
        ("c", "c"),                             # self-loop: ignored
        ("d", "e"), ("e", "d"),                 # reciprocal pair
        ("f", "g"),                             # one-way; g sink-only
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src_url", "dst_url"])).repartition(3)

    got_deg = degree_distribution(ds)
    # degrees: a=3, b=1, c=1, d=1, e=1, f=1 ; sinks with 0: g
    want_deg = pd.DataFrame({"out_degree": [0, 1, 3],
                             "n_nodes": [1, 5, 1]})
    pd.testing.assert_frame_equal(got_deg, want_deg)

    got_rec = reciprocal_links(ds).to_pandas() \
        .sort_values(["url_a", "url_b"]).reset_index(drop=True)
    want_rec = pd.DataFrame({"url_a": ["a", "d"], "url_b": ["b", "e"]})
    pd.testing.assert_frame_equal(got_rec, want_rec)


def test_triangle_count_bruteforce_oracle(ray_session):
    """Actor-exchange triangle count == brute-force itertools count on
    the planted fixture graph (hub skew, self-loops, duplicate and
    reciprocal edges all present), at P=1 and P=4."""
    from itertools import combinations

    import pyarrow.parquet as pq_
    import ray.data

    from rse_ray.pipelines.linkgraph import triangle_count
    from rse_ray.sources.fixtures import generate_graph

    path = "/tmp/rse_ray_cache/graph_600_v1/links.parquet"
    generate_graph(path)
    t = pq_.read_table(path)
    adj = {}
    for s, d in zip(t.column("src_url").to_pylist(),
                    t.column("dst_url").to_pylist()):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want = sum(
        1 for u in adj for v, w in combinations(sorted(adj[u]), 2)
        if u < v and w in adj[v]
    )
    assert want > 0  # the fixture plants real triangles
    ds = ray.data.read_parquet(path)
    for parts in (1, 4):
        got = triangle_count(ds, num_parts=parts)
        assert int(got["n_triangles"].iloc[0]) == want
    # edge-free graph
    empty = triangle_count(ray.data.from_pandas(pd.DataFrame(
        {"src_url": pd.Series([], dtype=str),
         "dst_url": pd.Series([], dtype=str)})))
    assert int(empty["n_triangles"].iloc[0]) == 0


def test_graph_ops_tolerate_null_endpoints(ray_session):
    """Null src/dst rows are 'no edge' in every structural graph op —
    they feed neither degrees, nodes, pairs, components nor
    triangles."""
    import ray.data

    from rse_ray.pipelines.linkgraph import (connected_components,
                                             degree_distribution,
                                             reciprocal_links,
                                             triangle_count)

    df = pd.DataFrame({
        "src_url": ["a", "b", "c", None, "e", "a"],
        "dst_url": ["b", "a", None, "d", "e", "c"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    deg = degree_distribution(ds)
    # live edges: a->b, b->a, a->c, e->e (self-loop counts for DEGREE);
    # nodes {a,b,c,e}; degrees a=2, b=1, e=1, c=0
    assert dict(zip(deg["out_degree"], deg["n_nodes"])) == {0: 1, 1: 2, 2: 1}
    rec = reciprocal_links(ds).to_pandas()
    assert rec.values.tolist() == [["a", "b"]]  # self-loop is NOT mutual
    cc = connected_components(ds).to_pandas()
    assert sorted(cc["url"]) == ["a", "b", "c", "e"]
    assert dict(zip(cc["url"], cc["component"])) == {
        "a": "a", "b": "a", "c": "a", "e": "e"}
    assert int(triangle_count(ds)["n_triangles"].iloc[0]) == 0
    # edge-free graph: empty histogram, no crash
    empty = ray.data.from_pandas(pd.DataFrame(
        {"src_url": pd.Series([], dtype=str),
         "dst_url": pd.Series([], dtype=str)}))
    assert len(degree_distribution(empty)) == 0


def test_hits_partition_invariance_and_star_graph(ray_session):
    """HITS on a star graph: the center is the unique authority
    (hub 0), leaves are pure hubs; scores are identical across shard
    counts (9dp rounding pins the fp state per half-step)."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import hits_scores

    leaves = [f"http://l{i}.test/" for i in range(8)]
    edges = pd.DataFrame({
        "src_url": leaves,
        "dst_url": ["http://center.test/"] * len(leaves),
    })
    outs = []
    for parts in (1, 4):
        got = hits_scores(ray.data.from_pandas(edges), iters=3,
                          num_parts=parts).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    got = outs[0].set_index("url")
    assert got.loc["http://center.test/", "authority"] == 1.0
    assert got.loc["http://center.test/", "hub"] == 0.0
    for u in leaves:
        assert got.loc[u, "authority"] == 0.0
        assert got.loc[u, "hub"] > 0.35  # 1/sqrt(8) each


def test_related_pages_cocitation_semantics(ray_session):
    """Informative-source window: a single-link source and a mega-hub
    (out-degree > max_out) contribute neither pairs nor degrees; the
    Jaccard uses kept-source in-degrees."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import related_pages

    hub_edges = [("http://hub.test/", f"http://t{i}.test/")
                 for i in range(6)]
    edges = pd.DataFrame(
        [("http://s1.test/", "http://a.test/"),
         ("http://s1.test/", "http://b.test/"),
         ("http://s1.test/", "http://c.test/"),
         ("http://s2.test/", "http://a.test/"),
         ("http://s2.test/", "http://b.test/"),
         ("http://s2.test/", "http://b.test/"),   # dup edge collapses
         ("http://single.test/", "http://a.test/")] + hub_edges,
        columns=["src_url", "dst_url"])
    got = related_pages(ray.data.from_pandas(edges), max_out=5) \
        .to_pandas().sort_values(["url_a", "url_b"]).reset_index(drop=True)
    # kept sources: s1 (3 links), s2 (2); single (1) and hub (6) drop.
    # in-degrees over kept edges: a=2, b=2, c=1
    by_pair = {(r.url_a, r.url_b): (r.common, r.jaccard)
               for r in got.itertuples()}
    assert by_pair[("http://a.test/", "http://b.test/")] == (2, round(2 / 2, 6))
    assert by_pair[("http://a.test/", "http://c.test/")] == (1, round(1 / 2, 6))
    assert by_pair[("http://b.test/", "http://c.test/")] == (1, round(1 / 2, 6))
    assert len(got) == 3  # no hub-target pairs


def test_personalized_pagerank_localizes_to_seeds(ray_session):
    """PPR mass concentrates near the seed set: on two disconnected
    stars, seeding only star A leaves every star-B node at rank 0;
    ranks sum to 1; partition counts don't change the result."""
    import numpy as np
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.linkgraph import pagerank

    a_edges = [("http://a.test/", f"http://a{i}.test/") for i in range(4)]
    b_edges = [("http://b.test/", f"http://b{i}.test/") for i in range(4)]
    edges = pd.DataFrame(a_edges + b_edges,
                         columns=["src_url", "dst_url"])

    def seed_a(urls):
        return np.array([u == "http://a.test/" for u in urls])

    outs = []
    for parts in (1, 4):
        got = pagerank(ray.data.from_pandas(edges), iters=4,
                       personalize_pred=seed_a) \
            .to_pandas().sort_values("url").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    r = outs[0].set_index("url")["rank"]
    assert abs(r.sum() - 1.0) < 1e-4
    assert all(r[u] == 0.0 for u in r.index if u.startswith("http://b"))
    assert r["http://a.test/"] > 0.2          # teleport target
    assert all(r[f"http://a{i}.test/"] > 0 for i in range(4))
