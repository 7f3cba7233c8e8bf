"""Deterministic synthetic `pages` corpus + query set (FIXTURES.md).

Everything is seeded and wall-clock-free. The generator computes the
golden `text` column directly from the same strings it injects into the
HTML template, so ``extract(html) == text`` byte-for-byte is a real test
of the extractor, not a tautology (FIXTURES.md §1.3). Edge-case rows
cycle by ``row_idx % 20`` to pin the reference's extraction quirks
(crawler.go:246-324).

Tiers (FIXTURES.md §1): t1=500 rows / 10 dup pairs, t2=5,000 / 100,
bench=50,000 / 500. Duplicate-url rows share the url but have distinct
``warc_ts`` and distinct html; golden dedup keeps the max-``warc_ts``
row (upsert last-writer-wins, crawler.go:217-221).
"""

from __future__ import annotations

import os
import zlib
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = datetime(2024, 12, 1, 0, 0, 0)
_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_SUFFIXES = ("ing", "ed", "s", "ation", "ness")


def make_vocab(size: int = 10_000, seed: int = 42) -> list[str]:
    """Synthetic ASCII lowercase vocabulary; ~15% carry inflectional
    suffixes so Porter stemming is non-trivial (FIXTURES §1.1)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(26)
    words = []
    for k in range(size):
        n = k
        chars = []
        while True:
            chars.append(_LETTERS[perm[n % 19]])
            n //= 19
            if n == 0:
                break
        chars.append(_LETTERS[perm[(3 + 7 * k) % 26]])
        words.append("".join(chars))
    idx = rng.choice(size, size=int(0.15 * size), replace=False)
    for i in idx:
        words[i] += _SUFFIXES[i % len(_SUFFIXES)]
    return words


def _zipf_ranks(rng: np.random.default_rng, s: float, n_ranks: int, size: int) -> np.ndarray:
    """Draw `size` ranks in [0, n_ranks) from a (bounded) Zipf(s)."""
    w = 1.0 / np.power(np.arange(1, n_ranks + 1, dtype=np.float64), s)
    p = w / w.sum()
    return rng.choice(n_ranks, size=size, p=p)


def _body_tokens(rng, vocab, n_tokens: int) -> list[str]:
    ranks = _zipf_ranks(rng, 1.1, len(vocab), n_tokens)
    toks = [vocab[r] for r in ranks]
    # ~2% mixed-case tokens (tokenizer must lowercase them away)
    for i in rng.choice(n_tokens, size=max(1, n_tokens // 50), replace=False):
        toks[i] = toks[i].upper() if i % 2 else toks[i].capitalize()
    return toks


def _join_ws(rng, toks: list[str]) -> str:
    """Join tokens with mostly single spaces, ~2% tab/newline runs —
    all inside str.split()'s whitespace set (FIXTURES §1.1)."""
    if not toks:
        return ""
    seps = rng.choice([" ", " ", " ", " ", "\t", "\n"], size=len(toks) - 1,
                      p=[0.96, 0.01, 0.01, 0.0, 0.01, 0.01])
    out = [toks[0]]
    for sep, t in zip(seps, toks[1:]):
        out.append(str(sep))
        out.append(t)
    return "".join(out)


def _make_row(rng, vocab, hosts, row_idx: int, url: str):
    """Build one page: returns (html, text, golden_links)."""
    case = row_idx % 20

    title_toks = [vocab[r] for r in _zipf_ranks(rng, 1.1, len(vocab), int(rng.integers(3, 9)))]
    desc_toks = [vocab[r] for r in _zipf_ranks(rng, 1.1, len(vocab), int(rng.integers(0, 16)))]
    n_body = int(np.clip(np.exp(rng.normal(4.0, 0.7)), 20, 400))
    body_toks = _body_tokens(rng, vocab, n_body)

    title = " ".join(title_toks)
    desc = " ".join(desc_toks)

    # split body into 1-3 paragraphs
    n_paras = int(rng.integers(1, 4))
    cuts = sorted(rng.choice(max(1, len(body_toks) - 1), size=n_paras - 1, replace=False).tolist()) if n_paras > 1 else []
    paras = []
    prev = 0
    for c in cuts + [len(body_toks)]:
        seg = body_toks[prev:c]
        prev = c
        if seg:
            paras.append(_join_ws(rng, seg))
    body = " ".join(paras)

    # --- head per edge case ---
    head = []
    golden_title = title
    golden_desc = desc
    if case == 0:      # two titles -> first wins
        head.append(f"<title>{title}</title><title>ignored {title}</title>")
        head.append(f'<meta name="description" content="{desc}">')
    elif case == 1:    # empty first title -> second wins
        head.append(f"<title></title><title>{title}</title>")
        head.append(f'<meta name="description" content="{desc}">')
    elif case == 2:    # markup inside <title> is literal (RCDATA)
        golden_title = f"{title}<b>x</b>"
        head.append(f"<title>{golden_title}</title>")
        head.append(f'<meta name="description" content="{desc}">')
    elif case == 3:    # two metas -> LAST wins
        head.append(f"<title>{title}</title>")
        head.append('<meta name="description" content="overridden earlier">')
        head.append(f'<meta name="description" content="{desc}">')
    elif case == 4:    # uppercase name value still matches
        head.append(f"<title>{title}</title>")
        head.append(f'<meta name="DESCRIPTION" content="{desc}">')
    elif case == 5:    # missing title
        golden_title = ""
        head.append(f'<meta name="description" content="{desc}">')
    elif case == 6:    # missing meta
        golden_desc = ""
        head.append(f"<title>{title}</title>")
    elif case == 7:    # missing both
        golden_title = ""
        golden_desc = ""
    elif case == 14:   # title wider than the DDL's VARCHAR(256)
        golden_title = " ".join(
            vocab[(row_idx * 3 + j) % len(vocab)] for j in range(60))
        head.append(f"<title>{golden_title}</title>")
        head.append(f'<meta name="description" content="{desc}">')
    elif case == 15:   # description wider than VARCHAR(1024)
        golden_desc = " ".join(
            vocab[(row_idx * 5 + j) % len(vocab)] for j in range(220))
        head.append(f"<title>{title}</title>")
        head.append(f'<meta name="description" content="{golden_desc}">')
    else:
        head.append(f"<title>{title}</title>")
        head.append(f'<meta name="description" content="{desc}">')

    # --- links ---
    # anchor texts are FORMULA-based (row_idx/link-index arithmetic, no
    # rng draws) so adding them never perturbs the corpus rng stream;
    # anchors sit outside <p>, so golden `text` is untouched
    anchors = []
    golden_links = []
    golden_anchor_texts = []
    n_links = int(rng.integers(0, 5))
    targets = [
        f"https://site{int(rng.integers(0, len(hosts)))}.example/p/{int(rng.integers(0, 10_000))}"
        for _ in range(n_links)
    ]
    for j, t in enumerate(targets):
        atext = f"{vocab[(row_idx * 7 + j * 13) % len(vocab)]} l{j}"
        anchors.append(f'<a href="{t}">{atext}</a>')
        golden_links.append(t)
        golden_anchor_texts.append(atext)
    if case == 8:      # duplicate href attrs: first wins
        atext = f"{vocab[(row_idx * 7 + 91) % len(vocab)]} dup"
        anchors.append(f'<a href="{url}/first" href="{url}/second">{atext}</a>')
        golden_links.append(f"{url}/first")
        golden_anchor_texts.append(atext)
    elif case == 9:    # relative link resolves against page url
        atext = f"{vocab[(row_idx * 7 + 92) % len(vocab)]} rel"
        anchors.append(f'<a href="/x/y">{atext}</a>')
        scheme_host = url.split("/p/")[0]
        golden_links.append(f"{scheme_host}/x/y")
        golden_anchor_texts.append(atext)
    elif case == 10:   # ftp scheme dropped
        anchors.append('<a href="ftp://files.example/f">skip a</a>')
    elif case == 11:   # fragment-only dropped
        anchors.append('<a href="#frag">skip b</a>')
    elif case == 12:   # url with fragment dropped
        anchors.append('<a href="https://site0.example/p/1#frag">skip c</a>')
    elif case == 13:   # mailto dropped
        anchors.append('<a href="mailto:x@example.com">skip d</a>')

    html = (
        "<!DOCTYPE html><html><head>"
        + "".join(head)
        + "</head><body>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + "".join(anchors)
        + "</body></html>"
    )
    text = f"{golden_title}\n{golden_desc}\n{body}"
    return html, text, golden_links, golden_anchor_texts


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _all_urls(seed: int, n_rows: int, n_dup_pairs: int, n_hosts: int) -> list[str]:
    rng = np.random.default_rng(seed + 1)
    host_ranks = _zipf_ranks(rng, 1.2, n_hosts, n_rows)
    n_unique = n_rows - n_dup_pairs
    urls = [f"https://site{host_ranks[i]}.example/p/{i}" for i in range(n_unique)]
    # duplicate rows reuse early urls, get later timestamps + fresh html
    return urls + [urls[(i * 7) % n_unique] for i in range(n_dup_pairs)]


def _build_rows(urls_slice: list[str], start_idx: int, seed: int,
                vocab: list[str], hosts: list[int]):
    """Rows [start_idx, start_idx+len(urls_slice)) of the corpus. Each
    row's RNG is seeded by its global index, so any chunking of the row
    space yields byte-identical output (chunk-parallel == serial)."""
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    links = {"src_url": [], "dst_url": [], "anchor_text": []}
    for off, url in enumerate(urls_slice):
        i = start_idx + off
        row_rng = np.random.default_rng(seed * 1_000_003 + i)
        html, text, glinks, gatexts = _make_row(row_rng, vocab, hosts, i, url)
        rows["url"].append(url)
        rows["warc_ts"].append(EPOCH + timedelta(seconds=i))
        rows["html"].append(html.encode("utf-8"))
        rows["text"].append(text)
        h = zlib.crc32(url.encode()) % 100
        rows["lang"].append("en" if h < 95 else ("da" if h % 2 else "de"))
        for dst, atext in zip(glinks, gatexts):
            links["src_url"].append(url)
            links["dst_url"].append(dst)
            links["anchor_text"].append(atext)
    return pa.Table.from_pydict(rows, schema=PAGES_SCHEMA), links


def generate_pages(
    pages_dir: str,
    *,
    n_rows: int = 500,
    n_dup_pairs: int = 10,
    seed: int = 42,
    n_hosts: int = 50,
    vocab_size: int = 10_000,
    rows_per_file: int = 1000,
    golden_links_path: str | None = None,
    golden_anchors_path: str | None = None,
) -> dict:
    """Write the pages corpus as Parquet files under ``pages_dir``.
    Returns summary metadata. Deterministic for a given seed; when a
    Ray session is live the per-file chunks are generated as parallel
    Ray tasks (identical bytes either way — per-row seeding)."""
    os.makedirs(pages_dir, exist_ok=True)
    vocab = make_vocab(vocab_size, seed)
    hosts = list(range(n_hosts))
    all_urls = _all_urls(seed, n_rows, n_dup_pairs, n_hosts)
    n_files = max(1, (len(all_urls) + rows_per_file - 1) // rows_per_file)

    def chunk_args(f: int):
        lo = f * rows_per_file
        return all_urls[lo : lo + rows_per_file], lo

    def write_chunk(f: int, urls_slice, lo) -> dict:
        table, links = _build_rows(urls_slice, lo, seed, vocab, hosts)
        pq.write_table(table, os.path.join(pages_dir, f"pages_{f:05d}.parquet"),
                       row_group_size=1000)
        return links

    try:
        import ray

        use_ray = ray.is_initialized() and n_files > 4
    except ImportError:
        use_ray = False

    if use_ray:
        import ray

        remote_chunk = ray.remote(write_chunk)
        refs = [remote_chunk.remote(f, *chunk_args(f)) for f in range(n_files)]
        link_parts = ray.get(refs)
    else:
        link_parts = [write_chunk(f, *chunk_args(f)) for f in range(n_files)]

    links_rows = {
        "src_url": [u for p in link_parts for u in p["src_url"]],
        "dst_url": [u for p in link_parts for u in p["dst_url"]],
    }
    if golden_links_path:
        # schema stays (src_url, dst_url) — every link-graph twin
        # reads this file; anchors ship in their own parquet
        pq.write_table(pa.Table.from_pydict(links_rows), golden_links_path)
    if golden_anchors_path:
        pq.write_table(pa.Table.from_pydict({
            **links_rows,
            "anchor_text": [t for p in link_parts for t in p["anchor_text"]],
        }), golden_anchors_path)
    return {
        "n_rows": n_rows,
        "n_unique_urls": n_rows - n_dup_pairs,
        "n_files": n_files,
        "n_links": len(links_rows["src_url"]),
    }


def generate_queries(n: int = 60, seed: int = 42, vocab_size: int = 10_000) -> list[dict]:
    """Reference query set (FIXTURES §2): 20 single-term (head/tail),
    20 multi-term, 10 with repeated terms, 5 unknown-only, 5 mixed
    case/whitespace. Terms are drawn PRE-stemming from the vocab."""
    vocab = make_vocab(vocab_size, seed)
    rng = np.random.default_rng(seed + 2)
    queries: list[str] = []
    # 20 single-term: 10 head ranks, 10 tail ranks
    for r in range(10):
        queries.append(vocab[r])
    for r in rng.integers(2000, vocab_size, size=10):
        queries.append(vocab[int(r)])
    # 20 multi-term, 2-5 terms, mixed df
    for _ in range(20):
        k = int(rng.integers(2, 6))
        ranks = [int(x) for x in _zipf_ranks(rng, 1.05, vocab_size, k)]
        queries.append(" ".join(vocab[r] for r in ranks))
    # 10 with repeated terms (query tf > 1)
    for _ in range(10):
        r = int(_zipf_ranks(rng, 1.05, 3000, 1)[0])
        other = int(rng.integers(0, vocab_size))
        queries.append(f"{vocab[r]} {vocab[other]} {vocab[r]}")
    # 5 with unknown terms only
    for i in range(5):
        queries.append(f"zzqx{i}unknown zzqy{i}missing")
    # 5 mixed case + extra whitespace
    for _ in range(5):
        r1, r2 = int(rng.integers(0, 500)), int(rng.integers(0, vocab_size))
        queries.append(f"  {vocab[r1].upper()}\t {vocab[r2].capitalize()}  ")
    return [{"qid": i, "query": q} for i, q in enumerate(queries[:n])]


def generate_robots_fixture(out_dir: str) -> None:
    """Deterministic crawl-policy fixture for the robots_filter batch
    analog: urls.parquet (urls across four hosts, with query strings,
    bare-host paths, nested paths) + rules.parquet (host, prefix,
    allow) planting every precedence case — longest-prefix override
    (allow under a denied subtree), root-deny host, exact-length
    allow/deny tie (allow must win), and a rule-less host (default
    allow). Formula-based, no RNG."""
    import os

    import pyarrow.parquet as _pq

    # guard on the LAST artifact written, so a crash between writes
    # can't leave a permanently half-built fixture
    if os.path.exists(os.path.join(out_dir, "frontier_rules.parquet")):
        return
    rules = [
        # host a: deny /private/ subtree, re-allow /private/open
        ("a.example", "/private/", False),
        ("a.example", "/private/open", True),
        ("a.example", "/tmp", False),
        # exact-length tie: allow wins over deny
        ("a.example", "/dup", False),
        ("a.example", "/dup", True),
        # host b: root deny, /public re-allowed
        ("b.example", "/", False),
        ("b.example", "/public", True),
        # host d: root allow + a longer deny
        ("d.example", "/", True),
        ("d.example", "/admin", False),
    ]
    urls = []
    for host in ("a.example", "b.example", "c.example", "d.example"):
        urls += [
            f"https://{host}",                      # bare host -> path "/"
            f"https://{host}/",
            f"https://{host}/index.html?q=1&utm=x",
            f"https://{host}/private/x",
            f"https://{host}/private/open/doc",
            f"https://{host}/public/page",
            f"https://{host}/tmp/file",
            f"https://{host}/dup/zone",
            f"https://{host}/admin/panel",
            f"http://{host}/private/deep/nest?frag=1",
        ]
    os.makedirs(out_dir, exist_ok=True)
    from rse_ray.state.manifest import write_file_atomic

    rt = pa.table({
        "host": pa.array([r[0] for r in rules], type=pa.string()),
        "prefix": pa.array([r[1] for r in rules], type=pa.string()),
        "allow": pa.array([r[2] for r in rules], type=pa.bool_()),
    })
    ut = pa.table({"url": pa.array(urls, type=pa.string())})
    write_file_atomic(os.path.join(out_dir, "rules.parquet"),
                      lambda tmp: _pq.write_table(rt, tmp))
    write_file_atomic(os.path.join(out_dir, "urls.parquet"),
                      lambda tmp: _pq.write_table(ut, tmp))
    # crawl-policy rules over the linkgraph corpus's site{i}.example
    # hosts, for frontier_prep: every 5th site denies the /p/1 prefix
    # (i.e. /p/1, /p/1x, /p/1xx...), site3 denies everything except a
    # re-allowed /p/7 prefix
    frules = [(f"site{i}.example", "/p/1", False) for i in range(0, 50, 5)]
    frules += [("site3.example", "/", False), ("site3.example", "/p/7", True)]
    ft = pa.table({
        "host": pa.array([r[0] for r in frules], type=pa.string()),
        "prefix": pa.array([r[1] for r in frules], type=pa.string()),
        "allow": pa.array([r[2] for r in frules], type=pa.bool_()),
    })
    write_file_atomic(os.path.join(out_dir, "frontier_rules.parquet"),
                      lambda tmp: _pq.write_table(ft, tmp))


def generate_canonical_fixture(out_path: str) -> None:
    """Messy-URL fixture for canonical_urls: uppercase schemes/hosts,
    www. prefixes, default and non-default ports, trailing slashes,
    tracking params, reordered queries, fragments, bare hosts —
    including groups that canonicalize to the SAME string. Static
    list, byte-stable."""
    import os

    import pyarrow.parquet as _pq

    if os.path.exists(out_path):
        return
    urls = [
        "HTTP://WWW.Site.Example/Path/",
        "http://site.example/Path",
        "https://www.site.example:443/a/b/?utm_source=tw&q=1",
        "https://site.example/a/b?q=1",
        "https://site.example:8443/a/b?q=1",
        "http://site.example:80/",
        "http://site.example",
        "https://shop.example/p?b=2&a=1&fbclid=xyz",
        "https://shop.example/p?a=1&b=2",
        "https://shop.example/p?a=1&b=2&gclid=99&ref=home",
        "https://shop.example/p?referrer=keepme&a=1",
        "https://news.example/story//",
        "https://news.example/story#section",
        "https://news.example/story?",
        "https://news.example/story?utm_campaign=x&utm_medium=y",
        "https://api.example/v1?utm_",
        "https://api.example/v1?utm",
    ]
    # bulk rows so the op runs over more than a handful of strings
    for i in range(200):
        urls.append(f"https://bulk{i % 7}.example/item/{i}"
                    f"?utm_source=s{i}&id={i}&z={i % 3}")
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    from rse_ray.state.manifest import write_file_atomic

    write_file_atomic(out_path, lambda tmp: _pq.write_table(t, tmp))


def generate_core_graph(out_path: str, *, n_ring: int = 200) -> None:
    """Deterministic link graph with a PLANTED coreness spectrum (the
    `generate_graph` fixture is uniformly coreness-2, useless for
    k-core oracles): pendant chains (coreness 1) hang off a ring
    (coreness 2), a K5 clique (coreness 4) and a K8 clique (coreness
    7) attach by single bridges, plus self-loops / duplicate /
    reverse-duplicate edges that the simple-graph contract must
    ignore. Formula-based (no RNG), byte-stable."""
    import os

    import pyarrow.parquet as _pq

    if os.path.exists(out_path):
        return
    src, dst = [], []

    def add(a: int, b: int) -> None:
        src.append(f"https://c{a}.example/")
        dst.append(f"https://c{b}.example/")

    for i in range(n_ring):
        add(i, (i + 1) % n_ring)              # ring -> coreness 2
    for i in range(0, n_ring, 10):            # pendant chains -> coreness 1
        add(i, 1000 + i)
        add(1000 + i, 1001 + i)
        add(1001 + i, 1002 + i)
    for a in range(200, 205):                 # K5 -> coreness 4
        for b in range(a + 1, 205):
            add(a, b)
    add(200, 3)                               # bridge K5 -> ring
    for a in range(210, 218):                 # K8 -> coreness 7
        for b in range(a + 1, 218):
            add(a, b)
    add(210, 50)                              # bridge K8 -> ring
    add(211, 201)                             # bridge K8 -> K5
    # pathologies: self-loops, duplicate and reverse-duplicate edges
    add(7, 7)
    add(0, 1)
    add(1, 0)
    add(213, 213)
    t = pa.table({"src_url": pa.array(src, type=pa.string()),
                  "dst_url": pa.array(dst, type=pa.string())})
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    from rse_ray.state.manifest import write_file_atomic

    write_file_atomic(out_path, lambda tmp: _pq.write_table(t, tmp))


def generate_graph(out_path: str, *, n_nodes: int = 600) -> None:
    """Deterministic synthetic link graph with PLANTED structure the
    crawler corpus lacks: ring connectivity, triangle closers (every
    3rd node), mutual-link pairs (every 10th node), one 40-out-edge
    hub, self-loops and duplicate edges. Formula-based (no RNG), so
    the parquet is byte-stable across numpy versions. Exercises
    triangle_count / reciprocal_links / degree_distribution with
    non-empty results and every edge pathology at once."""
    import os

    import pyarrow.parquet as _pq

    if os.path.exists(out_path):
        return
    u = [f"https://g{i}.example/" for i in range(n_nodes)]
    src, dst = [], []

    def add(a: int, b: int) -> None:
        src.append(u[a % n_nodes])
        dst.append(u[b % n_nodes])

    for i in range(n_nodes):
        add(i, i + 1)                     # ring
        if i % 3 == 0:
            add(i, i + 2)                 # closes triangle (i, i+1, i+2)
        if i % 10 == 0:
            add(i, i + 7)                 # mutual pair ...
            add(i + 7, i)                 # ... both directions
        if i % 97 == 0:
            add(i, i)                     # self-loop (must be ignored)
        if i % 50 == 0:
            add(i, i + 1)                 # duplicate edge (must collapse)
    for k in range(1, 41):
        add(0, (13 * k) % n_nodes)        # hub with skewed out-degree
    t = pa.table({"src_url": pa.array(src, type=pa.string()),
                  "dst_url": pa.array(dst, type=pa.string())})
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # pid-unique tmp name: bench and tests share this cache path and
    # may race past the exists() check concurrently
    from rse_ray.state.manifest import write_file_atomic

    write_file_atomic(out_path, lambda tmp: _pq.write_table(t, tmp))


def generate_psl_fixture(out_path: str) -> None:
    """Host fixture for registrable_domains: plain TLDs, multi-label
    suffixes (co.uk vs uk — longest must win), wildcard (*.ck) with
    its exception (!www.ck), private-registry suffixes (github.io),
    unknown TLDs (implicit * rule), hosts that ARE public suffixes
    (-> null), and deep subdomains. Static list, byte-stable."""
    import os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    if os.path.exists(out_path):
        return
    hosts = [
        "example.com",
        "a.b.example.com",
        "Example.CO.UK",
        "sub.example.co.uk",
        "uk",
        "co.uk",
        "parliament.uk",
        "www.parliament.uk",
        "foo.github.io",
        "deep.foo.github.io",
        "github.io",
        "example.zz",
        "a.example.zz",
        "zz",
        "anything.ck",
        "www.anything.ck",
        "www.ck",
        "sub.www.ck",
        "ck",
        None,
    ]
    from rse_ray.state.manifest import write_file_atomic

    write_file_atomic(out_path, lambda tmp: _pq.write_table(
        _pa.table({"host": _pa.array(hosts, type=_pa.string())}), tmp))


def generate_scc_graph(out_path: str) -> None:
    """Deterministic DIRECTED graph with a planted SCC spectrum for
    the forward-backward coloring oracle (the crawl-graph fixture is
    one giant SCC — useless for SCC tests): twelve 4-cycles (SCCs of
    size 4) arranged in a shallow DAG (block 0 fans out to every
    other block; block 1 additionally feeds block 2, forcing a third
    peel round), ten pure-source nodes feeding block 0, ten
    pure-sink nodes fed from block 0 (singleton SCCs), one isolated
    self-loop node, plus duplicate edges the engine must tolerate.
    Formula-based (no RNG), byte-stable."""
    import os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    if os.path.exists(out_path):
        return
    src, dst = [], []

    def b(k: int, j: int) -> str:
        return f"https://scc.example/b{k:02d}/n{j}"

    def add(a: str, c: str) -> None:
        src.append(a)
        dst.append(c)

    for k in range(12):                     # 4-cycles: SCCs of size 4
        for j in range(4):
            add(b(k, j), b(k, (j + 1) % 4))
    for k in range(1, 12):                  # star DAG out of block 0
        add(b(0, 0), b(k, 0))
    add(b(1, 1), b(2, 1))                   # chain edge: 3rd peel round
    for i in range(10):                     # pure sources (singletons)
        add(f"https://scc.example/t{i}", b(0, 0))
    for i in range(10):                     # pure sinks (singletons)
        add(b(0, 1), f"https://scc.example/u{i}")
    add("https://scc.example/v-loop", "https://scc.example/v-loop")
    add(b(3, 0), b(3, 1))                   # duplicate edge
    add(b(0, 0), b(5, 0))                   # duplicate DAG edge

    from rse_ray.state.manifest import write_file_atomic

    write_file_atomic(out_path, lambda tmp: _pq.write_table(
        _pa.table({"src_url": _pa.array(src, type=_pa.string()),
                   "dst_url": _pa.array(dst, type=_pa.string())}), tmp))


def write_boilerplate_fixture(out_dir: str, *, n: int = 120,
                              n_dup: int = 8, seed: int = 17) -> dict:
    """Deterministic web-page corpus with PLANTED boilerplate for the
    main-content extraction operator (functions/maincontent.py):
    every page carries a nav bar (high link density), a short h1, a
    sidebar link list, a link-farm div (word-RICH but link-dense —
    the case word count alone cannot catch), content paragraphs (one
    with a low-density inline anchor), and a short footer. The LAST
    ``n_dup`` pages re-publish an earlier page's content paragraphs
    verbatim under their OWN url and their own fresh boilerplate —
    the syndicated-article case where exact dedup only fires AFTER
    boilerplate removal (the raw html differs on every page). Writes

        out_dir/pages.parquet       (url, html)
        out_dir/golden_main.parquet (url, main_text, n_kept)

    The golden main text is the planted content paragraphs BY
    CONSTRUCTION (the generator knows which blocks are content under
    the operator's published rules: >=10 words and link density
    <=0.4) — it never calls the extractor, so the oracle is not
    circular. Idempotent via a _DONE marker."""
    import json as _json

    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return _json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    vocab = make_vocab(4000, seed)
    rows = {"url": [], "html": []}
    golden = {"url": [], "main_text": [], "n_kept": []}
    paras_cache: dict[int, list[str]] = {}
    for i in range(n):
        rng = np.random.default_rng(seed * 999_983 + i)
        url = f"https://content{i % 7}.example/a/{i}"

        def words(k, tag=0):
            return " ".join(
                vocab[int(r)] for r in
                rng.integers(0, len(vocab), size=k))

        nav = "".join(
            f'<a href="/n/{j}">{words(int(rng.integers(1, 3)))}</a> '
            for j in range(int(rng.integers(4, 9))))
        h1 = words(int(rng.integers(2, 6)))
        sidebar = "".join(
            f'<li><a href="/s/{j}">{words(2)}</a></li>'
            for j in range(int(rng.integers(3, 7))))
        farm = " ".join(
            f'<a href="/f/{j}">{words(2)}</a>'
            for j in range(15))
        if i >= n - n_dup and (i - n_dup) in paras_cache:
            # syndicated copy: earlier page's content verbatim, own
            # fresh boilerplate (nav/h1/sidebar/farm above consumed
            # this page's rng, so every copy's RAW html is unique)
            paras = list(paras_cache[i - n_dup])
        else:
            paras = []
            for _p in range(int(rng.integers(2, 5))):
                paras.append(words(int(rng.integers(12, 40))))
            # one paragraph gets a low-density inline anchor: the
            # anchor text IS content (stays in the golden text)
            a_txt = words(2)
            head_txt = words(14)
            paras.append(f"{head_txt} {a_txt} tail")
        paras_cache[i] = paras
        # re-split the inline-anchor paragraph for the html form
        last_words = paras[-1].split()
        inline = (" ".join(last_words[:-3])
                  + f' <a href="/x/{i}">'
                  + " ".join(last_words[-3:-1]) + "</a> "
                  + last_words[-1])
        footer = f"copyright site{i % 7} 2024 all rights reserved"
        html = (
            "<!DOCTYPE html><html><head><title>"
            + h1 + "</title><style>p{color:#000}</style></head><body>"
            + f"<header><nav>{nav}</nav></header>"
            + f"<h1>{h1}</h1>"
            + f'<div class="side"><ul>{sidebar}</ul></div>'
            + "<article>"
            + "".join(f"<p>{p}</p>" for p in paras[:-1])
            + f"<p>{inline}</p>"
            + "</article>"
            + f'<div class="links">{farm}</div>'
            + f"<footer>{footer}</footer>"
            + "</body></html>"
        )
        rows["url"].append(url)
        rows["html"].append(html.encode("utf-8"))
        golden["url"].append(url)
        golden["main_text"].append("\n".join(paras))
        golden["n_kept"].append(len(paras))
    pq.write_table(
        pa.table({"url": pa.array(rows["url"], type=pa.string()),
                  "html": pa.array(rows["html"], type=pa.binary())}),
        os.path.join(out_dir, "pages.parquet"))
    pq.write_table(
        pa.table({"url": pa.array(golden["url"], type=pa.string()),
                  "main_text": pa.array(golden["main_text"],
                                        type=pa.string()),
                  "n_kept": pa.array(golden["n_kept"],
                                     type=pa.int64())}),
        os.path.join(out_dir, "golden_main.parquet"))
    meta = {"n": n, "seed": seed, "dir": out_dir}
    with open(marker, "w") as f:
        _json.dump(meta, f)
    return meta
