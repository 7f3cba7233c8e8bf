"""E2E for the HTTP serving face (round-3 VERDICT item 5): the
reference's long-lived ``GET /search`` engine (api/main.go:228-241)
rebuilt as a ThreadingHTTPServer over a warm searcher. The server's
JSON rows must equal (a) the warm DistributedSearcher pool's own
results over the fixture index, and (b) the oracled ``bm25_topk``
table (bm25_documents, DuckDB-hash-green) over the sf0.001 documents
corpus."""

import json
import threading
import urllib.request

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
QUERY = "spark window merge window"  # the bm25_topk driver query


@pytest.fixture(scope="module")
def built_index(ray_session, fixture_pages, tmp_path_factory):
    from rse_ray.pipelines.build import BuildConfig, build_index

    index_dir = str(tmp_path_factory.mktemp("serve_index"))
    manifest = build_index(
        fixture_pages["pages_dir"], index_dir,
        BuildConfig(num_buckets=16, buckets_per_salt_group=4))
    return {"index_dir": index_dir, "manifest": manifest}


@pytest.fixture()
def http_server():
    """Start/stop a make_server instance on an ephemeral port."""
    servers = []

    def start(index_dir, **kw):
        from rse_ray.serve import make_server

        httpd = make_server(index_dir, port=0, **kw)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        servers.append((httpd, t))
        host, port = httpd.server_address[:2]
        return f"http://{host}:{port}"

    yield start
    for httpd, t in servers:
        httpd.shutdown()
        httpd.server_close()
        t.join(timeout=5)


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read().decode("utf-8"))


def test_serve_matches_distributed_pool(ray_session, built_index,
                                        http_server):
    """HTTP rows == the warm actor pool's own scatter-gather answer
    (transport adds/loses nothing), and /healthz reports the index."""
    from rse_ray.pipelines.search import DistributedSearcher, \
        hydrate_urls

    base = http_server(built_index["index_dir"], num_actors=2,
                       accumulators=2, warmup=32)
    st, health = _get(f"{base}/healthz")
    assert st == 200 and health["status"] == "ok"
    assert health["num_docs"] == built_index["manifest"]["stats"][
        "num_docs"]

    ds = DistributedSearcher(built_index["index_dir"], num_actors=2,
                             accumulator_actors=2)
    for q in ("google example", "the quick brown", "zebra"):
        st, got = _get(f"{base}/search?q={q.replace(' ', '+')}&k=7")
        assert st == 200 and got["k"] == 7
        want = [{"doc_id": int(d), "score": round(float(s), 6),
                 "url": u}
                for d, s, u in hydrate_urls(
                    built_index["index_dir"], ds.search(q, k=7))]
        assert got["hits"] == want


def test_serve_equals_bm25_topk_oracle(ray_session, http_server):
    """Over the sf0.001 documents corpus, the HTTP response recovers
    EXACTLY the oracled bm25_topk table: table doc_id comes back as
    the doc:// url suffix, scores match at the oracle's 6-dp
    rounding."""
    from rse_ray.pipelines.docsearch import bm25_documents, \
        documents_index

    idx = documents_index(SF, stem=False)
    base = http_server(idx, driver=True)
    st, got = _get(f"{base}/search?q={QUERY.replace(' ', '+')}&k=20")
    assert st == 200
    via_http = pd.DataFrame(
        {"doc_id": pd.array(
            [int(h["url"][len("doc://"):]) for h in got["hits"]],
            dtype="int64"),
         "score": pd.array([h["score"] for h in got["hits"]],
                           dtype="float64")})
    oracle = bm25_documents(SF, QUERY, k=20).reset_index(drop=True)
    pd.testing.assert_frame_equal(via_http, oracle[["doc_id",
                                                    "score"]])
    assert len(via_http) == 20


def test_serve_concurrent_requests(ray_session, http_server):
    """Parallel clients against the threaded server: every response
    must equal the single-threaded answer for its own query (the
    search lock serializes the shared searcher without cross-wiring
    responses)."""
    from concurrent.futures import ThreadPoolExecutor

    from rse_ray.pipelines.docsearch import documents_index

    base = http_server(documents_index(SF, stem=False), driver=True)
    queries = ["spark window", "merge", "window spark merge",
               "zebra", "spark"] * 4

    def fetch(q):
        st, got = _get(f"{base}/search?q={q.replace(' ', '+')}&k=5")
        assert st == 200
        return q, got["hits"]

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(fetch, queries))
    solo = {q: _get(f"{base}/search?q={q.replace(' ', '+')}&k=5")[1]
            ["hits"] for q in set(queries)}
    for q, hits in results:
        assert hits == solo[q], q


def test_url_hydrator_equals_hydrate_urls_and_caches(ray_session,
                                                     built_index):
    """The serve face's warm UrlHydrator returns exactly
    hydrate_urls' rows, and the second pass over the same buckets
    touches NO parquet file (LRU hit)."""
    from unittest import mock

    from rse_ray.pipelines.search import (Searcher, UrlHydrator,
                                          hydrate_urls)

    from rse_ray.sources.fixtures import generate_queries

    idx = built_index["index_dir"]
    s = Searcher(idx)
    hits = []
    for q in generate_queries(10):
        hits = s.search(q["query"], k=15)
        if hits:
            break
    assert hits
    h = UrlHydrator(idx, max_buckets=32)  # >= fixture bucket count
    expected = hydrate_urls(idx, hits)
    assert h(hits) == expected
    import rse_ray.pipelines.search as search_mod

    with mock.patch.object(search_mod.pq, "read_table",
                           side_effect=AssertionError(
                               "cache miss on warm bucket")):
        assert h(hits) == expected  # second pass: zero parquet reads
    # LRU eviction: capacity 0 buckets is rejected implicitly by
    # always caching at least the current bucket; capacity 1 still
    # answers correctly across buckets
    h1 = UrlHydrator(idx, max_buckets=1)
    assert h1(hits) == hydrate_urls(idx, hits)


def test_serve_distributed_concurrent_inflight(ray_session,
                                               built_index):
    """Round-4 VERDICT item 4: distributed mode holds MORE THAN ONE
    search in flight at once (no global serve lock), and concurrent
    answers equal the sequential ones. The searcher's search() is
    wrapped with a 2-party barrier the first two requests must meet
    INSIDE the search body — if a lock serialized them, the first
    could never be joined by the second and the barrier would break —
    plus an in-flight high-water counter."""
    from concurrent.futures import ThreadPoolExecutor

    from rse_ray.serve import make_server

    httpd = make_server(built_index["index_dir"], port=0,
                        num_actors=2, accumulators=2, warmup=16)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        real = httpd.rse_searcher.search
        gate = threading.Barrier(2, timeout=20)
        state = {"in": 0, "max": 0, "calls": 0}
        slock = threading.Lock()

        def wrapped(query, k=10):
            with slock:
                state["in"] += 1
                state["calls"] += 1
                state["max"] = max(state["max"], state["in"])
                nth = state["calls"]
            try:
                if nth <= 2:
                    try:
                        gate.wait()
                    except threading.BrokenBarrierError:
                        pass
                return real(query, k=k)
            finally:
                with slock:
                    state["in"] -= 1

        httpd.rse_searcher.search = wrapped
        queries = ["google example", "the quick brown", "zebra",
                   "example", "quick zebra", "brown google"]

        def fetch(q):
            st, got = _get(f"{base}/search?q={q.replace(' ', '+')}&k=5")
            assert st == 200
            return q, got["hits"]

        with ThreadPoolExecutor(max_workers=6) as ex:
            results = dict(ex.map(fetch, queries))
        assert state["max"] >= 2, \
            f"searches serialized (max in-flight {state['max']})"

        httpd.rse_searcher.search = real  # sequential reference pass
        for q in queries:
            _, got = _get(f"{base}/search?q={q.replace(' ', '+')}&k=5")
            assert results[q] == got["hits"], q
    finally:
        httpd.shutdown()
        httpd.server_close()
        t.join(timeout=5)


def test_serve_error_contract(ray_session, http_server):
    """400 on missing q, 404 off-route, k clamped to >= 1."""
    from urllib.error import HTTPError

    from rse_ray.pipelines.docsearch import documents_index

    base = http_server(documents_index(SF, stem=False), driver=True)
    for path, code in (("/search", 400), ("/search?q=", 400),
                       ("/nope", 404), ("/search?q=a&k=zzz", 400)):
        try:
            st, _ = _get(base + path)
        except HTTPError as e:
            st = e.code
        assert st == code, path
    st, got = _get(f"{base}/search?q=window&k=-5")
    assert st == 200 and got["k"] == 1 and len(got["hits"]) <= 1
