"""HTTP query-serving face over a warm searcher.

The reference serves ``GET /search`` from a long-lived engine process
(reference ``crawler/src/api/main.go:228-241``, mux route at :236);
the batch engine's analog is this stdlib ``ThreadingHTTPServer`` front
over a warm searcher: the index shards stay resident between requests
(in the ``DistributedSearcher`` actor pool, or one in-process
``Searcher`` with ``driver=True``), and the HTTP layer only routes
terms and serializes hits — no per-request index open, no Ray session
churn.

Endpoints (JSON responses):

  GET /search?q=<query>[&k=<int>]
      -> {"query": str, "k": int,
          "hits": [{"doc_id": int, "score": float, "url": str}, ...]}
      The hits carry the SAME row contract as ``python -m rse_ray
      search`` (and therefore the ``bm25_topk`` pipeline: table ids
      recover as ``int(url[len("doc://"):])`` for corpora indexed via
      ``documents_index``). 400 on a missing/empty ``q``.

  GET /healthz
      -> {"status": "ok", "num_docs": N, "distributed": bool}

Concurrency: requests are served on threads, and in the default
distributed mode searches run CONCURRENTLY — ``DistributedSearcher``
is thread-safe (its residency bookkeeping snapshots/updates under an
internal lock; the scatter-gather ray.gets overlap across requests,
and the actors serialize per-call like the Go server's handler
goroutines against a shared engine, ``api/main.go:236-240``). Only
``--driver`` mode serializes on a lock: the in-process ``Searcher``'s
``IndexReader`` LRU caches are not thread-safe, and that mode exists
for single-box debugging, not throughput. Scale path beyond one
process: run several server processes over the same read-only index
dir behind any TCP balancer; the index files are immutable segments,
so replicas share nothing.

Run:  python -m rse_ray serve --index-dir IDX [--host H] [--port P]
          [--num-actors N] [--accumulators R] [--warmup TOP_N]
          [--driver]
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def make_server(index_dir: str, *, host: str = "127.0.0.1",
                port: int = 0, num_actors: int = 4,
                accumulators: int = 0, warmup: int = 0,
                driver: bool = False,
                max_k: int = 1000) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; the searcher warms up
    here, so ``serve_forever()`` answers its first request hot.
    ``port=0`` binds an ephemeral port (tests); read it back from
    ``server.server_address[1]``."""
    from rse_ray.pipelines.search import UrlHydrator
    from rse_ray.state.manifest import read_json

    hydrate = UrlHydrator(index_dir)  # warm bucket docmap LRU

    if driver:
        from rse_ray.pipelines.search import Searcher

        searcher = Searcher(index_dir)
    else:
        from rse_ray.pipelines.search import DistributedSearcher

        searcher = DistributedSearcher(
            index_dir, num_actors=num_actors,
            accumulator_actors=accumulators)
        if warmup:
            searcher.warmup(top_n=warmup)
    stats = read_json(os.path.join(index_dir, "stats.json")) or {}
    # driver mode only: the in-process IndexReader's LRU caches are
    # not thread-safe. Distributed mode searches concurrently — the
    # DistributedSearcher locks its own residency bookkeeping.
    lock = threading.Lock() if driver else None

    class Handler(BaseHTTPRequestHandler):
        server_version = "rse_ray-serve/1.0"

        def log_message(self, fmt, *args):  # no stderr chatter
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (BaseHTTPRequestHandler API)
            u = urlparse(self.path)
            if u.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "num_docs": int(stats.get("num_docs", 0)),
                    "distributed": not driver})
                return
            if u.path != "/search":
                self._json(404, {"error": "not found",
                                 "routes": ["/search", "/healthz"]})
                return
            qs = parse_qs(u.query)
            query = (qs.get("q") or [""])[0].strip()
            if not query:
                self._json(400, {"error": "missing query param q"})
                return
            try:
                k = int((qs.get("k") or ["10"])[0])
            except ValueError:
                self._json(400, {"error": "k must be an int"})
                return
            k = max(1, min(k, max_k))
            if lock is not None:
                with lock:
                    hits = searcher.search(query, k=k)
            else:
                hits = searcher.search(query, k=k)
            rows = [{"doc_id": int(d), "score": round(float(s), 6),
                     "url": url}
                    for d, s, url in hydrate(hits)]
            self._json(200, {"query": query, "k": k, "hits": rows})

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.rse_searcher = searcher  # tests / callers may reuse it
    return httpd


def serve(index_dir: str, **kwargs) -> None:
    """Blocking entry: build the server, print one JSON status line
    (machine-parseable address), serve until interrupted."""
    httpd = make_server(index_dir, **kwargs)
    host, port = httpd.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "index_dir": index_dir}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
