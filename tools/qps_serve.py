"""Measure concurrent serving QPS for the HTTP face (round-4 VERDICT
item 4's evidence deliverable).

Builds (or reuses) the bench fixture index, starts ``make_server`` in
distributed mode (warm shard + accumulator actors), then drives it
with real HTTP clients at several concurrency levels over a fixed
query mix. Reports QPS + p50/p95 latency per level as one JSON line.
The speedup from 1 client to N clients is the lock-removal evidence:
before round 5 the serve face serialized every search on one lock, so
QPS was flat in client count by construction.

Run: python tools/qps_serve.py [--rows 50000] [--requests 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--requests", type=int, default=400)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")

    from bench import CACHE, ensure_corpus

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.serve import make_server
    from rse_ray.sources.fixtures import generate_queries

    pages_dir = ensure_corpus(args.rows)
    index_dir = os.path.join(CACHE, f"qps_index_{args.rows}")
    build_index(pages_dir, index_dir,
                BuildConfig(num_buckets=max(128, args.rows // 6250),
                            buckets_per_salt_group=64,
                            stem=True, from_html=True))

    httpd = make_server(index_dir, port=0, num_actors=4,
                        accumulators=4, warmup=512)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address[:2]
    base = f"http://{host}:{port}"

    queries = [q["query"] for q in generate_queries(60)]

    def fetch(q: str) -> float:
        t0 = time.perf_counter()
        with urllib.request.urlopen(
                f"{base}/search?q={urllib.parse.quote(q)}&k=10",
                timeout=60) as r:
            r.read()
        return time.perf_counter() - t0

    for q in queries:  # warm pass: slices become accumulator-resident
        fetch(q)

    def pct(v, q):
        return sorted(v)[min(len(v) - 1, int(q * len(v)))]

    levels = {}
    for nclients in (1, 2, 4, 8, 16):
        reqs = [queries[i % len(queries)] for i in range(args.requests)]
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=nclients) as ex:
            lats = list(ex.map(fetch, reqs))
        wall = time.perf_counter() - t0
        levels[nclients] = {
            "qps": round(len(reqs) / wall, 1),
            "p50_ms": round(pct(lats, 0.50) * 1e3, 2),
            "p95_ms": round(pct(lats, 0.95) * 1e3, 2),
        }
    httpd.shutdown()
    httpd.server_close()
    print(json.dumps({
        "metric": "serve_qps_by_concurrency",
        "corpus_rows": args.rows,
        "requests_per_level": args.requests,
        "num_actors": 4, "accumulators": 4,
        "levels": levels,
        "speedup_1_to_8": round(levels[8]["qps"] / levels[1]["qps"], 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
