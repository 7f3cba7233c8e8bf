"""Benchmark driver (round contract).

Default: run the headline fulltext pipeline (HTML -> extract -> dedup
-> segments -> merge -> BM25 queries) over a cached deterministic
fixture corpus, plus every `queries()` entry over `$GRAFT_SF_DIR`
(default /root/testdata/sf0.1), and print ONE JSON line.

`--scaling`: run the identical headline build in two fresh
subprocesses (num_cpus=8 and num_cpus=32) on the same input and report
docs/s at both plus scaling efficiency eff = thr(4N) / (4 * thr(N))
(the sandbox proxy for the N-vs-4N-node criterion in BASELINE.json).

This script OWNS its Ray session (ray.init/ray.shutdown); the library
never initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.environ.get("RSE_RAY_CACHE", "/tmp/rse_ray_cache")
CORPUS_ROWS = int(os.environ.get("RSE_BENCH_CORPUS_ROWS", "50000"))
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ray_init(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def _cpu_times() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — the host
    co-tenant signal. The sandbox VM shows steal BURSTS that poison
    whole 32-cpu reps; recording the per-rep steal fraction turns
    'the box was noisy' from narrative into data."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = list(map(int, parts))
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _mem_sample() -> dict:
    """Session memory snapshot, all from /proc — no extra deps:
    driver RSS, summed RSS of every Ray worker/raylet process, and
    /dev/shm usage (the plasma object store mmaps there on Linux).
    Recorded per bench query (round-4 VERDICT item 8) so a slow
    outlier is attributable from the JSON alone: a step change in
    rss_workers_mb or shm_mb right before an outlier names the
    culprit (resident actors / object-store pressure) without a
    rerun."""

    def rss_kb(pid: str) -> int:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return 0

    workers = 0
    nproc = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == os.getpid():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"ray::" in cmd or b"raylet" in cmd \
                or b"default_worker.py" in cmd:
            workers += rss_kb(pid)
            nproc += 1
    shm = shutil.disk_usage("/dev/shm")
    return {
        "rss_driver_mb": round(rss_kb(str(os.getpid())) / 1024, 1),
        "rss_workers_mb": round(workers / 1024, 1),
        "n_ray_procs": nproc,
        "shm_used_mb": round(shm.used / 1e6, 1),
    }


CORPUS_ROWS_PER_FILE = 50_000  # ~75 MB files: parquet metadata/listing
# cost at read planning is per-FILE driver time (measured 6.8 s for the
# 3.2M corpus at 2k rows/file vs <0.5 s at 50k rows/file)


def ensure_corpus(n_rows: int) -> str:
    """Deterministic fixture pages corpus, generated once and cached."""
    from rse_ray.sources.fixtures import generate_pages

    pages_dir = os.path.join(
        CACHE, f"bench_pages_{n_rows}_f{CORPUS_ROWS_PER_FILE}"
    )
    marker = os.path.join(pages_dir, "_DONE.json")
    if not os.path.exists(marker):
        shutil.rmtree(pages_dir, ignore_errors=True)
        meta = generate_pages(
            pages_dir,
            n_rows=n_rows,
            n_dup_pairs=max(10, n_rows // 100),
            seed=42,
            rows_per_file=CORPUS_ROWS_PER_FILE,
        )
        with open(marker, "w") as f:
            json.dump(meta, f)
    return pages_dir


def run_headline(num_cpus: int, n_rows: int) -> dict:
    """Fresh index build + BM25 latency. Requires an active Ray session."""
    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher
    from rse_ray.sources.fixtures import generate_queries

    pages_dir = ensure_corpus(n_rows)
    index_dir = os.path.join(CACHE, f"bench_index_{n_rows}_{num_cpus}_{os.getpid()}")
    shutil.rmtree(index_dir, ignore_errors=True)

    # spawn the worker pool before the clock starts: steady-state
    # throughput is the metric, not cluster cold-start
    import ray.data

    ray.data.range(10_000, override_num_blocks=64).map_batches(
        lambda b: b
    ).take_all()

    steal0, total0 = _cpu_times()
    t0 = time.perf_counter()
    # config derives only from the INPUT (never from num_cpus): the
    # N-vs-4N scaling criterion requires the identical job at both
    # parallelism levels. Buckets scale with corpus size so a bucket
    # stays ~6k docs (the cache-friendly write_segment regime).
    manifest = build_index(
        pages_dir,
        index_dir,
        BuildConfig(num_buckets=max(128, n_rows // 6250),
                    buckets_per_salt_group=64,
                    merge_partitions=max(64, n_rows // 50_000),
                    read_num_blocks=64,
                    stem=True, from_html=True),
    )
    build_s = time.perf_counter() - t0
    steal1, total1 = _cpu_times()
    steal_pct = round(
        100.0 * (steal1 - steal0) / max(1, total1 - total0), 2)
    n_docs = manifest["stats"]["num_docs"]

    searcher = Searcher(index_dir)
    queries = [q["query"] for q in generate_queries(60)]
    for q in queries[:5]:  # warm the term->shard readers
        searcher.search(q, k=10, mode="bmw")
    lat_taat, lat_bmw = [], []
    for q in queries:
        t = time.perf_counter()
        searcher.search(q, k=10, mode="taat")
        lat_taat.append(time.perf_counter() - t)
        t = time.perf_counter()
        searcher.search(q, k=10, mode="bmw")
        lat_bmw.append(time.perf_counter() - t)

    def p(v, q):
        return sorted(v)[min(len(v) - 1, int(q * len(v)))]

    # scatter-gather path (ST5): shard actors + sharded accumulators —
    # the fleet-scale query deployment, latency-measured alongside the
    # driver-side Searcher. Skipped for multi-million-doc corpora
    # inside --scaling reps: per-query slice shipping is seconds there
    # and would drown the build-scaling signal in query wall time.
    lat_dist = []
    if n_rows <= 500_000:
        from rse_ray.pipelines.search import DistributedSearcher

        dsearch = DistributedSearcher(index_dir, num_actors=4,
                                      accumulator_actors=4)
        dist_queries = queries[::3]  # 20-query sample: bounds bench time
        for q in dist_queries:  # full warm pass: slices become resident,
            dsearch.search(q, k=10)  # so the timed loop measures WARM latency
        for q in dist_queries:
            t = time.perf_counter()
            dsearch.search(q, k=10)
            lat_dist.append(time.perf_counter() - t)

    shutil.rmtree(index_dir, ignore_errors=True)
    return {
        "corpus_rows": n_rows,
        "num_docs": n_docs,
        "build_sec": round(build_s, 3),
        "steal_pct_during_build": steal_pct,
        "stage_seconds": manifest.get("stage_seconds", {}),
        "docs_per_sec": round(n_docs / build_s, 1),
        "bm25_p50_ms": round(p(lat_bmw, 0.50) * 1e3, 3),
        "bm25_p95_ms": round(p(lat_bmw, 0.95) * 1e3, 3),
        "bm25_taat_p95_ms": round(p(lat_taat, 0.95) * 1e3, 3),
        "bm25_mean_ms": round(statistics.mean(lat_bmw) * 1e3, 3),
        "bm25_dist_p50_ms": (round(p(lat_dist, 0.50) * 1e3, 3)
                             if lat_dist else None),
        "bm25_dist_p95_ms": (round(p(lat_dist, 0.95) * 1e3, 3)
                             if lat_dist else None),
    }


def run_queries(sf_dir: str) -> tuple[dict, dict]:
    """Time every `queries()` entry over sf_dir (one run each).
    Returns (times, mem): per-query seconds plus a post-query
    memory snapshot (_mem_sample). `RSE_BENCH_ONLY=a,b,...` (exact
    names) or `RSE_BENCH_UPTO=name` (run the dict-order prefix
    through `name`) restrict the set for outlier bisection."""
    import __ray_entry__ as entrymod

    only = {s for s in os.environ.get("RSE_BENCH_ONLY", "").split(",")
            if s}
    upto = os.environ.get("RSE_BENCH_UPTO", "")
    out, mem = {}, {"_start": _mem_sample()}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            _ = res.num_rows if hasattr(res, "num_rows") else len(res)
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep the bench alive; surface the failure
            out[name] = f"ERROR: {type(e).__name__}: {e}"
        mem[name] = _mem_sample()
        if upto and name == upto:
            break
    return out, mem


def main_default(num_cpus: int) -> None:
    _ray_init(num_cpus)
    headline = run_headline(num_cpus, CORPUS_ROWS)
    qtimes, qmem = run_queries(SF_DIR)
    sf = 0.1
    for tok in ("sf0.001", "sf0.01", "sf0.1", "sf1"):
        if tok in SF_DIR:
            sf = float(tok[2:])
    result = {
        "metric": "index_build_sec_50k_pages_plus_bm25_p95",
        "value": headline["build_sec"],
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "num_cpus": num_cpus,
        "headline": headline,
        "query_mem": qmem,
    }
    print(json.dumps(result))
    import ray

    ray.shutdown()


def main_headline_json(num_cpus: int, out_path: str) -> None:
    """Subprocess mode for --scaling: headline only, result to a file."""
    _ray_init(num_cpus)
    res = run_headline(num_cpus, CORPUS_ROWS)
    res["num_cpus"] = num_cpus
    with open(out_path, "w") as f:
        json.dump(res, f)
    import ray

    ray.shutdown()


def main_scaling() -> None:
    # scaling uses a larger corpus than the per-round default so the
    # parallel compute dominates the (fixed) shuffle/scheduling floor —
    # the honest strong-scaling regime the N-vs-4N criterion measures
    rows = int(os.environ.get("RSE_BENCH_SCALING_ROWS", "3200000"))
    # generate outside the timed subprocesses (Ray-parallel chunk tasks)
    _ray_init(DEFAULT_CPUS)
    ensure_corpus(rows)
    import ray

    ray.shutdown()
    # N reps per level (RSE_BENCH_SCALING_REPS, default 2), best taken
    # as the declared protocol: first-touch runs pay cold page cache +
    # writeback for the just-generated corpus (observed ~35% run-to-run
    # swing), which is filesystem noise, not scaling signal. Median is
    # reported alongside so the robust statistic is visible too.
    reps = int(os.environ.get("RSE_BENCH_SCALING_REPS", "2"))
    results = {}
    all_reps = {}
    for cpus in (8, 32):
        runs = []
        for rep in range(reps):
            # flush dirty pages from the PREVIOUS rep's segment/index
            # writes before the clock starts: one rep's deferred
            # writeback otherwise lands inside the next rep's timed
            # region (measured: 73% spread across 32-cpu reps at ZERO
            # cpu steal — all filesystem state)
            os.sync()
            time.sleep(2)
            out = os.path.join(CACHE, f"scaling_{cpus}_{rep}.json")
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            env["RSE_BENCH_CORPUS_ROWS"] = str(rows)
            subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--headline-json", out, "--cpus", str(cpus)],
                check=True, env=env, cwd=REPO,
            )
            with open(out) as f:
                runs.append(json.load(f))
        runs.sort(key=lambda g: g["build_sec"])
        results[cpus] = runs[0]
        all_reps[cpus] = [g["build_sec"] for g in runs]
        all_reps[f"steal_pct_{cpus}"] = [
            g.get("steal_pct_during_build") for g in runs]
    thr8 = results[8]["docs_per_sec"]
    thr32 = results[32]["docs_per_sec"]
    eff = thr32 / (4.0 * thr8)
    # median-of-reps efficiency (true median: even rep counts average the
    # middle pair rather than picking the worse of the two)
    med8 = statistics.median(all_reps[8])
    med32 = statistics.median(all_reps[32])
    eff_med = (rows / med32) / (4.0 * (rows / med8))
    out = {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 4),
        "unit": "ratio",
        # both headline statistics (round-3 VERDICT item 7): best-of
        # (the declared cold-cache protocol) AND median-of-reps (the
        # robust one); the round table in BASELINE.md reports both
        "eff_best": round(eff, 4),
        "eff_median": round(eff_med, 4),
        "reps": reps,
        "build_sec_reps": all_reps,
        "throughput_docs_per_sec": {"cpus_8": thr8, "cpus_32": thr32},
        "build_sec": {"cpus_8": results[8]["build_sec"],
                      "cpus_32": results[32]["build_sec"]},
        "bm25_p95_ms": {"cpus_8": results[8]["bm25_p95_ms"],
                        "cpus_32": results[32]["bm25_p95_ms"]},
        "corpus_rows": rows,
    }
    print(json.dumps(out))


def main_weak_scaling() -> None:
    """Weak-scaling pair (round-4 VERDICT item 6): the same job with
    DATA SCALED WITH CORES — 100k pages per cpu at both levels (800k
    @8 cpus, 3.2M @32) — validating that SCALE_PLAYBOOK.md's
    µs·core/doc cost constant holds as data grows with cores (the
    regime a fixed-size-cluster deployment actually runs in), rather
    than extrapolating it from strong-scaling runs alone. Perfect
    weak scaling = equal build_sec at both levels; the reported
    efficiency is t(8cpus,800k) / t(32cpus,3.2M)."""
    pairs = ((8, 800_000), (32, 3_200_000))
    reps = int(os.environ.get("RSE_BENCH_SCALING_REPS", "2"))
    _ray_init(DEFAULT_CPUS)
    for _, rows in pairs:
        ensure_corpus(rows)
    import ray

    ray.shutdown()
    results = {}
    for cpus, rows in pairs:
        runs = []
        for rep in range(reps):
            os.sync()
            time.sleep(2)
            out = os.path.join(CACHE, f"weak_{cpus}_{rep}.json")
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            env["RSE_BENCH_CORPUS_ROWS"] = str(rows)
            subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--headline-json", out, "--cpus", str(cpus)],
                check=True, env=env, cwd=REPO,
            )
            with open(out) as f:
                runs.append(json.load(f))
        runs.sort(key=lambda g: g["build_sec"])
        results[cpus] = {
            "rows": rows,
            "best": runs[0],
            "build_sec_reps": [g["build_sec"] for g in runs],
            "steal_pct_reps": [g.get("steal_pct_during_build")
                               for g in runs],
        }
    cost = {  # µs·core per document, the playbook constant
        cpus: round(cpus * r["best"]["build_sec"]
                    / max(1, r["best"]["num_docs"]) * 1e6, 2)
        for cpus, r in results.items()
    }
    eff = results[8]["best"]["build_sec"] \
        / results[32]["best"]["build_sec"]
    print(json.dumps({
        "metric": "weak_scaling_8x800k_to_32x3200k",
        "value": round(eff, 4),
        "unit": "ratio",
        "us_core_per_doc": cost,
        "cost_ratio_32_vs_8": round(cost[32] / cost[8], 4),
        "reps": reps,
        "levels": {str(c): {k: v for k, v in r.items()
                            if k != "best"} | {
            "build_sec": r["best"]["build_sec"],
            "docs_per_sec": r["best"]["docs_per_sec"],
            "num_docs": r["best"]["num_docs"]}
            for c, r in results.items()},
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--weak-scaling", action="store_true")
    ap.add_argument("--headline-json", default=None)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    args = ap.parse_args()
    if args.scaling:
        main_scaling()
    elif args.weak_scaling:
        main_weak_scaling()
    elif args.headline_json:
        main_headline_json(args.cpus, args.headline_json)
    else:
        main_default(args.cpus)
