"""Job-submit entry point: ``python -m rse_ray <build|refresh|search>``.

This is the CLI surface SURVEY §3.3 promises for the north rule's
``ray job submit`` deployment (the reference's kubectl+seed bootstrap,
crawler/README.md:1-25, becomes one submitted batch job):

    ray job submit --working-dir . -- \
        python -m rse_ray build --input /data/pages --index-dir /data/index

Re-submitting the SAME build command resumes from the per-partition
checkpoints (docs/segments/shards manifests) — a crashed or preempted
job continues mid-build, which IS the north rule's resume contract.

Ray session ownership: under ``ray job submit`` the job runtime
pre-sets RAY_ADDRESS and this process must ray.init() to attach;
standalone it initializes a local session. Either way the guarded init
below owns the session only when IT created one (the driver/test
harness imports library modules, never this file)."""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    """Attach to (or start) a Ray session; returns True if we own it."""
    import ray

    if ray.is_initialized():
        return False
    ray.init(include_dashboard=False, logging_level="ERROR")
    return True


def _cfg_from_args(args):
    """One BuildConfig constructor for build AND refresh — a new flag
    added to _add_build_args is threaded through exactly once."""
    from rse_ray.pipelines.build import BuildConfig

    return BuildConfig(
        num_buckets=args.num_buckets,
        buckets_per_salt_group=args.buckets_per_salt_group,
        merge_partitions=args.merge_partitions,
        stem=not args.no_stem,
        from_html=not args.from_text,
        read_num_blocks=args.read_num_blocks,
    )


def _cmd_build(args) -> dict:
    from rse_ray.pipelines.build import build_index

    return build_index(args.input, args.index_dir, _cfg_from_args(args))


def _cmd_refresh(args) -> dict:
    from rse_ray.pipelines.build import refresh_index

    return refresh_index(args.input, args.index_dir, _cfg_from_args(args))


def _cmd_search(args) -> dict:
    hits_with_urls = []
    if args.distributed:
        from rse_ray.pipelines.search import DistributedSearcher

        s = DistributedSearcher(args.index_dir,
                                num_actors=args.num_actors,
                                accumulator_actors=args.accumulators)
        if args.warmup:
            s.warmup(top_n=args.warmup)
        hits = s.search(args.query, k=args.k)
    else:
        from rse_ray.pipelines.search import Searcher

        s = Searcher(args.index_dir)
        hits = s.search(args.query, k=args.k,
                        mode="bmw" if args.bmw else "taat")
    from rse_ray.pipelines.search import hydrate_urls

    for did, score, url in hydrate_urls(args.index_dir, hits):
        hits_with_urls.append(
            {"doc_id": did, "score": round(score, 6), "url": url}
        )
    return {"query": args.query, "k": args.k, "hits": hits_with_urls}


def _cmd_compact(args) -> dict:
    from rse_ray.pipelines.build import compact_index

    return compact_index(args.index_dir, _cfg_from_args(args))


def _cmd_delete(args) -> dict:
    from rse_ray.pipelines.search import delete_urls

    n = delete_urls(args.index_dir, args.url)
    return {"index_dir": args.index_dir, "tombstoned": n}


def _cmd_serve(args) -> dict:
    from rse_ray.serve import serve

    serve(args.index_dir, host=args.host, port=args.port,
          num_actors=args.num_actors, accumulators=args.accumulators,
          warmup=args.warmup, driver=args.driver)
    return {"stopped": True}


def _add_build_args(p: argparse.ArgumentParser,
                    with_input: bool = True) -> None:
    if with_input:
        p.add_argument(
            "--input", required=True,
            help="parquet path/dir of pages (url, warc_ts, html|text)")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--num-buckets", type=int, default=128,
                   help="doc partitions; scale ~rows/6250 (BASELINE.md)")
    p.add_argument("--buckets-per-salt-group", type=int, default=64)
    p.add_argument("--merge-partitions", type=int, default=64)
    p.add_argument("--read-num-blocks", type=int, default=None)
    p.add_argument("--no-stem", action="store_true")
    p.add_argument("--from-text", action="store_true",
                   help="trust the pre-extracted text column (skip HTML)")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m rse_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    _add_build_args(b)
    b.set_defaults(fn=_cmd_build)

    r = sub.add_parser("refresh",
                       help="incremental re-index of newer captures")
    _add_build_args(r)
    r.set_defaults(fn=_cmd_refresh)

    s = sub.add_parser("search", help="BM25 top-k against a built index")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--bmw", action="store_true",
                   help="block-max WAND instead of TAAT (driver path)")
    s.add_argument("--distributed", action="store_true",
                   help="actor-sharded scatter-gather path")
    s.add_argument("--num-actors", type=int, default=4)
    s.add_argument("--accumulators", type=int, default=4)
    s.add_argument("--warmup", type=int, default=0, metavar="TOP_N",
                   help="prefetch the TOP_N highest-df terms before querying")
    s.set_defaults(fn=_cmd_search)

    dl = sub.add_parser(
        "delete", help="tombstone urls (masked at query time; run "
        "compact to expunge)")
    dl.add_argument("--index-dir", required=True)
    dl.add_argument("--url", action="append", required=True,
                    help="repeatable")
    dl.set_defaults(fn=_cmd_delete)

    c = sub.add_parser(
        "compact", help="expunge tombstones: incremental re-index of "
        "only the affected buckets (cfg flags must match the build)")
    _add_build_args(c, with_input=False)
    c.set_defaults(fn=_cmd_compact)

    v = sub.add_parser(
        "serve", help="HTTP GET /search?q= over a warm searcher "
        "(the reference's api/main.go face)")
    v.add_argument("--index-dir", required=True)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8080)
    v.add_argument("--num-actors", type=int, default=4)
    v.add_argument("--accumulators", type=int, default=0)
    v.add_argument("--warmup", type=int, default=0, metavar="TOP_N")
    v.add_argument("--driver", action="store_true",
                   help="one in-process Searcher instead of the "
                   "actor pool")
    v.set_defaults(fn=_cmd_serve)

    args = ap.parse_args(argv)
    owns = _ray_session()
    try:
        out = args.fn(args)
        print(json.dumps(out))
        return 0
    finally:
        if owns:
            import ray

            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
