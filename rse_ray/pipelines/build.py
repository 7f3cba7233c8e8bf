"""The inverted-index build pipeline (north_star core).

Reference lifecycle being re-expressed (SURVEY §3.1): the crawler's
fetch -> extractMetadata -> upsert -> keyword intent becomes a bounded
batch pipeline; Redis/Postgres shared state becomes two explicit
shuffles plus durable per-partition checkpoints.

    Stage A (fused):     read pages -> extract -> bucket -> dedup+docIDs
                         + per-bucket tokenize + posting-run encode, all
                         in one reduce task wave
                         -> docs/bucket_*.parquet + segments/bucket_*
                            .parquet  [two checkpoints per bucket]
    Stage B (sweep):     segments for buckets the fused stage missed
                         (resume over pre-fusion layouts; usually no-op)
    Stage C (merge):     groupby(range part) over compressed runs;
                         reducers splice runs bytewise and write their
                         own shards/part_*.parquet  [per-part manifest]
    Stage D (stats):     N / avgdl / term & byte metrics from manifests
                         -> stats.json, _MANIFEST.json

Resume: every stage skips partitions whose manifest is ``done`` (writes
are atomic tmp+rename, so a killed run leaves only complete
partitions); stage C resumes per range-part. All outputs are
content-determined (docIDs from crc32+sort, merge boundaries from
hash-sampled terms), so a resumed or differently-parallel build yields
the identical logical index (tests/test_determinism_resume.py).

Scale: 10^12 docs -> num_buckets ~ 1e5..1e6 so a bucket is a few GB;
locally the default is small. Only compressed posting runs cross the
term shuffle. The docs checkpoint doubles as the docmap (doc_id -> url)
used to hydrate search results.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from rse_ray.stages.fulltext import (
    DocBucketWriter,
    ShardPartWriter,
    extract_batch,
    make_add_bucket,
    make_add_range_part,
    make_add_salt,
    sample_terms,
    segment_rows_batch_fn,
    segment_write_batch_fn,
    term_range_boundaries,
)
from rse_ray.state.manifest import (
    PartitionManifests,
    read_json,
    write_json_atomic,
)


@dataclass
class BuildConfig:
    num_buckets: int = 32
    buckets_per_salt_group: int = 8
    merge_partitions: int = 32   # merge-shuffle reducers; fixed by config
    stem: bool = True
    from_html: bool = True       # False: trust the pre-extracted `text` column
    extract_batch_size: int = 256
    read_num_blocks: int | None = None  # fixed read fan-out (NOT cpu-derived)
    # build segments inside the dedup reduce task (saves a stage at
    # small scale, but couples the CPU-heavy tokenize to the shuffle's
    # block-limited reduce parallelism — off by default so stage B
    # scales as a free task pool)
    fuse_segments: bool = False
    segment_concurrency: int | None = None   # kept for API-compat (unused)
    # fresh builds hand stage B's segment term rows to the merge
    # IN-MEMORY (object store) instead of re-listing + re-reading the
    # segment parquet; checkpoints are still written. False forces the
    # file-based handoff even for fresh builds.
    chain_stages: bool = True
    # merge exchange: "direct" slices every map block for every reducer
    # using the manifest-carried range boundaries (M x R raw-task
    # exchange, no boundary sampling / global sort); "sort" is the
    # legacy Ray repartition + sort-groupby path. Outputs are
    # byte-identical (merge_partition fully re-sorts each part).
    merge_exchange: str = "direct"
    # CPU slots requested per merge split/write task: a RESOURCE hint,
    # not job shape (outputs are grouping-invariant) — raising it
    # throttles how many merge tasks touch the disk/object store at
    # once on high-CPU single-disk boxes (stage-profiled: 32
    # concurrent readers ran C SLOWER than 8)
    merge_task_cpus: int = 1
    # carry token positions in the postings (pospayload column): the
    # positional index that serves phrase / proximity queries. Off by
    # default — default builds stay byte-identical to pre-positional.
    positions: bool = False
    extra: dict = field(default_factory=dict)


def _bucketed_pages(pages_path, cfg: BuildConfig):
    """pages source -> (url, warc_ts, text, bucket) dataset: the shared
    stage-A front half (pruned read, html extract, bucket key)."""
    import ray.data

    cols = (["url", "warc_ts", "html"] if cfg.from_html
            else ["url", "warc_ts", "text"])
    if isinstance(pages_path, (str, list)):
        ds = ray.data.read_parquet(pages_path, columns=cols,
                                   override_num_blocks=cfg.read_num_blocks)
    else:
        ds = pages_path.select_columns(cols)
    if cfg.from_html:
        ds = ds.map_batches(
            extract_batch,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            zero_copy_batch=True,
        )
    return ds.map_batches(
        make_add_bucket(cfg.num_buckets), batch_format="pyarrow"
    )


def _dirs(index_dir: str) -> dict:
    return {
        "docs": os.path.join(index_dir, "docs"),
        "segments": os.path.join(index_dir, "segments"),
        "shards": os.path.join(index_dir, "shards"),
        "stats": os.path.join(index_dir, "stats.json"),
        "manifest": os.path.join(index_dir, "_MANIFEST.json"),
    }


def build_index(
    pages_path,
    index_dir: str,
    cfg: BuildConfig | None = None,
) -> dict:
    """Build (or resume) the full index. ``pages_path`` is a parquet
    path / list of paths, or an already-constructed ``ray.data.Dataset``
    with columns (url, warc_ts, html|text). Returns the build manifest."""
    import ray
    import ray.data

    cfg = cfg or BuildConfig()
    d = _dirs(index_dir)
    existing = read_json(d["manifest"])
    if existing and existing.get("status") == "done":
        return existing

    t0 = time.perf_counter()
    stage_secs: dict[str, float] = {}

    # ---- Stage A: pages -> per-bucket deduped docs ------------------------
    docs_manifests = PartitionManifests(d["docs"])
    seg_manifests = PartitionManifests(d["segments"])
    stage_a = read_json(os.path.join(d["docs"], "_STAGE.json"))
    if not (stage_a and stage_a.get("status") == "done"):
        ds = _bucketed_pages(pages_path, cfg)
        # the bucket shuffle: dedup + docIDs + bucket file writes
        manifest_rows = ds.groupby("bucket").map_groups(
            DocBucketWriter(
                d["docs"],
                d["segments"] if cfg.fuse_segments else None,
                stem=cfg.stem,
                positions=cfg.positions,
            ),
            batch_format="pyarrow",
        )
        rows = manifest_rows.take_all()
        stage_secs["A_docs_segments"] = time.perf_counter() - t0
        write_json_atomic(
            os.path.join(d["docs"], "_STAGE.json"),
            {
                "status": "done",
                "num_buckets": len(rows),
                "num_docs": sum(r["num_docs"] for r in rows),
                "num_input_rows": sum(r["num_input_rows"] for r in rows),
            },
        )

    # ---- Stage B: per-bucket partial segments -----------------------------
    # A free task pool over {bucket, path} items (LPT order), NOT fused
    # into the shuffle reduce (measured: fusing caps tokenize at the
    # reduce slot count and its straggler tail loses at high CPU
    # counts). When EVERY bucket is pending (fresh build) the tasks
    # also emit the segment term rows in-memory, so stage C consumes
    # them straight from the object store — no segment re-listing or
    # re-read; the parquet checkpoints are still written for resume.
    bucket_files = sorted(
        f for f in os.listdir(d["docs"]) if f.endswith(".parquet")
    )
    items = []
    for f in bucket_files:
        bucket = int(f.split("_")[1].split(".")[0])
        items.append({"bucket": bucket,
                      "path": os.path.join(d["docs"], f)})
    def _seg_reusable(bucket: int) -> bool:
        # a done segment is only reusable if it carries the SAME
        # positions shape this build wants (write_segment enforces the
        # same rule; checking here keeps the pending list honest)
        m = read_json(seg_manifests.path(f"bucket_{bucket:06d}"))
        return bool(m and m.get("status") == "done"
                    and bool(m.get("positions", False)) == cfg.positions)

    pending = [it for it in items if not _seg_reusable(it["bucket"])]
    seg_rows_ds = None  # in-memory segment rows (fresh build only)
    if pending:
        # LPT-balanced task bins: from_items' default blocking slices
        # the (size-desc-sorted) items CONSECUTIVELY into ~200 blocks,
        # stacking the largest buckets into the same tasks — the worst
        # grouping. Greedy smallest-bin assignment balances every task
        # and one block per bin pins task granularity; the bin count is
        # INPUT-derived (never CPU-derived) so the job is identical at
        # every parallelism level, and the shard output is invariant to
        # grouping anyway (the merge re-sorts each part).
        pending.sort(key=lambda it: -os.path.getsize(it["path"]))
        n_bins = min(len(pending),
                     max(cfg.merge_partitions, cfg.num_buckets // 4))
        import heapq

        heap = [(0, b) for b in range(n_bins)]
        heapq.heapify(heap)
        bins: list[dict] = [{"buckets": [], "paths": [], "load": 0}
                            for _ in range(n_bins)]
        for it in pending:
            sz = os.path.getsize(it["path"])
            load, b = heapq.heappop(heap)
            bins[b]["buckets"].append(it["bucket"])
            bins[b]["paths"].append(it["path"])
            heapq.heappush(heap, (load + sz, b))
        group_items = [{"buckets": g["buckets"], "paths": g["paths"]}
                       for g in bins if g["buckets"]]
        handoff = cfg.chain_stages and len(pending) == len(items)
        # task form, not an actor pool: the worker-global stem cache
        # (stages/fulltext._worker_stemmer) gives actor-grade state
        # amortization on the already-warm worker processes
        if handoff:
            seg_rows_ds = ray.data.from_items(
                group_items, override_num_blocks=len(group_items)
            ).map_batches(
                segment_rows_batch_fn(d["segments"], stem=cfg.stem,
                                      positions=cfg.positions),
                batch_size=1,
                batch_format="numpy",
            ).materialize()
        else:
            ray.data.from_items(
                group_items, override_num_blocks=len(group_items)
            ).map_batches(
                segment_write_batch_fn(d["segments"], stem=cfg.stem,
                                       positions=cfg.positions),
                batch_size=1,
                batch_format="numpy",
            ).take_all()
        stage_secs["B_segment_sweep"] = (
            time.perf_counter() - t0 - sum(stage_secs.values())
        )
    seg_stats_rows = seg_manifests.load_all()

    # ---- Stage D data (needed before C completes, cheap): global stats ---
    num_docs = int(sum(int(r["num_docs"]) for r in seg_stats_rows))
    num_tokens = int(sum(int(r["num_tokens"]) for r in seg_stats_rows))
    stats = {
        "num_docs": num_docs,
        "num_tokens": num_tokens,
        "avgdl": (num_tokens / num_docs) if num_docs else 0.0,
        "num_partial_terms": int(sum(int(r["num_terms"]) for r in seg_stats_rows)),
        "payload_bytes": int(sum(int(r["payload_bytes"]) for r in seg_stats_rows)),
        "num_buckets": cfg.num_buckets,
        "buckets_per_salt_group": cfg.buckets_per_salt_group,
        "stem": cfg.stem,
        "positions": cfg.positions,
    }
    write_json_atomic(d["stats"], stats)

    # ---- Stage C: global merge shuffle by term range-part ----------------
    # Fingerprint of everything that determines a part's content: the
    # reducer count plus the identity of every input segment (boundaries
    # derive deterministically from these). A resumed merge only reuses
    # parts (and the stage marker) carrying the same fingerprint.
    import hashlib
    import json as _json

    fp_src = _json.dumps(
        {
            "merge_partitions": cfg.merge_partitions,
            "salt": cfg.buckets_per_salt_group,
            "positions": cfg.positions,
            "segments": sorted(
                [str(r.get("partition")), int(r.get("num_terms", -1)),
                 int(r.get("payload_bytes", -1)),
                 # content checksum: counts alone can collide (round-2
                 # review) — a refreshed segment with identical sizes
                 # but different postings must still invalidate parts
                 int(r.get("content_crc") or -1)]
                for r in seg_stats_rows
            ),
        },
        sort_keys=True,
    )
    merge_fp = hashlib.sha1(fp_src.encode("utf-8")).hexdigest()[:16]

    merge_marker = os.path.join(d["shards"], "_STAGE.json")
    stage_c = read_json(merge_marker)
    if not (stage_c and stage_c.get("status") == "done"
            and stage_c.get("fingerprint") == merge_fp):
        # invalidate parts left by a crashed/differently-configured
        # merge: delete both the stale file and its manifest so the
        # shuffle below rebuilds them
        shard_manifests = PartitionManifests(d["shards"])
        for m in shard_manifests.load_all():
            if m.get("fingerprint") != merge_fp:
                stale = os.path.join(d["shards"], m.get("file") or "")
                if m.get("file") and os.path.exists(stale):
                    os.unlink(stale)
                os.unlink(shard_manifests.path(m["partition"]))
        # content-determined range boundaries -> P vectorized partition
        # merges instead of |vocab|x|salts| per-group Python calls; range
        # (not hash) parts keep shard files term-contiguous for routing.
        # The samples ride in the segment manifests; fall back to a
        # column-pruned sampling pass for pre-sample manifests (resume)
        sampled: list[str] = []
        have_samples = all(r.get("sampled") is not None for r in seg_stats_rows)
        if seg_stats_rows and have_samples:
            for r in seg_stats_rows:
                sampled.extend(list(r["sampled"]))
        else:
            sample_rows = ray.data.read_parquet(
                d["segments"], columns=["term"]
            ).map_batches(sample_terms, batch_format="pyarrow").take_all()
            sampled = [r["term"] for r in sample_rows]
        bounds = term_range_boundaries(sampled, cfg.merge_partitions)
        writer = ShardPartWriter(d["shards"], fingerprint=merge_fp)
        if cfg.merge_exchange == "direct":
            # direct M x R exchange: boundaries are known BEFORE the
            # exchange, so each map task slices its segment for every
            # reducer and each reducer concats exactly its slices —
            # no repartition pass, no sort-shuffle boundary sampling.
            # (Measured: the sort path's C_merge was ~flat in CPU
            # count — its fixed machinery capped scaling efficiency.)
            from rse_ray.stages.fulltext import (
                split_segments_for_merge,
                write_merge_part,
            )

            R = cfg.merge_partitions
            if seg_rows_ds is not None:
                sources = seg_rows_ds.to_arrow_refs()
            else:
                sources = sorted(
                    os.path.join(d["segments"], f)
                    for f in os.listdir(d["segments"])
                    if f.endswith(".parquet")
                )
            # group sources so the exchange is ~R x R objects (input-
            # derived, never CPU-derived: outputs are identical for any
            # grouping, but the JOB must be the same at every
            # parallelism level)
            n_map = min(len(sources), R)
            groups = [sources[i::n_map] for i in range(n_map)]
            split_remote = ray.remote(
                num_cpus=cfg.merge_task_cpus)(split_segments_for_merge)
            write_remote = ray.remote(
                num_cpus=cfg.merge_task_cpus)(write_merge_part)
            slice_refs = [
                split_remote.options(num_returns=R).remote(
                    bounds, cfg.buckets_per_salt_group, R, *grp)
                for grp in groups
            ]
            if R == 1:  # num_returns=1 yields a bare ref, not a list
                slice_refs = [[r] for r in slice_refs]
            part_refs = [
                write_remote.remote(writer, *[sr[p] for sr in slice_refs])
                for p in range(R)
            ]
            route_rows = []
            for t in ray.get(part_refs):
                if t is not None:
                    route_rows.append(
                        {c: t.column(c)[0].as_py() for c in t.schema.names})
        else:
            # legacy sort-based exchange. Block count pinned to the
            # reducer count: Ray's sort shuffle cost grows with
            # map-block count, and with range parts the reducers are
            # row-balanced already — more map blocks buys nothing
            if seg_rows_ds is not None:
                seg_ds = seg_rows_ds.repartition(cfg.merge_partitions)
            else:
                seg_ds = ray.data.read_parquet(
                    d["segments"],
                    override_num_blocks=cfg.merge_partitions,
                )
            seg_ds = seg_ds.map_batches(
                make_add_salt(cfg.buckets_per_salt_group),
                batch_format="pyarrow",
            ).map_batches(make_add_range_part(bounds),
                          batch_format="pyarrow")
            # each reduce task writes its own term-contiguous shard
            # file (atomic + per-part manifest -> per-part resume) and
            # returns its route row — no driver-side footer scan
            route_rows = seg_ds.groupby("part").map_groups(
                writer, batch_format="pyarrow",
            ).take_all()
        write_json_atomic(
            merge_marker,
            {"status": "done", "num_parts": len(route_rows),
             "boundaries": bounds, "fingerprint": merge_fp},
        )
        stage_secs["C_merge"] = (
            time.perf_counter() - t0 - sum(stage_secs.values())
        )
        routes = sorted(
            ({"file": r["file"], "term_min": r["term_min"],
              "term_max": r["term_max"], "num_rows": int(r["num_rows"])}
             for r in route_rows),
            key=lambda r: r["file"],
        )
    else:
        routes = [
            {"file": m["file"], "term_min": m["term_min"],
             "term_max": m["term_max"], "num_rows": int(m["num_rows"])}
            for m in PartitionManifests(d["shards"]).load_all()
        ]
    routes = [r for r in routes if r["num_rows"] > 0]
    n_term_rows = sum(r["num_rows"] for r in routes)

    manifest = {
        "status": "done",
        "index_dir": index_dir,
        "stats": stats,
        "shards": routes,
        "num_shard_rows": n_term_rows,
        "build_seconds": time.perf_counter() - t0,
        "stage_seconds": {k: round(v, 3) for k, v in stage_secs.items()},
        "config": {
            "num_buckets": cfg.num_buckets,
            "buckets_per_salt_group": cfg.buckets_per_salt_group,
            "stem": cfg.stem,
            "from_html": cfg.from_html,
        },
    }
    write_json_atomic(d["manifest"], manifest)
    _release_dataset_refs()
    return manifest


def _release_dataset_refs() -> None:
    """Break the Dataset reference cycles this build created so their
    object-store blocks free NOW, not at an arbitrary future gc pass.

    Ray Datasets participate in reference cycles, so the blocks behind
    the stage A/B materializations stay PINNED in plasma after
    build_index returns until CPython's cycle collector happens to run.
    Measured (50k-page builds, one Ray session): ~50 MB of shm leaked
    per build and C_merge creeping 3.0 -> 6.0 s over four consecutive
    builds; with this collect, shm is flat and stage times stay level.
    A driver that rebuilds/refreshes many indexes in one process must
    not accumulate dead blocks — at fleet block sizes a handful of
    leaked builds would push the object store into spilling."""
    import gc

    gc.collect()


def _distinct_buckets(ds) -> list[int]:
    """Sorted distinct bucket ids via the shared Dataset.unique()
    workaround (util.distinct_ints — see its docstring for the Ray
    Unique-aggregate bug it routes around)."""
    from ..util import distinct_ints

    return [int(x) for x in distinct_ints(ds, ["bucket"], dtype="int32")]


def refresh_index(pages_path, index_dir: str,
                  cfg: BuildConfig | None = None) -> dict:
    """M8 incremental re-index — the reference's shouldVisit revisit
    policy (crawler.go:230-244) applied to the batch build: only pages
    NEWER than their bucket's recorded watermark re-enter the pipeline.

      1. recency filter: fresh = rows with warc_ts > watermark[bucket]
         or a null warc_ts (the keep-max reduce sorts nulls last, so a
         full build treats null ts as newest — refresh agrees); a
         bucket never seen before counts as all-fresh. Rows at or
         below the watermark may still be NEVER-SEEN urls or
         strictly-newer captures of known urls (the bucket watermark
         reflects OTHER urls' recency), so stale candidates are
         co-partitioned with their buckets' known (url, stored
         warc_ts) pairs (pruned read) and re-enter when the url is
         unknown OR the incoming ts is strictly newer than that url's
         own stored ts — per-URL shouldVisit semantics
         (crawler.go:230-244), not per-bucket.
      2. changed buckets re-run the dedup reduce over (their existing
         docs rows ∪ fresh rows) — last-writer-wins upsert semantics,
         exactly the full build's DocBucketWriter.
      3. changed buckets' segment checkpoints are invalidated; stage B
         rebuilds just those. The merge fingerprint then mismatches
         (segment content changed), so stage C rebuilds its parts —
         the same invalidation path a crashed merge uses.

    Crash safety: the docs checkpoints are never pre-deleted — the
    reduce overwrites them atomically (tmp+rename), so the old docs
    stay durable until their replacement lands. docs/_STAGE.json is
    removed BEFORE the reduce, so an interrupted refresh can never be
    mistaken for a finished stage A. The changed buckets' SEGMENT
    checkpoints are also dropped before the reduce — they are derived
    state (stage B rebuilds any bucket without a done segment
    manifest), so deleting them early is safe at any crash point;
    re-running refresh_index (or a full build over old ∪ fresh)
    recovers.

    Untouched buckets keep their docs + segment files byte-identical;
    the result equals a from-scratch build over (old ∪ fresh) except
    for KNOWN urls arriving with a timestamp at or below their own
    stored warc_ts, which are dropped unseen (that IS the recency
    semantics — the reference skips recently-visited urls; a full
    build's keep-max reduce would discard them anyway, so only exact
    ts ties with differing text can diverge)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    cfg = cfg or BuildConfig()
    d = _dirs(index_dir)
    docs_manifests = PartitionManifests(d["docs"])
    prev = {int(m["bucket"]): m for m in docs_manifests.load_all()}
    if not prev:
        return build_index(pages_path, index_dir, cfg)

    watermarks = {
        b: np.datetime64(m["watermark"]) for b, m in prev.items()
        if m.get("watermark")
    }
    floor = np.datetime64("1677-09-22")  # min datetime64[us] era

    def _wm(batch: pa.Table) -> np.ndarray:
        bk = batch.column("bucket").to_numpy()
        return np.array([watermarks.get(int(x), floor) for x in bk])

    def _fresh_mask(batch: pa.Table) -> np.ndarray:
        # null warc_ts counts as FRESH: DocBucketWriter's keep-max sort
        # places nulls last (Arrow at_end), i.e. a full build treats a
        # null ts as the newest capture — refresh must agree, so null
        # rows re-enter the reduce unconditionally rather than being
        # dropped by both recency filters (NaT compares False both ways)
        ts = batch.column("warc_ts").to_numpy()
        return (ts > _wm(batch)) | np.isnat(ts)

    def keep_fresh(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(pa.array(_fresh_mask(batch)))

    def keep_stale(batch: pa.Table) -> pa.Table:
        # exact complement of keep_fresh
        if batch.num_rows == 0:
            return batch
        return batch.filter(pa.array(~_fresh_mask(batch)))

    # the incremental batch, extracted once (small by construction)
    bucketed = _bucketed_pages(pages_path, cfg).materialize()
    fresh = bucketed.map_batches(keep_fresh, batch_format="pyarrow")

    # per-URL shouldVisit semantics: a row older than its BUCKET
    # watermark may still be a never-seen URL, or a known URL whose own
    # stored capture is older (the bucket watermark is OTHER urls'
    # recency). Those rows must index. Resolve by co-partitioning the
    # stale candidates with their buckets' known (url, stored warc_ts)
    # pairs (pruned read) and keeping rows that are unknown OR strictly
    # newer than their own stored ts — the reference's per-URL
    # last_visited policy (crawler.go:230-244).
    stale = bucketed.map_batches(keep_stale, batch_format="pyarrow")
    novel = None
    stale_buckets = _distinct_buckets(stale)
    if stale_buckets:
        known_files = [
            prev[b]["path"] for b in stale_buckets
            if b in prev and os.path.exists(prev[b].get("path", ""))
        ]

        def tag_stale(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "known", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
            )

        from rse_ray.functions.ids import url_buckets

        def tag_known(batch: pa.Table) -> pa.Table:
            # known rows carry their STORED warc_ts so the group fn can
            # compare per-url, not per-bucket
            n = batch.num_rows
            return pa.table(
                {"url": batch.column("url").cast(pa.string()),
                 "warc_ts": batch.column("warc_ts").cast(pa.timestamp("us")),
                 "text": pa.nulls(n, pa.string()),
                 "bucket": pa.array(
                     url_buckets(batch.column("url").to_pylist(),
                                 cfg.num_buckets),
                     type=pa.int32()),
                 "known": pa.array(np.ones(n, dtype=np.int8))}
            )

        def should_visit(g) -> pa.Table:
            known = g[g["known"] == 1]
            stored_ts = g["url"].map(
                dict(zip(known["url"], known["warc_ts"]))
            )
            # keep: unknown url (or stored ts null) OR strictly newer
            # than the url's own stored capture; NaT comparisons are
            # False, so a null incoming ts only passes for unknown urls
            keep = (g["known"] == 0) & (
                stored_ts.isna() | (g["warc_ts"] > stored_ts)
            )
            nw = g[keep]
            return pa.table(
                {"url": pa.array(nw["url"].tolist(), type=pa.string()),
                 "warc_ts": pa.array(nw["warc_ts"].tolist(),
                                     type=pa.timestamp("us")),
                 "text": pa.array(nw["text"].tolist(), type=pa.string()),
                 "bucket": pa.array(nw["bucket"].to_numpy(np.int32))}
            )

        cand = stale.map_batches(tag_stale, batch_format="pyarrow")
        if known_files:
            known_ds = ray.data.read_parquet(
                known_files, columns=["url", "warc_ts"]
            ).map_batches(tag_known, batch_format="pyarrow")
            cand = cand.union(known_ds)
        novel = cand.groupby("bucket").map_groups(
            should_visit, batch_format="pandas"
        ).materialize()
        if novel.count() == 0:
            novel = None

    fresh = (fresh.union(novel) if novel is not None else fresh).materialize()
    changed = _distinct_buckets(fresh)
    if not changed:
        existing = read_json(d["manifest"])
        if existing:
            return existing
        return build_index(pages_path, index_dir, cfg)

    # existing docs rows of the changed buckets rejoin the dedup
    old_files = [
        prev[b]["path"] for b in changed
        if b in prev and os.path.exists(prev[b].get("path", ""))
    ]
    union_in = fresh
    if old_files:
        old_ds = ray.data.read_parquet(
            old_files, columns=["url", "warc_ts", "text"]
        ).map_batches(
            make_add_bucket(cfg.num_buckets), batch_format="pyarrow"
        )
        union_in = fresh.union(old_ds)
    # pin the inputs: the reduce below atomically REPLACES the same docs
    # parquet files old_ds reads from
    union_in = union_in.materialize()

    # crash safety (round-2 ADVICE): the docs checkpoints are never
    # pre-deleted — DocBucketWriter(overwrite=True) replaces each via
    # tmp+rename, so the old docs stay durable until their replacement
    # lands. Drop the stage/final markers FIRST so an interrupted
    # refresh can never read as a completed stage A, and invalidate
    # only the DERIVED segment checkpoints (stage B rebuilds any bucket
    # without a done segment manifest, so this is safe at any crash
    # point).
    stage_marker = os.path.join(d["docs"], "_STAGE.json")
    if os.path.exists(stage_marker):
        os.unlink(stage_marker)
    if os.path.exists(d["manifest"]):
        os.unlink(d["manifest"])
    seg_manifests = PartitionManifests(d["segments"])
    for b in changed:
        key = f"bucket_{b:06d}"
        mp = seg_manifests.path(key)
        if os.path.exists(mp):
            os.unlink(mp)
        fp = os.path.join(d["segments"], f"{key}.parquet")
        if os.path.exists(fp):
            os.unlink(fp)

    union_in.groupby("bucket").map_groups(
        DocBucketWriter(d["docs"], None, stem=cfg.stem, overwrite=True,
                        positions=cfg.positions),
        batch_format="pyarrow",
    ).take_all()
    # drop the pinned datasets BEFORE the build below — their blocks
    # are spent, and build_index's end-of-run collect can only free
    # cycles this frame no longer references
    del union_in, fresh, novel, stale, bucketed
    _release_dataset_refs()

    rows = docs_manifests.load_all()
    write_json_atomic(
        os.path.join(d["docs"], "_STAGE.json"),
        {
            "status": "done",
            "num_buckets": len(rows),
            "num_docs": sum(int(r["num_docs"]) for r in rows),
            "num_input_rows": sum(int(r["num_input_rows"]) for r in rows),
            "refreshed_buckets": changed,
        },
    )
    # stale final manifest was already dropped pre-reduce; stages B-D
    # resume off the checkpoints
    return build_index(pages_path, index_dir, cfg)


def compact_index(index_dir: str, cfg: BuildConfig | None = None) -> dict:
    """Expunge tombstones (search.delete_urls) by INCREMENTALLY
    re-indexing only the buckets that contain deleted docs — the
    Lucene segment-merge analog of the tombstone model. Per affected
    bucket the docs parquet is rewritten without the deleted urls and
    doc ranks re-derive from the surviving sorted urls, so the
    compacted index is IDENTICAL (shard-byte-identical, tested) to a
    from-scratch build over the corpus minus the deleted urls; stats
    (N, avgdl, df) come back exact. Untouched buckets' docs, segments
    and checkpoints are reused as-is; only the merge re-runs globally
    (its fingerprint covers every segment's content_crc).

    Crash-safety: the live tombstones.parquet is atomically RENAMED to
    tombstones.compacting.parquet before anything else — readers never
    apply old tombstone ids to a re-minted docmap — then the
    stage/final markers drop (an interrupted compaction can never read
    as a completed build), each docs parquet is replaced atomically via
    tmp+rename, and stages B-D resume off checkpoints. The .compacting
    file is the crash-resume signal: re-entering compact_index after
    any crash point finishes the job idempotently (filtering
    already-compacted buckets is a no-op, re-ranking is stable, and
    bucket routing re-derives from urls so stale ids can't mislead).

    ``cfg`` must match the original build's configuration (as with
    refresh_index)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rse_ray.functions.ids import DOC_BUCKET_BITS
    from rse_ray.stages.fulltext import DOCS_SCHEMA
    from rse_ray.state.manifest import write_file_atomic

    cfg = cfg or BuildConfig()
    d = _dirs(index_dir)
    ts_path = os.path.join(index_dir, "tombstones.parquet")
    work_path = os.path.join(index_dir, "tombstones.compacting.parquet")
    # move the LIVE tombstone file out of readers' view FIRST (atomic
    # rename): the rewrites below re-mint doc ids, and a reader that
    # still applied the old tombstone ids would mask the WRONG docs.
    # The .compacting file doubles as the crash-resume signal — a
    # killed compaction re-enters here and re-runs idempotently.
    if os.path.exists(ts_path):
        if os.path.exists(work_path):
            # crashed between delete_urls and a previous compaction:
            # merge both lists so neither delete set is lost
            old = pq.read_table(work_path)
            new = pq.read_table(ts_path)
            merged = pa.concat_tables([old, new])
            pq.write_table(merged, work_path + ".tmp")
            os.rename(work_path + ".tmp", work_path)
            os.unlink(ts_path)
        else:
            os.rename(ts_path, work_path)
    if not os.path.exists(work_path):
        existing = read_json(d["manifest"])
        if existing and existing.get("status") == "done":
            return existing
        # crashed after tombstone retirement: finish the resumed build
        return build_index(None, index_dir, cfg)

    ts = pq.read_table(work_path)
    dead_urls = set(ts.column("url").to_pylist())
    # bucket set from the URLS, not the stored doc_ids: after a crashed
    # partial compaction the ids may be stale (re-minted), but
    # crc32(url) % num_buckets is the id-independent truth
    from rse_ray.functions.ids import url_bucket

    changed = sorted({url_bucket(u, cfg.num_buckets) for u in dead_urls})

    # 1. invalidate downstream FIRST (crash safety)
    stage_marker = os.path.join(d["docs"], "_STAGE.json")
    for p in (stage_marker, d["manifest"]):
        if os.path.exists(p):
            os.unlink(p)
    seg_manifests = PartitionManifests(d["segments"])
    for b in changed:
        key = f"bucket_{b:06d}"
        for p in (seg_manifests.path(key),
                  os.path.join(d["segments"], f"{key}.parquet")):
            if os.path.exists(p):
                os.unlink(p)

    # 2. rewrite each affected bucket's docs without the dead urls.
    # Affected buckets are |tombstoned buckets| (few relative to the
    # corpus); each rewrite is one column read + filter + atomic write,
    # run driver-side here — at fleet scale this loop is one
    # from_items().map_batches task wave, same shape as stage B.
    docs_manifests = PartitionManifests(d["docs"])
    for b in changed:
        key = f"bucket_{b:06d}"
        path = os.path.join(d["docs"], f"{key}.parquet")
        t = pq.read_table(path)
        keep = pa.array([u not in dead_urls
                         for u in t.column("url").to_pylist()],
                        type=pa.bool_())
        g = t.filter(keep)
        n = g.num_rows
        # ranks re-derive from the surviving url order (already
        # url-sorted by DocBucketWriter) — identical to a fresh build
        doc_ids = (b << DOC_BUCKET_BITS) | np.arange(n, dtype=np.int64)
        docs = pa.table(
            {
                "bucket": pa.array(np.full(n, b, dtype=np.int32)),
                "doc_id": pa.array(doc_ids),
                "url": g.column("url"),
                "warc_ts": g.column("warc_ts"),
                "text": g.column("text"),
            },
            schema=DOCS_SCHEMA,
        )
        write_file_atomic(path, lambda tmp: pq.write_table(docs, tmp))
        import pyarrow.compute as pc

        wm = pc.max(docs.column("warc_ts")).as_py() if n else None
        prev_m = read_json(docs_manifests.path(key)) or {}
        docs_manifests.mark_done(
            key, bucket=b, num_docs=n,
            num_input_rows=int(prev_m.get("num_input_rows", n)),
            path=path, bytes=os.path.getsize(path),
            watermark=wm.isoformat() if wm is not None else None,
            compacted=True,
        )

    rows = docs_manifests.load_all()
    write_json_atomic(
        stage_marker,
        {
            "status": "done",
            "num_buckets": len(rows),
            "num_docs": sum(int(r["num_docs"]) for r in rows),
            "num_input_rows": sum(int(r["num_input_rows"]) for r in rows),
            "compacted_buckets": changed,
        },
    )
    # 3. docs stage is consistent — drop the compacting file (the
    # live tombstones.parquet was already retired by the rename above)
    os.unlink(work_path)
    # 4. stages B-D resume: only the invalidated buckets re-tokenize;
    # the merge fingerprint (content_crc over every segment) re-runs
    # the exchange
    return build_index(None, index_dir, cfg)
