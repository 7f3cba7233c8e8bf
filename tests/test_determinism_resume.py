"""Determinism across build configurations + mid-build resume
(SURVEY §5.4/§5.5; north_rule checkpoint requirement)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest


def _logical_index(index_dir):
    """The logical content of the final index: every (term, salt_group)
    row's payload bytes + df, plus stats — independent of physical file
    layout (file split boundaries legitimately vary with parallelism)."""
    shards_dir = os.path.join(index_dir, "shards")
    rows = []
    for f in sorted(os.listdir(shards_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(f"{shards_dir}/{f}")
            rows.extend(
                zip(
                    t.column("term").to_pylist(),
                    t.column("salt_group").to_pylist(),
                    t.column("df").to_pylist(),
                    t.column("payload").to_pylist(),
                    t.column("blockmeta").to_pylist(),
                )
            )
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


def _build(pages_dir, index_dir, **kw):
    from rse_ray.pipelines.build import BuildConfig, build_index

    cfg = BuildConfig(num_buckets=16, buckets_per_salt_group=4, **kw)
    return build_index(pages_dir, index_dir, cfg)


def test_build_deterministic_across_runs(ray_session, fixture_pages, tmp_path):
    """Two independent builds -> identical logical index, byte-identical
    payloads (content-determined docIDs + salting, SURVEY §7.5.5)."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ma = _build(fixture_pages["pages_dir"], a)
    mb = _build(fixture_pages["pages_dir"], b)
    assert ma["stats"] == mb["stats"]
    ra, rb = _logical_index(a), _logical_index(b)
    assert len(ra) == len(rb)
    assert ra == rb


def test_resume_after_partial_segments(ray_session, fixture_pages, tmp_path):
    """Simulate a crash after stage B finished only SOME buckets: delete
    a few segment files+manifests and the merge output, then resume.
    The resumed index must equal an uninterrupted build's."""
    full = str(tmp_path / "full")
    crash = str(tmp_path / "crash")
    _build(fixture_pages["pages_dir"], full)
    _build(fixture_pages["pages_dir"], crash)

    # "crash": drop 3 segment partitions + their manifests + all of stage C
    seg_dir = os.path.join(crash, "segments")
    victims = [f for f in sorted(os.listdir(seg_dir)) if f.endswith(".parquet")][:3]
    for v in victims:
        os.unlink(os.path.join(seg_dir, v))
        os.unlink(os.path.join(seg_dir, "_manifests", v.replace(".parquet", ".json")))
    shutil.rmtree(os.path.join(crash, "shards"))
    os.unlink(os.path.join(crash, "_MANIFEST.json"))

    m = _build(fixture_pages["pages_dir"], crash)
    assert m["status"] == "done"
    assert _logical_index(crash) == _logical_index(full)


def test_resume_is_noop_when_done(ray_session, fixture_pages, tmp_path):
    idx = str(tmp_path / "idx")
    m1 = _build(fixture_pages["pages_dir"], idx)
    m2 = _build(fixture_pages["pages_dir"], idx)  # returns stored manifest
    assert m2["status"] == "done"
    assert m1["stats"] == m2["stats"]


def test_manifests_carry_lineage_and_metrics(ray_session, fixture_pages, tmp_path):
    from rse_ray.state.manifest import PartitionManifests

    idx = str(tmp_path / "m")
    _build(fixture_pages["pages_dir"], idx)
    seg = PartitionManifests(os.path.join(idx, "segments")).load_all()
    assert seg, "segment manifests missing"
    for m in seg:
        assert m["status"] == "done"
        assert m["num_docs"] > 0
        assert m["num_tokens"] > 0
        assert m["payload_bytes"] > 0
        assert m["lineage"], "lineage missing"
    docs = PartitionManifests(os.path.join(idx, "docs")).load_all()
    assert docs and all("bytes" in m for m in docs)
    # global metrics = sum of partition metrics
    from rse_ray.state.manifest import read_json

    stats = read_json(os.path.join(idx, "stats.json"))
    assert stats["num_docs"] == sum(m["num_docs"] for m in seg)
    assert stats["num_tokens"] == sum(m["num_tokens"] for m in seg)


def test_salting_splits_head_terms(ray_session, fixture_pages, tmp_path):
    """Head (Zipf) terms must appear as multiple (term, salt_group) rows
    — the skew-mitigation contract — and chunks must be doc-disjoint."""
    idx = str(tmp_path / "s")
    _build(fixture_pages["pages_dir"], idx)
    rows = _logical_index(idx)
    by_term = {}
    for term, salt, df, _, _ in rows:
        by_term.setdefault(term, []).append((salt, df))
    multi = [t for t, v in by_term.items() if len(v) > 1]
    assert multi, "no salted head terms found (fixture is Zipf -> expected)"
    # head term total df should be near corpus size
    best = max(by_term.items(), key=lambda kv: sum(df for _, df in kv[1]))
    assert sum(df for _, df in best[1]) > 300


def test_resume_after_partial_merge(ray_session, fixture_pages, tmp_path):
    """Simulate a crash MID-MERGE: drop some shard part files + their
    manifests + the stage marker and final manifest, then resume. The
    merge re-runs, finished parts are skipped (their manifests are
    done), missing parts are rebuilt; result equals a full build."""
    full = str(tmp_path / "full")
    crash = str(tmp_path / "crash")
    _build(fixture_pages["pages_dir"], full)
    _build(fixture_pages["pages_dir"], crash)

    shards_dir = os.path.join(crash, "shards")
    parts = [f for f in sorted(os.listdir(shards_dir)) if f.endswith(".parquet")]
    assert len(parts) > 3
    survivors = {}
    for v in parts[1:3]:
        os.unlink(os.path.join(shards_dir, v))
        os.unlink(os.path.join(shards_dir, "_manifests", v.replace(".parquet", ".json")))
    for f in parts:
        p = os.path.join(shards_dir, f)
        if os.path.exists(p):
            survivors[f] = os.path.getmtime(p)
    os.unlink(os.path.join(shards_dir, "_STAGE.json"))
    os.unlink(os.path.join(crash, "_MANIFEST.json"))

    m = _build(fixture_pages["pages_dir"], crash)
    assert m["status"] == "done"
    assert _logical_index(crash) == _logical_index(full)
    # finished parts were skipped, not rewritten
    for f, mtime in survivors.items():
        assert os.path.getmtime(os.path.join(shards_dir, f)) == mtime


def test_resume_with_changed_merge_config_rebuilds(ray_session, fixture_pages,
                                                   tmp_path):
    """A crashed merge resumed with DIFFERENT merge_partitions must not
    reuse stale part files keyed by the same part numbers: the merge
    fingerprint (reducer count + segment set) invalidates them and the
    whole merge reruns (round-1 ADVICE: silent stale-part reuse)."""
    full = str(tmp_path / "full")
    crash = str(tmp_path / "crash")
    _build(fixture_pages["pages_dir"], full, merge_partitions=8)
    _build(fixture_pages["pages_dir"], crash, merge_partitions=32)

    # crash mid-merge under the OLD config: part files + manifests stay,
    # stage marker + final manifest are gone
    shards_dir = os.path.join(crash, "shards")
    os.unlink(os.path.join(shards_dir, "_STAGE.json"))
    os.unlink(os.path.join(crash, "_MANIFEST.json"))

    m = _build(fixture_pages["pages_dir"], crash, merge_partitions=8)
    assert m["status"] == "done"
    assert _logical_index(crash) == _logical_index(full)
    # the 32-part leftovers (part_00008..) must have been deleted, not
    # merged into the 8-part index
    parts = [f for f in os.listdir(shards_dir) if f.endswith(".parquet")]
    assert len(parts) <= 8


def test_incremental_refresh_matches_full_rebuild(ray_session, tmp_path):
    """M8 incremental re-index: refresh over a v2 batch (updates + new
    urls + stale rows) == from-scratch build over the upserted corpus;
    stale rows (older than the bucket watermark) are skipped and
    untouched buckets' docs files are not rewritten."""
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rse_ray.pipelines.build import BuildConfig, build_index, refresh_index

    def pages(rows):
        return pa.table(
            {"url": pa.array([r[0] for r in rows]),
             "warc_ts": pa.array([r[1] for r in rows],
                                 type=pa.timestamp("us")),
             "text": pa.array([r[2] for r in rows])}
        )

    t0 = datetime(2025, 1, 1)
    v1 = [(f"https://ex.com/{i}", t0 + timedelta(seconds=i),
           f"alpha beta doc{i} common words here") for i in range(120)]
    upd = [(f"https://ex.com/{i}", t0 + timedelta(days=1, seconds=i),
            f"gamma delta doc{i} fresh") for i in range(3)]
    new = [(f"https://ex.com/n{i}", t0 + timedelta(days=1, seconds=i),
            f"epsilon doc n{i}") for i in range(2)]
    # a NEVER-SEEN url whose ts is older than every bucket watermark:
    # per-URL shouldVisit semantics require it to be indexed anyway
    new_old = [("https://ex.com/old-new", t0 - timedelta(days=2),
                "zeta unseen old doc")]
    stale = [(f"https://ex.com/{i}", t0 - timedelta(days=1),
              "stale must not appear") for i in (40, 41)]

    d1 = tmp_path / "v1"; d1.mkdir()
    d2 = tmp_path / "v2"; d2.mkdir()
    dall = tmp_path / "all"; dall.mkdir()
    pq.write_table(pages(v1), str(d1 / "p.parquet"))
    pq.write_table(pages(upd + new + new_old + stale), str(d2 / "p.parquet"))
    pq.write_table(pages(v1 + upd + new + new_old + stale),
                   str(dall / "p.parquet"))

    cfg = BuildConfig(num_buckets=16, buckets_per_salt_group=4,
                      from_html=False)
    inc = str(tmp_path / "inc")
    build_index(str(d1 / "p.parquet"), inc, cfg)
    docs_dir = os.path.join(inc, "docs")
    before = {
        f: os.path.getmtime(os.path.join(docs_dir, f))
        for f in os.listdir(docs_dir) if f.endswith(".parquet")
    }

    m = refresh_index(str(d2 / "p.parquet"), inc, cfg)
    assert m["status"] == "done"

    full = str(tmp_path / "full")
    build_index(str(dall / "p.parquet"), full, cfg)
    assert _logical_index(inc) == _logical_index(full)

    # stale rows never entered; at least one untouched bucket was not
    # rewritten (incremental, not a disguised full rebuild)
    untouched = [
        f for f, mt in before.items()
        if os.path.exists(os.path.join(docs_dir, f))
        and os.path.getmtime(os.path.join(docs_dir, f)) == mt
    ]
    assert untouched, "every bucket was rewritten — refresh is not incremental"


def test_refresh_per_url_and_null_ts_semantics(ray_session, tmp_path):
    """Round-3 ADVICE closures: (a) a KNOWN url whose new capture is
    strictly newer than its OWN stored warc_ts but at/below its bucket
    watermark must update (per-URL shouldVisit, crawler.go:230-244);
    (b) a null-warc_ts capture of a known url wins, matching the full
    build's nulls-last keep-max; (c) a never-seen null-ts url indexes."""
    from datetime import datetime, timedelta

    import pyarrow as pa

    from rse_ray.functions.ids import url_bucket
    from rse_ray.pipelines.build import BuildConfig, build_index, refresh_index

    def pages(rows):
        return pa.table(
            {"url": pa.array([r[0] for r in rows]),
             "warc_ts": pa.array([r[1] for r in rows],
                                 type=pa.timestamp("us")),
             "text": pa.array([r[2] for r in rows])}
        )

    t0 = datetime(2025, 1, 1)
    nb = 16
    urls = [f"https://ex.com/{i}" for i in range(120)]
    v1 = [(u, t0 + timedelta(seconds=i), f"alpha doc{i} words")
          for i, u in enumerate(urls)]

    # pick a url that is NOT the newest of its bucket, so an update
    # strictly between its own ts and the bucket watermark exercises
    # the per-url path (it would be dropped by a per-bucket filter)
    by_bucket = {}
    for i, u in enumerate(urls):
        by_bucket.setdefault(url_bucket(u, nb), []).append(i)
    grp = next(v for v in by_bucket.values() if len(v) >= 2)
    m, mx = min(grp), max(grp)
    assert m < mx
    mid_upd = (urls[m], t0 + timedelta(seconds=m, milliseconds=500),
               "midwatermark update must appear")
    # null-ts capture of a DIFFERENT known url: full build keeps it
    # (nulls sort last in the keep-max reduce)
    k = min(i for i in range(120) if i != m)
    null_known = (urls[k], None, "null ts known url wins")
    null_new = ("https://ex.com/null-new", None, "null ts brand new url")
    v2 = [mid_upd, null_known, null_new]

    d1 = tmp_path / "v1"; d1.mkdir()
    d2 = tmp_path / "v2"; d2.mkdir()
    dall = tmp_path / "all"; dall.mkdir()
    pq.write_table(pages(v1), str(d1 / "p.parquet"))
    pq.write_table(pages(v2), str(d2 / "p.parquet"))
    pq.write_table(pages(v1 + v2), str(dall / "p.parquet"))

    cfg = BuildConfig(num_buckets=nb, buckets_per_salt_group=4,
                      from_html=False)
    inc = str(tmp_path / "inc")
    build_index(str(d1 / "p.parquet"), inc, cfg)
    m_inc = refresh_index(str(d2 / "p.parquet"), inc, cfg)
    assert m_inc["status"] == "done"

    full = str(tmp_path / "full")
    build_index(str(dall / "p.parquet"), full, cfg)
    assert _logical_index(inc) == _logical_index(full)

    # the three rows really are in the refreshed docs checkpoint
    docs_dir = os.path.join(inc, "docs")
    texts = {}
    for f in os.listdir(docs_dir):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(docs_dir, f),
                              columns=["url", "text"])
            texts.update(zip(t.column("url").to_pylist(),
                             t.column("text").to_pylist()))
    assert texts[urls[m]] == mid_upd[2]
    assert texts[urls[k]] == null_known[2]
    assert texts[null_new[0]] == null_new[2]


def test_refresh_crash_mid_reduce_keeps_docs_durable(ray_session, tmp_path):
    """Round-3 ADVICE (high): a refresh that dies inside the dedup
    reduce must leave every old docs checkpoint intact on disk and must
    NOT leave docs/_STAGE.json claiming done; re-running refresh_index
    then converges to the full-rebuild index."""
    import hashlib
    from datetime import datetime, timedelta

    import pyarrow as pa

    import rse_ray.pipelines.build as build_mod
    from rse_ray.pipelines.build import BuildConfig, build_index, refresh_index

    def pages(rows):
        return pa.table(
            {"url": pa.array([r[0] for r in rows]),
             "warc_ts": pa.array([r[1] for r in rows],
                                 type=pa.timestamp("us")),
             "text": pa.array([r[2] for r in rows])}
        )

    t0 = datetime(2025, 1, 1)
    v1 = [(f"https://ex.com/{i}", t0 + timedelta(seconds=i),
           f"alpha doc{i} words") for i in range(120)]
    v2 = [(f"https://ex.com/{i}", t0 + timedelta(days=1, seconds=i),
           f"beta doc{i} updated") for i in range(5)]

    d1 = tmp_path / "v1"; d1.mkdir()
    d2 = tmp_path / "v2"; d2.mkdir()
    dall = tmp_path / "all"; dall.mkdir()
    pq.write_table(pages(v1), str(d1 / "p.parquet"))
    pq.write_table(pages(v2), str(d2 / "p.parquet"))
    pq.write_table(pages(v1 + v2), str(dall / "p.parquet"))

    cfg = BuildConfig(num_buckets=16, buckets_per_salt_group=4,
                      from_html=False)
    inc = str(tmp_path / "inc")
    build_index(str(d1 / "p.parquet"), inc, cfg)
    docs_dir = os.path.join(inc, "docs")

    def _file_hashes():
        out = {}
        for f in sorted(os.listdir(docs_dir)):
            if f.endswith(".parquet"):
                with open(os.path.join(docs_dir, f), "rb") as fh:
                    out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    before = _file_hashes()

    class ExplodingWriter(build_mod.DocBucketWriter):
        def __call__(self, group):
            raise ValueError("simulated mid-reduce crash")

    real = build_mod.DocBucketWriter
    build_mod.DocBucketWriter = ExplodingWriter
    try:
        with pytest.raises(Exception):
            refresh_index(str(d2 / "p.parquet"), inc, cfg)
    finally:
        build_mod.DocBucketWriter = real

    # every old docs checkpoint survived byte-identical, and the crashed
    # refresh cannot masquerade as a completed stage A
    assert _file_hashes() == before
    assert not os.path.exists(os.path.join(docs_dir, "_STAGE.json"))
    assert not os.path.exists(os.path.join(inc, "_MANIFEST.json"))

    # recovery: re-run the refresh for real
    m = refresh_index(str(d2 / "p.parquet"), inc, cfg)
    assert m["status"] == "done"
    full = str(tmp_path / "full")
    build_index(str(dall / "p.parquet"), full, cfg)
    assert _logical_index(inc) == _logical_index(full)


def test_write_partitioned_resume_skips_done(ray_session, tmp_path):
    """Resumable partitioned sink: (a) round-trip preserves every row,
    (b) a re-run after deleting ONE partition rebuilds only it (other
    files untouched by mtime), (c) the rebuilt partition's fingerprint
    equals the original (content-keyed routing), (d) a fully-done sink
    short-circuits."""
    import os
    import time

    import pandas as pd
    import ray.data

    from rse_ray.sinks import partition_summary, write_partitioned

    df = pd.DataFrame({
        "user_id": [i % 37 for i in range(1000)],
        "v": [float(i) for i in range(1000)],
        "s": [f"s{i % 11}" for i in range(1000)],
    })
    out = str(tmp_path / "sink")
    ds = ray.data.from_pandas(df).repartition(4)
    r1 = write_partitioned(ds, out, key="user_id", num_parts=8)
    assert r1["partitions"] == 8 and r1["rows"] == 1000
    assert r1["written"] >= 1 and r1["skipped"] == 0
    summ1 = partition_summary(out)

    back = ray.data.read_parquet(
        [os.path.join(out, f) for f in sorted(os.listdir(out))
         if f.endswith(".parquet")]).to_pandas()
    assert len(back) == 1000
    assert sorted(back["v"]) == sorted(df["v"])
    # routing is content-keyed: every row sits in part user_id % 8
    assert (back["user_id"] % 8).nunique() == 8

    # fully-done: short-circuit, no work
    r2 = write_partitioned(ds, out, key="user_id", num_parts=8)
    assert r2["written"] == 0 and r2["skipped"] == 8

    # kill partition 3 (file + manifest + the DONE marker), resume
    os.unlink(os.path.join(out, "part_00003.parquet"))
    os.unlink(os.path.join(out, "_manifests", "3.json"))
    os.unlink(os.path.join(out, "_DONE.json"))
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".parquet")}
    time.sleep(0.05)
    r3 = write_partitioned(ds, out, key="user_id", num_parts=8)
    assert r3["written"] == 1 and r3["skipped"] == 7
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m, f
    summ3 = partition_summary(out)
    pd.testing.assert_frame_equal(summ1, summ3)
