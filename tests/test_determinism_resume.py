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
