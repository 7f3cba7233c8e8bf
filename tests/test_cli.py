"""The ``python -m rse_ray`` job-submit surface: build, resume, search
run as REAL subprocesses (each owns its own Ray session, exactly like a
``ray job submit`` driver process would)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv: str) -> dict:
    env = dict(os.environ)
    env.setdefault("RAY_ADDRESS", "local")
    out = subprocess.run(
        [sys.executable, "-m", "rse_ray", *argv],
        check=True, capture_output=True, text=True, cwd=REPO, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_build_search_resume(ray_session, tmp_path):
    from rse_ray.sources.fixtures import generate_pages, generate_queries

    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    generate_pages(pages, n_rows=400)

    built = _run("build", "--input", pages, "--index-dir", idx,
                 "--num-buckets", "16")
    assert built["status"] == "done"
    assert built["stats"]["num_docs"] > 0

    # re-submitting the same job is a resume no-op onto the manifest
    again = _run("build", "--input", pages, "--index-dir", idx,
                 "--num-buckets", "16")
    assert again["status"] == "done"

    q = generate_queries(1)[0]["query"]
    taat = _run("search", "--index-dir", idx, "--query", q, "-k", "5")
    bmw = _run("search", "--index-dir", idx, "--query", q, "-k", "5",
               "--bmw")
    dist = _run("search", "--index-dir", idx, "--query", q, "-k", "5",
                "--distributed", "--warmup", "50", "--num-actors", "2",
                "--accumulators", "2")
    assert taat["hits"], "fixture query should hit"
    assert bmw["hits"] == taat["hits"] == dist["hits"]
    for h in taat["hits"]:
        assert h["url"].startswith("https://")


def test_cli_delete_compact_lifecycle(ray_session, tmp_path):
    """Full index lifecycle over the CLI: build -> delete (tombstone,
    masked immediately at query time) -> compact (expunged; results
    identical to a from-scratch build over the surviving corpus)."""
    from rse_ray.sources.fixtures import generate_pages, generate_queries

    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    generate_pages(pages, n_rows=300)
    _run("build", "--input", pages, "--index-dir", idx,
         "--num-buckets", "8")
    q = generate_queries(1)[0]["query"]
    before = _run("search", "--index-dir", idx, "--query", q, "-k", "5")
    assert before["hits"]
    victim = before["hits"][0]["url"]

    deleted = _run("delete", "--index-dir", idx, "--url", victim)
    assert deleted["tombstoned"] == 1
    masked = _run("search", "--index-dir", idx, "--query", q, "-k", "5")
    assert victim not in [h["url"] for h in masked["hits"]]

    compacted = _run("compact", "--index-dir", idx,
                     "--num-buckets", "8")
    assert compacted["status"] == "done"
    # post-compact: tombstone file gone, victim stays gone, the query
    # still answers (scores now reflect EXACT post-delete stats, so
    # ranks may legitimately differ from the stale-stats masked pass —
    # fresh-build identity is asserted in test_build_search)
    after = _run("search", "--index-dir", idx, "--query", q, "-k", "5")
    assert after["hits"]
    assert victim not in [h["url"] for h in after["hits"]]
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))
