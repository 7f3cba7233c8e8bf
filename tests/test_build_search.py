"""E2E: build the index with the Ray pipeline on the fixture corpus and
verify rank-identity against the naive oracle (SURVEY §5.2), extraction
byte-identity (§5.1 / input_hint), determinism across parallelism
grouping (§5.4) and BMW == TAAT."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.oracle import OracleIndex

NUM_BUCKETS = 16


@pytest.fixture(scope="session")
def built_index(ray_session, fixture_pages, tmp_path_factory):
    from rse_ray.pipelines.build import BuildConfig, build_index

    index_dir = str(tmp_path_factory.mktemp("index"))
    manifest = build_index(
        fixture_pages["pages_dir"],
        index_dir,
        BuildConfig(num_buckets=NUM_BUCKETS, buckets_per_salt_group=4),
    )
    return {"index_dir": index_dir, "manifest": manifest}


@pytest.fixture(scope="session")
def oracle(fixture_pages):
    rows = _load_rows(fixture_pages["pages_dir"])
    return OracleIndex(rows, num_buckets=NUM_BUCKETS)


def _load_rows(pages_dir):
    rows = []
    for f in sorted(os.listdir(pages_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(pages_dir, f))
            rows.extend(t.to_pylist())
    return rows


def test_extraction_byte_identity(fixture_pages):
    """input_hint invariant: extract(html) == text byte-for-byte per url."""
    from rse_ray.functions.extract import extract

    rows = _load_rows(fixture_pages["pages_dir"])
    assert len(rows) == 500
    bad = []
    for r in rows:
        got = extract(r["html"])["text"]
        if got != r["text"]:
            bad.append((r["url"], got[:80], r["text"][:80]))
    assert not bad, f"{len(bad)} extraction mismatches, first: {bad[:2]}"


def test_build_stats_match_oracle(built_index, oracle):
    stats = built_index["manifest"]["stats"]
    assert stats["num_docs"] == oracle.N
    assert stats["num_tokens"] == sum(oracle.doc_len.values())
    assert stats["avgdl"] == pytest.approx(oracle.avgdl, rel=0, abs=0)


def test_docmap_matches_oracle(built_index, oracle):
    docs_dir = os.path.join(built_index["index_dir"], "docs")
    got = {}
    for f in sorted(os.listdir(docs_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(docs_dir, f), columns=["doc_id", "url"])
            for did, url in zip(t.column("doc_id").to_pylist(), t.column("url").to_pylist()):
                got[url] = did
    assert got == oracle.doc_ids


def test_postings_match_oracle(built_index, oracle):
    from rse_ray.pipelines.search import IndexReader

    reader = IndexReader(built_index["index_dir"])
    # check a spread of terms: head, medium, tail, missing
    terms = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    sample = terms[:5] + terms[len(terms) // 2 : len(terms) // 2 + 5] + terms[-5:]
    for term in sample:
        got = reader.postings(term)
        assert got is not None, term
        ids, tfs, dls, df = got
        want = sorted(oracle.postings[term].items())
        assert df == len(want)
        assert ids.tolist() == [d for d, _ in want]
        assert tfs.tolist() == [tf for _, tf in want]
        assert dls.tolist() == [oracle.doc_len[d] for d, _ in want]
        assert (np.diff(ids) > 0).all() if len(ids) > 1 else True
    assert reader.postings("zzz-not-a-term") is None


def test_rank_identity_on_query_set(built_index, oracle, fixture_pages):
    """The headline conformance test: docIDs AND scores rank-identical
    (exact float equality — same fp ops in same order) on all 60
    reference queries, ties broken by ascending doc_id."""
    from rse_ray.pipelines.search import Searcher

    s = Searcher(built_index["index_dir"])
    assert s.N == oracle.N and s.avgdl == oracle.avgdl
    for q in fixture_pages["queries"]:
        got = s.search(q["query"], k=10)
        want = oracle.search(q["query"], k=10)
        assert got == want, f"qid={q['qid']} {q['query']!r}\n got={got}\nwant={want}"


def test_bmw_equals_taat(built_index, fixture_pages):
    from rse_ray.pipelines.search import Searcher

    s = Searcher(built_index["index_dir"])
    for q in fixture_pages["queries"]:
        taat = s.search(q["query"], k=10)
        bmw = s.search_bmw(q["query"], k=10)
        assert bmw == taat, f"qid={q['qid']} {q['query']!r}"


def test_distributed_searcher_matches(built_index, oracle, fixture_pages, ray_session):
    from rse_ray.pipelines.search import DistributedSearcher

    ds = DistributedSearcher(built_index["index_dir"], num_actors=3)
    for q in fixture_pages["queries"][::7]:
        got = ds.search(q["query"], k=10)
        want = oracle.search(q["query"], k=10)
        assert got == want, f"qid={q['qid']}"


def test_hydrate_urls(built_index, oracle, fixture_pages):
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    s = Searcher(built_index["index_dir"])
    hits = s.search(fixture_pages["queries"][0]["query"], k=5)
    if hits:
        out = hydrate_urls(built_index["index_dir"], hits)
        for did, score, url in out:
            assert oracle.url_of[did] == url


def test_empty_and_unknown_queries(built_index):
    from rse_ray.pipelines.search import Searcher

    s = Searcher(built_index["index_dir"])
    assert s.search("", k=10) == []
    assert s.search("zzqx0unknown zzqy0missing", k=10) == []
    assert s.search_bmw("zzqx0unknown", k=10) == []


def test_sharded_accumulator_searcher_matches(built_index, oracle,
                                              fixture_pages, ray_session):
    """Scatter-gather with per-doc-range accumulator actors: no O(N)
    array on any process, postings never reach the driver — ranks and
    scores must still equal the oracle exactly."""
    from rse_ray.pipelines.search import DistributedSearcher

    ds = DistributedSearcher(built_index["index_dir"], num_actors=3,
                             accumulator_actors=3)
    assert len(ds.accs) >= 2, "expected the accumulator to actually shard"
    for q in fixture_pages["queries"][::7]:
        got = ds.search(q["query"], k=10)
        want = oracle.search(q["query"], k=10)
        assert got == want, f"qid={q['qid']}"


def test_sharded_accumulator_budget_reject_stays_correct(built_index, oracle,
                                                         fixture_pages,
                                                         ray_session):
    """A postings budget too small to store ANY slice must never corrupt
    results: non-resident terms re-ship every query and the warm n=0
    fast path never engages for them (round-2 review finding)."""
    from rse_ray.pipelines.search import DistributedSearcher

    ds = DistributedSearcher(built_index["index_dir"], num_actors=2,
                             accumulator_actors=2, acc_budget=0)
    for _ in range(2):  # repeat: the second pass is where the bug bit
        for q in fixture_pages["queries"][::11]:
            got = ds.search(q["query"], k=10)
            want = oracle.search(q["query"], k=10)
            assert got == want, f"q={q['qid']}"
    assert not ds._resident  # nothing can be stored at budget 0


def test_distributed_warmup_cold_queries_are_warm(built_index, oracle,
                                                  fixture_pages, ray_session):
    """warmup() prefetches head-term slices into the accumulators:
    afterwards every indexed query term is already resident (so the
    first query for it ships no posting bytes), and results still
    match the oracle exactly."""
    from rse_ray.pipelines.search import DistributedSearcher, _query_weights

    ds = DistributedSearcher(built_index["index_dir"], num_actors=2,
                             accumulator_actors=2)
    info = ds.warmup(top_n=100_000, min_df=1)
    assert info["resident"] > 0
    resident_at_start = set(ds._resident)
    for q in fixture_pages["queries"][::7]:
        got = ds.search(q["query"], k=10)
        want = oracle.search(q["query"], k=10)
        assert got == want, f"qid={q['qid']}"
        for term, _ in _query_weights(q["query"], ds.stem):
            if ds._term_df.get(term, 0) > 0:
                assert term in resident_at_start, term


def test_distributed_warmup_budget_zero_is_safe(built_index, oracle,
                                                fixture_pages, ray_session):
    """With a postings budget of 0 nothing can become resident: warmup
    must ship nothing (capacity cap), mark nothing resident, and leave
    query results exactly oracle-correct via the per-query re-ship
    path."""
    from rse_ray.pipelines.search import DistributedSearcher

    ds = DistributedSearcher(built_index["index_dir"], num_actors=2,
                             accumulator_actors=2, acc_budget=0)
    info = ds.warmup(top_n=1000, min_df=1)
    assert info["resident"] == 0 and not ds._resident
    for q in fixture_pages["queries"][::11]:
        got = ds.search(q["query"], k=10)
        want = oracle.search(q["query"], k=10)
        assert got == want, f"qid={q['qid']}"


def test_accumulator_blockmax_pruning_exact_and_engaged(ray_session):
    """Round-3: the accumulator's block-max pruned top-k must (a) equal
    the exhaustive dense scatter-add exactly on a SKEWED corpus — the
    case where pruning actually skips blocks — and (b) demonstrably
    score fewer postings than the candidate total."""
    import ray

    from rse_ray.pipelines.search import make_accumulator_actor

    rng = np.random.default_rng(11)
    N = 400_000
    bits = 20  # one bucket holds everything: doc_id == dense rank
    offsets = np.array([0, N], dtype=np.int64)

    ids_a = np.arange(N, dtype=np.int64)
    tfp_a = np.full(N, 0.2)
    # hot region CLUSTERED in a few blocks (docs sharing a shard often
    # share length/tf statistics): this is the prunable shape
    hot = np.arange(5_000, 5_200)
    tfp_a[hot] = rng.uniform(2.0, 3.0, size=len(hot))
    sel_b = np.sort(rng.choice(N, size=80_000, replace=False)).astype(np.int64)
    tfp_b = rng.uniform(0.1, 0.4, size=len(sel_b))
    tfp_b[:50] = 5.0  # head of term b is hot (first few blocks)
    w_a, w_b = 1.7, 0.9

    # expected: exhaustive scatter-add in sorted-term order
    acc = np.zeros(N)
    acc[ids_a] += w_a * tfp_a
    acc[sel_b] += w_b * tfp_b
    k = 10
    order = np.lexsort((np.arange(N), -acc))[:k]
    want = [(int(i), float(acc[i])) for i in order]

    Acc = make_accumulator_actor()
    actor = Acc.remote(offsets, bits, 0, 1)
    got, stored = ray.get(actor.accumulate_and_topk.remote(
        k, "a", w_a, 1, (ids_a, tfp_a), "b", w_b, 1, (sel_b, tfp_b)
    ))
    assert got == want
    assert set(stored) == {"a", "b"}
    stats = ray.get(actor.pruning_stats.remote())
    assert stats["candidate_postings"] == N + len(sel_b)
    assert stats["scored_postings"] < 0.3 * stats["candidate_postings"], stats

    # warm repeat (n=0 ops) must reproduce the same result via the
    # resident slices and keep pruning
    got2, _ = ray.get(actor.accumulate_and_topk.remote(
        k, "a", w_a, 0, "b", w_b, 0
    ))
    assert got2 == want


def test_positional_index_phrase_search(ray_session, tmp_path):
    """BuildConfig(positions=True) end-to-end: multi-bucket build (so
    the merge SPLICES position runs across salt chunks), then
    search_phrase must equal the corpus-scan phrase_match on every
    phrase shape — multi-token, overlapping, repeated-term, single
    term (== tf), absent term."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher
    from rse_ray.pipelines.text import phrase_match

    texts = {
        "u1": "a b a b a b",          # 'a b' x3
        "u2": "a a a a",              # 'a a' overlaps x3
        "u3": "x a y b",              # non-adjacent
        "u4": "b a",                  # reversed
        "u5": "c a b d a b",          # 'a b' x2 across the doc
        "u6": "a",                    # too short for any bigram
        "u7": "q r s a b",            # phrase at end
        "u8": "a b",                  # exact doc == phrase
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "pos_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=4, buckets_per_salt_group=2,
                            stem=False, from_html=False, positions=True))
    s = Searcher(idx)
    assert s.reader.stats["positions"] is True

    docs_ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": list(texts.values())}))
    url_order = list(texts)

    for phrase in ("a b", "a a", "a b a", "a", "z b"):
        got = s.search_phrase(phrase)
        # map index doc_ids -> urls -> fixture row order
        from rse_ray.pipelines.search import hydrate_urls
        by_url = {u: n for _, n, u in hydrate_urls(idx, got)}
        want_df = phrase_match(docs_ds, phrase).to_pandas()
        want = {url_order[int(r.doc_id)]: int(r.n_matches)
                for r in want_df.itertuples(index=False)}
        assert by_url == want, phrase

    # an unindexed phrase term -> empty, not error
    assert s.search_phrase("zz yy") == []


def test_positional_index_proximity(ray_session, tmp_path):
    """search_proximity vs hand-computed min distances, including
    multi-occurrence docs and a doc missing one term."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    texts = {
        "u1": "a x x b",         # dist 3
        "u2": "a b x a",         # dist 1 (first pair)
        "u3": "b x x x a x b",   # dist 2 (a at 4, b at 6)
        "u4": "a only here",
        "u5": "b b b",
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "prox_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False, positions=True))
    s = Searcher(idx)
    got = {u: n for _, n, u in
           hydrate_urls(idx, s.search_proximity("a", "b"))}
    assert got == {"u1": 3, "u2": 1, "u3": 2}
    assert s.search_proximity("a", "zz") == []


def test_tombstone_deletes_and_filtered_search(ray_session, tmp_path):
    """delete_urls masks docs from EVERY query path (TAAT, prefix,
    phrase, proximity) without touching surviving docs' scores
    (Lucene stale-stats semantics); the allowed whitelist restricts
    top-k the same way."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher, delete_urls, hydrate_urls

    texts = {
        "u1": "apple banana apple",
        "u2": "apple banana",
        "u3": "banana apple cherry",
        "u4": "apple",
        "u5": "banana cherry",
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "del_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False, positions=True))

    before = {u: sc for _, sc, u in
              hydrate_urls(idx, Searcher(idx).search("apple banana", k=10))}
    assert set(before) == {"u1", "u2", "u3", "u4", "u5"}

    assert delete_urls(idx, ["u2", "u5", "nope://missing"]) == 2
    s = Searcher(idx)
    after = {u: sc for _, sc, u in
             hydrate_urls(idx, s.search("apple banana", k=10))}
    assert set(after) == {"u1", "u3", "u4"}
    for u in after:   # survivors keep their exact stale-stats scores
        assert abs(after[u] - before[u]) < 1e-12
    # bmw mode transparently falls back to the masked TAAT path
    assert s.search("apple banana", k=10, mode="bmw") == \
        s.search("apple banana", k=10)
    # every other query path masks too
    assert {u for _, _, u in hydrate_urls(
        idx, s.search_prefix("ba", k=10))} == {"u1", "u3"}
    assert {u for _, _, u in hydrate_urls(
        idx, s.search_phrase("apple banana"))} == {"u1"}
    assert {u for _, _, u in hydrate_urls(
        idx, s.search_proximity("banana", "cherry"))} == {"u3"}
    # delete_urls is idempotent / cumulative
    assert delete_urls(idx, ["u2", "u1"]) == 3
    assert {u for _, _, u in hydrate_urls(
        idx, Searcher(idx).search("apple", k=10))} == {"u3", "u4"}

    # allowed whitelist on a fresh index
    idx2 = str(tmp_path / "filt_idx")
    build_index(ray.data.from_pandas(rows), idx2,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s2 = Searcher(idx2)
    full = s2.search("apple banana", k=10)
    import numpy as np
    allowed = np.sort(np.array([d for d, _ in full[:2]], dtype=np.int64))
    got = s2.search("apple banana", k=10, allowed=allowed)
    assert [d for d, _ in got] == sorted(
        allowed, key=lambda d: dict(full)[d], reverse=True)
    for d, sc in got:
        assert abs(sc - dict(full)[d]) < 1e-12


def test_compact_index_equals_fresh_build(ray_session, tmp_path):
    """compact_index after delete_urls must produce an index IDENTICAL
    to a from-scratch build over the surviving corpus: byte-identical
    shard files, equal stats, equal BM25 results — and exact
    (recomputed) stats, unlike the stale-stats tombstone phase."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index, compact_index
    from rse_ray.pipelines.search import Searcher, delete_urls, hydrate_urls
    from rse_ray.state.manifest import read_json

    rng = np.random.default_rng(3)
    words = ["apple", "banana", "cherry", "dates", "elder", "fig"]
    urls = [f"u{i:03d}" for i in range(30)]
    texts = {u: " ".join(rng.choice(words, size=rng.integers(3, 12)))
             for u in urls}
    rows = pd.DataFrame({
        "url": urls, "text": [texts[u] for u in urls],
        "warc_ts": pd.Timestamp("2024-12-01")})
    cfg = lambda: BuildConfig(num_buckets=4, buckets_per_salt_group=2,
                              stem=False, from_html=False)

    idx = str(tmp_path / "compact_idx")
    build_index(ray.data.from_pandas(rows), idx, cfg())
    dead = ["u003", "u007", "u019"]
    delete_urls(idx, dead)
    m = compact_index(idx, cfg())
    assert m["status"] == "done"
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))

    idx_fresh = str(tmp_path / "fresh_idx")
    surviving = rows[~rows["url"].isin(dead)].reset_index(drop=True)
    build_index(ray.data.from_pandas(surviving), idx_fresh, cfg())

    # stats recomputed exactly
    sa = read_json(os.path.join(idx, "stats.json"))
    sb = read_json(os.path.join(idx_fresh, "stats.json"))
    assert sa["num_docs"] == sb["num_docs"] == 27
    assert sa["avgdl"] == sb["avgdl"]

    # shard files byte-identical
    fa = sorted(os.listdir(os.path.join(idx, "shards")))
    fb = sorted(os.listdir(os.path.join(idx_fresh, "shards")))
    shards_a = [f for f in fa if f.endswith(".parquet")]
    assert shards_a == [f for f in fb if f.endswith(".parquet")]
    for f in shards_a:
        wa = open(os.path.join(idx, "shards", f), "rb").read()
        wb = open(os.path.join(idx_fresh, "shards", f), "rb").read()
        assert wa == wb, f

    # query equality through urls (doc ids re-minted identically)
    ha = {u: sc for _, sc, u in
          hydrate_urls(idx, Searcher(idx).search("apple banana", k=30))}
    hb = {u: sc for _, sc, u in
          hydrate_urls(idx_fresh,
                       Searcher(idx_fresh).search("apple banana", k=30))}
    assert ha == hb and not set(dead) & set(ha)

    # idempotent re-entry with no tombstones
    assert compact_index(idx, cfg())["status"] == "done"


def test_compact_positional_then_refresh_equals_fresh(ray_session,
                                                      tmp_path):
    """Round-4 VERDICT item 7 — the lifecycle composes on a
    positions=True index: delete_urls -> compact_index rewrites the
    positional payloads byte-identically to a from-scratch positional
    build over the survivors (phrase/proximity answers included), and
    a refresh_index on the COMPACTED index that re-adds the deleted
    docs restores an index logically identical to a from-scratch
    positional build over the full corpus."""
    import pandas as pd
    import pyarrow.parquet as pqt
    import ray.data

    from rse_ray.pipelines.build import (BuildConfig, build_index,
                                         compact_index, refresh_index)
    from rse_ray.pipelines.search import Searcher, delete_urls, \
        hydrate_urls

    rng = np.random.default_rng(11)
    words = ["hash", "join", "scan", "sort", "merge", "probe"]
    urls = [f"u{i:03d}" for i in range(40)]
    t0 = pd.Timestamp("2024-12-01")
    rows = pd.DataFrame({
        "url": urls,
        "text": [" ".join(rng.choice(words,
                                     size=int(rng.integers(4, 14))))
                 for _ in urls],
        "warc_ts": t0})
    cfg = lambda: BuildConfig(num_buckets=4, buckets_per_salt_group=2,
                              stem=False, from_html=False,
                              positions=True)

    def shard_bytes(idx):
        d = os.path.join(idx, "shards")
        return {f: open(os.path.join(d, f), "rb").read()
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")}

    def answers(idx):
        s = Searcher(idx)
        return {
            "phrase": sorted(hydrate_urls(idx,
                                          s.search_phrase("hash join"))),
            "prox": sorted(hydrate_urls(idx,
                                        s.search_proximity("scan",
                                                           "sort"))),
            "bm25": sorted(hydrate_urls(idx,
                                        s.search("hash merge", k=40))),
        }

    idx = str(tmp_path / "pos_idx")
    build_index(ray.data.from_pandas(rows), idx, cfg())
    dead = ["u004", "u011", "u029"]
    delete_urls(idx, dead)
    assert compact_index(idx, cfg())["status"] == "done"
    # positional payload survived the rewrite for every surviving doc
    first_shard = sorted(f for f in os.listdir(
        os.path.join(idx, "shards")) if f.endswith(".parquet"))[0]
    sh = pqt.read_table(os.path.join(idx, "shards", first_shard))
    assert "pospayload" in sh.column_names

    fresh_surv = str(tmp_path / "fresh_surv")
    surviving = rows[~rows["url"].isin(dead)].reset_index(drop=True)
    build_index(ray.data.from_pandas(surviving), fresh_surv, cfg())
    assert shard_bytes(idx) == shard_bytes(fresh_surv)
    assert answers(idx) == answers(fresh_surv)

    # refresh the COMPACTED index with the deleted docs re-added
    # (strictly newer ts) -> logically the full corpus again
    readd = rows[rows["url"].isin(dead)].copy()
    readd["warc_ts"] = t0 + pd.Timedelta(days=1)
    assert refresh_index(ray.data.from_pandas(
        readd.reset_index(drop=True)), idx, cfg())["status"] == "done"

    fresh_full = str(tmp_path / "fresh_full")
    full = pd.concat([surviving, readd]).reset_index(drop=True)
    build_index(ray.data.from_pandas(full), fresh_full, cfg())
    assert answers(idx) == answers(fresh_full)
    sa = Searcher(idx)
    sb = Searcher(fresh_full)
    assert sa.N == sb.N == 40 and sa.avgdl == sb.avgdl


def test_review_fixes_positional_and_lifecycle(ray_session, tmp_path):
    """Round-3 review fixes: (a) conjunctive never silently degrades
    to OR under mode='bmw'; (b) a resumed build whose positions flag
    flipped rebuilds segments instead of reusing the wrong shape;
    (c) the distributed searcher masks tombstones identically to the
    driver Searcher; (d) a compaction killed right after tombstone
    retirement resumes idempotently from the .compacting file."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index, compact_index
    from rse_ray.pipelines.search import (
        DistributedSearcher,
        Searcher,
        delete_urls,
        hydrate_urls,
    )

    texts = {f"u{i:02d}": t for i, t in enumerate(
        ["apple banana", "apple apple cherry", "banana cherry apple",
         "cherry", "apple banana banana", "banana", "apple cherry",
         "apple banana cherry"])}
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    mkcfg = lambda pos: BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                                    stem=False, from_html=False,
                                    positions=pos)

    # (b) positions-flag flip on resume rebuilds segments
    idx = str(tmp_path / "flip_idx")
    build_index(ray.data.from_pandas(rows), idx, mkcfg(False))
    os.unlink(os.path.join(idx, "_MANIFEST.json"))
    build_index(ray.data.from_pandas(rows), idx, mkcfg(True))
    s = Searcher(idx)
    assert s.reader.stats["positions"] is True
    got = {u: n for _, n, u in
           hydrate_urls(idx, s.search_phrase("apple banana"))}
    assert got == {"u00": 1, "u04": 1, "u07": 1}
    # warm re-query hits the position LRU, identical result
    assert {u: n for _, n, u in
            hydrate_urls(idx, s.search_phrase("apple banana"))} == got

    # (a) conjunctive via mode='bmw' == conjunctive TAAT (never OR)
    conj = s.search("apple banana", k=10, conjunctive=True)
    assert s.search("apple banana", k=10, mode="bmw",
                    conjunctive=True) == conj
    assert len(conj) < len(s.search("apple banana", k=10))

    # (c) distributed searcher masks tombstones like the driver
    delete_urls(idx, ["u07"])
    s2 = Searcher(idx)
    want = s2.search("apple banana", k=10)
    ds = DistributedSearcher(idx, num_actors=2)
    assert ds.search("apple banana", k=10) == want
    assert "u07" not in {u for _, _, u in hydrate_urls(idx, want)}

    # (d) crash right after tombstone retirement: the rename to
    # .compacting already happened; compact_index must resume from it
    os.rename(os.path.join(idx, "tombstones.parquet"),
              os.path.join(idx, "tombstones.compacting.parquet"))
    m = compact_index(idx, mkcfg(True))
    assert m["status"] == "done"
    assert not os.path.exists(
        os.path.join(idx, "tombstones.compacting.parquet"))
    s3 = Searcher(idx)
    assert s3.N == 7 and s3.deleted is None
    assert "u07" not in {u for _, _, u in hydrate_urls(
        idx, s3.search("apple banana", k=10))}
    # positional queries still work on the compacted positional index
    assert {u for _, _, u in hydrate_urls(
        idx, s3.search_phrase("apple banana"))} == {"u00", "u04"}


def test_more_like_this(ray_session, tmp_path):
    """MLT term selection = top-m tf*idf with term-asc tie-break;
    source doc excluded; equals the explicit OR query over the
    selected terms."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    texts = {
        "u1": "apple apple banana zebra",   # src: apple tf=2; zebra df=2
        "u2": "apple banana cherry",
        "u3": "cherry cherry",
        "u4": "banana banana",
        "u5": "apple zebra zebra",
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "mlt_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)
    # resolve u1's index id via the docmap
    import pyarrow.parquet as pq
    import os as _os
    ids = {}
    for f in sorted(_os.listdir(_os.path.join(idx, "docs"))):
        if f.endswith(".parquet"):
            t = pq.read_table(_os.path.join(idx, "docs", f),
                              columns=["doc_id", "url"])
            ids.update({u: int(d) for d, u in
                        zip(t.column("doc_id").to_numpy(),
                            t.column("url").to_pylist())})
    # m=2: top terms of u1 by tf*idf must be {apple, zebra} (tf 2 and
    # the rarer term), not banana (tf 1, common)
    hits = s.more_like_this(ids["u1"], m=2, k=10)
    got = {u: sc for _, sc, u in hydrate_urls(idx, hits)}
    assert "u1" not in got
    want_full = {u: sc for _, sc, u in hydrate_urls(
        idx, s.search("apple zebra", k=10))}
    want = {u: sc for u, sc in want_full.items() if u != "u1"}
    assert got == want


def test_prf_expands_query(ray_session, tmp_path):
    """Rocchio PRF: expansion terms from the feedback docs pull in
    documents sharing NO original query term; fb_terms=0 degenerates
    to plain BM25; expansion weights follow beta."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    texts = {
        "u1": "apple banana",            # feedback hit for 'apple'
        "u2": "apple banana banana",     # feedback hit, banana-heavy
        "u3": "banana banana cherry",    # NO query term — only PRF finds it
        "u4": "cherry cherry",           # unreachable either way
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "prf_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)
    plain = {u for _, _, u in hydrate_urls(idx, s.search("apple", k=10))}
    assert plain == {"u1", "u2"}
    # fb_terms=0: PRF degenerates to the plain query
    got0 = hydrate_urls(idx, s.search_prf("apple", k=10, fb_docs=2,
                                          fb_terms=0))
    assert [(u, sc) for _, sc, u in got0] == \
        [(u, sc) for _, sc, u in hydrate_urls(idx, s.search("apple", k=10))]
    # fb_terms=1: 'banana' (top offer weight in u1+u2) expands the
    # query and u3 becomes reachable; u4 (cherry only) stays out
    got1 = {u for _, _, u in hydrate_urls(
        idx, s.search_prf("apple", k=10, fb_docs=2, fb_terms=1))}
    assert got1 == {"u1", "u2", "u3"}


def test_index_stats_metadata_only(ray_session, tmp_path):
    """index_stats reads stats.json + shard directories only, and the
    numbers equal hand counts over the corpus."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import index_stats

    texts = {"u1": "a b a", "u2": "b c", "u3": ""}
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "stats_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    got = index_stats(idx)
    assert got == {"num_docs": 3, "num_tokens": 5,
                   "avgdl": round(5 / 3, 9),
                   "num_terms": 3,        # a, b, c
                   "num_postings": 4}     # a@u1 b@u1 b@u2 c@u2


def test_best_snippets_window_selection(ray_session, tmp_path):
    """The selected window maximizes DISTINCT query terms (both terms
    beat a repeat of one), ties pick the earliest window, short docs
    yield one whole-doc window."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher

    texts = {
        # apple at 0 and 4, banana at 5: the width-3 window [3..5]
        # ("x apple banana") holds BOTH terms; window [0..2] only one
        "u1": "apple x y x apple banana z",
        "u2": "apple pie",                  # shorter than width
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "snip_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)
    got = {r[3]: (r[1], r[2])
           for r in s.best_snippets("apple banana", k=10, width=3)}
    assert got["x apple banana"] == (3, 2)
    assert got["apple pie"] == (0, 1)


def test_min_match_bridges_or_and_conjunctive(ray_session, tmp_path):
    """min_match=1 == plain OR, min_match=n_terms == conjunctive, and
    in between only docs with >= m distinct terms survive, scored by
    the terms they have."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    rows = pd.DataFrame({
        "url": [f"u{i}" for i in range(6)],
        "text": ["apple banana cherry", "apple banana", "apple",
                 "banana", "cherry apple", "durian"],
        "warc_ts": pd.Timestamp("2024-12-01"),
    })
    idx = str(tmp_path / "msm_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)
    q = "apple banana cherry"
    assert s.search(q, k=10, min_match=1) == s.search(q, k=10)
    assert s.search(q, k=10, min_match=3) == \
        s.search(q, k=10, conjunctive=True)
    m2 = {u for _, _, u in hydrate_urls(idx, s.search(q, k=10,
                                                      min_match=2))}
    assert m2 == {"u0", "u1", "u4"}
    # scores = contributions of the PRESENT terms only: u1's 2-term
    # score under min_match=2 equals its score in the plain OR run
    or_scores = {u: sc for _, sc, u in
                 hydrate_urls(idx, s.search(q, k=10))}
    m2_scores = {u: sc for _, sc, u in
                 hydrate_urls(idx, s.search(q, k=10, min_match=2))}
    assert m2_scores["u1"] == or_scores["u1"]
    # min_match above the found-term count empties the result
    assert s.search(q, k=10, min_match=4) == []


def test_distributed_searcher_survives_accumulator_restart(
        built_index, oracle, fixture_pages, ray_session):
    """FAILOVER: killing an accumulator actor mid-session (Ray
    restarts it with an EMPTY slice cache) must not corrupt results —
    the driver detects warm terms missing from the restarted actor's
    stored set, drops them from its residency view, re-ships the
    slices and retries. Results stay oracle-exact before and after
    the crash."""
    import ray

    from rse_ray.pipelines.search import DistributedSearcher

    ds = DistributedSearcher(built_index["index_dir"], num_actors=2,
                             accumulator_actors=2)
    queries = fixture_pages["queries"][::9]
    # warm the caches: first pass ships slices, marks residency
    for q in queries:
        got = ds.search(q["query"], k=10)
        assert got == oracle.search(q["query"], k=10), q["qid"]
    assert ds._resident, "warm pass should have stored slices"

    # crash one accumulator; Ray revives it with empty caches
    ray.kill(ds.accs[0], no_restart=False)

    for q in queries:
        got = ds.search(q["query"], k=10)
        assert got == oracle.search(q["query"], k=10), \
            f"post-restart mismatch qid={q['qid']}"

    # crash a shard actor too: read-only + max_task_retries, so the
    # in-flight resolve retries transparently on the revived actor
    ray.kill(ds.actor_ranges[0][2], no_restart=False)
    for q in queries[:3]:
        got = ds.search(q["query"], k=10)
        assert got == oracle.search(q["query"], k=10), \
            f"post-shard-restart mismatch qid={q['qid']}"
