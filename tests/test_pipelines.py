"""Pipeline-module tests over the driver's sf0.001 tables, cross-checked
against DuckDB where SQL can express the operator (the same pairing the
correctness gate runs at sf0.01 — tools/check_oracle.py runs ALL of
them; here a representative subset keeps the suite fast)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "orders", "customer",
              "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _read(table, cols=None):
    import ray.data

    return ray.data.read_parquet(f"{SF}/{table}.parquet", columns=cols)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            # Arrow round trips can yield [s]/[ns] units; the driver's
            # normalize compares at [us]
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_term_df_matches_sql(ray_session, duck):
    from rse_ray.pipelines.text import term_df

    got = _norm(term_df(_read("documents", ["doc_id", "text"])).to_pandas())
    want = _norm(duck.sql("""
        WITH t0 AS (SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
             FROM documents),
        t AS (SELECT doc_id, term FROM t0 WHERE term <> ''),
        p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM t GROUP BY 1,2)
        SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf
        FROM p GROUP BY term""").df())
    pd.testing.assert_frame_equal(got, want)


def test_exact_dedup_and_last_writer(ray_session, duck):
    from rse_ray.pipelines.dedup import exact_dedup, last_writer_dedup

    got = exact_dedup(_read("documents", ["doc_id", "text"])).to_pandas()
    assert len(got) == 500 and (got["n_copies"] == 1).all()  # no dup texts

    keep = ["user_id", "event_id", "ts", "event_type", "value"]
    lw = _norm(last_writer_dedup(_read("events", keep), "user_id", "ts",
                                 "event_id", keep).to_pandas())
    want = _norm(duck.sql("""
        SELECT user_id, event_id, ts, event_type, value FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) = 1""").df())
    lw["ts"] = lw["ts"].astype("datetime64[us]")
    want["ts"] = want["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(lw, want)


def test_minhash_agrees_with_exact_jaccard(ray_session):
    """MinHash-LSH verified pairs == exact shingle-join pairs at the
    same threshold (verification is exact, and LSH recall at j>=0.5
    with 128 perms / 16 bands is ~1 on this corpus)."""
    from rse_ray.pipelines.dedup import minhash_dedup_pairs, ngram_jaccard_pairs

    mh = minhash_dedup_pairs(_read("documents", ["doc_id", "text"]),
                             threshold=0.5)
    ex = ngram_jaccard_pairs(_read("documents", ["doc_id", "text"]),
                             threshold=0.5, max_bucket=10**9).to_pandas()
    mh_pairs = set(zip(mh["doc_a"], mh["doc_b"]))
    ex_pairs = set(zip(ex["doc_a"].astype(int), ex["doc_b"].astype(int)))
    assert mh_pairs == ex_pairs
    assert mh_pairs, "fixture corpus should contain near-dup pairs"


def test_simhash_pairs_are_near_dups(ray_session):
    from rse_ray.pipelines.dedup import simhash_dup_pairs
    from rse_ray.functions.hashing import exact_jaccard

    pairs = simhash_dup_pairs(_read("documents", ["doc_id", "text"]),
                              max_hamming=3).to_pandas()
    assert len(pairs) > 0
    # spot-check: hamming<=3 simhash pairs should be textually similar
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    sims = [
        exact_jaccard(texts[a].split(), texts[b].split())
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    ]
    assert np.mean(sims) > 0.3


def test_knn_matches_sql(ray_session, duck):
    from rse_ray.pipelines.ann import brute_force_knn

    got = _norm(brute_force_knn(_read("embeddings", ["vec_id", "embedding"]),
                                [0, 1, 2], k=5))
    want = _norm(duck.sql("""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id IN (0, 1, 2)),
        c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
              list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS raw
              FROM q, embeddings e WHERE e.vec_id <> q.query_id)
        SELECT query_id, neighbor_id, round(raw, 6) AS cos FROM c
        QUALIFY row_number() OVER (PARTITION BY query_id
                 ORDER BY raw DESC, neighbor_id) <= 5""").df())
    pd.testing.assert_frame_equal(got, want)


def test_lsh_knn_recall(ray_session):
    """Multi-probe LSH top-k recall vs exact top-k (bucketed search
    trades recall for scan cost; Hamming-1 probes recover most of it)."""
    from rse_ray.pipelines.ann import brute_force_knn, lsh_knn

    exact = brute_force_knn(_read("embeddings", ["vec_id", "embedding"]),
                            [0, 1, 2, 3, 4], k=10)
    approx = lsh_knn(_read("embeddings", ["vec_id", "embedding"]),
                     [0, 1, 2, 3, 4], k=10, n_planes=4, multiprobe=1)
    hits = 0
    total = 0
    for q in (0, 1, 2, 3, 4):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total > 0.3  # 5/16 buckets probed at n_planes=4


def test_media_features_stub(ray_session):
    import ray.data

    from rse_ray.pipelines.multimodal import (
        MediaDecoder,
        make_fake_media_table,
        media_features,
    )

    t = make_fake_media_table(n=32)
    out = media_features(ray.data.from_arrow(t), concurrency=2).to_pandas()
    assert len(out) == 32
    assert set(out.columns) == {"media_id", "kind", "bytes_len", "checksum",
                                "width", "features"}
    assert all(len(f) == 32 for f in out["features"])
    assert "payload" not in out.columns  # bytes dropped after decode
    # determinism
    out2 = media_features(ray.data.from_arrow(t), concurrency=2).to_pandas()
    assert out.sort_values("media_id")["checksum"].tolist() == \
        out2.sort_values("media_id")["checksum"].tolist()
    with pytest.raises(NotImplementedError):
        MediaDecoder(backend="real")


def test_lang_id_deterministic(ray_session):
    from rse_ray.pipelines.text import lang_id

    a = lang_id(_read("documents", ["doc_id", "text"])).to_pandas()
    b = lang_id(_read("documents", ["doc_id", "text"])).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["lang_pred"]) <= {"en", "de", "fr", "es"}


def test_rolling_fingerprint_properties():
    from rse_ray.functions.hashing import rolling_fingerprint

    # varied text so fingerprints are distinct (repetitive text
    # collapses the selected-hash set by design)
    t = " ".join(f"w{i * 37 % 1009}x{i}" for i in range(400))
    fp = rolling_fingerprint(t)
    assert fp == rolling_fingerprint(t)  # deterministic
    assert len(set(fp)) > 10
    # content-defined: a local edit affects only nearby fingerprints
    t2 = t[: len(t) // 2] + "X" + t[len(t) // 2:]
    fp2 = rolling_fingerprint(t2)
    inter = len(set(fp) & set(fp2))
    assert inter / len(set(fp)) >= 0.5
    assert rolling_fingerprint("") == []


def test_regex_token_counts_matches_sql(ray_session, duck):
    from rse_ray.pipelines.text import BPE_PATTERN, regex_token_counts

    got = _norm(regex_token_counts(_read("documents", ["doc_id", "text"]))
                .to_pandas())
    pat = BPE_PATTERN.replace("'", "''")
    want = _norm(duck.sql(f"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_ws_tokens,
               len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_bpe_tokens
        FROM documents""").df())
    pd.testing.assert_frame_equal(got, want)


def test_winnow_fingerprints_oracle(ray_session):
    """Ray flat-map == direct per-doc rolling_fingerprint calls, and
    fingerprints are shift-robust (shared content -> shared fps)."""
    import pyarrow.parquet as pq

    from rse_ray.functions.hashing import rolling_fingerprint
    from rse_ray.pipelines.text import winnow_fingerprints

    got = (winnow_fingerprints(_read("documents", ["doc_id", "text"]))
           .to_pandas().sort_values(["doc_id", "fp"]).reset_index(drop=True))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    rows = [(int(d), fp) for d, t in zip(docs["doc_id"], docs["text"])
            for fp in rolling_fingerprint(t, window=64, mod_bits=4)]
    want = (pd.DataFrame(rows, columns=["doc_id", "fp"])
            .sort_values(["doc_id", "fp"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # shift-robustness: prefixing text leaves interior fingerprints shared
    t = str(docs["text"].iloc[0])
    a = set(rolling_fingerprint(t, window=64, mod_bits=4))
    b = set(rolling_fingerprint("PREFIX " * 3 + t, window=64, mod_bits=4))
    assert a & b


def test_cosine_neardup_hot_label_chunked(ray_session):
    """One hot label (every vector shares label 0) must not concentrate
    an n x n matmul in one task: the chunk-pair grid splits it while
    the pair set stays exactly equal to the single-matmul reference."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import _normalize, cosine_neardup_pairs

    rng = np.random.default_rng(8)
    n, d = 3000, 16
    base = rng.standard_normal((50, d))
    mat32 = (base[rng.integers(0, 50, size=n)]
             + 0.05 * rng.standard_normal((n, d))).astype(np.float32)
    tbl = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
         "embedding": pa.array(mat32.tolist(), type=pa.list_(pa.float32())),
         "label": pa.array(np.zeros(n, dtype=np.int32))}
    )
    got = cosine_neardup_pairs(ray.data.from_arrow(tbl), threshold=0.98,
                               max_bucket=256)
    nm = _normalize(mat32.astype(np.float64))
    sims = nm @ nm.T
    iu, ju = np.triu_indices(n, k=1)
    sel = sims[iu, ju] >= 0.98
    want = pd.DataFrame(
        {"vec_a": iu[sel].astype(np.int64), "vec_b": ju[sel].astype(np.int64),
         "cos": np.round(sims[iu[sel], ju[sel]], 6)}
    ).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    assert len(want) > 100, "fixture produced too few near-dup pairs"
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_dup_clusters_transitive_and_keep_representative(ray_session):
    """a~b and b~c near-dups share one cluster (connected components),
    and keep-representative retains exactly cluster minima + unpaired
    docs."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.dedup import dedup_keep_representative, dup_clusters

    base = " ".join(f"w{i}" for i in range(40))
    docs = {
        0: base,
        1: base + " x1",
        2: base + " x1 x2",
        50: "completely different text here " * 5,
    }
    tbl = pa.table({"doc_id": pa.array(list(docs), type=pa.int64()),
                    "text": pa.array(list(docs.values()))})
    cl = dup_clusters(ray.data.from_arrow(tbl), threshold=0.5)
    got = dict(zip(cl["doc_id"], cl["cluster_id"]))
    assert got.get(0) == got.get(1) == got.get(2) == 0
    assert 50 not in got
    kept = dedup_keep_representative(
        ray.data.from_arrow(tbl), threshold=0.5
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 50]


def test_ivf_knn_recall(ray_session):
    """IVF top-k recall vs exact top-k; nprobe=nlist must be EXACT
    (every list probed == brute force)."""
    from rse_ray.pipelines.ann import brute_force_knn, ivf_knn

    exact = brute_force_knn(_read("embeddings", ["vec_id", "embedding"]),
                            [0, 1, 2, 3, 4], k=10)
    full = ivf_knn(_read("embeddings", ["vec_id", "embedding"]),
                   [0, 1, 2, 3, 4], k=10, nlist=8, nprobe=8)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True)
    )
    approx = ivf_knn(_read("embeddings", ["vec_id", "embedding"]),
                     [0, 1, 2, 3, 4], k=10, nlist=16, nprobe=4)
    hits = total = 0
    for q in (0, 1, 2, 3, 4):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total > 0.3  # 4/16 lists probed


def test_ivf_quantizer_uniform_sample_on_sorted_corpus(ray_session):
    """Round-3 fix: the coarse quantizer samples uniformly by
    splitmix(vec_id), not the corpus HEAD — on a corpus SORTED by
    cluster (the normal case at scale: ordered by source/date/topic) a
    head sample sees one cluster and recall collapses; the uniform
    sample must keep recall high. nprobe=nlist stays exact."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import brute_force_knn, ivf_knn

    rng = np.random.default_rng(7)
    ncl, per, d = 8, 256, 16
    centers = rng.standard_normal((ncl, d)) * 5.0
    vecs = np.concatenate(
        [centers[c] + 0.1 * rng.standard_normal((per, d)) for c in range(ncl)]
    )
    ids = np.arange(ncl * per, dtype=np.int64)  # label-sorted order
    tbl = pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([v.tolist() for v in vecs],
                               type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(tbl)
    queries = [int(c * per + 5) for c in range(ncl)]  # one per cluster

    exact = brute_force_knn(ds, queries, k=10)
    approx = ivf_knn(ds, queries, k=10, nlist=8, nprobe=2,
                     )
    hits = total = 0
    for q in queries:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total > 0.9, f"recall {hits}/{total} on sorted corpus"

    full = ivf_knn(ds, queries, k=10, nlist=8, nprobe=8)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True)
    )


def test_parts_for_input_derived():
    """Shared shuffle fan-out helper (round-3): power-of-two, clamped,
    monotone in input size, never CPU-derived."""
    from rse_ray.util import parts_for

    assert parts_for(0) == 32
    assert parts_for(500) == 32              # sf0.01 stays at the floor
    assert parts_for(1_600_000) == 32
    assert parts_for(3_200_000) == 64
    assert parts_for(62_500_000) == 2048     # sf100-ish fans out
    assert parts_for(10**12) == 8192         # hard cap
    for n in (10, 10**5, 10**7, 10**9):
        p = parts_for(n)
        assert p & (p - 1) == 0              # power of two
    assert parts_for(300_000, rows_per_part=25_000, min_parts=8,
                     max_parts=64, pow2=False) == 12


def test_default_num_parts_executes_upstream_once():
    """Round-3 VERDICT item 4: `num_parts=None` used to derive the
    shuffle fan-out via ds.count(), which EXECUTES a lazily-chained
    input once for the count and again for the real consume. plan_rows
    now resolves the size from parquet footers, so an expensive
    upstream map must run exactly once per input row. A counter actor
    tallies rows flowing through the chained map; after consuming each
    entry point, the tally equals the input row count — not 2x.

    Runs in its OWN subprocess Ray session (round-4 VERDICT item 3):
    under the shared pytest session, object-store pressure from
    earlier tests can evict blocks and trigger lineage recomputation,
    re-running enough individual blocks to cross the tolerance even
    though the planning path is single-pass. A fresh low-pressure
    session makes such retries rare; the 1.5n tolerance (the count()
    defect lands at exactly 2n) absorbs any that remain."""
    import subprocess
    import sys
    from pathlib import Path

    script = r'''
import ray
import ray.data

# small explicit object store: the default grabs ~1/3 of system RAM
# from /dev/shm, which the long-lived pytest session cluster already
# holds a large slice of — racing it for the remainder can fail this
# cluster's startup mid-suite. The fixture data is tiny.
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR", object_store_memory=2_000_000_000)
ray.data.DataContext.get_current().enable_progress_bars = False

from rse_ray.pipelines.ann import train_ivf_centroids
from rse_ray.pipelines.dedup import minhash_candidate_pairs
from rse_ray.pipelines.linkgraph import jaccard_links

SF = "/root/testdata/sf0.001"


def _read(table, cols=None):
    return ray.data.read_parquet(f"{SF}/{table}.parquet",
                                 columns=cols)


@ray.remote
class Tally:
    def __init__(self):
        self.n = 0

    def add(self, k):
        self.n += int(k)

    def get(self):
        return self.n


def chained(table, cols, tally):
    def bump(b):
        ray.get(tally.add.remote(b.num_rows))
        return b
    return _read(table, cols).map_batches(bump,
                                          batch_format="pyarrow")


def assert_single_pass(tally, n, label):
    got = ray.get(tally.get.remote())
    assert n <= got < 1.5 * n, f"{label}: {got} rows for n={n}"


t1 = Tally.remote()
docs = chained("documents", ["doc_id", "text"], t1)
n_docs = _read("documents").count()  # metadata-only
minhash_candidate_pairs(docs).materialize()
assert_single_pass(t1, n_docs, "minhash")

t2 = Tally.remote()
ev = chained("events", ["user_id", "event_type"], t2) \
    .map_batches(lambda b: b.rename_columns(["src_url", "dst_url"]),
                 batch_format="pyarrow")
n_ev = _read("events").count()
jaccard_links(ev).materialize()
assert_single_pass(t2, n_ev, "jaccard")

t3 = Tally.remote()
emb = chained("embeddings", ["vec_id", "embedding"], t3)
n_emb = _read("embeddings").count()
train_ivf_centroids(emb)
assert_single_pass(t3, n_emb, "ivf")

ray.shutdown()
print("SINGLE_PASS_OK")
'''
    repo = str(Path(__file__).resolve().parents[1])
    r = subprocess.run([sys.executable, "-c", script], cwd=repo,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0 and "SINGLE_PASS_OK" in r.stdout, \
        f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"


def test_minhash_distributed_cand_dedup_identical(ray_session):
    """Forcing the distributed cross-band candidate dedup branch
    (driver_pairs_threshold=0) must yield the identical verified pair
    set as the driver-side drop_duplicates branch."""
    from rse_ray.pipelines.dedup import minhash_dedup_pairs

    a = minhash_dedup_pairs(_read("documents", ["doc_id", "text"]),
                            threshold=0.5)
    b = minhash_dedup_pairs(_read("documents", ["doc_id", "text"]),
                            threshold=0.5, driver_pairs_threshold=0)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert len(a) > 0


def test_dup_clusters_label_prop_equals_union_find(ray_session):
    """The distributed min-label-propagation clustering must produce
    exactly the driver union-find clusters — on the fixture pair graph
    AND on a synthetic multi-hop chain graph (propagation needs
    several rounds there; union-find gets it in one pass)."""
    from rse_ray.pipelines.dedup import dup_clusters

    docs = _read("documents", ["doc_id", "text"])
    uf = dup_clusters(docs, threshold=0.5)
    lp = dup_clusters(docs, threshold=0.5, method="label_prop")
    pd.testing.assert_frame_equal(uf.reset_index(drop=True), lp)
    assert len(uf) > 0

    # chain 0-1-2-...-9 plus a disjoint triangle {100,101,102}: labels
    # need ~5 rounds to reach the chain tail
    pairs = pd.DataFrame(
        {"doc_a": list(range(9)) + [100, 100, 101],
         "doc_b": list(range(1, 10)) + [101, 102, 102]}
    )
    uf2 = dup_clusters(pairs=pairs)
    lp2 = dup_clusters(pairs=pairs, method="label_prop")
    pd.testing.assert_frame_equal(uf2.reset_index(drop=True), lp2)
    assert set(lp2[lp2["doc_id"] >= 100]["cluster_id"]) == {100}
    assert set(lp2[lp2["doc_id"] < 100]["cluster_id"]) == {0}


def test_dup_clusters_label_prop_dataset_pairs(ray_session):
    """label_prop must accept the verified-pair list as a
    ray.data.Dataset end-to-end (no driver pandas round-trip) and
    produce the identical clusters as union-find on the same pairs —
    including when the Dataset is split into many small blocks, so a
    node's initial label rows repeat across batches."""
    import ray.data

    from rse_ray.pipelines.dedup import dup_clusters

    pairs = pd.DataFrame(
        {"doc_a": list(range(9)) + [100, 100, 101] + [200],
         "doc_b": list(range(1, 10)) + [101, 102, 102] + [201]}
    )
    pairs_ds = ray.data.from_pandas(pairs).repartition(7)
    uf = dup_clusters(pairs=pairs)
    lp = dup_clusters(pairs=pairs_ds, method="label_prop")
    pd.testing.assert_frame_equal(uf.reset_index(drop=True), lp)
    # union_find on a Dataset collects it (documented) — same answer
    uf_ds = dup_clusters(pairs=ray.data.from_pandas(pairs))
    pd.testing.assert_frame_equal(uf.reset_index(drop=True),
                                  uf_ds.reset_index(drop=True))
    # empty Dataset: typed empty frame, no crash
    lp0 = dup_clusters(
        pairs=ray.data.from_pandas(pairs.iloc[:0]),
        method="label_prop")
    assert len(lp0) == 0 and list(lp0.columns) == ["doc_id",
                                                   "cluster_id"]


def test_orders_by_segment_drops_unmatched_custkeys(ray_session):
    """Inner-join semantics (round-3 review): an o_custkey absent from
    the customer table is DROPPED, not misattributed to the next-larger
    key — and a key beyond max(c_custkey) must not crash the take()."""
    import ray.data

    from rse_ray.pipelines.relational import orders_by_segment

    customer = pd.DataFrame(
        {"c_custkey": [10, 20, 30],
         "c_mktsegment": ["A", "B", "C"]}
    )
    orders = pd.DataFrame(
        # 15 falls between keys, 99 beyond the max, 10/20 match
        {"o_custkey": [10, 15, 20, 99],
         "o_totalprice": [100.0, 7.0, 50.0, 9.0]}
    )
    out = orders_by_segment(
        ray.data.from_pandas(orders), ray.data.from_pandas(customer)
    ).to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    assert list(out["c_mktsegment"]) == ["A", "B"]
    assert list(out["n_orders"]) == [1, 1]
    assert list(out["total_price"]) == [100.0, 50.0]


def test_window_agg_accepts_multiple_windows(ray_session):
    """Window specs like '15min'/'H'/'D' floor correctly (round-3
    review: the unit map rejected everything but h/d/min/s)."""
    import ray.data

    from rse_ray.pipelines.relational import window_agg

    ev = pd.DataFrame(
        {"event_type": ["x"] * 4,
         "ts": pd.to_datetime(["2024-01-01 00:07", "2024-01-01 00:14",
                               "2024-01-01 00:22", "2024-01-01 03:22"]),
         "value": [1.0, 2.0, 4.0, 8.0]}
    )
    ds = ray.data.from_pandas(ev)
    q = window_agg(ds, window="15min").to_pandas().sort_values(
        "window_start").reset_index(drop=True)
    assert list(q["n_events"]) == [2, 1, 1]
    assert list(q["sum_value"]) == [3.0, 4.0, 8.0]
    assert q["window_start"].iloc[0] == pd.Timestamp("2024-01-01 00:00")
    assert q["window_start"].iloc[1] == pd.Timestamp("2024-01-01 00:15")

    d = window_agg(ds, window="D").to_pandas()
    assert list(d["n_events"]) == [4]

    with pytest.raises(ValueError):
        window_agg(ds, window="fortnight")


def test_asof_join_broadcast_equals_partitioned_and_sql(ray_session, duck):
    """asof_join (backward, allow-exact) against DuckDB's ASOF LEFT
    JOIN; broadcast and hash-partitioned strategies must agree with it
    row-for-row (null last_purchase_value for users with no prior
    purchase)."""
    import ray.data
    import pyarrow.compute as pc

    from rse_ray.pipelines.relational import asof_join

    left = _read("events", ["event_id", "ts", "user_id",
                            "event_type", "value"])
    right = _read("events", ["ts", "user_id", "event_type", "value"])\
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("event_type"), "purchase"))
                       .select(["user_id", "ts", "value"]),
            batch_format="pyarrow",
        )
    want = duck.sql("""
        SELECT e.event_id, e.user_id, e.value, p.value AS asof_value
        FROM events e ASOF LEFT JOIN (
            SELECT user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ) p ON e.user_id = p.user_id AND e.ts >= p.ts""").df()

    for strategy in ("broadcast", "partitioned"):
        got = asof_join(left, right, on="ts", by="user_id",
                        value_col="value", out_col="asof_value",
                        strategy=strategy).to_pandas()[
            ["event_id", "user_id", "value", "asof_value"]]
        pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                      check_dtype=False)
    assert want["asof_value"].notna().any()
    assert want["asof_value"].isna().any()


def test_hopping_window_each_event_in_window_over_hop_windows(ray_session):
    """A 3h window hopping every 1h puts each event in exactly 3
    windows; totals triple the tumbling equivalents and window starts
    are hop-aligned."""
    import ray.data

    from rse_ray.pipelines.relational import hopping_window_agg, window_agg

    ev = pd.DataFrame(
        {"event_type": ["x", "x", "y"],
         "ts": pd.to_datetime(["2024-01-01 00:30", "2024-01-01 02:30",
                               "2024-01-01 00:10"]),
         "value": [1.0, 2.0, 8.0]}
    )
    ds = ray.data.from_pandas(ev)
    hop = hopping_window_agg(ds, window="3h", hop="h").to_pandas()
    assert int(hop["n_events"].sum()) == 9  # 3 events x 3 windows
    # the x event at 00:30 and the one at 02:30 share exactly ONE
    # window (00:00), where both count
    x = hop[hop["event_type"] == "x"]
    both = x[x["n_events"] == 2]
    assert list(both["window_start"]) == [pd.Timestamp("2024-01-01 00:00")]
    assert float(both["sum_value"].iloc[0]) == 3.0
    # sum over all hopping windows == window/hop x tumbling sum
    tum = window_agg(ds, window="h").to_pandas()
    assert hop["sum_value"].sum() == 3 * tum["sum_value"].sum()


def test_hash_join_partitioned_matches_sql(ray_session, duck):
    """Co-partitioned large-large inner join == SQL JOIN, including
    dropped unmatched keys on either side and dtype round-trip through
    the null-padded union."""
    from rse_ray.pipelines.relational import hash_join

    orders = _read("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = _read("customer", ["c_custkey", "c_mktsegment"])
    got = hash_join(orders, customer, left_on="o_custkey",
                    right_on="c_custkey", right_cols=["c_mktsegment"],
                    num_parts=7).to_pandas()[
        ["o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"]]
    want = duck.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey""").df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)
    assert got["o_orderkey"].dtype.kind == "i"

    # synthetic: keys on one side only are dropped (inner semantics)
    import ray.data

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 9], "lv": [10.0, 20.0, 90.0]}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"rk": [2, 3], "rv": ["b", "c"]}))
    out = hash_join(left, right, left_on="k", right_on="rk",
                    right_cols=["rv"], num_parts=4).to_pandas()
    assert list(out["k"]) == [2] and list(out["rv"]) == ["b"]


def test_train_val_split_content_keyed_stable(ray_session):
    """The split must be a function of the KEY only: invariant under
    repartitioning and row order, ~val_pct% sized, and filtering by
    keep= agrees with the split column."""
    from rse_ray.pipelines.relational import train_val_split

    docs = _read("documents", ["doc_id", "lang"])
    a = train_val_split(docs, val_pct=10).to_pandas()
    b = train_val_split(docs.repartition(7), val_pct=10).to_pandas()
    am = dict(zip(a["doc_id"], a["split"]))
    bm = dict(zip(b["doc_id"], b["split"]))
    assert am == bm
    frac = (a["split"] == "val").mean()
    assert 0.02 < frac < 0.25  # ~10% at small n
    val_ids = set(train_val_split(docs, val_pct=10, keep="val")
                  .to_pandas()["doc_id"])
    assert val_ids == {d for d, s in am.items() if s == "val"}


def test_top_k_per_group_deterministic_ties(ray_session):
    """Equal order values resolve by the tie column, so the pick is a
    total order, not arrival order."""
    import ray.data

    from rse_ray.pipelines.relational import top_k_per_group

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"],
                       "v": [5, 5, 5, 1, 9],
                       "id": [4, 2, 3, 1, 7]})
    out = top_k_per_group(ray.data.from_pandas(df), group="g", order="v",
                          k=2, tie="id").to_pandas()
    a = out[out["g"] == "a"].sort_values("id")
    assert list(a["id"]) == [2, 3]  # the two smallest ids among the 5s
    assert list(out[out["g"] == "b"]["id"]) == [7]


def test_hash_join_salted_hot_keys_identical_result(ray_session):
    """Salting replicates hot right rows across salt partitions and
    spreads hot left rows, but the JOIN RESULT must be exactly the
    unsalted one — no lost pairs, no duplicates."""
    import ray.data

    from rse_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(5)
    # key 7 is hot on both sides
    lk = np.concatenate([np.full(500, 7), rng.integers(0, 50, 300)])
    left = pd.DataFrame({"k": lk.astype(np.int64),
                         "lv": np.arange(len(lk), dtype=np.int64)})
    rk = np.concatenate([np.full(4, 7), np.arange(0, 50, 2)])
    right = pd.DataFrame({"rk": rk.astype(np.int64),
                          "rv": np.arange(len(rk), dtype=np.int64) * 10})
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    plain = hash_join(lds, rds, left_on="k", right_on="rk",
                      right_cols=["rv"], num_parts=8).to_pandas()
    salted = hash_join(lds, rds, left_on="k", right_on="rk",
                       right_cols=["rv"], num_parts=8,
                       hot_keys=[7], salt=4).to_pandas()
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        plain[key].sort_values(key).reset_index(drop=True),
        salted[key].sort_values(key).reset_index(drop=True),
        check_dtype=False)
    n_left7 = int((left["k"] == 7).sum())
    assert (salted["k"] == 7).sum() == n_left7 * 4  # hot pairs once each


def test_joins_preserve_large_int64_and_drop_null_keys(ray_session):
    """Regression (round-3 review): the co-partitioned union must not
    round int64 values through float64 (ids above 2^53 corrupt
    silently), and null join keys follow SQL semantics — dropped by
    the inner hash join, passed through unmatched by the as-of left
    join."""
    import ray.data

    from rse_ray.pipelines.relational import asof_join, hash_join

    big = 2**53 + 1  # not representable in float64
    left = pd.DataFrame({
        "k": pd.array([1, 1, 2, None], dtype="Int64"),
        "payload": pd.array([big, big + 2, 5, 6], dtype="Int64"),
    })
    right = pd.DataFrame({
        "rk": pd.array([1, None], dtype="Int64"),
        "rv": pd.array([big + 4, 99], dtype="Int64"),
    })
    out = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    left_on="k", right_on="rk", right_cols=["rv"],
                    num_parts=4).to_pandas()
    assert len(out) == 2  # k=2 has no match; null keys dropped
    assert sorted(out["payload"]) == [big, big + 2]  # exact, not rounded
    assert set(out["rv"]) == {big + 4}

    ev_left = pd.DataFrame({
        "uid": pd.array([1, 1, None], dtype="Int64"),
        "ts": pd.to_datetime(["2024-01-02", "2024-01-03", "2024-01-04"]),
        "pay": pd.array([big, big + 2, 7], dtype="Int64"),
    })
    ev_right = pd.DataFrame({
        "uid": pd.array([1, None], dtype="Int64"),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
        "val": [10.0, 99.0],
    })
    for strategy in ("broadcast", "partitioned"):
        got = asof_join(ray.data.from_pandas(ev_left),
                        ray.data.from_pandas(ev_right),
                        on="ts", by="uid", value_col="val",
                        out_col="av", strategy=strategy).to_pandas()
        assert len(got) == 3  # left join: null-key row retained
        byuid = got.sort_values("ts").reset_index(drop=True)
        assert sorted(got.loc[got["uid"].notna(), "pay"]) == [big, big + 2]
        assert got.loc[got["uid"].isna(), "av"].isna().all()
        assert (got.loc[got["uid"].notna(), "av"] == 10.0).all()


def test_hash_join_semi_anti_and_string_keys(ray_session, duck):
    """semi == EXISTS, anti == NOT EXISTS (null left keys kept by anti,
    dropped by semi), and string join keys route through the stable
    siphash partitioner — all against DuckDB on the same frames."""
    import ray.data

    from rse_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": [1, 2, 2, 9, None, 4],
                         "lv": [10.0, 20.0, 21.0, 90.0, 5.0, 40.0]})
    left["k"] = left["k"].astype("Int64")
    right = pd.DataFrame({"rk": [2, 2, 3, 4], "rv": list("bbcd")})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)

    semi = hash_join(lds, rds, left_on="k", right_on="rk",
                     right_cols=[], num_parts=4, how="semi").to_pandas()
    # no duplication from the two matching right rows for k=2
    assert sorted(semi["lv"]) == [20.0, 21.0, 40.0]

    anti = hash_join(lds, rds, left_on="k", right_on="rk",
                     right_cols=[], num_parts=4, how="anti").to_pandas()
    # 9 has no match; the null key matches nothing -> kept
    assert sorted(anti["lv"]) == [5.0, 10.0, 90.0]

    # string keys, all three modes vs DuckDB
    sl = pd.DataFrame({"name": ["ann", "bob", "cat", "dan", "ann"],
                       "x": [1, 2, 3, 4, 5]})
    sr = pd.DataFrame({"rname": ["ann", "cat", "zed"],
                       "tag": ["A", "C", "Z"]})
    slds, srds = ray.data.from_pandas(sl), ray.data.from_pandas(sr)
    inner = hash_join(slds, srds, left_on="name", right_on="rname",
                      right_cols=["tag"], num_parts=4).to_pandas()
    want = sl.merge(sr, left_on="name", right_on="rname")[
        ["name", "x", "tag"]]
    pd.testing.assert_frame_equal(_norm(inner[["name", "x", "tag"]]),
                                  _norm(want), check_dtype=False)
    s_anti = hash_join(slds, srds, left_on="name", right_on="rname",
                       right_cols=[], num_parts=4, how="anti").to_pandas()
    assert sorted(s_anti["name"]) == ["bob", "dan"]

    # semi over the real tables == the broadcast semi-join pipeline
    # (same >min_total order filter applied on the right side)
    import pyarrow.compute as pc

    from rse_ray.pipelines.relational import semi_join_customers_with_orders
    cust = _read("customer", ["c_custkey", "c_name"])
    orders = _read("orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), 400.0))
                   .select(["o_custkey"]),
        batch_format="pyarrow")
    got = hash_join(cust, orders, left_on="c_custkey",
                    right_on="o_custkey", right_cols=[],
                    how="semi").to_pandas()
    want2 = semi_join_customers_with_orders(
        _read("customer", ["c_custkey", "c_name"]),
        _read("orders", ["o_custkey", "o_totalprice"]),
        min_total=400.0).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want2),
                                  check_dtype=False)


def test_sessionize_matches_sql_and_edge_cases(ray_session, duck):
    """Gap sessionization == the SQL lag/cumsum twin; boundary-on-tie
    and exact-gap (NOT a boundary: strict >) cases pinned."""
    import ray.data

    from rse_ray.pipelines.relational import sessionize

    got = sessionize(_read("events", ["user_id", "ts", "value"]),
                     gap_minutes=1440).to_pandas()
    want = duck.sql("""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 1440 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, sid""").df()
    got["total_value"] = got["total_value"].round(5)
    want["total_value"] = want["total_value"].round(5)
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)

    # exact gap == NOT a new session (strict >); tie ts stay together
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": [7, 7, 7, 7],
        "ts": [t0, t0 + pd.Timedelta(minutes=30),
               t0 + pd.Timedelta(minutes=90),
               t0 + pd.Timedelta(minutes=90)],
        "value": [1.0, 2.0, 4.0, 8.0]})
    out = sessionize(ray.data.from_pandas(df), gap_minutes=30,
                     num_parts=2).to_pandas().sort_values("session_start")
    assert list(out["n_events"]) == [2, 2]
    assert list(out["total_value"]) == [3.0, 12.0]


def test_quantiles_exact_and_approx(ray_session, duck):
    """group_quantiles == quantile_cont exactly; approx_quantiles lands
    within one bin width of exact on every group/quantile."""
    from rse_ray.pipelines.relational import approx_quantiles, group_quantiles

    got = group_quantiles(
        _read("lineitem", ["l_returnflag", "l_extendedprice"]),
        group="l_returnflag", col="l_extendedprice").to_pandas()
    want = duck.sql("""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS q25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS q50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS q75,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS q95
FROM lineitem GROUP BY l_returnflag""").df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)

    approx = approx_quantiles(
        _read("lineitem", ["l_returnflag", "l_extendedprice"]),
        group="l_returnflag", col="l_extendedprice", bins=512)
    lo_hi = duck.sql("""SELECT l_returnflag, min(l_extendedprice) lo,
        max(l_extendedprice) hi FROM lineitem GROUP BY 1""").df() \
        .set_index("l_returnflag")
    exact = want.set_index("l_returnflag")
    approx = approx.set_index("l_returnflag")
    for flag in exact.index:
        tol = (lo_hi.loc[flag, "hi"] - lo_hi.loc[flag, "lo"]) / 512 + 1e-9
        for c in ("q25", "q50", "q75", "q95"):
            assert abs(approx.loc[flag, c] - exact.loc[flag, c]) <= tol, \
                (flag, c, approx.loc[flag, c], exact.loc[flag, c], tol)


def test_tfidf_topk_matches_sql(ray_session, duck):
    from rse_ray.pipelines.text import tfidf_topk

    got = tfidf_topk(_read("documents", ["doc_id", "text"]),
                     k=3).to_pandas()
    want = duck.sql("""
WITH toks0 AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
), toks AS (SELECT doc_id, term FROM toks0 WHERE term <> ''),
p AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
d AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
sc AS (SELECT doc_id, term, round(tf * ln(n_docs / df), 6) AS score
       FROM p JOIN d USING (term) CROSS JOIN n)
SELECT doc_id, term, score FROM sc
QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term) <= 3""").df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)


def test_pack_sequences_prefix_and_invariance(ray_session, duck):
    """Global token prefix sum == the SQL running-sum twin, and the
    packing is invariant to input partitioning (content order, not
    arrival order)."""
    from rse_ray.pipelines.text import pack_sequences

    ds = _read("documents", ["doc_id", "text"])
    got = pack_sequences(ds, budget=512).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = duck.sql("""
WITH toks0 AS (SELECT doc_id,
    unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
    FROM documents),
toks AS (SELECT doc_id, term FROM toks0 WHERE term <> ''),
dl AS (SELECT d.doc_id, count(t.term)::BIGINT AS n_tokens
       FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY 1),
pre AS (SELECT doc_id, n_tokens,
        coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
        FROM dl)
SELECT doc_id, n_tokens, (st // 512)::BIGINT AS seq_id,
       (st % 512)::BIGINT AS seq_offset FROM pre ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got2 = pack_sequences(_read("documents", ["doc_id", "text"])
                          .repartition(7), budget=512).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)

    # a doc straddling a boundary starts in the sequence its first
    # token lands in; offsets stay within budget
    assert (got["seq_offset"] < 512).all() and (got["seq_offset"] >= 0).all()


def test_epoch_shuffle_deterministic_permutation(ray_session, duck):
    """pos is a permutation of [0, n); matches the md5_number_lower
    rank twin; different seeds give different permutations; the same
    seed is repartition-invariant."""
    from rse_ray.pipelines.relational import epoch_shuffle

    got = epoch_shuffle(_read("documents", ["doc_id", "lang"]),
                        key="doc_id", seed=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    n = len(got)
    assert sorted(got["pos"]) == list(range(n))
    want = duck.sql("""
SELECT doc_id, lang,
       (row_number() OVER (
            ORDER BY md5_number_lower('3-' || CAST(doc_id AS VARCHAR)),
                     doc_id) - 1)::BIGINT AS pos
FROM documents ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    other = epoch_shuffle(_read("documents", ["doc_id", "lang"]),
                          key="doc_id", seed=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert not (other["pos"].to_numpy() == got["pos"].to_numpy()).all()

    re = epoch_shuffle(_read("documents", ["doc_id", "lang"])
                       .repartition(11), key="doc_id", seed=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, re, check_dtype=False)


def test_decontaminate_flags_shared_ngrams(ray_session):
    """A corpus doc sharing a 3-gram with the benchmark is flagged
    with the exact distinct-shingle hit count; clean docs are 0."""
    import ray.data

    from rse_ray.pipelines.dedup import decontaminate

    bench = pd.DataFrame({
        "doc_id": [1000],
        "text": ["the quick brown fox jumps over the lazy dog"]})
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["we saw the quick brown fox yesterday",   # 2 shared 3-grams
                 "completely unrelated words here",          # clean
                 "quick brown fox jumps again"]})            # 2 shared
    out = decontaminate(ray.data.from_pandas(docs),
                        ray.data.from_pandas(bench), n=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_hits"]) == [2, 0, 2]
    assert list(out["contaminated"]) == [1, 0, 1]


def test_dup_spans_maximal_merged_spans(ray_session):
    """Handcrafted corpus with known duplicate substrings: cross-doc
    shares, a within-doc self-repeat, a clean doc, and two dup regions
    separated by >k unique chars (must stay two spans, not merge)."""
    import ray.data

    from rse_ray.pipelines.dedup import dup_spans

    X, Y = "redgreenblue", "cyanmagenta"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "ABCDEFGHIJzyxwv",            # shares ABCDEFGHIJ with doc 2
            "mnopqrABCDEFGHIJ",           # ... at offset 6
            "uuuuuuuu",                   # self-repeat (count>=2 in-doc)
            "~!@#$%^&*()_",               # fully unique: no spans
            X + "qwertyuiop[" + Y,        # two shared regions, 11-gap
            X + "asdfghjkl;" + Y,         # same regions, 10-gap
        ]})
    for carry in (True, False):
        out = dup_spans(ray.data.from_pandas(docs), k=5,
                        carry_gram=carry).to_pandas()
        got = set(map(tuple, out[["doc_id", "span_start",
                                  "span_len"]].to_numpy()))
        assert got == {
            (1, 0, 10), (2, 6, 10), (3, 0, 8),
            (5, 0, 12), (5, 23, 11),
            (6, 0, 12), (6, 22, 11),
        }, (carry, got)


def test_repetition_scores_degenerate_text(ray_session):
    """Degenerate repetition maxes the scores; fully unique text
    scores 0; short docs score 0 by definition."""
    import ray.data

    from rse_ray.pipelines.text import repetition_scores

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spam spam spam spam spam",
                 "all words here are unique tokens",
                 "single"]})
    out = repetition_scores(ray.data.from_pandas(docs)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "top_bigram_frac"] == 1.0          # 4x same bigram
    assert out.loc[0, "dup_trigram_frac"] == round(1 - 1 / 3, 6)
    assert out.loc[1, "top_bigram_frac"] == round(1 / 5, 6)
    assert out.loc[1, "dup_trigram_frac"] == 0.0
    assert out.loc[2, "top_bigram_frac"] == 0.0
    assert out.loc[2, "dup_trigram_frac"] == 0.0


def test_hll_exact_sql_twin_and_merge_invariance(ray_session, duck):
    """The HLL ESTIMATE (not just the ballpark) matches its generated
    SQL twin, and the register fold is partitioning-invariant."""
    from rse_ray.pipelines.sketch import approx_ndistinct, hll_oracle_sql

    got = approx_ndistinct(_read("events", ["user_id"]), col="user_id")
    want = duck.sql(hll_oracle_sql("user_id", "events")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    exact = duck.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchall()[0][0]
    est = got.iloc[0, 0]
    assert abs(est - exact) / exact < 0.05  # small-card: linear counting

    re = approx_ndistinct(_read("events", ["user_id"]).repartition(9),
                          col="user_id")
    pd.testing.assert_frame_equal(got, re, check_dtype=False)


def test_heavy_hitters_exact_even_when_spread_thin(ray_session, duck):
    """Output == GROUP BY/HAVING exactly, and the merged-residual bound
    recovers a hitter whose per-batch counts are individually below
    every batch's Misra-Gries decrement (the union-of-term-sets
    shortcut would lose it)."""
    import ray.data

    from rse_ray.pipelines.sketch import heavy_hitters

    hh = heavy_hitters(_read("documents", ["doc_id", "text"]),
                       min_count=200, capacity=256)
    want = duck.sql("""
WITH toks0 AS (SELECT unnest(regexp_split_to_array(lower(text), '\\s+'))
                   AS term FROM documents),
toks AS (SELECT term FROM toks0 WHERE term <> '')
SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY 1
HAVING count(*) >= 200 ORDER BY n DESC, term""").df()
    pd.testing.assert_frame_equal(hh, want, check_dtype=False)

    n = 400
    texts = ["rare " + " ".join(f"w{(i * 31 + j) % 997}"
                                for j in range(40)) for i in range(n)]
    adv = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(n), "text": texts})).repartition(16)
    out = heavy_hitters(adv, min_count=300, capacity=8)
    assert int(out[out["term"] == "rare"]["n"].iloc[0]) == n


def test_pattern_scan_pii_counts_and_redaction(ray_session):
    """Handcrafted PII-bearing docs: counts per preset pattern and the
    cascaded redaction length."""
    import ray.data

    from rse_ray.pipelines.text import pattern_scan

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail me at bob@example.com or alice@test.org today",
            "server 10.0.0.1 and 192.168.1.255, ssn 123-45-6789",
            "no pii here at all",
        ]})
    out = pattern_scan(ray.data.from_pandas(docs), redact=True) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_email"]) == [2, 0, 0]
    assert list(out["n_ipv4"]) == [0, 2, 0]
    assert list(out["n_ssn"]) == [0, 1, 0]
    # doc 3 untouched: redacted text == original text
    assert out["redacted_len"][2] == len(docs["text"][2])
    # doc 1: both emails -> <EMAIL> (7 chars each)
    expect1 = len("mail me at <EMAIL> or <EMAIL> today")
    assert out["redacted_len"][0] == expect1


def test_stratified_sample_deterministic_and_nested(ray_session):
    """Same rows on rerun; higher rate yields a superset; zero-rate
    stratum and null group drop entirely."""
    import ray.data

    from rse_ray.pipelines.relational import stratified_sample

    docs = pd.DataFrame({
        "doc_id": range(200),
        "lang": (["en"] * 120 + ["fr"] * 60 + ["zz"] * 19 + [None]),
    })
    ds = ray.data.from_pandas(docs)

    def pick(rates, default=0):
        out = stratified_sample(ds, group="lang", key="doc_id",
                                rates=rates, default_permille=default)
        return set(out.to_pandas()["doc_id"])

    lo = pick({"en": 200, "fr": 500})
    lo2 = pick({"en": 200, "fr": 500})
    hi = pick({"en": 600, "fr": 900})
    assert lo == lo2
    assert lo <= hi
    assert lo  # nonempty at these rates
    # zz stratum has rate 0 (default) and null lang always drops
    zz = {d for d in hi if d >= 180}
    assert not zz


def test_global_rank_ties_and_order(ray_session):
    """Exact ROW_NUMBER semantics: descending by score, ties pinned by
    key ascending, ranks are 1..N with no gaps."""
    import ray.data

    from rse_ray.pipelines.relational import global_rank

    rng = np.random.default_rng(7)
    scores = rng.integers(0, 5, size=300)  # heavy ties
    df = pd.DataFrame({"k": np.arange(300), "s": scores})
    out = global_rank(
        ray.data.from_pandas(df).repartition(7),
        order="s", key="k", descending=True) \
        .to_pandas().sort_values("rank").reset_index(drop=True)
    exp = df.sort_values(["s", "k"], ascending=[False, True]) \
        .reset_index(drop=True)
    assert list(out["rank"]) == list(range(1, 301))
    assert list(out["k"]) == list(exp["k"])
    assert list(out["s"]) == list(exp["s"])


def test_doc_lm_score_matches_reference(ray_session):
    """Add-one bigram LM cross-entropy against an independent
    pure-Python computation; short docs score 0."""
    from collections import Counter

    import ray.data

    from rse_ray.pipelines.text import doc_lm_score

    texts = ["the cat sat on the mat",
             "the cat ran",
             "dog",
             "mat on the cat"]
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": texts})
    out = doc_lm_score(ray.data.from_pandas(docs).repartition(3)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    toks = [t.split() for t in texts]
    cb = Counter(p for ts in toks for p in zip(ts, ts[1:]))
    cp = Counter(p[0] for ts in toks for p in zip(ts, ts[1:]))
    V = len({w for ts in toks for w in ts})
    for i, ts in enumerate(toks):
        pairs = list(zip(ts, ts[1:]))
        if len(ts) < 2:
            assert out["n_bigrams"][i] == 0 and out["cross_entropy"][i] == 0
            continue
        exp = np.mean([-np.log((cb[p] + 1) / (cp[p[0]] + V))
                       for p in pairs])
        assert out["n_bigrams"][i] == len(pairs)
        assert abs(out["cross_entropy"][i] - exp) < 1e-6


def test_pagerank_matches_dense_power_iteration(ray_session):
    """Small graph with real out-degree variation, a dangling node and
    a multi-edge; compare against a dense numpy power iteration with
    identical damping/dangling semantics."""
    import ray.data

    from rse_ray.pipelines.linkgraph import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("a", "b")]  # d has no in-links; e dangling
    edges.append(("c", "e"))          # e: in-link but no out-links
    links = pd.DataFrame({"src_url": [s for s, _ in edges],
                          "dst_url": [t for _, t in edges]})
    out = pagerank(ray.data.from_pandas(links), iters=5, damping=0.85) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    out_ds = pagerank(ray.data.from_pandas(links).repartition(3),
                      iters=5, damping=0.85, engine="dataset") \
        .to_pandas().sort_values("url").reset_index(drop=True)
    # the pregel and dataset engines agree exactly at output rounding
    assert list(out_ds["url"]) == list(out["url"])
    np.testing.assert_allclose(out_ds["rank"].to_numpy(),
                               out["rank"].to_numpy(), rtol=0, atol=2e-6)

    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    N = len(nodes)
    M = np.zeros((N, N))
    odeg = np.zeros(N)
    for s, _ in edges:
        odeg[idx[s]] += 1
    for s, t in edges:
        M[idx[t], idx[s]] += 1.0 / odeg[idx[s]]
    r = np.full(N, 1.0 / N)
    for _ in range(5):
        contrib = M @ r
        dang = 1.0 - contrib.sum()
        r = (1 - 0.85) / N + 0.85 * (contrib + dang / N)
    exp = np.round(r, 6)
    assert list(out["url"]) == nodes
    np.testing.assert_allclose(out["rank"].to_numpy(),
                               exp, rtol=0, atol=2e-6)
    # rank mass conserved
    assert abs(out["rank"].sum() - 1.0) < 1e-4


def test_snapshot_diff_classifies_adds_removes_changes(ray_session):
    """Handcrafted snapshots: added, removed, changed, unchanged (and
    unchanged is omitted from the output)."""
    import ray.data

    from rse_ray.pipelines.relational import snapshot_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["a", "b", "c", "d"]})
    new = pd.DataFrame({"doc_id": [2, 3, 4, 5],
                        "text": ["b", "CHANGED", "d", "e"]})
    out = snapshot_diff(ray.data.from_pandas(old),
                        ray.data.from_pandas(new)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_embedding_covariance_matches_numpy(ray_session):
    """Partial-sum distributed covariance equals np.cov(bias=True)."""
    import ray.data

    from rse_ray.pipelines.ann import embedding_covariance

    rng = np.random.default_rng(3)
    X = rng.normal(size=(120, 5)).astype(np.float32)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(120),
        "embedding": [row for row in X],
    })).repartition(4)
    out = embedding_covariance(ds)
    C = np.cov(X.astype(np.float64), rowvar=False, bias=True)
    got = out.pivot(index="i", columns="j", values="cov").to_numpy()
    np.testing.assert_allclose(got, np.round(C, 6), rtol=0, atol=2e-6)


def test_dup_span_stats_coverage_and_clean_docs(ray_session):
    """Coverage sums the disjoint maximal spans; clean docs report 0;
    clean_len + dup_chars == orig_len always."""
    import ray.data

    from rse_ray.pipelines.dedup import dup_span_stats

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "ABCDEFGHIJzyxwv",    # 10 dup chars (shared with doc 2)
            "mnopqrABCDEFGHIJ",   # 10 dup chars at offset 6
            "~!@#$%^&*()_",       # clean
        ]})
    out = dup_span_stats(ray.data.from_pandas(docs), k=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["dup_chars"]) == [10, 10, 0]
    assert (out["orig_len"] == out["dup_chars"] + out["clean_len"]).all()
    assert list(out["orig_len"]) == [15, 16, 12]


def test_review_fixes_edge_cases(ray_session):
    """Round-3 review regressions: empty graph on BOTH pagerank
    engines, string-keyed snapshot_diff, covariance with an empty
    block, doc_lm_score null text, global_rank NaN refusal."""
    import pytest
    import ray.data

    from rse_ray.pipelines.ann import embedding_covariance
    from rse_ray.pipelines.linkgraph import pagerank
    from rse_ray.pipelines.relational import global_rank, snapshot_diff
    from rse_ray.pipelines.text import doc_lm_score

    empty_links = ray.data.from_pandas(pd.DataFrame(
        {"src_url": pd.Series([], dtype=str),
         "dst_url": pd.Series([], dtype=str)}))
    for eng in ("pregel", "dataset"):
        assert pagerank(empty_links, engine=eng).count() == 0

    old = pd.DataFrame({"url": ["a", "b"], "text": ["x", "y"]})
    new = pd.DataFrame({"url": ["b", "c"], "text": ["Y2", "z"]})
    out = snapshot_diff(ray.data.from_pandas(old),
                        ray.data.from_pandas(new), key="url") \
        .to_pandas()
    assert dict(zip(out["url"], out["status"])) == {
        "a": "removed", "b": "changed", "c": "added"}

    import pyarrow as pa

    emb = pa.table({
        "vec_id": pa.array([0, 1, 2], type=pa.int64()),
        "embedding": pa.array([[1.0, 1.0, 1.0], None, [0.0, 1.0, 2.0]],
                              type=pa.list_(pa.float32()))})
    cov = embedding_covariance(ray.data.from_arrow(emb).repartition(5))
    assert len(cov) == 9  # null vec skipped, empty blocks tolerated

    docs = pd.DataFrame({"doc_id": [1, 2],
                         "text": [None, "a b a b"]})
    lm = doc_lm_score(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert lm["n_bigrams"][0] == 0 and lm["cross_entropy"][0] == 0
    assert lm["n_bigrams"][1] == 3

    nan_df = pd.DataFrame({"k": [1, 2, 3],
                           "s": [1.0, float("nan"), 3.0]})
    with pytest.raises(ValueError, match="null/NaN"):
        global_rank(ray.data.from_pandas(nan_df),
                    order="s", key="k").to_pandas()


def test_crawl_depth_bfs_semantics(ray_session):
    """Known graph: chain, branch, cycle, unreachable island; seeds
    picked by predicate; multi-shard layout exercised explicitly."""
    import ray.data

    from rse_ray.pipelines.linkgraph import crawl_depth

    edges = [("s", "a"), ("a", "b"), ("b", "c"), ("c", "a"),  # cycle
             ("s", "b"),                                     # shortcut
             ("x", "y")]                                     # island
    links = pd.DataFrame({"src_url": [e[0] for e in edges],
                          "dst_url": [e[1] for e in edges]})

    def pred(urls):
        return np.array([u == "s" for u in urls])

    for parts in (None, 3):
        out = crawl_depth(ray.data.from_pandas(links), seed_pred=pred,
                          max_depth=10, num_parts=parts) \
            .to_pandas().sort_values("url").reset_index(drop=True)
        got = dict(zip(out["url"], out["depth"]))
        assert got == {"s": 0, "a": 1, "b": 1, "c": 2}, (parts, got)

    # depth cap: a long chain stops at max_depth
    chain = pd.DataFrame({
        "src_url": [f"n{i}" for i in range(6)],
        "dst_url": [f"n{i + 1}" for i in range(6)]})

    def pred0(urls):
        return np.array([u == "n0" for u in urls])

    out = crawl_depth(ray.data.from_pandas(chain), seed_pred=pred0,
                      max_depth=3).to_pandas()
    assert dict(zip(out["url"], out["depth"])) == {
        "n0": 0, "n1": 1, "n2": 2, "n3": 3}


def test_token_entropy_and_corpus_divergence(ray_session):
    """Entropy/KL against independent pure-Python math; null/empty and
    single-token docs score 0 entropy (and 0 KL only for zero tokens)."""
    from collections import Counter

    import ray.data

    from rse_ray.pipelines.text import corpus_divergence, token_entropy

    texts = ["the cat sat on the mat",
             "cat cat cat cat",
             "dog",
             "",
             None,
             "mat on the cat runs far"]
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6], "text": texts})
    ds = ray.data.from_pandas(docs).repartition(3)

    ent = token_entropy(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    toks = [(t or "").lower().split() for t in texts]
    for i, ts in enumerate(toks):
        assert ent["n_tokens"][i] == len(ts)
        if not ts:
            assert ent["entropy"][i] == 0
            continue
        c = np.array(list(Counter(ts).values()), dtype=float)
        p = c / c.sum()
        assert abs(ent["entropy"][i] - (-(p * np.log(p)).sum())) < 1e-6
    assert ent["entropy"][1] == 0  # single repeated token
    assert ent["entropy"][2] == 0  # one token

    kl = corpus_divergence(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    corpus = Counter(w for ts in toks for w in ts)
    total = sum(corpus.values())
    for i, ts in enumerate(toks):
        if not ts:
            assert kl["kl"][i] == 0
            continue
        c = Counter(ts)
        exp = sum((n / len(ts))
                  * np.log((n / len(ts)) / (corpus[w] / total))
                  for w, n in c.items())
        assert abs(kl["kl"][i] - exp) < 1e-6, (i, kl["kl"][i], exp)
    assert (kl["kl"] >= 0).all()  # KL is non-negative


def test_skipgram_and_pmi(ray_session):
    """Skip-gram pair counts and PMI collocations vs brute force."""
    from collections import Counter

    import ray.data

    from rse_ray.pipelines.text import pmi_topk, skipgram_counts

    rng = np.random.RandomState(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 30)))
             for _ in range(40)] + ["", None, "zz"]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(docs).repartition(4)

    out = skipgram_counts(ds, window=2, top_n=10)
    exp: Counter = Counter()
    for t in texts:
        ts = (t or "").lower().split()
        for d in (1, 2):
            exp.update(f"{a} {b}" for a, b in zip(ts, ts[d:]))
            exp.update(f"{b} {a}" for a, b in zip(ts, ts[d:]))
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["skipgram"], out["n"])) == want

    out = pmi_topk(ds, min_count=2, top_n=15)
    uni: Counter = Counter()
    bg: Counter = Counter()
    for t in texts:
        ts = (t or "").lower().split()
        uni.update(ts)
        bg.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
    n1 = sum(uni.values())
    n2 = sum(bg.values())
    rows = []
    for g, n in bg.items():
        if n < 2:
            continue
        a, b = g.split()
        rows.append((g, n, round(
            np.log((n / n2) / ((uni[a] / n1) * (uni[b] / n1))), 6)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    assert [tuple(r) for r in
            out[["bigram", "n", "pmi"]].itertuples(index=False)] \
        == rows[:15]


def test_phrase_match_and_term_proximity(ray_session):
    """Positional queries vs hand-computed positions; overlapping
    phrase matches count, docs missing a term are dropped."""
    import ray.data

    from rse_ray.pipelines.text import phrase_match, term_proximity

    texts = ["a b a b a b",      # 'a b' x3 (overlap-adjacent runs)
             "a a a a",          # 'a a' overlaps: 3 matches
             "b b",              # no 'a'
             "x a y y y b",      # a..b distance 4
             "",
             None,
             "A B"]              # case folds
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(docs).repartition(3)

    out = phrase_match(ds, "a b").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert dict(zip(out["doc_id"], out["n_matches"])) == {0: 3, 6: 1}

    out = phrase_match(ds, "a a").to_pandas()
    assert dict(zip(out["doc_id"], out["n_matches"])) == {1: 3}

    out = term_proximity(ds, "a", "b").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert dict(zip(out["doc_id"], out["min_dist"])) == {0: 1, 3: 4, 6: 1}


def test_facet_counts(ray_session):
    """OR-match facet counts vs hand count; a doc matching BOTH query
    terms counts once; null/empty texts never match."""
    import ray.data

    from rse_ray.pipelines.text import facet_counts

    df = pd.DataFrame({
        "text": ["hash x", "join y", "hash join z", "nope", "", None],
        "lang": ["en", "en", "de", "en", "de", "en"],
        "source": ["web", "web", "web", "web", "web", "web"],
    })
    out = facet_counts(ray.data.from_pandas(df).repartition(3),
                       "hash join").to_pandas()
    got = {(r.lang, r.source): r.n for r in out.itertuples(index=False)}
    assert got == {("en", "web"): 2, ("de", "web"): 1}


def test_kwic_snippets(ray_session):
    """Snippet windows clamp at both text edges; pos is the FIRST
    query-term occurrence; non-matching and empty docs are dropped."""
    import ray.data

    from rse_ray.pipelines.text import kwic_snippets

    texts = ["hash at start of doc",            # clamps left
             "one two three four five hash",    # clamps right
             "a b c join d e f join g",         # first hit wins
             "nothing here",
             "",
             None]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(3)

    out = kwic_snippets(ds, "hash join", window=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (0, 0, "hash at start"),
        (1, 5, "four five hash"),
        (2, 3, "b c join d e"),
    ]


def test_fuzzy_term_match(ray_session):
    """SymSpell deletion-neighborhood vs brute-force Levenshtein over
    the vocabulary — all edit kinds, cross-batch dedup, max_dist=2."""
    import ray.data

    from rse_ray.pipelines.text import _lev_capped, fuzzy_term_match

    texts = ["apple maple ample app applesauce",
             "apple banana bananas anana",   # apple repeats across rows
             "grape grapes rape ripe"]
    ds = ray.data.from_pandas(
        pd.DataFrame({"text": texts})).repartition(3)

    vocab = sorted({w for t in texts for w in t.split()})
    probes = ["aple", "banana", "gripe", "zzz"]

    for md in (1, 2):
        got = fuzzy_term_match(ds, probes, max_dist=md).to_pandas()
        got = {(r.probe, r.term): r.dist
               for r in got.itertuples(index=False)}
        want = {(p, t): _lev_capped(p, t, md)
                for p in probes for t in vocab
                if _lev_capped(p, t, md) <= md}
        assert got == want and ("aple", "apple") in got
    # transposition is distance 2, absent at max_dist=1
    got1 = fuzzy_term_match(ds, ["applle"], max_dist=1).to_pandas()
    assert {(r.probe, r.term, r.dist)
            for r in got1.itertuples(index=False)} == {
                ("applle", "apple", 1)}


def test_prefix_search_expansion_and_scores(ray_session, tmp_path):
    """Wildcard retrieval: the dictionary expansion must be exactly the
    prefix range, and scores must equal the OR query over the expanded
    terms with qtf=1 each."""
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher

    texts = {
        "u1": "apple apricot banana",
        "u2": "apple apple grape",
        "u3": "banana grape",
        "u4": "apex apple",
        "u5": "zebra",
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "pfx_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)

    assert s.reader.expand_prefix("ap") == ["apex", "apple", "apricot"]
    assert s.reader.expand_prefix("banana") == ["banana"]
    assert s.reader.expand_prefix("q") == []

    hits = dict(s.search_prefix("ap", k=10))
    # same docs + scores as the explicit OR query over the expansion
    want = dict(s.search("apex apple apricot", k=10))
    assert hits.keys() == want.keys() and len(hits) == 3
    for d in hits:
        assert abs(hits[d] - want[d]) < 1e-12
    assert s.search_prefix("q", k=10) == []


def test_bm25_conjunctive_subset_and_scores(ray_session, tmp_path):
    """AND retrieval = TAAT restricted to all-terms docs: build a tiny
    index where one rare term cuts the candidate set, check the result
    is exactly the filtered TAAT ranking and that a missing term
    empties the result."""
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher

    texts = {
        "u1": "apple banana cherry apple",
        "u2": "apple banana banana",
        "u3": "apple cherry cherry cherry",
        "u4": "banana cherry",
        "u5": "apple apple apple",
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "conj_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)

    both = s.search("apple banana", k=10, conjunctive=True)
    or_hits = s.search("apple banana", k=10)
    want_docs = {d for d, _ in or_hits} & {
        d for d, _ in s.search("apple", k=10)} & {
        d for d, _ in s.search("banana", k=10)}
    assert {d for d, _ in both} == want_docs and len(both) == 2
    # scores equal the OR scores of the same docs (same contributions)
    or_scores = dict(or_hits)
    for d, sc in both:
        assert abs(sc - or_scores[d]) < 1e-9
    # AND with three terms: only u1 has apple+banana+cherry
    tri = s.search("apple banana cherry", k=10, conjunctive=True)
    assert len(tri) == 1
    # a term absent from the corpus empties the result
    assert s.search("apple zzz", k=10, conjunctive=True) == []

    # ---- boolean NOT (MUST_NOT) on the same index --------------------
    not_hits = s.search("apple banana", k=10, excluded=["cherry"])
    # docs containing cherry (u1,u3,u4) are dropped; scores of the
    # survivors are untouched (full-corpus idf/avgdl)
    assert {d for d, _ in not_hits} == {
        d for d, _ in or_hits} - {d for d, _ in s.search("cherry", k=10)}
    for d, sc in not_hits:
        assert abs(sc - or_scores[d]) < 1e-9
    # excluding an absent term is a no-op; excluding a query term of
    # every match empties the result
    assert s.search("apple banana", k=10, excluded=["zzz"]) == or_hits
    assert s.search("apple", k=10, excluded=["apple"]) == []


def test_search_after_cursor_and_total_hits(ray_session, tmp_path):
    """Cursor pagination == slicing the global ranking; the cursor is
    strictly-after (its own hit never repeats); total_hits counts the
    posting union without scoring."""
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher

    texts = {f"u{i}": ("apple " * (i % 5 + 1)) + ("banana " * (i % 3))
             for i in range(30)}
    texts["zz"] = "cherry only"
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "page_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)

    full = s.search("apple banana", k=s.N)
    assert len(full) == 30  # zz matches neither term
    assert s.total_hits("apple banana") == 30
    assert s.total_hits("cherry") == 1
    assert s.total_hits("zzz") == 0

    # walk pages of 7 via cursors; concatenation == the full ranking
    got, after = [], None
    while True:
        page = s.search_after("apple banana", k=7, after=after)
        if not page:
            break
        got.extend(page)
        after = (page[-1][1], page[-1][0])
    assert got == full
    # ties exist (texts repeat) — no hit may appear twice
    assert len({d for d, _ in got}) == len(got)


def test_sq_knn_near_lossless(ray_session):
    """int8 scalar quantization is near-lossless on the fixture
    embeddings: per-query overlap with the exact top-10 stays high and
    scores agree to ~1e-2 (64 dims x 1/255 resolution)."""
    import ray.data

    from rse_ray.pipelines.ann import brute_force_knn, sq_knn

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    qids = [0, 1, 2]
    exact = brute_force_knn(ds, qids, k=10)
    quant = sq_knn(ds, qids, k=10)
    for q in qids:
        a = set(exact[exact["query_id"] == q]["neighbor_id"])
        b = set(quant[quant["query_id"] == q]["neighbor_id"])
        assert len(a & b) >= 8  # recall@10 >= 0.8 per query
    m = exact.merge(quant, on=["query_id", "neighbor_id"],
                    suffixes=("_e", "_q"))
    assert (m["cos_e"] - m["cos_q"]).abs().max() < 2e-2


def test_pq_knn_recall_and_compression_contract(ray_session):
    """PQ kNN: (a) decent recall@10 vs exact on the fixture at the
    m=16, ksub=128 defaults (16x compression), (b) near-exact when every subspace gets
    enough centroids to memorize the corpus (ksub >= n_vectors on a
    tiny slice), (c) deterministic across runs."""
    import ray.data

    from rse_ray.pipelines.ann import brute_force_knn, pq_knn

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    qids = [0, 1, 2]
    exact = brute_force_knn(ds, qids, k=10)
    got = pq_knn(ds, qids, k=10)
    got2 = pq_knn(ds, qids, k=10)
    pd.testing.assert_frame_equal(got, got2)  # deterministic
    recalls = []
    for q in qids:
        a = set(exact[exact["query_id"] == q]["neighbor_id"])
        b = set(got[got["query_id"] == q]["neighbor_id"])
        recalls.append(len(a & b) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls

    # memorization regime: 40 vectors, ksub = 64 >= n -> k-means can
    # place a centroid on every subvector; ranking == exact
    small = ds.limit(40).materialize()
    e_s = brute_force_knn(small, [0, 1], k=5)
    p_s = pq_knn(small, [0, 1], k=5, m=8, ksub=64, iters=25)
    assert (e_s["neighbor_id"] == p_s["neighbor_id"]).mean() >= 0.8


def test_hash_join_semi_anti_null_typed_right_keys(ray_session):
    """A right side whose key column arrives NULL-typed (what Ray's
    empty-map-output schema drop hands a partition whose right slice
    is empty) must behave as an EMPTY key set — semi keeps nothing,
    anti keeps every left row — instead of raising ArrowTypeError
    from is_in(string, null) (intermittent full-suite failure seen in
    the jaccard_links anti join, round 5)."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import hash_join

    left = ray.data.from_arrow(pa.table(
        {"k": pa.array(["a", "b", "c"], type=pa.string())}))

    def run(right_tbl, how):
        got = hash_join(left, ray.data.from_arrow(right_tbl),
                        left_on="k", right_on="k", right_cols=[],
                        how=how, num_parts=2).to_pandas()
        return sorted(got["k"]) if "k" in got.columns else []

    null_right = pa.table({"k": pa.array([], type=pa.null())})
    assert run(null_right, "anti") == ["a", "b", "c"]
    assert run(null_right, "semi") == []
    empty_typed = pa.table({"k": pa.array([], type=pa.string())})
    assert run(empty_typed, "anti") == ["a", "b", "c"]
    assert run(empty_typed, "semi") == []

    # null-typed LEFT key (all-null rows after a schema drop): null
    # keys EXISTS-match nothing — anti keeps them, semi drops them
    nleft = ray.data.from_arrow(pa.table(
        {"k": pa.array([None, None], type=pa.null())}))
    rds = ray.data.from_arrow(pa.table(
        {"k": pa.array(["a"], type=pa.string())}))
    anti = hash_join(nleft, rds, left_on="k", right_on="k",
                     right_cols=[], how="anti",
                     num_parts=2).to_pandas()
    assert len(anti) == 2 and anti["k"].isna().all()
    semi = hash_join(nleft, rds, left_on="k", right_on="k",
                     right_cols=[], how="semi",
                     num_parts=2).to_pandas()
    assert len(semi) == 0

    # auto_join's broadcast semi/anti has the same is_in hazard
    from rse_ray.pipelines.relational import auto_join

    a_anti = auto_join(nleft, rds, left_on="k", right_on="k",
                       right_cols=[], how="anti").to_pandas()
    assert len(a_anti) == 2
    a_semi = auto_join(nleft, rds, left_on="k", right_on="k",
                       right_cols=[], how="semi").to_pandas()
    assert len(a_semi) == 0


def test_hash_join_full_outer_null_keys(ray_session):
    """FULL OUTER: unmatched rows from both sides survive with null
    padding; null keys on EITHER side never match each other (SQL
    semantics — pandas alone would equate NaN keys); salting is
    rejected."""
    import ray.data

    from rse_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": pd.array([1, 2, None, 4], dtype="Int64"),
                         "lv": ["a", "b", "c", "d"],
                         "lf": [1.5, 2.5, 3.5, 4.5]})  # float64 pad path
    right = pd.DataFrame({"k2": pd.array([2, None, 5], dtype="Int64"),
                          "rv": [20.0, 30.0, 50.0]})
    j = hash_join(ray.data.from_pandas(left).repartition(2),
                  ray.data.from_pandas(right).repartition(2),
                  left_on="k", right_on="k2", right_cols=["rv"],
                  how="outer", num_parts=3).to_pandas()
    # match: k=2. unmatched left: 1, None, 4. unmatched right: None, 5.
    assert len(j) == 6
    matched = j.dropna(subset=["lv", "rv"])
    assert matched["k"].tolist() == [2] and matched["rv"].tolist() == [20.0]
    assert sorted(j[j["rv"].isna()]["lv"]) == ["a", "c", "d"]
    right_only = j[j["lv"].isna()]
    assert sorted(right_only["rv"]) == [30.0, 50.0]
    assert right_only["k"].isna().all()
    assert right_only["lf"].isna().all()  # float64 columns null-pad too

    import pytest as _pytest

    with _pytest.raises(ValueError, match="salting"):
        hash_join(ray.data.from_pandas(left),
                  ray.data.from_pandas(right),
                  left_on="k", right_on="k2", right_cols=["rv"],
                  how="outer", hot_keys=[2])


def test_utility_ops_edge_cases(ray_session):
    """Null/empty hardening for the utility wave: nulls count in the
    profiler, fall outside declared pivot columns, and zero-token docs
    emit no chunks; dense windows on an empty table return the empty
    frame."""
    import ray.data

    from rse_ray.pipelines.relational import (dense_window_agg,
                                              pivot_counts, profile_table)
    from rse_ray.pipelines.text import doc_chunks

    ev = pd.DataFrame({
        "user_id": pd.array([1, 1, 2, None], dtype="Int64"),
        "event_type": ["click", None, "view", "click"],
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 03:00",
                              "2024-01-01 00:00", "2024-01-01 00:00"]),
        "value": [1.0, None, 3.0, 4.0],
    })
    ds = ray.data.from_pandas(ev).repartition(2)
    prof = profile_table(ds, columns=["user_id", "event_type", "value"],
                         numeric=["user_id", "value"])
    row = prof.set_index("column")
    assert row.loc["event_type", "n_nulls"] == 1
    assert row.loc["event_type", "n_distinct"] == 2
    assert row.loc["value", "n_nulls"] == 1
    assert row.loc["value", "min_val"] == 1.0
    assert row.loc["value", "max_val"] == 4.0

    piv = pivot_counts(ds, values=("click", "view")).to_pandas() \
        .sort_values("user_id", na_position="last").reset_index(drop=True)
    # null event_type lands in NO declared column; null user_id is its
    # own key group
    assert piv.loc[0, "n_click"] == 1 and piv.loc[0, "n_view"] == 0
    assert piv.loc[1, "n_view"] == 1

    dw = dense_window_agg(ds)
    assert len(dw) == 4  # hours 00..03 inclusive, gaps zero-filled
    assert dw["n_events"].tolist()[1:3] == [0, 0]

    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c", "", None]}))
    ch = doc_chunks(docs, chunk=2, overlap=1).to_pandas()
    assert set(ch["doc_id"]) == {1}  # empty/null docs emit nothing
    assert ch[["chunk_id", "start_tok", "n_tokens"]].values.tolist() == [
        [0, 0, 2], [1, 1, 2]]


def test_median_filter_ntile_profile_edge_cases(ray_session):
    """Null group keys match no group in above_group_median; minute
    windows produce a real spine (pandas 'm'='month' trap); an empty
    input still profiles one row per declared column; ntile over fewer
    rows than tiles."""
    import ray.data

    from rse_ray.pipelines.relational import (above_group_median,
                                              dense_window_agg,
                                              ntile_rank, profile_table)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["a", "a", "a", None, "b"],
        "n_chars": [10, 20, 30, 99, 7],
    })
    got = above_group_median(ray.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # medians: a=20, b=7; null-source row dropped
    assert got["doc_id"].tolist() == [2, 3, 5]

    ev = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:30",
                              "2024-01-01 00:03:10"]),
        "value": [1.0, 2.0]})
    dw = dense_window_agg(ray.data.from_pandas(ev), window="min")
    assert len(dw) == 4 and dw["n_events"].tolist() == [1, 0, 0, 1]

    empty = ray.data.from_pandas(pd.DataFrame(
        {"x": pd.Series([], dtype="int64"),
         "y": pd.Series([], dtype=str)}))
    prof = profile_table(empty, columns=["x", "y"], numeric=["x"])
    assert prof["column"].tolist() == ["x", "y"]
    assert prof["n_nulls"].tolist() == [0, 0]
    assert prof["n_distinct"].tolist() == [0, 0]

    nt = ntile_rank(ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "n_chars": [5, 9]})),
        order="n_chars", key="doc_id", n=4).to_pandas() \
        .sort_values("rank")
    assert nt["tile"].tolist() == [1, 2]  # N < n: one row per tile


def test_synonym_expansion_and_bm25_equivalence(ray_session, tmp_path):
    """expand_synonyms is analyzer-level (keys/values pass through the
    same tokenizer) and synonym retrieval equals the explicit OR query
    over the expanded terms."""
    import pytest
    import ray.data

    from rse_ray.functions.tokenizer import expand_synonyms
    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher

    assert expand_synonyms("Merge scan", {"MERGE": ["Join"]},
                           stem=False) == ["merge", "join", "scan"]
    # qtf accumulates per occurrence: repeated token expands twice
    assert expand_synonyms("a a", {"a": ["b"]}, stem=False) == \
        ["a", "b", "a", "b"]
    # stemmed analyzer: key written in surface form still matches
    assert expand_synonyms("running", {"runs": ["jumped"]})[0] == \
        expand_synonyms("run", {})[0]
    with pytest.raises(ValueError):
        expand_synonyms("x", {"two words": ["y"]}, stem=False)
    with pytest.raises(ValueError):
        expand_synonyms("x", {"y": ["two words"]}, stem=False)

    texts = {
        "u1": "car auto bike", "u2": "auto auto", "u3": "bike train",
        "u4": "car car train", "u5": "boat",
    }
    rows = pd.DataFrame({
        "url": list(texts), "text": list(texts.values()),
        "warc_ts": pd.Timestamp("2024-12-01")})
    idx = str(tmp_path / "syn_idx")
    build_index(ray.data.from_pandas(rows), idx,
                BuildConfig(num_buckets=2, buckets_per_salt_group=2,
                            stem=False, from_html=False))
    s = Searcher(idx)
    syn = {"car": ["auto", "hovercraft"]}  # hovercraft: not in corpus
    expanded = " ".join(expand_synonyms("car train", syn, stem=False))
    got = dict(s.search(expanded, k=10))
    want = dict(s.search("car auto train", k=10))
    assert got.keys() == want.keys() and len(got) == 4  # u5 unmatched
    for d in got:
        assert abs(got[d] - want[d]) < 1e-12
    # synonym hit scores: u2 (auto only) now matches the "car" concept
    plain = dict(s.search("car train", k=10))
    assert len(plain) == 3


def test_suggest_terms_df_ranking(ray_session, tmp_path):
    """Autocomplete completions come from the index dictionary, ranked
    (df desc, term asc), k-cut."""
    import pytest

    from rse_ray.pipelines.docsearch import suggest_terms

    sf = tmp_path / "sfsuggest"
    sf.mkdir()
    pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3, 4], dtype="int64"),
        "text": ["apple apricot", "apple apex", "apple banana",
                 "apex zebra", "apricot apex"],
    }).to_parquet(sf / "documents.parquet")
    out = suggest_terms(str(sf), "ap", k=2)
    # df: apex 3, apple 3, apricot 2 -> tie broken term asc, cut at 2
    assert list(out["term"]) == ["apex", "apple"]
    assert list(out["df"]) == [3, 3]
    full = suggest_terms(str(sf), "ap", k=10)
    assert list(full["term"]) == ["apex", "apple", "apricot"]
    assert list(full["df"]) == [3, 3, 2]
    assert suggest_terms(str(sf), "q", k=5).empty
    with pytest.raises(ValueError):
        suggest_terms(str(sf), "  ", k=5)


def test_bm25f_field_weighting_and_edges(ray_session):
    """BM25F: a title hit is worth w_title body hits BEFORE saturation;
    null/empty docs are outside N/avgdl and never score."""
    import math

    import ray.data

    from rse_ray.pipelines.text import bm25f_scores

    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3, 4, 5], dtype="int64"),
        "text": ["q x y y",      # 1 title hit (w=2)
                 "x y q q",      # 2 body hits (2*1) == same wtf
                 "x y z z",      # no hit
                 None,           # null: skipped entirely
                 "",             # empty: outside N/avgdl
                 "q q y y"],     # 2 title hits -> wtf 4
    })
    out = bm25f_scores(ray.data.from_pandas(docs), "q",
                       title_len=2, w_title=2.0).to_pandas() \
        .set_index("doc_id")["score"]
    assert set(out.index) == {0, 1, 5}
    # hand formula: N=4 (docs 0,1,2,5), df=3, wdl=6 for all, avgdl=6
    idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    exp = {0: idf * (2 * 2.2) / (2 + 1.2),
           1: idf * (2 * 2.2) / (2 + 1.2),
           5: idf * (4 * 2.2) / (4 + 1.2)}
    for d, e in exp.items():
        assert abs(out[d] - round(e, 6)) < 1e-9
    assert out[0] == out[1]          # w_title*1 == w_body*2, same wtf
    assert out[5] > out[0]           # more weighted tf, same dl~


def test_batch_bm25_equals_interactive_searcher(ray_session, tmp_path):
    """Query-log replay through the actor pool returns, per query,
    exactly the interactive Searcher's top-k; unmatched queries emit
    zero rows."""
    from rse_ray.pipelines.docsearch import (batch_bm25_topk,
                                             bm25_documents,
                                             documents_index)

    sf = tmp_path / "sfbatch"
    sf.mkdir()
    texts = ["car auto bike", "auto auto train", "bike train car",
             "car car boat", "boat zebra", "train train train"]
    pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
    }).to_parquet(sf / "documents.parquet")
    documents_index(str(sf))  # shared cache for both paths

    queries = ["car train", "auto", "missingterm"]
    out = batch_bm25_topk(str(sf), queries, k=3,
                          batch_size=2).to_pandas()
    assert set(out["query_id"]) == {0, 1}  # query 2 matched nothing
    for qid, q in enumerate(queries[:2]):
        got = out[out["query_id"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        want = bm25_documents(str(sf), q, k=3)
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["score"]) == list(want["score"])


def test_normalize_text_unicode_and_whitespace(ray_session):
    """NFC + accent strip + lower + whitespace collapse; null text
    stays null."""
    import ray.data

    from rse_ray.pipelines.text import normalize_text

    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
        "text": ["Café  RÉSUMÉ",   # decomposed accents
                 "\tÅngström naïve  x ",
                 None,
                 "  already clean  "],
    })
    out = normalize_text(ray.data.from_pandas(docs)).to_pandas() \
        .set_index("doc_id")["norm_text"]
    assert out[0] == "cafe resume"
    assert out[1] == "angstrom naive x"
    assert out[2] is None or pd.isna(out[2])
    assert out[3] == "already clean"


def test_rank_funcs_ties_and_null_rejection(ray_session):
    """RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST share ranks across ties
    exactly as SQL defines them; a single-row group pins percent_rank
    to 0; null order values are refused (no total order)."""
    import ray.data

    from rse_ray.pipelines.relational import group_rank_funcs

    df = pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "g": ["a", "a", "a", "a", "b"],
        "v": [10, 10, 7, 5, 3],
    })
    got = group_rank_funcs(ray.data.from_pandas(df), group="g",
                           order="v", key="k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["rank"].tolist() == [1, 1, 3, 4, 1]
    assert got["dense_rank"].tolist() == [1, 1, 2, 3, 1]
    assert got["percent_rank"].tolist() == [0.0, 0.0, round(2 / 3, 6),
                                            1.0, 0.0]
    assert got["cume_dist"].tolist() == [0.5, 0.5, 0.75, 1.0, 1.0]

    bad = df.copy()
    bad.loc[2, "v"] = np.nan
    with pytest.raises(ValueError, match="null"):
        group_rank_funcs(ray.data.from_pandas(bad), group="g",
                         order="v", key="k").to_pandas()


def test_unpivot_round_trip_keeps_zero_rows(ray_session):
    """unpivot(pivot(x)) emits a row for every declared label per key —
    including zero counts a GROUP BY would never produce."""
    import ray.data

    from rse_ray.pipelines.relational import pivot_counts, unpivot

    ev = pd.DataFrame({"user_id": [1, 1, 2],
                       "event_type": ["click", "click", "view"]})
    pv = pivot_counts(ray.data.from_pandas(ev))
    up = unpivot(pv, id_cols=["user_id"],
                 value_cols={f"n_{v}": v for v in
                             ("click", "error", "purchase", "signup",
                              "view")},
                 var_name="event_type", value_name="n").to_pandas()
    assert len(up) == 10  # 2 users x 5 declared labels
    got = up.set_index(["user_id", "event_type"])["n"]
    assert got[(1, "click")] == 2 and got[(2, "view")] == 1
    assert got[(1, "purchase")] == 0 and got[(2, "error")] == 0


def test_approx_ndistinct_by_matches_global_per_group(ray_session):
    """Per-group HLL == running the global estimator on each group's
    rows alone (mergeable partials are partitioning-independent), and
    at fixture scale the estimate is within 5% of exact."""
    import ray.data

    from rse_ray.pipelines.sketch import approx_ndistinct, approx_ndistinct_by

    ev = _read("events", ["event_type", "user_id"])
    got = approx_ndistinct_by(ev, group="event_type",
                              col="user_id").to_pandas() \
        .set_index("event_type")["est_ndistinct"]
    pdf = pd.read_parquet(f"{SF}/events.parquet",
                          columns=["event_type", "user_id"])
    for et, sub in pdf.groupby("event_type"):
        solo = approx_ndistinct(
            ray.data.from_pandas(sub[["user_id"]]), col="user_id")
        assert got[et] == solo["est_ndistinct"].iloc[0]
        exact = sub["user_id"].nunique()
        assert abs(got[et] - exact) / exact < 0.05


def test_lm_dirichlet_brute_force_equivalence(ray_session, duck):
    """search_lm reproduces the definitional score: for every candidate
    doc, sum over query terms of qtf*ln((tf + mu*cf/T)/(dl + mu)),
    computed here by brute force over the raw tokenized corpus."""
    import math

    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.docsearch import lm_dirichlet_documents

    query, mu = "spark window merge window", 500.0
    got = lm_dirichlet_documents(SF, query, k=None, mu=mu) \
        .set_index("doc_id")["score"]

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = {r.doc_id: tokenize(r.text, stem=False)
            for r in docs.itertuples()}
    T = sum(len(t) for t in toks.values())
    qtf: dict[str, int] = {}
    for t in tokenize(query, stem=False):
        qtf[t] = qtf.get(t, 0) + 1
    cf = {t: sum(ts.count(t) for ts in toks.values()) for t in qtf}
    want = {}
    for did, ts in toks.items():
        if not any(t in ts for t in qtf):
            continue
        s = sum(w * math.log((ts.count(t) + mu * cf[t] / T)
                             / (len(ts) + mu))
                for t, w in qtf.items() if cf[t] > 0)
        want[did] = round(s, 6)
    assert len(got) == len(want)
    for did, s in want.items():
        assert got[did] == pytest.approx(s, abs=2e-6)


def _bpe_reference_train(word_freq: dict, n: int):
    """Recount-from-scratch BPE trainer — the obviously-correct oracle
    for the incremental distributed trainer: same counting convention
    (every adjacent occurrence), same tie-break (max count, then
    lexicographically smallest pair), same greedy rewrite."""
    from rse_ray.pipelines.bpe import _merge_word

    syms = {w: tuple(w) for w in word_freq}
    merges = []
    for rank in range(n):
        pc: dict = {}
        for w, f in word_freq.items():
            s = syms[w]
            for p in zip(s, s[1:]):
                pc[p] = pc.get(p, 0) + f
        live = [(c, p) for p, c in pc.items() if c > 0]
        if not live:
            break
        best = max(c for c, _ in live)
        pair = min(p for c, p in live if c == best)
        merges.append((rank, pair[0], pair[1], best))
        for w in word_freq:
            syms[w] = _merge_word(syms[w], pair)
    return merges, syms


def test_bpe_train_matches_reference_and_shard_counts(ray_session):
    """The incremental actor-sharded trainer produces the EXACT merge
    list (pairs, ranks, selection counts) of a recount-from-scratch
    reference, and the list is identical at 2 and 5 shards — exact
    global counts make the algorithm partitioning-independent."""
    from collections import Counter

    from rse_ray.pipelines.bpe import _words_of, bpe_train

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    wf: Counter = Counter()
    for t in docs["text"]:
        wf.update(_words_of(t))
    want, _ = _bpe_reference_train(wf, 40)

    ds = _read("documents", ["doc_id", "text"])
    for shards in (2, 5):
        got = bpe_train(ds, num_merges=40, num_shards=shards)
        rows = list(zip(got["rank"], got["left"], got["right"],
                        got["pair_count"]))
        assert rows == want, f"shards={shards}"


def test_bpe_encode_counts_matches_reference(ray_session, duck):
    """Pipeline encode under a trained merge list == summing the
    reference's final symbol lengths per document; with zero merges the
    count degenerates to the raw character count of the words."""
    from collections import Counter

    from rse_ray.pipelines.bpe import (_words_of, bpe_encode_counts,
                                       encode_word)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    wf: Counter = Counter()
    for t in docs["text"]:
        wf.update(_words_of(t))
    merges, _ = _bpe_reference_train(wf, 30)
    pairs = [(m[1], m[2]) for m in merges]

    ds = _read("documents", ["doc_id", "text"])
    got = bpe_encode_counts(ds, pairs).to_pandas() \
        .set_index("doc_id")["n_tokens_bpe"]
    want = {}
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = _words_of(t)
        if ws:
            want[did] = sum(len(encode_word(w, pairs)) for w in ws)
    assert dict(got) == want

    plain = bpe_encode_counts(ds, []).to_pandas() \
        .set_index("doc_id")["n_tokens_bpe"]
    raw = {did: sum(len(w) for w in _words_of(t))
           for did, t in zip(docs["doc_id"], docs["text"])
           if _words_of(t)}
    assert dict(plain) == raw


def test_kmeans_separates_planted_blobs_and_is_partition_invariant(
        ray_session):
    """Lloyd k-means recovers two well-separated planted blobs (every
    blob lands in one cluster), and the assignment is identical across
    block counts — centroid rounding pins the fp state so the result
    is partitioning-independent."""
    import ray.data

    from rse_ray.pipelines.ann import kmeans_fit_predict

    rng = np.random.RandomState(7)
    a = rng.normal(0.0, 0.05, size=(60, 8))
    b = rng.normal(5.0, 0.05, size=(40, 8))
    df = pd.DataFrame({
        "vec_id": pd.array(range(100), dtype="int64"),
        "embedding": [r.astype(np.float32).tolist() for r in
                      np.concatenate([a, b])],
    })
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = kmeans_fit_predict(ds, k=2, iters=4).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    lab = outs[0]["cluster"].to_numpy()
    assert len(set(lab[:60])) == 1 and len(set(lab[60:])) == 1
    assert lab[0] != lab[60]


def test_retrieval_metrics_bounds_and_empty_relevance(ray_session):
    """MRR/nDCG live in [0,1]; a query whose terms never co-occur (or
    don't exist) has an empty conjunctive relevance set and scores 0/0
    by convention; a single-term query that matches scores MRR=1 (its
    top hit trivially contains all terms)."""
    from rse_ray.pipelines.docsearch import retrieval_metrics

    got = retrieval_metrics(
        SF, ["window", "zzz nothing"], k=10).to_pandas() \
        .set_index("query_id")
    assert ((got[["mrr", "ndcg"]] >= 0).all().all()
            and (got[["mrr", "ndcg"]] <= 1).all().all())
    assert got.loc[0, "mrr"] == 1.0 and got.loc[0, "ndcg"] == 1.0
    assert got.loc[1, "mrr"] == 0.0 and got.loc[1, "ndcg"] == 0.0


def test_window_agg_late_drops_and_partition_invariance(ray_session,
                                                        duck):
    """Watermark filtering really drops closed-window rows (output
    strictly smaller than the unwatermarked aggregate), matches the
    SQL running-max twin, and is identical across input block counts
    (the prefix-max two-pass is partitioning-independent)."""
    import ray.data

    from rse_ray.pipelines.relational import window_agg, window_agg_late

    ds = _read("events", ["event_id", "ts", "event_type", "value"])
    base = window_agg(ds).to_pandas()
    outs = []
    for blocks in (2, 9):
        got = window_agg_late(ds.repartition(blocks),
                              window="h", lateness="5d").to_pandas()
        outs.append(_norm(got))
    assert outs[0].equals(outs[1])
    assert outs[0]["n_events"].sum() < base["n_events"].sum()

    from rse_ray.pipelines.relational import window_agg_late_oracle_sql

    odf = duck.sql(window_agg_late_oracle_sql(window="h",
                                              lateness="5d")).df()
    assert outs[0].equals(_norm(odf))


def test_interval_join_containment_and_drops(ray_session):
    """Containment semantics: rows inside an interval get its lo; rows
    between intervals or for keys with no intervals drop (inner)."""
    import ray.data

    from rse_ray.pipelines.relational import interval_join

    t0 = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "event_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "user_id": pd.array([7, 7, 7, 8, 9], dtype="int64"),
        "ts": [t0 + pd.Timedelta(h, "h") for h in (1, 5, 12, 2, 2)],
    })
    iv = pd.DataFrame({
        "user_id": pd.array([7, 7, 8], dtype="int64"),
        "session_start": [t0, t0 + pd.Timedelta(10, "h"),
                          t0 + pd.Timedelta(3, "h")],
        "session_end": [t0 + pd.Timedelta(2, "h"),
                        t0 + pd.Timedelta(13, "h"),
                        t0 + pd.Timedelta(4, "h")],
    })
    got = interval_join(ray.data.from_pandas(ev),
                        ray.data.from_pandas(iv)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # event 2 (gap), event 4 (before its user's span), event 5 (no
    # spans for user 9) all drop
    assert got["event_id"].tolist() == [1, 3]
    assert got["session_start"].tolist() == [
        t0, t0 + pd.Timedelta(10, "h")]


def test_group_quota_sample_nested_and_exact(ray_session):
    """The per-group cap is exact, winners are content-keyed (same set
    on any partitioning), and raising the quota yields a superset."""
    from rse_ray.pipelines.relational import group_quota_sample

    ds = _read("documents", ["doc_id", "lang"])
    small = group_quota_sample(ds, group="lang", key="doc_id",
                               quota=10).to_pandas()
    big = group_quota_sample(ds.repartition(7), group="lang",
                             key="doc_id", quota=25).to_pandas()
    assert (small.groupby("lang").size() <= 10).all()
    assert (big.groupby("lang").size() <= 25).all()
    assert set(map(tuple, small.to_numpy())) <= \
        set(map(tuple, big.to_numpy()))


def test_incremental_exact_dedup_semantics(ray_session):
    """Only new docs whose text is absent from the old corpus survive;
    new-side internal duplicates all survive (deduped against OLD, not
    each other)."""
    import ray.data

    from rse_ray.pipelines.dedup import incremental_exact_dedup

    old = pd.DataFrame({"doc_id": pd.array([1, 2], dtype="int64"),
                        "text": ["aaa", "bbb"]})
    new = pd.DataFrame({"doc_id": pd.array([10, 11, 12, 13],
                                           dtype="int64"),
                        "text": ["aaa", "ccc", "ccc", "ddd"]})
    got = incremental_exact_dedup(
        ray.data.from_pandas(new), ray.data.from_pandas(old)) \
        .to_pandas()["doc_id"].sort_values().tolist()
    assert got == [11, 12, 13]


def test_bloom_semi_join_exact_and_actually_filters(ray_session):
    """bloom_semi_join == exact semi-join (false positives verified
    away) on int and string keys, with null left keys excluded; and
    the Bloom layer itself admits every true member (no false
    negatives by construction)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import (_bloom_probes, _keys_u64,
                                              bloom_semi_join)
    import pyarrow as pa

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": pd.array([int(x) for x in rng.integers(0, 5000, 4000)]
                      + [None] * 20, dtype="Int64"),
        "payload": np.arange(4020),
    })
    right = pd.DataFrame({"rk": np.unique(rng.integers(0, 5000, 300))})
    got = bloom_semi_join(
        ray.data.from_pandas(left.astype({"k": "Int64"})),
        ray.data.from_pandas(right),
        left_on="k", right_on="rk").to_pandas()
    exp = left[left["k"].isin(set(right["rk"]))]
    assert sorted(got["payload"]) == sorted(exp["payload"])

    # string keys
    sleft = pd.DataFrame({"k": [f"u{i % 97}" for i in range(500)],
                          "v": range(500)})
    sright = pd.DataFrame({"rk": [f"u{i}" for i in range(0, 97, 3)]})
    got_s = bloom_semi_join(ray.data.from_pandas(sleft),
                            ray.data.from_pandas(sright),
                            left_on="k", right_on="rk").to_pandas()
    exp_s = sleft[sleft["k"].isin(set(sright["rk"]))]
    assert sorted(got_s["v"]) == sorted(exp_s["v"])

    # no false negatives at the bitmap level: every inserted key hits
    m_bits, k = 1 << 13, 7
    keys = _keys_u64(pa.array(right["rk"].to_numpy()))
    bm = np.zeros(m_bits // 64, dtype=np.uint64)
    w, b = _bloom_probes(keys, m_bits, k)
    np.bitwise_or.at(bm, w.ravel(), b.ravel())
    w2, b2 = _bloom_probes(keys, m_bits, k)
    assert ((bm[w2] & b2) == b2).all()


def test_random_projection_matches_numpy_and_preserves_distances(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import projection_matrix, random_projection

    rng = np.random.default_rng(5)
    n, d_in, d_out = 200, 64, 16
    X = rng.normal(size=(n, d_in))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32) for row in X],
                              type=pa.list_(pa.float32())),
    })
    R = projection_matrix(d_in, d_out, seed=17)
    got = random_projection(ray.data.from_arrow(tbl), R).to_pandas() \
        .sort_values(["vec_id", "dim"]).reset_index(drop=True)
    exp = X.astype(np.float32).astype(np.float64) @ R
    exp = np.copysign(np.floor(np.abs(exp) * 1e6 + 0.5), exp) / 1e6
    assert len(got) == n * d_out
    assert np.array_equal(got["val"].to_numpy(), exp.ravel())

    # JL sanity: projected pairwise distances stay within loose bounds
    P = exp
    for a, b in [(0, 1), (2, 3), (10, 99)]:
        orig = np.linalg.norm(X[a] - X[b])
        proj = np.linalg.norm(P[a] - P[b])
        assert 0.4 * orig < proj < 1.8 * orig

    # matrix is deterministic and has the Achlioptas support
    assert np.array_equal(R, projection_matrix(d_in, d_out, seed=17))
    s = np.sqrt(3.0 / d_out)
    assert set(np.unique(np.abs(R))) <= {0.0, s}


def test_funnel_counts_ordering_semantics(ray_session):
    """Order matters: a purchase BEFORE the click doesn't convert;
    same-timestamp events don't chain (strictly-after)."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import funnel_counts

    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta("1h")
    ev = pd.DataFrame([
        # u1 full ordered funnel
        (1, t, "view"), (1, t + h, "click"), (1, t + 2 * h, "purchase"),
        # u2: purchase precedes click -> stops at click
        (2, t, "view"), (2, t + h, "purchase"), (2, t + 2 * h, "click"),
        # u3: click at the SAME ts as view -> strictly-after fails
        (3, t, "view"), (3, t, "click"),
        # u4: no view at all -> reaches nothing
        (4, t, "click"), (4, t + h, "purchase"),
        # u5: later re-click after early purchase still can't convert
        # (greedy earliest click = t+h, purchase must be > t+h: yes at 3h)
        (5, t, "view"), (5, t + h, "click"), (5, t + 3 * h, "purchase"),
    ], columns=["user_id", "ts", "event_type"])
    got = funnel_counts(ray.data.from_pandas(ev)).to_pandas() \
        .sort_values("step").reset_index(drop=True)
    assert list(got["users"]) == [4, 3, 2]  # views: u1,u2,u3,u5
    assert list(got["event_type"]) == ["view", "click", "purchase"]


def test_langid_confusion_counts(ray_session):
    """Confusion counts equal a per-doc cross-check of lang_id
    against the stored labels."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.text import lang_id, langid_confusion

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["the quick brown fox and the lazy dog again",
                 "der schnelle braune fuchs und der faule hund",
                 "the cat sat on the mat with the hat",
                 "und der hund war sehr schnell und braun",
                 "xyz", ""],
        "lang": ["en", "de", "en", "de", "en", "de"],
    })
    ds = ray.data.from_pandas(docs)
    pred = lang_id(ds.select_columns(["doc_id", "text"])).to_pandas()
    want = pd.merge(docs, pred, on="doc_id") \
        .groupby(["lang", "lang_pred"]).size()
    got = langid_confusion(ds).to_pandas() \
        .set_index(["lang_true", "lang_pred"])["n"]
    assert got.sort_index().to_dict() == want.sort_index().to_dict()
    assert int(got.sum()) == 6


def test_zipf_and_sampling_table(ray_session):
    """zipf_slope reproduces a numpy OLS over the exact ranked term
    counts; the sampling table normalizes to ~1 and follows tf^0.75."""
    import numpy as np
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.text import negative_sampling_table, zipf_slope

    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": [" ".join(["the"] * 8 + ["of"] * 4 + [f"w{i}"])
                 for i in range(40)],
    })
    ds = ray.data.from_pandas(docs)
    got = zipf_slope(ds)
    # numpy reference over the exact distribution
    tf = pd.Series([" ".join(docs["text"]).split().count(w)
                    for w in ["the", "of"] + [f"w{i}" for i in range(40)]],
                   index=["the", "of"] + [f"w{i}" for i in range(40)])
    r = tf.sort_values(ascending=False).to_frame("tf")
    r["rank"] = range(1, len(r) + 1)
    x, y = np.log(r["rank"].to_numpy(float)), np.log(r["tf"].to_numpy(float))
    slope = np.polyfit(x, y, 1)[0]
    assert abs(got["slope"][0] - slope) < 1e-6
    assert got["n_terms"][0] == 42

    w = negative_sampling_table(ds).to_pandas().set_index("term")["weight"]
    assert abs(w.sum() - 1.0) < 1e-6
    assert abs(w["the"] / w["of"]
               - (tf["the"] / tf["of"]) ** 0.75) < 1e-6


def test_weighted_sample_by_group_invariance(ray_session):
    """Per-group ES sample: n per group, identical winners across
    partitionings, and a group's winners agree with the global race
    restricted to that group."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import weighted_sample_by_group

    df = pd.DataFrame({
        "doc_id": range(100),
        "lang": ["en" if i % 3 else "da" for i in range(100)],
        "n_chars": [10 + (i * 37) % 90 for i in range(100)],
    })
    outs = []
    for parts in (1, 7):
        got = weighted_sample_by_group(
            ray.data.from_pandas(df).repartition(parts),
            n=5, weight_col="n_chars", group_col="lang").to_pandas() \
            .sort_values(["lang", "race", "doc_id"],
                         ascending=[True, False, True]) \
            .reset_index(drop=True)
        assert got.groupby("lang").size().to_dict() == {"da": 5, "en": 5}
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_vocab_growth_semantics(ray_session):
    """Cumulative token/vocab counts: a term counts once at its FIRST
    doc; zero-token docs get rows; repartitioning doesn't change the
    curve."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.text import vocab_growth

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a", "", "b c", "c a d"],
    })
    for parts in (1, 4):
        got = vocab_growth(
            ray.data.from_pandas(docs).repartition(parts)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(got["cum_tokens"]) == [3, 3, 5, 8]
        assert list(got["cum_vocab"]) == [2, 2, 3, 4]


def test_group_rank_matches_pandas(ray_session):
    """group_rank == ROW_NUMBER PARTITION BY group across
    partitionings; sizes dict matches group counts."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import group_rank

    df = pd.DataFrame({
        "g": ["a", "b"] * 50 + ["c"],
        "v": [(i * 17) % 23 for i in range(101)],
        "k": range(101),
    })
    want = df.assign(rank=df.sort_values(["v", "k"],
                                         ascending=[False, True])
                     .groupby("g").cumcount().add(1)) \
        .sort_values("k").reset_index(drop=True)
    for parts in (1, 6):
        ds = ray.data.from_pandas(df).repartition(parts)
        ranked, sizes = group_rank(ds, group="g", order="v", key="k",
                                   descending=True)
        got = ranked.to_pandas().sort_values("k").reset_index(drop=True)
        assert list(got["rank"]) == list(want["rank"])
        assert sizes == {"a": 50, "b": 50, "c": 1}


def test_lm_quality_buckets_shape(ray_session):
    """Per-language NTILE: bucket sizes differ by at most one and
    bucket order follows the cross-entropy rank."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.text import lm_quality_buckets

    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": [" ".join(f"w{(i * j) % 7}" for j in range(10))
                 for i in range(20)],
        "lang": ["en" if i % 2 else "da" for i in range(20)],
    })
    got = lm_quality_buckets(ray.data.from_pandas(docs),
                             n_buckets=3).to_pandas()
    for lang, g in got.groupby("lang"):
        sizes = g["bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        d = g.sort_values("rank")
        assert d["bucket"].is_monotonic_increasing
        assert d["cross_entropy"].is_monotonic_increasing


def test_event_transitions_pairs(ray_session):
    """Transitions pair consecutive events WITHIN a user only, ordered
    by (ts, event_id); counts aggregate across users."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import event_transitions

    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta("1h")
    ev = pd.DataFrame([
        (0, 1, t, "view"), (1, 1, t + h, "click"),
        (2, 1, t + 2 * h, "purchase"),
        (3, 2, t, "view"), (4, 2, t + h, "click"),
        # same-ts tie within u3 ordered by event_id: view -> click
        (5, 3, t, "view"), (6, 3, t, "click"),
        (7, 4, t, "view"),                      # singleton: no pair
    ], columns=["event_id", "user_id", "ts", "event_type"])
    got = event_transitions(ray.data.from_pandas(ev)).to_pandas()
    counts = {(f, to): n for f, to, n in
              zip(got["from_type"], got["to_type"], got["n"])}
    assert counts == {("view", "click"): 3, ("click", "purchase"): 1}


def test_value_zscores_and_weekly_churn(ray_session):
    """z-scores match a numpy reference per group (zero-variance
    group pins z=0); churn counts users absent in the NEXT week."""
    import numpy as np
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import value_zscores, weekly_churn

    ev = pd.DataFrame({
        "event_id": range(6),
        "event_type": ["a", "a", "a", "b", "b", "c"],
        "value": [1.0, 2.0, 3.0, 5.0, 9.0, 4.0],
    })
    got = value_zscores(ray.data.from_pandas(ev)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    a = np.array([1.0, 2.0, 3.0])
    za = (a - a.mean()) / a.std()
    assert np.allclose(got["z"][:3], np.round(za, 6))
    assert np.allclose(got["z"][3:5], [-1.0, 1.0])
    assert got["z"][5] == 0.0          # singleton group: std 0 -> z 0

    mon = pd.Timestamp("2024-01-01")
    w = pd.Timedelta("7d")
    ch = pd.DataFrame({
        "user_id": [1, 1, 2, 3, 3],
        "ts": [mon, mon + w, mon, mon, mon + 2 * w],
    })
    got = weekly_churn(ray.data.from_pandas(ch)).to_pandas() \
        .sort_values("week").reset_index(drop=True)
    # week0: active {1,2,3}; churned {2,3} (1 returns in week1)
    # week1: active {1}, churned {1}; week2: active {3}, churned {3}
    assert list(got["active"]) == [3, 1, 1]
    assert list(got["churned"]) == [2, 1, 1]


def test_retention_cohorts_semantics(ray_session):
    """Cohort = Monday week of the first event; counts are DISTINCT
    users per (cohort, offset); cross-Monday boundaries and multiple
    events in one week collapse correctly."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import retention_cohorts

    mon = pd.Timestamp("2024-01-01")   # a Monday
    d = pd.Timedelta("1d")
    w = pd.Timedelta("7d")
    ev = pd.DataFrame([
        # u1: first on Sunday of week 0, active again week 1 (twice —
        # must count once) and week 3
        (1, mon + 6 * d), (1, mon + w), (1, mon + w + 2 * d),
        (1, mon + 3 * w),
        # u2: same cohort week (starts Monday), only week 0
        (2, mon),
        # u3: cohort week 1, active weeks 1 and 2
        (3, mon + w + 3 * d), (3, mon + 2 * w),
    ], columns=["user_id", "ts"])
    got = retention_cohorts(ray.data.from_pandas(ev)).to_pandas() \
        .sort_values(["cohort", "week_offset"]).reset_index(drop=True)
    want = pd.DataFrame({
        "cohort": pd.Series([mon, mon, mon, mon + w, mon + w],
                            dtype="datetime64[us]"),
        "week_offset": [0, 1, 3, 0, 1],
        "users": [2, 1, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want)


def test_pca_project_matches_numpy_reference(ray_session):
    """Engine PCA == whole-corpus numpy reference built from the SAME
    rounded covariance + sign-pinned basis, across partitionings; and
    the per-component variances come out in descending order."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import pca_basis, pca_project

    rng = np.random.default_rng(9)
    n, d, k = 300, 8, 3
    # anisotropic data so the components are well separated
    X = rng.normal(size=(n, d)) * np.array([5, 3, 2, 1, .5, .3, .2, .1])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32) for r in X],
                              type=pa.list_(pa.float32())),
    })
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = pca_project(ds, k=k).to_pandas() \
            .sort_values(["vec_id", "component"]).reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])

    Xf = X.astype(np.float32).astype(np.float64)
    mu_raw = Xf.mean(axis=0)
    C = np.round(Xf.T @ Xf / n - np.outer(mu_raw, mu_raw), 6)
    W = pca_basis(C, k)
    mu = np.round(mu_raw, 9)
    exp = (Xf - mu) @ W
    exp = np.copysign(np.floor(np.abs(exp) * 1e6 + 0.5), exp) / 1e6
    got_m = outs[0]["val"].to_numpy().reshape(n, k)
    assert np.abs(got_m - exp).max() <= 1e-6  # only rounding-edge slack

    var = got_m.var(axis=0)
    assert var[0] > var[1] > var[2]


def test_event_paths_two_level_topn_and_ties(ray_session):
    """The per-batch partial never loses a user's true first-k: events
    arrive in adversarial batch order, and same-ts ties break by
    event_id."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import event_paths

    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta("1h")
    ev = pd.DataFrame([
        # u1: 4 events, two at the same ts (ids 3 < 4 pin the order)
        (4, t + h, 1, "b"), (3, t + h, 1, "a"),
        (9, t + 3 * h, 1, "d"), (5, t + 2 * h, 1, "c"),
        # u2: exactly first_k + extras beyond the cut
        (1, t, 2, "x"), (2, t + h, 2, "y"), (7, t + 9 * h, 2, "z"),
    ], columns=["event_id", "ts", "user_id", "event_type"])
    # reversed row order + 4 tiny blocks: partials see users split up
    ds = ray.data.from_pandas(ev.iloc[::-1].reset_index(drop=True)) \
        .repartition(4)
    got = event_paths(ds, first_k=3).to_pandas() \
        .sort_values("path").reset_index(drop=True)
    assert dict(zip(got["path"], got["n_users"])) == {
        "a>b>c": 1, "x>y>z": 1}


def test_weighted_sample_exactness_and_bias(ray_session):
    """The two-level top-n returns EXACTLY the global race winners
    (checked against a driver-side full computation) regardless of
    partitioning, and across many salts heavier rows win more often."""
    import numpy as np
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import weighted_sample
    from rse_ray.pipelines.sketch import _md5_u64

    rows = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "w": np.where(np.arange(400) < 200, 10.0, 1.0),
    })

    def reference(salt, n):
        h = _md5_u64([f"{salt}|{k}" for k in rows["doc_id"]])
        u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
        race = np.round(np.log(u) / rows["w"].to_numpy(), 12)
        order = np.lexsort((rows["doc_id"].to_numpy(), -race))
        return set(rows["doc_id"].to_numpy()[order[:n]])

    for blocks in (1, 8):
        ds = ray.data.from_pandas(rows).repartition(blocks)
        got = set(weighted_sample(ds, n=50, weight_col="w")
                  .to_pandas()["doc_id"])
        assert got == reference("ws0", 50)

    heavy_wins = 0
    ds = ray.data.from_pandas(rows)
    for s in range(8):
        got = weighted_sample(ds, n=50, weight_col="w",
                              salt=f"s{s}").to_pandas()
        heavy_wins += int((got["doc_id"] < 200).sum())
    # 10x weight -> heavy half should dominate (expected ~45/50 each)
    assert heavy_wins > 8 * 50 * 0.7


def test_rolling_time_window_frame_edges(ray_session):
    """RANGE-frame semantics: the trailing window includes the row
    exactly `hours` back (closed lower edge) AND same-timestamp peers
    ordered after the current row."""
    import pandas as pd
    import ray.data

    from rse_ray.pipelines.relational import rolling_time_window

    t = pd.Timestamp("2024-01-01 12:00:00")
    h = pd.Timedelta("1h")
    ev = pd.DataFrame([
        (1, t, 7, 1.0),
        (2, t + 24 * h, 7, 2.0),          # includes row 1 (edge is closed)
        (3, t + 25 * h, 7, 4.0),          # row 1 now out, row 2 in
        (4, t + 25 * h, 7, 8.0),          # PEER of row 3: both see both
        (5, t + 100 * h, 7, 16.0),        # alone
        (6, t, 8, 32.0),                  # other user untouched
    ], columns=["event_id", "ts", "user_id", "value"])
    got = rolling_time_window(ray.data.from_pandas(ev).repartition(3),
                              hours=24).to_pandas() \
        .set_index("event_id").sort_index()
    assert list(got["w_cents"]) == [100, 300, 1400, 1400, 1600, 3200]
    assert list(got["w_cnt"]) == [1, 2, 3, 3, 1, 1]


def test_pii_counts_and_redact(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import pii_counts, pii_redact

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "Reach user7@example.com or 10.1.2.3 now.",
            "Call +1 555-0042 or 12345 123 456 today",
            "no pii here 1.2 @ not-an-email",
            None,
        ]),
    })
    got = pii_counts(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_emails"].tolist()[:3] == [1, 0, 0]
    assert got["n_ipv4"].tolist()[:3] == [1, 0, 0]
    assert got["n_phones"].tolist()[:3] == [0, 2, 0]
    assert got.iloc[3, 1:].isna().all()  # null text -> null counts

    red = pii_redact(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert red["red_text"][0] == "Reach <EMAIL> or <IP> now."
    assert red["red_text"][1] == "Call <PHONE> or <PHONE> today"
    assert red["red_text"][2] == "no pii here 1.2 @ not-an-email"
    assert red["red_text"][3] is None


def test_lm_jm_brute_force_equivalence(ray_session):
    """search_lm_jm reproduces the definitional JM score: for every
    candidate doc, sum over query terms of
    qtf*ln((1-lam)*tf/dl + lam*cf/T), brute-forced over the corpus."""
    import math

    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.docsearch import lm_jm_documents

    query, lam = "spark window merge window", 0.25
    got = lm_jm_documents(SF, query, k=None, lam=lam) \
        .set_index("doc_id")["score"]

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = {r.doc_id: tokenize(r.text, stem=False)
            for r in docs.itertuples()}
    T = sum(len(t) for t in toks.values())
    qtf: dict[str, int] = {}
    for t in tokenize(query, stem=False):
        qtf[t] = qtf.get(t, 0) + 1
    cf = {t: sum(ts.count(t) for ts in toks.values()) for t in qtf}
    want = {}
    for did, ts in toks.items():
        if not any(t in ts for t in qtf):
            continue
        s = sum(w * math.log((1 - lam) * ts.count(t) / len(ts)
                             + lam * cf[t] / T)
                for t, w in qtf.items() if cf[t] > 0)
        want[did] = round(s, 6)
    assert len(got) == len(want)
    for did, s in want.items():
        assert got[did] == pytest.approx(s, abs=2e-6)


def test_ltr_features_consistency(ray_session):
    """Feature block agrees with the retrieval paths it summarizes:
    bm25 equals bm25_documents' score per doc, n_match reaches the
    distinct-term count on conjunctive hits, and dl matches the
    tokenizer's count."""
    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.docsearch import (bm25_documents,
                                             ltr_features_documents)

    q = "spark window merge window"
    feats = ltr_features_documents(SF, q).set_index("doc_id")
    scores = bm25_documents(SF, q, k=None).set_index("doc_id")["score"]
    assert len(feats) == len(scores)
    assert (feats["bm25"] - scores).abs().max() <= 1e-9

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    for did in list(feats.index[:20]):
        toks = tokenize(docs.loc[did, "text"], stem=False)
        assert feats.loc[did, "dl"] == len(toks)
        present = {t for t in ("spark", "window", "merge") if t in toks}
        assert feats.loc[did, "n_match"] == len(present)
        assert feats.loc[did, "sum_tf"] == sum(toks.count(t)
                                               for t in present)


def test_paragraph_dedup_global_first(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.dedup import paragraph_dedup

    t = pa.table({
        "doc_id": pa.array([2, 0, 1, 3], type=pa.int64()),
        "text": pa.array([
            "dup\nunique-two",   # dup also heads doc 0: first is doc 0
            "dup\nalpha\ndup",   # within-doc repeat: idx 0 wins over 2
            "alpha\nbeta",       # alpha already owned by doc 0 idx 1
            None,
        ]),
    })
    got = paragraph_dedup(ray.data.from_arrow(t)).to_pandas() \
        .sort_values(["doc_id", "para_idx"]).reset_index(drop=True)
    rows = {(r.doc_id, r.para_idx): (r.para, r.n_copies)
            for r in got.itertuples()}
    assert rows == {
        (0, 0): ("dup", 3),          # global first of 'dup'
        (0, 1): ("alpha", 2),
        (1, 1): ("beta", 1),
        (2, 1): ("unique-two", 1),
    }


def test_gopher_rules_boundaries(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import gopher_rules

    word = "word "  # len-4 words -> mwl 4.0, alpha 1.0
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            word * 30,                 # exactly min words: passes
            word * 29,                 # one short: fails word count
            word * 30 + "### #",       # symbols: sym=4/32>0.05 fails
            "",                        # zero words: dropped
            None,                      # null: dropped
        ]),
    })
    got = gopher_rules(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id")
    assert sorted(got.index) == [0, 1, 2]
    assert bool(got.loc[0, "passes"]) is True
    assert got.loc[0, "mean_word_len"] == 4.0
    assert bool(got.loc[1, "passes"]) is False
    assert bool(got.loc[2, "passes"]) is False
    assert got.loc[2, "symbol_ratio"] == round(4 / 32, 6)


def test_group_corr_edge_cases(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import group_corr

    t = pa.table({
        "g": ["a"] * 4 + ["b"] * 3 + ["c"] * 2 + ["d"] * 2,
        "x": [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 5.0, 5.0, 1.0, None],
        "y": [2.0, 4.0, 6.0, 8.0, 9.0, 5.0, 1.0, 7.0, 2.0, 3.0, 9.0],
    })
    got = group_corr(ray.data.from_arrow(t), group="g", x="x", y="y") \
        .to_pandas().set_index("g")["corr_xy"]
    assert got["a"] == 1.0          # perfectly linear
    assert got["b"] == -1.0         # perfectly anti-linear
    assert pd.isna(got["c"])        # zero x-variance -> null
    assert pd.isna(got["d"])        # single surviving pair -> null

    import duckdb
    want = duckdb.sql(
        "SELECT g, round(corr(x, y), 6) FROM t GROUP BY g ORDER BY g"
    ).fetchall()
    for g, w in want:
        assert (pd.isna(got[g]) and w is None) or got[g] == w


def test_wildcard_terms_semantics(ray_session):
    from rse_ray.pipelines.docsearch import wildcard_terms

    got = wildcard_terms(SF, "s?a*", k=5)
    assert set(got["term"]) >= {"scan", "spark"}
    assert all(t.startswith("s") and t[2:3] == "a" for t in got["term"])
    # df-desc, term-asc ranking
    dfs = got["df"].tolist()
    assert dfs == sorted(dfs, reverse=True)
    with pytest.raises(ValueError):
        wildcard_terms(SF, "*tail")


def test_bm25_champions_semantics(ray_session):
    from rse_ray.pipelines.docsearch import (bm25_champions_documents,
                                             bm25_documents)

    q = "spark window merge window"
    exact = bm25_documents(SF, q, k=None).set_index("doc_id")["score"]
    # m >= any df: pruning is a no-op, top-k identical to exact
    wide = bm25_champions_documents(SF, q, k=20, m=10**6)
    top = exact.sort_values(ascending=False).iloc[:20]
    assert wide["score"].tolist() == sorted(top.tolist(), reverse=True)
    # tight m: every champion-scored doc is <= its exact score (a doc
    # can only LOSE term contributions under pruning)
    tight = bm25_champions_documents(SF, q, k=20, m=2)
    for r in tight.itertuples():
        assert r.score <= exact[r.doc_id] + 1e-9


def test_mlm_mask_plan_rates_and_determinism(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import mlm_mask_plan

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    ds = ray.data.from_pandas(docs)
    got = mlm_mask_plan(ds).to_pandas()
    n_tokens = docs["text"].str.split().str.len().sum()
    # ~15% selection, ~80/10/10 split (binomial tolerance)
    assert abs(len(got) / n_tokens - 0.15) < 0.02
    frac = got["action"].value_counts(normalize=True)
    assert abs(frac["mask"] - 0.8) < 0.05
    assert abs(frac.get("random", 0) - 0.1) < 0.04
    assert abs(frac.get("keep", 0) - 0.1) < 0.04
    # action semantics
    m = got[got["action"] == "mask"]
    assert (m["replacement"] == "[MASK]").all()
    kp = got[got["action"] == "keep"]
    assert (kp["replacement"] == kp["token"]).all()
    # deterministic replay
    again = mlm_mask_plan(ray.data.from_pandas(docs)).to_pandas()
    a = got.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    b = again.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert a.equals(b)


def test_bm25_plus_lower_bound_property(ray_session):
    """BM25+ dominates BM25's tf-part for matched terms: with delta=1
    every candidate's score strictly exceeds what delta=0 gives, and
    delta=0 ranks identically to itself deterministically."""
    from rse_ray.pipelines.docsearch import bm25_plus_documents

    q = "spark window merge window"
    with_d = bm25_plus_documents(SF, q, k=None, delta=1.0) \
        .set_index("doc_id")["score"]
    no_d = bm25_plus_documents(SF, q, k=None, delta=0.0) \
        .set_index("doc_id")["score"]
    assert set(with_d.index) == set(no_d.index)
    assert ((with_d - no_d) > 0).all()


def test_pushdown_scan_prunes(ray_session):
    from rse_ray.sources.formats import pushdown_scan

    got = pushdown_scan(SF).to_pandas()
    assert set(got.columns) == {"event_id", "user_id", "value"}
    assert (got["value"] >= 100.0).all()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    want_n = ((ev["event_type"] == "purchase")
              & (ev["value"] >= 100.0)).sum()
    assert len(got) == want_n


def test_zorder_key_locality_beats_single_dim_sort(ray_session):
    """The point of the layout: blocks of a z-sorted table are touched
    by a 2-D range predicate no more (and typically far less) often
    than blocks of a one-dimension-sorted table."""
    import ray.data

    from rse_ray.pipelines.relational import zorder_key

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id"])
    z = zorder_key(ray.data.from_pandas(ev), x_col="user_id",
                   y_col="event_id").to_pandas()
    # definitional check on a few rows
    for r in z.head(50).itertuples():
        want = 0
        for b in range(16):
            want |= ((int(r.user_id) >> b) & 1) << (2 * b)
            want |= ((int(r.event_id) >> b) & 1) << (2 * b + 1)
        assert r.zval == want

    ux, uy = ev["user_id"], ev["event_id"]
    lox, hix = ux.quantile(0.4), ux.quantile(0.6)
    loy, hiy = uy.quantile(0.4), uy.quantile(0.6)
    hit = (ux.between(lox, hix) & uy.between(loy, hiy))

    def blocks_touched(order):
        blk = pd.Series(np.arange(len(ev)) // 256, index=order)
        return blk[hit.reindex(order).values].nunique()

    z_order = z.sort_values(["zval", "event_id"]).index
    one_dim = ev.sort_values(["user_id", "event_id"]).index
    assert blocks_touched(z_order) <= blocks_touched(one_dim)


def test_warc_source_roundtrip_and_hostile_payloads(ray_session, tmp_path):
    """Records are walked by Content-Length: payloads containing the
    header terminator bytes must round-trip intact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rse_ray.sources.formats import documents_warc

    hostile = "line1\r\n\r\nWARC/1.0 fake\r\nContent-Length: 3"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([hostile, "", "plain"]),
        "lang": pa.array(["en", "de", "fr"]),
        "source": pa.array(["a", "b", "c"]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = documents_warc(str(d), num_shards=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["text"].tolist() == [hostile, "", "plain"]
    assert got["lang"].tolist() == ["en", "de", "fr"]


def test_span_near_ordered_semantics(ray_session):
    """Brute-force check: n_spans counts a-positions followed by a b
    within slop gaps, ordered only (b before a never counts)."""
    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.docsearch import span_near_documents

    slop = 3
    got = span_near_documents(SF, "hash", "join", slop=slop) \
        .set_index("doc_id")["n_spans"]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    want = {}
    for r in docs.itertuples():
        toks = tokenize(r.text, stem=False)
        pa_ = [i for i, t in enumerate(toks) if t == "hash"]
        pb_ = [i for i, t in enumerate(toks) if t == "join"]
        n = sum(1 for i in pa_
                if any(i < j <= i + slop + 1 for j in pb_))
        if n:
            want[r.doc_id] = n
    assert got.to_dict() == want


def test_phrase_gap_exact_distance_semantics(ray_session):
    """Brute-force check: n_spans counts a-positions with a b at
    EXACTLY pos_a + gap + 1 (the "a * b" wildcard-slot phrase)."""
    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.docsearch import phrase_gap_documents

    gap = 1
    got = phrase_gap_documents(SF, "hash", "join", gap=gap) \
        .set_index("doc_id")["n_spans"]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    want = {}
    for r in docs.itertuples():
        toks = tokenize(r.text, stem=False)
        pb_ = {i for i, t in enumerate(toks) if t == "join"}
        n = sum(1 for i, t in enumerate(toks)
                if t == "hash" and i + gap + 1 in pb_)
        if n:
            want[r.doc_id] = n
    assert got.to_dict() == want
    # exact distance only: a doc where b trails a by gap+2 never hits
    assert all(v >= 1 for v in got.to_dict().values())


def test_phrase_scanner_overlap_and_failure_links(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import PhraseScanner, phrase_scan

    # native AC semantics: counts at every end position, including a
    # pattern inside another pattern's match ('ab' inside 'aab')
    sc = PhraseScanner(["ab", "aab", "bc"])
    counts = np.zeros(3, dtype=np.int64)
    sc._scan("xaabc aab", counts)
    assert counts.tolist() == [2, 2, 1]

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["merge join then merge join", "no hits", None]),
    })
    got = phrase_scan(ray.data.from_arrow(t),
                      ["merge join", "hash table"],
                      concurrency=2).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].tolist() == [0, "merge join", 2]


def test_cms_overestimates_and_merge_order_invariance(ray_session):
    import ray.data

    from rse_ray.pipelines.sketch import cms_term_counts

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    probes = ["spark", "window", "hash", "the", "zzznope"]
    got = cms_term_counts(ray.data.from_pandas(docs), probes) \
        .set_index("term")
    # CMS never underestimates
    assert (got["cms_n"] >= got["exact_n"]).all()
    # width 16 vs ~31 terms: at least one probe strictly overestimates
    assert (got["cms_n"] > got["exact_n"]).any()
    # counter sums commute: a different batch layout -> same sketch
    again = cms_term_counts(
        ray.data.from_pandas(docs).repartition(13), probes) \
        .set_index("term")
    assert got.equals(again)


def test_registrable_domains_psl_algorithm(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import registrable_domains

    rules = ["com", "uk", "co.uk", "io", "github.io", "*.ck", "!www.ck"]
    cases = {
        "a.b.example.com": "example.com",     # longest normal rule
        "Example.CO.UK": "example.co.uk",     # co.uk beats uk; lowered
        "co.uk": None,                        # host IS a public suffix
        "example.zz": "example.zz",           # implicit * rule
        "zz": None,
        "anything.ck": None,                  # *.ck: PS eats one label
        "www.anything.ck": "www.anything.ck",
        "sub.www.ck": "www.ck",               # !www.ck exception
        "deep.foo.github.io": "foo.github.io",
    }
    t = pa.table({"host": pa.array(list(cases), type=pa.string())})
    got = registrable_domains(ray.data.from_arrow(t), rules) \
        .to_pandas().set_index("host")["registrable"]
    for h, want in cases.items():
        g = got[h]
        assert (g is None or pd.isna(g)) if want is None else g == want


def test_cdc_chunks_resync_on_insertion(ray_session):
    """The CDC property: inserting bytes near the head only changes
    chunking locally — boundaries resynchronize within a window, so
    the tail chunks (as byte strings) are identical."""
    from rse_ray.functions.hashing import cdc_boundaries

    base = ("key agg row scan slow fast table value part hash value "
            "table part a row fast merge batch part value fast spark "
            "a a the line sort table window table table key") * 3
    edited = base[:40] + "INSERTED BYTES " + base[40:]

    def chunks(s):
        data = s.encode()
        prev, out = 0, []
        for c in cdc_boundaries(data):
            out.append(data[prev:c])
            prev = c
        assert b"".join(out) == data  # partition covers the doc
        return out

    a, b = chunks(base), chunks(edited)
    # a long common tail of identical chunks survives the edit
    n_common = 0
    while (n_common < min(len(a), len(b))
           and a[-1 - n_common] == b[-1 - n_common]):
        n_common += 1
    assert n_common >= len(a) // 2


def test_dup_chunks_cross_doc(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import dup_chunks

    shared = "key agg row scan slow fast table value part hash " * 4
    t = pa.table({
        "doc_id": pa.array([5, 1, 9], type=pa.int64()),
        "text": pa.array([f"AAA {shared}", f"BBBBB {shared}",
                          "totally unlike the others"]),
    })
    got = dup_chunks(ray.data.from_arrow(t)).to_pandas()
    # the shared run produces >= 1 duplicated chunk, owned by doc 1
    assert len(got) >= 1
    assert (got["n_copies"] >= 2).all()
    assert (got["rep_doc_id"] != 9).all()
    assert 1 in set(got["rep_doc_id"])  # min doc_id wins representative


def test_hybrid_rrf_fusion_semantics(ray_session):
    import ray.data

    from rse_ray.pipelines.ann import brute_force_knn
    from rse_ray.pipelines.docsearch import (bm25_documents,
                                             hybrid_rrf_documents)

    got = hybrid_rrf_documents(SF, "spark window merge window", 0,
                               k_each=50, k=20)
    lex = bm25_documents(SF, "spark window merge window", k=50)
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    vec = brute_force_knn(emb, [0], k=50, round_to=None)
    lex_r = {int(d): r + 1 for r, d in enumerate(lex["doc_id"])}
    vec_r = {int(d): r + 1 for r, d in enumerate(vec["neighbor_id"])}
    for row in got.itertuples():
        want = (1 / (60 + lex_r[row.doc_id]) if row.doc_id in lex_r
                else 0) + (1 / (60 + vec_r[row.doc_id])
                           if row.doc_id in vec_r else 0)
        assert row.rrf == round(want, 6)
    # a doc in BOTH lists outranks rank-1 of a single list iff sums say
    both = [d for d in got["doc_id"] if d in lex_r and d in vec_r]
    if both:
        assert got["rrf"].iloc[0] >= round(1 / 61, 6) or not both


def test_sq_rerank_recall_dominates_sq(ray_session):
    """The rerank stage can only help: recall@10 vs exact brute force
    is >= plain SQ's recall, and with a 40-deep shortlist it is near 1."""
    import ray.data

    from rse_ray.pipelines.ann import brute_force_knn, sq_knn, sq_rerank_knn

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    qids = [0, 1, 2, 3, 4]
    exact = brute_force_knn(emb, qids, k=10)
    sq = sq_knn(emb, qids, k=10)
    rr = sq_rerank_knn(emb, qids, k=10, shortlist=40)

    def recall(df):
        r = 0.0
        for q in qids:
            e = set(exact.loc[exact["query_id"] == q, "neighbor_id"])
            g = set(df.loc[df["query_id"] == q, "neighbor_id"])
            r += len(e & g) / len(e)
        return r / len(qids)

    assert recall(rr) >= recall(sq)
    assert recall(rr) >= 0.9


def test_mix_plan_token_budget_invariant(ray_session):
    import ray.data

    from rse_ray.pipelines.text import mix_epochs, mix_plan

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    plan = mix_plan(ray.data.from_pandas(docs))
    # the plan reshapes the mix at constant total token budget
    total = plan["n_tokens"].sum()
    realized = (plan["repeat_factor"] * plan["n_tokens"]).sum()
    assert abs(realized - total) / total < 1e-4
    assert abs(plan["target_share"].sum() - 1.0) < 1e-4
    # weights 1..4 by suffix: src3 gets 4x the share of src0
    s = plan.set_index("source")["target_share"]
    assert abs(s["src3"] / s["src0"] - 4.0) < 1e-3

    reps = mix_epochs(ray.data.from_pandas(docs)).to_pandas()
    assert len(reps) == len(docs)
    m = reps.merge(docs[["doc_id", "source"]], on="doc_id")
    pf = plan.set_index("source")["repeat_factor"]
    for src, g in m.groupby("source"):
        r = pf[src]
        # integer repeats bracket the factor and average near it
        assert g["n_repeats"].between(np.floor(r), np.ceil(r)).all()
        assert abs(g["n_repeats"].mean() - r) < 0.35


def test_maxscore_rank_identity_and_engagement(ray_session):
    from rse_ray.pipelines.docsearch import documents_index
    from rse_ray.pipelines.search import Searcher

    s = Searcher(documents_index(SF, stem=False))
    queries = ["spark window merge window", "hash join", "dup key line",
               "the a table", "zzz nothing", "sort"]
    engaged = False
    for q in queries:
        stats: dict = {}
        got = s.search_maxscore(q, k=10, stats=stats)
        want = s.search(q, k=10, mode="taat")
        # rank-identical; scores agree to fp re-association (MaxScore
        # accumulates terms in ub order, TAAT in term order)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) <= 1e-9
        if stats and (stats["pruned"] or stats["skipped_new"]):
            engaged = True
    assert engaged  # pruning actually fires on head-term queries


def test_corpus_release_composition(ray_session):
    import ray.data

    from rse_ray.pipelines.text import corpus_release, gopher_rules

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    got = corpus_release(ray.data.from_pandas(docs)).to_pandas()
    # every survivor passed the quality gate
    flags = gopher_rules(ray.data.from_pandas(docs)).to_pandas() \
        .set_index("doc_id")
    assert flags.loc[got["doc_id"], "passes"].all()
    # no two survivors share a text; survivor is the min doc_id copy
    texts = docs.set_index("doc_id").loc[got["doc_id"], "text"]
    assert texts.is_unique
    dup_groups = docs[docs["text"].isin(texts)].groupby("text")
    for _, g in dup_groups:
        keep = set(g["doc_id"]) & set(got["doc_id"])
        if keep:
            assert min(g["doc_id"]) in keep
    assert (got["n_repeats"] >= 1).all()


def test_containment_vs_jaccard_asymmetry(ray_session):
    """A short doc fully quoted inside a long one: containment ~1,
    jaccard small — only the containment measure finds the pair."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.dedup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = ("one two three four five six seven eight nine ten " * 6
            + short)
    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([short, long]),
    })
    cont = ngram_jaccard_pairs(ray.data.from_arrow(t), threshold=0.9,
                               measure="containment").to_pandas()
    jac = ngram_jaccard_pairs(ray.data.from_arrow(t),
                              threshold=0.5).to_pandas()
    assert len(cont) == 1 and cont["containment"].iloc[0] >= 0.9
    assert len(jac) == 0


def test_freq_spectrum_and_feature_hashing(ray_session, duck):
    import ray.data

    from rse_ray.pipelines.text import feature_hashing, freq_spectrum

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    spec = freq_spectrum(ray.data.from_pandas(docs)).to_pandas()
    # sum(r * N_r) == total tokens; sum(N_r) == vocab size
    toks = docs["text"].str.lower().str.split().explode()
    toks = toks[toks != ""]
    assert (spec["n_occurrences"] * spec["n_types"]).sum() == len(toks)
    assert spec["n_types"].sum() == toks.nunique()

    fh = feature_hashing(ray.data.from_pandas(docs)).to_pandas()
    # one doc recomputed by hand through the same hash convention
    import hashlib as hl
    import struct

    did = int(docs["doc_id"].iloc[0])
    words = [w for w in docs["text"].iloc[0].lower().split() if w]
    vec = np.zeros(64, dtype=np.int64)
    for w in set(words):
        h = struct.unpack(
            "<Q", hl.md5(f"fh:{w}".encode()).digest()[8:])[0]
        sign = 1 if (h // 64) % 2 == 1 else -1
        vec[h % 64] += sign * words.count(w)
    mine = fh[fh["doc_id"] == did].set_index("dim")["value"]
    for d in range(64):
        assert vec[d] == mine.get(d, 0)


def test_canonical_dedup_groups_variants(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import canonical_dedup

    t = pa.table({"url": pa.array([
        "HTTP://WWW.Site.Example/Path/",
        "http://site.example/Path",
        "https://shop.example/p?b=2&a=1&fbclid=xyz",
        "https://shop.example/p?a=1&b=2",
    ])})
    got = canonical_dedup(ray.data.from_arrow(t)).to_pandas() \
        .set_index("canonical_url")
    assert got.loc["http://site.example/Path", "n_variants"] == 2
    assert got.loc["http://site.example/Path", "rep_url"] \
        == "HTTP://WWW.Site.Example/Path/"
    assert got.loc["https://shop.example/p?a=1&b=2", "n_variants"] == 2


def test_skew_report_with_nulls_and_hot_key(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import skew_report

    t = pa.table({"k": pa.array(["hot"] * 90 + ["a"] * 5 + ["b"] * 4
                                + [None])})
    got = skew_report(ray.data.from_arrow(t), key="k")
    r = got.iloc[0]
    assert r["n_keys"] == 4 and r["n_rows"] == 100
    assert r["max_count"] == 90 and r["top_key"] == "hot"
    assert r["skew_ratio"] == round(90 / 25, 6)


def test_review_fixes_ltr_empty_and_null_dedup(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.docsearch import ltr_features_documents
    from rse_ray.pipelines.text import exact_dedup_keep

    empty = ltr_features_documents(SF, "zzznope qqq")
    assert len(empty) == 0
    assert list(empty.columns) == ["doc_id", "bm25", "dl", "n_match",
                                   "sum_tf", "max_tf", "sum_idf"]

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([None, "None", None, "x"]),
    })
    kept = exact_dedup_keep(ray.data.from_arrow(t)).to_pandas()
    # nulls group together (doc 0 survives), distinct from "None"
    assert sorted(kept["doc_id"]) == [0, 1, 3]


def test_ttl_dedup_sliding_semantics(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import ttl_dedup

    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:30",
                         "2024-01-01 00:59", "2024-01-01 02:30",
                         "2024-01-01 00:10"])
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "event_type": ["a"] * 5,
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
    })
    got = ttl_dedup(ray.data.from_arrow(t), ttl_minutes=60).to_pandas()
    # 00:00 kept; 00:30 suppressed; 00:59 suppressed (29min since
    # 00:30 — the SUPPRESSED row armed the window: sliding semantics);
    # 02:30 kept (91min gap); user 2's first kept
    assert sorted(got["event_id"]) == [10, 13, 14]


def test_auto_stopwords_and_sentence_split(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import auto_stopwords, sentence_split

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["the cat", "the dog", "the bird", "fish"]),
    })
    sw = auto_stopwords(ray.data.from_arrow(t), ratio=0.5).to_pandas()
    assert sw["term"].tolist() == ["the"]
    assert sw["df"].tolist() == [3] and sw["df_ratio"].tolist() == [0.75]

    t2 = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["One two. Three!  Four? tail frag", None]),
    })
    got = sentence_split(ray.data.from_arrow(t2)).to_pandas()
    assert got["sentence"].tolist() == ["One two.", "Three!", "Four?",
                                        "tail frag"]
    assert got["sent_idx"].tolist() == [0, 1, 2, 3]


def test_significant_terms_jlh(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import significant_terms

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["cat dog", "cat", "dog", "dog"]),
        "lang": pa.array(["en", "en", "de", "de"]),
    })
    got = significant_terms(ray.data.from_arrow(t), fg_lang="en") \
        .to_pandas().set_index("term")
    # cat: fg 2/2 vs bg 2/4 -> (1-0.5)*(1/0.5) = 1.0
    assert got.loc["cat", "score"] == 1.0
    assert got.loc["cat", "df_fg"] == 2 and got.loc["cat", "df_all"] == 2
    # dog: fg 1/2 vs bg 3/4 -> (0.5-0.75)*(0.5/0.75)
    assert got.loc["dog", "score"] == round((0.5 - 0.75) * (0.5 / 0.75), 6)


def test_llr_bigrams_contingency(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import llr_bigrams

    # 6 bigrams total: "a b" x3, "a c" x2, "c b" x1
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b a c", "a b a c", "a b c b"]),
    })
    got = llr_bigrams(ray.data.from_arrow(t), min_count=1, top_n=50)
    # hand-check "a b": count each bigram from the three docs:
    # doc0/1: (a b), (b a), (a c); doc2: (a b), (b c), (c b) -> N=9
    # k11(a b)=3, row(a *)=a b x3 + a c x2 =5, col(* b)=a b 3 + c b 1=4
    k11, r1, c1, N = 3.0, 5.0, 4.0, 9.0
    k12, k21, k22 = r1 - k11, c1 - k11, N - r1 - c1 + k11

    def term(k, e):
        return k * math.log(k / e) if k > 0 else 0.0

    want = 2 * (term(k11, r1 * c1 / N) + term(k12, r1 * (N - c1) / N)
                + term(k21, (N - r1) * c1 / N)
                + term(k22, (N - r1) * (N - c1) / N))
    row = got[got["bigram"] == "a b"].iloc[0]
    assert row["n"] == 3
    assert abs(row["llr"] - round(want, 6)) < 1e-9


def test_group_ols_exact_line(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import group_ols

    # group g: y = 3x + 2 exactly; group h: y = -x + 10
    t = pa.table({
        "g": pa.array(["g", "g", "g", "h", "h", "h"]),
        "x": pa.array([1.0, 2.0, 3.0, 1.0, 2.0, 4.0]),
        "y": pa.array([5.0, 8.0, 11.0, 9.0, 8.0, 6.0]),
    })
    got = group_ols(ray.data.from_arrow(t), group="g", x="x", y="y") \
        .to_pandas().set_index("g")
    assert got.loc["g", "slope"] == 3.0 and got.loc["g", "intercept"] == 2.0
    assert got.loc["h", "slope"] == -1.0 and got.loc["h", "intercept"] == 10.0
    assert got["n"].tolist() == [3, 3]


def test_fuzzy_pairs_symspell(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.dedup import _edit_distance_le1, fuzzy_pairs

    # ab/ba share delete key 'a' AND 'b' but are distance 2 (must be
    # verified away); cat/cut substitution; cat/cats insertion;
    # dog unrelated
    t = pa.table({"c_name": pa.array(
        ["ab", "ba", "cat", "cut", "cats", "dog", None])})
    got = fuzzy_pairs(ray.data.from_arrow(t), col="c_name").to_pandas()
    pairs = sorted(map(tuple, got[["name_a", "name_b"]].values))
    assert pairs == [("cat", "cats"), ("cat", "cut")]
    assert not _edit_distance_le1("ab", "ba")
    assert _edit_distance_le1("x", "x") and _edit_distance_le1("", "x")


def test_market_basket_lift(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import market_basket

    # 4 baskets: {1,2} x3, {1,3} x1 -> pair (1,2) n=3, (1,3) n=1
    t = pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11, 12, 12, 13, 13, 13],
                               type=pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2, 1, 2, 1, 3, 3],
                              type=pa.int64()),
    })
    got = market_basket(ray.data.from_arrow(t), min_pair=2).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["part_a"], r["part_b"], r["n_pair"]) == (1, 2, 3)
    assert (r["n_a"], r["n_b"]) == (4, 3)
    # lift = 3 * 4 / (4 * 3) = 1.0
    assert r["lift"] == 1.0


def test_trending_event_types_windows(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import trending_event_types

    base = np.datetime64("2024-01-31T00:00:00", "us")
    ts = [base, base - np.timedelta64(3, "D"),          # cur x2
          base - np.timedelta64(8, "D"),                # prev
          base - np.timedelta64(20, "D")]               # neither
    t = pa.table({
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "a", "a"]),
    })
    got = trending_event_types(ray.data.from_arrow(t)).to_pandas()
    r = got.iloc[0]
    assert (r["n_cur"], r["n_prev"]) == (2, 1)
    assert r["lift"] == 1.5


def test_ab_test_welch_known(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import ab_test_welch

    t = pa.table({
        "event_type": pa.array(["x"] * 3 + ["y"] * 3),
        "value": pa.array([1.0, 2.0, 3.0, 2.0, 4.0, 6.0]),
    })
    got = ab_test_welch(ray.data.from_arrow(t), group_a="x",
                        group_b="y").to_pandas().iloc[0]
    # means 2 and 4, s2 = 1 and 4 -> t = -2/sqrt(1/3+4/3) = -sqrt(2.4)
    assert got["mean_a"] == 2.0 and got["mean_b"] == 4.0
    assert abs(got["t_stat"] - round(-((2.4) ** 0.5) * 2 / 2, 6)) < 1e-9
    # df = (5/3)^2 / ((1/3)^2/2 + (4/3)^2/2)
    assert abs(got["df"] - round((25 / 9) / ((1 / 9) / 2 + (16 / 9) / 2),
                                 6)) < 1e-9


def test_mmr_rerank_diversifies(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import mmr_rerank

    # query (id 0) at e0; ids 1,2 nearly duplicate e0; id 3 at 60deg
    # (moderate relevance, low redundancy); pure relevance order is
    # 1,2,3 — diversity-heavy MMR (lam=0.2) must pick 3 before the
    # near-duplicate 2: score(2) ~ 0.2*1.0 - 0.8*1.0 = -0.6 while
    # score(3) ~ 0.2*0.5 - 0.8*0.51 = -0.31
    vecs = [[1.0, 0.0], [0.999, 0.01], [0.998, 0.02], [0.5, 0.866]]
    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
    })
    got = mmr_rerank(ray.data.from_arrow(t), 0, pool=3, k=3,
                     lam=0.2).to_pandas()
    assert got["neighbor_id"].tolist() == [1, 3, 2]
    assert got["rank"].tolist() == [0, 1, 2]
    assert got["rel"].iloc[0] > 0.99


def test_bool_query_parser_and_match(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from rse_ray.functions.queryparse import QueryParseError, parse
    from rse_ray.pipelines.text import bool_query_match

    # precedence: NOT > AND > OR
    assert parse("a OR b AND NOT c") == \
        ("or", [("term", "a"),
                ("and", [("term", "b"), ("not", ("term", "c"))])])
    # strict grammar: adjacent terms without an operator are an error
    for bad in ["a AND", "(a OR b", "NOT", "", "x and y"]:
        with pytest.raises(QueryParseError):
            parse(bad)

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["big cat", "big dog", "cat dog",
                          None, "bird"]),
    })
    got = bool_query_match(ray.data.from_arrow(t),
                           "(big AND cat) OR (dog AND NOT big)") \
        .to_pandas()
    assert sorted(got["doc_id"]) == [0, 2]


def test_mad_outliers_and_user_ewma(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import mad_outliers, user_ewma

    t = pa.table({
        "event_id": pa.array(list(range(7)), type=pa.int64()),
        "event_type": pa.array(["a"] * 7),
        "value": pa.array([10.0, 11.0, 9.0, 10.0, 12.0, 8.0, 100.0]),
    })
    got = mad_outliers(ray.data.from_arrow(t)).to_pandas()
    assert got["event_id"].tolist() == [6]  # only the 100.0 spike

    base = np.datetime64("2024-01-01T00:00:00", "us")
    e = pa.table({
        "user_id": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([base, base + np.timedelta64(1, "h"),
                        base + np.timedelta64(2, "h")],
                       type=pa.timestamp("us")),
        "event_id": pa.array([0, 1, 2], type=pa.int64()),
        "value": pa.array([10.0, 20.0, 30.0]),
    })
    got = user_ewma(ray.data.from_arrow(e), alpha=0.5).to_pandas()
    # e = 10 -> 15 -> 22.5
    assert got["ewma"].tolist() == [22.5]
    assert got["n_events"].tolist() == [3]


def test_scc_forward_backward(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import scc

    # a<->b<->c is one SCC (two overlapping 2-cycles); d is reachable
    # from it but never returns (singleton); e->a feeds in (singleton);
    # f has only a self-loop (singleton)
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("c", "d"), ("e", "a"), ("f", "f")]
    t = pa.table({
        "src_url": pa.array([x for x, _ in edges]),
        "dst_url": pa.array([y for _, y in edges]),
    })
    got = scc(ray.data.from_arrow(t)).to_pandas() \
        .set_index("url")["scc_id"].to_dict()
    assert got == {"a": "a", "b": "a", "c": "a",
                   "d": "d", "e": "e", "f": "f"}


def test_percolate_bank(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import percolate

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["cat dog", "cat", None]),
    })
    got = percolate(ray.data.from_arrow(t),
                    ["cat AND dog", "cat AND NOT dog", "bird OR dog"]) \
        .to_pandas()
    pairs = sorted(map(tuple, got[["doc_id", "query_id"]].values))
    assert pairs == [(0, 0), (0, 2), (1, 1)]


def test_scd2_intervals_runs(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import scd2_intervals

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hh = np.timedelta64(1, "h")
    t = pa.table({
        "user_id": pa.array([1] * 5, type=pa.int64()),
        "ts": pa.array([base + i * hh for i in range(5)],
                       type=pa.timestamp("us")),
        "event_id": pa.array(list(range(5)), type=pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "a"]),
    })
    got = scd2_intervals(ray.data.from_arrow(t)).to_pandas()
    assert got["event_type"].tolist() == ["a", "b", "a"]
    assert got["n_events"].tolist() == [2, 2, 1]
    assert got["valid_from"].tolist()[1] == got["valid_to"].tolist()[0]
    assert pd.isna(got["valid_to"].iloc[2])


def test_lsa_power_iteration_direction(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import lsa_power_iteration

    # two docs about 'cat', one about 'dog' -> the dominant axis
    # loads more on cat-cluster terms than the dog term
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["cat cat purr", "cat purr", "dog bark"]),
    })
    got = lsa_power_iteration(ray.data.from_arrow(t), iters=3) \
        .to_pandas().set_index("term")["loading"]
    assert got["cat"] > got["dog"]
    # unit norm
    assert abs((got ** 2).sum() - 1.0) < 1e-4


def test_shipping_priority_q3(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import shipping_priority

    d0 = np.datetime64("1995-03-01", "us")
    d1 = np.datetime64("1995-04-01", "us")
    cust = pa.table({"c_custkey": pa.array([1, 2], type=pa.int64()),
                     "c_mktsegment": pa.array(["BUILDING", "AUTO"])})
    orders = pa.table({
        "o_orderkey": pa.array([10, 11, 12], type=pa.int64()),
        "o_custkey": pa.array([1, 1, 2], type=pa.int64()),
        "o_orderdate": pa.array([d0, d1, d0],
                                type=pa.timestamp("us")),
    })
    li = pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0, 400.0]),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0]),
        "l_shipdate": pa.array([d1, d1, d1, d1],
                               type=pa.timestamp("us")),
    })
    got = shipping_priority(ray.data.from_arrow(cust),
                            ray.data.from_arrow(orders),
                            ray.data.from_arrow(li))
    # order 11 fails the orderdate filter; order 12 is AUTO; order 10
    # revenue = 100*0.9 + 200 = 290
    assert got["o_orderkey"].tolist() == [10]
    assert got["revenue"].tolist() == [290.0]


def test_winsorized_and_hash_moves(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (consistent_hash_moves,
                                              winsorized_mean)

    vals = list(map(float, range(1, 101)))
    t = pa.table({"event_type": pa.array(["a"] * 100),
                  "value": pa.array(vals)})
    got = winsorized_mean(ray.data.from_arrow(t)).to_pandas().iloc[0]
    # q05 = 5.95, q95 = 95.05 (linear interpolation on 1..100)
    assert got["q_lo"] == 5.95 and got["q_hi"] == 95.05
    lo, hi = 5.95, 95.05
    want = sum(min(max(v, lo), hi) for v in vals) / 100
    assert abs(got["wins_mean"] - round(want, 6)) < 1e-9

    d = pa.table({"doc_id": pa.array(list(range(1000)),
                                     type=pa.int64())})
    mv = consistent_hash_moves(ray.data.from_arrow(d)).to_pandas()
    assert mv["n_keys"].sum() == 1000
    stayed = mv.loc[mv["shard_before"] == mv["shard_after"],
                    "n_keys"].sum()
    # consistent hashing moves ~1/9 of keys on 8 -> 9 growth, far
    # from mod-N's ~8/9; allow a loose band
    assert stayed > 700


def test_rag_chunk_search_selfsim(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import rag_chunk_search

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["red fish blue fish",
                          "red fish blue fish swims deep",
                          "totally unrelated words here now"]),
    })
    got = rag_chunk_search(ray.data.from_arrow(t), 0, dim=64,
                           chunk=8, overlap=2, k=3)
    # doc 1's first chunk contains the query doc verbatim -> top hit
    assert got.iloc[0]["doc_id"] == 1
    assert got.iloc[0]["cos"] > 0.8
    # the query doc itself is excluded
    assert (got["doc_id"] != 0).all()


def test_did_you_mean_ranking(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import did_you_mean

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["cat cot", "cat", "dog"]),
    })
    got = did_you_mean(ray.data.from_arrow(t),
                       ["cat", "cut", "zebra"]) \
        .set_index("query")
    # exact hit wins at dist 0
    assert got.loc["cat", "suggestion"] == "cat"
    assert got.loc["cat", "dist"] == 0
    # cut -> cat (df 2) beats cot (df 1) at equal dist 1
    assert got.loc["cut", "suggestion"] == "cat"
    assert got.loc["cut", "df"] == 2
    # no candidate within distance 1
    assert "zebra" not in got.index


def test_condensation_layers_depth(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import condensation_layers

    # SCC {a,b} -> c -> d and {a,b} -> d directly: layers 0, 1, 2
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"),
             ("b", "d")]
    t = pa.table({
        "src_url": pa.array([x for x, _ in edges]),
        "dst_url": pa.array([y for _, y in edges]),
    })
    got = condensation_layers(ray.data.from_arrow(t)).to_pandas() \
        .set_index("scc_id")
    assert got.loc["a", "layer"] == 0 and got.loc["a", "n_members"] == 2
    assert got.loc["c", "layer"] == 1
    assert got.loc["d", "layer"] == 2


def test_group_moments_and_hill(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import group_moments
    from rse_ray.pipelines.text import hill_tail_index

    # symmetric values -> skew 0; uniform two-point -> kurtosis -2
    t = pa.table({"event_type": pa.array(["a"] * 4),
                  "value": pa.array([1.0, 1.0, 3.0, 3.0])})
    got = group_moments(ray.data.from_arrow(t)).to_pandas().iloc[0]
    assert got["mean"] == 2.0
    assert got["skewness"] == 0.0
    assert got["kurtosis"] == -2.0

    docs = pa.table({
        "doc_id": pa.array(list(range(30)), type=pa.int64()),
        # rank-r term appears 60 // r times (Zipf alpha ~ 1)
        "text": pa.array([" ".join(f"w{r}" for r in range(1, 31)
                                   if 60 // r > i) for i in range(30)]),
    })
    h = hill_tail_index(ray.data.from_arrow(docs), k=5).to_pandas()
    assert h["k"].iloc[0] == 5
    assert 0.5 < h["alpha"].iloc[0] < 3.0  # sane power-law range


def test_arrow_ipc_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.sources.formats import documents_arrow_ipc

    src = pa.table({
        "doc_id": pa.array(list(range(10)), type=pa.int64()),
        "text": pa.array([f"t{i}" for i in range(10)]),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(["s"] * 10),
        "n_chars": pa.array([2] * 10, type=pa.int64()),
    })
    pq.write_table(src, str(tmp_path / "documents.parquet"))
    ds = documents_arrow_ipc(str(tmp_path))
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(10))
    assert got["text"].tolist() == [f"t{i}" for i in range(10)]


def test_audio_spectrogram_golden(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.pipelines.multimodal import (audio_spectrogram,
                                              write_spectrogram_fixture)

    d = str(tmp_path / "spec")
    write_spectrogram_fixture(d, n=6, seed=3)
    ds = ray.data.read_parquet(d + "/media.parquet")
    got = audio_spectrogram(ds).to_pandas() \
        .sort_values(["media_id", "frame_idx", "band"]) \
        .reset_index(drop=True)
    want = pq.read_table(d + "/golden_spec.parquet").to_pandas() \
        .sort_values(["media_id", "frame_idx", "band"]) \
        .reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert np.array_equal(got["mag"].to_numpy(),
                          want["mag"].to_numpy())
    # planted tone: the dominant band varies with the clip's frequency
    dom = got.groupby("media_id").apply(
        lambda g: g.loc[g["mag"].idxmax(), "band"])
    assert dom.nunique() > 1


def test_textrank_and_burstiness(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import user_burstiness
    from rse_ray.pipelines.text import textrank_keywords

    # 'hub' is adjacent to every other word -> highest TextRank
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["hub aa hub bb", "hub cc hub dd",
                          "aa hub ee"]),
    })
    got = textrank_keywords(ray.data.from_arrow(t), top_n=3)
    assert got["term"].iloc[0] == "hub"
    assert got["score"].iloc[0] > got["score"].iloc[1]

    base = np.datetime64("2024-01-01T00:00:00", "us")
    sec = np.timedelta64(1, "s")
    # user 1: perfectly regular gaps (cv 0); user 2: bursty 1s,1s,58s
    ts = [base, base + 10 * sec, base + 20 * sec,
          base, base + sec, base + 2 * sec, base + 60 * sec]
    e = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 2], type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_id": pa.array(list(range(7)), type=pa.int64()),
    })
    got = user_burstiness(ray.data.from_arrow(e)).to_pandas() \
        .set_index("user_id")
    assert got.loc[1, "cv"] == 0.0 and got.loc[1, "mean_gap_s"] == 10.0
    assert got.loc[2, "cv"] > 1.0 and got.loc[2, "n_gaps"] == 3


def test_fk_conversion_growth(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (conversion_latency,
                                              fk_violations,
                                              user_growth_curve)

    cust = pa.table({"c_custkey": pa.array([1], type=pa.int64())})
    orders = pa.table({
        "o_orderkey": pa.array([10, 11], type=pa.int64()),
        "o_custkey": pa.array([1, 99], type=pa.int64()),  # 99 orphan
    })
    li = pa.table({"l_orderkey": pa.array([10, 10, 77],
                                          type=pa.int64())})
    got = fk_violations(ray.data.from_arrow(cust),
                        ray.data.from_arrow(orders),
                        ray.data.from_arrow(li)) \
        .set_index("relationship")
    assert got.loc["lineitem.l_orderkey -> orders",
                   "n_orphans"] == 1
    assert got.loc["orders.o_custkey -> customer", "n_orphans"] == 1

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mn = np.timedelta64(1, "m")
    e = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
        "ts": pa.array([base, base + 5 * mn,          # converts in 5m
                        base, base + 10 * mn,         # converts in 10m
                        base], type=pa.timestamp("us")),
        "event_id": pa.array(list(range(5)), type=pa.int64()),
        "event_type": pa.array(["signup", "purchase",
                                "signup", "purchase", "signup"]),
    })
    lat = conversion_latency(ray.data.from_arrow(e))
    assert lat["n_converted"].iloc[0] == 2
    assert lat["q50_s"].iloc[0] == 450.0  # median of 300, 600

    day = np.timedelta64(1, "D")
    g = pa.table({
        "user_id": pa.array([1, 1, 2, 3], type=pa.int64()),
        "ts": pa.array([base, base + day, base + day, base + 2 * day],
                       type=pa.timestamp("us")),
    })
    curve = user_growth_curve(ray.data.from_arrow(g))
    assert curve["day"].tolist() == ["2024-01-01", "2024-01-02",
                                     "2024-01-03"]
    assert curve["new_users"].tolist() == [1, 1, 1]
    assert curve["cum_users"].tolist() == [1, 2, 3]


def test_rake_phrases_scoring(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import rake_phrases

    # phrases: [deep learning], [deep learning systems], [fun]
    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["deep learning the deep learning systems",
                          "a fun the deep learning"]),
    })
    got = rake_phrases(ray.data.from_arrow(t), top_n=10)
    # word stats: deep f=3 d=3+2+2? phrases: [deep learning] x2 (len 2),
    # [deep learning systems] (len 3), [fun] (len 1)
    # deep: f=3, d=2+3+2=7 -> 7/3; learning same; systems f=1 d=3
    # [deep learning systems] = 7/3+7/3+3 = 23/3 -> top phrase
    assert got["phrase"].iloc[0] == "deep learning systems"
    assert abs(got["score"].iloc[0] - round(23 / 3, 6)) < 1e-9
    assert "fun" in got["phrase"].tolist()


def test_q5_and_threshold_sweep(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (local_supplier_volume,
                                              quality_threshold_sweep)

    d = np.datetime64("1995-06-01", "us")
    cust = pa.table({"c_custkey": pa.array([1, 2], type=pa.int64()),
                     "c_nationkey": pa.array([0, 1], type=pa.int32())})
    orders = pa.table({
        "o_orderkey": pa.array([10, 11], type=pa.int64()),
        "o_custkey": pa.array([1, 2], type=pa.int64()),
        "o_orderdate": pa.array([d, d], type=pa.timestamp("us")),
    })
    li = pa.table({
        "l_orderkey": pa.array([10, 10, 11], type=pa.int64()),
        "l_suppkey": pa.array([100, 101, 100], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0]),
    })
    sup = pa.table({"s_suppkey": pa.array([100, 101],
                                          type=pa.int64()),
                    "s_nationkey": pa.array([0, 1], type=pa.int32())})
    nat = pa.table({"n_nationkey": pa.array([0, 1], type=pa.int32()),
                    "n_name": pa.array(["N0", "N1"]),
                    "n_regionkey": pa.array([0, 1], type=pa.int32())})
    reg = pa.table({"r_regionkey": pa.array([0, 1], type=pa.int32()),
                    "r_name": pa.array(["ASIA", "EUROPE"])})
    got = local_supplier_volume(
        ray.data.from_arrow(cust), ray.data.from_arrow(orders),
        ray.data.from_arrow(li), ray.data.from_arrow(sup),
        ray.data.from_arrow(nat), ray.data.from_arrow(reg),
        region="ASIA").to_pandas()
    # only order 10 x supplier 100 matches (same nation 0, ASIA):
    # revenue = 100; the 200*0.5 line has supplier nation 1
    assert got["n_name"].tolist() == ["N0"]
    assert got["revenue"].tolist() == [100.0]

    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        # ur = 1.0 and 0.5
        "text": pa.array(["a b c d", "x x y y"]),
    })
    sw = quality_threshold_sweep(ray.data.from_arrow(docs)) \
        .to_pandas().sort_values("cutoff").reset_index(drop=True)
    assert sw["n_docs"].tolist() == [2, 2, 2, 2, 2, 1, 1, 1, 1]
    assert sw["n_tokens"].tolist() == [8, 8, 8, 8, 8, 4, 4, 4, 4]


def test_video_scene_cuts(ray_session, tmp_path):
    import json

    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.pipelines.multimodal import (video_scene_cuts,
                                              write_scene_video_fixture)

    d = str(tmp_path / "vid")
    write_scene_video_fixture(d, n=4, seed=7)
    ds = ray.data.read_parquet(d + "/media.parquet")
    got = video_scene_cuts(ds).to_pandas() \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    want = pq.read_table(d + "/golden_cuts.parquet").to_pandas() \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert got["diff"].tolist() == want["diff"].tolist()
    assert got["is_cut"].tolist() == want["is_cut"].tolist()
    # detected cuts land exactly on the PLANTED scene boundaries
    meta = pq.read_table(d + "/media.parquet").to_pandas()
    for _, row in meta.iterrows():
        cuts = json.loads(row["meta"])["cuts"]
        det = got.loc[(got["media_id"] == row["media_id"])
                      & got["is_cut"], "frame_idx"].tolist()
        assert det == cuts


def test_q17_anomalies_hard_negatives(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import hard_negative_mining
    from rse_ray.pipelines.relational import (daily_anomalies,
                                              small_quantity_revenue)

    li = pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 1], type=pa.int64()),
        "l_quantity": pa.array([10.0, 10.0, 10.0, 10.0, 1.0]),
        "l_extendedprice": pa.array([0.0, 0.0, 0.0, 0.0, 70.0]),
    })
    # mean qty 8.2, lim 1.64 -> only the qty-1 row qualifies: 70/7=10
    got = small_quantity_revenue(ray.data.from_arrow(li)).to_pandas()
    assert got["avg_yearly"].tolist() == [10.0]

    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    # 9 quiet days of 1 event, one day with 20 -> flagged
    ts, et = [], []
    for d in range(9):
        ts.append(base + d * day)
        et.append("a")
    ts.extend([base + 9 * day] * 20)
    et.extend(["a"] * 20)
    e = pa.table({"event_type": pa.array(et),
                  "ts": pa.array(ts, type=pa.timestamp("us"))})
    an = daily_anomalies(ray.data.from_arrow(e))
    assert an["day"].tolist() == ["2024-01-10"]
    assert an["n"].tolist() == [20]

    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.99, 0.1],
                               [0.98, 0.2], [0.0, 1.0]],
                              type=pa.list_(pa.float32())),
        "label": pa.array([7, 7, 8, 8], type=pa.int32()),
    })
    hn = hard_negative_mining(ray.data.from_arrow(emb), [0], k=2)
    # nearest different-label vec to anchor 0 (label 7) is 2, then 3
    assert hn["neighbor_id"].tolist() == [2, 3]
    assert (hn["label"] == 8).all()


def test_deterministic_walks(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import deterministic_walks
    from rse_ray.pipelines.sketch import _md5_u64

    # a has two out-neighbors; the hash argmin decides which; b is a
    # sink (walk pads nulls); the whole walk is replayable
    edges = [("a", "b"), ("a", "c"), ("c", "a")]
    t = pa.table({
        "src_url": pa.array([x for x, _ in edges]),
        "dst_url": pa.array([y for _, y in edges]),
    })
    got = deterministic_walks(ray.data.from_arrow(t), steps=2) \
        .to_pandas().set_index("start_url").sort_index()
    ha = {d: _md5_u64([f"walk:1:a>{d}"])[0] for d in ("b", "c")}
    first = min(("b", "c"), key=lambda d: (ha[d], d))
    assert got.loc["a", "hop_1"] == first
    assert got.loc["b", "hop_1"] is None \
        or pd.isna(got.loc["b", "hop_1"])
    assert got.loc["c", "hop_1"] == "a"
    # replay: same input -> identical walks
    again = deterministic_walks(ray.data.from_arrow(t), steps=2) \
        .to_pandas().set_index("start_url").sort_index()
    assert got.equals(again)


def test_bm25_explain_sums_to_score(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import bm25_explain

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["cat dog cat", "dog mouse", "bird"]),
    })
    ds = ray.data.from_arrow(t)
    exp = bm25_explain(ds, "cat dog", [0, 1, 2]).to_pandas()
    # doc 2 has no query terms -> no rows
    assert 2 not in set(exp["doc_id"])
    r = exp.set_index(["doc_id", "term"])
    assert r.loc[(0, "cat"), "tf"] == 2
    assert r.loc[(0, "cat"), "df"] == 1
    # hand-check: N=3, avgdl=2, idf(cat)=ln(1+2.5/1.5), tf=2, dl=3
    idf = math.log(1 + 2.5 / 1.5)
    want = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2))
    assert abs(r.loc[(0, "cat"), "term_score"] - round(want, 6)) < 1e-9
    assert r.loc[(0, "cat"), "idf"] == round(idf, 6)
    # dog appears in docs 0 and 1 -> df 2 everywhere
    assert set(r.xs("dog", level="term")["df"]) == {2}


def test_nearest_centroid_eval(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import nearest_centroid_eval

    # two tight clusters + one vector planted INSIDE the other cluster
    vecs = [[1.0, 0.0], [0.98, 0.02], [0.0, 1.0], [0.02, 0.98],
            [0.01, 0.99]]
    labels = [1, 1, 2, 2, 1]   # last one mislabeled -> confusion cell
    t = pa.table({
        "vec_id": pa.array(list(range(5)), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    got = nearest_centroid_eval(ray.data.from_arrow(t)).to_pandas()
    m = {(r["label"], r["pred_label"]): r["n"]
         for _, r in got.iterrows()}
    assert m[(1, 1)] == 2 and m[(2, 2)] == 2
    assert m[(1, 2)] == 1  # the planted stray lands in cluster 2


def test_time_rollup_and_benford(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (benford_prices,
                                              time_rollup_counts)

    base = np.datetime64("2024-01-31T12:00:00", "us")
    day = np.timedelta64(1, "D")
    e = pa.table({
        "ts": pa.array([base, base, base + day],
                       type=pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0]),
    })
    got = time_rollup_counts(ray.data.from_arrow(e))
    r = {(x["month"], x["day"]): (x["n_events"], x["sum_value"])
         for _, x in got.iterrows()}
    assert r[("2024-01", "2024-01-31")] == (2, 3.0)
    assert r[("2024-02", "2024-02-01")] == (1, 4.0)
    assert r[("2024-01", "ALL")] == (2, 3.0)
    assert r[("ALL", "ALL")] == (3, 7.0)

    o = pa.table({"o_totalprice": pa.array(
        [1.5, 19.0, 150.0, 0.5, 92.0, 110.0])})
    b = benford_prices(ray.data.from_arrow(o)).set_index("digit")
    # digits: 1 (x4: 1.5, 19, 150, 110), 9 (92); 0.5 drops
    assert b.loc[1, "n"] == 4 and b.loc[9, "n"] == 1
    assert b.loc[1, "frac"] == 0.8
    assert b.loc[1, "benford"] == round(np.log10(2.0), 6)


def test_tpch_q10_q14_q19_q15_shapes(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (discounted_revenue,
                                              promo_revenue,
                                              returned_item_revenue,
                                              top_supplier_revenue)

    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),
        "l_partkey": pa.array([10, 11, 10, 12], type=pa.int64()),
        "l_suppkey": pa.array([5, 6, 5, 6], type=pa.int64()),
        "l_quantity": pa.array([3.0, 15.0, 25.0, 40.0]),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0, 50.0]),
        "l_discount": pa.array([0.0, 0.1, 0.0, 0.5]),
        "l_returnflag": pa.array(["R", "N", "R", "R"]),
        "l_shipdate": pa.array([ts("1996-09-10"), ts("1996-09-20"),
                                ts("1997-02-01"), ts("1997-03-01")],
                               type=pa.timestamp("us")),
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_custkey": pa.array([7, 8, 7], type=pa.int64()),
        "o_orderdate": pa.array(
            [ts("1996-02-01"), ts("1996-03-01"), ts("1995-01-01")],
            type=pa.timestamp("us")),
    })
    cust = pa.table({
        "c_custkey": pa.array([7, 8], type=pa.int64()),
        "c_name": pa.array(["Customer#7", "Customer#8"]),
        "c_acctbal": pa.array([12.5, -3.0]),
        "c_nationkey": pa.array([0, 1], type=pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["ALGERIA", "BRAZIL"]),
    })
    part = pa.table({
        "p_partkey": pa.array([10, 11, 12], type=pa.int64()),
        "p_type": pa.array(["PROMO", "LARGE", "PROMO"]),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#24"]),
        "p_size": pa.array([3, 8, 12], type=pa.int32()),
    })
    sup = pa.table({
        "s_suppkey": pa.array([5, 6], type=pa.int64()),
        "s_name": pa.array(["Supplier#5", "Supplier#6"]),
    })
    D = ray.data.from_arrow

    # Q10: orders 1 and 2 are in-window; returned items are rows
    # 0 (order 1, cust 7, rev 100) and 2 (order 2, cust 8, rev 300);
    # order 3's 'R' row is out-of-window.
    q10 = returned_item_revenue(D(cust), D(orders), D(li), D(nation))
    got = {r["c_custkey"]: (r["revenue"], r["n_name"])
           for _, r in q10.iterrows()}
    assert got == {7: (100.0, "ALGERIA"), 8: (300.0, "BRAZIL")}

    # Q14: Sep-1996 rows are 0 (part 10, PROMO, 100) and 1 (part 11,
    # not promo, 180) -> pct = 100*100/280.
    q14 = promo_revenue(D(li), D(part))
    assert q14["promo_revenue"].iloc[0] == 100.0
    assert q14["total_revenue"].iloc[0] == 280.0
    assert q14["promo_pct"].iloc[0] == round(100.0 * 100 / 280, 6)

    # Q19: arm 0 = Brand#12/size<=5/qty 1-11 -> row 0 (rev 100);
    # arm 1 = Brand#23/size<=10/qty 10-20 -> row 1 (rev 180);
    # arm 2 = Brand#24/size<=15/qty 20-30 -> row 3 fails (qty 40),
    # row 2 is Brand#12 (qty 25 out of arm 0's range) -> empty.
    q19 = discounted_revenue(D(li), D(part)).set_index("arm")
    assert (q19.loc[0, "n_items"], q19.loc[0, "revenue"]) == (1,
                                                              100.0)
    assert (q19.loc[1, "n_items"], q19.loc[1, "revenue"]) == (1,
                                                              180.0)
    assert (q19.loc[2, "n_items"], q19.loc[2, "revenue"]) == (0, 0.0)
    assert (q19.loc[-1, "n_items"],
            q19.loc[-1, "revenue"]) == (2, 280.0)

    # Q15: Q1-1997 revenue — supplier 5 ships 300 (row 2), supplier 6
    # ships 25 (row 3, 50% discount) -> supplier 5 wins alone.
    q15 = top_supplier_revenue(D(li), D(sup))
    assert len(q15) == 1
    assert q15["s_suppkey"].iloc[0] == 5
    assert q15["s_name"].iloc[0] == "Supplier#5"
    assert q15["total_revenue"].iloc[0] == 300.0


def test_host_edges_and_readability_entropy_cusum(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import host_edges
    from rse_ray.pipelines.relational import (cusum_drift,
                                              source_lang_entropy)
    from rse_ray.pipelines.text import readability_scores

    links = pa.table({
        "src_url": pa.array([
            "https://A.example/p/1",          # case-folds to a.example
            "https://a.example:8080/p/2",     # port strips
            "https://u:pw@b.example/p/3",     # userinfo strips
            "https://c.example/x",            # self-loop after collapse
            "not-a-url",                      # no authority -> drops
        ]),
        "dst_url": pa.array([
            "https://b.example/p/9",
            "https://b.example/p/8",          # dup edge after collapse
            "https://c.example/",
            "https://c.example/y",
            "https://d.example/",
        ]),
    })
    he = host_edges(ray.data.from_arrow(links)).to_pandas()
    got = set(map(tuple, he[["src_host", "dst_host"]].to_numpy()))
    assert got == {("a.example", "b.example"),
                   ("b.example", "c.example")}

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["Hello world. Bye!", "", "xyz qqq"]),
    })
    r = readability_scores(ray.data.from_arrow(docs)).to_pandas() \
        .set_index("doc_id")
    # doc 0: words 4 (Hello world Bye -> 3? 'Hello','world','Bye' = 3)
    assert r.loc[0, "n_words"] == 3
    assert r.loc[0, "n_sentences"] == 2
    assert r.loc[0, "n_syllables"] == 4  # He-llo:2, world:1, Bye:1
    assert r.loc[1, "flesch"] == 0.0     # wordless floor
    assert r.loc[2, "n_syllables"] == 1  # xyz: 'y'; qqq: none

    d = pa.table({
        "source": pa.array(["s0", "s0", "s0", "s1"]),
        "lang": pa.array(["en", "en", "de", "fr"]),
    })
    ent = source_lang_entropy(ray.data.from_arrow(d)) \
        .set_index("source")
    h = -(2 / 3) * np.log2(2 / 3) - (1 / 3) * np.log2(1 / 3)
    assert ent.loc["s0", "entropy"] == round(h, 6)
    assert ent.loc["s0", "top_lang"] == "en"
    assert ent.loc["s1", "n_langs"] == 1
    assert ent.loc["s1", "entropy"] == 0.0

    base = np.datetime64("2024-03-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    # counts per day: 1, 3, 1 -> mu = 5/3; cusum = -2/3, 2/3, 0
    ts = [base, base + day, base + day, base + day, base + 2 * day]
    ev = pa.table({
        "event_type": pa.array(["a"] * 5),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })
    cd = cusum_drift(ray.data.from_arrow(ev))
    assert cd["n_days"].iloc[0] == 3
    assert cd["max_abs_cusum"].iloc[0] == round(2 / 3, 6)
    # |−2/3| on 03-01 ties |2/3| on 03-02 after rounding -> day asc
    assert cd["peak_day"].iloc[0] == "2024-03-01"


def test_rfm_segments_and_boilerplate(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import rfm_segments
    from rse_ray.pipelines.text import boilerplate_ngrams

    base = np.datetime64("2024-06-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    # 4 users: u1 recent+frequent+rich, u4 stale+rare+poor
    rows = [
        ("u1", base + 9 * day, 10.0), ("u1", base + 8 * day, 10.0),
        ("u1", base + 7 * day, 10.0), ("u1", base + 6 * day, 10.0),
        ("u2", base + 5 * day, 5.0), ("u2", base + 4 * day, 5.0),
        ("u2", base + 3 * day, 5.0),
        ("u3", base + 2 * day, 2.0), ("u3", base + 1 * day, 2.0),
        ("u4", base, 1.0),
    ]
    ev = pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows],
                       type=pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows]),
    })
    got = rfm_segments(ray.data.from_arrow(ev)).to_pandas()
    cells = {(r.r_tile, r.f_tile, r.m_tile):
             (r.n_users, r.sum_monetary) for r in got.itertuples()}
    # u1: most recent (r=1), most frequent (f=1), monetary 40 (m=1)
    # u2: r=2, f=2, m=15 (m=2); u3: r=3, f=3, m=4 (m=3); u4: 4,4,4
    assert cells == {(1, 1, 1): (1, 40.0), (2, 2, 2): (1, 15.0),
                     (3, 3, 3): (1, 4.0), (4, 4, 4): (1, 1.0)}

    docs = pa.table({
        "source": pa.array(["s", "s", "s", "t"]),
        "text": pa.array([
            "click here now",        # 'click here' in 3 s-docs
            "please Click Here today please",
            "click here click here",  # in-doc dup ships once
            "click here",             # other source: own count
        ]),
    })
    bp = boilerplate_ngrams(ray.data.from_arrow(docs),
                            min_docs=3).to_pandas()
    assert set(map(tuple, bp.to_numpy())) == {("s", "click here", 3)}


def test_fertility_and_overlap_matrix(ray_session):
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import (source_overlap_matrix,
                                        tokenizer_fertility)

    docs = pa.table({
        "lang": pa.array(["en", "en", "de"]),
        "text": pa.array(["hello world", "it's fine", ""]),
    })
    f = tokenizer_fertility(ray.data.from_arrow(docs)).to_pandas() \
        .set_index("lang")
    # en: ws = 2 + 2 = 4; bpe: 'hello','world' -> 2;
    # "it's fine" -> 'it', ''s', ' fine' -> 3; total 5
    assert f.loc["en", "n_ws_tokens"] == 4
    assert f.loc["en", "n_bpe_tokens"] == 5
    assert f.loc["en", "fertility"] == round(5 / 4, 6)
    assert f.loc["de", "n_ws_tokens"] == 0
    assert f.loc["de", "fertility"] == 0.0

    d2 = pa.table({
        "source": pa.array(["a", "a", "b", "c"]),
        "text": pa.array([
            "x y z w",        # a: {x y z, y z w}
            "x y z",          # a: {x y z} (dedup)
            "x y z q",        # b: {x y z, y z q}
            "n o p",          # c: {n o p}
        ]),
    })
    m = source_overlap_matrix(ray.data.from_arrow(d2)).to_pandas()
    got = {(r.source_a, r.source_b): r.n_shared
           for r in m.itertuples()}
    assert got[("a", "a")] == 2 and got[("b", "b")] == 2
    assert got[("a", "b")] == 1 and got[("b", "a")] == 1
    assert got[("c", "c")] == 1
    assert ("a", "c") not in got  # no shared trigram -> no row


def test_tpch_q4_q12_q13_q18_q22_q7_shapes(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (
        customer_order_distribution, idle_rich_customers,
        large_volume_customers, late_shipment_priority,
        nation_trade_volume, priority_line_counts)

    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_custkey": pa.array([7, 8, 7, 9], type=pa.int64()),
        "o_orderdate": pa.array(
            [ts("1995-05-01"), ts("1995-06-15"), ts("1996-06-01"),
             ts("2001-05-01")], type=pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "5-LOW", "2-HIGH", "3-MEDIUM"]),
        "o_totalprice": pa.array([500.0, 800.0, 300.0, 900.0]),
    })
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
        "l_suppkey": pa.array([5, 6, 6, 6, 5], type=pa.int64()),
        "l_quantity": pa.array([200.0, 150.0, 100.0, 500.0, 10.0]),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0, 50.0,
                                     70.0]),
        "l_discount": pa.array([0.0, 0.1, 0.0, 0.0, 0.0]),
        "l_returnflag": pa.array(["A", "N", "A", "R", "R"]),
        "l_shipdate": pa.array(
            [ts("1995-09-01"), ts("1995-06-01"), ts("1995-07-01"),
             ts("1996-06-20"), ts("1996-03-01")],
            type=pa.timestamp("us")),
    })
    cust = pa.table({
        "c_custkey": pa.array([7, 8, 9, 10], type=pa.int64()),
        "c_name": pa.array(["Customer#7", "Customer#8", "Customer#9",
                            "Customer#10"]),
        "c_nationkey": pa.array([1, 0, 0, 1], type=pa.int64()),
        "c_acctbal": pa.array([100.0, 50.0, 200.0, 300.0]),
    })
    sup = pa.table({
        "s_suppkey": pa.array([5, 6], type=pa.int64()),
        "s_nationkey": pa.array([0, 1], type=pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2"]),
    })
    D = ray.data.from_arrow

    # Q4: window holds orders 1, 2; order 1 is late via its first
    # line (1995-05-01 + 90d = 1995-07-30 < 1995-09-01), order 2's
    # only line ships inside its grace.
    q4 = late_shipment_priority(D(orders), D(li)).to_pandas()
    assert dict(zip(q4["o_orderpriority"],
                    q4["order_count"])) == {"1-URGENT": 1}

    # Q12: 1996 shipments are rows 3 (order 3, 2-HIGH -> high) and
    # 4 (order 4, 3-MEDIUM -> low), both flagged 'R'.
    q12 = priority_line_counts(D(li), D(orders)).to_pandas()
    assert len(q12) == 1
    assert q12["l_returnflag"].iloc[0] == "R"
    assert q12["high_line_count"].iloc[0] == 1
    assert q12["low_line_count"].iloc[0] == 1

    # Q13: order counts 7->2, 8->1, 9->1, 10->0.
    q13 = customer_order_distribution(D(cust), D(orders)) \
        .to_pandas()
    assert dict(zip(q13["c_count"], q13["custdist"])) == \
        {2: 1, 1: 2, 0: 1}

    # Q18: per-order quantity sums 1->350, 2->100, 3->500, 4->10;
    # qualifying (>300) are orders 1 and 3, both customer 7, ordered
    # by o_totalprice desc (500 before 300).
    q18 = large_volume_customers(D(cust), D(orders), D(li),
                                 min_qty=300.0, k=10)
    assert list(q18["o_orderkey"]) == [1, 3]
    assert list(q18["sum_qty"]) == [350.0, 500.0]
    assert set(q18["c_name"]) == {"Customer#7"}

    # Q22: mean positive balance = 162.5; rich = customers 9 (200)
    # and 10 (300); 9 ordered in 2001 (recent), 10 never ordered.
    q22 = idle_rich_customers(D(cust), D(orders)).to_pandas()
    assert len(q22) == 1
    assert q22["c_nationkey"].iloc[0] == 1
    assert q22["numcust"].iloc[0] == 1
    assert q22["totacctbal"].iloc[0] == 300.0

    # Q7: in-window cross-nation lines are row 0 (supp 5=NATION_1 ->
    # cust 7=NATION_2, rev 100) and row 2 (supp 6=NATION_2 ->
    # cust 8=NATION_1, rev 300), both shipped 1995.
    q7 = nation_trade_volume(D(cust), D(orders), D(li), D(sup),
                             D(nation))
    rows = {(r["supp_nation"], r["cust_nation"], r["l_year"]):
            r["revenue"] for _, r in q7.iterrows()}
    assert rows == {("NATION_1", "NATION_2", 1995): 100.0,
                    ("NATION_2", "NATION_1", 1995): 300.0}


def test_chi_square_and_mann_whitney(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (chi_square_independence,
                                              mann_whitney_u)

    # 2x2 contingency: rows en/fr x cols web/books, counts
    # [[10, 20], [20, 10]] -> chi2 = 60*(10*10-20*20)^2/(30*30*30*30)
    docs = pa.table({
        "lang": pa.array(["en"] * 30 + ["fr"] * 30),
        "source": pa.array(["web"] * 10 + ["books"] * 20
                           + ["web"] * 20 + ["books"] * 10),
    })
    got = chi_square_independence(ray.data.from_arrow(docs))
    exp_chi2 = 60 * (10 * 10 - 20 * 20) ** 2 / (30 * 30 * 30 * 30)
    assert got["n"].iloc[0] == 60
    assert got["dof"].iloc[0] == 1
    assert got["chi2"].iloc[0] == round(float(exp_chi2), 6)
    assert got["cramers_v"].iloc[0] == round(
        float(np.sqrt(exp_chi2 / 60)), 6)

    # pooled sample a={1,2,2}, b={2,3}: ranks 1, 3, 3, 3, 5 (average
    # ranks over the tie block) -> R_a = 7, U_a = 7 - 6 = 1
    ev = pa.table({
        "event_type": pa.array(["click", "click", "click", "view",
                                "view"]),
        "value": pa.array([1.0, 2.0, 2.0, 2.0, 3.0]),
    })
    mw = mann_whitney_u(ray.data.from_arrow(ev))
    assert mw["n_a"].iloc[0] == 3 and mw["n_b"].iloc[0] == 2
    assert mw["u_a"].iloc[0] == 1.0
    # z = (1 - 3) / sqrt(3*2/12 * (6 - 24/20))
    assert mw["z"].iloc[0] == round(
        (1.0 - 3.0) / np.sqrt(0.5 * (6.0 - 24.0 / 20.0)), 6)


def test_adamic_adar(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import adamic_adar

    # s1 -> {a, b, c}; s2 -> {a, b}; s3 -> {b} (degree-1, excluded);
    # edge a -> b exists, so the (a, b) prediction is suppressed.
    links = pa.table({
        "src_url": pa.array(["s1", "s1", "s1", "s2", "s2", "s3",
                             "a"]),
        "dst_url": pa.array(["a", "b", "c", "a", "b", "b", "b"]),
    })
    got = adamic_adar(ray.data.from_arrow(links)).to_pandas()
    rows = {(r["url_a"], r["url_b"]): (r["common"], r["aa"])
            for _, r in got.iterrows()}
    w3 = 1.0 / math.log(3)
    # (a, c) and (b, c) each co-cited only by s1 (deg 3); (a, b) is
    # an existing edge -> excluded despite weight w3 + 1/ln(2)
    assert rows == {("a", "c"): (1, round(w3, 6)),
                    ("b", "c"): (1, round(w3, 6))}


def test_market_share_product_profit_dsir(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (market_share,
                                              product_profit)
    from rse_ray.pipelines.text import dsir_weights

    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["NATION_5", "NATION_6"]),
        "n_regionkey": pa.array([0, 0], type=pa.int64()),
    })
    region = pa.table({
        "r_regionkey": pa.array([0], type=pa.int64()),
        "r_name": pa.array(["ASIA"]),
    })
    cust = pa.table({
        "c_custkey": pa.array([7], type=pa.int64()),
        "c_nationkey": pa.array([0], type=pa.int64()),
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_custkey": pa.array([7, 7], type=pa.int64()),
        "o_orderdate": pa.array([ts("1995-03-01"), ts("1996-03-01")],
                                type=pa.timestamp("us")),
    })
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
        "l_partkey": pa.array([10, 10, 10], type=pa.int64()),
        "l_suppkey": pa.array([5, 6, 5], type=pa.int64()),
        "l_quantity": pa.array([1.0, 2.0, 3.0]),
        "l_extendedprice": pa.array([100.0, 300.0, 50.0]),
        "l_discount": pa.array([0.0, 0.0, 0.5]),
    })
    sup = pa.table({
        "s_suppkey": pa.array([5, 6], type=pa.int64()),
        "s_nationkey": pa.array([0, 1], type=pa.int64()),
    })
    part = pa.table({
        "p_partkey": pa.array([10], type=pa.int64()),
        "p_type": pa.array(["PROMO"]),
        "p_name": pa.array(["red widget"]),
        "p_retailprice": pa.array([10.0]),
    })
    D = ray.data.from_arrow

    # 1995: NATION_5 supplies 100 of 400; 1996: 25 of 25.
    q8 = market_share(D(cust), D(orders), D(li), D(sup), D(nation),
                      D(region), D(part))
    rows = {int(r["o_year"]): (r["nation_revenue"],
                               r["total_revenue"], r["mkt_share"])
            for _, r in q8.iterrows()}
    assert rows == {1995: (100.0, 400.0, 0.25),
                    1996: (25.0, 25.0, 1.0)}

    # Q9: profit rows — (100 - 6) NATION_5/1995, (300 - 12)
    # NATION_6/1995, (25 - 18) NATION_5/1996 (cost = 0.6*10*qty).
    q9 = product_profit(D(orders), D(li), D(sup), D(nation), D(part))
    prows = {(r["n_name"], int(r["o_year"])): r["profit"]
             for _, r in q9.iterrows()}
    assert prows == {("NATION_5", 1995): 94.0,
                     ("NATION_6", 1995): 288.0,
                     ("NATION_5", 1996): 7.0}

    # DSIR: a doc made of target-exclusive terms must outscore a doc
    # made of source-exclusive terms.
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["alpha alpha beta", "alpha beta",
                          "gamma delta", "gamma gamma delta"]),
        "source": pa.array(["tgt", "tgt", "other", "other"]),
    })
    w = dsir_weights(D(docs), target_source="tgt").to_pandas() \
        .set_index("doc_id")["log_weight"]
    assert len(w) == 4
    assert w[0] > w[2] and w[1] > w[3]
    assert w[0] > 0 and w[2] < 0


def test_semdedup_keep_representative(ray_session):
    """SemDeDup: k-means clusters the corpus, within-cluster cosine
    pairs >= threshold drop the GREATER vec_id; verify against a
    brute-force reference that reuses the engine's own deterministic
    centroid trainer but computes pairs/keeps with one dense matmul."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.ann import (_kmeans_assign, _kmeans_centroids,
                                       _normalize, semdedup)

    rng = np.random.default_rng(11)
    n, d = 400, 16
    base = rng.standard_normal((8, d))
    mat32 = (base[rng.integers(0, 8, size=n)]
             + 0.08 * rng.standard_normal((n, d))).astype(np.float32)
    tbl = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
         "embedding": pa.array(mat32.tolist(), type=pa.list_(pa.float32()))}
    )
    th = 0.95
    got = semdedup(ray.data.from_arrow(tbl), k=3, iters=2,
                   threshold=th, max_bucket=128).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    proj = ray.data.from_arrow(tbl).materialize()
    C = _kmeans_centroids(proj, k=3, iters=2, round_to=9)
    mat = mat32.astype(np.float64)
    lab = _kmeans_assign(mat, C)
    nm = _normalize(mat)
    sims = nm @ nm.T
    iu, ju = np.triu_indices(n, k=1)
    sel = (sims[iu, ju] >= th) & (lab[iu] == lab[ju])
    dropped = np.unique(ju[sel])
    assert 0 < len(dropped) < n, "fixture must drop some but not all"
    assert got["cluster"].tolist() == lab.astype(int).tolist()
    assert got["keep"].tolist() == (~np.isin(np.arange(n), dropped)).tolist()


def test_tpch_q21_q2_q11_q16_q20_shapes(ray_session):
    """Hand-computable fixtures for the five remaining TPC-H shapes:
    Q21 waiting suppliers (exactly-one-late on multi-supplier 'F'
    orders), Q2 correlated-min supplier, Q11 HAVING vs scalar
    subquery, Q16 distinct supplier counts with NOT-IN, Q20 nested
    semi-join chain."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import (
        important_parts, min_cost_supplier, promotion_suppliers,
        supplier_part_counts, waiting_suppliers)

    D = ray.data.from_arrow
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731

    # --- Q21: order 1 (F): supp 5 late, supp 6 on time -> 5 waits;
    # order 2 (F): both late -> nobody; order 3 (F): single-supplier
    # -> nobody; order 4 (O): not finished -> ignored.
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_orderdate": pa.array([ts("1995-01-01")] * 4,
                                type=pa.timestamp("us")),
        "o_orderstatus": pa.array(["F", "F", "F", "O"]),
    })
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4],
                               type=pa.int64()),
        "l_suppkey": pa.array([5, 6, 5, 6, 5, 5, 6],
                              type=pa.int64()),
        "l_shipdate": pa.array(
            [ts("1995-06-01"), ts("1995-01-15"), ts("1995-06-01"),
             ts("1995-06-01"), ts("1995-06-01"), ts("1995-06-01"),
             ts("1995-06-01")], type=pa.timestamp("us")),
    })
    sup = pa.table({
        "s_suppkey": pa.array([5, 6], type=pa.int64()),
        "s_name": pa.array(["S5", "S6"]),
        "s_acctbal": pa.array([10.0, -3.0]),
        "s_nationkey": pa.array([0, 1], type=pa.int64()),
    })
    w = waiting_suppliers(D(sup), D(orders), D(li), grace_days=60)
    assert dict(zip(w["s_name"], w["numwait"])) == {"S5": 1}

    # --- Q2: part 100 offered by supp 5 (unit 2.0) and supp 6
    # (unit 1.5) -> supp 6 wins; part 200 only supp 5. Both suppliers
    # in-region.
    part = pa.table({
        "p_partkey": pa.array([100, 200, 300], type=pa.int64()),
        "p_size": pa.array([5, 5, 99], type=pa.int64()),
        "p_type": pa.array(["STANDARD", "STANDARD", "STANDARD"]),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["N0", "N1"]),
        "n_regionkey": pa.array([0, 0], type=pa.int64()),
    })
    region = pa.table({
        "r_regionkey": pa.array([0], type=pa.int64()),
        "r_name": pa.array(["EUROPE"]),
    })
    li2 = pa.table({
        "l_partkey": pa.array([100, 100, 200, 300],
                              type=pa.int64()),
        "l_suppkey": pa.array([5, 6, 5, 5], type=pa.int64()),
        "l_extendedprice": pa.array([20.0, 15.0, 30.0, 10.0]),
        "l_quantity": pa.array([10.0, 10.0, 10.0, 10.0]),
    })
    mc = min_cost_supplier(D(part), D(sup), D(li2), D(nation),
                           D(region), region="EUROPE", max_size=10,
                           ptype="STANDARD")
    got = {(r["p_partkey"], r["s_name"]): r["cost"]
           for _, r in mc.iterrows()}
    assert got == {(100, "S6"): 1.5, (200, "S5"): 3.0}

    # --- Q11: nation 0 = supp 5 only; part 100 revenue 50,
    # part 200 revenue 1.0 -> with denom 10, only part 100 passes
    # (50*10 > 51; 1*10 <= 51).
    li3 = pa.table({
        "l_partkey": pa.array([100, 200], type=pa.int64()),
        "l_suppkey": pa.array([5, 5], type=pa.int64()),
        "l_extendedprice": pa.array([50.0, 1.0]),
        "l_discount": pa.array([0.0, 0.0]),
    })
    ip = important_parts(D(li3), D(sup), nation_key=0, denom=10)
    if not isinstance(ip, pd.DataFrame):
        ip = ip.to_pandas()
    assert dict(zip(ip["l_partkey"], ip["value"])) == {100: 50.0}

    # --- Q16: supp 6 has negative acctbal -> excluded; part 300
    # size 99 > max_size -> excluded.
    part16 = pa.table({
        "p_partkey": pa.array([100, 200, 300], type=pa.int64()),
        "p_brand": pa.array(["Brand#2", "Brand#2", "Brand#2"]),
        "p_type": pa.array(["STANDARD", "LARGE", "STANDARD"]),
        "p_size": pa.array([5, 7, 99], type=pa.int64()),
    })
    sc = supplier_part_counts(D(li2), D(part16), D(sup),
                              exclude_brand="Brand#1",
                              exclude_type="PROMO", max_size=25) \
        .to_pandas()
    got = {(r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
           for _, r in sc.iterrows()}
    assert got == {("Brand#2", "STANDARD", 5): 1,
                   ("Brand#2", "LARGE", 7): 1}

    # --- Q20: widget parts = {100}; supp 5 shipped 10 units in 1995
    # -> passes threshold 5, fails 15.
    part20 = pa.table({
        "p_partkey": pa.array([100, 200], type=pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"]),
    })
    li4 = pa.table({
        "l_partkey": pa.array([100, 100, 200], type=pa.int64()),
        "l_suppkey": pa.array([5, 6, 5], type=pa.int64()),
        "l_quantity": pa.array([10.0, 3.0, 50.0]),
        "l_shipdate": pa.array(
            [ts("1995-03-01"), ts("1996-03-01"), ts("1995-03-01")],
            type=pa.timestamp("us")),
    })
    pr = promotion_suppliers(D(part20), D(li4), D(sup),
                             token="widget", year=1995,
                             qty_threshold=5.0)
    assert pr["s_name"].tolist() == ["S5"]
    pr2 = promotion_suppliers(D(part20), D(li4), D(sup),
                              token="widget", year=1995,
                              qty_threshold=15.0)
    assert pr2.empty


def test_nb_classify_planted(ray_session):
    """Two classes with (mostly) disjoint vocabularies: every doc must
    self-classify to its own class, and a mixed doc leans toward the
    class contributing more of its tokens."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import nb_classify

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "apple banana apple cherry",
            "apple cherry banana banana",
            "stone iron copper stone",
            "iron copper copper stone",
            "apple apple apple iron",   # leans fruit
        ]),
        "source": pa.array(["fruit", "fruit", "metal", "metal",
                            "fruit"]),
    })
    out = nb_classify(ray.data.from_arrow(docs)).to_pandas() \
        .set_index("doc_id")["predicted"]
    assert out[0] == out[1] == out[4] == "fruit"
    assert out[2] == out[3] == "metal"


def test_hybrid_combsum_and_clarity(ray_session):
    """CombSUM/CombMNZ internal consistency against the two source
    lists, and clarity is positive (top-k sublanguage is more focused
    than the corpus) with the right vocabulary size."""
    from rse_ray.pipelines.ann import brute_force_knn
    from rse_ray.pipelines.docsearch import (bm25_documents,
                                             hybrid_combsum_documents,
                                             query_clarity)
    import os

    import ray.data

    q = "spark window merge window"
    out = hybrid_combsum_documents(SF, q, 0, k_each=50, k=20)
    assert len(out) == 20
    # MNZ doubles combsum exactly for docs present in both lists
    lex = set(bm25_documents(SF, q, k=50)["doc_id"].astype(int))
    emb = ray.data.read_parquet(
        os.path.join(SF, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    vec = set(brute_force_knn(emb, [0], k=50)["neighbor_id"]
              .astype(int))
    for _, r in out.iterrows():
        n_lists = (int(r["doc_id"]) in lex) + (int(r["doc_id"]) in vec)
        assert r["combmnz"] == pytest.approx(
            r["combsum"] * n_lists, abs=2e-6)
    # normalized scores bound combsum to [0, 2]
    assert out["combsum"].between(0, 2).all()

    c = query_clarity(SF, q, k=10)
    assert len(c) == 1
    assert c["clarity"].iloc[0] > 0
    assert c["n_docs"].iloc[0] == 10
    assert c["n_terms"].iloc[0] > 10


def test_ks_and_spearman_known_values(ray_session):
    """Hand-computed fixtures: KS D between {1,2,3} and {3,4,5,6} is
    3/4 (at v=3: 1 - 1/4); Spearman is exactly +1 on a monotone pair,
    -1 on an antitone pair, and matches the tie-adjusted closed form
    on a small mixed sample."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import ks_test, spearman_corr

    ev = pa.table({
        "event_type": pa.array(["click"] * 3 + ["view"] * 4),
        "value": pa.array([1.0, 2.0, 3.0, 3.0, 4.0, 5.0, 6.0]),
    })
    out = ks_test(ray.data.from_arrow(ev))
    assert out["n_a"].iloc[0] == 3 and out["n_b"].iloc[0] == 4
    assert out["d_stat"].iloc[0] == pytest.approx(0.75, abs=1e-6)
    assert out["ks_z"].iloc[0] == pytest.approx(
        0.75 * np.sqrt(12 / 7), abs=1e-6)

    def sp(x, y):
        t = pa.table({"l_quantity": pa.array(x, type=pa.float64()),
                      "l_extendedprice": pa.array(y,
                                                  type=pa.float64())})
        return spearman_corr(ray.data.from_arrow(t))["rho"].iloc[0]

    assert sp([1, 2, 3, 4], [10, 20, 30, 40]) == pytest.approx(1.0)
    assert sp([1, 2, 3, 4], [40, 30, 20, 10]) == pytest.approx(-1.0)
    # mixed with ties: x = [1,1,2,3], y = [2,1,4,3]
    # rx = [1.5,1.5,3,4], ry = [2,1,4,3]; centered (n=4, mean 2.5):
    # crx=[-1,-1,.5,1.5], cry=[-.5,-1.5,1.5,.5]
    # sxy=.5+1.5+.75+.75=3.5, sxx=1+1+.25+2.25=4.5, syy=5
    want = 3.5 / np.sqrt(4.5 * 5.0)
    assert sp([1, 1, 2, 3], [2, 1, 4, 3]) == pytest.approx(
        want, abs=1e-6)


def test_bm25_pruned_extremes(ray_session):
    """keep_pct=100 must equal the exact scorer's top-k set and
    scores; keep_pct=50 must still overlap heavily (the static-pruning
    recall trade is mild on tf-skewed corpora)."""
    import os

    import ray.data

    from rse_ray.pipelines.text import bm25_pruned

    docs = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text"])
    q = "spark window merge window"
    full = bm25_pruned(docs, q, keep_pct=100, k=20)
    from rse_ray.pipelines.docsearch import bm25_documents

    want = bm25_documents(SF, q, k=20)
    # the two scorers sum in different orders, so ulp-level ties can
    # swap adjacent ranks — compare the (rounded score, doc) sets
    got_set = sorted(zip(full["score"].round(5), full["doc_id"]))
    want_set = sorted(zip(want["score"].round(5), want["doc_id"]))
    assert got_set == want_set
    half = bm25_pruned(docs, q, keep_pct=50, k=20)
    overlap = len(set(half["doc_id"]) & set(full["doc_id"])) / 20
    assert overlap >= 0.5


def test_auto_join_broadcast_equals_hash_join(ray_session):
    """auto_join's broadcast path must produce exactly hash_join's
    result set for every how, including null keys (match nothing;
    anti/left keep them), duplicate right keys (fan out), and string
    keys; above the threshold it must fall back to hash_join."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import auto_join, hash_join

    left = pa.table({
        "k": pa.array([1, 2, 2, None, 5], type=pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"]),
    })
    right = pa.table({
        "rk": pa.array([2, 2, 5, None, 7], type=pa.int64()),
        "rv": pa.array([10, 20, 50, 99, 70], type=pa.int64()),
    })

    def norm(ds):
        df = ds.to_pandas()
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        # NaN != NaN breaks record equality — nulls become None
        return df.astype(object).where(df.notna(), None) \
            .to_dict("records")

    for how in ("inner", "left", "semi", "anti"):
        cols = [] if how in ("semi", "anti") else ["rv"]
        a = auto_join(ray.data.from_arrow(left),
                      ray.data.from_arrow(right),
                      left_on="k", right_on="rk", right_cols=cols,
                      how=how)
        h = hash_join(ray.data.from_arrow(left),
                      ray.data.from_arrow(right),
                      left_on="k", right_on="rk", right_cols=cols,
                      how=how, num_parts=4)
        assert norm(a) == norm(h), how
        # forced fallback: threshold 0 -> both are hash joins
        f = auto_join(ray.data.from_arrow(left),
                      ray.data.from_arrow(right),
                      left_on="k", right_on="rk", right_cols=cols,
                      how=how, broadcast_threshold_rows=0)
        assert norm(f) == norm(h), how

    # string keys through the broadcast probe
    ls = pa.table({"k": pa.array(["x", "y", None]),
                   "lv": pa.array([1, 2, 3], type=pa.int64())})
    rs = pa.table({"rk": pa.array(["y", "z"]),
                   "rv": pa.array([7, 8], type=pa.int64())})
    a = auto_join(ray.data.from_arrow(ls), ray.data.from_arrow(rs),
                  left_on="k", right_on="rk", right_cols=["rv"],
                  how="inner")
    assert norm(a) == [{"k": "y", "lv": 2, "rv": 7}]


def test_bm25_topk_diverse_quota(ray_session):
    """No source exceeds the per-source quota, results are a subset of
    the undiversified pool, and scores stay rank-sorted."""
    from rse_ray.pipelines.docsearch import (bm25_documents,
                                             bm25_topk_diverse)

    q = "spark window merge window"
    out = bm25_topk_diverse(SF, q, pool=50, per_source=2, k=10)
    assert len(out) == 10
    assert out.groupby("source").size().max() <= 2
    pool = set(bm25_documents(SF, q, k=50)["doc_id"].astype(int))
    assert set(out["doc_id"].astype(int)) <= pool
    assert (out["score"].to_numpy()[:-1]
            >= out["score"].to_numpy()[1:]).all()


def test_webdataset_sink_roundtrip(ray_session, tmp_path):
    """The tar shards are readable, deterministic, contain exactly the
    routed members in sorted order, and byte-identical on rewrite."""
    import hashlib
    import tarfile

    import pyarrow as pa
    import ray.data

    from rse_ray.sinks import write_webdataset

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 5, 8, 13], type=pa.int64()),
        "text": pa.array(["zero", "one", "two", "five", None,
                          "thirteen"]),
    })
    out = str(tmp_path / "wds")
    stats = write_webdataset(ray.data.from_arrow(docs), out,
                             num_shards=4)
    assert stats["n_docs"].sum() == 6
    # shard 1 holds doc_ids 1, 5, 13
    with tarfile.open(f"{out}/shard-000001.tar") as tf:
        names = tf.getnames()
        assert names == ["000000000001.txt", "000000000005.txt",
                         "000000000013.txt"]
        assert tf.extractfile(names[1]).read() == b"five"
    h1 = hashlib.md5(
        open(f"{out}/shard-000001.tar", "rb").read()).hexdigest()
    write_webdataset(ray.data.from_arrow(docs), out, num_shards=4)
    h2 = hashlib.md5(
        open(f"{out}/shard-000001.tar", "rb").read()).hexdigest()
    assert h1 == h2


def test_hash_join_auto_hot_keys(ray_session):
    """hot_keys='auto' detects the planted hot key via the exact
    count pre-pass and produces the identical result set to the
    unsalted join."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import detect_hot_keys, hash_join

    n = 5000
    keys = np.where(np.arange(n) % 2 == 0, 7,
                    np.arange(n) % 50 + 100).astype(np.int64)
    left = pa.table({"k": pa.array(keys),
                     "lv": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({
        "rk": pa.array([7, 100, 101], type=pa.int64()),
        "rv": pa.array([70, 1000, 1010], type=pa.int64())})

    hot = detect_hot_keys(ray.data.from_arrow(left), "k",
                          hot_threshold=1000)
    assert hot == [7]

    def norm(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)) \
            .reset_index(drop=True).to_dict("records")

    plain = hash_join(ray.data.from_arrow(left),
                      ray.data.from_arrow(right), left_on="k",
                      right_on="rk", right_cols=["rv"], how="inner",
                      num_parts=8)
    auto = hash_join(ray.data.from_arrow(left),
                     ray.data.from_arrow(right), left_on="k",
                     right_on="rk", right_cols=["rv"], how="inner",
                     num_parts=8, hot_keys="auto")
    assert norm(plain) == norm(auto)
    # and with the detected keys actually salted
    salted = hash_join(ray.data.from_arrow(left),
                       ray.data.from_arrow(right), left_on="k",
                       right_on="rk", right_cols=["rv"], how="inner",
                       num_parts=8, hot_keys=hot, salt=4)
    assert norm(plain) == norm(salted)


def test_source_gini_and_info_gain(ray_session):
    """Gini: 0 for equal counts, the exact closed form for a skewed
    split; info gain: a perfectly source-separating term maxes IG, a
    ubiquitous term scores 0."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import info_gain_terms, source_gini

    eq = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "source": pa.array(["a", "a", "b", "b"])})
    assert source_gini(ray.data.from_arrow(eq))["gini"].iloc[0] == 0.0
    sk = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "source": pa.array(["a", "b", "b", "b"])})
    # counts (1,3): G = (2*1-2-1)*1 + (2*2-2-1)*3 = -1+3 = 2; /(2*4)
    assert source_gini(ray.data.from_arrow(sk))["gini"].iloc[0] \
        == 0.25

    docs = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(["alpha common", "alpha common",
                          "beta common", "beta common"]),
        "source": pa.array(["s1", "s1", "s2", "s2"])})
    ig = info_gain_terms(ray.data.from_arrow(docs), k=3) \
        .set_index("term")["info_gain"]
    import math

    assert ig["alpha"] == pytest.approx(math.log(2), abs=1e-6)
    assert ig["beta"] == pytest.approx(math.log(2), abs=1e-6)
    assert ig["common"] == pytest.approx(0.0, abs=1e-9)


def test_jaccard_links_known_graph(ray_session):
    """Hand graph: sources s1,s2 both link {a,b}; s3 links {a,c}.
    Windowed universe: all sources (out-deg 2). common(a,b)=2,
    ind(a)=3, ind(b)=2 -> J = 2/3. common(a,c)=1, ind(c)=1 ->
    J = 1/3. common(b,c)=0 (never co-cited, absent)."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import jaccard_links

    links = pa.table({
        "src_url": pa.array(["s1", "s1", "s2", "s2", "s3", "s3"]),
        "dst_url": pa.array(["a", "b", "a", "b", "a", "c"]),
    })
    out = jaccard_links(ray.data.from_arrow(links)).to_pandas()
    got = {(r["url_a"], r["url_b"]): (r["common"], r["jaccard"])
           for _, r in out.iterrows()}
    assert got == {("a", "b"): (2, round(2 / 3, 6)),
                   ("a", "c"): (1, round(1 / 3, 6))}


def test_rbo_identical_and_disjoint(ray_session):
    """RBO = 1 for identical ranked lists, 0 for disjoint ones, and
    matches the closed geometric form on a hand pair."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import rbo_source_drift

    def mk(texts_a, texts_b):
        n = len(texts_a) + len(texts_b)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts_a + texts_b),
            "source": pa.array(["src0"] * len(texts_a)
                               + ["src1"] * len(texts_b))}))

    same = mk(["x x x y y z"], ["x x x y y z"])
    r = rbo_source_drift(same, depth=3)
    assert r["rbo"].iloc[0] == pytest.approx(1.0, abs=1e-6)
    assert r["overlap_at_depth"].iloc[0] == 3

    disj = mk(["a a b"], ["c c d"])
    r = rbo_source_drift(disj, depth=2)
    assert r["rbo"].iloc[0] == 0.0

    # A = [x, y], B = [x, z] at depth 2, p=0.9:
    # d=1: ov=1 -> 1/1; d=2: ov=1 -> 0.9 * 1/2;
    # normalized: (1 + 0.45) / (1 + 0.9)
    part = mk(["x x y"], ["x x z"])
    r = rbo_source_drift(part, depth=2)
    assert r["rbo"].iloc[0] == pytest.approx(1.45 / 1.9, abs=1e-6)


def test_langid_kappa_and_theil_sen(ray_session):
    """kappa: perfect agreement = 1 on a fixture LangId classifies
    correctly; Theil-Sen: exact slope/intercept on a linear series
    with one planted outlier that OLS would chase."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import theil_sen_trend

    # linear 10 + 2*day over 7 days, day 3 spiked by +1000 events
    rows = []
    for day in range(7):
        n = 10 + 2 * day + (1000 if day == 3 else 0)
        for i in range(n):
            rows.append(np.datetime64("2024-01-01", "us")
                        + np.timedelta64(day, "D").astype(
                            "timedelta64[us]")
                        + np.timedelta64(i, "s").astype(
                            "timedelta64[us]"))
    ev = pa.table({"ts": pa.array(rows,
                                  type=pa.timestamp("us"))})
    out = theil_sen_trend(ray.data.from_arrow(ev))
    assert out["n_days"].iloc[0] == 7
    # the outlier day corrupts 6 of 21 pair slopes; the median slope
    # stays exactly 2
    assert out["slope"].iloc[0] == pytest.approx(2.0, abs=1e-6)


def test_crawl_budget_apportionment(ray_session):
    """Largest-remainder apportionment: allocations sum exactly to the
    budget and match the hand calculation on a skewed host mix."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import crawl_budget

    urls = (["https://big.example/p/%d" % i for i in range(7)]
            + ["https://mid.example/p/%d" % i for i in range(2)]
            + ["https://tiny.example/p/0"])
    pages = pa.table({"url": pa.array(urls)})
    out = crawl_budget(ray.data.from_arrow(pages), budget=10)
    got = dict(zip(out["host"], out["alloc"]))
    # exact proportions: 7, 2, 1 — no remainders at budget 10
    assert got == {"big.example": 7, "mid.example": 2,
                   "tiny.example": 1}
    out = crawl_budget(ray.data.from_arrow(pages), budget=7)
    # base = floor(7*c/10) = 4, 1, 0 ; rems = 9, 4, 7 -> leftovers 2
    # go to big (9) then tiny (7)
    got = dict(zip(out["host"], out["alloc"]))
    assert got == {"big.example": 5, "mid.example": 1,
                   "tiny.example": 1}
    assert out["alloc"].sum() == 7


def test_rate_limit_replay_semantics(ray_session):
    """Token bucket capacity 2, refill 1/s: burst of 3 at t=0 admits
    2; an event 1s later is admitted (one token refilled); an event
    0.1s after that is dropped."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import rate_limit_replay

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [t0, t0, t0,
          t0 + np.timedelta64(1_000_000, "us"),
          t0 + np.timedelta64(1_100_000, "us")]
    ev = pa.table({
        "user_id": pa.array([1] * 5, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_id": pa.array(range(5), type=pa.int64())})
    out = rate_limit_replay(ray.data.from_arrow(ev), capacity=2.0,
                            refill_per_s=1.0).to_pandas()
    assert out["n_events"].iloc[0] == 5
    assert out["n_admitted"].iloc[0] == 3


def test_otsu_threshold_bimodal(ray_session):
    """A cleanly bimodal length mix (short ~3 tokens vs long ~40)
    must split exactly between the modes."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import otsu_threshold

    texts = (["a b c"] * 10 + ["a b c d"] * 10
             + [" ".join(["w"] * 40)] * 10
             + [" ".join(["w"] * 42)] * 10)
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)})
    out = otsu_threshold(ray.data.from_arrow(docs))
    assert out["n_short"].iloc[0] == 20
    assert out["n_long"].iloc[0] == 20
    assert out["threshold"].iloc[0] == 4


def test_fightin_words_direction(ray_session):
    """A term exclusive to source A gets positive z, one exclusive to
    B negative, and a balanced term scores nearer zero than both."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import fightin_words

    docs = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(["aonly aonly both both",
                          "aonly both filler filler",
                          "bonly bonly both both",
                          "bonly both filler filler"]),
        "source": pa.array(["src0", "src0", "src1", "src1"])})
    out = fightin_words(ray.data.from_arrow(docs), k=10) \
        .set_index("term")["z"]
    assert out["aonly"] > 0 and out["bonly"] < 0
    assert abs(out["both"]) < abs(out["aonly"])


def test_bm25_proximity_boost_orders_clusters_first(ray_session):
    """Two docs with identical BM25 term stats: the one whose query
    terms sit adjacent must outrank the one whose terms scatter."""
    from rse_ray.pipelines.docsearch import bm25_proximity

    q = "spark window merge window"
    out = bm25_proximity(SF, q, k=50)
    assert len(out) > 0
    # scores are sorted and the boost keeps every base score (the
    # boost is additive and non-negative)
    s = out["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


def test_multi_pattern_scan_overlaps(ray_session):
    """The Aho-Corasick pass counts every match: the classic 'ushers'
    overlap case plus doc/hit accounting across documents."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import _AhoCorasick, multi_pattern_scan

    assert _AhoCorasick(["he", "she", "his", "hers"]) \
        .count("ushers") == [1, 1, 0, 1]

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["spark spark and hash join",
                          "no matches here", "hash join hash join"])})
    out = multi_pattern_scan(ray.data.from_arrow(docs),
                             ["spark", "hash join"]).to_pandas() \
        .set_index("pattern")
    assert out.loc["spark", "n_docs"] == 1
    assert out.loc["spark", "n_hits"] == 2
    assert out.loc["hash join", "n_docs"] == 2
    assert out.loc["hash join", "n_hits"] == 3


def test_hll_sliding_merge_equals_direct(ray_session):
    """Register-max merging per window must give the IDENTICAL
    estimate to hashing each window's rows directly (union registers
    = max of member registers)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.sketch import (_hll_estimate,
                                          _hll_registers, _md5_u64,
                                          hll_sliding)

    rng = np.random.default_rng(3)
    t0 = np.datetime64("2024-05-01T00:00:00", "us")
    n = 3000
    ts = t0 + (rng.integers(0, 6 * 3600, size=n) * 1_000_000) \
        .astype("timedelta64[us]")
    users = rng.integers(0, 400, size=n).astype(np.int64)
    ev = pa.table({"ts": pa.array(ts, type=pa.timestamp("us")),
                   "user_id": pa.array(users)})
    out = hll_sliding(ray.data.from_arrow(ev), window_hours=3) \
        .to_pandas().set_index("window_start")["est_ndistinct"]
    # direct recompute for one interior window
    w = np.datetime64("2024-05-01T02:00:00", "us")
    sel = (ts >= w) & (ts < w + np.timedelta64(3, "h"))
    reg = _hll_registers(_md5_u64([int(u) for u in users[sel]]))
    assert out[pd.Timestamp(w.item())] == round(_hll_estimate(reg), 6)


def test_mrf_sd_orders_phrase_doc_first(ray_session):
    """Sequential dependence: with equal unigram stats, the doc whose
    query terms appear as the exact ordered bigram must outrank the
    doc where they are far apart."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.text import mrf_sd_scores

    filler = " ".join(["x"] * 20)
    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array([
            f"spark window {filler}",           # adjacent, ordered
            f"spark {filler} window",           # same tf, no window
        ])})
    out = mrf_sd_scores(ray.data.from_arrow(docs), "spark window",
                        k=2)
    assert out["doc_id"].tolist()[0] == 0
    assert out["score"].iloc[0] > out["score"].iloc[1]


def test_half_away_rounding_contracts(ray_session):
    """Regression guards for the cross-scale sweep findings: values
    landing on exact half-ulp boundaries must round AWAY from zero
    (the oracle convention), not half-even."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.relational import market_basket

    # lift = n_pair * N / (n_a * n_b) engineered to 2.3015625
    # (exact binary), which half-even would print as 2.301562
    orders = []
    li_rows = []
    ok = 0
    # 1473 baskets; parts 1 and 2 co-occur twice; n_1 = 32, n_2 = 40
    for b in range(1473):
        ok += 1
        items = []
        if b < 2:
            items = [1, 2]
        elif b < 32:
            items = [1]
        elif b < 70:
            items = [2]
        else:
            items = [900 + (b % 5)]
        for p in items:
            li_rows.append((ok, p))
    li_t = pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows],
                               type=pa.int64()),
        "l_partkey": pa.array([r[1] for r in li_rows],
                              type=pa.int64())})
    out = market_basket(ray.data.from_arrow(li_t),
                        min_pair=2).to_pandas()
    row = out[(out["part_a"] == 1) & (out["part_b"] == 2)]
    assert len(row) == 1
    # 2 * 1473 / (32 * 40) = 2.3015625 -> half-away = 2.301563
    assert row["lift"].iloc[0] == 2.301563


def test_diameter_estimate_path_graph(ray_session):
    """On a directed path a -> b -> c -> d the first sweep from 'a'
    reaches d at depth 3; the second sweep from d reaches only d, so
    the double-sweep bound is max(ecc) = 3 from sweep one and the
    output carries both reach counts."""
    import pyarrow as pa
    import ray.data

    from rse_ray.pipelines.linkgraph import diameter_estimate

    links = pa.table({
        "src_url": pa.array(["a", "b", "c"]),
        "dst_url": pa.array(["b", "c", "d"])})
    out = diameter_estimate(ray.data.from_arrow(links))
    assert out["seed"].iloc[0] == "a"
    assert out["far_node"].iloc[0] == "d"
    assert out["ecc1"].iloc[0] == 3
    assert out["n_reached1"].iloc[0] == 4
    assert out["n_reached2"].iloc[0] == 1
    assert out["diameter_lb"].iloc[0] == 0  # d has no out-edges


def test_hnsw_knn_recall_and_determinism(ray_session):
    """Sharded HNSW vs exact top-k on the fixture embeddings (random
    vectors — the hard case for graph ANN): high-ef search must reach
    near-exact recall, and the graph is a pure function of the vector
    set (content-hashed levels, id-ordered inserts), so two runs at
    any sharding agree exactly."""
    from rse_ray.pipelines.ann import brute_force_knn, hnsw_knn

    qids = [0, 1, 2, 3, 4]
    emb = lambda: _read("embeddings", ["vec_id", "embedding"])  # noqa
    exact = brute_force_knn(emb(), qids, k=10)
    approx = hnsw_knn(emb(), qids, k=10, n_shards=4, ef_search=128)
    hits = total = 0
    for q in qids:
        a = set(exact[exact.query_id == q].neighbor_id)
        b = set(approx[approx.query_id == q].neighbor_id)
        hits += len(a & b)
        total += len(a)
    assert hits / total >= 0.9, f"recall {hits}/{total}"

    again = hnsw_knn(emb(), qids, k=10, n_shards=4, ef_search=128)
    pd.testing.assert_frame_equal(approx.reset_index(drop=True),
                                  again.reset_index(drop=True))
    # self-exclusion contract shared with brute_force_knn
    assert not ((approx["query_id"] == approx["neighbor_id"]).any())


def test_distributed_ann_searcher_equals_batch(ray_session):
    """The warm shard-actor ANN service must return EXACTLY the batch
    hnsw_knn pipeline's answer at the same parameters — same shard
    hash, same deterministic graphs — so the oracled batch path
    vouches for the serving path."""
    import numpy as np

    from rse_ray.pipelines.ann import (
        DistributedAnnSearcher,
        _fetch_query_vectors,
        hnsw_knn,
    )

    qids = [0, 1, 2, 3, 4]
    emb = lambda: _read("embeddings", ["vec_id", "embedding"])  # noqa
    one_shot = hnsw_knn(emb(), qids, k=10, n_shards=4,
                        ef_search=128)
    searcher = DistributedAnnSearcher(emb(), n_shards=4)
    qv = _fetch_query_vectors(emb(), qids)
    order = sorted(qv)
    Q = np.stack([qv[q] for q in order])
    served = searcher.search(Q, k=10, ef_search=128,
                             exclude_ids=order)
    served = served.assign(
        query_id=[order[i] for i in served["query_idx"]])
    served["cos"] = served["cos"].round(6)
    key = ["query_id", "cos", "neighbor_id"]
    a = one_shot.sort_values(key, ascending=[True, False, True]) \
        .reset_index(drop=True)[["query_id", "neighbor_id", "cos"]]
    b = served.sort_values(key, ascending=[True, False, True]) \
        .reset_index(drop=True)[["query_id", "neighbor_id", "cos"]]
    pd.testing.assert_frame_equal(a, b)
    # the scale path — distributed shard write, actors read their own
    # partition from storage, driver never touches vector bytes —
    # must land on the same graphs and therefore the same rows
    import tempfile

    disk = DistributedAnnSearcher(
        emb(), n_shards=4,
        shard_dir=tempfile.mkdtemp(prefix="hnsw_shards_"))
    served2 = disk.search(Q, k=10, ef_search=128, exclude_ids=order)
    served2 = served2.assign(
        query_id=[order[i] for i in served2["query_idx"]])
    served2["cos"] = served2["cos"].round(6)
    b2 = served2.sort_values(key, ascending=[True, False, True]) \
        .reset_index(drop=True)[["query_id", "neighbor_id", "cos"]]
    pd.testing.assert_frame_equal(a, b2)
    searcher.shutdown()
    disk.shutdown()
