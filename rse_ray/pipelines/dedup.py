"""Deduplication family — the reference has only exact-URL dedup
(Redis visited set + UNIQUE(url), SURVEY §2.7 D1); the rest are the
standard large-corpus training-data near-dup operators.

Scale shapes:
  * exact:        hash column in map_batches -> groupby(hash) shuffle of
                  (hash, id) only -> keep-one per group.
  * last-writer:  groupby(key) keep max(ts) — D1 upsert semantics.
  * MinHash-LSH:  actor-pool signature stage (hash params built once per
                  actor) -> explode to (band, band_hash, doc_id) rows ->
                  groupby(band, band_hash) buckets -> candidate pairs ->
                  verify with exact Jaccard inside the group (bucket
                  sizes are capped; a bucket of b docs yields b^2/2
                  verifications, done vectorized per group).
  * SimHash:      signature per doc -> group by rotated prefix bands ->
                  Hamming-verify within buckets.
  * embedding:    cosine near-dup via label/LSH bucketing + within-
                  bucket matmul (pipelines/ann.py holds the knn core).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(ds, key_col: str = "text", id_col: str = "doc_id"):
    """Keep min(id) per identical key; -> (doc_id, n_copies). The hash
    column is computed vectorized so the shuffle moves (hash, id) rows,
    never the full text."""

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch.column(key_col).to_pylist()
        hs = [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in vals]
        return pa.table(
            {"h": pa.array(hs, type=pa.string()),
             id_col: batch.column(id_col)}
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: [int(g[id_col].min())], "n_copies": [len(g)]}
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
        .select_columns([id_col, "n_copies"])
    )


def last_writer_dedup(ds, key_col: str, ts_col: str, tiebreak_col: str,
                      keep_cols: list[str]):
    """D1 semantics (upsert last-writer-wins, crawler.go:217-221): per
    key keep the row with max ts, ties broken by max tiebreak_col."""

    def keep_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], ascending=[False, False])
        return g.head(1)[keep_cols]

    return ds.groupby(key_col).map_groups(keep_last, batch_format="pandas")


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHashSignatures:
    """Actor-pool stage: (doc_id, text) -> num_bands rows of
    (band, band_hash, doc_id). Hash params + tokenizer built once."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16,
                 shingle_n: int = 3, seed: int = 7) -> None:
        from rse_ray.functions.hashing import MinHasher

        self.mh = MinHasher(num_perm, seed)
        self.num_bands = num_bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        bands, keys, dids = [], [], []
        for did, text in zip(ids, texts):
            toks = text.split()
            sig = self.mh.signature(toks, self.shingle_n)
            for band, key in enumerate(self.mh.band_keys(sig, self.num_bands)):
                bands.append(band)
                keys.append(key)
                dids.append(int(did))
        return pa.table(
            {"band": pa.array(bands, type=pa.int32()),
             "band_hash": pa.array(keys, type=pa.int64()),
             "doc_id": pa.array(dids, type=pa.int64())}
        )


def minhash_candidate_pairs(ds, *, num_perm=128, num_bands=16, shingle_n=3,
                            concurrency: int | None = 4, max_bucket: int = 64):
    """LSH candidate pairs: docs sharing any band bucket. Returns
    (doc_a, doc_b) with doc_a < doc_b, deduplicated across bands."""
    from rse_ray.util import clamp_pool

    concurrency = clamp_pool(concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(x) for x in g["doc_id"]))
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"doc_a": [], "doc_b": []}, dtype="int64")
        pairs = list(combinations(ids, 2))
        return pd.DataFrame(
            {"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]}
        )

    sig = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands,
                               "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pairs = sig.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # dedup pairs found in multiple bands
    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pair, batch_format="pandas"
    )


def minhash_dedup_pairs(ds, *, threshold: float = 0.8, num_perm=128,
                        num_bands=16, shingle_n=3, concurrency: int = 4):
    """Full near-dup: LSH candidates verified with EXACT n-gram Jaccard
    >= threshold. The verify joins candidate pairs back to texts via a
    broadcast dict (candidate sets are small; at fleet scale this
    becomes a bucketed join on doc_id)."""
    import ray

    from rse_ray.functions.hashing import exact_jaccard

    cands = minhash_candidate_pairs(
        ds, num_perm=num_perm, num_bands=num_bands, shingle_n=shingle_n,
        concurrency=concurrency,
    ).to_pandas()
    if cands.empty:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "jaccard": pd.array([], dtype="float64")})
    needed = set(cands["doc_a"]) | set(cands["doc_b"])
    texts = {}
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            if did in needed:
                texts[did] = t
    rows = []
    for a, b in zip(cands["doc_a"], cands["doc_b"]):
        j = exact_jaccard(texts[int(a)].split(), texts[int(b)].split(), shingle_n)
        if j >= threshold:
            rows.append((int(a), int(b), round(j, 6)))
    rows.sort()
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
    )


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

def simhash_signatures(ds):
    """(doc_id, simhash) as uint64-in-int64 bits."""
    from rse_ray.functions.hashing import simhash64

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        sigs = [np.int64(np.uint64(simhash64(t.split()))) for t in texts]
        return pa.table(
            {"doc_id": pa.array(ids), "simhash": pa.array(sigs, type=pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_dup_pairs(ds, *, max_hamming: int = 3):
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by the
    standard 4-table prefix-rotation trick: two 64-bit hashes within
    Hamming 3 share at least one identical 16-bit quarter -> group by
    (quarter_idx, quarter_value), verify within buckets."""
    from rse_ray.functions.hashing import hamming64

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sigs = batch.column("simhash").to_numpy().astype(np.uint64)
        q_idx, q_val, dids, full = [], [], [], []
        for did, s in zip(ids, sigs):
            for q in range(4):
                q_idx.append(q)
                q_val.append(int((int(s) >> (16 * q)) & 0xFFFF))
                dids.append(int(did))
                full.append(np.int64(s))
        return pa.table(
            {"q": pa.array(q_idx, type=pa.int32()),
             "qv": pa.array(q_val, type=pa.int32()),
             "doc_id": pa.array(dids, type=pa.int64()),
             "simhash": pa.array(full, type=pa.int64())}
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        recs = sorted(
            {(int(d), int(s)) for d, s in zip(g["doc_id"], g["simhash"])}
        )
        for (da, sa), (db, sb) in combinations(recs, 2):
            hd = hamming64(int(np.uint64(sa)), int(np.uint64(sb)))
            if hd <= max_hamming:
                rows.append((da, db, hd))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(
            "int64" if rows else {"doc_a": "int64", "doc_b": "int64",
                                  "hamming": "int64"}
        )

    sig = simhash_signatures(ds)
    pairs = sig.map_batches(explode, batch_format="pyarrow").groupby(
        ["q", "qv"]
    ).map_groups(verify, batch_format="pandas")

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pair, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs (the SQL-checkable ground truth)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, *, threshold: float = 0.5, shingle_n: int = 3,
                        max_bucket: int = 1000):
    """Exact all-pairs n-gram Jaccard >= threshold via a shingle-join:
    explode (shingle_hash, doc_id, n_shingles) -> group by shingle ->
    pair counts -> jaccard = inter / (na + nb - inter). Distributed
    as two groupbys; the intersect counts are summed per pair."""
    from ray.data.aggregate import Sum

    from rse_ray.functions.hashing import shingles

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        sh_h, dids, sizes = [], [], []
        for did, t in zip(ids, texts):
            sh = shingles(t.split(), shingle_n)
            for s in sh:
                import zlib

                sh_h.append(zlib.crc32(s))
                dids.append(int(did))
                sizes.append(len(sh))
        return pa.table(
            {"sh": pa.array(sh_h, type=pa.int64()),
             "doc_id": pa.array(dids, type=pa.int64()),
             "n_sh": pa.array(sizes, type=pa.int64())}
        )

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized: hot shingles produce O(k^2) pairs, so the pair
        # matrix is built with numpy triu indices, never a Python loop
        d = np.asarray(g["doc_id"], dtype=np.int64)
        n = np.asarray(g["n_sh"], dtype=np.int64)
        d, idx = np.unique(d, return_index=True)
        n = n[idx]
        if len(d) < 2 or len(d) > max_bucket:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "na": [], "nb": [],
                                 "c": []}, dtype="int64")
        iu, ju = np.triu_indices(len(d), k=1)
        return pd.DataFrame(
            {"doc_a": d[iu], "doc_b": d[ju], "na": n[iu], "nb": n[ju],
             "c": np.ones(len(iu), dtype=np.int64)}
        )

    ex = ds.map_batches(explode, batch_format="pyarrow")
    pairs = ex.groupby("sh").map_groups(pair_counts, batch_format="pandas")
    # na/nb ride along as (constant-per-pair) group keys so the jaccard
    # denominator survives the aggregate without a second join
    agg2 = pairs.groupby(["doc_a", "doc_b", "na", "nb"]).aggregate(
        Sum("c", alias_name="inter")
    )

    def jacc(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        inter = df["inter"].astype("int64")
        union = df["na"] + df["nb"] - inter
        j = (inter / union).round(6)
        out = df[["doc_a", "doc_b"]].copy()
        out["jaccard"] = j
        return pa.Table.from_pandas(
            out[j >= threshold], preserve_index=False
        )

    return agg2.map_batches(jacc, batch_format="pyarrow")
