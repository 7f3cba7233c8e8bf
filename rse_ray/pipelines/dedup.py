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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


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
        sigs = self.mh.signatures_batch(
            [t.split() for t in texts], self.shingle_n
        )
        bands, keys, dids = [], [], []
        for did, sig in zip(ids, sigs):
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
                            concurrency: int | None = 4, max_bucket: int = 64,
                            num_parts: int | None = None,
                            dedup_stage: bool = True):
    """LSH candidate pairs: docs sharing any band bucket. Returns
    (doc_a, doc_b) with doc_a < doc_b, deduplicated across bands.

    Shuffles group by a COARSE partition key (band_hash % P, then
    doc_a % P for the cross-band dedup) and do all per-bucket pair
    generation inside the partition with one vectorized self-merge —
    grouping by the raw (band, band_hash) key would pay per-group
    Python+Arrow overhead on ~|docs|x|bands| near-singleton groups.
    ``num_parts`` defaults to ``parts_for(rows)`` — input-derived, so
    an sf100 corpus fans out past 32 reduce slots; the pair SET is
    invariant to it (buckets never straddle a part). The default size
    probe is ``plan_rows`` — plan metadata / parquet footers, so a
    transformed input is NOT executed twice for its count."""
    from rse_ray.util import clamp_pool, parts_for, plan_rows

    concurrency = clamp_pool(concurrency)
    if num_parts is None:
        num_parts = parts_for(plan_rows(ds))

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(batch.column("band_hash"), num_parts - 1),
            pa.int32(),
        )
        return batch.append_column("part", part)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # bucket sizes (distinct docs per (band, band_hash))
        g = g.drop_duplicates(["band", "band_hash", "doc_id"])
        sz = g.groupby(["band", "band_hash"])["doc_id"].transform("size")
        g = g[(sz >= 2) & (sz <= max_bucket)]
        if g.empty:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "part2": pd.array([], dtype="int32")})
        m = pd.merge(g, g, on=["band", "band_hash"], sort=False)
        m = m[m["doc_id_x"].values < m["doc_id_y"].values]
        out = (m[["doc_id_x", "doc_id_y"]]
               .drop_duplicates()
               .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"}))
        out["part2"] = (out["doc_a"] % num_parts).astype("int32")
        return out

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]]

    sig = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands,
                               "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pairs = sig.map_batches(add_part, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(part_pairs, batch_format="pandas")
    if not dedup_stage:
        # caller handles cross-band dedup (e.g. driver-side on the tiny
        # collected pair list) — skips one all-to-all shuffle
        return pairs
    # cross-band dedup: a pair can surface under several band hashes
    return pairs.groupby("part2").map_groups(dedup_part, batch_format="pandas")


def minhash_dedup_pairs(ds, *, threshold: float = 0.8, num_perm=128,
                        num_bands=16, shingle_n=3, concurrency: int = 4,
                        num_parts: int | None = None,
                        driver_pairs_threshold: int = 10_000_000):
    """Full near-dup: LSH candidates verified with EXACT n-gram Jaccard
    >= threshold.

    The verify is a distributed two-stage hash-partition join — no
    corpus data ever crosses the driver:

      1. the candidate ID pairs (small: ints only) pick out the texts
         they need via a DISTRIBUTED is_in filter over the corpus; the
         filtered (doc_id, text) set is materialized once (it is
         O(candidate docs), not O(corpus)) and reused by both join
         stages;
      2. stage 1 co-partitions candidates by doc_a % P with the texts
         by doc_id % P and attaches text_a inside each partition task;
      3. stage 2 re-partitions the (pair, text_a) rows by doc_b % P
         against the same text set, attaches text_b, and computes the
         exact shingle Jaccard in the task.

    Only the qualifying (doc_a, doc_b, jaccard) rows return to the
    driver. Text duplication across pairs is bounded by the candidate
    generator's max_bucket cap.

    Cross-band candidate dedup is driver-side (``drop_duplicates`` on
    the int-only pair list) below ``driver_pairs_threshold`` raw pairs,
    and the DISTRIBUTED ``groupby(doc_a % P)`` dedup shuffle above it —
    at 10^10 raw candidates the driver list would be the bottleneck
    (round-2 VERDICT item 5); in that branch the candidate stream never
    leaves the cluster (only the distinct doc-id array does, to drive
    the is_in text filter)."""
    import ray

    from rse_ray.util import parts_for, plan_rows

    from rse_ray.functions.hashing import exact_jaccard

    empty = pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                          "doc_b": pd.array([], dtype="int64"),
                          "jaccard": pd.array([], dtype="float64")})
    if num_parts is None:
        num_parts = parts_for(plan_rows(ds))
    P = num_parts
    raw = minhash_candidate_pairs(
        ds, num_perm=num_perm, num_bands=num_bands, shingle_n=shingle_n,
        concurrency=concurrency, dedup_stage=False, num_parts=P,
    ).materialize()  # ID pairs only (ints): bounded by bands*max_bucket²
    cand_part_ds = None
    if raw.count() <= driver_pairs_threshold:
        cands = raw.to_pandas()
        if cands.empty:
            return empty
        cands = cands.drop_duplicates(["doc_a", "doc_b"])  # cross-band dedup
        doc_a = cands["doc_a"].to_numpy().astype(np.int64)
        doc_b = cands["doc_b"].to_numpy().astype(np.int64)
        needed = np.unique(np.concatenate([doc_a, doc_b]))
    else:
        def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]]

        cands_ds = raw.groupby("part2").map_groups(
            dedup_part, batch_format="pandas"
        ).materialize()
        if cands_ds.count() == 0:
            return empty

        def to_cand_rows(b: pa.Table) -> pa.Table:
            a = b.column("doc_a").to_numpy().astype(np.int64)
            bb = b.column("doc_b").to_numpy().astype(np.int64)
            return pa.table(
                {"part": pa.array((a % P).astype(np.int32)),
                 "a": pa.array(a), "b": pa.array(bb),
                 "text": pa.array([""] * len(a), type=pa.string())}
            )

        cand_part_ds = cands_ds.map_batches(to_cand_rows,
                                            batch_format="pyarrow")

        # distinct doc ids: O(candidate docs) ints on the driver — the
        # one thing the is_in broadcast genuinely needs. Shared
        # Dataset.unique() workaround (util.distinct_ints).
        from rse_ray.util import distinct_ints

        needed = distinct_ints(cands_ds, ["doc_a", "doc_b"])
    needed_ref = ray.put(needed)

    # rows tagged b == -1 are text carriers: (part, a=doc_id, -1, text)
    def pick_texts(batch: pa.Table) -> pa.Table:
        need = ray.get(needed_ref)
        vs = pa.array(need, type=batch.column("doc_id").type)
        t = batch.filter(pc.is_in(batch.column("doc_id"), value_set=vs))
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table(
            {"part": pa.array((ids % P).astype(np.int32)),
             "a": pa.array(ids),
             "b": pa.array(np.full(len(ids), -1, dtype=np.int64)),
             "text": t.column("text").cast(pa.string())}
        )

    texts_ds = ds.map_batches(
        pick_texts, batch_format="pyarrow"
    ).materialize()  # small: candidate docs only

    import ray.data as rd

    if cand_part_ds is None:  # driver-dedup branch: pairs already local
        cand_part_ds = rd.from_arrow(pa.table(
            {"part": pa.array((doc_a % P).astype(np.int32)),
             "a": pa.array(doc_a),
             "b": pa.array(doc_b),
             "text": pa.array([""] * len(doc_a), type=pa.string())}
        ))

    def attach_a(g: pd.DataFrame) -> pa.Table:
        # arrow output: the result unions with texts_ds (arrow blocks)
        # into another sort-shuffle, and Ray's sort can't mix block types
        tx = g[g["b"] < 0]
        lookup = dict(zip(tx["a"].astype("int64"), tx["text"]))
        cd = g[g["b"] >= 0]
        b = cd["b"].to_numpy().astype(np.int64)
        return pa.table(
            {"part": pa.array((b % P).astype(np.int32)),
             "a": pa.array(cd["a"].to_numpy().astype(np.int64)),
             "b": pa.array(b),
             "text": pa.array([lookup[int(x)] for x in cd["a"]],
                              type=pa.string())}
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        tx = g[g["b"] < 0]
        lookup = dict(zip(tx["a"].astype("int64"), tx["text"]))
        cd = g[g["b"] >= 0]
        out_a, out_b, out_j = [], [], []
        for a, b, ta in zip(cd["a"], cd["b"], cd["text"]):
            tb = lookup[int(b)]
            if not ta.split() and not tb.split():
                # two empty docs are exact (not near-) duplicates —
                # exact_dedup's territory; emitting jaccard 1.0 here
                # would diverge from the shingle-based SQL oracle
                continue
            j = exact_jaccard(ta.split(), tb.split(), shingle_n)
            if j >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(round(j, 6))
        return pd.DataFrame(
            {"doc_a": pd.array(out_a, dtype="int64"),
             "doc_b": pd.array(out_b, dtype="int64"),
             "jaccard": pd.array(out_j, dtype="float64")}
        )

    stage1 = texts_ds.union(cand_part_ds).groupby(
        "part"
    ).map_groups(attach_a, batch_format="pandas")
    res = texts_ds.union(stage1).groupby("part").map_groups(
        verify, batch_format="pandas"
    ).to_pandas()
    if res.empty:
        return empty
    return res.astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


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


_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.int64)


def _hamming64_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a ^ b) for int64-held uint64 bit patterns."""
    x = a.view(np.uint64) ^ b.view(np.uint64)
    return _POPCOUNT8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)


def simhash_dup_pairs(ds, *, max_hamming: int = 3,
                      num_parts: int | None = None):
    """Near-dup pairs with Hamming(simhash) <= max_hamming over the
    text corpus — simhash signatures fed through the generic 64-bit
    ``hash_dup_pairs`` banding engine (shared with the image
    perceptual-hash dedup)."""
    return hash_dup_pairs(simhash_signatures(ds),
                          max_hamming=max_hamming, num_parts=num_parts,
                          n_rows=ds.count())


def hash_dup_pairs(sig_ds, *, id_col: str = "doc_id",
                   sig_col: str = "simhash", max_hamming: int = 3,
                   num_parts: int | None = None,
                   n_rows: int | None = None,
                   out_cols: tuple = ("doc_a", "doc_b")):
    """Generic 64-bit-signature near-dup pairs (Hamming <=
    max_hamming) by the standard 4-table prefix trick: two 64-bit
    hashes within Hamming 3 share at least one identical 16-bit
    quarter -> bucket by (quarter_idx, quarter_value), verify within
    buckets. The pigeonhole guarantee only covers max_hamming <= 3
    with 4 bands — larger radii raise.

    Buckets are near-singletons, so the shuffle groups by a coarse
    partition of the quarter key and each partition does bucket pairing
    with one vectorized self-merge + LUT popcount (same pattern as
    minhash_candidate_pairs). ``num_parts`` defaults to the shared
    input-derived ``parts_for(rows)``; the pair set is invariant to it
    (a (quarter, value) bucket never straddles a part)."""
    from rse_ray.util import parts_for

    if max_hamming > 3:
        raise ValueError("4x16-bit bands guarantee recall only for "
                         "max_hamming <= 3")
    if num_parts is None:
        # n_rows hint: counting sig_ds would EXECUTE the signature
        # pipeline a second time (for pHash, a full decode+DCT pass) —
        # callers pass the cheap upstream row count instead
        num_parts = parts_for(n_rows if n_rows is not None
                              else sig_ds.count())

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sigs = batch.column(sig_col).to_numpy()
        n = len(ids)
        u = sigs.view(np.uint64)
        q_idx = np.tile(np.arange(4, dtype=np.int32), n)
        dids = np.repeat(ids, 4)
        full = np.repeat(sigs, 4)
        shifts = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        q_val = ((np.repeat(u, 4) >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        part = ((q_idx.astype(np.int64) << 16) | q_val) % num_parts
        return pa.table(
            {"q": pa.array(q_idx), "qv": pa.array(q_val),
             "doc_id": pa.array(dids, type=pa.int64()),
             "simhash": pa.array(full, type=pa.int64()),
             "part": pa.array(part.astype(np.int32))}
        )

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby(["q", "qv"])["doc_id"].transform("size")
        g = g[sz >= 2]
        if g.empty:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "hamming": pd.array([], dtype="int64"),
                                 "part2": pd.array([], dtype="int32")})
        m = pd.merge(g, g, on=["q", "qv"], sort=False)
        m = m[m["doc_id_x"].values < m["doc_id_y"].values]
        if m.empty:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "hamming": pd.array([], dtype="int64"),
                                 "part2": pd.array([], dtype="int32")})
        hd = _hamming64_vec(m["simhash_x"].to_numpy(),
                            m["simhash_y"].to_numpy())
        m = m[hd <= max_hamming]
        out = pd.DataFrame(
            {"doc_a": m["doc_id_x"].to_numpy(),
             "doc_b": m["doc_id_y"].to_numpy(),
             "hamming": hd[hd <= max_hamming]}
        ).drop_duplicates(["doc_a", "doc_b"])
        out["part2"] = (out["doc_a"] % num_parts).astype("int32")
        return out

    a_col, b_col = out_cols

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["doc_a", "doc_b"])[
            ["doc_a", "doc_b", "hamming"]
        ]
        return out.rename(columns={"doc_a": a_col, "doc_b": b_col})

    pairs = sig_ds.map_batches(explode, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(part_pairs, batch_format="pandas")
    # a pair can match on several quarters -> cross-partition dedup
    return pairs.groupby("part2").map_groups(dedup_part, batch_format="pandas")


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs (the SQL-checkable ground truth)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, *, threshold: float = 0.5, shingle_n: int = 3,
                        max_bucket: int | None = None,
                        num_blocks: int | None = None,
                        measure: str = "jaccard"):
    """Exact all-pairs n-gram Jaccard >= threshold, block-nested-loop.

    The naive distributed form (explode shingles -> groupby(shingle) ->
    emit C(df,2) pair rows -> groupby(pair) sum) shuffles one row per
    *shared-shingle instance* — quadratic in the hot-shingle df and
    dominated by two all-to-all sorts of that pair stream. This version
    never shuffles pair rows at all:

      1. one map_batches turns each doc into its (64-bit-hashed,
         deduped) shingle array — the only pass over text;
      2. the shingle-set blocks are pinned in the object store
         (``to_arrow_refs``: Ray Data's own blocks ARE the partition);
      3. a task per block-pair (i <= j) fetches the two blocks
         zero-copy and computes ALL pairwise intersection counts
         locally via one C-speed hash-join (pandas merge on shingle)
         + bincount over packed pair ids, then emits only the pairs
         meeting the threshold.

    Work is the same Σ df_i·df_j pair instances, but it runs as numpy
    kernels inside ~B²/2 independent tasks instead of rows through a
    distributed sort, and the output (the only thing shuffled anywhere)
    is just the qualifying pairs. At fleet scale the blocks become
    parquet shards on shared storage and the B²/2 task grid streams
    through the same code path; ``max_bucket`` is retained for
    API-compat and ignored (no candidate cap is needed).
    """
    import ray
    import zlib

    from rse_ray.functions.hashing import shingles
    from rse_ray.util import parts_for, plan_rows

    if num_blocks is None:
        # B² /2 tasks: keep B modest — ~25k docs per block, capped so
        # the grid stays under ~2k tasks (exact all-pairs is a ground-
        # truth tool, not the scale path)
        num_blocks = parts_for(plan_rows(ds), rows_per_part=25_000,
                               min_parts=8, max_parts=64, pow2=False)

    def make_sets(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_id, out_sh = [], []
        for did, t in zip(ids, texts):
            sh = shingles(t.split(), shingle_n)
            if not sh:
                continue
            # 63-bit hash (two crc32 halves, high bit dropped to stay in
            # int64): collision-free in practice, unlike bare crc32 whose
            # birthday collisions at ~1e6 distinct shingles would corrupt
            # exact intersection counts
            h = np.fromiter(
                (((zlib.crc32(s) & 0x7FFFFFFF) << 32) | zlib.crc32(s + b"#j")
                 for s in sh),
                dtype=np.int64, count=len(sh),
            )
            out_id.append(int(did))
            out_sh.append(h)
        return pa.table(
            {"doc_id": pa.array(out_id, type=pa.int64()),
             "sh": pa.array([a.tolist() for a in out_sh],
                            type=pa.list_(pa.int64()))}
        )

    sets_ds = ds.map_batches(make_sets, batch_format="pyarrow")
    # Ray Data's own blocks are the partition; repartition (a split/
    # coalesce, not a shuffle) sizes the B x B task grid
    block_refs = sets_ds.repartition(num_blocks).to_arrow_refs()
    B = len(block_refs)

    def _explode(tbl: pa.Table):
        """block table -> (doc_ids, set sizes, flat shingle array,
        doc index per flat row). An EMPTY repartition block arrives
        schema-less (Ray Data drops the schema with the rows), so the
        missing-column case means 'no docs here', not an error."""
        if tbl.num_rows == 0 or "doc_id" not in tbl.schema.names:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z
        ids = tbl.column("doc_id").to_numpy()
        lists = tbl.column("sh")
        flat = lists.combine_chunks().flatten().to_numpy() if isinstance(
            lists, pa.ChunkedArray
        ) else lists.flatten().to_numpy()
        sizes = np.asarray(
            [len(v) for v in tbl.column("sh").to_pylist()], dtype=np.int64
        )
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), sizes)
        return ids, sizes, flat, idx

    def block_pair(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ta = ray.get(block_refs[i])
            ids_a, na, sh_a, ia = _explode(ta)
            if i == j:
                ids_b, nb, sh_b, ib = ids_a, na, sh_a, ia
            else:
                ids_b, nb, sh_b, ib = _explode(ray.get(block_refs[j]))
            if len(ids_a) == 0 or len(ids_b) == 0:
                continue
            # hash-join on shingle: one pair-instance row per shared
            # shingle occurrence, all in C
            m = pd.merge(
                pd.DataFrame({"sh": sh_a, "ia": ia}),
                pd.DataFrame({"sh": sh_b, "ib": ib}),
                on="sh", sort=False,
            )
            if i == j:
                m = m[m["ia"].values < m["ib"].values]
            if not len(m):
                continue
            keys = m["ia"].values * np.int64(len(ids_b)) + m["ib"].values
            uk, counts = np.unique(keys, return_counts=True)
            pa_idx = uk // len(ids_b)
            pb_idx = uk % len(ids_b)
            if measure == "containment":
                # containment of the smaller set in the larger: the
                # quote/subset-detection measure (Broder 1997), which
                # Jaccard misses when |A| << |B|
                jac = counts / np.minimum(na[pa_idx], nb[pb_idx])
            else:
                jac = counts / (na[pa_idx] + nb[pb_idx] - counts)
            keep = jac >= threshold
            if not keep.any():
                continue
            da, db = ids_a[pa_idx[keep]], ids_b[pb_idx[keep]]
            lo, hi = np.minimum(da, db), np.maximum(da, db)
            out_a.append(lo)
            out_b.append(hi)
            out_j.append(np.round(jac[keep], 6))
        if not out_a:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()),
                 "doc_b": pa.array([], type=pa.int64()),
                 measure: pa.array([], type=pa.float64())}
            )
        return pa.table(
            {"doc_a": pa.array(np.concatenate(out_a)),
             "doc_b": pa.array(np.concatenate(out_b)),
             measure: pa.array(np.concatenate(out_j))}
        )

    items = [{"i": i, "j": j} for i in range(B) for j in range(i, B)]
    import ray.data as rd

    return rd.from_items(items).map_batches(
        block_pair, batch_format="pyarrow", batch_size=1
    )


# --------------------------------------------------------------------------
# duplicate clusters + keep-one-representative (the dedup OUTPUT)
# --------------------------------------------------------------------------

def _clusters_label_prop(pairs, num_parts: int | None = None
                         ) -> pd.DataFrame:
    """Distributed connected components by iterative min-label
    propagation — the fleet-scale form for pair lists too big for one
    process: label(v) <- min(label(v), min label over neighbors),
    repeated to fixpoint. Each round is two co-partitioned shuffles
    (send every node's label along its out-edges, then per-node min);
    the driver holds only iteration control and the converged (node,
    label) table. Converges in O(component diameter) rounds; the label
    sum is monotone nonincreasing, so an unchanged sum witnesses the
    fixpoint.

    ``pairs`` is a (doc_a, doc_b) table, EITHER a pandas DataFrame
    (small verified pair lists) OR a ``ray.data.Dataset`` — the
    Dataset form never routes the pair list through the driver: edges
    and initial labels derive per batch (initial labels may repeat a
    node across batches; the first reduce_min round de-dupes them,
    since min(l)=n for every copy)."""
    import ray.data as rd

    from rse_ray.util import parts_for

    empty = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                          "cluster_id": pd.array([], dtype="int64")})
    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            return empty
        a = pairs["doc_a"].to_numpy().astype(np.int64)
        b = pairs["doc_b"].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        P = num_parts or parts_for(len(src), rows_per_part=100_000,
                                   min_parts=8, max_parts=512)
        edges_ds = rd.from_arrow(pa.table(
            {"part": pa.array((src % P).astype(np.int32)),
             "n": pa.array(src, type=pa.int64()),
             "l": pa.array(dst, type=pa.int64()),
             "kind": pa.array(np.ones(len(src), dtype=np.int8))}
        )).materialize()
        nodes = np.unique(src)
        labels_ds = rd.from_arrow(pa.table(
            {"part": pa.array((nodes % P).astype(np.int32)),
             "n": pa.array(nodes, type=pa.int64()),
             "l": pa.array(nodes, type=pa.int64()),
             "kind": pa.array(np.zeros(len(nodes), dtype=np.int8))}
        )).materialize()
    else:
        # Dataset of verified pairs: pin once (edge and label branches
        # both consume it; count() on the pinned copy is metadata)
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        if n_pairs == 0:
            return empty
        P = num_parts or parts_for(2 * n_pairs, rows_per_part=100_000,
                                   min_parts=8, max_parts=512)

        def to_rows(b: pa.Table, kind: int) -> pa.Table:
            a = b.column("doc_a").to_numpy(
                zero_copy_only=False).astype(np.int64)
            bb = b.column("doc_b").to_numpy(
                zero_copy_only=False).astype(np.int64)
            src = np.concatenate([a, bb])
            if kind == 1:
                dst = np.concatenate([bb, a])
            else:
                src = np.unique(src)  # batch-local; global dedup is
                dst = src             # round 1's reduce_min
            return pa.table(
                {"part": pa.array((src % P).astype(np.int32)),
                 "n": pa.array(src, type=pa.int64()),
                 "l": pa.array(dst, type=pa.int64()),
                 "kind": pa.array(np.full(len(src), kind,
                                          dtype=np.int8))})

        edges_ds = pairs.map_batches(
            lambda b: to_rows(b, 1), batch_format="pyarrow"
        ).materialize()
        labels_ds = pairs.map_batches(
            lambda b: to_rows(b, 0), batch_format="pyarrow"
        ).materialize()

    def send(g: pd.DataFrame) -> pa.Table:
        # arrow out: the result unions with arrow-block datasets into
        # another sort-shuffle (Ray's sort can't mix block types)
        lab = g[g["kind"] == 0].sort_values("n")
        ed = g[g["kind"] == 1]
        idx = np.searchsorted(lab["n"].to_numpy(), ed["n"].to_numpy())
        out_n = np.concatenate([lab["n"].to_numpy(),
                                ed["l"].to_numpy()])  # dst gets src's label
        out_l = np.concatenate([lab["l"].to_numpy(),
                                lab["l"].to_numpy()[idx]])
        return pa.table(
            {"part": pa.array((out_n % P).astype(np.int32)),
             "n": pa.array(out_n, type=pa.int64()),
             "l": pa.array(out_l, type=pa.int64())}
        )

    def reduce_min(g: pd.DataFrame) -> pa.Table:
        r = g.groupby("n", as_index=False)["l"].min()
        n = r["n"].to_numpy().astype(np.int64)
        return pa.table(
            {"part": pa.array((n % P).astype(np.int32)),
             "n": pa.array(n, type=pa.int64()),
             "l": pa.array(r["l"].to_numpy().astype(np.int64)),
             "kind": pa.array(np.zeros(len(n), dtype=np.int8))}
        )

    prev_sum = None
    while True:
        labels_ds = labels_ds.union(edges_ds).groupby("part").map_groups(
            send, batch_format="pandas"
        ).groupby("part").map_groups(
            reduce_min, batch_format="pandas"
        ).materialize()
        s = labels_ds.sum("l")
        if s == prev_sum:
            break
        prev_sum = s
    out = labels_ds.to_pandas().sort_values("n")
    return pd.DataFrame(
        {"doc_id": pd.array(out["n"].astype("int64"), dtype="int64"),
         "cluster_id": pd.array(out["l"].astype("int64"), dtype="int64")}
    ).reset_index(drop=True)


def dup_clusters(ds=None, *, pairs=None,
                 threshold: float = 0.8, num_perm=128, num_bands=16,
                 shingle_n=3, concurrency: int = 4,
                 method: str = "union_find",
                 num_parts: int | None = None) -> pd.DataFrame:
    """(doc_id, cluster_id) for every doc in >=1 verified near-dup pair:
    connected components over the MinHash-verified pair graph, with
    cluster_id = min doc_id in the component (the canonical
    representative).

    Scale shape: the expensive parts (LSH banding, exact-Jaccard
    verify) are the distributed minhash_dedup_pairs pipeline; the
    component step has two forms behind ``method``:

      * ``union_find`` (default) — driver-side over the pair list only,
        O(dup pairs), never O(corpus); the honest single-box shape for
        pair counts that fit one process, which verified near-dup
        graphs overwhelmingly do.
      * ``label_prop`` — distributed iterative min-label propagation
        (two co-partitioned shuffles per round, O(diameter) rounds) for
        pair lists that outgrow one process; identical clusters
        (tests/test_pipelines.py asserts equality on the fixtures).

    Pass ``pairs`` to reuse an already-computed verified pair list
    (skips the whole MinHash pipeline) — a pandas DataFrame, or a
    ``ray.data.Dataset`` of (doc_a, doc_b) rows, which the
    ``label_prop`` branch consumes end-to-end without ever routing
    the pair list through the driver (``union_find`` is BY DEFINITION
    single-process and collects a Dataset argument)."""
    if pairs is None:
        pairs = minhash_dedup_pairs(
            ds, threshold=threshold, num_perm=num_perm, num_bands=num_bands,
            shingle_n=shingle_n, concurrency=concurrency,
        )
    if method == "label_prop":
        return _clusters_label_prop(pairs, num_parts)
    if method != "union_find":
        raise ValueError(f"unknown method {method!r}")
    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    def union(a: int, b: int) -> None:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        union(int(a), int(b))
    roots: dict[int, int] = {}
    for v in parent:
        r = find(v)
        roots[r] = min(roots.get(r, r), v)
    rows = sorted((v, roots[find(v)]) for v in parent)
    return pd.DataFrame(
        {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
         "cluster_id": pd.array([r[1] for r in rows], dtype="int64")}
    )


def dedup_keep_representative(ds, *, pairs: pd.DataFrame | None = None,
                              threshold: float = 0.8, num_perm=128,
                              num_bands=16, shingle_n=3,
                              concurrency: int = 4):
    """The actual dedup OUTPUT: every doc_id that survives near-dup
    removal (cluster representatives = min doc_id per component, plus
    all unpaired docs). The loser set is small (it is the dup surplus);
    it broadcasts into a distributed is_in filter — the corpus streams,
    only doc_ids come back."""
    clusters = dup_clusters(
        ds, pairs=pairs, threshold=threshold, num_perm=num_perm,
        num_bands=num_bands, shingle_n=shingle_n, concurrency=concurrency,
    )
    losers = clusters.loc[
        clusters["doc_id"] != clusters["cluster_id"], "doc_id"
    ].to_numpy(dtype=np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        vs = pa.array(losers, type=batch.column("doc_id").type)
        m = pc.invert(pc.is_in(batch.column("doc_id"), value_set=vs))
        return pa.table({"doc_id": batch.column("doc_id").filter(m)})

    return ds.map_batches(keep, batch_format="pyarrow")


_DS_MOD = (1 << 31) - 1  # Mersenne-31, matches functions.hashing.poly_hash
_DS_BASE_A = 257
_DS_BASE_B = 263


def _gram_hashes(text: str, k: int, wa: np.ndarray,
                 wb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial hashes of every length-k character gram of ``text``,
    two independent bases, fully vectorized (no per-position Python).
    Codepoints (UTF-32 view) x weight matrix, chunked so the n-by-k
    intermediate stays bounded for megabyte documents. Overflow-safe:
    cp < 2^21, weight < 2^31, k-term sum < k * 2^52 — inside uint64 for
    any practical gram length (k <= 1024)."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    n_pos = len(cps) - k + 1
    ha = np.empty(n_pos, dtype=np.uint64)
    hb = np.empty(n_pos, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(cps, k)
    mod = np.uint64(_DS_MOD)
    for s in range(0, n_pos, 65536):
        e = min(s + 65536, n_pos)
        ha[s:e] = (win[s:e] * wa[None, :]).sum(axis=1) % mod
        hb[s:e] = (win[s:e] * wb[None, :]).sum(axis=1) % mod
    return ha, hb


def dup_spans(ds, *, k: int = 25, id_col: str = "doc_id",
              text_col: str = "text", num_parts: int | None = None,
              carry_gram: bool = True):
    """Duplicate-SPAN detection — substring-level dedup in the shape of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): find every maximal character span whose length-``k`` grams
    each occur >= 2 times across the corpus (any document, self-repeats
    included), i.e. the text a suffix-array dedup pass would cut.
    Output: one row per maximal span, (doc_id, span_start, span_len),
    0-based character offsets. The reference has no analog (its dedup
    is whole-URL, crawler.go visited set); this is the training-data
    hygiene operator its corpus would need at scale.

    Scale shape: docs explode to one (part, hash, doc_id, pos[, gram])
    row per gram position — O(corpus chars) rows, the same order as the
    postings explode the index build already does — then ONE
    groupby(part) marks duplicated positions (hash-partitioned; within
    a part, occurrence counting groups by the gram STRING, so hash
    collisions cannot create false spans) and ONE groupby(doc_id)
    merges overlapping dup positions into maximal spans. No driver
    materialization at any point. ``carry_gram=False`` is the 100 TB
    mode: grams are not shipped and counting keys on the (h_a, h_b)
    62-bit hash pair instead (collision odds ~2^-62 per pair; the
    shuffle drops from ~k+24 to 24 bytes/position). Partition fan-out
    is input-derived: ~128 docs (~40k position rows at web page sizes)
    per reduce slot via the shared parts_for rule."""
    from rse_ray.util import parts_for, plan_rows

    if num_parts is None:
        num_parts = parts_for(plan_rows(ds), rows_per_part=128)
    P = np.uint64(num_parts)
    wa = np.array([pow(_DS_BASE_A, k - 1 - j, _DS_MOD) for j in range(k)],
                  dtype=np.uint64)
    wb = np.array([pow(_DS_BASE_B, k - 1 - j, _DS_MOD) for j in range(k)],
                  dtype=np.uint64)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        a_id, a_pos, a_ha, a_hb, a_gram = [], [], [], [], []
        for did, t in zip(ids, texts):
            if t is None or len(t) < k:
                continue
            ha, hb = _gram_hashes(t, k, wa, wb)
            n_pos = len(ha)
            a_id.append(np.full(n_pos, did, dtype=np.int64))
            a_pos.append(np.arange(n_pos, dtype=np.int64))
            a_ha.append(ha)
            a_hb.append(hb)
            if carry_gram:
                a_gram.extend(t[i:i + k] for i in range(n_pos))
        if not a_id:
            return pa.table(
                {"part": pa.array([], type=pa.int32()),
                 "h_a": pa.array([], type=pa.int64()),
                 "h_b": pa.array([], type=pa.int64()),
                 "doc_id": pa.array([], type=pa.int64()),
                 "pos": pa.array([], type=pa.int64()),
                 "gram": pa.array([], type=pa.string())})
        ha = np.concatenate(a_ha)
        hb = np.concatenate(a_hb)
        return pa.table(
            {"part": pa.array((ha % P).astype(np.int32)),
             "h_a": pa.array(ha.astype(np.int64)),
             "h_b": pa.array(hb.astype(np.int64)),
             "doc_id": pa.array(np.concatenate(a_id)),
             "pos": pa.array(np.concatenate(a_pos)),
             "gram": pa.array(a_gram, type=pa.string()) if carry_gram
             else pa.nulls(len(ha), pa.string())})

    key_cols = ["gram"] if carry_gram else ["h_a", "h_b"]

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(key_cols, sort=False)[id_col] \
            .transform("size")
        return g.loc[cnt >= 2, [id_col, "pos"]]

    def merge_spans(g: pd.DataFrame) -> pa.Table:
        pos = np.sort(g["pos"].to_numpy(np.int64))
        brk = np.flatnonzero(np.diff(pos) > k)
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(pos) - 1]))
        return pa.table(
            {id_col: pa.array(
                np.full(len(starts), int(g[id_col].iloc[0]),
                        dtype=np.int64)),
             "span_start": pa.array(pos[starts]),
             "span_len": pa.array(pos[ends] + k - pos[starts])})

    dup_pos = ds.select_columns([id_col, text_col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("part").map_groups(mark_dups, batch_format="pandas")
    return dup_pos.groupby(id_col).map_groups(
        merge_spans, batch_format="pandas")


def dup_span_stats(ds, *, k: int = 25, id_col: str = "doc_id",
                   text_col: str = "text", num_parts: int | None = None):
    """Per-document duplicate-coverage report — the decision table a
    substring-dedup pass acts on: for EVERY document, how many of its
    characters sit inside a corpus-duplicated span (``dup_spans``) and
    how many would survive the cut. Output (id, orig_len, dup_chars,
    clean_len); docs with no duplicated span report dup_chars = 0.

    Scale shape: ``dup_spans`` (two shuffles, see its docstring) →
    tiny per-doc span-length sum → distributed LEFT hash join against
    the per-doc lengths (spans exist only for dup-bearing docs, so the
    join's right side is the small one). Nothing touches the driver.
    Maximal spans are disjoint by construction (merged islands are
    separated by > k gap), so summing span_len never double-counts."""
    import pyarrow.compute as pc

    from rse_ray.pipelines.relational import hash_join
    from rse_ray.util import parts_for

    # ONE count pass, TWO fan-outs: the gram explode sees ~text_len
    # rows per doc (128 docs/part), the length join sees ONE row per
    # doc — sharing the explode's fan-out would over-partition the
    # join by ~400x at corpus scale
    n_docs = ds.count()
    if num_parts is None:
        num_parts = parts_for(n_docs, rows_per_part=128)
    join_parts = parts_for(n_docs)
    spans = dup_spans(ds, k=k, id_col=id_col, text_col=text_col,
                      num_parts=num_parts)
    sums = spans.groupby(id_col).sum("span_len").map_batches(
        lambda b: b.rename_columns([id_col, "dup_chars"]),
        batch_format="pyarrow")
    lengths = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: pa.table(
            {id_col: b.column(id_col),
             "orig_len": pc.cast(pc.utf8_length(b.column(text_col)),
                                 pa.int64())}),
        batch_format="pyarrow")
    joined = hash_join(lengths, sums, left_on=id_col, right_on=id_col,
                       right_cols=["dup_chars"], how="left",
                       num_parts=join_parts)

    def finish(b: pa.Table) -> pa.Table:
        dup = pc.cast(pc.fill_null(b.column("dup_chars"), 0), pa.int64())
        return pa.table(
            {id_col: b.column(id_col),
             "orig_len": b.column("orig_len"),
             "dup_chars": dup,
             "clean_len": pc.subtract(b.column("orig_len"), dup)})

    return joined.map_batches(finish, batch_format="pyarrow")


def decontaminate(docs_ds, benchmark_ds, *, n: int = 3,
                  key: str = "doc_id", text_col: str = "text"):
    """Benchmark decontamination — the training-data hygiene pass that
    flags corpus docs sharing >=1 word n-gram with an evaluation set
    (so benchmark answers can't leak into training). Output per corpus
    doc: (key, n_hits = #distinct contaminated shingles, contaminated).

    Scale shape: the benchmark side is inherently tiny (eval sets are
    MBs against a 100 TB corpus), so its DISTINCT shingle set is built
    once, ray.put once, and read zero-copy by every map_batches task —
    a broadcast semi-join against shingle sets, NO shuffle of the
    corpus. Shingles are exact byte strings (functions.hashing.shingles
    — same convention as the n-gram Jaccard family, whole-doc shingle
    for <n-token docs), not hashes: a contamination verdict must not
    have collision false-positives."""
    import ray

    from rse_ray.functions.hashing import shingles

    def bench_shingles(batch: pa.Table) -> pa.Table:
        out: set = set()
        for t in batch.column(text_col).to_pylist():
            out.update(shingles(t.split(), n))
        return pa.table({"s": pa.array(sorted(out), type=pa.binary())})

    bench_parts = benchmark_ds.select_columns([text_col]).map_batches(
        bench_shingles, batch_format="pyarrow").to_pandas()
    bench_set = frozenset(bench_parts["s"])
    bench_ref = ray.put(bench_set)

    def flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids = batch.column(key).to_numpy()
        hits = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            hits[i] = len(shingles(t.split(), n) & bset)
        return pa.table({
            key: pa.array(ids),
            "n_hits": pa.array(hits),
            "contaminated": pa.array((hits > 0).astype(np.int64)),
        })

    return docs_ds.map_batches(flag, batch_format="pyarrow")


def incremental_exact_dedup(new_ds, old_ds, *, id_col: str = "doc_id",
                            text_col: str = "text"):
    """Cross-snapshot exact dedup — the nightly-ingest primitive: keep
    only NEW docs whose text is absent from the OLD corpus, without
    ever touching (or re-shuffling the text of) old rows. Both sides
    reduce to (md5(text), id, side) triples per batch, so the single
    all-to-all carries hashes and ids only; a per-hash group keeps the
    new ids iff no old row shares the hash. New-side internal dups all
    survive (they're deduped against the OLD corpus, not each other —
    compose with exact_dedup for that)."""
    import hashlib

    def hasher(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            return pa.table({
                "h": pa.array([hashlib.md5((t or "").encode()).hexdigest()
                               for t in texts], type=pa.string()),
                id_col: batch.column(id_col),
                "side": pa.array(np.full(batch.num_rows, side,
                                         dtype=np.int8)),
            })
        return fn

    both = new_ds.select_columns([id_col, text_col]) \
        .map_batches(hasher(0), batch_format="pyarrow") \
        .union(old_ds.select_columns([id_col, text_col])
               .map_batches(hasher(1), batch_format="pyarrow"))

    def keep_new_only(g: pd.DataFrame) -> pd.DataFrame:
        if (g["side"] == 1).any():
            return pd.DataFrame({id_col: pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {id_col: g[id_col].astype("int64").sort_values().to_numpy()})

    return both.groupby("h").map_groups(keep_new_only,
                                        batch_format="pandas")


# --------------------------------------------------------------------------
# paragraph-level exact dedup (CCNet shape)
# --------------------------------------------------------------------------

def paragraph_dedup(ds, *, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Exact paragraph-level dedup in the shape of CCNet (Wenzek et
    al. 2020): split each doc on newlines, keep only the GLOBAL first
    occurrence of every distinct paragraph (order: doc_id asc, then
    position asc), and report its corpus-wide copy count. Output one
    row per surviving paragraph: (doc_id, para_idx, para, n_copies).

    Scale shape: one explode inside map_batches (doc -> paragraph rows
    with an md5 content key) and ONE groupby(md5) shuffle in which each
    paragraph's text travels exactly once — the same order of bytes the
    corpus itself occupies, unavoidable because the survivor's text is
    the output. Keying on the 128-bit digest (not the string) keeps
    the hash-partition key fixed-width; both engines key on the SAME
    digest, so semantics agree even under (cosmically unlikely)
    collisions."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_idx, o_para, o_h = [], [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            for j, p in enumerate(t.split("\n")):
                o_id.append(i)
                o_idx.append(j)
                o_para.append(p)
                o_h.append(hashlib.md5(p.encode("utf-8")).hexdigest())
        return pa.table({
            "h": pa.array(o_h, type=pa.string()),
            id_col: pa.array(o_id, type=pa.int64()),
            "para_idx": pa.array(o_idx, type=pa.int64()),
            "para": pa.array(o_para, type=pa.string()),
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "para_idx"])
        out = g.head(1)[[id_col, "para_idx", "para"]].copy()
        out["n_copies"] = np.int64(len(g))
        return out

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
        .select_columns([id_col, "para_idx", "para", "n_copies"])
    )


def _edit_distance_le1(a: str, b: str) -> bool:
    """Exact 'Levenshtein(a, b) <= 1' check in O(len) with early exit
    (never builds the DP table — distance-1 verification only needs
    the first mismatch position)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        # 0 or 1 substitutions
        diff = 0
        for ca, cb in zip(a, b):
            if ca != cb:
                diff += 1
                if diff > 1:
                    return False
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: one insertion — skip the first mismatch in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_pairs(ds, *, col: str = "c_name",
                max_bucket: int = 10_000,
                num_parts: int | None = None):
    """All distinct value pairs within Levenshtein distance 1, found
    with the SymSpell deletion-neighborhood index (Garbe's symmetric
    delete trick): every value emits itself plus each single-character
    deletion as candidate keys; two values at distance exactly 1 are
    GUARANTEED to share a key (substitution -> the delete at the
    differing position; insertion/deletion -> the shorter string is
    itself a delete of the longer), so co-locating keys finds every
    true pair with O(rows x len) candidate keys instead of the
    O(rows^2) cross join the SQL twin runs. Shared keys can also join
    distance-2 strings (e.g. 'ab'/'ba' share 'a'), so candidates are
    verified with an exact distance check. -> (name_a, name_b),
    name_a < name_b.

    Scale shape: TWO hash-partition shuffles, each processed by P
    partition TASKS (the related_pages idiom — a first draft ran one
    map_groups call per key / per pair and drowned in per-group
    overhead): (1) exploded keys partition by hash(key); each task
    sorts once, run-detects key buckets (``max_bucket`` caps
    adversarial keys), generates pairs vectorized and dedups them
    in-partition; (2) pairs partition by hash(name_a) — every copy of
    a pair lands together, so in-partition drop_duplicates IS the
    global dedup — and the exact verify runs vectorized over the
    partition's surviving pairs."""
    import pandas as pd

    from rse_ray.pipelines.linkgraph import _pr_url_hash
    from rse_ray.util import parts_for, plan_rows

    P = num_parts if num_parts is not None else \
        parts_for(plan_rows(ds), rows_per_part=100_000)

    def explode(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        keys, names = [], []
        for v in vals:
            if v is None:
                continue
            keys.append(v)
            names.append(v)
            for i in range(len(v)):
                keys.append(v[:i] + v[i + 1:])
                names.append(v)
        part = (_pr_url_hash(np.array(keys, dtype=object)) % P) \
            .astype(np.int64) if keys else np.empty(0, dtype=np.int64)
        return pa.table({"key": pa.array(keys, type=pa.string()),
                         "name": pa.array(names, type=pa.string()),
                         "part": pa.array(part)})

    _triu_cache: dict = {}

    def gen_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["key", "name"]) \
            .sort_values(["key", "name"])
        names = df["name"].to_numpy()
        _, starts, counts = np.unique(df["key"].to_numpy(),
                                      return_index=True,
                                      return_counts=True)
        a_p, b_p = [], []
        for s0, c in zip(starts, counts):
            if c < 2:
                continue
            c = min(c, max_bucket)
            if c not in _triu_cache:
                _triu_cache[c] = np.triu_indices(c, k=1)
            iu, ju = _triu_cache[c]
            sl = names[s0:s0 + c]
            a_p.append(sl[iu])
            b_p.append(sl[ju])
        if not a_p:
            return pd.DataFrame({"name_a": pd.Series([], dtype=str),
                                 "name_b": pd.Series([], dtype=str)})
        return pd.DataFrame({"name_a": np.concatenate(a_p),
                             "name_b": np.concatenate(b_p)}) \
            .drop_duplicates()

    def repart(batch: pa.Table) -> pa.Table:
        if "name_a" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"name_a": pa.array([], type=pa.string()),
                             "name_b": pa.array([], type=pa.string()),
                             "part": pa.array([], type=pa.int64())})
        part = (_pr_url_hash(batch.column("name_a")
                             .to_numpy(zero_copy_only=False)) % P) \
            .astype(np.int64)
        return batch.append_column("part", pa.array(part))

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["name_a", "name_b"])
        keep = [_edit_distance_le1(x, y)
                for x, y in zip(df["name_a"], df["name_b"])]
        return df.loc[keep, ["name_a", "name_b"]]

    return ds.select_columns([col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("part").map_groups(gen_part, batch_format="pandas") \
        .map_batches(repart, batch_format="pyarrow") \
        .groupby("part").map_groups(verify_part,
                                    batch_format="pandas")


def dup_graph_stats(ds=None, *, pairs: pd.DataFrame | None = None,
                    threshold: float = 0.8, num_perm=128,
                    num_bands=16, shingle_n=3,
                    concurrency: int = 4) -> pd.DataFrame:
    """One-row health report of the verified near-duplicate graph —
    the corpus-curation dashboard number set: how many docs sit in
    >=1 duplicate cluster, how many clusters there are, the largest
    cluster, and the deduplication yield (docs removable = members -
    clusters). -> (n_dup_docs, n_clusters, max_cluster, removable).

    Scale shape: everything expensive is the distributed MinHash
    pipeline; the stats collapse the (doc, cluster) table — already
    O(dup docs), not O(corpus) — with one pandas groupby
    driver-side."""
    cl = dup_clusters(ds, pairs=pairs, threshold=threshold,
                      num_perm=num_perm, num_bands=num_bands,
                      shingle_n=shingle_n, concurrency=concurrency)
    if cl.empty:
        return pd.DataFrame({
            "n_dup_docs": pd.Series([0], dtype=np.int64),
            "n_clusters": pd.Series([0], dtype=np.int64),
            "max_cluster": pd.Series([0], dtype=np.int64),
            "removable": pd.Series([0], dtype=np.int64)})
    sizes = cl.groupby("cluster_id").size()
    return pd.DataFrame({
        "n_dup_docs": pd.Series([len(cl)], dtype=np.int64),
        "n_clusters": pd.Series([len(sizes)], dtype=np.int64),
        "max_cluster": pd.Series([int(sizes.max())],
                                 dtype=np.int64),
        "removable": pd.Series([len(cl) - len(sizes)],
                               dtype=np.int64)})
