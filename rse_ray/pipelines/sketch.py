"""Mergeable-sketch operators — the cardinality / frequency paths that
replace full all-to-all shuffles at 10^12-row scale.

HyperLogLog (approx distinct): per-batch register partials (4 KiB each)
merged by elementwise max — the driver sees O(batches) sketches, never
values. The hash is the repo's md5 twin (upper-half little-endian
uint64 of md5, DuckDB `md5_number_lower`), so the WHOLE estimator —
bucket index, trailing-zero rank, bias/linear-counting corrections —
is reproducible in SQL and the estimate is DuckDB-oracle-exact, not
just "close".

Misra-Gries heavy hitters: per-batch bounded summaries (<= k entries)
give a candidate superset (classic guarantee: any item with true count
> N/k survives); a second exact counting pass over the broadcast
candidate set makes the OUTPUT exact (count >= threshold), the same
candidates-then-verify shape as the MinHash dedup family. The full
vocabulary is never shuffled or collected.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12                      # 4096 registers
HLL_M = 1 << HLL_P
# bias constant for m >= 128 (Flajolet et al. 2007)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _md5_u64(vals) -> np.ndarray:
    """The repo's deterministic string hash (train_val_split /
    epoch_shuffle convention): upper-half little-endian uint64 of
    md5(str(v)) == DuckDB md5_number_lower(CAST(v AS VARCHAR))."""
    return np.fromiter(
        (struct.unpack(
            "<Q", hashlib.md5(str(v).encode("utf-8")).digest()[8:])[0]
         for v in vals),
        dtype=np.uint64, count=len(vals))


def _hll_registers(h: np.ndarray) -> np.ndarray:
    """h -> dense uint8 register array: bucket = top P bits, rank =
    (#trailing zeros of the low 64-P bits) + 1. Trailing zeros (the
    original Flajolet-Martin rho) instead of leading zeros because
    log2(x & -x) is EXACT in doubles — the SQL twin computes the same
    rank without bit-intrinsic functions."""
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    low = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rank = np.full(len(low), 64 - HLL_P + 1, dtype=np.int64)
    nz = low != 0
    lowbit = low[nz] & (~low[nz] + np.uint64(1))  # x & -x
    rank[nz] = np.log2(lowbit.astype(np.float64)).astype(np.int64) + 1
    reg = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(reg, idx, rank.astype(np.uint8))
    return reg


def _hll_estimate(reg: np.ndarray) -> float:
    zeros = int((reg == 0).sum())
    e = HLL_ALPHA * HLL_M * HLL_M / float(
        np.sum(np.power(2.0, -reg.astype(np.float64))))
    if e <= 2.5 * HLL_M and zeros:
        e = HLL_M * np.log(HLL_M / zeros)       # linear counting
    return float(e)


def approx_ndistinct(ds, *, col: str):
    """HyperLogLog distinct-count of ``col``: one row
    (est_ndistinct DOUBLE, rounded 6dp). Per-batch 4 KiB register
    partials; the driver folds them with elementwise max — mergeable,
    order-independent, identical on any partitioning."""

    def partial(batch: pa.Table) -> pa.Table:
        reg = _hll_registers(_md5_u64(batch.column(col).to_pylist()))
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    reg = np.zeros(HLL_M, dtype=np.uint8)
    for b in parts["reg"]:
        reg = np.maximum(reg, np.frombuffer(b, dtype=np.uint8))
    return pd.DataFrame({"est_ndistinct": [round(_hll_estimate(reg), 6)]})


def hll_oracle_sql(col_expr: str, table: str) -> str:
    """The exact SQL twin of approx_ndistinct (same hash, same rank,
    same corrections) — generated so the constants can't drift from
    the Python estimator."""
    w = 64 - HLL_P
    # lowest set bit as x - (x & (x-1)) — UBIGINT-safe (no ~ / negate)
    return f"""
WITH h AS (SELECT md5_number_lower(CAST({col_expr} AS VARCHAR))::UBIGINT
               AS hv FROM {table}),
lo AS (SELECT hv >> {w} AS idx, hv & {(1 << w) - 1} AS x FROM h),
r AS (SELECT idx,
             CASE WHEN x = 0 THEN {w + 1}
                  ELSE (log2((x - (x & (x - 1)))::DOUBLE))::INT + 1
             END AS rank
      FROM lo),
m AS (SELECT idx, max(rank) AS mr FROM r GROUP BY idx),
s AS (SELECT count(*)::BIGINT AS nidx,
             sum(power(2.0, -mr))::DOUBLE AS ssum FROM m),
raw AS (SELECT nidx,
        CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M}e0 * {HLL_M}e0
            / (ssum + ({HLL_M} - nidx)) AS e0 FROM s),
est AS (SELECT CASE
    WHEN e0 <= 2.5e0 * {HLL_M} AND nidx < {HLL_M}
    THEN {HLL_M}e0 * ln({HLL_M}e0 / ({HLL_M} - nidx))
    ELSE e0 END AS e FROM raw)
SELECT round(e, 6) AS est_ndistinct FROM est"""


def heavy_hitters(ds, *, text_col: str = "text", min_count: int,
                  capacity: int = 4096, stem: bool = False):
    """Terms with global count >= min_count, EXACT, without ever
    shuffling the vocabulary: per-batch Misra-Gries summaries (bounded
    at ``capacity`` entries) yield a candidate superset — the MG
    guarantee keeps every term whose batch count exceeds
    batch_tokens/capacity, so with min_count >= N/capacity no true
    hitter is lost — then a broadcast exact-count pass verifies.
    Output: (term, n) with true counts, sorted (n DESC, term ASC)."""
    import ray

    from rse_ray.pipelines.text import _tok

    # per-batch Misra-Gries summary WITH residual counts: after the
    # decrement, resid(t) >= count_b(t) - tokens_b/capacity. Summed
    # over batches, resid_sum(t) >= count(t) - N/capacity — so any
    # term with count >= min_count has resid_sum >= min_count -
    # N/capacity, and filtering the merged summary at that bound is a
    # guaranteed superset (union-of-term-SETS alone is NOT: a hitter
    # spread thinly can be decremented away in every batch). The ""
    # row carries tokens_b (real tokens are never empty), giving N
    # from the same pass.
    def mg_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        total = 0
        for t in batch.column(text_col).to_pylist():
            toks = _tok(t, stem)
            total += len(toks)
            c.update(toks)
        if len(c) > capacity:
            kth = sorted(c.values(), reverse=True)[capacity]
            c = Counter({t: n - kth for t, n in c.items() if n > kth})
        terms = sorted(c)
        return pa.table({
            "term": pa.array([""] + terms, type=pa.string()),
            "r_p": pa.array([total] + [c[t] for t in terms],
                            type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    summary = ds.map_batches(mg_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("r_p", alias_name="resid")) \
        .to_pandas()
    n_tokens = int(summary.loc[summary["term"] == "", "resid"].iloc[0])
    bound = max(1, min_count - n_tokens // capacity)
    cands = frozenset(
        summary.loc[(summary["term"] != "")
                    & (summary["resid"] >= bound), "term"])
    cand_ref = ray.put(cands)

    def exact_count(batch: pa.Table) -> pa.Table:
        from collections import Counter
        keep = ray.get(cand_ref)
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(w for w in _tok(t, stem) if w in keep)
        terms = sorted(c)
        return pa.table({"term": pa.array(terms, type=pa.string()),
                         "c_p": pa.array([c[t] for t in terms],
                                         type=pa.int64())})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(exact_count, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c_p", alias_name="n")) \
        .to_pandas()
    out = agg[agg["n"] >= min_count] \
        .sort_values(["n", "term"], ascending=[False, True]) \
        .reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


def approx_ndistinct_by(ds, *, group: str, col: str):
    """Per-group HyperLogLog distinct-count: one row per ``group``
    value (group, est_ndistinct DOUBLE rounded 6dp) — COUNT(DISTINCT
    col) GROUP BY group without ever shuffling the values.

    Scale shape: each batch emits one 4 KiB register sketch PER GROUP
    PRESENT IN THE BATCH (bounded by |groups| x |batches|); the only
    all-to-all is a groupby over those sketches, folded per group by
    elementwise max in ``map_groups``. Mergeable and
    partitioning-independent, so the estimate — like the global
    ``approx_ndistinct`` — is byte-identical on any cluster size and
    exactly reproducible by the SQL twin ``hll_group_oracle_sql``."""

    def partial(batch: pa.Table) -> pa.Table:
        gv = batch.column(group).to_numpy(zero_copy_only=False)
        if pd.isna(gv).any():
            # NaN != NaN would silently select empty hash sets; SQL
            # groups NULLs — refuse divergence, like group_rank_funcs
            raise ValueError(
                f"approx_ndistinct_by: null values in group column "
                f"{group!r}; filter or impute them first")
        h = _md5_u64(batch.column(col).to_pylist())
        groups, regs = [], []
        for g in pd.unique(gv):
            groups.append(g)
            regs.append(_hll_registers(h[gv == g]).tobytes())
        return pa.table({group: pa.array(groups),
                         "reg": pa.array(regs, type=pa.binary())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["reg"]:
            reg = np.maximum(reg, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame({
            group: [g[group].iloc[0]],
            "est_ndistinct": [round(_hll_estimate(reg), 6)]})

    return ds.select_columns([group, col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group).map_groups(fold, batch_format="pandas")


def hll_group_oracle_sql(group_expr: str, col_expr: str,
                         table: str) -> str:
    """Exact SQL twin of approx_ndistinct_by — the global oracle's
    pipeline with every stage keyed by the group column."""
    w = 64 - HLL_P
    return f"""
WITH h AS (SELECT {group_expr} AS grp,
                  md5_number_lower(CAST({col_expr} AS VARCHAR))::UBIGINT
                      AS hv FROM {table}),
lo AS (SELECT grp, hv >> {w} AS idx, hv & {(1 << w) - 1} AS x FROM h),
r AS (SELECT grp, idx,
             CASE WHEN x = 0 THEN {w + 1}
                  ELSE (log2((x - (x & (x - 1)))::DOUBLE))::INT + 1
             END AS rank
      FROM lo),
m AS (SELECT grp, idx, max(rank) AS mr FROM r GROUP BY grp, idx),
s AS (SELECT grp, count(*)::BIGINT AS nidx,
             sum(power(2.0, -mr))::DOUBLE AS ssum FROM m GROUP BY grp),
raw AS (SELECT grp, nidx,
        CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M}e0 * {HLL_M}e0
            / (ssum + ({HLL_M} - nidx)) AS e0 FROM s),
est AS (SELECT grp, CASE
    WHEN e0 <= 2.5e0 * {HLL_M} AND nidx < {HLL_M}
    THEN {HLL_M}e0 * ln({HLL_M}e0 / ({HLL_M} - nidx))
    ELSE e0 END AS e FROM raw)
SELECT grp AS {group_expr}, round(e, 6) AS est_ndistinct FROM est"""


# --------------------------------------------------------------------------
# Count-Min sketch (bounded-memory frequency estimation)
# --------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 16


def _cms_bucket(terms, d: int) -> np.ndarray:
    """Row-d bucket per term: md5_number_lower(d || ':' || term) %
    CMS_WIDTH — the same cross-engine hash convention as HLL, so the
    twin recomputes the identical sketch in SQL."""
    return (_md5_u64([f"{d}:{t}" for t in terms])
            % np.uint64(CMS_WIDTH)).astype(np.int64)


def cms_term_counts(ds, probes: list[str], *, stem: bool = False):
    """Count-Min frequency estimation over the corpus term stream
    (Cormode & Muthukrishnan 2005): per batch, count terms locally and
    scatter-add into a CMS_DEPTH x CMS_WIDTH counter grid; the shuffle
    then merges sketches as (slot, cnt) rows — counter sums commute,
    so the merged sketch is independent of batch/merge order and the
    result is EXACTLY reproducible (estimate = min over rows of the
    probe's slot), not a tolerance band. The driver folds 256 slot
    rows + one exact-count row per probe; the vocabulary itself is
    never collected. Width 16 is deliberately small so collisions are
    real against the fixture's ~31-term vocabulary and the (always >=)
    overestimate is genuinely exercised.
    -> (term, exact_n, cms_n) for each probe term present or not."""
    from collections import Counter

    from rse_ray.functions.tokenizer import tokenize

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        c: Counter = Counter()
        for t in texts:
            if t is not None:
                c.update(tokenize(t, stem=stem))
        terms = list(c.keys())
        cnts = np.fromiter(c.values(), dtype=np.int64, count=len(terms))
        slots, vals = [], []
        for d in range(CMS_DEPTH):
            grid = np.zeros(CMS_WIDTH, dtype=np.int64)
            np.add.at(grid, _cms_bucket(terms, d), cnts)
            nz = np.flatnonzero(grid)
            slots.append(nz + d * CMS_WIDTH)
            vals.append(grid[nz])
        # exact counts for probe terms ride along as negative slots
        # (-1-i for probe i), so ONE shuffle carries both
        pc_ = np.array([c.get(p, 0) for p in probes], dtype=np.int64)
        slots.append(-1 - np.arange(len(probes), dtype=np.int64))
        vals.append(pc_)
        return pa.table({
            "slot": pa.array(np.concatenate(slots), type=pa.int64()),
            "cnt": pa.array(np.concatenate(vals), type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("slot").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    grid = np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)
    exact = np.zeros(len(probes), dtype=np.int64)
    for r in merged.itertuples():
        if r.slot >= 0:
            grid[r.slot] = r.cnt
        else:
            exact[-1 - r.slot] = r.cnt
    est = np.empty(len(probes), dtype=np.int64)
    for i, p in enumerate(probes):
        est[i] = min(grid[d * CMS_WIDTH + int(_cms_bucket([p], d)[0])]
                     for d in range(CMS_DEPTH))
    return pd.DataFrame({
        "term": pd.array(probes, dtype="object"),
        "exact_n": pd.array(exact, dtype="int64"),
        "cms_n": pd.array(est, dtype="int64"),
    })


def hll_sliding(events_ds, *, window_hours: int = 3,
                ts_col: str = "ts", col: str = "user_id"):
    """Sliding-window approximate distinct count — the mergeability
    payoff of the HLL sketch: per-HOUR register sketches are built
    ONCE from the stream, then every ``window_hours``-wide hopping
    window (hop = 1h) folds its member hours' registers by
    elementwise max — no window ever re-reads or re-hashes the rows,
    which is how a streaming distinct-users dashboard stays O(hours x
    4 KiB) at any event rate. -> (window_start, est_ndistinct), the
    estimate byte-identical to hashing the window's rows directly
    (register max over a union IS the union's registers).

    Scale shape: per-batch per-hour partials (bounded by hours x
    batches sketches), one groupby(hour) fold, then each hour's 4 KiB
    register row replicates into <= window_hours windows (a tiny
    flat_map) and one groupby(window) fold; estimates are
    partitioning-independent."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy()
        hours = ts.astype("datetime64[h]")
        h = _md5_u64(batch.column(col).to_pylist())
        out_h, out_r = [], []
        for hr in np.unique(hours):
            out_h.append(hr.astype("datetime64[us]"))
            out_r.append(_hll_registers(h[hours == hr]).tobytes())
        return pa.table({
            "hour": pa.array(out_h, type=pa.timestamp("us")),
            "reg": pa.array(out_r, type=pa.binary())})

    def fold_hour(g: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["reg"]:
            reg = np.maximum(reg, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame({"hour": [g["hour"].iloc[0]],
                             "reg": [reg.tobytes()]})

    hours = events_ds.select_columns([ts_col, col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("hour").map_groups(fold_hour,
                                    batch_format="pandas")

    def explode(batch: pa.Table) -> pa.Table:
        hs = batch.column("hour").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        regs = batch.column("reg").to_pylist()
        out_w, out_r = [], []
        for h0, r in zip(hs, regs):
            for k in range(window_hours):
                out_w.append(h0 - np.timedelta64(k, "h"))
                out_r.append(r)
        return pa.table({
            "window_start": pa.array(
                np.array(out_w, dtype="datetime64[us]")),
            "reg": pa.array(out_r, type=pa.binary())})

    def fold_window(g: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["reg"]:
            reg = np.maximum(reg, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame({
            "window_start": [g["window_start"].iloc[0]],
            "est_ndistinct": [round(_hll_estimate(reg), 6)]})

    return hours.map_batches(explode, batch_format="pyarrow") \
        .groupby("window_start").map_groups(fold_window,
                                            batch_format="pandas")
