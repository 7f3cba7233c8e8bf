"""Small shared runtime helpers."""

from __future__ import annotations


def parts_for(n_rows: int, *, rows_per_part: int = 50_000,
              min_parts: int = 32, max_parts: int = 8192,
              pow2: bool = True) -> int:
    """Shuffle fan-out derived from INPUT SIZE, shared by the dedup/ANN
    pipelines (round-2 VERDICT: fixed 32-part defaults funnel an sf100
    shuffle into 32 reduce slots while the index build already derives
    its bucket count from rows). ~``rows_per_part`` rows per reduce
    slot, clamped to [min_parts, max_parts]; rounded up to a power of
    two by default because several callers mask hashes with
    ``& (parts - 1)``. Deterministic in the input, never CPU-derived —
    the same dataset shuffles the same way on any cluster size."""
    want = max(min_parts, min(max_parts, -(-int(n_rows) // rows_per_part)))
    if pow2:
        want = 1 << (want - 1).bit_length()
    return min(want, max_parts)


def plan_rows(ds, n_rows: int | None = None) -> int:
    """Row count for SHUFFLE PLANNING (``parts_for`` inputs) without
    executing a lazily-transformed pipeline twice (round-3 VERDICT:
    ``num_parts=None -> parts_for(ds.count())`` re-ran the whole
    upstream map once for the count and again for the real consume).

    Resolution order: an explicit ``n_rows`` wins; then Ray's plan
    metadata count (free for reads / from_pandas / materialized
    datasets); then the source parquet FOOTERS via ``input_files()``
    (an upper bound when upstream filters drop rows — fine, fan-out
    only needs the order of magnitude and parts_for clamps); only if
    all of those fail does it fall back to ``ds.count()``, which
    executes. Callers chaining expensive upstream maps over non-file
    sources should thread ``n_rows``."""
    if n_rows is not None:
        return int(n_rows)
    try:
        c = ds._meta_count()
    except Exception:  # internal API; any change degrades gracefully
        c = None
    if c is not None:
        return int(c)
    total = _read_leaf_rows(ds)
    if total is not None:
        return total
    return ds.count()


def _read_leaf_rows(ds) -> int | None:
    """Sum the prefetched parquet-footer row counts of every Read leaf
    in the dataset's logical plan (Ray's ParquetDatasource caches
    fragment metadata at read_parquet() time, so this is zero-I/O).
    Returns None when any leaf is not a metadata-bearing parquet read
    — the caller then decides whether counting is worth an execution.

    All-to-all operators (groupby/aggregate/sort/repartition) CHANGE
    the row count in ways footers can't bound usefully (an aggregate
    collapses the input by its group fan-in), so the walk stops and
    returns None when it meets one — plan_rows then falls back to
    count(), keeping its contract of a filter-only upper bound
    (round-4 ADVICE)."""
    try:
        stack, total = [ds._logical_plan.dag], 0
        while stack:
            op = stack.pop()
            kind = type(op).__name__
            if "AllToAll" in kind or kind in (
                    "Aggregate", "Sort", "RandomShuffle", "Repartition"):
                return None
            for klass in type(op).__mro__:
                if "AbstractAllToAll" in klass.__name__:
                    return None
            deps = op.input_dependencies
            if deps:
                stack.extend(deps)
                continue
            metas = getattr(getattr(op, "_datasource", None),
                            "_metadata", None)
            if not metas:
                return None
            for m in metas:
                nr = getattr(m, "num_rows", None)
                if nr is None:
                    return None
                total += int(nr)
        return total
    except Exception:
        return None


def distinct_ints(ds, cols, *, dtype="int64"):
    """Distinct values across integer column(s) WITHOUT
    Dataset.unique(): Ray's Unique aggregate merge intermittently dies
    combining scalar and ndarray accumulators (`unhashable type:
    numpy.ndarray` — observed ~20% of runs at small block counts).
    Per-batch np.unique runs distributed; only the per-batch-deduped
    int set reaches the driver, where one final np.unique merges
    batches — the driver payload is identical to Dataset.unique().
    Returns a sorted np.ndarray of ``dtype``."""
    import numpy as np
    import pyarrow as pa

    np_dtype = np.dtype(dtype)
    pa_type = pa.from_numpy_dtype(np_dtype)

    def per_batch(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate(
            [b.column(c).to_numpy().astype(np_dtype) for c in cols]))
        return pa.table({"v": pa.array(u, type=pa_type)})

    got = ds.select_columns(list(cols)).map_batches(
        per_batch, batch_format="pyarrow"
    ).to_pandas()
    if got.empty:
        return np.empty(0, dtype=np_dtype)
    return np.unique(got["v"].to_numpy().astype(np_dtype))


def clamp_pool(requested: int | None, *, reserve: int = 1, floor: int = 1) -> int:
    """Clamp an actor-pool size so at least ``reserve`` CPUs stay free
    for downstream task-pool / all-to-all operators.

    An actor pool sized to every CPU in the cluster deadlocks any
    pipeline with a shuffle after it: Ray Data keeps pool actors alive
    for the whole dataset execution, so the sort/aggregate tasks behind
    the pool can never be scheduled. Always leave headroom.
    """
    import ray

    if ray.is_initialized():
        total = int(ray.cluster_resources().get("CPU", 4))
    else:
        total = 4
    cap = max(floor, total - reserve)
    if requested is None:
        return cap
    return max(floor, min(int(requested), cap))
