"""Relational operators over the TPC-H-ish tables, mapping the
reference's SQL surface (SURVEY §2.4/§2.5/§2.6) onto Ray Data:

  J1 broadcast semi-join   -> semi_join_customers_with_orders
  J2 hash join (dim side)  -> orders_by_segment (broadcast customer)
  A2 group-count           -> window_agg / orders_by_segment
  A3/A1 grouped aggregates -> pricing_summary (TPC-H Q1 shape)
  O1 sort + top-k          -> top_orders
  A5 DISTINCT              -> distinct_lang_source
  M8-style predicate scan  -> revenue_filter (TPC-H Q6 shape; filter
                              pushdown at the parquet read)
  §2.9 streaming windows   -> window_agg (tumbling event-time windows)
  scalar JSON extraction   -> json_props_sum

Float aggregates are rounded (2dp for money sums) because distributed
summation order differs from any serial oracle — the rounding IS part
of the declared result contract.
"""

from __future__ import annotations

import math
import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc




def _arrow_types(schema) -> dict:
    """Ray Schema -> {name: pa.DataType}. Arrow-backed datasets carry a
    pa.Schema in base_schema; pandas-backed ones (from_pandas) carry a
    PandasBlockSchema whose dtypes include extension types (Int64Dtype
    etc. — Ray's own Schema.types maps those to None, so go to the
    base). Extension dtypes resolve via their numpy_dtype; object
    columns carry strings in this codebase."""
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    types = base.types if base is not None else schema.types
    out = {}
    for name, t in zip(schema.names, types):
        if isinstance(t, pa.DataType):
            out[name] = t
        elif t is str:
            out[name] = pa.string()
        elif t is bytes:
            out[name] = pa.binary()
        else:
            nd = getattr(t, "numpy_dtype", None)  # pandas extension
            dt = nd if nd is not None else np.dtype(t)
            out[name] = pa.string() if dt == np.dtype("O") \
                else pa.from_numpy_dtype(dt)
    return out


def _mod_parts(col, P: int) -> pa.Array:
    """``key % P`` as int32 for partition routing; NULL keys route to
    part -1 (the callers either drop that part — inner join — or pass
    it through unmatched — as-of left join)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = col.is_valid().to_numpy(zero_copy_only=False)
    keys = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
    part = (keys.astype(np.int64) % P).astype(np.int32)
    part[~valid] = -1
    return pa.array(part)


def _round_np(col, nd: int) -> pa.Array:
    """Round a float column with NUMPY semantics (finish stages only —
    tables are already tiny). pc.round lands 1 ULP away from np.round
    for many .xx5-adjacent doubles, and the result contract hashes
    exact float bits."""
    return pa.array(np.round(col.to_numpy(), nd), type=pa.float64())


def pricing_summary(lineitem_ds, *, cutoff: str = "1998-09-01"):
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus): sum_qty,
    sum_base_price, sum_disc_price, count_order, avg_qty.
    Partial-aggregated inside each batch; the shuffle moves a handful of
    rows per batch."""
    from ray.data.aggregate import Sum

    cutoff_ts = np.datetime64(cutoff, "us")

    def partial(batch: pa.Table) -> pa.Table:
        # zero-copy Arrow throughout (round-2 VERDICT: the pandas
        # round-trip copied every batch for nothing)
        t = batch.filter(pc.less(batch.column("l_shipdate"),
                                 pa.scalar(cutoff_ts)))
        # disc_price in EXACT 10^-4 units (2-dp price x 2-dp discount):
        # int64 partials make the sum order-free, so the group totals
        # cannot land a half-cent off the serial oracle (the Q9
        # integer-cents contract; a float-summed version differed at
        # sf0.001 on a group hitting an exact half-cent boundary)
        ext = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        disc_price = pa.array(
            np.round(ext * (1.0 - disc) * 10_000.0).astype(np.int64))
        base_cents = pa.array(np.round(ext * 100.0).astype(np.int64))
        t = t.append_column("disc_price", disc_price) \
            .append_column("base_cents", base_cents)
        g = t.group_by(
            ["l_returnflag", "l_linestatus"]
        ).aggregate([("l_quantity", "sum"), ("base_cents", "sum"),
                     ("disc_price", "sum"), ([], "count_all")])
        # count_all = count(*) (rows, not non-null values) to match the
        # SQL contract when an aggregated column carries nulls
        return pa.table(
            {"l_returnflag": g.column("l_returnflag"),
             "l_linestatus": g.column("l_linestatus"),
             "qty_p": g.column("l_quantity_sum"),
             "base_p": g.column("base_cents_sum"),
             "disc_p": g.column("disc_price_sum"),
             "cnt_p": g.column("count_all")}
        )

    agg = lineitem_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("qty_p", alias_name="sum_qty"),
        Sum("base_p", alias_name="sum_base_price"),
        Sum("disc_p", alias_name="sum_disc_price"),
        Sum("cnt_p", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"l_returnflag": batch.column("l_returnflag"),
             "l_linestatus": batch.column("l_linestatus"),
             "sum_qty": _round_np(batch.column("sum_qty"), 2),
             "sum_base_price": pa.array(
                 batch.column("sum_base_price").to_numpy()
                 .astype(np.int64) / 100.0),
             "sum_disc_price": pa.array(
                 (batch.column("sum_disc_price").to_numpy()
                  .astype(np.int64) + 50) // 100 / 100.0),
             "count_order": pc.cast(batch.column("count_order"), pa.int64()),
             "avg_qty": pa.array(np.round(
                 batch.column("sum_qty").to_numpy()
                 / batch.column("count_order").to_numpy(), 6))}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_orders(orders_ds, k: int = 10):
    """O1: global sort desc + limit; tie-break ascending key. Exact
    values (no float arithmetic)."""
    return orders_ds.select_columns(
        ["o_orderkey", "o_totalprice"]
    ).sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def revenue_filter(lineitem_ds, *, date_lo="1994-01-01", date_hi="1995-01-01",
                   disc_lo=0.05, disc_hi=0.07, qty_hi=24.0) -> pd.DataFrame:
    """TPC-H Q6 shape: one scalar. The predicate is applied vectorized
    per batch (and the read should push columns only)."""

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate")
        disc = batch.column("l_discount")
        qty = batch.column("l_quantity")
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(np.datetime64(date_lo, "us"))),
                pc.less(ship, pa.scalar(np.datetime64(date_hi, "us"))),
            ),
            pc.and_(
                pc.and_(pc.greater_equal(disc, disc_lo), pc.less_equal(disc, disc_hi)),
                pc.less(qty, qty_hi),
            ),
        )
        t = batch.filter(mask)
        rev = pc.sum(
            pc.multiply(t.column("l_extendedprice"), t.column("l_discount"))
        ).as_py() or 0.0
        return pa.table({"rev_p": pa.array([rev], type=pa.float64())})

    total = lineitem_ds.map_batches(partial, batch_format="pyarrow").sum("rev_p")
    return pd.DataFrame({"revenue": [round(float(total), 2)]})


def semi_join_customers_with_orders(customer_ds, orders_ds,
                                    *, min_total: float = 400.0):
    """J1 shape: customers having >=1 order above min_total. The order
    key set is collected small and broadcast (ray.put) into a vectorized
    isin filter — a broadcast semi-join, no shuffle."""
    import ray

    keys_ds = orders_ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), min_total))
                   .select(["o_custkey"]),
        batch_format="pyarrow",
    )
    keys = set()
    for b in keys_ds.iter_batches(batch_format="pyarrow"):
        keys.update(b.column("o_custkey").to_pylist())
    keys_ref = ray.put(np.array(sorted(keys), dtype=np.int64))

    def filt(batch: pa.Table) -> pa.Table:
        karr = ray.get(keys_ref)
        mask = np.isin(batch.column("c_custkey").to_numpy(), karr)
        return batch.filter(pa.array(mask)).select(["c_custkey", "c_name"])

    return customer_ds.map_batches(filt, batch_format="pyarrow")


def orders_by_segment(orders_ds, customer_ds):
    """J2/A2 shape: orders joined to the customer dimension (broadcast —
    the dim side is small by design) -> per-mktsegment order count and
    total price."""
    import ray
    from ray.data.aggregate import Sum

    cust = customer_ds.select_columns(
        ["c_custkey", "c_mktsegment"]
    ).to_arrow_refs()
    cust_tbl = pa.concat_tables(ray.get(cust))
    # broadcast as (sorted keys, segment array): the per-batch lookup is
    # then one vectorized searchsorted + take, no python dict. The dim
    # side is small, so sort it here (numpy argsort) instead of paying a
    # Ray all-to-all sort stage for it.
    keys_np = cust_tbl.column("c_custkey").to_numpy()
    order = np.argsort(keys_np, kind="stable")
    lookup_ref = ray.put((
        keys_np[order],
        cust_tbl.column("c_mktsegment").combine_chunks().take(
            pa.array(order, type=pa.int64())),
    ))

    def partial(batch: pa.Table) -> pa.Table:
        keys, segs = ray.get(lookup_ref)
        fk = batch.column("o_custkey").to_numpy()
        if len(keys) == 0:
            return pa.table({"c_mktsegment": pa.array([], type=pa.string()),
                             "n_p": pa.array([], type=pa.int64()),
                             "tot_p": pa.array([], type=pa.float64())})
        idx = np.searchsorted(keys, fk)
        # inner-join semantics: an o_custkey absent from the dim table is
        # DROPPED, not misattributed to the next-larger key (and idx ==
        # len(keys) would make take() raise)
        idx_c = np.minimum(idx, len(keys) - 1)
        hit = keys[idx_c] == fk
        if not hit.all():
            batch = batch.filter(pa.array(hit))
            idx_c = idx_c[hit]
        g = pa.table(
            {"c_mktsegment": segs.take(pa.array(idx_c, type=pa.int64())),
             "o_totalprice": batch.column("o_totalprice")}
        ).group_by("c_mktsegment").aggregate(
            [([], "count_all"), ("o_totalprice", "sum")]
        )
        return pa.table(
            {"c_mktsegment": g.column("c_mktsegment"),
             "n_p": g.column("count_all"),
             "tot_p": g.column("o_totalprice_sum")}
        )

    agg = orders_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "c_mktsegment"
    ).aggregate(Sum("n_p", alias_name="n_orders"),
                Sum("tot_p", alias_name="total_price"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"c_mktsegment": batch.column("c_mktsegment"),
             "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
             "total_price": _round_np(batch.column("total_price"), 2)}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_WINDOW_UNIT_US = {"hour": 3_600_000_000, "day": 86_400_000_000,
                   "minute": 60_000_000, "second": 1_000_000}


def _parse_window(window: str) -> tuple[int, str, int]:
    """'15min' / 'H' / '2d' -> (multiple, arrow unit name, microseconds)."""
    import re

    m = re.fullmatch(r"(\d*)\s*(h|hour|d|day|t|min|minute|s|sec|second)",
                     window.strip(), re.IGNORECASE)
    if not m:
        raise ValueError(f"unsupported window spec {window!r}; use e.g. "
                         "'h', 'd', '15min', '30s'")
    multiple = int(m.group(1) or 1)
    unit = {"h": "hour", "hour": "hour", "d": "day", "day": "day",
            "t": "minute", "min": "minute", "minute": "minute",
            "s": "second", "sec": "second", "second": "second"}[
                m.group(2).lower()]
    return multiple, unit, multiple * _WINDOW_UNIT_US[unit]


def window_agg(events_ds, *, window: str = "h"):
    """§2.9: tumbling event-time windows as a grouped aggregate —
    (event_type, window_start) -> n_events, sum_value. Ray Data has no
    watermarks; bounded logs make windows a plain groupby over a
    computed window column (ray_guide streaming section)."""
    from ray.data.aggregate import Sum

    multiple, unit, _ = _parse_window(window)

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {"event_type": batch.column("event_type"),
             "window_start": pc.floor_temporal(batch.column("ts"),
                                               multiple=multiple, unit=unit),
             "value": batch.column("value")}
        ).group_by(["event_type", "window_start"]).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return pa.table(
            {"event_type": g.column("event_type"),
             "window_start": g.column("window_start"),
             "n_p": g.column("count_all"),
             "v_p": g.column("value_sum")}
        )

    agg = events_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    ).aggregate(Sum("n_p", alias_name="n_events"),
                Sum("v_p", alias_name="sum_value"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch.column("event_type"),
             "window_start": batch.column("window_start"),
             "n_events": pc.cast(batch.column("n_events"), pa.int64()),
             "sum_value": _round_np(batch.column("sum_value"), 2)}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def dense_window_agg(events_ds, *, window: str = "h"):
    """Gap-filled tumbling windows (NOT grouped by type): every window
    between the corpus min and max gets a row, empty ones with
    n_events = 0 — the dashboard/time-series contract `window_agg`
    (sparse, per-type) doesn't give. The distributed part is the same
    pre-aggregated groupby; the gap fill is a driver-side merge of two
    SMALL aggregates (the window spine is bounded by the time range,
    not the data)."""
    from ray.data.aggregate import Sum

    multiple, unit, _ = _parse_window(window)

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {"window_start": pc.floor_temporal(batch.column("ts"),
                                               multiple=multiple,
                                               unit=unit),
             "value": batch.column("value")}
        ).group_by("window_start").aggregate(
            [([], "count_all"), ("value", "sum")])
        return pa.table({"window_start": g.column("window_start"),
                         "n_p": g.column("count_all"),
                         "v_p": g.column("value_sum")})

    got = events_ds.select_columns(["ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("window_start") \
        .aggregate(Sum("n_p", alias_name="n_events"),
                   Sum("v_p", alias_name="sum_value")) \
        .to_pandas()
    if got.empty:
        return pd.DataFrame({"window_start": pd.array(
            [], dtype="datetime64[us]"),
            "n_events": pd.array([], dtype="int64"),
            "sum_value": pd.array([], dtype="float64")})
    # NB: unit[0] would map 'minute' -> pandas 'm' (MONTH-end) and
    # silently empty the spine
    freq = f"{multiple}" + {"hour": "h", "day": "D", "minute": "min",
                            "second": "s"}[unit]
    spine = pd.DataFrame({"window_start": pd.date_range(
        got["window_start"].min(), got["window_start"].max(), freq=freq)})
    out = spine.merge(got, on="window_start", how="left")
    out["n_events"] = out["n_events"].fillna(0).astype("int64")
    out["sum_value"] = out["sum_value"].fillna(0.0).round(2)
    return out


def distinct_lang_source(documents_ds):
    """A5 DISTINCT: unique (lang, source) pairs via groupby."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)[["lang", "source"]]

    return documents_ds.select_columns(["lang", "source"]).groupby(
        ["lang", "source"]
    ).map_groups(first, batch_format="pandas")


def rollup_counts(documents_ds, *, keys=("lang", "source"),
                  val: str = "n_chars"):
    """GROUP BY ROLLUP(lang, source): doc counts + value sums at the
    (lang, source), (lang, ALL) and (ALL, ALL) grains. ONE distributed
    shuffle at the finest grain (Arrow per-batch partial aggregation
    -> small groupby); the coarser levels derive from the fine
    aggregate on the driver — |langs| x |sources| rows, never the
    corpus, so the rollup itself is free at any scale. Rollup markers
    use the 'ALL' sentinel (not NULL) so the output sorts/hashes
    uniformly everywhere."""
    from ray.data.aggregate import Sum

    k1, k2 = keys

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {k1: batch.column(k1), k2: batch.column(k2),
             "v": batch.column(val)}
        ).group_by([k1, k2]).aggregate([([], "count_all"), ("v", "sum")])
        return pa.table({k1: g.column(k1), k2: g.column(k2),
                         "n_p": g.column("count_all"),
                         "v_p": g.column("v_sum")})

    fine = documents_ds.select_columns([k1, k2, val]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([k1, k2]) \
        .aggregate(Sum("n_p", alias_name="n_docs"),
                   Sum("v_p", alias_name="sum_chars")) \
        .to_pandas()
    fine["n_docs"] = fine["n_docs"].astype("int64")
    fine["sum_chars"] = fine["sum_chars"].astype("int64")

    # dropna=False: a NULL key is a real group in SQL ROLLUP (it stays
    # NULL at the fine grain and must roll up into (NULL, 'ALL') too)
    lvl1 = fine.groupby(k1, as_index=False, dropna=False)[
        ["n_docs", "sum_chars"]].sum()
    lvl1[k2] = "ALL"
    lvl0 = pd.DataFrame(
        {k1: ["ALL"], k2: ["ALL"],
         "n_docs": [fine["n_docs"].sum()],
         "sum_chars": [fine["sum_chars"].sum()]})
    cols = [k1, k2, "n_docs", "sum_chars"]
    return pd.concat([fine[cols], lvl1[cols], lvl0[cols]],
                     ignore_index=True)


def cube_counts(documents_ds, *, keys=("lang", "source"),
                val: str = "n_chars"):
    """GROUP BY CUBE(lang, source): the ROLLUP grains plus the
    (ALL, source) slice. Same scale shape as `rollup_counts` — one
    fine-grain shuffle, every coarser grain derived from the small
    fine aggregate on the driver."""
    k1, k2 = keys
    fine = rollup_counts(documents_ds, keys=keys, val=val)
    detail = fine[(fine[k1] != "ALL") & (fine[k2] != "ALL")]
    lvl2 = detail.groupby(k2, as_index=False, dropna=False)[
        ["n_docs", "sum_chars"]].sum()
    lvl2[k1] = "ALL"
    cols = [k1, k2, "n_docs", "sum_chars"]
    return pd.concat([fine, lvl2[cols]], ignore_index=True)


def json_props_sum(events_ds):
    """Scalar-function surface: extract props->k (JSON) per event,
    sum per event_type. JSON parse vectorized-ish per batch."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # the json parse is inherently per-row; everything around it is
        # Arrow (no pandas round-trip)
        ks = np.fromiter(
            (int(json.loads(p)["k"])
             for p in batch.column("props").to_pylist()),
            dtype=np.int64, count=len(batch),
        )
        g = pa.table(
            {"event_type": batch.column("event_type"),
             "k": pa.array(ks, type=pa.int64())}
        ).group_by("event_type").aggregate([("k", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "k_p": g.column("k_sum")})

    agg = events_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "event_type"
    ).aggregate(Sum("k_p", alias_name="sum_k"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch.column("event_type"),
             "sum_k": pc.cast(batch.column("sum_k"), pa.int64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(events_ds, *, window: str = "3h", hop: str = "h"):
    """Hopping (sliding) event-time windows: every ``hop`` a window of
    length ``window`` opens, so each event lands in window/hop windows.
    Result: (event_type, window_start) -> n_events, sum_value over the
    non-empty windows — the overlap generalization of window_agg.

    Per batch, the event's hop-aligned base start is computed with one
    integer floor over the epoch-us timestamps and the window/hop
    shifted copies are materialized vectorized (window/hop is small —
    3-8 — so the fan-out is a few concats, not a row loop). The
    shuffle then moves only per-batch partial aggregates, exactly like
    window_agg: at fleet scale the all-to-all carries (type, start,
    n, sum) rows, never the event fan-out."""
    import numpy as np

    from ray.data.aggregate import Sum

    _, _, window_us = _parse_window(window)
    _, _, hop_us = _parse_window(hop)
    if window_us % hop_us != 0:
        raise ValueError(f"window {window!r} must be a multiple of hop {hop!r}")
    reps = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.timestamp("us")).to_numpy()\
            .astype("datetime64[us]").astype(np.int64)
        base = (ts_us // hop_us) * hop_us  # hop-aligned, epoch-anchored
        types = batch.column("event_type")
        vals = batch.column("value")
        shifted = [
            pa.table({"event_type": types,
                      "window_start": pa.array(
                          (base - k * hop_us).astype("datetime64[us]"),
                          type=pa.timestamp("us")),
                      "value": vals})
            for k in range(reps)
        ]
        g = pa.concat_tables(shifted).group_by(
            ["event_type", "window_start"]
        ).aggregate([([], "count_all"), ("value", "sum")])
        return pa.table(
            {"event_type": g.column("event_type"),
             "window_start": g.column("window_start"),
             "n_p": g.column("count_all"),
             "v_p": g.column("value_sum")}
        )

    agg = events_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    ).aggregate(Sum("n_p", alias_name="n_events"),
                Sum("v_p", alias_name="sum_value"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch.column("event_type"),
             "window_start": batch.column("window_start"),
             "n_events": pc.cast(batch.column("n_events"), pa.int64()),
             "sum_value": _round_np(batch.column("sum_value"), 2)}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def asof_join(left_ds, right_ds, *, on: str = "ts", by: str = "user_id",
              value_col: str = "value", out_col: str = "asof_value",
              strategy: str = "broadcast", num_parts: int | None = None):
    """As-of join: each left row picks the right row with the largest
    ``on`` <= its own, within the same ``by`` key (backward direction,
    exact matches allowed) — DuckDB's ``ASOF LEFT JOIN l.on >= r.on``.
    Unmatched left rows keep a null ``out_col``.

    strategy='broadcast' (default): the right side is collected sorted
    and broadcast once via ray.put; every batch runs pandas
    merge_asof's compiled kernel against it — no shuffle, the right
    side is a dimension table (the per-user latest-state lookup of a
    training-data pipeline).

    strategy='partitioned': both sides are hash-partitioned on ``by``
    (one all-to-all each) and merge_asof runs inside each partition —
    the large-large form; ``num_parts`` defaults to parts_for(left
    rows). A ``by`` group never straddles a partition, so the result
    is identical to the broadcast path.

    ``out_col`` is always float64 (unmatched rows are null, so the
    column is nullable by contract, whatever the source value dtype).
    Left rows with a null ``by``/``on`` pass through unmatched; right
    rows with one are dropped (they can never win a comparison) —
    DuckDB ASOF LEFT JOIN semantics. Duplicate (by, on) pairs on the
    right make the picked value engine-defined (here: last in stable
    sort order) — dedup the right side first if that matters."""
    import ray

    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    left_types = _arrow_types(left_schema)
    out_schema = pa.schema(
        [(c, left_types[c]) for c in left_cols] + [(out_col, pa.float64())]
    )

    def _null_out(left_df: pd.DataFrame) -> pd.DataFrame:
        out = left_df.copy()
        out[out_col] = np.nan
        return out

    def _asof(left_df: pd.DataFrame, right_df: pd.DataFrame) -> pd.DataFrame:
        """merge_asof with null-key left rows passed through unmatched.
        Both frames carry their ORIGINAL dtypes (the callers split
        sides in Arrow before converting, so no null-padding float)."""
        ok = left_df[by].notna() & left_df[on].notna()
        matched = left_df[ok].sort_values(on, kind="stable")
        if len(right_df) == 0 or len(matched) == 0:
            return _null_out(left_df)
        joined = pd.merge_asof(matched, right_df, on=on, by=by,
                               direction="backward",
                               allow_exact_matches=True)
        if ok.all():
            return joined
        return pd.concat([joined, _null_out(left_df[~ok])],
                         ignore_index=True)

    if strategy == "broadcast":
        rt = pa.concat_tables(ray.get(
            right_ds.select_columns([by, on, value_col]).to_arrow_refs()
        ))
        rdf = rt.to_pandas()
        rdf = rdf[rdf[by].notna() & rdf[on].notna()]
        rdf = rdf.sort_values(on, kind="stable").rename(
            columns={value_col: out_col})
        rdf[out_col] = rdf[out_col].astype("float64")
        right_ref = ray.put(rdf)

        def per_batch(batch: pa.Table) -> pa.Table:
            out = _asof(batch.to_pandas(), ray.get(right_ref))
            return pa.Table.from_pandas(out, schema=out_schema,
                                        preserve_index=False)

        return left_ds.map_batches(per_batch, batch_format="pyarrow")

    if strategy != "partitioned":
        raise ValueError(f"unknown strategy {strategy!r}")

    from rse_ray.util import parts_for, plan_rows

    P = num_parts if num_parts is not None else parts_for(plan_rows(left_ds))

    # union needs ONE schema: left columns + the right-value carrier
    # (rv) + routing columns; right rows null-pad the left-only
    # columns. The group splits sides back apart IN ARROW before any
    # pandas conversion, so each side's own columns keep their exact
    # dtypes (int64 payloads never round-trip through float64).
    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: batch.column(c) for c in left_cols}
        cols["rv"] = pa.nulls(n, pa.float64())
        t = pa.table(cols)
        return t.append_column("part", _mod_parts(batch.column(by), P)) \
                .append_column("side", pa.array(np.zeros(n, dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch.column(by)),
                       pc.is_valid(batch.column(on)))
        batch = batch.filter(keep)
        n = batch.num_rows
        cols = {}
        for c in left_cols:
            if c == by:
                cols[c] = batch.column(by)
            elif c == on:
                cols[c] = batch.column(on)
            else:
                cols[c] = pa.nulls(n, left_types[c])
        cols["rv"] = batch.column(value_col).cast(pa.float64())
        t = pa.table(cols)
        return t.append_column("part", _mod_parts(batch.column(by), P)) \
                .append_column("side", pa.array(np.ones(n, dtype=np.int8)))

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns([by, on, value_col]).map_batches(
            tag_right, batch_format="pyarrow")
    )

    def join_part(g: pa.Table) -> pa.Table:
        side = g.column("side")
        left = g.filter(pc.equal(side, 0)).select(left_cols).to_pandas()
        right = g.filter(pc.equal(side, 1)).select([by, on, "rv"]) \
                 .rename_columns([by, on, out_col]).to_pandas() \
                 .sort_values(on, kind="stable")
        return pa.Table.from_pandas(_asof(left, right), schema=out_schema,
                                    preserve_index=False)

    return both.groupby("part").map_groups(join_part,
                                           batch_format="pyarrow")


def _pin_if_shuffled(ds):
    """hash_join/auto_join need the LEFT schema up front (typed empty
    results, key-type dispatch). ``Dataset.schema()`` on a plan whose
    upstream contains an all-to-all op executes the WHOLE plan for the
    probe and again at consume time (measured: a groupby left ran its
    upstream maps twice). Pin exactly those inputs — the all-to-all
    output is resident in the object store once, probe and consume
    share it. Map-only chains stay streaming: their schema probe only
    touches one block."""
    try:
        if ds.schema(fetch_if_missing=False) is not None:
            return ds
        from ray.data._internal.logical.operators.all_to_all_operator \
            import AbstractAllToAll

        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            if isinstance(op, AbstractAllToAll):
                return ds.materialize()
            stack.extend(op.input_dependencies)
    except Exception:  # internal APIs; degrade to the probe
        pass
    return ds


def hash_join(left_ds, right_ds, *, left_on: str, right_on: str,
              right_cols: list[str], num_parts: int | None = None,
              hot_keys=None, salt: int = 8, how: str = "inner"):
    """Distributed equality join for LARGE-large inputs: both
    sides hash-partition on the join key (one all-to-all each) and a
    pandas hash join runs inside every partition — the co-partitioned
    complement of orders_by_segment's broadcast join, for when neither
    side fits in a broadcast. A key group never straddles a partition,
    so the union of the per-partition joins IS the join.

    ``how``: 'inner' (default), 'left' (LEFT OUTER — unmatched left
    rows null-pad the right payload; integer columns ride pandas
    nullable dtypes through the merge so int64 never degrades to
    float64), 'semi' (left rows with >=1 right match, left columns
    only, no duplication), 'anti' (left rows with NO right match —
    SQL NOT EXISTS; null left keys are kept, since a null key matches
    nothing), or 'outer' (FULL OUTER — unmatched rows from EITHER side
    null-pad the other side's columns; null keys on both sides emit as
    unmatched, never equal to each other; does not compose with
    hot-key salting). semi/anti require
    ``right_cols=[]``: the right side contributes only its key set,
    so each partition ships just the keys. Both compose with salting
    unchanged (right keys are replicated into every salt slot, so a
    hot left row sees the full right key set wherever it lands).

    Join keys may be int64 OR string: integer keys route by value mod
    P, string keys by a stable vectorized siphash
    (pd.util.hash_array, fixed key) — deterministic across processes
    and cluster sizes.

    ``right_cols`` are the right-side payload columns carried into the
    output (the right join key is consumed by the equality).

    Skew: a hot key bounds a partition at O(|hot left| x |hot right|).
    Pass ``hot_keys`` (iterable of key values — e.g. from a cheap
    count pre-pass) to SALT them: the hot keys' left rows spread over
    ``salt`` dedicated partitions each and their right rows are
    REPLICATED into all ``salt`` partitions, so no single task holds a
    hot key's full left side. The result set is identical with or
    without salting (tested); salting only reshapes the partitioning.
    """
    import numpy as np

    import ray  # noqa: F401

    from rse_ray.util import parts_for, plan_rows

    if how not in ("inner", "left", "semi", "anti", "outer"):
        raise ValueError(f"how={how!r}")
    if how in ("semi", "anti") and right_cols:
        raise ValueError("semi/anti joins carry no right payload — "
                         "pass right_cols=[]")
    if how == "outer" and hot_keys is not None:
        # salting replicates hot RIGHT rows into every slot; an outer
        # join would then emit each unmatched replica once per slot
        raise ValueError("outer join does not compose with hot-key "
                         "salting")

    if isinstance(hot_keys, str) and hot_keys == "auto":
        # automatic skew detection: an exact keys-only count pre-pass
        # (per-batch partials, one (key, count) shuffle — never the
        # payload) surfaces keys whose left-side row count would
        # dominate a partition; those get salted exactly as
        # explicitly-passed hot keys would. The threshold is the
        # partition budget the caller already chose via rows_per_part,
        # so "hot" means "this one key alone would fill a reduce
        # slot". Results are identical with or without salting
        # (tested); detection only reshapes the partitioning.
        # pin FIRST: detection is a full counting pass over the left,
        # so an unpinned all-to-all upstream would execute for the
        # count, again for the schema probe, and again at consume
        left_ds = _pin_if_shuffled(left_ds)
        hot_keys = detect_hot_keys(left_ds, left_on)

    P = num_parts if num_parts is not None else parts_for(plan_rows(left_ds))

    left_ds = _pin_if_shuffled(left_ds)
    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    left_types = _arrow_types(left_schema)
    right_types = _arrow_types(right_ds.schema())
    if set(right_cols) & set(left_cols):
        raise ValueError("right_cols collide with left column names")

    # a degenerate all-null left input reports a NULL-typed key (no
    # values to infer from) — fall back to the right side's key type
    # so string right keys still route through the siphash branch
    _ktype = left_types[left_on]
    if pa.types.is_null(_ktype):
        _ktype = right_types.get(right_on, _ktype)
    key_is_str = pa.types.is_string(_ktype) or \
        pa.types.is_large_string(_ktype)

    def _keys_np(batch: pa.Table, col: str) -> np.ndarray:
        """Routing keys: int64 values, or a stable vectorized siphash
        of string keys. NULLs route to slot 0 (match logic never sees
        the routing value — pandas equality handles nulls). An
        all-null BLOCK arrives with Arrow `null` type (no values to
        infer from) — route the whole block to slot 0."""
        a = batch.column(col)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if pa.types.is_null(a.type):
            return np.zeros(len(a), dtype=np.int64)
        if key_is_str:
            vals = pc.fill_null(a, "").to_numpy(zero_copy_only=False)
            return pd.util.hash_array(vals.astype(object))
        return pc.fill_null(a, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)

    # hot key -> dense rank (vectorized searchsorted lookup); hot key
    # k's salted partitions are [P + rank(k)*salt, P + (rank(k)+1)*salt)
    if hot_keys is not None and len(list(hot_keys)):
        if key_is_str:
            hot_arr = np.sort(pd.util.hash_array(
                np.array(sorted({str(k) for k in hot_keys}),
                         dtype=object)))
        else:
            hot_arr = np.array(sorted({int(k) for k in hot_keys}),
                               dtype=np.int64)
    else:
        hot_arr = np.empty(0, dtype=np.int64)
    hot_ref = ray.put(hot_arr) if len(hot_arr) else None

    def _hot_ranks(keys: np.ndarray, hot: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(hot, keys)
        idx_c = np.minimum(idx, len(hot) - 1)
        ranks = np.where(hot[idx_c] == keys, idx_c, -1)
        return ranks

    def tag_left(batch: pa.Table) -> pa.Table:
        # inner/semi: null keys can never match — drop at the tag.
        # anti and left-outer KEEP them (a null key matches nothing:
        # anti emits the row, left-outer emits it null-padded).
        if how in ("inner", "semi"):
            batch = batch.filter(pc.is_valid(batch.column(left_on)))
        n = batch.num_rows
        # an all-null BLOCK infers Arrow `null` type per column — cast
        # to the dataset-level type so blocks union under one schema
        cols = {}
        for c in left_cols:
            col = batch.column(c)
            if pa.types.is_null(col.type) and \
                    not pa.types.is_null(left_types[c]):
                col = col.cast(left_types[c])
            cols[c] = col
        cols["_rkey"] = pa.nulls(n, right_types[right_on])
        for c in right_cols:
            cols[c] = pa.nulls(n, right_types[c])
        keys = _keys_np(batch, left_on)
        part = (keys % P).astype(np.int32)
        if hot_ref is not None:
            ranks = _hot_ranks(keys, ray.get(hot_ref))
            sel = ranks >= 0
            if sel.any():
                # spread a hot key's left rows over its salt slots;
                # slot choice is load-balancing only (any slot joins
                # against the same replicated right rows)
                slot = ((np.arange(n, dtype=np.uint64)[sel]
                         + keys[sel].astype(np.uint64))
                        % np.uint64(salt)).astype(np.int64)
                part[sel] = (P + ranks[sel] * salt + slot).astype(np.int32)
        return pa.table(cols).append_column(
            "part", pa.array(part)).append_column(
            "side", pa.array(np.zeros(n, dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        # null right keys match nothing; only FULL OUTER must still
        # carry them through (as unmatched output rows)
        if how != "outer":
            batch = batch.filter(pc.is_valid(batch.column(right_on)))
        n = batch.num_rows
        cols = {c: pa.nulls(n, left_types[c]) for c in left_cols}
        cols["_rkey"] = batch.column(right_on)
        for c in right_cols:
            cols[c] = batch.column(c)
        keys = _keys_np(batch, right_on)
        t = pa.table(cols)
        part = (keys % P).astype(np.int32)
        out = t.append_column("part", pa.array(part)).append_column(
            "side", pa.array(np.ones(n, dtype=np.int8)))
        if hot_ref is None:
            return out
        ranks = _hot_ranks(keys, ray.get(hot_ref))
        sel = ranks >= 0
        if not sel.any():
            return out
        # cold rows keep one copy; hot rows are replaced by `salt`
        # replicas, one per salted partition
        cold = out.filter(pa.array(~sel))
        hot_t = t.filter(pa.array(sel))
        hot_ranks = ranks[sel]
        replicas = [cold]
        for s in range(salt):
            replicas.append(
                hot_t.append_column(
                    "part", pa.array((P + hot_ranks * salt + s)
                                     .astype(np.int32))
                ).append_column(
                    "side", pa.array(
                        np.ones(hot_t.num_rows, dtype=np.int8)))
            )
        return pa.concat_tables(replicas)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns([right_on] + right_cols).map_batches(
            tag_right, batch_format="pyarrow")
    )

    out_cols = left_cols + right_cols
    out_schema = pa.schema(
        [(c, left_types[c]) for c in left_cols]
        + [(c, right_types[c]) for c in right_cols]
    )

    def join_part(g: pa.Table) -> pa.Table:
        # split sides IN ARROW before any pandas conversion: each
        # side's own columns are null-free, so int64 keys/payloads
        # never round-trip through float64 (values above 2^53 would
        # silently corrupt on that path)
        side = g.column("side")
        left_t = g.filter(pc.equal(side, 0)).select(left_cols)
        if how in ("semi", "anti"):
            # semi/anti stay fully Arrow: the right side contributed
            # only its key set. fill_null(False) pins SQL semantics —
            # a null left key EXISTS-matches nothing (semi drops it,
            # anti keeps it).
            rkeys = g.filter(pc.equal(side, 1)).column("_rkey")
            if isinstance(rkeys, pa.ChunkedArray):
                rkeys = rkeys.combine_chunks()
            lkey = left_t.column(left_on)
            if len(rkeys) == 0 or pa.types.is_null(rkeys.type) \
                    or left_t.num_rows == 0 \
                    or pa.types.is_null(lkey.type):
                # EITHER side's key can arrive NULL-typed (Ray drops
                # the schema on empty map outputs, and a concat of
                # schema-dropped blocks leaves an all-null column);
                # is_in(null, string) / is_in(string, null) both
                # raise ArrowTypeError — seen intermittently in the
                # jaccard_links anti join. Semantics are unambiguous
                # without is_in: an empty/null key never matches, so
                # semi keeps nothing and anti keeps every left row.
                mask = pa.array(np.zeros(left_t.num_rows, dtype=bool))
            else:
                mask = pc.fill_null(
                    pc.is_in(left_t.column(left_on),
                             value_set=rkeys.unique()), False)
            return left_t.filter(mask if how == "semi"
                                 else pc.invert(mask))
        if how == "outer":
            # FULL OUTER: nullable dtypes both ways. Null-key right
            # rows are split out BEFORE the merge — pandas matches
            # NaN keys to each other (non-SQL), so they must bypass
            # the equality and emit directly as unmatched rows.
            nullable = {pa.int64(): pd.Int64Dtype(),
                        pa.int32(): pd.Int32Dtype()}.get
            left = left_t.to_pandas(types_mapper=nullable)
            rt = g.filter(pc.equal(side, 1)).select(["_rkey"] + right_cols)
            r_valid = rt.filter(pc.is_valid(rt.column("_rkey"))) \
                .to_pandas(types_mapper=nullable)
            out = left.merge(r_valid, left_on=left_on, right_on="_rkey",
                             how="outer")[out_cols]
            r_null = rt.filter(pc.is_null(rt.column("_rkey")))
            if r_null.num_rows:
                pad = r_null.select(right_cols).to_pandas(
                    types_mapper=nullable)
                for c in left_cols:
                    # plain None survives every dtype (pd.NA raises on
                    # float64/datetime); from_pandas + out_schema casts
                    pad[c] = None
                out = pd.concat([out, pad[out_cols]], ignore_index=True)
            return pa.Table.from_pandas(out, schema=out_schema,
                                        preserve_index=False)
        if how == "left":
            # left-outer: unmatched rows null-pad the right payload, so
            # integer columns must ride pandas NULLABLE Int dtypes end
            # to end — the float64 NaN-padding path silently corrupts
            # int64 above 2^53
            left = left_t.to_pandas(types_mapper={
                pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int32Dtype(),
            }.get)
            right = g.filter(pc.equal(side, 1)) \
                     .select(["_rkey"] + right_cols) \
                     .to_pandas(types_mapper={
                         pa.int64(): pd.Int64Dtype(),
                         pa.int32(): pd.Int32Dtype(),
                     }.get)
            out = left.merge(right, left_on=left_on, right_on="_rkey",
                             how="left")
            return pa.Table.from_pandas(out[out_cols], schema=out_schema,
                                        preserve_index=False)
        left = left_t.to_pandas()
        right = g.filter(pc.equal(side, 1)) \
                 .select(["_rkey"] + right_cols).to_pandas()
        out = left.merge(right, left_on=left_on, right_on="_rkey",
                         how="inner")
        return pa.Table.from_pandas(out[out_cols], schema=out_schema,
                                    preserve_index=False)

    return both.groupby("part").map_groups(join_part,
                                           batch_format="pyarrow")


def train_val_split(ds, *, key: str = "doc_id", val_pct: int = 10,
                    keep: str | None = None):
    """Deterministic, content-keyed train/val split: a row is VAL iff
    md5(str(key))'s upper-half little-endian uint64 (DuckDB's
    ``md5_number_lower``) mod 100 < val_pct. Keyed on content, not
    position, so the split is stable across reruns, repartitions and
    cluster sizes — the property a training pipeline needs so val docs
    never leak into train when the corpus is rebuilt. Pure per-batch
    map (no shuffle). ``keep``: None adds a 'split' column; 'train' /
    'val' filters to that side. The per-row md5 is a Python loop —
    inherent to md5-of-strings (same trade as exact_dedup's key hash).
    """
    import hashlib
    import struct

    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_pylist()
        h = np.fromiter(
            (struct.unpack(
                "<Q", hashlib.md5(str(v).encode("utf-8")).digest()[8:])[0]
             for v in vals),
            dtype=np.uint64, count=len(vals))
        is_val = (h % 100) < val_pct
        if keep == "val":
            return batch.filter(pa.array(is_val))
        if keep == "train":
            return batch.filter(pa.array(~is_val))
        split = np.where(is_val, "val", "train")
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def top_k_per_group(ds, *, group: str, order: str, k: int = 2,
                    tie: str | None = None, descending: bool = True):
    """Top-k rows per group (the ROW_NUMBER() OVER (PARTITION BY ...)
    <= k shape): groupby(group) shuffles each group to one task, the
    head-k pick is vectorized pandas inside it. Tie-break ``tie``
    ascending pins a total order so results are deterministic."""
    cols = [order] + ([tie] if tie else [])
    asc = [not descending] + ([True] if tie else [])

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(cols, ascending=asc, kind="stable").head(k)

    return ds.groupby(group).map_groups(head, batch_format="pandas")


def recency_filter(events_ds, *, as_of: str, revisit_delay_days: int,
                   keep_cols: list[str] | None = None):
    """M8 recency filter — the reference's shouldVisit revisit policy
    (crawler/src/crawler/crawler/crawler.go:230-244, RevisitDelay at
    crawler.go:30): a row is DUE FOR REVISIT iff its last-seen ts is
    older than as_of - delay. Pure per-batch predicate scan (no
    shuffle); at the fleet scale this is the filter that sizes the
    incremental re-crawl frontier."""
    cutoff = np.datetime64(as_of) - np.timedelta64(revisit_delay_days, "D")

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy()
        out = batch.filter(pa.array(ts < cutoff))
        return out.select(keep_cols) if keep_cols else out

    return events_ds.map_batches(fn, batch_format="pyarrow")


def pivot_counts(ds, *, index: str = "user_id",
                 pivot: str = "event_type",
                 values: tuple[str, ...] = ("click", "error", "purchase",
                                            "signup", "view")):
    """PIVOT: one row per ``index`` key, one count column per pivot
    value (`n_<value>`; values outside the declared set are ignored —
    the fixed column set is what makes a pivot a schema, not a map).
    Per-batch partial: one small Arrow groupby emits the wide partial
    counts, so the shuffle carries |keys-per-batch| rows of ints —
    never the raw events."""
    from ray.data.aggregate import Sum

    vset = list(values)

    def partial(batch: pa.Table) -> pa.Table:
        pv = batch.column(pivot).to_numpy(zero_copy_only=False)
        cols = {index: batch.column(index)}
        for v in vset:
            cols[f"p_{v}"] = pa.array((pv == v).astype(np.int64))
        g = pa.table(cols).group_by(index).aggregate(
            [(f"p_{v}", "sum") for v in vset])
        out = {index: g.column(index)}
        for v in vset:
            out[f"p_{v}"] = g.column(f"p_{v}_sum")
        return pa.table(out)

    agg = ds.select_columns([index, pivot]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(index) \
        .aggregate(*[Sum(f"p_{v}", alias_name=f"n_{v}") for v in vset])

    def finish(batch: pa.Table) -> pa.Table:
        out = {index: batch.column(index)}
        for v in vset:
            out[f"n_{v}"] = pc.cast(batch.column(f"n_{v}"), pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def profile_table(ds, *, columns: list[str],
                  numeric: list[str] | None = None):
    """Column-level data-quality profile: per column, null count,
    EXACT distinct count, and (numeric columns) min/max. Long-format
    output (column, n_nulls, n_distinct, min_val, max_val) so mixed
    schemas stay tidy.

    Scale shape: null counts and min/max are per-batch partials into
    one tiny groupby; the exact distinct count shuffles one
    (column, value) pair per DISTINCT value per batch — bounded by the
    true cardinality, not the row count. For web-scale high-cardinality
    columns use the HLL sketch (`approx_ndistinct_users`) instead; this
    is the exact auditing face."""
    from ray.data.aggregate import Max, Min, Sum

    numeric = list(numeric or [])

    def stats_partial(batch: pa.Table) -> pa.Table:
        cols, nulls, mins, maxs = [], [], [], []
        for c in columns:
            a = batch.column(c)
            cols.append(c)
            nulls.append(a.null_count)
            if c in numeric and len(a) > a.null_count:
                v = a.to_numpy(zero_copy_only=False).astype(np.float64)
                mins.append(float(np.nanmin(v)))
                maxs.append(float(np.nanmax(v)))
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table({"column": pa.array(cols, type=pa.string()),
                         "nn_p": pa.array(nulls, type=pa.int64()),
                         "mn_p": pa.array(mins, type=pa.float64()),
                         "mx_p": pa.array(maxs, type=pa.float64())})

    st = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("column") \
        .aggregate(Sum("nn_p", alias_name="n_nulls"),
                   Min("mn_p", alias_name="min_val"),
                   Max("mx_p", alias_name="max_val")) \
        .to_pandas()

    def distinct_partial(batch: pa.Table) -> pa.Table:
        cs, vs = [], []
        for c in columns:
            u = pc.unique(pc.drop_null(batch.column(c)))
            cs.extend([c] * len(u))
            vs.extend(str(x) for x in u.to_pylist())
        return pa.table({"column": pa.array(cs, type=pa.string()),
                         "v": pa.array(vs, type=pa.string())})

    def count_per_col(batch: pa.Table) -> pa.Table:
        g = batch.group_by("column").aggregate([([], "count_all")])
        return pa.table({"column": g.column("column"),
                         "n_distinct": pc.cast(g.column("count_all"),
                                               pa.int64())})

    nd = ds.map_batches(distinct_partial, batch_format="pyarrow") \
        .groupby(["column", "v"]).count() \
        .map_batches(count_per_col, batch_format="pyarrow") \
        .groupby("column").sum("n_distinct") \
        .to_pandas().rename(columns={"sum(n_distinct)": "n_distinct"})

    # contract: ALWAYS one row per declared column — an empty input
    # profiles as all-zeros (the SQL aggregate shape), not as no rows
    spine = pd.DataFrame({"column": sorted(columns)})
    if "column" not in st.columns:  # empty input: no partials ran
        st = pd.DataFrame({"column": [], "n_nulls": [],
                           "min_val": [], "max_val": []})
    if "column" not in nd.columns:
        nd = pd.DataFrame({"column": [], "n_distinct": []})
    st = spine.merge(st, on="column", how="left")
    st["n_nulls"] = st["n_nulls"].fillna(0)

    out = st.merge(nd, on="column", how="left")
    out["n_nulls"] = out["n_nulls"].astype("int64")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out["min_val"] = out["min_val"].round(6)
    out["max_val"] = out["max_val"].round(6)
    return out[["column", "n_nulls", "n_distinct", "min_val", "max_val"]] \
        .sort_values("column").reset_index(drop=True)


def value_histogram(ds, *, col: str = "value", lo: float = 0.0,
                    hi: float = 1000.0, bins: int = 20):
    """Fixed-bin numeric histogram: bin = floor((v - lo) / w) clamped
    to [0, bins-1] (the top edge closes the last bin, SQL `least`
    twin). Per-batch bincount partials -> one tiny groupby; empty bins
    are emitted with n = 0 so the shape is always ``bins`` rows."""
    from ray.data.aggregate import Sum

    w = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy().astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / w), 0, bins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=bins)
        return pa.table({"bin": pa.array(np.arange(bins, dtype=np.int64)),
                         "n_p": pa.array(counts.astype(np.int64))})

    h = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n_p", alias_name="n")) \
        .to_pandas().sort_values("bin").reset_index(drop=True)
    h["n"] = h["n"].astype("int64")
    h["bin_lo"] = (lo + h["bin"] * w).round(6)
    return h[["bin", "bin_lo", "n"]]


def user_window_funcs(events_ds, *, by: str = "user_id",
                      order: tuple[str, str] = ("ts", "event_id"),
                      val: str = "value", window: int = 3):
    """Row-frame window functions per key — the sliding-window family
    `window_agg` (time buckets) and `hopping_window_agg` (overlapping
    ranges) don't cover: per user, ordered by (ts, event_id),

      * cum_value    — running SUM(value)
      * moving_avg3  — AVG over ROWS BETWEEN window-1 PRECEDING AND
                       CURRENT ROW
      * value_delta  — value - LAG(value), null on each key's first row

    One shuffle (groupby key), per-group work is vectorized pandas
    rolling/cumsum/diff on small groups (a user's history). At fleet
    scale a single user's history fitting one task is the same
    assumption sessionize already documents."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order), kind="stable")
        v = g[val].astype("float64")
        # SQL's running SUM skips NULL rows (returns the prior total);
        # it is NULL only until the key's first non-null value
        cum = v.fillna(0.0).cumsum()
        cum[v.notna().cumsum() == 0] = np.nan
        out = pd.DataFrame({
            by: g[by].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "cum_value": cum.round(6).to_numpy(),
            f"moving_avg{window}": v.rolling(window, min_periods=1)
                                    .mean().round(6).to_numpy(),
            "value_delta": v.diff().round(6).to_numpy(),
        })
        return out

    return events_ds.select_columns(
        [by, "event_id", order[0], val]
    ).groupby(by).map_groups(fn, batch_format="pandas")


def sessionize(events_ds, *, by: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", gap_minutes: int = 30,
               num_parts: int | None = None):
    """Gap-based sessionization (§2.9 session windows): per ``by`` key,
    a new session starts when the time since the previous event
    exceeds ``gap_minutes``. Output: one row per session —
    (by, session_start, session_end, n_events, total_value).

    Scale shape: ONE hash exchange on the key (sessionization
    inherently needs a key's events co-located), then everything
    inside a partition is vectorized numpy — lexsort by (key, ts),
    boundary flags from array diffs, per-session aggregates via
    np.add.reduceat. No per-user task, no Python loop: a partition
    with a million users costs three array passes. Session identity
    is order-independent under ts ties (equal timestamps diff to 0,
    which never exceeds the gap), so the result is deterministic
    regardless of shuffle arrival order.
    """
    from rse_ray.util import parts_for, plan_rows

    P = num_parts if num_parts is not None else parts_for(plan_rows(events_ds))
    gap = np.timedelta64(gap_minutes * 60_000_000, "us")

    def tag(batch: pa.Table) -> pa.Table:
        return batch.select([by, ts_col, value_col]).append_column(
            "part", _mod_parts(batch.column(by), P))

    def per_part(g: pa.Table) -> pa.Table:
        key = g.column(by).to_numpy()
        ts = g.column(ts_col).to_numpy()
        val = g.column(value_col).to_numpy()
        n = len(key)
        if n == 0:
            return pa.table({by: pa.array([], pa.int64()),
                             "session_start": pa.array([], pa.timestamp("us")),
                             "session_end": pa.array([], pa.timestamp("us")),
                             "n_events": pa.array([], pa.int64()),
                             "total_value": pa.array([], pa.float64())})
        order = np.lexsort((ts.view("i8"), key))
        k, t, v = key[order], ts[order], val[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (k[1:] != k[:-1]) | ((t[1:] - t[:-1]) > gap)
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [n]])
        return pa.table({
            by: pa.array(k[starts]),
            "session_start": pa.array(t[starts]),
            "session_end": pa.array(t[ends - 1]),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "total_value": pa.array(
                np.round(np.add.reduceat(v, starts), 6)),
        })

    return events_ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("part").map_groups(per_part, batch_format="pyarrow") \
        .select_columns([by, "session_start", "session_end",
                         "n_events", "total_value"])


def group_quantiles(ds, *, group: str, col: str,
                    qs: tuple = (0.25, 0.5, 0.75, 0.95)):
    """EXACT per-group quantiles (linear interpolation — numpy's
    default and DuckDB's quantile_cont are the same estimator): one
    groupby(group) shuffle, np.quantile inside each group task.

    Exactness requires a group's values co-resident, so this is for
    group domains like status flags where each group fits one task
    (TPC-H Q1 shape). For groups that outgrow a task — or corpus-wide
    percentiles at 10^12 rows — use approx_quantiles: a mergeable
    histogram sketch whose driver payload is O(groups x bins),
    independent of row count."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        v = g[col].to_numpy()
        row = {group: [g[group].iloc[0]]}
        for q in qs:
            row[f"q{int(round(q * 100)):02d}"] = [
                round(float(np.quantile(v, q)), 6)]
        return pd.DataFrame(row)

    return ds.groupby(group).map_groups(f, batch_format="pandas")


def above_group_median(ds, *, group: str = "source",
                       col: str = "n_chars"):
    """Adaptive per-group threshold filter — the corpus-hygiene move
    'keep docs at or above their own SOURCE's median length' (a fixed
    global cutoff over/under-filters heterogeneous domains). Pass 1:
    exact per-group medians (small — one row per group) broadcast as a
    sorted-key lookup; pass 2: stateless vectorized filter. Output
    (doc_id, source, n_chars) for survivors. Null group keys match no
    group (the SQL JOIN semantics) — those rows are dropped up front."""
    clean = ds.select_columns(["doc_id", group, col]).map_batches(
        lambda b: b.drop_null(), batch_format="pyarrow")
    med = group_quantiles(clean.select_columns([group, col]),
                          group=group, col=col, qs=(0.5,)).to_pandas()
    if med.empty:  # no non-null groups at all
        return clean.map_batches(lambda b: b.slice(0, 0),
                                 batch_format="pyarrow")
    keys = med[group].to_numpy().astype(object)
    order = np.argsort(keys)
    keys = keys[order]
    meds = med["q50"].to_numpy(dtype=np.float64)[order]

    def fn(batch: pa.Table) -> pa.Table:
        g = batch.column(group).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy().astype(np.float64)
        idx = np.searchsorted(keys, g)
        idx_c = np.minimum(idx, len(keys) - 1)
        keep = (keys[idx_c] == g) & (v >= meds[idx_c])
        return batch.filter(pa.array(keep))

    return clean.map_batches(fn, batch_format="pyarrow")


def approx_quantiles(ds, *, group: str, col: str,
                     qs: tuple = (0.25, 0.5, 0.75, 0.95),
                     bins: int = 2048):
    """Approximate per-group quantiles via a mergeable equi-width
    histogram sketch — the fleet-scale path (group_quantiles docstring
    has the exactness trade). Two metadata-light passes, NO shuffle:

      1. per-batch (group, min, max) partials -> driver merge (rows =
         batches x groups-in-batch, values only).
      2. per-batch per-group bincount over the group's fixed global
         [min, max] grid -> driver sums histograms (groups x bins
         ints) and interpolates each quantile inside its bin.

    Error is bounded by one bin width, (max-min)/bins per group; the
    driver never holds corpus values, only sketches. Deterministic:
    histogram sums are integer, interpolation is a closed form."""
    sel = ds.select_columns([group, col])

    def minmax(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(group, sort=False)[col].agg(["min", "max"])
        return pa.table({group: pa.array(g.index.to_numpy()),
                         "lo": pa.array(g["min"].to_numpy(np.float64)),
                         "hi": pa.array(g["max"].to_numpy(np.float64))})

    mm = sel.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mm = mm.groupby(group).agg(lo=("lo", "min"), hi=("hi", "max"))
    keys = mm.index.to_numpy()
    lo = mm["lo"].to_numpy()
    width = np.maximum(mm["hi"].to_numpy() - lo, 1e-300)
    key_pos = {k: i for i, k in enumerate(keys)}
    G = len(keys)

    def hist(batch: pa.Table) -> pa.Table:
        gv = batch.column(group).to_pandas()
        v = batch.column(col).to_numpy(zero_copy_only=False)
        gi = gv.map(key_pos).to_numpy(dtype=np.int64)
        b = np.clip(((v - lo[gi]) / width[gi] * bins).astype(np.int64),
                    0, bins - 1)
        flat = np.bincount(gi * bins + b, minlength=G * bins)
        return pa.table({"h": pa.array(flat.astype(np.int64))})

    parts = sel.map_batches(hist, batch_format="pyarrow").to_pandas()
    h = parts["h"].to_numpy().reshape(-1, G * bins).sum(axis=0) \
        .reshape(G, bins)
    out = {group: keys}
    cum = np.cumsum(h, axis=1).astype(np.float64)
    total = cum[:, -1]
    edges = lo[:, None] + width[:, None] * np.arange(bins + 1) / bins
    for q in qs:
        target = q * total
        bi = np.minimum((cum < target[:, None]).sum(axis=1), bins - 1)
        prev = np.where(bi > 0, cum[np.arange(G), bi - 1], 0.0)
        cnt = np.maximum(h[np.arange(G), bi], 1)
        frac = np.clip((target - prev) / cnt, 0.0, 1.0)
        est = edges[np.arange(G), bi] + frac * width / bins
        out[f"q{int(round(q * 100)):02d}"] = np.round(est, 6)
    return pd.DataFrame(out)


def epoch_shuffle(ds, *, key: str = "doc_id", seed: int = 0,
                  out_col: str = "pos"):
    """Deterministic epoch shuffle for training-data loaders: every row
    gets a global shuffle position ``pos`` = rank of
    md5(f"{seed}-{key}") (DuckDB's md5_number_lower of the same
    string), ties pinned by key. Content-keyed and seed-parameterized:
    epoch k's permutation is reproducible on any cluster size and any
    input partitioning — the property that lets a resumed training run
    re-derive exactly where epoch k's stream was.

    Scale shape: one range exchange (sort by the hash — exactly the
    all-to-all any true shuffle costs) followed by a two-pass
    distributed prefix rank: per-block row counts -> driver block
    offsets (O(blocks) ints) -> local arange + offset. The sorted
    projection is materialized so both passes see identical blocks;
    rows never collect on the driver."""
    import hashlib
    import struct

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_pylist()
        h = np.fromiter(
            (struct.unpack(
                "<Q",
                hashlib.md5(f"{seed}-{v}".encode("utf-8")).digest()[8:])[0]
             for v in vals),
            dtype=np.uint64, count=len(vals))
        return batch.append_column("_h", pa.array(h, type=pa.uint64()))

    ordered = ds.map_batches(add_hash, batch_format="pyarrow") \
        .sort(["_h", key]).materialize()

    def block_count(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h0": pa.array([], type=pa.uint64()),
                             "k0": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({
            "h0": pa.array([batch.column("_h")[0].as_py()],
                           type=pa.uint64()),
            "k0": pa.array([batch.column(key)[0].as_py()],
                           type=pa.int64()),
            "cnt": pa.array([batch.num_rows], type=pa.int64()),
        })

    totals = ordered.map_batches(
        block_count, batch_size=None, batch_format="pyarrow").to_pandas()
    totals = totals.sort_values(["h0", "k0"]).reset_index(drop=True)
    offs = totals["cnt"].cumsum().shift(fill_value=0)
    base = {(int(h), int(k)): int(o)
            for h, k, o in zip(totals["h0"], totals["k0"], offs)}

    def rank(batch: pa.Table) -> pa.Table:
        out = batch.drop_columns(["_h"])
        if batch.num_rows == 0:
            return out.append_column(out_col, pa.array([], type=pa.int64()))
        b = base[(int(batch.column("_h")[0].as_py()),
                  int(batch.column(key)[0].as_py()))]
        pos = np.arange(b, b + batch.num_rows, dtype=np.int64)
        return out.append_column(out_col, pa.array(pos))

    return ordered.map_batches(rank, batch_size=None,
                               batch_format="pyarrow")


def stratified_sample(ds, *, group: str, key: str,
                      rates: dict[str, int] | None = None,
                      default_permille: int = 0, salt: str = "strat"):
    """Deterministic per-stratum downsampling — the corpus-rebalancing
    primitive (e.g. cap English at 30%, keep all low-resource
    languages): a row survives iff md5(f"{salt}|{group}|{key}") upper-
    half little-endian uint64 (DuckDB's ``md5_number_lower`` of the
    same string) mod 1000 < the stratum's permille rate. Content-
    keyed like train_val_split: the SAME rows are picked on any
    cluster size, partitioning or rerun, and re-running with a higher
    rate yields a superset (nested samples). Null group/key rows drop,
    matching SQL NULL comparison semantics. Pure per-batch filter, no
    shuffle; the per-row md5 loop is inherent to md5-of-strings."""
    import hashlib
    import struct

    rates = rates or {}

    def fn(batch: pa.Table) -> pa.Table:
        gs = batch.column(group).to_pylist()
        ks = batch.column(key).to_pylist()
        keep = np.zeros(len(gs), dtype=bool)
        for i, (g, v) in enumerate(zip(gs, ks)):
            if g is None or v is None:
                continue
            h = struct.unpack(
                "<Q",
                hashlib.md5(f"{salt}|{g}|{v}".encode("utf-8")).digest()[8:]
            )[0]
            keep[i] = (h % 1000) < rates.get(g, default_permille)
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def ntile_rank(ds, *, order: str, key: str, n: int = 4,
               descending: bool = True):
    """SQL NTILE(n) over the exact global rank: the first N mod n
    tiles get ceil(N/n) rows, the rest floor(N/n) — byte-identical to
    the window function, derived from `global_rank`'s two-pass prefix
    rank plus one scalar (N) on the driver. Output adds both `rank`
    and `tile`."""
    ranked = global_rank(ds, order=order, key=key, descending=descending)
    total = ds.count()
    q, rem = divmod(total, n)
    cut = rem * (q + 1)

    def fn(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy()
        t = np.where(r <= cut, (r - 1) // (q + 1) + 1,
                     rem + (r - cut - 1) // max(q, 1) + 1)
        return batch.append_column("tile", pa.array(t.astype(np.int64)))

    return ranked.map_batches(fn, batch_format="pyarrow")


def global_rank(ds, *, order: str, key: str, descending: bool = True,
                out_col: str = "rank", start: int = 1):
    """Exact global ranking — SQL ROW_NUMBER() OVER (ORDER BY order
    [DESC], key) — the operator behind percentile thresholding ("keep
    the top 20% of docs by quality score") at corpus scale. Every row
    gains ``out_col``; ties in ``order`` are pinned by ``key`` so the
    rank is a total order and deterministic.

    Scale shape (same two-pass prefix rank as epoch_shuffle): ONE
    range exchange (the sort — exactly the all-to-all any exact global
    rank requires) over the (order, key) projection-plus-payload, then
    per-block row counts keyed by each block's first row -> O(blocks)
    driver cumsum -> local arange + offset. The sorted dataset is
    materialized so both passes see identical blocks; row data never
    collects on the driver. (order, key) must be unique per row (key
    unique suffices)."""
    ordered = ds.sort([order, key],
                      descending=[descending, False]).materialize()

    def block_count(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = min(batch.num_rows, 1)
        o = batch.column(order)
        if batch.num_rows == 0:
            bad = 0
        elif pa.types.is_floating(o.type) or pa.types.is_integer(o.type):
            fin = pc.sum(pc.is_finite(pc.cast(o, pa.float64()))).as_py()
            bad = batch.num_rows - (fin or 0)
        else:
            bad = o.null_count
        return pa.table({
            "_o0": o.slice(0, 1),
            "_k0": batch.column(key).slice(0, 1),
            "cnt": pa.array([batch.num_rows] * n, type=pa.int64()),
            "bad": pa.array([bad or 0] * n, type=pa.int64()),
        })

    totals = ordered.map_batches(
        block_count, batch_size=None, batch_format="pyarrow").to_pandas()
    if len(totals) and int(totals["bad"].sum()):
        # null/NaN order values have no total order: Ray's sort and the
        # driver cumsum would disagree on their placement — refuse
        # rather than return silently wrong ranks
        raise ValueError(
            f"global_rank: {int(totals['bad'].sum())} null/NaN values "
            f"in order column {order!r}; filter or impute them first")
    totals = totals.sort_values(["_o0", "_k0"],
                                ascending=[not descending, True]) \
        .reset_index(drop=True)
    offs = totals["cnt"].cumsum().shift(fill_value=0) + start
    # keyed by the (unique) tie-break key alone: first-row identity
    # needs no float equality through the pandas round trip
    base = {k: int(off) for k, off in zip(totals["_k0"], offs)}

    def rank(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col,
                                       pa.array([], type=pa.int64()))
        b = base[batch.column(key)[0].as_py()]
        pos = np.arange(b, b + batch.num_rows, dtype=np.int64)
        return batch.append_column(out_col, pa.array(pos))

    return ordered.map_batches(rank, batch_size=None,
                               batch_format="pyarrow")


def group_rank(ds, *, group: str, order: str, key: str,
               descending: bool = True, out_col: str = "rank",
               start: int = 1):
    """Exact per-group ranking — SQL ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY order [DESC], key) — the grouped generalization of
    global_rank, same two-pass block-offset pattern: ONE range
    exchange sorts by (group, order, key); pass 1 ships per-block
    PER-GROUP counts keyed by the block's first (unique-key) row; the
    driver orders blocks and prefix-sums counts per group (O(blocks x
    groups-per-block) driver rows); pass 2 adds each block's grouped
    cumcount to its group's offset. Row data never collects on the
    driver. Returns (dataset_with_out_col, group_sizes dict) — sizes
    fall out of the same prefix pass and feed NTILE-style bucketing
    without another exchange."""
    import pandas as pd

    ordered = ds.sort([group, order, key],
                      descending=[False, descending, False]).materialize()

    def block_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "_k0": pa.array([], type=batch.column(key).type),
                "_g0": pa.array([], type=batch.column(group).type),
                "_o0": pa.array([], type=batch.column(order).type),
                "grp": pa.array([], type=batch.column(group).type),
                "cnt": pa.array([], type=pa.int64()),
                "bad": pa.array([], type=pa.int64()),
            })
        o = batch.column(order)
        if pa.types.is_floating(o.type) or pa.types.is_integer(o.type):
            fin = pc.sum(pc.is_finite(pc.cast(o, pa.float64()))).as_py()
            bad = batch.num_rows - (fin or 0)
        else:
            bad = o.null_count
        g = pd.Series(batch.column(group).to_pylist())
        cnt = g.groupby(g, sort=True).size()
        n = len(cnt)
        return pa.table({
            "_k0": pa.array([batch.column(key)[0].as_py()] * n,
                            type=batch.column(key).type),
            "_g0": pa.array([g.iloc[0]] * n,
                            type=batch.column(group).type),
            "_o0": pa.array([batch.column(order)[0].as_py()] * n,
                            type=batch.column(order).type),
            "grp": pa.array(cnt.index.to_numpy(),
                            type=batch.column(group).type),
            "cnt": pa.array(cnt.to_numpy(np.int64)),
            "bad": pa.array([bad or 0] * n, type=pa.int64()),
        })

    totals = ordered.map_batches(block_counts, batch_size=None,
                                 batch_format="pyarrow").to_pandas()
    if len(totals) and int(totals["bad"].sum()):
        raise ValueError(
            f"group_rank: null/NaN values in order column {order!r}; "
            f"filter or impute them first")
    # reproduce the global block order from each block's first row
    totals = totals.sort_values(["_g0", "_o0", "_k0"],
                                ascending=[True, not descending, True],
                                kind="mergesort")
    offsets: dict = {}
    running: dict = {}
    for k0, grp, cnt in zip(totals["_k0"], totals["grp"], totals["cnt"]):
        offsets.setdefault(k0, {})[grp] = running.get(grp, 0)
        running[grp] = running.get(grp, 0) + int(cnt)

    def rank(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col,
                                       pa.array([], type=pa.int64()))
        base_map = offsets[batch.column(key)[0].as_py()]
        g = pd.Series(batch.column(group).to_pylist())
        cc = g.groupby(g, sort=False).cumcount().to_numpy()
        base = g.map(base_map).to_numpy(np.int64)
        return batch.append_column(
            out_col, pa.array(start + base + cc))

    return (ordered.map_batches(rank, batch_size=None,
                                batch_format="pyarrow"),
            {k: int(v) for k, v in running.items()})


def snapshot_diff(old_ds, new_ds, *, key: str = "doc_id",
                  cmp_col: str = "text", num_parts: int | None = None):
    """Corpus-refresh diff — what changed between two snapshots of the
    same table (the CommonCrawl-refresh / incremental-recrawl
    bookkeeping step): emits (key, status) with status in
    {'added', 'removed', 'changed'}; unchanged rows are omitted.
    'changed' compares ``cmp_col`` by md5 content hash, so arbitrarily
    large payloads diff without shipping both copies anywhere twice.

    Scale shape: each side maps to (key, side, content-hash) — the
    shuffle carries 17-byte rows, never payloads — then ONE
    groupby(key) classifies each key from its tagged pair. No driver
    materialization; fan-out is input-derived via parts_for."""
    import hashlib

    from rse_ray.util import parts_for, plan_rows

    if num_parts is None:
        # one count pass, not two: snapshots are the same table across
        # a refresh, so 2x the old side sizes the exchange fine
        num_parts = parts_for(2 * plan_rows(old_ds))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            texts = batch.column(cmp_col).to_pylist()
            h = np.fromiter(
                (int.from_bytes(
                    hashlib.md5((t or "").encode("utf-8")).digest()[:8],
                    "little") - (1 << 63)
                 for t in texts),
                dtype=np.int64, count=len(texts))
            ka = batch.column(key)
            if isinstance(ka, pa.ChunkedArray):
                ka = ka.combine_chunks()
            if pa.types.is_string(ka.type) or \
                    pa.types.is_large_string(ka.type):
                # string keys (url-keyed snapshots) route via the same
                # stable fixed-key siphash hash_join uses
                keys = pd.util.hash_array(
                    ka.to_numpy(zero_copy_only=False).astype(object)
                ).astype(np.int64)
            else:
                keys = ka.to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                key: batch.column(key),
                "part": pa.array(
                    (keys % num_parts).astype(np.int32)),
                "side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int8)),
                "h": pa.array(h),
            })
        return fn

    both = old_ds.select_columns([key, cmp_col]) \
        .map_batches(tag(0), batch_format="pyarrow") \
        .union(new_ds.select_columns([key, cmp_col])
               .map_batches(tag(1), batch_format="pyarrow"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.pivot_table(index=key, columns="side", values="h",
                            aggfunc="first")
        old_h = piv[0] if 0 in piv.columns else pd.Series(
            np.nan, index=piv.index)
        new_h = piv[1] if 1 in piv.columns else pd.Series(
            np.nan, index=piv.index)
        status = np.where(
            old_h.isna(), "added",
            np.where(new_h.isna(), "removed",
                     np.where(old_h != new_h, "changed", "")))
        out = pd.DataFrame({key: piv.index.to_numpy(),
                            "status": status})
        return out[out["status"] != ""]

    # shuffle by hash partition, not by key: classify pivots EVERY key
    # of a partition in one vectorized call (a per-key map_groups would
    # schedule one task per document)
    return both.groupby("part").map_groups(classify, batch_format="pandas")


def group_rank_funcs(ds, *, group: str, order: str, key: str,
                     descending: bool = True, round_to: int = 6,
                     max_rank_table: int = 50_000_000):
    """SQL ranking window functions per partition — RANK(),
    DENSE_RANK(), PERCENT_RANK(), CUME_DIST() OVER (PARTITION BY
    ``group`` ORDER BY ``order`` [DESC]) — without sorting the rows.

    Rank functions depend only on each row's (group, order-VALUE), so
    the all-to-all this operator pays is a groupby over the
    pre-aggregated (group, value, count) histogram — never the rows.
    The per-value rank table (rank = 1 + #better rows, dense = 1 +
    #better values, percent_rank = (rank-1)/(n-1), cume_dist =
    #rows-at-or-better / n, ties sharing ranks exactly as SQL defines
    them) is computed once on the driver, broadcast via ``ray.put``,
    and merged back per batch — rows gain four columns in place.

    Scale shape: |distinct (group, value)| bounds the shuffle and the
    broadcast; for bounded-cardinality orders (lengths, binned scores)
    that stays broadcastable at 10^12 rows. For unbounded float orders
    use the sort-based ``global_rank`` instead — this operator raises
    past ``max_rank_table`` distinct pairs rather than degrade
    silently. Null/NaN order values have no total order and are
    rejected, matching ``global_rank``."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table({group: batch.column(group),
                      order: batch.column(order),
                      "c": pa.array(np.ones(batch.num_rows,
                                            dtype=np.int64))}) \
            .group_by([group, order]).aggregate([("c", "sum")])
        return g.rename_columns([group, order, "c"])

    counts = ds.select_columns([group, order]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([group, order]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    if len(counts) > max_rank_table:
        raise ValueError(
            f"group_rank_funcs: rank table has {len(counts)} distinct "
            f"(group, value) pairs (> {max_rank_table}); use "
            f"global_rank for unbounded orders")
    if counts[group].isna().any() or counts[order].isna().any():
        raise ValueError(
            f"group_rank_funcs: null values in {group!r}/{order!r} "
            f"have no total order; filter or impute them first")

    counts = counts.sort_values([group, order],
                                ascending=[True, not descending],
                                kind="mergesort").reset_index(drop=True)
    grp = counts.groupby(group, sort=False)
    cum = grp["c"].cumsum()
    n_g = grp["c"].transform("sum").to_numpy(dtype=np.float64)
    before = (cum - counts["c"]).to_numpy(dtype=np.int64)
    rank = before + 1
    dense = grp.cumcount().to_numpy(dtype=np.int64) + 1
    pct = np.where(n_g > 1, before / np.maximum(n_g - 1, 1), 0.0)
    cume = cum.to_numpy(dtype=np.float64) / n_g

    def round_half_away(x: np.ndarray) -> np.ndarray:
        # SQL round() is half-away-from-zero; np.round is half-to-even
        # and these ratios of small integers DO hit exact 6dp ties
        # (1/128 = 0.0078125) — x is non-negative here
        scale = 10.0 ** round_to
        return np.floor(x * scale + 0.5) / scale

    table = pd.DataFrame({
        group: counts[group], order: counts[order],
        "rank": rank, "dense_rank": dense,
        "percent_rank": round_half_away(pct),
        "cume_dist": round_half_away(cume),
    })
    ref = ray.put(table)

    def attach(batch: pa.Table) -> pd.DataFrame:
        t = ray.get(ref)
        df = batch.select([key, group, order]).to_pandas()
        return df.merge(t, on=[group, order], how="left")

    return ds.map_batches(attach, batch_format="pyarrow")


def unpivot(ds, *, id_cols: list[str], value_cols: dict[str, str],
            var_name: str = "name", value_name: str = "value"):
    """UNPIVOT / melt: one output row per (input row, value column),
    with ``var_name`` holding the column's label (``value_cols`` maps
    column -> emitted label) and ``value_name`` its value. The inverse
    of ``pivot_counts`` — wide partials back to the tidy long format.

    Scale shape: per-batch flat transform, no shuffle; output is
    |value_cols| stacked zero-copy column selections per batch."""
    cols = dict(value_cols)
    if not cols:
        raise ValueError("unpivot: value_cols is empty")

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = []
        for c, label in cols.items():
            out = {ic: batch.column(ic) for ic in id_cols}
            out[var_name] = pa.array(
                np.full(n, label, dtype=object), type=pa.string())
            out[value_name] = batch.column(c)
            parts.append(pa.table(out))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")


def window_agg_late(events_ds, *, window: str = "h",
                    lateness: str = "5d"):
    """Tumbling event-time windows WITH watermark semantics — the §2.9
    streaming contract window_agg (bounded-log groupby) cannot express:
    events are replayed in a deterministic arrival order (the repo's
    md5-rank permutation of event_id — the fixture's log is ts-sorted,
    so physical order would make lateness vacuous); the watermark
    trails the running max event time by ``lateness``; a row whose
    window has already closed (window_end <= watermark at its arrival)
    is DROPPED, exactly like a streaming engine discarding
    allowed-lateness violators. Output is window_agg's contract over
    the surviving rows.

    Scale shape: ONE range exchange (sort by arrival key — the
    all-to-all any global replay order costs), then the same two-pass
    prefix trick as global_rank: per-block max-ts partials keyed by
    the block's first row, an O(blocks) driver prefix-max, and a
    per-block vectorized running max + filter. Timestamps compare in
    integer microseconds, so engine and SQL twin agree exactly."""
    import pyarrow.compute as _pc

    from rse_ray.pipelines.sketch import _md5_u64

    w_mult, w_unit, w_us = _parse_window(window)
    _, _, late_us = _parse_window(lateness)

    def key(batch: pa.Table) -> pa.Table:
        batch = batch.filter(_pc.is_valid(batch.column("ts")))
        ids = batch.column("event_id").to_numpy()
        return pa.table({
            "h": pa.array(_md5_u64(ids)),
            "event_id": batch.column("event_id"),
            "ts": batch.column("ts"),
            "event_type": batch.column("event_type"),
            "value": batch.column("value"),
        })

    ordered = events_ds \
        .map_batches(key, batch_format="pyarrow") \
        .sort(["h", "event_id"]).materialize()

    def block_max(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h0": pa.array([], type=pa.uint64()),
                             "e0": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        return pa.table({"h0": batch.column("h").slice(0, 1),
                         "e0": batch.column("event_id").slice(0, 1),
                         "mx": pa.array([int(ts.max())],
                                        type=pa.int64())})

    blocks = ordered.map_batches(
        block_max, batch_size=None, batch_format="pyarrow").to_pandas()
    blocks = blocks.sort_values(["h0", "e0"]).reset_index(drop=True)
    prefix = blocks["mx"].cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    # keyed by the (unique) first event_id — same trick as global_rank
    pre = {int(e): int(p) for e, p in zip(blocks["e0"], prefix)}

    def late_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": batch.column("event_type"),
                             "window_start": batch.column("ts"),
                             "value": batch.column("value")})
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        run = np.maximum.accumulate(
            np.maximum(ts, pre[batch.column("event_id")[0].as_py()]))
        start = _pc.floor_temporal(batch.column("ts"),
                                   multiple=w_mult, unit=w_unit)
        end = start.cast(pa.int64()).to_numpy() + w_us
        keep = pa.array(end > run - late_us)
        f = batch.filter(keep)
        return pa.table({
            "event_type": f.column("event_type"),
            "window_start": _pc.floor_temporal(
                f.column("ts"), multiple=w_mult, unit=w_unit),
            "value": f.column("value"),
        })

    kept = ordered.map_batches(late_filter, batch_size=None,
                               batch_format="pyarrow")
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "window_start"]).aggregate(
            [([], "count_all"), ("value", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "window_start": g.column("window_start"),
                         "n_p": g.column("count_all"),
                         "v_p": g.column("value_sum")})

    agg = kept.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "window_start"]) \
        .aggregate(Sum("n_p", alias_name="n_events"),
                   Sum("v_p", alias_name="sum_value"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch.column("event_type"),
             "window_start": batch.column("window_start"),
             "n_events": pc.cast(batch.column("n_events"), pa.int64()),
             "sum_value": _round_np(batch.column("sum_value"), 2)})

    return agg.map_batches(finish, batch_format="pyarrow")


def window_agg_late_oracle_sql(*, window: str = "h",
                               lateness: str = "5d",
                               table: str = "events") -> str:
    """Exact SQL twin of window_agg_late, generated from the SAME
    window/lateness specs the engine parses — constants can't drift."""
    w_mult, w_unit, _ = _parse_window(window)
    l_mult, l_unit, _ = _parse_window(lateness)
    if w_mult != 1:
        raise ValueError(
            "window_agg_late_oracle_sql: date_trunc cannot express "
            f"multi-unit windows ({window!r}); use a unit window")
    return f"""
WITH o AS (SELECT event_id, ts, event_type, value,
                  max(ts) OVER (
                      ORDER BY md5_number_lower(CAST(event_id AS VARCHAR)),
                               event_id
                      ROWS UNBOUNDED PRECEDING) AS wm_ts
           FROM {table} WHERE ts IS NOT NULL),
kept AS (SELECT * FROM o
         WHERE date_trunc('{w_unit}', ts) + INTERVAL {w_mult} {w_unit.upper()}
               > wm_ts - INTERVAL {l_mult} {l_unit.upper()})
SELECT event_type, date_trunc('{w_unit}', ts) AS window_start,
       count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value
FROM kept GROUP BY 1, 2"""


def interval_join(rows_ds, intervals_ds, *, key: str = "user_id",
                  ts_col: str = "ts", lo_col: str = "session_start",
                  hi_col: str = "session_end",
                  id_col: str = "event_id",
                  num_parts: int | None = None):
    """Non-equi CONTAINMENT join — attach to each row the interval
    (per ``key``) whose [lo, hi] contains its timestamp, inner
    semantics (uncontained rows drop). The classic session-attribution
    / validity-range lookup SQL expresses as `JOIN ... ON r.key = i.key
    AND r.ts BETWEEN i.lo AND i.hi`.

    Scale shape: both sides co-partition by a splitmix hash of the key
    (ONE shuffle each, rows never replicate); within a partition each
    key's intervals sort once by ``lo`` and every row finds its
    candidate via searchsorted — O(log I) per row instead of the
    row x interval blowup a naive theta-join pays. Intervals must not
    overlap per key (true for gap-sessionization output); the
    containment check against the candidate's ``hi`` enforces inner
    semantics either way.

    ``num_parts`` defaults to ``parts_for(rows)`` — input-derived (the
    round-2 rule: never a fixed 32); pass it explicitly when the row
    side is a transformed pipeline whose count() re-executes work."""
    from rse_ray.util import parts_for, plan_rows

    if num_parts is None:
        num_parts = parts_for(plan_rows(rows_ds))

    def tag(is_interval: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            k = batch.column(key).to_numpy().astype(np.int64)
            part = ((k.view(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15))
                    >> np.uint64(33)) % np.uint64(num_parts)
            null_ts = pa.nulls(n, pa.timestamp("us"))
            return pa.table({
                "part": pa.array(part.astype(np.int64)),
                key: batch.column(key),
                "side": pa.array(np.full(n, is_interval, dtype=np.int8)),
                ts_col: (batch.column(ts_col).cast(pa.timestamp("us"))
                         if not is_interval else null_ts),
                id_col: (batch.column(id_col) if not is_interval
                         else pa.nulls(n, pa.int64())),
                lo_col: (batch.column(lo_col).cast(pa.timestamp("us"))
                         if is_interval else null_ts),
                hi_col: (batch.column(hi_col).cast(pa.timestamp("us"))
                         if is_interval else null_ts),
            })
        return fn

    both = rows_ds.select_columns([key, ts_col, id_col]) \
        .map_batches(tag(0), batch_format="pyarrow") \
        .union(intervals_ds.select_columns([key, lo_col, hi_col])
               .map_batches(tag(1), batch_format="pyarrow"))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        iv = g[g["side"] == 1]
        ev = g[g["side"] == 0]
        outs = []
        iv_by_key = {k: sub.sort_values(lo_col)
                     for k, sub in iv.groupby(key, sort=False)}
        for k, sub in ev.groupby(key, sort=False):
            spans = iv_by_key.get(k)
            if spans is None:
                continue
            lo = spans[lo_col].to_numpy()
            hi = spans[hi_col].to_numpy()
            ts = sub[ts_col].to_numpy()
            idx = np.searchsorted(lo, ts, side="right") - 1
            ok = idx >= 0
            ok[ok] &= ts[ok] <= hi[idx[ok]]
            hit = sub[ok]
            outs.append(pd.DataFrame({
                # the tag/union null-padding floats the id column in
                # pandas blocks; the hits themselves are never null
                id_col: hit[id_col].astype("int64").to_numpy(),
                key: hit[key].to_numpy(),
                ts_col: hit[ts_col].to_numpy(),
                lo_col: lo[idx[ok]],
            }))
        if not outs:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                key: pd.Series([], dtype="int64"),
                ts_col: pd.Series([], dtype="datetime64[us]"),
                lo_col: pd.Series([], dtype="datetime64[us]"),
            })
        return pd.concat(outs, ignore_index=True)

    return both.groupby("part").map_groups(attach, batch_format="pandas")


def group_quota_sample(ds, *, group: str, key: str, quota: int,
                       salt: str = "quota"):
    """Cap each group at ``quota`` rows — the data-mixing primitive
    ("at most N docs per language / domain") — picked by content-keyed
    md5 rank (ORDER BY md5-twin('salt|group|key'), key), so the SAME
    rows win on any cluster size, partitioning or rerun, and raising
    the quota yields a superset (nested samples, like
    stratified_sample's rate semantics but an absolute per-group cap,
    which needs coordination a pure filter can't provide).

    Scale shape: two-level top-N — each batch keeps at most ``quota``
    rows per group it sees, so the only all-to-all carries
    <= quota x batches (group, key, h) triples, never the corpus; a
    groupby-map_groups takes the final quota per group."""
    from rse_ray.pipelines.sketch import _md5_u64

    def partial(batch: pa.Table) -> pa.Table:
        gs = batch.column(group).to_pylist()
        ks = batch.column(key).to_pylist()
        h = _md5_u64([f"{salt}|{g}|{k}" for g, k in zip(gs, ks)])
        df = pd.DataFrame({group: gs, key: ks, "h": h})
        df = df[df[group].notna() & df[key].notna()]
        df = df.sort_values(["h", key]).groupby(group, sort=False) \
            .head(quota)
        return pa.table({group: pa.array(df[group]),
                         key: pa.array(df[key]),
                         "h": pa.array(df["h"].to_numpy())})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        win = g.sort_values(["h", key]).head(quota)
        return win[[key, group]].reset_index(drop=True)

    return ds.select_columns([group, key]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group).map_groups(final, batch_format="pandas")


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) —
    full-avalanche uint64 mix for the Bloom probes."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _keys_u64(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Non-null key column -> uint64 hash inputs. Integers pass
    through bit-identically; strings take the same stable siphash
    (pd.util.hash_array, fixed key) hash_join routes by."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return pd.util.hash_array(
            arr.to_numpy(zero_copy_only=False).astype(object))
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False) \
        .astype(np.int64).view(np.uint64)


def _bloom_probes(u: np.ndarray, m_bits: int, k: int):
    """Kirsch-Mitzenmacher double hashing: probe_i = h1 + i*h2 (mod m,
    m a power of two). Returns (n, k) word indices + bit masks."""
    h1 = _mix64(u)
    h2 = _mix64(u ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    pos = (h1[:, None] + i * h2[:, None]) & np.uint64(m_bits - 1)
    return (pos >> np.uint64(6)).astype(np.int64), \
        np.uint64(1) << (pos & np.uint64(63))


def bloom_semi_join(left_ds, right_keys_ds, *, left_on: str,
                    right_on: str, bits_per_key: int = 16,
                    n_hashes: int = 7, num_parts: int | None = None):
    """Exact semi-join (left rows with >= 1 right-key match) with a
    BLOOM-FILTER PREFILTER — the classic big-join optimization when
    the key set is too large to broadcast exactly but a bitmap is
    cheap: 16 bits/key keeps ~0.05% false-positive rate, so a 10^9-key
    set broadcasts as a 2 GB bitmap instead of a multi-TB shuffle of
    the whole left table.

    Three stages, all content-determined:
      1. build — each right block folds its keys into an m-bit bitmap
         (splitmix64 double hashing, m = pow2(bits_per_key x n_keys));
         bitmaps OR-merge in a fan-in tree of Ray tasks and the final
         filter broadcasts ONCE via ray.put (workers map it zero-copy
         from the object store).
      2. prefilter — a stateless map over the left side tests each
         batch's keys against the broadcast bitmap (vectorized word/
         mask probes); only possible members survive, so the join
         exchange that follows moves matches + ~fpp of the rest
         instead of the whole left table.
      3. verify — hash_join(how='semi') over the survivors removes
         the false positives. Output == the exact SQL semi-join
         (``WHERE left_on IN (SELECT right_on ...)``); the Bloom layer
         only reshapes the traffic. Null left keys match nothing.
    """
    import ray

    n_keys = right_keys_ds.count()
    if n_keys == 0:
        # empty right side -> empty result with the left schema; O(1),
        # never a per-row scan of the (possibly huge) left table
        return left_ds.limit(0)
    want = max(1 << 13, int(n_keys) * bits_per_key)
    m_bits = min(1 << (want - 1).bit_length(), 1 << 34)  # <= 2 GiB
    n_words = m_bits // 64

    right_keys = right_keys_ds.select_columns([right_on]).materialize()

    @ray.remote
    def block_bloom(tbl: pa.Table) -> np.ndarray:
        bm = np.zeros(n_words, dtype=np.uint64)
        col = tbl.column(right_on).combine_chunks().drop_null()
        if len(col):
            w, b = _bloom_probes(_keys_u64(col), m_bits, n_hashes)
            np.bitwise_or.at(bm, w.ravel(), b.ravel())
        return bm

    @ray.remote
    def or_merge(*bms: np.ndarray) -> np.ndarray:
        out = bms[0].copy()
        for b in bms[1:]:
            np.bitwise_or(out, b, out=out)
        return out

    refs = [block_bloom.remote(r) for r in right_keys.to_arrow_refs()]
    while len(refs) > 1:  # fan-in 8 tree: driver never sees >1 bitmap
        refs = [or_merge.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    bloom_ref = refs[0]

    def prefilter(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)  # plasma-local after first touch
        col = batch.column(left_on)
        valid = pc.is_valid(col)
        u = _keys_u64(pc.drop_null(col))
        if len(u) == 0:
            return batch.slice(0, 0)
        w, b = _bloom_probes(u, m_bits, n_hashes)
        hit = ((bm[w] & b) == b).all(axis=1)
        keep = np.zeros(batch.num_rows, dtype=bool)
        keep[valid.to_numpy(zero_copy_only=False)] = hit
        return batch.filter(pa.array(keep))

    survivors = left_ds.map_batches(prefilter, batch_format="pyarrow")
    return hash_join(survivors, right_keys, left_on=left_on,
                     right_on=right_on, right_cols=[], how="semi",
                     num_parts=num_parts)


def funnel_counts(events_ds, *, steps: tuple = ("view", "click", "purchase"),
                  ts_col: str = "ts", user_col: str = "user_id",
                  type_col: str = "event_type"):
    """Ordered funnel analysis: for each prefix of ``steps``, how many
    users performed those event types IN ORDER (each step strictly
    after the previous one's earliest qualifying time — the greedy
    earliest-match funnel, which with no time window decides ordered-
    subsequence reachability exactly). Output one row per step:
    (step, event_type, users), users monotonically non-increasing.

    Scale shape: the read ships only non-null (user, ts, type) rows of
    the step types (filter + projection before the shuffle); ONE
    hash(user) partition exchange co-locates each user's events and a
    per-partition scan reduces every user to a single small int (steps
    reached) with len(steps) vectorized passes (np.minimum.at per
    step, no per-user Python); each partition emits a len(steps)-row
    histogram, and a zero-count seed dataset pins the output contract
    (always one row per step, even on an empty funnel)."""
    import pandas as pd
    import ray

    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    step_list = list(steps)
    n_steps = len(step_list)

    P = parts_for(plan_rows(events_ds), rows_per_part=500_000)

    def prune(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column(type_col),
                        value_set=pa.array(step_list))
        t = batch.filter(keep)
        t = pa.table({"u": t.column(user_col),
                      "ts": t.column(ts_col),
                      "et": t.column(type_col)}).drop_null()
        part = ((t.column("u").to_numpy(zero_copy_only=False)
                 .astype(np.int64).view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(P)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def scan_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["et"].to_numpy()
        uniq, uidx = np.unique(u, return_inverse=True)
        nu = len(uniq)
        NEG, INF = np.int64(-2 ** 62), np.int64(2 ** 62)
        prev = np.full(nu, NEG)          # step 0 has no time constraint
        reached = np.zeros(nu, dtype=np.int64)
        alive = np.ones(nu, dtype=bool)
        for s in step_list:
            best = np.full(nu, INF)
            m = (et == s) & alive[uidx] & (ts > prev[uidx])
            np.minimum.at(best, uidx[m], ts[m])
            alive = best < INF
            reached[alive] += 1
            prev = best
        # a user at reached=k counts toward steps 0..k-1
        bc = np.bincount(reached, minlength=n_steps + 1)
        counts = bc[::-1].cumsum()[::-1][1:]
        # arrow out so the union with the arrow seed stays one block type
        return pa.table({"step": pa.array(np.arange(n_steps)),
                         "n": pa.array(counts.astype(np.int64))})

    seed = ray.data.from_arrow(pa.table({
        "step": pa.array(np.arange(n_steps)),
        "n": pa.array(np.zeros(n_steps, dtype=np.int64)),
    }))

    agg = events_ds.map_batches(prune, batch_format="pyarrow") \
        .groupby("part").map_groups(scan_part, batch_format="pandas") \
        .union(seed) \
        .groupby("step").aggregate(Sum("n", alias_name="users"))

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("step").to_numpy()
        return pa.table({
            "step": batch.column("step").cast(pa.int64()),
            "event_type": pa.array([step_list[i] for i in s],
                                   type=pa.string()),
            "users": batch.column("users").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def event_transitions(events_ds, *, ts_col: str = "ts",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      id_col: str = "event_id"):
    """First-order Markov transition counts over user journeys:
    (from_type, to_type, n) for every CONSECUTIVE event pair within a
    user (ordered by ts with event_id as the deterministic tie-break)
    — the sequence-mining complement of event_paths (paths enumerate
    whole journeys; transitions estimate the step model). Null
    user/ts rows are excluded on both engines.

    Scale shape: ONE hash(user) exchange (shared idiom with
    event_paths / weekly_churn); inside a partition the pairs are a
    shift-by-one against the (user, ts, id)-sorted arrays — no
    per-user Python — and per-partition partial counts make the final
    exchange a |types|^2 histogram."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(events_ds), rows_per_part=500_000)

    def prune(batch: pa.Table) -> pa.Table:
        t = pa.table({"u": batch.column(user_col),
                      "ts": batch.column(ts_col),
                      "eid": batch.column(id_col),
                      "et": batch.column(type_col)}).drop_null()
        part = ((t.column("u").to_numpy(zero_copy_only=False)
                 .astype(np.int64).view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(P)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def scan_part(g: pd.DataFrame) -> pa.Table:
        d = g.sort_values(["u", "ts", "eid"])
        u = d["u"].to_numpy(np.int64)
        et = d["et"].to_numpy()
        same = u[1:] == u[:-1]          # consecutive rows, same user
        frm, to = et[:-1][same], et[1:][same]
        if not len(frm):
            return pa.table({"f": pa.array([], type=pa.string()),
                             "t": pa.array([], type=pa.string()),
                             "n_p": pa.array([], type=pa.int64())})
        df = pd.DataFrame({"f": frm, "t": to}).groupby(["f", "t"]) \
            .size().reset_index(name="n_p")
        return pa.table({
            "f": pa.array(df["f"].to_numpy(), type=pa.string()),
            "t": pa.array(df["t"].to_numpy(), type=pa.string()),
            "n_p": pa.array(df["n_p"].to_numpy(np.int64)),
        })

    agg = events_ds.map_batches(prune, batch_format="pyarrow") \
        .groupby("part").map_groups(scan_part, batch_format="pandas") \
        .groupby(["f", "t"]).aggregate(Sum("n_p", alias_name="n"))

    return agg.map_batches(
        lambda b: pa.table({"from_type": b.column("f"),
                            "to_type": b.column("t"),
                            "n": b.column("n").cast(pa.int64())}),
        batch_format="pyarrow")


def value_zscores(events_ds, *, group_col: str = "event_type",
                  value_col: str = "value", id_col: str = "event_id",
                  round_to: int = 6):
    """Per-group standardization: z = (v - mean_g) / std_g with the
    POPULATION std — the feature-normalization step before anomaly
    thresholds or model inputs. Output (event_id, event_type, z),
    z rounded; zero-variance groups emit z = 0; null values dropped.
    std is computed as sqrt(E[v^2] - E[v]^2) on BOTH engines (the SQL
    twin uses the same closed form, not stddev_pop's streaming
    algorithm), so only summation order differs and the rounding
    absorbs it.

    Scale shape: pass 1 reduces to (group, n, sum, sumsq) partials —
    one tiny groupby; the per-group moments broadcast as a closure
    dict (|groups| entries); pass 2 is a stateless map."""
    from ray.data.aggregate import Sum

    def prune(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch.column(id_col),
                         "g": batch.column(group_col),
                         "v": batch.column(value_col)}).drop_null()

    src = events_ds.map_batches(prune, batch_format="pyarrow")

    def moments(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"g": batch.column("g").to_pylist(),
                           "v": batch.column("v").to_numpy()})
        agg = df.groupby("g", sort=True)["v"].agg(
            n="size", s="sum", ss=lambda x: float((x ** 2).sum()))
        return pa.table({
            "g": pa.array(agg.index.to_numpy(), type=pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "s": pa.array(agg["s"].to_numpy(np.float64)),
            "ss": pa.array(agg["ss"].to_numpy(np.float64)),
        })

    mom = src.map_batches(moments, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("n", alias_name="n"),
                                Sum("s", alias_name="s"),
                                Sum("ss", alias_name="ss")).to_pandas()
    stats = {}
    for _, r in mom.iterrows():
        mean = r["s"] / r["n"]
        var = r["ss"] / r["n"] - mean * mean
        stats[r["g"]] = (mean, float(np.sqrt(max(var, 0.0))))
    scale = 10.0 ** round_to

    def zmap(batch: pa.Table) -> pa.Table:
        gs = batch.column("g").to_pylist()
        v = batch.column("v").to_numpy().astype(np.float64)
        mean = np.array([stats[g][0] for g in gs])
        std = np.array([stats[g][1] for g in gs])
        z = np.where(std > 0, (v - mean) / np.where(std == 0, 1, std), 0.0)
        z = np.copysign(np.floor(np.abs(z) * scale + 0.5), z) / scale
        return pa.table({"event_id": batch.column("id"),
                         "event_type": batch.column("g"),
                         "z": pa.array(z)})

    return src.map_batches(zmap, batch_format="pyarrow")


def weekly_churn(events_ds, *, ts_col: str = "ts",
                 user_col: str = "user_id"):
    """Weekly activity + churn: for every Monday-truncated week,
    active = distinct users with >= 1 event; churned = those active
    users with NO event in the immediately following week (the last
    data week therefore reports all its actives as churned — the
    definition is data-relative on both engines). Output
    (week, active, churned).

    Scale shape: one hash(user) exchange co-locates each user's
    events (shared idiom with retention_cohorts); a partition reduces
    its users to distinct (user, week) pairs and next-week membership
    with one vectorized isin probe, emitting per-week partial counts;
    ONE tiny groupby(week) finishes."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(events_ds), rows_per_part=500_000)

    def prune(batch: pa.Table) -> pa.Table:
        t = pa.table({"u": batch.column(user_col),
                      "ts": batch.column(ts_col)}).drop_null()
        part = ((t.column("u").to_numpy(zero_copy_only=False)
                 .astype(np.int64).view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(P)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def scan_part(g: pd.DataFrame) -> pa.Table:
        u = g["u"].to_numpy(np.int64)
        days = g["ts"].to_numpy("datetime64[us]") \
            .astype("datetime64[D]").astype(np.int64)
        monday = days - (days + 3) % 7
        uw = np.unique(np.stack([u, monday], axis=1), axis=0)
        # is (user, week+7) also active? one probe against the same set
        key = uw[:, 0] * np.int64(1 << 20) + uw[:, 1] // 7
        churn = ~np.isin(key + 1, key)
        wk, inv = np.unique(uw[:, 1], return_inverse=True)
        act = np.bincount(inv, minlength=len(wk))
        ch = np.bincount(inv[churn], minlength=len(wk))
        return pa.table({"wk_days": pa.array(wk),
                         "a": pa.array(act.astype(np.int64)),
                         "c": pa.array(ch.astype(np.int64))})

    agg = events_ds.map_batches(prune, batch_format="pyarrow") \
        .groupby("part").map_groups(scan_part, batch_format="pandas") \
        .groupby("wk_days").aggregate(Sum("a", alias_name="active"),
                                      Sum("c", alias_name="churned"))

    def finish(batch: pa.Table) -> pa.Table:
        wk = batch.column("wk_days").to_numpy() \
            .astype("datetime64[D]").astype("datetime64[us]")
        return pa.table({
            "week": pa.array(wk),
            "active": batch.column("active").cast(pa.int64()),
            "churned": batch.column("churned").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def retention_cohorts(events_ds, *, ts_col: str = "ts",
                      user_col: str = "user_id"):
    """Cohort retention analysis: users cohort by the Monday-truncated
    week of their FIRST event; for each (cohort, week_offset) count
    the distinct users active offset weeks later — the classic
    retention triangle. Output (cohort:timestamp, week_offset:int64,
    users:int64); offset 0 rows equal the cohort sizes. Null user/ts
    rows are excluded on both engines.

    Scale shape: ONE hash(user) partition exchange co-locates each
    user's events (first week and active weeks live together), each
    partition reduces to distinct (user, week) pairs and emits
    (cohort, offset, n) partial counts vectorized (unique + cumsum
    group index, no per-user Python); the final groupby moves only
    O(weeks^2) histogram rows, never users."""
    import pandas as pd
    import ray

    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(events_ds), rows_per_part=500_000)

    def prune(batch: pa.Table) -> pa.Table:
        t = pa.table({"u": batch.column(user_col),
                      "ts": batch.column(ts_col)}).drop_null()
        part = ((t.column("u").to_numpy(zero_copy_only=False)
                 .astype(np.int64).view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(P)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def scan_part(g: pd.DataFrame) -> pa.Table:
        u = g["u"].to_numpy(np.int64)
        days = g["ts"].to_numpy("datetime64[us]") \
            .astype("datetime64[D]").astype(np.int64)
        # Monday truncation: epoch day 0 (1970-01-01) was a Thursday,
        # so weekday(Mon=0) = (days + 3) mod 7 — matches SQL
        # date_trunc('week', ts)
        monday = days - (days + 3) % 7
        uw = np.unique(np.stack([u, monday], axis=1), axis=0)
        uu, ww = uw[:, 0], uw[:, 1]
        starts = np.r_[True, uu[1:] != uu[:-1]]
        first = ww[starts]                    # per-user min week (sorted)
        cohort = first[np.cumsum(starts) - 1]
        offset = (ww - cohort) // 7
        key = np.stack([cohort, offset], axis=1)
        ukey, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({"cohort_days": pa.array(ukey[:, 0]),
                         "week_offset": pa.array(ukey[:, 1]),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = events_ds.map_batches(prune, batch_format="pyarrow") \
        .groupby("part").map_groups(scan_part, batch_format="pandas") \
        .groupby(["cohort_days", "week_offset"]) \
        .aggregate(Sum("n", alias_name="users"))

    def finish(batch: pa.Table) -> pa.Table:
        cohort = batch.column("cohort_days").to_numpy() \
            .astype("datetime64[D]").astype("datetime64[us]")
        return pa.table({
            "cohort": pa.array(cohort),
            "week_offset": batch.column("week_offset").cast(pa.int64()),
            "users": batch.column("users").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def event_paths(events_ds, *, first_k: int = 5,
                ts_col: str = "ts", user_col: str = "user_id",
                type_col: str = "event_type", id_col: str = "event_id"):
    """User-journey path analysis: each user's first ``first_k`` events
    (ordered by ts, with id as the deterministic tie-break) join into
    a '>'-separated path string; output the path distribution
    (path, n_users). The complement of funnel_counts — funnels ask
    about ONE ordered pattern, paths surface which patterns exist.

    Scale shape: a per-batch partial keeps at most first_k earliest
    rows per user it sees (two-level top-N), so the user shuffle moves
    <= first_k x batches rows per user, never all events; the
    hash(user)-partition stage assembles paths VECTORIZED (sort +
    cumcount + grouped join, no per-user Python), emits per-partition
    (path, n) partials, and one tiny groupby(path) finishes."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(events_ds), rows_per_part=500_000)

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "u": batch.column(user_col),
            "ts": batch.column(ts_col),
            "eid": batch.column(id_col),
            "et": batch.column(type_col),
        }).to_pandas()
        df = df[df["u"].notna()]
        df = df.sort_values(["u", "ts", "eid"]).groupby("u", sort=False) \
            .head(first_k)
        part = ((df["u"].to_numpy(np.int64).view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(P)
        df = df.assign(part=part.astype(np.int64))
        return pa.Table.from_pandas(df, preserve_index=False)

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["u", "ts", "eid"])
        d = d[d.groupby("u", sort=False).cumcount() < first_k]
        paths = d.groupby("u", sort=False)["et"].agg(">".join)
        out = paths.value_counts()
        return pd.DataFrame({"path": out.index.to_numpy(),
                             "n": out.to_numpy().astype(np.int64)})

    return events_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(assemble, batch_format="pandas") \
        .groupby("path").aggregate(Sum("n", alias_name="n_users"))


def weighted_sample(ds, *, n: int, weight_col: str,
                    key_col: str = "doc_id", salt: str = "ws0"):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis 2006): each row draws u from the md5 twin
    hash of (salt, key) and competes with race key ln(u)/weight —
    the top-n race keys are a weighted sample, inclusion probability
    proportional to weight. Content-keyed like train_val_split /
    epoch_shuffle: the same rows win on any cluster size or
    partitioning, and the SQL twin replays the identical race
    (md5_number_lower + ln; the key is rounded at 12dp and tied by
    key_col so both engines rank the same). Zero/negative/null
    weights never win (excluded on both sides).

    The canonical use: draw a training mix where long/high-quality
    docs are proportionally likelier, reproducibly.

    Scale shape: per-batch partials keep only their local top-n
    (vectorized argpartition), so the final exchange sorts
    <= n x batches rows, never the corpus."""
    def partial(batch: pa.Table) -> pa.Table:
        keys_np, race = _es_race(batch, key_col, weight_col, salt)
        # local top-n under the CONTRACT order (race DESC, key ASC):
        # argpartition alone breaks race ties arbitrarily, which can
        # evict the true global winner at a partial's cutoff
        order = np.lexsort((keys_np, -race))[:n]
        return pa.table({
            key_col: pa.array(keys_np[order]),
            "race": pa.array(race[order]),
        })

    return ds.select_columns([key_col, weight_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .sort(["race", key_col], descending=[True, False]) \
        .limit(n)


def _es_race(batch: pa.Table, key_col: str, weight_col: str,
             salt: str) -> tuple[np.ndarray, np.ndarray]:
    """The Efraimidis-Spirakis race key shared by weighted_sample and
    weighted_sample_by_group: u from the md5 twin hash of (salt, key),
    race = ln(u)/weight rounded half-away at 12dp (SQL round
    semantics). Zero/negative/null weights are dropped."""
    from rse_ray.pipelines.sketch import _md5_u64

    keys = batch.column(key_col).to_pylist()
    w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    ok = np.isfinite(w) & (w > 0)
    keys = [k for k, o in zip(keys, ok) if o]
    if not keys:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    w = w[ok]
    h = _md5_u64([f"{salt}|{k}" for k in keys])
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
    raw = np.log(u) / w
    race = np.copysign(np.floor(np.abs(raw) * 1e12 + 0.5), raw) / 1e12
    return np.asarray(keys, dtype=np.int64), race


def weighted_sample_by_group(ds, *, n: int, weight_col: str,
                             group_col: str, key_col: str = "doc_id",
                             salt: str = "ws0"):
    """Per-group deterministic weighted sampling without replacement:
    weighted_sample's Efraimidis-Spirakis race run INDEPENDENTLY in
    every group — "draw n docs per language, likelihood proportional
    to weight, reproducibly" (the training-mix curation step where
    quotas and quality weighting combine). Same content-keyed race as
    weighted_sample (identical salt -> a doc's race is the same in
    both ops), so results are partition- and cluster-size-invariant.
    Output (group, key, race).

    Scale shape: per-batch partials keep each group's local top-n
    (one vectorized lexsort + grouped cumcount, no per-group Python),
    so the final per-group exchange moves <= n x batches rows per
    group; ONE groupby(group) finishes."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        keys_np, race = _es_race(batch, key_col, weight_col, salt)
        groups = batch.column(group_col).to_pylist()
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = np.isfinite(w) & (w > 0)
        g = np.array([x for x, o in zip(groups, ok) if o], dtype=object)
        df = pd.DataFrame({group_col: g, key_col: keys_np, "race": race})
        df = df.sort_values([group_col, "race", key_col],
                            ascending=[True, False, True])
        df = df[df.groupby(group_col, sort=False).cumcount() < n]
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([group_col, "race", key_col],
                          ascending=[True, False, True])
        return d[d.groupby(group_col, sort=False).cumcount() < n] \
            .reset_index(drop=True)

    return ds.select_columns([group_col, key_col, weight_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(finish, batch_format="pandas")


def rolling_time_window(events_ds, *, hours: int = 24,
                        ts_col: str = "ts", user_col: str = "user_id",
                        id_col: str = "event_id",
                        value_col: str = "value"):
    """Time-RANGE rolling aggregates: for every event, the trailing
    ``hours``-window sum and count of the user's events — SQL's
    RANGE BETWEEN INTERVAL h PRECEDING AND CURRENT ROW frame,
    including same-timestamp peers on both edges. The sum contract is
    CENT-EXACT: values round to 2dp and accumulate as int64 cents
    (w_cents), so distributed prefix-sum order can never drift from
    the SQL window aggregate's summation order.

    Scale shape: hash(user) partitions co-locate each user's events
    (ONE shuffle); inside a partition the frame is two vectorized
    searchsorted probes against the user-sorted ts array plus a
    prefix-sum difference — O(n log n) per partition, no per-row
    Python, no O(n x window) rescan."""
    import pandas as pd

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(events_ds), rows_per_part=500_000)
    delta = np.timedelta64(hours, "h")

    def tag(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "u": batch.column(user_col),
            "ts": batch.column(ts_col),
            "eid": batch.column(id_col),
            "v": batch.column(value_col),
        }).drop_null()
        part = ((t.column("u").to_numpy(zero_copy_only=False)
                 .astype(np.int64).view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(P)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def frame(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["u", "ts", "eid"])
        v100 = d["v"].to_numpy(np.float64) * 100.0
        # half-away-from-zero, matching SQL round(value * 100)
        cents = np.copysign(np.floor(np.abs(v100) + 0.5), v100) \
            .astype(np.int64)
        ts = d["ts"].to_numpy("datetime64[us]")
        u = d["u"].to_numpy(np.int64)
        out_s = np.empty(len(d), dtype=np.int64)
        out_c = np.empty(len(d), dtype=np.int64)
        # per-user slices of the partition-sorted arrays
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[starts, len(u)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            t_ = ts[a:b]
            pref = np.r_[0, cents[a:b].cumsum()]
            lo = np.searchsorted(t_, t_ - delta, side="left")
            hi = np.searchsorted(t_, t_, side="right")
            out_s[a:b] = pref[hi] - pref[lo]
            out_c[a:b] = hi - lo
        return pd.DataFrame({
            "event_id": d["eid"].to_numpy(np.int64),
            "user_id": u,
            "w_cents": out_s,
            "w_cnt": out_c,
        })

    return events_ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("part").map_groups(frame, batch_format="pandas")


def group_corr(ds, *, group: str, x: str, y: str,
               out_col: str = "corr_xy", round_to: int = 6):
    """Per-group Pearson correlation of two numeric columns, as raw
    comoment partials: each batch pre-reduces to one
    (group, n, sx, sy, sxx, syy, sxy) row per group via Arrow
    group_by (zero-copy), the global groupby sums those, and the
    finish stage assembles corr = (n*sxy - sx*sy) /
    sqrt((n*sxx - sx^2)(n*syy - sy^2)). Pairs with a null on either
    side are dropped (SQL corr semantics); zero-variance groups yield
    null, matching DuckDB. Shuffle volume: 7 doubles per (batch,
    group) — independent of corpus size."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group, x, y]).drop_null()
        xv = pc.cast(t.column(x), pa.float64())
        yv = pc.cast(t.column(y), pa.float64())
        t = pa.table({
            group: t.column(group), "x": xv, "y": yv,
            "xx": pc.multiply(xv, xv), "yy": pc.multiply(yv, yv),
            "xy": pc.multiply(xv, yv),
        })
        g = t.group_by([group]).aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"),
             ("yy", "sum"), ("xy", "sum"), ([], "count_all")])
        return g.rename_columns(
            [group, "sx", "sy", "sxx", "syy", "sxy", "n"])

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        group
    ).aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        sx = batch.column("sx").to_numpy()
        sy = batch.column("sy").to_numpy()
        cov = n * batch.column("sxy").to_numpy() - sx * sy
        vx = n * batch.column("sxx").to_numpy() - sx * sx
        vy = n * batch.column("syy").to_numpy() - sy * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            r = cov / np.sqrt(vx * vy)
        r = np.round(r, round_to)
        mask = (vx > 0) & (vy > 0)
        return pa.table({
            group: batch.column(group),
            out_col: pa.array(np.where(mask, r, np.nan),
                              type=pa.float64(),
                              mask=~mask),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def zorder_key(ds, *, x_col: str, y_col: str, bits: int = 16,
               keep_cols: list[str] | None = None,
               out_col: str = "zval"):
    """Z-order (Morton) layout key: interleave the low ``bits`` bits
    of two integer dimensions into one sort key, so sorting by it
    co-locates rows that are close in BOTH dimensions — the layout
    trick (Delta/Iceberg OPTIMIZE ZORDER) that lets min/max row-group
    stats prune 2-D range predicates after the rewrite. This emits the
    key (and keeps ``keep_cols``); the layout itself is then just
    ``.sort(out_col)`` + a partitioned write, both existing stages.

    Vectorized: the interleave is ``bits`` shift/or passes over whole
    numpy columns, no per-row Python. Map-only, no shuffle (the sort
    that follows is the point of the exercise and is priced
    separately)."""
    keep = keep_cols if keep_cols is not None else [x_col, y_col]

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy().astype(np.int64)
        y = batch.column(y_col).to_numpy().astype(np.int64)
        z = np.zeros(len(x), dtype=np.int64)
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        cols = {c: batch.column(c) for c in keep}
        cols[out_col] = pa.array(z, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def skew_report(ds, *, key: str):
    """Key-skew diagnostic for shuffle planning — the first thing to
    run before any groupby/join at 100 TB decides whether it needs
    salting: per-key counts (one groupby of (key, partial) rows), then
    a single stats row over the count DISTRIBUTION:
    (n_keys, n_rows, max_count, p50, p99, top_key, skew_ratio) where
    skew_ratio = max_count / (n_rows / n_keys) — the hot key's
    multiple of a perfectly even spread. Quantiles use the repo's
    pinned quantile_cont (linear interpolation) convention. Null keys
    count as a key of their own (they land in one partition too —
    exactly why they matter for skew). The counts table is one row per
    DISTINCT key; folding it on the driver is fine for label-like
    keys, and the docstring contract (not a silent cap) says so."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_pylist()
        c: dict = {}
        for v in vals:
            kk = "\x00NULL" if v is None else str(v)
            c[kk] = c.get(kk, 0) + 1
        ks = sorted(c)
        return pa.table({
            "k": pa.array(ks, type=pa.string()),
            "n": pa.array([c[x] for x in ks], type=pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n")).to_pandas()
    n = counts["n"].to_numpy(dtype=np.int64)
    n_rows = int(n.sum())
    n_keys = len(n)
    top = counts.sort_values(["n", "k"],
                             ascending=[False, True]).iloc[0]
    mean = n_rows / n_keys
    return pd.DataFrame({
        "n_keys": pd.array([n_keys], dtype="int64"),
        "n_rows": pd.array([n_rows], dtype="int64"),
        "max_count": pd.array([int(n.max())], dtype="int64"),
        "p50": [round(float(np.quantile(n, 0.5)), 6)],
        "p99": [round(float(np.quantile(n, 0.99)), 6)],
        "top_key": [str(top["k"])],
        "skew_ratio": [round(float(n.max()) / mean, 6)],
    })


def grouping_sets_counts(documents_ds, *, keys=("lang", "source"),
                         val: str = "n_chars"):
    """GROUP BY GROUPING SETS ((lang), (source)) — the third member of
    the rollup/cube family: ONLY the two single-key grains, no detail
    grain, no grand total. Derived from the same one-shuffle fine
    aggregate as rollup/cube; absent keys surface as 'ALL'."""
    k1, k2 = keys
    fine = rollup_counts(documents_ds, keys=keys, val=val)
    detail = fine[(fine[k1] != "ALL") & (fine[k2] != "ALL")]
    lvl1 = detail.groupby(k1, as_index=False, dropna=False)[
        ["n_docs", "sum_chars"]].sum()
    lvl1[k2] = "ALL"
    lvl2 = detail.groupby(k2, as_index=False, dropna=False)[
        ["n_docs", "sum_chars"]].sum()
    lvl2[k1] = "ALL"
    cols = [k1, k2, "n_docs", "sum_chars"]
    return pd.concat([lvl1[cols], lvl2[cols]], ignore_index=True)


def ttl_dedup(events_ds, *, key_cols=("user_id", "event_type"),
              ts_col: str = "ts", id_col: str = "event_id",
              ttl_minutes: int = 60):
    """TTL-windowed dedup — the streaming visited set with expiring
    state: a row is a duplicate iff the SAME key occurred within the
    previous ``ttl_minutes`` (by event time; ties broken by id). Kept
    rows = first occurrence, plus re-occurrences after a quiet gap —
    exactly the at-most-once-per-TTL suppression an alerting/ingest
    pipeline runs, with state that expires instead of growing forever
    (the scale difference from the reference's unbounded Redis set).
    One groupby(key) shuffle; per group it's one sorted diff against
    the PREVIOUS occurrence (sliding semantics: a suppressed row still
    arms the window for its successors, matching lag() in SQL)."""
    keys = list(key_cols)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        prev = g[ts_col].shift(1)
        gap = (g[ts_col] - prev).dt.total_seconds()
        keep = prev.isna() | (gap > ttl_minutes * 60)
        return g[keep]

    return (events_ds.select_columns(keys + [ts_col, id_col])
            .groupby(keys)
            .map_groups(fold, batch_format="pandas"))


def group_ols(lineitem_ds, *, group: str = "l_returnflag",
              x: str = "l_quantity", y: str = "l_extendedprice"):
    """Per-group ordinary-least-squares line fit (the distributed
    regr_slope/regr_intercept aggregate): for each group,

        slope     = (n * Sxy - Sx * Sy) / (n * Sxx - Sx^2)
        intercept = (Sy - slope * Sx) / n

    computed from per-batch partial sufficient statistics (n, Sx, Sy,
    Sxx, Sxy) — the textbook combiner form, so the shuffle moves five
    doubles per (batch, group) instead of the rows. Output (group, n,
    slope, intercept) rounded to 4 places. The SQL twin spells out the
    SAME sum formula (not regr_slope) so both engines share one float
    contract; 4 places (not the usual 6) because n*Sxy - Sx*Sy is a
    cancelling difference of ~1e16-scale sums accumulated in different
    orders by the two engines — the residual is ~1e-6 absolute, well
    inside a 5e-5 boundary but not a 5e-7 one."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        xs = batch.column(x)
        ys = batch.column(y)
        t = pa.table({
            group: batch.column(group),
            "_x": xs, "_y": ys,
            "_xx": pc.multiply(xs, xs),
            "_xy": pc.multiply(xs, ys),
        })
        g = t.group_by([group]).aggregate(
            [("_x", "sum"), ("_y", "sum"), ("_xx", "sum"),
             ("_xy", "sum"), ([], "count_all")])
        return pa.table({
            group: g.column(group),
            "sx_p": g.column("_x_sum"), "sy_p": g.column("_y_sum"),
            "sxx_p": g.column("_xx_sum"), "sxy_p": g.column("_xy_sum"),
            "n_p": g.column("count_all"),
        })

    agg = lineitem_ds.select_columns([group, x, y]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group).aggregate(
            Sum("sx_p", alias_name="sx"), Sum("sy_p", alias_name="sy"),
            Sum("sxx_p", alias_name="sxx"),
            Sum("sxy_p", alias_name="sxy"),
            Sum("n_p", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        sx = batch.column("sx").to_numpy()
        sy = batch.column("sy").to_numpy()
        sxx = batch.column("sxx").to_numpy()
        sxy = batch.column("sxy").to_numpy()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pa.table({
            group: batch.column(group),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "slope": pa.array(np.round(slope, 4), type=pa.float64()),
            "intercept": pa.array(np.round(intercept, 4),
                                  type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def market_basket(lineitem_ds, *, min_pair: int = 2,
                  num_parts: int | None = None):
    """Frequent-itemset pair mining (market-basket co-occurrence with
    lift): baskets = orders, items = distinct parts in the order.
    -> (part_a, part_b, n_pair, n_a, n_b, lift) for pairs co-occurring
    in >= ``min_pair`` baskets, with lift = n_pair * n_baskets /
    (n_a * n_b) rounded to 6 places (all inputs integer counts, so the
    double is identical on both engines).

    Scale shape: ONE hash(orderkey)-partition shuffle co-locates each
    basket (the related_pages idiom — P partition tasks, not one
    map_groups call per order); every partition task run-detects its
    baskets after one sort, generates pairs vectorized (triu per
    basket, fan-out bounded by basket width), and PRE-AGGREGATES pair
    counts, per-part memberships and its basket count before the
    final groupby((a, b)) exchange. Item supports (vocabulary-sized,
    << corpus) broadcast into the finish map; at 1e8+ distinct items
    swap the broadcast for the repo's hash_join."""
    import ray

    from rse_ray.util import parts_for, plan_rows

    P = num_parts if num_parts is not None else \
        parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    def clean(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_orderkey", "l_partkey"]) \
            .group_by(["l_orderkey", "l_partkey"]).aggregate([])
        return t.append_column(
            "part", _mod_parts(t.column("l_orderkey"), P))

    _triu_cache: dict = {}

    def gen_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["l_orderkey", "l_partkey"]) \
            .sort_values(["l_orderkey", "l_partkey"])
        items = df["l_partkey"].to_numpy()
        _, starts, counts = np.unique(df["l_orderkey"].to_numpy(),
                                      return_index=True,
                                      return_counts=True)
        n_baskets = len(starts)
        a_p, b_p = [], []
        for s0, c in zip(starts, counts):
            if c < 2:
                continue
            if c not in _triu_cache:
                _triu_cache[c] = np.triu_indices(c, k=1)
            iu, ju = _triu_cache[c]
            sl = items[s0:s0 + c]
            a_p.append(sl[iu])
            b_p.append(sl[ju])
        rows = []
        if a_p:
            pairs = pd.DataFrame({"part_a": np.concatenate(a_p),
                                  "part_b": np.concatenate(b_p)})
            rows.append(pairs.groupby(["part_a", "part_b"],
                                      sort=False).size()
                        .reset_index(name="n"))
        mn, mc = np.unique(items, return_counts=True)
        rows.append(pd.DataFrame(
            {"part_a": mn, "part_b": np.int64(-1), "n": mc}))
        rows.append(pd.DataFrame({"part_a": [np.int64(-2)],
                                  "part_b": [np.int64(-2)],
                                  "n": [np.int64(n_baskets)]}))
        out = pd.concat(rows, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    def repart2(batch: pa.Table) -> pa.Table:
        # second partition pass: all copies of a (part_a, *) row land
        # together, so an in-partition pandas sum IS the global merge
        # (Ray's own multi-key Aggregate walks ~1e5 group boundaries
        # per block far slower than one vectorized groupby per task)
        if "part_a" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"part_a": pa.array([], type=pa.int64()),
                             "part_b": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "p2": pa.array([], type=pa.int64())})
        return batch.append_column(
            "p2", _mod_parts(batch.column("part_a"), P))

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["part_a", "part_b"], sort=False)["n"] \
            .sum().reset_index(name="n_pair")
        out["n_pair"] = out["n_pair"].astype(np.int64)
        return out

    agg = lineitem_ds.map_batches(clean, batch_format="pyarrow") \
        .groupby("part").map_groups(gen_part, batch_format="pandas") \
        .map_batches(repart2, batch_format="pyarrow") \
        .groupby("p2").map_groups(merge_part, batch_format="pandas") \
        .materialize()

    def only_meta(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("part_b"),
                                    pa.scalar(0, pa.int64())))

    meta = agg.map_batches(only_meta, batch_format="pyarrow") \
        .to_pandas()
    n_baskets = float(meta.loc[meta["part_a"] == -2, "n_pair"].sum())
    support = dict(zip(meta.loc[meta["part_a"] >= 0, "part_a"],
                       meta.loc[meta["part_a"] >= 0, "n_pair"]
                       .astype(np.int64)))
    sup_ref = ray.put(support)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "part_a": pa.array([], type=pa.int64()),
            "part_b": pa.array([], type=pa.int64()),
            "n_pair": pa.array([], type=pa.int64()),
            "n_a": pa.array([], type=pa.int64()),
            "n_b": pa.array([], type=pa.int64()),
            "lift": pa.array([], type=pa.float64()),
        })
        if "part_a" not in batch.column_names or batch.num_rows == 0:
            return empty
        sup = ray.get(sup_ref)
        pa_ = batch.column("part_a").to_numpy()
        pb_ = batch.column("part_b").to_numpy()
        n = batch.column("n_pair").to_numpy().astype(np.int64)
        keep = (pb_ >= 0) & (n >= min_pair)
        if not keep.any():
            return empty
        pa_, pb_, n = pa_[keep], pb_[keep], n[keep]
        na = np.array([sup[p] for p in pa_], dtype=np.int64)
        nb = np.array([sup[p] for p in pb_], dtype=np.int64)
        lift = n.astype(np.float64) * n_baskets \
            / (na.astype(np.float64) * nb.astype(np.float64))
        return pa.table({
            "part_a": pa.array(pa_, type=pa.int64()),
            "part_b": pa.array(pb_, type=pa.int64()),
            "n_pair": pa.array(n, type=pa.int64()),
            "n_a": pa.array(na, type=pa.int64()),
            "n_b": pa.array(nb, type=pa.int64()),
            # half-AWAY: n*N/(na*nb) ratios with power-of-two
            # denominators land on exact half-ulp boundaries where
            # np.round's half-even disagrees with the oracle
            "lift": pa.array(np.floor(lift * 1e6 + 0.5) / 1e6,
                             type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def trending_event_types(events_ds, *, window_days: int = 7):
    """Window-over-window trend detection: per event_type, event count
    in the trailing ``window_days`` window (anchored at the corpus max
    timestamp) vs the window before it, with the add-one-smoothed lift
    (n_cur + 1) / (n_prev + 1) rounded to 6 places — the ES
    significant-terms-over-time / trending-topics shape.
    -> (event_type, n_cur, n_prev, lift).

    Scale shape: one tiny max(ts) scalar pass, then per-batch partial
    counts (two ints per (batch, type)) through ONE groupby."""
    from ray.data.aggregate import Sum

    anchor = events_ds.max("ts")
    anchor64 = np.datetime64(anchor, "us")
    lo_cur = anchor64 - np.timedelta64(window_days, "D")
    lo_prev = anchor64 - np.timedelta64(2 * window_days, "D")

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy()
        et = batch.column("event_type")
        cur = ts > lo_cur
        prev = (ts > lo_prev) & ~cur
        t = pa.table({
            "event_type": et,
            "c_p": pa.array(cur.astype(np.int64)),
            "p_p": pa.array(prev.astype(np.int64)),
        })
        g = t.group_by(["event_type"]).aggregate(
            [("c_p", "sum"), ("p_p", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "c_p": g.column("c_p_sum"),
                         "p_p": g.column("p_p_sum")})

    agg = events_ds.select_columns(["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("c_p", alias_name="n_cur"),
            Sum("p_p", alias_name="n_prev"))

    def finish(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_cur").to_numpy().astype(np.float64)
        np_ = batch.column("n_prev").to_numpy().astype(np.float64)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_cur": pc.cast(batch.column("n_cur"), pa.int64()),
            "n_prev": pc.cast(batch.column("n_prev"), pa.int64()),
            "lift": pa.array(np.round((nc + 1.0) / (np_ + 1.0), 6),
                             type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def ab_test_welch(events_ds, *, group_col: str = "event_type",
                  val_col: str = "value", group_a: str = "click",
                  group_b: str = "purchase"):
    """Welch's unequal-variance t-test between two groups' value
    distributions — the A/B-test aggregate, computed from per-batch
    partial sufficient statistics (n, Sx, Sxx per group; three doubles
    per batch-group cross the shuffle):

        t  = (m_a - m_b) / sqrt(s2_a/n_a + s2_b/n_b)
        df = (s2_a/n_a + s2_b/n_b)^2
             / ((s2_a/n_a)^2/(n_a-1) + (s2_b/n_b)^2/(n_b-1))

    with s2 the sample variance (Sxx - Sx^2/n) / (n - 1). One-row
    output (group_a, group_b, n_a, n_b, mean_a, mean_b, t_stat, df),
    floats rounded to 6 places; the SQL twin spells the same sum
    formula."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = batch.column(val_col)
        keep = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t = pa.table({"g": g, "v": v,
                      "vv": pc.multiply(v, v)}).filter(keep)
        gg = t.group_by(["g"]).aggregate(
            [("v", "sum"), ("vv", "sum"), ([], "count_all")])
        return pa.table({"g": gg.column("g"),
                         "sx_p": gg.column("v_sum"),
                         "sxx_p": gg.column("vv_sum"),
                         "n_p": gg.column("count_all")})

    agg = events_ds.select_columns([group_col, val_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("sx_p", alias_name="sx"),
                                Sum("sxx_p", alias_name="sxx"),
                                Sum("n_p", alias_name="n")).to_pandas()

    stats = {}
    for _, r in agg.iterrows():
        n = float(r["n"])
        m = r["sx"] / n
        s2 = (r["sxx"] - r["sx"] * r["sx"] / n) / (n - 1.0)
        stats[r["g"]] = (n, m, s2)
    na, ma, s2a = stats[group_a]
    nb, mb, s2b = stats[group_b]
    se2 = s2a / na + s2b / nb
    t_stat = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((s2a / na) ** 2 / (na - 1.0)
                      + (s2b / nb) ** 2 / (nb - 1.0))
    return pa.table({
        "group_a": pa.array([group_a]), "group_b": pa.array([group_b]),
        "n_a": pa.array([int(na)], type=pa.int64()),
        "n_b": pa.array([int(nb)], type=pa.int64()),
        "mean_a": pa.array([np.round(ma, 6)], type=pa.float64()),
        "mean_b": pa.array([np.round(mb, 6)], type=pa.float64()),
        "t_stat": pa.array([np.round(t_stat, 6)], type=pa.float64()),
        "df": pa.array([np.round(df, 6)], type=pa.float64()),
    })


def mad_outliers(events_ds, *, group: str = "event_type",
                 col: str = "value", id_col: str = "event_id",
                 k: float = 3.0):
    """Robust per-group outlier detection by median absolute
    deviation: a row is an outlier when

        |v - median(v)| > k * 1.4826 * median(|v - median(v)|)

    (1.4826 = the consistency constant making MAD estimate sigma for
    normal data). -> (event_id, event_type, value) of outliers.

    Scale shape: ONE groupby(group) shuffle computes (median, mad)
    per group exactly (np.quantile == quantile_cont interpolation,
    the group_quantiles contract — groups must fit a task; use the
    histogram-sketch approx_quantiles beyond that); the tiny
    per-group stats table is broadcast into a stateless filter map
    over the full stream."""
    import ray

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        v = g[col].to_numpy()
        med = float(np.quantile(v, 0.5))
        mad = float(np.quantile(np.abs(v - med), 0.5))
        return pd.DataFrame({group: [g[group].iloc[0]],
                             "med": [med], "mad": [mad]})

    st = events_ds.select_columns([group, col]) \
        .groupby(group).map_groups(stats, batch_format="pandas") \
        .to_pandas()
    thr = {r[group]: (r["med"], k * 1.4826 * r["mad"])
           for _, r in st.iterrows()}
    thr_ref = ray.put(thr)

    def pick(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        g = batch.column(group).to_pylist()
        v = batch.column(col).to_numpy()
        med = np.array([t[x][0] for x in g])
        lim = np.array([t[x][1] for x in g])
        keep = pa.array(np.abs(v - med) > lim)
        return pa.table({
            id_col: batch.column(id_col).filter(keep),
            group: batch.column(group).filter(keep),
            col: batch.column(col).filter(keep),
        })

    return events_ds.select_columns([id_col, group, col]) \
        .map_batches(pick, batch_format="pyarrow")


def user_ewma(events_ds, *, by: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", col: str = "value",
              alpha: float = 0.3):
    """Final exponentially-weighted moving average per user over the
    (ts, event_id)-ordered event stream: e_1 = v_1, e_i = alpha * v_i
    + (1 - alpha) * e_{i-1}. Both engines evaluate the CLOSED FORM

        e_n = (1-a)^(n-1) v_1 + sum_{i=2..n} a (1-a)^(n-i) v_i

    (one shared float contract — the recursion would accumulate in a
    different order than SQL can express). -> (user_id, n_events,
    ewma) with ewma rounded to 6 places. One groupby(user) shuffle;
    each group folds locally."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[id_col].to_numpy(), g[ts_col].to_numpy()))
        v = g[col].to_numpy()[order]
        n = len(v)
        i = np.arange(1, n + 1, dtype=np.float64)
        w = alpha * np.power(1.0 - alpha, n - i)
        w[0] = np.power(1.0 - alpha, n - 1)
        return pd.DataFrame({
            by: [g[by].iloc[0]],
            "n_events": np.array([n], dtype=np.int64),
            "ewma": [round(float(np.sum(w * v)), 6)],
        })

    return events_ds.select_columns([by, ts_col, id_col, col]) \
        .groupby(by).map_groups(fold, batch_format="pandas")


def scd2_intervals(events_ds, *, by: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   state_col: str = "event_type"):
    """Slowly-changing-dimension (type 2) interval build: collapse
    each user's (ts, event_id)-ordered event stream into state
    validity intervals — a row per RUN of equal ``state_col`` values,
    with valid_from = first ts of the run and valid_to = first ts of
    the next run (null for the current state). The classic CDC ->
    dimension-table ETL. -> (user_id, event_type, valid_from,
    valid_to, n_events).

    Scale shape: ONE groupby(user) shuffle; each group folds locally
    with vectorized run-length encoding (no Python per-row)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[id_col].to_numpy(), g[ts_col].to_numpy()))
        st = g[state_col].to_numpy()[order]
        ts = g[ts_col].to_numpy()[order]
        new_run = np.ones(len(st), dtype=bool)
        new_run[1:] = st[1:] != st[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(st))
        valid_to = np.append(ts[starts[1:]],
                             np.array([np.datetime64("NaT")],
                                      dtype=ts.dtype))
        return pd.DataFrame({
            by: g[by].iloc[0],
            state_col: st[starts],
            "valid_from": ts[starts],
            "valid_to": valid_to,
            "n_events": (ends - starts).astype(np.int64),
        })

    return events_ds.select_columns([by, ts_col, id_col, state_col]) \
        .groupby(by).map_groups(fold, batch_format="pandas")


def shipping_priority(customer_ds, orders_ds, lineitem_ds, *,
                      segment: str = "BUILDING",
                      cutoff: str = "1995-03-15", k: int = 10):
    """TPC-H Q3 shape (the canonical 3-way join): unshipped-revenue
    top-k — customers of one market segment, orders placed before
    ``cutoff``, line items shipped after it; revenue =
    sum(l_extendedprice * (1 - l_discount)) per order. -> (o_orderkey,
    o_orderdate, revenue) ordered (revenue DESC, o_orderdate ASC,
    o_orderkey ASC) LIMIT k, revenue rounded to 2 places after
    ranking on the raw double (the pricing_summary convention).

    Scale shape: the segment filter runs AT the customer scan; the
    customer->orders step is a SEMI hash join (only the key set
    ships); orders->lineitem is a co-partitioned inner hash join;
    revenue partials pre-aggregate inside each batch before the final
    small groupby; the top-k cut is block-local head then driver
    reduce of blocks x k rows."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    cut = np.datetime64(cutoff, "us")
    # input-derived partition count from the cheap metadata row count
    # (hash_join's internal default would count() the lazy FILTER
    # chain, re-executing it)
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    cust = customer_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), segment))
        .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = orders_ds.map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"),
                                   pa.scalar(cut)))
        .select(["o_orderkey", "o_custkey", "o_orderdate"]),
        batch_format="pyarrow")
    # semi join: orders of segment customers (key set only ships)
    o_seg = auto_join(orders, cust, left_on="o_custkey",
                      right_on="c_custkey", right_cols=[], how="semi",
                      num_parts=P)
    li = lineitem_ds.map_batches(
        lambda b: b.filter(pc.greater(b.column("l_shipdate"),
                                      pa.scalar(cut)))
        .select(["l_orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")
    joined = auto_join(li, o_seg, left_on="l_orderkey",
                       right_on="o_orderkey",
                       right_cols=["o_orderdate"], how="inner",
                       num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        g = batch.append_column("rev", rev) \
            .group_by(["l_orderkey", "o_orderdate"]) \
            .aggregate([("rev", "sum")])
        return pa.table({"o_orderkey": g.column("l_orderkey"),
                         "o_orderdate": g.column("o_orderdate"),
                         "rev_p": g.column("rev_sum")})

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby(["o_orderkey", "o_orderdate"]) \
        .aggregate(Sum("rev_p", alias_name="revenue"))

    def block_head(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["revenue", "o_orderdate", "o_orderkey"],
                           ascending=[False, True, True]).head(k),
            preserve_index=False)

    out = agg.map_batches(block_head, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    out = out.sort_values(["revenue", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True]) \
        .head(k).reset_index(drop=True)
    out["revenue"] = out["revenue"].round(2)
    return out[["o_orderkey", "o_orderdate", "revenue"]]


def winsorized_mean(events_ds, *, group: str = "event_type",
                    col: str = "value", lo: float = 0.05,
                    hi: float = 0.95):
    """Robust per-group mean with winsorization: values are CLIPPED
    to the group's [q_lo, q_hi] quantiles (np.quantile linear ==
    quantile_cont) before averaging — the outlier-insensitive KPI
    aggregate. -> (group, n, q_lo, q_hi, wins_mean), floats rounded
    to 6 places.

    Scale shape: ONE groupby(group) shuffle computes the two
    quantiles exactly per group (same co-residence contract as
    group_quantiles); the tiny bounds table broadcasts into a
    clip-and-partial-sum map, then a second small groupby sums. Two
    passes, no row-level data on the driver."""
    import ray
    from ray.data.aggregate import Sum

    def bounds(g: pd.DataFrame) -> pd.DataFrame:
        v = g[col].to_numpy()
        return pd.DataFrame({
            group: [g[group].iloc[0]],
            "q_lo": [float(np.quantile(v, lo))],
            "q_hi": [float(np.quantile(v, hi))],
        })

    b = events_ds.select_columns([group, col]) \
        .groupby(group).map_groups(bounds, batch_format="pandas") \
        .to_pandas()
    bmap = {r[group]: (r["q_lo"], r["q_hi"]) for _, r in b.iterrows()}
    b_ref = ray.put(bmap)

    def partial(batch: pa.Table) -> pa.Table:
        bm = ray.get(b_ref)
        g = batch.column(group).to_pylist()
        v = batch.column(col).to_numpy()
        lo_a = np.array([bm[x][0] for x in g])
        hi_a = np.array([bm[x][1] for x in g])
        w = np.minimum(np.maximum(v, lo_a), hi_a)
        t = pa.table({group: batch.column(group),
                      "w": pa.array(w, type=pa.float64())})
        gg = t.group_by([group]).aggregate(
            [("w", "sum"), ([], "count_all")])
        return pa.table({group: gg.column(group),
                         "s_p": gg.column("w_sum"),
                         "n_p": gg.column("count_all")})

    agg = events_ds.select_columns([group, col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group).aggregate(Sum("s_p", alias_name="s"),
                                  Sum("n_p", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        bm = ray.get(b_ref)
        g = batch.column(group).to_pylist()
        n = batch.column("n").to_numpy().astype(np.float64)
        s = batch.column("s").to_numpy()
        return pa.table({
            group: batch.column(group),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "q_lo": pa.array(np.round([bm[x][0] for x in g], 6),
                             type=pa.float64()),
            "q_hi": pa.array(np.round([bm[x][1] for x in g], 6),
                             type=pa.float64()),
            "wins_mean": pa.array(np.round(s / n, 6),
                                  type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def consistent_hash_moves(ds, *, id_col: str = "doc_id",
                          n_before: int = 8, n_after: int = 9,
                          vnodes: int = 32):
    """Consistent-hash ring resharding audit — how much data moves
    when the shard count grows from ``n_before`` to ``n_after``
    (the reason the ring beats mod-N at fleet scale: ~1/N moves, not
    (N-1)/N): each shard projects ``vnodes`` ring points at
    md5('ring:<shard>:<vnode>'); a key at md5('key:<id>') belongs to
    the first ring point clockwise (wrap to the ring minimum). ->
    one row per (shard_before, shard_after) flow with its key count
    — the movement matrix (diagonal = stayed).

    Scale shape: both rings are tiny (shards x vnodes) and broadcast
    as sorted arrays; assignment is a vectorized searchsorted per
    batch; ONE groupby((before, after)) on pre-aggregated partials.
    The same md5_number_lower twin convention as every content hash
    here."""
    from ray.data.aggregate import Sum

    from rse_ray.pipelines.sketch import _md5_u64

    def ring(n: int) -> tuple[np.ndarray, np.ndarray]:
        pts, owner = [], []
        for s in range(n):
            for v in range(vnodes):
                pts.append(f"ring:{s}:{v}")
                owner.append(s)
        h = _md5_u64(pts)
        order = np.argsort(h, kind="stable")
        return h[order], np.array(owner, dtype=np.int64)[order]

    r_b, o_b = ring(n_before)
    r_a, o_a = ring(n_after)

    def assign(h: np.ndarray, pts: np.ndarray,
               own: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(pts, h, side="left")
        idx = np.where(idx == len(pts), 0, idx)  # wrap past the top
        return own[idx]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = _md5_u64([f"key:{i}" for i in ids])
        sb = assign(h, r_b, o_b)
        sa = assign(h, r_a, o_a)
        t = pa.table({"shard_before": pa.array(sb, type=pa.int64()),
                      "shard_after": pa.array(sa, type=pa.int64())})
        g = t.group_by(["shard_before", "shard_after"]).aggregate(
            [([], "count_all")])
        return pa.table({"shard_before": g.column("shard_before"),
                         "shard_after": g.column("shard_after"),
                         "n_p": g.column("count_all")})

    agg = ds.select_columns([id_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["shard_before", "shard_after"]) \
        .aggregate(Sum("n_p", alias_name="n_keys"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "shard_before": batch.column("shard_before"),
            "shard_after": batch.column("shard_after"),
            "n_keys": pc.cast(batch.column("n_keys"), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def group_moments(events_ds, *, group: str = "event_type",
                  col: str = "value"):
    """Per-group higher-moment shape statistics — POPULATION skewness
    and excess kurtosis from raw power sums (the mergeable form:
    per-batch partials ship five doubles per group):

        m  = s1/n,  m2 = s2/n - m*m
        m3 = s3/n - 3*m*(s2/n) + 2*m^3
        m4 = s4/n - 4*m*(s3/n) + 6*m^2*(s2/n) - 3*m^4
        skew = m3 / m2^1.5,  kurtosis = m4 / m2^2 - 3

    -> (group, n, mean, skewness, kurtosis) rounded to 6 places. The
    SQL twin spells the SAME expressions (DuckDB's built-in
    skewness()/kurtosis() apply sample corrections — a different
    statistic)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        v2 = pc.multiply(v, v)
        t = pa.table({group: batch.column(group), "v": v, "v2": v2,
                      "v3": pc.multiply(v2, v),
                      "v4": pc.multiply(v2, v2)})
        g = t.group_by([group]).aggregate(
            [("v", "sum"), ("v2", "sum"), ("v3", "sum"),
             ("v4", "sum"), ([], "count_all")])
        return pa.table({group: g.column(group),
                         "s1_p": g.column("v_sum"),
                         "s2_p": g.column("v2_sum"),
                         "s3_p": g.column("v3_sum"),
                         "s4_p": g.column("v4_sum"),
                         "n_p": g.column("count_all")})

    agg = events_ds.select_columns([group, col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group).aggregate(
            Sum("s1_p", alias_name="s1"), Sum("s2_p", alias_name="s2"),
            Sum("s3_p", alias_name="s3"), Sum("s4_p", alias_name="s4"),
            Sum("n_p", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        s1 = batch.column("s1").to_numpy()
        s2 = batch.column("s2").to_numpy()
        s3 = batch.column("s3").to_numpy()
        s4 = batch.column("s4").to_numpy()
        m = s1 / n
        m2 = s2 / n - m * m
        m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
        m4 = s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) \
            - 3.0 * m * m * m * m
        skew = m3 / np.power(m2, 1.5)
        kurt = m4 / (m2 * m2) - 3.0
        return pa.table({
            group: batch.column(group),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "mean": pa.array(np.round(m, 6), type=pa.float64()),
            "skewness": pa.array(np.round(skew, 6),
                                 type=pa.float64()),
            "kurtosis": pa.array(np.round(kurt, 6),
                                 type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def user_burstiness(events_ds, *, by: str = "user_id",
                    ts_col: str = "ts", id_col: str = "event_id"):
    """Inter-arrival burstiness per user: the coefficient of
    variation of the gaps between consecutive events (CV = 1 for a
    Poisson process, > 1 bursty, < 1 regular — the standard traffic /
    bot-detection shape statistic). Gaps in seconds over the
    (ts, event_id) order; population moments; users with fewer than 2
    events drop. -> (user_id, n_gaps, mean_gap_s, cv), rounded to 6
    places; an all-equal-timestamp user pins cv = 0.

    Scale shape: ONE groupby(user) shuffle, vectorized diff inside
    each group."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({by: [], "n_gaps": [],
                                 "mean_gap_s": [], "cv": []})
        order = np.lexsort((g[id_col].to_numpy(), g[ts_col].to_numpy()))
        ts = g[ts_col].to_numpy()[order].astype("datetime64[us]")
        gaps_us = np.diff(ts).astype(np.int64)
        gaps = gaps_us.astype(np.float64) / 1e6
        n = float(len(gaps))
        # exact integer-us sum -> ONE float division: the mean is
        # bit-identical in both engines (a float-summed s1 differed
        # by 1 ulp from the oracle's sum order and flipped 6-dp
        # rounding on two sf0.1 users)
        s1_us = int(gaps_us.sum())
        s2 = float(np.sum(gaps * gaps))
        mean = s1_us / (n * 1e6)
        var = max(s2 / n - mean * mean, 0.0)
        cv = 0.0 if mean == 0 else math.sqrt(var) / mean
        return pd.DataFrame({
            by: [g[by].iloc[0]],
            "n_gaps": np.array([int(n)], dtype=np.int64),
            # half-AWAY: gap means are exact 1e-6 multiples divided
            # by small ints — they land on half boundaries where
            # python/np half-even disagrees with the oracle
            "mean_gap_s": [math.floor(mean * 1e6 + 0.5) / 1e6],
            "cv": [math.floor(cv * 1e6 + 0.5) / 1e6],
        })

    return events_ds.select_columns([by, ts_col, id_col]) \
        .groupby(by).map_groups(fold, batch_format="pandas")


def fk_violations(customer_ds, orders_ds, lineitem_ds):
    """Referential-integrity audit (the warehouse-ingest data-quality
    gate): orphan counts per foreign-key relationship — lineitems
    whose l_orderkey has no order, orders whose o_custkey has no
    customer. -> (relationship, n_rows, n_orphans).

    Scale shape: each relationship is one ANTI hash join (only the
    parent KEY SET ships — hash_join semi/anti contract) plus one
    tiny count; nothing materializes beyond scalars."""
    import pandas as pd

    def count(ds) -> int:
        return int(ds.count())

    li_orphans = auto_join(
        lineitem_ds.select_columns(["l_orderkey"]),
        orders_ds.select_columns(["o_orderkey"]),
        left_on="l_orderkey", right_on="o_orderkey",
        right_cols=[], how="anti")
    ord_orphans = auto_join(
        orders_ds.select_columns(["o_custkey"]),
        customer_ds.select_columns(["c_custkey"]),
        left_on="o_custkey", right_on="c_custkey",
        right_cols=[], how="anti")
    return pd.DataFrame({
        "relationship": ["lineitem.l_orderkey -> orders",
                         "orders.o_custkey -> customer"],
        "n_rows": np.array([count(lineitem_ds), count(orders_ds)],
                           dtype=np.int64),
        "n_orphans": np.array([count(li_orphans), count(ord_orphans)],
                              dtype=np.int64),
    })


def conversion_latency(events_ds, *, from_type: str = "signup",
                       to_type: str = "purchase",
                       qs: tuple = (0.5, 0.9)):
    """Funnel latency distribution: per user, the time from the FIRST
    ``from_type`` event to the FIRST ``to_type`` event at-or-after it;
    summarized as converter count plus exact quantiles of the latency
    in seconds (np.quantile linear == quantile_cont). -> one row
    (n_converted, q50_s, q90_s).

    Scale shape: ONE groupby(user) shuffle; each group folds to at
    most one latency scalar; the quantile runs over the
    converter-count-sized collect (users who converted — a bounded
    funnel output, not the event stream)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(),
                            g["ts"].to_numpy()))
        et = g["event_type"].to_numpy()[order]
        ts = g["ts"].to_numpy()[order].astype("datetime64[us]")
        src = np.flatnonzero(et == from_type)
        if len(src) == 0:
            return pd.DataFrame({"lat_s": []})
        t0 = ts[src[0]]
        dst = np.flatnonzero((et == to_type) & (ts >= t0))
        if len(dst) == 0:
            return pd.DataFrame({"lat_s": []})
        lat = (ts[dst[0]] - t0).astype(np.int64) / 1e6
        return pd.DataFrame({"lat_s": [float(lat)]})

    lats = events_ds \
        .select_columns(["user_id", "ts", "event_id", "event_type"]) \
        .groupby("user_id").map_groups(fold, batch_format="pandas") \
        .to_pandas()
    v = lats["lat_s"].to_numpy()
    row = {"n_converted": np.array([len(v)], dtype=np.int64)}
    for q in qs:
        row[f"q{int(round(q * 100)):02d}_s"] = [
            round(float(np.quantile(v, q)), 6)] if len(v) else [None]
    return pd.DataFrame(row)


def user_growth_curve(events_ds, *, by: str = "user_id",
                      ts_col: str = "ts"):
    """Cumulative-distinct-user growth curve by day: each user counts
    on their FIRST-seen day; the curve is the running sum — the
    classic DAU-acquisition report, computed without any
    distinct-over-window. -> (day, new_users, cum_users).

    Scale shape: groupby(user).min(ts) is ONE shuffle of (user, ts)
    pairs; per-day new-user counts pre-aggregate per batch; the final
    cumulative sum runs over the DAY domain (bounded by calendar
    days, not users) on the driver."""
    from ray.data.aggregate import Min, Sum

    first = events_ds.select_columns([by, ts_col]) \
        .groupby(by).aggregate(Min(ts_col, alias_name="first_ts"))

    def to_day(batch: pa.Table) -> pa.Table:
        if "first_ts" not in batch.column_names \
                or batch.num_rows == 0:
            return pa.table({"day": pa.array([], type=pa.string()),
                             "n_p": pa.array([], type=pa.int64())})
        d = batch.column("first_ts").to_numpy() \
            .astype("datetime64[D]").astype(str)
        t = pa.table({"day": pa.array(d, type=pa.string())})
        g = t.group_by(["day"]).aggregate([([], "count_all")])
        return pa.table({"day": g.column("day"),
                         "n_p": g.column("count_all")})

    per_day = first.map_batches(to_day, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("n_p", alias_name="new_users")) \
        .to_pandas()
    per_day = per_day.sort_values("day").reset_index(drop=True)
    per_day["new_users"] = per_day["new_users"].astype(np.int64)
    per_day["cum_users"] = per_day["new_users"].cumsum() \
        .astype(np.int64)
    return per_day


def local_supplier_volume(customer_ds, orders_ds, lineitem_ds,
                          supplier_ds, nation_ds, region_ds, *,
                          region: str = "ASIA",
                          date_lo: str = "1995-01-01",
                          date_hi: str = "1996-01-01"):
    """TPC-H Q5 shape (the 6-way join): revenue by nation from line
    items where the SUPPLIER sits in the same nation as the ordering
    customer, restricted to one region and one order-date year.
    revenue = sum(l_extendedprice * (1 - l_discount)). -> (n_name,
    revenue) rounded to 2 places after aggregation.

    Scale shape: region->nation is a tiny dimension chain collected
    once and broadcast (fixed 25/5 rows); customers filter AT the
    scan against the broadcast nation set; the big joins
    (orders->customer, lineitem->orders, lineitem->supplier) all go
    through auto_join — broadcast while the right side fits,
    co-partitioned shuffle beyond (supplier scales with sf, so it is
    NOT collected driver-side); revenue pre-aggregates per batch per
    nation."""
    import ray
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    nat = nation_ds.to_pandas()
    reg = region_ds.to_pandas()
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"]
             .astype(int))
    nat = nat[nat["n_regionkey"].astype(int).isin(rk)]
    nation_name = {int(k): v for k, v in zip(nat["n_nationkey"],
                                             nat["n_name"])}
    nset = set(nation_name)

    cust = customer_ds.map_batches(
        lambda b: pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_nationkey": pc.cast(b.column("c_nationkey"),
                                   pa.int64()),
        }).filter(pc.is_in(
            pc.cast(b.column("c_nationkey"), pa.int64()),
            value_set=pa.array(sorted(nset), type=pa.int64()))),
        batch_format="pyarrow")
    orders = orders_ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
            pc.less(b.column("o_orderdate"), pa.scalar(hi))))
        .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    o_c = auto_join(orders, cust, left_on="o_custkey",
                    right_on="c_custkey",
                    right_cols=["c_nationkey"], how="inner",
                    num_parts=P)
    o_c = o_c.map_batches(
        lambda b: (b.select(["o_orderkey", "c_nationkey"])
                   if "o_orderkey" in b.column_names else
                   pa.table({"o_orderkey": pa.array([],
                                                    type=pa.int64()),
                             "c_nationkey": pa.array(
                                 [], type=pa.int64())})),
        batch_format="pyarrow").materialize()
    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    j = auto_join(li, o_c, left_on="l_orderkey",
                  right_on="o_orderkey",
                  right_cols=["c_nationkey"], how="inner",
                  num_parts=P)
    j = auto_join(j, supplier_ds.select_columns(
        ["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        right_cols=["s_nationkey"], how="inner", num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"n_key": pa.array([], type=pa.int64()),
                          "rev_p": pa.array([], type=pa.float64())})
        if "l_suppkey" not in batch.column_names \
                or batch.num_rows == 0:
            return empty
        cn = batch.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        s_nat = batch.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = s_nat == cn
        if not keep.any():
            return empty
        t = batch.filter(pa.array(keep))
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({"n_key": t.column("c_nationkey"), "rev": rev}) \
            .group_by(["n_key"]).aggregate([("rev", "sum")])
        return pa.table({"n_key": g.column("n_key"),
                         "rev_p": g.column("rev_sum")})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_key").aggregate(Sum("rev_p", alias_name="revenue"))

    def finish(batch: pa.Table) -> pa.Table:
        keys = batch.column("n_key").to_pylist()
        return pa.table({
            "n_name": pa.array([nation_name[int(k)] for k in keys],
                               type=pa.string()),
            "revenue": _round_np(batch.column("revenue"), 2),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def quality_threshold_sweep(ds, *, cutoffs: int = 9,
                            stem: bool = False):
    """Corpus-planning sweep: for each uniqueness-ratio cutoff c =
    i/10 (i = 1..``cutoffs``), how many docs and tokens survive the
    filter uniq_ratio >= c — the curve a data-mix designer reads
    before pinning a quality gate. -> (cutoff, n_docs, n_tokens).
    uniq_ratio uses the quality_scores contract (round 6 of exact
    int/int), so both engines compare identical doubles.

    Scale shape: ONE pass; each batch evaluates every cutoff on its
    per-doc stats and ships (cutoff, partials) rows into a
    cutoffs-sized groupby."""
    from ray.data.aggregate import Sum

    from rse_ray.pipelines.text import _tok

    cuts = [round((i + 1) / 10.0, 1) for i in range(cutoffs)]

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ur, nt = [], []
        for t in texts:
            toks = _tok(t, stem) if t is not None else []
            n = len(toks)
            nt.append(n)
            ur.append(round(len(set(toks)) / n, 6) if n else 0.0)
        ur_a = np.array(ur)
        nt_a = np.array(nt, dtype=np.int64)
        o_c, o_d, o_t = [], [], []
        for c in cuts:
            keep = ur_a >= c
            o_c.append(c)
            o_d.append(int(keep.sum()))
            o_t.append(int(nt_a[keep].sum()))
        return pa.table({
            "cutoff": pa.array(o_c, type=pa.float64()),
            "d_p": pa.array(o_d, type=pa.int64()),
            "t_p": pa.array(o_t, type=pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("cutoff").aggregate(
            Sum("d_p", alias_name="n_docs"),
            Sum("t_p", alias_name="n_tokens")) \
        .map_batches(
            lambda b: pa.table({
                "cutoff": b.column("cutoff"),
                "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
                "n_tokens": pc.cast(b.column("n_tokens"), pa.int64()),
            }), batch_format="pyarrow")


def small_quantity_revenue(lineitem_ds):
    """TPC-H Q17 shape (the decorrelated correlated subquery):
    average yearly revenue lost if small orders stop — line items
    with l_quantity below 0.2 x their part's mean quantity,
    avg_yearly = sum(l_extendedprice) / 7. The per-part threshold is
    sum/count in BOTH engines (quantities are small integers, so the
    sums are exact doubles in any order and the threshold is
    bit-identical). -> one row (avg_yearly) rounded to 2 places.

    Scale shape: per-part (sum, count) partials through ONE
    groupby(l_partkey); the per-part limit table re-attaches by
    co-partitioned hash_join (parts are corpus-scale — never a
    broadcast); the revenue partial pre-aggregates per batch."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    def qpart(batch: pa.Table) -> pa.Table:
        g = batch.select(["l_partkey", "l_quantity"]) \
            .group_by(["l_partkey"]).aggregate(
                [("l_quantity", "sum"), ([], "count_all")])
        return pa.table({"l_partkey": g.column("l_partkey"),
                         "s_p": g.column("l_quantity_sum"),
                         "n_p": g.column("count_all")})

    lim = lineitem_ds.select_columns(["l_partkey", "l_quantity"]) \
        .map_batches(qpart, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("s_p", alias_name="s"),
                                        Sum("n_p", alias_name="n"))

    def to_lim(batch: pa.Table) -> pa.Table:
        if "l_partkey" not in batch.column_names \
                or batch.num_rows == 0:
            return pa.table({"pk": pa.array([], type=pa.int64()),
                             "lim": pa.array([], type=pa.float64())})
        s = batch.column("s").to_numpy()
        n = batch.column("n").to_numpy().astype(np.float64)
        return pa.table({
            "pk": batch.column("l_partkey"),
            "lim": pa.array(0.2 * (s / n), type=pa.float64()),
        })

    lim_t = lim.map_batches(to_lim, batch_format="pyarrow") \
        .materialize()
    j = auto_join(
        lineitem_ds.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice"]),
        lim_t, left_on="l_partkey", right_on="pk",
        right_cols=["lim"], how="inner", num_parts=P)

    def rev(batch: pa.Table) -> pa.Table:
        if "l_quantity" not in batch.column_names \
                or batch.num_rows == 0:
            return pa.table({"r_p": pa.array([], type=pa.float64())})
        keep = pc.less(batch.column("l_quantity"),
                       batch.column("lim"))
        t = batch.filter(keep)
        tot = pc.sum(t.column("l_extendedprice")).as_py() or 0.0
        return pa.table({"r_p": pa.array([float(tot)],
                                         type=pa.float64())})

    total = j.map_batches(rev, batch_format="pyarrow").sum("r_p")
    return pa.table({
        "avg_yearly": pa.array(
            [float(np.round((total or 0.0) / 7.0, 2))],
            type=pa.float64()),
    })


def daily_anomalies(events_ds, *, group: str = "event_type",
                    ts_col: str = "ts", z: float = 2.0):
    """Seasonal-naive volume anomaly detection: daily event counts
    per type, flagged where |count - mean| > z * std over that type's
    days (population std; daily counts are integers, so the moment
    sums are exact and both engines compute identical statistics).
    -> (event_type, day, n, zscore) for flagged days, zscore rounded
    to 6 places.

    Scale shape: per-batch (type, day) partial counts through ONE
    groupby; the per-type stats table is day-domain-sized and the
    flagging map is stateless."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column(ts_col).to_numpy() \
            .astype("datetime64[D]").astype(str)
        t = pa.table({group: batch.column(group),
                      "day": pa.array(d, type=pa.string())})
        g = t.group_by([group, "day"]).aggregate([([], "count_all")])
        return pa.table({group: g.column(group),
                         "day": g.column("day"),
                         "n_p": g.column("count_all")})

    daily = events_ds.select_columns([group, ts_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([group, "day"]) \
        .aggregate(Sum("n_p", alias_name="n")).to_pandas()
    daily["n"] = daily["n"].astype(np.int64)
    out = []
    for g, sub in daily.groupby(group):
        c = sub["n"].to_numpy().astype(np.float64)
        n = float(len(c))
        mean = float(np.sum(c)) / n
        var = float(np.sum(c * c)) / n - mean * mean
        std = math.sqrt(max(var, 0.0))
        if std == 0:
            continue
        zs = (c - mean) / std
        keep = np.abs(c - mean) > z * std
        s = sub.loc[keep].copy()
        s["zscore"] = np.round(zs[keep], 6)
        out.append(s)
    if not out:
        return pd.DataFrame({group: [], "day": [], "n": [],
                             "zscore": []})
    return pd.concat(out, ignore_index=True)[
        [group, "day", "n", "zscore"]]


def time_rollup_counts(events_ds, *, ts_col: str = "ts",
                       val: str = "value"):
    """GROUP BY ROLLUP over the TIME hierarchy (month, day): event
    counts + value sums at (month, day), (month, ALL) and (ALL, ALL)
    — the calendar cube every BI layer asks of an event stream. Same
    contract as rollup_counts ('ALL' sentinel, ONE fine-grain
    shuffle, coarser grains derived from the |days|-sized aggregate
    on the driver); sums rounded to 2 places (double values).
    -> (month, day, n_events, sum_value)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column(ts_col).to_numpy()
        day = d.astype("datetime64[D]").astype(str)
        month = d.astype("datetime64[M]").astype(str)
        g = pa.table({
            "month": pa.array(month, type=pa.string()),
            "day": pa.array(day, type=pa.string()),
            "v": batch.column(val),
        }).group_by(["month", "day"]).aggregate(
            [([], "count_all"), ("v", "sum")])
        return pa.table({"month": g.column("month"),
                         "day": g.column("day"),
                         "n_p": g.column("count_all"),
                         "v_p": g.column("v_sum")})

    fine = events_ds.select_columns([ts_col, val]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["month", "day"]) \
        .aggregate(Sum("n_p", alias_name="n_events"),
                   Sum("v_p", alias_name="sum_value")).to_pandas()
    fine["n_events"] = fine["n_events"].astype(np.int64)
    lvl1 = fine.groupby("month", as_index=False)[
        ["n_events", "sum_value"]].sum()
    lvl1["day"] = "ALL"
    total = pd.DataFrame({
        "month": ["ALL"], "day": ["ALL"],
        "n_events": [fine["n_events"].sum()],
        "sum_value": [fine["sum_value"].sum()],
    })
    out = pd.concat([fine, lvl1, total], ignore_index=True)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(2)
    return out[["month", "day", "n_events", "sum_value"]]


def benford_prices(orders_ds, *, col: str = "o_totalprice"):
    """Benford's-law first-digit audit (the classic fabricated-data
    screen): distribution of the leading digit of the integer part of
    ``col`` (values < 1 drop) next to the Benford expectation
    log10(1 + 1/d). -> (digit, n, frac, benford), fractions rounded
    to 6 places.

    Scale shape: per-batch digit counts (ONE 9-row partial per
    batch), one tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy()
        v = v[v >= 1.0]
        ip = np.floor(v).astype(np.int64).astype(str)
        first = np.array([s[0] for s in ip], dtype=object) \
            if len(ip) else np.array([], dtype=object)
        d, c = np.unique(first.astype(np.int64)
                         if len(first) else
                         np.array([], dtype=np.int64),
                         return_counts=True)
        return pa.table({"digit": pa.array(d, type=pa.int64()),
                         "n_p": pa.array(c, type=pa.int64())})

    agg = orders_ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n_p", alias_name="n")) \
        .to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    nt = float(agg["n"].sum())
    agg["frac"] = np.round(agg["n"].to_numpy() / nt, 6)
    agg["benford"] = np.round(
        np.log10(1.0 + 1.0 / agg["digit"].to_numpy()), 6)
    return agg[["digit", "n", "frac", "benford"]]


def returned_item_revenue(customer_ds, orders_ds, lineitem_ds,
                          nation_ds, *,
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1996-04-01",
                          k: int = 20):
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    lineitems with l_returnflag = 'R' whose order falls in one
    quarter, revenue summed per customer, top-``k`` customers with
    name / account balance / nation attached. -> (c_custkey, c_name,
    revenue, c_acctbal, n_name), revenue rounded to 2 places AFTER
    aggregation and BEFORE the ordering cut (ties break on
    c_custkey asc), so both engines cut the same set.

    Scale shape: orders filter to one quarter at the scan, ONE
    co-partitioned hash join attaches o_custkey to the returned
    lineitems, revenue pre-aggregates per batch per custkey before
    the small groupby; the customer attribute attach joins only the
    per-customer AGGREGATE (|customers-with-returns| rows, not
    lineitems); nation is a broadcast dict. The top-k cut runs
    distributed (Dataset.sort().limit())."""
    import ray
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    nat = nation_ds.to_pandas()
    nation_name = {int(a): b for a, b in zip(nat["n_nationkey"],
                                             nat["n_name"])}
    nat_ref = ray.put(nation_name)

    orders = orders_ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
            pc.less(b.column("o_orderdate"), pa.scalar(hi))))
        .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    li = lineitem_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("l_returnflag"),
                                    pa.scalar("R")))
        .select(["l_orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")
    j = auto_join(li, orders, left_on="l_orderkey",
                  right_on="o_orderkey", right_cols=["o_custkey"],
                  how="inner", num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"c_custkey": pa.array([], type=pa.int64()),
                          "rev_p": pa.array([], type=pa.float64())})
        if "o_custkey" not in batch.column_names \
                or batch.num_rows == 0:
            return empty
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        g = pa.table({"c_custkey": pc.cast(batch.column("o_custkey"),
                                           pa.int64()),
                      "rev": rev}) \
            .group_by(["c_custkey"]).aggregate([("rev", "sum")])
        return pa.table({"c_custkey": g.column("c_custkey"),
                         "rev_p": g.column("rev_sum")})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("rev_p",
                                            alias_name="revenue"))
    agg = agg.map_batches(
        lambda b: pa.table({"c_custkey": b.column("c_custkey"),
                            "revenue": _round_np(b.column("revenue"),
                                                 2)}),
        batch_format="pyarrow")
    cust = customer_ds.select_columns(
        ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    out = auto_join(agg, cust, left_on="c_custkey",
                    right_on="c_custkey",
                    right_cols=["c_name", "c_acctbal", "c_nationkey"],
                    how="inner", num_parts=max(1, P // 4))
    top = out.sort(["revenue", "c_custkey"],
                   descending=[True, False]).limit(k).to_pandas()

    nn = nation_name
    top["n_name"] = top["c_nationkey"].map(
        lambda x: nn.get(int(x), ""))
    del nat_ref
    top["c_custkey"] = top["c_custkey"].astype(np.int64)
    return top[["c_custkey", "c_name", "revenue", "c_acctbal",
                "n_name"]]


def promo_revenue(lineitem_ds, part_ds, *,
                  date_lo: str = "1996-09-01",
                  date_hi: str = "1996-10-01"):
    """TPC-H Q14 shape: share of one month's revenue that came from
    promotional parts. -> ONE row (promo_pct, promo_revenue,
    total_revenue); pct rounded to 6, money to 2.

    Scale shape: part scales with sf, so its partkey->is_promo flag
    attaches via a LEFT auto_join (broadcast while part fits,
    co-partitioned shuffle beyond; LEFT so a lineitem with no part
    row still counts toward total revenue, as the dense-array
    lookup did); lineitem filters the ship-date window at the scan
    and accumulates two doubles per batch; the reduce is a 2-number
    sum."""
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    flags = part_ds.map_batches(
        lambda b: pa.table({
            "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
            "is_promo": pc.cast(pc.equal(b.column("p_type"),
                                         pa.scalar("PROMO")),
                                pa.int64())}),
        batch_format="pyarrow")
    li = lineitem_ds.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount",
         "l_shipdate"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
            pc.less(b.column("l_shipdate"), pa.scalar(hi)))),
        batch_format="pyarrow")
    li = auto_join(li, flags, left_on="l_partkey",
                   right_on="p_partkey", right_cols=["is_promo"],
                   how="left")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.int64()),
                             "promo_p": pa.array([],
                                                 type=pa.float64()),
                             "total_p": pa.array([],
                                                 type=pa.float64())})
        is_promo = pc.fill_null(t.column("is_promo"), 0).to_numpy(
            zero_copy_only=False).astype(bool)
        rev = (t.column("l_extendedprice").to_numpy()
               * (1.0 - t.column("l_discount").to_numpy()))
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "promo_p": pa.array([float(rev[is_promo].sum())]),
            "total_p": pa.array([float(rev.sum())]),
        })

    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("promo_p", alias_name="promo"),
                                Sum("total_p", alias_name="total")) \
        .to_pandas()
    pr = float(agg["promo"].iloc[0]) if len(agg) else 0.0
    tr = float(agg["total"].iloc[0]) if len(agg) else 0.0
    return pd.DataFrame({
        "promo_pct": [round(100.0 * pr / tr, 6) if tr else 0.0],
        "promo_revenue": [round(pr, 2)],
        "total_revenue": [round(tr, 2)],
    })


DISCOUNT_ARMS = (
    {"brand": "Brand#12", "size_hi": 5, "qty_lo": 1, "qty_hi": 11},
    {"brand": "Brand#23", "size_hi": 10, "qty_lo": 10, "qty_hi": 20},
    {"brand": "Brand#24", "size_hi": 15, "qty_lo": 20, "qty_hi": 30},
)


def discounted_revenue(lineitem_ds, part_ds, *, arms=DISCOUNT_ARMS):
    """TPC-H Q19 shape (adapted to this schema's columns): revenue
    from lineitems matching ANY of three brand/size/quantity arms —
    arm i keeps rows where part.p_brand = brand_i, 1 <= p_size <=
    size_hi_i and qty_lo_i <= l_quantity <= qty_hi_i. -> one row per
    arm (arm, n_items, revenue) + the disjunction total under arm =
    -1, money rounded to 2.

    Scale shape: part pre-filters to the arms' brands and a size
    inside any arm's window (a few-percent selectivity cut over the
    dimension) with brand mapped to an int8 arm code BEFORE the join;
    ``auto_join`` then broadcasts the pruned dimension — or
    co-partitions past its 2M-row threshold — so there is NO driver
    collect of the sf-scaling part table (round-4 VERDICT item 2);
    every arm evaluates vectorized inside the same single pass over
    the joined stream; the reduce is a |arms|+1-row groupby. Lineitems
    whose part matches no arm's brand drop at the inner join — they
    can't satisfy any arm, so the counts are unchanged."""
    from ray.data.aggregate import Sum

    brand_names = sorted(set(a["brand"] for a in arms))
    brand_code = {b: i for i, b in enumerate(brand_names)}
    max_size = max(int(a["size_hi"]) for a in arms)
    brand_set = pa.array(brand_names)
    arm_specs = [(brand_code[a["brand"]], int(a["size_hi"]),
                  float(a["qty_lo"]), float(a["qty_hi"]))
                 for a in arms]

    def project_part(b: pa.Table) -> pa.Table:
        code = pc.index_in(b.column("p_brand"), value_set=brand_set)
        sz = b.column("p_size")
        keep = pc.and_(pc.is_valid(code),
                       pc.and_(pc.greater_equal(sz, pa.scalar(1)),
                               pc.less_equal(sz,
                                             pa.scalar(max_size))))
        b = b.filter(keep)
        return pa.table({
            "p_partkey": b.column("p_partkey"),
            "bcode": pc.cast(pc.index_in(b.column("p_brand"),
                                         value_set=brand_set),
                             pa.int8()),
            "p_size": pc.cast(b.column("p_size"), pa.int32())})

    part_f = part_ds.select_columns(
        ["p_partkey", "p_brand", "p_size"]).map_batches(
        project_part, batch_format="pyarrow")
    j = auto_join(
        lineitem_ds.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice",
             "l_discount"]),
        part_f, left_on="l_partkey", right_on="p_partkey",
        right_cols=["bcode", "p_size"], how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"arm": pa.array([], type=pa.int64()),
                          "n_p": pa.array([], type=pa.int64()),
                          "rev_p": pa.array([], type=pa.float64())})
        if batch.num_rows == 0 \
                or "bcode" not in batch.column_names:
            return empty
        bc = batch.column("bcode").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sz = batch.column("p_size").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy()
        rev = (batch.column("l_extendedprice").to_numpy()
               * (1.0 - batch.column("l_discount").to_numpy()))
        o_arm, o_n, o_rev = [], [], []
        any_mask = np.zeros(len(bc), dtype=bool)
        for i, (code, size_hi, qlo, qhi) in enumerate(arm_specs):
            m = ((bc == code) & (sz <= size_hi)
                 & (qty >= qlo) & (qty <= qhi))
            any_mask |= m
            o_arm.append(i)
            o_n.append(int(m.sum()))
            o_rev.append(float(rev[m].sum()))
        o_arm.append(-1)
        o_n.append(int(any_mask.sum()))
        o_rev.append(float(rev[any_mask].sum()))
        return pa.table({"arm": pa.array(o_arm, type=pa.int64()),
                         "n_p": pa.array(o_n, type=pa.int64()),
                         "rev_p": pa.array(o_rev,
                                           type=pa.float64())})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("arm").aggregate(Sum("n_p", alias_name="n_items"),
                                  Sum("rev_p", alias_name="revenue")) \
        .to_pandas()
    # the oracle emits every arm even at zero matches; with the inner
    # join an unmatched arm produces no partial rows, so reindex the
    # (<= |arms|+1)-row aggregate over the full arm set
    want = [*range(len(arm_specs)), -1]
    agg = agg.set_index("arm").reindex(want).fillna(0.0) if len(agg) \
        else pd.DataFrame(index=pd.Index(want, name="arm"),
                          data={"n_items": 0.0, "revenue": 0.0})
    return pd.DataFrame({
        "arm": np.asarray(want, dtype=np.int64),
        "n_items": agg["n_items"].to_numpy().astype(np.int64),
        "revenue": agg["revenue"].to_numpy().round(2)})


def top_supplier_revenue(lineitem_ds, supplier_ds, *,
                         date_lo: str = "1997-01-01",
                         date_hi: str = "1997-04-01"):
    """TPC-H Q15 shape: the supplier(s) with the MAXIMUM revenue over
    one quarter — ties all surface, like the spec's correlated
    max-subquery. -> (s_suppkey, s_name, total_revenue) rounded to 2
    places BEFORE the max comparison so both engines agree on ties.

    Scale shape: revenue pre-aggregates per batch per suppkey (ONE
    supplier-cardinality groupby — suppliers are a dimension); the
    aggregate pins (materialize of a dimension-sized table) so the max
    and the tie cut both read it without re-running the lineitem
    pass; the max itself is a distributed ``Dataset.aggregate``; the
    tie cut filters the pinned aggregate to the (usually 1-row) top
    set; names attach by joining SUPPLIER AGAINST THE TINY TOP SET
    with ``auto_join`` (right side = top rows, so it always
    broadcasts) — no driver collect of the sf-scaling supplier table
    (round-4 VERDICT item 2)."""
    from ray.data.aggregate import Max, Sum

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy()
        t = batch.filter(pa.array((sd >= lo) & (sd < hi)))
        if t.num_rows == 0:
            return pa.table({"s_suppkey": pa.array([],
                                                   type=pa.int64()),
                             "rev_p": pa.array([],
                                               type=pa.float64())})
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = pa.table({"s_suppkey": pc.cast(t.column("l_suppkey"),
                                           pa.int64()),
                      "rev": rev}) \
            .group_by(["s_suppkey"]).aggregate([("rev", "sum")])
        return pa.table({"s_suppkey": g.column("s_suppkey"),
                         "rev_p": g.column("rev_sum")})

    agg = lineitem_ds.select_columns(
        ["l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("s_suppkey") \
        .aggregate(Sum("rev_p", alias_name="total_revenue")) \
        .map_batches(
            lambda b: pa.table({
                "s_suppkey": pc.cast(b.column("s_suppkey"),
                                     pa.int64()),
                "total_revenue": _round_np(
                    b.column("total_revenue"), 2)}),
            batch_format="pyarrow") \
        .materialize()
    best_row = agg.aggregate(Max("total_revenue"))
    best = (best_row or {}).get("max(total_revenue)")
    if best is None:
        return pd.DataFrame({"s_suppkey": pd.Series([],
                                                    dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue": pd.Series(
                                 [], dtype=np.float64)})
    top = agg.map_batches(
        lambda b: b.filter(pc.equal(b.column("total_revenue"),
                                    pa.scalar(float(best)))),
        batch_format="pyarrow")
    named = auto_join(
        supplier_ds.select_columns(["s_suppkey", "s_name"]), top,
        left_on="s_suppkey", right_on="s_suppkey",
        right_cols=["total_revenue"], how="inner")
    out = named.to_pandas()  # <= |ties| rows
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return out.sort_values("s_suppkey").reset_index(drop=True)[
        ["s_suppkey", "s_name", "total_revenue"]]


def source_lang_entropy(documents_ds):
    """Per-source language-mix audit: Shannon entropy (bits) of the
    lang distribution, the dominant lang (ties break lang-asc), and
    the lang count — the table a multilingual-corpus curator reads to
    spot mislabeled or mixed sources. -> (source, n_docs, n_langs,
    top_lang, entropy) with entropy rounded to 6.

    Scale shape: per-batch (source, lang) partial counts, ONE tiny
    groupby (|sources| x |langs| rows), entropy computed on the
    dimension-sized aggregate with a lang-sorted summation order so
    the float sum is deterministic."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "lang"]).aggregate(
            [([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "lang": g.column("lang"),
                         "n_p": g.column("count_all")})

    agg = documents_ds.select_columns(["source", "lang"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "lang"]) \
        .aggregate(Sum("n_p", alias_name="n")).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    out = []
    for src, g in agg.groupby("source"):
        g = g.sort_values("lang")
        n = g["n"].to_numpy().astype(np.float64)
        nt = n.sum()
        p = n / nt
        ent = float(-(p * np.log2(p)).sum())
        top = g.sort_values(["n", "lang"],
                            ascending=[False, True])["lang"].iloc[0]
        out.append((src, int(nt), len(g), top, round(ent, 6)))
    return pd.DataFrame(out, columns=["source", "n_docs", "n_langs",
                                      "top_lang", "entropy"])


def cusum_drift(events_ds, *, group: str = "event_type",
                ts_col: str = "ts"):
    """CUSUM drift screen over each group's DAILY event counts: with
    mu = mean daily count, cusum_k = sum_{d<=k}(n_d - mu); report the
    day where |cusum| peaks (the classic changepoint locator) and the
    peak magnitude. -> (event_type, n_days, max_abs_cusum, peak_day);
    magnitudes rounded to 6 BEFORE the argmax so both engines pick
    the same peak (remaining ties break day-asc).

    Scale shape: daily counts pre-aggregate per batch into ONE
    (groups x days)-sized groupby; the sequential cusum scan runs on
    that dimension-sized table, never on raw events."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column(ts_col).to_numpy() \
            .astype("datetime64[D]").astype(str)
        g = pa.table({group: batch.column(group),
                      "day": pa.array(day, type=pa.string())}) \
            .group_by([group, "day"]).aggregate([([], "count_all")])
        return pa.table({group: g.column(group),
                         "day": g.column("day"),
                         "n_p": g.column("count_all")})

    daily = events_ds.select_columns([group, ts_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([group, "day"]) \
        .aggregate(Sum("n_p", alias_name="n")).to_pandas()
    daily["n"] = daily["n"].astype(np.int64)
    out = []
    for key, g in daily.groupby(group):
        g = g.sort_values("day")
        n = g["n"].to_numpy().astype(np.float64)
        mu = n.mean()
        cus = np.round(np.abs(np.cumsum(n - mu)), 6)
        i = int(np.lexsort((g["day"].to_numpy(), -cus))[0])
        out.append((key, len(g), cus[i], g["day"].iloc[i]))
    return pd.DataFrame(out, columns=[group, "n_days",
                                      "max_abs_cusum", "peak_day"])


def rfm_segments(events_ds, *, tiles: int = 4):
    """RFM customer segmentation: per user, Recency (days since the
    user's last event, measured from the corpus max-ts), Frequency
    (event count) and Monetary (value sum, rounded 6 BEFORE the tile
    ordering so both engines cut identical quartiles) each map to an
    exact NTILE(``tiles``) code — R ordered recency-asc (most recent
    = tile 1), F by freq desc, M by monetary desc, all tie-broken on
    user_id. -> one row per populated (r_tile, f_tile, m_tile) cell:
    (r_tile, f_tile, m_tile, n_users, sum_monetary round 2).

    Scale shape: events collapse to a per-user aggregate in ONE
    groupby; the three exact NTILEs are global_rank range exchanges
    over the user-dimension table (a sort is the honest price of an
    exact quantile code at 10^9 users); two co-partitioned hash
    joins reassemble the codes; the final cell groupby is
    tiles^3-sized."""
    from ray.data.aggregate import Count, Max, Sum

    from rse_ray.util import parts_for, plan_rows

    per_user = events_ds.select_columns(["user_id", "ts", "value"]) \
        .groupby("user_id").aggregate(
            Max("ts", alias_name="last_ts"),
            Count(alias_name="freq"),
            Sum("value", alias_name="monetary")).materialize()
    # corpus max-ts == max over per-user last_ts — read the small
    # materialized aggregate, not a second full events pass
    as_of = per_user.max("last_ts")

    def prep(batch: pa.Table) -> pa.Table:
        last = batch.column("last_ts").to_numpy()
        rec = (np.datetime64(as_of, "us").astype("datetime64[D]")
               - last.astype("datetime64[D]")).astype(np.int64)
        return pa.table({
            "user_id": batch.column("user_id"),
            "recency_days": pa.array(rec),
            "freq": pc.cast(batch.column("freq"), pa.int64()),
            "monetary": pa.array(np.round(
                batch.column("monetary").to_numpy(), 6)),
        })

    u = per_user.map_batches(prep, batch_format="pyarrow") \
        .materialize()
    P = parts_for(plan_rows(u), rows_per_part=500_000)

    r = ntile_rank(u, order="recency_days", key="user_id", n=tiles,
                   descending=False).map_batches(
        lambda b: pa.table({"u_r": b.column("user_id"),
                            "r_tile": b.column("tile")}),
        batch_format="pyarrow")
    f = ntile_rank(u, order="freq", key="user_id", n=tiles,
                   descending=True).map_batches(
        lambda b: pa.table({"u_f": b.column("user_id"),
                            "f_tile": b.column("tile")}),
        batch_format="pyarrow")
    m = ntile_rank(u, order="monetary", key="user_id", n=tiles,
                   descending=True).map_batches(
        lambda b: pa.table({"user_id": b.column("user_id"),
                            "monetary": b.column("monetary"),
                            "m_tile": b.column("tile")}),
        batch_format="pyarrow")
    j = auto_join(m, r, left_on="user_id", right_on="u_r",
                  right_cols=["r_tile"], num_parts=P)
    j = auto_join(j, f, left_on="user_id", right_on="u_f",
                  right_cols=["f_tile"], num_parts=P)

    def cell(batch: pa.Table) -> pa.Table:
        g = pa.table({
            "r_tile": batch.column("r_tile"),
            "f_tile": batch.column("f_tile"),
            "m_tile": batch.column("m_tile"),
            "mv": batch.column("monetary"),
        }).group_by(["r_tile", "f_tile", "m_tile"]).aggregate(
            [([], "count_all"), ("mv", "sum")])
        return pa.table({"r_tile": g.column("r_tile"),
                         "f_tile": g.column("f_tile"),
                         "m_tile": g.column("m_tile"),
                         "n_p": g.column("count_all"),
                         "mv_p": g.column("mv_sum")})

    from ray.data.aggregate import Sum as _Sum

    agg = j.map_batches(cell, batch_format="pyarrow") \
        .groupby(["r_tile", "f_tile", "m_tile"]).aggregate(
            _Sum("n_p", alias_name="n_users"),
            _Sum("mv_p", alias_name="sum_monetary"))
    return agg.map_batches(
        lambda b: pa.table({
            "r_tile": pc.cast(b.column("r_tile"), pa.int64()),
            "f_tile": pc.cast(b.column("f_tile"), pa.int64()),
            "m_tile": pc.cast(b.column("m_tile"), pa.int64()),
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
            "sum_monetary": _round_np(b.column("sum_monetary"), 2),
        }), batch_format="pyarrow")


def late_shipment_priority(orders_ds, lineitem_ds, *,
                           date_lo: str = "1995-04-01",
                           date_hi: str = "1995-07-01",
                           grace_days: int = 90):
    """TPC-H Q4 shape (EXISTS semi-join with a per-pair predicate):
    count orders per o_orderpriority, placed in one quarter, that
    have AT LEAST ONE line item shipped more than ``grace_days``
    after the order date (this corpus carries no l_commitdate /
    l_receiptdate, so lateness is l_shipdate > o_orderdate + grace).
    -> (o_orderpriority, order_count).

    Scale shape: orders prune to the quarter AT the scan and ship
    only (key, date, priority); the lineitem side ships (key,
    shipdate) into ONE co-partitioned hash join; the EXISTS collapses
    inside each join partition (a key group never straddles
    partitions, so per-batch distinct-orderkey is exact after an
    in-partition groupby); only per-priority partial counts reach the
    final 5-row groupby."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    grace_us = np.int64(grace_days) * 86_400_000_000
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    orders = orders_ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
            pc.less(b.column("o_orderdate"), pa.scalar(hi))))
        .select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow")
    li = lineitem_ds.select_columns(["l_orderkey", "l_shipdate"])
    # MUST stay a partitioned hash join: the per-batch EXISTS
    # collapse below depends on every orderkey group landing in
    # ONE batch — auto_join's broadcast path does not co-partition
    j = hash_join(li, orders, left_on="l_orderkey",
                  right_on="o_orderkey",
                  right_cols=["o_orderdate", "o_orderpriority"],
                  how="inner", num_parts=P)

    def late_orders(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_orderkey": pa.array([], type=pa.int64()),
            "o_orderpriority": pa.array([], type=pa.string())})
        if batch.num_rows == 0 \
                or "o_orderdate" not in batch.column_names:
            return empty
        ship = batch.column("l_shipdate").cast(pa.int64())
        odate = batch.column("o_orderdate").cast(pa.int64())
        late = pc.greater(ship, pc.add(odate, pa.scalar(grace_us)))
        b = batch.filter(late)
        # key groups are partition-local after the hash join, so this
        # per-batch distinct IS the global EXISTS collapse
        g = pa.table({
            "o_orderkey": pc.cast(b.column("l_orderkey"), pa.int64()),
            "o_orderpriority": b.column("o_orderpriority"),
        }).group_by(["o_orderkey", "o_orderpriority"]).aggregate([])
        return g

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "o_orderpriority": pa.array([], type=pa.string()),
                "n_p": pa.array([], type=pa.int64())})
        g = batch.group_by(["o_orderpriority"]).aggregate(
            [([], "count_all")])
        return pa.table({"o_orderpriority": g.column("o_orderpriority"),
                         "n_p": pc.cast(g.column("count_all"),
                                        pa.int64())})

    agg = j.map_batches(late_orders, batch_format="pyarrow") \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("n_p", alias_name="order_count"))
    return agg.map_batches(
        lambda b: pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "order_count": pc.cast(b.column("order_count"),
                                   pa.int64())}),
        batch_format="pyarrow")


def priority_line_counts(lineitem_ds, orders_ds, *,
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1997-01-01"):
    """TPC-H Q12 shape (join + conditional aggregation): per
    l_returnflag (this corpus's stand-in for l_shipmode), among lines
    shipped inside one year, count lines whose order is high priority
    ('1-URGENT' / '2-HIGH') vs not. -> (l_returnflag,
    high_line_count, low_line_count).

    Scale shape: lineitem prunes to the year at the scan; ONE
    co-partitioned hash join attaches o_orderpriority; the CASE
    aggregation pre-collapses per batch (3 groups) so the final
    groupby moves a handful of rows."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    li = lineitem_ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
            pc.less(b.column("l_shipdate"), pa.scalar(hi))))
        .select(["l_orderkey", "l_returnflag"]),
        batch_format="pyarrow")
    orders = orders_ds.select_columns(["o_orderkey",
                                       "o_orderpriority"])
    j = auto_join(li, orders, left_on="l_orderkey",
                  right_on="o_orderkey",
                  right_cols=["o_orderpriority"], how="inner",
                  num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "l_returnflag": pa.array([], type=pa.string()),
            "hi_p": pa.array([], type=pa.int64()),
            "lo_p": pa.array([], type=pa.int64())})
        if batch.num_rows == 0 \
                or "o_orderpriority" not in batch.column_names:
            return empty
        pr = batch.column("o_orderpriority")
        high = pc.or_(pc.equal(pr, pa.scalar("1-URGENT")),
                      pc.equal(pr, pa.scalar("2-HIGH")))
        hi8 = pc.cast(high, pa.int64())
        lo8 = pc.subtract(pa.scalar(1, type=pa.int64()), hi8)
        g = pa.table({"l_returnflag": batch.column("l_returnflag"),
                      "hi": hi8, "lo": lo8}) \
            .group_by(["l_returnflag"]) \
            .aggregate([("hi", "sum"), ("lo", "sum")])
        return pa.table({"l_returnflag": g.column("l_returnflag"),
                         "hi_p": g.column("hi_sum"),
                         "lo_p": g.column("lo_sum")})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_returnflag").aggregate(
            Sum("hi_p", alias_name="high_line_count"),
            Sum("lo_p", alias_name="low_line_count"))
    return agg.map_batches(
        lambda b: pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "high_line_count": pc.cast(b.column("high_line_count"),
                                       pa.int64()),
            "low_line_count": pc.cast(b.column("low_line_count"),
                                      pa.int64())}),
        batch_format="pyarrow")


def customer_order_distribution(customer_ds, orders_ds):
    """TPC-H Q13 shape (left join + double aggregation): the
    distribution of orders per customer INCLUDING zero-order
    customers — count orders per customer via a left outer join, then
    histogram the counts. -> (c_count, custdist).

    Scale shape: orders pre-collapse to (custkey, count) partials per
    batch before a groupby whose output is |customers| rows max; the
    LEFT join then moves only per-customer aggregates (never order
    rows); the final histogram pre-collapses per batch again so the
    last groupby sees ~tens of distinct counts."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(customer_ds), rows_per_part=500_000)

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["o_custkey"]).group_by(["o_custkey"]) \
            .aggregate([([], "count_all")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "n_p": pc.cast(g.column("count_all"),
                                        pa.int64())})

    counts = orders_ds.select_columns(["o_custkey"]) \
        .map_batches(count_partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n_p",
                                            alias_name="c_count"))
    cust = customer_ds.select_columns(["c_custkey"])
    j = auto_join(cust, counts, left_on="c_custkey",
                  right_on="o_custkey", right_cols=["c_count"],
                  how="left", num_parts=P)

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"c_count": pa.array([], type=pa.int64()),
                             "d_p": pa.array([], type=pa.int64())})
        cc = pc.fill_null(pc.cast(batch.column("c_count"),
                                  pa.int64()), 0)
        g = pa.table({"c_count": cc}).group_by(["c_count"]) \
            .aggregate([([], "count_all")])
        return pa.table({"c_count": g.column("c_count"),
                         "d_p": pc.cast(g.column("count_all"),
                                        pa.int64())})

    agg = j.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Sum("d_p",
                                          alias_name="custdist"))
    return agg.map_batches(
        lambda b: pa.table({
            "c_count": pc.cast(b.column("c_count"), pa.int64()),
            "custdist": pc.cast(b.column("custdist"), pa.int64())}),
        batch_format="pyarrow")


def large_volume_customers(customer_ds, orders_ds, lineitem_ds, *,
                           min_qty: float = 300.0, k: int = 100):
    """TPC-H Q18 shape (HAVING-filtered semi-join): orders whose
    total line quantity exceeds ``min_qty``, with customer name and
    order attributes attached, top-``k`` by (o_totalprice DESC,
    o_orderdate ASC, o_orderkey ASC). -> (c_name, c_custkey,
    o_orderkey, o_orderdate, o_totalprice, sum_qty).

    Scale shape: quantity pre-sums per batch per orderkey before the
    groupby; the HAVING cut happens ON the aggregate (qualifying
    orders are rare by construction), and only that tiny qualifying
    set
    is broadcast (ray.put) into the orders scan — no second shuffle
    of the orders table; the customer attach joins |qualifying| rows."""
    import ray
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    def qty_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_orderkey"]).aggregate(
            [("l_quantity", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "q_p": g.column("l_quantity_sum")})

    qty = lineitem_ds.select_columns(["l_orderkey", "l_quantity"]) \
        .map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("q_p",
                                             alias_name="sum_qty"))
    big = qty.map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"),
                                      pa.scalar(float(min_qty)))),
        batch_format="pyarrow")
    # HAVING output is rare by construction -> broadcast, not shuffle
    big_tbl = pa.concat_tables(
        [b for b in big.iter_batches(batch_format="pyarrow")]
        or [pa.table({"l_orderkey": pa.array([], type=pa.int64()),
                      "sum_qty": pa.array([], type=pa.float64())})])
    qkeys = big_tbl.column("l_orderkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    qvals = big_tbl.column("sum_qty").to_numpy(zero_copy_only=False)
    order_ = np.argsort(qkeys)
    qkeys, qvals = qkeys[order_], qvals[order_]
    qref = ray.put((qkeys, qvals))

    def pick_orders(batch: pa.Table) -> pa.Table:
        qk, qv = ray.get(qref)
        keys = batch.column("o_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(qk) == 0:
            return batch.slice(0, 0).append_column(
                "sum_qty", pa.array([], type=pa.float64()))
        idx = np.searchsorted(qk, keys)
        idx_c = np.minimum(idx, len(qk) - 1)
        mask = qk[idx_c] == keys
        b = batch.filter(pa.array(mask))
        return b.append_column(
            "sum_qty", pa.array(qv[idx_c[mask]], type=pa.float64()))

    orders = orders_ds.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(pick_orders, batch_format="pyarrow")
    out = auto_join(orders, customer_ds.select_columns(
        ["c_custkey", "c_name"]), left_on="o_custkey",
        right_on="c_custkey", right_cols=["c_name"], how="inner",
        num_parts=max(32, P // 16))
    df = out.to_pandas()
    df = df.sort_values(["o_totalprice", "o_orderdate", "o_orderkey"],
                        ascending=[False, True, True]).head(k) \
        .reset_index(drop=True)
    df["c_custkey"] = df["o_custkey"].astype(np.int64)
    df["o_orderkey"] = df["o_orderkey"].astype(np.int64)
    df["sum_qty"] = df["sum_qty"].round(2)
    return df[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
               "o_totalprice", "sum_qty"]]


def idle_rich_customers(customer_ds, orders_ds, *,
                        idle_since: str = "2000-01-01"):
    """TPC-H Q22 shape (scalar subquery + anti join): customers whose
    account balance exceeds the mean POSITIVE balance and who have
    placed NO orders since ``idle_since``, counted and summed per
    nation. -> (c_nationkey, numcust, totacctbal).

    Scale shape: the scalar mean is a tree aggregate (one number to
    the driver); the NOT-EXISTS is a hash-partitioned ANTI join
    shipping only the RECENT orders' key set (pruned at the scan);
    per-nation partials collapse in each batch before the 25-row
    groupby."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(customer_ds), rows_per_part=500_000)

    def bal_partial(batch: pa.Table) -> pa.Table:
        pos = batch.filter(pc.greater(batch.column("c_acctbal"),
                                      pa.scalar(0.0)))
        return pa.table({
            "s": pa.array([pc.sum(pos.column("c_acctbal")).as_py()
                           or 0.0], type=pa.float64()),
            "n": pa.array([pos.num_rows], type=pa.int64())})

    tots = customer_ds.select_columns(["c_acctbal"]) \
        .map_batches(bal_partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    avg_bal = (tots["s"] or 0.0) / max(int(tots["n"] or 0), 1)

    rich = customer_ds.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"),
                                      pa.scalar(float(avg_bal))))
        .select(["c_custkey", "c_nationkey", "c_acctbal"]),
        batch_format="pyarrow")
    since = np.datetime64(idle_since, "us")
    recent = orders_ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("o_orderdate"),
                                            pa.scalar(since)))
        .select(["o_custkey"]),
        batch_format="pyarrow")
    idle = auto_join(rich, recent,
                     left_on="c_custkey", right_on="o_custkey",
                     right_cols=[], how="anti", num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "c_nationkey": pa.array([], type=pa.int64()),
                "n_p": pa.array([], type=pa.int64()),
                "b_p": pa.array([], type=pa.float64())})
        g = batch.group_by(["c_nationkey"]).aggregate(
            [([], "count_all"), ("c_acctbal", "sum")])
        return pa.table({
            "c_nationkey": pc.cast(g.column("c_nationkey"),
                                   pa.int64()),
            "n_p": pc.cast(g.column("count_all"), pa.int64()),
            "b_p": g.column("c_acctbal_sum")})

    agg = idle.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_nationkey").aggregate(
            Sum("n_p", alias_name="numcust"),
            Sum("b_p", alias_name="totacctbal"))
    return agg.map_batches(
        lambda b: pa.table({
            "c_nationkey": pc.cast(b.column("c_nationkey"),
                                   pa.int64()),
            "numcust": pc.cast(b.column("numcust"), pa.int64()),
            "totacctbal": _round_np(b.column("totacctbal"), 2)}),
        batch_format="pyarrow")


def nation_trade_volume(customer_ds, orders_ds, lineitem_ds,
                        supplier_ds, nation_ds, *,
                        nation_a: str = "NATION_1",
                        nation_b: str = "NATION_2",
                        date_lo: str = "1995-01-01",
                        date_hi: str = "1997-01-01"):
    """TPC-H Q7 shape (two-nation trade volume): revenue shipped
    between a pair of nations, in both directions, per shipment
    year — supplier nation from l_suppkey, customer nation through
    the order. -> (supp_nation, cust_nation, l_year, revenue).

    Scale shape: lineitem prunes to the ship window at the scan;
    nation (fixed 25-ish rows) resolves names driver-side; supplier
    nationkeys attach via ``auto_join`` (dimension broadcast under
    its 2M-row threshold, co-partitioned beyond — no driver collect
    of the sf-scaling supplier table, round-4 VERDICT item 2), and
    BOTH join inputs then pre-filter to the two nations of interest
    (~2/|nations| selectivity each) BEFORE the one big exchange — the
    co-partitioned lineitem<-orders join, where orders arrive already
    annotated with c_nationkey from an orders<-customer join that
    moves only (orderkey, nationkey) pairs; the cross-pair cut runs
    vectorized before revenue partials, so the final groupby sees
    (2 directions x years) rows."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    nat = nation_ds.to_pandas()
    name_of = {int(a): str(b) for a, b in zip(nat["n_nationkey"],
                                              nat["n_name"])}
    key_a = [k for k, v in name_of.items() if v == nation_a]
    key_b = [k for k, v in name_of.items() if v == nation_b]
    if not key_a or not key_b:
        raise ValueError("unknown nation name")
    ka, kb = key_a[0], key_b[0]

    def keep_pair(col):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or col not in b.column_names:
                return b
            if pa.types.is_null(b.column(col).type):
                # schema-dropped block: a null nationkey matches
                # neither nation — drop the rows, don't crash is_in
                return b.slice(0, 0)
            return b.filter(pc.is_in(
                b.column(col),
                value_set=pa.array(sorted({ka, kb}),
                                   type=b.column(col).type)))
        return f

    ords = auto_join(
        orders_ds.select_columns(["o_orderkey", "o_custkey"]),
        customer_ds.select_columns(["c_custkey", "c_nationkey"]),
        left_on="o_custkey", right_on="c_custkey",
        right_cols=["c_nationkey"], how="inner",
        num_parts=max(32, P // 8)) \
        .map_batches(keep_pair("c_nationkey"), batch_format="pyarrow")
    li = lineitem_ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
            pc.less(b.column("l_shipdate"), pa.scalar(hi))))
        .select(["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"]),
        batch_format="pyarrow")
    li = auto_join(li,
                   supplier_ds.select_columns(["s_suppkey",
                                               "s_nationkey"]),
                   left_on="l_suppkey", right_on="s_suppkey",
                   right_cols=["s_nationkey"], how="inner",
                   num_parts=P) \
        .map_batches(keep_pair("s_nationkey"), batch_format="pyarrow")
    j = auto_join(li, ords.select_columns(["o_orderkey",
                                           "c_nationkey"]),
                  left_on="l_orderkey", right_on="o_orderkey",
                  right_cols=["c_nationkey"], how="inner",
                  num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "sn": pa.array([], type=pa.int64()),
            "cn": pa.array([], type=pa.int64()),
            "l_year": pa.array([], type=pa.int64()),
            "rev_p": pa.array([], type=pa.float64())})
        if batch.num_rows == 0 \
                or "c_nationkey" not in batch.column_names \
                or "s_nationkey" not in batch.column_names:
            return empty
        sn = batch.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cn = batch.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = ((sn == ka) & (cn == kb)) | ((sn == kb) & (cn == ka))
        if not keep.any():
            return empty
        b = batch.filter(pa.array(keep))
        sn, cn = sn[keep], cn[keep]
        yr = b.column("l_shipdate").to_pandas().dt.year \
            .to_numpy(dtype=np.int64)
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount"))) \
            .to_numpy(zero_copy_only=False)
        g = pa.table({"sn": sn, "cn": cn, "l_year": yr, "rev": rev}) \
            .group_by(["sn", "cn", "l_year"]) \
            .aggregate([("rev", "sum")])
        return pa.table({"sn": g.column("sn"), "cn": g.column("cn"),
                         "l_year": g.column("l_year"),
                         "rev_p": g.column("rev_sum")})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby(["sn", "cn", "l_year"]) \
        .aggregate(Sum("rev_p", alias_name="revenue"))
    df = agg.to_pandas()
    if df.empty:
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype=object),
            "cust_nation": pd.Series([], dtype=object),
            "l_year": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64)})
    df["supp_nation"] = df["sn"].map(lambda x: name_of[int(x)])
    df["cust_nation"] = df["cn"].map(lambda x: name_of[int(x)])
    df["revenue"] = df["revenue"].round(2)
    df["l_year"] = df["l_year"].astype(np.int64)
    return df[["supp_nation", "cust_nation", "l_year",
               "revenue"]].sort_values(
        ["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


def chi_square_independence(ds, *, row_col: str = "lang",
                            col_col: str = "source"):
    """Pearson chi-square test of independence over a contingency
    table of two categorical columns (the corpus-audit question "is
    language distribution independent of source?"). -> one row
    (n, n_rows, n_cols, dof, chi2, cramers_v), chi2 summed over the
    FULL marginal grid (zero cells pay their expected count), both
    stats rounded to 6 places.

    Scale shape: per-batch partial counts collapse each batch to its
    distinct (row, col) cells before the groupby, so the exchange
    moves O(cells) rows per block; the contingency table itself is
    |rows| x |cols| (tiny by construction for categorical columns)
    and the grid arithmetic runs once on the driver."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"r": batch.column(row_col),
                      "c": batch.column(col_col)}).drop_null()
        g = t.group_by(["r", "c"]).aggregate([([], "count_all")])
        return pa.table({"r": g.column("r"), "c": g.column("c"),
                         "n_p": pc.cast(g.column("count_all"),
                                        pa.int64())})

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["r", "c"]).aggregate(Sum("n_p", alias_name="n")) \
        .to_pandas()
    if cells.empty:
        return pd.DataFrame({
            "n": pd.Series([0], dtype=np.int64),
            "n_rows": pd.Series([0], dtype=np.int64),
            "n_cols": pd.Series([0], dtype=np.int64),
            "dof": pd.Series([0], dtype=np.int64),
            "chi2": pd.Series([0.0]),
            "cramers_v": pd.Series([0.0])})
    piv = cells.pivot_table(index="r", columns="c", values="n",
                            fill_value=0, aggfunc="sum")
    obs = piv.to_numpy(dtype=np.float64)
    tot = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / tot
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    r, c = obs.shape
    dof = (r - 1) * (c - 1)
    v = math.sqrt(chi2 / (tot * min(r - 1, c - 1))) \
        if min(r - 1, c - 1) > 0 else 0.0
    return pd.DataFrame({
        "n": pd.Series([int(tot)], dtype=np.int64),
        "n_rows": pd.Series([r], dtype=np.int64),
        "n_cols": pd.Series([c], dtype=np.int64),
        "dof": pd.Series([dof], dtype=np.int64),
        "chi2": pd.Series([round(chi2, 6)]),
        "cramers_v": pd.Series([round(v, 6)])})


def mann_whitney_u(events_ds, *, group_col: str = "event_type",
                   a: str = "click", b: str = "view",
                   value_col: str = "value"):
    """Mann-Whitney U rank-sum test between two groups' value
    distributions (the nonparametric sibling of ab_test_welch):
    average ranks over the pooled sample with exact tie handling,
    U_a = R_a - n_a(n_a+1)/2, and the tie-corrected normal
    approximation z. -> one row (n_a, n_b, u_a, z), both stats
    rounded to 6 places.

    Scale shape: the pooled sample collapses to DISTINCT values first
    (per-batch partials, then one groupby(value)); ranking is the
    shared two-pass block-offset prefix pattern over the sorted
    distinct-value table (vocab_growth / global_rank idiom) — the
    driver sees O(blocks) boundary rows plus one final scalar row,
    never the data. Rank sums are integer-plus-half values, exact in
    doubles below 2^52, so both engines agree bit-for-bit before the
    final float z."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        keep = pc.or_(pc.equal(g, pa.scalar(a)),
                      pc.equal(g, pa.scalar(b)))
        t = batch.filter(keep)
        ia = pc.cast(pc.equal(t.column(group_col), pa.scalar(a)),
                     pa.int64())
        tt = pa.table({"value": t.column(value_col), "ia": ia}) \
            .drop_null()
        g2 = tt.group_by(["value"]).aggregate(
            [("ia", "sum"), ([], "count_all")])
        return pa.table({"value": g2.column("value"),
                         "na_p": g2.column("ia_sum"),
                         "nt_p": pc.cast(g2.column("count_all"),
                                         pa.int64())})

    dist = events_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(Sum("na_p", alias_name="na"),
                                    Sum("nt_p", alias_name="nt")) \
        .sort("value").materialize()

    def block_tot(batch: pa.Table) -> pa.Table:
        n = min(batch.num_rows, 1)
        return pa.table({
            "v0": batch.column("value").slice(0, 1),
            "snt": pa.array([int(pc.sum(batch.column("nt")).as_py()
                             or 0)] * n, type=pa.int64())})

    tots = dist.map_batches(block_tot, batch_size=None,
                            batch_format="pyarrow").to_pandas() \
        .sort_values("v0").reset_index(drop=True)
    if tots.empty:
        return pd.DataFrame({
            "n_a": pd.Series([0], dtype=np.int64),
            "n_b": pd.Series([0], dtype=np.int64),
            "u_a": pd.Series([0.0]), "z": pd.Series([0.0])})
    offset = {float(v0): int(o) for v0, o in zip(
        tots["v0"], tots["snt"].cumsum().shift(fill_value=0))}

    def block_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"ra": pa.array([], type=pa.float64()),
                             "n1": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "ties": pa.array([], type=pa.float64())})
        na = batch.column("na").to_numpy().astype(np.float64)
        nt = batch.column("nt").to_numpy().astype(np.float64)
        off = offset[float(batch.column("value")[0].as_py())]
        cb = off + np.cumsum(nt) - nt
        ra = float((na * (cb + (nt + 1.0) / 2.0)).sum())
        return pa.table({
            "ra": pa.array([ra], type=pa.float64()),
            "n1": pa.array([int(na.sum())], type=pa.int64()),
            "n": pa.array([int(nt.sum())], type=pa.int64()),
            "ties": pa.array([float((nt ** 3 - nt).sum())],
                             type=pa.float64())})

    parts = dist.map_batches(block_stats, batch_size=None,
                             batch_format="pyarrow").to_pandas()
    ra = float(parts["ra"].sum())
    n1 = float(parts["n1"].sum())
    n = float(parts["n"].sum())
    ties = float(parts["ties"].sum())
    n2 = n - n1
    u_a = ra - n1 * (n1 + 1.0) / 2.0
    if n1 > 0 and n2 > 0 and n > 1:
        var = n1 * n2 / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
        z = (u_a - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else 0.0
    else:
        z = 0.0
    return pd.DataFrame({
        "n_a": pd.Series([int(n1)], dtype=np.int64),
        "n_b": pd.Series([int(n2)], dtype=np.int64),
        "u_a": pd.Series([round(u_a, 6)]),
        "z": pd.Series([round(z, 6)])})


def market_share(customer_ds, orders_ds, lineitem_ds, supplier_ds,
                 nation_ds, region_ds, part_ds, *,
                 region: str = "ASIA",
                 supp_nation: str = "NATION_5",
                 p_type: str = "PROMO",
                 date_lo: str = "1995-01-01",
                 date_hi: str = "1997-01-01"):
    """TPC-H Q8 shape (national market share): within one region's
    customers and one part type, the share of yearly revenue supplied
    by one nation. -> (o_year, nation_revenue, total_revenue,
    mkt_share); money rounded to 2, share to 6, share computed on the
    RAW sums before rounding.

    Scale shape: region->nation stays a fixed 25/5-row driver map;
    part (type predicate, semi) and supplier (nation flag, inner)
    attach via auto_join — broadcast while they fit, co-partitioned
    shuffle once they outgrow it (both scale with sf); orders prune
    to the window at the scan and semi-reduce to region customers;
    per-batch partials collapse to (year, is_nation) pairs so the
    final groupby sees a handful of rows."""
    import ray
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    nat = nation_ds.to_pandas()
    reg = region_ds.to_pandas()
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"])
    region_nations = set(
        int(k) for k, rk in zip(nat["n_nationkey"], nat["n_regionkey"])
        if int(rk) in rkeys)
    sn_keys = [int(k) for k, nm in zip(nat["n_nationkey"],
                                       nat["n_name"])
               if str(nm) == supp_nation]
    if not sn_keys:
        raise ValueError("unknown supplier nation")
    sn_key = sn_keys[0]

    # part and supplier scale with sf: the type predicate rides a
    # semi auto_join and the nation flag an inner auto_join —
    # broadcast while they fit, co-partitioned shuffle beyond
    pt = part_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_type"),
                                    pa.scalar(p_type)))
        .select(["p_partkey"]), batch_format="pyarrow")

    rn = np.array(sorted(region_nations), dtype=np.int64)

    def region_cust(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(ck, rn))) \
            .select(["c_custkey"])

    cust = customer_ds.map_batches(region_cust,
                                   batch_format="pyarrow")
    orders = orders_ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
            pc.less(b.column("o_orderdate"), pa.scalar(hi))))
        .select(["o_orderkey", "o_custkey", "o_orderdate"]),
        batch_format="pyarrow")
    o_reg = auto_join(orders, cust, left_on="o_custkey",
                      right_on="c_custkey", right_cols=[],
                      how="semi", num_parts=max(32, P // 8))

    li = auto_join(
        lineitem_ds.select_columns(
            ["l_orderkey", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"]),
        pt, left_on="l_partkey", right_on="p_partkey",
        right_cols=[], how="semi", num_parts=P)
    li = auto_join(li, supplier_ds.select_columns(
        ["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        right_cols=["s_nationkey"], how="inner", num_parts=P)
    j = auto_join(li, o_reg.select_columns(["o_orderkey",
                                            "o_orderdate"]),
                  left_on="l_orderkey", right_on="o_orderkey",
                  right_cols=["o_orderdate"], how="inner",
                  num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_year": pa.array([], type=pa.int64()),
            "nat_p": pa.array([], type=pa.float64()),
            "tot_p": pa.array([], type=pa.float64())})
        if batch.num_rows == 0 \
                or "o_orderdate" not in batch.column_names:
            return empty
        is_n = batch.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64) == sn_key
        yr = batch.column("o_orderdate").to_pandas().dt.year \
            .to_numpy(dtype=np.int64)
        rev = (batch.column("l_extendedprice").to_numpy()
               * (1.0 - batch.column("l_discount").to_numpy()))
        g = pa.table({"o_year": yr,
                      "nat": np.where(is_n, rev, 0.0),
                      "tot": rev}) \
            .group_by(["o_year"]) \
            .aggregate([("nat", "sum"), ("tot", "sum")])
        return pa.table({"o_year": g.column("o_year"),
                         "nat_p": g.column("nat_sum"),
                         "tot_p": g.column("tot_sum")})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_year").aggregate(
            Sum("nat_p", alias_name="nat"),
            Sum("tot_p", alias_name="tot")).to_pandas()
    if agg.empty:
        return pd.DataFrame({
            "o_year": pd.Series([], dtype=np.int64),
            "nation_revenue": pd.Series([], dtype=np.float64),
            "total_revenue": pd.Series([], dtype=np.float64),
            "mkt_share": pd.Series([], dtype=np.float64)})
    out = pd.DataFrame({
        "o_year": agg["o_year"].astype(np.int64),
        "nation_revenue": agg["nat"].round(2),
        "total_revenue": agg["tot"].round(2),
        "mkt_share": (agg["nat"] / agg["tot"]).round(6)})
    return out.sort_values("o_year").reset_index(drop=True)


def product_profit(orders_ds, lineitem_ds, supplier_ds, nation_ds,
                   part_ds, *, name_token: str = "widget",
                   cost_factor: float = 0.6):
    """TPC-H Q9 shape (product-type profit), adapted to this corpus's
    reduced schema: for parts whose name contains ``name_token``,
    profit = l_extendedprice * (1 - l_discount) -
    cost_factor * p_retailprice * l_quantity (no partsupp table, so
    unit cost is a fixed fraction of the part's retail price),
    grouped by the SUPPLIER's nation and the order year. ->
    (n_name, o_year, profit), money rounded to 2.

    Exactness: prices and discounts carry <= 2 decimals, so per-row
    profit x 10^4 is a TRUE integer; both engines round the float to
    that integer and sum in int64 — profit sums are order-free and
    bit-exact (a float-summed draft differed from the oracle on a
    group landing exactly on a half-cent boundary).

    Scale shape: part (name-matched at the scan) and
    supplier->nationkey both attach via auto_join — broadcast while
    they fit, co-partitioned shuffle once they don't (part and
    supplier scale linearly with sf, unlike the fixed 25-row nation
    table, which stays a driver map); lineitem prunes to matching
    parts at the first join; partials collapse to (nation, year)
    cells per batch."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    nat = nation_ds.to_pandas()
    name_of = {int(a): str(b) for a, b in zip(nat["n_nationkey"],
                                              nat["n_name"])}

    pt = part_ds.map_batches(
        lambda b: b.filter(pc.match_substring(
            b.column("p_name"), name_token))
        .select(["p_partkey", "p_retailprice"]),
        batch_format="pyarrow")

    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"])
    li = auto_join(li, pt, left_on="l_partkey", right_on="p_partkey",
                   right_cols=["p_retailprice"], how="inner",
                   num_parts=P)
    li = auto_join(li, supplier_ds.select_columns(
        ["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        right_cols=["s_nationkey"], how="inner", num_parts=P)
    j = auto_join(li, orders_ds.select_columns(["o_orderkey",
                                                "o_orderdate"]),
                  left_on="l_orderkey", right_on="o_orderkey",
                  right_cols=["o_orderdate"], how="inner",
                  num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "nk": pa.array([], type=pa.int64()),
            "o_year": pa.array([], type=pa.int64()),
            "pr_p": pa.array([], type=pa.int64())})
        if batch.num_rows == 0 \
                or "o_orderdate" not in batch.column_names:
            return empty
        nk = batch.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        yr = batch.column("o_orderdate").to_pandas().dt.year \
            .to_numpy(dtype=np.int64)
        rev4 = np.rint(batch.column("l_extendedprice").to_numpy()
                       * (1.0 - batch.column("l_discount").to_numpy())
                       * 10_000.0).astype(np.int64)
        cost4 = np.rint(cost_factor
                        * batch.column("p_retailprice").to_numpy()
                        * batch.column("l_quantity").to_numpy()
                        * 10_000.0).astype(np.int64)
        g = pa.table({"nk": nk, "o_year": yr, "pr": rev4 - cost4}) \
            .group_by(["nk", "o_year"]).aggregate([("pr", "sum")])
        return pa.table({"nk": g.column("nk"),
                         "o_year": g.column("o_year"),
                         "pr_p": g.column("pr_sum")})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby(["nk", "o_year"]) \
        .aggregate(Sum("pr_p", alias_name="profit")).to_pandas()
    if agg.empty:
        return pd.DataFrame({
            "n_name": pd.Series([], dtype=object),
            "o_year": pd.Series([], dtype=np.int64),
            "profit": pd.Series([], dtype=np.float64)})
    out = pd.DataFrame({
        "n_name": agg["nk"].map(lambda x: name_of.get(int(x), "")),
        "o_year": agg["o_year"].astype(np.int64),
        # 1e-4-unit int -> cents with half-away-from-zero rounding,
        # all in int64 (float round(x, 2) is half-even in numpy but
        # half-away in the oracle; integers sidestep the disagreement)
        "profit": (np.sign(agg["profit"].to_numpy())
                   * ((np.abs(agg["profit"].to_numpy()) + 50) // 100)
                   ) / 100.0})
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)


def waiting_suppliers(supplier_ds, orders_ds, lineitem_ds, *,
                      grace_days: int = 60, top: int = 100):
    """TPC-H Q21 shape (suppliers who kept orders waiting — the
    EXISTS + NOT EXISTS double self-join): for finished orders
    ('F') served by AT LEAST TWO distinct suppliers, count per
    supplier the orders where that supplier shipped late and NO
    other supplier did (this corpus carries no l_commitdate /
    l_receiptdate, so late = l_shipdate > o_orderdate + grace, the
    same convention as late_shipment_priority). ->
    (s_name, numwait), numwait desc / s_name asc, top ``top``.

    Scale shape: orders prune to status 'F' at the scan and ship
    (key, date) into ONE co-partitioned hash join with (orderkey,
    suppkey, shipdate); an orderkey group never straddles a join
    partition, so the whole EXISTS/NOT-EXISTS collapse — per-pair
    late flag, per-order supplier/late-supplier counts, the
    exactly-one-late-and-it-is-you selection — runs vectorized
    INSIDE each partition batch; only per-supplier partial counts
    reach the final |suppliers|-row groupby, and only that result
    (bounded by the supplier table) reaches the driver for the
    name attach + top-k."""
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    grace_us = np.int64(grace_days) * 86_400_000_000
    P = parts_for(plan_rows(lineitem_ds), rows_per_part=500_000)

    orders = orders_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"),
                                    pa.scalar("F")))
        .select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow")
    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_shipdate"])
    # MUST stay a partitioned hash join: the per-batch EXISTS
    # collapse below depends on every orderkey group landing in
    # ONE batch — auto_join's broadcast path does not co-partition
    j = hash_join(li, orders, left_on="l_orderkey",
                  right_on="o_orderkey", right_cols=["o_orderdate"],
                  how="inner", num_parts=P)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "l_suppkey": pa.array([], type=pa.int64()),
            "w_p": pa.array([], type=pa.int64())})
        if batch.num_rows == 0 \
                or "o_orderdate" not in batch.column_names:
            return empty
        ship = batch.column("l_shipdate").cast(pa.int64())
        odate = batch.column("o_orderdate").cast(pa.int64())
        late = pc.cast(pc.greater(ship, pc.add(odate,
                                               pa.scalar(grace_us))),
                       pa.int64())
        # per (order, supplier): did this supplier ship late at all
        pair = pa.table({
            "ok": pc.cast(batch.column("l_orderkey"), pa.int64()),
            "sk": pc.cast(batch.column("l_suppkey"), pa.int64()),
            "late": late,
        }).group_by(["ok", "sk"]).aggregate([("late", "max")])
        # per order: distinct suppliers and how many of them were late
        st = pair.group_by(["ok"]).aggregate(
            [([], "count_all"), ("late_max", "sum")])
        nsupp = dict(zip(st.column("ok").to_pylist(),
                         st.column("count_all").to_pylist()))
        nlate = dict(zip(st.column("ok").to_pylist(),
                         st.column("late_max_sum").to_pylist()))
        ok = pair.column("ok").to_numpy()
        lt = pair.column("late_max").to_numpy()
        ns = np.fromiter((nsupp[o] for o in ok), dtype=np.int64,
                         count=len(ok))
        nl = np.fromiter((nlate[o] for o in ok), dtype=np.int64,
                         count=len(ok))
        keep = (lt == 1) & (ns >= 2) & (nl == 1)
        if not keep.any():
            return empty
        g = pair.filter(pa.array(keep)).group_by(["sk"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "l_suppkey": pc.cast(g.column("sk"), pa.int64()),
            "w_p": pc.cast(g.column("count_all"), pa.int64())})

    # pin the per-supplier cells: auto_join's schema probe would
    # otherwise re-run the whole aggregation once for the schema and
    # again for the consume (all-to-all upstreams execute fully on
    # .schema(), unlike map-only chains)
    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey") \
        .aggregate(Sum("w_p", alias_name="numwait")).materialize()
    # supplier scales with sf: the name attach is an auto_join, not a
    # driver collect of the whole supplier table
    out = auto_join(agg, supplier_ds.select_columns(
        ["s_suppkey", "s_name"]),
        left_on="l_suppkey", right_on="s_suppkey",
        right_cols=["s_name"], how="inner").to_pandas()
    if out.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype=object),
                             "numwait": pd.Series([], dtype=np.int64)})
    out = pd.DataFrame({"s_name": out["s_name"],
                        "numwait": out["numwait"].astype(np.int64)})
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True]) \
        .head(top).reset_index(drop=True)


def min_cost_supplier(part_ds, supplier_ds, lineitem_ds, nation_ds,
                      region_ds, *, region: str = "EUROPE",
                      max_size: int = 10, ptype: str = "STANDARD",
                      top: int = 100):
    """TPC-H Q2 shape (correlated min subquery): for every part of
    the requested type with size <= max_size, find the supplier(s)
    in ``region`` offering the MINIMUM unit price for that part
    (this corpus has no partsupp, so a pair's offer price is the
    minimum l_extendedprice / l_quantity over its lineitems), and
    report them ordered s_acctbal desc / n_name / s_name /
    p_partkey, top ``top``. -> (s_acctbal, s_name, n_name,
    p_partkey, cost).

    Scale shape: part and supplier scale with sf, so lineitem
    prunes to qualifying (part, supplier) rows via two auto_join
    semi-joins (broadcast key-set probe while the dimension side
    fits, co-partitioned shuffle beyond), collapses to per-batch
    (partkey, suppkey) min partials, and the only forced shuffle is
    a groupby over qualifying PAIRS (bounded by
    |parts| x |region suppliers|); the correlated per-part min +
    equality selection is a second tiny groupby + auto_join, the
    name attach is an auto_join against supplier, and only the
    top-``top`` result reaches the driver. Nation/region stay fixed
    25/5-row driver maps."""
    import ray
    from ray.data.aggregate import Min

    nat = nation_ds.to_pandas()
    reg = region_ds.to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"]
                .astype(int))
    nat_in = nat[nat["n_regionkey"].astype(int).isin(rkeys)]
    name_of = {int(a): str(b) for a, b in zip(nat_in["n_nationkey"],
                                              nat_in["n_name"])}
    nkeys = pa.array(sorted(name_of), type=pa.int64())

    # pinned: the semi-join key probe AND the final name attach both
    # consume this filtered projection — one scan of supplier, not two
    sup_in = supplier_ds.map_batches(
        lambda b: b.filter(pc.is_in(
            pc.cast(b.column("s_nationkey"), pa.int64()),
            value_set=nkeys))
        .select(["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]),
        batch_format="pyarrow").materialize()
    parts = part_ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.less_equal(b.column("p_size"), pa.scalar(max_size)),
            pc.equal(b.column("p_type"), pa.scalar(ptype))))
        .select(["p_partkey"]), batch_format="pyarrow")

    li = lineitem_ds.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    li = auto_join(li, parts, left_on="l_partkey",
                   right_on="p_partkey", right_cols=[], how="semi")
    li = auto_join(li, sup_in.select_columns(["s_suppkey"]),
                   left_on="l_suppkey", right_on="s_suppkey",
                   right_cols=[], how="semi")

    def offer_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "p_partkey": pa.array([], type=pa.int64()),
                "s_suppkey": pa.array([], type=pa.int64()),
                "c_p": pa.array([], type=pa.float64())})
        cost = (b.column("l_extendedprice").to_numpy()
                / b.column("l_quantity").to_numpy())
        g = pa.table({
            "p_partkey": pc.cast(b.column("l_partkey"), pa.int64()),
            "s_suppkey": pc.cast(b.column("l_suppkey"), pa.int64()),
            "cost": pa.array(cost),
        }).group_by(["p_partkey", "s_suppkey"]).aggregate(
            [("cost", "min")])
        return g.rename_columns(["p_partkey", "s_suppkey", "c_p"])

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        # ONE exchange does everything correlated: per-(part,supplier)
        # min over the batch partials, then the per-part MIN +
        # equality selection — all inside the p_partkey group
        m = g.groupby("s_suppkey", as_index=False)["c_p"].min()
        m = m[m["c_p"] == m["c_p"].min()]
        return pd.DataFrame({
            "p_partkey": g["p_partkey"].iloc[:1].repeat(len(m)
                                                        ).to_numpy(),
            "s_suppkey": m["s_suppkey"].to_numpy(),
            "cost": m["c_p"].to_numpy()})

    # pinned for the same schema-probe reason as waiting_suppliers
    win = li.map_batches(offer_partial, batch_format="pyarrow") \
        .groupby("p_partkey").map_groups(winners,
                                         batch_format="pandas") \
        .materialize()
    win = auto_join(win, sup_in, left_on="s_suppkey",
                    right_on="s_suppkey",
                    right_cols=["s_name", "s_acctbal", "s_nationkey"],
                    how="inner")

    def shape(b: pa.Table) -> pa.Table:
        nm = [name_of[int(k)] for k in
              b.column("s_nationkey").to_pylist()]
        # half-AWAY at 6 dp (costs are non-negative): unit prices are
        # often exact binary halves (ext / 2^k quantities), where
        # np.round's half-even and the oracle's half-away disagree
        cost = np.floor(b.column("cost").to_numpy(
            zero_copy_only=False) * 1e6 + 0.5) / 1e6
        return pa.table({
            "s_acctbal": pc.cast(b.column("s_acctbal"), pa.float64()),
            "s_name": b.column("s_name"),
            "n_name": pa.array(nm, type=pa.string()),
            "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
            "cost": pa.array(cost, type=pa.float64())})

    res = win.map_batches(shape, batch_format="pyarrow")
    # distributed top-k: negate the one desc key, sort, limit
    out = res.add_column(
        "_negbal", lambda b: pc.negate(b["s_acctbal"]),
        batch_format="pyarrow") \
        .sort(["_negbal", "n_name", "s_name", "p_partkey"]) \
        .limit(top).drop_columns(["_negbal"]).to_pandas()
    if out.empty:
        return pd.DataFrame({
            "s_acctbal": pd.Series([], dtype=np.float64),
            "s_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "p_partkey": pd.Series([], dtype=np.int64),
            "cost": pd.Series([], dtype=np.float64)})
    return out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True]).reset_index(drop=True)


def important_parts(lineitem_ds, supplier_ds, *,
                    nation_key: int = 3, denom: int = 5000):
    """TPC-H Q11 shape (GROUP BY + HAVING against a scalar
    subquery): per part, the revenue contributed by suppliers of
    one nation, keeping parts whose share exceeds 1/denom of that
    nation's total (no partsupp here, so 'value' is lineitem
    revenue rather than supplycost x availqty). ->
    (l_partkey, value).

    Exactness: revenue x 10^4 is a true integer (2-dp prices x
    2-dp discounts), so partials sum in int64 and the HAVING
    comparison is exact integer arithmetic (value * denom > total)
    — no float-order-dependent threshold flips.

    Scale shape: the supplier table scales with sf, so lineitem
    prunes to the nation's suppliers via an auto_join SEMI
    (broadcast key-set probe while the supplier side fits, shuffle
    beyond), collapses to per-batch (partkey, int-revenue)
    partials, one groupby over per-part cells pinned once in the
    object store; the scalar total is a Sum aggregate (one
    number), and the HAVING filter runs distributed with the
    broadcast scalar."""
    from ray.data.aggregate import Sum

    nat_sup = supplier_ds.map_batches(
        lambda b: b.filter(pc.equal(
            pc.cast(b.column("s_nationkey"), pa.int64()),
            pa.scalar(nation_key, type=pa.int64())))
        .select(["s_suppkey"]), batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "l_partkey": pa.array([], type=pa.int64()),
                "v_p": pa.array([], type=pa.int64())})
        ext = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        cents = np.round(ext * (1.0 - disc) * 10_000.0).astype(np.int64)
        g = pa.table({
            "l_partkey": pc.cast(b.column("l_partkey"), pa.int64()),
            "v": pa.array(cents),
        }).group_by(["l_partkey"]).aggregate([("v", "sum")])
        return g.rename_columns(["l_partkey", "v_p"])

    li = auto_join(
        lineitem_ds.select_columns(
            ["l_partkey", "l_suppkey", "l_extendedprice",
             "l_discount"]),
        nat_sup, left_on="l_suppkey", right_on="s_suppkey",
        right_cols=[], how="semi")
    # pin the per-part cells: the scalar total and the HAVING filter
    # both consume them — one copy, not a double lineitem scan
    vals = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("v_p", alias_name="v")) \
        .materialize()
    tot = vals.aggregate(Sum("v", alias_name="t"))
    total = int(tot["t"] or 0)
    if total == 0:
        # all-empty aggregates lose their schema in Ray; pin it
        return pd.DataFrame({
            "l_partkey": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=np.float64)})

    def having(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = v * denom > total
        b = batch.filter(pa.array(keep))
        vv = b.column("v").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "l_partkey": pc.cast(b.column("l_partkey"), pa.int64()),
            "value": pa.array(vv / 10_000.0)})

    return vals.map_batches(having, batch_format="pyarrow")


def supplier_part_counts(lineitem_ds, part_ds, supplier_ds, *,
                         exclude_brand: str = "Brand#1",
                         exclude_type: str = "PROMO",
                         max_size: int = 25):
    """TPC-H Q16 shape (relationship distinct-count with a NOT-IN
    side filter): per (p_brand, p_type, p_size), the number of
    DISTINCT suppliers that shipped that part, where the part is
    not the excluded brand/type and sizes <= max_size, and
    suppliers with negative account balance are excluded (the
    'customer complaints' NOT IN analog; no partsupp here, so the
    part-supplier relation is distinct lineitem pairs). ->
    (p_brand, p_type, p_size, supplier_cnt).

    Scale shape: part and supplier scale with sf, so lineitem pairs
    drop bad-balance suppliers via an auto_join ANTI (broadcast
    key-set probe while the supplier side fits, shuffle beyond) and
    pick up part attributes via an auto_join INNER against the
    pre-filtered part table (the filter doubles as the brand/type/
    size predicate); batches collapse to distinct annotated
    (brand, type, size, suppkey) rows, ONE groupby de-dupes pairs
    globally, and the count collapses per group — nothing bigger
    than the distinct pair set ever shuffles."""
    from ray.data.aggregate import Sum

    pt = part_ds.map_batches(
        lambda b: b.filter(pc.and_(pc.and_(
            pc.not_equal(b.column("p_brand"),
                         pa.scalar(exclude_brand)),
            pc.not_equal(b.column("p_type"),
                         pa.scalar(exclude_type))),
            pc.less_equal(b.column("p_size"), pa.scalar(max_size))))
        .select(["p_partkey", "p_brand", "p_type", "p_size"]),
        batch_format="pyarrow")
    bad = supplier_ds.map_batches(
        lambda b: b.filter(pc.less(b.column("s_acctbal"),
                                   pa.scalar(0.0)))
        .select(["s_suppkey"]), batch_format="pyarrow")

    li = lineitem_ds.select_columns(["l_partkey", "l_suppkey"])
    li = auto_join(li, bad, left_on="l_suppkey",
                   right_on="s_suppkey", right_cols=[], how="anti")
    li = auto_join(li, pt, left_on="l_partkey", right_on="p_partkey",
                   right_cols=["p_brand", "p_type", "p_size"],
                   how="inner")

    def annotate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "p_brand": pa.array([], type=pa.string()),
                "p_type": pa.array([], type=pa.string()),
                "p_size": pa.array([], type=pa.int64()),
                "s_suppkey": pa.array([], type=pa.int64())})
        return pa.table({
            "p_brand": pc.cast(batch.column("p_brand"), pa.string()),
            "p_type": pc.cast(batch.column("p_type"), pa.string()),
            "p_size": pc.cast(batch.column("p_size"), pa.int64()),
            "s_suppkey": pc.cast(batch.column("l_suppkey"),
                                 pa.int64()),
        }).group_by(["p_brand", "p_type", "p_size",
                     "s_suppkey"]).aggregate([])

    pairs = li.map_batches(annotate, batch_format="pyarrow") \
        .groupby(["p_brand", "p_type", "p_size", "s_suppkey"]) \
        .count()

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["p_brand", "p_type", "p_size"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            "p_brand": g.column("p_brand"),
            "p_type": g.column("p_type"),
            "p_size": pc.cast(g.column("p_size"), pa.int64()),
            "c_p": pc.cast(g.column("count_all"), pa.int64())})

    agg = pairs.map_batches(count_partial, batch_format="pyarrow") \
        .groupby(["p_brand", "p_type", "p_size"]) \
        .aggregate(Sum("c_p", alias_name="supplier_cnt"))
    return agg.map_batches(
        lambda b: pa.table({
            "p_brand": b.column("p_brand"),
            "p_type": b.column("p_type"),
            "p_size": pc.cast(b.column("p_size"), pa.int64()),
            "supplier_cnt": pc.cast(b.column("supplier_cnt"),
                                    pa.int64())}),
        batch_format="pyarrow")


def promotion_suppliers(part_ds, lineitem_ds, supplier_ds, *,
                        token: str = "widget", year: int = 1995,
                        qty_threshold: float = 400.0):
    """TPC-H Q20 shape (nested IN-chain semi-joins): suppliers whose
    total shipped quantity of parts named like ``token`` during
    ``year`` exceeds ``qty_threshold`` (the availqty > 0.5 x
    shipped-qty test, inverted for a corpus without partsupp). ->
    (s_name, s_acctbal), s_name asc.

    Exactness: quantities are whole numbers, so float partial sums
    are exact integers well under 2^53 and the threshold compare
    cannot flip on summation order.

    Scale shape: part and supplier scale with sf — the token
    predicate rides a semi auto_join and the name attach an inner
    auto_join (broadcast while they fit, co-partitioned shuffle
    beyond); lineitem prunes to (part set x ship-year) and collapses
    to per-batch per-supplier quantity partials; one groupby over
    |suppliers| cells; only the qualifying result reaches the
    driver."""
    from ray.data.aggregate import Sum

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")
    parts = part_ds.map_batches(
        lambda b: b.filter(pc.match_substring(b.column("p_name"),
                                              token))
        .select(["p_partkey"]), batch_format="pyarrow")
    li = lineitem_ds.select_columns(
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]) \
        .map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
            pc.less(b.column("l_shipdate"), pa.scalar(hi)))),
        batch_format="pyarrow")
    li = auto_join(li, parts, left_on="l_partkey",
                   right_on="p_partkey", right_cols=[], how="semi")

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "s_suppkey": pa.array([], type=pa.int64()),
                "q_p": pa.array([], type=pa.float64())})
        g = pa.table({
            "s_suppkey": pc.cast(b.column("l_suppkey"), pa.int64()),
            "q": b.column("l_quantity"),
        }).group_by(["s_suppkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["s_suppkey", "q_p"])

    qty = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("s_suppkey") \
        .aggregate(Sum("q_p", alias_name="qty"))
    # pinned for the same schema-probe reason as waiting_suppliers
    qty = qty.map_batches(
        lambda b: b.filter(pc.greater(b.column("qty"),
                                      pa.scalar(qty_threshold))),
        batch_format="pyarrow").materialize()
    hit = auto_join(qty, supplier_ds.select_columns(
        ["s_suppkey", "s_name", "s_acctbal"]),
        left_on="s_suppkey", right_on="s_suppkey",
        right_cols=["s_name", "s_acctbal"], how="inner").to_pandas()
    if hit.empty:
        return pd.DataFrame({
            "s_name": pd.Series([], dtype=object),
            "s_acctbal": pd.Series([], dtype=np.float64)})
    out = pd.DataFrame({
        "s_name": hit["s_name"],
        "s_acctbal": hit["s_acctbal"].astype(np.float64)})
    return out.sort_values("s_name").reset_index(drop=True)


def ks_test(events_ds, *, group_col: str = "event_type",
            a: str = "click", b: str = "view",
            value_col: str = "value"):
    """Two-sample Kolmogorov-Smirnov test between two groups' value
    distributions: D = max_v |F_a(v) - F_b(v)| over the pooled
    distinct values, plus the asymptotic statistic
    z = D * sqrt(n_a n_b / (n_a + n_b)). -> one row
    (n_a, n_b, d_stat, ks_z), floats rounded to 6.

    Scale shape: mann_whitney_u's distinct-value idiom — per-batch
    (value, count_a, count_total) partials, ONE groupby(value), sort,
    then the two-pass block-offset prefix: pass 1 ships one boundary
    row per block to the driver (cumulative offsets), pass 2 computes
    each block's local max |CDF gap| with vectorized prefix sums; the
    driver reduces O(blocks) scalars. The CDF gap is evaluated in
    float (counts / totals) so cumulative counts near 10^12 never
    overflow an int64 cross-product; both engines evaluate the
    identical IEEE expression on identical integers."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        keep = pc.or_(pc.equal(g, pa.scalar(a)),
                      pc.equal(g, pa.scalar(b)))
        t = batch.filter(keep)
        ia = pc.cast(pc.equal(t.column(group_col), pa.scalar(a)),
                     pa.int64())
        tt = pa.table({"value": t.column(value_col), "ia": ia}) \
            .drop_null()
        g2 = tt.group_by(["value"]).aggregate(
            [("ia", "sum"), ([], "count_all")])
        return pa.table({"value": g2.column("value"),
                         "na_p": g2.column("ia_sum"),
                         "nt_p": pc.cast(g2.column("count_all"),
                                         pa.int64())})

    dist = events_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(Sum("na_p", alias_name="na"),
                                    Sum("nt_p", alias_name="nt")) \
        .sort("value").materialize()

    def block_tot(batch: pa.Table) -> pa.Table:
        n = min(batch.num_rows, 1)
        na = batch.column("na").to_numpy()
        nt = batch.column("nt").to_numpy()
        return pa.table({
            "v0": batch.column("value").slice(0, 1),
            "sa": pa.array([int(na.sum())] * n, type=pa.int64()),
            "sb": pa.array([int((nt - na).sum())] * n,
                           type=pa.int64())})

    tots = dist.map_batches(block_tot, batch_size=None,
                            batch_format="pyarrow").to_pandas() \
        .sort_values("v0").reset_index(drop=True)
    if tots.empty:
        return pd.DataFrame({
            "n_a": pd.Series([0], dtype=np.int64),
            "n_b": pd.Series([0], dtype=np.int64),
            "d_stat": pd.Series([0.0]), "ks_z": pd.Series([0.0])})
    ta = int(tots["sa"].sum())
    tb = int(tots["sb"].sum())
    off_a = {float(v): int(o) for v, o in zip(
        tots["v0"], tots["sa"].cumsum().shift(fill_value=0))}
    off_b = {float(v): int(o) for v, o in zip(
        tots["v0"], tots["sb"].cumsum().shift(fill_value=0))}
    if ta == 0 or tb == 0:
        return pd.DataFrame({
            "n_a": pd.Series([ta], dtype=np.int64),
            "n_b": pd.Series([tb], dtype=np.int64),
            "d_stat": pd.Series([0.0]), "ks_z": pd.Series([0.0])})

    def block_max(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"d": pa.array([], type=pa.float64())})
        na = batch.column("na").to_numpy().astype(np.int64)
        nb = (batch.column("nt").to_numpy().astype(np.int64) - na)
        v0 = float(batch.column("value")[0].as_py())
        ca = off_a[v0] + np.cumsum(na)
        cb = off_b[v0] + np.cumsum(nb)
        d = np.abs(ca / float(ta) - cb / float(tb)).max()
        return pa.table({"d": pa.array([float(d)],
                                       type=pa.float64())})

    parts = dist.map_batches(block_max, batch_size=None,
                             batch_format="pyarrow").to_pandas()
    d = float(parts["d"].max())
    ks_z = d * math.sqrt(ta * tb / float(ta + tb))
    return pd.DataFrame({
        "n_a": pd.Series([ta], dtype=np.int64),
        "n_b": pd.Series([tb], dtype=np.int64),
        "d_stat": pd.Series([round(d, 6)]),
        "ks_z": pd.Series([round(ks_z, 6)])})


def spearman_corr(lineitem_ds, *, x_col: str = "l_quantity",
                  y_col: str = "l_extendedprice"):
    """Spearman rank correlation between two columns with exact
    average-rank tie handling: Pearson over CENTERED average ranks,

        rho = sum(crx * cry) / sqrt(sum(crx^2) * sum(cry^2)),
        cr  = avg_rank(v) - (n + 1) / 2.

    Centering is exact (ranks and the mean are halves), so every
    product is computed on exact doubles and the only float error is
    the final summation — bounded far below the 6-dp rounding
    contract even at 10^12 rows (no big-minus-big cancellation, which
    the uncentered n*Sxy - Sx*Sy form would hit). -> one row
    (n, rho).

    Scale shape: each column's avg-rank table comes from the
    distinct-value sort + block-offset prefix idiom (driver sees one
    boundary row per block); the x side (low-cardinality by
    assumption, e.g. integer quantities) broadcasts, while the
    y-rank table attaches to the distinct (x, y) PAIR table via the
    co-partitioned hash join — no per-row rank map ever leaves the
    cluster; the Pearson moments collapse to per-batch partials."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    src = lineitem_ds.select_columns([x_col, y_col])

    # distinct (x, y) pairs with multiplicity — the only row-scale
    # shuffle, bounded by the distinct pair count
    def pair_partial(batch: pa.Table) -> pa.Table:
        g = batch.drop_null().group_by([x_col, y_col]).aggregate(
            [([], "count_all")])
        return pa.table({"x": g.column(x_col), "y": g.column(y_col),
                         "c_p": pc.cast(g.column("count_all"),
                                        pa.int64())})

    pairs = src.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["x", "y"]).aggregate(Sum("c_p", alias_name="cnt")) \
        .materialize()

    def rank_table(col: str, want: str = "pandas"):
        """(value, cnt) distinct table -> (value, avg_rank), via the
        sorted block-offset prefix pattern; a LOW-cardinality column
        (the common x side: integer quantities, grades, buckets)
        skips the distributed sort entirely — its distinct aggregate
        is driver-sized, and ranks from a numpy cumsum are identical
        by construction. ``want='dataset'`` keeps the rank table
        DISTRIBUTED (the y side: its cardinality scales with the
        fact table, and the only collect decision belongs to
        auto_join's planner — round 5; it used to to_pandas the whole
        ranked table and from_pandas it straight back)."""
        agg = "x" if col == x_col else "y"
        d0 = pairs.map_batches(
            lambda b, a=agg: pa.table({
                "value": b.column(a),
                "c_p": b.column("cnt")})
            .group_by(["value"]).aggregate([("c_p", "sum")])
            .rename_columns(["value", "c_p"]),
            batch_format="pyarrow") \
            .groupby("value").aggregate(Sum("c_p", alias_name="cnt")) \
            .materialize()
        if d0.count() <= 100_000:
            df = d0.to_pandas().sort_values("value") \
                .reset_index(drop=True)
            cnt = df["cnt"].to_numpy(dtype=np.int64)
            cum = np.cumsum(cnt)
            df["r"] = cum - cnt + (cnt + 1) / 2.0
            df = df[["value", "r"]]
            return ray.data.from_pandas(df) if want == "dataset" \
                else df
        d = d0.sort("value").materialize()

        def block_tot(batch: pa.Table) -> pa.Table:
            n = min(batch.num_rows, 1)
            return pa.table({
                "v0": batch.column("value").slice(0, 1),
                "s": pa.array(
                    [int(batch.column("cnt").to_numpy().sum())] * n,
                    type=pa.int64())})

        tots = d.map_batches(block_tot, batch_size=None,
                             batch_format="pyarrow").to_pandas() \
            .sort_values("v0").reset_index(drop=True)
        off = {float(v): int(o) for v, o in zip(
            tots["v0"], tots["s"].cumsum().shift(fill_value=0))}

        def block_rank(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "value": pa.array([], type=pa.float64()),
                    "r": pa.array([], type=pa.float64())})
            cnt = batch.column("cnt").to_numpy().astype(np.int64)
            v0 = float(batch.column("value")[0].as_py())
            cum = off[v0] + np.cumsum(cnt)
            r = cum - cnt + (cnt + 1) / 2.0
            return pa.table({"value": batch.column("value"),
                             "r": pa.array(r)})

        ds_r = d.map_batches(block_rank, batch_size=None,
                             batch_format="pyarrow")
        return ds_r if want == "dataset" else ds_r.to_pandas()

    n = int(pairs.aggregate(Sum("cnt", alias_name="n"))["n"] or 0)
    if n < 2:
        return pd.DataFrame({"n": pd.Series([n], dtype=np.int64),
                             "rho": pd.Series([0.0])})
    mean = (n + 1) / 2.0
    xr = rank_table(x_col)
    x_rank = {float(v): float(r) - mean
              for v, r in zip(xr["value"], xr["r"])}
    xref = ray.put(x_rank)
    yrank_ds = rank_table(y_col, want="dataset").map_batches(
        lambda b: pa.table({
            "y": b.column("value"),
            "ry": pc.subtract(pc.cast(b.column("r"), pa.float64()),
                              pa.scalar(mean))}),
        batch_format="pyarrow")
    P = parts_for(plan_rows(pairs), rows_per_part=500_000)
    j = auto_join(pairs, yrank_ds, left_on="y", right_on="y",
                  right_cols=["ry"], how="inner", num_parts=P)

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ry" not in batch.column_names:
            z = pa.array([], type=pa.float64())
            return pa.table({"sxy": z, "sxx": z, "syy": z})
        xm = ray.get(xref)
        xv = batch.column("x").to_numpy(zero_copy_only=False)
        crx = np.fromiter((xm[float(v)] for v in xv),
                          dtype=np.float64, count=len(xv))
        cry = batch.column("ry").to_numpy(zero_copy_only=False)
        c = batch.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "sxy": pa.array([float((c * crx * cry).sum())]),
            "sxx": pa.array([float((c * crx * crx).sum())]),
            "syy": pa.array([float((c * cry * cry).sum())])})

    m = j.map_batches(moments, batch_format="pyarrow") \
        .to_pandas().sum()
    denom = math.sqrt(float(m["sxx"]) * float(m["syy"]))
    rho = float(m["sxy"]) / denom if denom > 0 else 0.0
    return pd.DataFrame({"n": pd.Series([n], dtype=np.int64),
                         "rho": pd.Series([round(rho, 6)])})


def auto_join(left_ds, right_ds, *, left_on: str, right_on: str,
              right_cols: list[str], how: str = "inner",
              num_parts: int | None = None, hot_keys=None,
              salt: int = 8,
              broadcast_threshold_rows: int = 2_000_000):
    """Adaptive join strategy — the planner decision every distributed
    engine makes: if the RIGHT side's row count (cheap Parquet
    metadata / block-count lookup) fits under
    ``broadcast_threshold_rows``, run a BROADCAST join (right side
    ray.put once, vectorized per-batch probe — zero shuffle, the left
    side never moves); otherwise fall back to the co-partitioned
    hash_join (two all-to-all exchanges). Result sets are identical by
    construction across both paths (property-tested for every
    ``how``): dimension tables broadcast at any corpus size,
    fact-fact joins shuffle.

    NOT preserved by the broadcast path: hash_join's OUTPUT
    PARTITIONING. After a partitioned hash join every join-key group
    lands in one batch, and some consumers (the per-batch EXISTS
    collapses in late_shipment_priority / waiting_suppliers) depend
    on that invariant — those call sites keep hash_join explicitly.
    Use auto_join only where downstream work re-groups globally
    (groupby/aggregate) or is per-row.

    semi/anti broadcast as a key SET probed with pyarrow is_in;
    inner/left broadcast the (key, payload) frame and merge per batch
    with pandas, preserving hash_join's null contracts (null keys
    match nothing; anti and left-outer KEEP null-key left rows;
    left-outer int payloads ride nullable dtypes). FULL OUTER always
    shuffles (its unmatched-right output is not expressible as a
    per-batch map over the left)."""
    import ray

    if how == "outer" or hot_keys is not None:
        return hash_join(left_ds, right_ds, left_on=left_on,
                         right_on=right_on, right_cols=right_cols,
                         how=how, num_parts=num_parts,
                         hot_keys=hot_keys, salt=salt)
    # pin the right side once: the count probe AND the collect (or the
    # fallback shuffle) read the same blocks instead of re-executing
    # the right pipeline. A join consumes its right side fully on
    # either path, so this costs one object-store copy that the
    # shuffle would have written anyway (and spills the same way).
    right_ds = right_ds.select_columns(
        [right_on] + list(right_cols)).materialize()
    n_right = right_ds.count()
    if n_right > broadcast_threshold_rows:
        return hash_join(left_ds, right_ds, left_on=left_on,
                         right_on=right_on, right_cols=right_cols,
                         how=how, num_parts=num_parts, salt=salt)

    left_ds = _pin_if_shuffled(left_ds)
    left_types = _arrow_types(left_ds.schema())
    right_t = right_ds.select_columns([right_on] + right_cols) \
        .to_pandas()
    if right_on not in right_t.columns:
        # an all-empty dataset collects schema-less; rebuild the
        # typed empty frame so the probe/merge sees its columns
        rtypes = _arrow_types(right_ds.schema())
        right_t = pd.DataFrame({
            c: pd.Series([], dtype=rtypes[c].to_pandas_dtype())
            for c in [right_on] + list(right_cols)})

    if how in ("semi", "anti"):
        if right_cols:
            raise ValueError("semi/anti joins carry no right payload")
        keys = pa.array(right_t[right_on].dropna().unique())
        kref = ray.put(keys)

        def filt(batch: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            if len(ks) == 0 or batch.num_rows == 0 \
                    or pa.types.is_null(batch.column(left_on).type):
                # null-typed left key blocks (Ray's empty-map-output
                # schema drop) crash is_in — same hazard fixed in
                # hash_join's join_part; null keys match nothing
                mask = pa.array(np.zeros(batch.num_rows, dtype=bool))
            else:
                mask = pc.fill_null(
                    pc.is_in(batch.column(left_on), value_set=ks),
                    False)
            return batch.filter(mask if how == "semi"
                                else pc.invert(mask))

        return left_ds.map_batches(filt, batch_format="pyarrow")

    # inner / left broadcast: per-batch pandas merge against the
    # pinned right frame (dup right keys fan out exactly as in the
    # partitioned merge)
    right_t = right_t[right_t[right_on].notna()] \
        .rename(columns={right_on: "_rkey"})
    if how == "left":
        # unmatched left rows null-pad the right payload: int columns
        # must ride nullable dtypes or they degrade to float64
        for c in right_t.columns:
            if right_t[c].dtype == np.int64:
                right_t[c] = right_t[c].astype(pd.Int64Dtype())
            elif right_t[c].dtype == np.int32:
                right_t[c] = right_t[c].astype(pd.Int32Dtype())
    rref = ray.put(right_t)
    out_schema = pa.schema(
        [(c, left_types[c]) for c in left_ds.schema().names]
        + [(c, _arrow_types(right_ds.schema())[c])
           for c in right_cols])
    left_cols = list(left_ds.schema().names)
    nullable = {pa.int64(): pd.Int64Dtype(),
                pa.int32(): pd.Int32Dtype()}.get

    def merge(batch: pa.Table) -> pa.Table:
        r = ray.get(rref)
        if how == "inner":
            batch = batch.filter(pc.is_valid(batch.column(left_on)))
            left = batch.to_pandas()
        else:
            left = batch.to_pandas(types_mapper=nullable)
        out = left.merge(r, left_on=left_on, right_on="_rkey",
                         how=how)[left_cols + right_cols]
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False)

    return left_ds.map_batches(merge, batch_format="pyarrow")


def detect_hot_keys(ds, key_col: str, *,
                    hot_threshold: int = 500_000,
                    max_hot: int = 1024) -> list:
    """Exact hot-key detection for skew-aware shuffles: per-batch
    (key, count) partials collapse in each batch before ONE tiny
    groupby over distinct keys — the payload never moves — and keys
    whose total exceeds ``hot_threshold`` (the single-reduce-slot
    budget) come back to the driver, capped at ``max_hot``
    (descending by count, then key, so the cap is deterministic).
    Feed the result to hash_join(hot_keys=...) — or pass
    hot_keys="auto" and hash_join calls this itself."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type) or batch.num_rows == 0:
            return pa.table({
                "k": pa.array([], type=pa.string()),
                "c_p": pa.array([], type=pa.int64())})
        g = pa.table({"k": pc.cast(col, pa.string())}) \
            .drop_null().group_by(["k"]).aggregate([([], "count_all")])
        return pa.table({
            "k": g.column("k"),
            "c_p": pc.cast(g.column("count_all"), pa.int64())})

    counts = ds.select_columns([key_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("c_p", alias_name="n"))

    def over(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch.column("n"),
                          pa.scalar(hot_threshold))
        return batch.filter(mask)

    hot = counts.map_batches(over, batch_format="pyarrow").to_pandas()
    if hot.empty:
        return []
    hot = hot.sort_values(["n", "k"],
                          ascending=[False, True]).head(max_hot)
    # keys went through a string cast for the shuffle; ints come back
    ks = hot["k"].tolist()
    try:
        return [int(k) for k in ks]
    except ValueError:
        return ks


def theil_sen_trend(events_ds, *, ts_col: str = "ts"):
    """Theil-Sen robust trend of daily event volume (Theil 1950; Sen
    1968): slope = median of all pairwise day-count slopes
    (n_j - n_i) / (day_j - day_i), intercept = median of
    (n_i - slope * day_i) — the outlier-immune alternative to OLS for
    volume drift (one traffic spike cannot bend the line). -> one row
    (n_days, slope, intercept), floats rounded to 6.

    Scale shape: the corpus collapses to the per-DAY count table
    (per-batch partials + one tiny groupby — days number in the
    thousands at any corpus size); the O(D^2) pairwise-slope median
    runs on the driver over that D-bounded table, exactly like the
    oracle. Pair slopes are single float divisions on exact int64
    counts, so both engines median the identical value multiset."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.drop_null()
        days = t.column(ts_col).to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        u, c = np.unique(days, return_counts=True)
        return pa.table({"day": pa.array(u),
                         "n_p": pa.array(c.astype(np.int64))})

    d = events_ds.select_columns([ts_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("n_p", alias_name="n")) \
        .to_pandas().sort_values("day")
    days = d["day"].to_numpy(dtype=np.int64)
    ns = d["n"].to_numpy(dtype=np.int64)
    D = len(days)
    if D < 2:
        return pd.DataFrame({
            "n_days": pd.Series([D], dtype=np.int64),
            "slope": pd.Series([0.0]),
            "intercept": pd.Series([float(ns[0]) if D else 0.0])})
    i, j = np.triu_indices(D, k=1)
    slopes = (ns[j] - ns[i]) / (days[j] - days[i])
    slope = float(np.median(slopes))
    intercept = float(np.median(ns - slope * days))
    return pd.DataFrame({
        "n_days": pd.Series([D], dtype=np.int64),
        "slope": pd.Series([round(slope, 6)]),
        "intercept": pd.Series([round(intercept, 6)])})


def rate_limit_replay(events_ds, *, capacity: float = 3.0,
                      refill_per_s: float = 1.0 / 600.0,
                      key_col: str = "user_id"):
    """Token-bucket rate-limit replay — the politeness / admission
    policy a crawler or API gateway runs per host, replayed
    deterministically over the event log: each key's bucket starts
    FULL at ``capacity``; at every event (ordered ts, event_id)

        tokens = min(capacity, tokens + refill_per_s * dt_seconds)
        admit  = tokens >= 1;  if admit: tokens -= 1.

    -> (user_id, n_events, n_admitted) per key. Both engines execute
    the IDENTICAL float-op sequence per event (epoch-seconds double
    deltas), so the admit decisions agree bit-for-bit; the SQL twin
    is a per-key recursive CTE.

    Scale shape: ONE groupby(key) shuffle; the per-key replay is an
    inherently sequential recurrence (like user_ewma's), bounded by
    one key's event count per task — keys never straddle groups."""
    def replay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        dt = np.diff(t, prepend=t[0]) / 1e6
        tokens = capacity
        admitted = 0
        for i in range(len(t)):
            tokens = min(capacity, tokens + refill_per_s * dt[i])
            if tokens >= 1.0:
                admitted += 1
                tokens -= 1.0
        return pd.DataFrame({
            key_col: pd.array([int(g[key_col].iloc[0])],
                              dtype="int64"),
            "n_events": pd.array([len(t)], dtype="int64"),
            "n_admitted": pd.array([admitted], dtype="int64")})

    return events_ds.select_columns([key_col, "ts", "event_id"]) \
        .groupby(key_col).map_groups(replay, batch_format="pandas")


def transition_entropy(events_ds, *, ts_col: str = "ts",
                       user_col: str = "user_id",
                       type_col: str = "event_type",
                       id_col: str = "event_id"):
    """Per-user behavioral entropy: Shannon entropy (natural log) of
    the user's CONSECUTIVE event-type transition-pair distribution
    (ordered ts, event_id) — a bot/automation signal: scripted
    sessions repeat one transition (entropy ~ 0), organic ones
    spread. -> (user_id, n_transitions, entropy), entropy rounded
    to 6.

    Scale shape: ONE hash(user) exchange; per group the pairs are a
    pandas shift + value_counts, entropy from exact integer counts
    with one division per cell — the 6-dp rounding absorbs the
    summation-order difference vs the SQL window twin."""
    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[ts_col, user_col]) \
            .sort_values([ts_col, id_col])
        if len(g) < 2:
            return pd.DataFrame({
                user_col: pd.Series([], dtype=np.int64),
                "n_transitions": pd.Series([], dtype=np.int64),
                "entropy": pd.Series([], dtype=np.float64)})
        ft = g[type_col].to_numpy()
        pairs = pd.Series(list(zip(ft[:-1], ft[1:])))
        c = pairs.value_counts().to_numpy(dtype=np.float64)
        n = c.sum()
        p = c / n
        ent = float(-(p * np.log(p)).sum())
        return pd.DataFrame({
            user_col: pd.array([int(g[user_col].iloc[0])],
                               dtype="int64"),
            "n_transitions": pd.array([int(n)], dtype="int64"),
            "entropy": pd.array([round(ent, 6)],
                                dtype="float64")})

    return events_ds.select_columns(
        [user_col, ts_col, id_col, type_col]) \
        .groupby(user_col).map_groups(per_user,
                                      batch_format="pandas")
