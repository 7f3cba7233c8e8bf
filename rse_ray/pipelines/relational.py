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

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pricing_summary(lineitem_ds, *, cutoff: str = "1998-09-01"):
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus): sum_qty,
    sum_base_price, sum_disc_price, count_order, avg_qty.
    Partial-aggregated inside each batch; the shuffle moves a handful of
    rows per batch."""
    from ray.data.aggregate import Sum

    cutoff_ts = np.datetime64(cutoff)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["l_shipdate"] < cutoff_ts]
        if df.empty:
            return pa.table(
                {"l_returnflag": pa.array([], type=pa.string()),
                 "l_linestatus": pa.array([], type=pa.string()),
                 "qty_p": pa.array([], type=pa.float64()),
                 "base_p": pa.array([], type=pa.float64()),
                 "disc_p": pa.array([], type=pa.float64()),
                 "cnt_p": pa.array([], type=pa.int64())}
            )
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_p=("l_quantity", "sum"),
            base_p=("l_extendedprice", "sum"),
            disc_p=("disc_price", "sum"),
            cnt_p=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = lineitem_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("qty_p", alias_name="sum_qty"),
        Sum("base_p", alias_name="sum_base_price"),
        Sum("disc_p", alias_name="sum_disc_price"),
        Sum("cnt_p", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(6)
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            df[c] = df[c].round(2)
        df["count_order"] = df["count_order"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

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

    cust = customer_ds.select_columns(["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        df = batch.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(lookup)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_p=("o_orderkey", "size"), tot_p=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = orders_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "c_mktsegment"
    ).aggregate(Sum("n_p", alias_name="n_orders"),
                Sum("tot_p", alias_name="total_price"))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_orders"] = df["n_orders"].astype("int64")
        df["total_price"] = df["total_price"].round(2)
        return pa.Table.from_pandas(df, preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow")


def window_agg(events_ds, *, window: str = "h"):
    """§2.9: tumbling event-time windows as a grouped aggregate —
    (event_type, window_start) -> n_events, sum_value. Ray Data has no
    watermarks; bounded logs make windows a plain groupby over a
    computed window column (ray_guide streaming section)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["window_start"] = df["ts"].dt.floor(window)
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n_p=("event_id", "size"), v_p=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = events_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    ).aggregate(Sum("n_p", alias_name="n_events"),
                Sum("v_p", alias_name="sum_value"))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_events"] = df["n_events"].astype("int64")
        df["sum_value"] = df["sum_value"].round(2)
        return pa.Table.from_pandas(df, preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow")


def distinct_lang_source(documents_ds):
    """A5 DISTINCT: unique (lang, source) pairs via groupby."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)[["lang", "source"]]

    return documents_ds.select_columns(["lang", "source"]).groupby(
        ["lang", "source"]
    ).map_groups(first, batch_format="pandas")


def json_props_sum(events_ds):
    """Scalar-function surface: extract props->k (JSON) per event,
    sum per event_type. JSON parse vectorized-ish per batch."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["k"] = [int(json.loads(p)["k"]) for p in df["props"]]
        g = df.groupby("event_type", as_index=False).agg(k_p=("k", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = events_ds.map_batches(partial, batch_format="pyarrow").groupby(
        "event_type"
    ).aggregate(Sum("k_p", alias_name="sum_k"))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["sum_k"] = df["sum_k"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow")


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
