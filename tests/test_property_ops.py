"""Hypothesis property tests: the co-partitioned join family and
sessionization against pure-pandas reference implementations over
randomized frames (nulls, duplicate keys, ties included). Example
counts are small — each example routes through a real Ray exchange."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.one_of(st.none(), st.integers(min_value=-3, max_value=6))


def _frames(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 8))
    left = pd.DataFrame({
        "k": pd.array([draw(KEYS) for _ in range(n_left)], dtype="Int64"),
        "lv": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": pd.array(
            [draw(st.integers(min_value=-3, max_value=6))
             for _ in range(n_right)], dtype="Int64"),
        "rv": [f"r{i}" for i in range(n_right)],
    })
    return left, right


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_hash_join_modes_match_pandas_reference(ray_session, data):
    import ray.data

    from rse_ray.pipelines.relational import hash_join

    left, right = _frames(data.draw)
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)

    def norm(df, cols):
        if df.empty:  # empty Ray results lose their column schema
            return pd.DataFrame({c: [] for c in cols})
        df = df[cols].copy().sort_values(cols).reset_index(drop=True)
        return df

    # inner
    got = hash_join(lds, rds, left_on="k", right_on="rk",
                    right_cols=["rv"], num_parts=3).to_pandas()
    want = left.dropna(subset=["k"]).merge(
        right, left_on="k", right_on="rk")[["k", "lv", "rv"]]
    if want.empty:
        assert got.empty
    else:
        pd.testing.assert_frame_equal(
            norm(got, ["k", "lv", "rv"]).astype({"k": "Int64"}),
            norm(want, ["k", "lv", "rv"]).astype({"k": "Int64"}),
            check_dtype=False)

    # left outer: null keys kept null-padded; unmatched keys null-padded
    got_l = hash_join(lds, rds, left_on="k", right_on="rk",
                      right_cols=["rv"], num_parts=3,
                      how="left").to_pandas()
    want_l = left.merge(right, left_on="k", right_on="rk",
                        how="left")[["k", "lv", "rv"]]
    # a left row with key matching m right rows appears m times (or
    # once null-padded) — same multiset
    pd.testing.assert_frame_equal(
        norm(got_l, ["k", "lv", "rv"]).astype({"k": "Int64"}),
        norm(want_l, ["k", "lv", "rv"]).astype({"k": "Int64"}),
        check_dtype=False)
    assert len(got_l) >= len(left)  # every left row survives

    # semi / anti: partition of the valid-key rows + null rows to anti
    got_s = hash_join(lds, rds, left_on="k", right_on="rk",
                      right_cols=[], num_parts=3, how="semi").to_pandas()
    got_a = hash_join(lds, rds, left_on="k", right_on="rk",
                      right_cols=[], num_parts=3, how="anti").to_pandas()
    rset = set(right["rk"].dropna())
    want_s = left[left["k"].isin(rset)]
    want_a = left[~left["k"].isin(rset)]

    def lvs(df):  # empty Ray results lose their column schema
        return sorted(df["lv"]) if not df.empty else []

    assert lvs(got_s) == sorted(want_s["lv"])
    assert lvs(got_a) == sorted(want_a["lv"])
    assert len(got_s) + len(got_a) == len(left)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_sessionize_matches_pandas_reference(ray_session, data):
    import ray.data

    from rse_ray.pipelines.relational import sessionize

    n = data.draw(st.integers(1, 40))
    users = [data.draw(st.integers(0, 4)) for _ in range(n)]
    # minute offsets with many ties and exact-gap boundaries
    offs = [data.draw(st.integers(0, 200)) for _ in range(n)]
    base = pd.Timestamp("2024-02-01")
    df = pd.DataFrame({
        "user_id": pd.array(users, dtype="int64"),
        "ts": [base + pd.Timedelta(minutes=o) for o in offs],
        "value": np.arange(n, dtype=np.float64),
    })
    gap = 30

    got = sessionize(ray.data.from_pandas(df), gap_minutes=gap,
                     num_parts=3).to_pandas() \
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)

    rows = []
    for u, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        ts = g["ts"].to_numpy()
        vals = g["value"].to_numpy()
        start = 0
        for i in range(1, len(g) + 1):
            if i == len(g) or (ts[i] - ts[i - 1]) > np.timedelta64(
                    gap * 60 * 1000000, "us"):
                rows.append({
                    "user_id": u, "session_start": ts[start],
                    "session_end": ts[i - 1],
                    "n_events": i - start,
                    "total_value": round(float(vals[start:i].sum()), 6),
                })
                start = i
    want = pd.DataFrame(rows).sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)
    got["total_value"] = got["total_value"].round(5)
    want["total_value"] = want["total_value"].round(5)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_auto_join_equals_hash_join_property(ray_session, data):
    """auto_join's broadcast path must equal the partitioned
    hash_join result set on arbitrary (null-bearing, duplicate-key)
    inputs, for every broadcast-capable `how`."""
    import ray.data

    from rse_ray.pipelines.relational import auto_join, hash_join

    left, right = _frames(data.draw)
    how = data.draw(st.sampled_from(["inner", "left", "semi",
                                     "anti"]))
    cols = [] if how in ("semi", "anti") else ["rv"]
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    a = auto_join(lds, rds, left_on="k", right_on="rk",
                  right_cols=cols, how=how).to_pandas()
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    h = hash_join(lds, rds, left_on="k", right_on="rk",
                  right_cols=cols, how=how, num_parts=4).to_pandas()

    def norm(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        return df.astype(object).where(df.notna(), None) \
            .to_dict("records")

    assert norm(a) == norm(h), how


def test_plan_rows_resolution_paths(ray_session, tmp_path):
    """plan_rows resolves without executing wherever metadata exists:
    raw parquet reads (meta count), transformed reads and unions of
    reads (footer sum via the plan's Read leaves), from_pandas (meta),
    and an upstream filter yields the honest UPPER BOUND (footers),
    never an under-count."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.util import plan_rows

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": list(range(100))}), p1)
    pq.write_table(pa.table({"x": list(range(40))}), p2)

    assert plan_rows(ray.data.read_parquet(p1)) == 100
    assert plan_rows(ray.data.read_parquet(p1), n_rows=7) == 7
    chained = ray.data.read_parquet(p1).map_batches(
        lambda b: b, batch_format="pyarrow")
    assert plan_rows(chained) == 100
    both = ray.data.read_parquet([p1, p2]).map_batches(
        lambda b: b, batch_format="pyarrow")
    assert plan_rows(both) == 140
    u = ray.data.read_parquet(p1).union(ray.data.read_parquet(p2))
    assert plan_rows(u.map_batches(lambda b: b,
                                   batch_format="pyarrow")) == 140
    assert plan_rows(ray.data.from_pandas(
        pd.DataFrame({"x": range(25)}))) == 25
    filtered = ray.data.read_parquet(p1).map_batches(
        lambda b: b.filter(pa.array([v < 10 for v in
                                     b.column("x").to_pylist()])),
        batch_format="pyarrow")
    assert plan_rows(filtered) == 100  # planning upper bound
    # no metadata anywhere -> falls back to count() and stays correct
    items = ray.data.from_items([{"x": i} for i in range(9)]) \
        .map_batches(lambda b: b, batch_format="pyarrow")
    assert plan_rows(items) == 9
    # an all-to-all op (aggregate) collapses rows: the footer walk
    # must NOT report the pre-aggregation input count (round-4
    # ADVICE). 100 input rows, 100//10 = 10 groups.
    agg = ray.data.read_parquet(p1).add_column(
        "g", lambda df: df["x"] % 10, batch_format="pandas"
    ).groupby("g").count()
    assert plan_rows(agg) == 10  # falls back to count(), not 100
    srt = ray.data.read_parquet(p2).sort("x")
    assert plan_rows(srt) == 40  # sort keeps rows; count() fallback
