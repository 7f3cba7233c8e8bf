"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() twin over the same sf dir, compare row
counts + sorted values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import ray

    import __ray_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = fn(sf_dir)
            gdf = got.to_pandas() if hasattr(got, "to_pandas") else got
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: ray side raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ray_s = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(gdf)} rows (rows-only, {ray_s:.1f}s)")
            if len(gdf) == 0 and name not in ("cosine_neardup_pairs",):
                print(f"      WARNING {name} returned 0 rows")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        g, o = normalize(gdf), normalize(odf)
        if list(g.columns) != list(o.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(o.columns)}")
            failures.append(name)
            continue
        if len(g) != len(o):
            print(f"FAIL  {name}: rows {len(g)} vs {len(o)}")
            failures.append(name)
            continue
        if not g.equals(o):
            neq = (g != o) & ~(g.isna() & o.isna())
            bad_rows = neq.any(axis=1)
            print(f"FAIL  {name}: {int(bad_rows.sum())}/{len(g)} rows differ")
            print(g[bad_rows].head(3))
            print(o[bad_rows].head(3))
            failures.append(name)
            continue
        print(f"ok    {name}: {len(g)} rows match ({ray_s:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nall checked queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
