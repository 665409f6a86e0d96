"""Local stand-in for the driver's correctness harness: runs every
``queries()`` entry at sf0.01, runs its ``oracle_sql()`` via DuckDB on
the same parquet views, compares row counts + sorted-column value frames.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    unknown = only - set(qs)
    if unknown:
        raise SystemExit(
            f"unknown query name(s): {sorted(unknown)} — nothing was checked"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = norm(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows ({dt:.1f}s, no oracle)")
            continue
        exp = norm(con.execute(oracles[name]).fetchdf())
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)} ({dt:.1f}s)")
            failures.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: cols {list(got.columns)} != {list(exp.columns)}")
            failures.append(name)
            continue
        # float-tolerant compare
        ok = True
        for c in got.columns:
            # numeric compare must tolerate int-vs-float dtype skew on
            # EITHER side (e.g. DuckDB SUM returning float where the
            # engine returns int64) — branch on both dtypes
            g_float = str(got[c].dtype).startswith("float")
            e_float = str(exp[c].dtype).startswith("float")
            if g_float or e_float:
                import numpy as np

                if not np.allclose(
                    got[c].astype("float64").fillna(-1e18),
                    exp[c].astype("float64").fillna(-1e18),
                    rtol=1e-9,
                    atol=1e-9,
                ):
                    ok = False
            else:
                if not got[c].equals(exp[c]):
                    ok = False
            if not ok:
                print(f"[FAIL] {name}: column {c} differs ({dt:.1f}s)")
                print("  got:", got[c].head(5).tolist())
                print("  exp:", exp[c].head(5).tolist())
                failures.append(name)
                break
        if ok:
            print(f"[ OK ] {name}: {len(got)} rows ({dt:.1f}s)")

    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
