"""Local replica of the driver's correctness gate: run every queries()[name]
at a given sf dir and compare to oracle_sql()[name] via DuckDB — row count,
schema (column names), and order-insensitive value comparison (sort columns
by name, sort rows, exact match on ints/strings, tight tolerance on floats).

Usage: python scripts/check_entry.py [sf_dir]
"""

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(name, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if len(got) != len(exp):
        return f"ROWS {len(got)} != {len(exp)}"
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA {sorted(got.columns)} != {sorted(exp.columns)}"
    g, e = normalize(got.copy()), normalize(exp.copy())
    for col in g.columns:
        gv, ev = g[col], e[col]
        if gv.dtype.kind in "fc" or ev.dtype.kind in "fc":
            if not np.allclose(
                gv.astype(float), ev.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True
            ):
                bad = np.where(~np.isclose(gv.astype(float), ev.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True))[0][:3]
                return f"VALUES col={col} rows={bad.tolist()} got={gv.iloc[bad].tolist()} exp={ev.iloc[bad].tolist()}"
        else:
            if not (gv.astype(str).values == ev.astype(str).values).all():
                bad = np.where(gv.astype(str).values != ev.astype(str).values)[0][:3]
                return f"VALUES col={col} rows={bad.tolist()} got={gv.iloc[bad].tolist()} exp={ev.iloc[bad].tolist()}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # the driver snapshot caps at 50 queries; the local gate still checks
    # the rotated-out ones (see __ray_entry__.rotated_queries)
    qs = {**entrymod.queries(), **entrymod.rotated_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.rotated_oracle_sql()}
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:28s} ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            exp = con.execute(oracles[name]).df()
            verdict = compare(name, got, exp)
        else:
            verdict = f"rows-only ({len(got)} rows)"
        flag = "" if (verdict == "OK" or verdict.startswith("rows-only")) else "  <-- FAIL"
        if flag:
            failures += 1
        print(f"{name:28s} {dt:6.1f}s  {verdict}{flag}")
    print("FAILURES:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
