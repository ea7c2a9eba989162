"""Simulate the graft driver: smoke entry(), then run every queries() entry
at sf0.01 against its oracle_sql() in DuckDB with an order-insensitive
value compare (columns sorted by name, rows sorted, values hashed).

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def to_arrow(result):
    import pandas as pd
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas().pipe(pa.Table.from_pandas, preserve_index=False)
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    if isinstance(result, pa.Table):
        return result
    raise TypeError(type(result))


def canon(tbl) -> tuple[int, list[str], str]:
    import pandas as pd

    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()
    return len(df), sorted(map(str, df.columns)), h


def main():
    import duckdb
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    sf_dir = "/root/testdata/sf0.01"
    args, skip = [], False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
            continue
        if a == "--sf-dir":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif not a.startswith("--"):
            args.append(a)

    t0 = time.time()
    res = e.entry()
    n = res.count() if hasattr(res, "count") else len(res)
    print(f"entry(): {n} rows, schema={res.schema()}, {time.time()-t0:.1f}s")

    import os
    import re as _re

    m = _re.search(r"sf([0-9.]+)", sf_dir)
    if m:
        os.environ["KGRAY_ORACLE_SF"] = m.group(1)
    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    selected = args or list(qs)
    failures = []
    for name in selected:
        fn = qs[name]
        t0 = time.time()
        try:
            got = canon(to_arrow(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        ray_t = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={got[0]} cols={got[1]} (rows-only, no oracle) [{ray_t:.1f}s]")
            continue
        try:
            want = canon(con.execute(oracles[name]).arrow())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        status = "PASS" if got == want else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: ray(rows={got[0]}, hash={got[2][:10]}) "
              f"vs sql(rows={want[0]}, hash={want[2][:10]}) [{ray_t:.1f}s]")
        if status == "FAIL" and got[1] != want[1]:
            print(f"     col mismatch: ray={got[1]} sql={want[1]}")
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
