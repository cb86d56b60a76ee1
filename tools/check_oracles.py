"""Local replica of the driver's correctness gate: run every queries() entry
at a given sf_dir, compare row-count / schema / order-insensitive value hash
against oracle_sql() via DuckDB.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha1()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(res)} rows (no oracle)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        ok_rows = len(res) == len(want)
        ok_schema = sorted(res.columns) == sorted(want.columns)
        ok_hash = ok_schema and value_hash(res) == value_hash(want)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(res)}/{len(want)} schema={ok_schema} hash={ok_hash}")
        if not ok_hash and ok_schema and len(res) == len(want):
            merged = res[sorted(res.columns)].astype(str)
            wanted = want[sorted(want.columns)].astype(str)
            a = set(map(tuple, merged.itertuples(index=False, name=None)))
            b = set(map(tuple, wanted.itertuples(index=False, name=None)))
            diff_a = list(a - b)[:2]
            diff_b = list(b - a)[:2]
            print(f"      ours-not-oracle: {diff_a}")
            print(f"      oracle-not-ours: {diff_b}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
