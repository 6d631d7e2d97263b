#!/usr/bin/env python
"""Driver-style correctness sweep: run EVERY ``queries()`` entry against
its ``oracle_sql()`` DuckDB oracle at a given sf dir, the same compare
the driver applies (row count + schema + order-insensitive value
compare).  Exit 1 on any mismatch.

Usage: python scripts/sweep_queries.py [sf_dir] [name_filter ...]
Defaults to /root/testdata/sf0.01 (the driver's correctness tier —
pinned-parquet oracles are only valid there).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)  # pinned oracles use repo-relative parquet paths

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main() -> int:
    import duckdb
    import pandas as pd
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas() if hasattr(df, "to_pandas") else pd.DataFrame(df)
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    t_all = time.perf_counter()
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = norm(queries[name](sf_dir))
            sql_df = norm(con.execute(oracles[name]).fetchdf())
            assert list(ray_df.columns) == list(sql_df.columns), (
                f"schema {list(ray_df.columns)} vs {list(sql_df.columns)}")
            assert len(ray_df) == len(sql_df), (
                f"rows {len(ray_df)} vs {len(sql_df)}")
            pd.testing.assert_frame_equal(
                ray_df, sql_df, check_dtype=False, check_exact=False,
                atol=1e-9, rtol=0)
            status = "MATCH"
        except Exception as e:  # noqa: BLE001 — sweep must finish
            status = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            fails.append(name)
        print(f"{name:40s} {time.perf_counter() - t0:7.2f}s  {status}",
              flush=True)
    n = len(only) if only else len(queries)
    print(f"\n{n - len(fails)}/{n} MATCH in "
          f"{time.perf_counter() - t_all:.1f}s; fails: {fails or 'none'}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
