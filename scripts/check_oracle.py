"""Driver-gate simulator: run queries() vs oracle_sql() via DuckDB and
compare row count + schema + order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [only=name1,name2]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(x):
    if isinstance(x, pa.Table):
        return x.to_pandas()
    if isinstance(x, pd.DataFrame):
        return x
    return x.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def main(sf_dir: str, only: set[str] | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt_engine = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(mine)} rows "
                  f"(no SQL oracle) [{dt_engine:.2f}s]")
            n_pass += 1
            continue
        t0 = time.time()
        try:
            theirs = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt_sql = time.time() - t0
        ok_rows = len(mine) == len(theirs)
        ok_schema = list(mine.columns) == list(theirs.columns)
        ok_hash = ok_rows and ok_schema and value_hash(mine) == value_hash(theirs)
        if ok_hash:
            print(f"OK   {name}: {len(mine)} rows "
                  f"[engine {dt_engine:.2f}s, sql {dt_sql:.2f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(mine)}/{len(theirs)} "
                  f"schema {list(mine.columns)}/{list(theirs.columns)}")
            print("  engine head:\n", mine.head(3))
            print("  oracle head:\n", theirs.head(3))
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return n_fail


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = None
    if len(sys.argv) > 2 and sys.argv[2].startswith("only="):
        only = set(sys.argv[2][len("only="):].split(","))
    raise SystemExit(1 if main(sf, only) else 0)
