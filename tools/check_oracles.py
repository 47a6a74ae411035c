"""Side-by-side check: every queries() entry vs its oracle_sql() on DuckDB.

Mirrors the driver's comparison: run the Ray pipeline and the SQL on the
same sf dir, sort columns by name, sort rows, compare values (floats with
tolerance). Usage:

    python tools/check_oracles.py [sf_dir] [only_query_prefix]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("string"):
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith("bool"):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str | None:
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        return f"columns differ: ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: ray={len(a)} sql={len(b)}"
    for c in a.columns:
        if a[c].dtype.kind == "f":
            # The driver compares value HASHES — bit-exact. np.isclose here
            # let the r2 kg_entity_jaccard rounding-mode mismatch through;
            # match the driver's strictness (NaN==NaN allowed).
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not same.all():
                bad = int(np.argmax(~same))
                return (f"float col {c} differs at row {bad}: "
                        f"{av[bad]!r} vs {bv[bad]!r} "
                        f"(maxdiff={np.nanmax(np.abs(av - bv)):.3e})")
        else:
            if not a[c].equals(b[c]):
                neq = a[c] != b[c]
                bad = neq.idxmax()
                return f"col {c} differs at row {bad}: {a[c][bad]!r} vs {b[c][bad]!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    import logging

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"RAY ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {name}: ray error {e}", flush=True)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(ray_df)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]", flush=True)
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SQL ERROR: {e}"))
            print(f"FAIL {name}: sql error {e}", flush=True)
            continue
        err = compare(name, ray_df, sql_df)
        if err:
            failures.append((name, err))
            print(f"FAIL {name}: {err} [{time.time()-t0:.1f}s]", flush=True)
        else:
            print(f"ok   {name}: {len(ray_df)} rows match [{time.time()-t0:.1f}s]",
                  flush=True)

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries ok")
    for n, e in failures:
        print(f"  FAIL {n}: {e}")
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
