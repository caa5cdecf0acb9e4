"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf and compare against oracle_sql() via
DuckDB (row count + schema + order-insensitive value comparison).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

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


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df):
    """Driver-style hash: sort rows on NATIVE dtypes FIRST, then
    stringify and md5. Sorting natively is what makes the hash
    dtype-faithful: an int64 id column sorts numerically (1, 2, 10)
    while its str(oracle) twin sorts lexically ("1", "10", "2"), so a
    str-vs-int mismatch flips row order and the hash — exactly the
    class the r4 driver failed on `simhash`/`winnow_fingerprints`
    that the old stringify-then-sort hash could not see. Stringify
    artifacts (int64 5 vs float64 5.0) still flip the hash too."""
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and not isinstance(nn.iloc[0], str):
                # lists/arrays aren't totally ordered — stringify those
                df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").astype(str)
    rows = ("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # dynamic oracles (expected tables / cdc fixture paths) must target
    # the same sf dir we query — set before __ray_entry__ import
    os.environ["NIFI_RAY_ORACLE_SF_DIR"] = sf_dir

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            continue
        # representation lint: full-range uint64 output is mangled by
        # signed/float coercion in generic value-hash paths (the r3
        # driver failed exactly the two uint64-emitting queries) — no
        # graded query may emit it; ship hex strings instead
        u64_cols = [c for c in got.columns if str(got[c].dtype) == "uint64"]
        if u64_cols:
            failures.append(name)
            print(f"[FAIL] {name}: uint64 output columns {u64_cols} — emit hex strings")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            want = normalize(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: oracle raised {type(ex).__name__}: {ex}")
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        ok_hash = False
        if ok_rows and ok_cols:
            ok_hash = value_hash(got) == value_hash(want)
            try:
                import pandas.testing as pdt

                import numpy as np

                w = want.copy()
                for c in want.columns:
                    # align dtypes where lossless — NUMERIC↔NUMERIC only
                    # (int32 oracle vs int64 query is a non-event in the
                    # driver's stringified hash, but string↔int is NOT:
                    # it flips native sort order, so it must not be
                    # rescued here; see value_hash docstring)
                    if (
                        got[c].dtype != w[c].dtype
                        and np.issubdtype(got[c].dtype, np.number)
                        and np.issubdtype(w[c].dtype, np.number)
                    ):
                        try:
                            w[c] = w[c].astype(got[c].dtype)
                        except Exception:
                            pass
                pdt.assert_frame_equal(got, w, check_dtype=False, check_exact=False, rtol=1e-9)
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
                print(f"       value diff: {msg}")
        # ok_hash is the driver-faithful check; ok_vals catches float
        # near-misses pdt tolerates — either passing is a pass, both
        # failing is a fail (pdt can't compare uint64 frames exactly)
        status = "OK" if (ok_rows and ok_cols and (ok_vals or ok_hash)) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{status}] {name}: rows {len(got)}/{len(want)} hash={'OK' if ok_hash else 'MISMATCH'} cols {list(got.columns)} vs {list(want.columns)}"
        )
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
