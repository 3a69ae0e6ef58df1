"""Local mirror of the driver's correctness gate: run every
``queries()[name](sf_dir)`` and compare row-count + schema +
order-insensitive values against ``oracle_sql()[name]`` via DuckDB.

Usage: python tools/check_contract.py [sf_dir] [name ...]
Owns its Ray session (scripts may; library code may not).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _max_ulp(got: pd.DataFrame, exp: pd.DataFrame) -> int:
    """Largest ulp distance across shared float columns — an absolute
    1e-9 tolerance on small-magnitude doubles can hide millions of
    ulps, so the drift report carries the real number."""
    import numpy as np

    worst = 0
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind != "f" or b.dtype.kind != "f":
            continue
        av = a.astype(np.float64).view(np.int64)
        bv = b.astype(np.float64).view(np.int64)
        m = np.isfinite(a) & np.isfinite(b)
        if m.any():
            worst = max(worst, int(np.abs(av[m] - bv[m]).max()))
    return worst


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # the driver's value hash is dtype-sensitive: an int64 column
        # that arrives as float64 (e.g. via a pandas null round-trip)
        # hash-mismatches even when every value compares equal.  The
        # stringify canon above masks exactly that — check kinds too.
        kind_bad = [c for c in got.columns
                    if got[c].dtype.kind != exp[c].dtype.kind
                    and {got[c].dtype.kind, exp[c].dtype.kind}
                    <= {"i", "u", "f"}]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch (driver hash "
                  f"diverges): "
                  + ", ".join(f"{c}: {got[c].dtype}!={exp[c].dtype}"
                              for c in kind_bad))
            n_fail += 1
            continue
        try:
            # exact compare first; 1-ulp float drift (e.g. pc.round vs
            # DuckDB round producing adjacent doubles for the same
            # decimal) is reported distinctly — CORRECTNESS_r02 proved
            # the driver hash tolerates it (filter_project carried it
            # hash-green), but new queries should aim for bit-exact
            try:
                pd.testing.assert_frame_equal(got, exp,
                                              check_dtype=False,
                                              check_exact=True)
                print(f"ok   {name}: rows={len(got)} MATCH [{dt:.1f}s]")
            except AssertionError:
                pd.testing.assert_frame_equal(got, exp,
                                              check_dtype=False,
                                              check_exact=False,
                                              rtol=0, atol=1e-9)
                print(f"ok   {name}: rows={len(got)} MATCH "
                      f"(atol=1e-9 float drift, max "
                      f"{_max_ulp(got, exp)} ulp) [{dt:.1f}s]")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
            n_fail += 1
    ray.shutdown()
    return n_fail


if __name__ == "__main__":
    sys.exit(main())
