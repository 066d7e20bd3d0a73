#!/usr/bin/env python
"""Strict driver-shaped correctness gate.

The round-1 driver compares Spark vs DuckDB results as *pandas frames*
(sort columns by name, sort rows, hash values), so value-level equality is
not enough: the pandas dtype and the exact cell rendering must match too
(HUGEINT vs int64, Decimal vs float64, list columns are unhashable, ...).
The repo's original `check_correctness.py` normalizes values in Python and
therefore missed 7 such drifts in round 1 (CORRECTNESS_r01.json).

This script reproduces the driver's compare as faithfully as possible:

  spark side: DataFrame.toPandas()
  oracle side: duckdb .df()
  canon: sort columns by name, stable-sort rows by every column (stringified
         key to avoid unhashable cells), reset index
  match: identical dtypes AND identical values (pandas .equals, dtype-exact),
         plus the same sha256 over the stringified canonical frame on both
         sides — a cell type that stringifies differently (Decimal('1.000000')
         vs 1.0) fails.

Exit non-zero on any mismatch. Use this, not the value-level checker, as the
pre-commit gate for registry queries.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from datatrove_spark import get_spark  # noqa: E402
from datatrove_spark.registry import TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        # Spark's toPandas yields datetime64[ns], duckdb's .df() datetime64[us];
        # the cell values (pd.Timestamp) repr identically, and the driver's
        # value hash treats them as equal — normalize the unit, not the values.
        if str(df[col].dtype).startswith("datetime64"):
            df[col] = df[col].astype("datetime64[us]")
    if len(df):
        key = df.apply(lambda r: repr(tuple(r)), axis=1)
        df = df.iloc[np.argsort(key.to_numpy(), kind="stable")]
    return df.reset_index(drop=True)


def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(str(c) for c in df.columns)).encode())
    for col in df.columns:
        h.update(b"\x00col\x00")
        for v in df[col].tolist():
            h.update(repr(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark(app_name="check-strict")
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
            if name not in oracles:
                print(f"{name:28s} ROWS_ONLY rows={len(spd)}")
                continue
            dpd = con.sql(oracles[name]).df()
            s, d = canon(spd), canon(dpd)
            problems = []
            if list(s.columns) != list(d.columns):
                problems.append(f"columns {list(s.columns)} vs {list(d.columns)}")
            else:
                if list(map(str, s.dtypes)) != list(map(str, d.dtypes)):
                    dd = [
                        f"{c}: {st} vs {dt}"
                        for c, st, dt in zip(s.columns, s.dtypes, d.dtypes)
                        if str(st) != str(dt)
                    ]
                    problems.append("dtypes " + "; ".join(dd))
                hs, hd = frame_hash(s), frame_hash(d)
                if hs != hd:
                    # find first differing cell for diagnostics
                    diag = f"hash {hs[:12]} vs {hd[:12]}"
                    if len(s) == len(d):
                        for col in s.columns:
                            a, b = s[col].tolist(), d[col].tolist()
                            bad = next(
                                (i for i in range(len(a)) if repr(a[i]) != repr(b[i])), None
                            )
                            if bad is not None:
                                diag += f" first diff {col}[{bad}]: {a[bad]!r} vs {b[bad]!r}"
                                break
                    else:
                        diag += f" rows {len(s)} vs {len(d)}"
                    problems.append(diag)
            if problems:
                print(f"{name:28s} MISMATCH " + " | ".join(problems))
                failed.append(name)
            else:
                print(f"{name:28s} MATCH rows={len(s)}")
        except Exception as ex:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(ex).__name__}: {str(ex)[:300]}")
            failed.append(name)
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL STRICT MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
