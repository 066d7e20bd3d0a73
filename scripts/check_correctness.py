#!/usr/bin/env python
"""Driver-shaped correctness check: run every __spark_entry__.queries() entry
and compare against its oracle_sql() via DuckDB at sf0.01 (or $SPARK_GRAFT_SF_DIR).

Prints one line per query: MATCH / MISMATCH / ROWS_ONLY, and exits non-zero
on any mismatch.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from datatrove_spark import get_spark  # noqa: E402
from datatrove_spark.registry import TABLES  # noqa: E402


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def nv(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 9)
        return v

    out = sorted((tuple(nv(r[i]) for i in order) for r in rows), key=repr)
    return sorted(columns), out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark(app_name="check-correctness")
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:28s} ROWS_ONLY rows={len(s_rows)}")
                continue
            rel = con.sql(oracles[name])
            d_rows = [tuple(r) for r in rel.fetchall()]
            sc, sr = normalize(s_rows, sdf.columns)
            dc, dr = normalize(d_rows, list(rel.columns))
            if sc != dc:
                print(f"{name:28s} MISMATCH columns {sc} vs {dc}")
                failed.append(name)
            elif sr != dr:
                bad = sum(1 for a, b in zip(sr, dr) if a != b) + abs(len(sr) - len(dr))
                first = next(((a, b) for a, b in zip(sr, dr) if a != b), None)
                print(f"{name:28s} MISMATCH rows={len(sr)}/{len(dr)} bad={bad} first={first}")
                failed.append(name)
            else:
                print(f"{name:28s} MATCH rows={len(sr)}")
        except Exception as ex:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(ex).__name__}: {str(ex)[:200]}")
            failed.append(name)
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
