#!/usr/bin/env python
"""Driver-shaped correctness check: run every __spark_entry__.queries() entry
and compare against its oracle_sql() via DuckDB at sf0.01 (or $SPARK_GRAFT_SF_DIR).

Prints one line per query: MATCH / MISMATCH / ROWS_ONLY, and exits non-zero
on any mismatch.

Usage: check_correctness.py [--json OUT.json] [query_name ...]
With query names, only those registry entries run (fast iteration); --json
additionally writes the per-query result dict in the driver's
CORRECTNESS_r{N}.json shape so every round can commit its own full record
(CORRECTNESS_full_r{N}.json) even if the driver harness truncates.
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
    import argparse
    import json
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="write per-query results JSON here")
    ap.add_argument("names", nargs="*", help="subset of registry query names to run")
    argv = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark(app_name="check-correctness")
    qs, oracles = e.queries(), e.oracle_sql()
    if argv.names:
        unknown = [n for n in argv.names if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 2
        qs = {n: qs[n] for n in argv.names}
    failed = []
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:28s} ROWS_ONLY rows={len(s_rows)}")
                results[name] = {
                    "rows_match": None, "schema_match": None, "hash_match": None,
                    "spark_rows": len(s_rows), "oracle_rows": None, "err": None,
                    "sec": round(time.monotonic() - t0, 2),
                }
                continue
            rel = con.sql(oracles[name])
            d_rows = [tuple(r) for r in rel.fetchall()]
            sc, sr = normalize(s_rows, sdf.columns)
            dc, dr = normalize(d_rows, list(rel.columns))
            res = {
                "rows_match": len(sr) == len(dr), "schema_match": sc == dc,
                "hash_match": sr == dr and sc == dc,
                "spark_rows": len(sr), "oracle_rows": len(dr), "err": None,
                "sec": round(time.monotonic() - t0, 2),
            }
            results[name] = res
            if sc != dc:
                print(f"{name:28s} MISMATCH columns {sc} vs {dc}")
                failed.append(name)
            elif sr != dr:
                bad = sum(1 for a, b in zip(sr, dr) if a != b) + abs(len(sr) - len(dr))
                first = next(((a, b) for a, b in zip(sr, dr) if a != b), None)
                print(f"{name:28s} MISMATCH rows={len(sr)}/{len(dr)} bad={bad} first={first}")
                failed.append(name)
            else:
                print(f"{name:28s} MATCH rows={len(sr)} ({res['sec']}s)")
        except Exception as ex:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(ex).__name__}: {str(ex)[:200]}")
            results[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"{type(ex).__name__}: {str(ex)[:200]}",
                "sec": round(time.monotonic() - t0, 2),
            }
            failed.append(name)
    if argv.json:
        with open(argv.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {argv.json} ({len(results)} queries)")
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
