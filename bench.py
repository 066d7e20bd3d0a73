#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Also reports docs/sec for the flagship quality_pipeline and, when
BENCH_SCALING=1, re-runs the pipeline at local[N/4] vs local[N] to measure
throughput scaling efficiency (the in-sandbox stand-in for the north rule's
N vs 4N executor criterion — see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as e  # noqa: E402
from datatrove_spark import get_spark  # noqa: E402


def time_query(fn, spark, sf_dir) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()  # full evaluation; count() runs the whole plan incl. UDFs
    return time.perf_counter() - t0, n


def run_suite(spark, sf_dir):
    times, rows = {}, {}
    for name, fn in sorted(e.queries().items()):
        dt, n = time_query(fn, spark, sf_dir)
        times[name] = round(dt, 3)
        rows[name] = n
    return times, rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    # warm the JVM/Arrow paths once so timings reflect steady state
    time_query(e.queries()["quality_pipeline"], spark, sf_dir)

    t0 = time.perf_counter()
    times, rows = run_suite(spark, sf_dir)
    total = time.perf_counter() - t0

    n_docs = rows.get("quality_pipeline", 0)
    pipe_t = times.get("quality_pipeline", 1.0)
    docs_per_sec = round(n_docs / pipe_t, 1) if pipe_t else None

    out = {
        "metric": "suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "rows": rows,
        "docs_per_sec_quality_pipeline": docs_per_sec,
    }

    if os.environ.get("BENCH_SCALING") == "1":
        spark.stop()
        eff = {}
        perf = {}
        for c in (max(1, cpus // 4), cpus):
            s = get_spark(app_name=f"bench-{c}", master=f"local[{c}]", shuffle_partitions=c)
            time_query(e.queries()["quality_pipeline"], s, sf_dir)  # warm
            dt, n = time_query(e.queries()["quality_pipeline"], s, sf_dir)
            perf[c] = n / dt
            s.stop()
        lo, hi = sorted(perf)
        eff = perf[hi] / (perf[lo] * (hi / lo))
        out["scaling"] = {
            "docs_per_sec": {str(k): round(v, 1) for k, v in perf.items()},
            "efficiency_NvTo4N": round(eff, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
