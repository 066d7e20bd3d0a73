#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two workloads:
1. every __spark_entry__.queries() entry at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. the flagship quality pipeline over a deterministically generated
   Common-Crawl-style `pages` table (input_hint shape) sized 1M*sf docs —
   the throughput (docs/sec) headline.

BENCH_SCALING=1 additionally re-runs workload 2 at local[N/4] vs local[N]
on the identical input and reports throughput scaling efficiency — the
in-sandbox evidence for the north rule's N vs 4N executor criterion
(see BENCH.md).
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
    """Times plan construction + FULL evaluation of every output column via
    a noop sink (count() alone lets Spark skip unprojected work)."""
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return dt, df.count()


def pages_path(spark, n_docs: int) -> str:
    """Materialize the deterministic pages table once (generation untimed —
    a real pipeline reads pages from storage)."""
    from datatrove_spark.sources.pages import generate_pages

    path = f"/tmp/bench_pages_{n_docs}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_pages(spark, n_docs).write.mode("overwrite").parquet(path)
    return path


def pages_pipeline_run(spark, n_docs: int) -> tuple[float, int]:
    from datatrove_spark.registry import quality_pipeline

    pages = spark.read.parquet(pages_path(spark, n_docs))
    t0 = time.perf_counter()
    n = quality_pipeline(pages).filter("keep").count()
    return time.perf_counter() - t0, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    n_pages = max(2000, int(1_000_000 * sf))

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    time_query(e.queries()["quality_pipeline"], spark, sf_dir)  # JVM/Arrow warmup

    times, rows = {}, {}
    t0 = time.perf_counter()
    for name, fn in sorted(e.queries().items()):
        dt, n = time_query(fn, spark, sf_dir)
        times[name], rows[name] = round(dt, 3), n
    suite_total = time.perf_counter() - t0

    pages_pipeline_run(spark, 2000)  # warm the generated-pages path
    pages_t, pages_kept = pages_pipeline_run(spark, n_pages)
    times["pages_pipeline"] = round(pages_t, 3)
    rows["pages_pipeline"] = pages_kept

    out = {
        "metric": "suite_seconds",
        "value": round(suite_total + pages_t, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "rows": rows,
        "pages_docs": n_pages,
        "pages_docs_per_sec": round(n_pages / pages_t, 1),
    }

    if os.environ.get("BENCH_SCALING") == "1":
        spark.stop()
        perf = {}
        for c in (max(1, cpus // 4), cpus):
            s = get_spark(app_name=f"bench-{c}", master=f"local[{c}]", shuffle_partitions=c)
            pages_pipeline_run(s, 2000)  # warm
            dt, _ = pages_pipeline_run(s, n_pages)
            perf[c] = n_pages / dt
            s.stop()
        lo, hi = sorted(perf)
        out["scaling"] = {
            "docs_per_sec": {str(k): round(v, 1) for k, v in perf.items()},
            "cores": [lo, hi],
            "efficiency_N_to_4N": round(perf[hi] / (perf[lo] * (hi / lo)), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
