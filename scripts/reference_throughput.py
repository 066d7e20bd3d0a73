#!/usr/bin/env python
"""Measured single-node head-to-head: the ACTUAL reference library's filter
battery vs this engine, same input, same host state.

BENCH.md's "Reference comparison" section has so far been analytic (the
reference publishes no numbers, BASELINE.md). This script turns it into a
measurement:

- **Reference side**: the reference's own filter objects in FineWeb order
  (GopherRepetition -> GopherQuality -> C4Quality -> FineWebQuality, via
  reference_impl/harness.py — the same code path the F1=1.0 parity test
  runs), executed the way the reference's LocalPipelineExecutor executes
  them: ONE PYTHON PROCESS PER WORKER, each running the filter chain
  document-by-document over its own input shard (reference
  src/datatrove/executor/local.py — workers are forked processes, one task
  = one shard). One pool task per parquet part file (the generator writes
  32 equal iid shards), chunksize=1 for dynamic balancing.
- **Engine side**: bench.py's pages_pipeline_run (the same fused battery
  the headline measures), identical parquet input, local[workers].
- **State matching**: A/B/A sandwich — reference, engine, reference again —
  each segment preceded by the same spin-probe gate bench.py uses, so a
  clock drift during the run shows up as a first-vs-second reference delta
  instead of silently biasing the comparison.

Fairness notes (all favorable to the REFERENCE, making an engine win the
conservative conclusion):
- nltk tokenization is provided by the engine's portable tokenizers on both
  sides (harness TOKENIZER NOTE) — the reference inherits the engine's
  linear sentence splitter rather than paying punkt's cost.
- The reference side pays NO executor/stats/serialization overhead — just
  filter(doc) in a tight loop; its real LocalPipelineExecutor adds both.
- Docs on which the reference raises (empty-text ZeroDivisionError) count
  as kept, matching the engine's NULL-safe keeps, so kept-counts align.

Usage:
  python scripts/reference_throughput.py [--docs 1000000] [--workers 32] \
      [--out reference_throughput_r5.json] [--skip-gate]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from multiprocessing import Pool, set_start_method

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FILTERS = None
_DOCUMENT = None


def _init_worker() -> None:
    """Per-process: install the harness and build the reference's filters
    once (the reference's own executor also constructs blocks per worker)."""
    global _FILTERS, _DOCUMENT
    from datatrove_spark.reference_impl import harness

    harness.install()
    from datatrove.data import Document

    _DOCUMENT = Document
    _FILTERS = harness.reference_battery()


def _run_shard(path: str) -> tuple[int, int, int]:
    """(n_docs, n_kept, n_reference_errors) for one parquet part file."""
    import pyarrow.parquet as pq

    texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
    kept = errs = 0
    for t in texts:
        doc = _DOCUMENT(text=t, id="x")
        try:
            ok = True
            for f in _FILTERS:
                r = f.filter(doc)
                ok = r if isinstance(r, bool) else (r[0] if isinstance(r, tuple) else bool(r))
                if not ok:
                    break
            if ok:
                kept += 1
        except Exception:
            kept += 1  # engine keeps these NULL-safely (BASELINE.md parity row)
            errs += 1
    return len(texts), kept, errs


def run_reference(shards: list[str], workers: int) -> dict:
    t0 = time.perf_counter()
    with Pool(workers, initializer=_init_worker) as pool:
        res = pool.map(_run_shard, shards, chunksize=1)
    wall = time.perf_counter() - t0
    docs = sum(r[0] for r in res)
    return {
        "docs": docs,
        "kept": sum(r[1] for r in res),
        "reference_errors": sum(r[2] for r in res),
        "wall_s": round(wall, 3),
        "docs_per_sec": round(docs / wall, 1),
        "workers": workers,
        "tasks": len(shards),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--workers", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="reference_throughput_r5.json")
    ap.add_argument("--skip-gate", action="store_true", help="skip the rest+probe gates (CI smoke)")
    args = ap.parse_args()

    import bench
    from datatrove_spark import get_spark

    # materialize (or reuse) the deterministic pages table — generation untimed
    spark = get_spark(master=f"local[{args.workers}]")
    pages = bench.pages_path(spark, args.docs)
    shards = sorted(glob.glob(os.path.join(pages, "part-*.parquet")))
    assert shards, f"no part files under {pages}"

    def gate(tag: str) -> float:
        if args.skip_gate:
            return -1.0
        probe, waited = bench.rest_and_gate(60, 0.70, 420)
        print(f"[gate:{tag}] probe={probe:.3f}s waited={waited}s", flush=True)
        return round(probe, 3)

    out: dict = {"docs": args.docs, "workers": args.workers, "input": pages}

    # A: reference
    p = gate("reference_1")
    out["reference"] = run_reference(shards, args.workers) | {"probe_s": p}
    print(json.dumps({"reference": out["reference"]}), flush=True)

    # B: engine (warm-up run first, exactly like bench.py's headline)
    bench.pages_pipeline_run(spark, 2000)
    p = gate("engine")
    wall, kept = bench.pages_pipeline_run(spark, args.docs)
    out["engine"] = {
        "docs": args.docs,
        "kept": kept,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(args.docs / wall, 1),
        "workers": args.workers,
        "probe_s": p,
    }
    print(json.dumps({"engine": out["engine"]}), flush=True)

    # A again: reference re-run (state-drift control)
    p = gate("reference_2")
    out["reference_rerun"] = run_reference(shards, args.workers) | {"probe_s": p}
    print(json.dumps({"reference_rerun": out["reference_rerun"]}), flush=True)

    ref_best = max(out["reference"]["docs_per_sec"], out["reference_rerun"]["docs_per_sec"])
    out["engine_vs_reference"] = round(out["engine"]["docs_per_sec"] / ref_best, 3)
    out["kept_delta"] = out["engine"]["kept"] - out["reference"]["kept"]
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"engine_vs_reference": out["engine_vs_reference"],
                      "kept_delta": out["kept_delta"]}))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    set_start_method("fork", force=True)
    sys.exit(main())
