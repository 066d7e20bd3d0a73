"""Ops tooling — Spark-native renderings of the reference's `datatrove.tools`.

The reference ships four slurm-executor conveniences; their jobs map onto the
artifacts our pipeline runtime already writes (metrics.json, per-shard
_SUCCESS markers, executor.json, logs/task_NNNNN.log — plans/pipeline.py):

- ``merge_stats``   ≙ tools/merge_stats.py:26-41 (sum PipelineStats JSONs)
- ``jobs_status``   ≙ tools/jobs_status.py:28-87 (scan job dirs, % complete)
- ``failed_logs``   ≙ tools/failed_logs.py:27-71 (logs of incomplete ranks)
- ``inspect_data``  ≙ tools/inspect_data.py:112-175 — re-thought for Spark:
  the reference eval()s a Python filter expression per document in one
  process; here the filter is a Spark SQL expression (pushed down, runs
  distributed) and sampling is the engine's deterministic hash sampler, so
  inspecting 10 docs out of 100 TB scans almost nothing. Labeling is a
  declarative expression writing good/bad JSONL instead of a per-doc
  interactive prompt (no TTY on a cluster edge node).

`tools/check_dataset.py` already has an analog (operators/dataset.py:165);
`launch_pickled_pipeline.py` is replaced by spark-submit itself.

Every function is pure (returns data); ``main`` is a thin argparse CLI:
``python -m datatrove_spark.tools <merge-stats|jobs-status|failed-logs|inspect> ...``
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- merge_stats -------------------------------------------------------------


def merge_stats(path_or_files: str | Sequence[str], output: str | None = None) -> dict:
    """Combine per-job/per-shard metrics.json files into one.

    Given a directory, merges ``<dir>/*/metrics.json`` (one per job/shard dir
    — NOT recursive, so a sharded run's already-merged job-level file is not
    double-counted with its shard files); given an explicit list, merges
    exactly those files. Totals and per-reason counts sum; the stage list
    must agree across inputs (mirrors PipelineStats.__add__'s assumption that
    it is summing runs of the same pipeline)."""
    if isinstance(path_or_files, str):
        files = sorted(glob.glob(os.path.join(path_or_files, "*", "metrics.json")))
        if not files and os.path.isfile(os.path.join(path_or_files, "metrics.json")):
            files = [os.path.join(path_or_files, "metrics.json")]
    else:
        files = list(path_or_files)
    if not files:
        raise FileNotFoundError(f"no metrics.json found under {path_or_files!r}")
    merged: dict = {"total": 0, "kept": 0, "dropped_by_reason": {}, "stages": None, "inputs": files}
    for path in files:
        with open(path) as f:
            m = json.load(f)
        if merged["stages"] is None:
            merged["stages"] = m.get("stages", [])
        elif m.get("stages", []) != merged["stages"]:
            raise ValueError(f"{path} ran stages {m.get('stages')} != {merged['stages']}")
        merged["total"] += m["total"]
        merged["kept"] += m["kept"]
        for k, v in m.get("dropped_by_reason", {}).items():
            merged["dropped_by_reason"][k] = merged["dropped_by_reason"].get(k, 0) + v
    merged["dropped_by_reason"] = dict(sorted(merged["dropped_by_reason"].items()))
    if output:
        with open(output, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
    return merged


# --- jobs_status / failed_logs ----------------------------------------------


def _shard_complete(job_dir: str, rank: int) -> bool:
    shard = os.path.join(job_dir, f"shard-{rank:05d}")
    return os.path.exists(os.path.join(shard, "data", "_SUCCESS")) and os.path.exists(
        os.path.join(shard, "metrics.json")
    )


def job_status(job_dir: str) -> dict:
    """Completion state of ONE sharded run dir (executor.json + shard
    markers; reference jobs_status.py:48-68 reads completions/NNNNN — our
    completion signal is the shard's _SUCCESS + metrics pair, which
    run_pipeline_sharded's resume path also trusts)."""
    manifest = os.path.join(job_dir, "executor.json")
    if not os.path.isfile(manifest):
        raise FileNotFoundError(f'no "executor.json" in {job_dir} — not a job folder?')
    with open(manifest) as f:
        world_size = json.load(f).get("world_size")
    if not world_size:
        raise ValueError(f"{manifest} has no world_size — relaunch the run")
    completed = [r for r in range(world_size) if _shard_complete(job_dir, r)]
    incomplete = [r for r in range(world_size) if r not in set(completed)]
    # empty shards complete without a metrics file only if the runner wrote
    # none — they still log "completed"; count them via the task log.
    for r in list(incomplete):
        log = os.path.join(job_dir, "logs", f"task_{r:05d}.log")
        if os.path.isfile(log):
            with open(log) as f:
                if f.read().rstrip().endswith("completed"):
                    incomplete.remove(r)
                    completed.append(r)
    return {
        "path": job_dir,
        "world_size": world_size,
        "completed": sorted(completed),
        "incomplete": sorted(incomplete),
        "done": not incomplete,
    }


def jobs_status(root: str, log_prefix: str = "", hide_complete: bool = False) -> dict:
    """Scan ``root/{log_prefix}*`` job dirs (reference jobs_status.py:38-42)
    and summarize each; dirs without executor.json are reported, not fatal."""
    jobs, skipped = [], []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if not os.path.isdir(path) or not name.startswith(log_prefix):
            continue
        try:
            jobs.append(job_status(path))
        except (FileNotFoundError, ValueError) as exc:
            skipped.append({"path": path, "error": str(exc)})
    shown = [j for j in jobs if not (hide_complete and j["done"])]
    return {
        "jobs": shown,
        "skipped": skipped,
        "complete_jobs": sum(j["done"] for j in jobs),
        "total_jobs": len(jobs),
    }


def failed_logs(job_dir: str) -> list[dict]:
    """Task logs of incomplete ranks (reference failed_logs.py:51-70):
    each entry carries the rank, its log path, and the log text (or None
    when the shard died before writing one — e.g. SIGKILL)."""
    status = job_status(job_dir)
    out = []
    for rank in status["incomplete"]:
        log = os.path.join(job_dir, "logs", f"task_{rank:05d}.log")
        text = None
        if os.path.isfile(log):
            with open(log) as f:
                text = f.read()
        out.append({"rank": rank, "log": log if text is not None else None, "text": text})
    return out


# --- inspect_data -------------------------------------------------------------

_EXT_READERS = {
    ".jsonl": "jsonl", ".jsonl.gz": "jsonl", ".json": "jsonl",
    ".csv": "csv", ".parquet": "parquet",
    ".warc": "warc", ".warc.gz": "warc", ".arc.gz": "warc",
}


def _guess_reader(path: str) -> str:
    """Extension-based dispatch (reference inspect_data.py:84-96)."""
    files = sorted(
        p for p in glob.glob(os.path.join(path, "**", "*"), recursive=True) if os.path.isfile(p)
    ) or ([path] if os.path.isfile(path) else [])
    if not files:
        raise FileNotFoundError(f"no files under {path!r}")
    # skip sink metadata (_SUCCESS, .part.crc) the reference never encounters
    data_files = [p for p in files if not os.path.basename(p).startswith(("_", "."))]
    for f in data_files or files:
        name = os.path.basename(f)
        ext = name[name.index(".") :] if "." in name else ""
        for suffix, reader in _EXT_READERS.items():
            if ext.endswith(suffix):
                return reader
    raise ValueError(f"no reader matches any file under {path!r} (e.g. {files[0]})")


def inspect_data(
    spark: SparkSession,
    path: str,
    reader: str | None = None,
    sample: float = 1.0,
    where: str | None = None,
    sample_key: str | None = None,
) -> DataFrame:
    """Distributed sample-and-filter over any supported layout. ``where`` is
    a Spark SQL boolean expression over the data's own columns (e.g.
    ``"length(text) > 5000"``) — unlike the reference's eval()'d Python
    lambda it reaches the scan as a pushed predicate. Sampling uses the
    engine's partition-independent hash sampler on ``sample_key`` (first
    column by default), so the same rows appear at any parallelism."""
    from datatrove_spark.operators.sampling import deterministic_sample
    from datatrove_spark.sources import readers as R
    from datatrove_spark.sources.warc import read_warc

    kind = reader or _guess_reader(path)
    df = {
        "jsonl": lambda: R.read_jsonl(spark, path),
        "csv": lambda: R.read_csv(spark, path),
        "parquet": lambda: R.read_parquet(spark, path),
        "warc": lambda: read_warc(spark, path),
    }[kind]()
    if where:
        df = df.filter(F.expr(where))
    if sample < 1.0:
        df = deterministic_sample(df, sample, sample_key or df.columns[0])
    return df


def render_samples(df: DataFrame, limit: int = 5, text_col: str = "text") -> str:
    """Plain-text panels (the reference renders rich Panels; a cluster edge
    node gets the same id/metadata/text layout without the dependency)."""
    rows = df.limit(limit).collect()
    cols = [c for c in df.columns if c != text_col]
    panels = []
    for r in rows:
        meta = "\n".join(f"- {c}: {r[c]!r}" for c in cols)
        body = r[text_col] if text_col in df.columns else ""
        panels.append(f"{'=' * 72}\n{meta}\n{'-' * 72}\n{body}")
    return "\n".join(panels)


def label_samples(df: DataFrame, good_where: str, label_dir: str) -> tuple[int, int]:
    """Declarative stand-in for the reference's interactive g/b labeling
    (inspect_data.py:152-175): rows matching ``good_where`` land in
    good_samples.jsonl, the rest in bad_samples.jsonl. One pass, two sinks
    via a partitioned write."""
    from datatrove_spark.sources.readers import write_jsonl

    labeled = df.withColumn("__label", F.when(F.expr(good_where), "good").otherwise("bad"))
    write_jsonl(labeled, label_dir, compression="none", partition_by=["__label"])
    counts = {r["__label"]: r["n"] for r in labeled.groupBy("__label").agg(F.count("*").alias("n")).collect()}
    return counts.get("good", 0), counts.get("bad", 0)


# --- CLI ----------------------------------------------------------------------


def main(argv: Sequence[str] | None = None) -> int:
    p = argparse.ArgumentParser("datatrove_spark.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    ms = sub.add_parser("merge-stats", help="combine per-job metrics.json files")
    ms.add_argument("path", nargs="?", default=os.getcwd())
    ms.add_argument("-o", "--output", default="merged_stats.json")

    js = sub.add_parser("jobs-status", help="completion summary for job dirs under PATH")
    js.add_argument("path", nargs="?", default=os.getcwd())
    js.add_argument("-p", "--log_prefix", default="")
    js.add_argument("-hc", "--hide_complete", action="store_true")

    fl = sub.add_parser("failed-logs", help="print task logs of incomplete shards")
    fl.add_argument("path", nargs="?", default=os.getcwd())

    ins = sub.add_parser("inspect", help="sample documents from a data folder")
    ins.add_argument("path", nargs="?", default=os.getcwd())
    ins.add_argument("-r", "--reader", choices=["jsonl", "csv", "parquet", "warc"])
    ins.add_argument("-s", "--sample", type=float, default=1.0)
    ins.add_argument("-w", "--where", default=None, help="Spark SQL boolean expression")
    ins.add_argument("-n", "--limit", type=int, default=5)
    ins.add_argument("--text-col", default="text")
    ins.add_argument("--label-where", default=None, help="SQL expr: matching rows labeled good")
    ins.add_argument("--label-dir", default=None)

    args = p.parse_args(argv)
    if args.cmd == "merge-stats":
        merged = merge_stats(args.path, args.output)
        print(json.dumps(merged, indent=1, sort_keys=True))
    elif args.cmd == "jobs-status":
        summary = jobs_status(args.path, args.log_prefix, args.hide_complete)
        for j in summary["jobs"]:
            mark = "OK " if j["done"] else "FAIL"
            frac = len(j["completed"]) / j["world_size"]
            print(f"{mark} {j['path'] + ':':<50}{len(j['completed'])}/{j['world_size']} ({frac:.0%}) completed tasks.")
        for s in summary["skipped"]:
            print(f"??  {s['path']}: {s['error']}")
        if summary["total_jobs"]:
            print(f"Summary: {summary['complete_jobs']}/{summary['total_jobs']} jobs completed.")
        else:
            print("No jobs found.")
        return 0 if summary["complete_jobs"] == summary["total_jobs"] else 1
    elif args.cmd == "failed-logs":
        logs = failed_logs(args.path)
        print(f"{len(logs)} incomplete task(s).")
        for entry in logs:
            print(f"--- rank {entry['rank']} ({entry['log'] or 'no log written'}) ---")
            if entry["text"]:
                print(entry["text"])
        return 0 if not logs else 1
    elif args.cmd == "inspect":
        from datatrove_spark import get_spark

        spark = get_spark(app_name="inspect-data")
        df = inspect_data(spark, args.path, args.reader, args.sample, args.where)
        print(render_samples(df, args.limit, args.text_col))
        if args.label_where and args.label_dir:
            good, bad = label_samples(df, args.label_where, args.label_dir)
            print(f"labeled: {good} good / {bad} bad -> {args.label_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
