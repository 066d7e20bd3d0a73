"""Ops tools (datatrove_spark/tools.py) — the Spark renderings of the
reference's tools/{merge_stats,jobs_status,failed_logs,inspect_data}.py,
exercised against real sharded-run artifacts."""

from __future__ import annotations

import glob
import json
import os

import pytest

from datatrove_spark import tools
from datatrove_spark.operators import gopher_quality, gopher_repetition
from datatrove_spark.plans.pipeline import Stage, run_pipeline_sharded
from datatrove_spark.sources.pages import generate_pages

STAGES = [
    Stage("gopher_repetition", gopher_repetition.apply),
    Stage("gopher_quality", gopher_quality.apply),
]


@pytest.fixture(scope="module")
def job(spark, tmp_path_factory):
    """One complete sharded run over synthetic pages."""
    root = tmp_path_factory.mktemp("tools")
    src = str(root / "input")
    generate_pages(spark, 300).repartition(4).write.parquet(src)
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    out = str(root / "job_a")
    metrics = run_pipeline_sharded(spark, files, STAGES, out, world_size=4)
    return root, out, files, metrics


def test_executor_manifest_and_task_logs(job):
    root, out, files, metrics = job
    with open(os.path.join(out, "executor.json")) as f:
        manifest = json.load(f)
    assert manifest == {"world_size": 4, "stages": ["gopher_repetition", "gopher_quality"]}
    logs = sorted(glob.glob(os.path.join(out, "logs", "task_*.log")))
    assert [os.path.basename(p) for p in logs] == [f"task_{r:05d}.log" for r in range(4)]
    text = open(logs[0]).read()
    assert files[0] in text and text.rstrip().endswith("completed")


def test_job_status_complete(job):
    _, out, _, _ = job
    st = tools.job_status(out)
    assert st["done"] and st["completed"] == [0, 1, 2, 3] and st["incomplete"] == []


def test_job_status_and_failed_logs_incomplete(spark, job, tmp_path):
    """Break one shard the way a crash does (marker+metrics gone, log shows
    the failure) and confirm both tools point at exactly that rank."""
    import shutil

    _, out, _, _ = job
    broken = str(tmp_path / "broken")
    shutil.copytree(out, broken)
    victim = os.path.join(broken, "shard-00002")
    os.remove(os.path.join(victim, "data", "_SUCCESS"))
    os.remove(os.path.join(victim, "metrics.json"))
    with open(os.path.join(broken, "logs", "task_00002.log"), "w") as f:
        f.write("rank 2: FAILED\nTraceback (most recent call last):\n  boom\n")

    st = tools.job_status(broken)
    assert st["incomplete"] == [2] and not st["done"]
    logs = tools.failed_logs(broken)
    assert [e["rank"] for e in logs] == [2]
    assert "Traceback" in logs[0]["text"]
    # a rank that died before writing any log is still reported
    os.remove(os.path.join(broken, "logs", "task_00002.log"))
    logs = tools.failed_logs(broken)
    assert logs[0]["log"] is None and logs[0]["text"] is None


def test_jobs_status_scan(job, tmp_path):
    import shutil

    root, out, _, _ = job
    scan_root = str(tmp_path / "scan")
    os.makedirs(scan_root)
    shutil.copytree(out, os.path.join(scan_root, "job_a"))
    shutil.copytree(out, os.path.join(scan_root, "job_b"))
    os.remove(os.path.join(scan_root, "job_b", "shard-00001", "metrics.json"))
    os.remove(os.path.join(scan_root, "job_b", "logs", "task_00001.log"))
    os.makedirs(os.path.join(scan_root, "not_a_job"))

    summary = tools.jobs_status(scan_root)
    assert summary["total_jobs"] == 2 and summary["complete_jobs"] == 1
    by_name = {os.path.basename(j["path"]): j for j in summary["jobs"]}
    assert by_name["job_a"]["done"] and not by_name["job_b"]["done"]
    assert [os.path.basename(s["path"]) for s in summary["skipped"]] == ["not_a_job"]
    # prefix + hide_complete filters (reference jobs_status.py flags)
    assert tools.jobs_status(scan_root, log_prefix="job_b")["total_jobs"] == 1
    assert [os.path.basename(j["path"]) for j in tools.jobs_status(scan_root, hide_complete=True)["jobs"]] == ["job_b"]


def test_merge_stats_across_jobs(job, tmp_path):
    import shutil

    _, out, _, metrics = job
    root = str(tmp_path / "stats")
    os.makedirs(root)
    shutil.copytree(out, os.path.join(root, "run1"))
    shutil.copytree(out, os.path.join(root, "run2"))
    merged = tools.merge_stats(root, output=str(tmp_path / "merged.json"))
    assert merged["total"] == 2 * metrics["total"]
    assert merged["kept"] == 2 * metrics["kept"]
    assert merged["dropped_by_reason"] == {
        k: 2 * v for k, v in metrics["dropped_by_reason"].items()
    }
    assert json.load(open(tmp_path / "merged.json"))["total"] == merged["total"]
    # mismatched stage lists refuse to merge
    other = os.path.join(root, "run2", "metrics.json")
    m = json.load(open(other))
    m["stages"] = ["something_else"]
    json.dump(m, open(other, "w"))
    with pytest.raises(ValueError, match="stages"):
        tools.merge_stats(root)


def test_inspect_data_parquet(spark, job):
    root, out, files, metrics = job
    src = os.path.dirname(files[0])
    df = tools.inspect_data(spark, src, where="length(text) > 200")
    assert df.count() > 0
    assert df.filter("length(text) <= 200").count() == 0
    # deterministic sampling: same rows at any call, strict subset
    s1 = {r.url for r in tools.inspect_data(spark, src, sample=0.3).select("url").collect()}
    s2 = {r.url for r in tools.inspect_data(spark, src, sample=0.3).select("url").collect()}
    full = {r.url for r in tools.inspect_data(spark, src).select("url").collect()}
    assert s1 == s2 and s1 < full and s1
    text = tools.render_samples(df, limit=3)
    assert text.count("=" * 72) == 3 and "- url:" in text


def test_inspect_data_reader_guess_and_labeling(spark, tmp_path):
    from datatrove_spark.sources.readers import write_jsonl

    src = str(tmp_path / "jsonl")
    write_jsonl(generate_pages(spark, 100).select("url", "text"), src, compression="none")
    assert tools._guess_reader(src) == "jsonl"
    df = tools.inspect_data(spark, src)
    assert df.count() == 100

    label_dir = str(tmp_path / "labels")
    good, bad = tools.label_samples(df, "length(text) > 200", label_dir)
    assert good + bad == 100 and good > 0 and bad > 0
    got_good = spark.read.json(os.path.join(label_dir, "__label=good")).count()
    assert got_good == good


def test_cli_smoke(job, capsys):
    _, out, _, _ = job
    root = os.path.dirname(out)
    assert tools.main(["jobs-status", root]) == 0
    assert "1/1 jobs completed" in capsys.readouterr().out
    assert tools.main(["failed-logs", out]) == 0
    assert "0 incomplete" in capsys.readouterr().out
    assert tools.main(["merge-stats", root, "-o", os.path.join(root, "merged.json")]) == 0
    assert json.load(open(os.path.join(root, "merged.json")))["total"] == 300
