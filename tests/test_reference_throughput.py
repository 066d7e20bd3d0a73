"""Parity contract of the head-to-head script (scripts/reference_throughput.py):
the multiprocessing reference pool must keep EXACTLY the documents the
engine's fused battery keeps (kept-count equality over a fresh pages table) —
the same agreement the full 1M-doc run recorded (699,440 == 699,440,
reference_throughput_r5.json). Guards the measured 2.10× comparison in
BENCH.md against either side drifting."""

from __future__ import annotations

import glob
import os
import sys

import pytest

from datatrove_spark.reference_impl import harness

pytestmark = pytest.mark.skipif(not harness.available(), reason="reference repo not present")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_pool_kept_matches_engine(spark, tmp_path):
    from reference_throughput import run_reference

    from datatrove_spark.registry import quality_pipeline
    from datatrove_spark.sources.pages import generate_pages

    path = str(tmp_path / "pages.parquet")
    generate_pages(spark, 1500).repartition(4).write.parquet(path)
    shards = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(shards) == 4

    ref = run_reference(shards, workers=2)
    engine_kept = quality_pipeline(spark.read.parquet(path)).filter("keep").count()

    assert ref["docs"] == 1500
    assert ref["kept"] == engine_kept
    # the generator's pages are well-formed: the reference must not be
    # crashing its way to agreement (crash-docs count as kept)
    assert ref["reference_errors"] == 0
