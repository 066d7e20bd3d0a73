"""IVF-Flat ANN: semantic sanity + plan shape.

The registry parity suite (test_registry_parity) already proves ivf_topk
byte-matches its DuckDB oracle at sf0.001/sf0.01; these tests pin the
properties the oracle comparison can't express: self-retrieval, recall vs
the exact brute force, and the index/probe plan shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datatrove_spark.operators import similarity
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter("vec_id < 5").selectExpr("vec_id AS query_id", "embedding")


def test_self_retrieval(emb, queries):
    """Every query vector is in the corpus and in its own probed cell, so it
    must come back at rank 1 with score 1.0."""
    out = similarity.ivf_topk(emb, queries, k=5).collect()
    top = {r.query_id: (r.vec_id, r.score) for r in out if r.rank == 1}
    assert set(top) == {0, 1, 2, 3, 4}
    for qid, (vid, score) in top.items():
        assert vid == qid, (qid, vid)
        assert score == 1.0


def test_recall_vs_exact(emb, queries):
    """Probing n_probe=n_centroids cells degenerates to exact search: the
    result must equal brute-force cosine_topk row-for-row."""
    exact = sorted(map(tuple, similarity.cosine_topk(emb, queries, k=5).collect()))
    full = sorted(
        map(tuple, similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8).collect())
    )
    assert full == exact


def test_partial_probe_is_subset(emb, queries):
    """With n_probe < n_centroids the candidate set shrinks; every returned
    (query, hit) pair must still be a true corpus vector and scores must be
    exact cosines (spot-check vs brute force on the intersection)."""
    exact = {
        (r.query_id, r.vec_id): r.score
        for r in similarity.cosine_topk(emb, queries, k=50).collect()
    }
    approx = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=2).collect()
    assert len(approx) > 0
    for r in approx:
        assert (r.query_id, r.vec_id) in exact
        assert r.score == exact[(r.query_id, r.vec_id)]


def test_plan_single_corpus_udf_and_broadcast(emb, queries):
    """The corpus side runs the assignment kernel exactly once (one
    ArrowEvalPython over the corpus scan) and the probed query cells reach it
    as a broadcast — the corpus is never shuffled by query count."""
    import contextlib
    import io

    df = similarity.ivf_topk(emb, queries, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    # exactly two Arrow kernels: one corpus cell assignment, one query probes
    # (a third means the constraint-inferred isnotnull(cell) filter cloned the
    # corpus assignment — the scalar-LONG + asNondeterministic contract broke)
    import re

    assert len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M)) == 2, plan
    # the corpus re-rank streams against broadcast candidates; a sort-merge
    # join here means the corpus vector table was shuffled (or broadcast) by
    # the candidate join — fatal at 10^9 vectors
    assert "SortMergeJoin" not in plan, plan


# --- SemDeDup (embedding-cluster semantic dedup) ------------------------------


def test_semdedup_removes_within_cell_dups_and_keeps_min(spark):
    """Identical and near-identical vectors land in the same cell and dedup
    to the min-id representative; orthogonal vectors survive."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "vec_id": pd.Series([0, 1, 2, 3, 4, 5], dtype="int64"),
            "embedding": [
                [1.0, 0.0, 0.0, 0.0],   # centroid 0
                [0.0, 1.0, 0.0, 0.0],   # centroid 1
                [1.0, 0.001, 0.0, 0.0], # near-dup of 0 (same cell)
                [1.0, 0.0, 0.0, 0.0],   # exact dup of 0
                [0.0, 1.0, 0.0, 0.0],   # exact dup of 1
                [0.0, 0.0, 1.0, 0.0],   # orthogonal to both centroids
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = {
        r.vec_id: (r.semdedup_keep, r.dup_of)
        for r in similarity.semdedup(df, n_centroids=2, threshold=0.95).collect()
    }
    assert out[0] == (True, None)
    assert out[2] == (False, 0) and out[3] == (False, 0)  # transitive group -> min id 0
    assert out[1] == (True, None) and out[4] == (False, 1)
    assert out[5][0] is True  # orthogonal vector survives its cell


def test_semdedup_cross_cell_pairs_never_compared(spark):
    """A pair of identical vectors assigned to DIFFERENT cells is NOT
    deduped — the within-cell restriction is the algorithm's contract
    (and what bounds the quadratic pair work at scale)."""
    import pandas as pd

    # centroids are vec_id 0 and 1; vec 2 equals centroid 0, vec 3 equals
    # centroid 1 -> different cells, never compared even though cos(2,2)=1
    rows = pd.DataFrame(
        {
            "vec_id": pd.Series([0, 1, 2, 3], dtype="int64"),
            "embedding": [
                [1.0, 0.0],
                [0.0, 1.0],
                [1.0, 0.0],
                [0.0, 1.0],
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = {r.vec_id: r for r in similarity.semdedup(df, n_centroids=2, threshold=0.95).collect()}
    # 2 dups 0 (same cell), 3 dups 1 (same cell) — but 0/1 themselves stay
    assert not out[2].semdedup_keep and out[2].dup_of == 0
    assert not out[3].semdedup_keep and out[3].dup_of == 1
    assert out[0].semdedup_keep and out[1].semdedup_keep


def test_semdedup_kernel_runs_once(spark, emb):
    """The final semdedup plan joins component labels back as an Arrow
    LocalRelation — never a pickled RDD (the minhash_dedup lesson)."""
    import contextlib
    import io

    df = similarity.semdedup(emb, threshold=0.45)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue().split("\n\n")[0]
    assert "LocalTableScan" in plan  # component labels, never a pickled RDD
    assert "Scan ExistingRDD" not in plan


def _lowest_id_cents(emb, n):
    import numpy as np

    rows = emb.filter(F.col("vec_id") < n).orderBy("vec_id").collect()
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_semdedup_edges_block_kernel_not_hof(spark, emb):
    """The within-cell pair path is the block-matrix Arrow kernel, not the
    interpreted HOF cosine (round-3 verdict weak #1): the edges plan has NO
    lambdafunction, exactly one MapInPandas (the pair kernel), and — in the
    EXECUTED adaptive plan — the cell-assignment kernel evaluates once, the
    self-join's second side reading the (cell, blk) shuffle via
    ReusedExchange instead of re-running assignment + packing."""
    cells = similarity.assign_cells(emb, _lowest_id_cents(emb, 16))
    edges = similarity.cell_neardup_edges(cells, 0.45)
    rows = edges.collect()
    p = edges._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    final = p.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final, final
    assert "lambdafunction" not in final.lower(), final
    assert final.count("MapInPandas") == 1, final
    assert final.count("ArrowEvalPython") == 1, final
    assert final.count("ReusedExchange") == 1, final
    # and the kernel's output matches the interpreted row-wise rendering
    rowwise = similarity.semdedup_edges_rowwise(cells, 0.45)
    assert sorted((r.a, r.b) for r in rows) == sorted(
        (r.a, r.b) for r in rowwise.collect()
    )


def test_shuffle_vec_keeps_float32_widens_ints(spark, emb):
    """The pack-boundary vector column must stay float32 when the source is
    float32 (half the dominant shuffle payload; the kernels re-widen to
    float64 exactly), and widen non-float numerics to double."""
    from pyspark.sql.types import DoubleType, FloatType

    from datatrove_spark.functions.vectors import shuffle_vec

    assert emb.schema["embedding"].dataType.elementType == FloatType()
    out = emb.select(shuffle_vec(emb, "embedding").alias("v"))
    assert out.schema["v"].dataType.elementType == FloatType()
    ints = spark.range(3).selectExpr("array(id, id + 1) AS v")
    out2 = ints.select(shuffle_vec(ints, "v").alias("v"))
    assert out2.schema["v"].dataType.elementType == DoubleType()


def test_semdedup_forest_edges_same_components_linear_count(spark, emb):
    """forest=True must (a) emit only edges that are REAL qualifying pairs,
    (b) produce exactly the same connected components as all-pairs mode, and
    (c) collapse a g-member duplicate group to O(g) edges instead of C(g,2):
    the property that keeps semdedup's edge shuffle linear under viral
    duplication (the round-5 ladder measured all-pairs edges growing 4.1x
    per 2x corpus on a replicated table)."""
    from datatrove_spark.operators.minhash import connected_components

    # 40 identical copies of one vector (one duplicate group) + the corpus
    g = 40
    dup = emb.limit(1).selectExpr("CAST(1000000 AS LONG) AS vec_id", "embedding")
    copies = dup.crossJoin(spark.range(g).withColumnRenamed("id", "r")).selectExpr(
        "vec_id + r AS vec_id", "embedding"
    )
    corpus = emb.select("vec_id", "embedding").union(copies)
    cells = similarity.assign_cells(corpus, _lowest_id_cents(emb, 16))
    allp = similarity.cell_neardup_edges(cells, 0.45)
    fore = similarity.cell_neardup_edges(cells, 0.45, forest=True)
    all_set = {(r.a, r.b) for r in allp.collect()}
    fore_set = {(r.a, r.b) for r in fore.collect()}
    assert fore_set <= all_set  # every forest edge is a real qualifying pair
    comp_all = {r.node: r.rep for r in connected_components(allp).collect()}
    comp_for = {r.node: r.rep for r in connected_components(fore).collect()}
    assert comp_all == comp_for  # identical components
    # the identity group alone holds C(40,2)=780 all-pairs edges; forest mode
    # must stay O(n): bounded by nodes x grid-rows-per-node (<= 2*n_blocks)
    group_allp = sum(1 for a, b in all_set if a >= 1_000_000 and b >= 1_000_000)
    group_fore = sum(1 for a, b in fore_set if a >= 1_000_000 and b >= 1_000_000)
    assert group_allp == g * (g - 1) // 2
    assert group_fore <= 2 * 4 * g  # n_blocks=4 default


def test_cell_neardup_auto_blocks(spark, emb):
    """n_blocks='auto' sizes the grid from the largest cell so no packed
    array row exceeds block_rows vectors, and the edges are unchanged."""
    cells = similarity.assign_cells(emb, _lowest_id_cents(emb, 16))
    fixed = {(r.a, r.b) for r in similarity.cell_neardup_edges(cells, 0.45).collect()}
    auto = {
        (r.a, r.b)
        for r in similarity.cell_neardup_edges(
            cells, 0.45, n_blocks="auto", block_rows=10
        ).collect()
    }
    assert auto == fixed
    # precondition: auto actually had to split (largest cell > block_rows)
    mx = cells.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    assert mx > 10


def test_ivf_trained_centroids(emb, queries):
    """Trained (explicit, non-lowest-id) centroids flow through ivf_topk
    without touching the plan: probing every cell still degenerates to exact
    search, and a partial probe returns true exact-cosine scores."""
    import numpy as np

    mat = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    # a k-means-like artifact: means of 8 contiguous id stripes (≠ any corpus
    # vector, ≠ the lowest-id default), fixed constants at index+query time
    cents = np.array([s.mean(axis=0) for s in np.array_split(mat, 8)])
    assert not np.allclose(cents[0], mat[0])
    exact = sorted(map(tuple, similarity.cosine_topk(emb, queries, k=5).collect()))
    full = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                emb, queries, k=5, n_probe=8, centroids=cents
            ).collect(),
        )
    )
    assert full == exact
    approx = similarity.ivf_topk(emb, queries, k=5, n_probe=2, centroids=cents).collect()
    exact_scores = {
        (r.query_id, r.vec_id): r.score
        for r in similarity.cosine_topk(emb, queries, k=50).collect()
    }
    assert len(approx) > 0
    for r in approx:
        assert r.score == exact_scores[(r.query_id, r.vec_id)]


def test_semdedup_trained_centroids(spark):
    """semdedup honors the explicit centroid table: with trained centroids
    the dup pair lands in one cell and dedups; with the (here: adversarial)
    lowest-id default the same pair straddles two cells and survives —
    proving the argument actually routes assignment."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "vec_id": pd.Series([0, 1, 2, 3], dtype="int64"),
            "embedding": [
                [1.0, 0.0],     # default centroid 0
                [0.0, 1.0],     # default centroid 1
                [0.96, 0.28],   # near [1,0] -> default cell 0
                [0.97, 0.26],   # near-dup of 2, also default cell 0
            ],
        }
    )
    df = spark.createDataFrame(rows)
    # trained centroids split the near-dup pair apart: one centroid right on
    # vec 2, one right on vec 3 -> different cells, pair never compared
    split = [[0.96, 0.28], [0.97, 0.26]]
    out_split = {
        r.vec_id: r.semdedup_keep
        for r in similarity.semdedup(df, threshold=0.99, centroids=split).collect()
    }
    assert out_split[2] and out_split[3]
    # default lowest-id centroids put 2 and 3 in the same cell -> dedup
    out_def = {
        r.vec_id: (r.semdedup_keep, r.dup_of)
        for r in similarity.semdedup(df, n_centroids=2, threshold=0.99).collect()
    }
    assert out_def[2] == (True, None) and out_def[3] == (False, 2)
