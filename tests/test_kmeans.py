"""k-means trainer: fixed-point Lloyd's exactness, partition independence,
empty-cell carryover, codebook integration, plan shape.

Registry parity (kmeans_cells via scripts/check_correctness.py) proves the
final assignment matches the unrolled DuckDB oracle bit-for-bit; these pin
the semantics the hash comparison can't express."""

from __future__ import annotations

import contextlib
import io

import numpy as np
from pyspark.sql import functions as F

from datatrove_spark.operators import kmeans
from datatrove_spark.operators.similarity import py_ivf_dists
from tests.conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _numpy_lloyds(ids, mat, k, n_iter, scale=kmeans.SCALE):
    """Single-process reference of the exact fixed-point update."""
    order = np.argsort(ids, kind="stable")
    cents = mat[order[:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        cells = np.argmin(py_ivf_dists(mat, cents), axis=1)
        q = np.floor(mat * scale + 0.5).astype(np.int64)
        new = cents.copy()
        for c in range(k):
            m = cells == c
            if m.any():
                new[c] = (q[m].sum(axis=0).astype(np.float64) / scale) / m.sum()
        cents = new
    return cents


def test_train_matches_single_process_reference_bitexact(spark):
    emb = _emb(spark)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    expect = _numpy_lloyds(ids, mat, k=16, n_iter=2)
    got = kmeans.train(emb, k=16, n_iter=2)
    assert (got == expect).all()  # bit-exact, not allclose


def test_centroids_are_partition_independent(spark):
    """The whole point of the int64 fixed-point update: partial sums commute,
    so any physical layout gives bit-identical centroids."""
    emb = _emb(spark)
    a = kmeans.train(emb.repartition(2), k=8, n_iter=2)
    b = kmeans.train(emb.repartition(23), k=8, n_iter=2)
    assert (a == b).all()


def test_iterations_reduce_inertia(spark):
    emb = _emb(spark)
    rows = emb.select("embedding").collect()
    mat = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    c0 = kmeans.train(emb, k=16, n_iter=0)
    c2 = kmeans.train(emb, k=16, n_iter=2)
    inertia0 = py_ivf_dists(mat, c0).min(axis=1).sum()
    inertia2 = py_ivf_dists(mat, c2).min(axis=1).sum()
    assert inertia2 < inertia0


def test_empty_cell_keeps_previous_centroid(spark):
    """Duplicate init vectors force a deterministic empty cell: both
    centroids start at (0,0), the tie rule sends every point to cell 0, so
    cell 1 sees no members and must carry its init vector over exactly."""
    import pandas as pd

    pts = [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0]]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": list(range(3)), "embedding": pts})
    )
    cents = kmeans.train(df, k=2, n_iter=1)
    assert (cents[1] == np.array([0.0, 0.0])).all()
    expect0 = (np.floor(np.array([10.0, 10.0]) * kmeans.SCALE + 0.5) / kmeans.SCALE) / 3
    assert (cents[0] == expect0).all()


def test_trained_codebook_feeds_consumers(spark):
    """One trained codebook drives ANN and rebalancing: ivf_topk and
    cell_rebalance accept the array unchanged."""
    from datatrove_spark.operators import cell_rebalance, similarity

    emb = _emb(spark)
    cents = kmeans.train(emb, k=8, n_iter=1)
    queries = emb.filter("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    topk = similarity.ivf_topk(
        emb, queries, k=3, n_centroids=8, n_probe=8, centroids=cents
    ).collect()
    assert len(topk) == 9
    # n_probe = k degenerates to exact search regardless of the codebook
    brute = similarity.cosine_topk(emb, queries, k=3).collect()
    key = lambda r: (r.query_id, r.rank)
    assert {key(r): r.vec_id for r in topk} == {key(r): r.vec_id for r in brute}
    reb = cell_rebalance.apply(emb, centroids=cents).collect()
    assert {r.cell for r in reb} <= set(range(8))
    assert any(r.cell_rebalance_keep for r in reb)


def test_corpus_path_is_shuffle_free(spark):
    """The per-iteration corpus pass is mapInPandas straight over the scan —
    no Exchange touches corpus rows (the only shuffles in train() move
    O(partitions x k) slim partial rows, and apply()'s output assignment is
    a narrow kernel projection)."""
    emb = _emb(spark)
    cents = np.zeros((4, 64), dtype=np.float64)
    partials = emb.select(F.col("embedding").alias("__v")).mapInPandas(
        kmeans._partials_kernel(cents, kmeans.SCALE), "cell long, n long, q array<long>"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        partials.explain("simple")
    p = buf.getvalue()
    assert "Exchange" not in p, p
    assert "MapInPandas" in p, p

    from datatrove_spark.operators.similarity import assign_cells

    out = assign_cells(emb, cents).select("vec_id", "cell")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "Exchange" not in p, p
