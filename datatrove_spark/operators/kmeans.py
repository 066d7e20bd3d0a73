"""Distributed Lloyd's k-means trainer over the embeddings table.

Beyond-reference: the reference library has no embedding operators at all
(`/root/reference/src/datatrove/pipeline/` carries no vector stage); this
module produces the trained codebook that the engine's semdedup / ivf_topk /
cell_rebalance consumers accept via their `centroids=` argument, closing the
"offline k-means artifact" gap those operators documented. Public
provenance: Lloyd's algorithm; SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) and IVF indexing both assume exactly this coarse-quantizer
training step.

Spark shape (plan-pinned in tests/test_kmeans.py): each iteration is ONE
mapInPandas pass over the corpus — the shared dim-sequential L2 kernel
(`similarity.py_ivf_dists`) assigns every batch row to its nearest centroid
and int64 fixed-point partial sums accumulate per PARTITION (np.add.at), so
only O(partitions x k) slim rows leave the executors. The corpus NEVER
shuffles and carries NO ordering or partitioning contract: integer partial
sums commute exactly, so any physical layout produces bit-identical
centroids (pinned by a partition-independence test). The combine explodes
partials to O(partitions x k x dim) slim (cell, dim, q) rows, reduces them
map-side to k x dim, and collects exactly one codebook-sized result — the
same object the next iteration broadcasts, so if it fits the closure it
fits the collect. At 10^9 vectors x k=65k this is the textbook
tree-aggregated k-means shape GPU/parameter-server variants distribute.

Cross-engine exactness — the reason for FIXED-POINT centroid updates: a
float mean depends on summation ORDER, which no distributed engine should
promise (Spark's partial aggregation is a tree fold over an arbitrary row
layout). Instead every float64-widened component quantizes to
q = floor(v * 2^20 + 0.5): the *2^20 is a pure exponent shift (exact), the
+0.5/floor pair is the same two IEEE ops in numpy and DuckDB, and the
per-cell per-dim sums are int64 — order-independent, so the DuckDB oracle
is a plain GROUP BY sum and the distributed combine needs no fold-order
contract at any scale. The new centroid component is (q_sum / 2^20) / n in
float64 (an exact exponent shift then one correctly-rounded division —
identical everywhere). Quantization error is <= 2^-21 per component per
update, three orders below any real cluster geometry; a documented
determinism choice of the same class as the engine's h60 hashing rule.

Conventions shared with the rest of the embedding family: init = the k
lowest-id corpus vectors (the same deterministic stand-in semdedup/ivf use
when untrained), assignment ties break toward the smaller centroid index,
empty cells keep their previous centroid.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAME = "kmeans"

# 2^20: large enough that the <= 2^-21 per-component quantization error is
# far below embedding geometry, small enough that int64 sums are overflow-
# safe to ~2^42 rows per cell at unit-scale components.
SCALE = 1 << 20


def _partials_kernel(cents, scale: int):
    """mapInPandas generator: per PARTITION, assign rows to nearest-centroid
    cells (shared dim-sequential L2 kernel, ties -> smaller index) and emit
    one slim row per non-empty cell: (cell, n, q[dim] int64 fixed-point sums).
    Integer sums commute, so batch/partition boundaries cannot change the
    result."""
    import numpy as np

    k, dim = cents.shape

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datatrove_spark.operators.similarity import py_ivf_dists

        acc_n = np.zeros(k, dtype=np.int64)
        acc_q = np.zeros((k, dim), dtype=np.int64)
        seen = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            seen = True
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            d = py_ivf_dists(mat, cents)
            cells = np.argmin(d, axis=1)  # ties -> first occurrence = smaller index
            q = np.floor(mat * scale + 0.5).astype(np.int64)
            np.add.at(acc_q, cells, q)
            np.add.at(acc_n, cells, 1)
        if seen:
            nz = np.nonzero(acc_n)[0]
            yield pd.DataFrame(
                {
                    "cell": nz.astype(np.int64),
                    "n": acc_n[nz],
                    "q": [acc_q[i].tolist() for i in nz],
                }
            )

    return gen


def train(
    corpus: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
):
    """Returns the trained (k, dim) float64 codebook after n_iter fixed-point
    Lloyd's updates. Row index = cell id; feed the array straight into
    semdedup / ivf_topk / cell_rebalance via their `centroids=` argument."""
    import numpy as np

    init_rows = (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__c"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"kmeans.train: k={k} but corpus has only {len(init_rows)} rows")
    cents = np.array([r["__c"] for r in init_rows], dtype=np.float64)
    dim = cents.shape[1]
    slim = corpus.select(F.col(vec_col).alias("__v"))
    for _ in range(n_iter):
        partials = slim.mapInPandas(
            _partials_kernel(cents, scale), "cell long, n long, q array<long>"
        ).persist()  # tiny (O(partitions x k) rows); two consumers below
        counts = {int(r["cell"]): int(r["n"]) for r in
                  partials.groupBy("cell").agg(F.sum("n").alias("n")).collect()}
        # O(partitions x k x dim) slim int rows, map-side combined down to
        # k x dim before the collect — exactly one codebook of data moves
        sums = (
            partials.select("cell", F.posexplode("q").alias("i", "qv"))
            .groupBy("cell", "i")
            .agg(F.sum("qv").alias("q"))
            .collect()
        )
        partials.unpersist()
        new = cents.copy()  # empty cells keep their previous centroid
        qmat = np.zeros((k, dim), dtype=np.int64)
        for r in sums:
            qmat[r["cell"], r["i"]] = r["q"]
        for c, n in counts.items():
            new[c] = (qmat[c].astype(np.float64) / scale) / n
        cents = new
    return cents


def apply(
    df: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """(id, cell): train the codebook, then one shuffle-free assignment pass
    under the final centroids (the same narrow kernel every consumer uses)."""
    from datatrove_spark.operators.similarity import assign_cells

    cents = train(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col, scale=scale)
    return assign_cells(df, cents, id_col=id_col, vec_col=vec_col).select(id_col, "cell")


def oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    n_iter: int = 2,
    dim: int = 64,
    scale: int = SCALE,
) -> str:
    """Unrolled Lloyd's iterations in ANSI-ish DuckDB SQL. Bit-exact with the
    Spark trainer by construction: assignment is the same left-to-right
    float64 L2 fold with ties to the smaller centroid id, the update sums the
    same floor(v * 2^20 + 0.5) int64 quanta (order-free), and the new
    component is the same (q / 2^20) / n float64 pair."""

    def l2(vexpr: str, cexpr: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> ({vexpr}[i] - {cexpr}[i]) * ({vexpr}[i] - {cexpr}[i])))"
        )

    parts = [
        f"""cents0 AS (
  SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS cid,
         list_transform({vec_col}, x -> x::DOUBLE) AS cv
  FROM (SELECT {id_col}, {vec_col} FROM {table} ORDER BY {id_col} LIMIT {k})
), corpus AS (
  SELECT {id_col} AS id, list_transform({vec_col}, x -> x::DOUBLE) AS v FROM {table}
)"""
    ]
    for it in range(n_iter):
        parts.append(
            f"""assign{it} AS (
  SELECT c.id, c.v, ct.cid,
         row_number() OVER (PARTITION BY c.id ORDER BY {l2("c.v", "ct.cv")} ASC, ct.cid ASC) AS rnk
  FROM corpus c CROSS JOIN cents{it} ct
), cells{it} AS (SELECT id, v, cid AS cell FROM assign{it} WHERE rnk = 1),
sums{it} AS (
  SELECT cell, i, sum(CAST(floor(v[i] * {scale} + 0.5) AS BIGINT)) AS q, count(*) AS n
  FROM cells{it} CROSS JOIN range(1, {dim} + 1) t(i)
  GROUP BY cell, i
), cents{it + 1} AS (
  SELECT c.cid, CASE WHEN s.cv2 IS NULL THEN c.cv ELSE s.cv2 END AS cv
  FROM cents{it} c LEFT JOIN (
    SELECT cell, list((q::DOUBLE / {scale}) / n ORDER BY i) AS cv2
    FROM sums{it} GROUP BY cell
  ) s ON c.cid = s.cell
)"""
        )
    parts.append(
        f"""final AS (
  SELECT c.id, c.v, ct.cid,
         row_number() OVER (PARTITION BY c.id ORDER BY {l2("c.v", "ct.cv")} ASC, ct.cid ASC) AS rnk
  FROM corpus c CROSS JOIN cents{n_iter} ct
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id AS {id_col}, cid AS cell FROM final WHERE rnk = 1"
    )
