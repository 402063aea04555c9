"""Distributed PCA over embedding columns: gramian + tiny driver eig.

Beyond-reference extension (the reference verifies cross-database table
equality, SURVEY.md §2.3; it has no vector tooling): the classic
two-phase shape for PCA at corpus scale —

1. **Distributed gramian**: G[i,j] = Σ_rows x_i·x_j, an aggregation
   whose output is d(d+1)/2 cells *regardless of corpus size* (d=64 →
   2080 rows).  Map-side combine collapses each partition to ≤2080
   partials, so the shuffle is constant-size; the corpus is scanned
   once.  This is the only pass that touches the data.
2. **Driver eig**: the d×d symmetric matrix is driver-sized by
   construction; numpy's ``eigh`` on 64×64 is microseconds.  The
   eigenvectors broadcast back for projection (a pure per-row map).

Cross-engine determinism — same discipline as ``operators/lm.py``:
embeddings are quantized to integer millionths (``round(x*1e6)`` of the
exact float→double widening; both engines round halves identically on
identical doubles), so gramian cells are exact int64 sums, and the
final descale is one IEEE division of identical integers.  The 1e-6
quantum is far below float32's own resolution for unit-scale
embeddings, so this loses nothing real.

Overflow bound: unit-magnitude coordinates quantize to ~2^20, so each
product is ~2^40 and an int64 cell sum is exact up to ~2^23 ≈ 8M rows
of worst-case coordinates (typical unit-*norm* embeddings spread mass
across dims, stretching this by ~d).  Beyond that row count, accumulate
cells as ``DECIMAL(38,0)`` — still exact and order-independent, same
shuffle shape — before the one final descale.  The same bound applies
to ``similarity.label_prototype_outliers``'s (label, dim) sums.

Reference scope check: /root/reference/query.go:193 (hash/agg scalar
surface only) — no overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.canonical import DIALECT_SPARK
from pgverify_spark.operators.util import barrier as _barrier

#: Quantization scale: embedding values become integer millionths.
Q_SCALE = 1_000_000

EMBEDDING_DIM = 64


def gramian(df: DataFrame, vec_col: str = "embedding", dim: int = EMBEDDING_DIM) -> DataFrame:
    """Upper-triangle gramian of the quantized embeddings:
    (gi, gj, g) for 1 <= gi <= gj <= dim, where
    ``g = Σ_rows q_gi * q_gj / 1e12`` rounded to 6 decimals.

    Scale shape: the in-row projection emits one 2080-struct array per
    row (quantize once into a 64-int array, multiply pairs); after the
    explode the aggregation is a constant-cardinality groupBy with
    map-side combine — the shuffle carries ≤2080 rows per partition
    whatever the corpus size.  The barrier before the explode prevents
    Catalyst from re-inlining the quantization into every generator
    output (same pathology as dedup's ``_shingled``).
    """
    q = f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT))"
    cells = (
        f"flatten(transform(sequence(1, {dim}), i -> "
        f"transform(sequence(i, {dim}), j -> "
        "struct(i AS gi, j AS gj, element_at(qv, i) * element_at(qv, j) AS p))))"
    )
    return (
        _barrier(df.selectExpr(f"{q} AS qv"))
        .selectExpr(f"explode({cells}) AS c")
        .selectExpr("c.gi AS gi", "c.gj AS gj", "c.p AS p")
        .groupBy("gi", "gj")
        .agg(F.sum("p").alias("psum"))
        .selectExpr(
            "gi",
            "gj",
            f"round(CAST(psum AS DOUBLE) / {Q_SCALE}.0 / {Q_SCALE}.0, 6) AS g",
        )
    )


def gramian_oracle_sql(table: str, vec_col: str = "embedding", dim: int = EMBEDDING_DIM) -> str:
    return (
        f"WITH qv AS (SELECT list_transform({vec_col}, "
        f"x -> CAST(round(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT)) AS qv FROM {table}), "
        f"cells AS (SELECT unnest(flatten(list_transform(range(1, {dim + 1}), i -> "
        f"list_transform(range(i, {dim + 1}), j -> "
        "{'gi': i, 'gj': j, 'p': qv[i] * qv[j]})))) AS c FROM qv) "
        "SELECT c.gi AS gi, c.gj AS gj, "
        f"round(CAST(sum(c.p) AS DOUBLE) / {Q_SCALE}.0 / {Q_SCALE}.0, 6) AS g "
        "FROM cells GROUP BY 1, 2"
    )


def pca_components(gram_df: DataFrame, k: int = 8, dim: int = EMBEDDING_DIM):
    """Top-``k`` principal directions from a :func:`gramian` result.

    Driver-side by design: the gramian is d×d whatever the corpus size,
    so the eigendecomposition is the one step that does NOT need the
    cluster.  Returns (eigenvalues desc, components) as plain Python
    lists — components[r] is the r-th unit-norm direction, sign-fixed
    so the largest-magnitude coordinate is positive (eigh's sign is
    otherwise arbitrary).

    Note: this is PCA of the *uncentered* second-moment matrix (the
    gramian); center the embedding column upstream if mean-centered PCA
    is wanted — at scale that is one ``avg`` per dimension and a
    subtract, and the gramian pass is unchanged.
    """
    import numpy as np

    g = np.zeros((dim, dim))
    for r in gram_df.collect():  # ≤ d(d+1)/2 rows — driver-sized always
        g[r["gi"] - 1, r["gj"] - 1] = r["g"]
        g[r["gj"] - 1, r["gi"] - 1] = r["g"]
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if abs(v.min()) > abs(v.max()):
            v = -v
        comps.append([float(x) for x in v])
    return [float(vals[i]) for i in order], comps


def pca_project(df: DataFrame, components, vec_col: str = "embedding") -> DataFrame:
    """Project embeddings onto the given components: (vec_id, pc array).

    Pure per-row codegen arithmetic (explicit dot products against
    literal vectors), zero exchanges — same shape as
    ``similarity.random_project``."""
    from pgverify_spark.operators.similarity import _dot_literal_sql

    dims = [
        f"round({_dot_literal_sql(vec_col, comp, DIALECT_SPARK)}, 6)"
        for comp in components
    ]
    return df.selectExpr("vec_id", f"array({', '.join(dims)}) AS pc")
