"""Int8 embedding quantization + quantized similarity search.

Beyond-reference extension: at 100 TB an ``array<float>`` embedding
column is the storage *and* shuffle bottleneck of every similarity
pass; per-vector max-abs int8 quantization cuts it 4x (and the dot
product becomes integer arithmetic, which SIMDs better than float on
both engines).  This module is the standard scalar-quantization recipe:

- :func:`quantize_int8` — per-vector: ``scale = max(|x|)``, each
  component rounded to ``x / scale * 127`` in int8 range.
- :func:`quantized_topk` — top-k by *quantized* cosine.  The per-vector
  scales cancel out of the cosine ratio, so the score is
  ``qdot / sqrt(qnorm_a * qnorm_b)`` over pure BIGINT dot products —
  integer arithmetic end-to-end until one final double division, which
  is why the result is bit-identical in Spark and DuckDB (a float
  pipeline would drift in the last ulps between engines).

Recall vs the exact float top-k is asserted in tests (≥ 0.8 at k=10 on
the testdata) — quantization is lossy by design; the point is the 4x.

Scale shape: quantization is a single embarrassing-parallel projection
(no shuffle); the search mirrors ``similarity.cosine_topk`` — query
side broadcast, corpus scanned once, per-query top-k window.  The
``scale`` binding uses a one-element-array lambda
(``transform(array(max_abs), s -> ...)``) so Catalyst's
CollapseProject cannot inline the max-abs computation into all 64
element lambdas — one evaluation per row, no optimization barrier
(= no shuffle) needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgverify_spark.functions.canonical import DIALECT_DUCKDB, DIALECT_SPARK


def _max_abs(vec: str, dialect: str) -> str:
    if dialect == DIALECT_SPARK:
        return f"array_max(transform({vec}, x -> abs(CAST(x AS DOUBLE))))"
    return f"list_max(list_transform({vec}, x -> abs(CAST(x AS DOUBLE))))"


def quantized_sql(vec: str, dialect: str) -> str:
    """Int8 quantized vector; zero vectors quantize to all-zero."""
    body = (
        f"CASE WHEN s = 0 THEN 0 ELSE "
        f"CAST(round(CAST(x AS DOUBLE) / s * 127.0) AS INT) END"
    )
    if dialect == DIALECT_SPARK:
        return (
            f"transform(array({_max_abs(vec, dialect)}), "
            f"s -> transform({vec}, x -> {body}))[0]"
        )
    return (
        f"list_transform([{_max_abs(vec, dialect)}], "
        f"s -> list_transform({vec}, x -> {body}))[1]"
    )


def _int_dot(a: str, b: str, dialect: str) -> str:
    """BIGINT dot product of two int vectors (exact in both engines)."""
    if dialect == DIALECT_SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * y), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    return (
        f"CAST(list_aggregate(list_transform(list_zip({a}, {b}), "
        "s -> CAST(s[1] AS BIGINT) * s[2]), 'sum') AS BIGINT)"
    )


def quantize_int8(df: DataFrame) -> DataFrame:
    """(vec_id, scale, qvec, qnorm2): int8 vector + its own squared norm
    (carried so the search never recomputes it per candidate pair)."""
    return df.selectExpr(
        "vec_id",
        f"round({_max_abs('embedding', DIALECT_SPARK)}, 6) AS scale",
        f"{quantized_sql('embedding', DIALECT_SPARK)} AS qvec",
    ).selectExpr(
        "vec_id", "scale", "qvec", f"{_int_dot('qvec', 'qvec', DIALECT_SPARK)} AS qnorm2"
    )


def quantize_int8_oracle_sql(table: str) -> str:
    q = quantized_sql("embedding", DIALECT_DUCKDB)
    return (
        f"WITH b AS (SELECT vec_id, round({_max_abs('embedding', DIALECT_DUCKDB)}, 6) AS scale, "
        f"{q} AS qvec FROM {table}) "
        f"SELECT vec_id, scale, qvec, {_int_dot('qvec', 'qvec', DIALECT_DUCKDB)} AS qnorm2 FROM b"
    )


def quantized_topk(df: DataFrame, query_ids: tuple[int, ...], k: int = 10) -> DataFrame:
    """Top-k by quantized cosine: (query_id, vec_id, qcosine, rank).

    ``qcosine = qdot / sqrt(qnorm2_q * qnorm2_c)`` — scales cancel, see
    module docstring; ties broken by vec_id.
    """
    qz = quantize_int8(df).select("vec_id", "qvec", "qnorm2")
    ids = ", ".join(map(str, query_ids))
    q = qz.filter(f"vec_id IN ({ids})").selectExpr(
        "vec_id AS query_id", "qvec AS q_qvec", "qnorm2 AS q_norm2"
    )
    dot = _int_dot("q_qvec", "qvec", DIALECT_SPARK)
    scored = (
        qz.crossJoin(F.broadcast(q))
        .filter("vec_id <> query_id")
        .selectExpr(
            "query_id",
            "vec_id",
            f"round({dot} / sqrt(CAST(q_norm2 AS DOUBLE) * qnorm2), 6) AS qcosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(f"rank <= {k}")
        .select("query_id", "vec_id", "qcosine", "rank")
    )


def quantized_topk_oracle_sql(table: str, query_ids: tuple[int, ...], k: int = 10) -> str:
    ids = ", ".join(map(str, query_ids))
    d = DIALECT_DUCKDB
    dot = _int_dot("q.qvec", "c.qvec", d)
    return (
        f"WITH qz AS (SELECT vec_id, {quantized_sql('embedding', d)} AS qvec FROM {table}), "
        f"qn AS (SELECT vec_id, qvec, {_int_dot('qvec', 'qvec', d)} AS qnorm2 FROM qz) "
        "SELECT query_id, vec_id, qcosine, rank FROM ("
        f"SELECT q.vec_id AS query_id, c.vec_id AS vec_id, "
        f"round({dot} / sqrt(CAST(q.qnorm2 AS DOUBLE) * c.qnorm2), 6) AS qcosine, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        f"round({dot} / sqrt(CAST(q.qnorm2 AS DOUBLE) * c.qnorm2), 6) DESC, c.vec_id ASC) AS rank "
        f"FROM qn q JOIN qn c ON c.vec_id <> q.vec_id WHERE q.vec_id IN ({ids})) t "
        f"WHERE rank <= {k}"
    )
