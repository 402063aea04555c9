"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

Beyond-reference extension of the STORAGE side: the reference never
writes data; this engine's own snapshot/index artifacts do, and at
100 TB the dominant read cost is how much of the table a selective
scan must touch.  Sorting a table by one column gives file/row-group
min-max pruning on that column only; interleaving the bits of TWO (or
more) quantized columns into one sort key — the Morton / Z-order curve
(Morton 1966; the layout behind Delta Lake's ``OPTIMIZE ZORDER BY``)
— clusters rows so that EVERY interleaved column has narrow value
ranges per file, and a conjunctive box predicate prunes on all of them
at once from ordinary parquet footer statistics.  No reader changes:
the curve exists only at write time.

Key construction (dual-dialect, deterministic):

1. quantize each column to ``bits`` levels over its [min, max]:
   ``q = floor((x - min) * (2^bits - 1) / (max - min))`` — pure IEEE
   double arithmetic + floor, bit-identical in Spark and DuckDB (the
   bounds ride in as literals or a broadcast 1-row relation);
2. interleave: bit ``b`` of column ``i`` lands at position
   ``b * ncols + i`` — a sum of ``bits x ncols`` shift/mask terms,
   all BIGINT ops.

Scale shape of :func:`write_zordered`: one 1-row bounds aggregate, one
range shuffle on the key (Spark's repartitionByRange samples
boundaries, so output files are balanced even under skew), an
in-partition sort, and the write.  Pruning effectiveness is asserted
from real parquet row-group statistics in ``tests/test_zorder.py``
rather than claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.canonical import DIALECT_SPARK
from pgverify_spark.functions.text_exprs import _shr


def _shl(x: str, n: int, dialect: str) -> str:
    """Dialect twin of text_exprs._shr (which is shared, not duplicated
    here) for the left shift text_exprs does not need."""
    return f"shiftleft({x}, {n})" if dialect == DIALECT_SPARK else f"({x} << {n})"


def quantize_sql(col: str, min_ref: str, max_ref: str, bits: int) -> str:
    """``floor((col - min) * (2^bits - 1) / (max - min))`` clamped to
    [0, 2^bits - 1]; a constant column (min == max) quantizes to 0.
    All-double arithmetic then one floor — identical bits cross-engine.
    """
    levels = (1 << bits) - 1
    q = (
        f"CAST(floor((CAST({col} AS DOUBLE) - {min_ref}) * {levels}.0 "
        f"/ ({max_ref} - {min_ref})) AS BIGINT)"
    )
    return (
        f"CASE WHEN {max_ref} = {min_ref} THEN CAST(0 AS BIGINT) "
        f"ELSE least(greatest({q}, CAST(0 AS BIGINT)), CAST({levels} AS BIGINT)) END"
    )


def interleave_sql(qcols: list[str], bits: int, dialect: str) -> str:
    """Morton interleave of pre-quantized BIGINT expressions: bit ``b``
    of ``qcols[i]`` -> key bit ``b * len(qcols) + i``."""
    n = len(qcols)
    terms = [
        _shl(f"({_shr(q, b, dialect)} & 1)", b * n + i, dialect)
        for b in range(bits)
        for i, q in enumerate(qcols)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_key_sql(
    cols: list[str], bounds: dict[str, tuple[str, str]], bits: int, dialect: str
) -> str:
    """The full z-key expression over raw columns; ``bounds[col]`` are
    the (min_ref, max_ref) SQL references (literals, or columns of a
    broadcast 1-row bounds relation)."""
    qs = [
        quantize_sql(c, bounds[c][0], bounds[c][1], bits) for c in cols
    ]
    return interleave_sql(qs, bits, dialect)


def bounds_exprs(cols: list[str]) -> list:
    """The 1-row bounds aggregate's columns: min/max per z-column as
    DOUBLE (`zmin_<c>` / `zmax_<c>`)."""
    out = []
    for c in cols:
        out.append(F.expr(f"CAST(min({c}) AS DOUBLE)").alias(f"zmin_{c}"))
        out.append(F.expr(f"CAST(max({c}) AS DOUBLE)").alias(f"zmax_{c}"))
    return out


def with_zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """``df`` plus a ``zkey`` column.  The bounds ride in through a
    broadcast 1-row cross join — two scans total (bounds + keying), the
    unavoidable minimum for data-dependent quantization."""
    b = df.groupBy().agg(*bounds_exprs(cols))
    bounds = {c: (f"zmin_{c}", f"zmax_{c}") for c in cols}
    key = zorder_key_sql(cols, bounds, bits, DIALECT_SPARK)
    return (
        df.crossJoin(F.broadcast(b))
        .selectExpr("*", f"{key} AS zkey")
        .drop(*[x for c in cols for x in (f"zmin_{c}", f"zmax_{c}")])
    )


def equidepth_quantize_exprs(df: DataFrame, cols: list[str], bits: int) -> list[str]:
    """Equi-depth (percentile-boundary) quantization expressions: level
    = number of the column's 2^bits - 1 approx-percentile boundaries
    below the value.  Linear min/max quantization collapses under heavy
    tails (measured: a 5%-wide predicate on testdata's ``value`` —
    p95 = 147 of max 490 — matched 14/16 z-ordered files linear,
    6/16 equi-depth), so this is the layout default; it is WRITE-path
    only (approx_percentile is not cross-engine deterministic, which is
    why the certified ``zorder_key_events`` twin uses the linear form).
    One extra pass over ``cols`` computes all boundary vectors."""
    levels = 1 << bits
    probs = ", ".join(str(i / levels) for i in range(1, levels))
    row = df.selectExpr(
        *(
            f"approx_percentile(CAST({c} AS DOUBLE), array({probs})) AS b_{i}"
            for i, c in enumerate(cols)
        )
    ).first()
    out = []
    for i, c in enumerate(cols):
        bnd = row[f"b_{i}"]
        if bnd is None:  # empty input / all-NULL column: constant level,
            out.append("CAST(0 AS BIGINT)")  # matching the linear guard
            continue
        arr = "array(" + ", ".join(repr(float(x)) for x in bnd) + ")"
        out.append(
            f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> "
            f"acc + IF(CAST({c} AS DOUBLE) > x, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"
        )
    return out


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 8,
    files: int | None = None,
    quantize: str = "equidepth",
) -> None:
    """Materialize ``df`` parquet clustered on the Morton curve of
    ``cols``: range-partition + sort on ``zkey`` (boundaries come from
    Spark's range sampling, so files stay balanced even under skew),
    write, key column dropped — the layout is invisible to readers
    except through footer min/max statistics, which is the point.

    ``quantize``: ``"equidepth"`` (default — robust to heavy-tailed
    columns, see :func:`equidepth_quantize_exprs`) or ``"linear"``
    (the certified-twin form; fine for uniform keys)."""
    if quantize == "equidepth":
        qs = equidepth_quantize_exprs(df, cols, bits)
        # project each quantize fold ONCE, interleave over the column
        # references: aggregate() is a CodegenFallback higher-order
        # function, so inlining the (2^bits - 1)-element fold into all
        # `bits` bit terms would evaluate it bits x per row (~8x wasted
        # CPU at bits=8, and the SQL text grows as bits x 2^bits)
        qcols = [f"_zq{i}" for i in range(len(cols))]
        keyed = (
            df.selectExpr("*", *(f"{q} AS {n}" for q, n in zip(qs, qcols)))
            .selectExpr(
                "*", f"{interleave_sql(qcols, bits, DIALECT_SPARK)} AS zkey"
            )
            .drop(*qcols)
        )
    elif quantize == "linear":
        keyed = with_zorder_key(df, cols, bits)
    else:
        raise ValueError(f"quantize must be 'equidepth' or 'linear', got {quantize!r}")
    n = files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
