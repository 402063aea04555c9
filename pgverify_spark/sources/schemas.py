"""Table schema registry + Spark-type → logical-type mapping.

The reference introspects schemas dynamically from
``information_schema.columns`` per table (``query.go:104-118``,
``verify.go:152-198``); for file sources there is no information_schema,
so the engine derives logical types from the Spark schema at load time
(`logical_types`) and carries primary keys as explicit per-table config
(the reference reads PK constraints from ``key_column_usage`` —
``query.go:108-115`` — which files don't have).

``TESTDATA_TABLES`` is the static registry for the driver's synthetic
star schema (TESTDATA.md / FIXTURES.md §5); static so that oracle SQL can
be generated without a live SparkSession.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class TableSchema:
    name: str
    cols: tuple[tuple[str, str], ...]  # (column, logical type) in table order
    pk: tuple[str, ...]

    def pk_cols(self) -> list[tuple[str, str]]:
        tmap = dict(self.cols)
        return [(c, tmap[c]) for c in self.pk]

    def hashed_cols(self, valid=lambda c: True) -> list[tuple[str, str]]:
        return [(c, t) for c, t in self.cols if valid(c)]


def _t(name: str, pk: list[str], cols: list[tuple[str, str]]) -> TableSchema:
    return TableSchema(name, tuple(cols), tuple(pk))


#: Driver-generated testdata (seed 42).  ``events.ts`` is parquet
#: TIMESTAMP(MICROS) (non-UTC-adjusted): ``timestamp_ntz`` in Spark 4,
#: naive TIMESTAMP in DuckDB.  (``timestamp_ns`` remains a supported
#: logical type for TIMESTAMP(NANOS) sources — bigint nanos in Spark via
#: nanosAsLong, TIMESTAMP_NS in DuckDB — exercised by the
#: nanos-fixture tests.)  PKs per FIXTURES.md §5; note sf testdata's lineitem
#: (l_orderkey, l_linenumber) is NOT unique, so fingerprint ordering
#: tie-breaks on the row hash.
TESTDATA_TABLES: dict[str, TableSchema] = {
    t.name: t
    for t in [
        _t("region", ["r_regionkey"], [("r_regionkey", "int"), ("r_name", "string")]),
        _t(
            "nation",
            ["n_nationkey"],
            [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
        ),
        _t(
            "customer",
            ["c_custkey"],
            [
                ("c_custkey", "bigint"),
                ("c_name", "string"),
                ("c_nationkey", "int"),
                ("c_acctbal", "double"),
                ("c_mktsegment", "string"),
            ],
        ),
        _t(
            "supplier",
            ["s_suppkey"],
            [
                ("s_suppkey", "bigint"),
                ("s_name", "string"),
                ("s_nationkey", "int"),
                ("s_acctbal", "double"),
            ],
        ),
        _t(
            "part",
            ["p_partkey"],
            [
                ("p_partkey", "bigint"),
                ("p_name", "string"),
                ("p_brand", "string"),
                ("p_type", "string"),
                ("p_size", "int"),
                ("p_retailprice", "double"),
            ],
        ),
        _t(
            "orders",
            ["o_orderkey"],
            [
                ("o_orderkey", "bigint"),
                ("o_custkey", "bigint"),
                ("o_orderstatus", "string"),
                ("o_totalprice", "double"),
                ("o_orderdate", "timestamp"),
                ("o_orderpriority", "string"),
            ],
        ),
        _t(
            "lineitem",
            ["l_orderkey", "l_linenumber"],
            [
                ("l_orderkey", "bigint"),
                ("l_partkey", "bigint"),
                ("l_suppkey", "bigint"),
                ("l_linenumber", "int"),
                ("l_quantity", "double"),
                ("l_extendedprice", "double"),
                ("l_discount", "double"),
                ("l_tax", "double"),
                ("l_returnflag", "string"),
                ("l_linestatus", "string"),
                ("l_shipdate", "timestamp"),
            ],
        ),
        _t(
            "events",
            ["event_id"],
            [
                ("event_id", "bigint"),
                ("ts", "timestamp_ntz"),
                ("user_id", "bigint"),
                ("event_type", "string"),
                ("value", "double"),
                ("props", "string"),
            ],
        ),
        _t(
            "documents",
            ["doc_id"],
            [
                ("doc_id", "bigint"),
                ("text", "string"),
                ("lang", "string"),
                ("source", "string"),
                ("n_chars", "bigint"),
            ],
        ),
        _t(
            "embeddings",
            ["vec_id"],
            [("vec_id", "bigint"), ("embedding", "array<float>"), ("label", "int")],
        ),
    ]
}

_ATOMIC = {
    T.BooleanType: "boolean",
    T.ByteType: "tinyint",
    T.ShortType: "smallint",
    T.IntegerType: "int",
    T.LongType: "bigint",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.DateType: "date",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp_ntz",
    T.BinaryType: "binary",
}


def _logical(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.ArrayType):
        return f"array<{_logical(dt.elementType)}>"
    for cls, name in _ATOMIC.items():
        if isinstance(dt, cls):
            return name
    raise TypeError(f"unsupported column type for canonicalization: {dt}")


def logical_types(df: DataFrame, ns_hint_cols: tuple[str, ...] = ("ts",)) -> list[tuple[str, str]]:
    """Logical (name, type) pairs for a DataFrame, in schema order.

    ``ns_hint_cols``: bigint columns known to be nanosAsLong-read
    TIMESTAMP(NANOS) parquet columns (Spark erases that distinction).
    """
    out = []
    for f in df.schema.fields:
        lt = _logical(f.dataType)
        if lt == "bigint" and f.name in ns_hint_cols:
            lt = "timestamp_ns"
        out.append((f.name, lt))
    return out


def schema_diff(left: TableSchema, right: TableSchema) -> list[tuple[str, str | None, str | None, str]]:
    """Column-level schema drift between two targets' views of a table:
    ``(column, left_type, right_type, status)`` with status in
    ``only_left`` / ``only_right`` / ``type_mismatch``; identical
    columns are omitted.  Ordered by column name.

    The pre-flight check before any data compare: a fingerprint mismatch
    on a retyped or dropped column is noise — this names the structural
    drift first, the way the reference's per-column type mapping gates
    its hash query generation (``column.go:17-45``: an unknown or
    changed type alters the canonical expression, so schema drift MUST
    surface before row hashing is meaningful).  Driver-side metadata
    only — no Spark job.
    """
    lt, rt = dict(left.cols), dict(right.cols)
    out: list[tuple[str, str | None, str | None, str]] = []
    for c in sorted(set(lt) | set(rt)):
        if c not in rt:
            out.append((c, lt[c], None, "only_left"))
        elif c not in lt:
            out.append((c, None, rt[c], "only_right"))
        elif lt[c] != rt[c]:
            out.append((c, lt[c], rt[c], "type_mismatch"))
    return out
