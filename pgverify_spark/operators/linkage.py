"""Record linkage: blocked fuzzy join on a name/string column.

Beyond-reference extension: entity resolution ("are these two records
the same real-world thing?") is the classic data-cleaning join, and the
naive formulation — ``levenshtein`` over the full cross product — is
O(n²) edit-distance evaluations.  The standard scale formulation is
**blocking**: only records sharing a cheap block key (here: a name
token) become candidates, and the expensive distance runs on candidates
only.

Scale shape (same as ``dedup.minhash_lsh_pairs``): explode to (id,
token) — the inverted index; self-join on token with ``id1 < id2`` for
the candidate set, **ids only** so the shuffle carries two bigints per
candidate; distinct; then one join back to the names relation per side
and the levenshtein filter.  Cost is O(Σ block_freq²), so the same
hot-key hazard as n-gram Jaccard applies: ``max_block_freq`` drops
stopword-like blocks (a token appearing in >N records discriminates
nothing and would contribute N² candidates); at 100 TB you always set
it.  Levenshtein itself is integer dynamic programming — identical by
definition in Spark and DuckDB, which is what makes the operator
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    max_block_freq: int | None = None,
) -> DataFrame:
    """Pairs (id1, id2, name1, name2, lev, sim) with edit distance <=
    ``max_dist``, candidates blocked on shared whitespace tokens.

    ``sim`` = 1 - lev / max(len) rounded to 1e-6 — a normalized
    similarity in (0, 1] so thresholds are length-independent.
    """
    toks = df.selectExpr(
        f"{id_col} AS rid", f"explode(array_distinct(split({name_col}, ' '))) AS tok"
    ).filter("tok != ''")
    if max_block_freq is not None:
        hot = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("bf")).filter(
            F.col("bf") > max_block_freq
        )
        toks = toks.join(F.broadcast(hot.select("tok")), "tok", "left_anti")
    cands = (
        toks.alias("a")
        .join(toks.alias("b"), "tok")
        .filter("a.rid < b.rid")
        .selectExpr("a.rid AS id1", "b.rid AS id2")
        .distinct()
    )
    names = df.selectExpr(f"{id_col} AS rid", f"{name_col} AS nm")
    return (
        cands.join(names.selectExpr("rid AS id1", "nm AS name1"), "id1")
        .join(names.selectExpr("rid AS id2", "nm AS name2"), "id2")
        .withColumn("lev", F.levenshtein("name1", "name2"))
        .filter(F.col("lev") <= max_dist)
        .selectExpr(
            "id1",
            "id2",
            "name1",
            "name2",
            "lev",
            "round(1.0 - lev / greatest(length(name1), length(name2)), 6) AS sim",
        )
    )


def fuzzy_join_pairs_oracle_sql(
    table: str,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    max_block_freq: int | None = None,
    where: str | None = None,
) -> str:
    base = f"SELECT {id_col} AS rid, {name_col} AS nm FROM {table}" + (
        f" WHERE {where}" if where else ""
    )
    toks = (
        "SELECT DISTINCT rid, tok FROM "
        "(SELECT rid, unnest(string_split(nm, ' ')) AS tok FROM base) u WHERE tok != ''"
    )
    cap = (
        ""
        if max_block_freq is None
        else f", hot AS (SELECT tok FROM t GROUP BY tok HAVING count(*) > {max_block_freq})"
    )
    tok_src = (
        "t"
        if max_block_freq is None
        else "(SELECT * FROM t WHERE tok NOT IN (SELECT tok FROM hot))"
    )
    return (
        f"WITH base AS ({base}), t AS ({toks}){cap}, "
        f"c AS (SELECT DISTINCT a.rid AS id1, b.rid AS id2 "
        f"FROM {tok_src} a JOIN {tok_src} b "
        "ON a.tok = b.tok AND a.rid < b.rid) "
        "SELECT id1, id2, n1.nm AS name1, n2.nm AS name2, "
        "levenshtein(n1.nm, n2.nm) AS lev, "
        "round(1.0 - levenshtein(n1.nm, n2.nm) / greatest(length(n1.nm), length(n2.nm)), 6) AS sim "
        "FROM c JOIN base n1 ON c.id1 = n1.rid JOIN base n2 ON c.id2 = n2.rid "
        f"WHERE levenshtein(n1.nm, n2.nm) <= {max_dist}"
    )
