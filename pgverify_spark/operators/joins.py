"""Skew-mitigated join strategies.

Beyond-reference extension: at 100 TB the failure mode of a big-big
shuffle join is one hot key landing on one reducer.  AQE's skew-join
split handles *moderately* skewed sort-merge joins automatically
(enabled in ``session.TUNING_CONFS``); **salting** is the explicit
version you reach for when a key is so hot that even a split partition
is a straggler, or when the engine's heuristics don't fire (e.g. the
skew only appears after a filter).

:func:`salted_join` implements the standard construction: the large
(skewed) side gets a deterministic salt in ``0..salt-1`` derived from a
*non-key* column hash, the small-but-not-broadcastable side is
replicated ``salt`` times (``explode(sequence(...))``), and the
equi-join runs on ``(key, salt)`` — the hot key's rows now spread over
``salt`` reducers.  Row-for-row equal to the plain join by
construction (every left row meets exactly the one replica carrying its
salt), which the oracle pair and tests assert.

Trade-off: the replicated side shuffles ``salt`` times more bytes —
pick ``salt`` ~ the hot key's multiple of a healthy partition, not
"big".  Salting composes with, not replaces, the broadcast escape (a
dimension that *fits* in memory should broadcast instead; see
``registry`` — this demo joins lineitem to orders, where neither side
broadcasts at real scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` (large, possibly skewed on ``on``) to ``right``
    (smaller, replicated) with an explicit ``salt``-way key spread.

    The salt must vary *within* a hot key (that is the whole point), so
    it hashes the full left row (``xxhash64`` over all columns) rather
    than the key — deterministic (replayable plans, no RNG) yet uniform
    across a hot key's rows.  Output columns = left columns + right
    columns minus the join key duplicate, exactly like
    ``left.join(right, on, how)``.
    """
    if how != "inner":
        raise ValueError("salted_join demo supports inner joins")
    lcols = left.columns
    salted_l = left.withColumn(
        "_salt", (F.abs(F.xxhash64(*[F.col(c) for c in lcols])) % salt).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out_cols = lcols + [c for c in right.columns if c != on]
    return salted_l.join(salted_r, [on, "_salt"], "inner").select(*out_cols)
