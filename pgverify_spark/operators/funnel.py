"""Funnel analysis over event streams: ordered step progression.

Beyond-reference extension (the reference is strictly batch-relational
verification, SURVEY.md §1.4): the classic product-analytics question —
of the users who did step 1, how many went on to do step 2 *after* it,
then step 3 after that — per-user **ordered** sequence matching, not a
per-type count.

Scale shape (Spark side): pre-filter to funnel event types at the scan
(predicate pushdown), one hash shuffle on ``user_id``, then the
progression is computed *inside each group* by sorting the user's own
events and folding them with a higher-order ``aggregate`` — no window
function, no self-join, no second shuffle.  Per-group state is that
user's funnel events only; a pathological user with millions of events
would cap via ``slice`` after sort (the fold only ever advances
``len(steps)`` times).  The DuckDB oracle states the same semantics
relationally: chained ``min(ts)`` joins, each step's timestamp strictly
greater than the previous step's.

The two formulations agree exactly because stage advancement depends
only on (epoch-microsecond, event_type): the fold advances at the first
qualifying event in time order, which is precisely ``min(ts)`` among
qualifying events.  Timestamps compare at microsecond precision on both
sides (``functions.timecol`` on the Spark side; DuckDB's ``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.timecol import epoch_us_sql

#: Default funnel: the natural view -> click -> purchase progression.
DEFAULT_STEPS = ("view", "click", "purchase")

_MIN_LONG = -9223372036854775808


def _fold_expr(steps: tuple[str, ...], max_gap_us: int | None) -> str:
    """SQL for folding a us-sorted event array into the max stage reached."""
    body = "acc"
    # Build innermost-else-first so step 1 is the outermost IF.
    for i in range(len(steps) - 1, -1, -1):
        et = steps[i].replace("'", "''")
        gap = "" if max_gap_us is None or i == 0 else f" AND e.us - acc.ts <= {max_gap_us}"
        body = (
            f"IF(acc.stage = {i} AND e.et = '{et}' AND e.us > acc.ts{gap}, "
            f"named_struct('stage', {i + 1}, 'ts', e.us), {body})"
        )
    return (
        "aggregate(array_sort(evs), "
        f"named_struct('stage', 0, 'ts', CAST({_MIN_LONG} AS BIGINT)), "
        f"(acc, e) -> {body}, acc -> acc.stage)"
    )


def funnel(
    df: DataFrame,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    max_gap_us: int | None = None,
) -> DataFrame:
    """Per-step funnel: (step, step_name, n_users, conversion).

    ``n_users`` = users whose ordered event history contains the first
    ``step`` funnel events in sequence (strictly increasing microsecond
    timestamps, each within ``max_gap_us`` of the previous step when
    set); ``conversion`` = n_users / previous step's n_users (step 1
    converts from itself, i.e. 1.0 when non-empty).

    Semantics are *anchored at earliest occurrence*: step k's timestamp
    is the minimum qualifying time after the (already fixed) step k-1
    time — the fold never backtracks, which is exactly what the chained
    min-joins in the oracle compute.  (A backtracking "any subsequence"
    windowed funnel is a different, NP-ish semantics; product funnels
    use the anchored form.)
    """
    quoted = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    per_user = (
        df.filter(f"event_type IN ({quoted})")
        .selectExpr(
            "user_id",
            f"{epoch_us_sql(df)} AS us",
            "event_type AS et",
        )
        .groupBy("user_id")
        .agg(F.expr("collect_list(struct(us, et))").alias("evs"))
        .selectExpr(f"{_fold_expr(steps, max_gap_us)} AS stage")
    )
    counts = per_user.agg(
        *[
            F.sum((F.col("stage") >= i + 1).cast("long")).alias(f"n{i + 1}")
            for i in range(len(steps))
        ]
    )
    rows = []
    for i, name in enumerate(steps):
        prev = "n1" if i == 0 else f"n{i}"
        conv = (
            f"CASE WHEN n1 > 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
            if i == 0
            else f"coalesce(round(CAST(n{i + 1} AS DOUBLE) / nullif({prev}, 0), 6), CAST(0.0 AS DOUBLE))"
        )
        rows.append(
            f"named_struct('step', {i + 1}, 'step_name', '{name}', "
            f"'n_users', coalesce(n{i + 1}, CAST(0 AS BIGINT)), 'conversion', {conv})"
        )
    return counts.selectExpr(f"inline(array({', '.join(rows)}))")


def funnel_oracle_sql(
    table: str,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    max_gap_us: int | None = None,
) -> str:
    """DuckDB twin: chained strictly-increasing min-timestamp joins."""
    ctes = [
        f"s1 AS (SELECT user_id, min(CAST(epoch_us(ts) AS BIGINT)) AS t1 "
        f"FROM {table} WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        gap = (
            ""
            if max_gap_us is None
            else f"AND CAST(epoch_us(e.ts) AS BIGINT) - s{i}.t{i} <= {max_gap_us} "
        )
        ctes.append(
            f"s{i + 1} AS (SELECT e.user_id, min(CAST(epoch_us(e.ts) AS BIGINT)) AS t{i + 1} "
            f"FROM {table} e JOIN s{i} ON e.user_id = s{i}.user_id "
            f"WHERE e.event_type = '{steps[i]}' AND CAST(epoch_us(e.ts) AS BIGINT) > s{i}.t{i} {gap}"
            f"GROUP BY e.user_id)"
        )
    ctes.append(
        "c AS (SELECT "
        + ", ".join(f"(SELECT count(*) FROM s{i + 1}) AS n{i + 1}" for i in range(len(steps)))
        + ")"
    )
    selects = []
    for i, name in enumerate(steps):
        conv = (
            "CASE WHEN n1 > 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
            if i == 0
            else f"coalesce(round(CAST(n{i + 1} AS DOUBLE) / nullif(n{i}, 0), 6), CAST(0.0 AS DOUBLE))"
        )
        selects.append(
            f"SELECT {i + 1} AS step, '{name}' AS step_name, "
            f"CAST(n{i + 1} AS BIGINT) AS n_users, {conv} AS conversion FROM c"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def _fold_times_expr(steps: tuple[str, ...], max_gap_us: int | None) -> str:
    """Fold variant carrying each reached step's timestamp: final value
    is a struct (stage, t1..tn) — t_k = the anchored time step k was
    reached, MIN_LONG when never reached."""
    n = len(steps)

    def t_fields(advance_to: int) -> str:
        return ", ".join(
            f"'t{j}', " + ("e.us" if j == advance_to else f"acc.t{j}")
            for j in range(1, n + 1)
        )

    body = "acc"
    for i in range(n - 1, -1, -1):
        et = steps[i].replace("'", "''")
        gap = "" if max_gap_us is None or i == 0 else f" AND e.us - acc.ts <= {max_gap_us}"
        body = (
            f"IF(acc.stage = {i} AND e.et = '{et}' AND e.us > acc.ts{gap}, "
            f"named_struct('stage', {i + 1}, 'ts', e.us, {t_fields(i + 1)}), {body})"
        )
    init_ts = ", ".join(f"'t{j}', CAST({_MIN_LONG} AS BIGINT)" for j in range(1, n + 1))
    return (
        "aggregate(array_sort(evs), "
        f"named_struct('stage', 0, 'ts', CAST({_MIN_LONG} AS BIGINT), {init_ts}), "
        f"(acc, e) -> {body}, "
        "acc -> named_struct('stage', acc.stage, "
        + ", ".join(f"'t{j}', acc.t{j}" for j in range(1, n + 1))
        + "))"
    )


def funnel_latency(
    df: DataFrame,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    max_gap_us: int | None = None,
) -> DataFrame:
    """Conversion LATENCY per funnel transition: for users who reached
    step k+1, how long after step k — (step_from, step_to, transition,
    n_users, min_us, mean_us, max_us), integer microseconds with
    ``mean = sum div n`` (BIGINT floor, order-independent).  The timing
    companion of :func:`funnel` (counts say WHETHER users convert; a
    product decision also needs HOW LONG conversion takes), under the
    identical anchored-at-earliest semantics — the fold is the same one
    carrying each reached step's timestamp, so the oracle's chained
    min-joins state the same numbers.

    Scale shape unchanged from :func:`funnel`: scan-pruned type filter,
    ONE user_id shuffle, per-user fold, then a single all-transitions
    conditional aggregate (map-side combined, 1-row shuffle).
    """
    n = len(steps)
    quoted = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    per_user = (
        df.filter(f"event_type IN ({quoted})")
        .selectExpr("user_id", f"{epoch_us_sql(df)} AS us", "event_type AS et")
        .groupBy("user_id")
        .agg(F.expr("collect_list(struct(us, et))").alias("evs"))
        .selectExpr(f"{_fold_times_expr(steps, max_gap_us)} AS r")
        .selectExpr("r.stage AS stage", *[f"r.t{j} AS t{j}" for j in range(1, n + 1)])
    )
    aggs = []
    for k in range(1, n):
        hit = f"stage >= {k + 1}"
        d = f"t{k + 1} - t{k}"
        aggs += [
            # coalesce: an input with NO funnel-type events reaches this
            # global aggregate with zero rows, where sum() is NULL but
            # the oracle's count(*) is 0 (same convention as funnel())
            f"CAST(coalesce(sum(CASE WHEN {hit} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_{k}",
            f"min(CASE WHEN {hit} THEN {d} END) AS mn_{k}",
            f"CAST(sum(CASE WHEN {hit} THEN {d} END) AS BIGINT) AS sm_{k}",
            f"max(CASE WHEN {hit} THEN {d} END) AS mx_{k}",
        ]
    wide = per_user.selectExpr(*aggs).selectExpr(
        "*", *[f"sm_{k} div nullif(n_{k}, 0) AS mean_{k}" for k in range(1, n)]
    )
    rows = []
    for k in range(1, n):
        name = f"{steps[k - 1]}->{steps[k]}".replace("'", "''")
        rows.append(
            f"named_struct('step_from', {k}, 'step_to', {k + 1}, "
            f"'transition', '{name}', 'n_users', n_{k}, 'min_us', mn_{k}, "
            f"'mean_us', mean_{k}, 'max_us', mx_{k})"
        )
    return wide.selectExpr(f"inline(array({', '.join(rows)}))")


def funnel_latency_oracle_sql(
    table: str,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    max_gap_us: int | None = None,
) -> str:
    """Chained min-join twin: s_k carries (user_id, t_k); transition
    stats join s_{k+1} back to s_k."""
    ctes = [
        f"s1 AS (SELECT user_id, min(CAST(epoch_us(ts) AS BIGINT)) AS t1 "
        f"FROM {table} WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        gap = (
            ""
            if max_gap_us is None
            else f"AND CAST(epoch_us(e.ts) AS BIGINT) - s{i}.t{i} <= {max_gap_us} "
        )
        ctes.append(
            f"s{i + 1} AS (SELECT e.user_id, min(CAST(epoch_us(e.ts) AS BIGINT)) AS t{i + 1} "
            f"FROM {table} e JOIN s{i} ON e.user_id = s{i}.user_id "
            f"WHERE e.event_type = '{steps[i]}' AND CAST(epoch_us(e.ts) AS BIGINT) > s{i}.t{i} {gap}"
            f"GROUP BY e.user_id)"
        )
    selects = []
    for k in range(1, len(steps)):
        name = f"{steps[k - 1]}->{steps[k]}".replace("'", "''")
        selects.append(
            f"SELECT {k} AS step_from, {k + 1} AS step_to, '{name}' AS transition, "
            f"CAST(count(*) AS BIGINT) AS n_users, "
            f"min(b.t{k + 1} - a.t{k}) AS min_us, "
            f"CAST(sum(b.t{k + 1} - a.t{k}) AS BIGINT) // nullif(count(*), 0) AS mean_us, "
            f"max(b.t{k + 1} - a.t{k}) AS max_us "
            f"FROM s{k + 1} b JOIN s{k} a ON b.user_id = a.user_id"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# Touch attribution
# ---------------------------------------------------------------------------

#: Default touchpoint types and lookback for attribution.
DEFAULT_TOUCHES = ("view", "click")
DEFAULT_LOOKBACK_US = 7 * 86_400_000_000


def attribute_conversions(
    df: DataFrame,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
) -> DataFrame:
    """Last-touch attribution: for every conversion event, the most
    recent preceding touchpoint by the same user within the lookback
    window — the marketing-analytics primitive behind "which campaign
    gets credit for this purchase".  Output one row per conversion:
    (conv_event_id, user_id, conv_us, touch_event_id, touch_type,
    latency_us); a conversion with no in-window touch keeps NULL touch
    columns (the "direct" bucket every attribution report needs).

    Scale shape: the scan is pre-filtered to touch ∪ conversion types
    (predicate pushdown — at 100 TB the irrelevant event types never
    leave the parquet reader), then ONE hash shuffle on ``user_id``
    feeds a running ``last(..., ignorenulls=True)`` window ordered by
    (us, event_id) — no self-join, no second exchange; per-row state in
    the window frame is O(1).  The three carried touch columns resolve
    against the same total order (event_id is unique), so they always
    describe the SAME touch row.  A touch sharing the conversion's
    exact microsecond attributes (deterministic tie order: event_id);
    both engines state identical window semantics, so the pairing is
    bit-reproducible.
    """
    from pyspark.sql import Window

    all_types = ", ".join(f"'{t}'" for t in (*touches, conversion))
    touch_in = ", ".join(f"'{t}'" for t in touches)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.filter(f"event_type IN ({all_types})").selectExpr(
        "event_id", "user_id", f"{epoch_us_sql(df)} AS us", "event_type"
    )
    carried = (
        base.withColumn(
            "t_us",
            F.last(F.expr(f"CASE WHEN event_type IN ({touch_in}) THEN us END"), True).over(w),
        )
        .withColumn(
            "t_id",
            F.last(F.expr(f"CASE WHEN event_type IN ({touch_in}) THEN event_id END"), True).over(w),
        )
        .withColumn(
            "t_type",
            F.last(F.expr(f"CASE WHEN event_type IN ({touch_in}) THEN event_type END"), True).over(w),
        )
    )
    in_window = f"t_us IS NOT NULL AND us - t_us <= {lookback_us}"
    return carried.filter(f"event_type = '{conversion}'").selectExpr(
        "event_id AS conv_event_id",
        "user_id",
        "us AS conv_us",
        f"CASE WHEN {in_window} THEN t_id END AS touch_event_id",
        f"CASE WHEN {in_window} THEN t_type END AS touch_type",
        f"CASE WHEN {in_window} THEN us - t_us END AS latency_us",
    )


def attribute_conversions_oracle_sql(
    table: str,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
) -> str:
    all_types = ", ".join(f"'{t}'" for t in (*touches, conversion))
    touch_in = ", ".join(f"'{t}'" for t in touches)
    us = "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)"
    in_window = f"t_us IS NOT NULL AND us - t_us <= {lookback_us}"
    return (
        f"WITH base AS (SELECT event_id, user_id, {us} AS us, event_type "
        f"FROM {table} WHERE event_type IN ({all_types})), "
        "c AS (SELECT event_id, user_id, us, event_type, "
        f"last_value(CASE WHEN event_type IN ({touch_in}) THEN us END IGNORE NULLS) OVER w AS t_us, "
        f"last_value(CASE WHEN event_type IN ({touch_in}) THEN event_id END IGNORE NULLS) OVER w AS t_id, "
        f"last_value(CASE WHEN event_type IN ({touch_in}) THEN event_type END IGNORE NULLS) OVER w AS t_type "
        "FROM base WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
        "SELECT event_id AS conv_event_id, user_id, us AS conv_us, "
        f"CASE WHEN {in_window} THEN t_id END AS touch_event_id, "
        f"CASE WHEN {in_window} THEN t_type END AS touch_type, "
        f"CASE WHEN {in_window} THEN us - t_us END AS latency_us "
        f"FROM c WHERE event_type = '{conversion}'"
    )


def _credit_pairs(
    df: DataFrame,
    touches: tuple[str, ...],
    conversion: str,
    lookback_us: int,
    ranks: bool = False,
    salt: int = 1,
) -> DataFrame:
    """The (conversion × in-window touch) credit relation both
    multi-touch models share: conversions and touches are two slices of
    ONE pre-filtered scan, equi-joined on ``user_id`` with the time
    window as a join residual on the co-partitioned pairs.  Decorated
    with ``n_touches`` (and, when ``ranks``, the ascending/descending
    time ranks ``ra``/``rd`` the U-shaped model needs) via windows over
    the SAME conv-partitioned relation — no extra exchange beyond the
    pair join's own.

    ``salt > 1`` spreads a HOT USER's quadratic pair build across
    ``salt`` tasks (r11 VERDICT item 5 — at 100× events-per-user the
    single-key join task dominated the 291 s wall): touch rows take a
    deterministic ``xxhash64(touch_event_id) mod salt``, the (smaller)
    conversion side replicates ``salt`` ways, and the join key becomes
    (user_id, salt) — every (conv, touch) pair still matches exactly
    once, so output is bit-identical to the unsalted plan.  The touch
    side is the one salted (not replicated) because touches outnumber
    conversions: shuffle grows by |convs|·salt, the cheaper side.
    AQE's skew-join split can subdivide a skewed SMJ partition too, but
    it subdivides ONE key's sorted run only coarsely; the salt is
    deterministic, engine-independent, and works under broadcast plans.
    """
    from pyspark.sql import Window

    touch_in = ", ".join(f"'{t}'" for t in touches)
    base = df.filter(
        f"event_type IN ({touch_in}, '{conversion}')"
    ).selectExpr("event_id", "user_id", f"{epoch_us_sql(df)} AS us", "event_type")
    conv = base.filter(f"event_type = '{conversion}'").selectExpr(
        "event_id AS conv_event_id", "user_id", "us AS conv_us"
    )
    touch = base.filter(f"event_type IN ({touch_in})").selectExpr(
        "event_id AS touch_event_id",
        "user_id AS t_user_id",
        "us AS touch_us",
        "event_type AS touch_type",
    )
    if salt > 1:
        touch = touch.withColumn(
            "_tsalt",
            F.pmod(F.xxhash64("touch_event_id"), F.lit(salt)).cast("int"),
        )
        conv = conv.withColumn(
            "_csalt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
        )
        pairs = conv.join(
            touch,
            (conv.user_id == touch.t_user_id)
            & (conv._csalt == touch._tsalt)
            & (touch.touch_us <= conv.conv_us)
            & (conv.conv_us - touch.touch_us <= lookback_us),
        ).drop("_csalt", "_tsalt")
    else:
        pairs = conv.join(
            touch,
            (conv.user_id == touch.t_user_id)
            & (touch.touch_us <= conv.conv_us)
            & (conv.conv_us - touch.touch_us <= lookback_us),
        )
    w = Window.partitionBy("conv_event_id")
    out = pairs.withColumn("n_touches", F.count(F.lit(1)).over(w))
    if ranks:
        wa = w.orderBy("touch_us", "touch_event_id")
        wd = w.orderBy(F.desc("touch_us"), F.desc("touch_event_id"))
        out = out.withColumn("ra", F.row_number().over(wa)).withColumn(
            "rd", F.row_number().over(wd)
        )
    return out


#: U-shaped weight + position over a rank-decorated credit-pair row —
#: shared by attribute_position and attribution_report.
_POSITION_WEIGHT = (
    "CASE WHEN n_touches = 1 THEN 1000000 "
    "WHEN n_touches = 2 THEN 500000 "
    "WHEN ra = 1 OR rd = 1 THEN 400000 "
    "ELSE 200000 div (n_touches - 2) END"
)
_POSITION_LABEL = (
    "CASE WHEN ra = 1 THEN 'first' WHEN rd = 1 THEN 'last' "
    "ELSE 'middle' END"
)


def attribute_multi_touch(
    df: DataFrame,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
    salt: int = 1,
) -> DataFrame:
    """Linear multi-touch attribution: every in-window touch preceding
    a conversion shares the credit equally — the report marketers put
    beside last-touch (:func:`attribute_conversions`) to see the whole
    path instead of its final step.  Output one row per
    (conversion, touch) pair: (conv_event_id, user_id, conv_us,
    touch_event_id, touch_type, latency_us, weight_ppm) with
    ``weight_ppm = 1_000_000 div n_touches`` — integer floor so credit
    is bit-identical cross-engine (the lost remainder ppm is the
    documented floor convention, same discipline as the graph family).
    Conversions with NO in-window touch emit nothing here — the direct
    bucket is :func:`attribute_conversions`' NULL row.

    Scale shape: the shared :func:`_credit_pairs` relation — the
    fan-out is exactly the real (conversion × in-window touch) credit
    relation a multi-touch report must materialize anyway; the
    per-conversion touch count rides on a window over the pair
    relation (same partitioning as the join output, no extra
    exchange).
    """
    return _credit_pairs(df, touches, conversion, lookback_us, salt=salt).selectExpr(
        "conv_event_id",
        "user_id",
        "conv_us",
        "touch_event_id",
        "touch_type",
        "conv_us - touch_us AS latency_us",
        "CAST(1000000 div n_touches AS BIGINT) AS weight_ppm",
    )


def attribute_multi_touch_oracle_sql(
    table: str,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
) -> str:
    touch_in = ", ".join(f"'{t}'" for t in touches)
    us = "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)"
    return (
        f"WITH base AS (SELECT event_id, user_id, {us} AS us, event_type "
        f"FROM {table} WHERE event_type IN ({touch_in}, '{conversion}')), "
        f"conv AS (SELECT event_id AS conv_event_id, user_id, us AS conv_us "
        f"FROM base WHERE event_type = '{conversion}'), "
        "touch AS (SELECT event_id AS touch_event_id, user_id AS t_user_id, "
        f"us AS touch_us, event_type AS touch_type FROM base "
        f"WHERE event_type IN ({touch_in})), "
        "pairs AS (SELECT c.*, t.touch_event_id, t.touch_type, t.touch_us "
        "FROM conv c JOIN touch t ON c.user_id = t.t_user_id "
        "AND t.touch_us <= c.conv_us "
        f"AND c.conv_us - t.touch_us <= {lookback_us}) "
        "SELECT conv_event_id, user_id, conv_us, touch_event_id, touch_type, "
        "conv_us - touch_us AS latency_us, "
        "CAST(1000000 // (count(*) OVER (PARTITION BY conv_event_id)) AS BIGINT) "
        "AS weight_ppm FROM pairs"
    )


def attribute_position(
    df: DataFrame,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
) -> DataFrame:
    """Position-based (U-shaped) attribution: the FIRST and LAST
    in-window touches take 40% of the credit each, the middles share
    the remaining 20% — the model marketers run beside last-touch
    (discovery and closing both matter; the middle is supporting).
    Conventions: one touch takes 100%; two touches split 50/50; all
    weights are integer ppm with BIGINT floor on the middle share
    (``200000 div (n-2)``), so credit is bit-identical cross-engine.

    Output matches :func:`attribute_multi_touch` plus ``position``
    ('first'/'last'/'middle').  Scale shape identical: the shared
    :func:`_credit_pairs` relation; the position ranks are two window
    functions over the SAME conv-partitioned relation the count
    already uses — no extra exchange.
    """
    return _credit_pairs(df, touches, conversion, lookback_us, ranks=True).selectExpr(
        "conv_event_id",
        "user_id",
        "conv_us",
        "touch_event_id",
        "touch_type",
        "conv_us - touch_us AS latency_us",
        f"{_POSITION_LABEL} AS position",
        f"CAST({_POSITION_WEIGHT} AS BIGINT) AS weight_ppm",
    )


def attribute_position_oracle_sql(
    table: str,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
) -> str:
    touch_in = ", ".join(f"'{t}'" for t in touches)
    us = "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)"
    weight = (
        "CASE WHEN n_touches = 1 THEN 1000000 "
        "WHEN n_touches = 2 THEN 500000 "
        "WHEN ra = 1 OR rd = 1 THEN 400000 "
        "ELSE 200000 // (n_touches - 2) END"
    )
    pos = (
        "CASE WHEN ra = 1 THEN 'first' WHEN rd = 1 THEN 'last' "
        "ELSE 'middle' END"
    )
    return (
        f"WITH base AS (SELECT event_id, user_id, {us} AS us, event_type "
        f"FROM {table} WHERE event_type IN ({touch_in}, '{conversion}')), "
        f"conv AS (SELECT event_id AS conv_event_id, user_id, us AS conv_us "
        f"FROM base WHERE event_type = '{conversion}'), "
        "touch AS (SELECT event_id AS touch_event_id, user_id AS t_user_id, "
        f"us AS touch_us, event_type AS touch_type FROM base "
        f"WHERE event_type IN ({touch_in})), "
        "pairs AS (SELECT c.*, t.touch_event_id, t.touch_type, t.touch_us, "
        "count(*) OVER w AS n_touches, "
        "row_number() OVER (PARTITION BY c.conv_event_id "
        "ORDER BY t.touch_us, t.touch_event_id) AS ra, "
        "row_number() OVER (PARTITION BY c.conv_event_id "
        "ORDER BY t.touch_us DESC, t.touch_event_id DESC) AS rd "
        "FROM conv c JOIN touch t ON c.user_id = t.t_user_id "
        "AND t.touch_us <= c.conv_us "
        f"AND c.conv_us - t.touch_us <= {lookback_us} "
        "WINDOW w AS (PARTITION BY c.conv_event_id)) "
        "SELECT conv_event_id, user_id, conv_us, touch_event_id, touch_type, "
        "conv_us - touch_us AS latency_us, "
        f"{pos} AS position, CAST({weight} AS BIGINT) AS weight_ppm FROM pairs"
    )


def attribution_report(
    df: DataFrame,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
    salt: int | str = "auto",
) -> DataFrame:
    """The channel dashboard all three credit models feed: one row per
    touch type (plus the 'direct' bucket) — conversions won under
    last-touch, total credit under the linear and U-shaped models
    (integer ppm sums: 1e6 ≈ one fully-credited conversion), and the
    last-touch latency profile (n, mean = BIGINT floor).  Reading the
    three models side by side is the point: a channel with high
    last-touch wins but low U-credit is a closer, not a discoverer.

    Scale shape: the linear and U-shaped models aggregate the SAME
    lazily-shared :func:`_credit_pairs` relation definition (linear
    without the rank windows it doesn't need), each reduced to a
    touch_type-keyed aggregate — a handful of groups, map-side
    combined to almost nothing — then full-outer-joined on the tiny
    key set with last-touch's own running-window subtree.  Everything
    integer.

    Deliberately NOT persisted (r11 A/B at sf0.1, min-of-3 each):
    persisting the rank-decorated pair relation cost 4.45 s vs 1.89 s
    recomputing it per aggregate — the cache materialization of the
    fan-out relation dwarfs the duplicated join work, and at 100x
    events-per-user (SCALE_CHECK r11) the persisted form still
    finished while the DuckDB twin OOM'd, so the lazy form only
    improves from there.  Contrast ``diff.incident_report``, where the
    shared relation is table-sized to COMPUTE but diff-sized to STORE
    — there the persist wins the same A/B.

    ``salt="auto"`` (default) picks the credit-join salt from measured
    regimes (SCALE_CHECK r12 A/B, min-of-2 each): at bench-scale
    density (sf0.1: ~67 funnel events/user; 10×: ~667) salt=1 wins
    (2.17 s vs 3.21/6.88 at 10× — replicating the small conversion
    side costs more than the skew it cures), while at 100×
    hot-user density (~6.7k events/user) salt=32 cut the wall
    289.7 → 162.8 s and salt=8 was NOT enough spread (404 s: it
    defeats AQE's own skew split without replacing it).  The heuristic
    is one count aggregate over the pre-filtered scan: salt=32 when
    funnel-events-per-user exceeds 2000 (between the measured
    regimes), else 1.  Deterministic given the input; pass an int to
    override.
    """
    if salt == "auto":
        touch_in = ", ".join(f"'{t}'" for t in touches)
        stats = (
            df.filter(f"event_type IN ({touch_in}, '{conversion}')")
            .selectExpr(
                "count(*) AS n", "count(DISTINCT user_id) AS u"
            )
            .first()
        )
        salt = 32 if stats["n"] / max(stats["u"] or 0, 1) > 2000 else 1
    lt = attribute_conversions(df, touches, conversion, lookback_us).selectExpr(
        "coalesce(touch_type, 'direct') AS touch_type", "latency_us"
    ).groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_last"),
        F.expr("CAST(sum(latency_us) div nullif(count(latency_us), 0) AS BIGINT)")
        .alias("mean_latency_us"),
    )
    mt = _credit_pairs(df, touches, conversion, lookback_us, salt=salt).groupBy(
        "touch_type"
    ).agg(
        F.expr("CAST(sum(CAST(1000000 div n_touches AS BIGINT)) AS BIGINT)")
        .alias("credit_linear_ppm")
    )
    pt = _credit_pairs(
        df, touches, conversion, lookback_us, ranks=True, salt=salt
    ).groupBy(
        "touch_type"
    ).agg(
        F.expr(f"CAST(sum(CAST({_POSITION_WEIGHT} AS BIGINT)) AS BIGINT)")
        .alias("credit_position_ppm")
    )
    return (
        lt.join(mt, "touch_type", "full_outer")
        .join(pt, "touch_type", "full_outer")
        .selectExpr(
            "touch_type",
            "CAST(coalesce(n_last, 0) AS BIGINT) AS n_last",
            "mean_latency_us",
            "CAST(coalesce(credit_linear_ppm, 0) AS BIGINT) AS credit_linear_ppm",
            "CAST(coalesce(credit_position_ppm, 0) AS BIGINT) AS credit_position_ppm",
        )
    )


def attribution_report_oracle_sql(
    table: str,
    touches: tuple[str, ...] = DEFAULT_TOUCHES,
    conversion: str = "purchase",
    lookback_us: int = DEFAULT_LOOKBACK_US,
) -> str:
    lt_sql = attribute_conversions_oracle_sql(table, touches, conversion, lookback_us)
    mt_sql = attribute_multi_touch_oracle_sql(table, touches, conversion, lookback_us)
    pt_sql = attribute_position_oracle_sql(table, touches, conversion, lookback_us)
    return (
        f"WITH lt_rows AS ({lt_sql}), mt_rows AS ({mt_sql}), pt_rows AS ({pt_sql}), "
        "lt AS (SELECT coalesce(touch_type, 'direct') AS touch_type, "
        "CAST(count(*) AS BIGINT) AS n_last, "
        "CAST(sum(latency_us) // nullif(count(latency_us), 0) AS BIGINT) "
        "AS mean_latency_us FROM lt_rows GROUP BY 1), "
        "mt AS (SELECT touch_type, CAST(sum(weight_ppm) AS BIGINT) "
        "AS credit_linear_ppm FROM mt_rows GROUP BY 1), "
        "pt AS (SELECT touch_type, CAST(sum(weight_ppm) AS BIGINT) "
        "AS credit_position_ppm FROM pt_rows GROUP BY 1) "
        "SELECT coalesce(lt.touch_type, mt.touch_type, pt.touch_type) AS touch_type, "
        "CAST(coalesce(lt.n_last, 0) AS BIGINT) AS n_last, lt.mean_latency_us, "
        "CAST(coalesce(mt.credit_linear_ppm, 0) AS BIGINT) AS credit_linear_ppm, "
        "CAST(coalesce(pt.credit_position_ppm, 0) AS BIGINT) AS credit_position_ppm "
        "FROM lt FULL OUTER JOIN mt ON lt.touch_type = mt.touch_type "
        "FULL OUTER JOIN pt ON coalesce(lt.touch_type, mt.touch_type) = pt.touch_type"
    )
