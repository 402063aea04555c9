"""Iterative graph analytics over document-pair graphs.

Beyond-reference extension (the reference has no graph notion anywhere
in its ~1,100 LoC — SURVEY.md §1.4): once a dedup pipeline has produced
near-duplicate *pairs*, the pair graph carries more signal than
connected components alone.  PageRank over it scores how "central" a
document is inside its duplication neighbourhood — a standard
quality/canonicality weight in web-corpus curation (highly-duplicated
boilerplate scores high and can be down-weighted; a document only
loosely attached to a dup cluster scores near the teleport floor).
The same operator runs over any (doc_a, doc_b) edge relation — citation
links, hyperlinks — which is where the 100 TB case lives.

Scale shape — the classic iterative join-agg, same discipline as
:func:`pgverify_spark.operators.dedup.dup_clusters`:

- edges are symmetrized + deduped ONCE and checkpointed; every
  iteration re-reads in-memory id-only blocks;
- one iteration = one equi-join (ranks onto edge sources) + one
  aggregation (contributions per destination), both hash shuffles on
  bare ids with map-side combine — 2 shuffles/round, rows ∝ |E|;
- per-round ``localCheckpoint(eager=True)`` truncates the logical plan
  so Catalyst analysis cost stays constant per round (measured
  load-bearing in dup_clusters, same mechanism here; on a dynamic
  cluster swap for a reliable checkpoint dir);
- out-degrees ride ON the edge relation (joined once, before the
  loop), so the per-round join touches exactly two relations.

Cross-engine exactness: ranks are integer PARTS-PER-MILLION and each
contribution is ``(rank_ppm * damping_pm) DIV (1000 * degree)`` —
pure BIGINT floor division, identical in Spark (``div``) and DuckDB
(``//``) for the non-negative operands used here.  Sums of BIGINTs are
order-independent, so the result is bit-identical across engines,
partitionings, and runs — float PageRank would drift in the last ulps.
The oracle unrolls the fixed iteration count into chained CTEs (no
recursion needed; multi-referenced CTEs are MATERIALIZED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Damping factor in parts-per-thousand (0.85 — Page et al. 1999).
DAMPING_PM = 850

#: Teleport floor in ppm: (1 - damping) * 1e6.
_TELEPORT_PPM = (1000 - DAMPING_PM) * 1000

#: Initial rank: 1.0 in ppm.
_INIT_PPM = 1_000_000

#: Ids-only edge rows per partition of the one edge-build exchange
#: (~24 B/row -> ~48 MB partitions, guide §2.2's sizing).
_EDGE_ROWS_PER_PART = 2_000_000


def _edge_partitions(src: DataFrame) -> int:
    """Width of the edge-build exchange, derived from the materialized
    pair count (``src`` is an eager localCheckpoint, so ``count()`` is
    a block-stats read, not a scan) — never a constant (r12; was
    ``defaultParallelism``).  FLOOR at the core count: the dedup /
    degree-aggregate / join consumers hash and compare every edge row,
    which is CPU work that wants all cores — a 1-partition edge build
    at sf0.1 measured +0.4..+0.6 s per pagerank entry on the frozen
    bench protocol (the no-floor variant's profiler-based claim did
    not replicate).  At 100 TB this yields rows/2M well-sized
    partitions, far above the floor."""
    return _edge_partitions_from_count(src.sparkSession, src.count())


def _edge_partitions_from_count(spark, n_pairs: int, floor: int | None = None) -> int:
    """:func:`_edge_partitions` from an already-known pair count, so
    callers that need the count anyway (the empty-graph check) read the
    checkpoint's block stats ONCE instead of twice (r12 batch 7).

    ``floor`` defaults to the core count — right for the BALANCED
    build, whose consumers (distinct dedup, degree aggregate, join)
    hash and compare every edge row: CPU work that wants cores (the
    no-floor variant measured +0.4..0.6 s per entry in r12).  The
    DEDUPED build passes ``floor=2``: its only build consumer is an
    in-partition count/sum window, and the per-round rank
    join/aggregate it pins the width of are shuffle-light id
    relations — a small graph wants few well-fed tasks, not core-count
    stage scheduling four rounds deep (r13 interleaved A/B, min of 3
    alternating reps at sf0.1: plain 3.75→2.93 s, weighted 5.13→3.07,
    personalized 3.82→2.58; every replicate ordered the same way).
    Floor 2, not 1: ``repartition(1, key)`` normalizes to
    SinglePartition, which DROPS the hash partitioning the per-round
    join and the weighted build's in-partition groupBy(s, t) consume
    (see dedup.dup_clusters).  At scale rows/2M dominates either
    floor."""
    par = spark.sparkContext.defaultParallelism if floor is None else floor
    return max(par, min(n_pairs // _EDGE_ROWS_PER_PART + 1, 1 << 20))


def _edge_cache_deduped(sym: DataFrame, nparts: int, weighted: bool) -> DataFrame:
    """Single-exchange (edges ⋈ degrees)-equivalent cache for callers
    that GUARANTEE the symmetrized pair stream is duplicate-free
    (``deduped_pairs=True`` — see :func:`pagerank`): one hash exchange
    on ``s`` at the size-derived width, then everything else runs
    in-partition (guide §2.4, r12 batch 7):

    - unweighted: the degree is a ``count`` window over ``partition by
      s`` — no dedup aggregate (input is duplicate-free by contract),
      no degree exchange (the window's required distribution is the
      partitioning just established), no join;
    - weighted: parallel edges (possible even for deduped inputs via
      48-bit term-hash collisions) merge through ``groupBy(s, t)``,
      which ALSO plans without an exchange — HashPartitioning(s)
      satisfies ClusteredDistribution(s, t) — then the out-strength is
      a ``sum(w)`` window over the same partitioning.

    vs the balanced build: 4 Exchanges + 1 join → 1 Exchange + 1
    in-partition Window (plan-asserted in tests/test_pipeline_ops.py::
    test_pagerank_deduped_build_equivalence_and_plan).  This
    is NOT the reverted batch-1 shape: that one hash-partitioned a
    possibly-duplicate-heavy raw multiset (skew hazard on hot nodes)
    and forced the degree join off the planner's broadcast choice;
    here the input is duplicate-free by contract, so per-task rows
    equal the FINAL cache's rows — the exact distribution the trailing
    repartition produced before — and there is no join left to force.
    Output columns: s, t, d (+ w when weighted), hash-partitioned on
    ``s`` at ``nparts`` — identical to the balanced build's cache."""
    from pyspark.sql import Window

    part = sym.repartition(nparts, "s")
    win = Window.partitionBy("s")
    if weighted:
        merged = part.groupBy("s", "t").agg(F.expr("sum(w)").alias("w"))
        return merged.withColumn("d", F.sum("w").over(win)).persist()
    return part.withColumn("d", F.count(F.lit(1)).over(win)).persist()


def pagerank(
    pairs: DataFrame,
    iterations: int = 4,
    checkpoint_every: int = 8,
    deduped_pairs: bool = False,
) -> DataFrame:
    """Integer-exact PageRank over an undirected pair graph.

    Input: (doc_a, doc_b) pairs — any BIGINT node ids (documents,
    shingle-term nodes, URLs...); extra columns are ignored; edges are
    symmetrized and deduplicated, so every endpoint has degree >= 1 and
    there are no dangling nodes by construction.

    ``deduped_pairs=True`` is the caller's guarantee that the
    SYMMETRIZED pair stream is already duplicate-free — true for any
    bipartite edge relation whose forward direction is distinct (the
    registry's doc-term graphs: ``_shingled`` dedupes shingle ints per
    doc, and doc ids < TERM_NODE_OFFSET <= term ids means the reversed
    direction can never collide with the forward one).  It switches the
    edge build to :func:`_edge_cache_deduped` (4 Exchanges + 1 join →
    1 Exchange); the output is identical because the skipped
    ``distinct`` is a no-op on duplicate-free input.  **The contract is
    not runtime-checked** (a distinct-count probe would cost the very
    exchange the flag removes): passing a stream with duplicate
    symmetrized pairs silently inflates degrees and double-counts the
    duplicate edges' contributions — WRONG RANKS, no error.  When in
    doubt, leave the default (False): the balanced build dedups.

    Output: (node_id, rank_ppm BIGINT) for every node in a pair, after
    exactly ``iterations`` synchronous update rounds of

        rank'(v) = 150000 + sum over edges u->v of
                   (rank(u) * 850) DIV (1000 * deg(u))

    i.e. the standard damped update with all arithmetic in BIGINT ppm.
    A fixed iteration count (not a convergence check) keeps the output
    a pure function of the input — the oracle unrolls the same count.

    Arithmetic bound: total rank mass is conserved at ~|V| x 1e6 ppm,
    so a single node's incoming sum stays under 2^63 for any graph
    with fewer than ~9e12 nodes; only a hub receiving edges from more
    than ~1.1e10 DISTINCT neighbors could overflow the per-node
    contribution sum — past web-graph scale.  (Spark's non-ANSI BIGINT
    sum would wrap silently there while the DuckDB twin's
    HUGEINT->BIGINT cast errors; inside the bound both are exact.)

    Checkpoint cadence: the (edges ⋈ degrees) relation is checkpointed
    ONCE and every round re-reads its in-memory blocks; the rank chain
    itself stays LAZY and one action evaluates the whole unrolled tree
    (per-round eager checkpoints were measured 2.5x slower at sf0.1 —
    each one is a scheduled job + materialization barrier, pure
    overhead at small round counts, and Catalyst re-plans a depth-4
    tree in microseconds).  Plan growth only matters for LONG chains
    (dup_clusters' measured 3s→8s per-round growth started past ~10
    rounds), so ``checkpoint_every`` truncates the chain every N rounds
    — the default only engages for deep runs."""
    from pgverify_spark.operators.util import release_cached_deps

    src = pairs.selectExpr("doc_a", "doc_b").localCheckpoint(eager=True)
    # the eager checkpoint just materialized the caller's pair pipeline —
    # any persisted intermediates tagged on it (doc_term_edges' shingle
    # table) are no longer needed by anything downstream
    release_cached_deps(pairs)
    # One block-stats count serves the exchange width AND the
    # empty-graph check (was a separate ed.take(1) job — r12 batch 7).
    n_pairs = src.count()
    nparts = _edge_partitions_from_count(
        src.sparkSession, n_pairs, floor=2 if deduped_pairs else None
    )
    sym = src.selectExpr("doc_a AS s", "doc_b AS t").unionByName(
        src.selectExpr("doc_b AS s", "doc_a AS t")
    )
    if deduped_pairs:
        # single-exchange build; skew-equivalent to the balanced cache
        # because per-task rows == final cache rows (docstring above)
        ed = _edge_cache_deduped(sym, nparts, weighted=False)
    else:
        # Generic inputs keep the BALANCED build (r12 decision,
        # measured): the distinct dedups on the uniform (s, t) hash, so
        # a hot node's pre-dedup pair multiset (arbitrary multiplicity
        # for unknown callers) never concentrates on one task (guide
        # §2.5: skew beats exchange count).  persist (not checkpoint):
        # an InMemoryRelation PRESERVES outputPartitioning, so a
        # round's join on `s` consumes the cache co-partitioned — at
        # 100 TB that saves one E-sized exchange PER ROUND.  Width is
        # size-derived with a core floor — never a constant (r12).
        edges = sym.distinct()
        deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        ed = edges.join(deg, "s").repartition(nparts, "s").persist()
    if n_pairs == 0:  # empty graph: zero-row output, skip the loop
        ed.unpersist()
        return ed.selectExpr("s AS node_id", "CAST(s AS BIGINT) AS rank_ppm")
    ranks = (
        ed.select("s")
        .distinct()
        .selectExpr("s AS node", f"CAST({_INIT_PPM} AS BIGINT) AS rank_ppm")
    )
    contrib = f"(rank_ppm * {DAMPING_PM}) div (1000 * d)"
    for rnd in range(iterations):
        # shuffle-hash on the RANKS side, not broadcast: the planner's
        # per-round broadcast re-collects and re-ships a nodes-sized
        # table every iteration (4 driver round-trips), while the
        # cached ed relation is already hash-partitioned on s so the
        # join costs one nodes-sized shuffle and ZERO ed-side exchange.
        # Measured: iterations in isolation (cache fully materialized)
        # 2.62s -> 2.19s at sf0.1; END-TO-END entry time is within run
        # noise (the edge build dominates) — the hint is kept because at
        # node counts past broadcast size it is the only viable
        # strategy, so small-scale behavior now matches the plan shape
        # a cluster run needs.
        r = ranks.hint("shuffle_hash")
        ranks = (
            ed.join(r, ed["s"] == r["node"])
            .groupBy("t")
            .agg(F.expr(f"sum({contrib})").alias("c"))
            .selectExpr("t AS node", f"CAST({_TELEPORT_PPM} + c AS BIGINT) AS rank_ppm")
        )
        if checkpoint_every and (rnd + 1) % checkpoint_every == 0 and rnd + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    from pgverify_spark.operators.util import tag_cached_deps

    return tag_cached_deps(
        ranks.selectExpr("node AS node_id", "rank_ppm"), ed
    )


def pagerank_weighted(
    pairs: DataFrame,
    iterations: int = 4,
    checkpoint_every: int = 8,
    deduped_pairs: bool = False,
) -> DataFrame:
    """Integer-exact PageRank over a WEIGHTED undirected pair graph —
    the salience-weighted twin of :func:`pagerank` (r9 VERDICT item 5):
    a term that occurs 40 times in a document should pull 40× the rank
    mass of a hapax, which the unweighted walk cannot express.

    Input: (doc_a, doc_b, w) with BIGINT weight ``w > 0``; edges are
    symmetrized carrying their weight both ways and parallel edges
    merge by weight-sum, so each endpoint's out-strength
    ``W(u) = sum of w over u's edges`` is >= 1.  Update rule per round:

        rank'(v) = 150000 + sum over edges u->v of
                   (rank(u) * 850 * w(u,v)) DIV (1000 * W(u))

    — the standard weighted damped walk, all in BIGINT floor division
    (identical in Spark ``div`` and DuckDB ``//`` for the non-negative
    operands here), so results are bit-identical across engines and
    partitionings.  Arithmetic bound: the numerator is
    ``rank * 850 * w``; total mass is conserved at ~|V| x 1e6 ppm, so
    with per-edge weights up to ~10^4 the product stays under 2^63 for
    graphs up to ~10^9 nodes — document-corpus scale.  (Outside the
    bound Spark's non-ANSI BIGINT wraps while DuckDB's HUGEINT->BIGINT
    cast errors; inside it both are exact.)

    Physical shape is :func:`pagerank`'s verbatim: the
    (edges ⋈ strengths) relation is persisted hash-partitioned on
    ``s`` once; each round is one ranks-side shuffle-hash join + one
    map-side-combined aggregation — 1 node-sized exchange and 0
    edge-sized exchanges per round.
    """
    from pgverify_spark.operators.util import release_cached_deps

    src = pairs.selectExpr("doc_a", "doc_b", "w").localCheckpoint(eager=True)
    release_cached_deps(pairs)
    n_pairs = src.count()
    nparts = _edge_partitions_from_count(
        src.sparkSession, n_pairs, floor=2 if deduped_pairs else None
    )
    sym = src.selectExpr("doc_a AS s", "doc_b AS t", "w").unionByName(
        src.selectExpr("doc_b AS s", "doc_a AS t", "w")
    )
    if deduped_pairs:
        # single-exchange build: parallel-edge merge (groupBy(s, t)) and
        # out-strength window both run in-partition on the one exchange
        # — deduped_pairs guarantees per-(s, t) multiplicity stays at
        # the hash-collision level, so no pre-merge skew (see pagerank)
        ed = _edge_cache_deduped(sym, nparts, weighted=True)
    else:
        # balanced (s, t)-keyed edge build for generic inputs — see
        # pagerank's note on the reverted raw-multiset variant
        edges = sym.groupBy("s", "t").agg(F.expr("sum(w)").alias("w"))
        strength = edges.groupBy("s").agg(F.expr("sum(w)").alias("d"))
        ed = edges.join(strength, "s").repartition(nparts, "s").persist()
    if n_pairs == 0:
        ed.unpersist()
        return ed.selectExpr("s AS node_id", "CAST(s AS BIGINT) AS rank_ppm")
    ranks = (
        ed.select("s")
        .distinct()
        .selectExpr("s AS node", f"CAST({_INIT_PPM} AS BIGINT) AS rank_ppm")
    )
    contrib = f"(rank_ppm * {DAMPING_PM} * w) div (1000 * d)"
    for rnd in range(iterations):
        r = ranks.hint("shuffle_hash")
        ranks = (
            ed.join(r, ed["s"] == r["node"])
            .groupBy("t")
            .agg(F.expr(f"sum({contrib})").alias("c"))
            .selectExpr("t AS node", f"CAST({_TELEPORT_PPM} + c AS BIGINT) AS rank_ppm")
        )
        if checkpoint_every and (rnd + 1) % checkpoint_every == 0 and rnd + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    from pgverify_spark.operators.util import tag_cached_deps

    return tag_cached_deps(
        ranks.selectExpr("node AS node_id", "rank_ppm"), ed
    )


def _oriented_edges(pairs: DataFrame) -> DataFrame:
    """Deduped low->high oriented edge relation from a (doc_a, doc_b)
    pair stream, checkpointed + persisted — the shared base both
    triangle statistics (and the peel) read.  Releases the caller's
    cached deps once materialized."""
    from pgverify_spark.operators.util import release_cached_deps

    src = pairs.selectExpr("doc_a", "doc_b").localCheckpoint(eager=True)
    release_cached_deps(pairs)
    return (
        src.selectExpr(
            "least(doc_a, doc_b) AS lo", "greatest(doc_a, doc_b) AS hi"
        )
        .filter("lo <> hi")
        .distinct()
        .persist()
    )


def _per_node_triangles(e: DataFrame) -> DataFrame:
    """(node_id, triangles) for nodes in >=1 triangle, by the standard
    oriented enumeration: every triangle a<b<c is found exactly once as
    e(a,b) ⋈ e(b,c) ⋈ e(a,c) — two equi-joins, never the naive 3-way
    self-join with its 6x duplication.  Fan-out is bounded by the
    classic sum-of-deg² and, on near-dup graphs, by clique sizes the
    LSH band cap upstream already bounds.

    The enumerated (a, b, c) triple list is PERSISTED (r12 batch 7):
    the per-role union references it three times, and unpersisted the
    whole two-join enumeration re-executes per branch — 3x the join
    work at any scale (static plan: 14 SortMergeJoins / 40 Exchanges →
    7 / 24 for triangle_counts).  The cache is id-triples only, bounded
    by the same sum-of-deg² as the enumeration itself, and is tagged on
    the result for the caller's release chain."""
    ab = e.selectExpr("lo AS a", "hi AS b")
    bc = e.selectExpr("lo AS b", "hi AS c")
    ac = e.selectExpr("lo AS a", "hi AS c")
    tri = ab.join(bc, "b").join(ac, ["a", "c"]).persist()
    out = (
        tri.selectExpr("a AS node_id")
        .unionAll(tri.selectExpr("b AS node_id"))
        .unionAll(tri.selectExpr("c AS node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    from pgverify_spark.operators.util import tag_cached_deps

    return tag_cached_deps(out, tri)


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle participation count over an undirected pair
    graph — the local clustering signal: near-dup CLUSTERS are triangle
    -dense (mutual near-dups), while chain-shaped false-positive paths
    (A~B~C without A~C) have none, so the count separates "real dup
    community" from "LSH banding accident" before a destructive dedup
    keeps one winner per component.

    Output: (node_id, triangles BIGINT), nodes with zero triangles
    included.  Scale shape: one shared oriented edge relation
    (:func:`_oriented_edges`), joins shuffle on bare node ids.  All
    counts are exact BIGINTs; the oracle is the same oriented
    enumeration in SQL.
    """
    from pgverify_spark.operators.util import tag_cached_deps

    e = _oriented_edges(pairs)
    per_node = _per_node_triangles(e)
    nodes = (
        e.selectExpr("lo AS node_id")
        .unionAll(e.selectExpr("hi AS node_id"))
        .distinct()
    )
    out = nodes.join(per_node, "node_id", "left").selectExpr(
        "node_id", "CAST(coalesce(triangles, 0) AS BIGINT) AS triangles"
    )
    return tag_cached_deps(
        out, e, *getattr(per_node, "_pgvs_cached_deps", ())
    )


def clustering_coefficient(pairs: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient in integer ppm:
    (node_id, degree, triangles, coeff_ppm) with
    ``coeff_ppm = (2·10⁶·triangles) div (degree·(degree−1))`` — the
    normalized form of :func:`triangle_counts` (a 50-replica clique
    node and a 3-copy clique node both read ~10⁶; raw triangle counts
    scale with clique size).  1e6 ≈ clique member, 0 ≈ bridge/accident;
    degree-1 nodes emit 0 by convention.

    The SAME :func:`_oriented_edges` relation feeds degrees (a groupBy
    over both endpoints) and :func:`_per_node_triangles` — one
    enumeration code path for both statistics, so they cannot diverge.
    The division is BIGINT floor — bit-identical cross-engine; overflow
    needs triangles > ~4.6e12, i.e. a clique of ~2 million mutual
    near-dups, far past any band cap.
    """
    from pgverify_spark.operators.util import tag_cached_deps

    e = _oriented_edges(pairs)
    deg = (
        e.selectExpr("lo AS node_id")
        .unionAll(e.selectExpr("hi AS node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    per_node = _per_node_triangles(e)
    out = deg.join(per_node, "node_id", "left").selectExpr(
        "node_id",
        "degree",
        "CAST(coalesce(triangles, 0) AS BIGINT) AS triangles",
        "CASE WHEN degree >= 2 THEN "
        "(2000000 * CAST(coalesce(triangles, 0) AS BIGINT)) "
        "div (degree * (degree - 1)) "
        "ELSE CAST(0 AS BIGINT) END AS coeff_ppm",
    )
    return tag_cached_deps(
        out, e, *getattr(per_node, "_pgvs_cached_deps", ())
    )


def _tri_ctes_sql(pairs_sql: str) -> str:
    """Shared oracle CTE chain (pr -> e -> tri -> pn) both triangle
    statistics build on — one SQL code path, mirroring the shared
    Spark helpers."""
    return (
        f"WITH pr AS MATERIALIZED ({pairs_sql}), "
        "e AS MATERIALIZED (SELECT DISTINCT least(doc_a, doc_b) AS lo, "
        "greatest(doc_a, doc_b) AS hi FROM pr WHERE doc_a <> doc_b), "
        "tri AS MATERIALIZED (SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c "
        "FROM e ab JOIN e bc ON ab.hi = bc.lo "
        "JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi), "
        "pn AS (SELECT node_id, CAST(count(*) AS BIGINT) AS triangles FROM ("
        "SELECT a AS node_id FROM tri UNION ALL SELECT b FROM tri "
        "UNION ALL SELECT c FROM tri) u GROUP BY node_id)"
    )


def clustering_coefficient_oracle_sql(pairs_sql: str) -> str:
    return (
        _tri_ctes_sql(pairs_sql) + ", "
        "deg AS (SELECT node_id, CAST(count(*) AS BIGINT) AS degree FROM ("
        "SELECT lo AS node_id FROM e UNION ALL SELECT hi FROM e) u "
        "GROUP BY node_id) "
        "SELECT deg.node_id, deg.degree, "
        "CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles, "
        "CASE WHEN deg.degree >= 2 THEN "
        "(2000000 * CAST(coalesce(pn.triangles, 0) AS BIGINT)) "
        "// (deg.degree * (deg.degree - 1)) "
        "ELSE CAST(0 AS BIGINT) END AS coeff_ppm "
        "FROM deg LEFT JOIN pn ON deg.node_id = pn.node_id"
    )


def triangle_counts_oracle_sql(pairs_sql: str) -> str:
    return (
        _tri_ctes_sql(pairs_sql) + ", "
        "nodes AS (SELECT DISTINCT lo AS node_id FROM e "
        "UNION SELECT hi FROM e) "
        "SELECT nodes.node_id, CAST(coalesce(pn.triangles, 0) AS BIGINT) "
        "AS triangles FROM nodes LEFT JOIN pn ON nodes.node_id = pn.node_id"
    )


def pagerank_personalized(
    pairs: DataFrame,
    seed_sql: str,
    iterations: int = 4,
    checkpoint_every: int = 8,
    deduped_pairs: bool = False,
) -> DataFrame:
    """Personalized PageRank: teleport mass lands ONLY on the seed set
    — rank becomes "importance *as seen from* the seeds" instead of
    global centrality (Haveliwala 2002, topic-sensitive PageRank; the
    curation use: salience of terms relative to a trusted document
    subset rather than the whole corpus).

    ``seed_sql`` is a Spark/DuckDB-portable boolean expression over the
    column literally named ``node`` (e.g. ``node < 10**15`` = document
    nodes of the doc-term graph).  With ``nv`` nodes and ``ns`` seeds,
    each round is

        rank'(v) = tele(v) + sum over u->v of (rank(u)*850) DIV (1000*deg(u))
        tele(v)  = (150000 * nv) DIV ns   if v is a seed, else 0

    and ranks start at the teleport distribution scaled to full mass
    (``(1e6 * nv) DIV ns`` on seeds, 0 elsewhere) — total mass stays
    ~nv×1e6 ppm like the global walk, so ranks are comparable across
    the two operators.  The integer floor division sheds < ns ppm of
    mass per round — deterministic, identical in both engines.

    Physical shape: :func:`pagerank`'s per-round ranks-side
    shuffle-hash join + map-side-combined aggregate, EXACTLY — the
    teleport is not a relation at all (r12 batch 7).  ``nv`` and ``ns``
    are two scalars, collected once (an O(1) driver transfer, the same
    class as the verify scalars), so ``tele(v)`` becomes a literal CASE
    over the seed predicate inlined into each round's post-aggregate
    projection and into the rank init.  That removes, vs the previous
    shape: the persisted node-sized ``tele`` relation, its
    materializing seed-check job, the broadcast of the count row, and
    ONE node-sized join per round.  The mass arithmetic is unchanged
    (same integers: Python's ``//`` equals SQL ``div`` for the
    non-negative operands here).  Raises on an empty seed set — a
    personalized walk with no seeds has no definition.
    """
    from pgverify_spark.operators.util import release_cached_deps, tag_cached_deps

    src = pairs.selectExpr("doc_a", "doc_b").localCheckpoint(eager=True)
    release_cached_deps(pairs)
    n_pairs = src.count()
    nparts = _edge_partitions_from_count(
        src.sparkSession, n_pairs, floor=2 if deduped_pairs else None
    )
    sym = src.selectExpr("doc_a AS s", "doc_b AS t").unionByName(
        src.selectExpr("doc_b AS s", "doc_a AS t")
    )
    if deduped_pairs:
        ed = _edge_cache_deduped(sym, nparts, weighted=False)
    else:
        # balanced (s, t)-keyed edge build for generic inputs — see
        # pagerank's note on the reverted raw-multiset variant
        edges = sym.distinct()
        deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        ed = edges.join(deg, "s").repartition(nparts, "s").persist()
    if n_pairs == 0:
        ed.unpersist()
        return ed.selectExpr("s AS node_id", "CAST(s AS BIGINT) AS rank_ppm")
    nodes = ed.selectExpr("s AS node").distinct()
    counts = nodes.selectExpr(
        "CAST(count(1) AS BIGINT) AS nv",
        f"CAST(sum(CASE WHEN {seed_sql} THEN 1 ELSE 0 END) AS BIGINT) AS ns",
    ).first()
    nv, ns = int(counts["nv"]), int(counts["ns"] or 0)
    if ns == 0:
        ed.unpersist()
        raise ValueError(
            f"personalized PageRank needs a non-empty seed set: "
            f"{seed_sql!r} matched no node"
        )
    tele_lit = (_TELEPORT_PPM * nv) // ns
    init_lit = (_INIT_PPM * nv) // ns

    def tele_of(lit: int) -> str:
        # plain concatenation, never str.format on a template holding
        # user SQL: a brace character inside seed_sql (a string literal
        # like '{"k":1}') would raise at plan-build time (r12 ADVICE)
        return (
            f"CASE WHEN {seed_sql} THEN CAST({lit} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        )

    ranks = nodes.selectExpr("node", f"{tele_of(init_lit)} AS rank_ppm")
    contrib = f"(rank_ppm * {DAMPING_PM}) div (1000 * d)"
    for rnd in range(iterations):
        r = ranks.hint("shuffle_hash")
        ranks = (
            ed.join(r, ed["s"] == r["node"])
            .groupBy("t")
            .agg(F.expr(f"sum({contrib})").alias("c"))
            .selectExpr("t AS node", "c")
            .selectExpr(
                "node",
                f"CAST({tele_of(tele_lit)} + c AS BIGINT) AS rank_ppm",
            )
        )
        if checkpoint_every and (rnd + 1) % checkpoint_every == 0 and rnd + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return tag_cached_deps(
        ranks.selectExpr("node AS node_id", "rank_ppm"), ed
    )


def pagerank_personalized_oracle_sql(
    pairs_sql: str, seed_sql: str, iterations: int = 4
) -> str:
    """Unrolled-CTE twin of :func:`pagerank_personalized` (same CTE
    chain as the global walk plus the materialized teleport vector)."""
    contrib = "(r.rank_ppm * 850) // (1000 * ed.d)"
    parts = [
        f"WITH pr AS MATERIALIZED ({pairs_sql})",
        "edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM pr "
        "UNION SELECT doc_b, doc_a FROM pr)",
        "deg AS (SELECT s, count(*) AS d FROM edges GROUP BY s)",
        "ed AS MATERIALIZED (SELECT edges.s, edges.t, deg.d FROM edges "
        "JOIN deg USING (s))",
        "nodes AS (SELECT DISTINCT s AS node FROM ed)",
        "cnt AS (SELECT CAST(count(*) AS BIGINT) AS nv, "
        f"CAST(sum(CASE WHEN {seed_sql} THEN 1 ELSE 0 END) AS BIGINT) AS ns "
        "FROM nodes)",
        "tele AS MATERIALIZED (SELECT node, "
        f"CASE WHEN {seed_sql} THEN CAST(({_TELEPORT_PPM} * nv) // ns AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END AS tele_ppm FROM nodes, cnt)",
        f"r0 AS (SELECT node, CASE WHEN {seed_sql} "
        f"THEN CAST(({_INIT_PPM} * nv) // ns AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END AS rank_ppm FROM nodes, cnt)",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS (SELECT ed.t AS node, "
            f"CAST(any_value(tele.tele_ppm) + CAST(sum({contrib}) AS BIGINT) AS BIGINT) "
            f"AS rank_ppm FROM ed JOIN r{i} r ON r.node = ed.s "
            "JOIN tele ON tele.node = ed.t GROUP BY ed.t)"
        )
    return ", ".join(parts) + f" SELECT node AS node_id, rank_ppm FROM r{iterations}"


def pagerank_weighted_oracle_sql(pairs_sql: str, iterations: int = 4) -> str:
    """:func:`pagerank_oracle_sql`'s unrolled-CTE form with the weight
    carried through symmetrize → merge → strength → contribution."""
    contrib = "(r.rank_ppm * 850 * ed.w) // (1000 * ed.d)"
    parts = [
        f"WITH pr AS MATERIALIZED ({pairs_sql})",
        "edges AS MATERIALIZED (SELECT s, t, CAST(sum(w) AS BIGINT) AS w FROM ("
        "SELECT doc_a AS s, doc_b AS t, w FROM pr "
        "UNION ALL SELECT doc_b, doc_a, w FROM pr) u GROUP BY s, t)",
        "str AS (SELECT s, CAST(sum(w) AS BIGINT) AS d FROM edges GROUP BY s)",
        "ed AS MATERIALIZED (SELECT edges.s, edges.t, edges.w, str.d FROM edges "
        "JOIN str USING (s))",
        f"r0 AS (SELECT DISTINCT s AS node, CAST({_INIT_PPM} AS BIGINT) "
        "AS rank_ppm FROM ed)",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS (SELECT ed.t AS node, "
            f"CAST({_TELEPORT_PPM} + CAST(sum({contrib}) AS BIGINT) AS BIGINT) "
            f"AS rank_ppm FROM ed JOIN r{i} r ON r.node = ed.s GROUP BY ed.t)"
        )
    return ", ".join(parts) + f" SELECT node AS node_id, rank_ppm FROM r{iterations}"


def pagerank_oracle_sql(pairs_sql: str, iterations: int = 4) -> str:
    """The identical computation with the iteration loop unrolled into
    chained CTEs.  ``//`` is DuckDB's BIGINT floor division — equal to
    Spark's ``div`` for the non-negative operands here; the per-round
    HUGEINT sum is cast back to BIGINT before the teleport add."""
    contrib = "(r.rank_ppm * 850) // (1000 * ed.d)"
    parts = [
        f"WITH pr AS MATERIALIZED ({pairs_sql})",
        "edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM pr "
        "UNION SELECT doc_b, doc_a FROM pr)",
        "deg AS (SELECT s, count(*) AS d FROM edges GROUP BY s)",
        "ed AS MATERIALIZED (SELECT edges.s, edges.t, deg.d FROM edges "
        "JOIN deg USING (s))",
        f"r0 AS (SELECT DISTINCT s AS node, CAST({_INIT_PPM} AS BIGINT) "
        "AS rank_ppm FROM ed)",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS (SELECT ed.t AS node, "
            f"CAST({_TELEPORT_PPM} + CAST(sum({contrib}) AS BIGINT) AS BIGINT) "
            f"AS rank_ppm FROM ed JOIN r{i} r ON r.node = ed.s GROUP BY ed.t)"
        )
    return ", ".join(parts) + f" SELECT node AS node_id, rank_ppm FROM r{iterations}"


# ---------------------------------------------------------------------------
# Document-term bipartite graph (the registry's PageRank input)
# ---------------------------------------------------------------------------

#: Term nodes live at shingle_hash + this offset so they can never
#: collide with document ids (48-bit shingle hashes < 2^48 ≈ 2.8e14;
#: doc ids are corpus-sized) — one BIGINT node-id space for both.
TERM_NODE_OFFSET = 10**15


def doc_term_edges(df: DataFrame) -> DataFrame:
    """(doc_a = doc_id, doc_b = term node) edges of the document-term
    bipartite graph: one edge per distinct 3-token shingle per document
    (``dedup._shingled`` — the dedup family's tokenize → n-gram →
    48-bit-hash chain, persisted there because ``explode`` re-evaluates
    its input chain per OUTPUT element: reusing it measured 13s → 1.5s
    at sf0.1, the same pathology _shingled's own docstring records).
    The persisted table is tagged on the result so registry callers
    release it after materializing (``util.release_cached_deps``).

    PageRank over this graph is the TextRank-family salience measure:
    a term's rank grows with its document frequency, a document's rank
    with how many high-traffic terms it touches — degree-irregular by
    nature (unlike near-dup pair graphs, which are unions of
    near-regular cliques where PageRank is provably uniform).
    """
    from pgverify_spark.operators.dedup import _shingled
    from pgverify_spark.operators.util import tag_cached_deps

    sh = _shingled(df)  # persisted (see _shingled)
    out = (
        sh.selectExpr("doc_id AS doc_a", "explode(shingles) AS s")
        .selectExpr("doc_a", f"{TERM_NODE_OFFSET} + s AS doc_b")
    )
    return tag_cached_deps(out, sh)


def doc_term_edges_weighted(df: DataFrame) -> DataFrame:
    """(doc_a, doc_b, w) weighted doc-term edges: ``w`` is the shingle's
    OCCURRENCE count in the document — the TextRank weighting, where a
    repeated phrase pulls proportionally more rank mass.

    ``dedup._shingled`` dedupes shingles per doc (correct for set
    semantics, lossy here), so this builds from the gram level: count
    occurrences per (doc, gram string) FIRST, hash each distinct gram
    ONCE after — multiplicity survives while the md5 count stays at
    |distinct grams|, the same economy ``shingle_ints_sql`` documents.
    Two grams md5-colliding into one 48-bit term yield parallel edges;
    :func:`pagerank_weighted` merges them by weight-sum (and the oracle
    twin counts per gram before hashing identically, so both engines
    see the same multiset).  The (doc, grams) relation is persisted —
    ``explode`` re-evaluates its input chain per OUTPUT element (the
    measured 13s-vs-0.3s pathology ``_shingled`` records) — and tagged
    for ``util.release_cached_deps``.

    A document's grams all live in ONE array cell, so the per-(doc,
    gram) occurrence count is row-local: sort the array and emit
    run-lengths with higher-order functions instead of
    ``explode → groupBy(doc_id, g)`` — the string grams never shuffle
    at any scale (one Exchange removed from the plan; lambda bindings
    double as let-bindings, so CollapseProject cannot re-evaluate the
    sorted array per output element).
    """
    from pgverify_spark.functions.canonical import DIALECT_SPARK
    from pgverify_spark.functions.text_exprs import (
        hex_prefix_int_sql,
        ngrams_sql,
        tokens_sql,
    )
    from pgverify_spark.operators.dedup import NGRAM_N
    from pgverify_spark.operators.util import barrier, tag_cached_deps

    d = DIALECT_SPARK
    grams = (
        barrier(df.selectExpr("doc_id", f"{tokens_sql('text', d)} AS tokens"))
        .filter(f"size(tokens) >= {NGRAM_N}")
        .selectExpr("doc_id", f"{ngrams_sql('tokens', NGRAM_N, d)} AS grams")
        .persist()
    )
    # array<struct<g,w>> of per-distinct-gram run lengths over the
    # sorted gram array; `sg` (sorted grams) and `st` (run starts) are
    # bound once per row via single-element transform shells.
    starts = (
        "filter(sequence(1, size(sg)), "
        "i -> i = 1 OR element_at(sg, i) <> element_at(sg, i - 1))"
    )
    run = (
        "named_struct('g', element_at(sg, s), 'w', CAST("
        "(CASE WHEN j = size(st) - 1 THEN size(sg) + 1 "
        "ELSE element_at(st, j + 2) END) - s AS BIGINT))"
    )
    gram_counts = (
        f"flatten(transform(array(array_sort(grams)), sg -> "
        f"flatten(transform(array({starts}), st -> "
        f"transform(st, (s, j) -> {run})))))"
    )
    out = (
        grams.selectExpr("doc_id", f"inline({gram_counts})")
        .selectExpr(
            "doc_id AS doc_a",
            f"{TERM_NODE_OFFSET} + {hex_prefix_int_sql('md5(g)', d)} AS doc_b",
            "w",
        )
    )
    return tag_cached_deps(out, grams)


def doc_term_edges_weighted_oracle_sql(table: str) -> str:
    from pgverify_spark.functions.canonical import DIALECT_DUCKDB
    from pgverify_spark.functions.text_exprs import (
        hex_prefix_int_sql,
        ngrams_sql,
        tokens_sql,
    )
    from pgverify_spark.operators.dedup import NGRAM_N

    d = DIALECT_DUCKDB
    return (
        f"SELECT doc_id AS doc_a, "
        f"{TERM_NODE_OFFSET} + {hex_prefix_int_sql('md5(g)', d)} AS doc_b, w FROM "
        "(SELECT doc_id, g, CAST(count(*) AS BIGINT) AS w FROM "
        f"(SELECT doc_id, unnest(grams) AS g FROM "
        f"(SELECT doc_id, {ngrams_sql('tokens', NGRAM_N, d)} AS grams FROM "
        f"(SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}) tk "
        f"WHERE len(tokens) >= {NGRAM_N}) gr) oc GROUP BY doc_id, g) cw"
    )


def doc_term_edges_oracle_sql(table: str) -> str:
    from pgverify_spark.functions.canonical import DIALECT_DUCKDB
    from pgverify_spark.functions.text_exprs import (
        ngrams_sql,
        shingle_ints_sql,
        tokens_sql,
    )
    from pgverify_spark.operators.dedup import NGRAM_N

    d = DIALECT_DUCKDB
    return (
        f"SELECT doc_id AS doc_a, {TERM_NODE_OFFSET} + unnest(shingles) AS doc_b FROM "
        f"(SELECT doc_id, {shingle_ints_sql('grams', d)} AS shingles FROM "
        f"(SELECT doc_id, {ngrams_sql('tokens', NGRAM_N, d)} AS grams FROM "
        f"(SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}) tk "
        f"WHERE len(tokens) >= {NGRAM_N}) gr) shn"
    )


def k_core(pairs: DataFrame, k: int = 3, rounds: int = 6) -> DataFrame:
    """k-core peel over an undirected pair graph: ``rounds``
    applications of "drop every node with degree < k (and its edges),
    recompute degrees" — the standard density filter that separates
    genuinely dense duplication communities (spam farms, template
    mills: every member stays) from stars and chains the LSH banding
    strings together (peeled away, because removing the low-degree rim
    cascades).  Triangle counts score LOCAL density;
    the k-core is the GLOBAL fixed point — a node survives only if k
    neighbours survive, recursively.

    Output: (node_id, degree) of the subgraph after ``rounds`` peels —
    degree is within the surviving subgraph.  The peel reaches its
    fixed point when no round removes a node; ``rounds`` bounds work
    (each round strictly shrinks or the loop exits early), and the
    oracle unrolls the SAME count so both engines state identical
    semantics even on inputs where ``rounds`` hasn't converged.

    Scale shape: everything after the one-time edge dedup is id-only —
    per round one degree aggregation (hash shuffle with map-side
    combine, rows ∝ surviving |E|) and two semi-joins back onto the
    edges; per-round ``localCheckpoint(eager=True)`` keeps the plan
    flat (module docstring).  A converged-early graph short-circuits:
    the driver sees the survivor count per round (an O(1) scalar, not
    a collect of rows) and stops peeling when it stops changing.
    """
    from pgverify_spark.operators.util import release_cached_deps

    src = pairs.selectExpr("doc_a", "doc_b").localCheckpoint(eager=True)
    release_cached_deps(pairs)
    e = (
        src.selectExpr("least(doc_a, doc_b) AS lo", "greatest(doc_a, doc_b) AS hi")
        .filter("lo <> hi")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(rounds):
        deg = (
            e.selectExpr("lo AS node_id")
            .unionAll(e.selectExpr("hi AS node_id"))
            .groupBy("node_id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.filter(f"degree >= {k}").select("node_id")
        e = (
            e.join(keep, e.lo == keep.node_id, "left_semi")
            .join(keep, e.hi == keep.node_id, "left_semi")
            .localCheckpoint(eager=True)
        )
        n_now = e.count()
        if n_now == n_edges:  # fixed point: a further peel is identity
            break
        n_edges = n_now
    return (
        e.selectExpr("lo AS node_id")
        .unionAll(e.selectExpr("hi AS node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def k_core_oracle_sql(pairs_sql: str, k: int = 3, rounds: int = 6) -> str:
    """Unrolled peel: e0 = deduped oriented edges, then ``rounds``
    (keep_i = degree>=k nodes of e_{i-1}; e_i = e_{i-1} restricted)
    levels.  The early-exit in :func:`k_core` only skips identity
    rounds, so the unrolled form is equivalent."""
    parts = [
        f"WITH pr AS MATERIALIZED ({pairs_sql}), "
        "e0 AS MATERIALIZED (SELECT DISTINCT least(doc_a, doc_b) AS lo, "
        "greatest(doc_a, doc_b) AS hi FROM pr WHERE doc_a <> doc_b)"
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f", n{i} AS (SELECT node_id FROM (SELECT lo AS node_id FROM e{p} "
            f"UNION ALL SELECT hi FROM e{p}) u GROUP BY node_id "
            f"HAVING count(*) >= {k})"
            f", e{i} AS MATERIALIZED (SELECT e.lo, e.hi FROM e{p} e "
            f"JOIN n{i} a ON e.lo = a.node_id JOIN n{i} b ON e.hi = b.node_id)"
        )
    parts.append(
        f" SELECT node_id, CAST(count(*) AS BIGINT) AS degree FROM "
        f"(SELECT lo AS node_id FROM e{rounds} UNION ALL SELECT hi FROM e{rounds}) u "
        "GROUP BY node_id"
    )
    return "".join(parts)
