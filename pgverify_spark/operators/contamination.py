"""Train/eval contamination detection for training-data pipelines.

Beyond-reference extension (the reference verifies cross-database table
equality, SURVEY.md §2.3; it has no corpus tooling): find training
documents that share word n-grams with a held-out evaluation split — the
standard decontamination step before LLM training (an eval answer leaked
into the training set inflates benchmark scores).

Scale shape — the asymmetry IS the design: eval benchmark suites are
fixed-size (thousands of documents, MBs-to-GBs), the training corpus is
the 100 TB side.  The eval inverted index (shingle -> eval_doc) is
therefore built once and **broadcast**; the training corpus is scanned
exactly once, never shuffled, and each train row probes the broadcast
map.  The only shuffled data is the matched (train_doc, eval_doc,
shingle) hits — O(contamination), not O(corpus).  The final groupBy
counts shared shingles per cross-split pair with map-side combine.

A hot-shingle cap guards the join fan-out exactly as in
:func:`pgverify_spark.operators.dedup.ngram_jaccard_pairs`: a
stopword-like n-gram present in many *eval* docs would pair every train
document containing it with all of them, so shingles shared by more than
``max_eval_freq`` eval documents are dropped from the index — they carry
no contamination signal (the default n=5 makes chance collisions rare to
begin with; decontamination in practice uses 8-13-grams for the same
reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.canonical import (
    DIALECT_DUCKDB,
    DIALECT_SPARK,
    hex_prefix_int_sql,
)
from pgverify_spark.operators.util import barrier as _barrier
from pgverify_spark.functions.text_exprs import (
    MINHASH_P,
    _const,
    ngrams_sql,
    shingle_ints_sql,
    tokens_sql,
)

#: Contamination shingle width (tokens).  Wider than dedup's 3: a shared
#: 5-gram is strong evidence of copied text, not shared vocabulary.
CONTAM_N = 5

#: Drop shingles present in more than this many eval documents.
MAX_EVAL_FREQ = 1_000


def _contam_shingled(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingles) with distinct n-token shingle hashes.

    Same layering discipline as dedup's ``_shingled`` (token-count filter
    *early*, persist before the explode consumers — both measured
    load-bearing there); separate function because contamination uses a
    wider n.
    """
    if "pgvs_tokens" in df.columns:
        # caller-tokenized corpus (text.tokenize_prep contract; the
        # pgvs_ prefix is the opt-in — a user 'tokens' column never
        # silently replaces this engine's tokenization)
        toks = df.selectExpr("doc_id", "pgvs_tokens AS tokens")
    else:
        toks = _barrier(
            df.selectExpr("doc_id", f"{tokens_sql('text', DIALECT_SPARK)} AS tokens")
        )
    return (
        toks.filter(f"size(tokens) >= {n}")
        .selectExpr("doc_id", f"{ngrams_sql('tokens', n, DIALECT_SPARK)} AS grams")
        .selectExpr("doc_id", f"{shingle_ints_sql('grams', DIALECT_SPARK)} AS shingles")
        .persist()
    )


def contamination_pairs(
    df: DataFrame,
    n: int = CONTAM_N,
    eval_mod: int = 10,
    min_shared: int = 2,
    max_eval_freq: int = MAX_EVAL_FREQ,
) -> DataFrame:
    """Cross-split n-gram overlap: train docs sharing >= ``min_shared``
    distinct n-token shingles with an eval doc.

    The eval split is deterministic — ``doc_id % eval_mod == 0`` — so
    both engines (and repeated runs) agree on membership; a real pipeline
    passes the actual benchmark corpus as the eval side instead.

    Output: (train_doc, eval_doc, n_shared, contamination) where
    ``contamination = n_shared / |train shingles|`` — 1.0 means every
    shingle of the training document appears in that eval document.
    """
    sh = _contam_shingled(df, n)
    ev = sh.filter(f"doc_id % {eval_mod} = 0")
    tr = sh.filter(f"doc_id % {eval_mod} <> 0")
    ev_inv = ev.selectExpr("doc_id AS eval_doc", "explode(shingles) AS s")
    if max_eval_freq is not None:
        hot = (
            ev_inv.groupBy("s")
            .agg(F.count(F.lit(1)).alias("freq"))
            .filter(F.col("freq") > max_eval_freq)
            .select("s")
        )
        ev_inv = ev_inv.join(hot, "s", "left_anti")
    tr_inv = tr.selectExpr(
        "doc_id AS train_doc", "size(shingles) AS train_sz", "explode(shingles) AS s"
    )
    hits = tr_inv.join(F.broadcast(ev_inv), "s")
    return (
        hits.groupBy("train_doc", "eval_doc", "train_sz")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(f"n_shared >= {min_shared}")
        .selectExpr(
            "train_doc",
            "eval_doc",
            "n_shared",
            "round(CAST(n_shared AS DOUBLE) / train_sz, 6) AS contamination",
        )
    )


def contamination_pairs_oracle_sql(
    table: str,
    n: int = CONTAM_N,
    eval_mod: int = 10,
    min_shared: int = 2,
    max_eval_freq: int = MAX_EVAL_FREQ,
) -> str:
    d = DIALECT_DUCKDB
    hot_filter = ""
    ev_src = "ev_inv"
    if max_eval_freq is not None:
        hot_filter = (
            f"hot AS (SELECT s FROM ev_inv GROUP BY s HAVING count(*) > {max_eval_freq}), "
            "ev_invk AS (SELECT ev_inv.* FROM ev_inv ANTI JOIN hot USING (s)), "
        )
        ev_src = "ev_invk"
    return (
        f"WITH tok AS (SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}), "
        f"tokn AS (SELECT * FROM tok WHERE len(tokens) >= {n}), "
        f"gr AS (SELECT doc_id, {ngrams_sql('tokens', n, d)} AS grams FROM tokn), "
        f"shn AS (SELECT doc_id, {shingle_ints_sql('grams', d)} AS shingles FROM gr), "
        f"ev_inv AS (SELECT doc_id AS eval_doc, unnest(shingles) AS s FROM shn "
        f"WHERE doc_id % {eval_mod} = 0), "
        f"{hot_filter}"
        "tr_inv AS (SELECT doc_id AS train_doc, len(shingles) AS train_sz, "
        f"unnest(shingles) AS s FROM shn WHERE doc_id % {eval_mod} <> 0), "
        "ov AS (SELECT train_doc, eval_doc, train_sz, count(*) AS n_shared "
        f"FROM tr_inv JOIN {ev_src} USING (s) GROUP BY 1, 2, 3) "
        "SELECT train_doc, eval_doc, n_shared, "
        "round(CAST(n_shared AS DOUBLE) / train_sz, 6) AS contamination "
        f"FROM ov WHERE n_shared >= {min_shared}"
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (constant-size membership, no pair fan-out)
# ---------------------------------------------------------------------------

#: Bloom bitmap size in bits (m).  2^20 bits = 128 KiB — trivially
#: broadcastable; size m ≈ -n·ln(p)/(ln 2)² for the target eval-shingle
#: count n and false-positive rate p at real scale.
BLOOM_BITS = 1 << 20

#: Independent hash functions (k).  k = (m/n)·ln 2 at the design point;
#: 4 keeps the per-shingle probe cost flat while min_hits >= 2 makes the
#: doc-level false-positive probability negligible (FPs are independent
#: across distinct shingles).
BLOOM_K = 4

_BLOOM_A = [_const(f"bloom-a-{j}", 1, MINHASH_P) for j in range(BLOOM_K)]
_BLOOM_B = [_const(f"bloom-b-{j}", 0, MINHASH_P) for j in range(BLOOM_K)]


def _bloom_pos_exprs(s: str) -> list[str]:
    """The k bit positions of shingle ``s`` — identical SQL in both
    dialects (pure int64 arithmetic; a*(s%P) <= 2^62, no overflow)."""
    return [
        f"((({a} * ({s} % {MINHASH_P})) + {b}) % {MINHASH_P}) % {BLOOM_BITS}"
        for a, b in zip(_BLOOM_A, _BLOOM_B)
    ]


def bloom_decontaminate(
    df: DataFrame,
    n: int = CONTAM_N,
    eval_mod: int = 10,
    min_hits: int = 2,
) -> DataFrame:
    """Flag training documents whose n-gram shingles hit a Bloom filter
    built from the eval split — decontamination at a CONSTANT memory
    budget, the shape that survives when the eval suite grows past
    what :func:`contamination_pairs`' broadcast inverted index holds.

    The Bloom bitmap is m/8 bytes *regardless of eval size* and the
    probe emits per-document counts, not (train, eval) pairs — there is
    no join fan-out at all.  The trade: membership only (no eval doc
    attribution) and a false-positive rate; ``min_hits >= 2`` distinct
    hitting shingles makes a false *flag* vanishingly unlikely (shingle
    FPs are independent).

    Scale shape: the bitmap build aggregates (word_idx, bit) cells with
    map-side bit_or combine into <= m/63 rows (63 usable bits per signed
    word: bit 63 would need an unrepresentable 1<<63), broadcast to the
    probe;
    the corpus is scanned once and never shuffled — the only exchange
    after the probe carries (doc_id, shingle, int) rows.  All integer
    ops, so the DuckDB oracle computes the *same* bitmap and the same
    flags, false positives included.

    Output: (doc_id, n_shingles, bloom_hits, contaminated) per training
    document (``doc_id % eval_mod <> 0``) with at least one shingle.
    """
    sh = _contam_shingled(df, n)
    ev_cells = (
        sh.filter(f"doc_id % {eval_mod} = 0")
        .selectExpr("explode(shingles) AS s")
        .selectExpr(f"explode(array({', '.join(_bloom_pos_exprs('s'))})) AS pos")
        .selectExpr(
            "pos DIV 63 AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT)) AS m",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(m)").alias("word"))
    )
    probe = (
        sh.filter(f"doc_id % {eval_mod} <> 0")
        .selectExpr("doc_id", "explode(shingles) AS s")
        .selectExpr("doc_id", "s", f"explode(array({', '.join(_bloom_pos_exprs('s'))})) AS pos")
        .selectExpr(
            "doc_id",
            "s",
            "pos DIV 63 AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT)) AS m",
        )
    )
    per_shingle = (
        probe.join(F.broadcast(ev_cells), "word_idx", "left")
        .selectExpr(
            "doc_id",
            "s",
            "CAST(word IS NOT NULL AND (word & m) <> 0 AS INT) AS bit_set",
        )
        .groupBy("doc_id", "s")
        .agg(F.sum("bit_set").alias("bits"))
        .selectExpr("doc_id", f"CAST(bits = {BLOOM_K} AS INT) AS sh_hit")
    )
    return (
        per_shingle.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("sh_hit").alias("bloom_hits"),
        )
        .selectExpr(
            "doc_id",
            "n_shingles",
            "bloom_hits",
            f"CAST(bloom_hits >= {min_hits} AS INT) AS contaminated",
        )
    )


def bloom_decontaminate_oracle_sql(
    table: str,
    n: int = CONTAM_N,
    eval_mod: int = 10,
    min_hits: int = 2,
) -> str:
    d = DIALECT_DUCKDB
    pos = _bloom_pos_exprs("s")
    return (
        f"WITH tok AS (SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}), "
        f"tokn AS (SELECT * FROM tok WHERE len(tokens) >= {n}), "
        f"gr AS (SELECT doc_id, {ngrams_sql('tokens', n, d)} AS grams FROM tokn), "
        f"shn AS (SELECT doc_id, {shingle_ints_sql('grams', d)} AS shingles FROM gr), "
        f"evp AS (SELECT unnest([{', '.join(pos)}]) AS pos FROM "
        f"(SELECT unnest(shingles) AS s FROM shn WHERE doc_id % {eval_mod} = 0)), "
        "words AS (SELECT pos // 63 AS word_idx, "
        "bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word "
        "FROM evp GROUP BY 1), "
        f"trp AS (SELECT doc_id, s, unnest([{', '.join(pos)}]) AS pos FROM "
        f"(SELECT doc_id, unnest(shingles) AS s FROM shn WHERE doc_id % {eval_mod} <> 0)), "
        "cells AS (SELECT doc_id, s, pos // 63 AS word_idx, "
        "CAST(1 AS BIGINT) << CAST(pos % 63 AS INT) AS m FROM trp), "
        "persh AS (SELECT doc_id, s, CAST(sum(CAST(word IS NOT NULL "
        "AND (word & m) <> 0 AS INT)) AS BIGINT) AS bits "
        "FROM cells LEFT JOIN words USING (word_idx) GROUP BY 1, 2) "
        "SELECT doc_id, count(*) AS n_shingles, "
        f"CAST(sum(CAST(bits = {BLOOM_K} AS INT)) AS BIGINT) AS bloom_hits, "
        f"CAST(sum(CAST(bits = {BLOOM_K} AS INT)) >= {min_hits} AS INT) AS contaminated "
        "FROM persh GROUP BY doc_id"
    )


# ---------------------------------------------------------------------------
# Exact substring-run contamination (diagonal islands over positional n-grams)
# ---------------------------------------------------------------------------

#: Minimum shared positions for a (train, eval) pair to be reported —
#: aligned with contamination_pairs' ``min_shared`` default.
MIN_MATCHED = 2


def contamination_spans(
    df: DataFrame,
    n: int = CONTAM_N,
    eval_mod: int = 10,
    min_matched: int = MIN_MATCHED,
    max_eval_freq: int = MAX_EVAL_FREQ,
) -> DataFrame:
    """Exact *contiguous-overlap* detection between train and eval docs:
    for each cross-split pair, the longest run of CONSECUTIVE shared
    n-grams — i.e. the longest common token substring, in n-gram units.

    :func:`contamination_pairs` counts shared n-grams as a *set*; two
    docs can share 50 scattered 5-grams (common phrases) without any
    copied passage.  Production decontamination (GPT-3 appendix C,
    Lee et al. 2022) flags *substring* overlap above a length threshold
    — a 200-token verbatim quote is qualitatively different from 200
    scattered n-grams.  Suffix arrays (the single-machine tool for
    this) don't distribute; this reformulates span-finding as a
    gaps-and-islands problem that is pure SQL:

    a shared n-gram at train position ``i`` and eval position ``j``
    lies on alignment diagonal ``i - j``; a VERBATIM run of length L
    produces L matches on ONE diagonal at consecutive ``i`` — so runs
    are islands of consecutive ``i`` within (train, eval, diagonal),
    found with one ``row_number`` window over the matches.

    Output: (train_doc, eval_doc, n_matched, n_spans, max_run,
    longest_span_tokens) — ``max_run`` in n-grams, ``longest_span_tokens
    = max_run + n - 1`` in tokens; one row per cross-split pair with
    >= ``min_matched`` positional matches.

    Scale shape: the eval positional index is benchmark-sized and
    broadcast (same asymmetry as :func:`contamination_pairs`); the
    corpus is scanned once, never shuffled; only the matched hits
    (O(contamination)) reach the window, which is partitioned by
    (train, eval, diagonal) — thousands of tiny partitions, never a
    single-reducer sort.  The hot-shingle cap bounds join fan-out
    exactly as in contamination_pairs.
    """
    toks = _barrier(
        df.selectExpr("doc_id", f"{tokens_sql('text', DIALECT_SPARK)} AS tokens")
    )
    pos = (
        toks.filter(f"size(tokens) >= {n}")
        .selectExpr(
            "doc_id", f"posexplode({ngrams_sql('tokens', n, DIALECT_SPARK)}) AS (p, g)"
        )
        .selectExpr(
            "doc_id",
            "p + 1 AS pos",  # 1-based, matching the oracle's range(1, ...)
            f"{hex_prefix_int_sql('md5(g)', DIALECT_SPARK)} AS s",
        )
    )
    ev = pos.filter(f"doc_id % {eval_mod} = 0").selectExpr(
        "doc_id AS eval_doc", "pos AS epos", "s"
    )
    if max_eval_freq is not None:
        hot = (
            ev.groupBy("s")
            .agg(F.count(F.lit(1)).alias("freq"))
            .filter(F.col("freq") > max_eval_freq)
            .select("s")
        )
        ev = ev.join(hot, "s", "left_anti")
    tr = pos.filter(f"doc_id % {eval_mod} <> 0").selectExpr(
        "doc_id AS train_doc", "pos AS tpos", "s"
    )
    from pyspark.sql import Window

    hits = tr.join(F.broadcast(ev), "s").selectExpr(
        "train_doc", "eval_doc", "tpos - epos AS diag", "tpos"
    )
    w = Window.partitionBy("train_doc", "eval_doc", "diag").orderBy("tpos")
    runs = (
        hits.withColumn("isl", F.expr("tpos") - F.row_number().over(w))
        .groupBy("train_doc", "eval_doc", "diag", "isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("train_doc", "eval_doc")
        .agg(
            F.sum("run_len").alias("n_matched"),
            F.count(F.lit(1)).alias("n_spans"),
            F.max("run_len").alias("max_run"),
        )
        .filter(f"n_matched >= {min_matched}")
        .selectExpr(
            "train_doc",
            "eval_doc",
            "CAST(n_matched AS BIGINT) AS n_matched",
            "CAST(n_spans AS BIGINT) AS n_spans",
            "CAST(max_run AS BIGINT) AS max_run",
            f"CAST(max_run + {n - 1} AS BIGINT) AS longest_span_tokens",
        )
    )


def contamination_spans_oracle_sql(
    table: str,
    n: int = CONTAM_N,
    eval_mod: int = 10,
    min_matched: int = MIN_MATCHED,
    max_eval_freq: int = MAX_EVAL_FREQ,
) -> str:
    d = DIALECT_DUCKDB
    hot_filter = ""
    ev_src = "ev"
    if max_eval_freq is not None:
        hot_filter = (
            f"hot AS (SELECT s FROM ev GROUP BY s HAVING count(*) > {max_eval_freq}), "
            "evk AS (SELECT ev.* FROM ev ANTI JOIN hot USING (s)), "
        )
        ev_src = "evk"
    g = hex_prefix_int_sql("md5(grams[i])", d)
    return (
        f"WITH tok AS (SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}), "
        f"tokn AS (SELECT * FROM tok WHERE len(tokens) >= {n}), "
        f"gr AS (SELECT doc_id, {ngrams_sql('tokens', n, d)} AS grams FROM tokn), "
        "pos AS MATERIALIZED (SELECT doc_id, i AS pos, "
        f"{g} AS s FROM (SELECT doc_id, grams, "
        "unnest(range(1, len(grams) + 1)) AS i FROM gr) t), "
        # ev feeds both the hot aggregate and the anti-join: MATERIALIZED
        # or DuckDB re-inlines it per reference (doubled pos scan)
        f"ev AS MATERIALIZED (SELECT doc_id AS eval_doc, pos AS epos, s FROM pos "
        f"WHERE doc_id % {eval_mod} = 0), "
        f"{hot_filter}"
        "tr AS (SELECT doc_id AS train_doc, pos AS tpos, s FROM pos "
        f"WHERE doc_id % {eval_mod} <> 0), "
        "hits AS (SELECT train_doc, eval_doc, tpos - epos AS diag, tpos "
        f"FROM tr JOIN {ev_src} USING (s)), "
        "runs AS (SELECT train_doc, eval_doc, diag, "
        "tpos - row_number() OVER (PARTITION BY train_doc, eval_doc, diag "
        "ORDER BY tpos) AS isl FROM hits), "
        "rl AS (SELECT train_doc, eval_doc, diag, isl, count(*) AS run_len "
        "FROM runs GROUP BY 1, 2, 3, 4) "
        "SELECT train_doc, eval_doc, CAST(sum(run_len) AS BIGINT) AS n_matched, "
        "CAST(count(*) AS BIGINT) AS n_spans, CAST(max(run_len) AS BIGINT) AS max_run, "
        f"CAST(max(run_len) + {n - 1} AS BIGINT) AS longest_span_tokens "
        "FROM rl GROUP BY 1, 2 "
        f"HAVING sum(run_len) >= {min_matched}"
    )
