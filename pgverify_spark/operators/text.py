"""Text-analysis operators for large-scale document pipelines.

Beyond-reference extensions (the reference has no text processing —
SURVEY.md §2.3): per-document statistics, quality scoring, n-gram
heuristic language ID, and content fingerprints over a ``documents``
table (``doc_id``, ``text``, ...).  Everything is built from the
dual-dialect expressions in :mod:`pgverify_spark.functions.text_exprs`,
so each operator has a DuckDB oracle twin.

Scale: all operators are embarrassingly parallel single-pass
projections/aggregations — no shuffle except where grouping is the
semantics (language histograms).  The token pipeline stays entirely in
JVM whole-stage codegen (HOFs over split arrays, no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgverify_spark.functions.canonical import DIALECT_DUCKDB, DIALECT_SPARK
from pgverify_spark.operators.util import barrier as _barrier
from pgverify_spark.functions.text_exprs import (
    LANG_STOPWORDS,
    _rx,
    _size,
    norm_sql,
    simhash_sql,
    stopword_hits_sql,
    token_hashes_sql,
    tokens_sql,
)


def _stats_exprs(dialect: str, text: str = "text") -> tuple[list[str], list[str], str]:
    """(prep exprs, metric exprs, quality expr) shared by both dialects."""
    punct = _rx("[.,;:!?]", dialect)
    digit = _rx("[0-9]", dialect)
    flags = "" if dialect == DIALECT_SPARK else ", 'g'"
    raw_len = f"length({text})"
    n_tok = _size("tokens", dialect)
    exprs = [
        f"{norm_sql(text, dialect)} AS norm",
        f"{tokens_sql(text, dialect)} AS tokens",
    ]
    metrics = [
        "doc_id",
        f"CAST({n_tok} AS BIGINT) AS n_tokens",
        f"CAST(length(norm) AS BIGINT) AS n_chars_norm",
        # tokens are single-space joined in norm, so total token chars =
        # length(norm) - (n_tokens - 1)
        f"round(CAST(length(norm) - {n_tok} + 1 AS DOUBLE) / greatest({n_tok}, 1), 6) AS avg_token_len",
        f"round(CAST(length({text}) - length(regexp_replace({text}, {punct}, ''{flags})) AS DOUBLE)"
        f" / greatest({raw_len}, 1), 6) AS punct_ratio",
        f"round(CAST(length({text}) - length(regexp_replace({text}, {digit}, ''{flags})) AS DOUBLE)"
        f" / greatest({raw_len}, 1), 6) AS digit_ratio",
        f"round(CAST({stopword_hits_sql('tokens', 'en', dialect)} AS DOUBLE)"
        f" / greatest({n_tok}, 1), 6) AS stopword_ratio",
    ]
    # quality: length saturation x (1 - punctuation excess), rational
    # arithmetic only (no exp/log whose last-ulp could differ per libm)
    quality = (
        "round((CAST(n_tokens AS DOUBLE) / (n_tokens + 20.0)) * "
        "(1.0 - least(punct_ratio * 2.0, 1.0)), 6) AS quality_score"
    )
    return exprs, metrics, quality


def text_stats(df: DataFrame) -> DataFrame:
    """Per-document stats: token/char counts, punctuation/digit/stopword
    ratios, and a rational quality score."""
    exprs, metrics, quality = _stats_exprs(DIALECT_SPARK)
    prep = _barrier(df.selectExpr("doc_id", "text", *exprs))
    return prep.selectExpr(*metrics).selectExpr("*", quality)


def tokenize_prep(df: DataFrame) -> DataFrame:
    """The shared tokenization layer:
    (doc_id, text, pgvs_norm, pgvs_tokens).

    A composed pipeline PERSISTS this once and feeds it to every
    tokenizing stage — :func:`gopher_gate` and the dedup/contamination
    shingle layers all skip their own tokenize pass when they see the
    ``pgvs_``-prefixed columns.  The prefix is the opt-in: a USER corpus
    that happens to carry its own ``tokens`` column (a different
    tokenizer) must NOT silently replace this engine's tokenization —
    that would diverge from the DuckDB oracle twins, which always
    tokenize from ``text``.  CONTRACT: the caller must materialize
    (persist/checkpoint) the returned relation before fan-out; the
    stored column is what makes the stages' repeated array references
    cheap.  Trade at scale: the cached corpus carries text + tokens
    (~2x bytes) in exchange for one regexp tokenization pass and one
    barrier exchange instead of one per stage."""
    exprs, _, _ = _stats_exprs(DIALECT_SPARK)
    return _barrier(df.selectExpr("doc_id", "text", *exprs)).selectExpr(
        "doc_id", "text", "norm AS pgvs_norm", "tokens AS pgvs_tokens"
    )


def text_stats_oracle_sql(table: str) -> str:
    exprs, metrics, quality = _stats_exprs(DIALECT_DUCKDB)
    return (
        f"SELECT *, {quality} FROM (SELECT {', '.join(metrics)} FROM "
        f"(SELECT doc_id, text, {', '.join(exprs)} FROM {table}) t1) t2"
    )


#: GPT-2-ish pre-tokenizer: contractions, letter runs, digit runs,
#: punctuation runs, whitespace runs.  ASCII classes only so Java regex
#: (Spark) and RE2 (DuckDB) match identically.
BPE_ISH_PATTERN = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"


def _bpe_rx(dialect: str) -> str:
    """Pattern as a SQL string literal (quote-escape the contraction
    apostrophes; Spark literals additionally eat one backslash level)."""
    p = BPE_ISH_PATTERN.replace("'", "''")
    if dialect == DIALECT_SPARK:
        p = p.replace("\\", "\\\\")
    return f"'{p}'"


def token_counts(df: DataFrame) -> DataFrame:
    """Token counts per document: whitespace tokens and BPE-ish
    pre-tokenizer matches (the standard proxy for LLM token budgeting;
    a real BPE vocab merge only subdivides these matches further).

    Pure projection — no shuffle, partitioning inherited from the scan.
    """
    n_ws = _size(tokens_sql("text", DIALECT_SPARK), DIALECT_SPARK)
    n_bpe = f"size(regexp_extract_all(text, {_bpe_rx(DIALECT_SPARK)}, 0))"
    return df.selectExpr(
        "doc_id",
        f"CAST({n_ws} AS BIGINT) AS n_ws_tokens",
        f"CAST({n_bpe} AS BIGINT) AS n_bpe_tokens",
    )


def token_counts_oracle_sql(table: str) -> str:
    d = DIALECT_DUCKDB
    n_ws = _size(tokens_sql("text", d), d)
    n_bpe = f"len(regexp_extract_all(text, {_bpe_rx(d)}))"
    return (
        f"SELECT doc_id, CAST({n_ws} AS BIGINT) AS n_ws_tokens, "
        f"CAST({n_bpe} AS BIGINT) AS n_bpe_tokens FROM {table}"
    )


def rolling_fingerprint(df: DataFrame, k: int = 8, mod: int = 16) -> DataFrame:
    """Winnowing-style content-defined fingerprints per document: the
    ~1/mod char-k-gram hashes selected by ``hash % mod == 0``.  Two
    documents sharing a run of >= k+mod chars almost surely share a
    selected fingerprint, so the exploded (fp -> doc) inverted index
    finds partial-overlap/plagiarism pairs the way shingle dedup finds
    near-identical ones.  Output: (doc_id, n_fps, fps)."""
    from pgverify_spark.functions.text_exprs import rolling_fps_sql

    norm = f"coalesce({norm_sql('text', DIALECT_SPARK)}, '')"
    fps = rolling_fps_sql("norm", DIALECT_SPARK, k, mod)
    return (
        _barrier(df.selectExpr("doc_id", f"{norm} AS norm"))
        .selectExpr("doc_id", f"{fps} AS fps")
        .selectExpr(
            "doc_id",
            "CAST(CASE WHEN fps = '' THEN 0 ELSE size(split(fps, ',')) END AS BIGINT) AS n_fps",
            "fps",
        )
    )


def rolling_fingerprint_oracle_sql(table: str, k: int = 8, mod: int = 16) -> str:
    from pgverify_spark.functions.text_exprs import rolling_fps_sql

    d = DIALECT_DUCKDB
    norm = f"coalesce({norm_sql('text', d)}, '')"
    fps = rolling_fps_sql("norm", d, k, mod)
    return (
        "SELECT doc_id, CAST(CASE WHEN fps = '' THEN 0 ELSE len(string_split(fps, ',')) END AS BIGINT) AS n_fps, fps FROM "
        f"(SELECT doc_id, {fps} AS fps FROM "
        f"(SELECT doc_id, {norm} AS norm FROM {table}) t1) t2"
    )


def _langid_exprs(dialect: str) -> tuple[list[str], str, str]:
    hits = [
        f"{stopword_hits_sql('tokens', lang, dialect)} AS hits_{lang}"
        for lang in LANG_STOPWORDS
    ]
    # deterministic argmax: first language (in declaration order) whose
    # hit count equals the maximum
    best = f"greatest({', '.join('hits_' + l for l in LANG_STOPWORDS)})"
    lang_case = "CASE " + " ".join(
        f"WHEN hits_{l} = best THEN '{l}'" for l in LANG_STOPWORDS
    ) + " END"
    return hits, best, lang_case


def language_id(df: DataFrame) -> DataFrame:
    """N-gram-heuristic language ID: stopword-hit votes per language,
    deterministic-tie-break argmax, confidence = hits/tokens."""
    hits, best, lang_case = _langid_exprs(DIALECT_SPARK)
    n_tok = _size("tokens", DIALECT_SPARK)
    return (
        _barrier(df.selectExpr("doc_id", f"{tokens_sql('text', DIALECT_SPARK)} AS tokens"))
        .selectExpr("doc_id", f"CAST({n_tok} AS BIGINT) AS n_tokens", *hits)
        .selectExpr("*", f"{best} AS best")
        .selectExpr(
            "doc_id",
            f"CASE WHEN best = 0 THEN 'und' ELSE {lang_case} END AS lang",
            "round(CAST(best AS DOUBLE) / greatest(n_tokens, 1), 6) AS confidence",
        )
    )


def language_id_oracle_sql(table: str) -> str:
    hits, best, lang_case = _langid_exprs(DIALECT_DUCKDB)
    n_tok = _size("tokens", DIALECT_DUCKDB)
    return (
        "SELECT doc_id, "
        f"CASE WHEN best = 0 THEN 'und' ELSE {lang_case} END AS lang, "
        "round(CAST(best AS DOUBLE) / greatest(n_tokens, 1), 6) AS confidence FROM "
        f"(SELECT *, {best} AS best FROM "
        f"(SELECT doc_id, CAST({n_tok} AS BIGINT) AS n_tokens, {', '.join(hits)} FROM "
        f"(SELECT doc_id, {tokens_sql('text', DIALECT_DUCKDB)} AS tokens FROM {table}) t1) t2) t3"
    )


def doc_fingerprints(df: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of normalized text + 48-bit SimHash."""
    return (
        _barrier(
            df.selectExpr(
                "doc_id",
                f"{norm_sql('text', DIALECT_SPARK)} AS norm",
                f"{token_hashes_sql(tokens_sql('text', DIALECT_SPARK), DIALECT_SPARK)} AS th",
            )
        )
        .selectExpr(
            "doc_id",
            "md5(norm) AS content_md5",
            f"{simhash_sql('th', DIALECT_SPARK)} AS simhash",
        )
    )


def doc_fingerprints_oracle_sql(table: str) -> str:
    return (
        "SELECT doc_id, md5(norm) AS content_md5, "
        f"{simhash_sql('th', DIALECT_DUCKDB)} AS simhash FROM "
        f"(SELECT doc_id, {norm_sql('text', DIALECT_DUCKDB)} AS norm, "
        f"{token_hashes_sql(tokens_sql('text', DIALECT_DUCKDB), DIALECT_DUCKDB)} AS th "
        f"FROM {table}) t"
    )


def topk_ngrams(df: DataFrame, n: int = 3, k: int = 50) -> DataFrame:
    """Corpus-level most-frequent word n-grams: (gram, n_occurrences).

    Scale shape: explode -> hash groupBy with map-side combine (each
    mapper emits one partial count per *distinct* gram, so the shuffle
    carries vocabulary size, not corpus size) -> global top-k via
    TakeOrderedAndProject (every task keeps k rows, the driver merges k
    per task — no global sort).  Ties at the k boundary break on the
    gram string, so the selected set is deterministic cross-engine.
    """
    from pgverify_spark.functions.text_exprs import ngrams_sql
    from pyspark.sql import functions as F

    grams = (
        _barrier(df.selectExpr(f"{tokens_sql('text', DIALECT_SPARK)} AS tokens"))
        .filter(f"size(tokens) >= {n}")
        .selectExpr(f"explode({ngrams_sql('tokens', n, DIALECT_SPARK)}) AS gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
    )


def topk_ngrams_oracle_sql(table: str, n: int = 3, k: int = 50) -> str:
    from pgverify_spark.functions.text_exprs import ngrams_sql

    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT {tokens_sql('text', d)} AS tokens FROM {table}), "
        f"tokn AS (SELECT * FROM tok WHERE len(tokens) >= {n}), "
        f"g AS (SELECT unnest({ngrams_sql('tokens', n, d)}) AS gram FROM tokn) "
        "SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram "
        f"ORDER BY n_occurrences DESC, gram ASC LIMIT {k}"
    )


def quality_filter(
    df: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_digit_ratio: float = 0.3,
    langs: tuple[str, ...] = (),
) -> DataFrame:
    """Corpus curation gate: keep documents passing the standard quality
    bar (score, length, digit-spam, optional language allowlist by the
    n-gram language ID).  Output: kept (doc_id, quality_score, lang_id).

    The composition every training-data pipeline runs after scoring —
    here it is ONE plan: stats, language ID and predicates fuse into a
    single-pass projection + filter (no shuffle, no join — language ID
    and stats both derive from the same token array), so the gate costs
    one scan at any scale and Catalyst prunes unused stat columns.
    """
    exprs, metrics, quality = _stats_exprs(DIALECT_SPARK)
    hits, best, lang_case = _langid_exprs(DIALECT_SPARK)
    prep = _barrier(df.selectExpr("doc_id", "text", *exprs))
    scored = (
        prep.selectExpr(*metrics, *hits)
        .selectExpr("*", f"{best} AS best")
        .selectExpr(
            "doc_id",
            "n_tokens",
            "digit_ratio",
            quality,
            f"CASE WHEN best = 0 THEN 'und' ELSE {lang_case} END AS lang_id",
        )
    )
    pred = (
        f"quality_score >= {min_quality} AND n_tokens >= {min_tokens} "
        f"AND digit_ratio <= {max_digit_ratio}"
    )
    if langs:
        quoted = ", ".join(f"'{l}'" for l in langs)
        pred += f" AND lang_id IN ({quoted})"
    return scored.filter(pred).select("doc_id", "quality_score", "lang_id")


def quality_filter_oracle_sql(
    table: str,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_digit_ratio: float = 0.3,
    langs: tuple[str, ...] = (),
) -> str:
    exprs, metrics, quality = _stats_exprs(DIALECT_DUCKDB)
    hits, best, lang_case = _langid_exprs(DIALECT_DUCKDB)
    pred = (
        f"quality_score >= {min_quality} AND n_tokens >= {min_tokens} "
        f"AND digit_ratio <= {max_digit_ratio}"
    )
    if langs:
        quoted = ", ".join(f"'{l}'" for l in langs)
        pred += f" AND lang_id IN ({quoted})"
    return (
        "SELECT doc_id, quality_score, lang_id FROM "
        f"(SELECT *, {quality}, "
        f"CASE WHEN best = 0 THEN 'und' ELSE {lang_case} END AS lang_id FROM "
        f"(SELECT *, {best} AS best FROM "
        f"(SELECT {', '.join(metrics)}, {', '.join(hits)} FROM "
        f"(SELECT doc_id, text, {', '.join(exprs)} FROM {table}) t1) t2) t3) t4 "
        f"WHERE {pred}"
    )


def _max_run_spark(sorted_arr: str) -> str:
    """Max frequency of any element = longest equal-run in a sorted array,
    via one aggregate() fold (whole-stage codegen, zero shuffle)."""
    bump = (
        "CASE WHEN acc.prev IS NOT NULL AND x = acc.prev "
        "THEN acc.run + CAST(1 AS BIGINT) ELSE CAST(1 AS BIGINT) END"
    )
    return (
        f"aggregate({sorted_arr}, "
        "struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run, CAST(0 AS BIGINT) AS best), "
        f"(acc, x) -> struct(x AS prev, {bump} AS run, greatest(acc.best, {bump}) AS best), "
        "acc -> acc.best)"
    )


def repetition_stats(df: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition signals: distinct-token
    fraction, most-frequent-token occupancy, most-frequent-bigram
    occupancy.  High top-bigram occupancy (> ~0.18 in the Gopher rules)
    marks boilerplate/spam for the curation gate.

    Scale shape: pure per-row projection — max frequency is the longest
    equal-run of the *sorted* token/bigram array, computed by one
    ``aggregate()`` fold per array entirely inside whole-stage codegen;
    no explode, no shuffle, partitioning inherited from the scan.  The
    DuckDB oracle intentionally uses the opposite formulation
    (unnest + GROUP BY + max(count)) so the two engines cross-check each
    other's counting logic, not a shared expression.
    """
    from pgverify_spark.functions.text_exprs import ngrams_sql

    d = DIALECT_SPARK
    prep = _barrier(
        df.selectExpr("doc_id", f"{tokens_sql('text', d)} AS tokens")
    ).selectExpr(
        "doc_id",
        "tokens",
        f"{ngrams_sql('tokens', 2, d)} AS bigrams",
    )
    n_tok = "size(tokens)"
    n_bi = "size(bigrams)"
    return prep.selectExpr(
        "doc_id",
        f"CAST({n_tok} AS BIGINT) AS n_tokens",
        f"round(CAST(size(array_distinct(tokens)) AS DOUBLE) / greatest({n_tok}, 1), 6) AS distinct_token_frac",
        f"round(CAST({_max_run_spark('array_sort(tokens)')} AS DOUBLE) / greatest({n_tok}, 1), 6) AS top_token_frac",
        f"round(CAST({_max_run_spark('array_sort(bigrams)')} AS DOUBLE) / greatest({n_bi}, 1), 6) AS top_bigram_frac",
    )


def repetition_stats_oracle_sql(table: str) -> str:
    from pgverify_spark.functions.text_exprs import ngrams_sql

    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}), "
        f"base AS (SELECT doc_id, tokens, {ngrams_sql('tokens', 2, d)} AS bigrams FROM tok), "
        "tf AS (SELECT doc_id, max(c) AS max_tok FROM "
        "(SELECT doc_id, w, count(*) AS c FROM (SELECT doc_id, unnest(tokens) AS w FROM base) x "
        "GROUP BY 1, 2) y GROUP BY 1), "
        "bf AS (SELECT doc_id, max(c) AS max_bi FROM "
        "(SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(bigrams) AS g FROM base) x "
        "GROUP BY 1, 2) y GROUP BY 1) "
        "SELECT base.doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
        "round(CAST(len(list_distinct(tokens)) AS DOUBLE) / greatest(len(tokens), 1), 6) AS distinct_token_frac, "
        "round(CAST(coalesce(max_tok, 0) AS DOUBLE) / greatest(len(tokens), 1), 6) AS top_token_frac, "
        "round(CAST(coalesce(max_bi, 0) AS DOUBLE) / greatest(len(bigrams), 1), 6) AS top_bigram_frac "
        "FROM base LEFT JOIN tf ON base.doc_id = tf.doc_id "
        "LEFT JOIN bf ON base.doc_id = bf.doc_id"
    )


def _gopher_rules(
    min_tokens: int,
    max_tokens: int,
    max_digit_ratio: float,
    max_punct_ratio: float,
    min_stopword_ratio: float,
    min_distinct_frac: float,
    max_top_token_frac: float,
    max_top_bigram_frac: float,
) -> tuple[tuple[str, str], ...]:
    """(rule name, FAIL predicate) pairs — dialect-neutral SQL over the
    scored metric columns, in fixed declaration order so the joined
    ``reasons`` string is byte-identical in both engines."""
    return (
        ("too_few_tokens", f"n_tokens < {min_tokens}"),
        ("too_many_tokens", f"n_tokens > {max_tokens}"),
        ("word_length", "avg_token_len < 3.0 OR avg_token_len > 10.0"),
        ("digit_heavy", f"digit_ratio > {max_digit_ratio}"),
        ("punct_heavy", f"punct_ratio > {max_punct_ratio}"),
        ("low_stopwords", f"stopword_ratio < {min_stopword_ratio}"),
        ("low_diversity", f"distinct_token_frac < {min_distinct_frac}"),
        ("top_token_spam", f"top_token_frac > {max_top_token_frac}"),
        ("top_bigram_spam", f"top_bigram_frac > {max_top_bigram_frac}"),
    )


def gopher_gate(
    df: DataFrame,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    max_digit_ratio: float = 0.3,
    max_punct_ratio: float = 0.15,
    min_stopword_ratio: float = 0.0,
    min_distinct_frac: float = 0.3,
    max_top_token_frac: float = 0.2,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-style composite quality gate with per-rule ATTRIBUTION —
    unlike :func:`quality_filter` (which silently keeps) this scores
    EVERY document and reports which rules it failed, the view a
    curation team audits before committing to thresholds (Rae et al.
    2021's repetition + length + symbol rules, thresholds
    parameterized).

    Output: (doc_id, keep, n_fail, reasons) — ``reasons`` is the
    comma-joined failing rule names in fixed declaration order ('' when
    keep).

    Scale shape: ONE projection pass — the length/symbol stats and the
    repetition signals (sorted-array equal-run folds, no explode) fuse
    over the same token array; rule predicates and the reasons join are
    a constant cascade of codegen'd CASEs.  No shuffle anywhere.
    """
    from pgverify_spark.functions.text_exprs import ngrams_sql

    d = DIALECT_SPARK
    exprs, metrics, _ = _stats_exprs(d)
    rules = _gopher_rules(
        min_tokens, max_tokens, max_digit_ratio, max_punct_ratio,
        min_stopword_ratio, min_distinct_frac, max_top_token_frac,
        max_top_bigram_frac,
    )
    # Accept a caller-tokenized corpus (the tokenize_prep contract: the
    # pgvs_-prefixed columns are this engine's own tokenization, backed
    # by a MATERIALIZED relation) so a composed pipeline tokenizes once
    # for gate + dedup + contamination instead of once per stage.  A
    # user column merely NAMED norm/tokens never triggers this.
    if {"pgvs_norm", "pgvs_tokens"}.issubset(df.columns):
        prep = df.selectExpr(
            "doc_id", "text", "pgvs_norm AS norm", "pgvs_tokens AS tokens"
        )
    else:
        prep = _barrier(df.selectExpr("doc_id", "text", *exprs))
    base = _barrier(
        prep.selectExpr(
            "doc_id", "text", "norm", "tokens",
            f"{ngrams_sql('tokens', 2, d)} AS bigrams",
        )
    )
    n_tok = "size(tokens)"
    scored = base.selectExpr(
        *metrics,
        f"round(CAST(size(array_distinct(tokens)) AS DOUBLE) / greatest({n_tok}, 1), 6) AS distinct_token_frac",
        f"round(CAST({_max_run_spark('array_sort(tokens)')} AS DOUBLE) / greatest({n_tok}, 1), 6) AS top_token_frac",
        f"round(CAST({_max_run_spark('array_sort(bigrams)')} AS DOUBLE) / greatest(size(bigrams), 1), 6) AS top_bigram_frac",
    )
    return scored.selectExpr("doc_id", *_gate_exprs(rules))


def _gate_exprs(rules: tuple[tuple[str, str], ...]) -> list[str]:
    """keep / n_fail / reasons projections (dialect-neutral: concat_ws
    skips NULL arguments in both Spark and DuckDB)."""
    n_fail = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for _, p in rules)
    reasons = ", ".join(f"CASE WHEN {p} THEN '{n}' END" for n, p in rules)
    return [
        f"CAST(({n_fail}) = 0 AS BOOLEAN) AS keep",
        f"CAST({n_fail} AS BIGINT) AS n_fail",
        f"concat_ws(',', {reasons}) AS reasons",
    ]


def gopher_gate_oracle_sql(
    table: str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    max_digit_ratio: float = 0.3,
    max_punct_ratio: float = 0.15,
    min_stopword_ratio: float = 0.0,
    min_distinct_frac: float = 0.3,
    max_top_token_frac: float = 0.2,
    max_top_bigram_frac: float = 0.18,
) -> str:
    """DuckDB twin: stats via the shared expression builders, repetition
    via the deliberately-different unnest+GROUP BY formulation
    (:func:`repetition_stats_oracle_sql`), joined on doc_id — the gate
    cross-checks both counting strategies."""
    exprs, metrics, _ = _stats_exprs(DIALECT_DUCKDB)
    rules = _gopher_rules(
        min_tokens, max_tokens, max_digit_ratio, max_punct_ratio,
        min_stopword_ratio, min_distinct_frac, max_top_token_frac,
        max_top_bigram_frac,
    )
    gate = ", ".join(_gate_exprs(rules))
    return (
        f"WITH s AS (SELECT {', '.join(metrics)} FROM "
        f"(SELECT doc_id, text, {', '.join(exprs)} FROM {table}) t1), "
        f"r AS ({repetition_stats_oracle_sql(table)}), "
        "j AS (SELECT s.doc_id, s.n_tokens, s.avg_token_len, s.punct_ratio, "
        "s.digit_ratio, s.stopword_ratio, r.distinct_token_frac, "
        "r.top_token_frac, r.top_bigram_frac FROM s JOIN r ON s.doc_id = r.doc_id) "
        f"SELECT doc_id, {gate} FROM j"
    )


def length_histogram(df: DataFrame, bucket_width: int = 50) -> DataFrame:
    """Exact fixed-width histogram of document lengths: one row per
    occupied bucket with (bucket, lo, hi, n_docs, n_chars_total).

    The corpus-report shape: a groupBy on ``length(text) div width`` whose
    shuffle carries one partial row per *occupied bucket* per task
    (map-side combine), i.e. KBs at any corpus size — the full scan is
    the only real cost, and Catalyst prunes to the one needed column.
    For quantiles over un-bucketable domains use
    ``percentile_approx``/``approx_percentile`` (a mergeable sketch, same
    single-shuffle shape but ±eps rank error) — the histogram here stays
    exact, which is what an oracle-paired correctness gate needs.
    """
    from pyspark.sql import functions as F

    return (
        df.selectExpr(f"CAST(length(text) DIV {bucket_width} AS BIGINT) AS bucket",
                      "length(text) AS len")
        .groupBy("bucket")
        .agg(
            F.expr(f"CAST(min(bucket) * {bucket_width} AS BIGINT)").alias("lo"),
            F.expr(f"CAST(min(bucket) * {bucket_width} + {bucket_width - 1} AS BIGINT)").alias("hi"),
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("CAST(sum(len) AS BIGINT)").alias("n_chars_total"),
        )
    )


def length_histogram_oracle_sql(table: str, bucket_width: int = 50) -> str:
    return (
        f"SELECT bucket, CAST(bucket * {bucket_width} AS BIGINT) AS lo, "
        f"CAST(bucket * {bucket_width} + {bucket_width - 1} AS BIGINT) AS hi, "
        "count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS n_chars_total FROM "
        f"(SELECT CAST(length(text) // {bucket_width} AS BIGINT) AS bucket, "
        f"length(text) AS len FROM {table}) t GROUP BY bucket"
    )


def dedup_lines(df: DataFrame) -> DataFrame:
    """Per-document repeated-line removal — the Gopher/C4-style cleaning
    rule that strips boilerplate a page repeats within itself (nav bars,
    cookie banners, list refrains): every line keeps only its FIRST
    occurrence inside the document, order otherwise preserved.

    Output: (doc_id, n_lines, n_dup_lines, clean_text).

    Scale shape: a pure per-row projection — zero exchanges, zero
    Python; the first-occurrence filter is an index-aware array lambda
    (``array_position(l, x) == i + 1``) inside whole-stage codegen.
    Per-doc cost is O(lines²) string compares, bounded by document size,
    embarrassingly parallel.
    """
    return df.selectExpr(
        "doc_id",
        "split(coalesce(text, ''), chr(10)) AS l",
    ).selectExpr(
        "doc_id",
        "CAST(size(l) AS BIGINT) AS n_lines",
        "CAST(size(l) - size(filter(l, (x, i) -> array_position(l, x) == i + 1)) AS BIGINT)"
        " AS n_dup_lines",
        "array_join(filter(l, (x, i) -> array_position(l, x) == i + 1), chr(10))"
        " AS clean_text",
    )


def dedup_lines_oracle_sql(table: str) -> str:
    """DuckDB twin: RE2-free first-occurrence keep via
    ``list_position(l, l[i]) = i`` over a 1-based index range."""
    keep = "list_filter(range(1, len(l) + 1), i -> list_position(l, l[i]) = i)"
    return (
        "SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines, "
        f"CAST(len(l) - len({keep}) AS BIGINT) AS n_dup_lines, "
        f"array_to_string(list_transform({keep}, i -> l[i]), chr(10)) AS clean_text "
        f"FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS l "
        f"FROM {table}) t"
    )


def corpus_dedup_lines(df: DataFrame) -> DataFrame:
    """CROSS-corpus line-level dedup — the CCNet/C4 cleaning step that
    :func:`dedup_lines` (per-document) doesn't cover: a line duplicated
    ACROSS documents (shared boilerplate, syndicated paragraphs, cookie
    banners) keeps only its globally-first occurrence (smallest
    ``(doc_id, pos)``); whitespace-only lines are structural and always
    kept.

    Output: (doc_id, n_lines, n_removed, clean_text).

    Scale shape: explode to (doc_id, pos, line); per-line winners via
    ``groupBy(line).agg(min(struct(doc_id, pos)))`` — a hash aggregate
    with map-side combine, so a line repeated 10^9 times still reduces
    to partial minima per input partition (a window
    ``row_number() OVER (PARTITION BY line)`` would funnel every copy of
    a hot line through one reducer — the skew CCNet's shard-hash design
    avoids, and why this is an aggregate+join, not a window); then one
    equi-join back on line and a per-doc reconstruction aggregate.  Two
    shuffles of the exploded corpus — inherent to a global
    first-occurrence policy — plus one of the winner table.
    """
    from pyspark.sql import functions as F

    lines = df.selectExpr(
        "doc_id", "posexplode(split(coalesce(text, ''), chr(10))) AS (pos, line)"
    )
    winners = lines.groupBy("line").agg(F.min(F.struct("doc_id", "pos")).alias("w"))
    kept = lines.join(winners, "line").selectExpr(
        "doc_id",
        "pos",
        "line",
        "trim(line) = '' OR (doc_id = w.doc_id AND pos = w.pos) AS keep",
    )
    return kept.groupBy("doc_id").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_lines"),
        F.expr("CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)").alias(
            "n_removed"
        ),
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(CASE WHEN keep THEN struct(pos, line) END)), "
            "s -> s.line), chr(10))"
        ).alias("clean_text"),
    )


def corpus_dedup_lines_oracle_sql(table: str) -> str:
    """DuckDB twin: the window formulation (rn = 1 over (doc_id, pos)
    order) — semantically identical to the min-struct winner because
    (doc_id, pos) is unique; positions are 1-based here vs Spark's
    0-based, which cannot change which occurrence is first."""
    return (
        "WITH x AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, "
        "unnest(l) AS line FROM (SELECT doc_id, "
        f"string_split(coalesce(text, ''), chr(10)) AS l FROM {table}) t), "
        "w AS (SELECT doc_id, pos, line, row_number() OVER "
        "(PARTITION BY line ORDER BY doc_id, pos) AS rn FROM x), "
        "k AS (SELECT doc_id, pos, line, (trim(line) = '' OR rn = 1) AS keep "
        "FROM w) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed, "
        "coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) "
        "ORDER BY pos), '') AS clean_text "
        "FROM k GROUP BY doc_id"
    )


def hashed_vectors(df: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-hashed (signed hashing-trick) bag-of-words vectors —
    a model-free text→vector path: each token adds ±1 to the hash
    bucket ``md5(token) % dim``, sign drawn from the next hash bit
    (Weinberger et al. 2009, the construction behind
    HashingVectorizer / Spark MLlib's HashingTF, plus the sign trick
    that makes the inner product unbiased).  The derived column plugs
    straight into the embedding operators: cosine top-k, LSH, k-means
    run on text alone, no model in the loop.

    Output: (doc_id, vec array<bigint>) — integer counts, so the
    vector (not just a similarity) is bit-identical across engines.

    Scale shape: zero exchanges — one md5 per token into a (bucket,
    sign) struct array (barrier stops CollapseProject from re-inlining
    the md5 ``dim`` times), then a per-dimension in-row fold.  Per-row
    cost O(dim × tokens) integer adds inside whole-stage codegen; at
    100 TB this is scan-bound like every single-pass text operator.
    """
    d = DIALECT_SPARK
    from pgverify_spark.functions.canonical import hex_prefix_int_sql

    h = hex_prefix_int_sql("md5(x)", d, 15)
    bs = (
        f"transform({tokens_sql('text', d)}, x -> "
        f"struct(CAST({h} % {dim} AS BIGINT) AS b, "
        f"CAST(CASE WHEN ({h} DIV {dim}) % 2 = 0 THEN 1 ELSE -1 END AS BIGINT) AS s))"
    )
    prep = _barrier(df.selectExpr("doc_id", f"{bs} AS bs"))
    vec = (
        f"transform(sequence(0, {dim - 1}), i -> "
        "aggregate(bs, CAST(0 AS BIGINT), "
        "(acc, p) -> acc + CASE WHEN p.b = i THEN p.s ELSE CAST(0 AS BIGINT) END))"
    )
    return prep.selectExpr("doc_id", f"{vec} AS vec")


def hashed_vectors_oracle_sql(table: str, dim: int = 64) -> str:
    from pgverify_spark.functions.canonical import hex_prefix_int_sql

    d = DIALECT_DUCKDB
    h = hex_prefix_int_sql("md5(x)", d, 15)
    bs = (
        f"list_transform({tokens_sql('text', d)}, x -> "
        f"struct_pack(b := CAST({h} % {dim} AS BIGINT), "
        f"s := CAST(CASE WHEN ({h} // {dim}) % 2 = 0 THEN 1 ELSE -1 END AS BIGINT)))"
    )
    vec = (
        f"list_transform(range(0, {dim}), i -> CAST(coalesce(list_sum("
        "list_transform(bs, p -> CASE WHEN p.b = i THEN p.s ELSE 0 END)"
        "), 0) AS BIGINT))"
    )
    return (
        f"SELECT doc_id, {vec} AS vec FROM "
        f"(SELECT doc_id, {bs} AS bs FROM {table}) t"
    )


#: PII patterns (ASCII-only so Java regex and RE2 match identically; no
#: lookaround/backreferences, which RE2 lacks).  Order matters: URLs are
#: redacted before emails so ``http://user@host`` doesn't double-count.
PII_PATTERNS = (
    ("url", "https?://[^ ]+"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("phone", "\\+[0-9]{7,15}"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}"),
)


def scrub_pii(df: DataFrame) -> DataFrame:
    """Redact URLs / emails / international phone numbers / IPv4s,
    returning the cleaned text plus per-kind match counts — the standard
    pre-training privacy scrub.

    Pure projection: counts come from ``regexp_extract_all`` and the
    redaction chains ``regexp_replace`` per kind *in declaration order*
    (each sees the previous kind's output, so overlapping matches
    resolve deterministically in both engines).  No shuffle, no Python —
    regex evaluation stays in whole-stage codegen, and at 100 TB this is
    scan-bound like every other single-pass text operator.
    """
    from pgverify_spark.functions.text_exprs import _rx

    d = DIALECT_SPARK
    counts = [
        f"CAST(size(regexp_extract_all(text, {_rx(p, d)}, 0)) AS BIGINT) AS n_{kind}"
        for kind, p in PII_PATTERNS
    ]
    clean = "text"
    for kind, p in PII_PATTERNS:
        clean = f"regexp_replace({clean}, {_rx(p, d)}, '<{kind.upper()}>')"
    return df.selectExpr("doc_id", *counts, f"{clean} AS clean_text")


def scrub_pii_oracle_sql(table: str) -> str:
    from pgverify_spark.functions.text_exprs import _rx

    d = DIALECT_DUCKDB
    counts = [
        f"CAST(len(regexp_extract_all(text, {_rx(p, d)})) AS BIGINT) AS n_{kind}"
        for kind, p in PII_PATTERNS
    ]
    clean = "text"
    for kind, p in PII_PATTERNS:
        clean = f"regexp_replace({clean}, {_rx(p, d)}, '<{kind.upper()}>', 'g')"
    return f"SELECT doc_id, {', '.join(counts)}, {clean} AS clean_text FROM {table}"


def tfidf_top_terms(df: DataFrame, k: int = 5) -> DataFrame:
    """Top-k characteristic terms per document by a TF-IDF-style score.

    Score = ``tf * (N + 1) / (df + 1)`` — the classical shape with the
    log dropped: log is monotone, so per-document ranking is unchanged,
    and the rational form is bit-reproducible across engines (libm log
    implementations differ in final ulps; IEEE divide does not).

    Scale shape: term frequencies are computed *inside each row* by a
    HOF over the token array (``transform(array_distinct(...))`` +
    ``filter`` count — quadratic in tokens-per-doc, linear in corpus),
    so the classic explode + groupBy(doc, term) shuffle — corpus-sized —
    never happens; ``inline`` then emits the already-aggregated (doc,
    term, tf) stream.  Document frequency is one vocab-sized aggregate
    over that stream, the term-keyed join back fans out exactly the
    inverted index (inherent), and top-k per doc is a row_number window
    partitioned by doc_id — no global sort.  Ties break on the term
    string so the selected set is deterministic cross-engine.  The
    persist is load-bearing for the same reason as dedup's ``_shingled``:
    three consumers (tf stream, document count, and the join) would
    otherwise each re-run the tokenize+count chain — measured 2.2 s ->
    1.5 s at sf0.1, and at 100 TB it converts three corpus scans to one.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = DIALECT_SPARK
    tcounts = (
        _barrier(df.selectExpr("doc_id", f"{tokens_sql('text', d)} AS tokens"))
        .selectExpr(
            "doc_id",
            "transform(array_distinct(tokens), t -> struct(t AS term, "
            "CAST(size(filter(tokens, x -> x = t)) AS BIGINT) AS tf)) AS tc",
        )
        .persist()
    )
    tf = tcounts.selectExpr("doc_id", "inline(tc)")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    n_docs = tcounts.selectExpr("CAST(size(tc) > 0 AS INT) AS has").agg(
        F.sum("has").alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .selectExpr(
            "doc_id", "term", "tf", "df_count",
            # CAST to DOUBLE first: a bare 1.0 literal is DECIMAL in
            # Spark SQL and would make the whole score decimal-typed
            "round(CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) + 1) / (CAST(df_count AS DOUBLE) + 1), 6) AS score",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(f"rank <= {k}")
        .select("doc_id", "term", "tf", "df_count", "score", "rank")
    )


def tfidf_top_terms_oracle_sql(table: str, k: int = 5) -> str:
    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}), "
        "terms AS (SELECT doc_id, unnest(tokens) AS term FROM tok), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2), "
        "dfreq AS (SELECT term, count(*) AS df_count FROM tf GROUP BY 1), "
        "n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf), "
        "scored AS (SELECT doc_id, tf.term, tf, df_count, "
        "round(CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) + 1) / (CAST(df_count AS DOUBLE) + 1), 6) AS score "
        "FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n), "
        "ranked AS (SELECT *, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank FROM scored) "
        f"SELECT doc_id, term, tf, df_count, score, CAST(rank AS INT) AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def corpus_mix_report(df: DataFrame) -> DataFrame:
    """Domain-mix report: doc and token counts per (source, lang) cell of
    a CUBE — every subtotal a mixture-weighting pipeline needs (per
    source, per language, per pair, grand total) in ONE aggregation.

    Scale shape: Spark's cube is one Expand (4x row multiplication of the
    *aggregation input*, not the corpus: partial aggregation runs before
    the shuffle) + one hash aggregate — cheaper than four separate
    groupBys and four scans.  ``share`` is each cell's fraction of the
    grand total of documents; grouping flags distinguish a real NULL
    group from a subtotal row, rendered as 'ALL' (testdata has no NULL
    source/lang).
    """
    from pyspark.sql import functions as F

    d = DIALECT_SPARK
    base = df.selectExpr(
        "source", "lang", f"CAST({_size(tokens_sql('text', d), d)} AS BIGINT) AS n_tok"
    )
    total = base.select(F.count(F.lit(1)).alias("total_docs"))
    cube = base.cube("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(sum(n_tok) AS BIGINT)").alias("n_tokens"),
        F.grouping("source").alias("g_source"),
        F.grouping("lang").alias("g_lang"),
    )
    return cube.crossJoin(F.broadcast(total)).selectExpr(
        "CASE WHEN g_source = 1 THEN 'ALL' ELSE source END AS source",
        "CASE WHEN g_lang = 1 THEN 'ALL' ELSE lang END AS lang",
        "n_docs",
        "n_tokens",
        "round(CAST(n_docs AS DOUBLE) / total_docs, 6) AS share",
    )


def corpus_mix_report_oracle_sql(table: str) -> str:
    d = DIALECT_DUCKDB
    return (
        f"WITH base AS (SELECT source, lang, "
        f"CAST({_size(tokens_sql('text', d), d)} AS BIGINT) AS n_tok FROM {table}), "
        "t AS (SELECT count(*) AS total_docs FROM base), "
        "c AS (SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source, "
        "CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang, "
        "count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens "
        "FROM base GROUP BY CUBE (source, lang)) "
        "SELECT source, lang, n_docs, n_tokens, "
        "round(CAST(n_docs AS DOUBLE) / total_docs, 6) AS share FROM c CROSS JOIN t"
    )


#: Report percentiles (exact, linear interpolation in both engines).
PCTS = (0.1, 0.5, 0.9, 0.99)


def length_percentiles(df: DataFrame) -> DataFrame:
    """Per-language exact length percentiles: (lang, n_docs, p10, p50,
    p90, p99) — the distribution summary a curation report leads with.

    ``percentile`` here is Spark's exact implementation (per-group value
    buffer) and the oracle is DuckDB's ``quantile_cont`` — same
    p*(n-1) linear-interpolation definition.  Exact percentiles are
    inherently memory-bound per group; at 100 TB swap in
    ``approx_percentile`` (KLL-style mergeable sketch, same call shape,
    ±eps rank error) — kept exact here because the correctness gate
    hashes values.
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.expr(f"round(percentile(length(text), {p}), 6)").alias(f"p{int(p * 100)}")
        for p in PCTS
    ]
    return df.groupBy("lang").agg(*aggs)


def length_percentiles_oracle_sql(table: str) -> str:
    cols = ", ".join(
        f"round(quantile_cont(length(text), {p}), 6) AS p{int(p * 100)}" for p in PCTS
    )
    return f"SELECT lang, count(*) AS n_docs, {cols} FROM {table} GROUP BY lang"


def vocab_coverage(df: DataFrame, v: int = 100) -> DataFrame:
    """Tokenizer vocabulary induction report: the top-``v`` words by
    corpus frequency with each prefix's cumulative token coverage —
    answers "what vocab size covers X% of the corpus", the sizing
    question before training a tokenizer.

    Output: (rank, word, cnt, cum_frac) — ``cum_frac`` is the fraction
    of ALL corpus tokens covered by words ranked 1..rank.

    Scale shape: word counts are a map-side-combined groupBy whose
    shuffle carries vocabulary size, not corpus size; the top-``v``
    selection is TakeOrderedAndProject (each task keeps v rows, no
    global sort); the cumulative window then runs over exactly ``v``
    rows — a single tiny partition by construction, at any corpus
    size.  The grand total rides along as a broadcast 1x1.  Exact
    integer arithmetic until the final division (IEEE-identical
    cross-engine); ties at the v boundary break on the word string.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    words = (
        _barrier(df.selectExpr(f"{tokens_sql('text', DIALECT_SPARK)} AS tokens"))
        .selectExpr("explode(tokens) AS word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = words.agg(F.sum("cnt").alias("total"))
    top = words.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(v)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
        ))
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "rank",
            "word",
            "cnt",
            "round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_frac",
        )
    )


def vocab_coverage_oracle_sql(table: str, v: int = 100) -> str:
    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT {tokens_sql('text', d)} AS tokens FROM {table}), "
        "wd AS (SELECT unnest(tokens) AS word FROM tok), "
        "wc AS (SELECT word, count(*) AS cnt FROM wd GROUP BY word), "
        "tot AS (SELECT sum(cnt) AS total FROM wc), "
        f"top AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word ASC LIMIT {v}) "
        "SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS INT) AS rank, "
        "word, cnt, "
        "round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, word ASC "
        "ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_frac "
        "FROM top CROSS JOIN tot"
    )


#: HTML stripping steps, in application order: content-dropping blocks
#: first (script/style/comments), then tags, then entities with &amp;
#: LAST (so double-encoded "&amp;lt;" correctly yields literal "&lt;").
#: No backreferences anywhere — Java regex (Spark) and RE2 (DuckDB)
#: agree on every pattern.
_HTML_BLOCKS = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
_HTML_TAG = r"(?s)<[^>]+>"
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _sql_str(s: str, dialect: str) -> str:
    """Single-quoted string literal in the given dialect (Spark escapes
    with backslash, DuckDB doubles the quote)."""
    if dialect == DIALECT_SPARK:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return "'" + s.replace("'", "''") + "'"


def _strip_html_exprs(dialect: str) -> tuple[str, str]:
    from pgverify_spark.functions.text_exprs import _rx

    g = "" if dialect == DIALECT_SPARK else ", 'g'"
    clean = "text"
    for p in (*_HTML_BLOCKS, _HTML_TAG):
        clean = f"regexp_replace({clean}, {_rx(p, dialect)}, ' '{g})"
    for frm, to in _HTML_ENTITIES:
        clean = f"replace({clean}, {_sql_str(frm, dialect)}, {_sql_str(to, dialect)})"
    clean = f"trim(regexp_replace({clean}, {_rx(chr(92) + 's+', dialect)}, ' '{g}))"
    size_fn = "size" if dialect == DIALECT_SPARK else "len"
    zero = ", 0" if dialect == DIALECT_SPARK else ""
    n_tags = (
        f"CAST({size_fn}(regexp_extract_all(text, {_rx(_HTML_TAG, dialect)}{zero})) AS BIGINT)"
    )
    return n_tags, clean


def strip_html(df: DataFrame) -> DataFrame:
    """Web-corpus HTML cleaning: drop script/style/comment blocks, strip
    tags, decode the common entities, collapse whitespace — the step
    between a raw crawl and every text operator above.  Output:
    (doc_id, n_tags, clean_text); ``n_tags`` counts tags in the raw
    input (including those inside dropped blocks), a cheap page-vs-prose
    signal for downstream quality gates.

    Pure projection like :func:`scrub_pii`: regex evaluation stays in
    whole-stage codegen, no shuffle, scan-bound at any scale.  Patterns
    avoid backreferences so Java regex and RE2 produce identical output
    (the script and style blocks are separate patterns for exactly this
    reason).
    """
    n_tags, clean = _strip_html_exprs(DIALECT_SPARK)
    return df.selectExpr("doc_id", f"{n_tags} AS n_tags", f"{clean} AS clean_text")


def strip_html_oracle_sql(table: str) -> str:
    n_tags, clean = _strip_html_exprs(DIALECT_DUCKDB)
    return f"SELECT doc_id, {n_tags} AS n_tags, {clean} AS clean_text FROM {table}"


#: 1:1 codepoint folds (translate): Latin-1/Latin-Extended accents to
#: ASCII plus smart quotes/dashes.  Multi-char expansions (ellipsis,
#: ligatures) go through replace() below.  translate semantics are
#: identical in Spark and DuckDB (positional map; no regex involved).
_FOLD_FROM = "áàâäãåāçéèêëēíìîïīñóòôöõøōúùûüūýÿÁÀÂÄÃÅĀÇÉÈÊËĒÍÌÎÏĪÑÓÒÔÖÕØŌÚÙÛÜŪÝ“”‘’«»–—"
_FOLD_TO = "aaaaaaaceeeeeiiiiinooooooouuuuuyyAAAAAAACEEEEEIIIIINOOOOOOOUUUUUY\"\"''\"\"--"
_FOLD_MULTI = (("…", "..."), ("æ", "ae"), ("Æ", "AE"), ("œ", "oe"), ("Œ", "OE"), ("ß", "ss"))


def _normalize_exprs(dialect: str) -> tuple[str, str]:
    frm = _sql_str(_FOLD_FROM, dialect)
    n_folded = (
        f"CAST(length(text) - length(translate(text, {frm}, '')) AS BIGINT)"
    )
    out = f"translate(text, {frm}, {_sql_str(_FOLD_TO, dialect)})"
    for a, b in _FOLD_MULTI:
        n_folded += (
            f" + CAST(length(text) - length(replace(text, {_sql_str(a, dialect)}, '')) AS BIGINT)"
        )
        out = f"replace({out}, {_sql_str(a, dialect)}, {_sql_str(b, dialect)})"
    return n_folded, out


def normalize_unicode_light(df: DataFrame) -> DataFrame:
    """Deterministic light unicode normalization: fold Latin accents to
    ASCII, straighten smart quotes/dashes, expand ellipsis and
    ligatures.  Output: (doc_id, n_folded, norm_text).

    Deliberately NOT full NFKC — that needs an ICU table (different
    versions ship different data, so two engines or two cluster images
    could disagree); this explicit positional map is reproducible
    everywhere forever, which is the property a *verification* engine
    needs.  Pure codegen projection (translate + replace chain), no
    shuffle, scan-bound like :func:`strip_html`.
    """
    n_folded, out = _normalize_exprs(DIALECT_SPARK)
    return df.selectExpr(
        "doc_id", f"{n_folded} AS n_folded", f"{out} AS norm_text"
    )


def normalize_unicode_light_oracle_sql(table: str) -> str:
    n_folded, out = _normalize_exprs(DIALECT_DUCKDB)
    return f"SELECT doc_id, {n_folded} AS n_folded, {out} AS norm_text FROM {table}"


# ---------------------------------------------------------------------------
# Dataset card: the one-call pre-training corpus summary
# ---------------------------------------------------------------------------

def dataset_card(df: DataFrame) -> DataFrame:
    """The summary a pipeline team reads before committing a corpus to
    training, as ONE call composing the engine's own gates: volume,
    language diversity and concentration, Gopher quality pass rate,
    PII incidence, and exact-duplication excess.

    Output: (metric, value) — nine rows, every value an exact BIGINT
    (counts, or integer parts-per-million for rates: ``x * 1e6 DIV n``
    — truncating integer division, so both engines agree bit-for-bit
    with no float anywhere):

    - ``n_docs``, ``total_chars``, ``mean_chars_millionths``
    - ``distinct_langs``, ``top_lang_share_ppm``
    - ``gopher_pass_ppm`` (share passing :func:`gopher_gate`)
    - ``pii_docs_ppm`` (share with >= 1 URL/email/phone/IPv4 match)
    - ``exact_dup_excess`` (docs removable by exact dedup:
      n_docs - distinct normalized-content hashes)
    - ``distinct_sources``

    Scale shape: three corpus scans (base stats + PII regex fused into
    one projection->aggregate; the gopher gate's own fused pass; the
    per-lang concentration aggregate), each map-side combined; every
    post-aggregate relation is <= |langs| rows.  No joins touch the
    corpus.
    """
    from pyspark.sql import functions as F

    from pgverify_spark.functions.text_exprs import _rx, norm_sql

    d = DIALECT_SPARK
    pii_any = " + ".join(
        f"size(regexp_extract_all(text, {_rx(p, d)}, 0))" for _, p in PII_PATTERNS
    )
    base = df.selectExpr(
        "n_chars",
        "lang",
        "source",
        f"md5({norm_sql('text', d)}) AS content_md5",
        f"CAST(({pii_any}) > 0 AS INT) AS has_pii",
    ).agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
        F.expr("CAST(sum(n_chars) AS BIGINT) AS total_chars"),
        F.expr("CAST(count(DISTINCT lang) AS BIGINT) AS distinct_langs"),
        F.expr("CAST(count(DISTINCT source) AS BIGINT) AS distinct_sources"),
        F.expr("CAST(count(DISTINCT content_md5) AS BIGINT) AS distinct_content"),
        F.expr("CAST(sum(has_pii) AS BIGINT) AS pii_docs"),
    )
    gate = gopher_gate(df).agg(
        F.expr("CAST(sum(CAST(keep AS INT)) AS BIGINT) AS n_pass")
    )
    top_lang = (
        df.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.expr("CAST(max(n) AS BIGINT) AS top_lang_docs"))
    )
    # three 1-row frames -> one 1-row frame (1x1 joins) -> unpivot
    row = base.crossJoin(gate).crossJoin(top_lang)
    return row.selectExpr(
        "stack(9, "
        "'n_docs', n_docs, "
        "'total_chars', total_chars, "
        "'mean_chars_millionths', (total_chars * 1000000) DIV n_docs, "
        "'distinct_langs', distinct_langs, "
        "'distinct_sources', distinct_sources, "
        "'top_lang_share_ppm', (top_lang_docs * 1000000) DIV n_docs, "
        "'gopher_pass_ppm', (n_pass * 1000000) DIV n_docs, "
        "'pii_docs_ppm', (pii_docs * 1000000) DIV n_docs, "
        "'exact_dup_excess', n_docs - distinct_content"
        ") AS (metric, value)"
    )


def dataset_card_oracle_sql(table: str) -> str:
    from pgverify_spark.functions.text_exprs import _rx, norm_sql

    d = DIALECT_DUCKDB
    pii_any = " + ".join(
        f"len(regexp_extract_all(text, {_rx(p, d)}))" for _, p in PII_PATTERNS
    )
    gate = gopher_gate_oracle_sql(table)
    return (
        "WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS distinct_langs, "
        "CAST(count(DISTINCT source) AS BIGINT) AS distinct_sources, "
        f"CAST(count(DISTINCT md5({norm_sql('text', d)})) AS BIGINT) AS distinct_content, "
        f"CAST(sum(CASE WHEN ({pii_any}) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs "
        f"FROM {table}), "
        f"gate AS (SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass "
        f"FROM ({gate}) g), "
        f"tl AS (SELECT CAST(max(n) AS BIGINT) AS top_lang_docs FROM "
        f"(SELECT count(*) AS n FROM {table} GROUP BY lang) c), "
        "row AS (SELECT * FROM base CROSS JOIN gate CROSS JOIN tl) "
        "SELECT 'n_docs' AS metric, n_docs AS value FROM row "
        "UNION ALL SELECT 'total_chars', total_chars FROM row "
        "UNION ALL SELECT 'mean_chars_millionths', (total_chars * 1000000) // n_docs FROM row "
        "UNION ALL SELECT 'distinct_langs', distinct_langs FROM row "
        "UNION ALL SELECT 'distinct_sources', distinct_sources FROM row "
        "UNION ALL SELECT 'top_lang_share_ppm', (top_lang_docs * 1000000) // n_docs FROM row "
        "UNION ALL SELECT 'gopher_pass_ppm', (n_pass * 1000000) // n_docs FROM row "
        "UNION ALL SELECT 'pii_docs_ppm', (pii_docs * 1000000) // n_docs FROM row "
        "UNION ALL SELECT 'exact_dup_excess', n_docs - distinct_content FROM row"
    )
