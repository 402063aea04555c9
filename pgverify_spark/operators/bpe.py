"""Byte-pair-encoding statistics: the tokenizer-training workload.

Beyond-reference extension (the reference verifies tables, it does not
train tokenizers): before an LLM run, the corpus is scanned to learn a
BPE merge table (Sennrich et al. 2016).  The expensive part — counting
adjacent symbol pairs across 100 TB of text — is exactly the Spark-shaped
half of the algorithm; the merge *selection* loop operates on the
aggregated vocabulary, which is many orders of magnitude smaller.

Scale design
------------
- :func:`bpe_pair_counts` (one-pass, oracle-paired): corpus -> word
  counts (hash groupBy with map-side combine: the shuffle carries the
  *vocabulary*, not the corpus) -> adjacent character-pair explode over
  distinct words weighted by count -> second vocabulary-sized groupBy ->
  global top-k via TakeOrderedAndProject (no global sort).  At 100 TB
  the corpus is read once; everything after the first aggregate is
  |vocab|-sized.
- :func:`bpe_learn` (iterative): repeats pair-count -> pick-best ->
  merge on the standing word/symbol-count table.  Each round collects
  exactly ONE row (the winning pair) to the driver and rewrites the
  symbol arrays with a left-fold ``aggregate`` lambda — the corpus is
  never re-read after the initial word count, and per-round state is
  the persisted vocabulary table.  Not SQL-expressible as one statement
  (argmax feeds the next round's input), so it is verified against a
  pure-Python reference implementation in tests instead of a DuckDB
  twin (tests/test_pipeline_ops.py).

Determinism: ties on pair frequency break deterministically in both
operators, but on different keys by design: the one-pass top-k orders
by the space-joined pair string (count DESC, pair ASC — the same key
its DuckDB twin orders by), while the per-round argmax orders by the
two symbols *separately* (count DESC, sym_a ASC, sym_b ASC) — the
(a, b) tuple order the pure-Python reference uses.  The distinction
matters only for symbols containing codepoints below 0x20 (control
characters survive norm_sql's whitespace collapse), where joined-string
order and tuple order can disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgverify_spark.functions.canonical import DIALECT_DUCKDB, DIALECT_SPARK
from pgverify_spark.functions.text_exprs import tokens_sql
from pgverify_spark.operators.util import barrier as _barrier

#: Separator between the two symbols of a pair key.  Tokens are
#: whitespace-split, so no symbol ever contains a space.
_SEP = " "


def word_counts(df: DataFrame) -> DataFrame:
    """(word, cnt) over the whitespace-tokenized normalized corpus.

    The one corpus-sized scan of the BPE family; its output (the
    vocabulary) is what every later step operates on.
    """
    return (
        _barrier(df.selectExpr(f"{tokens_sql('text', DIALECT_SPARK)} AS tokens"))
        .selectExpr("explode(tokens) AS word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_pair_counts(df: DataFrame, k: int = 50) -> DataFrame:
    """Top-k adjacent character pairs weighted by word frequency —
    the first BPE merge iteration (initial symbols = characters).

    Output: (pair, n_occurrences); ``pair`` is the two characters
    space-joined.  "aaa" contributes the pair "a a" twice (adjacent
    enumeration, the BPE convention).  Words shorter than 2 characters
    have no pairs and are pruned before the explode.
    """
    wc = word_counts(df).filter("length(word) >= 2")
    pairs = wc.selectExpr(
        "cnt",
        "explode(transform(sequence(1, length(word) - 1), "
        f"i -> concat(substr(word, i, 1), '{_SEP}', substr(word, i + 1, 1)))) AS pair",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(k)
    )


def bpe_pair_counts_oracle_sql(table: str, k: int = 50) -> str:
    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT {tokens_sql('text', d)} AS tokens FROM {table}), "
        "w AS (SELECT unnest(tokens) AS word FROM tok), "
        "wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word), "
        "wc2 AS (SELECT * FROM wc WHERE length(word) >= 2), "
        "p AS (SELECT cnt, unnest(list_transform(range(1, length(word)), "
        f"i -> substr(word, i, 1) || '{_SEP}' || substr(word, i + 1, 1))) AS pair FROM wc2) "
        "SELECT pair, CAST(sum(cnt) AS BIGINT) AS n_occurrences FROM p GROUP BY pair "
        f"ORDER BY n_occurrences DESC, pair ASC LIMIT {k}"
    )


def _sq(sym: str) -> str:
    """Escape a symbol for embedding in a single-quoted SQL literal."""
    return sym.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(a: str, b: str) -> str:
    """Left-fold merge of adjacent (a, b) symbol occurrences.

    The BPE convention: scan left to right, greedily replacing the
    leftmost (a, b) with the concatenated symbol — "aaa" under merge
    (a, a) becomes ["aa", "a"], because after merging the new symbol
    ("aa") no longer matches ``a`` for the next step.  The fold
    reproduces that exactly: append x unless the accumulator's last
    element is ``a`` (and was not itself just produced by this merge —
    guaranteed because the merged symbol ``a||b`` differs from ``a``
    whenever b is non-empty) and x is ``b``.
    """
    qa, qb = _sq(a), _sq(b)
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{qa}' AND x = '{qb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}')) "
        "ELSE concat(acc, array(x)) END)"
    )


#: Above this many distinct words, :func:`bpe_learn` keeps the merge
#: loop distributed instead of collecting the vocabulary.  1M rows of
#: (word, cnt) is tens of MB on the driver — comfortably bounded; web
#: corpora rarely exceed ~10M distinct whitespace tokens after
#: normalization, but the distributed loop stays correct at any size.
_DRIVER_VOCAB_LIMIT = 1_000_000


def _merge_syms_local(syms: list[str], a: str, b: str) -> list[str]:
    """Pure-Python twin of :func:`_merge_expr`'s left fold: append x
    unless the output's last element is ``a`` and x is ``b``, in which
    case replace it with ``a+b`` — the greedy leftmost-merge BPE
    convention ("aaa" under (a, a) -> ["aa", "a"])."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _learn_local(
    vocab: list[tuple[list[str], int]], n_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """The merge-selection loop over an already-collected vocabulary.

    Identical outputs to the distributed loop: same pair enumeration,
    same argmax tie order (count DESC, sym_a ASC, sym_b ASC — Python
    str comparison is by code point, which equals the JVM's UTF-8
    binary collation), same fold rewrite.  O(rounds x vocab chars) in
    plain dict arithmetic — milliseconds at real vocabulary sizes.
    """
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + cnt
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_count:
            break
        merges.append((a, b, n))
        vocab = [
            (_merge_syms_local(syms, a, b), cnt) if a in syms else (syms, cnt)
            for syms, cnt in vocab
        ]
    return merges


def bpe_learn(
    df: DataFrame, n_merges: int = 10, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns the ordered merge table [(sym_a, sym_b, count), ...] — the
    artifact a tokenizer ships.  Stops early when no pair reaches
    ``min_count``.

    The corpus is scanned exactly ONCE (the word count — the shuffle
    carries the vocabulary with map-side combine); everything after is
    vocabulary-sized by construction.  The merge-selection loop
    therefore runs DRIVER-LOCALLY over the collected (word, cnt)
    relation whenever the vocabulary fits ``_DRIVER_VOCAB_LIMIT``
    (checked and fetched by the same single job via LIMIT K+1):
    ~11 sequential Spark jobs collapse to one, same merge table
    (r8 VERDICT item 3).  A larger vocabulary falls back to the
    distributed per-round loop: one vocabulary-sized aggregation +
    single-row argmax collect + fold-rewrite projection per round,
    re-checkpointed with ``localCheckpoint(eager=True)`` — the same
    discipline as dup_clusters' label propagation (dedup.py:427):
    persist alone nests one aggregate-lambda per merge in the logical
    plan, so analysis cost grows per round and cache eviction
    recomputes the whole chain; checkpointing truncates the plan to an
    RDD leaf (superseded rounds' blocks are GC'd by the context
    cleaner).
    """
    # Words containing the U+001F boundary sentinel are dropped, the
    # same convention as bpe_apply (see _BOUND): tokens are whitespace-
    # split so the sentinel never comes from tokenization, and dropping
    # it on BOTH twins keeps the recursive-CTE oracle's rep-string pair
    # extraction (bpe_merges_oracle_sql) exact — a sentinel inside a
    # word would corrupt its boundary-delimited representation there.
    wc = word_counts(df).filter(f"NOT contains(word, '{_BOUND}')")
    # LIMIT K+1 returns min(K+1, |vocab|) rows in one job: K or fewer
    # rows IS the whole vocabulary (limit never drops rows it has),
    # exactly K+1 means it overflowed and the loop stays distributed.
    head = wc.limit(_DRIVER_VOCAB_LIMIT + 1).collect()
    if len(head) <= _DRIVER_VOCAB_LIMIT:
        return _learn_local(
            [(list(r["word"]), int(r["cnt"])) for r in head],
            n_merges,
            min_count,
        )
    vocab = wc.selectExpr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1)) AS syms",
        "cnt",
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            vocab.filter("size(syms) >= 2")
            .selectExpr(
                "cnt",
                "explode(transform(sequence(1, size(syms) - 1), "
                "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))) AS pr",
            )
            .selectExpr("cnt", "pr.a AS a", "pr.b AS b")
            .groupBy("a", "b")
            .agg(F.sum("cnt").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b, int(best[0]["n"])))
        vocab = vocab.selectExpr(
            f"{_merge_expr(a, b)} AS syms", "cnt"
        ).localCheckpoint(eager=True)
    return merges


#: Symbol boundary sentinel for the replace-chain BPE apply: U+001F
#: (unit separator).  Words are whitespace-split so the sentinel never
#: comes from tokenization itself; any pathological word containing it
#: is dropped on BOTH twins before application.
_BOUND = "\x1f"


def _rep_sql(word_col: str, dialect: str) -> str:
    """The word as a boundary-delimited symbol string: each initial
    symbol (character) wrapped in sentinels — ``"ab"`` becomes
    ``\\x1fa\\x1f\\x1fb\\x1f``.  Boundaries make symbol-pair string
    replacement exact: a merge pattern can only match whole adjacent
    symbols, never a substring of a longer symbol."""
    if dialect == DIALECT_SPARK:
        return (
            f"concat_ws('', transform(sequence(1, length({word_col})), "
            f"i -> concat('{_BOUND}', substr({word_col}, i, 1), '{_BOUND}')))"
        )
    return (
        f"array_to_string(list_transform(range(1, length({word_col}) + 1), "
        f"i -> '{_BOUND}' || substr({word_col}, i, 1) || '{_BOUND}'), '')"
    )


def _sq_dialect(sym: str, dialect: str) -> str:
    if dialect == DIALECT_SPARK:
        return _sq(sym)
    return sym.replace("'", "''")


def bpe_apply_sql(
    word_col: str, merges: list[tuple[str, str]], dialect: str
) -> str:
    """Tokens of ``word_col`` under the ordered ``merges`` table, as a
    SQL array expression — the APPLY half of BPE, dual-dialect.

    Each merge is one string ``replace`` on the boundary-delimited
    representation: ``replace(rep, ⟨a⟩⟨b⟩, ⟨ab⟩)``.  Built-in replace
    scans left to right and resumes AFTER each replacement — exactly
    BPE's greedy leftmost-merge convention (the :func:`_merge_expr`
    fold), and identical in the JVM and DuckDB, so the twins agree
    bit-for-bit (property-tested against a pure-Python reference in
    tests/test_properties.py).  m merges = m codegen'd string passes
    over a vocabulary-sized relation — no lambda folds, no UDFs.
    """
    rep = _rep_sql(word_col, dialect)
    for a, b in merges:
        qa, qb = _sq_dialect(a, dialect), _sq_dialect(b, dialect)
        pat = f"{_BOUND}{qa}{_BOUND}{_BOUND}{qb}{_BOUND}"
        new = f"{_BOUND}{qa}{qb}{_BOUND}"
        rep = f"replace({rep}, '{pat}', '{new}')"
    inner = f"substring({rep}, 2, length({rep}) - 2)"
    if dialect == DIALECT_SPARK:
        return f"split({inner}, '{_BOUND}{_BOUND}')"
    return f"str_split({inner}, '{_BOUND}{_BOUND}')"


def bpe_apply_tokens(
    df: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize the corpus with a learned/shipped BPE merge table and
    return the resulting token frequency table (token, n_occurrences).

    The merge table is a static artifact (what a tokenizer ships);
    application is pure per-word string work, so the corpus is scanned
    ONCE for word counts (the shuffle carries the vocabulary with
    map-side combine) and the m replace passes + token explode run
    over the |vocab|-sized relation only — at 100 TB the apply cost is
    independent of corpus size beyond the one word-count scan.
    """
    wc = word_counts(df).filter(f"NOT contains(word, '{_BOUND}')")
    toks = wc.selectExpr(
        "cnt",
        f"explode({bpe_apply_sql('word', merges, DIALECT_SPARK)}) AS token",
    )
    return toks.groupBy("token").agg(
        F.sum("cnt").cast("bigint").alias("n_occurrences")
    )


def bpe_apply_tokens_oracle_sql(
    table: str, merges: list[tuple[str, str]]
) -> str:
    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT {tokens_sql('text', d)} AS tokens FROM {table}), "
        "w AS (SELECT unnest(tokens) AS word FROM tok), "
        "wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word), "
        f"wc2 AS (SELECT * FROM wc WHERE NOT contains(word, '{_BOUND}')), "
        f"t AS (SELECT cnt, unnest({bpe_apply_sql('word', merges, d)}) AS token FROM wc2) "
        "SELECT token, CAST(sum(cnt) AS BIGINT) AS n_occurrences "
        "FROM t GROUP BY token"
    )


def bpe_roundtrip(df: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Learn→apply→DETOKENIZE identity, certified end-to-end: every
    distinct corpus word is tokenized under ``merges`` and the tokens
    are concatenated back; the output is ONE audit row —
    (n_words, n_occurrences, n_roundtrip_fail, n_tokens, n_chars) —
    where ``n_roundtrip_fail`` MUST be 0 (decode(encode(w)) == w
    byte-for-byte) and the token/char totals pin the compression the
    merge table achieves.  Tokenizer correctness is the one pipeline
    stage where a silent bug corrupts every downstream token count;
    the family's pieces (pair counts, learn, apply) are certified
    separately — this entry certifies their COMPOSITION.

    Scale shape: same as :func:`bpe_apply_tokens` — one corpus scan
    into a vocabulary-sized relation, m codegen'd replace passes and
    the decode concat all over |vocab| rows, one single-row aggregate.
    """
    toks = f"{bpe_apply_sql('word', merges, DIALECT_SPARK)}"
    wc = word_counts(df).filter(f"NOT contains(word, '{_BOUND}')")
    per_word = wc.selectExpr(
        "word",
        "cnt",
        f"{toks} AS tokens",
    ).selectExpr(
        "cnt",
        "CAST(size(tokens) AS BIGINT) AS n_toks",
        "CAST(length(word) AS BIGINT) AS n_chars",
        "CASE WHEN concat_ws('', tokens) = word THEN 0 ELSE 1 END AS fail",
    )
    return per_word.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_words",
        "CAST(sum(cnt) AS BIGINT) AS n_occurrences",
        "CAST(sum(fail) AS BIGINT) AS n_roundtrip_fail",
        "CAST(sum(n_toks) AS BIGINT) AS n_tokens",
        "CAST(sum(n_chars) AS BIGINT) AS n_chars",
    )


def bpe_roundtrip_oracle_sql(table: str, merges: list[tuple[str, str]]) -> str:
    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT {tokens_sql('text', d)} AS tokens FROM {table}), "
        "w AS (SELECT unnest(tokens) AS word FROM tok), "
        "wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word), "
        f"wc2 AS (SELECT * FROM wc WHERE NOT contains(word, '{_BOUND}')), "
        f"t AS (SELECT word, cnt, {bpe_apply_sql('word', merges, d)} AS toks FROM wc2), "
        "p AS (SELECT cnt, CAST(len(toks) AS BIGINT) AS n_toks, "
        "CAST(length(word) AS BIGINT) AS n_chars, "
        "CASE WHEN array_to_string(toks, '') = word THEN 0 ELSE 1 END AS fail FROM t) "
        "SELECT CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(cnt) AS BIGINT) AS n_occurrences, "
        "CAST(sum(fail) AS BIGINT) AS n_roundtrip_fail, "
        "CAST(sum(n_toks) AS BIGINT) AS n_tokens, "
        "CAST(sum(n_chars) AS BIGINT) AS n_chars FROM p"
    )


def bpe_token_counts(
    df: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Per-document token counts under a BPE merge table — the number
    that drives packing/pricing/budgeting once a real tokenizer is
    fixed: (doc_id, n_words, n_bpe_tokens).

    Scale shape: the merge chain runs once per DISTINCT word (the
    vocabulary relation, never the corpus) producing a (word ->
    token count) map that joins back to the per-document word stream —
    broadcastable (the vocabulary of a web corpus is millions of rows,
    KBs per row), so the corpus is scanned once and the per-doc
    aggregate combines map-side.
    """
    words = df.selectExpr(
        "doc_id",
        f"explode({tokens_sql('text', DIALECT_SPARK)}) AS word",
    ).filter(f"NOT contains(word, '{_BOUND}')")
    vocab = (
        words.select("word")
        .distinct()
        .selectExpr(
            "word",
            f"CAST(size({bpe_apply_sql('word', merges, DIALECT_SPARK)}) AS BIGINT)"
            " AS n_toks",
        )
    )
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def bpe_token_counts_oracle_sql(
    table: str, merges: list[tuple[str, str]]
) -> str:
    d = DIALECT_DUCKDB
    return (
        f"WITH tok AS (SELECT doc_id, {tokens_sql('text', d)} AS tokens FROM {table}), "
        "w AS (SELECT doc_id, unnest(tokens) AS word FROM tok), "
        f"w2 AS (SELECT * FROM w WHERE NOT contains(word, '{_BOUND}')), "
        "vocab AS (SELECT word, "
        f"CAST(len({bpe_apply_sql('word', merges, d)}) AS BIGINT) AS n_toks "
        "FROM (SELECT DISTINCT word FROM w2) v) "
        "SELECT doc_id, count(*) AS n_words, "
        "CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens "
        "FROM w2 JOIN vocab USING (word) GROUP BY doc_id"
    )


def bpe_pack_sequences(
    df: DataFrame, merges: list[tuple[str, str]], budget_tokens: int = 512
) -> DataFrame:
    """Concat-and-cut packing measured in BPE TOKENS — the unit real
    training pipelines pack by (prep.pack_sequences' whitespace-token
    variant under- or over-fills bins whenever tokenizer fertility
    differs from 1 token/word).  Output: (source, bin, n_docs,
    bin_tokens), ``bin`` = where each doc's first BPE token lands when
    the source's docs run end-to-end in doc_id order, cut every
    ``budget_tokens``.

    Scale shape: :func:`bpe_token_counts`'s vocabulary-sized merge work
    + broadcast join, then ONE per-source running-sum window over
    (doc_id, int) rows — text never enters the window exchange.
    """
    from pyspark.sql.window import Window

    toks = bpe_token_counts(df, merges).join(
        df.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    binned = toks.withColumn(
        "cum", F.sum("n_bpe_tokens").over(w)
    ).selectExpr(
        "source",
        "n_bpe_tokens",
        f"CAST((cum - n_bpe_tokens) DIV {budget_tokens} AS BIGINT) AS bin",
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").cast("long").alias("bin_tokens"),
    )


def bpe_pack_sequences_oracle_sql(
    table: str, merges: list[tuple[str, str]], budget_tokens: int = 512
) -> str:
    return (
        f"WITH tc AS ({bpe_token_counts_oracle_sql(table, merges)}), "
        f"t AS (SELECT d.source, tc.doc_id, tc.n_bpe_tokens FROM tc "
        f"JOIN {table} d ON tc.doc_id = d.doc_id), "
        "c AS (SELECT source, doc_id, n_bpe_tokens, "
        "sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t) "
        f"SELECT source, CAST((cum - n_bpe_tokens) // {budget_tokens} AS BIGINT) AS bin, "
        "count(*) AS n_docs, CAST(sum(n_bpe_tokens) AS BIGINT) AS bin_tokens "
        "FROM c GROUP BY source, bin"
    )


def bpe_merges_df(spark, df: DataFrame, n_merges: int = 10) -> DataFrame:
    """:func:`bpe_learn` as a DataFrame: (step, sym_a, sym_b, n_occurrences).

    Iterative-argmax shape — hash-certified against the recursive-CTE
    DuckDB twin :func:`bpe_merges_oracle_sql`, and the merge sequence is
    additionally asserted against a pure-Python reference BPE in
    tests/test_pipeline_ops.py / tests/test_properties.py.
    """
    rows = [
        (i + 1, a, b, n) for i, (a, b, n) in enumerate(bpe_learn(df, n_merges))
    ]
    return spark.createDataFrame(
        rows, "step int, sym_a string, sym_b string, n_occurrences bigint"
    )


def bpe_merges_oracle_sql(
    table: str, n_merges: int = 10, min_count: int = 2
) -> str:
    """DuckDB twin of :func:`bpe_merges_df`: the full iterative BPE
    learner as ONE recursive CTE.

    The iteration state (the whole boundary-delimited vocabulary, see
    :func:`_rep_sql`) travels as a single row carrying a
    ``list<struct(rep, cnt)>``; each recursive step unnests it, counts
    adjacent symbol pairs, picks the argmax with :func:`bpe_learn`'s
    exact tie order (count DESC, sym_a ASC, sym_b ASC — the (a, b)
    tuple order of the pure-Python reference), and rewrites every rep
    with one ``replace`` — the same greedy leftmost-merge string pass
    :func:`bpe_apply_sql` uses, already proven equivalent to the
    symbol-array fold.  Words of length 1 are dropped up front: they
    contribute no pairs and no merge pattern (which always spans two
    symbols) can ever match them.  The vocabulary is corpus-independent
    in size, so 10 rounds over a single list-typed row is milliseconds.
    """
    b = "chr(31)"
    tok = tokens_sql("text", DIALECT_DUCKDB)
    return (
        "WITH RECURSIVE "
        f"tok AS (SELECT {tok} AS tokens FROM {table}), "
        "w AS (SELECT unnest(tokens) AS word FROM tok), "
        "wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word), "
        "base AS (SELECT array_to_string(list_transform(range(1, length(word) + 1), "
        f"i -> {b} || substr(word, i, 1) || {b}), '') AS rep, cnt "
        # sentinel-bearing words dropped on BOTH twins (see bpe_learn):
        # one inside a word would corrupt its boundary-delimited rep
        f"FROM wc WHERE length(word) >= 2 AND NOT contains(word, {b})), "
        "st AS ("
        "SELECT 0 AS step, "
        "(SELECT list(struct_pack(rep := rep, cnt := cnt)) FROM base) AS vocab, "
        "CAST(NULL AS VARCHAR) AS sym_a, CAST(NULL AS VARCHAR) AS sym_b, "
        "CAST(NULL AS BIGINT) AS n_occurrences "
        "UNION ALL "
        "SELECT step + 1, "
        "list_transform(vocab, x -> struct_pack("
        f"rep := replace(x.rep, {b} || a || {b} || {b} || b || {b}, "
        f"{b} || a || b || {b}), cnt := x.cnt)), "
        "a, b, n "
        "FROM ("
        "SELECT step, vocab, a, b, n FROM ("
        "SELECT step, vocab, p.a AS a, p.b AS b, CAST(sum(cnt) AS BIGINT) AS n "
        "FROM ("
        "SELECT st.step, st.vocab, v.cnt AS cnt, "
        "unnest(list_transform(range(1, len(s.syms)), "
        "i -> struct_pack(a := s.syms[i], b := s.syms[i + 1]))) AS p "
        "FROM st, unnest(st.vocab) AS t(v), "
        f"LATERAL (SELECT str_split(substr(v.rep, 2, length(v.rep) - 2), "
        f"{b} || {b}) AS syms) s "
        f"WHERE st.step < {n_merges}"
        ") GROUP BY step, vocab, a, b"
        f") ORDER BY n DESC, a ASC, b ASC LIMIT 1"
        f") WHERE n >= {min_count}"
        ") "
        "SELECT CAST(step AS INTEGER) AS step, sym_a, sym_b, n_occurrences "
        "FROM st WHERE step >= 1"
    )
