"""Dual-dialect text / similarity expression builders.

Same contract as :mod:`pgverify_spark.functions.canonical`: every builder
emits SQL that computes the **identical value in Spark SQL and DuckDB**,
so the LLM-pipeline operators (dedup, similarity, text analysis) are
oracle-checkable end-to-end.  Dialect differences are confined to
function names (``size``/``len``, ``transform``/``list_transform``,
``element_at``/``[]``, ``shiftright``/``>>``) and regex-literal escaping
(Spark SQL string literals process backslash escapes; DuckDB's do not).

All integer hashing stays in 48-bit space (``hex_prefix_int_sql``) so
every expression fits signed int64 arithmetic in both engines.
"""

from __future__ import annotations

import hashlib

from pgverify_spark.functions.canonical import DIALECT_SPARK, hex_prefix_int_sql

# ---------------------------------------------------------------------------
# deterministic constants (derived from md5 so no RNG is involved)
# ---------------------------------------------------------------------------

#: Mersenne prime 2^31 - 1: (a*(x%P)+b)%P stays far below int64 overflow.
MINHASH_P = 2_147_483_647
MINHASH_PERMS = 32
LSH_BANDS = 8
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
SIMHASH_BITS = 48


def _const(seed: str, lo: int, hi: int) -> int:
    """Deterministic pseudo-random int in [lo, hi) from an md5 seed."""
    return lo + int(hashlib.md5(seed.encode()).hexdigest()[:12], 16) % (hi - lo)


MINHASH_A = [_const(f"minhash-a-{j}", 1, MINHASH_P) for j in range(MINHASH_PERMS)]
MINHASH_B = [_const(f"minhash-b-{j}", 0, MINHASH_P) for j in range(MINHASH_PERMS)]

#: Tiny per-language stopword lists for the n-gram-heuristic language ID.
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas", "des", "du"),
    "es": ("el", "la", "los", "las", "es", "una", "en", "que", "por", "para", "con", "del"),
}


# ---------------------------------------------------------------------------
# dialect helpers
# ---------------------------------------------------------------------------

def _rx(pattern: str, dialect: str) -> str:
    """Regex string literal (Spark literals eat one level of backslashes)."""
    if dialect == DIALECT_SPARK:
        pattern = pattern.replace("\\", "\\\\")
    return f"'{pattern}'"


def _size(arr: str, dialect: str) -> str:
    return f"size({arr})" if dialect == DIALECT_SPARK else f"len({arr})"


def _transform(arr: str, lam: str, dialect: str) -> str:
    fn = "transform" if dialect == DIALECT_SPARK else "list_transform"
    return f"{fn}({arr}, {lam})"


def _filter(arr: str, lam: str, dialect: str) -> str:
    fn = "filter" if dialect == DIALECT_SPARK else "list_filter"
    return f"{fn}({arr}, {lam})"


def _distinct(arr: str, dialect: str) -> str:
    fn = "array_distinct" if dialect == DIALECT_SPARK else "list_distinct"
    return f"{fn}({arr})"


def _amin(arr: str, dialect: str) -> str:
    fn = "array_min" if dialect == DIALECT_SPARK else "list_min"
    return f"{fn}({arr})"


def _at(arr: str, i: int | str, dialect: str) -> str:
    """1-based element access."""
    if dialect == DIALECT_SPARK:
        return f"element_at({arr}, {i})"
    return f"{arr}[{i}]"


def _shr(x: str, i: str | int, dialect: str) -> str:
    return f"shiftright({x}, {i})" if dialect == DIALECT_SPARK else f"({x} >> {i})"


def _sum_ints(arr: str, dialect: str) -> str:
    """Sum a bigint array (order-independent integer sum)."""
    if dialect == DIALECT_SPARK:
        return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"CAST(list_sum({arr}) AS BIGINT)"


def _sum_doubles(arr: str, dialect: str) -> str:
    """Left-to-right double fold — both engines accumulate sequentially in
    element order, so the result is bit-identical across dialects."""
    if dialect == DIALECT_SPARK:
        return f"aggregate({arr}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    return f"CAST(list_sum({arr}) AS DOUBLE)"


# ---------------------------------------------------------------------------
# normalization / tokens / n-grams
# ---------------------------------------------------------------------------

def norm_sql(col: str, dialect: str) -> str:
    """Canonical text form: lowercase, whitespace collapsed to single
    spaces, trimmed.  The basis for fingerprints, shingles, and tokens."""
    ws = _rx("\\s+", dialect)
    if dialect == DIALECT_SPARK:
        return f"trim(regexp_replace(lower({col}), {ws}, ' '))"
    return f"trim(regexp_replace(lower({col}), {ws}, ' ', 'g'))"


def tokens_sql(col: str, dialect: str) -> str:
    """Whitespace tokens of the normalized text (empty -> [])."""
    norm = norm_sql(col, dialect)
    split = (
        f"split({norm}, ' ')" if dialect == DIALECT_SPARK else f"string_split({norm}, ' ')"
    )
    return _filter(split, "w -> w <> ''", dialect)


def ngrams_sql(tokens_col: str, n: int, dialect: str) -> str:
    """Word n-gram strings (space-joined) from a *tokens column reference*
    (operators materialize tokens as a column first, so the repeated
    references here are cheap); [] when fewer than n tokens."""
    t = tokens_col
    elems = [_at(t, f"i + {j}" if j else "i", dialect) for j in range(n)]
    if dialect == DIALECT_SPARK:
        gram = f"concat_ws(' ', {', '.join(elems)})"
        return (
            f"CASE WHEN size({t}) < {n} THEN CAST(array() AS ARRAY<STRING>) "
            f"ELSE transform(sequence(1, size({t}) - {n - 1}), i -> {gram}) END"
        )
    gram = " || ' ' || ".join(elems)
    # range(1, m) excludes the end and is empty when m <= 1
    return f"list_transform(range(1, greatest(len({t}) - {n - 2}, 1)), i -> {gram})"


def shingle_ints_sql(ngrams_col: str, dialect: str) -> str:
    """Distinct 48-bit integer hashes of the n-gram shingles.

    Dedup runs *before* hashing — natural text repeats n-grams heavily,
    so hashing distinct grams cuts the md5 count by the repetition factor
    (~10x on the synthetic corpus).  The trailing distinct keeps the
    distinct-elements contract exact even under md5-prefix collisions.
    """
    grams = _distinct(ngrams_col, dialect)
    md5s = _transform(grams, "s -> md5(s)", dialect)
    ints = _transform(md5s, f"m -> {hex_prefix_int_sql('m', dialect)}", dialect)
    return _distinct(ints, dialect)


def minhash_sig_sql(shingles_col: str, dialect: str) -> str:
    """MinHash signature: array of MINHASH_PERMS minima of the affine
    permutations (a_j * (x % P) + b_j) % P over the shingle-hash set."""
    mins = [
        _amin(
            _transform(
                shingles_col,
                f"x -> ({MINHASH_A[j]} * (x % {MINHASH_P}) + {MINHASH_B[j]}) % {MINHASH_P}",
                dialect,
            ),
            dialect,
        )
        for j in range(MINHASH_PERMS)
    ]
    return f"array({', '.join(mins)})" if dialect == DIALECT_SPARK else f"[{', '.join(mins)}]"


def lsh_bands_sql(sig_col: str, dialect: str) -> str:
    """LSH band keys: md5 over each band's LSH_ROWS signature slots.
    Docs sharing any band key are candidate near-duplicates."""
    bands = []
    for b in range(LSH_BANDS):
        slots = [
            _str_of(_at(sig_col, b * LSH_ROWS + r + 1, dialect), dialect)
            for r in range(LSH_ROWS)
        ]
        # band index inside the key so a flat explode can join on the key
        # alone without pairing rows from different band positions
        bands.append(f"md5(concat_ws(',', 'b{b}', {', '.join(slots)}))")
    return f"array({', '.join(bands)})" if dialect == DIALECT_SPARK else f"[{', '.join(bands)}]"


def _str_of(expr: str, dialect: str) -> str:
    t = "STRING" if dialect == DIALECT_SPARK else "VARCHAR"
    return f"CAST({expr} AS {t})"


def jaccard_sql(a_col: str, b_col: str, dialect: str) -> str:
    """Exact Jaccard similarity of two distinct-element integer arrays,
    rounded to 6 decimals (intersection/union arithmetic is integer, the
    single division is one double op — identical in both engines)."""
    if dialect == DIALECT_SPARK:
        inter = f"size(array_intersect({a_col}, {b_col}))"
        union = f"(size({a_col}) + size({b_col}) - {inter})"
    else:
        inter = f"len(list_intersect({a_col}, {b_col}))"
        union = f"(len({a_col}) + len({b_col}) - {inter})"
    return f"round(CAST({inter} AS DOUBLE) / {union}, 6)"


def token_hashes_sql(tokens_col: str, dialect: str) -> str:
    """48-bit integer hash per token (md5 runs once per token)."""
    md5s = _transform(tokens_col, "w -> md5(w)", dialect)
    return _transform(md5s, f"m -> {hex_prefix_int_sql('m', dialect)}", dialect)


def simhash_sql(th_col: str, dialect: str) -> str:
    """48-bit SimHash from a *token-hashes column reference* (materialize
    ``token_hashes_sql`` as a column first — inlining it here would
    recompute every token md5 once per bit).  Bit i is set when at least
    half the tokens have bit i set in their hash."""
    n = _size(th_col, dialect)
    if dialect == DIALECT_SPARK:
        cnt = f"aggregate({th_col}, CAST(0 AS BIGINT), (acc, v) -> acc + (shiftright(v, i) & 1))"
        bits = (
            f"transform(sequence(0, {SIMHASH_BITS - 1}), i -> "
            f"CASE WHEN 2 * {cnt} >= {n} THEN shiftleft(CAST(1 AS BIGINT), i) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
        return _sum_ints(bits, dialect)
    cnt = f"CAST(list_sum(list_transform({th_col}, v -> (v >> i) & 1)) AS BIGINT)"
    bits = (
        f"list_transform(range(0, {SIMHASH_BITS}), i -> "
        f"CASE WHEN 2 * {cnt} >= {n} THEN (CAST(1 AS BIGINT) << i) "
        f"ELSE CAST(0 AS BIGINT) END)"
    )
    return _sum_ints(bits, dialect)


def hamming48_sql(a_col: str, b_col: str, dialect: str) -> str:
    """Hamming distance between two 48-bit SimHash values."""
    if dialect == DIALECT_SPARK:
        return f"bit_count({a_col} ^ {b_col})"
    return f"bit_count(xor({a_col}, {b_col}))"


def cosine_sql(a_col: str, b_col: str, dialect: str) -> str:
    """Cosine similarity of two float vectors, computed in double with a
    left-to-right fold in both engines, rounded to 6 decimals."""
    if dialect == DIALECT_SPARK:
        prods = f"zip_with({a_col}, {b_col}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
        sq = lambda c: f"transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    else:
        prods = (
            f"list_transform(list_zip({a_col}, {b_col}), "
            "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))"
        )
        sq = lambda c: f"list_transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    dot = _sum_doubles(prods, dialect)
    na = f"sqrt({_sum_doubles(sq(a_col), dialect)})"
    nb = f"sqrt({_sum_doubles(sq(b_col), dialect)})"
    return f"round({dot} / ({na} * {nb}), 6)"


def rolling_fp_ints_sql(norm_col: str, dialect: str, k: int = 8, mod: int = 16) -> str:
    """Content-defined fingerprints as a sorted distinct int array:
    48-bit hashes of character k-grams of the normalized text, kept when
    ``hash % mod == 0`` (~1/mod of positions, chosen by content alone —
    the same selection a Rabin-Karp rolling hash drives in winnowing/CDC
    systems; hashing each k-gram directly is vectorized SQL instead of a
    sequential fold, with identical output semantics)."""
    n = f"length({norm_col})"
    grams_body = _transform(
        f"sequence(1, {n} - {k - 1})" if dialect == DIALECT_SPARK else f"range(1, {n} - {k - 2})",
        f"i -> substr({norm_col}, i, {k})",
        dialect,
    )
    if dialect == DIALECT_SPARK:
        grams = f"CASE WHEN {n} < {k} THEN CAST(array() AS ARRAY<STRING>) ELSE {grams_body} END"
    else:
        # range(1, m) is empty for m <= 1, no guard needed
        grams = grams_body
    ints = _transform(
        _transform(grams, "g -> md5(g)", dialect),
        f"m -> {hex_prefix_int_sql('m', dialect)}",
        dialect,
    )
    sel = _distinct(_filter(ints, f"x -> x % {mod} = 0", dialect), dialect)
    return f"array_sort({sel})" if dialect == DIALECT_SPARK else f"list_sort({sel})"


def rolling_fps_sql(norm_col: str, dialect: str, k: int = 8, mod: int = 16) -> str:
    """:func:`rolling_fp_ints_sql` rendered as a comma-joined string so
    both dialects compare byte-identically."""
    sorted_sel = rolling_fp_ints_sql(norm_col, dialect, k, mod)
    joined = _transform(sorted_sel, f"x -> {_str_of('x', dialect)}", dialect)
    if dialect == DIALECT_SPARK:
        return f"array_join({joined}, ',')"
    return f"coalesce(array_to_string({joined}, ','), '')"


def stopword_hits_sql(tokens_col: str, lang: str, dialect: str) -> str:
    """Count of tokens that are stopwords of ``lang``."""
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return _size(_filter(tokens_col, f"w -> w IN ({words})", dialect), dialect)

