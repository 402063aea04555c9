"""LLM-pipeline operators (text, dedup, similarity, multimodal) vs the
DuckDB oracle, plus behavioral invariants an oracle can't express."""

import pytest

from pgverify_spark.operators import dedup, multimodal, similarity, text

QIDS = (0, 1, 2, 3, 4)


def _cmp(spark_df, duck, sql):
    s = sorted(map(tuple, spark_df.collect()))
    d = sorted(map(tuple, duck.execute(sql).fetchall()))
    assert s == d, f"spark={s[:3]} duck={d[:3]}"
    return s


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_text_stats(docs, duck):
    rows = _cmp(text.text_stats(docs), duck, text.text_stats_oracle_sql("documents"))
    assert rows and all(0 <= r[7] <= 1 for r in rows)  # quality_score bounded


def test_language_id(docs, duck):
    rows = _cmp(text.language_id(docs), duck, text.language_id_oracle_sql("documents"))
    assert {r[1] for r in rows} <= {"en", "de", "fr", "es", "und"}


def test_token_counts(docs, duck):
    rows = _cmp(text.token_counts(docs), duck, text.token_counts_oracle_sql("documents"))
    # the BPE-ish pre-tokenizer splits at least as finely as whitespace
    assert all(r[2] >= r[1] for r in rows)


def test_rolling_fingerprint(docs, duck):
    rows = _cmp(
        text.rolling_fingerprint(docs), duck, text.rolling_fingerprint_oracle_sql("documents")
    )
    assert any(r[1] > 0 for r in rows)  # selection is non-degenerate
    # shared-run guarantee: a doc shares all fingerprints with itself +
    # a suffix extension (content-defined selection is position-independent)
    ext = docs.limit(3).selectExpr("doc_id + 1000000 AS doc_id", "concat(text, ' zzz tail') AS text", "lang", "source", "n_chars")
    both = text.rolling_fingerprint(docs.limit(3).unionByName(ext)).collect()
    by_id = {r.doc_id: set(r.fps.split(",")) - {""} for r in both}
    for base_id in list(by_id):
        if base_id < 1000000 and (base_id + 1000000) in by_id:
            assert by_id[base_id] <= by_id[base_id + 1000000]


def test_doc_fingerprints(docs, duck):
    rows = _cmp(
        text.doc_fingerprints(docs), duck, text.doc_fingerprints_oracle_sql("documents")
    )
    assert all(0 <= r[2] < (1 << 48) for r in rows)  # simhash fits 48 bits


def test_exact_dup_groups(docs, duck):
    _cmp(dedup.exact_dup_groups(docs), duck, dedup.exact_dup_groups_oracle_sql("documents"))


def test_exact_dup_detects_injected_duplicates(docs):
    dup = docs.limit(5).selectExpr(
        "doc_id + 1000000 AS doc_id", "text", "lang", "source", "n_chars"
    )
    groups = dedup.exact_dup_groups(docs.unionByName(dup)).collect()
    assert len(groups) >= 5
    assert all(g.n_docs >= 2 for g in groups)


def test_minhash_lsh_pairs(docs, duck):
    rows = _cmp(
        dedup.minhash_lsh_pairs(docs, 0.3),
        duck,
        dedup.minhash_lsh_pairs_oracle_sql("documents", 0.3),
    )
    assert all(r[0] < r[1] and r[2] >= 0.3 for r in rows)


def test_ngram_jaccard_pairs(docs, duck):
    _cmp(
        dedup.ngram_jaccard_pairs(docs, 0.5),
        duck,
        dedup.ngram_jaccard_pairs_oracle_sql("documents", 0.5),
    )


def test_ngram_jaccard_uncapped_matches_capped_on_cold_corpus(docs, duck):
    # no shingle in sf-testdata documents approaches the default cap, so
    # exact (None) and capped must agree — and so must their oracles
    capped = sorted(map(tuple, dedup.ngram_jaccard_pairs(docs, 0.5).collect()))
    exact = sorted(
        map(tuple, dedup.ngram_jaccard_pairs(docs, 0.5, max_shingle_freq=None).collect())
    )
    assert capped == exact
    _cmp(
        dedup.ngram_jaccard_pairs(docs, 0.5, max_shingle_freq=None),
        duck,
        dedup.ngram_jaccard_pairs_oracle_sql("documents", 0.5, max_shingle_freq=None),
    )


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A stopword-like phrase shared by every doc must not generate
    candidate pairs once its shingles cross the frequency cap; genuine
    near-dup pairs (overlap on cold shingles) must survive."""
    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{hot} unique{i} filler{i} token{i} alpha{i} beta{i}") for i in range(8)]
    # genuine near-dups: share a long cold tail present in only these two
    tail = "curated deterministic verification corpus sentence with many shared tokens"
    rows += [(100, f"start{100} {tail}"), (101, f"start{101} {tail}")]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    uncapped = dedup.ngram_jaccard_pairs(df, 0.3, max_shingle_freq=None).collect()
    capped = dedup.ngram_jaccard_pairs(df, 0.3, max_shingle_freq=5).collect()

    hot_pairs = {(r.doc_a, r.doc_b) for r in uncapped if r.doc_a < 100}
    assert hot_pairs  # uncapped: the hot phrase alone makes pairs
    capped_pairs = {(r.doc_a, r.doc_b) for r in capped}
    assert (100, 101) in capped_pairs  # cold-shingle overlap survives
    assert not any(a < 100 for a, _ in capped_pairs)  # hot-only pairs pruned
    # reported similarity is a lower bound of the true (uncapped) value
    true_j = {(r.doc_a, r.doc_b): r.jaccard for r in uncapped}
    assert all(r.jaccard <= true_j[(r.doc_a, r.doc_b)] for r in capped)


def test_minhash_recall_vs_exact(docs):
    """LSH pairs are verified with exact Jaccard, so they are always a
    subset of the exact pairs; at j >= 0.95 the 8x4 banding collision
    probability is 1 - (1 - 0.95^4)^8 ~ 0.9999983, so recall there must
    be total."""
    exact_07 = {(r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(docs, 0.7).collect()}
    lsh_07 = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs, 0.7).collect()}
    assert lsh_07 <= exact_07
    exact_95 = {(r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(docs, 0.95).collect()}
    lsh_95 = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs, 0.95).collect()}
    assert lsh_95 == exact_95


def test_simhash_near_pairs(docs, duck):
    rows = _cmp(
        dedup.simhash_near_pairs(docs),
        duck,
        dedup.simhash_near_pairs_oracle_sql("documents"),
    )
    assert all(r[2] <= dedup.SIMHASH_MAX_HAMMING for r in rows)


def test_embedding_near_dups(embs, duck):
    _cmp(
        dedup.embedding_near_dups(embs, 0.4),
        duck,
        dedup.embedding_near_dups_oracle_sql("embeddings", 0.4),
    )


def test_embedding_near_dups_lsh(embs, duck):
    rows = _cmp(
        dedup.embedding_near_dups_lsh(embs, 0.4),
        duck,
        dedup.embedding_near_dups_lsh_oracle_sql("embeddings", 0.4),
    )
    # verified candidates: always a subset of the exact O(n^2) baseline
    exact = {(r.vec_a, r.vec_b) for r in dedup.embedding_near_dups(embs, 0.4).collect()}
    assert {(r[0], r[1]) for r in rows} <= exact


def test_cosine_topk(embs, duck):
    rows = _cmp(
        similarity.cosine_topk(embs, QIDS, 10),
        duck,
        similarity.cosine_topk_oracle_sql("embeddings", QIDS, 10),
    )
    assert len(rows) == len(QIDS) * 10
    for qid in QIDS:  # ranks are 1..10 and scores non-increasing
        scored = sorted((r for r in rows if r[0] == qid), key=lambda r: r[3])
        assert [r[3] for r in scored] == list(range(1, 11))
        assert all(a[2] >= b[2] for a, b in zip(scored, scored[1:]))


def test_ann_lsh_topk(embs, duck):
    rows = _cmp(
        similarity.ann_lsh_topk(embs, QIDS, 10),
        duck,
        similarity.ann_lsh_topk_oracle_sql("embeddings", QIDS, 10),
    )
    # ANN results are a subset of each query's bucket — sanity: rank ordering
    assert all(r[3] >= 1 for r in rows)


def test_ivf_assign(embs, duck):
    rows = _cmp(
        similarity.ivf_assign(embs),
        duck,
        similarity.ivf_assign_oracle_sql("embeddings"),
    )
    assert all(0 <= r[1] <= similarity.IVF_CENTROIDS_N for r in rows)


def test_ivf_topk(embs, duck):
    rows = _cmp(
        similarity.ivf_topk(embs, QIDS, 10, 2),
        duck,
        similarity.ivf_topk_oracle_sql("embeddings", QIDS, 10, 2),
    )
    assert all(r[3] >= 1 for r in rows)


def test_ivf_full_probe_is_exact(embs):
    """Probing every cell must reproduce exact brute-force top-k."""
    exact = sorted(map(tuple, similarity.cosine_topk(embs, QIDS, 5).collect()))
    full = sorted(
        map(
            tuple,
            similarity.ivf_topk(embs, QIDS, 5, similarity.IVF_CENTROIDS_N).collect(),
        )
    )
    assert exact == full


def test_hyperplane_buckets(embs, duck):
    rows = _cmp(
        similarity.hyperplane_buckets(embs),
        duck,
        similarity.hyperplane_buckets_oracle_sql("embeddings"),
    )
    assert all(0 <= r[1] < (1 << similarity.HYPERPLANE_BITS) for r in rows)


def test_multimodal_features(docs, duck):
    rows = _cmp(
        multimodal.extract_features(docs),
        duck,
        multimodal.extract_features_oracle_sql("documents"),
    )
    assert all(r[1] > 0 and len(r[2]) == 32 for r in rows)


def test_multimodal_resize(docs, duck):
    rows = _cmp(
        multimodal.resize_images(docs, 64, 48),
        duck,
        multimodal.resize_images_oracle_sql("documents", 64, 48),
    )
    assert all(r[1] == 64 and r[2] == 48 and len(r[3]) == 32 for r in rows)


def test_multimodal_frame_sample(docs, duck):
    rows = _cmp(
        multimodal.frame_sample(docs, 2),
        duck,
        multimodal.frame_sample_oracle_sql("documents", 2),
    )
    assert rows, "frame fan-out should be non-empty"
    assert all(r[1] % 2 == 0 for r in rows)  # only every 2nd frame


def test_multimodal_decode_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"\x89PNG")


def test_hourly_rollup(spark, sf_dir, duck):
    from pgverify_spark.operators import rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = _cmp(rollup.hourly_rollup(events), duck, rollup.hourly_rollup_oracle_sql("events"))
    assert rows
    # exact-decimal sums and integer bucketing: totals reconcile with the raw table
    assert sum(r[2] for r in rows) == events.count()
    assert all(r[5] <= r[6] for r in rows)  # min_value <= max_value per group


def test_daily_rollup_reaggregates_hourly(spark, sf_dir, duck):
    from pgverify_spark.operators import rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = _cmp(rollup.daily_rollup(events), duck, rollup.daily_rollup_oracle_sql("events"))
    hourly = rollup.hourly_rollup(events).collect()
    # lossless re-aggregation: daily event totals equal the hourly totals
    assert sum(r[2] for r in daily) == sum(r.n_events for r in hourly)
    assert sum(r[3] for r in daily) == sum(r.sum_value for r in hourly)


def test_daily_rollup_plan_skips_distinct_rewrite(spark, sf_dir):
    """The daily path discards n_users, so it must not pay for the
    countDistinct rewrite the exact hourly level uses (Spark 4 plans a
    single distinct as an extra aggregate level keyed on user_id plus an
    extra shuffle — no Expand node, but one more Exchange)."""
    from pgverify_spark.operators import rollup

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly_none = plan(rollup.hourly_rollup(events, distinct_users=None))
    hourly_exact = plan(rollup.hourly_rollup(events))
    daily = plan(rollup.daily_rollup(events))
    # the distinct rewrite costs exactly one extra shuffle at the hourly level
    assert plan_exchanges(hourly_exact) == plan_exchanges(hourly_none) + 1
    # daily = hourly(no distinct) + one re-aggregation shuffle, nothing more
    assert plan_exchanges(daily) == plan_exchanges(hourly_none) + 1
    assert "n_users" not in daily
    # no aggregate in the daily plan is keyed on user_id (the distinct
    # rewrite's partial level would be)
    assert "keys=[hour_bucket" in daily and "user_id" not in daily.split("FileScan")[0]


def plan_exchanges(plan_str):
    return plan_str.count("Exchange")


def test_hourly_rollup_distinct_user_modes(spark, sf_dir):
    from pgverify_spark.operators import rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {(r.hour_bucket, r.event_type): r.n_users
             for r in rollup.hourly_rollup(events).collect()}
    approx_df = rollup.hourly_rollup(events, distinct_users="approx")
    # approx mode: plain partial-aggregatable HLL, no Expand node
    assert "Expand" not in approx_df._jdf.queryExecution().executedPlan().toString()
    for r in approx_df.collect():
        true = exact[(r.hour_bucket, r.event_type)]
        assert abs(r.n_users - true) <= max(2, 0.05 * true)
    omitted = rollup.hourly_rollup(events, distinct_users=None)
    assert "n_users" not in omitted.columns
    with pytest.raises(ValueError):
        rollup.hourly_rollup(events, distinct_users="bogus")
