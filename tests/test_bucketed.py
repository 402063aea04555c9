"""Bucketed-storage layout: the write-once-shuffle-never contract,
asserted against physical plans and against data equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgverify_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the Exchange (or its absence) is visible —
    a broadcast join would hide the layout benefit on small testdata."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_plans_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    """Two tables bucketed on the same key join with ZERO Exchange; the
    same join on plain parquet shuffles both sides; results identical."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "orders_b", "o_custkey", 8, str(tmp_path / "ob"))
    write_bucketed(customer, "cust_b", "c_custkey", 8, str(tmp_path / "cb"))
    try:
        ob, cb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "cust_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        assert "Exchange" not in _plan(joined)

        plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        assert "Exchange" in _plan(plain)

        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_bucketed_aggregation_skips_shuffle(spark, sf_dir, tmp_path):
    """A groupBy on the bucket key aggregates in place — no Exchange
    below the final HashAggregate pair."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders, "orders_agg_b", "o_custkey", 8, str(tmp_path / "oab"))
    try:
        ob = read_bucketed(spark, "orders_agg_b")
        agg = ob.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
        assert "Exchange" not in _plan(agg)
        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "Exchange" in _plan(plain)
        assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_agg_b")


def test_bucketed_sorted_write_roundtrip(spark, sf_dir, tmp_path):
    """sort_by metadata survives the catalog and data is complete."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(
        orders, "orders_s_b", "o_custkey", 4, str(tmp_path / "osb"), sort_by="o_orderkey"
    )
    try:
        back = read_bucketed(spark, "orders_s_b")
        assert back.count() == orders.count()
        desc = spark.sql("DESCRIBE EXTENDED orders_s_b").collect()
        txt = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
        assert "o_custkey" in txt and "4" in txt  # bucket spec recorded
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_s_b")


def test_lsh_index_probe_zero_corpus_exchange(spark, sf_dir, tmp_path, no_broadcast):
    """probe_lsh_index against a persisted bucketed band index: the
    corpus side of BOTH joins reuses the stored layout (scan reports
    Bucketed: true), and results equal the recompute-everything
    cross_corpus_lsh_pairs."""
    from pgverify_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter("doc_id % 10 = 7")
    corp = docs.filter("doc_id % 10 <> 7")
    dedup.write_lsh_index(corp, "lshidx", str(tmp_path / "idx"))
    try:
        probe = dedup.probe_lsh_index(spark, new, "lshidx", 0.3)
        plan = _plan(probe)
        # both corpus-side scans come from bucketed tables
        assert plan.count("Bucketed: true") >= 2
        # the corpus band table is joined WITHOUT re-shuffling: strictly
        # fewer exchanges than the recompute-everything formulation
        recompute = dedup.cross_corpus_lsh_pairs(new, corp, 0.3)
        assert plan.count("Exchange") < _plan(recompute).count("Exchange")
        assert sorted(map(tuple, probe.collect())) == sorted(
            map(tuple, recompute.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS lshidx_bands")
        spark.sql("DROP TABLE IF EXISTS lshidx_shingles")


def test_lsh_index_append_admits_batch(spark, sf_dir, tmp_path, no_broadcast):
    """Ingest-loop maintenance: probe -> admit novel docs -> append;
    the NEXT batch's probe sees the admitted docs, the bucket layout
    survives the append (still Bucketed: true), and the grown index
    equals a from-scratch rebuild."""
    from pgverify_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corp = docs.filter("doc_id % 3 = 0")
    batch1 = docs.filter("doc_id % 3 = 1")
    dedup.write_lsh_index(corp, "lshapp", str(tmp_path / "appidx"))
    try:
        # admit every batch1 doc with no near-dup in the corpus
        hits = dedup.probe_lsh_index(spark, batch1, "lshapp", 0.3)
        dup_ids = {r["new_doc"] for r in hits.collect()}
        admitted = batch1.filter(
            ~batch1.doc_id.isin(list(dup_ids)) if dup_ids else "true"
        )
        dedup.append_lsh_index(admitted, "lshapp")

        # batch2 contains an exact copy of an admitted batch1 doc: the
        # grown index must flag it even though the original index would not
        some_admitted = admitted.limit(1).collect()[0]
        batch2 = spark.createDataFrame(
            [(9_000_001, some_admitted["text"], "en", "src0", len(some_admitted["text"]))],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        probe2 = dedup.probe_lsh_index(spark, batch2, "lshapp", 0.3)
        plan = _plan(probe2)
        assert plan.count("Bucketed: true") >= 2  # layout survived append
        rows = probe2.collect()
        assert any(
            r["new_doc"] == 9_000_001 and r["corpus_doc"] == some_admitted["doc_id"]
            and r["jaccard"] == 1.0
            for r in rows
        )
        # grown index == rebuild over corp + admitted
        rebuilt_pairs = dedup.cross_corpus_lsh_pairs(
            batch2, corp.unionByName(admitted), 0.3
        )
        assert sorted(map(tuple, rows)) == sorted(map(tuple, rebuilt_pairs.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS lshapp_bands")
        spark.sql("DROP TABLE IF EXISTS lshapp_shingles")


def test_probe_loop_holds_no_growing_storage(spark, sf_dir, tmp_path):
    """A long ingest loop must keep executor storage flat: each
    probe_lsh_index call persists its batch-side shingle table
    (load-bearing, see dedup._shingled), tags it on the result, and
    release_cached_deps drops it after materialization — so N probes
    leave exactly as many persistent RDDs as zero probes did.  The same
    contract covers cross_corpus_lsh_pairs and semantic_dup_pairs.

    release_cached_deps unpersists BLOCKING, so counts are exact — but
    the shared session's ContextCleaner may concurrently GC *other*
    tests' stale checkpoint blocks, so the assertion is <= (a leak
    strictly adds; background cleanup only subtracts)."""
    from pgverify_spark.operators import dedup
    from pgverify_spark.operators.util import release_cached_deps

    def n_persisted() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corp = docs.filter("doc_id % 10 <> 7")
    dedup.write_lsh_index(corp, "lshflat", str(tmp_path / "flatidx"))
    try:
        base = n_persisted()
        for k in (7, 8, 9):
            batch = docs.filter(f"doc_id % 10 = {k}")
            res = dedup.probe_lsh_index(spark, batch, "lshflat", 0.3)
            res.collect()
            release_cached_deps(res)
        assert n_persisted() <= base, "probe loop leaked persisted blocks"

        res = dedup.cross_corpus_lsh_pairs(
            docs.filter("doc_id % 10 = 7"), corp, 0.3
        )
        res.collect()
        release_cached_deps(res)
        assert n_persisted() <= base

        res = dedup.semantic_dup_pairs(docs, embs)
        res.collect()
        release_cached_deps(res)
        assert n_persisted() <= base
    finally:
        spark.sql("DROP TABLE IF EXISTS lshflat_bands")
        spark.sql("DROP TABLE IF EXISTS lshflat_shingles")


def test_registry_reinvocation_holds_no_growing_storage(spark, sf_dir):
    """The registry's generation-release wrapper: re-invoking a
    registered query that persists tagged intermediates (the agreement
    report persists three pair streams; the curation flagship persists
    five stages) must first release the PREVIOUS invocation's blocks,
    so a long-lived session (driver, bench, sweep) holds at most one
    live generation per query instead of one per call."""
    from pgverify_spark import registry

    def n_persisted() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def settled(limit: int, timeout_s: float = 15.0) -> int:
        """Superseded localCheckpoint RDDs are released by the JVM
        ContextCleaner off a weak-ref queue — asynchronous, so under
        load the count can transiently exceed the steady state.  Nudge
        both GCs and poll until it settles (or time out and return the
        last reading)."""
        import gc
        import time

        deadline = time.monotonic() + timeout_s
        n = n_persisted()
        while n > limit and time.monotonic() < deadline:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            n = n_persisted()
        return n

    fn = registry.spark_queries()["dedup_agreement_report_documents"]
    fn(spark, sf_dir).collect()
    # baseline: one generation IS expected to stay live (the release
    # wrapper keeps the latest), so read it plainly — settling toward 0
    # would burn the full timeout every run
    after_first = n_persisted()
    for _ in range(2):
        fn(spark, sf_dir).collect()
    # each re-invocation releases the previous generation before
    # persisting its own, so the count must not grow run-over-run
    # (<=: the shared session's ContextCleaner may GC other blocks)
    assert settled(after_first) <= after_first, (
        "re-invocation leaked persisted blocks"
    )


def test_semantic_dup_pairs_survives_missing_embedding(spark, sf_dir):
    """A text-signal pair must survive a missing embedding row: the
    embedding join is LEFT (cosine coalesced to 0), so embedding
    coverage is not a precondition for lexical dedup (VERDICT r3 #5)."""
    from pgverify_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    full = dedup.semantic_dup_pairs(docs, embs)
    text_pairs = [
        r
        for r in full.collect()
        if r["signal"] in ("text", "both")
    ]
    assert text_pairs, "fixture has no text-signal pairs at sf0.001"
    victim = text_pairs[0]
    # drop BOTH sides' embedding rows: the pair must still surface via
    # its exact Jaccard, now as signal='text' with cosine 0
    embs_holed = embs.filter(
        f"vec_id NOT IN ({victim['doc_a']}, {victim['doc_b']})"
    )
    holed = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.semantic_dup_pairs(docs, embs_holed).collect()
    }
    got = holed.get((victim["doc_a"], victim["doc_b"]))
    assert got is not None, "text pair dropped when embedding row missing"
    assert got["signal"] == "text" and got["cosine"] == 0.0
    assert got["jaccard"] == victim["jaccard"]


def test_ivf_index_probe_bucket_pruning(spark, sf_dir, tmp_path, no_broadcast):
    """probe_ivf_index reads ONLY the probed cells (bucket pruning:
    SelectedBucketsCount < total) and returns exactly ivf_topk's answer
    for the same queries."""
    from pgverify_spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    similarity.write_ivf_index(embs, "ivfidx", str(tmp_path / "ivf"))
    try:
        qids = (0, 1, 2)
        queries = embs.filter(f"vec_id IN {qids}")
        probe = similarity.probe_ivf_index(spark, queries, "ivfidx", 10, 2)
        plan = _plan(probe)
        assert "SelectedBucketsCount" in plan
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2))  # pruned
        expect = similarity.ivf_topk(embs, qids, 10, 2)
        assert sorted(map(tuple, probe.collect())) == sorted(
            map(tuple, expect.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS ivfidx_cells")


def test_ivfpq_index_probe_bucket_pruning(spark, sf_dir, tmp_path, no_broadcast):
    """probe_ivfpq_index reads ONLY the probed cells of the stored
    32x-compressed codes table (SelectedBucketsCount < total) and
    returns exactly ivfpq_topk's answer for the same queries."""
    import re

    from pgverify_spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    similarity.write_ivfpq_index(embs, "ivfpqidx", str(tmp_path / "ivfpq"))
    try:
        qids = (0, 1, 2, 3, 4)
        queries = embs.filter(f"vec_id IN {qids}")
        probe = similarity.probe_ivfpq_index(spark, queries, "ivfpqidx", 10, 2)
        plan = _plan(probe)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), "no bucket pruning"
        expect = similarity.ivfpq_topk(embs, qids, 10, 2)
        assert sorted(map(tuple, probe.collect())) == sorted(
            map(tuple, expect.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS ivfpqidx_cells")
        spark.sql("DROP TABLE IF EXISTS ivfpqidx_cb")


def test_ivf_ingest_probe_matches_recompute(spark, sf_dir, tmp_path, no_broadcast):
    """probe_ivf_dups against the stored inverted file bucket-prunes and
    equals the recompute-everything cross_corpus_ivf_pairs."""
    from pgverify_spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corp = embs.filter("vec_id % 10 <> 7")
    new = embs.filter("vec_id % 10 = 7")
    similarity.write_ivf_index(corp, "ivfing", str(tmp_path / "iv2"))
    try:
        probe = similarity.probe_ivf_dups(spark, new, "ivfing", 0.4, 2)
        assert "SelectedBucketsCount" in _plan(probe)
        expect = similarity.cross_corpus_ivf_pairs(new, corp, 0.4, 2)
        got = sorted(map(tuple, probe.collect()))
        assert got == sorted(map(tuple, expect.collect()))
        assert got  # non-trivial at sf0.001 too
    finally:
        spark.sql("DROP TABLE IF EXISTS ivfing_cells")


def test_ivfpq_rewrite_invalidates_probe_caches(spark, sf_dir, tmp_path):
    """write_ivfpq_index evicts any probe-side frames cached for that
    index name (ADVICE r8): a rebuilt index can never serve a stale
    collected codebook or a dropped-file listing; other indexes'
    entries survive."""
    from pgverify_spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    similarity.write_ivfpq_index(embs, "ivfpqinv", str(tmp_path / "a"))
    try:
        # populate both caches through the probe path
        queries = embs.filter("vec_id IN (0, 1)")
        similarity.probe_ivfpq_index(spark, queries, "ivfpqinv", 5, 1).collect()
        assert any(k[1] == "ivfpqinv" for k in similarity._CB_FRAME_CACHE)
        assert any(k[1] == "ivfpqinv" for k in similarity._CELLS_FRAME_CACHE)
        other = ("someapp", "otheridx")
        similarity._CB_FRAME_CACHE[other] = "sentinel"
        similarity._CELLS_FRAME_CACHE[other] = "sentinel"
        # rewrite the same name: its entries must be gone, others kept
        similarity.write_ivfpq_index(embs, "ivfpqinv", str(tmp_path / "b"))
        assert not any(k[1] == "ivfpqinv" for k in similarity._CB_FRAME_CACHE)
        assert not any(k[1] == "ivfpqinv" for k in similarity._CELLS_FRAME_CACHE)
        assert similarity._CB_FRAME_CACHE.pop(other) == "sentinel"
        assert similarity._CELLS_FRAME_CACHE.pop(other) == "sentinel"
    finally:
        spark.sql("DROP TABLE IF EXISTS ivfpqinv_cells")
        spark.sql("DROP TABLE IF EXISTS ivfpqinv_cb")


def test_registry_parquet_target_invalidate(spark, sf_dir):
    """ParquetTarget.invalidate drops memoized frames for a path (all
    paths when None) so a rewrite site can enforce the write-once
    assumption (ADVICE r8)."""
    from pgverify_spark import registry

    t = registry.ParquetTarget("t", sf_dir)
    t.read(spark, "region")
    t.table_schema(spark, "region")
    assert any(k[1] == sf_dir for k in registry.ParquetTarget._frames)
    registry.ParquetTarget.invalidate("/nonexistent")  # no-op for other paths
    assert any(k[1] == sf_dir for k in registry.ParquetTarget._frames)
    registry.ParquetTarget.invalidate(sf_dir)
    assert not any(k[1] == sf_dir for k in registry.ParquetTarget._frames)
    assert not any(k[1] == sf_dir for k in registry.ParquetTarget._schemas)
