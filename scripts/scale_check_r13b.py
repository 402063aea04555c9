"""Round-13 batch-7 stress: cut_repeated_spans at 10x/100x.

The in-row reassembly rewrite carries an at-scale claim: token strings
cross exactly ONE exchange (the doc-keyed flag join), and the per-doc
cut decision is O(n*T) HOF work instead of an n-fold explode + two
text shuffles.  Replicated corpora are the worst case for this
operator: every document body recurs 10x/100x, so almost every gram is
a duplicate, the dup-flag relation saturates (P flags per doc, all
hot), and the reassembly touches every token of every copy.

    python scripts/scale_check_r13b.py [reps]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_check import DST, SRC, build_replicated, time_min2  # noqa: E402
from scale_check_r12g import DOCS100, build_docs_100  # noqa: E402


def main() -> None:
    from pgverify_spark.operators import dedup
    from pgverify_spark.operators.util import release_cached_deps
    from pgverify_spark.session import get_spark
    from pgverify_spark.sources.parquet import ParquetTarget

    build_replicated()
    build_docs_100()
    spark = get_spark("pgverify-spark-scale-r13b")
    spark.range(1_000_000).select("id").summary().collect()

    def run_cut(sf_dir: str) -> None:
        docs = ParquetTarget("t", sf_dir).read(spark, "documents")
        out = dedup.cut_repeated_spans(docs)
        out.write.format("noop").mode("overwrite").save()
        release_cached_deps(out)
        spark.catalog.clearCache()

    run_cut("/root/testdata/sf0.001")  # warm plan shapes

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results: dict[str, dict] = {}
    for label, sf_dir in (("1x", SRC), ("10x", DST), ("100x", DOCS100)):
        vals = [round(time_min2(lambda: run_cut(sf_dir)), 3) for _ in range(reps)]
        results[label] = {"min": min(vals), "all": vals}
        print(label, json.dumps(results[label]), flush=True)

    g10 = results["10x"]["min"] / results["1x"]["min"]
    g100 = results["100x"]["min"] / results["10x"]["min"]
    print(f"cut_repeated_spans wall growth: 1x->10x {g10:.2f}x, 10x->100x {g100:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
