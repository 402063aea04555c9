"""Z-order layout: key correctness vs a pure-Python Morton reference,
and MEASURED multi-dimensional row-group pruning from real parquet
footer statistics — the claim "sorting on the interleaved key lets a
selective scan skip files on EVERY interleaved column" is asserted,
not asserted-by-docstring."""

import glob
import os

import pytest

from pgverify_spark.sources import zorder


def _morton_ref(vals, bounds, bits):
    """Pure-Python reference of quantize + interleave."""
    import math

    qs = []
    for x, (lo, hi) in zip(vals, bounds):
        if hi == lo:
            qs.append(0)
            continue
        q = math.floor((float(x) - lo) * ((1 << bits) - 1) / (hi - lo))
        qs.append(min(max(q, 0), (1 << bits) - 1))
    key = 0
    n = len(qs)
    for b in range(bits):
        for i, q in enumerate(qs):
            key += ((q >> b) & 1) << (b * n + i)
    return key


def test_zorder_key_matches_reference(spark):
    rows = [(i, i * 7 % 100, (i * 13 % 50) / 3.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b double")
    got = {
        r["id"]: r["zkey"]
        for r in zorder.with_zorder_key(df, ["a", "b"], 8).select("id", "zkey").collect()
    }
    a_vals = [r[1] for r in rows]
    b_vals = [r[2] for r in rows]
    bounds = [(min(a_vals), max(a_vals)), (min(b_vals), max(b_vals))]
    for i, a, b in rows:
        assert got[i] == _morton_ref((a, b), bounds, 8), (i, a, b)
    # constant column quantizes to EXACTLY level 0 (not clamped 0/0
    # garbage): with a frozen, b spanning [1, 2], the key must equal
    # the reference with a's level pinned to 0
    cdf = spark.createDataFrame([(1, 5, 1.0), (2, 5, 2.0)], "id long, a long, b double")
    ks = {
        r["id"]: r["zkey"]
        for r in zorder.with_zorder_key(cdf, ["a", "b"], 8).select("id", "zkey").collect()
    }
    assert ks[1] == _morton_ref((0, 1.0), [(0, 0), (1.0, 2.0)], 8)
    assert ks[2] == _morton_ref((0, 2.0), [(0, 0), (1.0, 2.0)], 8)


def _matching_files(path, preds):
    """Files whose row-group [min, max] intersect every (col, lo, hi)
    box — what a parquet reader's footer pruning keeps."""
    import pyarrow.parquet as pq

    keep = 0
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ok = True
        for col, lo, hi in preds:
            ci = names.index(col)
            stats = [
                md.row_group(g).column(ci).statistics for g in range(md.num_row_groups)
            ]
            if all(s.max < lo or s.min > hi for s in stats):
                ok = False
                break
        if ok:
            keep += 1
    return keep, len(files)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The measured pruning claim: against a single-column-sorted
    layout, the z-ordered layout skips files for selective predicates
    on EITHER interleaved column; the one-column sort only skips on
    its own column.  Uses sf0.01 explicitly — the curve-locality
    property needs more rows per file than the sf0.001 test default
    provides (measured: at 375 rows/file the curve is too sparse to
    cluster; at ~3.7k rows/file the effect is unambiguous)."""
    import conftest

    sf01 = os.path.join(os.path.dirname(conftest.SF_DIR.rstrip("/")), "sf0.01")
    if not os.path.isdir(sf01):
        pytest.skip(f"no sf0.01 testdata next to {conftest.SF_DIR}")
    ev = spark.read.parquet(f"{sf01}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    zorder.write_zordered(ev, ["user_id", "value"], zpath, bits=8, files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lpath)
    )
    lo_u, hi_u = ev.selectExpr(
        "CAST(approx_percentile(user_id, 0.40) AS BIGINT)",
        "CAST(approx_percentile(user_id, 0.45) AS BIGINT)",
    ).first()
    lo_v, hi_v = ev.selectExpr(
        "approx_percentile(value, 0.40)", "approx_percentile(value, 0.45)"
    ).first()

    z_user, zn = _matching_files(zpath, [("user_id", lo_u, hi_u)])
    l_user, ln = _matching_files(lpath, [("user_id", lo_u, hi_u)])
    z_val, _ = _matching_files(zpath, [("value", lo_v, hi_v)])
    l_val, _ = _matching_files(lpath, [("value", lo_v, hi_v)])
    # the user-sorted layout is (near-)perfect on its own column...
    assert l_user <= zn // 4
    # ...and useless on the other: every file spans the full value range
    assert l_val == ln
    # the z-ordered layout prunes on BOTH dimensions (measured 9/16 and
    # 6/16 at authoring time; bounds leave noise headroom)
    assert z_user <= 3 * zn // 4, (z_user, zn)
    assert z_val <= zn // 2, (z_val, zn)
    # and the box predicate composes (skips at least as much as either)
    z_box, _ = _matching_files(
        zpath, [("user_id", lo_u, hi_u), ("value", lo_v, hi_v)]
    )
    assert z_box <= min(z_user, z_val)
    # layout is a permutation, not a transformation
    assert (
        spark.read.parquet(zpath).count()
        == ev.count()
        == spark.read.parquet(lpath).count()
    )


def test_write_zordered_empty_and_null_inputs(spark, tmp_path):
    """Equi-depth quantization degrades to constant level 0 on empty
    input / all-NULL columns instead of crashing (r9 review finding:
    approx_percentile returns NULL boundaries there)."""
    empty = spark.createDataFrame([], "id long, a long, b double")
    zorder.write_zordered(empty, ["a", "b"], str(tmp_path / "e"), bits=4, files=2)
    assert spark.read.parquet(str(tmp_path / "e")).count() == 0
    nulls = spark.createDataFrame(
        [(1, None, 2.0), (2, None, 1.0)], "id long, a long, b double"
    )
    zorder.write_zordered(nulls, ["a", "b"], str(tmp_path / "n"), bits=4, files=2)
    assert spark.read.parquet(str(tmp_path / "n")).count() == 2
