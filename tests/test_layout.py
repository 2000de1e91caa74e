"""Z-order layout: key correctness, file-span tightness, pruning gain,
and the no-Python plan guarantee (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.layout import (
    file_bucket_spans,
    morton_key,
    morton_sql,
    zorder_layout,
)
from cnc_visionsearch_spark.queries_layout import (
    events_zorder_block_stats,
    events_zorder_pruning_gain,
)
from cnc_visionsearch_spark.sources.catalog import load_table


def _py_morton(vals: list[int], bits: int) -> int:
    n = len(vals)
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * n + i)
    return z


def test_morton_key_matches_python(spark):
    rows = [(3, 5), (0, 0), (255, 255), (170, 85), (149, 245)]
    df = spark.createDataFrame(rows, "ub int, vb int").withColumn(
        "z", morton_key(["ub", "vb"], 8)
    )
    got = {(r.ub, r.vb): r.z for r in df.collect()}
    for ub, vb in rows:
        assert got[(ub, vb)] == _py_morton([ub, vb], 8)


def test_morton_sql_dialects_agree_on_duckdb():
    import duckdb

    expr = morton_sql(["ub", "vb"], 8, "duckdb")
    con = duckdb.connect()
    for ub, vb in [(3, 5), (255, 0), (149, 245)]:
        (z,) = con.execute(
            f"SELECT {expr} FROM (SELECT {ub} AS ub, {vb} AS vb)"
        ).fetchone()
        assert z == _py_morton([ub, vb], 8)


def test_morton_key_is_codegen_not_python(spark):
    df = spark.range(4).select(
        (F.col("id") % 16).cast("int").alias("ub"),
        (F.col("id") % 13).cast("int").alias("vb"),
    )
    plan = df.withColumn("z", morton_key(["ub", "vb"], 8))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _bucketed_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.expr("(user_id & 255)").cast("int").alias("ub"),
        F.expr("LEAST(CAST(FLOOR(value / 2) AS INT), 255)").alias("vb"),
        "event_id",
    )


def test_zorder_files_have_tight_spans(spark, sf_dir, tmp_path):
    """Footer min/max spans of z-ordered files are materially tighter
    than a round-robin layout on BOTH dimensions — the property a
    multi-dim predicate prunes on."""
    b = _bucketed_events(spark, sf_dir)
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "rr")
    zorder_layout(b, ["ub", "vb"], zpath, bits=8, n_files=8)
    b.repartition(8).write.mode("overwrite").parquet(rpath)

    def mean_span(path, col):
        spans = [e[f"{col}_span"] for e in file_bucket_spans(path, ["ub", "vb"])
                 if e[f"{col}_span"] is not None]
        assert spans
        return sum(spans) / len(spans)

    for col in ("ub", "vb"):
        z_span, rr_span = mean_span(zpath, col), mean_span(rpath, col)
        # a dimension with a tiny populated domain (user_id tops out
        # around 14 at sf0.001) has nothing to tighten — require
        # no-worse there, and a strict 2x win where the domain is wide
        domain = b.select(F.max(col) - F.min(col)).first()[0]
        if domain >= 32:
            assert z_span < 0.5 * rr_span, (
                f"z-order did not tighten {col} file spans"
            )
        else:
            assert z_span <= rr_span


def test_zorder_layout_roundtrip_complete(spark, sf_dir, tmp_path):
    b = _bucketed_events(spark, sf_dir)
    path = str(tmp_path / "z2")
    zorder_layout(b, ["ub", "vb"], path, bits=8, n_files=4)
    back = spark.read.parquet(path)
    assert back.columns == b.columns  # __z key not persisted
    assert back.count() == b.count()
    assert (
        back.select(F.sum("event_id")).first()[0]
        == b.select(F.sum("event_id")).first()[0]
    )


def test_block_stats_tiles_bounded(spark, sf_dir):
    """Every z_block is one 16x16 tile: per-dimension span <= 15."""
    rows = events_zorder_block_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ub_max - r.ub_min <= 15
        assert r.vb_max - r.vb_min <= 15


def test_pruned_scan_skips_files_same_answer(spark, sf_dir, tmp_path):
    """Footer-prune scan over the z layout: strictly fewer files read,
    identical rows to a full-scan filter."""
    from cnc_visionsearch_spark.operators.layout import pruned_scan

    b = _bucketed_events(spark, sf_dir)
    path = str(tmp_path / "z3")
    zorder_layout(b, ["ub", "vb"], path, bits=8, n_files=8)
    ranges = {"ub": (0, 3), "vb": (0, 31)}

    pruned = pruned_scan(spark, path, ranges)
    full = spark.read.parquet(path).filter(
        F.col("ub").between(0, 3) & F.col("vb").between(0, 31)
    )
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in full.collect()
    )
    spans = file_bucket_spans(path, ["ub", "vb"])
    n_files_read = sum(
        1 for e in spans
        if e["ub"][0] <= 3 and e["vb"][0] <= 31  # lows are >= 0 everywhere
    )
    assert n_files_read < len(spans)


def test_pruned_scan_empty_intersection(spark, sf_dir, tmp_path):
    from cnc_visionsearch_spark.operators.layout import pruned_scan

    b = _bucketed_events(spark, sf_dir)
    path = str(tmp_path / "z4")
    zorder_layout(b, ["ub", "vb"], path, bits=8, n_files=4)
    out = pruned_scan(spark, path, {"ub": (300, 400)})
    assert out.count() == 0
    assert out.columns == b.columns


def test_zorder_write_raw_columns_tight_value_spans(spark, sf_dir, tmp_path):
    """zorder_write quantile-buckets RAW columns itself; the persisted
    files carry tight footer spans on the original value column."""
    from cnc_visionsearch_spark.operators.layout import zorder_write

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath, rpath = str(tmp_path / "zw"), str(tmp_path / "zw_rr")
    zorder_write(ev, ["user_id", "value"], zpath, bits=6, n_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(rpath)

    def mean_span(path):
        spans = [e["value_span"] for e in file_bucket_spans(path, ["value"])
                 if e["value_span"] is not None]
        return sum(spans) / len(spans)

    assert mean_span(zpath) < 0.6 * mean_span(rpath)
    back = spark.read.parquet(zpath)
    assert back.columns == ev.columns  # helper columns not persisted
    assert back.count() == ev.count()


def test_pruning_gain_prunes_most_blocks(spark, sf_dir):
    r = events_zorder_pruning_gain(spark, sf_dir).first()
    assert r.rows_in_touched_blocks >= r.rows_matched
    # the 0.8%-of-keyspace rectangle touches a small minority of blocks
    assert r.touched_blocks <= r.total_blocks / 4
