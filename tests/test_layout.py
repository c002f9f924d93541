"""Z-order layout operators (operators/layout.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.layout import (
    cluster_by_morton,
    morton_key,
    morton_sql,
)


def _py_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_reference_and_is_bijective(spark):
    grid = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(grid, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", morton_key(F.col("a"), F.col("b"), 4).alias("z")).collect()
    }
    assert got == {(a, b): _py_morton(a, b, 4) for a, b in grid}
    assert len(set(got.values())) == len(grid)  # bijective on the grid


def test_morton_sql_mirror_agrees(spark):
    import duckdb

    rows = [(a, b) for a in (0, 3, 7, 255) for b in (0, 1, 128, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    sp = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", morton_key(F.col("a"), F.col("b"), 8).alias("z")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dk = {
        (a, b): z
        for a, b, z in con.execute(
            f"SELECT a, b, {morton_sql('a', 'b', 8)} FROM t"
        ).fetchall()
    }
    assert sp == dk


def test_cluster_narrows_both_dims_in_file_stats(spark, tmp_path):
    """The measurable pruning claim: after a Z-order write, each file's
    footer min/max span is far narrower in BOTH dimensions than an
    unclustered write of the same rows."""
    rows = [(i * 7919 % 1000, i * 104729 % 1000) for i in range(20000)]
    df = spark.createDataFrame(rows, "x long, y long")

    plain, zed = tmp_path / "plain", tmp_path / "zed"
    df.repartition(16).write.parquet(str(plain))
    cluster_by_morton(df, "x", "y", bits=10, num_files=16).write.parquet(str(zed))

    def avg_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    # round-robin files cover ~the full 0..999 range in both dims; 16
    # files = 4 high curve bits = 2 splits per dim, so each Z-ordered
    # file is ~4x narrower in each — assert a safe 2x
    for col in ("x", "y"):
        assert avg_span(zed, col) < avg_span(plain, col) / 2, col


def test_constant_column_collapses_to_bucket_zero(spark):
    df = spark.createDataFrame([(5, i) for i in range(10)], "x long, y long")
    out = cluster_by_morton(df, "x", "y", bits=4, num_files=1)
    # constant x contributes nothing: zkey is the interleave of y's
    # min/max bucket alone (y in 0..9 → bucket floor(y/9*16) capped)
    zs = {r._zkey for r in out.collect()}
    expect = {_py_morton(0, min(15, y * 16 // 9), 4) for y in range(10)}
    assert zs == expect


def test_morton_bits_validated(spark):
    with pytest.raises(ValueError):
        morton_key(F.lit(1), F.lit(1), 0)
    with pytest.raises(ValueError):
        morton_key(F.lit(1), F.lit(1), 32)


def test_minmax_bucket_returns_usable_frame(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.layout import minmax_bucket

    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x double")
    out = {r.x: r.bucket for r in minmax_bucket(df, "x", 2).collect()}
    assert out[0.0] == 0 and out[10.0] == 3  # full range maps to 0..2^bits-1
    assert 0 <= out[5.0] <= 3
