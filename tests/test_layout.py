"""Z-order layout: Morton math portability and file-span clustering."""

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from klio_spark.plans.zorder import (
    morton_expr,
    morton_sql,
    quantize,
    write_zordered,
)


def test_morton_matches_duckdb(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200)]
    df = spark.createDataFrame(pairs, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_expr(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    }
    for x, y in pairs:
        want = duckdb.sql(
            f"SELECT {morton_sql(str(x), str(y), 8)} AS z"
        ).fetchone()[0]
        assert got[(x, y)] == want, (x, y)


def test_morton_known_values(spark):
    # interleave(3, 0) = 0b0101 = 5 ; interleave(0, 3) = 0b1010 = 10
    df = spark.createDataFrame([(3, 0), (0, 3)], "x bigint, y bigint")
    out = [
        r["z"]
        for r in df.select(
            morton_expr(F.col("x"), F.col("y"), 2).alias("z")
        ).collect()
    ]
    assert out == [5, 10]


def test_quantize_bounds(spark):
    df = spark.range(1).select(
        quantize(F.lit(-5.0), F.lit(0.0), F.lit(10.0), 4).alias("lo"),
        quantize(F.lit(50.0), F.lit(0.0), F.lit(10.0), 4).alias("hi"),
        quantize(F.lit(5.0), F.lit(0.0), F.lit(10.0), 4).alias("mid"),
    ).collect()[0]
    assert df["lo"] == 0 and df["hi"] == 15 and df["mid"] == 8


def test_zorder_write_clusters_both_columns(spark, sf_dir, tmp_path):
    """Per-file spans of BOTH interleaved columns must shrink vs an
    unclustered write — the zone-map-pruning win the layout buys."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    # bits matched to the small-sf key cardinality (suppkey is 0..9 at
    # sf0.001) so BOTH dimensions have bits to interleave
    zpath = str(tmp_path / "z")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", bits=4, n_files=16)

    def mean_span(path, col, mod):
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            r = duckdb.sql(
                f"SELECT max({col} % {mod}) - min({col} % {mod}) FROM '{f}' "
            ).fetchone()[0]
            if r is not None:
                spans.append(r)
        return sum(spans) / len(spans)

    base = str(tmp_path / "plain")
    li.repartition(16).write.parquet(base)
    for col in ("l_partkey", "l_suppkey"):
        z = mean_span(zpath, col, 16)
        p = mean_span(base, col, 16)
        assert z < p * 0.7, (col, z, p)
