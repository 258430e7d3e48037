"""Bucketed co-located joins and salted skew joins — plan and
result contracts."""

import pyspark.sql.functions as F
import pytest

from reader_spark.operators import partitioning as PT
from reader_spark.session import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    PT.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", 8
    )
    PT.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", "okey", 8
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # Force the join path (broadcast would hide the bucketing).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = PT.co_located_join(spark, lt, rt, "okey")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables, sf_dir):
    lt, rt = bucketed_tables
    bucketed_n = PT.co_located_join(spark, lt, rt, "okey").count()
    plain_n = (
        read_table(spark, sf_dir, "orders")
        .join(
            read_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed_n == plain_n


def test_salted_join_matches_unsalted(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("skey"), "l_orderkey", "l_extendedprice"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("skey"), "s_name"
    )
    salted = PT.salted_join(li, supp, "skey", salt_source="l_orderkey", n_salts=7)
    plain = li.join(supp, "skey")
    assert salted.count() == plain.count()
    a = sorted(salted.groupBy("s_name").count().collect())
    b = sorted(plain.groupBy("s_name").count().collect())
    assert a == b


def test_salt_is_deterministic_and_bounded(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").limit(500)
    s1 = li.select(PT.deterministic_salt(F.col("l_orderkey"), 16).alias("s"))
    s2 = li.select(PT.deterministic_salt(F.col("l_orderkey"), 16).alias("s"))
    assert s1.collect() == s2.collect()
    mn, mx = s1.agg(F.min("s"), F.max("s")).first()
    assert 0 <= mn and mx <= 15


def test_salted_join_outer_preserves_unmatched(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("skey"), "l_orderkey"
    )
    # Empty right side: every left row must survive a left join.
    supp = (
        read_table(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("skey"), "s_name")
        .filter(F.lit(False))
    )
    out = PT.salted_join(li, supp, "skey", salt_source="l_orderkey", how="left")
    assert out.count() == li.count()
    assert out.filter(F.col("s_name").isNotNull()).count() == 0


def test_zorder_write_empty_and_allnull_inputs(spark, tmp_path):
    """Empty input / all-null cluster column: no bounds to bucket
    against -> write unclustered instead of crashing on float(None)
    (r4 advice finding)."""
    from reader_spark.operators import partitioning as P

    empty = spark.createDataFrame([], "x long, y long")
    p1 = str(tmp_path / "z_empty")
    P.zorder_write(empty, p1, ["x", "y"], n_files=4)
    assert spark.read.parquet(p1).count() == 0

    nulls = spark.createDataFrame(
        [(None, 1), (None, 2)], "x long, y long"
    )
    p2 = str(tmp_path / "z_nulls")
    P.zorder_write(nulls, p2, ["x", "y"], n_files=4)
    got = spark.read.parquet(p2)
    assert got.count() == 2 and set(got.columns) == {"x", "y"}


def test_zorder_write_locality(spark, tmp_path):
    """Z-order clustering bounds per-file ranges on BOTH dimensions:
    a selective filter on either column intersects only a minority
    of files, while a single-column sort leaves the other dimension
    unpruned (every file intersects)."""
    from reader_spark.operators import partitioning as P

    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 7919) % 139).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    P.zorder_write(df, zpath, ["x", "y"], n_files=16)

    # naive baseline: range-sorted by x only
    npath = str(tmp_path / "naive")
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(npath))

    def files_intersecting(path, col, lo, hi):
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
            .collect()
        )
        hit = sum(1 for r in stats if r["mx"] >= lo and r["mn"] <= hi)
        return hit, len(stats)

    # ~10% slice of each dimension
    zx, ztot = files_intersecting(zpath, "x", 0, 13)
    zy, _ = files_intersecting(zpath, "y", 0, 13)
    nx, ntot = files_intersecting(npath, "x", 0, 13)
    ny, _ = files_intersecting(npath, "y", 0, 13)
    assert ztot == 16 and ntot == 16
    # naive prunes its own sort column hard but reads EVERY file for y
    assert nx <= 3 and ny == 16
    # z-order prunes BOTH dimensions to a minority of files
    assert zx <= 8 and zy <= 8
    # and the clustered write loses no rows
    assert spark.read.parquet(zpath).count() == n


def test_runtime_bloom_filter_join_prunes(spark, tmp_path):
    """Spark's runtime bloom-filter join insertion — the shuffle-side
    row-pruning lever for selective dim filters when the dim is too
    big to broadcast: the optimizer plants a bloom filter built from
    the filtered creation side into the fact scan. Off by default at
    local scale only because of the 10GB application-side threshold —
    at the 100 TB tier the defaults fire on their own; this pins the
    config recipe and asserts the plan shape."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        d = str(tmp_path)
        spark.range(500_000).selectExpr(
            "id", "id % 1000 AS k", "concat('v', id) AS pad"
        ).write.mode("overwrite").parquet(f"{d}/fact")
        spark.range(50_000).selectExpr(
            "id AS k2", "id % 97 AS attr"
        ).write.mode("overwrite").parquet(f"{d}/dim")
        fact = spark.read.parquet(f"{d}/fact")
        dim = spark.read.parquet(f"{d}/dim").filter("attr = 3")
        j = fact.join(dim, fact.k == dim.k2)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower()
        # and the join still computes the right thing
        assert j.count() == fact.filter("k % 97 = 3").count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
