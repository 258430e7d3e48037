"""As-of join (union+window) and binned range join.

Reference parity: the as-of lookup generalizes the schema-history
timestamp gate (/root/reference/sources/mysql/streaming/dml.go:44-52,
lib/maputil/most_recent_map.go:14-76 — pick the version active at an
event's timestamp)."""

import datetime as dt

import pyspark.sql.functions as F

from reader_spark.operators import joins as JO


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"), "e1"),
         (1, _ts("2024-01-10T00:00:00"), "e2"),
         (2, _ts("2024-01-01T00:00:00"), "e3")],
        "k long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-04T00:00:00"), "r-old"),
         (1, _ts("2024-01-07T00:00:00"), "r-new"),
         (3, _ts("2024-01-01T00:00:00"), "r-other")],
        "rk long, rt timestamp, tag string",
    )
    out = JO.asof_join(left, right, "k", "rk", "t", "rt").orderBy("t", "k")
    rows = {(r.k, r.ev): r.tag for r in out.collect()}
    assert rows[(1, "e1")] == "r-old"      # latest <= Jan 5 is Jan 4
    assert rows[(1, "e2")] == "r-new"      # Jan 7 overtakes
    assert rows[(2, "e3")] is None         # no right rows for key 2


def test_asof_inclusive_tie(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"), "e")], "k long, t timestamp, ev string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"), "same-instant")],
        "rk long, rt timestamp, tag string",
    )
    out = JO.asof_join(left, right, "k", "rk", "t", "rt")
    assert out.collect()[0].tag == "same-instant"


def test_range_bin_join_matches_naive(spark):
    points = spark.range(0, 500).select((F.col("id") % 97 * 1.7).alias("v"))
    intervals = spark.createDataFrame(
        [(0.0, 40.0), (25.0, 90.0), (80.0, 200.0), (150.0, 160.0)],
        "lo double, hi double",
    )
    binned = JO.range_bin_join(points, intervals, "v", "lo", "hi", bin_width=30.0)
    naive = points.crossJoin(intervals).filter(
        (F.col("lo") <= F.col("v")) & (F.col("v") < F.col("hi"))
    )
    key = lambda r: (round(r.v, 6), r.lo, r.hi)
    assert sorted(map(key, binned.collect())) == sorted(map(key, naive.collect()))


def test_range_bin_join_no_duplicates_on_bin_edges(spark):
    points = spark.createDataFrame([(30.0,), (29.999,), (60.0,)], "v double")
    intervals = spark.createDataFrame([(30.0, 60.0)], "lo double, hi double")
    out = JO.range_bin_join(points, intervals, "v", "lo", "hi", bin_width=30.0)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v == 30.0  # hi exclusive, lo inclusive, no dups
