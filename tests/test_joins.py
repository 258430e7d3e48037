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


def test_asof_join_forward_strict_and_nulls(spark):
    import pyspark.sql.functions as F
    from reader_spark.operators.joins import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (1, 30, "c")], "k long, rts long, v string"
    )
    out = {
        (r["k"], r["lts"]): r["v"]
        for r in asof_join_forward(
            left, right, "k", "k", "lts", "rts"
        ).collect()
    }
    # strictly after: the rts=10 row is NOT visible to lts=10
    assert out[(1, 10)] == "b"
    assert out[(1, 20)] == "c"
    assert out[(2, 5)] is None  # key with no right rows


def test_funnel_steps_horizon_and_ordering(spark):
    import datetime as dt

    from reader_spark.operators.joins import funnel_steps

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: full funnel within horizon
        (1, ts(0), "view"),
        (1, ts(10), "click"),
        (1, ts(20), "purchase"),
        # user 2: click outside the 30-min horizon -> chain broken,
        # later purchase must NOT count either
        (2, ts(0), "view"),
        (2, ts(40), "click"),
        (2, ts(45), "purchase"),
        # user 3: purchase BEFORE the click does not convert
        (3, ts(0), "view"),
        (3, ts(5), "purchase"),
        (3, ts(10), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(
            ev, ["view", "click", "purchase"], horizon_s=1800
        ).collect()
    }
    assert out[1]["ts_1"] is not None and out[1]["ts_2"] is not None
    assert out[2]["ts_1"] is None and out[2]["ts_2"] is None
    assert out[3]["ts_1"] is not None and out[3]["ts_2"] is None
