"""Temporal / range join operators the reference lacks but a
warehouse-side consumer of its CDC feeds needs (SURVEY §2.7: the
reference's only time reasoning is the schema-history timestamp gate,
`/root/reference/sources/mysql/streaming/dml.go:44-52` — an as-of
lookup. Generalized here as first-class operators).

Scale design (100 TB):
  * as-of join: the naive formulation is a non-equi theta join —
    O(|L|·|R|) per key. This implementation is the union+window
    algorithm: tag both sides, one shuffle on the key, sort within
    partition, `last(ignorenulls)` running fill. Linear, one
    exchange, no range explosion. Hot keys land on one task each —
    salt the key or pre-reduce the right side if a single key's
    history exceeds a partition.
  * range join (point-in-interval): the naive form is a cross join +
    filter. Binning makes it an equi join: intervals replicate to
    every fixed-width bin they overlap, points map to exactly one
    bin, join on bin id, residual predicate filters. Each (point,
    interval) pair co-occurs in exactly one bin, so no dedup pass is
    needed. Bin width trades replication (wide intervals -> many
    bins) against bucket size; pick ~the median interval width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row
    with the greatest `right_ts` <= `left_ts` for the same key
    (inclusive match on equal timestamps), NULLs when none precedes.

    The right side should be unique per (key, ts) — pre-reduce it if
    not, otherwise which same-timestamp row wins is undefined.

    Output: all left columns + `right_cols` (default: every right
    column except the key and timestamp)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (right_key, right_ts)]

    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        # Right rows sort BEFORE left rows on timestamp ties so an
        # equal-timestamp right row is visible to the left row.
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols]).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "__fill", F.last("__r", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__fill.{c}").alias(c) for c in right_cols],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, attach the right row
    with the SMALLEST `right_ts` strictly greater than `left_ts` for
    the same key (the "next event after" lookup — funnel analysis,
    time-to-next-action), NULLs when nothing follows.

    Same one-shuffle union+window algorithm as `asof_join`, with the
    window ordered descending so the running `last(ignorenulls)` seen
    at a left row is the nearest LATER right row; left rows sort
    before right rows on timestamp ties, making the match strict.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (right_key, right_ts)]

    r_struct_t = right.select(
        F.struct(*[F.col(c) for c in right_cols]).alias("s")
    ).schema["s"].dataType
    l_struct_t = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("s")
    ).schema["s"].dataType
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        # In the DESCENDING scan, left rows order before equal-ts
        # right rows, so an equal timestamp is NOT visible -> strict.
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "__fill", F.last("__r", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__tag") == 0).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__fill.{c}").alias(c) for c in right_cols],
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    horizon_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sequential funnel (first-touch): one row per step-0 event with
    columns ts_0..ts_{k} — ts_i is the FIRST step-i event strictly
    after ts_{i-1} and within `horizon_s` seconds of it, NULL once
    any step fails (and every later step stays NULL).

    Built as a chain of forward as-of joins: each hop is ONE shuffle
    on the user key, linear in the events touched — never the
    per-user quadratic pairing a correlated subquery would do. Since
    the matched ts_i is the MINIMUM later step-i event, an
    out-of-horizon match proves no in-horizon match exists, so the
    horizon mask after each hop is exact.
    """
    cur = events.filter(F.col(type_col) == steps[0]).select(
        F.col(user_col), F.col(ts_col).alias("ts_0")
    )
    for i, st in enumerate(steps[1:], 1):
        nxt = events.filter(F.col(type_col) == st).select(
            F.col(user_col), F.col(ts_col).alias(f"ts_{i}")
        )
        cur = asof_join_forward(
            cur,
            nxt,
            user_col,
            user_col,
            f"ts_{i - 1}",
            f"ts_{i}",
            right_cols=[f"ts_{i}"],
        )
        within = (
            F.unix_micros(F.col(f"ts_{i}"))
            - F.unix_micros(F.col(f"ts_{i - 1}"))
        ) <= horizon_s * 1_000_000
        cur = cur.withColumn(
            f"ts_{i}",
            F.when(
                F.col(f"ts_{i - 1}").isNotNull() & within, F.col(f"ts_{i}")
            ),
        )
    return cur


def range_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Point-in-interval join (`lo <= p < hi`) as a binned equi join.

    Intervals are exploded to every bin of `bin_width` they overlap;
    points map to their single bin; the join key is the bin id and
    the original range predicate runs as the residual filter. The
    shuffle is an equi-join shuffle on uniform bin ids — no cross
    product, AQE can skew-split a hot bin."""
    binned_i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    binned_p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    return (
        binned_p.join(binned_i, "__bin")
        .filter((F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bin")
    )
