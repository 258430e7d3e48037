"""MySQL-binlog-shaped decode operators (reference C3/C4).

The reference zips positional binlog row arrays with the schema's
column names and pairs update rows into (before, after)
(sources/mysql/streaming/dml.go:17-123, splitIntoBeforeAndAfter at
converter.go:100-136), and drops rows whose GTID transaction id was
already seen per server-uuid (lib/mysql/gtid.go:10-51).

Spark-first: positional decode is element_at over the value array —
one select, no Python; update pairing is a filter on even/odd
positions after posexplode of row-pair chunks; GTID dedup is
dropDuplicates (stateful with watermark on streams, exact in batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_positional_rows(
    raw: DataFrame, schema_cols: list[str], values_col: str = "values"
) -> DataFrame:
    """C3: `values: array<string>` + ordered schema column names ->
    named columns. The zip the reference does per-row
    (dml.go:17-123) is N element_at expressions — codegen'd."""
    cols: list[Column] = [
        F.element_at(F.col(values_col), i + 1).alias(name)
        for i, name in enumerate(schema_cols)
    ]
    passthrough = [c for c in raw.columns if c != values_col]
    return raw.select(*passthrough, *cols)


def pair_update_rows(
    raw: DataFrame, rows_col: str = "rows"
) -> DataFrame:
    """C3: UPDATE_ROWS events carry [before1, after1, before2, ...];
    pair them (converter.go:100-136). posexplode + pos arithmetic —
    no window, order preserved within the event."""
    exploded = raw.select(
        *[c for c in raw.columns if c != rows_col],
        F.posexplode(rows_col).alias("pos", "row"),
    )
    pairs = exploded.withColumn("pair_idx", (F.col("pos") / 2).cast("int")).withColumn(
        "side", F.when(F.col("pos") % 2 == 0, "before").otherwise("after")
    )
    return (
        pairs.groupBy(
            *[c for c in raw.columns if c != rows_col], "pair_idx"
        )
        .pivot("side", ["before", "after"])
        .agg(F.first("row"))
    )


def gtid_dedupe_batch(events: DataFrame, sid_col: str = "gtid_sid",
                      tx_col: str = "gtid_tx") -> DataFrame:
    """C4 batch form: keep one row per (server-uuid, tx) — replays of
    already-seen transactions drop out (gtid.go:10-51)."""
    return events.dropDuplicates([sid_col, tx_col])


def gtid_dedupe_stream(events: DataFrame, ts_col: str,
                       sid_col: str = "gtid_sid",
                       tx_col: str = "gtid_tx",
                       watermark: str = "1 hour") -> DataFrame:
    """C4 streaming form: checkpointed dropDuplicates state, bounded
    by the watermark (the reference's TTL-less map grows forever —
    the watermark is the at-scale fix)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        [sid_col, tx_col]
    )
