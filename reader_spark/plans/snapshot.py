"""Snapshot-scan plan builders (reference §2.1, §2.3, §2.4).

The reference paginates tables sequentially with keyset queries
(`WHERE (pk) > (last) ORDER BY pk LIMIT n`, lib/rdbms/scan/scan.go:43-161).
Spark-first: a snapshot is a *partitioned parallel read* — chunk
orchestration disappears into partitioning, and Catalyst pushes
filters/projections into the scan. These builders keep the reference's
SEMANTICS (PK-complete, no dupes/drops at chunk boundaries, PK guard
on projections) as plan-construction-time validation + tests.

At 100 TB: the chunking strategy here maps to `numPartitions` JDBC
ranges or parquet split planning; no driver-side pagination loop ever
holds more than plan metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pk_bounds(df: DataFrame, pk_col: str):
    """S2: min/max PK probe (schema.go:249-315 et al.).

    One partial-aggregated job — at scale this is a metadata-cheap
    scan (parquet min/max statistics short-circuit it).
    """
    return df.agg(
        F.min(pk_col).alias("min_pk"), F.max(pk_col).alias("max_pk")
    )


def project_columns(
    df: DataFrame,
    pk_cols: list[str],
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """P1: include/exclude projection with the PK guard
    (lib/rdbms/column/column.go:36-77): excludeColumns never drops a
    PK; includeColumns must contain every PK. Catalyst prunes the
    scan to the selected columns (check ReadSchema in explain)."""
    if include is not None and exclude is not None:
        raise ValueError("include and exclude are mutually exclusive")
    if include is not None:
        missing = [c for c in pk_cols if c not in include]
        if missing:
            raise ValueError(f"includeColumns must contain primary keys, missing {missing}")
        return df.select(*include)
    if exclude is not None:
        dropped_pks = [c for c in exclude if c in pk_cols]
        if dropped_pks:
            raise ValueError(f"cannot exclude primary key columns {dropped_pks}")
        keep = [c for c in df.columns if c not in set(exclude)]
        return df.select(*keep)
    return df


def chunk_predicates(
    min_pk: int, max_pk: int, num_chunks: int, pk_col: str
) -> list[str]:
    """S1 replacement: split [min, max] into half-open ranges whose
    union covers the table exactly once — the JDBC `predicates=`
    partitioning contract. Mirrors the keyset scanner's no-dup/no-drop
    guarantee (scan.go:108-112 stuck-loop guard) but in parallel."""
    if num_chunks < 1:
        raise ValueError("num_chunks must be >= 1")
    span = max_pk - min_pk + 1
    step = max(1, span // num_chunks)
    preds = []
    lo = min_pk
    for i in range(num_chunks):
        hi = max_pk if i == num_chunks - 1 else min(max_pk, lo + step - 1)
        if i == num_chunks - 1:
            preds.append(f"{pk_col} >= {lo}")
        else:
            preds.append(f"{pk_col} >= {lo} AND {pk_col} <= {hi}")
        lo = hi + 1
        if lo > max_pk:
            break
    return preds


def chunked_scan(df: DataFrame, pk_col: str, num_chunks: int) -> DataFrame:
    """Union of chunk-predicate scans == full table. In production the
    chunks are JDBC partition predicates; here we validate the
    boundary math on a DataFrame (partition-boundary correctness test,
    SURVEY §5.3)."""
    row = df.agg(F.min(pk_col), F.max(pk_col)).collect()[0]
    if row[0] is None:
        # Empty table -> empty-table short-circuit (K4): schema-only.
        return df.limit(0)
    preds = chunk_predicates(int(row[0]), int(row[1]), num_chunks, pk_col)
    out = None
    for p in preds:
        part = df.filter(p)
        out = part if out is None else out.unionByName(part)
    return out


def transfer_dedupe(df: DataFrame, pk_cols: list[str], order_col: str,
                    tiebreak_cols: list[str] | None = None) -> DataFrame:
    """K3: the Transfer writer's final PK dedupe
    (writers/transfer/writer.go:329-366) — keep the latest row per PK.

    Spark-first: row_number over a PK-partitioned window. At scale
    this is one shuffle on the PK (same shuffle a MERGE would need);
    AQE handles skewed keys."""
    from pyspark.sql import Window as W

    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = W.partitionBy(*pk_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def interleaved_snapshot_merge(
    chunks: DataFrame,
    events: DataFrame,
    pk_col: str,
    data_cols: list[str],
    chunk_pos_col: str = "chunk_pos",
    pos_col: str = "pos",
    op_col: str = "op",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Concurrent (lock-free, watermark-interleaved) snapshot merge —
    the Debezium-style incremental-snapshot reconciliation that lets a
    table backfill run WHILE its CDC stream is live, extending the
    reference's stop-the-world-free snapshot (lib/rdbms/scan/scan.go)
    to full concurrency instead of the snapshot-then-stream handoff
    (`snapshot_then_stream`).

    Inputs: `chunks` — snapshot rows, each carrying the log POSITION
    at which its chunk was cut (`chunk_pos`; chunks are read at
    different times, so different rows carry different positions);
    `events` — decoded DML rows (op c/u/d) with their log position.

    Rule per PK: the latest event WINS iff its position is PAST the
    position at which that PK's chunk was read (events at or before
    the cut are already reflected inside the chunk — replaying them
    would resurrect stale values); a winning delete removes the row; a
    PK only in `events` (inserted after its range was scanned) appears
    with its latest state; a PK only in `chunks` survives as read.

    Scale: one PK-partitioned window over the event log (uniform keys,
    bounded by CDC volume, exactly the MERGE's own shuffle) + one
    full-outer equi-join on the PK. No driver state; each micro-batch
    of a live run applies the same plan via foreachBatch with `chunks`
    as the accumulating destination table.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(pk_col).orderBy(
        F.col(pos_col).desc(),
        *[F.col(c).asc() for c in (tiebreak_cols or [])],
    )
    latest = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            pk_col,
            F.col(op_col).alias("__op"),
            F.col(pos_col).alias("__pos"),
            *[F.col(c).alias(f"__e_{c}") for c in data_cols],
        )
    )
    snap = chunks.select(
        pk_col,
        F.col(chunk_pos_col).alias("__cpos"),
        *[F.col(c).alias(f"__s_{c}") for c in data_cols],
    )
    j = snap.join(latest, pk_col, "full")
    event_wins = F.col("__pos").isNotNull() & (
        F.col("__cpos").isNull() | (F.col("__pos") > F.col("__cpos"))
    )
    alive = F.when(event_wins, F.col("__op") != F.lit("d")).otherwise(
        F.lit(True)
    )
    return j.filter(alive).select(
        pk_col,
        *[
            F.when(event_wins, F.col(f"__e_{c}"))
            .otherwise(F.col(f"__s_{c}"))
            .alias(c)
            for c in data_cols
        ],
    )
