"""Debezium-shaped canonical change-event model.

Reference: artie-labs/reader builds `SchemaEventPayload{Schema,
Payload{Before, After, Source, Operation}}` per row
(lib/debezium/transformer/transformer.go:108-127 snapshot path,
light_transformer.go:48-90 CDC path) and a partition key from the
PK columns (transformer.go:100-106, light_transformer.go:34-46).
Topic = `<prefix>.<suffix>` (lib/kafkalib/message.go:25-31).

Spark-first rebuild: the envelope is ONE `select()` of struct/json
column expressions — whole-stage codegen, no per-row Python. The
output contract matches what the reference hands to its Kafka writer:
(topic, key, value) string columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Debezium operation codes (reference: lib/debezium/transformer uses
# r=snapshot read, c=create, u=update, d=delete).
OP_READ = "r"
OP_CREATE = "c"
OP_UPDATE = "u"
OP_DELETE = "d"


def source_struct(db: str, schema: str, table: str, ts_col: Column | None = None) -> Column:
    """The Debezium `source` block. ts_ms defaults to the event time
    column if given, else the processing time (non-deterministic —
    keep out of golden tests)."""
    ts = ts_col if ts_col is not None else F.unix_millis(F.current_timestamp())
    return F.struct(
        F.lit(db).alias("db"),
        F.lit(schema).alias("schema"),
        F.lit(table).alias("table"),
        ts.cast("long").alias("ts_ms"),
    )


def partition_key(pk_cols: list[str], from_before: bool = False) -> Column:
    """JSON partition key from the PK columns.

    Reference semantics: delete events take the key from the `before`
    row (transformer.go:150-181); callers pass prefixed columns.
    """
    prefix = "before." if from_before else ""
    return F.to_json(F.struct(*[F.col(prefix + c).alias(c) for c in pk_cols]))


def snapshot_envelope(
    df: DataFrame,
    pk_cols: list[str],
    db: str = "db",
    schema: str = "public",
    table: str = "table",
    topic_prefix: str = "cdc",
    ts_col: Column | None = None,
) -> DataFrame:
    """Wrap a snapshot scan in the Debezium envelope, op="r".

    before is NULL for snapshot reads (transformer.go:108-127).
    Returns (topic, key, value) — the Kafka sink contract.
    """
    from pyspark.sql import types as T

    cols = df.columns
    after = F.struct(*[F.col(c) for c in cols])
    payload = F.struct(
        F.lit(None).cast(T.StructType(df.schema.fields)).alias("before"),
        after.alias("after"),
        source_struct(db, schema, table, ts_col).alias("source"),
        F.lit(OP_READ).alias("op"),
    )
    return df.select(
        F.lit(f"{topic_prefix}.{db}.{table}").alias("topic"),
        partition_key(pk_cols).alias("key"),
        # ignoreNullFields=false: Debezium envelopes carry explicit
        # "before": null on snapshot reads.
        F.to_json(payload, {"ignoreNullFields": "false"}).alias("value"),
    )


def cdc_envelope(
    df: DataFrame,
    pk_cols: list[str],
    before_col: str = "before",
    after_col: str = "after",
    op_col: str = "op",
    db: str = "db",
    schema: str = "public",
    table: str = "table",
    topic_prefix: str = "cdc",
    ts_col: Column | None = None,
) -> DataFrame:
    """Wrap a CDC stream (pre-shaped before/after structs + op code)
    in the envelope. Delete events key off `before`
    (light_transformer.go:34-46)."""
    payload = F.struct(
        F.col(before_col).alias("before"),
        F.col(after_col).alias("after"),
        source_struct(db, schema, table, ts_col).alias("source"),
        F.col(op_col).alias("op"),
    )
    key = F.when(
        F.col(op_col) == OP_DELETE,
        F.to_json(F.struct(*[F.col(f"{before_col}.{c}").alias(c) for c in pk_cols])),
    ).otherwise(
        F.to_json(F.struct(*[F.col(f"{after_col}.{c}").alias(c) for c in pk_cols]))
    )
    return df.select(
        F.lit(f"{topic_prefix}.{db}.{table}").alias("topic"),
        key.alias("key"),
        F.to_json(payload, {"ignoreNullFields": "false"}).alias("value"),
    )
