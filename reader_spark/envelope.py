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


def topic_suffix(dialect: str, db: str, schema: str, table: str) -> str:
    """Per-dialect topic suffix, matching the reference adapters:
    postgres = schema.table (sources/postgres/adapter/adapter.go:68-70),
    mysql = db.table (sources/mysql/adapter/adapter.go:75-77),
    mssql = db.schema.table (sources/mssql/adapter/adapter.go:69-71)."""
    if dialect == "postgres":
        return f"{schema}.{table}"
    if dialect == "mssql":
        return f"{db}.{schema}.{table}"
    return f"{db}.{table}"


# Spark type -> Debezium field type (lib/typing in artie-labs/transfer;
# the wire names are the Kafka-Connect standard ones).
_DBZ_TYPES: dict[str, str] = {
    "byte": "int8",
    "short": "int16",
    "integer": "int32",
    "long": "int64",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "binary": "bytes",
    "date": "int32",
    "timestamp": "int64",
}


def _field_json(name: str, spark_type_name: str) -> dict:
    return {
        "type": _DBZ_TYPES.get(spark_type_name, "string"),
        "optional": True,
        "field": name,
    }


def value_schema_json(fields: list[tuple[str, str]]) -> str:
    """Static per-table Debezium value-schema block: one FieldsObject
    for the `after` label, as the reference builds it
    (transformer.go:56-62 — Optional:false, FieldLabel:After). Built
    once on the driver and embedded as a JSON literal; the per-row
    work stays pure payload serialization."""
    import json

    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "type": "struct",
                    "fields": [_field_json(n, t) for n, t in fields],
                    "optional": False,
                    "field": "after",
                }
            ],
            "optional": False,
        },
        separators=(",", ":"),
    )


def key_schema_json(fields: list[tuple[str, str]]) -> str:
    """Static PrimaryKeyPayload schema block (transformer.go:160-181)."""
    import json

    return json.dumps(
        {"type": "struct", "fields": [_field_json(n, t) for n, t in fields]},
        separators=(",", ":"),
    )


def _wrap_json(schema_json: str, payload_json: Column) -> Column:
    """{"schema":<static>,"payload":<per-row>} by string concat — the
    schema block is plan-constant, so the only per-row work is the
    payload to_json (codegen'd; no struct re-shaping)."""
    return F.concat(
        F.lit('{"schema":' + schema_json + ',"payload":'),
        payload_json,
        F.lit("}"),
    )


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
    dialect: str = "mysql",
    wire_schema: bool = True,
) -> DataFrame:
    """Wrap a snapshot scan in the Debezium envelope, op="r".

    before is NULL for snapshot reads (transformer.go:108-127).
    Returns (topic, key, value) — the Kafka sink contract: value =
    json(SchemaEventPayload{schema,payload}) and key =
    json(PrimaryKeyPayload{schema,payload}) (kafkalib/writer.go:80-88),
    so reference-compatible consumers (artie transfer / Debezium
    sinks) can parse the output. wire_schema=False emits the bare
    payloads (lighter internal format, e.g. for parquet staging).
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
    # ignoreNullFields=false: Debezium envelopes carry explicit
    # "before": null on snapshot reads.
    value = F.to_json(payload, {"ignoreNullFields": "false"})
    key = partition_key(pk_cols)
    if wire_schema:
        types = {f.name: f.dataType.typeName() for f in df.schema.fields}
        value = _wrap_json(
            value_schema_json([(c, types[c]) for c in cols]), value
        )
        key = _wrap_json(key_schema_json([(c, types[c]) for c in pk_cols]), key)
    return df.select(
        F.lit(f"{topic_prefix}.{topic_suffix(dialect, db, schema, table)}").alias("topic"),
        key.alias("key"),
        value.alias("value"),
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
    dialect: str = "mysql",
    wire_schema: bool = True,
) -> DataFrame:
    """Wrap a CDC stream (pre-shaped before/after structs + op code)
    in the envelope. Delete events key off `before`
    (light_transformer.go:34-46). Wire format as in
    `snapshot_envelope`: {"schema","payload"} wrappers on both key and
    value (kafkalib/writer.go:80-88) unless wire_schema=False."""
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
    value = F.to_json(payload, {"ignoreNullFields": "false"})
    if wire_schema:
        row_fields = [
            (f.name, f.dataType.typeName())
            for f in df.schema[after_col].dataType.fields
        ]
        value = _wrap_json(value_schema_json(row_fields), value)
        key = _wrap_json(
            key_schema_json([(n, t) for n, t in row_fields if n in pk_cols]), key
        )
    return df.select(
        F.lit(f"{topic_prefix}.{topic_suffix(dialect, db, schema, table)}").alias("topic"),
        key.alias("key"),
        value.alias("value"),
    )
