"""MongoDB source helpers: canonical Extended JSON row model.

Reference: Mongo rows are emitted as canonical Extended JSON strings
preserving type tags like {"$oid": ...}, {"$date": ...}
(lib/mongo/message.go:49-53); change events are decoded to op r/c/u/d
with before/after ext-JSON and an `_id` partition key
(lib/mongo/change_event.go:18-155).

Spark-first: the Mongo Spark connector (format "mongodb") does the
snapshot/stream reads when its jar is present (not in this container
— gated behind import-try); the ext-JSON projection + change-event
shaping below are plain column expressions and run anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MONGO_FORMAT = "mongodb"

# Mongo change stream operationType -> Debezium op
OP_MAP = {
    "insert": "c",
    "update": "u",
    "replace": "u",
    "delete": "d",
}


def snapshot_pipeline(
    min_id: str | None = None,
    max_id: str | None = None,
    id_field: str = "_id",
) -> str:
    """Aggregation-pipeline JSON for a bounded snapshot scan — the
    connector's `aggregation.pipeline` option; the `$match` runs
    server-side exactly like the reference's cursor filter
    (sources/mongo/snapshot.go:48-69: {_id: {$gte: min, $lte: max}}).

    Partitioned parallelism comes from the connector's partitioner on
    top of this bound; bounds use ext-JSON so ObjectId/typed ids
    round-trip."""
    import json as _json

    bounds = {}
    if min_id is not None:
        bounds["$gte"] = min_id
    if max_id is not None:
        bounds["$lte"] = max_id
    if not bounds:
        return "[]"
    return _json.dumps([{"$match": {id_field: bounds}}])


def snapshot_read_options(
    uri: str,
    database: str,
    collection: str,
    min_id: str | None = None,
    max_id: str | None = None,
    partitioner_field: str = "_id",
) -> dict[str, str]:
    """Options for spark.read.format("mongodb") — S9 snapshot scan."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "aggregation.pipeline": snapshot_pipeline(min_id, max_id),
        "partitioner.options.partition.field": partitioner_field,
    }


def mongo_available(spark: SparkSession) -> bool:
    """True when the Mongo Spark connector jar is on the classpath."""
    try:
        spark.read.format(MONGO_FORMAT)
        # Cheap probe: resolving the format class happens lazily on
        # load(); check the JVM-side DataSource lookup instead.
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("com.mongodb.spark.sql.connector.MongoTableProvider")
        return True
    except Exception:
        return False


def op_column(operation_type: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in OP_MAP.items() for x in kv])
    return m.getItem(operation_type)


def id_partition_key(id_json: Column) -> Column:
    """Partition key from the document `_id` (message.go:43-100):
    the key payload is {"id": <ext-json _id>}."""
    return F.to_json(F.struct(id_json.alias("id")))


def change_event_frame(
    raw: DataFrame,
    op_col: str = "operationType",
    full_doc: str = "fullDocument",
    pre_image: str = "fullDocumentBeforeChange",
    doc_key: str = "documentKey",
) -> DataFrame:
    """Shape a Mongo change-stream DataFrame (connector output or
    file-replayed fixtures) into the canonical (op, before, after,
    key) frame consumed by reader_spark.envelope.cdc_envelope.

    before/after stay Extended-JSON STRINGS (the reference's row
    model) — structure is recovered with from_json only when a query
    needs it. `documentKey` may arrive as a struct (connector) or an
    ext-JSON string (file-replayed fixtures)."""
    from pyspark.sql import types as T

    dk = raw.schema[doc_key].dataType
    key_json = (
        F.col(doc_key) if isinstance(dk, T.StringType) else F.to_json(F.col(doc_key))
    )
    return raw.select(
        op_column(F.col(op_col)).alias("op"),
        F.col(pre_image).cast("string").alias("before"),
        F.col(full_doc).cast("string").alias("after"),
        id_partition_key(key_json).alias("key"),
    )
