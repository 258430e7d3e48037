"""Sinks (reference §2.6): Kafka publisher contract + file fallback.

The reference's Kafka writer (lib/kafkalib/writer.go:21-193) JSON-
serializes envelope+key, gzips, splits batches at 1 MiB, and retries
with jitter. On Spark, every one of those is a sink/client option on
`write.format("kafka")` — the engine's job is only to present
(topic, key, value) columns, which reader_spark.envelope already
does.

No Kafka broker exists in this container; kafka_available() gates the
real sink and the parquet/json fallback keeps pipelines runnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Mirrors the reference's operational defaults (BASELINE.md):
KAFKA_DEFAULTS = {
    "kafka.compression.type": "gzip",            # writer.go:32
    "kafka.max.request.size": str(1024 * 1024),  # writer.go:36 (1 MiB)
    "kafka.request.timeout.ms": "5000",          # writer.go:35
    "kafka.retries": "10",                       # writer.go:121
    "kafka.retry.backoff.ms": "100",
}


def kafka_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def write_kafka(
    env: DataFrame, bootstrap_servers: str, extra: dict[str, str] | None = None
) -> None:
    """Batch publish. `env` must carry (topic, key, value) string
    columns — the envelope contract (lib/kafkalib/message.go:9-31)."""
    writer = (
        env.selectExpr(
            "topic", "CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value"
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
    )
    for k, v in {**KAFKA_DEFAULTS, **(extra or {})}.items():
        writer = writer.option(k, v)
    writer.save()


def write_kafka_stream(
    env: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    extra: dict[str, str] | None = None,
):
    """Streaming publish with checkpointed offsets (at-least-once +
    keyed messages == the reference's idempotent-downstream
    contract, §2.7)."""
    writer = (
        env.selectExpr(
            "topic", "CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value"
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in {**KAFKA_DEFAULTS, **(extra or {})}.items():
        writer = writer.option(k, v)
    return writer.start()


def write_file_fallback(env: DataFrame, path: str, fmt: str = "parquet") -> None:
    env.write.mode("append").format(fmt).save(path)
