"""Envelope shape tests — golden payloads modeled on the reference's
integration golden JSON (integration_tests/postgres/main.go:279+) and
the Kafka wire contract (lib/kafkalib/writer.go:80-88): value =
json(SchemaEventPayload{schema,payload}), key =
json(PrimaryKeyPayload{schema,payload})."""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.envelope import cdc_envelope, snapshot_envelope, topic_suffix


def test_snapshot_envelope_golden(spark):
    df = spark.createDataFrame([Row(id=7, name="x")])
    out = snapshot_envelope(
        df, pk_cols=["id"], db="db1", schema="public", table="t",
        topic_prefix="cdc", ts_col=F.lit(1234),
    ).collect()[0]
    assert out["topic"] == "cdc.db1.t"
    key = json.loads(out["key"])
    assert key["payload"] == {"id": 7}
    assert key["schema"] == {
        "type": "struct",
        "fields": [{"type": "int64", "optional": True, "field": "id"}],
    }
    wrapper = json.loads(out["value"])
    assert wrapper["schema"]["type"] == "struct"
    [after_obj] = wrapper["schema"]["fields"]
    assert after_obj["field"] == "after" and after_obj["optional"] is False
    assert after_obj["fields"] == [
        {"type": "int64", "optional": True, "field": "id"},
        {"type": "string", "optional": True, "field": "name"},
    ]
    val = wrapper["payload"]
    assert val["op"] == "r"
    assert val["before"] is None
    assert val["after"] == {"id": 7, "name": "x"}
    assert val["source"] == {
        "db": "db1", "schema": "public", "table": "t", "ts_ms": 1234,
    }


def test_snapshot_envelope_bare_format(spark):
    # wire_schema=False: the lighter internal format (parquet staging)
    df = spark.createDataFrame([Row(id=7)])
    out = snapshot_envelope(
        df, pk_cols=["id"], db="d", table="t", ts_col=F.lit(0),
        wire_schema=False,
    ).collect()[0]
    assert json.loads(out["key"]) == {"id": 7}
    assert json.loads(out["value"])["op"] == "r"


def test_topic_suffix_per_dialect(spark):
    # postgres topics use schema.table (adapter.go:68-70), mysql
    # db.table, mssql db.schema.table
    assert topic_suffix("postgres", "db1", "public", "t") == "public.t"
    assert topic_suffix("mysql", "db1", "public", "t") == "db1.t"
    assert topic_suffix("mssql", "db1", "dbo", "t") == "db1.dbo.t"
    df = spark.createDataFrame([Row(id=1)])
    out = snapshot_envelope(
        df, pk_cols=["id"], db="db1", schema="public", table="t",
        dialect="postgres", ts_col=F.lit(0),
    ).collect()[0]
    assert out["topic"] == "cdc.public.t"


def test_cdc_envelope_delete_keys_from_before(spark):
    rows = [
        Row(before=Row(id=1, v="old"), after=Row(id=1, v="new"), op="u", ts=5),
        Row(before=Row(id=2, v="gone"), after=None, op="d", ts=6),
        Row(before=None, after=Row(id=3, v="born"), op="c", ts=7),
    ]
    df = spark.createDataFrame(rows)
    out = {
        json.loads(r["value"])["payload"]["op"]: r
        for r in cdc_envelope(
            df, pk_cols=["id"], db="d", table="t", ts_col=F.col("ts")
        ).collect()
    }
    assert json.loads(out["u"]["key"])["payload"] == {"id": 1}
    assert json.loads(out["d"]["key"])["payload"] == {"id": 2}  # from before-row
    assert json.loads(out["c"]["key"])["payload"] == {"id": 3}
    assert json.loads(out["d"]["value"])["payload"]["after"] is None
    assert json.loads(out["c"]["value"])["payload"]["before"] is None
    # key schema carries only the pk fields
    assert json.loads(out["u"]["key"])["schema"]["fields"] == [
        {"type": "int64", "optional": True, "field": "id"}
    ]
