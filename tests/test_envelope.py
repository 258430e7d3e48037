"""Envelope shape tests — golden payloads modeled on the reference's
integration golden JSON (integration_tests/postgres/main.go:279+)."""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.envelope import cdc_envelope, snapshot_envelope


def test_snapshot_envelope_golden(spark):
    df = spark.createDataFrame([Row(id=7, name="x")])
    out = snapshot_envelope(
        df, pk_cols=["id"], db="db1", schema="public", table="t",
        topic_prefix="cdc", ts_col=F.lit(1234),
    ).collect()[0]
    assert out["topic"] == "cdc.db1.t"
    assert json.loads(out["key"]) == {"id": 7}
    val = json.loads(out["value"])
    assert val["op"] == "r"
    assert val["before"] is None
    assert val["after"] == {"id": 7, "name": "x"}
    assert val["source"] == {
        "db": "db1", "schema": "public", "table": "t", "ts_ms": 1234,
    }


def test_cdc_envelope_delete_keys_from_before(spark):
    rows = [
        Row(before=Row(id=1, v="old"), after=Row(id=1, v="new"), op="u", ts=5),
        Row(before=Row(id=2, v="gone"), after=None, op="d", ts=6),
        Row(before=None, after=Row(id=3, v="born"), op="c", ts=7),
    ]
    df = spark.createDataFrame(rows)
    out = {
        json.loads(r["value"])["op"]: r
        for r in cdc_envelope(
            df, pk_cols=["id"], db="d", table="t", ts_col=F.col("ts")
        ).collect()
    }
    assert json.loads(out["u"]["key"]) == {"id": 1}
    assert json.loads(out["d"]["key"]) == {"id": 2}  # from before-row
    assert json.loads(out["c"]["key"]) == {"id": 3}
    assert json.loads(out["d"]["value"])["after"] is None
    assert json.loads(out["c"]["value"])["before"] is None
