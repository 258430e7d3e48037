"""Source builders: JDBC plan generation (asserted as SQL, the
reference's scanner_test.go strategy) + DynamoDB-JSON decode."""

import json

from pyspark.sql import functions as F

from reader_spark.sources import dynamodb as DY
from reader_spark.sources import jdbc as J


def test_bounds_query_dialects():
    t = J.TableRef("public", "orders", ["o_orderkey"])
    assert J.bounds_query(t, J.POSTGRES) == (
        'SELECT min("o_orderkey") AS min_pk, max("o_orderkey") AS max_pk '
        'FROM "public"."orders"'
    )
    assert "`public`.`orders`" in J.bounds_query(t, J.MYSQL)


def test_jdbc_read_options_partitioning():
    t = J.TableRef("s", "t", ["id"])
    opts = J.jdbc_read_options(t, J.POSTGRES, "jdbc:postgresql://h/db", 1, 9999)
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "9999"
    assert opts["fetchsize"] == "5000"  # reference DefaultBatchSize


def test_composite_pk_predicates_disjoint_cover():
    preds = J.composite_pk_predicates(
        [(10, "m"), (20, "z")], ["a", "b"], J.POSTGRES
    )
    assert preds == [
        '("a", "b") <= (10, \'m\')',
        '("a", "b") > (10, \'m\') AND ("a", "b") <= (20, \'z\')',
        '("a", "b") > (20, \'z\')',
    ]
    assert J.composite_pk_predicates([], ["a"], J.POSTGRES) == ["1=1"]


def test_composite_pk_predicates_escapes_quotes():
    preds = J.composite_pk_predicates([("o'brien",)], ["name"], J.POSTGRES)
    assert "('o''brien')" in preds[0]


def test_decode_attribute_all_tags():
    assert DY.decode_attribute({"S": "x"}) == "x"
    assert DY.decode_attribute({"N": "1.5"}) == 1.5
    assert DY.decode_attribute({"BOOL": True}) is True
    assert DY.decode_attribute({"NULL": True}) is None
    assert DY.decode_attribute({"SS": ["a", "b"]}) == ["a", "b"]
    assert DY.decode_attribute({"NS": ["1", "2"]}) == [1.0, 2.0]
    assert DY.decode_attribute({"L": [{"S": "a"}, {"N": "2"}]}) == ["a", 2.0]
    assert DY.decode_attribute({"M": {"k": {"S": "v"}}}) == {"k": "v"}


def test_decode_dynamodb_json_udf(spark):
    item = json.dumps({"Item": {"id": {"S": "a1"}, "qty": {"N": "3"}}})
    df = spark.createDataFrame([(item,)], ["raw"])
    out = df.select(DY.decode_dynamodb_json(F.col("raw")).alias("j")).collect()[0]["j"]
    assert json.loads(out) == {"id": "a1", "qty": 3.0}


def test_decode_typed_items(spark):
    item = json.dumps({"id": {"S": "a1"}, "qty": {"N": "3"}, "ok": {"BOOL": True}})
    df = spark.createDataFrame([(item,)], ["item"])
    out = DY.decode_typed_items(
        df, "item", {"id": "S", "qty": "N", "ok": "BOOL"}
    ).collect()[0]
    assert out["id"] == "a1" and out["qty"] == 3.0 and out["ok"] is True


def test_stream_op_mapping(spark):
    df = spark.createDataFrame(
        [("INSERT",), ("MODIFY",), ("REMOVE",)], ["eventName"]
    )
    out = [
        r["op"]
        for r in df.select(
            DY.stream_op_column(F.col("eventName")).alias("op")
        ).collect()
    ]
    assert out == ["c", "u", "d"]


def test_catalog_queries_cover_all_dialects():
    from reader_spark.sources.jdbc import COLUMNS_QUERY, LIST_TABLES_QUERY, PK_QUERY

    for q in (COLUMNS_QUERY, PK_QUERY, LIST_TABLES_QUERY):
        assert set(q) == {"postgres", "mysql", "mssql"}
        for sql in q.values():
            rendered = sql.format(schema="public", table="t1")
            assert "{" not in rendered  # fully parameterized
    # dialect-specific shapes survive
    assert "pg_index" in PK_QUERY["postgres"]
    assert "BASE TABLE" in LIST_TABLES_QUERY["mysql"]
    assert "datetime_precision" in COLUMNS_QUERY["mssql"]


def test_mongo_change_event_frame(spark):
    from reader_spark.sources.mongo import change_event_frame

    raw = spark.createDataFrame(
        [
            ("insert", '{"_id": {"$oid": "a1"}, "x": 1}', None, '{"_id": {"$oid": "a1"}}'),
            ("update", '{"_id": {"$oid": "a1"}, "x": 2}', '{"_id": {"$oid": "a1"}, "x": 1}', '{"_id": {"$oid": "a1"}}'),
            ("delete", None, '{"_id": {"$oid": "a1"}, "x": 2}', '{"_id": {"$oid": "a1"}}'),
        ],
        "operationType string, fullDocument string, fullDocumentBeforeChange string, documentKey string",
    )
    rows = change_event_frame(raw).collect()
    assert [r.op for r in rows] == ["c", "u", "d"]
    assert rows[0].after.endswith('"x": 1}')
    assert rows[2].after is None and rows[2].before is not None
    assert '"id"' in rows[0].key  # ext-JSON _id wrapped as key payload


def test_mongo_snapshot_pipeline_bounds():
    import json

    from reader_spark.sources.mongo import snapshot_pipeline, snapshot_read_options

    p = json.loads(snapshot_pipeline('{"$oid":"aa"}', '{"$oid":"ff"}'))
    assert p == [{"$match": {"_id": {"$gte": '{"$oid":"aa"}', "$lte": '{"$oid":"ff"}'}}}]
    assert snapshot_pipeline() == "[]"
    opts = snapshot_read_options("mongodb://h", "db", "coll", min_id="1")
    assert opts["aggregation.pipeline"].startswith('[{"$match"')
    assert opts["partitioner.options.partition.field"] == "_id"


class FakeDynamoClient:
    """boto3-shaped control-plane fake: one page of exports, an
    in-progress export that completes after a poll, and an initiate
    path when nothing matches."""

    def __init__(self, exports=None, complete_after=1, manifest=None):
        self.exports = exports or []
        self.describe_calls = 0
        self.complete_after = complete_after
        self.manifest = manifest
        self.initiated = []

    def list_exports(self, TableArn, NextToken=None):
        # two-page response to exercise pagination
        if NextToken is None and len(self.exports) > 1:
            return {"ExportSummaries": self.exports[:1], "NextToken": "t1"}
        if NextToken == "t1":
            return {"ExportSummaries": self.exports[1:]}
        return {"ExportSummaries": self.exports}

    def describe_export(self, ExportArn):
        for e in self.exports:
            if e["ExportArn"] == ExportArn:
                desc = dict(e["_desc"])
                if desc.get("ExportStatus") == "IN_PROGRESS":
                    self.describe_calls += 1
                    if self.describe_calls > self.complete_after:
                        desc["ExportStatus"] = "COMPLETED"
                        desc["ExportManifest"] = self.manifest
                return {"ExportDescription": desc}
        raise KeyError(ExportArn)

    def export_table_to_point_in_time(self, **kwargs):
        self.initiated.append(kwargs)
        arn = "arn:aws:dynamodb:us-east-1:1:table/t/export/new"
        self.exports.append({
            "ExportArn": arn, "ExportStatus": "IN_PROGRESS",
            "_desc": {"ExportStatus": "IN_PROGRESS",
                      "S3Bucket": kwargs["S3Bucket"],
                      "S3Prefix": kwargs["S3Prefix"]},
        })
        return {"ExportDescription": {"ExportArn": arn}}


STREAM_ARN = "arn:aws:dynamodb:us-east-1:1:table/t/stream/2024-01-01T00:00:00.000"


def test_export_arn_and_manifest_helpers():
    assert DY.table_arn_from_stream_arn(STREAM_ARN) == (
        "arn:aws:dynamodb:us-east-1:1:table/t"
    )
    # vectors from lib/dynamo/util_test.go:22-33
    assert DY.parse_manifest_file(
        "bucket", "artie-ddb-export/AWSDynamoDB/abcdef-8831c8f6/manifest-summary.json"
    ) == "bucket/artie-ddb-export/AWSDynamoDB/abcdef-8831c8f6"
    import pytest

    with pytest.raises(ValueError):
        DY.parse_manifest_file("bucket", "x/manifest-summary")
    with pytest.raises(ValueError):
        DY.table_arn_from_stream_arn("arn:no-stream-part")


def test_export_control_plane_reuses_completed_export():
    manifest = "prefix/AWSDynamoDB/e1/manifest-summary.json"
    client = FakeDynamoClient(exports=[
        {"ExportArn": "arn:failed", "ExportStatus": "FAILED",
         "_desc": {"ExportStatus": "FAILED"}},
        {"ExportArn": "arn:done", "ExportStatus": "COMPLETED",
         "_desc": {"ExportStatus": "COMPLETED", "S3Bucket": "b",
                   "S3Prefix": "prefix", "ExportManifest": manifest}},
    ])
    cp = DY.ExportControlPlane(client, sleeper=lambda s: None)
    folder = cp.resolve_data_folder(STREAM_ARN, "b", "prefix")
    assert folder == "b/prefix/AWSDynamoDB/e1/data"
    assert client.initiated == []  # reused, not re-exported


def test_export_control_plane_initiates_and_polls(tmp_path, spark):
    # nothing matches -> initiate, poll IN_PROGRESS -> COMPLETED, then
    # replay the manifest's folder into the Spark data-plane read
    manifest = "pfx/AWSDynamoDB/e9/manifest-summary.json"
    client = FakeDynamoClient(exports=[], complete_after=2, manifest=manifest)
    sleeps = []
    cp = DY.ExportControlPlane(client, poll_seconds=30, sleeper=sleeps.append)
    # stage the "bucket" on local disk: <bucket>/<folder>/data/*.json
    bucket = str(tmp_path)
    data_dir = tmp_path / "pfx" / "AWSDynamoDB" / "e9" / "data"
    data_dir.mkdir(parents=True)
    items = [
        {"Item": {"pk": {"S": "a"}, "n": {"N": "1.5"}}},
        {"Item": {"pk": {"S": "b"}, "n": {"N": "2"}}},
    ]
    with open(data_dir / "part0.json", "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")

    folder = cp.resolve_data_folder(STREAM_ARN, bucket, "pfx")
    assert folder == f"{bucket}/pfx/AWSDynamoDB/e9/data"
    assert len(client.initiated) == 1
    assert client.initiated[0]["ExportFormat"] == "DYNAMODB_JSON"
    assert sleeps == [30, 30]  # polled until COMPLETED

    out = DY.read_export_snapshot(spark, folder, {"pk": "S", "n": "N"})
    got = {r["pk"]: r["n"] for r in out.collect()}
    assert got == {"a": 1.5, "b": 2.0}


def test_mongo_canonical_ext_json(spark):
    # canonical Extended JSON v2: numeric width / date-ness survive as
    # type tags (message.go:49-53 uses bson.MarshalExtJSON canonical)
    import datetime as dt
    import json as j

    from pyspark.sql import Row, types as T
    from reader_spark.sources import mongo as M

    schema = T.StructType([
        T.StructField("_id", T.StringType()),
        T.StructField("n_long", T.LongType()),
        T.StructField("n_int", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("at", T.TimestampType()),
        T.StructField("tags", T.ArrayType(T.LongType())),
        T.StructField("sub", T.StructType([T.StructField("k", T.IntegerType())])),
        T.StructField("blob", T.BinaryType()),
        T.StructField("missing", T.StringType()),
    ])
    row = Row(
        _id="507f1f77bcf86cd799439011", n_long=9876543210, n_int=42, x=1.5,
        s="hi", flag=True, at=dt.datetime(2024, 1, 15, 12, 0, 0),
        tags=[1, 2], sub=Row(k=7), blob=bytearray(b"\x01\x02"), missing=None,
    )
    df = spark.createDataFrame([row], schema)
    doc = F.struct(*[F.col(f.name) for f in schema.fields])
    out = df.select(
        M.canonical_ext_json(schema, doc, oid_fields={"_id"}).alias("e")
    ).collect()[0]["e"]
    got = j.loads(out)
    assert got["_id"] == {"$oid": "507f1f77bcf86cd799439011"}
    assert got["n_long"] == {"$numberLong": "9876543210"}
    assert got["n_int"] == {"$numberInt": "42"}
    assert got["x"] == {"$numberDouble": "1.5"}
    assert got["s"] == "hi" and got["flag"] is True
    assert got["at"] == {"$date": {"$numberLong": "1705320000000"}}
    assert got["tags"] == [{"$numberLong": "1"}, {"$numberLong": "2"}]
    assert got["sub"] == {"k": {"$numberInt": "7"}}
    assert got["blob"] == {"$binary": {"base64": "AQI=", "subType": "00"}}
    assert got["missing"] is None


def test_mongo_pk_id_string_rules(spark):
    # message.go:55-80: ObjectId -> {"$oid":...}; string raw; int decimal
    from pyspark.sql import Row, types as T
    from reader_spark.sources import mongo as M

    df = spark.createDataFrame([Row(a="507f1f77bcf86cd799439011", b="plain", c=7)])
    r = df.select(
        M.pk_id_string(F.col("a"), T.StringType(), oid=True).alias("oid"),
        M.pk_id_string(F.col("b"), T.StringType()).alias("s"),
        M.pk_id_string(F.col("c"), T.LongType()).alias("i"),
    ).collect()[0]
    assert r["oid"] == '{"$oid":"507f1f77bcf86cd799439011"}'
    assert r["s"] == "plain"
    assert r["i"] == "7"


def test_mongo_message_wire_contract(spark):
    # empty schema block, ext-JSON after, {"id": idString} key
    import json as j

    from pyspark.sql import Row
    from reader_spark.sources import mongo as M

    df = spark.createDataFrame(
        [Row(_id="507f1f77bcf86cd799439011", qty=3)]
    )
    out = M.mongo_message(
        df, "shop", "orders", ts_col=F.lit(1234), oid_id=True
    ).collect()[0]
    assert out["topic"] == "cdc.shop.orders"
    key = j.loads(out["key"])
    assert key == {"schema": {}, "payload": {"id": '{"$oid":"507f1f77bcf86cd799439011"}'}}
    val = j.loads(out["value"])
    assert val["schema"] == {}
    p = val["payload"]
    assert p["op"] == "r" and p["before"] is None
    after = j.loads(p["after"])
    assert after["_id"] == {"$oid": "507f1f77bcf86cd799439011"}
    assert after["qty"] == {"$numberLong": "3"}
    assert p["source"] == {"db": "shop", "collection": "orders", "ts_ms": 1234}
