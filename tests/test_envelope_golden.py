"""Full-type golden-payload envelope test.

Port of the reference's integration-test strategy
(/root/reference/integration_tests/postgres/main.go:73-278: a table
exercising ~every type, one known row, envelope JSON diffed against a
golden payload). Here the golden value JSON is built INDEPENDENTLY in
Python (json.dumps with compact separators matches Spark's to_json
rendering), so the assertion cross-checks the entire converter +
envelope pipeline against hand-computed wire values.
"""

import base64
import calendar
import datetime as dt
import json
from decimal import Decimal

import pyspark.sql.functions as F
from pyspark.sql import types as T

from reader_spark import envelope as E
from reader_spark.functions import converters as C

UTC = dt.timezone.utc


def test_full_type_golden_envelope(spark):
    raw_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("i16", T.ShortType()),
            T.StructField("i32", T.IntegerType()),
            T.StructField("i64", T.LongType()),
            T.StructField("f32", T.FloatType()),
            T.StructField("f64", T.DoubleType()),
            T.StructField("num", T.DecimalType(10, 2)),
            T.StructField("flag", T.BooleanType()),
            T.StructField("bits", T.StringType()),       # bit(5) as '10101'
            T.StructField("d", T.DateType()),
            T.StructField("t", T.TimestampType()),       # time-of-day carrier
            T.StructField("ts", T.TimestampType()),
            T.StructField("iv_months", T.IntegerType()),
            T.StructField("iv_days", T.IntegerType()),
            T.StructField("iv_micros", T.LongType()),
            T.StructField("yr", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("u", T.StringType()),
            T.StructField("js", T.StringType()),
            T.StructField("hst", T.StringType()),        # hstore text
            T.StructField("arr", T.ArrayType(T.IntegerType())),
            T.StructField("pt", T.StringType()),         # point text
            T.StructField("en", T.IntegerType()),        # enum index
            T.StructField("st", T.IntegerType()),        # set bitmask
            T.StructField("byts", T.BinaryType()),
        ]
    )
    ts = dt.datetime(2024, 1, 15, 12, 34, 56, 789012)
    row = (
        1, 42, 123456, 9876543210, 1.5, 2.25, Decimal("1234.56"), True,
        "10101", dt.date(2024, 1, 15), ts, ts, 1, 2, 3, 2024,
        "héllo", "123e4567-e89b-12d3-a456-426614174000", '{"a": 1}',
        '"k"=>"v"', [1, 2, 3], "(1.5,-2.5)", 2, 0b101, b"\x01\x02",
    )
    df = spark.createDataFrame([row], raw_schema)

    conv = df.select(
        F.col("id"),
        C.CONVERTERS["int16"].convert(F.col("i16")).alias("i16"),
        C.CONVERTERS["int32"].convert(F.col("i32")).alias("i32"),
        C.CONVERTERS["int64"].convert(F.col("i64")).alias("i64"),
        C.CONVERTERS["float"].convert(F.col("f32")).alias("f32"),
        C.CONVERTERS["double"].convert(F.col("f64")).alias("f64"),
        C.decimal_converter(10, 2).convert(F.col("num")).alias("num"),
        C.kafka_decimal_bytes(F.col("num")).alias("num_wire"),
        C.CONVERTERS["boolean"].convert(F.col("flag")).alias("flag"),
        C.bitset_bytes(F.col("bits")).alias("bits"),
        C.CONVERTERS["epoch_days"].convert(F.col("d")).alias("d"),
        C.CONVERTERS["time_micros"].convert(F.col("t")).alias("t"),
        C.CONVERTERS["micro_timestamp"].convert(F.col("ts")).alias("ts"),
        C.CONVERTERS["zoned_timestamp"].convert(F.col("ts")).alias("tstz"),
        C.interval_micros(
            F.col("iv_months"), F.col("iv_days"), F.col("iv_micros")
        ).alias("iv"),
        C.CONVERTERS["year"].convert(F.col("yr")).alias("yr"),
        C.CONVERTERS["string"].convert(F.col("s")).alias("s"),
        C.CONVERTERS["uuid"].convert(F.col("u")).alias("u"),
        C.CONVERTERS["json"].convert(F.col("js")).alias("js"),
        C.hstore_map("hst").alias("hst"),
        F.col("arr"),
        C.point_struct(F.col("pt")).alias("pt"),
        C.mysql_enum_decode(F.col("en"), ["red", "green", "blue"]).alias("en"),
        C.mysql_set_decode(F.col("st"), ["a", "b", "c"]).alias("st"),
        C.CONVERTERS["bytes"].convert(F.col("byts")).alias("byts"),
    )

    # wire_schema=False: this test pins the PAYLOAD byte-exactly (the
    # converters' wire values); the {"schema","payload"} wrapper is
    # covered by test_envelope.py.
    env = E.snapshot_envelope(
        conv, pk_cols=["id"], db="db1", schema="public", table="types",
        topic_prefix="cdc", ts_col=F.lit(1705321496789), wire_schema=False,
    )
    got = env.collect()[0]

    # --- hand-computed wire values (independent of Spark) ---
    epoch_days = (dt.date(2024, 1, 15) - dt.date(1970, 1, 1)).days
    micros = (
        calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
    )
    time_micros = ((12 * 60 + 34) * 60 + 56) * 1_000_000 + 789012
    interval = int(1 * (365.25 / 12.0) * 86_400_000_000) + 2 * 86_400_000_000 + 3
    after = {
        "id": 1, "i16": 42, "i32": 123456, "i64": 9876543210,
        "f32": 1.5, "f64": 2.25, "num": 1234.56,
        "num_wire": base64.b64encode(b"\x01\xe2\x40").decode(),  # 123456 BE
        "flag": True,
        "bits": base64.b64encode(bytes([0b10101])).decode(),     # LE BitSet
        "d": epoch_days, "t": time_micros, "ts": micros,
        "tstz": "2024-01-15T12:34:56.789012Z",
        "iv": interval, "yr": 2024, "s": "héllo",
        "u": "123e4567-e89b-12d3-a456-426614174000",
        "js": '{"a": 1}', "hst": {"k": "v"}, "arr": [1, 2, 3],
        "pt": {"x": 1.5, "y": -2.5}, "en": "green", "st": "a,c",
        "byts": base64.b64encode(b"\x01\x02").decode(),
    }
    expected_value = json.dumps(
        {
            "before": None,
            "after": after,
            "source": {
                "db": "db1", "schema": "public", "table": "types",
                "ts_ms": 1705321496789,
            },
            "op": "r",
        },
        separators=(",", ":"),
        ensure_ascii=False,
    )

    assert got.topic == "cdc.db1.types"
    assert got.key == '{"id":1}'
    assert got.value == expected_value
