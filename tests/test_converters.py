"""Converter golden tests — wire encodings mirror the reference's
lib/debezium/converters/*_test.go fixtures (values recomputed from
the documented encodings, not copied)."""

import datetime
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.functions import converters as C


def one(spark, value, fn, schema=None):
    df = spark.createDataFrame([Row(v=value)], schema=schema)
    return df.select(fn(F.col("v")).alias("out")).collect()[0]["out"]


def test_micro_timestamp(spark):
    ts = datetime.datetime(2021, 3, 4, 5, 6, 7, 123456)
    assert one(spark, ts, C.micro_timestamp) == 1614834367123456


def test_epoch_days(spark):
    # 1970-01-02 -> 1; 2021-01-01 -> 18628 (time.go:80-122 semantics)
    assert one(spark, datetime.date(1970, 1, 2), C.epoch_days) == 1
    assert one(spark, datetime.date(2021, 1, 1), C.epoch_days) == 18628


def test_time_micros_past_midnight(spark):
    ts = datetime.datetime(1970, 1, 1, 1, 2, 3, 456789)
    assert one(spark, ts, C.time_micros) == (
        1 * 3_600_000_000 + 2 * 60_000_000 + 3 * 1_000_000 + 456789
    )


def test_time_millis_past_midnight(spark):
    # TimeConverter (time.go:13-35): int32 ms, truncated
    ts = datetime.datetime(1970, 1, 1, 1, 2, 3, 456789)
    assert one(spark, ts, C.time_millis) == (
        1 * 3_600_000 + 2 * 60_000 + 3 * 1_000 + 456
    )


def test_nano_time_golden_vectors(spark):
    # NanoTimeConverter golden vectors (time_test.go:89-108):
    # midnight -> 0; 01:00:00 -> 3_600_000_000_000 ns
    assert one(spark, datetime.datetime(2023, 5, 3, 0, 0, 0), C.nano_time) == 0
    assert (
        one(spark, datetime.datetime(2023, 5, 3, 1, 0, 0), C.nano_time)
        == 3_600_000_000_000
    )
    # MSSQL time(7): the 100 ns digit survives via the string form
    assert one(spark, "1970-01-01 01:02:03.1234567", C.nano_time) == (
        (1 * 3600 + 2 * 60 + 3) * 1_000_000_000 + 123_456_700
    )
    # 6-digit (micro) strings take the fast path: no sub-micro tail
    assert one(spark, "1970-01-01 00:00:00.123456", C.nano_time) == 123_456_000


def test_nano_timestamp_golden_vector(spark):
    # NanoTimestampConverter (time_test.go:255-268): UnixMicro()*1000,
    # sub-micro digits DROPPED — 2024-05-16 12:34:56.1234567 ->
    # 1715862896123456000
    assert (
        one(spark, "2024-05-16 12:34:56.1234567", C.nano_timestamp)
        == 1_715_862_896_123_456_000
    )
    ts = datetime.datetime(2024, 5, 16, 12, 34, 56, 123456)
    assert one(spark, ts, C.nano_timestamp) == 1_715_862_896_123_456_000


def test_mssql_precision_buckets():
    # schema.go:122-157 bucket selection
    assert C.mssql_time_converter(0).name == "time_millis"
    assert C.mssql_time_converter(3).name == "time_millis"
    assert C.mssql_time_converter(4).name == "time_micros"
    assert C.mssql_time_converter(6).name == "time_micros"
    assert C.mssql_time_converter(7).name == "nano_time"
    assert C.mssql_datetime2_converter(0).name == "milli_timestamp"
    assert C.mssql_datetime2_converter(3).name == "milli_timestamp"
    assert C.mssql_datetime2_converter(6).name == "micro_timestamp"
    assert C.mssql_datetime2_converter(7).name == "nano_timestamp"
    import pytest

    with pytest.raises(ValueError):
        C.mssql_time_converter(8)
    with pytest.raises(ValueError):
        C.mssql_datetime2_converter(8)


def test_zoned_timestamp_format(spark):
    ts = datetime.datetime(2021, 3, 4, 5, 6, 7, 120000)
    assert one(spark, ts, C.zoned_timestamp) == "2021-03-04T05:06:07.120000Z"


def test_interval_micros_uses_reference_days_per_month(spark):
    # 1 month -> 365.25/12 days of micros (converters.go:95-113)
    df = spark.createDataFrame([Row(months=1, days=0, micros=0)])
    out = df.select(
        C.interval_micros(F.col("months"), F.col("days"), F.col("micros")).alias("us")
    ).collect()[0]["us"]
    assert out == int(365.25 / 12 * 24 * 60 * 60 * 1_000_000)


def test_null_invalid_date_zero_date(spark):
    out = one(spark, "0000-00-00 00:00:00", C.null_invalid_date)
    assert out is None


def test_null_nan(spark):
    assert one(spark, float("nan"), C.null_nan) is None
    assert one(spark, 1.5, C.null_nan) == 1.5


def test_kafka_decimal_bytes_bigendian_unscaled(spark):
    # 123.45 scale 2 -> unscaled 12345 -> 0x3039 (decimal.go:14-53)
    df = spark.createDataFrame([Row(v=Decimal("123.45"))], "v decimal(10,2)")
    out = df.select(C.kafka_decimal_bytes(F.col("v")).alias("b")).collect()[0]["b"]
    assert bytes(out) == b"\x30\x39"
    # negative: -1.00 scale 2 -> unscaled -100 -> two's complement 0x9c
    df = spark.createDataFrame([Row(v=Decimal("-1.00"))], "v decimal(10,2)")
    out = df.select(C.kafka_decimal_bytes(F.col("v")).alias("b")).collect()[0]["b"]
    assert bytes(out) == b"\x9c"


def test_bitset_bytes_little_endian(spark):
    # bit(5) = B'10101' = 21 -> single byte 0x15 (bit.go:58-85)
    assert bytes(one(spark, "10101", C.bitset_bytes)) == b"\x15"
    # 9 bits: B'100000001' = 257 -> little-endian 0x01 0x01
    assert bytes(one(spark, "100000001", C.bitset_bytes)) == b"\x01\x01"
    assert bytes(one(spark, "0", C.bitset_bytes)) == b""


def test_mysql_set_decode(spark):
    # SET('a','b','c'), value 5 = a|c (convert.go:15-42)
    out = one(spark, 5, lambda c: C.mysql_set_decode(c, ["a", "b", "c"]))
    assert out == "a,c"
    out = one(spark, 0, lambda c: C.mysql_set_decode(c, ["a", "b", "c"]))
    assert out == ""


def test_mysql_enum_decode(spark):
    out = one(spark, 2, lambda c: C.mysql_enum_decode(c, ["x", "y", "z"]))
    assert out == "y"
    # MySQL enum truth (convert.go:32-41 + MySQL docs): index 0 is the
    # empty-string invalid marker; out-of-range -> NULL
    assert one(spark, 0, lambda c: C.mysql_enum_decode(c, ["x", "y"])) == ""
    assert one(spark, 9, lambda c: C.mysql_enum_decode(c, ["x", "y"])) is None


def test_mysql_point_struct(spark):
    # golden vectors from lib/mysql/schema/convert_test.go:334-351
    import base64

    cases = {
        "AAAAAAEBAAAAAAAAAAAAAAAAAAAAAAAAAA==": (0.0, 0.0),
        "AAAAAAEBAAAArkfhehSuKECkcD0K12NMQA==": (12.34, 56.78),
        "AAAAAAEBAAAASOF6FK5IocDD9ShcjzmqwA==": (-2212.34, -3356.78),
    }
    for b64, (x, y) in cases.items():
        out = one(spark, bytearray(base64.b64decode(b64)), C.mysql_point_struct)
        assert out["x"] == x and out["y"] == y, b64
    # wrong length / wrong byte order -> NULL
    assert one(spark, bytearray(b"\x00" * 10), C.mysql_point_struct) is None
    bad_order = bytearray(base64.b64decode("AAAAAAEBAAAAAAAAAAAAAAAAAAAAAAAAAA=="))
    bad_order[4] = 0
    assert one(spark, bad_order, C.mysql_point_struct) is None


def test_mysql_geometry_struct(spark):
    # convert.go:217-241: srid honors the WKB byte-order marker; wkb
    # passes through opaque (= bytes[4:])
    import base64

    point = base64.b64decode("AAAAAAEBAAAArkfhehSuKECkcD0K12NMQA==")
    le_4326 = bytearray(point)
    le_4326[0:4] = (4326).to_bytes(4, "little")
    out = one(spark, bytearray(le_4326), C.mysql_geometry_struct)
    assert out["srid"] == 4326 and bytes(out["wkb"]) == bytes(le_4326[4:])
    be = bytearray(point)
    be[0:4] = (4326).to_bytes(4, "big")
    be[4] = 0  # big-endian WKB marker
    out = one(spark, bytearray(be), C.mysql_geometry_struct)
    assert out["srid"] == 4326 and bytes(out["wkb"]) == bytes(be[4:])
    assert one(spark, bytearray(b"\x00" * 5), C.mysql_geometry_struct) is None


def test_pg_geography_struct(spark):
    # golden vector from lib/postgres/parse/geom_test.go:60-74
    out = one(
        spark, "010100000000000000000000000000000000000000", C.pg_geography_struct
    )
    assert out["wkb"] == "AQEAAAAAAAAAAAAAAAAAAAAAAAAA"
    assert out["srid"] is None


def test_timetz_utc_string(spark):
    # layouts from sources/postgres/adapter/converters.go:30-44
    cases = {
        "11:02:06-07": "18:02:06.000000Z",
        "11:02:06.222-07": "18:02:06.222000Z",
        "11:02:06.222333-07": "18:02:06.222333Z",
        "23:30:00+05": "18:30:00.000000Z",
        "12:00:00+05:30": "06:30:00.000000Z",
        "23:00:00-05": "04:00:00.000000Z",  # wraps past midnight
        "garbage": None,
    }
    for src, want in cases.items():
        assert one(spark, src, C.timetz_utc_string) == want, src


def test_variable_numeric_struct(spark):
    # golden vector from lib/debezium/converters/decimal_test.go:233-236
    out = one(spark, "12.34", C.variable_numeric)
    assert out["scale"] == 2 and bytes(out["value"]) == b"\x04\xd2"
    out = one(spark, "0", C.variable_numeric)
    assert out["scale"] == 0 and bytes(out["value"]) == b"\x00"
    out = one(spark, "-12.34", C.variable_numeric)
    assert out["scale"] == 2 and bytes(out["value"]) == b"\xfb\x2e"
    assert one(spark, "NaN", C.variable_numeric) is None


def test_point_struct(spark):
    out = one(spark, "(1.5,-2.25)", C.point_struct)
    assert out["x"] == 1.5 and out["y"] == -2.25


def test_hstore_map(spark):
    df = spark.createDataFrame([Row(h='"a"=>"1", "b"=>"2"')])
    out = df.select(C.hstore_map("h").alias("m")).collect()[0]["m"]
    assert out == {"a": "1", "b": "2"}


def test_registry_field_factories():
    f = C.CONVERTERS["micro_timestamp"].to_field("created_at")
    assert f.name == "created_at" and f.dataType.typeName() == "long"
    d = C.decimal_converter(10, 2)
    assert d.spark_type.precision == 10 and d.spark_type.scale == 2
    assert C.money_converter(4).spark_type.scale == 4


def test_money_string_parses_display_format(spark):
    from decimal import Decimal

    from pyspark.sql import functions as F

    from reader_spark.functions import converters as CV

    rows = [("$1,234.56",), ("$0.99",), ("12.30",), ("garbage",), (None,)]
    df = spark.createDataFrame(rows, "m string").select(
        CV.money_string(F.col("m")).alias("v")
    )
    out = [r["v"] for r in df.collect()]
    assert out[0] == Decimal("1234.56")
    assert out[1] == Decimal("0.99")
    assert out[2] == Decimal("12.30")
    assert out[3] is None  # invalid residue nulls, never throws
    assert out[4] is None
    # MSSQL smallmoney scale-4 override
    df4 = spark.createDataFrame([("$5.1234",)], "m string").select(
        CV.money_string(F.col("m"), scale=4).alias("v")
    )
    assert df4.collect()[0]["v"] == Decimal("5.1234")


def test_json_array_marshals_non_string_elements(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from reader_spark.functions import converters as CV

    # jsonb[] read as array<string>: passthrough, no double-encoding
    df = spark.createDataFrame(
        [(['{"a": 1}', '"x"'],)], "arr array<string>"
    ).select(CV.json_array(F.col("arr"), T.StringType()).alias("v"))
    assert df.collect()[0]["v"] == ['{"a": 1}', '"x"']
    # structured elements marshal to their JSON text per element
    df2 = spark.createDataFrame(
        [([(1, "p"), (2, "q")],)],
        "arr array<struct<id:int,name:string>>",
    ).select(
        CV.json_array(
            F.col("arr"),
            T.StructType([
                T.StructField("id", T.IntegerType()),
                T.StructField("name", T.StringType()),
            ]),
        ).alias("v")
    )
    assert df2.collect()[0]["v"] == ['{"id":1,"name":"p"}', '{"id":2,"name":"q"}']
