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


def test_mysql_golden_envelope(spark):
    """MySQL-flavored golden payload (reference
    /root/reference/integration_tests/mysql/main.go:625-677): point
    WKB bit-decode, zero-date nulling, datetime micros, enum/set,
    blob — wire values hand-computed independently of Spark."""
    import struct

    raw_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("dt", T.TimestampType()),
            T.StructField("zero_date", T.StringType()),
            T.StructField("pt_wkb", T.BinaryType()),
            T.StructField("en", T.IntegerType()),
            T.StructField("st", T.IntegerType()),
            T.StructField("yr", T.IntegerType()),
            T.StructField("bl", T.BinaryType()),
        ]
    )
    ts = dt.datetime(2024, 3, 1, 8, 30, 15, 250000)
    # MySQL internal point: 4-byte SRID LE + WKB(1-byte LE marker,
    # 4-byte type=1, two LE doubles)
    wkb = (
        struct.pack("<I", 0)
        + b"\x01"
        + struct.pack("<I", 1)
        + struct.pack("<d", 3.25)
        + struct.pack("<d", -4.5)
    )
    df = spark.createDataFrame(
        [(7, ts, "0000-00-00", wkb, 1, 0b110, 2024, b"\xff\x00")], raw_schema
    )
    conv = df.select(
        "id",
        C.CONVERTERS["micro_timestamp"].convert(F.col("dt")).alias("dt"),
        C.CONVERTERS["epoch_days"]
        .convert(C.null_invalid_date(F.col("zero_date")).cast("date"))
        .alias("zero_date"),
        C.mysql_point_struct(F.col("pt_wkb")).alias("pt"),
        C.mysql_enum_decode(F.col("en"), ["sm", "md", "lg"]).alias("en"),
        C.mysql_set_decode(F.col("st"), ["x", "y", "z"]).alias("st"),
        C.CONVERTERS["year"].convert(F.col("yr")).alias("yr"),
        C.CONVERTERS["bytes"].convert(F.col("bl")).alias("bl"),
    )
    env = E.snapshot_envelope(
        conv, pk_cols=["id"], db="appdb", schema="", table="my_types",
        topic_prefix="cdc", ts_col=F.lit(1709281815250), wire_schema=False,
        dialect="mysql",
    )
    got = env.collect()[0]
    micros = calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
    after = {
        "id": 7,
        "dt": micros,
        "zero_date": None,              # 0000-00-00 -> NULL (P4)
        "pt": {"x": 3.25, "y": -4.5},   # IEEE-754 bit decode
        "en": "sm",                      # 1-based enum index
        "st": "y,z",                     # bitset members
        "yr": 2024,
        "bl": base64.b64encode(b"\xff\x00").decode(),
    }
    expected_value = json.dumps(
        {
            "before": None,
            "after": after,
            "source": {
                "db": "appdb", "schema": "", "table": "my_types",
                "ts_ms": 1709281815250,
            },
            "op": "r",
        },
        separators=(",", ":"),
        ensure_ascii=False,
    )
    assert got.key == '{"id":7}'
    assert got.value == expected_value


def test_mssql_golden_envelope(spark):
    """MSSQL-flavored golden payload (reference
    /root/reference/integration_tests/mssql/main.go:175-227): money
    scale 4, DATETIME_PRECISION bucket selection down to the nano
    converters, datetimeoffset as UTC string, uniqueidentifier."""
    raw_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("mny", T.StringType()),
            T.StructField("dt2_7", T.TimestampType()),
            T.StructField("t_7", T.TimestampType()),
            T.StructField("t_3", T.TimestampType()),
            T.StructField("dto", T.TimestampType()),
            T.StructField("uid", T.StringType()),
        ]
    )
    ts = dt.datetime(2024, 6, 30, 23, 59, 58, 123456)
    df = spark.createDataFrame(
        [(3, "$12,345.6789", ts, ts, ts, ts,
          "E0C9C4F1-0000-0000-0000-000000000001")],
        raw_schema,
    )
    conv = df.select(
        "id",
        C.money_converter(4).convert(
            C.money_string(F.col("mny"), scale=4)
        ).alias("mny"),
        # DATETIME_PRECISION buckets pick the converter
        C.mssql_datetime2_converter(7).convert(F.col("dt2_7")).alias("dt2_7"),
        C.mssql_time_converter(7).convert(F.col("t_7")).alias("t_7"),
        C.mssql_time_converter(3).convert(F.col("t_3")).alias("t_3"),
        C.CONVERTERS["zoned_timestamp"].convert(F.col("dto")).alias("dto"),
        C.CONVERTERS["uuid"].convert(F.col("uid")).alias("uid"),
    )
    env = E.snapshot_envelope(
        conv, pk_cols=["id"], db="mssqldb", schema="dbo", table="ms_types",
        topic_prefix="cdc", ts_col=F.lit(1719791998123), wire_schema=False,
        dialect="mssql",
    )
    got = env.collect()[0]
    micros = calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
    tod_micros = ((23 * 60 + 59) * 60 + 58) * 1_000_000 + 123456
    after = {
        "id": 3,
        "mny": 12345.6789,
        "dt2_7": micros * 1_000,          # Datetime2Nano: int64 ns
        "t_7": tod_micros * 1_000,        # TimeNano: ns past midnight
        "t_3": tod_micros // 1_000,       # Time: int32 ms past midnight
        "dto": "2024-06-30T23:59:58.123456Z",
        "uid": "E0C9C4F1-0000-0000-0000-000000000001",
    }
    expected_value = json.dumps(
        {
            "before": None,
            "after": after,
            "source": {
                "db": "mssqldb", "schema": "dbo", "table": "ms_types",
                "ts_ms": 1719791998123,
            },
            "op": "r",
        },
        separators=(",", ":"),
        ensure_ascii=False,
    )
    assert got.key == '{"id":3}'
    assert got.value == expected_value
