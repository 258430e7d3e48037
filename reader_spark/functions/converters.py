"""Debezium wire-format column converters.

The reference converts every value per-row through a
`ValueConverter{ToField(name); Convert(value)}` registry
(lib/debezium/converters/converters.go:5-8, registries at
sources/postgres/adapter/adapter.go:84-160,
lib/mysql/converters/converters.go:9-67). Here each converter is a
**column-expression builder**: `(Column) -> Column` plus a
`StructField` factory — one `select()` with N expressions replaces
the reference's per-row map loop, and stays inside whole-stage
codegen (no Python in the hot path).

Wire encodings mirror SURVEY.md §1.2 / lib/debezium/converters/*:
  * timestamps -> int64 epoch micros   (time.go:124-179)
  * dates      -> int32 epoch days     (time.go:80-122)
  * time       -> micros past midnight (time.go:13-78)
  * timestamptz-> UTC ISO string       (time.go:181-209)
  * decimals   -> base-256 unscaled bytes (decimal.go:14-53) — UDF-only
    at the Kafka edge; internally we keep native DecimalType
  * bit(n)     -> little-endian BitSet bytes (bit.go:58-85)
  * interval   -> micros w/ 365.25/12 days-per-month
                  (sources/postgres/adapter/converters.go:72-113)
  * invalid MySQL values (zero-dates, >4-digit years, NaN) -> NULL
    (lib/mysql/schema/convert.go:264-286, time.go:96-110, decimal.go:66-68)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Days-per-month constant used by the reference for Postgres
# intervals (sources/postgres/adapter/converters.go:95-113).
DAYS_PER_MONTH = 365.25 / 12.0
MICROS_PER_DAY = 24 * 60 * 60 * 1_000_000


@dataclass(frozen=True)
class Converter:
    """Spark analogue of ValueConverter: expression builder + field."""

    name: str
    expr: Callable[[Column], Column]
    spark_type: T.DataType

    def to_field(self, col_name: str, nullable: bool = True) -> T.StructField:
        return T.StructField(col_name, self.spark_type, nullable)

    def convert(self, c: Column) -> Column:
        # nil -> nil short-circuit (transformer.go:137-144) is native:
        # Spark expressions are null-propagating.
        return self.expr(c)


def _identity(t: T.DataType) -> Callable[[Column], Column]:
    return lambda c: c.cast(t)


# --- time family ---------------------------------------------------------

def micro_timestamp(c: Column) -> Column:
    """timestamp (no tz) -> int64 epoch micros (time.go:124-179)."""
    return F.unix_micros(c.cast("timestamp"))


def milli_timestamp(c: Column) -> Column:
    return F.unix_millis(c.cast("timestamp"))


def epoch_days(c: Column) -> Column:
    """date -> int32 epoch days (time.go:80-122)."""
    return F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("int")


def time_micros(c: Column) -> Column:
    """time -> micros past midnight (time.go:13-78)."""
    ts = c.cast("timestamp")
    return (
        F.hour(ts).cast("long") * 3_600_000_000
        + F.minute(ts).cast("long") * 60_000_000
        + F.second(ts).cast("long") * 1_000_000
        + (F.unix_micros(ts) % 1_000_000)
    )


def zoned_timestamp(c: Column) -> Column:
    """timestamptz -> UTC `2006-01-02T15:04:05.999999Z` (time.go:181-209).

    The reference trims trailing fractional zeros via RFC3339Nano-style
    formatting; we emit fixed 6-digit micros (documented divergence —
    both parse identically downstream)."""
    return F.date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")


def year_int(c: Column) -> Column:
    """MySQL YEAR -> int32 (time.go:211-223)."""
    return c.cast("int")


def interval_micros(months: Column, days: Column, micros: Column) -> Column:
    """Postgres interval -> int64 micros using the reference's
    365.25/12 days-per-month (converters.go:95-113)."""
    return (
        (months.cast("double") * DAYS_PER_MONTH * MICROS_PER_DAY)
        .cast("long")
        + days.cast("long") * MICROS_PER_DAY
        + micros.cast("long")
    )


# --- invalid-value nulling (P4) ------------------------------------------

def null_invalid_date(c: Column) -> Column:
    """MySQL zero-dates `0000-00-00` and >4-digit years -> NULL
    (lib/mysql/schema/convert.go:264-286, time.go:96-110)."""
    s = c.cast("string")
    return F.when(
        s.startswith("0000-00-00") | (F.year(c.cast("date")) > 9999), None
    ).otherwise(c)


def null_nan(c: Column) -> Column:
    """NaN numerics -> NULL (decimal.go:66-68,94-96)."""
    return F.when(F.isnan(c), None).otherwise(c)


# --- decimal / bit edge encodings (Kafka-Connect wire format) -------------

@F.pandas_udf(T.BinaryType())
def kafka_decimal_bytes(s: pd.Series) -> pd.Series:
    """Kafka-Connect decimal: big-endian two's-complement unscaled-int
    bytes (decimal.go:14-53). Input: Decimal column already at target
    scale. Arrow-batched; edge-only (never in analytic hot path)."""
    import decimal

    def enc(v):
        if v is None:
            return None
        unscaled = int(v.scaleb(-v.as_tuple().exponent))
        n = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(n, "big", signed=True)

    return s.map(lambda v: enc(v) if isinstance(v, decimal.Decimal) or v is None else enc(decimal.Decimal(str(v))))


@F.pandas_udf(T.BinaryType())
def bitset_bytes(s: pd.Series) -> pd.Series:
    """bit(n)/varbit -> little-endian java.util.BitSet layout
    (bit.go:58-85): reverse of the big-endian big.Int bytes. Input:
    bit string like '10101'."""

    def enc(v):
        if v is None:
            return None
        n = int(str(v), 2)
        if n == 0:
            return b""
        size = (n.bit_length() + 7) // 8
        return n.to_bytes(size, "little")

    return s.map(enc)


def mysql_set_decode(c: Column, members: list[str]) -> Column:
    """MySQL SET int bitset -> comma-joined member string
    (lib/mysql/schema/convert.go:15-42)."""
    arr = F.array(*[F.lit(m) for m in members])
    idx = F.sequence(F.lit(0), F.lit(len(members) - 1))
    picked = F.filter(idx, lambda i: F.getbit(c.cast("long"), i) == 1)
    return F.concat_ws(",", F.transform(picked, lambda i: F.element_at(arr, i + 1)))


def mysql_enum_decode(c: Column, members: list[str]) -> Column:
    """MySQL ENUM 1-based index -> member string (enum.go)."""
    arr = F.array(*[F.lit(m) for m in members])
    return F.when(c.cast("int") > 0, F.element_at(arr, c.cast("int"))).otherwise(
        c.cast("string")
    )


# --- geometry / hstore / json residue (P2) --------------------------------

def point_struct(c: Column) -> Column:
    """Postgres `(x,y)` point text -> struct{x,y}
    (lib/postgres/parse/geom.go:11-47)."""
    x = F.regexp_extract(c, r"\(([-0-9.eE+]+),", 1).cast("double")
    y = F.regexp_extract(c, r",([-0-9.eE+]+)\)", 1).cast("double")
    return F.struct(x.alias("x"), y.alias("y"))


def hstore_map(col_name: str) -> Column:
    """hstore text `"a"=>"b", ...` -> map<string,string>
    (lib/postgres/parse/parse.go:112-126). Takes a column NAME so the
    expression can be built as SQL text."""
    return F.expr(
        "map_from_entries(transform("
        f"regexp_extract_all({col_name}, '\"([^\"]*)\"=>\"([^\"]*)\"', 0), "
        "p -> struct(regexp_extract(p, '\"([^\"]*)\"=>', 1) AS key, "
        "regexp_extract(p, '=>\"([^\"]*)\"', 1) AS value)))"
    )


# --- registry (per-dialect, mirrors adapter registries) -------------------

CONVERTERS: dict[str, Converter] = {
    "int16": Converter("int16", _identity(T.ShortType()), T.ShortType()),
    "int32": Converter("int32", _identity(T.IntegerType()), T.IntegerType()),
    "int64": Converter("int64", _identity(T.LongType()), T.LongType()),
    "float": Converter("float", _identity(T.FloatType()), T.FloatType()),
    "double": Converter("double", _identity(T.DoubleType()), T.DoubleType()),
    "boolean": Converter("boolean", _identity(T.BooleanType()), T.BooleanType()),
    "string": Converter("string", _identity(T.StringType()), T.StringType()),
    "bytes": Converter("bytes", _identity(T.BinaryType()), T.BinaryType()),
    "json": Converter("json", _identity(T.StringType()), T.StringType()),
    "uuid": Converter("uuid", _identity(T.StringType()), T.StringType()),
    "micro_timestamp": Converter("micro_timestamp", micro_timestamp, T.LongType()),
    "milli_timestamp": Converter("milli_timestamp", milli_timestamp, T.LongType()),
    "epoch_days": Converter("epoch_days", epoch_days, T.IntegerType()),
    "time_micros": Converter("time_micros", time_micros, T.LongType()),
    "zoned_timestamp": Converter("zoned_timestamp", zoned_timestamp, T.StringType()),
    "year": Converter("year", year_int, T.IntegerType()),
}


def decimal_converter(precision: int, scale: int) -> Converter:
    """numeric(p,s) stays native DecimalType internally; byte-encode
    only at the Kafka edge (SURVEY §1.2)."""
    t = T.DecimalType(precision, scale)
    return Converter(f"decimal({precision},{scale})", _identity(t), t)


def money_converter(scale: int = 2) -> Converter:
    """money: decimal scale 2 (PG) / 4 (MSSQL)
    (lib/debezium/converters/money.go:12-60)."""
    return decimal_converter(19, scale)
