"""DynamoDB sources: S3 PITR-export snapshot + Streams decode.

Reference: the snapshot path polls a PITR export to S3 and streams
gzipped DynamoDB-JSON files (sources/dynamodb/snapshot/snapshot.go:30-109,
lib/s3lib/s3lib.go:64-113); the attribute decoder maps type-tagged
values {"S":...,"N":...,"B":...,"BOOL":...,"M":...,"L":...,"SS":...,
"NS":...,"BS":...} to native values (lib/s3lib/dynamodb_export.go:39-181,
lib/dynamo/message.go:30-81).

Spark-first: `spark.read.json("s3://.../data/*.json.gz")` handles
gzip+JSONL natively and in parallel; the decode is a `from_json` +
column expressions when the item schema is known, or the Pandas-UDF
generic decoder below when it isn't (schemaless tables).
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- export control plane (S10 driver side) -------------------------------

def table_arn_from_stream_arn(stream_arn: str) -> str:
    """arn:...:table/T/stream/TS -> arn:...:table/T
    (lib/dynamo/util.go:9-16)."""
    parts = stream_arn.split("/stream/")
    if len(parts) != 2:
        raise ValueError(f"invalid stream ARN: {stream_arn!r}")
    return parts[0]


def parse_manifest_file(bucket: str, manifest_file_path: str) -> str:
    """manifest-summary.json path -> the export folder under the
    bucket (lib/dynamo/util.go:18-29); data files live under
    <folder>/data/."""
    if not manifest_file_path.endswith("manifest-summary.json"):
        raise ValueError(f"invalid manifest filepath: {manifest_file_path!r}")
    parts = manifest_file_path.split("/")
    return "/".join([bucket] + parts[:-1])


class ExportControlPlane:
    """Find-or-initiate a DynamoDB PITR export and resolve its data
    folder (sources/dynamodb/snapshot/export.go:16-103 +
    snapshot.go:44-70).

    `client` is boto3-shaped (duck-typed: list_exports,
    describe_export, export_table_to_point_in_time with the public
    AWS response shapes) — boto3 isn't in this container, so tests
    drive the control plane with a fake. This is driver-side control
    logic; the data plane stays `read_export_snapshot` (a parallel
    Spark JSONL read)."""

    def __init__(self, client: Any, poll_seconds: float = 30.0, sleeper=None):
        import time

        self.client = client
        self.poll_seconds = poll_seconds
        self.sleeper = sleeper or time.sleep

    def list_exports(self, table_arn: str) -> list[dict]:
        """Full ListExports pagination (export.go:16-35)."""
        out: list[dict] = []
        token = None
        while True:
            kwargs = {"TableArn": table_arn}
            if token:
                kwargs["NextToken"] = token
            resp = self.client.list_exports(**kwargs)
            out.extend(resp.get("ExportSummaries", []))
            token = resp.get("NextToken")
            if not token:
                return out

    def find_recent_export(
        self, stream_arn: str, bucket: str, prefix: str
    ) -> tuple[str, str | None]:
        """(export_arn, manifest_path_or_None): reuse the first
        non-failed export targeting (bucket, prefix); otherwise
        initiate a fresh PITR export (export.go:37-82)."""
        table_arn = table_arn_from_stream_arn(stream_arn)
        for summary in self.list_exports(table_arn):
            if summary.get("ExportStatus") == "FAILED":
                continue
            desc = self.client.describe_export(ExportArn=summary["ExportArn"])[
                "ExportDescription"
            ]
            if desc.get("S3Bucket") == bucket and desc.get("S3Prefix") == prefix:
                if summary.get("ExportStatus") == "COMPLETED":
                    return summary["ExportArn"], desc.get("ExportManifest")
                return summary["ExportArn"], None
        resp = self.client.export_table_to_point_in_time(
            TableArn=table_arn,
            S3Bucket=bucket,
            S3Prefix=prefix,
            ExportFormat="DYNAMODB_JSON",
        )
        return resp["ExportDescription"]["ExportArn"], None

    def wait_for_manifest(self, export_arn: str) -> str:
        """Poll DescribeExport until COMPLETED (export.go:84-103)."""
        while True:
            desc = self.client.describe_export(ExportArn=export_arn)[
                "ExportDescription"
            ]
            status = desc.get("ExportStatus")
            if status == "COMPLETED":
                return desc["ExportManifest"]
            if status == "FAILED":
                raise RuntimeError(
                    f"export has failed: {desc.get('FailureMessage')}"
                )
            if status != "IN_PROGRESS":
                raise RuntimeError(f"unknown export status: {status}")
            self.sleeper(self.poll_seconds)

    def resolve_data_folder(
        self, stream_arn: str, bucket: str, prefix: str
    ) -> str:
        """The composed flow (snapshot.go:44-70): find-or-initiate,
        wait if needed, manifest -> <folder>/data — the glob root for
        `read_export_snapshot`."""
        export_arn, manifest = self.find_recent_export(stream_arn, bucket, prefix)
        if manifest is None:
            manifest = self.wait_for_manifest(export_arn)
        return parse_manifest_file(bucket, manifest) + "/data"


def decode_attribute(av: dict[str, Any]) -> Any:
    """Decode one DynamoDB AttributeValue (python-side; mirrors
    lib/s3lib/dynamodb_export.go:39-181 semantics: N -> float, S/B
    passthrough, sets -> lists, M/L recursive)."""
    if av is None:
        return None
    (tag, v), = av.items()
    if tag == "S":
        return v
    if tag == "N":
        return float(v)
    if tag == "BOOL":
        return bool(v)
    if tag == "NULL":
        return None
    if tag == "B":
        return v  # base64 string (decode at the edge if binary needed)
    if tag == "SS" or tag == "BS":
        return list(v)
    if tag == "NS":
        return [float(x) for x in v]
    if tag == "L":
        return [decode_attribute(x) for x in v]
    if tag == "M":
        return {k: decode_attribute(x) for k, x in v.items()}
    raise ValueError(f"unknown DynamoDB attribute tag {tag!r}")


@F.pandas_udf(T.StringType())
def decode_dynamodb_json(items: pd.Series) -> pd.Series:
    """Arrow-batched generic decoder: DynamoDB-JSON `Item` string ->
    plain JSON string (schemaless path; keys sorted for determinism).

    Used under mapInPandas/select for tables whose attribute set is
    per-record (the reference derives per-record schemas,
    lib/dynamo/message.go:30-81)."""

    def dec(s):
        if s is None:
            return None
        item = json.loads(s)
        item = item.get("Item", item)
        return json.dumps(
            {k: decode_attribute(v) for k, v in item.items()},
            sort_keys=True,
            separators=(",", ":"),
        )

    return items.map(dec)


def typed_item_schema(fields: dict[str, str]) -> T.StructType:
    """Schema of the raw DynamoDB-JSON `Item` struct for from_json
    when the attribute set IS known: {"id": "S", "qty": "N", ...}."""
    tag_type = {
        "S": T.StringType(),
        "N": T.StringType(),  # N arrives as a string; cast after
        "BOOL": T.BooleanType(),
        "B": T.StringType(),
        "SS": T.ArrayType(T.StringType()),
        "NS": T.ArrayType(T.StringType()),
    }
    return T.StructType(
        [
            T.StructField(
                name, T.StructType([T.StructField(tag, tag_type[tag])])
            )
            for name, tag in fields.items()
        ]
    )


def decode_typed_items(
    df: DataFrame, item_col: str, fields: dict[str, str]
) -> DataFrame:
    """JVM-only decode for a known attribute set: from_json + per-tag
    cast. N -> double (dynamodb numbers are decimal strings;
    message.go maps N to float64)."""
    schema = typed_item_schema(fields)
    parsed = df.withColumn("__item", F.from_json(F.col(item_col), schema))
    cols: list[Column] = []
    for name, tag in fields.items():
        c = F.col(f"__item.{name}.{tag}")
        if tag == "N":
            c = c.cast("double")
        elif tag == "NS":
            c = F.transform(c, lambda x: x.cast("double"))
        cols.append(c.alias(name))
    return parsed.select(*cols)


def read_export_snapshot(
    spark: SparkSession, manifest_glob: str, fields: dict[str, str] | None = None
) -> DataFrame:
    """Snapshot = parallel JSONL read of the export's data files
    (S10). Spark natively splits the file list across executors; gzip
    members are per-file parallel."""
    raw = spark.read.json(manifest_glob)
    if fields is None:
        return raw
    return decode_typed_items(raw.select(F.to_json("Item").alias("item")), "item", fields)


# Streams (C9/C10): op mapping INSERT/MODIFY/REMOVE -> c/u/d
OP_MAP = {"INSERT": "c", "MODIFY": "u", "REMOVE": "d"}


def stream_op_column(event_name: Column) -> Column:
    """dynamodb Streams eventName -> Debezium op code
    (lib/dynamo/parse_message.go:46-94)."""
    m = F.create_map(
        *[F.lit(x) for kv in OP_MAP.items() for x in kv]
    )
    return m.getItem(event_name)
