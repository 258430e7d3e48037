"""Binlog-shaped decoders (C3/C4) + the custom logtail streaming
source (C1/C6/C9 semantics: shards-as-partitions, offset resume)."""

import json

from pyspark.sql import functions as F

from reader_spark.streaming import binlog as B


def test_decode_positional_rows(spark):
    df = spark.createDataFrame(
        [(1, ["7", "alice", "x"]), (2, ["8", "bob", None])],
        ["seq", "values"],
    )
    out = B.decode_positional_rows(df, ["id", "name", "flag"]).collect()
    got = {r["seq"]: (r["id"], r["name"], r["flag"]) for r in out}
    assert got == {1: ("7", "alice", "x"), 2: ("8", "bob", None)}


def test_pair_update_rows(spark):
    df = spark.createDataFrame(
        [(1, [["1", "old"], ["1", "new"], ["2", "o2"], ["2", "n2"]])],
        ["seq", "rows"],
    )
    out = B.pair_update_rows(df).orderBy("pair_idx").collect()
    assert [(r["before"], r["after"]) for r in out] == [
        (["1", "old"], ["1", "new"]),
        (["2", "o2"], ["2", "n2"]),
    ]


def test_gtid_dedupe_batch_keeps_multirow_transactions(spark):
    # tx 1 on s1 carries THREE rows (seq 10/11/12) plus an exact
    # replay of seq 10; dedupe must keep all three distinct rows and
    # drop only the replay (a GTID names a transaction, not a row).
    df = spark.createDataFrame(
        [
            ("s1", 1, 10, "r1"),
            ("s1", 1, 11, "r2"),
            ("s1", 1, 12, "r3"),
            ("s1", 1, 10, "r1-replay"),
            ("s1", 2, 13, "b"),
            ("s2", 1, 20, "c"),
        ],
        ["gtid_sid", "gtid_tx", "seq", "payload"],
    )
    out = B.gtid_dedupe_batch(df)
    assert out.count() == 5
    assert out.filter("gtid_sid = 's1' AND gtid_tx = 1").count() == 3


def test_gtid_highwater_filter(spark):
    # checkpoint says: s1 seen through tx 5. Rows below 5 are replays
    # and drop; tx == 5 is reprocessed (at-least-once, txID >= stop);
    # rows above pass; unknown sid s3 passes untouched.
    df = spark.createDataFrame(
        [
            ("s1", 4, 1, "old-replay"),
            ("s1", 5, 2, "at-mark"),
            ("s1", 6, 3, "new"),
            ("s1", 6, 4, "new-row2"),
            ("s3", 1, 5, "unknown-sid"),
        ],
        ["gtid_sid", "gtid_tx", "seq", "payload"],
    )
    out = B.gtid_highwater_filter(df, {"s1": 5}).collect()
    kept = sorted(r["payload"] for r in out)
    assert kept == ["at-mark", "new", "new-row2", "unknown-sid"]
    # empty / None checkpoint keeps everything
    assert B.gtid_highwater_filter(df, None).count() == 5
    assert B.gtid_highwater_filter(df, {}).count() == 5


def _write_log(d, name, records):
    with open(d / name, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_logtail_source_reads_and_resumes(spark, tmp_path):
    from reader_spark.streaming.log_source import LogTailDataSource

    spark.dataSource.register(LogTailDataSource)
    src = tmp_path / "log"
    src.mkdir()
    _write_log(src, "shard0.jsonl", [{"seq": 1, "payload": "a"}, {"seq": 2, "payload": "b"}])
    _write_log(src, "shard1.jsonl", [{"seq": 10, "payload": "x"}])

    stream = (
        spark.readStream.format("logtail")
        .schema("seq string, payload string")
        .option("path", str(src))
        .load()
    )
    assert stream.isStreaming
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def drain():
        q = (
            stream.writeStream.format("json").option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)

    drain()
    rows1 = {
        (r["seq"], r["payload"]) for r in spark.read.json(out).collect()
    }
    assert rows1 == {("1", "a"), ("2", "b"), ("10", "x")}

    # append to one shard + add a new shard; resume from checkpoint
    with open(src / "shard0.jsonl", "a") as f:
        f.write(json.dumps({"seq": 3, "payload": "c"}) + "\n")
    _write_log(src, "shard2.jsonl", [{"seq": 20, "payload": "z"}])

    drain()
    rows2 = {
        (r["seq"], r["payload"]) for r in spark.read.json(out).collect()
    }
    # ONLY the delta was appended — per-shard offsets advanced,
    # no reprocessing of already-committed records
    assert rows2 == rows1 | {("3", "c"), ("20", "z")}
    assert spark.read.json(out).count() == 5


def test_max_records_per_trigger_caps_offset_advance(tmp_path):
    """B3 parity: with maxrecordspertrigger, each latestOffset call
    (one per trigger) advances at most N records across files in
    sorted order; without it the full tail is offered at once."""
    import json as _json

    from pyspark.sql.types import StructType, StructField, StringType

    from reader_spark.streaming.log_source import LogTailStreamReader

    d = tmp_path / "log"
    d.mkdir()
    with open(d / "a.jsonl", "w") as f:
        for i in range(5):
            f.write(_json.dumps({"seq": i}) + "\n")
    with open(d / "b.jsonl", "w") as f:
        for i in range(5):
            f.write(_json.dumps({"seq": 100 + i}) + "\n")
    schema = StructType([StructField("seq", StringType())])
    r = LogTailStreamReader(
        schema, {"path": str(d), "maxrecordspertrigger": "4"}
    )
    assert r.latestOffset() == {"a.jsonl": 4, "b.jsonl": 0}
    assert r.latestOffset() == {"a.jsonl": 5, "b.jsonl": 3}
    assert r.latestOffset() == {"a.jsonl": 5, "b.jsonl": 5}
    assert r.latestOffset() == {"a.jsonl": 5, "b.jsonl": 5}  # drained
    # uncapped reader offers everything immediately
    r2 = LogTailStreamReader(schema, {"path": str(d)})
    assert r2.latestOffset() == {"a.jsonl": 5, "b.jsonl": 5}
