"""Shard stream source (C9): per-shard order, parent->child gating,
page-size batching — the semantics of the reference's DynamoDB shard
consumer (stream.go:48-105, shard.go:46-148) on Spark's engine."""

import json
import os

import pyspark.sql.functions as F

from reader_spark.streaming.shard_source import ShardStreamDataSource

SCHEMA = "event_name string, keys string, seq string"


def _write_shard(d, shard, records):
    with open(os.path.join(d, f"{shard}.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _run_all(spark, d, tmp_path, max_per_batch=100, settle_s=6):
    import time

    # NOT availableNow: that trigger drains to ONE latestOffset
    # snapshot, but paging/gating needs multiple micro-batches.
    q = (
        spark.readStream.format("shardstream")
        .schema(SCHEMA)
        .option("path", d)
        .option("maxRecordsPerBatch", str(max_per_batch))
        .load()
        .writeStream.format("memory")
        .queryName("shard_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    last, stable_since = -1, time.time()
    deadline = time.time() + 120
    while time.time() < deadline:
        n = spark.table("shard_sink").count()
        if n != last:
            last, stable_since = n, time.time()
        elif time.time() - stable_since > settle_s:
            break
        time.sleep(0.5)
    q.stop()
    return spark.table("shard_sink")


def test_parent_drains_before_child(spark, tmp_path):
    spark.dataSource.register(ShardStreamDataSource)
    d = str(tmp_path / "shards")
    os.makedirs(d)
    _write_shard(d, "s1", [{"event_name": "INSERT", "keys": "k", "seq": f"p{i}"} for i in range(5)])
    _write_shard(d, "s2", [{"event_name": "MODIFY", "keys": "k", "seq": f"c{i}"} for i in range(3)])
    with open(os.path.join(d, "shards.json"), "w") as f:
        json.dump({"s1": {"closed": True}, "s2": {"parent": "s1"}}, f)

    out = _run_all(spark, d, tmp_path, max_per_batch=2)
    rows = out.collect()
    seqs = [r.seq for r in rows]
    assert sorted(seqs) == sorted([f"p{i}" for i in range(5)] + [f"c{i}" for i in range(3)])
    # every parent record lands before any child record (availableNow
    # drains in multiple gated micro-batches; memory sink appends in
    # batch order)
    first_child = seqs.index("c0")
    assert all(s.startswith("p") for s in seqs[:first_child])
    # per-shard order preserved
    assert [s for s in seqs if s.startswith("p")] == [f"p{i}" for i in range(5)]
    assert [s for s in seqs if s.startswith("c")] == [f"c{i}" for i in range(3)]


def test_open_parent_blocks_child(spark, tmp_path):
    spark.dataSource.register(ShardStreamDataSource)
    d = str(tmp_path / "shards2")
    os.makedirs(d)
    _write_shard(d, "a", [{"event_name": "INSERT", "keys": "k", "seq": "a0"}])
    _write_shard(d, "b", [{"event_name": "INSERT", "keys": "k", "seq": "b0"}])
    with open(os.path.join(d, "shards.json"), "w") as f:
        # parent NOT closed: child must stay blocked even when parent
        # is fully consumed
        json.dump({"a": {"closed": False}, "b": {"parent": "a"}}, f)

    out = _run_all(spark, d, tmp_path)
    assert [r.seq for r in out.collect()] == ["a0"]
