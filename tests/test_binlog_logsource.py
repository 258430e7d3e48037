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
    # the engine always asks for the initial offset on a fresh start
    # (no checkpoint) before planning the first batch
    assert r.initialOffset() == {}
    assert r.latestOffset() == {"a.jsonl": 4, "b.jsonl": 0}
    assert r.latestOffset() == {"a.jsonl": 5, "b.jsonl": 3}
    assert r.latestOffset() == {"a.jsonl": 5, "b.jsonl": 5}
    assert r.latestOffset() == {"a.jsonl": 5, "b.jsonl": 5}  # drained
    # uncapped reader offers everything immediately
    r2 = LogTailStreamReader(schema, {"path": str(d)})
    assert r2.latestOffset() == {"a.jsonl": 5, "b.jsonl": 5}


def _drive(reader, start, n_triggers):
    """Run the microbatch protocol the way the engine does: plan from
    the prior end, read every partition, commit. Returns (records,
    end_offset, per-batch offset ranges)."""
    recs, ranges = [], []
    cur = dict(start)
    for _ in range(n_triggers):
        end = reader.latestOffset()
        ranges.append((dict(cur), dict(end)))
        for p in reader.partitions(dict(cur), dict(end)):
            recs.extend(reader.read(p))
        reader.commit(dict(end))
        cur = dict(end)
    return recs, cur, ranges


def test_restart_under_cap_never_redelivers(tmp_path):
    """Regression test for the restart-duplication bug: with
    maxrecordspertrigger set, a driver restart must never hand out an
    offset behind the checkpoint (a regressed end in the offset log
    makes the NEXT batch's start regress and re-deliver committed
    records — double-counted CMS counters, duplicate appends). Covers
    both restart shapes: clean shutdown (latestOffset is the first
    post-restart call) and replay (partitions(start,end) of the
    logged-but-uncommitted batch comes first)."""
    import json as _json

    from pyspark.sql.types import StructType, StructField, StringType

    from reader_spark.streaming.log_source import LogTailStreamReader

    d = tmp_path / "log"
    d.mkdir()
    with open(d / "a.jsonl", "w") as f:
        for i in range(12):
            f.write(_json.dumps({"seq": i}) + "\n")
    schema = StructType([StructField("seq", StringType())])
    opts = {"path": str(d), "maxrecordspertrigger": "3"}

    # fresh run: 2 capped triggers -> 6 records, checkpoint {a:6}
    r1 = LogTailStreamReader(schema, opts)
    start = r1.initialOffset()
    recs1, ck, _ = _drive(r1, start, 2)
    assert len(recs1) == 6 and ck == {"a.jsonl": 6}

    # clean-shutdown restart: new reader, engine calls latestOffset
    # first with the checkpointed start. Every offset it returns must
    # be >= the checkpoint, and draining must deliver each remaining
    # record exactly once.
    r2 = LogTailStreamReader(schema, opts)
    recs2, ck2, ranges = _drive(r2, ck, 4)
    for st, en in ranges:
        for name, n in en.items():
            assert n >= ck.get(name, 0), f"regressed offset {name}={n}"
    assert ck2 == {"a.jsonl": 12}
    seqs = [r[0] for r in recs1 + recs2]
    assert sorted(seqs) == sorted(set(seqs)), "record delivered twice"
    assert sorted(int(s) for s in seqs) == list(range(12))

    # replay restart: batch {a:6}->{a:9} was logged but not committed;
    # the engine re-plans it via partitions() before any latestOffset.
    r3 = LogTailStreamReader(schema, opts)
    replay = list(r3.read(r3.partitions({"a.jsonl": 6}, {"a.jsonl": 9})[0]))
    assert [int(x[0]) for x in replay] == [6, 7, 8]
    r3.commit({"a.jsonl": 9})
    # subsequent capped triggers resume from the replayed end
    recs3, ck3, ranges3 = _drive(r3, {"a.jsonl": 9}, 2)
    assert ck3 == {"a.jsonl": 12}
    assert [int(x[0]) for x in recs3] == [9, 10, 11]
    for st, en in ranges3:
        assert en["a.jsonl"] >= 9


def test_restart_under_cap_end_to_end(spark, tmp_path):
    """Real-engine restart with the cap on: two availableNow runs over
    a growing log with maxrecordspertrigger=2; the append sink must
    hold each record exactly once after the restart."""
    from reader_spark.streaming.log_source import LogTailDataSource

    spark.dataSource.register(LogTailDataSource)
    src = tmp_path / "log"
    src.mkdir()
    _write_log(src, "s0.jsonl", [{"seq": i} for i in range(5)])

    stream = (
        spark.readStream.format("logtail")
        .schema("seq string")
        .option("path", str(src))
        .option("maxrecordspertrigger", "2")
        .load()
    )
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        q = (
            stream.writeStream.format("json").option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    with open(src / "s0.jsonl", "a") as f:
        for i in range(5, 9):
            f.write(json.dumps({"seq": i}) + "\n")
    # The Python microbatch stream doesn't support AvailableNow (the
    # engine falls back to bounded-batch execution), so one restart
    # drain may stop before the tail is consumed under the cap. Drain
    # repeatedly — every drain is a fresh driver restart — asserting
    # exactly-once after each one; require eventual completeness.
    for _ in range(8):
        drain()
        got = sorted(int(r["seq"]) for r in spark.read.json(out).collect())
        assert got == sorted(set(got)), f"record delivered twice: {got}"
        if got == list(range(9)):
            break
    assert got == list(range(9)), f"loss after drains: {got}"


def test_statedir_floor_keeps_cap_across_restart(tmp_path):
    """With option 'statedir' the committed floor persists (the
    reference's offset-YAML pattern): a clean restart caps its FIRST
    trigger instead of falling back to full lengths — and a fresh
    start over a leftover sidecar fails fast (stale-high floors
    against a fresh checkpoint would silently skip records)."""
    import json as _json

    import pytest as _pytest
    from pyspark.sql.types import StructType, StructField, StringType

    from reader_spark.streaming.log_source import LogTailStreamReader

    d = tmp_path / "log"
    d.mkdir()
    with open(d / "a.jsonl", "w") as f:
        for i in range(12):
            f.write(_json.dumps({"seq": i}) + "\n")
    schema = StructType([StructField("seq", StringType())])
    opts = {
        "path": str(d),
        "maxrecordspertrigger": "3",
        "statedir": str(tmp_path / "state"),
    }

    r1 = LogTailStreamReader(schema, opts)
    start = r1.initialOffset()
    recs1, ck, _ = _drive(r1, start, 2)
    assert ck == {"a.jsonl": 6}

    # clean restart: sidecar floor loaded -> first trigger is CAPPED
    r2 = LogTailStreamReader(schema, opts)
    recs2, ck2, ranges = _drive(r2, ck, 2)
    for (st, en) in ranges:
        span = sum(
            en.get(k, 0) - st.get(k, 0) for k in en
        )
        assert span <= 3, f"first post-restart trigger uncapped: {ranges}"
        for k, v in en.items():
            assert v >= ck.get(k, 0)
    seqs = [r[0] for r in recs1 + recs2]
    assert sorted(seqs) == sorted(set(seqs))
    assert ck2 == {"a.jsonl": 12}

    # fresh start (initialOffset) over the leftover sidecar: refuse
    r3 = LogTailStreamReader(schema, opts)
    with _pytest.raises(ValueError, match="statedir"):
        r3.initialOffset()
