"""applyInPandasWithState sessionization: in-batch gap splits and
watermark-driven event-time timeout across micro-batches."""

import json
import os
import time

from reader_spark.streaming.stateful import sessionize_stream

SCHEMA = "user_id long, ts timestamp"


def _write(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for uid, ts in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")


def _wait_rows(spark, table, want, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if spark.table(table).count() >= want:
            return
        time.sleep(0.5)


def test_sessionize_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    # batch 1: user 1 has two sessions separated by > gap within the
    # batch; the second session stays OPEN.
    _write(
        str(src), "a.jsonl",
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:00:30"),
            (1, "2024-01-01 12:00:00"),
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA).json(str(src))
    )
    q = (
        sessionize_stream(stream, gap_s=600)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _wait_rows(spark, "sessions_out", 1)
        rows = {
            (r.user_id, r.session_start.isoformat(), r.n_events)
            for r in spark.table("sessions_out").collect()
        }
        assert (1, "2024-01-01T10:00:00", 2) in rows  # closed by in-batch gap

        # batch 2: a much later event advances the watermark past
        # 12:00 + gap -> the open session times out and is emitted.
        _write(str(src), "b.jsonl", [(2, "2024-01-01 18:00:00")])
        _wait_rows(spark, "sessions_out", 2)
        rows = {
            (r.user_id, r.session_start.isoformat(), r.n_events)
            for r in spark.table("sessions_out").collect()
        }
        assert (1, "2024-01-01T12:00:00", 1) in rows  # closed by timeout
    finally:
        q.stop()
