"""Snapshot plan semantics: partition-boundary correctness (the
reference's chunk-boundary test, integration_tests/postgres/main.go:878-951,
re-expressed for partitioned scans), PK guards, transfer dedupe."""

import pytest
from pyspark.sql import functions as F

from reader_spark.plans.snapshot import (
    chunk_predicates,
    chunked_scan,
    pk_bounds,
    project_columns,
    transfer_dedupe,
)
from reader_spark.session import read_table


def test_chunk_predicates_cover_exactly_once():
    preds = chunk_predicates(1, 100, 7, "id")
    # simulate on the full domain: every id matched exactly once
    import re

    def matches(pid, pred):
        clauses = pred.split(" AND ")
        ok = True
        for c in clauses:
            m = re.match(r"id (>=|<=) (\d+)", c)
            op, v = m.group(1), int(m.group(2))
            ok &= pid >= v if op == ">=" else pid <= v
        return ok

    for i in range(1, 101):
        assert sum(matches(i, p) for p in preds) == 1, i


@pytest.mark.parametrize(
    "n_chunks",
    # the 1000-chunk stress case is driver-plan-bound (~70 s alone:
    # a thousand predicate scans) — slow tier; boundary correctness
    # stays covered by the 1/2/5/32 cases (r13, see pytest.ini)
    [1, 2, 5, 32, pytest.param(1000, marks=pytest.mark.slow)],
)
def test_chunked_scan_equals_full_table(spark, sf_dir, n_chunks):
    orders = read_table(spark, sf_dir, "orders")
    full = orders.select("o_orderkey").orderBy("o_orderkey").collect()
    chunked = (
        chunked_scan(orders, "o_orderkey", n_chunks)
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .collect()
    )
    assert full == chunked  # no dupes, no drops at boundaries


def test_pk_bounds(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    row = pk_bounds(orders, "o_orderkey").collect()[0]
    assert row["min_pk"] == 0 and row["max_pk"] > 0


def test_projection_guards(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="cannot exclude primary key"):
        project_columns(orders, ["o_orderkey"], exclude=["o_orderkey"])
    with pytest.raises(ValueError, match="must contain primary keys"):
        project_columns(orders, ["o_orderkey"], include=["o_custkey"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        project_columns(orders, ["o_orderkey"], include=["o_orderkey"], exclude=["x"])
    kept = project_columns(orders, ["o_orderkey"], exclude=["o_totalprice"])
    assert "o_totalprice" not in kept.columns and "o_orderkey" in kept.columns


def test_empty_table_short_circuit(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").filter("o_orderkey < 0")
    out = chunked_scan(orders, "o_orderkey", 4)
    assert out.count() == 0
    assert out.columns == orders.columns  # schema preserved (K4)


def test_transfer_dedupe_keeps_latest(spark):
    rows = [
        (1, "2024-01-01", "a"),
        (1, "2024-01-03", "b"),
        (1, "2024-01-02", "c"),
        (2, "2024-01-01", "d"),
    ]
    df = spark.createDataFrame(rows, ["pk", "updated_at", "val"]).withColumn(
        "updated_at", F.to_timestamp("updated_at")
    )
    out = {
        r["pk"]: r["val"]
        for r in transfer_dedupe(df, ["pk"], "updated_at").collect()
    }
    assert out == {1: "b", 2: "d"}


# ---------------------------------------------------------------------------
# concurrent (watermark-interleaved) snapshot merge


def test_interleaved_snapshot_merge_rules(spark):
    from reader_spark.plans.snapshot import interleaved_snapshot_merge

    # chunks cut at different log positions: pk 1-3 read at pos 100,
    # pk 4-6 read at pos 200
    chunks = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "c", 100),
         (4, "d", 200), (5, "e", 200), (6, "f", 200)],
        "pk long, v string, chunk_pos long",
    )
    events = spark.createDataFrame(
        [
            (1, "u", 50, "STALE"),    # before pk1's cut -> ignored
            (2, "u", 150, "B2"),      # after pk2's cut -> wins
            (3, "d", 100, "X"),       # AT the cut (not past) -> ignored
            (4, "u", 150, "STALE"),   # before pk4's cut (200) -> ignored
            (5, "d", 250, "X"),       # delete past the cut -> row gone
            (5, "u", 240, "STALE"),   # older than the delete
            (7, "c", 10, "NEW"),      # insert-only pk -> appears
            (7, "u", 20, "NEW2"),     # latest event for pk 7
        ],
        "pk long, op string, pos long, v string",
    )
    got = {
        r["pk"]: r["v"]
        for r in interleaved_snapshot_merge(
            chunks, events, "pk", ["v"]
        ).collect()
    }
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d", 6: "f", 7: "NEW2"}


def test_interleaved_merge_equals_sequential_replay(spark):
    """Property: when every chunk is cut at position 0 (snapshot fully
    before the stream), the merge equals plain last-event-wins replay
    over the snapshot."""
    import random

    from reader_spark.plans.snapshot import interleaved_snapshot_merge

    rng = random.Random(7)
    snap_rows = [(pk, f"s{pk}", 0) for pk in range(40)]
    ev_rows = []
    pos = 1
    for _ in range(200):
        pk = rng.randrange(50)
        op = rng.choice(["u", "u", "c", "d"])
        ev_rows.append((pk, op, pos, f"v{pos}"))
        pos += 1
    chunks = spark.createDataFrame(snap_rows, "pk long, v string, chunk_pos long")
    events = spark.createDataFrame(ev_rows, "pk long, op string, pos long, v string")
    got = {
        r["pk"]: r["v"]
        for r in interleaved_snapshot_merge(chunks, events, "pk", ["v"]).collect()
    }
    # reference replay
    state = {pk: v for pk, v, _ in snap_rows}
    for pk, op, pos, v in sorted(ev_rows, key=lambda r: r[2]):
        if op == "d":
            state.pop(pk, None)
        else:
            state[pk] = v
    assert got == state
