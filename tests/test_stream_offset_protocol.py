"""Model-based property test of the stream sources' offset protocol.

Drives `LogTailStreamReader` through RANDOM schedules of triggers,
appends, and driver restarts (both shapes: clean shutdown, where the
engine's first call is latestOffset with the checkpointed start; and
replay, where the logged-but-uncommitted last batch re-plans via
partitions() first) and asserts the two delivery invariants the
reference's write-then-commit contract (writers/writer.go:44-50)
demands of an at-least-once source feeding idempotent sinks:

  * NO DUPLICATES across committed batches: a record whose batch
    committed is never delivered again by a later batch (replay of an
    UNcommitted batch is allowed — that is the at-least-once half);
  * NO LOSS: after enough triggers, every appended record has been
    delivered;
  * MONOTONE OFFSETS: latestOffset never hands out an offset below
    anything the engine has logged (a regressed end would corrupt the
    offset log — the r7 HIGH bug class).

Pure protocol-level (no Spark session): the reader's engine-facing
methods are the unit under test.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import StringType, StructField, StructType

from reader_spark.streaming.log_source import LogTailStreamReader
from reader_spark.streaming.shard_source import ShardStreamReader

SCHEMA = StructType([StructField("seq", StringType())])

# Both custom sources speak the same engine protocol; the shard
# reader without a manifest treats every file as an open root shard,
# so the schedules exercise its per-shard cap the same way.
READER_FACTORIES = {
    "logtail": lambda d, cap: LogTailStreamReader(
        SCHEMA, {"path": str(d), "maxrecordspertrigger": str(cap)}
    ),
    "shard": lambda d, cap: ShardStreamReader(
        SCHEMA, {"path": str(d), "maxRecordsPerBatch": str(cap)}
    ),
    # persisted-floor variants: the sidecar must preserve the same
    # invariants (it may lag the checkpoint by exactly the pending
    # batch, which the replay path covers)
    "logtail-statedir": lambda d, cap: LogTailStreamReader(
        SCHEMA,
        {
            "path": str(d),
            "maxrecordspertrigger": str(cap),
            "statedir": str(d) + "-state",
        },
    ),
    "shard-statedir": lambda d, cap: ShardStreamReader(
        SCHEMA,
        {
            "path": str(d),
            "maxRecordsPerBatch": str(cap),
            "statedir": str(d) + "-state",
        },
    ),
}

# A schedule is a list of ops:
#   ("append", shard_idx, n) — append n records to shard shard_idx
#   ("trigger",)             — one micro-batch cycle (latest/plan/read/commit)
#   ("crash",)               — batch logged to the offset log, sink write
#                              dies before commit (the replay shape)
#   ("restart",)             — new reader; if the offset log holds an
#                              uncommitted batch the engine replays it via
#                              partitions() first, else the next trigger's
#                              latestOffset is the reader's first call
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 2), st.integers(1, 5)),
        st.tuples(st.just("trigger")),
        st.tuples(st.just("crash")),
        st.tuples(st.just("restart")),
    ),
    min_size=4,
    max_size=18,
)


class EngineModel:
    """Minimal faithful model of MicroBatchExecution's offset flow."""

    def __init__(self, log_dir, cap, factory):
        self.log_dir = str(log_dir)
        self.cap = cap
        self.factory = factory
        self.committed_start: dict = {}   # start of the next batch
        self.pending: tuple | None = None  # (start, end) logged, not committed
        self.delivered_committed: list = []
        self.reader = None
        self.fresh = True

    def _new_reader(self):
        return self.factory(self.log_dir, self.cap)

    def _read_batch(self, start, end):
        recs = []
        for p in self.reader.partitions(dict(start), dict(end)):
            recs.extend(self.reader.read(p))
        return recs

    def start_session(self):
        self.reader = self._new_reader()
        if self.fresh:
            # verified engine order on a FRESH start: the first
            # latestOffset precedes initialOffset and its value
            # becomes batch 1's end — modeled in _plan below, which
            # resolves the start lazily
            self.committed_start = None
            self.fresh = False
            return
        if self.pending is not None:
            # the offset log holds a logged-but-uncommitted batch: the
            # engine ALWAYS replays it first, via partitions(). The
            # crashed attempt's partial sink output was never
            # committed (transactional sink), so the replay's delivery
            # counts once — the at-least-once half of the contract.
            start, end = self.pending
            recs = self._read_batch(start, end)
            self.reader.commit(dict(end))
            self.delivered_committed.extend(recs)
            self.pending = None
            self.committed_start = dict(end)

    def _plan(self):
        if self.reader is None:
            self.start_session()
        end = self.reader.latestOffset()
        if self.committed_start is None:
            # fresh start: initialOffset is asked AFTER the first
            # latestOffset (verified order)
            self.committed_start = self.reader.initialOffset()
        # MONOTONE: never below what the engine already logged
        for k, v in self.committed_start.items():
            assert int(end.get(k, 0)) >= int(v), (
                f"latestOffset regressed {k}: {end.get(k)} < {v}"
            )
        return end

    def trigger(self):
        end = self._plan()
        self.pending = (dict(self.committed_start), dict(end))
        recs = self._read_batch(self.committed_start, end)
        # sink write succeeds -> engine commits
        self.reader.commit(dict(end))
        self.delivered_committed.extend(recs)
        self.pending = None
        self.committed_start = dict(end)

    def crash(self):
        """Batch end reaches the offset log; the sink write (and so
        the commit) never happens. The session dies."""
        end = self._plan()
        self.pending = (dict(self.committed_start), dict(end))
        # records may have partially reached the sink — uncommitted,
        # so a transactional sink discards them; nothing is recorded
        self.reader = None


@pytest.mark.parametrize("source", sorted(READER_FACTORIES))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS, cap=st.integers(1, 4))
def test_random_schedules_exactly_once(tmp_path_factory, source, ops, cap):
    d = tmp_path_factory.mktemp("proto")
    counters = [0, 0, 0]

    def append(shard, n):
        with open(d / f"s{shard}.jsonl", "a") as f:
            for _ in range(n):
                f.write(json.dumps({"seq": f"{shard}:{counters[shard]}"}) + "\n")
                counters[shard] += 1

    append(0, 2)  # some initial data
    eng = EngineModel(d, cap, READER_FACTORIES[source])
    eng.start_session()

    for op in ops:
        if op[0] == "append":
            append(op[1], op[2])
        elif op[0] == "trigger":
            eng.trigger()
        elif op[0] == "crash":
            eng.crash()
        else:
            eng.start_session()

    # drain whatever remains
    for _ in range(40):
        eng.trigger()

    seqs = [r[0] for r in eng.delivered_committed]
    # NO DUPLICATES across committed batches
    assert len(seqs) == len(set(seqs)), (
        f"duplicates: {[s for s in seqs if seqs.count(s) > 1][:5]}"
    )
    # NO LOSS: everything appended was delivered
    expected = {
        f"{shard}:{i}" for shard in range(3) for i in range(counters[shard])
    }
    assert set(seqs) == expected, (
        f"lost: {sorted(expected - set(seqs))[:5]}"
    )
