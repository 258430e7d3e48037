"""Transfer sink: the reference's direct-warehouse writer semantics
(writers/transfer/writer.go:62-366) on Spark primitives.

Reference behavior:
  * accumulate events per table, flush via Append or Merge
    (writer.go:254-303);
  * optional truncate/drop before a backfill (writer.go:310-327);
  * final dedupe on PKs keeping the latest (writer.go:329-366).

Spark-first: Append = mode("append") write; Merge = MERGE INTO when a
Delta/Iceberg catalog exists — this container has neither, so
`upsert_parquet` emulates MERGE with anti-join + union (the canonical
pre-Delta pattern), publishing the new snapshot via an atomic
pointer-file flip (operators/atomic_dir.py — readers never see a
missing or partial dataset, crashes leave the previous snapshot
live). At 100 TB the emulation is replaced by Delta MERGE (one
config switch in TransferWriter); the dedupe window and the
change-event application logic are identical either way.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.operators import atomic_dir
from reader_spark.plans.snapshot import transfer_dedupe


def _write_schema_manifest(root: str, df) -> None:
    """Persist the table schema as a manifest next to the data
    (underscore-prefixed: invisible to Spark's file listing).
    Written via tmp + os.replace so readers never see a torn file."""
    import uuid as _uuid

    tmp = os.path.join(root, "._schema.tmp-" + _uuid.uuid4().hex[:8])
    with open(tmp, "w") as f:
        f.write(df.schema.json())
    os.replace(tmp, os.path.join(root, "_schema.json"))


def _read_schema_manifest(root: str):
    """The pinned table schema, or None for legacy layouts."""
    import json as _json

    from pyspark.sql import types as _T

    p = os.path.join(root, "_schema.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return _T.StructType.fromJson(_json.load(f))


def _write_layout_manifest(root: str, n_buckets: int) -> None:
    """Pin the bucketed layout's n_buckets next to the data. The
    bucket id IS a function of n_buckets (pmod(xxhash64(pk), n)) —
    a later merge run with a different n recomputes different ids,
    reads/writes the WRONG bucket dirs, and leaves the stale row in
    its original bucket: duplicate primary keys from a parameter
    default. The layout is therefore a property of the TABLE,
    recorded once at seed time, and every bucketed verb resolves it
    from here instead of trusting its caller."""
    import json as _json

    tmp = os.path.join(root, "._layout.tmp-" + uuid.uuid4().hex[:8])
    with open(tmp, "w") as f:
        _json.dump({"n_buckets": int(n_buckets)}, f)
    os.replace(tmp, os.path.join(root, "_layout.json"))


def _read_layout_manifest(root: str) -> int | None:
    """The pinned n_buckets, or None for legacy/unbucketed layouts."""
    import json as _json

    p = os.path.join(root, "_layout.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return int(_json.load(f)["n_buckets"])


def latest_changes(
    changes: DataFrame, pk_cols: list[str], seq_col: str
) -> DataFrame:
    """Collapse a micro-batch of change events to one terminal row per
    PK (writer.go:329-366): last-write-wins by seq."""
    return transfer_dedupe(changes, pk_cols, seq_col)


def align_schemas(
    base: DataFrame,
    changes: DataFrame,
    op_col: str = "op",
    seq_col: str = "seq",
) -> tuple[DataFrame, DataFrame]:
    """Destination schema evolution for MERGE (the reference's
    transfer contract: upstream DDL must not break the warehouse
    load — /root/reference/lib/debezium/schema.go carries the wire
    schema precisely so destinations can evolve):

    * a NEW change column is added to the destination — existing
      rows read NULL for it (previously it was silently dropped);
    * a column MISSING from the change set (dropped upstream) stays
      in the destination — new rows carry NULL (previously the MERGE
      crashed on the select).

    Types come from whichever side has the column; no cast of
    existing data is attempted (a type CHANGE upstream is a rename in
    disguise — route it through the DDL history, not the merge)."""
    base_cols = set(base.columns)
    for f in changes.schema.fields:
        if f.name not in base_cols and f.name not in (op_col, seq_col):
            base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
    chg_cols = set(changes.columns)
    for f in base.schema.fields:
        if f.name not in chg_cols:
            changes = changes.withColumn(f.name, F.lit(None).cast(f.dataType))
    return base, changes


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    pk_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE semantics as a plan: delete rows whose terminal event is
    'd', upsert the rest. One shuffle on the PK for the anti-join;
    the change set is typically << base, so Catalyst broadcasts it.
    Schemas evolve (`align_schemas`) before merging, so upstream
    column adds/drops land as NULL-padded columns instead of dropped
    data or a crashed load. The PRIMARY KEY is exempt from evolution:
    a change set without it is unmergeable and must fail loudly, not
    null-fill into one giant group."""
    missing_pk = [c for c in pk_cols if c not in changes.columns]
    if missing_pk:
        raise ValueError(
            f"change set is missing primary-key column(s) {missing_pk}"
        )
    base, changes = align_schemas(base, changes, op_col, seq_col)
    value_cols = [c for c in base.columns]
    term = latest_changes(changes, pk_cols, seq_col)
    keys = term.select(*pk_cols)
    survivors = base.join(keys, pk_cols, "left_anti")
    upserts = term.filter(F.col(op_col) != "d").select(*value_cols)
    return survivors.unionByName(upserts)


class TransferWriter:
    """Parquet-backed transfer destination with Append / Upsert /
    backfill-truncate, mirroring writers/transfer/writer.go flow."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        keep_versions: int = 1,
    ):
        self.spark = spark
        self.base_dir = base_dir
        # how many displaced snapshots the full-rewrite verbs retain:
        # >1 buys TIME TRAVEL (read(table, version=seq)) — the
        # point-in-time dataset a training run pins itself to
        self.keep_versions = keep_versions

    def _path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def _data_root(self, table: str) -> str:
        """Where the table's live files are: the pointer-published
        version dir for tables that have been through a full-rewrite
        verb (upsert/scd2/compact), else the bare table dir."""
        return atomic_dir.resolve(self._path(table))

    def exists(self, table: str) -> bool:
        return os.path.isdir(self._path(table))

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Read the live table state; `version` time-travels to a
        retained historical snapshot (atomic_dir sequence number —
        see `versions()`)."""
        if version is not None:
            return self.spark.read.parquet(
                atomic_dir.resolve(self._path(table), version)
            )
        # A bucketed upsert that evolved the schema only rewrote the
        # TOUCHED buckets, so files legitimately disagree — the read
        # schema from one sampled footer could silently drop a fresh
        # column. The upsert verbs therefore carry the merged schema
        # as a manifest (`_schema.json`) next to the data: reads pin
        # it (missing columns in old files null-fill by name, no
        # footer pass at all). Legacy layouts without a manifest pay
        # the footer merge instead.
        root = self._data_root(table)
        schema = _read_schema_manifest(root)
        if schema is not None:
            return self.spark.read.schema(schema).parquet(root)
        return self.spark.read.option("mergeSchema", "true").parquet(root)

    def versions(self, table: str) -> list[int]:
        """Retained snapshot sequence numbers, oldest first."""
        return atomic_dir.versions(self._path(table))

    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._data_root(table))

    def truncate_for_backfill(self, table: str) -> None:
        """Pre-backfill truncate/drop (writer.go:310-327)."""
        shutil.rmtree(self._path(table), ignore_errors=True)

    def truncate(self, table: str) -> None:
        """The transfer TRUNCATE verb (writer.go:310-327): clear the
        table's rows while KEEPING its schema, behind a pointer flip.
        This is what a replicated `TRUNCATE TABLE` maps onto — unlike
        `truncate_for_backfill` the table stays readable (zero rows,
        same columns) before, during and after the clear, a crash at
        any point leaves either the old rows or the empty state live
        (never a half-deleted layout), and a replayed micro-batch
        re-truncating is a no-op. Subsequent upserts seed the bucketed
        layout afresh under the published version dir."""
        if not self.exists(table):
            return
        empty = self.read(table).limit(0)
        path = self._path(table)
        pinned_buckets = _read_layout_manifest(self._data_root(table))

        # The version dir holds ONLY the schema manifest — no data
        # files. Reads pin the manifest schema, so an empty dir scans
        # to zero rows without inference; and a later bucketed upsert
        # swaps `bucket=` dirs in without colliding with a root-level
        # part file (mixed-level layouts break partition discovery).
        # The bucket-layout pin survives the truncate: the table's
        # n_buckets is identity, not data.
        def write_empty(vdir: str) -> None:
            os.makedirs(vdir, exist_ok=True)
            _write_schema_manifest(vdir, empty)
            if pinned_buckets is not None:
                _write_layout_manifest(vdir, pinned_buckets)

        atomic_dir.publish(path, write_empty, keep=self.keep_versions)

    def scd2_close_all(self, table: str, at_seq: int) -> None:
        """The TRUNCATE verb for a HISTORY-PRESERVING (SCD2)
        destination: a replicated `TRUNCATE TABLE` means every
        source row ceased to exist at that log position — so every
        open interval closes at `at_seq`, and nothing is deleted
        (wiping an SCD2 table on truncate would destroy exactly the
        history the layout exists to keep). One map-only rewrite
        behind a pointer flip. Only intervals opened AT OR BEFORE
        `at_seq` close: a crash replay that re-applies the truncate
        AFTER the batch's post-truncate DML already merged must not
        re-close the freshly opened chains at the earlier truncate
        position (that would mint inverted rows, eff_to < eff_from,
        plus a duplicate history row when the DML re-merges) — so
        intervals born after the truncate stay open and the replay
        is a real no-op. Post-truncate inserts open fresh interval
        chains through the normal merge. Bucketed layouts keep their
        `bucket=` dirs so later `upsert_scd2_bucketed` calls still
        swap per-bucket."""
        if not self.exists(table):
            return
        base = self.read(table)
        pinned_buckets = _read_layout_manifest(self._data_root(table))
        closed = base.withColumn(
            "eff_to",
            F.coalesce(
                F.col("eff_to"),
                F.when(
                    F.col("eff_from") <= F.lit(at_seq),
                    F.lit(at_seq).cast(dict(base.dtypes)["eff_to"]),
                ),
            ),
        )

        def write_fn(vdir: str) -> None:
            if "bucket" in closed.columns:
                closed.repartition("bucket").write.partitionBy(
                    "bucket"
                ).parquet(vdir)
            else:
                closed.write.parquet(vdir)
            _write_schema_manifest(vdir, closed)
            if pinned_buckets is not None:
                _write_layout_manifest(vdir, pinned_buckets)

        atomic_dir.publish(
            self._path(table), write_fn, keep=self.keep_versions
        )

    def create_empty(self, table: str, df: DataFrame) -> None:
        """K4: empty-table path — persist schema with zero rows
        (sources/mysql/snapshot.go:49-66)."""
        df.limit(0).write.mode("overwrite").parquet(self._path(table))

    def upsert(
        self,
        table: str,
        changes: DataFrame,
        pk_cols: list[str],
        seq_col: str,
        op_col: str = "op",
    ) -> None:
        """MERGE emulation with an atomic pointer-flip publish
        (operators/atomic_dir.py): readers always resolve to a
        complete snapshot, and a crash mid-publish leaves the
        previous snapshot live (a Delta MERGE makes this
        transactional for real)."""
        if not self.exists(table):
            base = changes.select(
                *[c for c in changes.columns if c not in (op_col, seq_col)]
            ).limit(0)
        else:
            base = self.read(table)
        merged = apply_changes(base, changes, pk_cols, seq_col, op_col)

        def write_fn(vdir: str) -> None:
            merged.write.mode("overwrite").parquet(vdir)
            _write_schema_manifest(vdir, merged)

        atomic_dir.publish(
            self._path(table), write_fn, keep=self.keep_versions
        )

    def upsert_bucketed(
        self,
        table: str,
        changes: DataFrame,
        pk_cols: list[str],
        seq_col: str,
        op_col: str = "op",
        n_buckets: int = 64,
    ) -> list[int]:
        """Incremental MERGE for big tables: the sink is laid out as
        `bucket=pmod(xxhash64(pk), n)` directory partitions, and an
        upsert reads, merges, and atomically swaps ONLY the buckets
        that contain changed keys. `upsert` rewrites the whole
        snapshot — fine for modest tables, quadratic pain at 100 TB
        where a micro-batch touches a handful of keys; here the
        rewrite cost is O(changed_buckets / n_buckets) of the table,
        and partition pruning keeps the read side just as narrow
        (the bucket filter prunes directories, not files). Returns
        the list of bucket ids rewritten.

        `n_buckets` only matters at SEED time; it is pinned in the
        table's `_layout.json` and every later merge resolves the
        pinned value (`_resolve_n_buckets`) — a caller passing a
        different default can no longer scatter keys across the
        wrong bucket dirs."""
        # per-bucket swaps happen under the LIVE data root — the
        # pointer-published version dir if a full-rewrite verb
        # (compact/upsert) converted this table's layout
        path = self._data_root(table)
        if self.exists(table):
            n_buckets = self._resolve_n_buckets(path, n_buckets, pk_cols)
        bucket = F.pmod(F.xxhash64(*[F.col(c) for c in pk_cols]), F.lit(n_buckets))
        changes = changes.withColumn("bucket", bucket.cast("int"))
        if not self.exists(table):
            term = latest_changes(changes, pk_cols, seq_col)
            first = term.filter(F.col(op_col) != "d").drop(op_col, seq_col)
            # cluster rows by bucket BEFORE partitionBy: otherwise every
            # task writes a file into every bucket directory (tasks x
            # buckets files — measured 11x slower seed write)
            first.repartition(n_buckets, "bucket").write.mode(
                "overwrite"
            ).partitionBy("bucket").parquet(path)
            _write_schema_manifest(path, first)
            _write_layout_manifest(path, n_buckets)
            # read the written layout, never recompute the input: a
            # distinct() over `first` would re-run the whole upstream
            # pipeline a second time (measured 3x seed cost on a
            # generated 2 GB input)
            return sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(path)
                if d.startswith("bucket=")
            )
        touched = sorted(
            r["bucket"] for r in changes.select("bucket").distinct().collect()
        )
        base = self.read(table).filter(F.col("bucket").isin(touched))
        merged = apply_changes(base, changes, pk_cols, seq_col, op_col)
        staging = path + ".staging-" + uuid.uuid4().hex[:8]
        merged.repartition(max(1, len(touched)), "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(staging)
        # Pin the (possibly widened) manifest BEFORE the swap: a crash
        # between the two must err toward advertising a column old
        # files lack (pinned reads null-fill by name — harmless), never
        # toward a stale manifest that HIDES a just-evolved column (the
        # next upsert would then read base without it and overwrite
        # real values with NULLs — silent data loss from one crash).
        _write_schema_manifest(path, merged)
        self._swap_buckets(path, staging, touched)
        return touched

    def _resolve_n_buckets(
        self, path: str, requested: int, pk_cols: list[str] | None = None
    ) -> int:
        """The table's REAL bucket count: the pinned `_layout.json`
        wins over the caller's parameter (silently — the parameter is
        a seed-time knob, not a per-call one). Legacy layouts without
        a manifest are PROBED before the requested value is adopted:
        a max-id check alone is one-sided (a table seeded with 8
        buckets merged with requested=16 passes it, then new versions
        of existing keys hash into DIFFERENT bucket dirs and the
        stale rows become duplicate primary keys — the exact
        corruption the pin stops). So sample stored rows from EVERY
        non-empty bucket dir and verify pmod(xxhash64(pk), requested)
        reproduces each dir's id; only a layout that survives both
        checks is adopted AND pinned so the ambiguity never recurs.
        All dirs are probed (r12, was first-non-empty-only): under a
        wrong count a near-empty dir passes its 100-row sample with
        non-trivial probability — e.g. a 1-row bucket survives an
        8-seeded/16-requested mismatch ~50% of the time — and a
        single lucky dir must not pin the wrong count permanently;
        the miss probability now multiplies across every stored row
        sampled in every dir. Empty legacy dirs adopt unprobed —
        with zero stored rows there is nothing to strand."""
        pinned = _read_layout_manifest(path)
        if pinned is not None:
            return pinned
        existing = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(path)
            if d.startswith("bucket=")
        )
        if existing and max(existing) >= requested:
            raise ValueError(
                f"table at {path} has bucket ids up to {max(existing)} "
                f"but n_buckets={requested} was requested; the layouts "
                "are incompatible (seed-time n_buckets is pinned in "
                "_layout.json for tables built by this version)"
            )
        if existing and pk_cols:
            # unprobeable (every bucket dir empty) == zero stored
            # rows == no key can be stranded: adopting is then safe
            for b in existing:
                bdir = os.path.join(path, f"bucket={b}")
                if not any(
                    f.startswith("part-") and f.endswith(".parquet")
                    for f in os.listdir(bdir)
                ):
                    continue
                sample = (
                    self.spark.read.parquet(bdir)
                    .select(
                        F.pmod(
                            F.xxhash64(*[F.col(c) for c in pk_cols]),
                            F.lit(requested),
                        ).alias("__b")
                    )
                    .limit(100)
                    .collect()
                )
                if sample and any(r["__b"] != b for r in sample):
                    raise ValueError(
                        f"table at {path} has no _layout.json and "
                        f"its stored rows do NOT hash to their "
                        f"bucket dirs under n_buckets={requested}; "
                        "the table was seeded with a different "
                        "bucket count — pass the seed-time value "
                        "(merging under the wrong count strands "
                        "stale versions of existing keys)"
                    )
        _write_layout_manifest(path, requested)
        return requested

    @staticmethod
    def _swap_buckets(path: str, staging: str, touched: list[int]) -> None:
        """Swap the touched bucket directories from `staging` into the
        live layout (per-bucket dir rename — the partition-overwrite
        analogue; untouched bucket dirs are never listed or moved).

        Displaced dirs are parked under DOT-PREFIXED names: Spark's
        file listing skips hidden entries, so a crash between the
        rename and the cleanup can never resurface the displaced
        bucket as a phantom partition (a `bucket=3.old-x` sibling
        would be discovered as a partition VALUE — duplicate rows and
        a string-typed bucket column). Stale parked dirs from a
        crashed earlier swap are GC'd here."""
        for entry in os.listdir(path):
            if entry.startswith(".old-"):
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
        for b in touched:
            src = os.path.join(staging, f"bucket={b}")
            dst = os.path.join(path, f"bucket={b}")
            old = os.path.join(
                path, f".old-{uuid.uuid4().hex[:8]}-bucket={b}"
            )
            if os.path.isdir(dst):
                os.rename(dst, old)
            if os.path.isdir(src):
                os.rename(src, dst)
            else:
                os.makedirs(dst, exist_ok=True)  # bucket emptied by deletes
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)

    @staticmethod
    def _scd2_merge(
        base: DataFrame | None,
        changes: DataFrame,
        pk_cols: list[str],
        seq_col: str,
        op_col: str,
    ) -> DataFrame:
        """The SCD2 interval-chaining MERGE, independent of layout:

        - each change row opens an interval at its own seq and is
          closed by the key's NEXT change in the same batch (a lead
          window over the delta — deletes close their predecessor
          and open nothing);
        - a key's EXISTING open interval closes at the key's first
          delta seq;
        - untouched keys' rows are carried through byte-identical.

        `base` is the stored history visible to this merge (the whole
        table, or just the touched buckets — a key's entire history
        lives in one bucket, so the chaining is complete either
        way)."""
        from pyspark.sql import Window as W

        attr_cols = [
            c
            for c in changes.columns
            if c not in (*pk_cols, seq_col, op_col)
        ]
        w = W.partitionBy(*pk_cols).orderBy(F.col(seq_col))
        delta = changes.withColumn(
            "__next", F.lead(seq_col).over(w)
        )
        new_rows = delta.filter(F.col(op_col) != "d").select(
            *pk_cols,
            *attr_cols,
            F.col(seq_col).alias("eff_from"),
            F.col("__next").alias("eff_to"),
        )
        if base is None:
            return new_rows
        first_seq = changes.groupBy(*pk_cols).agg(
            F.min(seq_col).alias("__close")
        )
        # Schema evolution: an attr the DDL added mid-stream
        # exists on the delta but not in stored history (null for
        # rows that predate it), and a dropped attr survives in
        # history but is absent from the delta (null on new
        # rows). Conform BOTH sides to the ordered union instead
        # of silently projecting the new column away.
        delta_types = dict(new_rows.dtypes)
        base_types = dict(base.dtypes)
        all_cols = list(base.columns) + [
            c for c in new_rows.columns if c not in base_types
        ]
        for c in all_cols:
            if c not in base_types:
                base = base.withColumn(
                    c, F.lit(None).cast(delta_types[c])
                )
            if c not in delta_types:
                new_rows = new_rows.withColumn(
                    c, F.lit(None).cast(base_types[c])
                )
        closed = base.filter(F.col("eff_to").isNotNull())
        opened = base.filter(F.col("eff_to").isNull())
        now_closed = (
            opened.drop("eff_to")
            .join(first_seq, pk_cols)
            .withColumnRenamed("__close", "eff_to")
            .select(*all_cols)
        )
        still_open = opened.join(first_seq, pk_cols, "left_anti")
        return (
            closed.select(*all_cols)
            .unionByName(now_closed)
            .unionByName(still_open.select(*all_cols))
            .unionByName(new_rows.select(*all_cols))
        )

    def upsert_scd2(
        self,
        table: str,
        changes: DataFrame,
        pk_cols: list[str],
        seq_col: str,
        op_col: str = "op",
    ) -> None:
        """History-preserving MERGE (type-2 SCD): instead of
        replacing a changed key's row, the sink keeps every version
        as a validity interval [eff_from, eff_to), with the live
        version open (eff_to NULL). Interval semantics in
        `_scd2_merge`.

        The warehouse analogue of `queries.scd2_user_state`, on the
        same atomic pointer-flip publish as `upsert`. At-least-once
        streams must dedupe replayed positions upstream (the GTID
        gate) — a replayed batch would re-close already-closed
        intervals. Scale: the merge reads and rewrites the whole
        table — fine below ~1 GB; at the 100 TB tier use
        `upsert_scd2_bucketed`, which rewrites only buckets
        containing changed keys."""
        base = self.read(table) if self.exists(table) else None
        merged = self._scd2_merge(base, changes, pk_cols, seq_col, op_col)

        def write_fn(vdir: str) -> None:
            merged.write.mode("overwrite").parquet(vdir)
            _write_schema_manifest(vdir, merged)

        atomic_dir.publish(
            self._path(table), write_fn, keep=self.keep_versions
        )

    def upsert_scd2_bucketed(
        self,
        table: str,
        changes: DataFrame,
        pk_cols: list[str],
        seq_col: str,
        op_col: str = "op",
        n_buckets: int = 64,
    ) -> list[int]:
        """SCD2 MERGE for big histories: the sink is laid out as
        `bucket=pmod(xxhash64(pk), n)` directory partitions and a
        micro-batch reads, chains, and atomically swaps ONLY the
        buckets containing changed keys — `upsert_bucketed`'s
        economics applied to the history-preserving merge (rewrite
        cost O(touched_buckets / n) of the history instead of all of
        it). The load-bearing invariant: the bucket key hashes the PK
        alone, so a key's ENTIRE interval chain lives in exactly one
        bucket and chaining within the touched subset is complete
        (the same single-home argument as the bm25 term buckets).
        Returns the bucket ids rewritten. `n_buckets` is a seed-time
        knob, pinned in `_layout.json` and resolved from there on
        every later merge (see `upsert_bucketed`)."""
        path = self._data_root(table)
        if self.exists(table):
            n_buckets = self._resolve_n_buckets(path, n_buckets, pk_cols)
        bucket = F.pmod(
            F.xxhash64(*[F.col(c) for c in pk_cols]), F.lit(n_buckets)
        )
        changes = changes.withColumn("bucket", bucket.cast("int"))
        if not self.exists(table):
            merged = self._scd2_merge(
                None, changes, pk_cols, seq_col, op_col
            )
            merged.repartition(n_buckets, "bucket").write.mode(
                "overwrite"
            ).partitionBy("bucket").parquet(path)
            _write_schema_manifest(path, merged)
            _write_layout_manifest(path, n_buckets)
            return sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(path)
                if d.startswith("bucket=")
            )
        touched = sorted(
            r["bucket"] for r in changes.select("bucket").distinct().collect()
        )
        base = self.read(table).filter(F.col("bucket").isin(touched))
        merged = self._scd2_merge(base, changes, pk_cols, seq_col, op_col)
        staging = path + ".staging-" + uuid.uuid4().hex[:8]
        merged.repartition(max(1, len(touched)), "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(staging)
        # manifest BEFORE swap — same crash-ordering argument as
        # upsert_bucketed: widened-but-unswapped is safe, swapped-but-
        # stale loses data on the next merge
        _write_schema_manifest(path, merged)
        self._swap_buckets(path, staging, touched)
        return touched

    def compact(self, table: str, target_bytes: int = 128 << 20) -> int:
        """Small-files compaction: every CDC upsert / append round
        lands another wave of files, and a 100 TB table read through
        thousands of tiny files is scheduler- and NameNode-bound long
        before it is IO-bound. Rewrite the table into
        ceil(total_bytes / target_bytes) files (round-robin
        repartition — parquet re-encodes, so output sizes track row
        counts) behind the same pointer-flip publish the upsert path
        uses. Returns the new file count."""
        import math

        root = self._data_root(table)
        files = [
            os.path.join(dp, f)
            for dp, _dn, fns in os.walk(root)
            for f in fns
            if f.endswith(".parquet")
        ]
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total / target_bytes))
        # preserve a key=value directory layout (bucketed tables):
        # the rewrite must keep the partition dirs or later
        # partition-pruned merges would find a flat table
        part_keys = sorted(
            {
                d.split("=", 1)[0]
                for d in os.listdir(root)
                if "=" in d and os.path.isdir(os.path.join(root, d))
            }
        )
        df = self.spark.read.parquet(root)
        pinned_buckets = _read_layout_manifest(root)

        def manifests(vdir: str) -> None:
            # the rewrite must carry the table's identity forward:
            # the pinned schema (bucketed reads depend on it) and the
            # bucket-layout pin both live in the version dir
            _write_schema_manifest(vdir, df)
            if pinned_buckets is not None:
                _write_layout_manifest(vdir, pinned_buckets)

        if part_keys:
            df = df.repartition(n_out, *part_keys)

            def write_parted(vdir: str) -> None:
                df.write.mode("overwrite").partitionBy(*part_keys).parquet(
                    vdir
                )
                manifests(vdir)

            atomic_dir.publish(
                self._path(table), write_parted, keep=self.keep_versions
            )
        else:
            df = df.repartition(n_out)

            def write_flat(vdir: str) -> None:
                df.write.mode("overwrite").parquet(vdir)
                manifests(vdir)

            atomic_dir.publish(
                self._path(table), write_flat, keep=self.keep_versions
            )
        return n_out


def compact_partition_dirs(
    spark: SparkSession,
    root: str,
    max_files: int = 4,
    target_bytes: int = 128 << 20,
) -> dict[str, int]:
    """Small-files compaction for a `key=value`-partitioned dataset,
    one partition DIRECTORY at a time — the maintenance verb for the
    incrementally-updated indexes (bm25 term buckets, IVF cells),
    whose per-touched-partition appends accrete a file per update
    round.

    Per partition dir with more than `max_files` parquet files:
    rewrite to ceil(bytes / target_bytes) files behind a staging +
    atomic-rename swap (the same crash-safe pattern as
    TransferWriter.compact). Staging/old dirs are dot-prefixed so a
    crashed run never pollutes partition discovery. Rows are
    untouched — a search before and after must return identical
    results (asserted in tests). Returns {partition_dir: new_count}
    for the rewritten dirs only.

    Scale: each rewrite reads + writes one partition's bytes; the
    scheduler cost this removes grows with file count, which is why
    the trigger is max_files, not size."""
    import math

    out: dict[str, int] = {}
    if not os.path.isdir(root):
        return out
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if not (os.path.isdir(full) and "=" in d and not d.startswith(".")):
            continue
        files = [
            os.path.join(full, f)
            for f in os.listdir(full)
            if f.endswith(".parquet")
        ]
        if len(files) <= max_files:
            continue
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total / target_bytes))
        if n_out >= len(files):
            continue
        df = spark.read.parquet(full).repartition(n_out)
        staging = os.path.join(root, f".staging-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(staging)
        old = os.path.join(root, f".old-{uuid.uuid4().hex[:8]}")
        os.rename(full, old)
        os.rename(staging, full)
        shutil.rmtree(old, ignore_errors=True)
        out[d] = n_out
    return out


def schema_drift(source_schema, sink_schema) -> list[dict]:
    """Schema-level census to pair with the row-level `reconcile`
    audit: per column, one of ok / added (sink-only) / missing
    (source-only) / retyped. Driver-side metadata — StructTypes are
    plan state, no job runs. The C5 history replay decides WHEN a
    version changed; this reports WHAT currently differs end-to-end."""
    src = {f.name: f.dataType.simpleString() for f in source_schema.fields}
    snk = {f.name: f.dataType.simpleString() for f in sink_schema.fields}
    out = []
    for name in sorted(src.keys() | snk.keys()):
        if name not in snk:
            status = "missing"
        elif name not in src:
            status = "added"
        elif src[name] != snk[name]:
            status = "retyped"
        else:
            status = "ok"
        out.append(
            {
                "column": name,
                "status": status,
                "source_type": src.get(name),
                "sink_type": snk.get(name),
            }
        )
    return out


def reconcile(
    source: DataFrame,
    sink: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC completeness check: per-PK full outer join of source vs
    sink, classifying each key as ok / missing (in source only) /
    extra (in sink only) / mismatch (both present, compared columns
    differ). Returns one summary row per status.

    The reference trusts write-then-commit ordering for correctness
    (/root/reference/writers/writer.go:44-50) and has no audit tool;
    at warehouse scale you verify the pipe instead of trusting it.
    Comparison hashes the compared columns to one 128-bit value per
    side BEFORE the join, so the shuffle carries (pk, hash) only —
    never the full row width."""
    return (
        reconcile_keys(source, sink, pk_cols, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def reconcile_keys(
    source: DataFrame,
    sink: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key reconcile classification (the frame `reconcile`
    summarizes): one row per PK with status ok / missing / extra /
    mismatch. Hashing happens BEFORE the join so the shuffle carries
    (pk, hash) only — never the full row width."""
    compare_cols = compare_cols or [
        c for c in source.columns if c not in pk_cols
    ]

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        # concat_ws SKIPS nulls, which would make ("a", NULL) and
        # (NULL, "a") hash equal — coalesce each column to an
        # unambiguous sentinel first so null position is preserved.
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>"))
            for c in compare_cols
        ]
        return df.select(
            *[F.col(c) for c in pk_cols],
            F.md5(F.concat_ws("\x1f", *parts)).alias(f"__h_{tag}"),
        )

    s = hashed(source, "src")
    t = hashed(sink, "snk")
    joined = s.join(t, pk_cols, "full_outer")
    status = (
        F.when(F.col("__h_src").isNull(), F.lit("extra"))
        .when(F.col("__h_snk").isNull(), F.lit("missing"))
        .when(F.col("__h_src") == F.col("__h_snk"), F.lit("ok"))
        .otherwise(F.lit("mismatch"))
    )
    return joined.select(*pk_cols, status.alias("status"))


def reconcile_repair(
    writer: "TransferWriter",
    table: str,
    source: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
    n_buckets: int = 64,
) -> dict[str, int]:
    """Anti-entropy REPAIR: apply the reconcile verdict instead of
    just reporting it — missing/mismatched keys upsert their source
    row, extra keys delete, ok keys are untouched (and their buckets
    never rewrite: the change set is exactly the divergent keys, so
    `upsert_bucketed`'s touched-bucket economics bound the repair to
    the damage, not the table). The divergence census is returned so
    operators can log WHAT was repaired; a follow-up `reconcile` run
    reads all-ok by construction. The reference trusts
    write-then-commit and has no repair verb (writer.go:44-50) — at
    warehouse scale you verify the pipe AND heal it."""
    sink = writer.read(table)
    # the full-outer classification is consumed three times (census,
    # upsert side, delete side) — persist it so the (pk, hash) join
    # runs once, not per consumer (measured 12.3 s -> one join's
    # worth on the 2M-row probe, scripts/probe_repair.py)
    keys = reconcile_keys(source, sink, pk_cols, compare_cols).persist()
    try:
        counts = {
            r["status"]: r["n"]
            for r in keys.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if set(counts) <= {"ok"}:
            return counts  # healthy: no damage, nothing to write
        bad = keys.filter(
            F.col("status").isin("missing", "mismatch")
        ).select(*pk_cols)
        ups = source.join(bad, pk_cols, "left_semi").select(
            *source.columns,
            F.lit("c").alias("op"),
            F.lit(1).alias("__repair_seq"),
        )
        dels = (
            keys.filter(F.col("status") == "extra")
            .select(
                *pk_cols,
                *[
                    F.lit(None).cast(dict(source.dtypes)[c]).alias(c)
                    for c in source.columns
                    if c not in pk_cols
                ],
                F.lit("d").alias("op"),
                F.lit(1).alias("__repair_seq"),
            )
        )
        changes = ups.unionByName(dels)
        writer.upsert_bucketed(
            table, changes, pk_cols, "__repair_seq", n_buckets=n_buckets
        )
    finally:
        keys.unpersist()
    return counts


def table_diff(
    writer: "TransferWriter",
    table: str,
    version_old: int,
    pk_cols: list[str],
    version_new: int | None = None,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Time-travel diff between two retained snapshots of a transfer
    table: one row per key that changed — status added / removed /
    changed (unchanged keys are filtered out, so the result is
    delta-sized). `version_new=None` diffs the retained snapshot
    against the LIVE state — "what did the pipeline do since I
    pinned this version", the audit a training run asks before
    re-reading a pinned dataset. Same (pk, hash)-only shuffle as
    `reconcile`; the snapshots never join row-to-row at full width."""
    old = writer.read(table, version=version_old)
    new = (
        writer.read(table)
        if version_new is None
        else writer.read(table, version=version_new)
    )
    # `bucket` is layout, not data: comparing it would flag every key
    # as changed after an n_buckets change between versions
    compare_cols = compare_cols or [
        c for c in new.columns if c not in pk_cols and c != "bucket"
    ]
    keys = reconcile_keys(new, old, pk_cols, compare_cols)
    status = (
        F.when(F.col("status") == "missing", F.lit("added"))
        .when(F.col("status") == "extra", F.lit("removed"))
        .when(F.col("status") == "mismatch", F.lit("changed"))
    )
    return keys.filter(F.col("status") != "ok").select(
        *pk_cols, status.alias("status")
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    epoch: int = 0,
    id_col: str = "doc_id",
) -> dict:
    """Materialize an epoch's training shards: the deterministic
    epoch_shuffle assignment, written as parquet partitioned by
    shard, rows ordered by their in-shard position — the layout a
    sequential data loader streams without any further shuffling.

    Scale shape: `repartition(n_shards, shard)` puts each shard's
    rows on one writer task; `sortWithinPartitions(shard, pos)` is a
    PER-PARTITION sort (never a global orderBy — no single-partition
    exchange, no range-exchange sampling pass); partitionBy("shard")
    then writes one directory per shard. n_shards is chosen so a
    shard is a few GB; `maxRecordsPerFile` caps file size within a
    shard. Returns a tiny manifest dict (driver-side, bounded by
    n_shards) for the job log.
    """
    from reader_spark.operators.curation import epoch_shuffle

    assigned = epoch_shuffle(docs, n_shards=n_shards, epoch=epoch, id_col=id_col)
    rows = docs.join(assigned, id_col)
    (
        rows.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = docs.sparkSession
    from pyspark.errors import AnalysisException

    try:
        manifest = (
            spark.read.parquet(out_dir)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .collect()
        )
    except AnalysisException as e:
        # an EMPTY wave (e.g. fully screened by the seen-set gate)
        # writes a dir with no parquet footers — schema inference
        # then raises. Zero shards is a legitimate result, not a
        # failed job. ONLY that shape maps to {}: any other failure
        # (permissions, a corrupt footer, lost executor) must
        # surface — an empty manifest for a wave that DID ship would
        # read downstream as "nothing written".
        if "UNABLE_TO_INFER_SCHEMA" in str(e):
            return {}
        raise
    return {int(r["shard"]): int(r["n_docs"]) for r in manifest}


def scd2_current(history: DataFrame) -> DataFrame:
    """The live snapshot of an SCD2 table: the one open interval per
    key (eff_to NULL). Partition-prunable at scale if the sink
    partitions on an is_current derivative."""
    return history.filter(F.col("eff_to").isNull()).drop("eff_to")


def scd2_as_of(history: DataFrame, seq: int) -> DataFrame:
    """Point-in-time read of an SCD2 table: the version valid at
    `seq` — eff_from <= seq < eff_to (open intervals extend to
    infinity). The time-travel SELECT the history-preserving load
    exists for; at most one row per key by the interval invariants
    (property-asserted in test_properties.py)."""
    return history.filter(
        (F.col("eff_from") <= seq)
        & (F.col("eff_to").isNull() | (F.col("eff_to") > seq))
    )
