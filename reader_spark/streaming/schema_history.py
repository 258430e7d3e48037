"""Schema-history log + as-of resolution (reference C5, §2.7).

The reference ANTLR-parses MySQL DDL, applies it to in-memory
per-table schema adapters, persists a JSONL history, and drops DML
events older than the current schema version
(sources/mysql/streaming/ddl/ddl.go:42-217, table_adapter.go:38-147,
dml.go:44-52). `MostRecentMap` binary-searches timestamped versions
(lib/maputil/most_recent_map.go:14-76).

Spark-first: the history is a small timestamped table; picking "the
schema active at an event's timestamp" is an AS-OF JOIN — broadcast
the history, window-max over versions with ts <= event_ts. DDL is
parsed by a lexical layer (comment stripping, quote-aware splitting,
quoted-identifier round-trip — the guarantees the reference gets from
its generated ANTLR lexer) plus the per-spec regex dispatcher below,
covering the statement shapes the reference's grammar extracts from
(CREATE / CREATE ... LIKE / DROP / RENAME TABLE; ALTER specs ADD /
DROP / RENAME / MODIFY / CHANGE incl. FIRST/AFTER positions —
alter_table.go:19-93, create_table.go:106-122):
parsing tech is an implementation detail, the event semantics are
the spec."""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


# ---------------------------------------------------------------------------
# Lexical layer. The reference gets string/comment/identifier handling
# for free from its generated ANTLR lexer (lib/antlr/parse.go:40-111);
# a regex dispatcher has to supply the same three guarantees by hand:
#
#   1. comments never reach the shape rules (`/* gh-ost */ ALTER ...`,
#      trailing `-- migration` / `# note` lines; MySQL executable
#      version comments `/*!40605 ... */` contribute their BODY),
#   2. commas/parens inside string literals never split a column list
#      or an ALTER spec list (`DEFAULT 'a,b'`, `COMMENT 'x (y), z'`,
#      doubled '' and backslash escapes included),
#   3. quoted identifiers round-trip, including embedded spaces and
#      doubled backticks (`my col`, `odd``name`).
#
# Everything below the lexical layer (the shape rules) stays regex —
# parsing tech is an implementation detail, the event semantics are
# the spec.


def _strip_comments(sql: str) -> str:
    """Remove comments, quote-aware. `/*! ... */` (MySQL executable
    version comments) keep their body — the server runs it, so must
    the registry. `--` needs trailing whitespace/EOL per MySQL; `#`
    runs to end of line. String literals pass through untouched."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if sql[j] == "\\" and ch != "`" and j + 1 < n:
                    j += 2
                    continue
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:  # doubled quote
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            out.append(sql[i:j])
            i = j
        elif sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            end = n if end < 0 else end
            body = sql[i + 2 : end]
            if body.startswith("!"):
                # executable version comment: keep the body minus the
                # optional 5-6 digit version prefix
                out.append(re.sub(r"^!\d*", "", body))
            else:
                out.append(" ")
            i = end + 2 if end < n else n
        elif sql.startswith("--", i) and (
            i + 2 >= n or sql[i + 2] in " \t\n"
        ):
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl
        elif ch == "#":
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren depth 0 that are OUTSIDE string
    literals and quoted identifiers — the column-list / spec-list
    separator. Replaces bare paren counting, which a `DEFAULT 'a,b'`
    or `COMMENT '(y)'` literal silently corrupts."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if s[j] == "\\" and ch != "`" and j + 1 < n:
                    j += 2
                    continue
                if s[j] == ch:
                    if j + 1 < n and s[j + 1] == ch:
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            buf.append(s[i:j])
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


# One identifier, possibly quoted: backticks may embed spaces and
# doubled backticks (MySQL), double quotes per ANSI_QUOTES mode.
_IDENT = r"(?:`(?:[^`]|``)+`|\"[^\"]+\"|\w+)"


def _unquote(ident: str) -> str:
    """Strip one layer of identifier quoting, undoubling the quote
    char (`odd``name` -> odd`name)."""
    if len(ident) >= 2 and ident[0] == ident[-1] and ident[0] in "`\"":
        q = ident[0]
        return ident[1:-1].replace(q + q, q)
    return ident


def _first_identifier(s: str) -> str:
    """The leading identifier of a column definition, unquoted —
    `.split()[0]` breaks on quoted names with spaces."""
    m = re.match(r"\s*(" + _IDENT + ")", s)
    return _unquote(m.group(1)) if m else ""


# Debezium-derived DDL skip-list (converter.go:17-40): transaction
# markers, RDS heartbeats, savepoints — never schema-relevant.
DDL_SKIP_RE = re.compile(
    r"^\s*(BEGIN|COMMIT|ROLLBACK|SAVEPOINT|RELEASE\s+SAVEPOINT"
    r"|INSERT\s+INTO\s+mysql\.rds_heartbeat2|FLUSH\s+|GRANT\s+|REVOKE\s+)",
    re.IGNORECASE,
)

# Database qualifiers are CAPTURED everywhere a table can be named:
# a statement naming a different database than the replicated one
# must be a no-op on this registry (the reference drops events for
# non-replicated schemas — ShouldReplicate,
# sources/mysql/streaming/dml.go:24-40). `ALTER TABLE otherdb.users
# DROP COLUMN c` corrupting the replicated `app.users` column list
# would poison every later positional binlog decode.
_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    rf"(?:(?P<db>{_IDENT})\s*\.\s*)?(?P<tbl>{_IDENT})"
    r"\s*\((?P<cols>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# CREATE TABLE new LIKE src — the clone DDL (CopyTableEvent,
# lib/antlr/types.go:75-88, create_table.go:106-122). MySQL accepts
# both the bare and the parenthesized form; names may be db-qualified.
# MUST be tested before _CREATE_RE: "CREATE TABLE t (LIKE s)" also
# matches the column-list shape and would mis-parse as a column "LIKE".
_CREATE_LIKE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    rf"(?:(?P<db>{_IDENT})\s*\.\s*)?(?P<tbl>{_IDENT})\s*"
    rf"\(?\s*LIKE\s+(?:(?P<sdb>{_IDENT})\s*\.\s*)?"
    rf"(?P<src>{_IDENT})\s*\)?\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?:(?P<db>{_IDENT})\s*\.\s*)?"
    rf"(?P<tbl>{_IDENT})\s+(?P<specs>.*)$",
    re.IGNORECASE | re.DOTALL,
)
# Per-spec patterns (an ALTER TABLE carries comma-separated specs; the
# reference iterates AllAlterSpecification — alter_table.go:19-93).
_ADD_SPEC_RE = re.compile(
    rf"^ADD\s+(?:COLUMN\s+)?({_IDENT})\s+(.+)$", re.IGNORECASE | re.DOTALL
)
# ADD [COLUMN] (a INT, b TEXT, ...) — the parenthesized multi-column
# form; columns append in list order.
_ADD_MULTI_SPEC_RE = re.compile(
    r"^ADD\s+(?:COLUMN\s+)?\((.+)\)$", re.IGNORECASE | re.DOTALL
)
# Schema-NEUTRAL specs: they don't change the column name list or
# positions, so binlog positional decode is unaffected — recognized
# (not quarantined) but not a schema mutation. Checked BEFORE the
# ADD/DROP column rules: "ADD INDEX idx (c)" would otherwise
# misparse as adding a column named "INDEX".
_NEUTRAL_SPEC_RE = re.compile(
    r"^(?:"
    r"ADD\s+(?:UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?(?:INDEX|KEY)\b.*"
    r"|ADD\s+(?:CONSTRAINT|PRIMARY\s+KEY|FOREIGN\s+KEY|UNIQUE|CHECK)\b.*"
    r"|DROP\s+(?:INDEX|KEY|CONSTRAINT|CHECK)\b\s+\S.*"
    r"|DROP\s+PRIMARY\s+KEY\s*"
    r"|DROP\s+FOREIGN\s+KEY\b.*"
    r"|RENAME\s+(?:INDEX|KEY)\b.*"
    rf"|ALTER\s+(?:COLUMN\s+)?{_IDENT}\s+"
    r"(?:SET\s+DEFAULT|DROP\s+DEFAULT)\b.*"
    r"|ENGINE\s*=?\s*\S.*|AUTO_INCREMENT\s*=?\s*\S.*"
    r"|COMMENT\s*=?\s*\S.*|ROW_FORMAT\s*=?\s*\S.*"
    r"|(?:DEFAULT\s+)?(?:CHARACTER\s+SET|CHARSET)\b.*|COLLATE\b.*"
    r"|ALGORITHM\s*=?\s*\S.*|LOCK\s*=?\s*\S.*|ORDER\s+BY\b.*"
    r"|FORCE\s*"
    r")$",
    re.IGNORECASE | re.DOTALL,
)
# CONVERT TO CHARACTER SET retypes every text column in place: names
# and positions survive, but rows decoded under the old charset are
# not comparable — a new history version must be cut (the same
# reasoning as a bare MODIFY type change).
_CONVERT_SPEC_RE = re.compile(
    r"^CONVERT\s+TO\s+(?:CHARACTER\s+SET|CHARSET)\b", re.IGNORECASE
)
# ALTER TABLE t RENAME [TO|AS] new — the spec-form table rename.
_RENAME_TABLE_SPEC_RE = re.compile(
    rf"^RENAME\s+(?:TO\s+|AS\s+)?({_IDENT})\s*$", re.IGNORECASE
)
_DROP_SPEC_RE = re.compile(
    rf"^DROP\s+(?:COLUMN\s+)?({_IDENT})\s*$", re.IGNORECASE
)
_RENAME_SPEC_RE = re.compile(
    rf"^RENAME\s+(?:COLUMN\s+)?({_IDENT})\s+TO\s+({_IDENT})\s*$",
    re.IGNORECASE,
)
# MODIFY col <type> [FIRST | AFTER other]: type change + optional
# reposition (AlterByModifyColumnContext, alter_table.go:53-61).
_MODIFY_SPEC_RE = re.compile(
    rf"^MODIFY\s+(?:COLUMN\s+)?({_IDENT})\s+(.+)$", re.IGNORECASE | re.DOTALL
)
# CHANGE old new <type> [FIRST | AFTER other]: rename + type change +
# optional reposition (AlterByChangeColumnContext, alter_table.go:198-217).
_CHANGE_SPEC_RE = re.compile(
    rf"^CHANGE\s+(?:COLUMN\s+)?({_IDENT})\s+({_IDENT})\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
# Trailing position marker inside a column definition (FirstPosition /
# AfterPosition, ddl.go:170-204).
_POS_RE = re.compile(
    rf"\b(?:(FIRST)|AFTER\s+({_IDENT}))\s*$", re.IGNORECASE
)
_RENAME_TABLE_RE = re.compile(
    r"^\s*RENAME\s+TABLE\s+(.+)$", re.IGNORECASE | re.DOTALL
)
# one `old TO new` link of a (possibly multi-table) RENAME chain —
# MySQL executes the pairs left to right in one atomic statement
# (RenameTableContext covers the full list in the reference grammar)
_RENAME_PAIR_RE = re.compile(
    rf"(?:(?P<odb>{_IDENT})\s*\.\s*)?(?P<old>{_IDENT})\s+TO\s+"
    rf"(?:(?P<ndb>{_IDENT})\s*\.\s*)?(?P<new>{_IDENT})",
    re.IGNORECASE,
)
_DROP_TABLE_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(.+)$", re.IGNORECASE | re.DOTALL
)
# one name of a (possibly multi-table) DROP list, optionally
# db-qualified — MySQL's `DROP TABLE a, b` drops every listed table
_DROP_NAME_RE = re.compile(
    rf"(?:(?P<db>{_IDENT})\s*\.\s*)?(?P<tbl>{_IDENT})",
    re.IGNORECASE,
)
# TRUNCATE [TABLE] t — a DATA operation, not a schema mutation: the
# column registry is untouched, but the destination must clear its
# rows (the reference's transfer truncate verb,
# writers/transfer/writer.go:310-327). The dispatcher queues it on
# `SchemaAdapter.truncates` for the merge pipeline to drain, the same
# drain-per-batch contract as `unmatched`.
_TRUNCATE_RE = re.compile(
    rf"^\s*TRUNCATE\s+(?:TABLE\s+)?"
    rf"(?:(?P<db>{_IDENT})\s*\.\s*)?(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)


@dataclass
class SchemaAdapter:
    """Per-database column registry with replayable JSONL history —
    the Spark-side analogue of ddl/table_adapter.go:38-147.

    State lives on the driver (it is plan metadata, not data): at
    execution time the history becomes a broadcast as-of table."""

    tables: dict[str, list[str]] = field(default_factory=dict)
    history: list[dict] = field(default_factory=list)
    # The database this registry mirrors. When set, DDL whose table
    # names carry a qualifier for a DIFFERENT database is a no-op
    # (the reference's ShouldReplicate gate, dml.go:24-40); None
    # keeps the permissive single-database behavior for callers that
    # pre-filter.
    database: str | None = None
    # DDL statements against a REPLICATED table that matched no
    # dispatcher rule (e.g. `ALTER TABLE t PARTITION BY ...`,
    # `ALTER TABLE t CONVERT TO CHARACTER SET ...`). The reference's
    # full grammar cannot silently miss these
    # (/root/reference/lib/antlr/parse.go:40-111); the regex
    # dispatcher records them here so the CDC plan can quarantine
    # them with their position instead of silently no-opping — a
    # missed schema mutation corrupts every later positional decode.
    unmatched: list[dict] = field(default_factory=list)
    # TRUNCATE TABLE statements against a REPLICATED table, queued for
    # the merge pipeline to apply as the transfer truncate verb
    # (writer.go:310-327): each entry carries the log position (`seq`)
    # so in-batch DML BEFORE the truncate can be discarded and DML
    # AFTER it still applies. NOT recorded in `history` — replaying
    # the schema history must never re-truncate a destination that
    # has since accumulated rows.
    truncates: list[dict] = field(default_factory=list)

    def _foreign(self, qualifier: str | None) -> bool:
        """A db qualifier names a different database than the one
        this registry mirrors (only decidable when both are known)."""
        return (
            qualifier is not None
            and self.database is not None
            and qualifier != self.database
        )

    def apply_ddl(
        self, statement: str, unix_ts: int, seq: int | None = None
    ) -> bool:
        """Returns True if the statement mutated the schema.

        Statements whose table names are qualified with a database
        other than `self.database` never mutate the registry — they
        belong to a schema this pipeline does not replicate
        (ShouldReplicate, sources/mysql/streaming/dml.go:24-40).

        Comments are stripped first (quote-aware; executable version
        comments keep their body) so migration-tool chatter
        (`/* gh-ost */`, trailing `-- ...`) never reaches the shape
        rules."""
        original = statement
        statement = _strip_comments(statement)
        if DDL_SKIP_RE.search(statement):
            return False
        m = _TRUNCATE_RE.match(statement)
        if m:
            # data op, not a schema mutation: columns unchanged, no
            # history version cut. Queue the destination-clear for a
            # replicated table; TRUNCATE of an unknown/foreign table
            # is irrelevant here (same convention as DROP of one).
            if not self._foreign(
                _unquote(m.group("db") or "") or None
            ) and _unquote(m.group("tbl")) in self.tables:
                self.truncates.append(
                    {
                        "unix_ts": unix_ts,
                        "table": _unquote(m.group("tbl")),
                        "seq": -1 if seq is None else int(seq),
                    }
                )
            return False
        m = _CREATE_LIKE_RE.match(statement)
        if m:
            if self._foreign(_unquote(m.group("db") or "") or None):
                return False
            src = _unquote(m.group("src"))
            # Clone the source table's column list (the reference
            # errors on an unknown source — ddl.go:79-91; the
            # dispatcher's tolerant convention is to not mutate). A
            # source in another database is equally unknown here.
            if (
                self._foreign(_unquote(m.group("sdb") or "") or None)
                or src not in self.tables
            ):
                return False
            self.tables[_unquote(m.group("tbl"))] = list(self.tables[src])
            self._record(unix_ts, original)
            return True
        m = _CREATE_RE.match(statement)
        if m:
            if self._foreign(_unquote(m.group("db") or "") or None):
                return False
            cols = []
            for part in _split_top_level(m.group("cols")):
                part = part.strip()
                if not part:
                    continue
                name = _first_identifier(part)
                if name and name.upper() not in (
                    "PRIMARY", "UNIQUE", "KEY", "CONSTRAINT", "INDEX", "FOREIGN",
                ):
                    cols.append(name)
            self.tables[_unquote(m.group("tbl"))] = cols
            self._record(unix_ts, original)
            return True
        m = _ALTER_RE.match(statement)
        if m:
            if self._foreign(_unquote(m.group("db") or "") or None):
                return False
            tbl = _unquote(m.group("tbl"))
            if tbl not in self.tables:
                return False
            mutated, unrecognized = self._apply_alter_specs(
                tbl, m.group("specs")
            )
            if unrecognized:
                self.unmatched.append(
                    {
                        "unix_ts": unix_ts,
                        "statement": original,
                        "table": tbl,
                        "reason": "unrecognized ALTER spec(s): "
                        + "; ".join(unrecognized),
                    }
                )
            if mutated:
                self._record(unix_ts, original)
                return True
            return False
        m = _RENAME_TABLE_RE.match(statement)
        if m:
            # apply EVERY pair of a multi-table chain left to right
            # (MySQL semantics: `RENAME TABLE a TO tmp, b TO a, tmp
            # TO b` swaps a and b atomically)
            mutated = False
            for pm in _RENAME_PAIR_RE.finditer(m.group(1)):
                if self._foreign(_unquote(pm.group("odb") or "") or None):
                    continue
                old = _unquote(pm.group("old"))
                if old not in self.tables:
                    continue
                if self._foreign(_unquote(pm.group("ndb") or "") or None):
                    # renamed OUT of the replicated database: the
                    # table leaves this registry
                    del self.tables[old]
                else:
                    self.tables[_unquote(pm.group("new"))] = self.tables.pop(old)
                mutated = True
            if mutated:
                self._record(unix_ts, original)
                return True
            return False
        m = _DROP_TABLE_RE.match(statement)
        if m:
            mutated = False
            for part in _split_top_level(m.group(1)):
                nm = _DROP_NAME_RE.search(part.strip().rstrip(";"))
                if not nm:
                    continue
                tbl = _unquote(nm.group("tbl"))
                if (
                    not self._foreign(_unquote(nm.group("db") or "") or None)
                    and tbl in self.tables
                ):
                    del self.tables[tbl]
                    mutated = True
            if mutated:
                self._record(unix_ts, original)
                return True
            return False
        return False

    def _apply_alter_specs(
        self, table: str, specs: str
    ) -> tuple[bool, list[str]]:
        """Apply an ALTER TABLE's comma-separated spec list to the
        column registry. Column ORDER is part of the state — binlog row
        images are positional, so FIRST / AFTER repositioning changes
        how every later DML decodes (ddl.go:170-204). A bare MODIFY
        (type-only change) keeps the name list identical but still
        counts as a schema mutation: the type change means rows decoded
        under the old version are not comparable, so a new history
        version must be cut.

        Returns (mutated, unrecognized_specs). A spec that matched a
        rule but was an idempotent no-op (ADD of an existing column on
        replay, DROP of a missing one) is NOT unrecognized; a spec
        matching NO rule (PARTITION BY, CONVERT TO CHARACTER SET,
        engine/option clauses that can still reorder storage) is —
        callers quarantine those."""
        cols = self.tables[table]
        mutated = False
        unrecognized: list[str] = []
        # split on top-level commas only — types like decimal(10,2)
        # carry commas inside parens, and DEFAULT/COMMENT string
        # literals may carry commas AND unbalanced parens, so the
        # split must be quote-aware (_split_top_level)
        parts = _split_top_level(specs)
        for spec in (p.strip().rstrip(";").strip() for p in parts):
            if not spec:
                continue
            if _NEUTRAL_SPEC_RE.match(spec):
                continue  # recognized, schema-neutral: no new version
            if _CONVERT_SPEC_RE.match(spec):
                mutated = True  # retype-in-place: version cut, same cols
            elif sm := _ADD_MULTI_SPEC_RE.match(spec):
                for d in _split_top_level(sm.group(1)):
                    name = _first_identifier(d)
                    if name and name not in cols:
                        cols.append(name)
                        mutated = True
            elif sm := _RENAME_TABLE_SPEC_RE.match(spec):
                new = _unquote(sm.group(1))
                if new != table:
                    self.tables[new] = self.tables.pop(table)
                    table = new
                    cols = self.tables[table]
                    mutated = True
            elif sm := _ADD_SPEC_RE.match(spec):
                name, tail = _unquote(sm.group(1)), sm.group(2)
                if name not in cols:
                    cols.append(name)
                    self._reposition(cols, name, tail)
                    mutated = True
            elif sm := _DROP_SPEC_RE.match(spec):
                if _unquote(sm.group(1)) in cols:
                    cols.remove(_unquote(sm.group(1)))
                    mutated = True
            elif sm := _RENAME_SPEC_RE.match(spec):
                old, new = _unquote(sm.group(1)), _unquote(sm.group(2))
                if old in cols:
                    cols[cols.index(old)] = new
                    mutated = True
            elif sm := _CHANGE_SPEC_RE.match(spec):
                old, new, tail = (
                    _unquote(sm.group(1)),
                    _unquote(sm.group(2)),
                    sm.group(3),
                )
                if old in cols:
                    cols[cols.index(old)] = new
                    self._reposition(cols, new, tail)
                    mutated = True
            elif sm := _MODIFY_SPEC_RE.match(spec):
                name, tail = _unquote(sm.group(1)), sm.group(2)
                if name in cols:
                    self._reposition(cols, name, tail)
                    mutated = True  # type change: new version regardless
            else:
                unrecognized.append(spec)
        return mutated, unrecognized

    @staticmethod
    def _reposition(cols: list[str], name: str, definition_tail: str) -> None:
        pm = _POS_RE.search(definition_tail)
        if not pm:
            return
        cols.remove(name)
        if pm.group(1):  # FIRST
            cols.insert(0, name)
        else:  # AFTER <col>
            target = _unquote(pm.group(2))
            if target in cols:
                cols.insert(cols.index(target) + 1, name)
            else:
                cols.append(name)

    def _record(self, unix_ts: int, statement: str) -> None:
        self.history.append(
            {"unix_ts": unix_ts, "statement": statement,
             "tables": {k: list(v) for k, v in self.tables.items()}}
        )

    # -- persistence (JSONL, replayable on boot — iterator.go:26-70) --

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            for rec in self.history:
                f.write(json.dumps(rec) + "\n")

    @classmethod
    def replay(cls, path: str) -> "SchemaAdapter":
        sa = cls()
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                sa.history.append(rec)
                sa.tables = {k: list(v) for k, v in rec["tables"].items()}
        return sa


def asof_schema_version(events: DataFrame, history: DataFrame,
                        event_id_col: str,
                        event_ts: str = "ts_ms",
                        version_ts: str = "unix_ts") -> DataFrame:
    """Attach the schema version active at each event's timestamp —
    max(version_ts) <= event_ts, the reference's MostRecentMap lookup
    (most_recent_map.go:14-76) as a broadcast range join.

    Events strictly older than the FIRST schema version get NULL
    version (callers drop them — dml.go:44-52). History is tiny:
    broadcast non-equi join, then a per-event-id window keeps the
    latest qualifying version; the event stream shuffles once on the
    event id."""
    stmt = (
        F.col("statement") if "statement" in history.columns else F.lit(None)
    )
    h = history.select(
        F.col(version_ts).alias("__vts"), stmt.alias("__stmt")
    )
    joined = events.join(
        F.broadcast(h), F.col("__vts") <= F.col(event_ts), "left"
    )
    w = W.partitionBy(event_id_col).orderBy(F.col("__vts").desc_nulls_last())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__vts", "schema_version_ts")
        .withColumnRenamed("__stmt", "schema_statement")
    )
