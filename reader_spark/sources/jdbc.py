"""JDBC snapshot source planning (reference §2.1 S1-S8).

The reference runs sequential keyset pagination per table
(lib/rdbms/scan/scan.go:43-161) with per-dialect query builders
(lib/postgres/scanner.go:160-197, lib/mysql/scanner/scanner.go:128-164,
lib/mssql/scanner.go:135-180). Spark-first: ONE partitioned JDBC read
— numeric single-column PKs use Spark's built-in range partitioning;
composite or non-numeric PKs get generated `predicates=` (one WHERE
clause per partition, union == table, pairwise disjoint).

No live database exists in the test container, so these builders are
exercised by asserting the SQL/options they produce (the reference
tests its scanners the same way — scanner_test.go) and the partition
semantics are validated against parquet-backed DataFrames in
tests/test_snapshot_plan.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Dialect:
    name: str
    quote: str  # identifier quote char

    def q(self, ident: str) -> str:
        return f"{self.quote}{ident}{self.quote}"


POSTGRES = Dialect("postgres", '"')
MYSQL = Dialect("mysql", "`")
MSSQL = Dialect("mssql", '"')


@dataclass
class TableRef:
    schema: str
    table: str
    pk_cols: list[str] = field(default_factory=list)

    def fqn(self, d: Dialect) -> str:
        return f"{d.q(self.schema)}.{d.q(self.table)}"


def bounds_query(t: TableRef, d: Dialect) -> str:
    """S2 probe: pushed-down min/max of the leading PK (the reference
    issues ORDER BY ... LIMIT 1 twice — schema.go:249-315; one
    aggregate round-trip is cheaper)."""
    pk = d.q(t.pk_cols[0])
    return (
        f"SELECT min({pk}) AS min_pk, max({pk}) AS max_pk FROM {t.fqn(d)}"
    )


def jdbc_read_options(
    t: TableRef,
    d: Dialect,
    url: str,
    min_pk: int,
    max_pk: int,
    num_partitions: int = 32,
    fetch_size: int = 5_000,
) -> dict[str, str]:
    """Options for spark.read.format("jdbc") — numeric-PK fast path.

    fetch_size mirrors the reference's 5000-row scan batches
    (constants/constants.go:4) but rows stream per-partition instead
    of per sequential chunk."""
    return {
        "url": url,
        "dbtable": t.fqn(d),
        "partitionColumn": t.pk_cols[0],
        "lowerBound": str(min_pk),
        "upperBound": str(max_pk),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }


def composite_pk_predicates(
    boundaries: list[tuple],
    pk_cols: list[str],
    d: Dialect,
) -> list[str]:
    """Composite/non-numeric PK path: row-tuple comparison predicates
    mirroring the reference's keyset WHERE (a,b) > (?,?) AND
    (a,b) <= (?,?) (postgres scanner.go:160-197), but emitted as a
    STATIC disjoint partition list for `jdbc(predicates=)`.

    `boundaries` are N-1 sorted split tuples (sampled from the source
    or a previous snapshot); output has N predicates covering
    (-inf, b0], (b0, b1], ..., (b_{n-1}, +inf).
    """
    cols = "(" + ", ".join(d.q(c) for c in pk_cols) + ")"

    def tup(vals: tuple) -> str:
        parts = []
        for v in vals:
            if isinstance(v, str):
                parts.append("'" + v.replace("'", "''") + "'")
            elif isinstance(v, bool):
                parts.append("TRUE" if v else "FALSE")
            else:
                parts.append(str(v))
        return "(" + ", ".join(parts) + ")"

    if not boundaries:
        return ["1=1"]
    preds = [f"{cols} <= {tup(boundaries[0])}"]
    for lo, hi in zip(boundaries, boundaries[1:]):
        preds.append(f"{cols} > {tup(lo)} AND {cols} <= {tup(hi)}")
    preds.append(f"{cols} > {tup(boundaries[-1])}")
    return preds


# Catalog queries pushed to the source DB (S6/S7/S8). These stay SQL
# strings executed via the JDBC `query` option; Spark-side schema comes
# from the JDBC type mapping, while PK + scale/precision come from here.
PK_QUERY = {
    "postgres": (
        "SELECT a.attname FROM pg_index i "
        "JOIN pg_attribute a ON a.attrelid = i.indrelid "
        "AND a.attnum = ANY(i.indkey) "
        "WHERE i.indrelid = '{schema}.{table}'::regclass AND i.indisprimary"
    ),
    "mysql": (
        "SELECT column_name FROM information_schema.key_column_usage "
        "WHERE table_schema = '{schema}' AND table_name = '{table}' "
        "AND constraint_name = 'PRIMARY' ORDER BY ordinal_position"
    ),
    "mssql": (
        "SELECT kcu.column_name FROM "
        "information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "ON tc.constraint_name = kcu.constraint_name "
        "WHERE tc.constraint_type = 'PRIMARY KEY' "
        "AND tc.table_schema = '{schema}' AND tc.table_name = '{table}'"
    ),
}

# S8 streaming-bootstrap table listing (the reference's
# `SHOW FULL TABLES ... BASE TABLE`, lib/mysql/schema/schema.go:73-95)
# expressed as portable information_schema reads.
LIST_TABLES_QUERY = {
    "postgres": (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = '{schema}' AND table_type = 'BASE TABLE' "
        "ORDER BY table_name"
    ),
    "mysql": (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = '{schema}' AND table_type = 'BASE TABLE' "
        "ORDER BY table_name"
    ),
    "mssql": (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = '{schema}' AND table_type = 'BASE TABLE' "
        "ORDER BY table_name"
    ),
}

COLUMNS_QUERY = {
    "postgres": (
        "SELECT column_name, data_type, numeric_precision, numeric_scale, "
        "udt_name FROM information_schema.columns "
        "WHERE table_schema = '{schema}' AND table_name = '{table}' "
        "ORDER BY ordinal_position"
    ),
    "mysql": (
        "SELECT column_name, column_type, numeric_precision, numeric_scale "
        "FROM information_schema.columns "
        "WHERE table_schema = '{schema}' AND table_name = '{table}' "
        "ORDER BY ordinal_position"
    ),
    "mssql": (
        "SELECT column_name, data_type, numeric_precision, numeric_scale, "
        "datetime_precision FROM information_schema.columns "
        "WHERE table_schema = '{schema}' AND table_name = '{table}' "
        "ORDER BY ordinal_position"
    ),
}
