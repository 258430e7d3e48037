"""Local simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (or $SF_DIR)
and compares against ``oracle_sql()`` via DuckDB: row count, column
names (sorted), and order-insensitive value equality (stricter than
the driver's hash — exact sorted-row comparison with small float
tolerance reporting so we can see HOW far off a float is).

Usage: python scripts/check.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from reader_spark.session import get_spark, load_tables  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows), key=repr
    ), [cols[i] for i in order]


def spark_kind(dt) -> str:
    """Collapse a Spark dtype to 'i' (integer), 'f' (float), or 'o'."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if s in ("float", "double"):
        return "f"
    return "o"


def dtype_mismatches(sdf, duck_df):
    """int-vs-float disagreements between the Spark schema and DuckDB's
    fetchdf() dtypes — the class behind every driver red since r4
    (HUGEINT aggregates -> float64). A duck float column WITH NaNs is
    pandas null-promotion and exempt (the driver sees the same
    promotion on the Spark side for nullable ints)."""
    duck_by_name = {c.lower(): c for c in duck_df.columns}
    bad = []
    for f in sdf.schema.fields:
        dc = duck_by_name.get(f.name.lower())
        if dc is None:
            continue
        sk = spark_kind(f.dataType)
        k = duck_df[dc].dtype.kind
        dk = "i" if k in ("i", "u") else ("f" if k == "f" else "o")
        if sk == "i" and dk == "f" and not duck_df[dc].isna().any():
            bad.append(f"{f.name}: spark int vs duck float (no nulls)")
        elif sk == "f" and dk == "i":
            bad.append(f"{f.name}: spark float vs duck int")
    return bad


def approx_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(approx_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark("check")
    load_tables(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # paired unpersist for everything the query pin()ed
            from reader_spark.cache import release_pins

            release_pins()
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sk, scols_sorted = rows_key(srows, scols)
        dk, dcols_sorted = rows_key(drows, dcols)
        ok = True
        if [c.lower() for c in scols_sorted] != [c.lower() for c in dcols_sorted]:
            # short-circuit: every later comparison assumes aligned
            # column sets (rows_key sorts values by column name), so
            # rowcount/value checks over mismatched sets would emit
            # confusing duplicate FAILs or crash on tuple shapes
            print(f"FAIL {name}: columns spark={scols_sorted} duck={dcols_sorted}")
            n_fail += 1
            continue
        bad_dtypes = dtype_mismatches(sdf, duck_df)
        if bad_dtypes:
            print(f"FAIL {name}: dtype parity: {'; '.join(bad_dtypes)}")
            ok = False
        elif len(sk) != len(dk):
            print(f"FAIL {name}: rowcount spark={len(sk)} duck={len(dk)}")
            ok = False
        elif sk != dk:
            exact_mismatch = [
                (i, a, b) for i, (a, b) in enumerate(zip(sk, dk)) if a != b
            ]
            close = all(approx_equal(a, b) for _, a, b in exact_mismatch)
            print(
                f"FAIL {name}: {len(exact_mismatch)} mismatched rows"
                f" (float-close={close}); first: {exact_mismatch[:2]}"
            )
            ok = False
        if ok:
            print(f"PASS {name}: rows={len(sk)} ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
