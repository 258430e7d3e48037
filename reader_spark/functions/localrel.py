"""Local (driver-side) relations that stay JVM-resident.

`spark.createDataFrame(list_of_rows, schema)` builds an RDD of
PICKLED Python rows: the plan is an opaque `Scan ExistingRDD`, so
every downstream action schedules Python workers just to
re-deserialize the handful of rows (measured r12: ~0.8 s per action
for a 5-row frame, ~5 s when coalesced to one slice), and Catalyst
has no stats to size or broadcast it. Routing the same rows through
pandas + Arrow converts ONCE at build time and yields a
`LocalTableScan` — actions are pure JVM (same 5-row save: ~0.2 s),
the relation has exact local stats, and broadcast hints see real
sizes. Query-path code should build small driver-side frames (query
term lists, centroid tables, report rows, literal probe sets) with
`local_df`, never the bare list form.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_df(
    spark: SparkSession, rows: Iterable, schema: str | T.StructType
) -> DataFrame:
    """`createDataFrame` for small driver-side row collections,
    routed through pandas/Arrow so the result is a JVM
    LocalTableScan (see module docstring).

    Falls back to the plain pickled-RDD path when pandas/Arrow
    cannot represent the rows (exotic nesting, mixed types) — same
    rows either way, this is a plan-shape optimization only."""
    rows = list(rows)
    st = (
        T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    if not rows:
        # empty: pandas can't carry the dtypes; a zero-row Range
        # projection is JVM-side and worker-free just the same.
        from pyspark.sql import functions as F

        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in st.fields
            ]
        )
    try:
        import pandas as pd

        pdf = pd.DataFrame.from_records(rows, columns=st.names)
        out = spark.createDataFrame(pdf, st)
        # Arrow conversion can silently fall back to the pickle path
        # (spark.sql.execution.arrow.pyspark.fallback); if so the
        # plain form below is equivalent, so no extra handling.
        return out
    except Exception:  # pragma: no cover - representation gaps
        return spark.createDataFrame(rows, schema)
