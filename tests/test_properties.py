"""Property-based invariants (hypothesis) for the partitioning and
join operators — the classes of bugs the reference guards with its
scan-correctness integration test
(/root/reference/integration_tests/postgres/main.go:878-951: no
dupes/drops at chunk boundaries for any batch size).
"""

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from reader_spark.operators import joins as JO
from reader_spark.sources.jdbc import MYSQL, composite_pk_predicates

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    pks=st.lists(
        st.tuples(st.integers(-50, 50), st.text("ab", min_size=0, max_size=3)),
        min_size=0, max_size=40, unique=True,
    ),
    n_bounds=st.integers(0, 5),
)
@SET
def test_composite_predicates_partition_exactly(spark, pks, n_bounds):
    """Every PK tuple matches EXACTLY ONE generated predicate — the
    union is the table, pairwise disjoint (no dupes/drops at
    boundaries, for any boundary count)."""
    boundaries = sorted(set(pks))[:n_bounds]
    preds = composite_pk_predicates(boundaries, ["a", "b"], MYSQL)
    df = spark.createDataFrame(pks or [(0, "x")], "a int, b string")
    if not pks:
        df = df.limit(0)
    total = 0
    seen = set()
    for p in preds:
        rows = df.filter(F.expr(p.replace("`", ""))).collect()
        total += len(rows)
        for r in rows:
            assert (r.a, r.b) not in seen  # disjoint
            seen.add((r.a, r.b))
    assert total == len(pks)  # complete


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=25
    ),
)
@SET
def test_asof_join_matches_naive(spark, left, right):
    """asof_join == per-row argmax(rt <= lt) reference semantics."""
    # unique (key, ts) on the right — the operator's documented contract
    right = list({(k, t): (k, t) for k, t in right}.values())
    base = dt.datetime(2024, 1, 1)
    lrows = [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(left)]
    rrows = [(k, base + dt.timedelta(minutes=m), f"v{k}:{m}") for k, m in right]
    ldf = spark.createDataFrame(lrows or [(0, base, 0)], "k int, t timestamp, lid int")
    rdf = spark.createDataFrame(rrows or [(0, base, "x")], "rk int, rt timestamp, val string")
    if not lrows:
        ldf = ldf.limit(0)
    if not rrows:
        rdf = rdf.limit(0)
    out = {r.lid: r.val for r in JO.asof_join(ldf, rdf, "k", "rk", "t", "rt").collect()}
    for k, m, lid in [(k, m, i) for i, (k, m) in enumerate(left)]:
        cands = [(rm, f"v{rk}:{rm}") for rk, rm in right if rk == k and rm <= m]
        want = max(cands)[1] if cands else None
        assert out.get(lid) == want


@given(
    points=st.lists(st.floats(0, 500, allow_nan=False), min_size=0, max_size=30),
    intervals=st.lists(
        st.tuples(st.floats(0, 400, allow_nan=False), st.floats(1, 200, allow_nan=False)),
        min_size=0, max_size=8,
    ),
    width=st.sampled_from([7.0, 30.0, 128.0]),
)
@SET
def test_range_bin_join_matches_naive(spark, points, intervals, width):
    ivs = [(lo, lo + w) for lo, w in intervals]
    pdf = spark.createDataFrame([(p,) for p in points] or [(0.0,)], "v double")
    idf = spark.createDataFrame(ivs or [(0.0, 1.0)], "lo double, hi double")
    if not points:
        pdf = pdf.limit(0)
    if not ivs:
        idf = idf.limit(0)
    got = sorted(
        (r.v, r.lo, r.hi)
        for r in JO.range_bin_join(pdf, idf, "v", "lo", "hi", bin_width=width).collect()
    )
    want = sorted(
        (p, lo, hi) for p in points for lo, hi in ivs if lo <= p < hi
    )
    assert got == want
