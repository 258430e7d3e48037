"""Round-12 A/B harness: warm best-of-N timings for named catalog
queries under optional dispatcher overrides, same protocol as
bench.py (noop sink, clearCache + release_pins between reps).

Usage:
  python scripts/ab_r12.py N q1 q2 ...            # current defaults
  MINHASH_IMPL=expr OPH_IMPL=expr python scripts/ab_r12.py N q1 ...

Dispatcher overrides are read from env and poked into the operator
modules before the catalog runs (the globals are module-level
defaults; tests pin them the same way).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reader_spark.cache import release_pins  # noqa: E402
from reader_spark.queries import CATALOG  # noqa: E402
from reader_spark.session import get_spark  # noqa: E402


def main() -> None:
    # optional interleaved dispatcher flip: --flip ATTR=v1,v2 runs
    # each rep once per value, alternating inside ONE session so the
    # noisy-host stalls land on both variants.
    flip = None
    args = sys.argv[1:]
    if args and args[0] == "--flip":
        attr, vals = args[1].split("=")
        flip = (attr, vals.split(","))
        args = args[2:]
    n = int(args[0])
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from reader_spark.operators import curation as CU
    from reader_spark.operators import dedup as DD
    from reader_spark.operators import similarity as SIM

    for env, mod, attr in (
        ("MINHASH_IMPL", DD, "MINHASH_IMPL"),
        ("OPH_IMPL", DD, "OPH_IMPL"),
        ("SIMHASH_IMPL", DD, "SIMHASH_IMPL"),
        ("NEAREST_IMPL", SIM, "NEAREST_IMPL"),
        ("LSH_BUCKET_IMPL", CU, "LSH_BUCKET_IMPL"),
    ):
        v = os.environ.get(env)
        if v:
            setattr(mod, attr, v)
            print(f"# override {attr}={v}")

    from reader_spark.operators import retrieval as RT

    mods = {"dedup": DD, "similarity": SIM, "curation": CU, "retrieval": RT}

    def set_attr(attr, val):
        for m in mods.values():
            if hasattr(m, attr):
                setattr(m, attr, val)
                return

    spark = get_spark("ab_r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        fn, _sql = CATALOG[name]
        variants = flip[1] if flip else [None]
        times = {v: [] for v in variants}
        for _ in range(n):
            for v in variants:
                if flip:
                    set_attr(flip[0], v)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                try:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                finally:
                    release_pins()
                times[v].append(round(time.perf_counter() - t0, 3))
        for v in variants:
            tag = f" [{flip[0]}={v}]" if flip else ""
            ts = times[v]
            print(f"{name}{tag}: best={min(ts)} all={ts}", flush=True)


if __name__ == "__main__":
    main()
