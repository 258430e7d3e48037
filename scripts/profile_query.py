"""Stage-level time attribution for catalog queries via the Spark
event log — the reliable instrument on a noisy VM: per-stage task
time is measured by the executor, so host-steal bursts show up as
inflated single stages instead of corrupting the whole wall clock.

Usage: python scripts/profile_query.py <query> [reps]

Prints, for the LAST rep (warm), each stage's total task time, its
submission->completion wall span, and the first line of its callsite,
sorted by task time.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reader_spark.cache import release_pins  # noqa: E402
from reader_spark.queries import CATALOG  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="evlog_")
    from reader_spark.session import get_spark  # noqa: E402

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fn, _sql = CATALOG[name]
    marks = []
    for i in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_pins()
        marks.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: reps={marks}")
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    app_id = spark.sparkContext.applicationId
    spark.stop()
    # parse the event log
    # Spark 4 rolling layout: eventlog_v2_<appid>/events_1_<appid>...
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            if app_id in f or app_id in root:
                paths.append(os.path.join(root, f))
    paths.sort()
    stages = {}
    for path in paths:
      with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                ent = stages.setdefault(
                    si["Stage ID"],
                    {"name": "?", "tasks": 0, "wall": 0.0,
                     "task_time": 0.0, "cpu": 0.0},
                )
                ent["name"] = si["Stage Name"].splitlines()[0][:90]
                ent["tasks"] = si["Number of Tasks"]
                ent["wall"] = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info") or {}
                rt = max(0, ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
                # ThreadMXBean CPU ns: excludes hypervisor steal, the
                # only metric that holds still on this noisy VM.
                cpu = (ev.get("Task Metrics") or {}).get(
                    "Executor CPU Time", 0
                )
                ent = stages.setdefault(
                    sid,
                    {"name": "?", "tasks": 0, "wall": 0.0,
                     "task_time": 0.0, "cpu": 0.0},
                )
                ent["task_time"] += rt / 1000.0
                ent["cpu"] += cpu / 1e9
    # only the last rep's stages: take the top half of stage ids
    ids = sorted(stages)
    cut = ids[len(ids) * (reps - 1) // reps] if reps > 1 else ids[0]
    last = {k: v for k, v in stages.items() if k >= cut}
    tot_task = sum(s["task_time"] for s in last.values())
    tot_wall = sum(s["wall"] for s in last.values())
    tot_cpu = sum(s["cpu"] for s in last.values())
    print(
        f"last-rep stages={len(last)} total_task_time={tot_task:.2f}s "
        f"sum_stage_wall={tot_wall:.2f}s total_cpu={tot_cpu:.2f}s"
    )
    for sid, s in sorted(last.items(), key=lambda kv: -kv[1]["cpu"])[:18]:
        print(
            f"  stage {sid:>4} tasks={s['tasks']:>3} cpu={s['cpu']:>7.2f}s "
            f"task_time={s['task_time']:>7.2f}s "
            f"wall={s['wall']:>6.2f}s  {s['name']}"
        )
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
