"""Attribution profile for the saturated scaling pair: where does wall
time go at local[8] vs local[32]?

Runs the SAME fused-pipeline job as tools/scale_job.py at one core count
with the Spark UI's REST API enabled, then sums per-stage executor
metrics: executorRunTime (wall across tasks), executorCpuTime (actual
CPU), JVM GC time, shuffle/serialization components. The interesting
number is the CPU fraction ``cpuTime / runTime``:

* ≈1.0 at both levels → the job is compute-bound and any efficiency
  shortfall is the machine (shared memory bandwidth), not Spark;
* dropping at 32 cores → tasks stall (memory-bandwidth contention, GC
  pauses, scheduler gaps) — the Spark-side share of the gap.

Python-worker time is INSIDE executorRunTime but outside executorCpuTime
(the JVM thread blocks on the Arrow socket while Python computes), so
for this Arrow-stage-dominated job the per-task "pythonDuration" metric
(pandas UDF execution wall) is also reported when present.

Usage: taskset -c 0-7 python tools/scale_profile.py 8 <corpus> [reps]
Writes one JSON line; BENCH/BASELINE.md quotes the pair.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edspdf_spark import get_spark


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"scale-profile-{cores}",
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.driver.memory": os.environ.get("SCALE_DRIVER_MEMORY", "48g"),
            "spark.ui.enabled": "true",  # REST metrics source
            **json.loads(os.environ.get("SCALE_EXTRA_CONF", "{}")),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui_port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    from edspdf_spark.operators import run_pipeline_fused
    from edspdf_spark.skew import apply_scan_partitioning, local_parquet_bytes

    apply_scan_partitioning(spark, local_parquet_bytes(corpus), cores)
    pages = spark.read.parquet(corpus)

    def job():
        run_pipeline_fused(
            pages, [("body", 0.2, 0.3, 0.9, 0.6)], threshold=0.1
        ).write.format("noop").mode("overwrite").save()

    # warmup (workers + codegen), then mark the stage-id floor so only
    # measured reps are profiled
    run_pipeline_fused(
        pages.limit(cores * 40).repartition(cores), [("body", 0.2, 0.3, 0.9, 0.6)], 0.1
    ).write.format("noop").mode("overwrite").save()
    floor = max(
        (s["stageId"] for s in _rest(ui_port, f"applications/{app_id}/stages")),
        default=-1,
    )

    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        job()
        walls.append(round(time.perf_counter() - t0, 3))

    run_ms = cpu_ms = gc_ms = 0
    n_tasks = 0
    for s in _rest(ui_port, f"applications/{app_id}/stages?status=complete"):
        if s["stageId"] <= floor:
            continue
        run_ms += s.get("executorRunTime", 0)
        cpu_ms += s.get("executorCpuTime", 0) // 1_000_000  # ns → ms
        gc_ms += s.get("jvmGcTime", 0)
        n_tasks += s.get("numCompleteTasks", 0)

    wall = min(walls)
    out = {
        "cores": cores,
        "reps": walls,
        "wall_best_s": wall,
        "task_run_s": round(run_ms / 1000.0, 1),
        "task_cpu_s": round(cpu_ms / 1000.0, 1),
        "jvm_gc_s": round(gc_ms / 1000.0, 1),
        "n_tasks": n_tasks,
        # CPU fraction of task wall: stalls/IO/python-socket waits are
        # the remainder (python compute shows as non-CPU here, constant
        # per doc across levels, so the LEVEL-TO-LEVEL DROP is the stall
        # signal, not the absolute value)
        "cpu_fraction": round(cpu_ms / max(1, run_ms), 4),
        # task-parallelism achieved: run_ms spread over wall seconds
        "effective_parallelism": round(run_ms / 1000.0 / (sum(walls)), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
