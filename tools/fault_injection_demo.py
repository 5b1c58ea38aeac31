"""Fault-injection parity demo (reference ops #13/#14, SURVEY.md §2.a):
a task that dies mid-job is re-executed and the job output is identical.

The reference detects dead workers by heartbeat timeout and re-dispatches
their tasks (manager/__main__.py:426-438, retry loops :279-323); Spark's
equivalent is task retry (`spark.task.maxFailures`), enabled in local mode
via the `local[N, maxFailures]` master.  The mapper below hard-fails its
first attempt of partition 0 (via TaskContext.attemptNumber), so the job
only succeeds if Spark re-executes the failed task — and the word counts
must come out exactly as if no failure happened.

Run standalone (own JVM — do not share a test session):
    python tools/fault_injection_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import SparkSession

    from map_reduce485_spark.mapreduce import JobRequest, MapReduceJob

    spark = (
        SparkSession.builder.master("local[2, 2]")  # 2 threads, 2 task attempts
        .appName("fault_injection_demo")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = Path(tempfile.mkdtemp())
    ind = tmp / "input"
    ind.mkdir()
    (ind / "a.txt").write_text("alpha beta\nalpha gamma\n")
    (ind / "b.txt").write_text("beta beta\ndelta\n")

    def flaky_map(line: str):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        # die on the first attempt of the first partition — simulates the
        # reference's "worker crashes mid-map-task" scenario
        if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected worker death")
        for w in line.split():
            yield f"{w}\t1"

    def reduce_fn(key, values):
        yield f"{key}\t{sum(int(v) for v in values)}"

    out = tmp / "out"
    MapReduceJob(spark, JobRequest(str(ind), str(out), flaky_map, reduce_fn, 2, 2)).run()

    got: dict[str, int] = {}
    for p in sorted(out.iterdir()):
        if p.name.startswith("part-"):
            for line in p.read_text().splitlines():
                k, v = line.split("\t", 1)
                got[k] = got.get(k, 0) + int(v)
    expected = {"alpha": 2, "beta": 3, "gamma": 1, "delta": 1}
    assert got == expected, f"after task retry, counts wrong: {got}"
    print(f"fault-injection parity OK: task re-executed, output identical {got}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
