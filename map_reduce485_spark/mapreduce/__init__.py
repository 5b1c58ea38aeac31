"""Layer A: MapReduce-compatible core (reference parity) on Spark RDDs."""

from map_reduce485_spark.mapreduce.job import (
    JobQueue,
    JobRequest,
    MapReduceJob,
    md5_partition,
    run_job,
)

__all__ = ["JobQueue", "JobRequest", "MapReduceJob", "md5_partition", "run_job"]
