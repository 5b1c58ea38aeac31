"""Layer A: MapReduce-compatible core (reference parity) on Spark RDDs."""

from map_reduce485_spark.mapreduce.job import JobRequest, MapReduceJob, md5_partition

__all__ = ["JobRequest", "MapReduceJob", "md5_partition"]
