"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-rows source, registered as ``mr485_synthetic``.

The reference's only source is a text directory handed to mapper
executables (``manager/__main__.py:224``); Spark's pluggable-source
contract is the Layer-B generalization, and since Spark 4 a source can be
implemented in pure Python — partition planning (`partitions`) runs on the
driver, `read` runs once per InputPartition on executors, Arrow-batched
back into the scan.  This source synthesizes rows from closed-form
integer expressions so a DuckDB oracle can replay the exact content with
`generate_series` — proving the partitioned read path end to end (row
multiset independent of the partition count, every partition actually
read), not just "some rows came back".
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class SyntheticRowsDataSource(DataSource):
    """``spark.read.format("mr485_synthetic").option("n", N)`` → N rows
    (id bigint, bucket int, score_units bigint): bucket = id % 16,
    score_units = (id*id) % 97 — pure integer functions of id, so content
    is identical for ANY partitioning and replayable in SQL."""

    @classmethod
    def name(cls) -> str:
        return "mr485_synthetic"

    def schema(self) -> str:
        return "id bigint, bucket int, score_units bigint"

    def reader(self, schema) -> "SyntheticRowsReader":
        return SyntheticRowsReader(self.options)


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.num_parts = int(options.get("partitions", 8))

    def partitions(self):  # driver-side split planning
        return [InputPartition(i) for i in range(self.num_parts)]

    def read(self, partition):  # executor-side, one call per partition
        i = partition.value
        lo = i * self.n // self.num_parts
        hi = (i + 1) * self.n // self.num_parts
        for rid in range(lo, hi):
            yield (rid, rid % 16, (rid * rid) % 97)


def register(spark) -> None:
    """Idempotent registration (a name can only be bound once per session)."""
    for src in (SyntheticRowsDataSource, SyntheticStreamDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass


STREAM_N = 2000     # total rows the synthetic stream ever produces
STREAM_STEP = 200   # rows surfaced per micro-batch read


class SyntheticStreamDataSource(DataSource):
    """STREAMING Python data source (`simpleStreamReader`): a bounded
    synthetic feed of STREAM_N rows surfaced STREAM_STEP per micro-batch,
    with driver-tracked offsets ({"pos": n}) the engine checkpoints and
    replays — the Spark 4 path for ingesting a bespoke feed (an internal
    queue, a poll-based API) without a JVM connector.  Row content is a
    pure function of the row id (k = id % 16, cents = (id*id) % 9973), so
    any offset schedule produces the same multiset and a SQL oracle can
    replay it."""

    @classmethod
    def name(cls) -> str:
        return "mr485_synthetic_stream"

    def schema(self) -> str:
        return "id bigint, k int, cents bigint"

    def simpleStreamReader(self, schema) -> "SyntheticStreamReader":
        return SyntheticStreamReader()


def _stream_rows(lo: int, hi: int):
    return iter([(i, i % 16, (i * i) % 9973) for i in range(lo, hi)])


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + STREAM_STEP, STREAM_N)
        return _stream_rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # exact replay between checkpointed offsets (crash recovery path)
        return _stream_rows(start["pos"], end["pos"])
