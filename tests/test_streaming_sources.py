"""Non-file streaming sources: socket and rate.

The engine's streaming gates ingest from the file source (the landing-zone
pattern); production swaps in a network source with the same downstream
code.  The container ships no Kafka broker, so source breadth is witnessed
with the two broker-less sources Spark provides:

- `rate`: self-generating (timestamp, value) rows — plumbing smoke.
- `socket`: a REAL network text source, fed here by an in-test TCP server —
  the closest available stand-in for broker ingestion: the same
  readStream -> transform -> writeStream pipeline the file-source gates
  run, but pulling rows off a live socket.

The reference has no streaming mode at all (SURVEY.md §1.3); this is
north-star surface.
"""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F


def _wait_until(predicate, timeout_s: float = 60.0, step_s: float = 0.5) -> bool:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step_s)
    return predicate()


def test_rate_source_rows(spark):
    """The rate source produces monotonically-increasing values through the
    standard streaming pipeline into a memory sink."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
        .writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        assert _wait_until(lambda: spark.table("rate_smoke").count() >= 20)
        vals = [r.value for r in spark.table("rate_smoke").collect()]
        assert sorted(vals) == list(range(min(vals), min(vals) + len(vals)))
    finally:
        q.stop()


def test_socket_source_wordcount(spark):
    """End-to-end wordcount over a live TCP socket source: an in-test
    server writes lines, the streaming query aggregates them in complete
    mode, and the memory sink converges to the exact counts."""
    lines = ["alpha beta", "beta gamma", "alpha"]
    expected = {"alpha": 2, "beta": 2, "gamma": 1}

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    def serve() -> None:
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop.wait(90)  # hold the connection open until the test ends

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    counts = (
        stream.select(F.explode(F.split("value", " ")).alias("w"))
        .groupBy("w")
        .count()
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("socket_wc")
        .outputMode("complete")
        .start()
    )
    try:
        def converged() -> bool:
            got = {r.w: r["count"] for r in spark.table("socket_wc").collect()}
            return got == expected

        assert _wait_until(converged), {
            r.w: r["count"] for r in spark.table("socket_wc").collect()
        }
    finally:
        q.stop()
        stop.set()
        server.close()
