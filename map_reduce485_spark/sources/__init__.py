"""Source/sink surface.

The reference's only source and sink is a directory of line-oriented text
files (SURVEY.md §2.a ops #1/#10) — covered bit-faithfully by Layer A and
by `read_text_dir`/`write_text_parts` here.  The DataFrame layer adds the
typed formats a Spark-native engine provides: Parquet (primary, via
`catalog`), CSV and JSON with explicit schemas (schema-on-read like the
reference, but validated), and partitioned/bucketed writers for
shuffle-free downstream joins.
"""

from map_reduce485_spark.sources.io import (
    read_csv,
    read_json,
    read_text_dir,
    write_partitioned_parquet,
    write_text_parts,
)

__all__ = [
    "read_text_dir",
    "write_text_parts",
    "read_csv",
    "read_json",
    "write_partitioned_parquet",
]
