"""Reusable operator implementations behind the query registry.

Layout maintenance (the three recurring jobs of a 100 TB lakehouse):
bucketing (co-located joins), zorder (multi-dim filter locality),
compact (small-file hygiene).  Plus kmeans (IVF centroids for ANN),
skew (salted joins), and the multimodal mapInPandas pipelines.
"""

from map_reduce485_spark.operators.bucketing import bucketed_join, write_bucketed
from map_reduce485_spark.operators.compact import compact, dir_bytes
from map_reduce485_spark.operators.zorder import zorder_code, zorder_write

__all__ = [
    "bucketed_join",
    "write_bucketed",
    "compact",
    "dir_bytes",
    "zorder_code",
    "zorder_write",
]
