"""Scalar function surface + the classic MapReduce suite, DataFrame-native.

The reference keeps every scalar function inside user executables
(SURVEY.md §2 'Explicitly absent'); here string/date/JSON/conditional
functions are first-class JVM-side expressions (whole-stage codegen — no
Python in the hot path).

Includes the canonical MapReduce workloads the reference is tested with
(word count — the submit.py:40-49 default job — plus grep and inverted
index, SURVEY.md §5) re-expressed as one-line DataFrame queries over the
`documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T


@query(
    "string_funcs",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS segment_lower,
           LENGTH(c_name) AS name_len,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CONCAT(c_name, ':', c_mktsegment) AS name_seg,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           TRIM(c_name) AS name_trim,
           REVERSE(c_mktsegment) AS seg_rev
    FROM customer WHERE c_custkey <= 200
    """,
    tags=("functions", "string"),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: upper/lower/length/substr/concat/replace/trim/reverse."""
    (cust,) = T(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") <= 200).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.trim("c_name").alias("name_trim"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


@query(
    "date_funcs",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS order_year,
           EXTRACT(month FROM o_orderdate) AS order_month,
           EXTRACT(day FROM o_orderdate) AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("functions", "date"),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: extract, truncate, diff, interval arithmetic."""
    (orders,) = T(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@query(
    "json_funcs",
    """
    SELECT k_value, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value, value
      FROM events
    )
    GROUP BY k_value
    """,
    tags=("functions", "json"),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the semi-structured `props` column, then agg.

    Scale note: get_json_object is a codegen'd JVM expression — at 100 TB
    prefer `from_json` with an explicit schema once the shape is known, so
    the parse happens once per row, not per path."""
    (events,) = T(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k_value"), "value"
        )
        .groupBy("k_value")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "case_bucketing",
    """
    SELECT CASE WHEN value < 5 THEN 'low'
                WHEN value < 15 THEN 'mid'
                ELSE 'high' END AS bucket,
           event_type, COUNT(*) AS n
    FROM events GROUP BY bucket, event_type
    """,
    tags=("functions", "conditional"),
)
def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + two-key aggregation."""
    (events,) = T(spark, sf_dir, "events")
    return (
        events.select(
            F.when(F.col("value") < 5, "low")
            .when(F.col("value") < 15, "mid")
            .otherwise("high")
            .alias("bucket"),
            "event_type",
        )
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# The classic MapReduce suite (reference-canonical workloads)
# ---------------------------------------------------------------------------


@query(
    "wordcount",
    """
    SELECT word, COUNT(*) AS count
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("mapreduce-suite",),
    bench=True,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count — the reference's canonical job (its default mapper/reducer
    pair, reference submit.py:40-49) as a one-line DataFrame expression:
    split → explode (flatMap analog) → hash agg with map-side combine (the
    combiner the reference never had, SURVEY.md §4.2)."""
    (docs,) = T(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


@query(
    "grep_filter",
    """
    SELECT doc_id, lang, n_chars FROM documents WHERE text LIKE '%merge batch%'
    """,
    tags=("mapreduce-suite",),
)
def grep_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep (reference analog: filter mapper + identity reduce)."""
    (docs,) = T(spark, sf_dir, "documents")
    return docs.filter(F.col("text").like("%merge batch%")).select("doc_id", "lang", "n_chars")


@query(
    "inverted_index",
    """
    SELECT word, COUNT(*) AS n_docs, string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
    FROM (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    )
    WHERE word <> ''
    GROUP BY word HAVING COUNT(*) >= (SELECT COUNT(*) * 0.5 FROM documents)
    """,
    tags=("mapreduce-suite",),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: word → sorted posting list (classic MapReduce workload;
    reference analog: word-key mapper + list-building reducer).  Posting
    lists are sorted + comma-joined for a deterministic representation."""
    (docs,) = T(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .groupBy("word")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list("doc_id")), lambda c: c.cast("string")),
                ",",
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") >= docs.count() * 0.5)
    )


@query(
    "map_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           2 AS map_size,
           l_quantity AS qty_val,
           'price_k,qty' AS keys_csv,
           l_discount AS disc_val,
           l_quantity * 2 AS qty_doubled
    FROM lineitem WHERE l_orderkey < 1000
    """,
    tags=("functions",),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: construct, inspect, merge, and transform map columns
    (create_map / map_keys / element_at / map_concat / transform_values) —
    all JVM-side expressions.  The oracle replays the resulting *values*
    directly; what's under test is that Spark's map ops produce them.

    The reference has no nested types at all (strings only, SURVEY.md §1.2).
    """
    (li,) = T(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("price_k"), F.col("l_extendedprice") / 1000,
    )
    merged = F.map_concat(m, F.create_map(F.lit("disc"), F.col("l_discount")))
    doubled = F.expr(
        "transform_values(map('qty', l_quantity, 'price_k', l_extendedprice / 1000),"
        " (k, v) -> v * 2)"
    )
    return (
        li.filter(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.size(m).alias("map_size"),
            F.element_at(m, F.lit("qty")).alias("qty_val"),
            F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
            F.element_at(merged, F.lit("disc")).alias("disc_val"),
            F.element_at(doubled, F.lit("qty")).alias("qty_doubled"),
        )
    )


_NESTED_ORACLE = """
SELECT l_orderkey, COUNT(*) AS n_items,
       CAST(MIN(l_linenumber) AS INTEGER) AS first_ln,
       CAST(MAX(l_linenumber) AS INTEGER) AS last_ln,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem GROUP BY l_orderkey
"""


@query("nested_collect_explode", _NESTED_ORACLE, tags=("functions", "nested"))
def nested_collect_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data roundtrip: each order's line items are collected into a
    SORTED array<struct>, then exploded back to rows and re-aggregated —
    the denormalize/renormalize cycle every document-shaped export (JSON,
    protobuf, training examples) runs.  The oracle aggregates the flat
    table directly, so a dropped/duplicated element, an unstable
    collect_list, or a mis-sorted array (first_ln/last_ln pin the array
    ORDER, not just its contents) all break the hash.  collect_list is
    per-group bounded (an order's items) — never a global collect."""
    (li,) = T(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("items")
    )
    exploded = nested.select(
        "l_orderkey",
        F.size("items").alias("n_arr"),
        F.element_at("items", 1).getField("l_linenumber").alias("first_ln"),
        F.element_at("items", -1).getField("l_linenumber").alias("last_ln"),
        F.explode("items").alias("it"),
    )
    return exploded.groupBy("l_orderkey", "n_arr", "first_ln", "last_ln").agg(
        F.count("*").alias("n_items"),
        F.sum(F.round(F.col("it.l_quantity") * 100).cast("long")).alias("qty_cents"),
    ).select("l_orderkey", "n_items", "first_ln", "last_ln", "qty_cents")


_MODERN_SQL = """
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY ALL
"""


@query("modern_sql_group_by_all", _MODERN_SQL, tags=("functions", "sql"))
def modern_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern-SQL surface parity: ``GROUP BY ALL`` (group on every
    non-aggregate select item — the DuckDB-originated convenience Spark
    adopted in 3.4) runs as the IDENTICAL SQL text on both engines,
    like `recursive_subtree_rollup`.  Spark-side caveat folded in:
    Spark has no `strftime`, so the one non-portable scalar is aliased
    through `date_format` in a view-level projection before the shared
    text would run — instead the whole statement is expressed with
    per-engine date formatting but the SAME grouping semantics, and the
    gate hash-checks they agree."""
    (events,) = T(spark, sf_dir, "events")
    events.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM events
        GROUP BY ALL
        """
    )


@query(
    "variant_semistructured",
    """
    SELECT k_bucket, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(k_value) AS min_k, MAX(k_value) AS max_k
    FROM (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
             value
      FROM events
    )
    GROUP BY k_bucket
    """,
    tags=("functions", "json"),
)
def variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the VARIANT type (Spark 4): parse
    each props payload ONCE into the binary VARIANT encoding, then typed
    `variant_get` path extraction — the lakehouse answer to schemaless
    columns, vs `json_funcs`' per-path string re-parse (get_json_object).
    At 100 TB the difference compounds: VARIANT parses once per row and
    serves every downstream path from the binary form (and shredded
    storage can push extraction into the scan), where N get_json_object
    calls re-tokenize the string N times.  The VARIANT itself never
    reaches the output (it is an opaque encoding, not a hashable value) —
    typed extractions feed a plain decimal-exact aggregate the oracle
    replays with json_extract_string."""
    (events,) = T(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        events.select(
            F.expr("variant_get(parse_json(props), '$.k', 'bigint') div 10").alias(
                "k_bucket"
            ),
            k.alias("k_value"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.min("k_value").alias("min_k"),
            F.max("k_value").alias("max_k"),
        )
    )


@query(
    "collated_join_casefold",
    """
    WITH mixed AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0
                  THEN upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2))
                  ELSE p_type END AS mixed_type,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part
    ),
    dim AS (SELECT DISTINCT lower(p_type) AS canon_type FROM part)
    SELECT d.canon_type, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(m.price_cents) AS BIGINT) AS sum_price_cents
    FROM mixed m JOIN dim d ON lower(m.mixed_type) = d.canon_type
    GROUP BY d.canon_type
    """,
    tags=("functions", "string"),
)
def collated_join_casefold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive equi-join through COLLATIONS (Spark 4's
    `collate(..., 'UTF8_LCASE')`): the fact side carries mixed-case type
    strings (half the rows re-cased, simulating uncanonicalized feeds);
    the dimension is lowercase-canonical; the join matches under the
    case-folding collation WITHOUT rewriting either side — the engine-
    level answer to the lower()-wrapper idiom the oracle replays.  Still
    a hash join on the collation-aware key (plan-visible; not a filter
    scan), so the 100 TB story is unchanged: shuffle on the folded key.
    Every row must match — a case-sensitive comparison would drop the
    re-cased half and break count and sum."""
    (part,) = T(spark, sf_dir, "part")
    mixed = part.select(
        "p_partkey",
        F.when(
            F.col("p_partkey") % 2 == 0, F.initcap(F.lower(F.col("p_type")))
        )
        .otherwise(F.col("p_type"))
        .alias("mixed_type"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    dim = part.select(F.lower(F.col("p_type")).alias("canon_type")).distinct()
    joined = mixed.join(
        dim,
        F.expr("collate(mixed_type, 'UTF8_LCASE')")
        == F.expr("collate(canon_type, 'UTF8_LCASE')"),
    )
    return joined.groupBy("canon_type").agg(
        F.count("*").alias("n_parts"),
        F.sum("price_cents").alias("sum_price_cents"),
    )


@query(
    "sql_pipe_syntax",
    """
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("functions", "sql"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's `|>` operators, from the GoogleSQL
    pipe-query proposal): the same scan → filter → aggregate expressed as
    a top-to-bottom pipeline instead of inside-out SELECT nesting — the
    SQL-surface twin of the DataFrame API's method chaining, and the form
    data engineers increasingly write ETL SQL in.  Catalyst resolves the
    pipe form to the identical logical plan as the oracle's classic
    GROUP BY (same pushdown, same partial aggregation); the gate proves
    the equivalence at hash level."""
    from map_reduce485_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity >= 30
        |> AGGREGATE COUNT(*) AS n_items,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS revenue_cents
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items, revenue_cents
        """
    )
