"""Source/sink round-trips and partitioned-writer pruning behavior."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from map_reduce485_spark.catalog import load_table
from map_reduce485_spark.sources import (
    read_csv,
    read_json,
    read_text_dir,
    write_partitioned_parquet,
    write_text_parts,
)
from tests.conftest import SF_SMOKE


def test_text_roundtrip(spark, tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "a.txt").write_text("one\ntwo\n")
    (ind / "b.txt").write_text("three\n")
    df = read_text_dir(spark, str(ind))
    assert {r.value for r in df.collect()} == {"one", "two", "three"}
    out = tmp_path / "out"
    write_text_parts(df, str(out))
    back = read_text_dir(spark, str(out))
    assert {r.value for r in back.collect()} == {"one", "two", "three"}


def test_csv_json_explicit_schema(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    csv = tmp_path / "data.csv"
    csv.write_text("id,name,score\n1,alice,0.5\n2,bob,1.5\n")
    df = read_csv(spark, str(csv), schema)
    assert df.schema == schema
    assert df.count() == 2 and df.filter(F.col("score") > 1).count() == 1

    js = tmp_path / "data.jsonl"
    js.write_text('{"id": 3, "name": "eve", "score": 2.0}\n{"id": 4, "name": "mal"}\n')
    dj = read_json(spark, str(js), schema)
    rows = {r.id: (r.name, r.score) for r in dj.collect()}
    assert rows == {3: ("eve", 2.0), 4: ("mal", None)}


def test_partitioned_parquet_prunes_directories(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = tmp_path / "docs_by_lang"
    write_partitioned_parquet(docs, str(out), partition_by=["lang"], sort_within=["doc_id"])
    # directory-per-lang layout
    langs = {p.name.split("=")[1] for p in out.iterdir() if p.name.startswith("lang=")}
    assert "en" in langs and len(langs) >= 4
    # a lang predicate scans only the matching directory (partition pruning)
    back = spark.read.parquet(str(out)).filter(F.col("lang") == "en")
    from map_reduce485_spark.plans import explain_str

    assert back.count() == docs.filter(F.col("lang") == "en").count()
    assert "lang=en" in explain_str(back) or "PartitionFilters" in explain_str(back)


def test_sql_entry_point(spark):
    """catalog.sql: plain SQL over registered views == DataFrame plan."""
    from map_reduce485_spark.catalog import sql
    from tests.conftest import SF_SMOKE

    df = sql(
        spark,
        SF_SMOKE,
        """
        SELECT r_name, COUNT(*) AS n_nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name
        """,
    )
    rows = {r.r_name: r.n_nations for r in df.collect()}
    assert sum(rows.values()) == 25 and len(rows) == 5


def test_schema_evolution_merge(spark, tmp_path):
    """Parquet schema evolution: files written before a column existed read
    back with the merged schema (nulls for the missing column), and
    unionByName aligns frames across schema versions."""
    from pyspark.sql import functions as F

    v1 = spark.range(3).select(F.col("id"), F.lit("a").alias("c1"))
    v2 = spark.range(3, 6).select(F.col("id"), F.lit("b").alias("c1"), F.lit(1).alias("c2"))
    v1.write.parquet(str(tmp_path / "t" / "v1"))
    v2.write.parquet(str(tmp_path / "t" / "v2"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t" / "*"))
    assert set(merged.columns) == {"id", "c1", "c2"}
    assert merged.count() == 6
    assert merged.filter(F.col("c2").isNull()).count() == 3

    aligned = v1.unionByName(v2, allowMissingColumns=True)
    assert set(aligned.columns) == {"id", "c1", "c2"} and aligned.count() == 6


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Incremental ETL re-runs must replace only the partitions present in
    the new batch (dynamic mode), not truncate the whole table — the
    idempotent-backfill primitive."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "events_by_day")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        full = spark.range(100).select(
            F.col("id"), (F.col("id") % 4).alias("day")
        )
        full.write.partitionBy("day").mode("overwrite").parquet(target)
        assert spark.read.parquet(target).count() == 100

        # re-run only day=1 with corrected data (half the rows)
        patch = full.filter((F.col("day") == 1) & (F.col("id") < 50))
        patch.write.partitionBy("day").mode("overwrite").parquet(target)

        got = spark.read.parquet(target)
        assert got.filter(F.col("day") == 1).count() == patch.count()
        # other partitions untouched
        assert got.filter(F.col("day") != 1).count() == 75
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_orc_roundtrip(spark, tmp_path):
    """ORC read/write works out of the box (second columnar format)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "orc_t")
    spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v")).write.orc(p)
    back = spark.read.orc(p)
    assert back.count() == 10 and set(back.columns) == {"id", "v"}


def test_read_json_permissive_corrupt_records(spark, tmp_path):
    """Malformed JSON lines must land in the PERMISSIVE corrupt-record
    column, not fail the job — at 100 TB a single bad line must never kill
    a pipeline.  Good rows parse normally alongside."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from map_reduce485_spark.sources.io import read_json

    p = tmp_path / "j"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"k": 1, "v": "ok"}\n'
        "{this is not json}\n"
        '{"k": 2, "v": "also ok"}\n'
        '{"k": "not-an-int", "v": "half ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_json(spark, str(p), schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {(r.k, r.v) for r in good.collect()} == {(1, "ok"), (2, "also ok")}
    # the unparseable line and the type-mismatched line are both quarantined
    assert bad.count() == 2
    df.unpersist()


def test_land_parquet_recovers_broken_leftover(spark):
    """Regression (ADVICE r4): a landing dir that exists WITHOUT _SUCCESS
    (crash leftover) used to make the rename fail ENOTEMPTY forever and
    return the broken dir; now it is cleared and rebuilt."""
    import shutil
    from pathlib import Path

    from map_reduce485_spark.catalog import load_table
    from map_reduce485_spark.queries._util import land_parquet

    sf_dir = SF_SMOKE
    nation = load_table(spark, sf_dir, "nation")
    landing = Path(land_parquet(nation, sf_dir, "nation"))
    assert (landing / "_SUCCESS").exists()
    n = spark.read.parquet(str(landing)).count()

    # simulate the crash: same dir, no _SUCCESS, stale content present
    (landing / "_SUCCESS").unlink()
    landing2 = Path(land_parquet(nation, sf_dir, "nation"))
    assert landing2 == landing
    assert (landing2 / "_SUCCESS").exists()
    assert spark.read.parquet(str(landing2)).count() == n
    shutil.rmtree(landing, ignore_errors=True)  # leave no cross-test state


def test_versions_base_rebuilds_after_broken_leftover(spark):
    """`_versions_base` shares land_parquet's contract: fingerprint-keyed,
    atomically published, broken leftovers (no _latest) rebuilt."""
    import shutil
    from pathlib import Path

    from map_reduce485_spark.queries.source_formats import _versions_base

    sf_dir = SF_SMOKE
    base = Path(_versions_base(spark, sf_dir))
    assert (base / "_latest").read_text() == "v2"
    v1_rows = spark.read.parquet(str(base / "v1")).count()
    assert _versions_base(spark, sf_dir) == base  # idempotent, same dir

    (base / "_latest").unlink()  # crash leftover: dir without the pointer
    base2 = Path(_versions_base(spark, sf_dir))
    assert base2 == base and (base2 / "_latest").exists()
    assert spark.read.parquet(str(base2 / "v1")).count() == v1_rows
    shutil.rmtree(base, ignore_errors=True)


def test_python_datasource_partition_boundaries(spark):
    """The custom Python source's row multiset must be independent of the
    partition count (a split-edge bug would lose/duplicate boundary ids)."""
    from map_reduce485_spark.sources.pyds import register

    register(spark)

    def ids(parts: int) -> list[int]:
        df = (
            spark.read.format("mr485_synthetic")
            .option("n", 1000)
            .option("partitions", parts)
            .load()
        )
        return sorted(r.id for r in df.collect())

    expected = list(range(1000))
    assert ids(1) == expected
    assert ids(7) == expected   # n not divisible by parts: uneven splits
    assert ids(32) == expected
