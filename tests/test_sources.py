"""Source readers (reference get_reader/load_csv/temptable semantics)."""

import pytest

from datatest_spark.sources import (
    align_by_fieldname,
    from_records,
    iceberg_available,
    read_csv,
    read_table,
)


@pytest.fixture()
def csv_files(tmp_path):
    utf8 = tmp_path / "utf8.csv"
    utf8.write_text("col1,col2\nutf8-value,1\nñandú,2\n", encoding="utf-8")
    latin = tmp_path / "latin.csv"
    latin.write_bytes(b"col1,col2\ncaf\xe9,3\n")  # é in iso-8859-1
    return str(utf8), str(latin)


class TestCSV:
    def test_utf8(self, spark, csv_files):
        utf8, _ = csv_files
        rows = read_csv(spark, utf8).collect()
        assert {r["col1"] for r in rows} == {"utf8-value", "ñandú"}

    def test_latin1_fallback(self, spark, csv_files):
        # reference falls back to latin-1 on UnicodeDecodeError
        # (load_csv.py:39-86)
        _, latin = csv_files
        rows = read_csv(spark, latin).collect()
        assert rows[0]["col1"] == "café"


class TestRecords:
    def test_namedtuples(self, spark):
        from collections import namedtuple

        Row = namedtuple("Row", ["a", "b"])
        df = from_records(spark, [Row(1, "x"), Row(2, "y")])
        assert df.columns == ["a", "b"]
        assert df.count() == 2

    def test_dict_records(self, spark):
        df = from_records(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
        assert set(df.columns) == {"a", "b"}


class TestAlignByFieldname:
    def test_union_missing_columns(self, spark):
        # reference aligns multi-source loads by fieldname with ''
        # defaults (temptable.py:116-129)
        a = spark.createDataFrame([(1, "x")], "id long, a string")
        b = spark.createDataFrame([(2, "y")], "id long, b string")
        out = align_by_fieldname([a, b], fill="")
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["a"] == "x" and rows[1]["b"] == ""
        assert rows[2]["b"] == "y" and rows[2]["a"] == ""

    def test_union_nulls_by_default(self, spark):
        a = spark.createDataFrame([(1, "x")], "id long, a string")
        b = spark.createDataFrame([(2,)], "id long")
        out = align_by_fieldname([a, b])
        rows = {r["id"]: r for r in out.collect()}
        assert rows[2]["a"] is None


class TestReadTable:
    """Iceberg-or-parquet scan adapter (north-rule input surface)."""

    def test_parquet_path_fallback(self, spark):
        df = read_table(spark, "/root/testdata/sf0.001/region.parquet")
        assert df.count() == 5

    def test_column_pruning_param(self, spark):
        df = read_table(spark, "/root/testdata/sf0.001/region.parquet",
                        columns=["r_name"])
        assert df.columns == ["r_name"]

    def test_catalog_identifier(self, spark):
        spark.createDataFrame([(1,)], "x long").createOrReplaceTempView(
            "rt_view"
        )
        assert read_table(spark, "rt_view").count() == 1

    def test_iceberg_capability_check(self, spark):
        # this sandbox ships no Iceberg jars: the capability check must
        # say so and an explicit fmt="iceberg" must fail loudly
        assert iceberg_available(spark) is False
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="[Ii]ceberg"):
            read_table(spark, "/tmp/nope", fmt="iceberg")


class TestBucketedJoins:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """Co-bucketed tables join WITHOUT a shuffle: the scale recipe
        for the recurring data-vs-manifest referential join.  The plan
        must show SortMergeJoin with no Exchange on either side."""
        import uuid

        from pyspark.sql import functions as F

        from datatest_spark.sources.bucketed import (
            assert_no_shuffle_join, write_bucketed,
        )

        # (warehouse dir is a static conf — managed tables land in the
        # session default ./spark-warehouse, dropped in finally)
        # AQE's broadcast conversion would hide the point: force SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        suffix = uuid.uuid4().hex[:8]
        a_name, b_name = f"audio_b_{suffix}", f"manifest_b_{suffix}"
        try:
            a = spark.range(2000).select(
                F.format_string("clip-%012d", F.col("id")).alias("clip_id"),
                (F.col("id") % 97).alias("v"),
            )
            b = spark.range(2200).select(
                F.format_string("clip-%012d", F.col("id")).alias("clip_id"),
                F.concat(F.lit("t"), F.col("id")).alias("transcript_ref"),
            )
            write_bucketed(a, a_name, ["clip_id"], 8)
            write_bucketed(b, b_name, ["clip_id"], 8)
            joined = spark.table(a_name).join(spark.table(b_name), "clip_id")
            plan = assert_no_shuffle_join(joined)
            assert "SortMergeJoin" in plan
            assert joined.count() == 2000
            # control: the SAME join on unbucketed frames DOES shuffle
            plain = a.join(b, "clip_id")
            plain_plan = plain._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plain_plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql(f"DROP TABLE IF EXISTS {a_name}")
            spark.sql(f"DROP TABLE IF EXISTS {b_name}")
