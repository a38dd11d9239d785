"""Squint-style query layer (reference __past__/squint/query.py semantics)."""

import pytest

from datatest_spark.query import Select


@pytest.fixture(scope="module")
def sel(spark):
    df = spark.createDataFrame(
        [
            ("a", "x", "10"),
            ("a", "y", "20"),
            ("b", "x", "5"),
            ("b", "y", "oops"),  # text coerces to 0.0 in SQLite sums
            ("b", "z", None),
        ],
        "A string, B string, C string",
    )
    return Select(df)


class TestSelection:
    def test_single_column(self, sel):
        assert sorted(sel("A").fetch()) == ["a", "a", "b", "b", "b"]

    def test_tuple_columns(self, sel):
        got = sel(("A", "B")).fetch()
        assert ("a", "x") in got and len(got) == 5

    def test_dict_groupby(self, sel):
        got = sel({"A": "C"}).fetch()
        assert got == {"a": ["10", "20"], "b": ["5", "oops", None]}

    def test_where_equality(self, sel):
        assert sorted(sel("B", A="a").fetch()) == ["x", "y"]

    def test_where_set_membership(self, sel):
        got = sel("C", B={"x"}).fetch()
        assert sorted(got) == ["10", "5"]

    def test_where_callable(self, sel):
        got = sel("A", C=lambda v: v is not None and v.isdigit()).fetch()
        assert sorted(got) == ["a", "a", "b"]


class TestSQLiteAggregates:
    def test_sum_text_coercion(self, sel):
        # 'oops' → 0.0, NULL skipped (reference query.py:417-442)
        got = sel({"A": "C"}).sum().fetch()
        assert got == {"a": 30.0, "b": 5.0}

    def test_global_sum(self, sel):
        assert sel("C").sum().fetch() == 35.0

    def test_count_non_null(self, sel):
        got = sel({"A": "C"}).count().fetch()
        assert got == {"a": 2, "b": 2}

    def test_avg(self, sel):
        got = sel({"A": "C"}).avg().fetch()
        assert got == {"a": 15.0, "b": 2.5}

    def test_min_cross_type(self, sel):
        # numeric sorts before text (reference query.py:457-482)
        got = sel({"A": "C"}).min().fetch()
        assert got["b"] == "5"  # 5 < 'oops', NULL skipped

    def test_max_cross_type(self, sel):
        got = sel({"A": "C"}).max().fetch()
        assert got["b"] == "oops"  # text > numeric


class TestTransforms:
    def test_distinct(self, sel):
        assert sorted(sel("A").distinct().fetch()) == ["a", "b"]

    def test_filter(self, sel):
        got = sel("C").filter(lambda v: v is not None and v.isdigit()).fetch()
        assert sorted(got) == ["10", "20", "5"]

    def test_map(self, sel):
        got = sel("B", A="a").map(str.upper).fetch()
        assert sorted(got) == ["X", "Y"]

    def test_reduce(self, sel):
        total = sel("C", B="x").map(float).reduce(lambda a, b: float(a) + float(b))
        assert total == 15.0

    def test_apply(self, sel):
        got = sel({"A": "B"}).apply(len)
        assert got == {"a": 2, "b": 3}

    def test_to_csv(self, sel, tmp_path):
        out = str(tmp_path / "out_csv")
        sel(("A", "B")).to_csv(out)
        import glob

        files = glob.glob(out + "/*.csv")
        assert files


class TestStreaming:
    def test_foreach_batch_validation(self, spark, tmp_path):
        from datatest_spark import requirements as R
        from datatest_spark.streaming import validate_stream

        src = str(tmp_path / "stream_src")
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "id long, v double"
        ).write.parquet(src)

        stream = spark.readStream.schema("id long, v double").parquet(src)
        viol_path = str(tmp_path / "violations")
        q = validate_stream(
            stream,
            [R.interval("v", 0, 40)],
            violations_path=viol_path,
            checkpoint_path=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
        got = spark.read.parquet(viol_path)
        assert got.count() == 9  # 41..49 out of range
        assert got.select("batch_id").distinct().count() == 1


class TestMapTypeFidelity:
    """squint preserves mapped value types (reference query.py:296-324)."""

    def test_map_int_sum(self, spark):
        from datatest_spark.query import Select

        df = spark.createDataFrame([(1,), (2,), (3,)], "A long")
        got = Select(df)("A").map(lambda x: x * 2).sum().fetch()
        assert got == 12  # NOT '12' — numeric type preserved

    def test_map_float(self, spark):
        from datatest_spark.query import Select

        df = spark.createDataFrame([(1,), (2,)], "A long")
        got = Select(df)("A").map(lambda x: x / 2).fetch()
        assert sorted(got) == [0.5, 1.0]

    def test_map_string_fallback(self, spark):
        from datatest_spark.query import Select

        df = spark.createDataFrame([(1,), (2,)], "A long")
        got = Select(df)("A").map(lambda x: f"v{x}").fetch()
        assert sorted(got) == ["v1", "v2"]

    def test_starmap(self, spark):
        from datatest_spark.query import Select

        df = spark.createDataFrame([(2, 3), (4, 5)], "A long, B long")
        got = Select(df)(("A", "B")).starmap(lambda a, b: a * b).fetch()
        assert sorted(got) == [6, 20]

    def test_starmap_sum(self, spark):
        from datatest_spark.query import Select

        df = spark.createDataFrame([(2, 3), (4, 5)], "A long, B long")
        assert Select(df)(("A", "B")).starmap(lambda a, b: a * b).sum().fetch() == 26


class TestFlattenUnwrap:
    """Reference query.py:790-798,368-414 — named chain methods."""

    def test_flatten_grouped(self, sel):
        got = sel({"A": "C"}).flatten().fetch()
        assert sorted(got, key=repr) == sorted(
            [("a", "10"), ("a", "20"), ("b", "5"), ("b", "oops"), ("b", None)],
            key=repr,
        )

    def test_flatten_grouped_agg(self, sel):
        # dict of scalars flattens to (key, value) tuples
        got = sel({"A": "C"}).sum().flatten().fetch()
        assert sorted(got) == [("a", 30.0), ("b", 5.0)]

    def test_flatten_non_dict_noop(self, sel):
        q = sel("A")
        assert sorted(q.flatten().fetch()) == sorted(q.fetch())

    def test_unwrap_single_item_list(self, sel):
        got = sel("B", A="a", C="10").unwrap().fetch()
        assert got == "x"  # 1-element list unwraps to the element

    def test_unwrap_multi_item_unchanged(self, sel):
        got = sel("B", A="a").unwrap().fetch()
        assert sorted(got) == ["x", "y"]

    def test_unwrap_grouped_values(self, sel):
        got = sel({"A": "B"}, B={"x"}).unwrap().fetch()
        assert got == {"a": "x", "b": "x"}  # single-item groups unwrap


class TestLegacyApi07:
    """Legacy BaseSource surface (reference __past__/api07_sources.py)."""

    def test_mapreduce_global(self, sel):
        got = sel.mapreduce(
            lambda v: float(v) if v and v.isdigit() else 0.0,
            lambda x, y: x + y,
            "C",
        )
        assert got == 35.0

    def test_mapreduce_keyed(self, sel):
        got = sel.mapreduce(
            lambda v: 1, lambda x, y: x + y, "C", keys="A"
        )
        assert got == {"a": 2, "b": 3}

    def test_mapreduce_tuple_columns(self, sel):
        got = sel.mapreduce(
            lambda t: f"{t[0]}-{t[1]}",
            lambda x, y: x + "," + y,
            ("A", "B"),
            B={"x"},
        )
        assert sorted(got.split(",")) == ["a-x", "b-x"]

    def test_legacy_sum_decimal(self, sel):
        import decimal

        # 'oops' is truthy → Decimal('oops') raises in the reference
        # too (mapper maps falsy→0 only), so sum over the digit rows
        got = sel.sum("C", keys="A",
                      C=lambda v: v is None or not v or v.isdigit())
        assert got == {"a": decimal.Decimal("30"), "b": decimal.Decimal("5")}

    def test_legacy_count_truthy(self, sel):
        got = sel.count("C", keys="A")
        assert got == {"a": 2, "b": 2}  # None is falsy → 0
