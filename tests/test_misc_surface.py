"""Coverage for the orchestration/ingest long tail: RepeatingContainer,
pandas .validate accessors, Excel/DBF guards, Tukey-fence outliers."""

import pytest

from datatest_spark import RepeatingContainer, ValidationError


class TestRepeatingContainer:
    def test_method_fanout_and_unpack(self):
        r = RepeatingContainer(["foo", "bar"]).upper()
        x, y = r
        assert (x, y) == ("FOO", "BAR")

    def test_mapping_roundtrip(self):
        r = RepeatingContainer({"a": "foo", "b": "bar"}).upper()
        assert dict(r) == {"a": "FOO", "b": "BAR"}

    def test_operator_fanout(self):
        r = RepeatingContainer([1, 2]) + 10
        assert list(r) == [11, 12]

    def test_getitem_fanout(self):
        r = RepeatingContainer(["abc", "xyz"])[0]
        assert list(r) == ["a", "x"]

    def test_spark_fanout(self, spark):
        a = spark.createDataFrame([(1,), (2,)], "v long")
        b = spark.createDataFrame([(3,)], "v long")
        counts = RepeatingContainer([a, b]).count()
        assert list(counts) == [2, 1]

    def test_rejects_strings(self):
        with pytest.raises(TypeError):
            RepeatingContainer("abc")


class TestPandasAccessor:
    def test_dataframe_validate(self, spark):
        import pandas as pd

        from datatest_spark.pandas_integration import register_accessors

        register_accessors()
        pdf = pd.DataFrame({"x": [1, 2, 9]})
        with pytest.raises(ValidationError):
            pdf.validate({1, 2, 3}, spark=spark, column="x")
        assert pdf[pdf.x < 9].validate({1, 2}, spark=spark, column="x").ok

    def test_series_validate(self, spark):
        import pandas as pd

        from datatest_spark.pandas_integration import register_accessors

        register_accessors()
        s = pd.Series([1, 2], name="x")
        assert s.validate({1, 2}, spark=spark).ok


class TestExcelDbfGuards:
    def test_read_excel_guard(self, spark, tmp_path):
        from datatest_spark.sources import read_excel

        import zipfile

        # structurally-valid xlsx zip so pandas reaches the engine
        # import (it sniffs the container before importing openpyxl)
        p = tmp_path / "t.xlsx"
        with zipfile.ZipFile(p, "w") as z:
            z.writestr("[Content_Types].xml", "<Types/>")
            z.writestr("xl/workbook.xml", "<workbook/>")
        try:
            import openpyxl  # noqa: F401

            has_engine = True
        except ImportError:
            has_engine = False
        if has_engine:
            pytest.skip("engine present; guard not exercised")
        with pytest.raises(ImportError, match="Excel engine"):
            read_excel(spark, str(p))

    def test_read_dbf_guard(self, spark, tmp_path):
        from datatest_spark.sources import read_dbf

        try:
            import dbfread  # noqa: F401

            pytest.skip("dbfread present; guard not exercised")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="dbfread"):
            read_dbf(spark, str(tmp_path / "t.dbf"))


class TestOutlierRule:
    def test_tukey_fences(self, spark):
        from datatest_spark.stats import OutlierRule
        from datatest_spark.validation import Engine

        vals = [float(v) for v in range(1, 21)] + [1000.0, -500.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = Engine(spark).validate(
            df, [OutlierRule("v", multiplier=1.5)]
        ).violations.collect()
        got = {float(r["invalid"]) for r in rows}
        assert got == {1000.0, -500.0}
        for r in rows:
            assert r["diff_type"] == "DEVIATION"
            assert r["deviation"] is not None

    def test_no_outliers_pass(self, spark):
        from datatest_spark.stats import OutlierRule
        from datatest_spark.validation import Engine

        df = spark.createDataFrame(
            [(float(v),) for v in range(100)], "v double"
        )
        assert Engine(spark).validate(df, [OutlierRule("v")]).ok


class TestExcepthook:
    def test_scrubs_internal_frames(self):
        import subprocess
        import sys

        code = (
            "import sys; sys.path.insert(0, '/root/repo')\n"
            "from datatest_spark.validation import ValidationError, install_excepthook\n"
            "from datatest_spark import Missing\n"
            "install_excepthook()\n"
            "install_excepthook()  # idempotent\n"
            "raise ValidationError([Missing(1)], 'demo')\n"
        )
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True)
        assert r.returncode != 0
        assert "ValidationError" in r.stderr
        assert "Missing(1)" in r.stderr
        # engine-internal frames are scrubbed
        assert "datatest_spark/validation.py" not in r.stderr
