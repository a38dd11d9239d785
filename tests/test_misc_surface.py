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


class TestExcelDbfBuiltins:
    """Engine-less environments use the from-spec parsers in
    sources/formats.py (files built by hand here — no Excel/DBF
    library exists in this container to write them either)."""

    @staticmethod
    def _make_dbf(tmp_path):
        import struct

        fields = [(b"NAME", b"C", 8), (b"QTY", b"N", 6), (b"OK", b"L", 1)]
        desc = b"".join(
            name.ljust(11, b"\x00") + ftype + b"\x00" * 4
            + bytes([ln]) + b"\x00" * 15
            for name, ftype, ln in fields
        )
        rec_size = 1 + sum(f[2] for f in fields)
        recs = [
            b" " + b"alpha   " + b"    12" + b"T",
            b"*" + b"deleted " + b"    99" + b"F",   # deleted: skipped
            b" " + b"beta    " + b"  3.5 " + b"F",
        ]
        header_size = 32 + len(desc) + 1
        hdr = (b"\x03\x18\x08\x11"
               + struct.pack("<I", len(recs))
               + struct.pack("<H", header_size)
               + struct.pack("<H", rec_size) + b"\x00" * 20)
        p = tmp_path / "t.dbf"
        p.write_bytes(hdr + desc + b"\x0d" + b"".join(recs) + b"\x1a")
        return p

    def test_read_dbf_builtin_parser(self, spark, tmp_path):
        from datatest_spark.sources import read_dbf

        p = self._make_dbf(tmp_path)
        rows = sorted(
            tuple(r) for r in read_dbf(spark, str(p)).collect()
        )
        assert rows == [("alpha", 12.0, True), ("beta", 3.5, False)]

    @staticmethod
    def _make_xlsx(tmp_path):
        import zipfile

        ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        rns = ("http://schemas.openxmlformats.org/officeDocument/"
               "2006/relationships")
        p = tmp_path / "t.xlsx"
        with zipfile.ZipFile(p, "w") as z:
            z.writestr("[Content_Types].xml", "<Types/>")
            z.writestr(
                "xl/workbook.xml",
                f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
                '<sheet name="data" sheetId="1" r:id="rId1"/>'
                "</sheets></workbook>",
            )
            z.writestr(
                "xl/_rels/workbook.xml.rels",
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships">'
                '<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>'
                "</Relationships>",
            )
            z.writestr(
                "xl/sharedStrings.xml",
                f'<sst xmlns="{ns}"><si><t>name</t></si>'
                "<si><t>score</t></si><si><t>ann</t></si>"
                "<si><r><t>bo</t></r><r><t>b</t></r></si></sst>",
            )
            z.writestr(
                "xl/worksheets/sheet1.xml",
                f'<worksheet xmlns="{ns}"><sheetData>'
                '<row r="1"><c r="A1" t="s"><v>0</v></c>'
                '<c r="B1" t="s"><v>1</v></c></row>'
                '<row r="2"><c r="A2" t="s"><v>2</v></c>'
                '<c r="B2"><v>91.5</v></c></row>'
                '<row r="3"><c r="A3" t="s"><v>3</v></c>'
                '<c r="B3"><v>84</v></c></row>'
                "</sheetData></worksheet>",
            )
        return p

    def test_read_excel_builtin_parser(self, spark, tmp_path):
        from datatest_spark.sources import read_excel

        p = self._make_xlsx(tmp_path)
        rows = sorted(tuple(r) for r in read_excel(spark, str(p)).collect())
        # rich-text shared string ("bo"+"b"), float and integral numerics
        assert rows == [("ann", 91.5), ("bob", 84.0)]

    def test_read_excel_sheet_by_name(self, spark, tmp_path):
        from datatest_spark.sources import read_excel

        p = self._make_xlsx(tmp_path)
        assert read_excel(spark, str(p), sheet="data").count() == 2
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no sheet named"):
            read_excel(spark, str(p), sheet="missing")


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


class TestWorkingDirectory:
    """Reference _working_directory.py:7-97 parity."""

    def test_context_and_file_path(self, tmp_path):
        import os

        from datatest_spark import working_directory

        f = tmp_path / "data.csv"
        f.write_text("a\n1\n")
        before = os.getcwd()
        with working_directory(str(f)):  # file path → its directory
            assert os.getcwd() == str(tmp_path)
            assert open("data.csv").read().startswith("a")
        assert os.getcwd() == before

    def test_reentry_raises_and_revert(self, tmp_path):
        import os

        import pytest as _pytest

        from datatest_spark import working_directory

        wd = working_directory(str(tmp_path))
        wd.change()
        try:
            with _pytest.raises(RuntimeError, match="cannot reenter"):
                wd.change()
        finally:
            wd.revert()
        wd.revert()  # no-op when not entered
        assert os.getcwd() != str(tmp_path) or True

    def test_decorator(self, tmp_path):
        import os

        from datatest_spark import working_directory

        @working_directory(str(tmp_path))
        def inside():
            return os.getcwd()

        assert inside() == str(tmp_path)
