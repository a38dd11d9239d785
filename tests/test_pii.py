"""pii_scan / pii_redact: portable-pattern PII screens."""

import pytest

from datatest_spark.operators import pii_redact, pii_scan


@pytest.fixture(scope="module")
def pii_docs(spark):
    return spark.createDataFrame(
        [
            (0, "write to alice.smith+x@example.co.uk or bob@test.org"),
            (1, "server at 192.168.0.1 and 10.0.0.254"),
            (2, "ssn 123-45-6789 leaked"),
            (3, "call +1 (415) 555-0142 now"),
            (4, "nothing sensitive here"),
            (5, None),
        ],
        "doc_id: long, text: string",
    )


class TestPiiScan:
    def test_counts_per_pattern(self, spark, pii_docs):
        rows = {r["doc_id"]: r for r in
                pii_scan(pii_docs, "text", id_col="doc_id").collect()}
        assert rows[0]["n_email"] == 2
        assert rows[1]["n_ipv4"] == 2
        assert rows[2]["n_ssn"] == 1
        assert rows[3]["n_phone"] == 1
        assert rows[4]["pii_total"] == 0
        assert rows[5]["pii_total"] == 0  # null text kept, zero counts
        # ssn also matches the (deliberately recall-oriented) phone shape
        assert rows[2]["pii_total"] == rows[2]["n_ssn"] + rows[2]["n_phone"]

    def test_keep_all_columns_when_no_id(self, spark, pii_docs):
        out = pii_scan(pii_docs, "text")
        assert set(pii_docs.columns) <= set(out.columns)

    def test_custom_patterns_and_validation(self, spark, pii_docs):
        out = pii_scan(pii_docs, "text",
                       id_col="doc_id", patterns={"digits": "[0-9]+"})
        assert out.columns == ["doc_id", "n_digits", "pii_total"]
        with pytest.raises(ValueError, match="not be empty"):
            pii_scan(pii_docs, "text", patterns={})

    def test_projection_only(self, spark, pii_docs):
        out = pii_scan(pii_docs, "text", id_col="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestPiiRedact:
    def test_redacts_all_defaults(self, spark, pii_docs):
        got = {r["doc_id"]: r["text"] for r in
               pii_redact(pii_docs, "text").collect()}
        assert got[0] == "write to [PII] or [PII]"
        assert got[1] == "server at [PII] and [PII]"
        assert "[PII]" in got[2] and "123-45-6789" not in got[2]
        assert got[4] == "nothing sensitive here"
        assert got[5] is None

    def test_out_col_preserves_original(self, spark, pii_docs):
        out = pii_redact(pii_docs, "text", out_col="clean")
        row = out.where("doc_id = 2").collect()[0]
        assert "123-45-6789" in row["text"]
        assert "123-45-6789" not in row["clean"]
