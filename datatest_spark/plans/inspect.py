"""Physical-plan inspection helpers.

Used by tests (and humans) to assert the plans the engine produces are
the plans we want at 100 TB: broadcast joins where a side is small,
column-pruned scans, single-scan fusion for row rules, whole-stage
codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["explain_str", "scan_count", "read_schema_columns"]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jvm_mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jvm_mode)


def scan_count(df: DataFrame) -> int:
    """Number of file scans in the physical plan (formatted mode lists
    each operator once in the detail section as ``(N) Scan ...``)."""
    import re

    plan = explain_str(df, "formatted")
    return len(re.findall(r"\(\d+\) Scan (parquet|csv)", plan))


def read_schema_columns(df: DataFrame) -> list:
    """Columns actually read by each scan (ReadSchema entries)."""
    import re

    plan = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out
