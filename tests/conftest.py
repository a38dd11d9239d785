import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("datatest_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


def df_from(spark, values, key=None):
    """Build a micro-fixture DataFrame mirroring the reference's test
    data shapes: a list → one `value` column; a dict → (key, value)."""
    from pyspark.sql import types as T

    def field_type(vals):
        non_null = [v for v in vals if v is not None]
        if non_null and all(isinstance(v, bool) for v in non_null):
            return T.BooleanType()
        if non_null and all(isinstance(v, int) and not isinstance(v, bool) for v in non_null):
            return T.LongType()
        if non_null and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in non_null
        ):
            return T.DoubleType()
        return T.StringType()

    if isinstance(values, dict):
        rows = []
        for k, v in values.items():
            if isinstance(v, (list, tuple)):
                for i, x in enumerate(v):
                    rows.append((k, x, i))
            else:
                rows.append((k, v, 0))
        vt = field_type([r[1] for r in rows])
        schema = T.StructType(
            [
                T.StructField("key", field_type([r[0] for r in rows]), True),
                T.StructField("value", vt, True),
                T.StructField("pos", T.IntegerType(), False),
            ]
        )
        coerce = float if isinstance(vt, T.DoubleType) else (lambda x: x)
        rows = [(k, coerce(v) if v is not None else None, p) for k, v, p in rows]
        return spark.createDataFrame(rows, schema)

    rows = [(v, i) for i, v in enumerate(values)]
    vt = field_type([r[0] for r in rows])
    coerce = float if isinstance(vt, T.DoubleType) else (lambda x: x)
    rows = [(coerce(v) if v is not None else None, p) for v, p in rows]
    schema = T.StructType(
        [
            T.StructField("value", vt, True),
            T.StructField("pos", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="session")
def make_df(spark):
    def _make(values):
        return df_from(spark, values)

    return _make
