"""Structured Streaming wrapper: rules run per micro-batch, violations
land partitioned by batch_id, and the write is idempotent per batch."""

import os

import pytest
from pyspark.sql import functions as F

from datatest_spark import requirements as R
from datatest_spark.streaming import validate_stream


@pytest.fixture()
def stream_dirs(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "violations")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    return src, out, ckpt


def _write_input(spark, src, offset=0):
    rows = [(i + offset, 10 if (i + offset) % 7 != 3 else 99) for i in range(20)]
    (
        spark.createDataFrame(rows, "id long, v long")
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )


class TestValidateStream:
    def test_violations_flow_through(self, spark, stream_dirs):
        src, out, ckpt = stream_dirs
        _write_input(spark, src)
        stream = spark.readStream.schema("id long, v long").parquet(src)
        q = validate_stream(
            stream, [R.interval("v", 0, 50)], out, ckpt,
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        # ids 3, 10, 17 have v=99 → 3 Deviation rows
        assert got.count() == 3
        assert got.select("batch_id").distinct().count() == 1
        assert set(r["diff_type"] for r in got.collect()) == {"DEVIATION"}

    def test_restart_resumes_without_duplicates(self, spark, stream_dirs):
        src, out, ckpt = stream_dirs
        _write_input(spark, src)
        stream = spark.readStream.schema("id long, v long").parquet(src)
        rules = [R.interval("v", 0, 50)]
        validate_stream(stream, rules, out, ckpt).awaitTermination(120)
        n1 = spark.read.parquet(out).count()

        # restart with NO new data: the checkpoint says everything is
        # committed, so no rows may be re-appended
        stream2 = spark.readStream.schema("id long, v long").parquet(src)
        validate_stream(stream2, rules, out, ckpt).awaitTermination(120)
        assert spark.read.parquet(out).count() == n1

        # new data arrives → only the new batch's violations append
        _write_input(spark, src, offset=100)
        stream3 = spark.readStream.schema("id long, v long").parquet(src)
        validate_stream(stream3, rules, out, ckpt).awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == n1 + 3
        assert got.select("batch_id").distinct().count() == 2
