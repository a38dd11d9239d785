"""Column profile, sketches, and drift statistics."""

import math

import pytest

from datatest_spark.stats import (
    DriftKSRule,
    DriftPSIRule,
    binned_ks,
    ks_statistic,
    profile,
    psi,
    quantile_sketch,
)
from datatest_spark.validation import Engine
from tests.conftest import df_from


class TestProfile:
    def test_single_pass_profile(self, spark):
        df = df_from(spark, [1, 2, 2, None, 5])
        rows = {r["column_name"]: r for r in profile(df, ["value"]).collect()}
        p = rows["value"]
        assert p["row_count"] == 5
        assert p["non_null"] == 4
        assert p["null_count"] == 1
        assert abs(p["null_rate"] - 0.2) < 1e-9
        assert p["min_value"] == "1" and p["max_value"] == "5"
        assert p["approx_distinct"] == 3
        assert p["quantiles"][0] == 1.0 and p["quantiles"][-1] == 5.0

    def test_multi_column_one_job(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "n long, s string"
        )
        rows = {r["column_name"]: r for r in profile(df).collect()}
        assert rows["n"]["mean"] == 2.0
        assert rows["s"]["null_count"] == 1
        assert rows["s"]["mean"] is None  # non-numeric: no numeric stats

    def test_quantile_sketch(self, spark):
        df = df_from(spark, list(range(101)))
        q = quantile_sketch(df, "value")
        assert q[0] == 0.0 and q[-1] == 100.0
        assert abs(q[10] - 50.0) <= 2  # median of 0..100


class TestDriftStats:
    def test_psi_identical_is_zero(self):
        assert psi([0.25, 0.25, 0.5], [0.25, 0.25, 0.5]) == pytest.approx(0.0)

    def test_psi_shifted_positive(self):
        assert psi([0.9, 0.1], [0.5, 0.5]) > 0.3

    def test_ks_identical(self):
        grid = [float(i) for i in range(21)]
        assert ks_statistic(grid, grid) == pytest.approx(0.0)

    def test_ks_shifted(self):
        a = [float(i) for i in range(21)]
        b = [float(i) + 10.0 for i in range(21)]
        assert ks_statistic(a, b) > 0.4

    def test_binned_ks_identical(self):
        assert binned_ks([0.25, 0.25, 0.5], [0.25, 0.25, 0.5]) == pytest.approx(0.0)

    def test_binned_ks_shift(self):
        # all mass one bucket to the right → CDF gap of the moved mass
        assert binned_ks([0.0, 0.5, 0.5], [0.5, 0.5, 0.0]) == pytest.approx(0.5)


class TestDriftRule:
    def test_no_drift_passes(self, spark):
        df = df_from(spark, list(range(1000)))
        baseline = quantile_sketch(df, "value")
        engine = Engine(spark)
        res = engine.validate(df, [DriftPSIRule("value", baseline, threshold=0.1)])
        assert res.ok

    def test_shifted_distribution_fails(self, spark):
        df = df_from(spark, list(range(1000)))
        baseline = quantile_sketch(df, "value")
        shifted = df_from(spark, [v + 800 for v in range(1000)])
        engine = Engine(spark)
        res = engine.validate(
            shifted, [DriftPSIRule("value", baseline, threshold=0.1)]
        )
        rows = res.violations.collect()
        assert len(rows) == 1
        assert rows[0]["diff_type"] == "DEVIATION"
        assert rows[0]["deviation"] > 0

    def test_ks_rule_shares_semantics(self, spark):
        df = df_from(spark, list(range(1000)))
        baseline = quantile_sketch(df, "value")
        engine = Engine(spark)
        assert engine.validate(
            df, [DriftKSRule("value", baseline, threshold=0.1)]
        ).ok
        shifted = df_from(spark, [v + 800 for v in range(1000)])
        rows = engine.validate(
            shifted, [DriftKSRule("value", baseline, threshold=0.1)]
        ).violations.collect()
        assert len(rows) == 1
        assert rows[0]["rule_id"].startswith("drift_ks")
        assert rows[0]["expected"] == "ks<=0.1"
        assert rows[0]["deviation"] > 0.5  # 80% of mass moved out of range


class TestMergeableProfiles:
    """partitioned_profile + merge_profiles: incremental profiling via
    union-mergeable HLL sketches (hll_sketch_agg/hll_union_agg)."""

    @pytest.fixture()
    def parts_df(self, spark):
        from pyspark.sql import functions as F

        return spark.range(1000).select(
            (F.col("id") % 4).alias("part_id"),
            (F.col("id") % 137).alias("v"),
        )

    def test_merged_equals_whole_table(self, spark, parts_df):
        from pyspark.sql import functions as F

        from datatest_spark.stats import merge_profiles, partitioned_profile

        merged = merge_profiles(
            partitioned_profile(parts_df, ["v"], "part_id")
        ).collect()[0]
        direct = parts_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.sum("v").alias("s"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("v").cast("string"))
            ).alias("d"),  # same string-keyed sketch the profile builds
        ).collect()[0]
        assert merged["row_count"] == direct["n"] == 1000
        assert merged["min_v"] == direct["mn"] == 0.0
        assert merged["max_v"] == direct["mx"] == 136.0
        assert merged["sum_v"] == float(direct["s"])
        # HLL union is lossless: merging partition sketches estimates
        # EXACTLY what one whole-table sketch estimates
        assert merged["distinct_est"] == direct["d"]

    def test_incremental_merge_without_rescan(self, spark, parts_df):
        """Profiles computed at different times (disjoint partition
        subsets) merge to the same answer as profiling everything at
        once — the append-only incremental contract."""
        from pyspark.sql import functions as F

        from datatest_spark.stats import merge_profiles, partitioned_profile

        old = partitioned_profile(
            parts_df.filter(F.col("part_id") < 2), ["v"], "part_id")
        new = partitioned_profile(
            parts_df.filter(F.col("part_id") >= 2), ["v"], "part_id")
        a = merge_profiles(old.unionByName(new)).collect()[0]
        b = merge_profiles(
            partitioned_profile(parts_df, ["v"], "part_id")).collect()[0]
        assert a == b
