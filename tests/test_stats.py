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

    def test_single_scan_many_columns(self, spark, parts_df):
        """partitioned_profile must be ONE scan + ONE groupBy no matter
        how many columns are profiled (one agg carrying every column's
        expressions, then a zero-shuffle explode to long form)."""
        from pyspark.sql import functions as F

        from datatest_spark.stats import partitioned_profile

        df = parts_df.withColumn("w", F.col("v") * 2).withColumn(
            "u", F.col("v") + 1
        )
        prof = partitioned_profile(
            df, ["v", "w", "u"], "part_id",
            bin_edges={"v": [30.0, 90.0], "w": [10.0, 50.0, 200.0]},
        )
        plan = prof._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Range") == 1  # ONE scan of the source
        assert plan.count("Exchange") <= 2  # the groupBy shuffle (+AQE read)
        # one fused aggregate (partial + final) carries every column's
        # expressions — NOT one aggregation per column
        import re

        n_aggs = len(re.findall(r"\b(?:Object|Sort)?(?:Hash)?Aggregate\(keys=", plan))
        assert 1 <= n_aggs <= 2
        rows = prof.collect()
        assert len(rows) == 3 * 4  # columns x partitions
        assert {r["column_name"] for r in rows} == {"v", "w", "u"}

    def test_histogram_merge_exact_and_quantiles(self, spark, parts_df):
        """Fixed-edge histogram counts merge by element-wise sum to
        EXACTLY the whole-table histogram — the mergeable quantile
        sketch: interpolated quantiles from the merged counts equal the
        whole-table-histogram quantiles, and land within one bucket
        width of the exact percentiles."""
        from pyspark.sql import functions as F

        from datatest_spark.stats import (
            merge_profiles,
            partitioned_profile,
            quantiles_from_histogram,
        )

        edges = [float(e) for e in range(10, 137, 10)]
        kw = dict(bin_edges={"v": edges})
        old = partitioned_profile(
            parts_df.filter(F.col("part_id") < 2), ["v"], "part_id", **kw)
        new = partitioned_profile(
            parts_df.filter(F.col("part_id") >= 2), ["v"], "part_id", **kw)
        m = merge_profiles(old.unionByName(new)).collect()[0]
        whole = merge_profiles(
            partitioned_profile(parts_df, ["v"], "part_id", **kw)
        ).collect()[0]
        assert list(m["hist"]) == list(whole["hist"])
        assert sum(m["hist"]) == 1000
        assert list(m["hist_edges"]) == edges

        probs = [0.25, 0.5, 0.75]
        q_merged = quantiles_from_histogram(
            m["hist_edges"], m["hist"], probs, lo=m["min_v"], hi=m["max_v"])
        q_whole = quantiles_from_histogram(
            whole["hist_edges"], whole["hist"], probs,
            lo=whole["min_v"], hi=whole["max_v"])
        assert q_merged == q_whole
        exact = parts_df.agg(
            F.expr("percentile(v, array(0.25, 0.5, 0.75))").alias("q")
        ).collect()[0]["q"]
        for est, ex in zip(q_merged, exact):
            assert abs(est - ex) <= 10.0  # within one bucket width

    def test_drift_rule_from_merged_histogram(self, spark, parts_df):
        """merge_profiles hist → DriftPSIRule.from_histogram: the
        incremental drift baseline with no quantile round-trip.  Same
        distribution passes; a shifted table fires."""
        from pyspark.sql import functions as F

        from datatest_spark.stats import (
            DriftPSIRule, merge_profiles, partitioned_profile)
        from datatest_spark.validation import Engine

        edges = [float(e) for e in range(10, 137, 10)]
        m = merge_profiles(partitioned_profile(
            parts_df, ["v"], "part_id", bin_edges={"v": edges})
        ).collect()[0]
        rule = DriftPSIRule.from_histogram(
            "v", m["hist_edges"], m["hist"], threshold=0.1)
        engine = Engine(spark)
        same = parts_df.select(F.col("v").alias("v"))
        assert engine.validate(same, [rule]).ok
        shifted = parts_df.select((F.col("v") + 500).alias("v"))
        rule2 = DriftPSIRule.from_histogram(
            "v", m["hist_edges"], m["hist"], threshold=0.1)
        rows = engine.validate(shifted, [rule2]).violations.collect()
        assert len(rows) == 1 and rows[0]["deviation"] > 0.5
