"""Sampled validation (datatest_spark/sampling.py).

Mirrors the reference's accepted.percent ratio semantics
(reference acceptances.py:700-736) moved before the scan: a
deterministic md5-prefix sample + Wilson-bound rate estimates.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from datatest_spark import requirements as R
from datatest_spark.sampling import (
    actual_fraction,
    deterministic_sample,
    sample_predicate,
    sample_sql_predicate,
    sampled_verdicts,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [(i, f"name{i}", i % 100) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, name string, score int")


def test_sample_is_deterministic_and_layout_invariant(spark, people):
    a = sorted(r.id for r in deterministic_sample(people, "id", 0.25).collect())
    b = sorted(
        r.id
        for r in deterministic_sample(people.repartition(13), "id", 0.25).collect()
    )
    assert a == b and len(a) > 0


def test_sample_fraction_close(spark, people):
    n = deterministic_sample(people, "id", 0.25).count()
    # 2000 rows, p=.25 -> sd ~ 19; allow 5 sd
    assert abs(n - 500) < 100


def test_salt_draws_independent_sample(spark, people):
    a = {r.id for r in deterministic_sample(people, "id", 0.25).collect()}
    b = {r.id for r in deterministic_sample(people, "id", 0.25, salt="x").collect()}
    assert a != b


def test_sql_predicate_matches_spark(spark, people):
    frac, salt = 1 / 16, "audit1"
    spark_ids = sorted(
        r.id for r in deterministic_sample(people, "id", frac, salt=salt).collect()
    )
    pdf = people.toPandas()
    con = duckdb.connect()
    con.register("people", pdf)
    duck_ids = sorted(
        r[0]
        for r in con.execute(
            "SELECT id FROM people WHERE "
            + sample_sql_predicate("id", frac, salt=salt)
        ).fetchall()
    )
    assert spark_ids == duck_ids


def test_actual_fraction_resolution():
    assert actual_fraction(0.25, 4) == 0.25
    assert actual_fraction(1 / 3, 1) == 5 / 16
    with pytest.raises(ValueError):
        sample_predicate("id", 1e-9, hex_chars=4)
    with pytest.raises(ValueError):
        sample_predicate("id", 0.0)


def test_row_rule_counts_match_bruteforce(spark, people):
    frac = 0.5
    verdicts = {
        r.rule_id: r
        for r in sampled_verdicts(
            people,
            [R.interval("score", 0, 89), R.regex("name", r"^name\d{1,3}$")],
            sample_key="id",
            fraction=frac,
        ).collect()
    }
    sample = deterministic_sample(people, "id", frac)
    n = sample.count()
    bad_score = sample.where(~F.col("score").between(0, 89)).count()
    bad_name = sample.where(~F.col("name").rlike(r"^name\d{1,3}$")).count()
    iv = verdicts["interval:score"]
    assert iv.sample_rows == n and iv.violations == bad_score
    assert math.isclose(iv.est_rate, bad_score / n)
    rx = verdicts["regex:name"]
    assert rx.violations == bad_name


def test_wilson_upper_bounds_and_verdict(spark, people):
    # ~10% true violation rate; bound at 95% should cover it with room
    out = {
        r.rule_id: r
        for r in sampled_verdicts(
            people,
            [R.interval("score", 0, 89)],
            sample_key="id",
            fraction=0.5,
            max_rate=0.2,
        ).collect()
    }["interval:score"]
    assert out.est_rate < out.rate_upper <= 1.0
    assert out.rate_upper == pytest.approx(0.1, abs=0.05)
    assert out.passed is True

    strict = sampled_verdicts(
        people, [R.interval("score", 0, 89)], sample_key="id",
        fraction=0.5, max_rate=0.01,
    ).collect()[0]
    assert strict.passed is False


def test_zero_violations_still_positive_bound(spark, people):
    out = sampled_verdicts(
        people, [R.interval("score", 0, 99)], sample_key="id", fraction=0.5
    ).collect()[0]
    assert out.violations == 0
    assert out.passed is True  # max_rate=None -> zero-violation pass
    assert 0.0 < out.rate_upper < 0.01


def test_plan_rules_counted_via_engine(spark):
    rows = [(i, i // 2) for i in range(100)]  # every value duplicated
    df = spark.createDataFrame(rows, "id long, v long")
    out = {
        r.rule_id: r
        for r in sampled_verdicts(
            df,
            [R.unique("v"), R.interval("id", 0, 98)],
            sample_key="id",
            fraction=1.0,
        ).collect()
    }
    assert out["unique:v"].violations == 50  # one Extra per dup occurrence
    assert out["interval:id"].violations == 1
    assert out["unique:v"].sample_rows == 100


def test_keyed_sampling_keeps_groups_together(spark):
    # sample by group key: either both rows of a pair are in, or neither
    rows = [(i // 2, i) for i in range(400)]
    df = spark.createDataFrame(rows, "grp long, id long")
    s = deterministic_sample(df, "grp", 0.25).groupBy("grp").count().collect()
    assert all(r["count"] == 2 for r in s)
