"""ReconcileRule — symmetric two-table audit (raw vs curated).

Generalizes the reference's table-of-requirements mapping semantics
(reference requirements.py:801-874) to whole-row reconciliation.
"""

import pytest
from pyspark.sql import functions as F

from datatest_spark import validate, ValidationError
from datatest_spark import requirements as R


@pytest.fixture()
def pair(spark):
    data = spark.createDataFrame(
        [
            (1, "a", 10.0, "p0"),
            (2, "b", 20.0, "p0"),
            (3, "c", 30.5, "p1"),   # numeric drift vs ref 30.0
            (4, "X", 40.0, "p1"),   # string mismatch vs ref "d"
            (5, "e", None, "p1"),   # null vs ref 50.0
            (7, "g", 70.0, "p1"),   # extra: not in ref
        ],
        "id long, name string, amount double, part string",
    )
    ref = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (4, "d", 40.0),
            (5, "e", 50.0),
            (6, "f", 60.0),        # missing from data
        ],
        "id long, name string, amount double",
    )
    return data, ref


def _viols(data, ref, **kw):
    with pytest.raises(ValidationError) as exc:
        validate(data, rules=[R.reconcile(ref, **kw)],
                 partition_col=kw.pop("partition_col", None))
    return exc.value.violations_df.collect()


def test_reconcile_full_diff(spark, pair):
    data, ref = pair
    rows = _viols(data, ref, on="id", abs_tol=0.25)
    by = {(r.diff_type, r.key, r.column): r for r in rows}
    # missing key 6, extra key 7
    assert ("MISSING", "6", "id") in by
    assert ("EXTRA", "7", "id") in by
    # numeric drift beyond tol -> DEVIATION with signed delta
    d = by[("DEVIATION", "3", "amount")]
    assert d.deviation == pytest.approx(0.5) and d.expected_num == 30.0
    # string mismatch -> INVALID carrying both values
    iv = by[("INVALID", "4", "name")]
    assert iv.invalid == "X" and iv.expected == "d"
    # null vs value -> INVALID, no numeric deviation
    nv = by[("INVALID", "5", "amount")]
    assert nv.deviation is None and nv.invalid is None
    # nothing else fired
    assert len(rows) == 5


def test_reconcile_tolerance_suppresses_small_drift(spark, pair):
    data, ref = pair
    rows = _viols(data, ref, on="id", abs_tol=1.0)
    assert not any(r.diff_type == "DEVIATION" and r.column == "amount"
                   for r in rows)


def test_reconcile_selected_columns_only(spark, pair):
    data, ref = pair
    rows = _viols(data, ref, on="id", columns=["name"])
    assert {r.column for r in rows} <= {"name", "id"}
    assert any(r.diff_type == "INVALID" and r.key == "4" for r in rows)


def test_reconcile_direction_switches(spark, pair):
    data, ref = pair
    rows = _viols(data, ref, on="id", check_missing=False)
    assert not any(r.diff_type == "MISSING" for r in rows)
    rows = _viols(data, ref, on="id", check_extra=False)
    assert not any(r.diff_type == "EXTRA" for r in rows)


def test_reconcile_multi_key_render(spark):
    a = spark.createDataFrame([(1, 2, "x")], "k1 long, k2 long, v string")
    b = spark.createDataFrame([(1, 2, "x"), (3, 4, "y")],
                              "k1 long, k2 long, v string")
    rows = _viols(a, b, on=["k1", "k2"])
    assert rows[0].diff_type == "MISSING" and rows[0].key == "(3, 4)"


def test_reconcile_partition_attribution(spark, pair):
    data, ref = pair
    with pytest.raises(ValidationError) as exc:
        validate(data, rules=[R.reconcile(ref, on="id", abs_tol=0.25)],
                 partition_col="part")
    rows = exc.value.violations_df.collect()
    by = {(r.diff_type, r.key): r for r in rows}
    assert by[("EXTRA", "7")].partition_id == "p1"
    assert by[("DEVIATION", "3")].partition_id == "p1"
    # missing rows exist only on the ref side -> no data partition
    assert by[("MISSING", "6")].partition_id is None


def test_reconcile_single_join_plan(spark, pair):
    data, ref = pair
    plan = (
        R.reconcile(ref, on="id")
        .plan(R.ValidationContext(data))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Join") == 1  # whole audit is one full-outer join


def test_reconcile_clean_pass(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    validate(a, rules=[R.reconcile(a.sparkSession.createDataFrame(
        [(1, "x"), (2, "y")], "id long, v string"), on="id")])
