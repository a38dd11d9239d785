"""Snapshot-watermarked incremental validation: exactly-once delta
runs, no-op fast path, crash resume, expired-watermark refusal."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from datatest_spark import requirements as R
from datatest_spark.plans import (
    run_incremental,
    snapshot_watermark,
)
from datatest_spark.sources import append_iceberg, snapshots


@pytest.fixture()
def dirs(tmp_path):
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    yield tbl, ckpt
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def batch(spark, lo, hi, bad=()):
    rows = [(i, i % 4, 99 if i in bad else 10) for i in range(lo, hi)]
    return spark.createDataFrame(rows, "id long, part_id int, v long")


RULES = [R.interval("v", 0, 50)]


class TestRunIncremental:
    def test_first_run_validates_whole_table(self, spark, dirs):
        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        assert not run.up_to_date and run.ok
        assert run.from_snapshot_id is None
        n = sum(r["n_rows"] for r in run.checkpointed.verdicts.collect())
        assert n == 40
        wm = snapshot_watermark(ckpt)
        assert wm["to_snapshot_id"] == run.to_snapshot_id

    def test_second_run_sees_only_the_delta(self, spark, dirs):
        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run_incremental(spark, tbl, RULES, "part_id", ckpt)
        append_iceberg(batch(spark, 40, 100, bad={57}), tbl)
        run = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        assert not run.up_to_date and not run.ok
        verdicts = {r["partition_id"]: r
                    for r in run.checkpointed.verdicts.collect()}
        # delta only: 60 rows, not 100
        assert sum(v["n_rows"] for v in verdicts.values()) == 60
        assert verdicts["1"]["n_violations"] == 1  # 57 % 4
        assert len(run.history) == 2

    def test_no_new_snapshots_is_a_noop(self, spark, dirs):
        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run_incremental(spark, tbl, RULES, "part_id", ckpt)
        run = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        assert run.up_to_date and run.ok
        assert run.checkpointed is None
        assert len(run.history) == 1  # watermark did not advance

    def test_each_range_has_own_lineage(self, spark, dirs):
        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run_incremental(spark, tbl, RULES, "part_id", ckpt)
        append_iceberg(batch(spark, 40, 60), tbl)
        run2 = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        snaps = [s["snapshot_id"] for s in snapshots(tbl)]
        assert run2.from_snapshot_id == snaps[0]
        assert run2.to_snapshot_id == snaps[1]
        assert os.path.isdir(run2.history[0]["range_dir"])
        assert os.path.isdir(run2.history[1]["range_dir"])
        assert (run2.history[0]["range_dir"]
                != run2.history[1]["range_dir"])

    def test_crash_before_watermark_advance_reruns_range_idempotently(
            self, spark, dirs):
        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run1 = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        append_iceberg(batch(spark, 40, 60), tbl)
        run2 = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        # simulate a crash AFTER the range's checkpointed run committed
        # but BEFORE the watermark advanced: roll the watermark back
        wm_path = os.path.join(ckpt, "snapshot_watermark.json")
        with open(wm_path) as f:
            state = json.load(f)
        state["history"] = state["history"][:1]
        with open(wm_path, "w") as f:
            json.dump(state, f)
        run3 = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        # the range re-runs, but every partition was already committed
        assert not run3.up_to_date
        assert run3.checkpointed.processed_partitions == []
        assert sorted(run3.checkpointed.skipped_partitions) == [
            "0", "1", "2", "3"]
        assert run3.to_snapshot_id == run2.to_snapshot_id
        # and the watermark is restored
        assert snapshot_watermark(ckpt)["to_snapshot_id"] == \
            run2.to_snapshot_id

    def test_expired_watermark_raises_clearly(self, spark, dirs):
        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run_incremental(spark, tbl, RULES, "part_id", ckpt)
        wm_path = os.path.join(ckpt, "snapshot_watermark.json")
        with open(wm_path) as f:
            state = json.load(f)
        state["history"][-1]["to_snapshot_id"] = 12345  # expired id
        with open(wm_path, "w") as f:
            json.dump(state, f)
        append_iceberg(batch(spark, 40, 60), tbl)
        with pytest.raises(ValueError, match="expired"):
            run_incremental(spark, tbl, RULES, "part_id", ckpt)

    def test_exactly_once_over_three_batches(self, spark, dirs):
        tbl, ckpt = dirs
        total = 0
        for lo, hi in [(0, 30), (30, 75), (75, 120)]:
            append_iceberg(batch(spark, lo, hi), tbl)
            run = run_incremental(spark, tbl, RULES, "part_id", ckpt)
            n = sum(r["n_rows"]
                    for r in run.checkpointed.verdicts
                    .filter(F.col("run_id").isNotNull()).collect())
            total += hi - lo
            # verdicts accumulate across ranges’ parquet dirs per range;
            # this run's delta is exactly the new rows
            assert sum(
                r["n_rows"]
                for r in run.checkpointed.verdicts.collect()) == hi - lo
        assert total == 120
        assert len(run.history) == 3

    def test_delete_snapshot_in_range_refused_then_allowed(
            self, spark, dirs):
        from datatest_spark.sources import delete_where

        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run_incremental(spark, tbl, RULES, "part_id", ckpt)
        delete_where(spark, tbl, "id % 10 = 3")
        append_iceberg(batch(spark, 40, 60), tbl)
        with pytest.raises(ValueError, match="allow_deletes"):
            run_incremental(spark, tbl, RULES, "part_id", ckpt)
        run = run_incremental(spark, tbl, RULES, "part_id", ckpt,
                              allow_deletes=True)
        # added-rows-only semantics: the delta is batch 2's 20 rows
        assert sum(r["n_rows"]
                   for r in run.checkpointed.verdicts.collect()) == 20

    def test_history_records_range_metrics(self, spark, dirs):
        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40, bad={13}), tbl)
        run = run_incremental(spark, tbl, RULES, "part_id", ckpt)
        rec = run.history[-1]
        assert rec["n_rows"] == 40 and rec["n_violations"] == 1
        assert rec["ok"] is False


class TestAuditPublish:
    """Write-audit-publish: rollback on failed audit, forensics
    history, fixed re-ingest never re-sees rejected files."""

    def test_rollback_to_snapshot(self, spark, dirs):
        from datatest_spark.sources import (read_iceberg,
                                            rollback_to_snapshot,
                                            snapshots)

        tbl, _ = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        append_iceberg(batch(spark, 40, 60), tbl)
        snaps = [s["snapshot_id"] for s in snapshots(tbl)]
        assert read_iceberg(spark, tbl).count() == 60
        rollback_to_snapshot(tbl, snaps[0])
        assert read_iceberg(spark, tbl).count() == 40
        # history intact: the rolled-back snapshot stays time-travelable
        assert read_iceberg(spark, tbl, snapshot_id=snaps[1]).count() == 60
        with pytest.raises(ValueError, match="not found"):
            rollback_to_snapshot(tbl, 999)

    def test_failed_audit_rolls_back(self, spark, dirs):
        from datatest_spark.plans import run_audit_publish
        from datatest_spark.sources import read_iceberg, snapshots

        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        good = run_audit_publish(spark, tbl, RULES, "part_id", ckpt)
        assert good.ok and "rolled_back_to" not in good.history[-1]
        append_iceberg(batch(spark, 40, 60, bad={44, 45}), tbl)
        bad = run_audit_publish(spark, tbl, RULES, "part_id", ckpt)
        assert not bad.ok
        assert bad.history[-1]["rolled_back_to"] == good.to_snapshot_id
        # downstream readers see only the published 40 rows
        assert read_iceberg(spark, tbl).count() == 40
        # but the rejected snapshot stays in history for forensics
        assert len(snapshots(tbl)) == 2

    def test_fixed_reingest_after_rollback(self, spark, dirs):
        from datatest_spark.plans import run_audit_publish
        from datatest_spark.sources import read_iceberg

        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run_audit_publish(spark, tbl, RULES, "part_id", ckpt)
        append_iceberg(batch(spark, 40, 60, bad={44}), tbl)
        run_audit_publish(spark, tbl, RULES, "part_id", ckpt)  # rolls back
        # fixed re-ingest of the same id range
        append_iceberg(batch(spark, 40, 60), tbl)
        fixed = run_audit_publish(spark, tbl, RULES, "part_id", ckpt)
        assert fixed.ok
        # the audit saw exactly the re-ingested 20 rows — the rejected
        # batch's files never leak into a later delta
        assert fixed.history[-1]["n_rows"] == 20
        assert read_iceberg(spark, tbl).count() == 60

    def test_violation_budget(self, spark, dirs):
        from datatest_spark.plans import run_audit_publish
        from datatest_spark.sources import read_iceberg

        tbl, ckpt = dirs
        append_iceberg(batch(spark, 0, 40), tbl)
        run_audit_publish(spark, tbl, RULES, "part_id", ckpt)
        append_iceberg(batch(spark, 40, 60, bad={44}), tbl)
        run = run_audit_publish(spark, tbl, RULES, "part_id", ckpt,
                                max_violations=5)
        # within budget: published despite 1 violation
        assert run.history[-1].get("rolled_back_to") is None
        assert read_iceberg(spark, tbl).count() == 60
