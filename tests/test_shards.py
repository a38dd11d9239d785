"""Shard export (operators/shards.py): deterministic planning,
byte-exact tar materialization, manifest offsets, and the size bound.

The reference has no export layer; these tests pin the module's own
determinism contract (md5 order, zeroed ustar metadata, floor-of-
running-total shard assignment) so an independent replay — the
oracle in oracles.py — can reproduce every byte.
"""

import hashlib
import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from datatest_spark.fixtures import audio_clips_df
from datatest_spark.operators.shards import (
    plan_shards,
    shard_tars,
    tar_member_blocks,
    write_shards,
)

TARGET = 256 * 1024


@pytest.fixture(scope="module")
def corpus(spark):
    return audio_clips_df(spark, 300, parts=4).persist()


@pytest.fixture(scope="module")
def plan_rows(spark, corpus):
    return plan_shards(corpus, TARGET).collect()


def test_plan_covers_every_clip_once(corpus, plan_rows):
    # duplicate clip_ids (the i%1000==7 family) keep their own slots
    assert len(plan_rows) == corpus.count()


def test_block_bytes_is_tar_footprint(plan_rows):
    for r in plan_rows:
        blocks = lambda n: 512 + ((n + 511) // 512) * 512
        assert r["block_bytes"] == blocks(r["audio_bytes"]) + blocks(
            r["text_bytes"]
        )


def test_shard_size_bound(plan_rows):
    """Every shard's payload <= target + its own largest clip —
    the by-construction bound that makes the assembly task's memory
    O(target), never a skewed key's worth."""
    tot, mx = {}, {}
    for r in plan_rows:
        s = r["shard_id"]
        tot[s] = tot.get(s, 0) + r["block_bytes"]
        mx[s] = max(mx.get(s, 0), r["block_bytes"])
    assert all(tot[s] <= TARGET + mx[s] for s in tot)
    # and shard ids are dense from 0
    assert min(tot) == 0
    assert max(tot) == len(tot) - 1


def test_offsets_are_packed_runs(plan_rows):
    """Within a shard, offsets tile [0, sum(block_bytes)) exactly."""
    by_shard = {}
    by_shard_setdefault = by_shard.setdefault
    for r in plan_rows:
        by_shard_setdefault(r["shard_id"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["offset"])
        at = 0
        for r in rows:
            assert r["offset"] == at
            at += r["block_bytes"]


def test_tar_bytes_round_trip(spark, corpus, plan_rows):
    """Archives decode with stdlib tarfile; every member byte-equals
    its source row; manifest offsets point at the member headers."""
    src = {
        r["clip_id"]: (
            bytes(r["bytes"]) if r["bytes"] is not None else b"",
            (r["transcript"] or "").encode("utf-8"),
        )
        for r in corpus.collect()
    }
    tars = {t["shard_id"]: t for t in shard_tars(corpus, TARGET).collect()}
    assert set(tars) == {r["shard_id"] for r in plan_rows}
    checked_offsets = 0
    for sid, t in sorted(tars.items())[:10]:
        raw = bytes(t["tar_bytes"])
        assert t["tar_len"] == len(raw)
        assert t["tar_sha256"] == hashlib.sha256(raw).hexdigest()
        assert len(raw) % 10240 == 0  # tarfile record padding
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            members = tf.getmembers()
            for m in members:
                data = tf.extractfile(m).read() if m.size else b""
                cid, _, kind = m.name.rpartition(".")
                assert data == src[cid][0 if kind == "wav" else 1]
        for r in plan_rows:
            if r["shard_id"] != sid:
                continue
            name = raw[r["offset"]: r["offset"] + 100].rstrip(b"\x00")
            assert name.decode() == f'{r["clip_id"]}.wav'
            checked_offsets += 1
    assert checked_offsets > 0


def test_deterministic_across_runs(corpus):
    a = {t["shard_id"]: t["tar_sha256"]
         for t in shard_tars(corpus, TARGET).collect()}
    b = {t["shard_id"]: t["tar_sha256"]
         for t in shard_tars(corpus, TARGET).collect()}
    assert a == b


def test_salt_changes_assignment(corpus):
    base = {r["clip_id"]: r["shard_id"]
            for r in plan_shards(corpus, TARGET).collect()
            }
    salted = {r["clip_id"]: r["shard_id"]
              for r in plan_shards(corpus, TARGET, salt="v2").collect()}
    assert base != salted


def test_null_payloads_become_empty_members(spark):
    df = spark.createDataFrame(
        [("a", b"xx", "hi"), ("b", None, None)],
        "clip_id: string, bytes: binary, transcript: string",
    )
    rows = {r["clip_id"]: r for r in plan_shards(df, 10_000).collect()}
    assert rows["b"]["audio_bytes"] == 0 and rows["b"]["text_bytes"] == 0
    assert rows["b"]["block_bytes"] == 2 * 512  # two header-only members
    t = shard_tars(df, 10_000).collect()[0]
    with tarfile.open(fileobj=io.BytesIO(bytes(t["tar_bytes"]))) as tf:
        m = tf.getmember("b.wav")
        assert m.size == 0


def test_write_shards_files(tmp_path, corpus):
    out = str(tmp_path / "shards")
    manifest = write_shards(corpus, out, TARGET).collect()
    assert "tar_bytes" not in manifest[0].asDict()
    for m in manifest:
        p = os.path.join(out, f'shard-{m["shard_id"]:06d}.tar')
        raw = open(p, "rb").read()
        assert len(raw) == m["tar_len"]
        assert hashlib.sha256(raw).hexdigest() == m["tar_sha256"]
    assert len(os.listdir(out)) == len(manifest)


def test_member_name_too_long_raises(spark):
    df = spark.createDataFrame(
        [("x" * 120, b"d", "t")],
        "clip_id: string, bytes: binary, transcript: string",
    )
    with pytest.raises(Exception, match="100 bytes"):
        shard_tars(df, 10_000).collect()


def test_tar_member_blocks_expr(spark):
    df = spark.range(1).select(
        tar_member_blocks(F.lit(0)).alias("z"),
        tar_member_blocks(F.lit(1)).alias("one"),
        tar_member_blocks(F.lit(512)).alias("full"),
        tar_member_blocks(F.lit(513)).alias("spill"),
    ).collect()[0]
    assert (df["z"], df["one"], df["full"], df["spill"]) == (
        512, 1024, 1024, 1536
    )


class TestRoundTrip:
    """read_shards/read_shard_files invert shard_tars; shard_audit
    certifies the inversion with typed violation rows."""

    def test_read_shards_inverts(self, spark, corpus):
        from datatest_spark.operators.shards import read_shards

        rt = read_shards(shard_tars(corpus, TARGET))
        src = sorted(
            (r["clip_id"],
             bytes(r["bytes"]) if r["bytes"] is not None else b"",
             r["transcript"] or "")
            for r in corpus.collect()
        )
        got = sorted(
            (r["clip_id"],
             bytes(r["bytes"]) if r["bytes"] is not None else b"",
             r["transcript"] or "")
            for r in rt.collect()
        )
        assert got == src

    def test_roundtrip_offsets_match_plan(self, spark, corpus, plan_rows):
        from datatest_spark.operators.shards import read_shards

        rt = {(r["shard_id"], r["offset"]): r["clip_id"]
              for r in read_shards(shard_tars(corpus, TARGET)).collect()}
        for p in plan_rows:
            assert rt[(p["shard_id"], p["offset"])] == p["clip_id"]

    def test_read_shard_files(self, spark, tmp_path, corpus):
        from datatest_spark.operators.shards import read_shard_files

        out = str(tmp_path / "rt")
        write_shards(corpus, out, TARGET).collect()
        rt = read_shard_files(spark, out)
        assert rt.count() == corpus.count()
        assert rt.where(F.col("shard_id").isNull()).count() == 0

    def test_audit_clean_export_is_empty(self, spark, corpus):
        from datatest_spark.operators.shards import (read_shards,
                                                     shard_audit)

        rt = read_shards(shard_tars(corpus, TARGET))
        assert shard_audit(corpus, rt).count() == 0

    def test_audit_flags_missing_extra_deviation(self, spark):
        from datatest_spark.operators.shards import shard_audit

        corpus = spark.createDataFrame(
            [("a", b"1", "x"), ("b", b"2", "y"), ("d", b"4", "w"),
             ("d", b"4", "w")],
            "clip_id: string, bytes: binary, transcript: string",
        )
        shards = spark.createDataFrame(
            [("a", b"1", "x"), ("c", b"3", "z"), ("d", b"4", "w")],
            "clip_id: string, bytes: binary, transcript: string",
        )
        rows = {r["key"]: r for r in shard_audit(corpus, shards).collect()}
        assert rows["b"]["diff_type"] == "MISSING"
        assert rows["c"]["diff_type"] == "EXTRA"
        assert rows["d"]["diff_type"] == "DEVIATION"
        assert rows["d"]["deviation"] == -1.0
        assert rows["d"]["expected_num"] == 2.0
        assert set(rows) == {"b", "c", "d"}

    def test_audit_flags_corrupted_payload(self, spark, corpus):
        from datatest_spark.operators.shards import (read_shards,
                                                     shard_audit)

        rt = read_shards(shard_tars(corpus, TARGET))
        tampered = rt.withColumn(
            "bytes",
            F.when(F.col("clip_id") == "clip-000000000003",
                   F.lit(b"corrupt")).otherwise(F.col("bytes")),
        )
        rows = shard_audit(corpus, tampered).collect()
        assert {r["key"] for r in rows} == {"clip-000000000003"}
        assert sorted(r["diff_type"] for r in rows) == ["EXTRA", "MISSING"]

    def test_audit_schema_is_violation_schema(self, spark, corpus):
        from datatest_spark.operators.shards import (read_shards,
                                                     shard_audit)
        from datatest_spark.schema import VIOLATION_COLUMNS

        rt = read_shards(shard_tars(corpus, TARGET))
        assert shard_audit(corpus, rt).columns == VIOLATION_COLUMNS
