"""From-spec Avro OCF + Iceberg metadata reader/writer tests."""

import json
import os

import pytest

from datatest_spark.sources.avro_ocf import read_ocf, write_ocf
from datatest_spark.sources.iceberg_lite import (
    append_equality_deletes,
    append_iceberg,
    delete_where,
    expire_snapshots,
    incremental_files,
    is_iceberg_table,
    plan_files,
    read_iceberg,
    read_iceberg_incremental,
    snapshots,
)
from datatest_spark.sources.readers import read_table


class TestAvroOcf:
    SCHEMA = {
        "type": "record", "name": "row",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "opt", "type": ["null", "double"], "default": None},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "blob", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
        ],
    }

    def _rows(self):
        return [
            {"s": "héllo", "n": -(1 << 40), "opt": 2.5,
             "tags": ["a", "b"], "props": {"x": 1, "y": -2},
             "blob": b"\x00\xfe", "flag": True},
            {"s": "", "n": 0, "opt": None, "tags": [], "props": {},
             "blob": b"", "flag": False},
        ]

    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_round_trip(self, tmp_path, codec):
        p = str(tmp_path / "t.avro")
        write_ocf(p, self.SCHEMA, self._rows(), codec=codec)
        meta, out = read_ocf(p)
        assert out == self._rows()
        assert meta["avro.codec"] == codec
        assert meta["avro.schema"]["name"] == "row"

    def test_rejects_non_avro(self, tmp_path):
        p = str(tmp_path / "x.avro")
        with open(p, "wb") as f:
            f.write(b"PAR1 not avro")
        with pytest.raises(ValueError, match="not an Avro"):
            read_ocf(p)

    def test_named_type_reference(self, tmp_path):
        schema = {
            "type": "record", "name": "outer",
            "fields": [
                {"name": "a", "type": {
                    "type": "record", "name": "inner",
                    "fields": [{"name": "v", "type": "int"}]}},
                {"name": "b", "type": "inner"},  # reference by name
            ],
        }
        rows = [{"a": {"v": 1}, "b": {"v": 2}}]
        p = str(tmp_path / "n.avro")
        write_ocf(p, schema, rows)
        assert read_ocf(p)[1] == rows


@pytest.fixture()
def table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(
        [(i, f"doc {i}", ["en", "fr", "zh"][i % 3]) for i in range(30)],
        "doc_id long, text string, lang string",
    ).repartition(3)
    s1 = append_iceberg(df1, tbl, partition_by="lang")
    df2 = spark.createDataFrame(
        [(i, f"doc {i}", "de") for i in range(100, 110)],
        "doc_id long, text string, lang string",
    )
    s2 = append_iceberg(df2, tbl, partition_by="lang")
    return tbl, s1, s2


class TestIcebergLite:
    def test_round_trip_and_schema(self, spark, table):
        tbl, _, _ = table
        assert is_iceberg_table(tbl)
        df = read_iceberg(spark, tbl)
        assert df.count() == 40
        assert df.columns == ["doc_id", "text", "lang"]
        assert dict(df.dtypes)["doc_id"] == "bigint"
        got = {r["doc_id"] for r in df.collect()}
        assert got == set(range(30)) | set(range(100, 110))

    def test_time_travel(self, spark, table):
        tbl, s1, s2 = table
        assert read_iceberg(spark, tbl, snapshot_id=s1).count() == 30
        assert read_iceberg(spark, tbl, snapshot_id=s2).count() == 40
        hist = snapshots(tbl)
        assert [s["snapshot_id"] for s in hist] == [s1, s2]
        assert all(s["summary"]["operation"] == "append" for s in hist)

    def test_unknown_snapshot_raises(self, spark, table):
        tbl, _, _ = table
        with pytest.raises(ValueError, match="snapshot 12345 not found"):
            plan_files(tbl, snapshot_id=12345)

    def test_partition_pruning_drops_files(self, spark, table):
        tbl, _, _ = table
        full = plan_files(tbl)
        en = plan_files(tbl, partition_filters={"lang": "en"})
        assert en["pruned_files"] > 0
        assert len(en["files"]) < full["total_files"]
        assert en["identity_fields"] == ["lang"]
        df = read_iceberg(spark, tbl, partition_filters={"lang": {"en"}})
        rows = df.collect()
        assert len(rows) == 10
        assert {r["lang"] for r in rows} == {"en"}

    def test_pruning_filter_multiple_values(self, spark, table):
        tbl, _, _ = table
        df = read_iceberg(spark, tbl,
                          partition_filters={"lang": ["en", "de"]})
        assert df.count() == 20

    def test_record_count_from_metadata(self, table):
        tbl, _, _ = table
        assert plan_files(tbl)["record_count"] == 40

    def test_read_table_falls_through_to_lite(self, spark, table):
        tbl, _, _ = table
        df = read_table(spark, tbl, fmt="iceberg", columns=["doc_id"])
        assert df.columns == ["doc_id"]
        assert df.count() == 40

    def test_spec_mismatch_rejected(self, spark, table):
        tbl, _, _ = table
        df = spark.createDataFrame([(1, "x", "en")],
                                   "doc_id long, text string, lang string")
        with pytest.raises(ValueError, match="partition spec differs"):
            append_iceberg(df, tbl, partition_by=None)

    def test_unpartitioned_table(self, spark, tmp_path):
        tbl = str(tmp_path / "flat")
        df = spark.createDataFrame([(1, "a"), (2, "b")],
                                   "id long, v string")
        append_iceberg(df, tbl)
        out = read_iceberg(spark, tbl)
        assert out.count() == 2
        assert plan_files(tbl)["identity_fields"] == []

    def test_corrupt_delete_manifest_refused(self, spark, table):
        tbl, _, s2 = table
        # graft content=1 onto the DATA manifest: its entries still say
        # content=0, which is spec-invalid inside a delete manifest —
        # the reader must refuse rather than mis-read
        meta_path = sorted(
            p for p in os.listdir(os.path.join(tbl, "metadata"))
            if p.endswith(".metadata.json"))[-1]
        with open(os.path.join(tbl, "metadata", meta_path)) as f:
            meta = json.load(f)
        cur = next(s for s in meta["snapshots"]
                   if s["snapshot-id"] == meta["current-snapshot-id"])
        mlist = cur["manifest-list"]
        schema_meta, entries = read_ocf(mlist)
        entries[0]["content"] = 1  # pretend it's a delete manifest
        write_ocf(mlist, schema_meta["avro.schema"], entries)
        with pytest.raises(ValueError, match="DELETE manifest"):
            plan_files(tbl)

    def test_audio_schema_types_round_trip(self, spark, tmp_path):
        # the north-rule input shape: int32 + binary columns included
        from datatest_spark.fixtures import audio_clips_df

        tbl = str(tmp_path / "audio")
        clips = audio_clips_df(spark, 120, parts=4)
        append_iceberg(clips, tbl, partition_by="part_id")
        back = read_iceberg(spark, tbl)
        assert back.count() == 120
        assert dict(back.dtypes)["sr_hz"] == "int"
        assert dict(back.dtypes)["bytes"] == "binary"
        # bit_xor, not sum: ANSI mode raises on 64-bit hash-sum overflow
        a = clips.selectExpr("bit_xor(xxhash64(clip_id, sr_hz, dur_ms))") \
                 .collect()[0][0]
        b = back.selectExpr("bit_xor(xxhash64(clip_id, sr_hz, dur_ms))") \
                .collect()[0][0]
        assert a == b

    def test_second_append_reuses_table_via_hint(self, spark, table):
        tbl, _, _ = table
        hint = os.path.join(tbl, "metadata", "version-hint.text")
        assert os.path.isfile(hint)
        with open(hint) as f:
            assert int(f.read()) == 2


ALL_IDS = set(range(30)) | set(range(100, 110))


class TestRowLevelDeletes:
    """Iceberg v2 merge-on-read: position + equality deletes applied
    as anti-joins on ``_metadata.file_path``/``row_index`` and
    eqNullSafe columns, under the spec's sequence-number rules."""

    def test_position_delete_where(self, spark, table):
        tbl, _, s2 = table
        delete_where(spark, tbl, "doc_id % 7 = 3")
        got = {r["doc_id"] for r in read_iceberg(spark, tbl).collect()}
        assert got == {i for i in ALL_IDS if i % 7 != 3}
        # time travel to the pre-delete snapshot still sees all rows
        assert read_iceberg(spark, tbl, snapshot_id=s2).count() == 40
        hist = snapshots(tbl)
        assert hist[-1]["summary"]["operation"] == "delete"
        plan = plan_files(tbl)
        assert len(plan["position_deletes"]) == 1
        assert plan["position_deletes"][0]["record_count"] == \
            sum(1 for i in ALL_IDS if i % 7 == 3)

    def test_position_delete_spares_later_appends(self, spark, table):
        tbl, _, _ = table
        delete_where(spark, tbl, "doc_id = 5")
        df = spark.createDataFrame(
            [(5, "doc 5 again", "en")],
            "doc_id long, text string, lang string")
        append_iceberg(df, tbl, partition_by="lang")
        rows = [r for r in read_iceberg(spark, tbl).collect()
                if r["doc_id"] == 5]
        assert len(rows) == 1 and rows[0]["text"] == "doc 5 again"

    def test_equality_delete_global(self, spark, table):
        tbl, _, _ = table
        vals = spark.createDataFrame([(2,), (104,)], "doc_id long")
        append_equality_deletes(spark, tbl, vals)
        got = {r["doc_id"] for r in read_iceberg(spark, tbl).collect()}
        assert got == ALL_IDS - {2, 104}

    def test_equality_delete_strictly_older_only(self, spark, table):
        tbl, _, _ = table
        vals = spark.createDataFrame([(7,)], "doc_id long")
        append_equality_deletes(spark, tbl, vals)
        # re-insert doc_id=7 AFTER the delete: the spec's strict
        # data_seq < delete_seq rule keeps the new row alive
        df = spark.createDataFrame(
            [(7, "reborn", "fr")], "doc_id long, text string, lang string")
        append_iceberg(df, tbl, partition_by="lang")
        rows = [r for r in read_iceberg(spark, tbl).collect()
                if r["doc_id"] == 7]
        assert len(rows) == 1 and rows[0]["text"] == "reborn"

    def test_equality_delete_partition_scoped(self, spark, table):
        tbl, _, _ = table
        # doc_id 0 lives in lang='en'; a delete scoped to 'fr' must
        # not touch it, one scoped to 'en' must
        vals = spark.createDataFrame([(0,)], "doc_id long")
        append_equality_deletes(spark, tbl, vals, partition={"lang": "fr"})
        got = {r["doc_id"] for r in read_iceberg(spark, tbl).collect()}
        assert 0 in got
        append_equality_deletes(spark, tbl, vals, partition={"lang": "en"})
        got = {r["doc_id"] for r in read_iceberg(spark, tbl).collect()}
        assert 0 not in got and got == ALL_IDS - {0}

    def test_partition_scope_must_be_spec_field(self, spark, table):
        tbl, _, _ = table
        vals = spark.createDataFrame([(0,)], "doc_id long")
        with pytest.raises(ValueError, match="not identity partition"):
            append_equality_deletes(spark, tbl, vals,
                                    partition={"doc_id": 0})

    def test_equality_columns_must_exist(self, spark, table):
        tbl, _, _ = table
        vals = spark.createDataFrame([(0,)], "nope long")
        with pytest.raises(ValueError, match="not table columns"):
            append_equality_deletes(spark, tbl, vals)

    def test_combined_deletes_and_pruning(self, spark, table):
        tbl, _, _ = table
        delete_where(spark, tbl, "doc_id % 2 = 0")
        vals = spark.createDataFrame([(3,)], "doc_id long")
        append_equality_deletes(spark, tbl, vals)
        out = read_iceberg(spark, tbl, partition_filters={"lang": "en"})
        got = {r["doc_id"] for r in out.collect()}
        # lang='en' rows are doc_id % 3 == 0 within 0..29
        expect = {i for i in range(30)
                  if i % 3 == 0 and i % 2 != 0 and i != 3}
        assert got == expect

    def test_read_table_applies_deletes(self, spark, table):
        tbl, _, _ = table
        delete_where(spark, tbl, "doc_id >= 100")
        df = read_table(spark, tbl, fmt="iceberg", columns=["doc_id"])
        assert df.count() == 30

    def test_deletes_on_empty_table_raise(self, spark, tmp_path):
        tbl = str(tmp_path / "never")
        with pytest.raises((ValueError, FileNotFoundError)):
            delete_where(spark, tbl, "1 = 1")

    def test_random_op_sequences_match_set_model(self, spark, tmp_path):
        """Model-based: a fixed-seed interleaving of appends, position
        deletes, and (optionally scoped) equality deletes, checked
        against a pure-Python physical-row model — INCLUDING time
        travel to every intermediate snapshot after all ops ran, which
        pins that later deletes never leak into older snapshots."""
        import numpy as np

        rng = np.random.RandomState(20260819)
        for trial in range(2):
            tbl = str(tmp_path / f"model{trial}")
            partitioned = trial % 2 == 0
            phys = []   # physical rows: (id, v, lang, data_seq, alive)
            seq = 0
            snaps = []  # (snapshot_id, expected live rows at that point)
            next_id = 0
            for step in range(6):
                op = int(rng.randint(0, 3)) if step else 0
                seq += 1
                if op == 0:  # append 5-15 fresh rows
                    n = 5 + int(rng.randint(0, 11))
                    rows = []
                    for _ in range(n):
                        rows.append((next_id, int(rng.randint(0, 7)),
                                     ["en", "fr"][int(rng.randint(0, 2))]))
                        next_id += 1
                    df = spark.createDataFrame(
                        rows, "id long, v long, lang string")
                    sid = append_iceberg(
                        df, tbl,
                        partition_by="lang" if partitioned else None)
                    phys.extend(
                        {"id": i, "v": v, "lang": g, "seq": seq,
                         "alive": True} for i, v, g in rows)
                elif op == 1:  # position-delete v % k == r
                    k = int(rng.randint(2, 5))
                    r = int(rng.randint(0, k))
                    sid = delete_where(spark, tbl, f"v % {k} = {r}")
                    for p in phys:  # matches RAW rows — idempotent
                        if p["v"] % k == r:
                            p["alive"] = False
                else:  # equality-delete on v, sometimes scoped
                    vals = sorted({int(rng.randint(0, 7))
                                   for _ in range(2)})
                    vdf = spark.createDataFrame([(x,) for x in vals],
                                                "v long")
                    scope = None
                    if partitioned and rng.randint(0, 2):
                        scope = {"lang": ["en", "fr"][
                            int(rng.randint(0, 2))]}
                    sid = append_equality_deletes(spark, tbl, vdf,
                                                  partition=scope)
                    for p in phys:  # strict: only strictly-older data
                        if (p["seq"] < seq and p["v"] in vals
                                and (scope is None
                                     or p["lang"] == scope["lang"])):
                            p["alive"] = False
                snaps.append((sid, sorted(
                    (p["id"], p["v"], p["lang"])
                    for p in phys if p["alive"])))
            for sid, expected in snaps:
                got = sorted(
                    (r["id"], r["v"], r["lang"])
                    for r in read_iceberg(spark, tbl,
                                          snapshot_id=sid).collect())
                assert got == expected, (trial, sid)


class TestIncrementalScan:
    """Incremental append scan — (from, to] snapshot-range reads
    (iceberg_lite.incremental_files / read_iceberg_incremental)."""

    def test_range_reads_only_the_delta(self, spark, table):
        tbl, s1, s2 = table
        df = read_iceberg_incremental(spark, tbl, from_snapshot_id=s1)
        got = {r["doc_id"] for r in df.collect()}
        assert got == set(range(100, 110))
        plan = incremental_files(tbl, from_snapshot_id=s1)
        assert plan["record_count"] == 10
        assert plan["snapshot_ids"] == [s2]
        assert plan["to_snapshot_id"] == s2

    def test_from_table_creation(self, spark, table):
        tbl, s1, _ = table
        first = read_iceberg_incremental(spark, tbl, to_snapshot_id=s1)
        assert first.count() == 30
        everything = read_iceberg_incremental(spark, tbl)
        assert everything.count() == 40

    def test_empty_range_keeps_schema(self, spark, table):
        tbl, _, s2 = table
        df = read_iceberg_incremental(spark, tbl, from_snapshot_id=s2)
        assert df.count() == 0
        assert df.columns == ["doc_id", "text", "lang"]
        assert dict(df.dtypes)["doc_id"] == "bigint"

    def test_three_snapshot_composition(self, spark, table):
        tbl, s1, s2 = table
        df3 = spark.createDataFrame(
            [(i, f"doc {i}", "en") for i in range(200, 205)],
            "doc_id long, text string, lang string")
        s3 = append_iceberg(df3, tbl, partition_by="lang")
        ids = lambda f, t: {  # noqa: E731
            r["doc_id"] for r in read_iceberg_incremental(
                spark, tbl, f, t).collect()}
        assert ids(s1, s3) == set(range(100, 110)) | set(range(200, 205))
        assert ids(s2, s3) == set(range(200, 205))
        # composition: (s1,s2] ∪ (s2,s3] == (s1,s3]
        assert ids(s1, s2) | ids(s2, s3) == ids(s1, s3)

    def test_delete_in_range_refused_by_default(self, spark, table):
        tbl, s1, _ = table
        delete_where(spark, tbl, "doc_id % 2 = 0")
        df4 = spark.createDataFrame(
            [(300, "doc 300", "fr")],
            "doc_id long, text string, lang string")
        append_iceberg(df4, tbl, partition_by="lang")
        with pytest.raises(ValueError, match="not an append"):
            incremental_files(tbl, from_snapshot_id=s1)
        # opt-in: appended rows only, gross of the in-range delete
        got = {r["doc_id"] for r in read_iceberg_incremental(
            spark, tbl, from_snapshot_id=s1,
            allow_deletes=True).collect()}
        assert got == set(range(100, 110)) | {300}

    def test_bad_snapshot_ids(self, table):
        tbl, s1, s2 = table
        with pytest.raises(ValueError, match="to_snapshot 999 not"):
            incremental_files(tbl, to_snapshot_id=999)
        with pytest.raises(ValueError, match="from_snapshot 999 not"):
            incremental_files(tbl, from_snapshot_id=999)
        with pytest.raises(ValueError, match="newer than"):
            incremental_files(tbl, from_snapshot_id=s2,
                              to_snapshot_id=s1)


class TestExpireSnapshots:
    """Snapshot expiration: prune history, delete only the files no
    retained snapshot can reach, keep current reads + retained time
    travel intact."""

    def _three_snapshot_table(self, spark, tmp_path):
        tbl = str(tmp_path / "exp")
        ids = []
        for b in range(3):
            df = spark.createDataFrame(
                [(100 * b + i, f"doc {100 * b + i}") for i in range(10)],
                "doc_id long, text string",
            )
            ids.append(append_iceberg(df, tbl))
        return tbl, ids

    def test_dry_run_counts_without_deleting(self, spark, tmp_path):
        tbl, ids = self._three_snapshot_table(spark, tmp_path)
        res = expire_snapshots(tbl, keep_last=1, dry_run=True)
        assert res["expired_snapshots"] == 2
        assert res["retained_snapshots"] == 1
        assert res["deleted_manifest_lists"] == 2
        # carried-forward manifests/data stay reachable from the head
        assert res["deleted_manifests"] == 0
        assert res["deleted_data_files"] == 0
        assert len(snapshots(tbl)) == 3  # nothing actually removed
        assert read_iceberg(spark, tbl).count() == 30

    def test_expire_keeps_current_data(self, spark, tmp_path):
        tbl, ids = self._three_snapshot_table(spark, tmp_path)
        res = expire_snapshots(tbl, keep_last=1)
        assert res["expired_snapshots"] == 2 and not res["dry_run"]
        snaps = snapshots(tbl)
        assert [s["snapshot_id"] for s in snaps] == [ids[2]]
        # every data file is still reachable from the head snapshot:
        # the full 30 rows survive
        assert read_iceberg(spark, tbl).count() == 30
        # expired ids are no longer valid for time travel
        with pytest.raises(ValueError):
            plan_files(tbl, snapshot_id=ids[0])

    def test_retained_time_travel_still_works(self, spark, tmp_path):
        tbl, ids = self._three_snapshot_table(spark, tmp_path)
        expire_snapshots(tbl, keep_last=2)
        assert read_iceberg(spark, tbl, snapshot_id=ids[1]).count() == 20
        assert read_iceberg(spark, tbl).count() == 30

    def test_expired_watermark_fails_incremental(self, spark, tmp_path):
        from datatest_spark import requirements as R
        from datatest_spark.plans import run_incremental

        tbl, ids = self._three_snapshot_table(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        df = spark.createDataFrame([(1, 0)], "doc_id long, part_id int")
        rules = [R.interval("doc_id", 0, 10**9)]
        # watermark at snapshot 1 (validate the whole table as of s1)
        # -> build it by hand to avoid needing part_id in the fixture
        os.makedirs(ckpt, exist_ok=True)
        with open(os.path.join(ckpt, "snapshot_watermark.json"), "w") as f:
            json.dump({"history": [{"to_snapshot_id": ids[0]}]}, f)
        expire_snapshots(tbl, keep_last=1)
        with pytest.raises(ValueError, match="expired"):
            run_incremental(spark, tbl, rules, "doc_id", ckpt)

    def test_delete_manifests_expire_with_their_snapshots(
            self, spark, tmp_path):
        tbl = str(tmp_path / "expdel")
        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(20)],
            "doc_id long, text string")
        append_iceberg(df, tbl)
        delete_where(spark, tbl, "doc_id % 5 = 0")
        df2 = spark.createDataFrame(
            [(100 + i, f"doc {100 + i}") for i in range(5)],
            "doc_id long, text string")
        append_iceberg(df2, tbl)
        before = read_iceberg(spark, tbl).count()
        res = expire_snapshots(tbl, keep_last=1)
        assert res["expired_snapshots"] == 2
        # merge-on-read result unchanged: delete files carried forward
        assert read_iceberg(spark, tbl).count() == before == 21


class TestSchemaEvolution:
    """Widening appends evolve the table schema; the evolution
    validator audits transitions by field id."""

    def _mk(self, spark, tmp_path):
        from datatest_spark.sources import append_iceberg

        root = str(tmp_path / "evo")
        df1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id: long, name: string")
        append_iceberg(df1, root)
        return root

    def test_widening_append_evolves_and_nullfills(self, spark, tmp_path):
        from datatest_spark.sources import (
            append_iceberg,
            read_iceberg,
            schema_history,
        )

        root = self._mk(spark, tmp_path)
        df2 = spark.createDataFrame(
            [(3, "c", 9.5)], "id: long, name: string, score: double")
        append_iceberg(df2, root)

        hist = schema_history(root)
        assert [h["schema_id"] for h in hist] == [0, 1]
        # id stability: existing columns keep ids, new one gets a
        # fresh id above last-column-id
        v1 = {f["name"]: f["id"] for f in hist[1]["fields"]}
        v0 = {f["name"]: f["id"] for f in hist[0]["fields"]}
        assert v1["id"] == v0["id"] and v1["name"] == v0["name"]
        assert v1["score"] > max(v0.values())
        # each snapshot is pinned to the schema it was written under
        assert len(hist[0]["snapshot_ids"]) == 1
        assert len(hist[1]["snapshot_ids"]) == 1

        out = read_iceberg(spark, root).orderBy("id").collect()
        assert [r.id for r in out] == [1, 2, 3]
        # pre-widen rows read back null-filled in the new column
        assert [r.score for r in out] == [None, None, 9.5]

    def test_rejects_missing_column_and_type_change(self, spark, tmp_path):
        import pytest as _pytest

        from datatest_spark.sources import append_iceberg

        root = self._mk(spark, tmp_path)
        with _pytest.raises(ValueError, match="missing table column"):
            append_iceberg(
                spark.createDataFrame([(7,)], "id: long"), root)
        with _pytest.raises(ValueError, match="type changes"):
            append_iceberg(
                spark.createDataFrame([(7, 1)], "id: long, name: int"),
                root)

    def test_validator_classifies_transitions(self, spark, tmp_path):
        import json
        import os

        from datatest_spark.sources import (
            append_iceberg,
            validate_schema_evolution,
        )
        from datatest_spark.sources.iceberg_lite import (
            _load_metadata,
            _metadata_path,
        )

        root = self._mk(spark, tmp_path)
        append_iceberg(
            spark.createDataFrame(
                [(3, "c", 9.5)], "id: long, name: string, score: double"),
            root)
        # hand-craft a third schema exercising every change kind the
        # writer itself refuses (the validator audits ANY metadata)
        meta = _load_metadata(root)
        v1 = next(s for s in meta["schemas"] if s["schema-id"] == 1)
        fields = [dict(f) for f in v1["fields"]]
        by = {f["name"]: f for f in fields}
        by["name"]["name"] = "title"            # rename (id kept)
        by["id"]["type"] = "int"                # long->int: unsafe
        by["score"]["required"] = True          # optional->required
        fields = [f for f in fields if f["name"] != "title"] + [
            by["name"]]                         # order irrelevant
        fields.append({"id": 99, "name": "lang", "required": False,
                       "type": "string"})       # optional add
        meta["schemas"].append(
            {"type": "struct", "schema-id": 2, "fields": fields})
        meta["current-schema-id"] = 2
        mpath = _metadata_path(root)
        v = int(os.path.basename(mpath)[1:].split(".")[0]) + 1
        with open(os.path.join(root, "metadata",
                               f"v{v}.metadata.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(root, "metadata",
                               "version-hint.text"), "w") as f:
            f.write(str(v))

        rows = {(r.from_schema_id, r.to_schema_id, r.column, r.change):
                (r.detail, r.compatible)
                for r in validate_schema_evolution(spark, root).collect()}
        assert rows[(0, 1, "score", "added")] == ("double", True)
        assert rows[(1, 2, "title", "renamed")] == ("from name", True)
        assert rows[(1, 2, "id", "type_changed")] == ("long->int", False)
        assert rows[(1, 2, "score", "required_changed")] == (
            "optional->required", False)
        assert rows[(1, 2, "lang", "added")] == ("string", True)
        assert len(rows) == 5

    def test_time_travel_reads_under_pinned_schema(self, spark, tmp_path):
        from datatest_spark.sources import (
            append_iceberg,
            read_iceberg,
            snapshots,
        )

        root = self._mk(spark, tmp_path)
        s1 = snapshots(root)[-1]["snapshot_id"]
        append_iceberg(
            spark.createDataFrame(
                [(3, "c", 9.5)], "id: long, name: string, score: double"),
            root)
        # pre-widen snapshot must not grow the column it never had
        old = read_iceberg(spark, root, snapshot_id=s1)
        assert old.columns == ["id", "name"]
        assert old.count() == 2
        assert "score" in read_iceberg(spark, root).columns

    def test_incremental_range_reads_under_end_snapshot_schema(
            self, spark, tmp_path):
        from datatest_spark.sources import (
            append_iceberg,
            read_iceberg_incremental,
            snapshots,
        )

        root = self._mk(spark, tmp_path)
        s1 = snapshots(root)[-1]["snapshot_id"]
        append_iceberg(
            spark.createDataFrame(
                [(3, "c", 9.5)], "id: long, name: string, score: double"),
            root)
        s2 = snapshots(root)[-1]["snapshot_id"]
        # range ending BEFORE the widen: old schema
        old = read_iceberg_incremental(spark, root, None, s1)
        assert old.columns == ["id", "name"] and old.count() == 2
        # range ending AT the widen: new schema
        new = read_iceberg_incremental(spark, root, s1, s2)
        assert new.columns == ["id", "name", "score"]
        assert new.collect()[0].score == 9.5

    def test_rollback_across_widen_reverts_schema(self, spark, tmp_path):
        from datatest_spark.sources import (
            append_iceberg,
            read_iceberg,
            rollback_to_snapshot,
            schema_history,
            snapshots,
        )

        root = self._mk(spark, tmp_path)
        s1 = snapshots(root)[-1]["snapshot_id"]
        append_iceberg(
            spark.createDataFrame(
                [(3, "c", 9.5)], "id: long, name: string, score: double"),
            root)
        rollback_to_snapshot(root, s1)
        # the rejected widen surrendered the current schema...
        assert read_iceberg(spark, root).columns == ["id", "name"]
        # ...so the next original-shape batch appends cleanly (the
        # write-audit-publish loop must not deadlock on one bad batch)
        append_iceberg(
            spark.createDataFrame([(9, "z")], "id: long, name: string"),
            root)
        out = read_iceberg(spark, root).orderBy("id")
        assert out.columns == ["id", "name"] and out.count() == 3
        # the evolved schema stays in history (rejected snapshot is
        # still time-travelable under it)
        assert [h["schema_id"] for h in schema_history(root)] == [0, 1]

    def test_metadata_only_alter_reads_nullfilled(self, spark, tmp_path):
        import json
        import os

        from datatest_spark.sources import read_iceberg
        from datatest_spark.sources.iceberg_lite import (
            _load_metadata,
            _metadata_path,
        )

        root = self._mk(spark, tmp_path)
        # a real Iceberg writer can ALTER ... ADD COLUMN with a
        # metadata-only commit: new schema, NO new snapshot
        meta = _load_metadata(root)
        v0 = meta["schemas"][0]
        meta["schemas"].append(
            {"type": "struct", "schema-id": 1,
             "fields": [dict(f) for f in v0["fields"]] + [
                 {"id": 3, "name": "lang", "required": False,
                  "type": "string"}]})
        meta["current-schema-id"] = 1
        mpath = _metadata_path(root)
        v = int(os.path.basename(mpath)[1:].split(".")[0]) + 1
        with open(os.path.join(root, "metadata",
                               f"v{v}.metadata.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(root, "metadata",
                               "version-hint.text"), "w") as f:
            f.write(str(v))
        # current read sees the column null-filled (NOT dropped, even
        # though the current snapshot pins the pre-ALTER schema)
        out = read_iceberg(spark, root)
        assert out.columns == ["id", "name", "lang"]
        assert out.where("lang IS NULL").count() == 2

    def test_never_evolved_table_validates_empty(self, spark, tmp_path):
        from datatest_spark.sources import (
            append_iceberg,
            validate_schema_evolution,
        )

        root = self._mk(spark, tmp_path)
        # same-schema append: no evolution, still one schema
        append_iceberg(
            spark.createDataFrame([(9, "z")], "id: long, name: string"),
            root)
        assert validate_schema_evolution(spark, root).count() == 0
