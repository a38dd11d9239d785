"""Audio fixture + decode + constraint-suite tests (FIXTURES.md F1/F2)."""

import numpy as np
import pytest

from datatest_spark import fixtures as FX
from datatest_spark.audio import (
    AudioConsistencyRule,
    decode_bytes,
    decode_info,
    pcm_snr_db,
)
from datatest_spark.suite import audio_rules, validate_audio_table, verdicts
from datatest_spark.validation import Engine

N = 3000  # covers every injection period (≥2000)


@pytest.fixture(scope="module")
def audio_df(spark):
    df = FX.audio_clips_df(spark, N, parts=4).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def manifest_df(spark):
    return FX.reference_transcripts_df(spark, N).cache()


class TestSynthDeterminism:
    def test_same_index_same_bytes(self):
        assert FX.synth_clip_bytes(42) == FX.synth_clip_bytes(42)
        assert FX.synth_clip_bytes(42) != FX.synth_clip_bytes(43)

    def test_roundtrip_wav(self):
        p = FX.clip_params(5)
        pcm = FX.synth_pcm(5, p.true_sr, p.true_dur_ms)
        codec, sr, decoded = decode_bytes(FX.make_wav(p.true_sr, pcm))
        assert codec == "pcm_s16le"
        assert sr == p.true_sr
        assert np.array_equal(decoded, pcm)

    def test_roundtrip_flac_opus(self):
        pcm = FX.synth_pcm(9, 16000, 500)
        for maker, name in [(FX.make_flac, "flac"), (FX.make_opus, "opus")]:
            codec, sr, decoded = decode_bytes(maker(16000, pcm))
            assert codec == name and sr == 16000
            assert np.array_equal(decoded, pcm)

    def test_corrupt_raises(self):
        with pytest.raises(ValueError):
            decode_bytes(b"XXXXnotaudio")
        with pytest.raises(ValueError):
            decode_bytes(FX.make_wav(8000, FX.synth_pcm(1, 8000, 300))[:20])

    def test_snr_identical_is_inf(self):
        pcm = FX.synth_pcm(3, 8000, 300)
        assert pcm_snr_db(pcm, pcm) == float("inf")

    def test_snr_noisy(self):
        pcm = FX.synth_pcm(3, 8000, 300)
        noisy = pcm + np.round(
            np.sin(np.arange(len(pcm))) * 100
        ).astype("<i2")
        snr = pcm_snr_db(noisy, pcm)
        assert 20 < snr < 60


class TestDecodeInfo:
    def test_decode_pass_counts(self, spark, audio_df):
        info = decode_info(audio_df).cache()
        total = info.count()
        assert total == N
        bad = info.filter("not ok").count()
        # corrupt rate 1/500
        assert bad == len([i for i in range(N) if i % 500 == 11])
        info.unpersist()

    def test_sr_mismatch_detection(self, spark, audio_df):
        info = decode_info(audio_df)
        mism = info.filter("ok and dec_sr_hz != sr_hz").count()
        expected = len(
            [i for i in range(N) if i % 200 == 13 and i % 500 != 11]
        )
        assert mism == expected


class TestAudioSuite:
    def test_full_suite_violation_counts(self, spark, audio_df, manifest_df):
        res = validate_audio_table(audio_df, manifest=manifest_df)
        v = res.violations.cache()
        by_rule = {
            r["rule_id"]: r["count"]
            for r in v.groupBy("rule_id").count().collect()
        }
        v.unpersist()

        # closed-form expectations from the injection rules
        n_dup = len([i for i in range(N) if i % 1000 == 7 and i > 0])
        n_corrupt = len([i for i in range(N) if i % 500 == 11])
        n_bad_codec = len([i for i in range(N) if i % 333 == 19])

        assert by_rule.get("unique:clip_id", 0) == n_dup
        assert by_rule.get("audio:decodable", 0) == n_corrupt
        # invalid codec values: distinct bad values ("mp3 ", "") → ≤2 extras
        assert 1 <= by_rule.get("subset:codec", 0) <= 2
        assert n_bad_codec > 0  # injection actually happened

        # sr mismatches (excluding corrupt rows which fail decode instead)
        n_sr = len([i for i in range(N) if i % 200 == 13 and i % 500 != 11])
        assert by_rule.get("audio:sr_hz", 0) == n_sr

        # dur mismatches: declared +500ms > 50ms tolerance
        n_dur = len(
            [i for i in range(N) if (i % 200 == 17 or i % 2000 == 21) and i % 500 != 11]
        )
        assert by_rule.get("audio:dur_ms", 0) == n_dur

        # transcript mismatches vs manifest: ~1% differing + ~0.5% null
        # (duplicate rows carry the original's transcript → they match)
        n_tr = len([i for i in range(N) if i % 100 == 23 or i % 200 == 29])
        assert by_rule.get("ref_match:transcript", 0) == n_tr

    def test_snr_rule_on_clean_subset(self, spark):
        # clean clips decode to exactly the synthesized PCM → SNR = inf
        df = FX.audio_clips_df(spark, 200, parts=2).filter(
            "clip_id >= 'clip-000000000000'"
        )
        engine = Engine(spark)
        res = engine.validate(
            df, [AudioConsistencyRule(check_snr=True)], partition_col="part_id"
        )
        snr_viol = res.violations.filter("rule_id = 'audio:snr'").count()
        assert snr_viol == 0

    def test_verdicts_shape(self, spark, audio_df, manifest_df):
        res = validate_audio_table(audio_df, manifest=manifest_df)
        vd = verdicts(res.violations)
        rows = vd.collect()
        assert {r["partition_id"] for r in rows} <= {"0", "1", "2", "3", "__global__"}
        assert all(r["n_violations"] > 0 for r in rows)
