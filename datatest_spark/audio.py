"""Audio predicates — batch decode + consistency rules over binary clips.

The input shape (BASELINE.json input_hint) is an Iceberg/parquet table

    (clip_id string, bytes binary, sr_hz int, dur_ms int,
     codec string, transcript string)

This module supplies the audio-specific constraint rules:

* decodability (header parse + payload size)
* ``sr_hz`` / ``dur_ms`` consistency with the values encoded in ``bytes``
* ``codec`` consistency with the container magic
* decoded-PCM allclose vs a reference: SNR >= 30 dB (input_hint)

All decoding runs inside ONE Arrow-batched pass (``mapInPandas``
iterator form) so N audio rules cost a single decode per row — the
Spark analogue of the reference evaluating many requirements over one
data pass.  No per-row Python UDFs.

Codecs: ``pcm_s16le`` clips are real RIFF/WAV files parsed here from
scratch (numpy header + frombuffer).  ``flac`` and ``opus`` clips use
deterministic *synthetic* containers defined in
:mod:`datatest_spark.fixtures` (magic + metadata + PCM payload),
because real decoder libraries are not available in this environment;
the parsing below is real work against those containers, and
unrecognized real-world FLAC/Opus payloads raise a clear
``unsupported codec payload`` violation rather than pretending to
decode.  (Reference parity: datatest has no audio layer at all — these
rules are the ``RequiredPredicate``-style per-row invariants of
SURVEY.md §2B applied to the audio table.)
"""

from __future__ import annotations

import math
import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .requirements import Rule, ValidationContext, finalize_cols
from .schema import DEVIATION, INVALID, VIOLATION_SCHEMA

__all__ = ["decode_batch", "decode_info", "AudioConsistencyRule", "audio_consistency", "pcm_snr_db"]


# ---------------------------------------------------------------------------
# Container parsing (pure numpy — vectorized per Arrow batch)
# ---------------------------------------------------------------------------

_MAGIC_TO_CODEC = {
    b"RIFF": "pcm_s16le",
    b"fLaC": "flac",
    b"Opus": "opus",  # synthetic container: b"OpusHead" prefix
}


def _parse_wav(buf: bytes):
    """Parse a RIFF/WAV (PCM16LE mono) buffer → (sr, pcm int16 array).

    Raises ValueError on malformed input.  Standalone parser — no
    external audio libs.
    """
    if len(buf) < 44 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    # walk chunks: fmt then data
    pos = 12
    sr = None
    bits = None
    channels = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if pos + 8 + size > len(buf):
            raise ValueError("truncated chunk")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            fmt_code, channels, sr, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_code != 1:
                raise ValueError(f"not PCM (fmt={fmt_code})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if sr is None or data is None or bits != 16 or channels != 1:
        raise ValueError("missing fmt/data or unsupported layout")
    if len(data) % 2:
        raise ValueError("truncated sample")
    return sr, np.frombuffer(data, dtype="<i2")


def _parse_synth_flac(buf: bytes):
    """Parse the deterministic synthetic 'flac' container from
    fixtures.py: b'fLaC' + <u32 sr> + <u32 n> + PCM16LE payload."""
    if len(buf) < 12 or buf[:4] != b"fLaC":
        raise ValueError("not a synthetic flac buffer")
    sr, n = struct.unpack("<II", buf[4:12])
    payload = buf[12:]
    if len(payload) != 2 * n:
        raise ValueError("flac payload length mismatch")
    return sr, np.frombuffer(payload, dtype="<i2")


def _parse_synth_opus(buf: bytes):
    """Parse the deterministic synthetic 'opus' container:
    b'OpusHead' + <u32 sr> + <u32 n> + PCM16LE payload."""
    if len(buf) < 16 or buf[:8] != b"OpusHead":
        raise ValueError("not a synthetic opus buffer")
    sr, n = struct.unpack("<II", buf[8:16])
    payload = buf[16:]
    if len(payload) != 2 * n:
        raise ValueError("opus payload length mismatch")
    return sr, np.frombuffer(payload, dtype="<i2")


def decode_bytes(buf: Optional[bytes]):
    """Decode any supported container → (codec, sr, pcm) or raise."""
    if buf is None:
        raise ValueError("null bytes")
    if buf[:4] == b"RIFF":
        sr, pcm = _parse_wav(bytes(buf))
        return "pcm_s16le", sr, pcm
    if buf[:4] == b"fLaC":
        sr, pcm = _parse_synth_flac(bytes(buf))
        return "flac", sr, pcm
    if buf[:8] == b"OpusHead":
        sr, pcm = _parse_synth_opus(bytes(buf))
        return "opus", sr, pcm
    raise ValueError("unsupported codec payload")


def pcm_snr_db(decoded: np.ndarray, reference: np.ndarray) -> float:
    """Signal-to-noise ratio of decoded vs reference PCM, in dB."""
    if len(decoded) != len(reference):
        return float("-inf")
    ref = reference.astype(np.float64)
    err = decoded.astype(np.float64) - ref
    sig = float(np.sum(ref * ref))
    noise = float(np.sum(err * err))
    if noise == 0.0:
        return float("inf")
    if sig == 0.0:
        return float("-inf")
    return 10.0 * math.log10(sig / noise)


# ---------------------------------------------------------------------------
# Batched decode info (one pass for all audio rules)
# ---------------------------------------------------------------------------

DECODE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("dec_codec", T.StringType(), True),
        T.StructField("dec_sr_hz", T.IntegerType(), True),
        T.StructField("dec_dur_ms", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("pcm_sha256", T.StringType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("snr_db", T.DoubleType(), True),
        T.StructField("partition_id", T.StringType(), True),
    ]
)


def decode_batch(pdf: pd.DataFrame, expected_pcm_fn=None) -> pd.DataFrame:
    """Decode one Arrow batch of clips → decode-info rows."""
    import hashlib

    out = []
    has_part = "part_id" in pdf.columns
    for row in pdf.itertuples(index=False):
        clip_id = row.clip_id
        part = str(getattr(row, "part_id")) if has_part else None
        try:
            codec, sr, pcm = decode_bytes(row.bytes)
            dur_ms = int(round(1000.0 * len(pcm) / sr)) if sr else None
            rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if len(pcm) else 0.0
            sha = hashlib.sha256(pcm.astype("<i2").tobytes()).hexdigest()
            snr = None
            if expected_pcm_fn is not None:
                ref = expected_pcm_fn(row)
                if ref is not None:
                    snr = pcm_snr_db(pcm, ref)
            out.append(
                (clip_id, True, None, codec, sr, dur_ms, len(pcm), rms, sha,
                 row.sr_hz, row.dur_ms, row.codec, snr, part)
            )
        except ValueError as e:
            out.append(
                (clip_id, False, str(e), None, None, None, None, None, None,
                 row.sr_hz, row.dur_ms, row.codec, None, part)
            )
    return pd.DataFrame(out, columns=[f.name for f in DECODE_INFO_SCHEMA.fields])


def decode_info(df: DataFrame, with_snr: bool = False) -> DataFrame:
    """One Arrow-batched decode pass over the audio table.

    Column-prunes to exactly the fields the decode needs before the
    Python stage so the Arrow transfer ships no dead bytes.  Every row
    gets a ``pcm_sha256`` of the decoded samples — the cheap content
    fingerprint the SNR fast path joins against (hash-equal ⇒ SNR=∞).

    ``with_snr=True`` additionally computes the full SNR per row by
    regenerating the reference PCM — the slow path, used only as a
    fallback when no manifest hash is available or for hash-mismatched
    rows.
    """
    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]
    if "part_id" in df.columns:
        cols.append("part_id")

    expected_fn = _fixture_expected_pcm if with_snr else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_batch(pdf, expected_pcm_fn=expected_fn)

    return df.select(*cols).mapInPandas(gen, DECODE_INFO_SCHEMA)


def _fixture_expected_pcm(row):
    """Reference PCM for SNR checks: regenerates the fixture's seeded
    sinusoid from clip_id (see fixtures.py — parameters are a pure
    function of the clip index, so the oracle needs no second table)."""
    from .fixtures import clip_index_from_id, clip_params, synth_pcm

    try:
        i = clip_index_from_id(row.clip_id)
    except (ValueError, TypeError):
        return None
    params = clip_params(i)
    return synth_pcm(i, params.true_sr, params.true_dur_ms)


class AudioConsistencyRule(Rule):
    """All per-row audio invariants in one decode pass:

    * undecodable bytes → INVALID (rule ``audio:decodable``)
    * decoded sr != sr_hz → DEVIATION (``audio:sr_hz``)
    * |decoded duration - dur_ms| > dur_tol_ms → DEVIATION (``audio:dur_ms``)
    * container codec != codec column → INVALID (``audio:codec``)
    * (optional) SNR vs reference PCM < min_snr_db → DEVIATION
      (``audio:snr``) — the input_hint's decoded-PCM allclose check.

    SNR fast path: when ``pcm_manifest`` (clip_id, pcm_sha256) is given,
    the decoded-PCM hash joins against it — hash-equal means SNR=∞ ≥
    any threshold, so the expensive reference-PCM regeneration runs
    ONLY for the (rare) hash-mismatched rows via a semi-join-pruned
    second decode.  At 10^12 rows this turns the allclose check into a
    join on 64-byte hashes plus a near-empty slow path.
    """

    kind = "plan"

    def __init__(self, dur_tol_ms: int = 50, check_snr: bool = False,
                 min_snr_db: float = 30.0, pcm_manifest=None,
                 rule_id: str = "audio"):
        super().__init__(rule_id)
        self.dur_tol_ms = dur_tol_ms
        self.check_snr = check_snr
        self.min_snr_db = min_snr_db
        self.pcm_manifest = pcm_manifest

    def plan(self, ctx: ValidationContext) -> DataFrame:
        use_hash_path = self.check_snr and self.pcm_manifest is not None
        info = decode_info(ctx.df, with_snr=self.check_snr and not use_hash_path)
        if use_hash_path:
            # the hash path consumes `info` in two subtrees (violations +
            # mismatch discovery); without a persist Spark recomputes the
            # full 6-GB-scan decode once per subtree.  The decode output
            # is tiny (~100 B/row, no binary), so cache it: the decode
            # then runs exactly once per table regardless of fan-out.
            from pyspark import StorageLevel

            info = info.persist(StorageLevel.MEMORY_AND_DISK)
            ctx.cached.append(info)
        rid = self.rule_id
        part = F.col("partition_id")

        def v(rule, diff_type, invalid, expected, deviation=None, expected_num=None, column=None):
            return F.struct(
                *finalize_cols(
                    rule,
                    diff_type,
                    key=F.col("clip_id"),
                    column=column,
                    invalid=invalid,
                    expected=expected,
                    deviation=deviation,
                    expected_num=expected_num,
                    partition_id=part,
                )
            )

        checks = [
            F.when(
                ~F.col("ok"),
                v(f"{rid}:decodable", F.lit(INVALID), F.col("error"),
                  F.lit("decodable audio payload"), column="bytes"),
            ),
            F.when(
                F.col("ok") & (F.col("dec_sr_hz") != F.col("sr_hz")),
                v(f"{rid}:sr_hz", F.lit(DEVIATION), F.col("sr_hz"),
                  F.col("dec_sr_hz"),
                  deviation=(F.col("sr_hz") - F.col("dec_sr_hz")).cast("double"),
                  expected_num=F.col("dec_sr_hz").cast("double"),
                  column="sr_hz"),
            ),
            F.when(
                F.col("ok")
                & (F.abs(F.col("dec_dur_ms") - F.col("dur_ms")) > self.dur_tol_ms),
                v(f"{rid}:dur_ms", F.lit(DEVIATION), F.col("dur_ms"),
                  F.col("dec_dur_ms"),
                  deviation=(F.col("dur_ms") - F.col("dec_dur_ms")).cast("double"),
                  expected_num=F.col("dec_dur_ms").cast("double"),
                  column="dur_ms"),
            ),
            F.when(
                F.col("ok") & ~F.col("dec_codec").eqNullSafe(F.col("codec")),
                v(f"{rid}:codec", F.lit(INVALID), F.col("codec"),
                  F.col("dec_codec"), column="codec"),
            ),
        ]
        if self.check_snr and not use_hash_path:
            checks.append(
                F.when(
                    F.col("ok")
                    & F.col("snr_db").isNotNull()
                    & (F.col("snr_db") < self.min_snr_db),
                    v(f"{rid}:snr", F.lit(DEVIATION), F.col("snr_db"),
                      F.lit(self.min_snr_db),
                      deviation=F.col("snr_db") - self.min_snr_db,
                      expected_num=F.lit(self.min_snr_db),
                      column="bytes"),
                )
            )

        arr = F.filter(F.array(*checks), lambda x: x.isNotNull())
        out = info.select(F.explode(arr).alias("_v")).select("_v.*")

        if use_hash_path:
            manifest = self.pcm_manifest.select(
                F.col("clip_id"), F.col("pcm_sha256").alias("_exp_sha")
            )
            mismatched = (
                info.filter(F.col("ok"))
                .join(manifest, "clip_id", "inner")
                .filter(F.col("pcm_sha256") != F.col("_exp_sha"))
                .select("clip_id")
            )
            # rule-level runtime adaptivity: `mismatched` derives from the
            # CACHED decode info, so checking emptiness is one tiny job —
            # and an empty mismatch set means the slow path (a second full
            # scan of the binary column) can be dropped from the plan
            # entirely.  At 10^12 rows this is the difference between one
            # and two passes over the payload bytes.
            if mismatched.isEmpty():
                return out
            # slow path only for hash-mismatched clips: semi-join prune,
            # then full decode + reference regeneration + exact SNR
            slow = decode_info(
                ctx.df.join(F.broadcast(mismatched), "clip_id", "left_semi"),
                with_snr=True,
            )
            snr_viol = slow.filter(
                F.col("ok")
                & F.col("snr_db").isNotNull()
                & (F.col("snr_db") < self.min_snr_db)
            ).select(
                finalize_cols(
                    f"{rid}:snr",
                    DEVIATION,
                    key=F.col("clip_id"),
                    column="bytes",
                    invalid=F.col("snr_db"),
                    expected=F.lit(self.min_snr_db),
                    deviation=F.col("snr_db") - self.min_snr_db,
                    expected_num=F.lit(self.min_snr_db),
                    partition_id=F.col("partition_id"),
                )
            )
            out = out.unionByName(snr_viol)
        return out


def audio_consistency(dur_tol_ms=50, check_snr=False, min_snr_db=30.0,
                      pcm_manifest=None):
    return AudioConsistencyRule(dur_tol_ms, check_snr, min_snr_db, pcm_manifest)
