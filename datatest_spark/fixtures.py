"""Deterministic synthetic audio fixtures (FIXTURES.md F1/F2).

Everything is a pure function of the clip index ``i`` (splitmix-style
integer hashing — no RNG state, so any partitioning of ``spark.range``
produces identical rows).  Violation injection rates follow
FIXTURES.md:

    ~0.1%  duplicate clip_id            (uniqueness violations)
    ~0.2%  corrupted header/payload     (decode failures)
    ~0.5%  sr_hz mismatching bytes      (consistency violations)
    ~0.5%  dur_ms mismatching bytes     (+ a few out-of-range)
    ~0.3%  invalid codec value          (set-membership violations)
    ~1%    transcript differs from ref  (equality/fuzzy violations)
    ~0.5%  transcript null
    skew:  80% of rows codec='pcm_s16le' (the hot key)

Because clip parameters derive from ``i``, the *expected* PCM for the
SNR check is recomputable from ``clip_id`` alone — the oracle needs no
side table (audio.py uses this for the allclose/SNR≥30dB rule).
"""

from __future__ import annotations

import struct
from typing import Iterator, NamedTuple, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "clip_params",
    "clip_index_from_id",
    "synth_pcm",
    "make_container",
    "audio_clips_df",
    "reference_transcripts_df",
    "AUDIO_SCHEMA",
    "speech_pcm",
    "speech_clip_bytes",
    "speech_clips_df",
    "SPEECH_SCHEMA",
    "image_table_df",
    "video_table_df",
    "synth_image_array",
    "synth_video_frames",
    "IMAGE_SCHEMA",
    "VIDEO_SCHEMA",
]

_SRS = [8000, 16000, 22050, 44100, 48000]
_VOCAB = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta "
    "epsilon river mountain valley ocean thunder whisper signal noise "
    "sample frame batch shard table column"
).split()


def _mix(i: int, salt: int) -> int:
    """Deterministic 64-bit hash (splitmix64-style finalizer)."""
    x = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return x


class ClipParams(NamedTuple):
    true_sr: int
    true_dur_ms: int
    codec: str          # declared codec column value (may be invalid)
    true_codec: str     # what the bytes actually contain
    decl_sr: int        # declared sr_hz column (may mismatch)
    decl_dur_ms: int    # declared dur_ms column (may mismatch)
    corrupt: bool
    dup_of: Optional[int]
    transcript: Optional[str]
    f0: float


def _true_codec(i: int) -> str:
    h = _mix(i, 3) % 10
    if h < 8:
        return "pcm_s16le"  # 80% skew — the hot key
    return "flac" if h == 8 else "opus"


def _transcript_words(i: int, salt: int = 7) -> str:
    n = 3 + _mix(i, salt) % 6
    return " ".join(
        _VOCAB[_mix(i, salt + 10 + k) % len(_VOCAB)] for k in range(n)
    )


def clip_params(i: int) -> ClipParams:
    true_sr = _SRS[_mix(i, 1) % len(_SRS)]
    true_dur_ms = 200 + _mix(i, 2) % 1800  # 200..2000 ms

    true_codec = _true_codec(i)
    codec = true_codec
    if i % 333 == 19:  # ~0.3% invalid codec value
        codec = "mp3 " if _mix(i, 4) % 2 else ""

    decl_sr = true_sr
    if i % 200 == 13:  # ~0.5% sr mismatch
        decl_sr = _SRS[(_SRS.index(true_sr) + 1) % len(_SRS)]

    decl_dur = true_dur_ms
    if i % 200 == 17:  # ~0.5% dur mismatch
        decl_dur = true_dur_ms + 500
    if i % 2000 == 21:  # a few out-of-range dur values
        decl_dur = -5 if _mix(i, 5) % 2 else 2_000_000

    corrupt = i % 500 == 11  # ~0.2%
    dup_of = i - 1 if (i % 1000 == 7 and i > 0) else None

    transcript = _transcript_words(dup_of if dup_of is not None else i)
    if i % 100 == 23:  # ~1% differing transcript
        transcript = transcript + " zz"
    if i % 200 == 29:  # ~0.5% null transcript
        transcript = None

    f0 = 80.0 + (_mix(i, 6) % 400)
    return ClipParams(
        true_sr, true_dur_ms, codec, true_codec, decl_sr, decl_dur,
        corrupt, dup_of, transcript, f0,
    )


def clip_id_for(i: int) -> str:
    p = clip_params(i)
    idx = p.dup_of if p.dup_of is not None else i
    return f"clip-{idx:012d}"


def clip_index_from_id(clip_id: str) -> int:
    if not clip_id or not clip_id.startswith("clip-"):
        raise ValueError(f"bad clip_id {clip_id!r}")
    return int(clip_id[5:])


def synth_pcm(i: int, sr: int, dur_ms: int) -> np.ndarray:
    """Seeded sinusoid mix → int16 PCM (pure function of (i, sr, dur))."""
    p_f0 = 80.0 + (_mix(i, 6) % 400)
    n = int(round(sr * dur_ms / 1000.0))
    t = np.arange(n, dtype=np.float64) / sr
    sig = (
        0.6 * np.sin(2 * np.pi * p_f0 * t)
        + 0.3 * np.sin(2 * np.pi * (2.01 * p_f0) * t + 0.25)
    )
    return np.round(sig * 12000.0).astype("<i2")


def make_wav(sr: int, pcm: np.ndarray) -> bytes:
    data = pcm.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def make_flac(sr: int, pcm: np.ndarray) -> bytes:
    data = pcm.astype("<i2").tobytes()
    return b"fLaC" + struct.pack("<II", sr, len(pcm)) + data


def make_opus(sr: int, pcm: np.ndarray) -> bytes:
    data = pcm.astype("<i2").tobytes()
    return b"OpusHead" + struct.pack("<II", sr, len(pcm)) + data


def make_container(codec: str, sr: int, pcm: np.ndarray) -> bytes:
    if codec == "pcm_s16le":
        return make_wav(sr, pcm)
    if codec == "flac":
        return make_flac(sr, pcm)
    if codec == "opus":
        return make_opus(sr, pcm)
    raise ValueError(f"unknown true codec {codec}")


def synth_clip_bytes(i: int) -> bytes:
    p = clip_params(i)
    if p.dup_of is not None:
        # duplicates are exact row copies of their source clip
        return synth_clip_bytes(p.dup_of)
    pcm = synth_pcm(i, p.true_sr, p.true_dur_ms)
    buf = make_container(p.true_codec, p.true_sr, pcm)
    if p.corrupt:
        kind = _mix(i, 8) % 2
        if kind == 0:
            buf = b"XXXX" + buf[4:]  # garbled magic
        else:
            buf = buf[: max(8, len(buf) // 3)]  # truncated payload
    return buf


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)


def audio_clips_df(spark: SparkSession, n_rows: int, parts: int = 16) -> DataFrame:
    """The F1 audio_clips table: ``spark.range`` → Arrow-batched synth.

    Generation is distributed (one mapInPandas stage over range
    partitions); at SF=0.1 this is 600k clips.  ``part_id = i % parts``
    models the Iceberg bucket partitioning for checkpoint tests.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                p = clip_params(i)
                if p.dup_of is not None:
                    # exact duplicate of the source row (same part bucket)
                    src = clip_params(p.dup_of)
                    rows.append(
                        (
                            clip_id_for(i),
                            synth_clip_bytes(p.dup_of),
                            src.decl_sr,
                            src.decl_dur_ms,
                            src.codec,
                            src.transcript,
                            p.dup_of % parts,
                        )
                    )
                    continue
                rows.append(
                    (
                        clip_id_for(i),
                        synth_clip_bytes(i),
                        p.decl_sr,
                        p.decl_dur_ms,
                        p.codec,
                        p.transcript,
                        i % parts,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    # numPartitions directly on range: the synth is a pure function of
    # the row index, so contiguous range splits and a round-robin
    # repartition yield identical rows — but the repartition costs an
    # extra shuffle stage per query that reads this fixture
    return spark.range(
        0, n_rows, 1,
        numPartitions=max(spark.sparkContext.defaultParallelism, parts),
    ).mapInPandas(gen, AUDIO_SCHEMA)


def reference_transcripts_df(spark: SparkSession, n_rows: int,
                             with_pcm_sha: bool = True) -> DataFrame:
    """F2 reference_transcripts: complete manifest (superset of ids),
    with the expected decoded-PCM sha256 for the SNR fast path."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if with_pcm_sha:
                    p = clip_params(i)
                    pcm = synth_pcm(i, p.true_sr, p.true_dur_ms)
                    sha = hashlib.sha256(pcm.astype("<i2").tobytes()).hexdigest()
                else:
                    sha = None
                rows.append((f"clip-{i:012d}", _transcript_words(i), sha))
            yield pd.DataFrame(
                rows, columns=["clip_id", "transcript_ref", "pcm_sha256"]
            )

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("transcript_ref", T.StringType(), True),
            T.StructField("pcm_sha256", T.StringType(), True),
        ]
    )
    # manifest is a strict superset: extra 1% of ids beyond the data
    n_manifest = n_rows + max(1, n_rows // 100)
    return spark.range(0, n_manifest, 1).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# F7: deterministic SPEECH-shaped clips (utterance bursts separated by
# silence) — the VAD test surface.  The F1 clips are continuous tones
# (no internal silence), so voice-activity segmentation over them is
# degenerate (one segment per clip); this table injects known silence
# structure.  Same doctrine as every fixture: a pure function of the
# index i.  Injection periods:
#   i%97==13  corrupt payload (garbled magic)       → ok=false audit rows
#   i%89==7   all-silence clip (digital zeros)      → zero segments
#   j%2==0    short inter-burst gap (40–119 ms)     → merged by max_gap
#   j%2==1    long gap (250–549 ms)                 → separate segments
#   _mix%5==0 short burst (30–69 ms)                → dropped by min_speech
# ---------------------------------------------------------------------------


def speech_pcm(i: int):
    """``(sr, pcm)`` for speech-shaped clip ``i``: 2–5 sinusoid
    "utterances" (amplitude 9000, ~−14 dBFS RMS) separated by digital
    silence, with leading/trailing silence pads."""
    sr = 8000 if _mix(i, 30) % 2 == 0 else 16000

    def silence(ms: int) -> np.ndarray:
        return np.zeros(ms * sr // 1000, dtype="<i2")

    segs = [silence(30 + _mix(i, 33) % 120)]
    k = 2 + _mix(i, 31) % 4
    for j in range(k):
        if _mix(i, 50 + j) % 5 == 0:
            bur_ms = 30 + _mix(i, 60 + j) % 40
        else:
            bur_ms = 150 + _mix(i, 60 + j) % 500
        f0 = 100.0 + (_mix(i, 70 + j) % 300)
        nb = bur_ms * sr // 1000
        t = np.arange(nb, dtype=np.float64) / sr
        segs.append(
            np.round(9000.0 * np.sin(2 * np.pi * f0 * t)).astype("<i2")
        )
        if j < k - 1:
            gap_ms = (40 + _mix(i, 80 + j) % 80) if j % 2 == 0 \
                else (250 + _mix(i, 80 + j) % 300)
            segs.append(silence(gap_ms))
    segs.append(silence(20 + _mix(i, 34) % 200))
    return sr, np.concatenate(segs)


def speech_clip_bytes(i: int) -> bytes:
    """Container bytes for speech clip ``i`` (codec skew as F1)."""
    if i % 89 == 7:
        sr = 8000 if _mix(i, 30) % 2 == 0 else 16000
        pcm = np.zeros((400 + _mix(i, 35) % 1200) * sr // 1000,
                       dtype="<i2")
        return make_container(_true_codec(i), sr, pcm)
    sr, pcm = speech_pcm(i)
    buf = make_container(_true_codec(i), sr, pcm)
    if i % 97 == 13:
        buf = b"XXXX" + buf[4:]
    return buf


SPEECH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)


def speech_clips_df(spark: SparkSession, n_rows: int,
                    parts: int = 8) -> DataFrame:
    """The F7 speech_clips table: ``spark.range`` → Arrow-batched synth
    (distributed, partitioning-invariant like :func:`audio_clips_df`)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (f"sp-{int(i):08d}", speech_clip_bytes(int(i)),
                 int(i) % parts)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in SPEECH_SCHEMA.fields]
            )

    return spark.range(
        0, n_rows, 1,
        numPartitions=max(spark.sparkContext.defaultParallelism, parts),
    ).mapInPandas(gen, SPEECH_SCHEMA)


# ---------------------------------------------------------------------------
# F5/F6: deterministic image + video tables (FIXTURES.md) (same doctrine: every row
# is a pure function of the index i, so any range partitioning yields
# identical data).  Injection periods:
#   images: i%97==13 corrupt payload · i%53==29 declared-width lie
#           · i%50==7 cross-format duplicate of i-1 (same pixels,
#             other container → same dHash, different sha256)
#   videos: i%89==11 corrupt payload · i%31==5 declared-frames lie
# ---------------------------------------------------------------------------


def synth_image_array(i: int) -> np.ndarray:
    """(h, w, 3) uint8 gradient pattern, h/w in [16, 63]."""
    h = 16 + _mix(i, 41) % 48
    w = 16 + _mix(i, 43) % 48
    ph = _mix(i, 47) % 256
    ys, xs = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [(xs * 3 + ys * 5 + ph + 17 * c) % 256 for c in range(3)], axis=-1
    )
    return arr.astype(np.uint8)


def synth_image_bytes(i: int) -> bytes:
    from .operators.image import encode_bmp, encode_ppm

    if i % 97 == 13:
        return b"BM\x00trunc"  # sniffs as BMP, fails the parse
    src = i - 1 if (i % 50 == 7 and i > 0) else i
    arr = synth_image_array(src)
    # the duplicate row flips container so only pixel-level identity
    # (dHash) can link the pair
    use_bmp = (_mix(src, 53) % 2 == 0) ^ (src != i)
    return encode_bmp(arr) if use_bmp else encode_ppm(arr)


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("decl_width", T.IntegerType(), True),
        T.StructField("decl_height", T.IntegerType(), True),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)


def image_table_df(spark: SparkSession, n_rows: int, parts: int = 8) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                src = i - 1 if (i % 50 == 7 and i > 0) else i
                arr = synth_image_array(src)
                decl_w = arr.shape[1] + (7 if i % 53 == 29 else 0)
                rows.append(
                    (
                        f"img-{i:012d}",
                        synth_image_bytes(i),
                        decl_w,
                        arr.shape[0],
                        i % parts,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields]
            )

    return spark.range(0, n_rows, 1).mapInPandas(gen, IMAGE_SCHEMA)


def synth_video_frames(i: int) -> np.ndarray:
    """(n, h, w, 3) uint8 YUV frames; n in [2, 9], dims in [16, 31]."""
    n = 2 + _mix(i, 61) % 8
    h = 16 + _mix(i, 67) % 16
    w = 16 + _mix(i, 71) % 16
    ph = _mix(i, 73) % 256
    fs, ys, xs = np.mgrid[0:n, 0:h, 0:w]
    frames = np.stack(
        [(xs * 2 + ys * 3 + fs * 11 + ph + 29 * c) % 256 for c in range(3)],
        axis=-1,
    )
    return frames.astype(np.uint8)


def synth_video_bytes(i: int) -> bytes:
    from .operators.video import encode_y4m

    if i % 89 == 11:
        return b"YUV4MPEG2 W0"  # sniffs as y4m, fails the parse
    return encode_y4m(synth_video_frames(i), fps=(30, 1), chroma="444")


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("decl_frames", T.IntegerType(), True),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)


def video_table_df(spark: SparkSession, n_rows: int, parts: int = 4) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                n_frames = synth_video_frames(i).shape[0]
                decl = n_frames + (2 if i % 31 == 5 else 0)
                rows.append(
                    (f"vid-{i:012d}", synth_video_bytes(i), decl, i % parts)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_SCHEMA.fields]
            )

    return spark.range(0, n_rows, 1).mapInPandas(gen, VIDEO_SCHEMA)
