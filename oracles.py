"""Independent pure-Python oracle generators for the non-SQL queries.

The driver's correctness gate runs each ``queries()`` entry on Spark
and its ``oracle_sql()`` twin on DuckDB.  Four query families are not
expressible in plain SQL (difflib ratios, xxhash64-based sketches,
binary audio decoding).  For those, this module *recomputes the
expected result rows from first principles* — standalone Python with
no engine imports (only ``datatest_spark.fixtures`` for synthetic
*input* generation, which is data, not logic) — and renders them as a
DuckDB ``VALUES`` select, so the driver still gets a full
rows/schema/value-hash comparison.

Everything here is deterministic: fixtures are pure functions of the
row index, documents come from the read-only sf0.01 parquet, and
xxhash64 is the public XXH64 algorithm (re-implemented below; Spark's
``F.xxhash64`` is XXH64 with seed 42 over the UTF-8 bytes).
"""

from __future__ import annotations

import difflib
import struct
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

SF001_DIR = "/root/testdata/sf0.01"

# ---------------------------------------------------------------------------
# XXH64 (public algorithm, Cyan4973/xxHash spec) — the twin of Spark's
# F.xxhash64 for string inputs (seed 42, UTF-8 bytes)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of *data* (unsigned)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for _ in range(1):
                k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
                v1 = (_rotl((v1 + k1 * _P2) & _M, 31) * _P1) & _M
                v2 = (_rotl((v2 + k2 * _P2) & _M, 31) * _P1) & _M
                v3 = (_rotl((v3 + k3 * _P2) & _M, 31) * _P1) & _M
                v4 = (_rotl((v4 + k4 * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# VALUES rendering
# ---------------------------------------------------------------------------


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # QUOTED: DuckDB parses a bare numeric literal as DECIMAL
        # before any cast, silently rounding the last bits of a
        # boundary double (7.9582749999999995 → 7.958275); the
        # string→DOUBLE path round-trips repr() exactly
        return "'" + repr(v) + "'"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(rows: Sequence[tuple], columns: Sequence[str],
               casts: Sequence[str]) -> str:
    """Render rows as a typed DuckDB VALUES select (empty-safe)."""
    quoted = [f'"{c}"' for c in columns]
    sel = ", ".join(
        f"CAST({q} AS {t}) AS {q}" for q, t in zip(quoted, casts)
    )
    if not rows:
        nulls = ", ".join("NULL" for _ in columns)
        return (
            f"SELECT {sel} FROM (VALUES ({nulls})) AS t({', '.join(quoted)}) "
            f"WHERE 1 = 0"
        )
    vals = ",\n".join(
        "(" + ", ".join(_sql_lit(x) for x in r) + ")" for r in rows
    )
    return (
        f"SELECT {sel} FROM (VALUES\n{vals}\n) AS t({', '.join(quoted)})"
    )


_VIOL_COLS = [
    "rule_id", "key", "column", "diff_type", "invalid", "expected",
    "deviation", "expected_num", "partition_id",
]
_VIOL_CASTS = [
    "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR",
    "DOUBLE", "DOUBLE", "VARCHAR",
]


def violations_values_sql(rows: Sequence[tuple]) -> str:
    return values_sql(rows, _VIOL_COLS, _VIOL_CASTS)


def _read_docs(sf_dir: str) -> List[Tuple[int, str]]:
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


# ---------------------------------------------------------------------------
# fuzzy_docs — per-doc Ratcliff–Obershelp ratios (difflib IS the
# reference semantics: datatest requirements.py:426-463 uses difflib)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def fuzzy_docs_rows(sf_dir: str = SF001_DIR, cutoff: float = 0.946) -> tuple:
    rows = []
    for doc_id, text in _read_docs(sf_dir):
        if doc_id % 3 == 0:
            # Spark: substring(text, 1, cast(length(text) * 0.9 as int))
            # — cast truncates toward zero, same as Python int()
            trunc = text[: int(len(text) * 0.9)]
        else:
            trunc = text
        if trunc == text:
            continue  # exact equality passes JVM-side
        ratio = difflib.SequenceMatcher(a=text, b=trunc).ratio()
        if ratio >= cutoff:
            continue
        rows.append(
            ("fuzzy:truncated", None, "truncated", "INVALID",
             trunc, text, None, None, None)
        )
    return tuple(rows)


# ---------------------------------------------------------------------------
# simhash_neardup — token xxhash64 → bit-vote signature → 4-band
# Hamming LSH candidates → exact Hamming filter, all brute-force here
# ---------------------------------------------------------------------------


def _simhash(text: Optional[str]) -> int:
    if text is None:
        return 0
    tokens = text.split(" ")
    if not tokens:
        return 0
    hashes = [xxh64(t.encode("utf-8")) for t in tokens]
    sig = 0
    for bit in range(64):
        votes = sum(1 if (h >> bit) & 1 else -1 for h in hashes)
        if votes > 0:
            sig |= 1 << bit
    return sig  # unsigned


@lru_cache(maxsize=None)
def simhash_neardup_rows(sf_dir: str = SF001_DIR, max_hamming: int = 3) -> tuple:
    docs = _read_docs(sf_dir)
    sigs = [(doc_id, _simhash(text)) for doc_id, text in docs]
    out = []
    for ai in range(len(sigs)):
        id_a, ua = sigs[ai]
        for bi in range(ai + 1, len(sigs)):
            id_b, ub = sigs[bi]
            if id_a >= id_b:  # pairs are id_a < id_b
                continue
            # candidate iff any 16-bit band matches
            if not any(
                (ua >> (16 * b)) & 0xFFFF == (ub >> (16 * b)) & 0xFFFF
                for b in range(4)
            ):
                continue
            hamming = bin(ua ^ ub).count("1")
            if hamming <= max_hamming:
                out.append((id_a, id_b, hamming))
    return tuple(out)


def simhash_neardup_sql(sf_dir: str = SF001_DIR, max_hamming: int = 3) -> str:
    return values_sql(
        simhash_neardup_rows(sf_dir, max_hamming),
        ["id_a", "id_b", "hamming"],
        ["BIGINT", "BIGINT", "INTEGER"],
    )


def fuzzy_docs_sql(sf_dir: str = SF001_DIR, cutoff: float = 0.946) -> str:
    return violations_values_sql(fuzzy_docs_rows(sf_dir, cutoff))


# ---------------------------------------------------------------------------
# audio_suite — full first-principles simulation of every suite rule
# over the deterministic 2000-clip fixture table
# ---------------------------------------------------------------------------

_ALLOWED_CODECS = {"pcm_s16le", "flac", "opus"}
_ALLOWED_SRS = {8000, 16000, 22050, 44100, 48000}


def _sim_parse_wav(buf: bytes):
    """Standalone WAV walk mirroring the engine's documented parse
    contract (error strings are part of the violation payload)."""
    if len(buf) < 44 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
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
            fmt_code, channels, sr, _br, _al, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_code != 1:
                raise ValueError(f"not PCM (fmt={fmt_code})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if sr is None or data is None or bits != 16 or channels != 1:
        raise ValueError("missing fmt/data or unsupported layout")
    if len(data) % 2:
        raise ValueError("truncated sample")
    return sr, len(data) // 2


def _sim_decode(buf: Optional[bytes]):
    """→ (codec, sr, n_samples) or raise ValueError(reason).  Mirrors
    the engine contract that a parseable header declaring a
    non-positive sample rate is a decode failure."""
    if buf is None:
        raise ValueError("null bytes")
    if buf[:4] == b"RIFF":
        sr, n = _sim_parse_wav(bytes(buf))
        if sr <= 0:
            raise ValueError("invalid sample rate")
        return "pcm_s16le", sr, n
    if buf[:4] == b"fLaC":
        if len(buf) < 12:
            raise ValueError("not a synthetic flac buffer")
        sr, n = struct.unpack("<II", buf[4:12])
        if len(buf) - 12 != 2 * n:
            raise ValueError("flac payload length mismatch")
        if sr <= 0:
            raise ValueError("invalid sample rate")
        return "flac", sr, n
    if buf[:8] == b"OpusHead":
        if len(buf) < 16:
            raise ValueError("not a synthetic opus buffer")
        sr, n = struct.unpack("<II", buf[8:16])
        if len(buf) - 16 != 2 * n:
            raise ValueError("opus payload length mismatch")
        if sr <= 0:
            raise ValueError("invalid sample rate")
        return "opus", sr, n
    raise ValueError("unsupported codec payload")


def _sim_decode_pcm(buf: Optional[bytes]):
    """→ (codec, sr, int16 ndarray) or raise ValueError — the
    PCM-bearing sibling of :func:`_sim_decode`, again a standalone
    struct walk (no engine imports)."""
    import numpy as np

    codec, sr, n_samples = _sim_decode(buf)
    if codec == "pcm_s16le":
        # re-walk the chunks for the data payload
        pos = 12
        data = None
        while pos + 8 <= len(buf):
            cid = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            if cid == b"data":
                data = bytes(buf[pos + 8:pos + 8 + size])
            pos += 8 + size + (size % 2)
    elif codec == "flac":
        data = bytes(buf[12:])
    else:  # opus
        data = bytes(buf[16:])
    return codec, sr, np.frombuffer(data, dtype="<i2")


@lru_cache(maxsize=None)
def audio_features_rows(n: int = 2000, parts: int = 4) -> tuple:
    """Expected ``audio_features(audio_clips_df(spark, n, parts))``
    rows, re-derived from the fixture definition with an independent
    decode (struct walk above) and independent feature math.  The
    counting features (peak, clipping/silence counts, zero crossings,
    sum of squares) are exact integers, so the derived floats agree
    with the engine to the last bit; the spectral centroid uses the
    same deterministic numpy rfft primitive on the same samples.
    """
    import math

    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        buf = synth_clip_bytes(src)
        try:
            _, sr, pcm = _sim_decode_pcm(buf)
        except ValueError:
            out.append((clip_id, False, None, None, None, None, None,
                        None, None, None, None))
            continue
        ns = int(len(pcm))
        a = np.abs(pcm.astype(np.int64))
        peak = int(a.max()) if ns else None
        clip_ratio = round(int((a >= 32767).sum()) / ns, 6)
        sil_ratio = round(int((a <= 327).sum()) / ns, 6)
        neg = pcm < 0
        crossings = int(np.count_nonzero(neg[1:] != neg[:-1]))
        zcr = round(crossings / (ns - 1) if ns > 1 else 0.0, 6)
        sum_sq = int(np.sum(pcm.astype(np.int64) ** 2))
        rms_dbfs = (
            round(20.0 * math.log10(math.sqrt(sum_sq / ns) / 32768.0), 6)
            if sum_sq > 0 else None
        )
        mag = np.abs(np.fft.rfft(pcm.astype(np.float64)))
        den = float(np.sum(mag))
        if den > 0.0:
            num = float(np.sum(mag * np.fft.rfftfreq(ns, d=1.0 / sr)))
            centroid = round(num / den, 6)
        else:
            centroid = 0.0
        out.append((clip_id, True, sr, ns, peak, clip_ratio, sil_ratio,
                    crossings, zcr, rms_dbfs, centroid))
    return tuple(out)


_FEATURE_COLS = [
    "clip_id", "ok", "dec_sr_hz", "n_samples", "peak_abs",
    "clipping_ratio", "silence_ratio", "zero_crossings", "zcr",
    "rms_dbfs", "centroid_hz",
]
_FEATURE_CASTS = [
    "VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "INTEGER",
    "DOUBLE", "DOUBLE", "BIGINT", "DOUBLE", "DOUBLE", "DOUBLE",
]


def audio_features_sql(n: int = 2000, parts: int = 4) -> str:
    return values_sql(audio_features_rows(n, parts),
                      _FEATURE_COLS, _FEATURE_CASTS)


def _sim_encode_wav(sr: int, pcm) -> bytes:
    """Standalone canonical mono-int16 WAV writer (44-byte header),
    written from the RIFF spec — independent of the engine's
    encode_wav so byte-hash agreement certifies the format."""
    import numpy as np

    data = np.asarray(pcm, dtype="<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, int(sr),
                                    int(sr) * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


@lru_cache(maxsize=None)
def audio_trim_rows(n: int = 600, parts: int = 4,
                    threshold: int = 2000, pad_ms: int = 0) -> tuple:
    """Expected ``trim_silence(audio_clips_df(spark, n, parts),
    threshold, pad_ms)`` rows projected to a sha256 of the trimmed WAV
    bytes — independent decode (struct walk), independent trim
    arithmetic (exact integer sample indices), independent WAV encode,
    hashlib digest."""
    import hashlib

    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, None, None, None, None,
                        None))
            continue
        nsam = len(pcm)
        orig_ms = nsam * 1000 // sr
        active = np.nonzero(np.abs(pcm.astype(np.int64)) > threshold)[0]
        if len(active) == 0:
            out.append((clip_id, True, sr, orig_ms, 0, orig_ms, 0, None))
            continue
        pad_n = pad_ms * sr // 1000
        lo = max(0, int(active[0]) - pad_n)
        hi = min(nsam, int(active[-1]) + 1 + pad_n)
        seg = pcm[lo:hi]
        sha = hashlib.sha256(_sim_encode_wav(sr, seg)).hexdigest()
        out.append((clip_id, True, sr, orig_ms, len(seg) * 1000 // sr,
                    lo * 1000 // sr, (nsam - hi) * 1000 // sr, sha))
    return tuple(out)


_TRIM_COLS = ["clip_id", "ok", "sr_hz", "orig_ms", "dur_ms",
              "trimmed_lead_ms", "trimmed_tail_ms", "content_sha"]
_TRIM_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "BIGINT",
               "BIGINT", "BIGINT", "VARCHAR"]


def audio_trim_sql(n: int = 600, parts: int = 4,
                   threshold: int = 2000, pad_ms: int = 0) -> str:
    return values_sql(audio_trim_rows(n, parts, threshold, pad_ms),
                      _TRIM_COLS, _TRIM_CASTS)


@lru_cache(maxsize=None)
def audio_normalize_rows(n: int = 600, parts: int = 4,
                         target_dbfs: float = -20.0,
                         max_gain_db: float = 40.0) -> tuple:
    """Expected ``normalize_loudness(audio_clips_df(spark, n, parts),
    target_dbfs, max_gain_db)`` rows with sha256 of the re-encoded
    WAV — independent decode, the documented gain formula (target −
    RMS, ±max clamp, peak guard) replayed on the same IEEE ops,
    independent encode + hashlib digest."""
    import hashlib
    import math

    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, None, None, None, None))
            continue
        nsam = len(pcm)
        sum_sq = int(np.sum(pcm.astype(np.int64) ** 2)) if nsam else 0
        if sum_sq == 0:
            out.append((clip_id, True, sr, nsam, None, None, None))
            continue
        rms_dbfs = 20.0 * math.log10(math.sqrt(sum_sq / nsam) / 32768.0)
        gain_db = min(max(target_dbfs - rms_dbfs, -max_gain_db),
                      max_gain_db)
        peak = int(np.abs(pcm.astype(np.int64)).max())
        gain_db = min(gain_db, 20.0 * math.log10(32767.0 / peak))
        scale = 10.0 ** (gain_db / 20.0)
        scaled = np.clip(np.rint(pcm.astype(np.float64) * scale),
                         -32768, 32767).astype("<i2")
        sha = hashlib.sha256(_sim_encode_wav(sr, scaled)).hexdigest()
        out.append((clip_id, True, sr, nsam, round(rms_dbfs, 6),
                    round(gain_db, 6), sha))
    return tuple(out)


@lru_cache(maxsize=None)
def audio_resample_rows(n: int = 600, parts: int = 4,
                        target_sr: int = 16000) -> tuple:
    """Expected ``resample_audio(audio_clips_df(spark, n, parts),
    target_sr)`` rows — independent decode, an independent
    linear-interpolation replay of the documented resample spec
    (exact divmod grid, float64 two-tap blend, round half-to-even),
    independent WAV encode + sha256."""
    import hashlib

    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, None, None, None))
            continue
        res = _sim_resample(pcm, sr, target_sr)
        sha = hashlib.sha256(
            _sim_encode_wav(target_sr, res)).hexdigest()
        out.append((clip_id, True, sr, target_sr, len(res), sha))
    return tuple(out)


def _sim_resample(pcm, sr_in: int, sr_out: int):
    """Independent replay of the documented resample spec (exact
    divmod grid, float64 two-tap blend, round half-to-even) — shared
    by the resample and speed-augmentation oracle rows so both certify
    the SAME spec.  Speed perturbation by rational ``num/den`` is
    ``_sim_resample(pcm, num, den)`` (only the ratio matters)."""
    import numpy as np

    m = len(pcm)
    if sr_in == sr_out or m == 0:
        return np.asarray(pcm, dtype="<i2")
    n_out = (m * sr_out + sr_in - 1) // sr_in  # ceil
    j = np.arange(n_out, dtype=np.int64)
    idx, rem = np.divmod(j * sr_in, sr_out)
    idx = np.minimum(idx, m - 1)
    nxt = np.minimum(idx + 1, m - 1)
    frac = rem.astype(np.float64) / sr_out
    x = pcm.astype(np.float64)
    blend = x[idx] * (1.0 - frac) + x[nxt] * frac
    return np.clip(np.rint(blend), -32768, 32767).astype("<i2")


@lru_cache(maxsize=None)
def audio_augment_rows(n: int = 600, parts: int = 4,
                       salt: str = "aug1") -> tuple:
    """Expected ``augment_speed(audio_clips_df(spark, n, parts),
    salt=salt)`` rows — md5 factor choice + exact-grid speed replay
    (:func:`_sim_resample`) + independent encode + sha256."""
    import hashlib

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    factors = ((9, 10), (10, 10), (11, 10))
    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        num, den = factors[int(hashlib.md5(
            (clip_id + salt).encode("utf-8")).hexdigest()[:4], 16) % 3]
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, num, den, None, None))
            continue
        res = _sim_resample(pcm, num, den)
        sha = hashlib.sha256(_sim_encode_wav(sr, res)).hexdigest()
        out.append((clip_id, True, sr, num, den, len(res), sha))
    return tuple(out)


_AUGMENT_COLS = ["clip_id", "ok", "sr_hz", "speed_num", "speed_den",
                 "n_samples", "content_sha"]
_AUGMENT_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "INTEGER", "INTEGER",
                  "BIGINT", "VARCHAR"]


def audio_augment_sql(n: int = 600, parts: int = 4,
                      salt: str = "aug1") -> str:
    return values_sql(audio_augment_rows(n, parts, salt),
                      _AUGMENT_COLS, _AUGMENT_CASTS)


_RESAMPLE_COLS = ["clip_id", "ok", "src_sr_hz", "sr_hz", "n_samples",
                  "content_sha"]
_RESAMPLE_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "INTEGER", "BIGINT",
                   "VARCHAR"]


def audio_resample_sql(n: int = 600, parts: int = 4,
                       target_sr: int = 16000) -> str:
    return values_sql(audio_resample_rows(n, parts, target_sr),
                      _RESAMPLE_COLS, _RESAMPLE_CASTS)


@lru_cache(maxsize=None)
def audio_prepare_rows(n: int = 600, parts: int = 4,
                       threshold: int = 2000, pad_ms: int = 0,
                       target_dbfs: float = -20.0,
                       max_gain_db: float = 40.0,
                       window_ms: int = 500) -> tuple:
    """Expected ``prepare_training_audio(...)`` chunk rows — the fused
    trim → normalize → segment materializer replayed from first
    principles (independent decode, trim indices, gain formula, window
    grid, independent RIFF encode, hashlib sha256 per chunk)."""
    import hashlib
    import math

    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, None, None, None, None,
                        None))
            continue
        nsam = len(pcm)
        active = np.nonzero(np.abs(pcm.astype(np.int64)) > threshold)[0]
        if len(active) == 0:
            out.append((clip_id, True, None, None, None, sr, None, None))
            continue
        pad_n = pad_ms * sr // 1000
        lo = max(0, int(active[0]) - pad_n)
        hi = min(nsam, int(active[-1]) + 1 + pad_n)
        seg = pcm[lo:hi]
        m = len(seg)
        sum_sq = int(np.sum(seg.astype(np.int64) ** 2))
        rms_dbfs = 20.0 * math.log10(math.sqrt(sum_sq / m) / 32768.0)
        gain_db = min(max(target_dbfs - rms_dbfs, -max_gain_db),
                      max_gain_db)
        peak = int(np.abs(seg.astype(np.int64)).max())
        gain_db = min(gain_db, 20.0 * math.log10(32767.0 / peak))
        scale = 10.0 ** (gain_db / 20.0)
        proc = np.clip(np.rint(seg.astype(np.float64) * scale),
                       -32768, 32767).astype("<i2")
        g = round(gain_db, 6)
        win = max(1, window_ms * sr // 1000)  # engine clamps likewise
        k = 0
        while k * win < m:
            chunk = proc[k * win: k * win + win]
            ms = len(chunk) * 1000 // sr
            if ms >= 1:
                sha = hashlib.sha256(_sim_encode_wav(sr, chunk)).hexdigest()
                out.append((clip_id, True, k, k * win * 1000 // sr, ms,
                            sr, g, sha))
            k += 1
    return tuple(out)


_PREPARE_COLS = ["clip_id", "ok", "chunk_idx", "start_ms", "chunk_ms",
                 "sr_hz", "gain_db", "content_sha"]
_PREPARE_CASTS = ["VARCHAR", "BOOLEAN", "BIGINT", "BIGINT", "BIGINT",
                  "INTEGER", "DOUBLE", "VARCHAR"]


def audio_prepare_sql(n: int = 600, parts: int = 4,
                      threshold: int = 2000, pad_ms: int = 0,
                      target_dbfs: float = -20.0,
                      window_ms: int = 500) -> str:
    return values_sql(
        audio_prepare_rows(n, parts, threshold, pad_ms, target_dbfs,
                           window_ms=window_ms),
        _PREPARE_COLS, _PREPARE_CASTS)


_NORM_COLS = ["clip_id", "ok", "sr_hz", "n_samples", "rms_dbfs",
              "gain_db", "content_sha"]
_NORM_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "DOUBLE",
               "DOUBLE", "VARCHAR"]


def audio_normalize_sql(n: int = 600, parts: int = 4,
                        target_dbfs: float = -20.0,
                        max_gain_db: float = 40.0) -> str:
    return values_sql(
        audio_normalize_rows(n, parts, target_dbfs, max_gain_db),
        _NORM_COLS, _NORM_CASTS)


AUDIO_DRIFT_EDGES = [500.0, 750.0, 1000.0, 1500.0]
AUDIO_DRIFT_SHIFTED = [50, 100, 150, 700, 1000]   # fake high-centroid corpus
AUDIO_DRIFT_TRUE = [363, 584, 398, 366, 285]      # fixture's real histogram


def audio_drift_rows(n: int = 2000, parts: int = 4) -> tuple:
    """Expected violations of the audio-feature drift composition:
    independent decode + independent centroid math (audio_features_rows)
    → bucket by the fixed edges → PSI / JS recomputed inline (NOT via
    datatest_spark.stats) → the engine's violation-row contract.  The
    PSI rule's baseline claims a high-centroid corpus (fires); the JS
    rule's baseline is the fixture's true histogram (passes, no row)."""
    import math

    feats = audio_features_rows(n, parts)
    cents = [r[10] for r in feats if r[10] is not None]
    counts = [0] * (len(AUDIO_DRIFT_EDGES) + 1)
    for v in cents:
        counts[sum(v > e for e in AUDIO_DRIFT_EDGES)] += 1
    total = sum(counts) or 1
    cur = [c / total for c in counts]

    def psi_val(props):
        eps, acc = 1e-6, 0.0
        for p, q in zip(cur, props):
            p, q = max(p, eps), max(q, eps)
            acc += (p - q) * math.log(p / q)
        return acc

    def js_val(props):
        eps, acc = 1e-6, 0.0
        for p, q in zip(cur, props):
            p, q = max(p, eps), max(q, eps)
            m = (p + q) / 2.0
            acc += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        return acc

    out = []
    for rule_id, stat, fn, baseline, thr in [
        ("drift_psi:centroid_hz", "psi", psi_val, AUDIO_DRIFT_SHIFTED, 0.25),
        ("drift_js:centroid_hz", "js", js_val, AUDIO_DRIFT_TRUE, 0.02),
    ]:
        bt = float(sum(int(x) for x in baseline)) or 1.0
        value = fn([int(x) / bt for x in baseline])
        if value > thr:
            out.append((rule_id, None, "centroid_hz", "DEVIATION",
                        f"{value:.6f}", f"{stat}<={thr}",
                        float(value - thr), float(thr), None))
    return tuple(out)


def audio_drift_sql(n: int = 2000, parts: int = 4) -> str:
    return violations_values_sql(audio_drift_rows(n, parts))


@lru_cache(maxsize=None)
def audio_neardup_rows(n: int = 600, parts: int = 4,
                       max_hamming: int = 3) -> tuple:
    """Expected ``audio_neardup_pairs(audio_clips_df(spark, n, parts))``
    rows — independent decode (struct walk) + an independently-written
    spectral-fingerprint recompute + a brute-force emulation of the
    4x16-bit-band LSH candidate rule (any band equal) and the Hamming
    cutoff.  Brute force is the point: if the engine's banded self-join
    dropped or duplicated a candidate the hashes would differ."""
    import numpy as np

    from datatest_spark.fixtures import clip_id_for, synth_clip_bytes

    edges = 60.0 * (6000.0 / 60.0) ** (np.arange(65) / 64.0)
    sig_by_id = {}
    for i in range(n):
        clip_id = clip_id_for(i)
        if clip_id in sig_by_id:          # duplicate row, same bytes
            continue
        buf = synth_clip_bytes(i)
        try:
            _, sr, pcm = _sim_decode_pcm(buf)
        except ValueError:
            continue
        mag = np.abs(np.fft.rfft(pcm.astype(np.float64))) ** 2
        freqs = np.fft.rfftfreq(len(pcm), d=1.0 / sr)
        en = np.array([mag[(freqs >= edges[b]) & (freqs < edges[b + 1])].sum()
                       for b in range(64)])
        bits = np.zeros(64, dtype=np.uint64)
        bits[:63] = en[:63] > en[1:]
        bits[63] = en[63] > en[0]
        sig_by_id[clip_id] = int((bits << np.arange(64, dtype=np.uint64)).sum())

    ids = sorted(sig_by_id)
    sigs = np.array([sig_by_id[c] for c in ids], dtype=np.uint64)
    out = []
    for a in range(len(ids)):
        rest = sigs[a + 1:]
        band_match = np.zeros(len(rest), dtype=bool)
        for b in range(4):
            shift = np.uint64(16 * b)
            mask = np.uint64(0xFFFF)
            band_match |= ((sigs[a] >> shift) & mask) == ((rest >> shift) & mask)
        xor = sigs[a] ^ rest
        for j in np.nonzero(band_match)[0]:
            ham = bin(int(xor[j])).count("1")
            if ham <= max_hamming:
                out.append((ids[a], ids[a + 1 + int(j)], ham))
    return tuple(out)


def audio_neardup_sql(n: int = 600, parts: int = 4,
                      max_hamming: int = 3) -> str:
    return values_sql(audio_neardup_rows(n, parts, max_hamming),
                      ["id_a", "id_b", "hamming"],
                      ["VARCHAR", "VARCHAR", "INTEGER"])


@lru_cache(maxsize=None)
def transcript_rate_rows(n: int = 2000, parts: int = 4,
                         min_wps: float = 1.0,
                         max_wps: float = 8.0) -> tuple:
    """Expected violations of ``TranscriptRateRule(min_wps, max_wps)``
    over ``audio_clips_df(spark, n, parts)`` — closed-form from the
    fixture definition, with the decoded duration re-derived through
    the independent struct-walk decode."""
    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    rid = "transcript_rate"
    out = []
    for i in range(n):
        p = clip_params(i)
        if p.dup_of is not None:
            src = clip_params(p.dup_of)
            clip_id, transcript = clip_id_for(i), src.transcript
            buf, part = synth_clip_bytes(p.dup_of), p.dup_of % parts
        else:
            clip_id, transcript = clip_id_for(i), p.transcript
            buf, part = synth_clip_bytes(i), i % parts
        ps = str(part)
        n_words = (0 if transcript is None or transcript.strip() == ""
                   else len(transcript.strip().split()))
        if n_words == 0:
            out.append((f"{rid}:empty", clip_id, "transcript", "INVALID",
                        transcript, "non-empty transcript",
                        None, None, ps))
            continue
        try:
            _, sr, pcm = _sim_decode_pcm(buf)
        except ValueError:
            continue  # undecodable: the decodable rule's business
        dur_s = round(1000.0 * len(pcm) / sr) / 1000.0
        wps = float(np.round(n_words / dur_s, 6)) if dur_s > 0 else None
        if wps is None:
            continue
        if wps > max_wps:
            out.append((f"{rid}:wps", clip_id, "transcript", "DEVIATION",
                        str(wps), str(max_wps),
                        float(np.round(wps - max_wps, 6)), max_wps, ps))
        elif wps < min_wps:
            out.append((f"{rid}:wps", clip_id, "transcript", "DEVIATION",
                        str(wps), str(min_wps),
                        float(np.round(wps - min_wps, 6)), min_wps, ps))
    return tuple(out)


def transcript_rate_sql(n: int = 2000, parts: int = 4) -> str:
    return violations_values_sql(transcript_rate_rows(n, parts))


@lru_cache(maxsize=None)
def audio_dedup_groups_rows(n: int = 600, parts: int = 4) -> tuple:
    """Expected ``audio_dedup_groups(audio_clips_df(spark, n, parts))``
    rows — independent decode + signature recompute, grouped in plain
    Python.  Counts are per ROW (byte-duplicate rows count separately),
    keep_id is the min clip_id in the group."""
    import numpy as np

    from datatest_spark.fixtures import clip_id_for, synth_clip_bytes

    edges = 60.0 * (6000.0 / 60.0) ** (np.arange(65) / 64.0)
    sig_cache = {}
    groups = {}
    for i in range(n):
        buf = synth_clip_bytes(i)
        key = bytes(buf)  # dup rows share bytes → cache their decode
        if key in sig_cache:
            sig = sig_cache[key]
        else:
            try:
                _, sr, pcm = _sim_decode_pcm(buf)
            except ValueError:
                sig_cache[key] = None
                continue
            mag = np.abs(np.fft.rfft(pcm.astype(np.float64))) ** 2
            freqs = np.fft.rfftfreq(len(pcm), d=1.0 / sr)
            en = np.array(
                [mag[(freqs >= edges[b]) & (freqs < edges[b + 1])].sum()
                 for b in range(64)])
            bits = np.zeros(64, dtype=np.uint64)
            bits[:63] = en[:63] > en[1:]
            bits[63] = en[63] > en[0]
            u = int((bits << np.arange(64, dtype=np.uint64)).sum())
            sig = u - (1 << 64) if u >= (1 << 63) else u
            sig_cache[key] = sig
        if sig is None:
            continue
        cnt, keep = groups.get(sig, (0, None))
        cid = clip_id_for(i)
        groups[sig] = (cnt + 1, cid if keep is None or cid < keep else keep)
    return tuple(
        (sig, cnt, keep) for sig, (cnt, keep) in sorted(groups.items())
        if cnt > 1
    )


def audio_dedup_groups_sql(n: int = 600, parts: int = 4) -> str:
    return values_sql(audio_dedup_groups_rows(n, parts),
                      ["sig", "dup_count", "keep_id"],
                      ["BIGINT", "BIGINT", "VARCHAR"])


@lru_cache(maxsize=None)
def audio_label_conflict_rows(n: int = 2000, parts: int = 4) -> tuple:
    """Expected ``audio_transcript_conflicts(audio_clips_df(spark, n))``
    rows — independent decode + signature recompute, transcripts from
    the fixture definition (dup rows carry the SOURCE transcript),
    grouped in plain Python.  NULL transcript is its own label."""
    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    edges = 60.0 * (6000.0 / 60.0) ** (np.arange(65) / 64.0)
    sig_cache = {}
    groups = {}  # sig -> [n_rows, {labels}, min clip_id]
    for i in range(n):
        buf = synth_clip_bytes(i)
        key = bytes(buf)
        if key in sig_cache:
            sig = sig_cache[key]
        else:
            try:
                _, sr, pcm = _sim_decode_pcm(buf)
            except ValueError:
                sig_cache[key] = None
                continue
            mag = np.abs(np.fft.rfft(pcm.astype(np.float64))) ** 2
            freqs = np.fft.rfftfreq(len(pcm), d=1.0 / sr)
            en = np.array(
                [mag[(freqs >= edges[b]) & (freqs < edges[b + 1])].sum()
                 for b in range(64)])
            bits = np.zeros(64, dtype=np.uint64)
            bits[:63] = en[:63] > en[1:]
            bits[63] = en[63] > en[0]
            u = int((bits << np.arange(64, dtype=np.uint64)).sum())
            sig = u - (1 << 64) if u >= (1 << 63) else u
            sig_cache[key] = sig
        if sig is None:
            continue
        p = clip_params(i)
        src = clip_params(p.dup_of) if p.dup_of is not None else p
        label = src.transcript if src.transcript is not None else "\x00"
        cid = clip_id_for(i)
        g = groups.setdefault(sig, [0, set(), cid])
        g[0] += 1
        g[1].add(label)
        g[2] = min(g[2], cid)
    return tuple(
        (sig, n_rows, len(labels), cid)
        for sig, (n_rows, labels, cid) in sorted(groups.items())
        if len(labels) > 1
    )


@lru_cache(maxsize=None)
def audio_analysis_rows(n: int = 2000, parts: int = 4) -> tuple:
    """Expected ``audio_analysis(audio_clips_df(spark, n, parts))``
    rows (features + signature + embedding probes) — the feature
    columns come from audio_features_rows (independent decode +
    integer-exact math), the signature and embedding from the same
    independent spectral recompute the knn/dedup oracles use.
    ``emb_sum`` is a left-fold over the rounded components, matching
    the engine's F.aggregate accumulation order."""
    import numpy as np

    from datatest_spark.fixtures import clip_params, synth_clip_bytes

    feats = audio_features_rows(n, parts)
    edges = 60.0 * (6000.0 / 60.0) ** (np.arange(65) / 64.0)
    cache = {}
    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        key = bytes(synth_clip_bytes(src))
        if key not in cache:
            try:
                _, sr, pcm = _sim_decode_pcm(key)
                mag = np.abs(np.fft.rfft(pcm.astype(np.float64))) ** 2
                freqs = np.fft.rfftfreq(len(pcm), d=1.0 / sr)
                en = np.array(
                    [mag[(freqs >= edges[b]) & (freqs < edges[b + 1])].sum()
                     for b in range(64)])
                bits = np.zeros(64, dtype=np.uint64)
                bits[:63] = en[:63] > en[1:]
                bits[63] = en[63] > en[0]
                u = int((bits << np.arange(64, dtype=np.uint64)).sum())
                sig = u - (1 << 64) if u >= (1 << 63) else u
                v = np.log1p(en)
                nv = float(np.linalg.norm(v))
                emb = ([float(x) for x in np.round(v / nv, 6)]
                       if nv > 0.0 else [0.0] * 64)
                acc = 0.0
                for x in emb:
                    acc += x
                cache[key] = (sig, emb[0], acc)
            except ValueError:
                cache[key] = (None, None, None)
        out.append(feats[i] + cache[key])
    return tuple(out)


def audio_analysis_sql(n: int = 2000, parts: int = 4) -> str:
    return values_sql(audio_analysis_rows(n, parts),
                      _FEATURE_COLS + ["sig", "emb_0", "emb_sum"],
                      _FEATURE_CASTS + ["BIGINT", "DOUBLE", "DOUBLE"])


def audio_label_conflicts_sql(n: int = 2000, parts: int = 4) -> str:
    return values_sql(audio_label_conflict_rows(n, parts),
                      ["sig", "n_clips", "n_labels", "sample_id"],
                      ["BIGINT", "BIGINT", "BIGINT", "VARCHAR"])


def _spectral_emb_by_id(n: int) -> dict:
    """Independent recompute of the per-clip 64-dim spectral embedding
    (first occurrence per clip_id, undecodable skipped) — shared by the
    audio_knn and audio_semantic_dedup oracles."""
    import numpy as np

    from datatest_spark.fixtures import clip_id_for, synth_clip_bytes

    edges = 60.0 * (6000.0 / 60.0) ** (np.arange(65) / 64.0)
    emb_by_id = {}
    for i in range(n):
        cid = clip_id_for(i)
        if cid in emb_by_id:
            continue
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(i))
        except ValueError:
            continue
        mag = np.abs(np.fft.rfft(pcm.astype(np.float64))) ** 2
        freqs = np.fft.rfftfreq(len(pcm), d=1.0 / sr)
        en = np.array([mag[(freqs >= edges[b]) & (freqs < edges[b + 1])].sum()
                       for b in range(64)])
        v = np.log1p(en)
        nv = float(np.linalg.norm(v))
        emb_by_id[cid] = (np.round(v / nv, 6) if nv > 0.0
                          else np.zeros(64))
    return emb_by_id


@lru_cache(maxsize=None)
def audio_knn_rows(n: int = 600, k: int = 5,
                   n_queries: int = 5) -> tuple:
    """Expected ``knn_join`` output over spectral embeddings of the
    first ``n`` fixture clips with the first ``n_queries`` clip ids as
    queries — independent decode + an independently-written embedding
    recompute + brute-force round-6 cosine, ties by neighbor id."""
    import numpy as np

    from datatest_spark.fixtures import clip_id_for

    emb_by_id = _spectral_emb_by_id(n)
    ids = sorted(emb_by_id)
    mat = np.array([emb_by_id[c] for c in ids])
    norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
    out = []
    for qi in range(n_queries):
        qid = clip_id_for(qi)
        q = emb_by_id[qid]
        qn = max(float(np.linalg.norm(q)), 1e-12)
        cos = np.round((mat @ q) / (norms * qn), 6)
        order = np.lexsort((np.array(ids), -cos))[:k]
        for j in order:
            out.append((qid, ids[int(j)], float(cos[int(j)])))
    return tuple(out)


def audio_knn_sql(n: int = 600, k: int = 5) -> str:
    return values_sql(audio_knn_rows(n, k),
                      ["query_id", "neighbor_id", "cosine"],
                      ["VARCHAR", "VARCHAR", "DOUBLE"])


@lru_cache(maxsize=None)
def audio_semantic_dedup_rows(n: int = 600, n_clusters: int = 6,
                              threshold: float = 0.9995) -> tuple:
    """Expected ``semantic_dedup(spectral_embeddings(clips))`` output:
    independent decode + embedding recompute, then the SemDeDup anchor
    assignment and within-cluster earliest-dominator rule replayed in
    plain numpy loops.  ``sim_r`` reproduces Spark's ``F.round``
    HALF_UP-on-shortest-repr semantics via Decimal(repr(x))."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    emb_by_id = _spectral_emb_by_id(n)
    ids = sorted(emb_by_id)
    X = np.array([emb_by_id[c] for c in ids])
    norms = np.maximum(np.linalg.norm(X, axis=1), 1e-12)
    anch = X[:n_clusters]
    an = np.maximum(np.linalg.norm(anch, axis=1), 1e-12)
    assign = np.argmax((X @ anch.T) / (norms[:, None] * an[None, :]),
                       axis=1)

    def r4(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                               ROUND_HALF_UP))

    out = []
    for c in range(n_clusters):
        members = [i for i in range(len(ids)) if assign[i] == c]
        for pos, i in enumerate(members):
            dup = None
            for j in members[:pos]:
                cs = float(X[i] @ X[j]) / (norms[i] * norms[j])
                if cs >= threshold:
                    dup = (ids[j], r4(cs))
                    break
            out.append((ids[i], int(c), dup is not None,
                        dup[0] if dup else None,
                        dup[1] if dup else None))
    return tuple(out)


def audio_semantic_dedup_sql(n: int = 600, n_clusters: int = 6,
                             threshold: float = 0.9995) -> str:
    return values_sql(
        audio_semantic_dedup_rows(n, n_clusters, threshold),
        ["clip_id", "cluster_id", "is_dup", "dup_of", "sim_r"],
        ["VARCHAR", "INTEGER", "BOOLEAN", "VARCHAR", "DOUBLE"])


@lru_cache(maxsize=None)
def audio_suite_rows(n: int = 2000, parts: int = 4,
                     dur_tol_ms: int = 50) -> tuple:
    """Expected violations of ``validate_audio_table(df, manifest)`` on
    ``audio_clips_df(spark, n, parts)`` — every rule family re-derived
    here directly from the fixture definition."""
    import re

    # fixture generation is shared input data (pure function of i)
    from datatest_spark.fixtures import (
        _transcript_words,
        clip_id_for,
        clip_params,
        synth_clip_bytes,
    )

    data_rows = []  # (clip_id, sr, dur, codec, transcript, buf, part)
    for i in range(n):
        p = clip_params(i)
        if p.dup_of is not None:
            src = clip_params(p.dup_of)
            data_rows.append(
                (clip_id_for(i), src.decl_sr, src.decl_dur_ms, src.codec,
                 src.transcript, synth_clip_bytes(p.dup_of), p.dup_of % parts)
            )
        else:
            data_rows.append(
                (clip_id_for(i), p.decl_sr, p.decl_dur_ms, p.codec,
                 p.transcript, synth_clip_bytes(i), i % parts)
            )

    out = []
    clip_re = re.compile(r"^clip-\d{12}$")

    # --- fused row rules (key NULL, partition attributed)
    for clip_id, sr, dur, codec, transcript, buf, part in data_rows:
        ps = str(part)
        if sr < 8000:
            out.append(("interval:sr_hz", None, "sr_hz", "DEVIATION",
                        str(sr), "8000", float(sr - 8000), 8000.0, ps))
        elif sr > 48000:
            out.append(("interval:sr_hz", None, "sr_hz", "DEVIATION",
                        str(sr), "48000", float(sr - 48000), 48000.0, ps))
        if dur < 1:
            out.append(("interval:dur_ms", None, "dur_ms", "DEVIATION",
                        str(dur), "1", float(dur - 1), 1.0, ps))
        elif dur > 120_000:
            out.append(("interval:dur_ms", None, "dur_ms", "DEVIATION",
                        str(dur), "120000", float(dur - 120_000), 120_000.0, ps))
        if sr not in _ALLOWED_SRS:
            out.append(("sr_hz:allowed", None, "sr_hz", "INVALID",
                        str(sr), None, None, None, ps))
        if not clip_re.search(clip_id):
            out.append(("regex:clip_id", None, "clip_id", "INVALID",
                        clip_id, None, None, None, ps))

    # --- unique:clip_id (global; one Extra per duplicate occurrence)
    from collections import Counter

    counts = Counter(r[0] for r in data_rows)
    for clip_id, c in sorted(counts.items()):
        for _ in range(c - 1):
            out.append(("unique:clip_id", None, "clip_id", "EXTRA",
                        clip_id, None, None, None, None))

    # --- subset:codec (global; deduped Extras)
    for v in sorted({r[3] for r in data_rows} - _ALLOWED_CODECS):
        out.append(("subset:codec", None, "codec", "EXTRA",
                    v, None, None, None, None))

    # --- audio consistency (per-row, decode-derived, partition attributed)
    for clip_id, sr, dur, codec, transcript, buf, part in data_rows:
        ps = str(part)
        try:
            dec_codec, dec_sr, n_samples = _sim_decode(buf)
        except ValueError as e:
            out.append(("audio:decodable", clip_id, "bytes", "INVALID",
                        str(e), "decodable audio payload", None, None, ps))
            continue
        dec_dur = int(round(1000.0 * n_samples / dec_sr))
        if dec_sr != sr:
            out.append(("audio:sr_hz", clip_id, "sr_hz", "DEVIATION",
                        str(sr), str(dec_sr), float(sr - dec_sr),
                        float(dec_sr), ps))
        if abs(dec_dur - dur) > dur_tol_ms:
            out.append(("audio:dur_ms", clip_id, "dur_ms", "DEVIATION",
                        str(dur), str(dec_dur), float(dur - dec_dur),
                        float(dec_dur), ps))
        if dec_codec != codec:
            out.append(("audio:codec", clip_id, "codec", "INVALID",
                        codec, dec_codec, None, None, ps))

    # --- subset:clip_id ⊆ manifest (manifest covers a superset of ids
    # by construction → no Extras; simulate anyway for honesty)
    n_manifest = n + max(1, n // 100)
    manifest_ids = {f"clip-{i:012d}" for i in range(n_manifest)}
    for v in sorted({r[0] for r in data_rows} - manifest_ids):
        out.append(("subset:clip_id_manifest", None, "clip_id", "EXTRA",
                    v, None, None, None, None))

    # --- ref_match: transcript equality vs manifest (per data row,
    # partition attributed)
    for clip_id, sr, dur, codec, transcript, buf, part in data_rows:
        idx = int(clip_id[5:])
        ref = _transcript_words(idx) if idx < n_manifest else None
        if transcript == ref:
            continue
        if ref is None:
            continue  # missing_ref_ok
        out.append(("ref_match:transcript", clip_id, "transcript", "INVALID",
                    transcript, ref, None, None, str(part)))
    return tuple(out)


def audio_suite_sql(n: int = 2000, parts: int = 4) -> str:
    return violations_values_sql(audio_suite_rows(n, parts))


def streaming_audio_sql(n: int = 1000, parts: int = 4) -> str:
    """Expected violations of the STREAMING audio run: the decode-rule
    family only (audio:*) — per-row rules, so the union over
    micro-batches must equal the batch result, partition attribution
    included."""
    rows = [r for r in audio_suite_rows(n, parts)
            if r[0].startswith("audio:")]
    return violations_values_sql(rows)


# ---------------------------------------------------------------------------
# minhash_estimated — the default (exact=False) MinHash+LSH path:
# per-seed signature families chained through Spark's multi-argument
# xxhash64 fold, band buckets, estimated Jaccard as the fraction of
# agreeing components.  Everything below is integer math over the
# public XXH64 spec — no engine imports.
# ---------------------------------------------------------------------------


def _signed64(u: int) -> int:
    u &= _M
    return u - (1 << 64) if u >= (1 << 63) else u


def _h_long(v: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long — Spark's
    XxHash64Function.hashLong twin (verified bit-exact)."""
    return xxh64(struct.pack("<q", _signed64(v)), seed)


def _h_int(v: int, seed: int) -> int:
    """XXH64 of one 4-byte little-endian int (IntegerType literals)."""
    return xxh64(struct.pack("<i", v), seed)


def _word_shingles_py(text: str, k: int) -> List[str]:
    """Twin of the engine's JVM shingler: split on single spaces,
    ``max(len - k + 1, 1)`` windows, short tails joined as-is."""
    toks = text.split(" ")
    n = max(len(toks) - k + 1, 1)
    return [" ".join(toks[i : i + k]) for i in range(n)]


def _minhash_signature(text: str, num_hashes: int, k: int) -> List[int]:
    base = [xxh64(s.encode("utf-8"), 42) for s in _word_shingles_py(text, k)]
    sig = []
    for seed in range(num_hashes):
        # Spark: xxhash64(base_long, lit(seed:int)) — seed-42 fold of
        # hashLong(base) then hashInt(seed); min compares SIGNED longs
        sig.append(
            min(_signed64(_h_int(seed, _h_long(b, 42))) for b in base)
        )
    return sig


@lru_cache(maxsize=None)
def minhash_estimated_rows(sf_dir: str = SF001_DIR, num_hashes: int = 32,
                           bands: int = 16, shingle_k: int = 3,
                           min_jaccard: float = 0.35) -> tuple:
    import math

    docs = [(d, t) for d, t in _read_docs(sf_dir) if t is not None]
    rows_per_band = num_hashes // bands
    sigs = {d: _minhash_signature(t, num_hashes, shingle_k) for d, t in docs}

    buckets: dict = {}
    for d, sig in sigs.items():
        for b in range(bands):
            h = 42
            for r in range(rows_per_band):
                h = _h_long(sig[b * rows_per_band + r], h)
            buckets.setdefault((b, _signed64(h)), []).append(d)

    pairs = set()
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))

    out = []
    for id_a, id_b in sorted(pairs):
        agree = sum(
            1 for x, y in zip(sigs[id_a], sigs[id_b]) if x == y
        )
        est = agree / float(num_hashes)
        # Spark F.round is HALF_UP; est is dyadic (k/2^m) so exact
        est_r = math.floor(est * 10000 + 0.5) / 10000
        if est_r >= min_jaccard:
            out.append((id_a, id_b, est_r))
    return tuple(out)


@lru_cache(maxsize=None)
def decontaminate_neardup_rows(sf_dir: str = SF001_DIR,
                               num_hashes: int = 32, bands: int = 16,
                               shingle_k: int = 3,
                               min_jaccard: float = 0.35,
                               max_bucket_size: int = 10_000) -> tuple:
    """Expected ``decontaminate_neardup(train, eval)`` rows for the
    doc_id%17 split — pure-Python signature recompute, cross-corpus
    banded-bucket candidacy emulation (incl. the train-side bucket
    cap), TRUE shingle Jaccard on candidates."""
    docs = [(d, t) for d, t in _read_docs(sf_dir) if t is not None]
    tr = [(d, t) for d, t in docs if d % 17 != 0]
    ev = [(d, t) for d, t in docs if d % 17 == 0]
    rows_per_band = num_hashes // bands

    def buckets(side):
        out: dict = {}
        for d, t in side:
            sig = _minhash_signature(t, num_hashes, shingle_k)
            for b in range(bands):
                h = 42
                for r in range(rows_per_band):
                    h = _h_long(sig[b * rows_per_band + r], h)
                out.setdefault((b, _signed64(h)), []).append(d)
        return out

    tb, eb = buckets(tr), buckets(ev)
    tb = {k: v for k, v in tb.items() if len(v) <= max_bucket_size}
    cands = sorted({
        (t, e)
        for key in tb.keys() & eb.keys()
        for t in tb[key] for e in eb[key]
    })
    sets = {
        d: set(_word_shingles_py(t, shingle_k)) for d, t in tr + ev
    }
    out = []
    for t, e in cands:
        sa, sb = sets[t], sets[e]
        inter = len(sa & sb)
        j = _round_half_up4(inter / (len(sa) + len(sb) - inter))
        if j >= min_jaccard:
            out.append((t, e, j))
    return tuple(out)


def decontaminate_neardup_sql(sf_dir: str = SF001_DIR,
                              num_hashes: int = 32, bands: int = 16,
                              shingle_k: int = 3,
                              min_jaccard: float = 0.35) -> str:
    return values_sql(
        decontaminate_neardup_rows(sf_dir, num_hashes, bands, shingle_k,
                                   min_jaccard),
        ["train_id", "eval_id", "jaccard"],
        ["BIGINT", "BIGINT", "DOUBLE"])


def minhash_estimated_sql(sf_dir: str = SF001_DIR, num_hashes: int = 32,
                          bands: int = 16, shingle_k: int = 3,
                          min_jaccard: float = 0.35) -> str:
    return values_sql(
        minhash_estimated_rows(sf_dir, num_hashes, bands, shingle_k,
                               min_jaccard),
        ["id_a", "id_b", "est_jaccard"],
        ["BIGINT", "BIGINT", "DOUBLE"],
    )


# ---------------------------------------------------------------------------
# order_lcs — grouped validate.order: per-group LCS diff opcodes vs a
# required sequence (reference requirements.py:656-709 semantics:
# insert → Missing((i1, v)), delete → Extra((idx, v)), replace →
# paired Missing/Extra per position with tail spill).  Recomputed here
# over the nation parquet with its own expansion logic.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def order_lcs_rows(sf_dir: str = SF001_DIR,
                   required: Tuple[str, ...] = (),
                   rule_id: str = "order:n_name") -> tuple:
    import duckdb

    nation = duckdb.sql(
        f"SELECT n_regionkey, n_nationkey, n_name "
        f"FROM '{sf_dir}/nation.parquet' ORDER BY n_regionkey, n_nationkey"
    ).fetchall()
    groups: dict = {}
    for rk, nk, name in nation:
        groups.setdefault(rk, []).append(name)

    req = list(required)
    out = []
    for rk in sorted(groups):
        grp = groups[rk]
        key = str(rk)
        sm = difflib.SequenceMatcher(a=grp, b=req)
        for tag, i1, i2, j1, j2 in sm.get_opcodes():
            if tag == "insert":
                for v in req[j1:j2]:
                    out.append((rule_id, key, "n_name", "MISSING", None,
                                f"({i1}, {v})", None, None, None))
            elif tag == "delete":
                for idx in range(i1, i2):
                    out.append((rule_id, key, "n_name", "EXTRA",
                                f"({idx}, {grp[idx]})", None, None, None,
                                None))
            elif tag == "replace":
                ivals = grp[i1:i2]
                jvals = req[j1:j2]
                for off in range(min(len(ivals), len(jvals))):
                    out.append((rule_id, key, "n_name", "MISSING", None,
                                f"({i1 + off}, {jvals[off]})", None, None,
                                None))
                    out.append((rule_id, key, "n_name", "EXTRA",
                                f"({i1 + off}, {ivals[off]})", None, None,
                                None, None))
                if len(ivals) < len(jvals):
                    for v in jvals[len(ivals):]:
                        out.append((rule_id, key, "n_name", "MISSING", None,
                                    f"({i2}, {v})", None, None, None))
                else:
                    for off in range(len(jvals), len(ivals)):
                        out.append((rule_id, key, "n_name", "EXTRA",
                                    f"({i1 + off}, {ivals[off]})", None,
                                    None, None, None))
    return tuple(out)


def order_lcs_sql(sf_dir: str = SF001_DIR,
                  required: Tuple[str, ...] = (),
                  rule_id: str = "order:n_name") -> str:
    return violations_values_sql(order_lcs_rows(sf_dir, required, rule_id))


# ---------------------------------------------------------------------------
# acceptance_fuzzy — accepted.fuzzy over RequiredFuzzy violations.
# NOTE difflib ratio is NOT symmetric in (a, b); the requirement scores
# SequenceMatcher(a=text, b=trunc) while the acceptance mask scores
# SequenceMatcher(a=invalid=trunc, b=expected=text) — both orders are
# reproduced here exactly.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def acceptance_fuzzy_rows(sf_dir: str = SF001_DIR,
                          require_cutoff: float = 0.99,
                          accept_cutoff: float = 0.945) -> tuple:
    rows = []
    for doc_id, text in _read_docs(sf_dir):
        if doc_id % 3 == 0:
            trunc = text[: int(len(text) * 0.9)]
        else:
            trunc = text
        if trunc == text:
            continue  # exact equality passes JVM-side in the rule
        req_ratio = difflib.SequenceMatcher(a=text, b=trunc).ratio()
        if req_ratio >= require_cutoff:
            continue  # not a violation in the first place
        acc_ratio = difflib.SequenceMatcher(a=trunc, b=text).ratio()
        if acc_ratio >= accept_cutoff:
            continue  # accepted → filtered out
        rows.append(
            ("fuzzy:truncated", None, "truncated", "INVALID",
             trunc, text, None, None, None)
        )
    return tuple(rows)


def acceptance_fuzzy_sql(sf_dir: str = SF001_DIR,
                         require_cutoff: float = 0.99,
                         accept_cutoff: float = 0.945) -> str:
    return violations_values_sql(
        acceptance_fuzzy_rows(sf_dir, require_cutoff, accept_cutoff)
    )


# ---------------------------------------------------------------------------
# embedding_neardup — random-hyperplane LSH buckets + exact cosine
# within buckets.  The hyperplanes are np.random.RandomState(seed)
# (deterministic), and every dot product below replicates the engine's
# LEFT-FOLD accumulation order (F.aggregate over zip_with products) so
# the float results are bit-identical, not merely close.
# ---------------------------------------------------------------------------


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _round_half_up4(x: float) -> float:
    import math

    if x >= 0:
        return math.floor(x * 10000 + 0.5) / 10000
    return -math.floor(-x * 10000 + 0.5) / 10000


@lru_cache(maxsize=None)
def embedding_neardup_rows(sf_dir: str = SF001_DIR, planes: int = 4,
                           min_cosine: float = 0.25,
                           seed: int = 42) -> tuple:
    import math

    import duckdb
    import numpy as np

    vecs = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    dim = len(vecs[0][1])
    rng = np.random.RandomState(seed)
    hyper = rng.randn(planes, dim)

    buckets: dict = {}
    data = {}
    for vec_id, emb in vecs:
        emb = [float(v) for v in emb]
        data[vec_id] = emb
        bucket = 0
        for p in range(planes):
            if _fold_dot(emb, [float(h) for h in hyper[p]]) > 0:
                bucket += 2 ** p
        buckets.setdefault(bucket, []).append(vec_id)

    out = []
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            a = data[members[i]]
            na = math.sqrt(_fold_dot(a, a))
            for j in range(i + 1, len(members)):
                b = data[members[j]]
                cos = _fold_dot(a, b) / (na * math.sqrt(_fold_dot(b, b)))
                cos_r = _round_half_up4(cos)
                if cos_r >= min_cosine:
                    out.append((members[i], members[j], cos_r))
    return tuple(sorted(out))


def embedding_neardup_sql(sf_dir: str = SF001_DIR, planes: int = 4,
                          min_cosine: float = 0.25, seed: int = 42) -> str:
    return values_sql(
        embedding_neardup_rows(sf_dir, planes, min_cosine, seed),
        ["id_a", "id_b", "cosine"],
        ["BIGINT", "BIGINT", "DOUBLE"],
    )


# ---------------------------------------------------------------------------
# ann_ivf — IVF top-k with an injected (reproducible) training set.
# The coarse-quantizer k-means below replicates the documented IVF
# spec (seeded init choice, 5 cosine-assignment refinement passes,
# member-mean update); cell assignment, probe selection and cosine
# scoring re-derive the engine's JVM fold arithmetic in pure Python.
# ---------------------------------------------------------------------------


def _ivf_centroids(sample, n_cells: int, seed: int = 42, iters: int = 5):
    import numpy as np

    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)),
                     replace=False)
    centroids = sample[idx].copy()
    for _ in range(iters):
        norms = np.linalg.norm(sample, axis=1, keepdims=True)
        norms[norms == 0] = 1
        sn = sample / norms
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        assign = np.argmax(sn @ cn.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _round_half_up6(x: float) -> float:
    import math

    if x >= 0:
        return math.floor(x * 1e6 + 0.5) / 1e6
    return -math.floor(-x * 1e6 + 0.5) / 1e6


@lru_cache(maxsize=None)
def ann_ivf_rows(sf_dir: str = SF001_DIR, n_cells: int = 8,
                 nprobe: int = 3, k: int = 15, n_train: int = 100,
                 query_id: int = 0, seed: int = 42) -> tuple:
    import math

    import duckdb
    import numpy as np

    vecs = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    data = {vid: [float(v) for v in emb] for vid, emb in vecs}
    train = np.array(
        [data[vid] for vid in sorted(data) if vid < n_train], dtype=float
    )
    qv = data[query_id]
    centroids = _ivf_centroids(train, n_cells, seed=seed)

    # engine cell assignment: per-cell normalized-centroid literals,
    # fold-order dot / sqrt(fold self-dot), lexicographic (score, cell)
    # max (Spark array_max over structs)
    cn_lists = []
    for cvec in centroids:
        nrm = max(float(np.linalg.norm(cvec)), 1e-12)
        cn_lists.append([float(v) / nrm for v in cvec])

    def cell_of(emb):
        self_n = math.sqrt(_fold_dot(emb, emb))
        best = None
        for ci, cn in enumerate(cn_lists):
            score = _fold_dot(emb, cn) / self_n
            if best is None or (score, ci) > best:
                best = (score, ci)
        return best[1]

    qarr = np.asarray(qv, dtype=float)
    qn = qarr / max(float(np.linalg.norm(qarr)), 1e-12)
    call = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    probe = set(np.argsort(-(call @ qn))[:nprobe].tolist())

    qnorm = float(np.sqrt(np.dot(qv, qv)))
    scored = []
    for vid, emb in data.items():
        if cell_of(emb) not in probe:
            continue
        cos = _fold_dot(emb, qv) / (math.sqrt(_fold_dot(emb, emb)) * qnorm)
        scored.append((vid, _round_half_up6(cos)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return tuple(scored[:k])


def ann_ivf_sql(sf_dir: str = SF001_DIR, n_cells: int = 8,
                nprobe: int = 3, k: int = 15, n_train: int = 100,
                query_id: int = 0, seed: int = 42) -> str:
    return values_sql(
        ann_ivf_rows(sf_dir, n_cells, nprobe, k, n_train, query_id, seed),
        ["vec_id", "cosine"],
        ["BIGINT", "DOUBLE"],
    )


# ---------------------------------------------------------------------------
# ngram_jaccard — exact posting-list Jaccard, pure-Python re-derivation
# (shingle → signed XXH64 hash set per doc, optional max_df stop-shingle
# filter, brute-force pairwise Jaccard — independent of every engine
# codepath except the public XXH64 spec reimplemented above)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def ngram_jaccard_rows(sf_dir: str = SF001_DIR, n: int = 3,
                       min_jaccard: float = 0.3,
                       max_df: Optional[int] = 1000) -> tuple:
    from collections import Counter

    sets = {}
    for doc_id, text in _read_docs(sf_dir):
        if text is None:
            continue
        sets[doc_id] = {
            _signed64(xxh64(s.encode("utf-8"), 42))
            for s in _word_shingles_py(text, n)
        }
    if max_df is not None:
        freq = Counter()
        for hs in sets.values():
            freq.update(hs)
        keep = {g for g, c in freq.items() if c <= max_df}
        sets = {i: hs & keep for i, hs in sets.items()}
    rows = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        sa = sets[a]
        if not sa:
            continue
        for b in ids[i + 1:]:
            sb = sets[b]
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = _round_half_up4(inter / (len(sa) + len(sb) - inter))
            if min_jaccard is None or j >= min_jaccard:
                rows.append((a, b, j))
    return tuple(rows)


def ngram_jaccard_sql(sf_dir: str = SF001_DIR, n: int = 3,
                      min_jaccard: float = 0.3,
                      max_df: Optional[int] = 1000) -> str:
    rows = ngram_jaccard_rows(sf_dir, n, min_jaccard, max_df)
    return values_sql(rows, ["id_a", "id_b", "jaccard_r"],
                      ["BIGINT", "BIGINT", "DOUBLE"])


def dedup_clusters_sql(sf_dir: str = SF001_DIR, n: int = 2,
                       min_jaccard: float = 0.1,
                       max_df: Optional[int] = 1000) -> str:
    """Connected-components cluster collapse, verified two ways: the
    edge list is the independent pure-Python shingle recomputation
    (same spec as ngram_jaccard_sql), and the transitive closure is
    DuckDB's OWN recursive-CTE label propagation — the engine's
    large-star/small-star result must agree with an algorithm that
    shares none of its code."""
    rows = [(a, b) for a, b, _ in
            ngram_jaccard_rows(sf_dir, n, min_jaccard, max_df)]
    pairs = values_sql(rows, ["id_a", "id_b"], ["BIGINT", "BIGINT"])
    return f"""
        WITH RECURSIVE pairs AS ({pairs}),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs WHERE id_a <> id_b
          UNION
          SELECT id_b AS a, id_a AS b FROM pairs WHERE id_a <> id_b
        ),
        walk(node, label) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, w.label FROM edges e JOIN walk w ON e.a = w.node
        ),
        comp AS (
          SELECT node, MIN(label) AS cluster_id FROM walk GROUP BY node
        ),
        sizes AS (
          SELECT cluster_id, COUNT(*) AS csize FROM comp GROUP BY cluster_id
        )
        SELECT d.doc_id,
               COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
               CAST(COALESCE(s.csize, 1) AS BIGINT) AS cluster_size,
               (d.doc_id = COALESCE(c.cluster_id, d.doc_id)) AS is_canonical
        FROM documents d
        LEFT JOIN comp c ON d.doc_id = c.node
        LEFT JOIN sizes s ON c.cluster_id = s.cluster_id
    """


# ---------------------------------------------------------------------------
# fingerprint — full-text XXH64 + winnowed min-hash over 8-char shingles
# (rolling-fingerprint family; pure-Python XXH64 spec, char-window twin
# of the engine's substr shingler)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def fingerprint_rows(sf_dir: str = SF001_DIR, shingle_len: int = 8) -> tuple:
    rows = []
    for doc_id, text in _read_docs(sf_dir):
        if text is None:
            rows.append((doc_id, None, None))
            continue
        th = _signed64(xxh64(text.encode("utf-8"), 42))
        nsh = max(len(text) - shingle_len + 1, 1)
        mh = min(
            _signed64(
                xxh64(text[i:i + shingle_len].encode("utf-8"), 42)
            )
            for i in range(nsh)
        )
        rows.append((doc_id, th, mh))
    return tuple(rows)


def fingerprint_sql(sf_dir: str = SF001_DIR, shingle_len: int = 8) -> str:
    rows = fingerprint_rows(sf_dir, shingle_len)
    return values_sql(rows, ["doc_id", "text_hash", "shingle_min_hash"],
                      ["BIGINT", "BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# image_features / video_lumas — first-principles re-derivation from the
# fixture DEFINITION (no byte parsing: the fixture is a pure function of
# the row index, so expected features follow from the spec).  Shared
# code with the engine is limited to fixture *generation*
# (datatest_spark.fixtures synth arrays + injection periods); the
# feature math below (integer BT.601 dHash, pixel-center resize,
# channel means, frame sampling) is plain-Python reimplemented.
# ---------------------------------------------------------------------------


def _dhash_py(arr) -> int:
    """Independent dHash: integer grayscale, 9x8 pixel-center nearest
    resize, horizontal gradient sign — loops, no numpy."""
    h, w = len(arr), len(arr[0])
    gray = [
        [299 * p[0] + 587 * p[1] + 114 * p[2] for p in row] for row in arr
    ]
    ys = [min((2 * i + 1) * h // 16, h - 1) for i in range(8)]
    xs = [min((2 * j + 1) * w // 18, w - 1) for j in range(9)]
    out = 0
    for y in ys:
        row = gray[y]
        for c in range(8):
            out = (out << 1) | (1 if row[xs[c + 1]] > row[xs[c]] else 0)
    return out - (1 << 64) if out >= (1 << 63) else out


@lru_cache(maxsize=None)
def image_features_rows(n: int = 400) -> tuple:
    from datatest_spark.fixtures import _mix, synth_image_array

    rows = []
    for i in range(n):
        rid = f"img-{i:012d}"
        if i % 97 == 13:
            rows.append((rid, False, None, None, None, None, None, None,
                         None))
            continue
        src = i - 1 if (i % 50 == 7 and i > 0) else i
        arr = synth_image_array(src).tolist()
        h, w = len(arr), len(arr[0])
        sums = [0, 0, 0]
        for row in arr:
            for p in row:
                sums[0] += p[0]
                sums[1] += p[1]
                sums[2] += p[2]
        npx = h * w
        codec = "bmp" if (_mix(src, 53) % 2 == 0) ^ (src != i) else "ppm"
        rows.append(
            (rid, True, codec, w, h,
             sums[0] / npx, sums[1] / npx, sums[2] / npx, _dhash_py(arr))
        )
    return tuple(rows)


def image_features_sql(n: int = 400) -> str:
    return values_sql(
        image_features_rows(n),
        ["id", "ok", "codec", "width", "height",
         "mean_r", "mean_g", "mean_b", "dhash"],
        ["VARCHAR", "BOOLEAN", "VARCHAR", "INT", "INT",
         "DOUBLE", "DOUBLE", "DOUBLE", "BIGINT"],
    )


@lru_cache(maxsize=None)
def video_lumas_rows(n: int = 120, every_nth: int = 2) -> tuple:
    from datatest_spark.fixtures import synth_video_frames

    rows = []
    for i in range(n):
        rid = f"vid-{i:012d}"
        if i % 89 == 11:
            rows.append((rid, False, None, None))
            continue
        frames = synth_video_frames(i).tolist()
        sampled = frames[::every_nth]
        for idx, frame in enumerate(sampled):
            tot = cnt = 0
            for row in frame:
                for p in row:
                    tot += p[0]
                    cnt += 1
            rows.append((rid, True, idx, tot / cnt))
    return tuple(rows)


def video_lumas_sql(n: int = 120, every_nth: int = 2) -> str:
    return values_sql(
        video_lumas_rows(n, every_nth),
        ["id", "ok", "frame_idx", "mean_luma"],
        ["VARCHAR", "BOOLEAN", "INT", "DOUBLE"],
    )


@lru_cache(maxsize=None)
def image_suite_rows(n: int = 400, parts: int = 4) -> tuple:
    """Expected image-suite violations from the fixture definition:
    corrupt payloads (i%97==13) → decodable INVALID; declared-width
    lies (i%53==29) → width DEVIATION of exactly +7.  Regex/unique
    rules never fire (ids are well-formed and unique by construction)."""
    from datatest_spark.fixtures import synth_image_array

    rows = []
    for i in range(n):
        rid = f"img-{i:012d}"
        part = str(i % parts)
        if i % 97 == 13:
            rows.append(
                ("image:decodable", rid, "bytes", "INVALID",
                 "undecodable image payload", "decodable ppm/bmp payload",
                 None, None, part)
            )
            continue
        if i % 53 == 29:
            src = i - 1 if (i % 50 == 7 and i > 0) else i
            w = len(synth_image_array(src)[0])
            rows.append(
                ("image:width", rid, "decl_width", "DEVIATION",
                 str(w + 7), str(w), 7.0, float(w), part)
            )
    return tuple(rows)


def image_suite_sql(n: int = 400, parts: int = 4) -> str:
    return violations_values_sql(image_suite_rows(n, parts))


@lru_cache(maxsize=None)
def video_suite_rows(n: int = 400, parts: int = 4) -> tuple:
    """Expected video-suite violations from the fixture definition:
    corrupt payloads (i%89==11) → decodable INVALID; declared-frames
    lies (i%31==5) → frames DEVIATION of exactly +2."""
    from datatest_spark.fixtures import synth_video_frames

    rows = []
    for i in range(n):
        rid = f"vid-{i:012d}"
        part = str(i % parts)
        if i % 89 == 11:
            rows.append(
                ("video:decodable", rid, "bytes", "INVALID",
                 "undecodable video payload", "decodable y4m payload",
                 None, None, part)
            )
            continue
        if i % 31 == 5:
            nf = len(synth_video_frames(i))
            rows.append(
                ("video:frames", rid, "decl_frames", "DEVIATION",
                 str(nf + 2), str(nf), 2.0, float(nf), part)
            )
    return tuple(rows)


def video_suite_sql(n: int = 400, parts: int = 4) -> str:
    return violations_values_sql(video_suite_rows(n, parts))


@lru_cache(maxsize=None)
def segment_plan_rows(n: int = 2000, window_ms: int = 2000,
                      hop_ms: int = 1000, min_ms: int = 200,
                      max_chunks: int = 8) -> tuple:
    """Expected chunk grid of audio.segment_plan over the fixture
    table's DECLARED durations — re-derived from clip_params."""
    import math

    from datatest_spark.fixtures import clip_id_for, clip_params

    out = []
    for i in range(n):
        p = clip_params(i)
        dur = (clip_params(p.dup_of).decl_dur_ms
               if p.dup_of is not None else p.decl_dur_ms)
        if dur <= 0:
            continue
        cid = clip_id_for(i)
        nch = min(math.ceil(dur / hop_ms), max_chunks)
        for k in range(nch):
            start = k * hop_ms
            cms = min(window_ms, dur - start)
            if cms >= min_ms:
                out.append((cid, k, start, cms))
    return tuple(out)


def segment_plan_sql(n: int = 2000, window_ms: int = 2000,
                     hop_ms: int = 1000, min_ms: int = 200,
                     max_chunks: int = 8) -> str:
    return values_sql(
        segment_plan_rows(n, window_ms, hop_ms, min_ms, max_chunks),
        ["clip_id", "chunk_idx", "start_ms", "chunk_ms"],
        ["VARCHAR", "BIGINT", "BIGINT", "BIGINT"],
    )


def audio_packing_rows(n: int = 2000, window_ms: int = 2000,
                       hop_ms: int = 1000, min_ms: int = 200,
                       max_chunks: int = 8, budget_ms: int = 30_000,
                       ) -> tuple:
    """Expected (shard, bin) duration-packing summary: the segment
    grid (segment_plan_rows), sharded by the first md5 hex char of
    clip_id, greedily packed by cumulative chunk_ms // budget within
    each shard ordered by (clip_id, chunk_idx) — an independent
    replay of segment_plan -> pack_sequences."""
    import hashlib
    from collections import defaultdict

    grid = segment_plan_rows(n, window_ms, hop_ms, min_ms, max_chunks)
    shards = defaultdict(list)
    for cid, k, _start, cms in grid:
        shard = hashlib.md5(cid.encode()).hexdigest()[0]
        shards[shard].append((cid, k, cms))
    agg = {}
    for shard, chunks in shards.items():
        before = 0
        for cid, k, cms in sorted(chunks):
            b = before // budget_ms
            key = (shard, b)
            cnt, tot = agg.get(key, (0, 0))
            agg[key] = (cnt + 1, tot + cms)
            before += cms
    return tuple(
        (shard, b, cnt, tot)
        for (shard, b), (cnt, tot) in sorted(agg.items())
    )


def audio_packing_sql(n: int = 2000, window_ms: int = 2000,
                      hop_ms: int = 1000, min_ms: int = 200,
                      max_chunks: int = 8,
                      budget_ms: int = 30_000) -> str:
    return values_sql(
        audio_packing_rows(n, window_ms, hop_ms, min_ms, max_chunks,
                           budget_ms),
        ["shard", "bin_id", "n_chunks", "total_ms"],
        ["VARCHAR", "BIGINT", "BIGINT", "BIGINT"],
    )


def streaming_audio_dedup_rows(n: int = 1000) -> tuple:
    """Expected distinct-content set of the streaming audio dedup:
    one (sha256, byte-length) row per distinct container byte string
    in the first ``n`` fixture clips — an independent replay (fixture
    closed form + hashlib), no xxhash involved."""
    import hashlib

    from datatest_spark.fixtures import clip_params, synth_clip_bytes

    seen = {}
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        buf = synth_clip_bytes(src)
        seen[hashlib.sha256(buf).hexdigest()] = len(buf)
    return tuple(sorted(seen.items()))


def streaming_audio_dedup_sql(n: int = 1000) -> str:
    return values_sql(
        streaming_audio_dedup_rows(n),
        ["content_sha", "n_bytes"],
        ["VARCHAR", "BIGINT"],
    )


def audio_mixture_rows(n: int = 2000,
                       weights=(("pcm_s16le", 0.6), ("flac", 0.25),
                                ("opus", 0.15))) -> tuple:
    """Expected audio-hours mixture plan over the fixture's DECLARED
    codec/dur_ms columns: available = per-codec sum of declared dur_ms
    (poisoned values included — the plan audits what the column says),
    N = min(available/weight), take = floor(weight * N); codecs
    outside the weight map (including the injected invalid values) are
    audited with weight 0 / take 0."""
    import math

    from datatest_spark.fixtures import clip_params

    wmap = dict(weights)
    avail = {}
    for i in range(n):
        p = clip_params(i)
        if p.dup_of is not None:  # dup rows carry the SOURCE's
            p = clip_params(p.dup_of)  # declared codec + duration
        avail[p.codec] = avail.get(p.codec, 0) + p.decl_dur_ms
    n_total = min(avail.get(c, 0) / w for c, w in wmap.items())
    strata = set(avail) | set(wmap)
    return tuple(sorted(
        (c, avail.get(c, 0), float(wmap.get(c, 0.0)),
         math.floor(wmap.get(c, 0.0) * n_total))
        for c in strata
    ))


def audio_mixture_sql(n: int = 2000) -> str:
    return values_sql(
        audio_mixture_rows(n),
        ["stratum", "available", "weight", "take"],
        ["VARCHAR", "BIGINT", "DOUBLE", "BIGINT"],
    )


def audio_corpus_overlap_rows(n: int = 2000) -> tuple:
    """Expected content-identity overlap between the even- and
    odd-index halves of the fixture clips: distinct container byte
    strings per side (dup rows inherit the source bytes), common
    count, Jaccard and directional containments — an independent
    hashlib replay of the engine's xxhash64-keyed set algebra."""
    import hashlib

    from datatest_spark.fixtures import clip_params, synth_clip_bytes

    sides = ({}, {})
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        d = hashlib.sha256(synth_clip_bytes(src)).hexdigest()
        # side by SOURCE index parity: clip_id carries the source
        # index (dup rows share the source's id), so this is exactly
        # the split the engine derives from the clip_id suffix
        sides[src % 2][d] = True
    a, b = set(sides[0]), set(sides[1])
    common = len(a & b)
    return ((len(a), len(b), common,
             common / len(a | b),
             common / len(a),
             common / len(b)),)


def audio_corpus_overlap_sql(n: int = 2000) -> str:
    return values_sql(
        audio_corpus_overlap_rows(n),
        ["contents_a", "contents_b", "contents_common",
         "jaccard", "containment_a", "containment_b"],
        ["BIGINT", "BIGINT", "BIGINT", "DOUBLE", "DOUBLE", "DOUBLE"],
    )


# ---------------------------------------------------------------------------
# ASR transcript fidelity (CER / WER) — independent pair recompute;
# CER distances come from DuckDB's OWN levenshtein, WER from a plain
# O(mn)-loop DP (purposely not the engine's vectorized two-row form)
# ---------------------------------------------------------------------------


def _word_dp(a: Sequence[str], b: Sequence[str]) -> int:
    """Independent unit-cost word edit distance (textbook loops)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


@lru_cache(maxsize=None)
def transcript_pair_rows(n: int = 2000) -> tuple:
    """(clip_id, hypothesis, reference) per table row, straight from
    the fixture parameter definition: dup rows carry the SOURCE row's
    clip_id AND transcript; the manifest reference is keyed by the
    underlying source index."""
    from datatest_spark.fixtures import _transcript_words, clip_params

    rows = []
    for i in range(n):
        p = clip_params(i)
        idx = p.dup_of if p.dup_of is not None else i
        rows.append((f"clip-{idx:012d}",
                     clip_params(idx).transcript,
                     _transcript_words(idx)))
    return tuple(rows)


def transcript_cer_sql(n: int = 2000) -> str:
    pairs = values_sql(transcript_pair_rows(n),
                       ["clip_id", "hyp", "ref_t"],
                       ["VARCHAR", "VARCHAR", "VARCHAR"])
    return f"""
        SELECT clip_id,
               CAST(length(ref_t) AS BIGINT) AS ref_chars,
               CAST(levenshtein(coalesce(hyp, ''), ref_t) AS BIGINT)
                   AS char_edits,
               round(levenshtein(coalesce(hyp, ''), ref_t)
                     / greatest(length(ref_t), 1), 6) AS cer
        FROM ({pairs}) AS p
    """


@lru_cache(maxsize=None)
def transcript_wer_rows(n: int = 2000) -> tuple:
    rows = []
    for cid, hyp, ref in transcript_pair_rows(n):
        rw = len(ref.split())
        wd = _word_dp((hyp or "").split(), ref.split())
        rows.append((cid, rw, wd, round(wd / max(rw, 1), 6)))
    return tuple(rows)


def transcript_wer_sql(n: int = 2000) -> str:
    return values_sql(transcript_wer_rows(n),
                      ["clip_id", "ref_words", "word_edits", "wer"],
                      ["VARCHAR", "BIGINT", "BIGINT", "DOUBLE"])


@lru_cache(maxsize=None)
def audio_noise_rows(n: int = 600, parts: int = 4,
                     snr_db: float = 20.0, salt: str = "nz1") -> tuple:
    """Expected ``augment_noise(audio_clips_df(spark, n, parts),
    snr_db, salt=salt)`` rows — md5 seed derivation + an inline
    RandomState noise-mix replay (scale = sqrt(P_sig / (P_noise *
    10^(snr/10))), rint, int16 clamp — re-stated here, not imported) +
    independent decode/encode + sha256."""
    import hashlib

    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        seed = int(hashlib.md5(
            (clip_id + salt).encode("utf-8")).hexdigest()[:8], 16)
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, seed, None, None, None))
            continue
        sig = pcm.astype(np.float64)
        sig_power = float(np.dot(sig, sig))
        if len(pcm) == 0 or sig_power == 0.0:
            mixed, achieved = pcm, None
        else:
            noise = np.random.RandomState(
                seed % (2 ** 32)).standard_normal(len(pcm))
            noise_power = float(np.dot(noise, noise))
            import math as _math

            # math.sqrt (correctly rounded), NOT ** 0.5 (libm pow, not
            # guaranteed correctly rounded) — a 1-ulp scale divergence
            # could flip np.rint at a .5 boundary and break the
            # bit-exact sha certification on some platforms
            scale = _math.sqrt(
                sig_power / (noise_power * 10.0 ** (snr_db / 10.0)))
            mixed = np.clip(np.rint(sig + noise * scale),
                            -32768, 32767).astype(np.int16)
            achieved = float(snr_db)
        sha = hashlib.sha256(_sim_encode_wav(sr, mixed)).hexdigest()
        out.append((clip_id, True, sr, seed, achieved, len(mixed), sha))
    return tuple(out)


_NOISE_COLS = ["clip_id", "ok", "sr_hz", "noise_seed", "snr_db",
               "n_samples", "content_sha"]
_NOISE_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "DOUBLE",
                "BIGINT", "VARCHAR"]


def audio_noise_sql(n: int = 600, parts: int = 4,
                    snr_db: float = 20.0, salt: str = "nz1") -> str:
    return values_sql(audio_noise_rows(n, parts, snr_db, salt),
                      _NOISE_COLS, _NOISE_CASTS)


# ---------------------------------------------------------------------------
# Shard export (operators/shards.py) — md5-ordered running-total shard
# assignment replayed driver-side, and the ustar byte layout
# re-implemented from the POSIX spec (NOT stdlib tarfile) so the
# per-shard sha256 certification is genuinely independent
# ---------------------------------------------------------------------------


def _tar_blocks(n: int) -> int:
    """Footprint of one tar member: 512-byte header + padded payload."""
    return 512 + ((n + 511) // 512) * 512


def _shard_plan(n: int, target: int, salt: str):
    """Replay plan_shards over the n-clip fixture: returns the ordered
    list of (clip_id, audio_bytes, text_bytes, block_bytes, shard_id,
    offset, audio, text) with offsets assigned by the running total."""
    import hashlib

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    clips = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        audio = synth_clip_bytes(src)
        text = (clip_params(src).transcript or "").encode("utf-8")
        ord_key = hashlib.md5((clip_id + salt).encode("utf-8")).hexdigest()
        clips.append((ord_key, clip_id, audio, text))
    clips.sort(key=lambda t: (t[0], t[1]))

    out, cum, shard_cum, prev_shard = [], 0, 0, None
    for _, clip_id, audio, text in clips:
        block = _tar_blocks(len(audio)) + _tar_blocks(len(text))
        shard = cum // target
        if shard != prev_shard:
            shard_cum, prev_shard = 0, shard
        out.append((clip_id, len(audio), len(text), block, shard,
                    shard_cum, audio, text))
        cum += block
        shard_cum += block
    return out


def shard_plan_rows(n: int = 600, target: int = 256 * 1024,
                    salt: str = "sh1") -> tuple:
    return tuple(r[:6] for r in _shard_plan(n, target, salt))


_SHARD_PLAN_COLS = ["clip_id", "audio_bytes", "text_bytes",
                    "block_bytes", "shard_id", "offset"]
_SHARD_PLAN_CASTS = ["VARCHAR", "BIGINT", "BIGINT", "BIGINT", "BIGINT",
                     "BIGINT"]


def shard_plan_sql(n: int = 600, target: int = 256 * 1024,
                   salt: str = "sh1") -> str:
    return values_sql(shard_plan_rows(n, target, salt),
                      _SHARD_PLAN_COLS, _SHARD_PLAN_CASTS)


def _ustar_header(name: str, size: int) -> bytes:
    """One POSIX ustar header block with the engine's zeroed-metadata
    contract (mode 0644, uid/gid/mtime 0, empty uname/gname)."""
    nb = name.encode("utf-8")
    h = bytearray(512)
    h[0:len(nb)] = nb                          # name, NUL padded
    h[100:108] = b"0000644\x00"                # mode
    h[108:116] = b"0000000\x00"                # uid
    h[116:124] = b"0000000\x00"                # gid
    h[124:136] = ("%011o" % size).encode() + b"\x00"
    h[136:148] = b"00000000000\x00"            # mtime 0
    h[148:156] = b" " * 8                      # chksum placeholder
    h[156:157] = b"0"                          # typeflag: regular file
    h[257:263] = b"ustar\x00"                  # magic
    h[263:265] = b"00"                         # version
    chksum = sum(h)
    h[148:156] = ("%06o" % chksum).encode() + b"\x00 "
    return bytes(h)


def _replay_tar(members) -> bytes:
    """members: [(name, payload_bytes)] — the full archive stream
    including end-of-archive blocks and 10 KiB record padding."""
    out = bytearray()
    for name, data in members:
        out += _ustar_header(name, len(data))
        out += data
        out += b"\x00" * ((-len(data)) % 512)
    out += b"\x00" * 1024
    out += b"\x00" * ((-len(out)) % 10240)
    return bytes(out)


def shard_export_rows(n: int = 600, target: int = 256 * 1024,
                      salt: str = "sh1", audio_ext: str = "wav") -> tuple:
    """Expected shard_tars digests: per-shard (shard_id, n_clips,
    audio_bytes_total, tar_len, tar_sha256)."""
    import hashlib

    plan = _shard_plan(n, target, salt)
    shards = {}
    for clip_id, a_len, _t_len, _blk, shard, _off, audio, text in plan:
        shards.setdefault(shard, []).append((clip_id, a_len, audio, text))
    out = []
    for shard in sorted(shards):
        members = []
        total = 0
        for clip_id, a_len, audio, text in shards[shard]:
            members.append((f"{clip_id}.{audio_ext}", audio))
            members.append((f"{clip_id}.txt", text))
            total += a_len
        raw = _replay_tar(members)
        out.append((shard, len(shards[shard]), total, len(raw),
                    hashlib.sha256(raw).hexdigest()))
    return tuple(out)


_SHARD_EXPORT_COLS = ["shard_id", "n_clips", "audio_bytes_total",
                      "tar_len", "tar_sha256"]
_SHARD_EXPORT_CASTS = ["BIGINT", "BIGINT", "BIGINT", "BIGINT", "VARCHAR"]


def shard_export_sql(n: int = 600, target: int = 256 * 1024,
                     salt: str = "sh1") -> str:
    return values_sql(shard_export_rows(n, target, salt),
                      _SHARD_EXPORT_COLS, _SHARD_EXPORT_CASTS)


# ---------------------------------------------------------------------------
# Normalized WER (operators/asr.py normalize=True) — Python replay of
# the normalization contract + the textbook word DP
# ---------------------------------------------------------------------------


def _norm_transcript(s):
    """Python twin of asr.normalize_transcript: lowercase, non-
    letter/digit/whitespace → space, collapse, trim.  str.isalnum()
    matches Java's \\p{L}\\p{N} on the fixture's ASCII vocabulary."""
    if s is None:
        return None
    low = s.lower()
    swapped = "".join(
        ch if (ch.isalnum() or ch.isspace()) else " " for ch in low
    )
    return " ".join(swapped.split())


def transcript_wer_norm_rows(n: int = 2000) -> tuple:
    """Expected transcript_wer(normalize=True) over hypotheses
    surface-corrupted as upper(transcript) || ' !!' — casing and
    punctuation must cost zero edits, so the result equals the plain
    fixture WER row for row."""
    rows = []
    for cid, hyp, ref in transcript_pair_rows(n):
        h = _norm_transcript((hyp or "").upper() + " !!")
        r = _norm_transcript(ref)
        rw = len(r.split())
        wd = _word_dp((h or "").split(), r.split())
        rows.append((cid, rw, wd, round(wd / max(rw, 1), 6)))
    return tuple(rows)


def transcript_wer_norm_sql(n: int = 2000) -> str:
    return values_sql(transcript_wer_norm_rows(n),
                      ["clip_id", "ref_words", "word_edits", "wer"],
                      ["VARCHAR", "BIGINT", "BIGINT", "DOUBLE"])


def shard_roundtrip_rows(n: int = 600, target: int = 256 * 1024,
                         salt: str = "sh1") -> tuple:
    """Expected read_shards(shard_tars(...)) rows: every clip comes
    back out of its archive at the planned (shard, offset) slot with
    its exact payload (sha256) and transcript."""
    import hashlib

    rows = []
    for clip_id, _a, _t, _blk, shard, off, audio, text in _shard_plan(
            n, target, salt):
        rows.append((shard, clip_id,
                     hashlib.sha256(audio).hexdigest(),
                     text.decode("utf-8"), off))
    return tuple(rows)


_SHARD_RT_COLS = ["shard_id", "clip_id", "content_sha", "transcript",
                  "offset"]
_SHARD_RT_CASTS = ["BIGINT", "VARCHAR", "VARCHAR", "VARCHAR", "BIGINT"]


def shard_roundtrip_sql(n: int = 600, target: int = 256 * 1024,
                        salt: str = "sh1") -> str:
    return values_sql(shard_roundtrip_rows(n, target, salt),
                      _SHARD_RT_COLS, _SHARD_RT_CASTS)


@lru_cache(maxsize=None)
def audio_fbank_rows(n: int = 600, parts: int = 4,
                     frame_ms: float = 25.0, hop_ms: float = 10.0,
                     n_mels: int = 40) -> tuple:
    """Expected ``fbank_features(audio_clips_df(spark, n, parts))``
    digest rows — independent decode (struct walk above) + a
    standalone log-mel front end written from the HTK fbank recipe
    (0.97 pre-emphasis, Hamming frames, next-pow2 rfft, floor-mapped
    triangular mel bins, ln with 1e-10 floor).  The engine and this
    sim share only the published formulas; both run the same
    deterministic numpy primitives, and the round-6-then-hash digest
    absorbs any summation-order ulps."""
    import hashlib

    import numpy as np

    from datatest_spark.fixtures import clip_id_for, clip_params, \
        synth_clip_bytes

    fb_cache = {}

    def filt(sr, n_fft):
        got = fb_cache.get((sr, n_fft))
        if got is not None:
            return got
        m = 2595.0 * np.log10(1.0 + np.array([20.0, sr / 2.0]) / 700.0)
        edges = 700.0 * (10.0 ** (np.linspace(m[0], m[1], n_mels + 2)
                                  / 2595.0) - 1.0)
        n_bins = n_fft // 2 + 1
        bins = np.minimum(np.floor((n_fft + 1) * edges / sr)
                          .astype(np.int64), n_bins - 1)
        fb = np.zeros((n_mels, n_bins))
        for j in range(n_mels):
            lo, c, hi = int(bins[j]), int(bins[j + 1]), int(bins[j + 2])
            for k in range(lo, c):
                fb[j, k] = (k - lo) / (c - lo)
            for k in range(c, hi):
                fb[j, k] = (hi - k) / (hi - c)
        fb_cache[(sr, n_fft)] = fb
        return fb

    out = []
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        clip_id = clip_id_for(i)
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, None, None,
                        None, None, None, None))
            continue
        flen = int(round(sr * frame_ms / 1000.0))
        hop = int(round(sr * hop_ms / 1000.0))
        x = pcm.astype(np.float64)
        if len(x):
            x = np.concatenate(([x[0]], x[1:] - 0.97 * x[:-1]))
        if len(x) < flen:
            logm = np.zeros((0, n_mels))
        else:
            nf = 1 + (len(x) - flen) // hop
            frames = np.lib.stride_tricks.sliding_window_view(
                x, flen)[::hop][:nf]
            n_fft = 1
            while n_fft < flen:
                n_fft *= 2
            power = np.abs(np.fft.rfft(frames * np.hamming(flen),
                                       n=n_fft)) ** 2
            logm = np.log(np.maximum(power @ filt(sr, n_fft).T, 1e-10))
        r = np.round(logm, 6) + 0.0
        sha = int.from_bytes(
            hashlib.sha256(r.astype("<f8").tobytes()).digest()[:8],
            "big", signed=True)
        if r.size == 0:
            out.append((clip_id, True, sr, 0, n_mels,
                        None, None, None, sha))
        else:
            out.append((clip_id, True, sr, int(r.shape[0]), n_mels,
                        round(float(r.mean()), 6),
                        round(float(r.min()), 6),
                        round(float(r.max()), 6), sha))
    return tuple(out)


_FBANK_COLS = ["clip_id", "ok", "sr_hz", "n_frames", "n_mels",
               "logmel_mean", "logmel_min", "logmel_max", "feat_sha"]
_FBANK_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "INTEGER",
                "DOUBLE", "DOUBLE", "DOUBLE", "BIGINT"]


def audio_fbank_sql(n: int = 600, parts: int = 4) -> str:
    return values_sql(audio_fbank_rows(n, parts),
                      _FBANK_COLS, _FBANK_CASTS)


@lru_cache(maxsize=None)
def audio_pipeline_rows(n: int = 600, parts: int = 4,
                        apply_cmvn: bool = False,
                        augment: bool = False, salt: str = "",
                        n_mfcc: int = 0, n_mels: int = 40,
                        deltas: int = 0) -> tuple:
    """Expected ``feature_pipeline(...)`` digest rows — extends the
    :func:`audio_fbank_rows` first-principles fbank replay with
    standalone SpecAugment (frozen-stream RandomState span draws,
    mean fill), per-utterance CMVN (population std, 1e-8 floor) and
    an orthonormal DCT-II built from its textbook formula.  Stage
    order matches the engine contract: mask → normalize → DCT."""
    import hashlib

    import numpy as np

    from datatest_spark.fixtures import clip_params, clip_id_for, \
        synth_clip_bytes

    # reuse the fbank replay for the front end (same file, still
    # independent of the engine)
    base = {}
    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        base[i] = (clip_id_for(i), src)

    fb_cache = {}

    def filt(sr, n_fft):
        got = fb_cache.get((sr, n_fft))
        if got is not None:
            return got
        m = 2595.0 * np.log10(1.0 + np.array([20.0, sr / 2.0]) / 700.0)
        edges = 700.0 * (10.0 ** (np.linspace(m[0], m[1], n_mels + 2)
                                  / 2595.0) - 1.0)
        n_bins = n_fft // 2 + 1
        bins = np.minimum(np.floor((n_fft + 1) * edges / sr)
                          .astype(np.int64), n_bins - 1)
        fb = np.zeros((n_mels, n_bins))
        for j in range(n_mels):
            lo, c, hi = int(bins[j]), int(bins[j + 1]), int(bins[j + 2])
            for k in range(lo, c):
                fb[j, k] = (k - lo) / (c - lo)
            for k in range(c, hi):
                fb[j, k] = (hi - k) / (hi - c)
        fb_cache[(sr, n_fft)] = fb
        return fb

    if n_mfcc:
        jj = np.arange(n_mels, dtype=np.float64)
        kk = np.arange(n_mfcc, dtype=np.float64)[:, None]
        dct = np.sqrt(2.0 / n_mels) * np.cos(
            np.pi * kk * (2.0 * jj + 1.0) / (2.0 * n_mels))
        dct[0] *= 1.0 / np.sqrt(2.0)

    out = []
    out_coeffs = (n_mfcc if n_mfcc else n_mels) * (1 + deltas)

    def delta(m, window=2):
        nfr = m.shape[0]
        denom = 2.0 * sum(k * k for k in range(1, window + 1))
        ii = np.arange(nfr)
        d = np.zeros_like(m)
        for k in range(1, window + 1):
            d += k * (m[np.minimum(ii + k, nfr - 1)]
                      - m[np.maximum(ii - k, 0)])
        return d / denom

    for i in range(n):
        clip_id, src = base[i]
        try:
            _, sr, pcm = _sim_decode_pcm(synth_clip_bytes(src))
        except ValueError:
            out.append((clip_id, False, None, None, None,
                        None, None, None, None))
            continue
        flen = int(round(sr * 25.0 / 1000.0))
        hop = int(round(sr * 10.0 / 1000.0))
        x = pcm.astype(np.float64)
        if len(x):
            x = np.concatenate(([x[0]], x[1:] - 0.97 * x[:-1]))
        if len(x) < flen:
            feats = np.zeros((0, n_mels))
        else:
            nf = 1 + (len(x) - flen) // hop
            frames = np.lib.stride_tricks.sliding_window_view(
                x, flen)[::hop][:nf]
            n_fft = 1
            while n_fft < flen:
                n_fft *= 2
            power = np.abs(np.fft.rfft(frames * np.hamming(flen),
                                       n=n_fft)) ** 2
            feats = np.log(np.maximum(power @ filt(sr, n_fft).T,
                                      1e-10))
        if augment and feats.shape[0]:
            import math as _math
            seed = int(hashlib.md5((clip_id + salt).encode("utf-8"))
                       .hexdigest()[:8], 16)
            rs = np.random.RandomState(seed & 0x7FFFFFFF)
            f2 = feats.copy()
            fill = float(feats.mean())
            for _ in range(2):
                cap = min(8, feats.shape[1])
                w = int(rs.randint(0, cap + 1))
                s = int(rs.randint(0, feats.shape[1] - w + 1))
                f2[:, s:s + w] = fill
            t_cap = int(_math.ceil(0.05 * feats.shape[0]))
            for _ in range(2):
                cap = min(t_cap, feats.shape[0])
                w = int(rs.randint(0, cap + 1)) if cap > 0 else 0
                s = int(rs.randint(0, feats.shape[0] - w + 1))
                f2[s:s + w, :] = fill
            feats = f2
        if apply_cmvn and feats.shape[0]:
            feats = feats - feats.mean(axis=0)
            std = np.sqrt((feats ** 2).mean(axis=0))
            inv = np.zeros_like(std)
            live = std > 1e-8
            inv[live] = 1.0 / std[live]
            feats = feats * inv
        if n_mfcc:
            feats = feats @ dct.T
        if deltas and feats.shape[0]:
            blocks = [feats]
            for _ in range(deltas):
                blocks.append(delta(blocks[-1]))
            feats = np.hstack(blocks)
        elif deltas:
            feats = np.zeros((0, out_coeffs))
        r = np.round(feats, 6) + 0.0
        sha = int.from_bytes(
            hashlib.sha256(r.astype("<f8").tobytes()).digest()[:8],
            "big", signed=True)
        if r.size == 0:
            out.append((clip_id, True, sr, 0, out_coeffs,
                        None, None, None, sha))
        else:
            out.append((clip_id, True, sr, int(r.shape[0]), out_coeffs,
                        round(float(r.mean()), 6),
                        round(float(r.min()), 6),
                        round(float(r.max()), 6), sha))
    return tuple(out)


_PIPE_COLS = ["clip_id", "ok", "sr_hz", "n_frames", "n_coeffs",
              "feat_mean", "feat_min", "feat_max", "feat_sha"]
_PIPE_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "INTEGER",
               "DOUBLE", "DOUBLE", "DOUBLE", "BIGINT"]


def audio_pipeline_sql(n: int = 600, parts: int = 4,
                       apply_cmvn: bool = False, augment: bool = False,
                       salt: str = "", n_mfcc: int = 0,
                       deltas: int = 0) -> str:
    return values_sql(
        audio_pipeline_rows(n, parts, apply_cmvn, augment, salt,
                            n_mfcc, 40, deltas),
        _PIPE_COLS, _PIPE_CASTS)


# ---------------------------------------------------------------------------
# Energy-VAD oracle: independent frame state machine vs the engine's
# vectorized pass (datatest_spark/audio.py:vad_runs)
# ---------------------------------------------------------------------------


def _sim_vad_runs(sr: int, pcm, frame_ms: int = 20,
                  threshold_dbfs: float = -40.0, max_gap_ms: int = 150,
                  min_speech_ms: int = 100):
    """Standalone replay of the documented VAD spec as a per-frame
    Python state machine (the engine uses one vectorized reshape +
    flatnonzero — agreement certifies the spec, not the code)."""
    import numpy as np

    frame_n = max(1, frame_ms * sr // 1000)
    n = len(pcm)
    flags = []
    pos = 0
    while pos < n:
        fr = pcm[pos:pos + frame_n].astype(np.int64)
        ssq = int((fr * fr).sum())
        m = len(fr)
        flags.append(
            float(ssq) > m * (32768.0 ** 2)
            * (10.0 ** (threshold_dbfs / 10.0))
        )
        pos += frame_n
    gap = max_gap_ms // max(1, frame_ms)
    runs = []
    cur_start = None
    last_speech = None
    for f, sp in enumerate(flags):
        if not sp:
            continue
        if cur_start is None:
            cur_start = f
        elif f - last_speech - 1 > gap:
            runs.append((cur_start, last_speech))
            cur_start = f
        last_speech = f
    if cur_start is not None:
        runs.append((cur_start, last_speech))
    out = []
    for a, b in runs:
        lo = a * frame_n
        hi = min(n, (b + 1) * frame_n)
        if (hi - lo) * 1000 // sr >= min_speech_ms:
            out.append((lo, hi))
    return out


_VAD_COLS = ["clip_id", "ok", "seg_idx", "start_ms", "end_ms",
             "dur_ms", "energy_dbfs", "sr_hz", "content_sha"]
_VAD_CASTS = ["VARCHAR", "BOOLEAN", "BIGINT", "BIGINT", "BIGINT",
              "BIGINT", "DOUBLE", "INTEGER", "VARCHAR"]


@lru_cache(maxsize=None)
def audio_vad_rows(n: int = 600, parts: int = 8) -> tuple:
    """Expected ``vad_segments(speech_clips_df(spark, n), with_bytes=
    True)`` rows with bytes → sha256: independent decode (struct
    walk), independent VAD state machine, independent WAV encode,
    hashlib digest."""
    import hashlib
    import math

    import numpy as np

    from datatest_spark.fixtures import speech_clip_bytes

    out = []
    for i in range(n):
        cid = f"sp-{i:08d}"
        try:
            _, sr, pcm = _sim_decode_pcm(speech_clip_bytes(i))
        except ValueError:
            out.append((cid, False, None, None, None, None, None,
                        None, None))
            continue
        for k, (lo, hi) in enumerate(_sim_vad_runs(sr, pcm)):
            seg = pcm[lo:hi]
            ssq = int(np.sum(seg.astype(np.int64) ** 2))
            energy = (10.0 * math.log10(ssq / (len(seg) * 32768.0 ** 2))
                      if ssq > 0 else None)
            sha = hashlib.sha256(_sim_encode_wav(sr, seg)).hexdigest()
            out.append((cid, True, k, lo * 1000 // sr, hi * 1000 // sr,
                        (hi - lo) * 1000 // sr, energy, sr, sha))
    return tuple(out)


def audio_vad_sql(n: int = 600, parts: int = 8) -> str:
    return values_sql(audio_vad_rows(n, parts), _VAD_COLS, _VAD_CASTS)


_VAD_STATS_COLS = ["clip_id", "ok", "total_ms", "speech_ms",
                   "speech_ratio", "n_segments"]
_VAD_STATS_CASTS = ["VARCHAR", "BOOLEAN", "BIGINT", "BIGINT", "DOUBLE",
                    "BIGINT"]


@lru_cache(maxsize=None)
def audio_vad_stats_rows(n: int = 600, parts: int = 8) -> tuple:
    """Expected ``vad_stats(speech_clips_df(spark, n))`` rows — same
    independent decode + state machine, per-clip accounting."""
    from datatest_spark.fixtures import speech_clip_bytes

    out = []
    for i in range(n):
        cid = f"sp-{i:08d}"
        try:
            _, sr, pcm = _sim_decode_pcm(speech_clip_bytes(i))
        except ValueError:
            out.append((cid, False, None, None, None, None))
            continue
        runs = _sim_vad_runs(sr, pcm)
        m = len(pcm)
        sp = sum(hi - lo for lo, hi in runs)
        out.append((cid, True, m * 1000 // sr, sp * 1000 // sr,
                    (sp / m) if m else 0.0, len(runs)))
    return tuple(out)


def audio_vad_stats_sql(n: int = 600, parts: int = 8) -> str:
    return values_sql(audio_vad_stats_rows(n, parts), _VAD_STATS_COLS,
                      _VAD_STATS_CASTS)


# ---------------------------------------------------------------------------
# BPE oracle: textbook fit/encode (naive per-step recount — a different
# algorithm shape than the engine's inverted-index fit) on the
# documents table
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _bpe_fit(sf_dir: str, num_merges: int,
             min_pair_count: int = 2) -> tuple:
    """Textbook BPE fit (Sennrich et al. get_stats/merge_vocab shape,
    full recount every step) → ((left, right, count), ...)."""
    from collections import Counter

    wc: Counter = Counter()
    for _, text in _read_docs(sf_dir):
        for w in (text or "").split(" "):
            if w:
                wc[w] += 1
    words = {w: tuple(w) + ("</w>",) for w in wc}
    merges = []
    for _ in range(num_merges):
        stats: Counter = Counter()
        for w, syms in words.items():
            f = wc[w]
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return tuple(merges)


def bpe_merges_rows(sf_dir: str = SF001_DIR,
                    num_merges: int = 150) -> tuple:
    return tuple(
        (k, left, right, cnt)
        for k, (left, right, cnt) in enumerate(_bpe_fit(sf_dir,
                                                        num_merges))
    )


def bpe_merges_sql(sf_dir: str = SF001_DIR,
                   num_merges: int = 150) -> str:
    return values_sql(bpe_merges_rows(sf_dir, num_merges),
                      ["rank", "left", "right", "pair_count"],
                      ["INTEGER", "VARCHAR", "VARCHAR", "BIGINT"])


def _bpe_apply(word: str, ranks: dict) -> list:
    """Independent encode: recompute the present-pair set each sweep
    (vs the engine's positional scan) — same documented spec."""
    syms = list(word) + ["</w>"]
    while True:
        present = {
            (syms[i], syms[i + 1])
            for i in range(len(syms) - 1)
        } & ranks.keys()
        if not present:
            return syms
        left, right = min(present, key=ranks.get)
        out = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


@lru_cache(maxsize=None)
def bpe_tokens_rows(sf_dir: str = SF001_DIR,
                    num_merges: int = 150) -> tuple:
    import hashlib

    ranks = {
        (left, right): k
        for k, (left, right, _) in enumerate(_bpe_fit(sf_dir,
                                                      num_merges))
    }
    out = []
    for doc_id, text in _read_docs(sf_dir):
        toks = []
        for w in (text or "").split(" "):
            if w:
                toks.extend(_bpe_apply(w, ranks))
        sha = hashlib.sha256("\x01".join(toks).encode("utf-8")).hexdigest()
        out.append((doc_id, len(toks), sha))
    return tuple(out)


def bpe_tokens_sql(sf_dir: str = SF001_DIR,
                   num_merges: int = 150) -> str:
    return values_sql(bpe_tokens_rows(sf_dir, num_merges),
                      ["doc_id", "n_tokens", "tok_sha"],
                      ["BIGINT", "INTEGER", "VARCHAR"])


_RMSIL_COLS = ["clip_id", "ok", "sr_hz", "orig_ms", "dur_ms",
               "removed_ms", "n_segments", "content_sha"]
_RMSIL_CASTS = ["VARCHAR", "BOOLEAN", "INTEGER", "BIGINT", "BIGINT",
                "BIGINT", "BIGINT", "VARCHAR"]


@lru_cache(maxsize=None)
def audio_remove_silence_rows(n: int = 600, parts: int = 8) -> tuple:
    """Expected ``remove_silence(speech_clips_df(spark, n))`` rows with
    bytes → sha256: independent decode + VAD state machine + segment
    concatenation + independent WAV encode + hashlib."""
    import hashlib

    import numpy as np

    from datatest_spark.fixtures import speech_clip_bytes

    out = []
    for i in range(n):
        cid = f"sp-{i:08d}"
        try:
            _, sr, pcm = _sim_decode_pcm(speech_clip_bytes(i))
        except ValueError:
            out.append((cid, False, None, None, None, None, None,
                        None))
            continue
        m = len(pcm)
        orig_ms = m * 1000 // sr
        runs = _sim_vad_runs(sr, pcm)
        if not runs:
            out.append((cid, True, sr, orig_ms, 0, orig_ms, 0, None))
            continue
        kept = np.concatenate([pcm[lo:hi] for lo, hi in runs])
        dur = len(kept) * 1000 // sr
        sha = hashlib.sha256(_sim_encode_wav(sr, kept)).hexdigest()
        out.append((cid, True, sr, orig_ms, dur, orig_ms - dur,
                    len(runs), sha))
    return tuple(out)


def audio_remove_silence_sql(n: int = 600, parts: int = 8) -> str:
    return values_sql(audio_remove_silence_rows(n, parts), _RMSIL_COLS,
                      _RMSIL_CASTS)


_CARD_COLS = ["codec", "n_clips", "n_undecodable", "n_distinct_content",
              "declared_ms", "decoded_ms", "n_clipped", "n_near_silent",
              "n_null_transcript"]
_CARD_CASTS = ["VARCHAR", "BIGINT", "BIGINT", "BIGINT", "BIGINT",
               "BIGINT", "BIGINT", "BIGINT", "BIGINT"]


@lru_cache(maxsize=None)
def audio_dataset_card_rows(n: int = 2000, parts: int = 4,
                            clipped_above: float = 0.01,
                            near_silent_above: float = 0.9) -> tuple:
    """Expected ``dataset_card(audio_clips_df(spark, n))`` rows:
    independent decode + integer flag counting + pure-Python xxhash64
    content identity, aggregated per declared codec + __all__."""
    import numpy as np

    from datatest_spark.fixtures import clip_params, synth_clip_bytes

    groups: dict = {}

    def bucket(codec):
        return groups.setdefault(
            codec,
            {"clips": 0, "bad": 0, "content": set(), "decl": 0,
             "dec": 0, "clip": 0, "sil": 0, "null_tr": 0},
        )

    for i in range(n):
        p = clip_params(i)
        src = p.dup_of if p.dup_of is not None else i
        decl = clip_params(src)
        buf = synth_clip_bytes(src)
        for key in (decl.codec, "__all__"):
            g = bucket(key)
            g["clips"] += 1
            g["content"].add(xxh64_signed(buf))
            g["decl"] += decl.decl_dur_ms
            if decl.transcript is None:
                g["null_tr"] += 1
            try:
                _, sr, pcm = _sim_decode_pcm(buf)
            except ValueError:
                g["bad"] += 1
                continue
            m = len(pcm)
            g["dec"] += m * 1000 // sr
            if m:
                a = np.abs(pcm.astype(np.int64))
                if int((a >= 32767).sum()) / m > clipped_above:
                    g["clip"] += 1
                if int((a <= 327).sum()) / m >= near_silent_above:
                    g["sil"] += 1
    return tuple(
        (codec, g["clips"], g["bad"], len(g["content"]), g["decl"],
         g["dec"], g["clip"], g["sil"], g["null_tr"])
        for codec, g in sorted(groups.items())
    )


def audio_dataset_card_sql(n: int = 2000, parts: int = 4) -> str:
    return values_sql(audio_dataset_card_rows(n, parts), _CARD_COLS,
                      _CARD_CASTS)


@lru_cache(maxsize=None)
def audio_prepare_vad_rows(n: int = 600, parts: int = 8,
                           target_dbfs: float = -20.0,
                           max_gain_db: float = 40.0,
                           window_ms: int = 500) -> tuple:
    """Expected ``prepare_training_audio(speech_clips_df(...),
    vad=True, window_ms=500)`` chunk rows — VAD compaction → gain →
    window replayed from first principles over the F7 speech fixture."""
    import hashlib
    import math

    import numpy as np

    from datatest_spark.fixtures import speech_clip_bytes

    out = []
    for i in range(n):
        cid = f"sp-{i:08d}"
        try:
            _, sr, pcm = _sim_decode_pcm(speech_clip_bytes(i))
        except ValueError:
            out.append((cid, False, None, None, None, None, None,
                        None))
            continue
        runs = _sim_vad_runs(sr, pcm)
        if not runs:
            out.append((cid, True, None, None, None, sr, None, None))
            continue
        seg = np.concatenate([pcm[lo:hi] for lo, hi in runs])
        m = len(seg)
        sum_sq = int(np.sum(seg.astype(np.int64) ** 2))
        if sum_sq == 0:
            out.append((cid, True, None, None, None, sr, None, None))
            continue
        rms_dbfs = 20.0 * math.log10(math.sqrt(sum_sq / m) / 32768.0)
        gain_db = min(max(target_dbfs - rms_dbfs, -max_gain_db),
                      max_gain_db)
        peak = int(np.abs(seg.astype(np.int64)).max())
        gain_db = min(gain_db, 20.0 * math.log10(32767.0 / peak))
        proc = np.clip(np.rint(seg.astype(np.float64)
                               * 10.0 ** (gain_db / 20.0)),
                       -32768, 32767).astype("<i2")
        g = round(gain_db, 6)
        win = max(1, window_ms * sr // 1000)
        k = 0
        while k * win < m:
            chunk = proc[k * win: k * win + win]
            ms = len(chunk) * 1000 // sr
            if ms >= 1:
                sha = hashlib.sha256(
                    _sim_encode_wav(sr, chunk)).hexdigest()
                out.append((cid, True, k, k * win * 1000 // sr, ms, sr,
                            g, sha))
            k += 1
    return tuple(out)


def audio_prepare_vad_sql(n: int = 600, parts: int = 8,
                          window_ms: int = 500) -> str:
    return values_sql(audio_prepare_vad_rows(n, parts,
                                             window_ms=window_ms),
                      _PREPARE_COLS, _PREPARE_CASTS)


def speech_ratio_rows(n: int = 600, parts: int = 8,
                      min_ratio: float = 0.5) -> tuple:
    """Expected ``SpeechRatioRule(min_ratio)`` violations over
    ``speech_clips_df(spark, n)`` — independent decode + VAD state
    machine, same rounding contract."""
    import numpy as np

    from datatest_spark.fixtures import speech_clip_bytes

    rid = "speech_ratio"
    out = []
    for i in range(n):
        cid = f"sp-{i:08d}"
        try:
            _, sr, pcm = _sim_decode_pcm(speech_clip_bytes(i))
        except ValueError:
            continue  # undecodable: the decodable rule's business
        m = len(pcm)
        if not m:
            continue
        sp = sum(hi - lo for lo, hi in _sim_vad_runs(sr, pcm))
        ratio = float(np.round(sp / m, 6))
        if ratio < min_ratio:
            out.append((f"{rid}:ratio", cid, "bytes", "DEVIATION",
                        str(ratio), str(min_ratio),
                        float(np.round(ratio - min_ratio, 6)),
                        min_ratio, str(i % parts)))
    return tuple(out)


def speech_ratio_sql(n: int = 600, parts: int = 8,
                     min_ratio: float = 0.5) -> str:
    return violations_values_sql(speech_ratio_rows(n, parts, min_ratio))
