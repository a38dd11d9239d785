"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/video are treated like the audio column in the main engine:
``binary`` payloads flowing through Arrow-batched ``mapInPandas``
stages, with typed metadata columns carried alongside.  The Spark-side
plumbing (schema, partition-preserving batch iteration, pruned Arrow
transfer) is real and tested; the *decoders themselves* are stubbed
because image/video libraries are not available in this container:

* audio → fully real (datatest_spark.audio decodes WAV from scratch)
* image → REAL for uncompressed formats (operators/image.py parses
  PPM P6 and 24-bit BMP from their public specs, plus dHash/resize/
  channel-mean features, all numpy)
* video → REAL for YUV4MPEG2 (operators/video.py parses Y4M headers
  and frame-samples raw YUV planes)
* compressed codecs (JPEG/PNG/mp4/webm) → :func:`decode_stub` raises
  ``NotImplementedError`` unless ``fake=True``, in which case a
  deterministic fake decoder (payload-hash-derived dimensions)
  exercises the full pipeline shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["decode_stub", "extract_clip_features"]

DECODE_STUB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
    ]
)


def decode_stub(df: DataFrame, binary_col: str, id_col: str = "id",
                fake: bool = False) -> DataFrame:
    """Image/video decode pipeline shape.

    Real decoding requires libs absent from this environment; with
    ``fake=True`` a deterministic stand-in derives (width, height,
    n_frames) from the payload hash so the batch plumbing, schema, and
    downstream rules are fully exercised.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[binary_col]):
                if buf is None:
                    rows.append((rid, False, None, None, None, None))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image/video decoding requires codec libraries not "
                        "present in this container; pass fake=True for the "
                        "deterministic pipeline-shape stand-in"
                    )
                digest = hashlib.sha256(bytes(buf)).hexdigest()
                h = int(digest[:8], 16)
                rows.append(
                    (rid, True, 64 + h % 1920, 64 + (h >> 8) % 1080,
                     1 + (h >> 16) % 240, digest)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_STUB_SCHEMA.fields]
            )

    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        gen, DECODE_STUB_SCHEMA
    )


def extract_clip_features(df: DataFrame, binary_col: str = "bytes",
                          id_col: str = "clip_id",
                          frame_ms: int = 100) -> DataFrame:
    """Audio feature extraction (REAL, not stubbed): per-frame RMS
    energy over decoded PCM — the audio analogue of frame-sampling a
    video.  One Arrow pass; output is (id, array<float> frame_rms)."""
    import numpy as np

    from ..audio import decode_bytes

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), True),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("frame_rms", T.ArrayType(T.FloatType()), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[binary_col]):
                try:
                    _, sr, pcm = decode_bytes(buf)
                    hop = max(int(sr * frame_ms / 1000), 1)
                    n_frames = max(len(pcm) // hop, 1)
                    frames = pcm[: n_frames * hop].reshape(n_frames, hop)
                    rms = np.sqrt(
                        np.mean(frames.astype(np.float64) ** 2, axis=1)
                    ).astype(np.float32)
                    rows.append((rid, True, rms.tolist()))
                except (ValueError, TypeError):
                    rows.append((rid, False, None))
            yield pd.DataFrame(rows, columns=["clip_id", "ok", "frame_rms"])

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(gen, schema)
