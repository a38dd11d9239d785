"""Video operators: real from-scratch Y4M decode + frame sampling.

YUV4MPEG2 (.y4m) is the standard *uncompressed* video interchange
format (used by ffmpeg/x264 test corpora): a plain-text stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> ... [C<chroma>]\\n`` followed by
``FRAME\\n`` + raw YUV planes per frame.  Entirely parseable with
numpy — no codec library — so the video column gets the same REAL
treatment as audio (WAV) and images (PPM/BMP): decode where the data
lives, ship only small fixed-width features.

Supported chroma: C444 (full planes) and C420/C420jpeg/C420mpeg2
(quarter U/V planes).  Compressed containers (mp4/webm) still need
external codecs — they surface as ok=false, like undecodable images.

Frame sampling (``every_nth``) happens INSIDE the decode loop: the
byte offsets of skipped frames are computed, not materialized, so
sampling 1-in-30 reads ~1/30th of the pixel work — the moral
equivalent of keyframe extraction for a training-data pipeline.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "encode_y4m",
    "decode_y4m_header",
    "iter_y4m_frames",
    "video_frame_features",
    "count_y4m_frames",
    "VideoConsistencyRule",
]

_CHROMA_DIV = {
    "444": (1, 1),
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
}


def encode_y4m(frames: np.ndarray, fps: Tuple[int, int] = (30, 1),
               chroma: str = "444") -> bytes:
    """Y4M stream from (n, h, w, 3) uint8 YUV frames (C444) or
    (n, h, w) luma-only stacked planes are not supported — keep 444
    for fixtures; C420 is exercised on the decode side."""
    n, h, w, c = frames.shape
    if c != 3 or chroma != "444":
        raise ValueError("encoder supports C444 (h, w, 3) frames only")
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n" % (w, h, *fps)
    parts = [head]
    for i in range(n):
        parts.append(b"FRAME\n")
        # planar: all Y, then all U, then all V
        parts.append(frames[i, :, :, 0].astype(np.uint8).tobytes())
        parts.append(frames[i, :, :, 1].astype(np.uint8).tobytes())
        parts.append(frames[i, :, :, 2].astype(np.uint8).tobytes())
    return b"".join(parts)


def decode_y4m_header(buf: bytes) -> Tuple[int, int, Tuple[int, int], str, int]:
    """Parse the stream header → (w, h, (fps_num, fps_den), chroma,
    header_len).  Raises ValueError on malformed input."""
    if not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    end = buf.find(b"\n")
    if end < 0:
        raise ValueError("truncated Y4M header")
    w = h = None
    fps = (30, 1)
    chroma = "420"  # spec default when no C tag
    for tok in buf[9:end].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif tag == b"C":
            chroma = val.decode("ascii")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if chroma not in _CHROMA_DIV:
        raise ValueError(f"unsupported chroma {chroma}")
    return w, h, fps, chroma, end + 1


def iter_y4m_frames(buf: bytes, every_nth: int = 1):
    """Yield (frame_index, (h, w, 3) uint8 YUV444 array) for every
    ``every_nth``-th frame; skipped frames are seeked over, not
    decoded.  C420 chroma is upsampled to 444 by pixel doubling."""
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    w, h, _fps, chroma, pos = decode_y4m_header(bytes(buf))
    dx, dy = _CHROMA_DIV[chroma]
    cw, ch = w // dx, h // dy
    frame_bytes = w * h + 2 * cw * ch
    buf = bytes(buf)
    idx = 0
    while pos < len(buf):
        nl = buf.find(b"\n", pos)
        if nl < 0 or not buf[pos : pos + 5] == b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        data_start = nl + 1
        if data_start + frame_bytes > len(buf):
            raise ValueError("truncated Y4M frame")
        if idx % every_nth == 0:
            y = np.frombuffer(
                buf, np.uint8, w * h, data_start
            ).reshape(h, w)
            u = np.frombuffer(
                buf, np.uint8, cw * ch, data_start + w * h
            ).reshape(ch, cw)
            v = np.frombuffer(
                buf, np.uint8, cw * ch, data_start + w * h + cw * ch
            ).reshape(ch, cw)
            if (dx, dy) != (1, 1):
                u = u.repeat(dy, 0).repeat(dx, 1)[:h, :w]
                v = v.repeat(dy, 0).repeat(dx, 1)[:h, :w]
            yield idx, np.stack([y, u, v], axis=-1)
        pos = data_start + frame_bytes
        idx += 1


def _video_feature_schema(df: DataFrame, id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, True),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("n_frames_sampled", T.IntegerType(), True),
            T.StructField("frame_mean_luma", T.ArrayType(T.DoubleType()), True),
        ]
    )


def video_frame_features(df: DataFrame, binary_col: str,
                         id_col: str = "id",
                         every_nth: int = 1) -> DataFrame:
    """Frame-sampled per-frame mean luma over Y4M payloads — the
    decode/sample/extract pipeline shape for video columns, one Arrow
    pass, no shuffle."""
    schema = _video_feature_schema(df, id_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[tuple] = []
            for rid, buf in zip(pdf["id"], pdf[binary_col]):
                try:
                    if buf is None:
                        raise ValueError("null payload")
                    w, h, _fps, _chroma, _ = decode_y4m_header(bytes(buf))
                    lumas = [
                        float(frame[:, :, 0].mean())
                        for _i, frame in iter_y4m_frames(buf, every_nth)
                    ]
                    rows.append((rid, True, w, h, len(lumas), lumas))
                except ValueError:
                    rows.append((rid, False, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.select(F.col(id_col).alias("id"), F.col(binary_col)).mapInPandas(
        gen, schema
    )


def count_y4m_frames(buf: bytes) -> Tuple[int, int, int]:
    """(width, height, n_frames) by seeking frame markers only — no
    pixel data is touched, so counting a 10-minute clip costs header
    scans, not decodes."""
    w, h, _fps, chroma, pos = decode_y4m_header(bytes(buf))
    dx, dy = _CHROMA_DIV[chroma]
    frame_bytes = w * h + 2 * (w // dx) * (h // dy)
    buf = bytes(buf)
    n = 0
    while pos < len(buf):
        nl = buf.find(b"\n", pos)
        if nl < 0 or not buf[pos : pos + 5] == b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        if nl + 1 + frame_bytes > len(buf):
            raise ValueError("truncated Y4M frame")
        pos = nl + 1 + frame_bytes
        n += 1
    return w, h, n


from ..requirements import Rule as _Rule


class VideoConsistencyRule(_Rule):
    """Per-row video invariants in one header-seek pass (the video twin
    of Image/AudioConsistencyRule):

    * undecodable bytes → INVALID (``video:decodable``)
    * counted frames != decl_frames → DEVIATION (``video:frames``)

    The pass seeks over frame payloads (count_y4m_frames) — no pixel
    decode, so the Arrow stage is header-bound even for long clips.
    """

    kind = "plan"

    def __init__(self, binary_col: str = "bytes", id_col: str = "video_id",
                 decl_frames_col: str = "decl_frames",
                 rule_id: str = "video"):
        super().__init__(rule_id)
        self.binary_col = binary_col
        self.id_col = id_col
        self.decl_frames_col = decl_frames_col

    def plan(self, ctx) -> DataFrame:
        from ..requirements import finalize_cols
        from ..schema import DEVIATION, INVALID

        df = ctx.df
        part_src = (
            F.col(ctx.partition_col).cast("string")
            if ctx.partition_col and ctx.partition_col in df.columns
            else F.lit(None).cast("string")
        )
        pruned = df.select(
            F.col(self.id_col).alias("id"),
            F.col(self.binary_col),
            F.col(self.decl_frames_col).alias("_df"),
            part_src.alias("_part"),
        )
        info_schema = T.StructType(
            [
                T.StructField("id", df.schema[self.id_col].dataType, True),
                T.StructField("ok", T.BooleanType(), False),
                T.StructField("n_frames", T.IntegerType(), True),
                T.StructField("_df", T.IntegerType(), True),
                T.StructField("_part", T.StringType(), True),
            ]
        )
        bcol = self.binary_col

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for rid, buf, decl, part in zip(
                    pdf["id"], pdf[bcol], pdf["_df"], pdf["_part"]
                ):
                    try:
                        if buf is None:
                            raise ValueError("null payload")
                        _w, _h, n = count_y4m_frames(buf)
                        rows.append((rid, True, n, decl, part))
                    except ValueError:
                        rows.append((rid, False, None, decl, part))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in info_schema.fields]
                )

        info = pruned.mapInPandas(gen, info_schema)
        rid = self.rule_id

        def v(rule, diff_type, column, invalid, expected,
              deviation=None, expected_num=None):
            return F.struct(
                *finalize_cols(
                    rule, diff_type,
                    key=F.col("id"), column=column,
                    invalid=invalid, expected=expected,
                    deviation=deviation, expected_num=expected_num,
                    partition_id=F.col("_part"),
                )
            )

        checks = [
            F.when(
                ~F.col("ok"),
                v(f"{rid}:decodable", INVALID, self.binary_col,
                  F.lit("undecodable video payload"),
                  F.lit("decodable y4m payload")),
            ),
            F.when(
                F.col("ok") & (F.col("_df") != F.col("n_frames")),
                v(f"{rid}:frames", DEVIATION, self.decl_frames_col,
                  F.col("_df"), F.col("n_frames"),
                  deviation=(F.col("_df") - F.col("n_frames")).cast("double"),
                  expected_num=F.col("n_frames").cast("double")),
            ),
        ]
        arr = F.array(*checks)
        return (info.select(F.explode(arr).alias("_v"))
                .where(F.col("_v").isNotNull()).select("_v.*"))
