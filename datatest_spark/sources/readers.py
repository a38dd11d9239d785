"""Data sources — the engine's scan surface.

Re-expresses the reference's ingest layer (get_reader.py:174-263,
load_csv.py:15-86, temptable.py:116-209) Spark-first:

* CSV with utf-8 → latin-1 fallback (the reference's two-phase decode,
  load_csv.py:39-86) via Spark's encoding option + a driver-side sniff
  of the first bytes;
* pandas DataFrames / dict-records / namedtuples via Arrow
  ``createDataFrame`` (get_reader.py:219-249,313-330);
* multi-file globs (query.py:1134-1185) via Spark's native path globs;
* multi-source align-by-fieldname with missing-column defaults
  (temptable.py:116-129,162-209) via ``unionByName(
  allowMissingColumns=True)``.

Excel/DBF (get_reader.py:332-404) follow the same pandas→Arrow path
behind import guards (no xlrd/openpyxl/dbfread ships in this
environment — the guards raise actionable errors).
"""

from __future__ import annotations

import glob as _glob
import os
from functools import reduce
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_csv",
    "read_parquet",
    "read_table",
    "read_excel",
    "read_dbf",
    "iceberg_available",
    "from_pandas",
    "from_records",
    "align_by_fieldname",
    "working_dir_glob",
]


def _sniff_encoding(path: str, probe_bytes: int = 1 << 20) -> str:
    """utf-8 unless the first chunk fails to decode — then latin-1,
    mirroring the reference's fallback (load_csv.py:39-86)."""
    candidates = sorted(_glob.glob(path)) or [path]
    for p in candidates[:4]:
        if not os.path.isfile(p):
            continue
        with open(p, "rb") as f:
            chunk = f.read(probe_bytes)
        try:
            chunk.decode("utf-8")
        except UnicodeDecodeError:
            return "ISO-8859-1"
    return "UTF-8"


def read_csv(spark: SparkSession, path: str, header: bool = True,
             encoding: Optional[str] = None, infer_schema: bool = True,
             **options) -> DataFrame:
    """CSV scan with the reference's encoding-fallback semantics."""
    enc = encoding or _sniff_encoding(path)
    reader = (
        spark.read.option("header", header)
        .option("encoding", enc)
        .option("inferSchema", infer_schema)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str, columns=None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, source: str, fmt: Optional[str] = None,
               columns=None) -> DataFrame:
    """Table-format-agnostic scan — the engine's entry for the north
    rule's Iceberg input (BASELINE.json input_hint: an Iceberg table of
    audio clip + transcript pairs).

    * catalog identifiers (``cat.db.audio_clips``) resolve via
      ``spark.table`` — with an Iceberg catalog configured this IS the
      Iceberg scan, with snapshot isolation, partition pruning, and
      filter pushdown handled by the Iceberg source;
    * ``fmt="iceberg"`` + a path uses ``spark.read.format("iceberg")``
      and raises if the runtime jars are absent (capability-checked by
      :func:`iceberg_available`);
    * plain paths fall back to parquet — the sandbox stand-in (this
      environment ships no Iceberg jars; the rest of the engine is
      source-agnostic, everything downstream sees only a DataFrame).
    """
    looks_like_path = "/" in source or source.endswith(".parquet")
    if fmt == "iceberg":
        if not iceberg_available(spark):
            from .iceberg_lite import is_iceberg_table, read_iceberg

            if looks_like_path and is_iceberg_table(source):
                # no runtime jars, but the path IS an Iceberg table:
                # walk its metadata with the from-spec reader
                # (snapshot isolation + identity partition pruning;
                # see iceberg_lite scope notes)
                df = read_iceberg(spark, source)
                return df.select(*columns) if columns else df
            raise RuntimeError(
                "iceberg requested but no Iceberg runtime on the "
                "classpath (add iceberg-spark-runtime to spark.jars), "
                "and the source is not a path-accessible Iceberg table "
                "layout iceberg_lite can walk"
            )
        df = (
            spark.read.format("iceberg").load(source)
            if looks_like_path
            else spark.table(source)
        )
    elif not looks_like_path:
        df = spark.table(source)  # catalog table / view (Iceberg or not)
    else:
        df = spark.read.parquet(source)
    return df.select(*columns) if columns else df


def _rows_to_df(spark: SparkSession, header, rows) -> DataFrame:
    if not rows:
        raise ValueError("source has a header but no data rows")
    import pandas as _pd

    return spark.createDataFrame(_pd.DataFrame(rows, columns=header))


def read_excel(spark: SparkSession, path: str, sheet=0, **pandas_kwargs) -> DataFrame:
    """Excel scan (reference get_reader.py:332-369).

    Prefers the pandas engine when one is installed (richer dialect
    coverage: dates-as-serials, merged ranges); in engine-less
    environments falls back to the built-in from-spec SpreadsheetML
    parser (:mod:`.formats` — strings/numbers/booleans/inline strings,
    first row as header).  Excel files are driver-sized by nature —
    the pandas → ``createDataFrame`` hop is the right path.
    """
    import pandas as _pd

    try:
        pdf = _pd.read_excel(path, sheet_name=sheet, **pandas_kwargs)
        return spark.createDataFrame(pdf)
    except ImportError:
        from .formats import parse_xlsx

        header, rows = parse_xlsx(path, sheet=sheet)
        return _rows_to_df(spark, header, rows)


def read_dbf(spark: SparkSession, path: str, encoding: str = "ascii",
             **dbf_kwargs) -> DataFrame:
    """DBF scan (reference get_reader.py:372-404).

    Prefers dbfread when installed (memo files, more dBase dialects);
    otherwise the built-in from-spec dBase III parser
    (:mod:`.formats`) handles the C/N/F/L/D field types the
    reference's sample files use."""
    try:
        from dbfread import DBF  # type: ignore[import-not-found]
    except ImportError:
        from .formats import parse_dbf

        header, rows = parse_dbf(path, encoding=encoding)
        return _rows_to_df(spark, header, rows)
    records = [dict(r) for r in DBF(path, encoding=encoding, **dbf_kwargs)]
    if not records:
        raise ValueError(f"empty DBF file: {path}")
    return spark.createDataFrame(records)


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """pandas → Spark via Arrow (reference _normalize.py:57-76 adapts
    pandas into its iterator model; here the DataFrame IS the model)."""
    return spark.createDataFrame(pdf)


def from_records(spark: SparkSession, records: Iterable, schema=None) -> DataFrame:
    """dict-records / namedtuples / tuples (get_reader.py:219-249)."""
    records = list(records)
    if schema is None and records and hasattr(records[0], "_fields"):
        schema = list(records[0]._fields)
    return spark.createDataFrame(records, schema)


def align_by_fieldname(frames: Sequence[DataFrame],
                       fill: Optional[str] = None) -> DataFrame:
    """Union sources with differing columns, aligning by field name and
    defaulting absent fields (reference temptable.py:116-129 widens the
    staging table with '' defaults; Spark's unionByName gives NULLs —
    pass ``fill=''`` for exact squint parity)."""
    out = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )
    if fill is not None:
        string_cols = [c for c, t in out.dtypes if t == "string"]
        out = out.fillna(fill, subset=string_cols)
    return out


def working_dir_glob(spark: SparkSession, pattern: str, fmt: str = "csv",
                     **options) -> DataFrame:
    """Multi-file glob load (reference query.py:1134-1185): Spark reads
    the glob natively; files align by header fieldname."""
    if fmt == "csv":
        return read_csv(spark, pattern, **options)
    return spark.read.format(fmt).load(pattern)
