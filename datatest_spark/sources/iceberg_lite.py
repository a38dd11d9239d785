"""Iceberg table reads WITHOUT the Iceberg runtime — a from-spec
metadata reader (plus a dev-scale fixture writer for tests).

The north rule names Iceberg tables as the engine's input, but this
environment ships no ``iceberg-spark-runtime`` jars, so
``spark.read.format("iceberg")`` cannot exist here.  The table FORMAT,
however, is a public specification (https://iceberg.apache.org/spec/):
a JSON ``metadata/vN.metadata.json`` pointing at a snapshot, whose
Avro ``manifest list`` enumerates Avro ``manifest`` files, whose
entries carry data-file paths, per-file partition tuples, and row
counts.  This module walks exactly that chain with
:mod:`.avro_ocf` (also from-spec) and hands Spark the resulting
parquet file list — giving the engine real Iceberg capabilities the
parquet fallback lacks:

* **snapshot isolation / time travel** — read the current snapshot or
  any ``snapshot_id`` from the table's history;
* **partition pruning from metadata** — identity-transform partition
  predicates drop data files BEFORE any scan is planned (the pruned
  plan is observable: :func:`plan_files` returns the kept/total file
  counts); the same predicate is re-applied as a row filter, matching
  Iceberg's own contract (file-level pruning is a superset bound);
* **schema from the table, not from files** — column names/types come
  from the metadata's ``current-schema-id`` schema.

Scope honesty (spec-derived, not a port of the Iceberg library):

* v1/v2 **data** manifests only — a snapshot carrying DELETE manifests
  (v2 row-level deletes) raises ``NotImplementedError`` instead of
  returning wrong rows;
* pruning applies to ``identity`` transforms; other transforms
  (bucket/truncate/days...) are read correctly but never pruned on
  (a safe superset);
* metadata is walked on the driver — correct by design (Iceberg
  metadata is driver-scale by construction; manifests for a 10^12-row
  table are millions of times smaller than the data), but this reader
  materializes the full live-file list, so tables with *millions* of
  data files per snapshot want the real runtime's distributed
  planning;
* round-trip tested against :func:`append_iceberg` (this module's own
  spec-writer) — no Iceberg-java-written fixture exists in this
  sandbox to cross-check against, so treat the writer as a dev/test
  fixture tool, not a production sink.

Reference lineage: datatest reads its tables through
get_reader/load_csv (`/root/reference/datatest/_load/`); this is the
same "bring the reference's data model to the engine" surface, at the
table-format level the north rule specifies.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import uuid as _uuid
from typing import Any, Dict, List, Optional, Sequence

from .avro_ocf import read_ocf, write_ocf

__all__ = ["read_iceberg", "plan_files", "snapshots", "append_iceberg",
           "is_iceberg_table"]


# ---------------------------------------------------------------------------
# metadata discovery
# ---------------------------------------------------------------------------

def is_iceberg_table(table_path: str) -> bool:
    return bool(_glob.glob(os.path.join(table_path, "metadata",
                                        "*.metadata.json")))


def _metadata_path(table_path: str) -> str:
    mdir = os.path.join(table_path, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.isfile(hint):
        with open(hint) as f:
            v = int(f.read().strip())
        p = os.path.join(mdir, f"v{v}.metadata.json")
        if os.path.isfile(p):
            return p
    cands = sorted(
        _glob.glob(os.path.join(mdir, "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    if not cands:
        raise FileNotFoundError(
            f"{table_path}: no metadata/v*.metadata.json — not an "
            "Iceberg table (or a catalog-managed layout; pass the "
            "metadata file's table root)")
    return cands[-1]


def _load_metadata(table_path: str) -> dict:
    with open(_metadata_path(table_path)) as f:
        return json.load(f)


def _current_schema(meta: dict) -> dict:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id", 0) == sid:
                return s
        return meta["schemas"][0]
    return meta["schema"]  # v1 single-schema form


def _spec_fields(meta: dict, spec_id: int) -> List[dict]:
    for spec in meta.get("partition-specs", []):
        if spec.get("spec-id", 0) == spec_id:
            return spec.get("fields", [])
    return meta.get("partition-spec", [])  # v1 form


_ICE_TO_SPARK = {
    "boolean": "boolean", "int": "int", "long": "bigint",
    "float": "float", "double": "double", "string": "string",
    "binary": "binary", "date": "date", "timestamp": "timestamp",
    "timestamptz": "timestamp", "uuid": "string", "time": "bigint",
}


def _spark_ddl(schema: dict) -> str:
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if not isinstance(t, str) or (
                t not in _ICE_TO_SPARK and not t.startswith("decimal")):
            raise NotImplementedError(
                f"iceberg_lite: nested/unknown column type {t!r} "
                f"for field {f['name']!r}")
        spark_t = t if t.startswith("decimal") else _ICE_TO_SPARK[t]
        cols.append(f"`{f['name']}` {spark_t}")
    return ", ".join(cols)


# ---------------------------------------------------------------------------
# snapshot walk
# ---------------------------------------------------------------------------

def snapshots(table_path: str) -> List[dict]:
    """Snapshot history, oldest first: ``(snapshot_id, timestamp_ms,
    manifest_list, summary)`` per entry — the time-travel menu."""
    meta = _load_metadata(table_path)
    return [
        {"snapshot_id": s["snapshot-id"],
         "timestamp_ms": s.get("timestamp-ms"),
         "manifest_list": s.get("manifest-list"),
         "summary": s.get("summary", {})}
        for s in meta.get("snapshots", [])
    ]


def _resolve_path(p: str, table_path: str) -> str:
    if p.startswith("file://"):
        return p[len("file://"):]
    if os.path.isabs(p):
        return p
    return os.path.join(table_path, p)


def plan_files(table_path: str, snapshot_id: Optional[int] = None,
               partition_filters: Optional[Dict[str, Any]] = None,
               ) -> dict:
    """Walk metadata → manifest list → manifests and return the scan
    plan: ``{"files": [...], "total_files": n, "pruned_files": m,
    "record_count": r, "schema_ddl": ..., "snapshot_id": ...,
    "identity_fields": [...]}``.  ``partition_filters`` maps partition
    field name → value or collection of values; only identity-transform
    fields prune (others are ignored here and enforced by the row
    filter :func:`read_iceberg` applies)."""
    meta = _load_metadata(table_path)
    snaps = meta.get("snapshots", [])
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id", -1)
    snap = next((s for s in snaps if s["snapshot-id"] == snapshot_id), None)
    if snap is None:
        if snapshot_id in (-1, None) and not snaps:
            return {"files": [], "total_files": 0, "pruned_files": 0,
                    "record_count": 0,
                    "schema_ddl": _spark_ddl(_current_schema(meta)),
                    "snapshot_id": None, "identity_fields": []}
        raise ValueError(
            f"{table_path}: snapshot {snapshot_id} not found "
            f"(have {[s['snapshot-id'] for s in snaps]})")

    mlist_path = _resolve_path(snap["manifest-list"], table_path)
    _, manifest_files = read_ocf(mlist_path)

    filters = dict(partition_filters or {})
    norm = {
        k: (set(v) if isinstance(v, (set, frozenset, list, tuple)) else {v})
        for k, v in filters.items()
    }

    files: List[str] = []
    total = 0
    records = 0
    identity_fields: set = set()
    for mf in manifest_files:
        if mf.get("content", 0) == 1:
            raise NotImplementedError(
                f"{table_path}: snapshot {snapshot_id} carries a DELETE "
                "manifest (v2 row-level deletes) — iceberg_lite reads "
                "data manifests only; use the Iceberg runtime for "
                "merge-on-read tables")
        spec_fields = _spec_fields(meta, mf.get("partition_spec_id", 0))
        prunable = {
            f["name"] for f in spec_fields
            if f.get("transform", "identity") == "identity"
        }
        identity_fields |= prunable
        mpath = _resolve_path(mf["manifest_path"], table_path)
        _, entries = read_ocf(mpath)
        for e in entries:
            if e.get("status", 0) == 2:  # DELETED in this snapshot
                continue
            df_ = e["data_file"]
            if df_.get("content", 0) != 0:
                raise NotImplementedError(
                    "iceberg_lite: delete data_file content in a data "
                    "manifest — use the Iceberg runtime")
            fmt = str(df_.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"iceberg_lite: {fmt} data files are not supported")
            total += 1
            part = df_.get("partition") or {}
            keep = True
            for name, allowed in norm.items():
                if name in prunable and name in part:
                    if part[name] not in allowed:
                        keep = False
                        break
            if keep:
                files.append(_resolve_path(df_["file_path"], table_path))
                records += int(df_.get("record_count", 0))
    return {
        "files": files, "total_files": total,
        "pruned_files": total - len(files), "record_count": records,
        "schema_ddl": _spark_ddl(_current_schema(meta)),
        "snapshot_id": snapshot_id,
        "identity_fields": sorted(identity_fields),
    }


def read_iceberg(spark, table_path: str, snapshot_id: Optional[int] = None,
                 columns: Optional[Sequence[str]] = None,
                 partition_filters: Optional[Dict[str, Any]] = None):
    """Iceberg table → DataFrame via the metadata walk (module
    docstring).  Identity partition predicates prune data files before
    Spark plans the scan AND re-apply as row filters (exactness does
    not depend on file-layout honesty)."""
    from pyspark.sql import functions as F

    plan = plan_files(table_path, snapshot_id=snapshot_id,
                      partition_filters=partition_filters)
    if not plan["files"]:
        df = spark.createDataFrame([], plan["schema_ddl"])
    else:
        df = spark.read.schema(plan["schema_ddl"]).parquet(*plan["files"])
    for name, allowed in (partition_filters or {}).items():
        if name not in df.columns:
            continue  # non-identity transform whose source isn't a column
        vals = (list(allowed) if isinstance(allowed, (set, frozenset,
                                                      list, tuple))
                else [allowed])
        df = df.where(F.col(name).isin(vals))
    return df.select(*columns) if columns else df


# ---------------------------------------------------------------------------
# dev/test fixture writer (spec shapes; see module docstring for scope)
# ---------------------------------------------------------------------------

def _ice_type(spark_type: str) -> str:
    # keys are Spark DataType.simpleString() values
    t = spark_type.lower()
    mapped = {"int": "int", "integer": "int", "smallint": "int",
              "tinyint": "int", "long": "long", "bigint": "long",
              "boolean": "boolean", "float": "float", "double": "double",
              "string": "string", "binary": "binary", "date": "date",
              "timestamp": "timestamptz"}.get(t)
    if mapped is None:
        if t.startswith("decimal"):
            return t
        raise NotImplementedError(
            f"iceberg_lite writer: unsupported column type {spark_type!r}")
    return mapped


def _avro_prim(ice_t: str) -> Any:
    return {"boolean": "boolean", "int": "int", "long": "long",
            "float": "float", "double": "double", "string": "string",
            "binary": "bytes", "date": "int",
            "timestamptz": "long"}.get(ice_t, "string")


def _manifest_entry_schema(part_fields: List[dict],
                           schema_fields: Dict[int, str]) -> dict:
    pf = [
        {"name": f["name"],
         "type": ["null", _avro_prim(schema_fields[f["source-id"]])],
         "default": None, "field-id": f["field-id"]}
        for f in part_fields
    ]
    return {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "field-id": 102, "type": {
                        "type": "record", "name": "r102", "fields": pf}},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                ]}},
        ],
    }


_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def append_iceberg(df, table_path: str,
                   partition_by: Optional[str] = None) -> int:
    """Append ``df`` to an iceberg_lite table as a NEW SNAPSHOT
    (creating the table on first call); returns the snapshot id.

    Dev/test fixture writer (module docstring): supports one
    identity-transform partition column; data for each partition value
    is written with the column RETAINED in the parquet file (Iceberg
    data files are self-contained — unlike Hive layout, the partition
    value is not encoded only in the directory name).  Per-file row
    counts come from the parquet footers via pyarrow.  The distinct
    partition values are collected on the driver — fixture-scale by
    design.
    """
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(table_path, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)

    existing_version = 0
    meta: Optional[dict] = None
    if is_iceberg_table(table_path):
        mpath = _metadata_path(table_path)
        existing_version = int(os.path.basename(mpath)[1:].split(".")[0])
        with open(mpath) as f:
            meta = json.load(f)

    # --- schema + spec -----------------------------------------------------
    fields = []
    by_name = {}
    for i, f in enumerate(df.schema.fields, start=1):
        ice_t = _ice_type(f.dataType.simpleString())
        fields.append({"id": i, "name": f.name,
                       "required": not f.nullable, "type": ice_t})
        by_name[f.name] = i
    schema = {"type": "struct", "schema-id": 0, "fields": fields}
    schema_fields = {f["id"]: f["type"] for f in fields}

    spec_fields: List[dict] = []
    if partition_by is not None:
        if partition_by not in by_name:
            raise ValueError(f"partition_by {partition_by!r} not a column")
        spec_fields = [{"name": partition_by, "transform": "identity",
                        "source-id": by_name[partition_by],
                        "field-id": 1000}]
    spec = {"spec-id": 0, "fields": spec_fields}
    if meta is not None:
        old_spec = _spec_fields(meta, meta.get("default-spec-id", 0))
        if [(f["name"], f.get("transform")) for f in old_spec] != \
                [(f["name"], f.get("transform")) for f in spec_fields]:
            raise ValueError(
                "append_iceberg: partition spec differs from the "
                "table's existing spec")

    # --- data files (partition column retained in the file) ----------------
    import shutil
    import tempfile

    def _write_group(gdf, part_value):
        tmp = tempfile.mkdtemp(prefix="icelite-")
        try:
            gdf.write.mode("overwrite").parquet(tmp)
            out = []
            for p in sorted(_glob.glob(os.path.join(tmp, "part-*.parquet"))):
                dest = os.path.join(
                    table_path, "data",
                    f"{_uuid.uuid4().hex}.parquet")
                shutil.move(p, dest)
                n = pq.ParquetFile(dest).metadata.num_rows
                out.append((dest, part_value, n, os.path.getsize(dest)))
            return out
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    new_files = []
    if partition_by is None:
        new_files += _write_group(df, None)
    else:
        from pyspark.sql import functions as F

        values = [r[0] for r in
                  df.select(partition_by).distinct().collect()]
        for v in values:
            gdf = (df.where(F.col(partition_by).isNull()) if v is None
                   else df.where(F.col(partition_by) == v))
            new_files += _write_group(gdf, v)

    # --- new manifest ------------------------------------------------------
    snap_id = int(_uuid.uuid4().int % (1 << 62)) + 1
    seq = (meta.get("last-sequence-number", 0) + 1) if meta else 1
    entry_schema = _manifest_entry_schema(spec_fields, schema_fields)
    entries = [
        {"status": 1, "snapshot_id": snap_id, "sequence_number": None,
         "file_sequence_number": None,
         "data_file": {
             "content": 0, "file_path": path, "file_format": "PARQUET",
             "partition": ({partition_by: part} if partition_by else {}),
             "record_count": int(n), "file_size_in_bytes": int(sz)}}
        for path, part, n, sz in new_files
    ]
    manifest_path = os.path.join(
        table_path, "metadata", f"{_uuid.uuid4().hex}-m0.avro")
    write_ocf(manifest_path, entry_schema, entries,
              extra_meta={"format-version": "2", "content": "data",
                          "partition-spec-id": "0"})

    # --- manifest list: carry previous snapshot's manifests + the new one --
    carried: List[dict] = []
    if meta is not None and meta.get("current-snapshot-id", -1) != -1:
        cur = next(s for s in meta["snapshots"]
                   if s["snapshot-id"] == meta["current-snapshot-id"])
        _, carried = read_ocf(_resolve_path(cur["manifest-list"],
                                            table_path))
    new_mf = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0, "content": 0,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(new_files), "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(n for _, _, n, _ in new_files),
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }
    mlist_path = os.path.join(
        table_path, "metadata", f"snap-{snap_id}-{_uuid.uuid4().hex}.avro")
    write_ocf(mlist_path, _MANIFEST_FILE_SCHEMA, carried + [new_mf],
              extra_meta={"format-version": "2"})

    # --- metadata json -----------------------------------------------------
    import time as _time

    now_ms = int(_time.time() * 1000)
    snapshot = {
        "snapshot-id": snap_id, "timestamp-ms": now_ms,
        "sequence-number": seq, "manifest-list": mlist_path,
        "schema-id": 0,
        "summary": {"operation": "append",
                    "added-data-files": str(len(new_files)),
                    "added-records":
                        str(sum(n for _, _, n, _ in new_files))},
    }
    if meta is None:
        meta = {
            "format-version": 2,
            "table-uuid": str(_uuid.uuid4()),
            "location": table_path,
            "last-updated-ms": now_ms,
            "last-column-id": len(fields),
            "schemas": [schema], "current-schema-id": 0,
            "partition-specs": [spec], "default-spec-id": 0,
            "last-partition-id": 1000 if spec_fields else 999,
            "properties": {"write.format.default": "parquet"},
            "snapshots": [], "snapshot-log": [], "metadata-log": [],
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
        }
    meta["last-updated-ms"] = now_ms
    meta["last-sequence-number"] = seq
    meta["current-snapshot-id"] = snap_id
    meta.setdefault("snapshots", []).append(snapshot)
    meta.setdefault("snapshot-log", []).append(
        {"timestamp-ms": now_ms, "snapshot-id": snap_id})

    version = existing_version + 1
    vpath = os.path.join(table_path, "metadata",
                         f"v{version}.metadata.json")
    with open(vpath, "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(table_path, "metadata",
                           "version-hint.text"), "w") as f:
        f.write(str(version))
    return snap_id
