"""From-scratch readers for DBF (dBase III) and XLSX — stdlib only.

The reference reads Excel and DBF sources (get_reader.py:332-404)
through optional third-party engines; this environment ships none, so
these two formats get the same treatment as WAV/BMP/Y4M elsewhere in
the engine: a parser written from the PUBLIC format spec.

* **DBF** (dBase III, the format dbfread targets): fixed binary
  header + 32-byte field descriptors + fixed-width records.  Types
  C (character), N/F (numeric), L (logical), D (date) are supported —
  the set the reference's sample files use.
* **XLSX**: a zip of SpreadsheetML XML.  The reader resolves the
  sheet (by index or name) through ``xl/workbook.xml`` + its rels,
  inflates shared strings, and yields header + rows — the subset
  ``pandas.read_excel`` produces for plain tabular sheets (strings,
  numbers, booleans, inline strings; no styles/dates-as-serials
  interpretation).

Both return ``(fieldnames, rows)``; the Spark adapters in readers.py
lift them to DataFrames.  These are driver-side parsers by design —
Excel/DBF artifacts are driver-sized configuration inputs, not data
lake tables.
"""

from __future__ import annotations

import datetime
import re
import struct
import zipfile
from typing import List, Optional, Tuple
from xml.etree import ElementTree

__all__ = ["parse_dbf_bytes", "parse_dbf", "parse_xlsx"]


# ---------------------------------------------------------------------------
# DBF (dBase III)
# ---------------------------------------------------------------------------


def _dbf_value(ftype: str, raw: bytes, encoding: str):
    text = raw.decode(encoding, errors="replace")
    if ftype == "C":
        return text.rstrip() or None
    if ftype in ("N", "F"):
        s = text.strip()
        if not s or s == "*" * len(s):
            return None
        return float(s) if ("." in s or "e" in s or "E" in s) else int(s)
    if ftype == "L":
        ch = text.strip()[:1]
        if ch in "TtYy":
            return True
        if ch in "FfNn":
            return False
        return None
    if ftype == "D":
        s = text.strip()
        if len(s) == 8 and s.isdigit():
            return datetime.date(int(s[:4]), int(s[4:6]), int(s[6:8]))
        return None
    # unsupported types (M/B/...) surface raw text rather than failing
    return text.rstrip() or None


def parse_dbf_bytes(buf: bytes, encoding: str = "ascii"
                    ) -> Tuple[List[str], List[list]]:
    """Parse a dBase III buffer → (fieldnames, rows).  Deleted records
    (0x2A flag) are skipped, per every DBF reader's convention."""
    if len(buf) < 32:
        raise ValueError("truncated DBF header")
    n_records = struct.unpack_from("<I", buf, 4)[0]
    header_size = struct.unpack_from("<H", buf, 8)[0]
    record_size = struct.unpack_from("<H", buf, 10)[0]

    fields = []  # (name, type, length)
    pos = 32
    while pos < len(buf) and buf[pos] != 0x0D:
        desc = buf[pos : pos + 32]
        if len(desc) < 32:
            raise ValueError("truncated DBF field descriptor")
        name = desc[:11].split(b"\x00", 1)[0].decode("ascii", "replace")
        ftype = chr(desc[11])
        length = desc[16]
        fields.append((name, ftype, length))
        pos += 32
    if not fields:
        raise ValueError("DBF with no field descriptors")
    if 1 + sum(f[2] for f in fields) != record_size:
        raise ValueError("DBF record size does not match field widths")

    rows = []
    pos = header_size
    for _ in range(n_records):
        rec = buf[pos : pos + record_size]
        if len(rec) < record_size or rec[:1] == b"\x1a":
            break
        pos += record_size
        if rec[0] == 0x2A:  # deleted
            continue
        vals, off = [], 1
        for _name, ftype, length in fields:
            vals.append(_dbf_value(ftype, rec[off : off + length], encoding))
            off += length
        rows.append(vals)
    return [f[0] for f in fields], rows


def parse_dbf(path: str, encoding: str = "ascii"
              ) -> Tuple[List[str], List[list]]:
    with open(path, "rb") as f:
        return parse_dbf_bytes(f.read(), encoding)


# ---------------------------------------------------------------------------
# XLSX (SpreadsheetML zip)
# ---------------------------------------------------------------------------

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _si_text(si) -> str:
    # a shared-string item is either one <t> or rich-text <r><t> runs
    return "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")


def _sheet_target(zf: zipfile.ZipFile, sheet) -> str:
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    sheets = [el for el in wb.iter() if _local(el.tag) == "sheet"]
    if not sheets:
        raise ValueError("xlsx has no sheets")
    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise ValueError(f"sheet index {sheet} out of range")
        chosen = sheets[sheet]
    else:
        named = [s for s in sheets if s.get("name") == sheet]
        if not named:
            raise ValueError(f"no sheet named {sheet!r}")
        chosen = named[0]
    rid = next(
        v for k, v in chosen.attrib.items() if _local(k) == "id"
    )
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.iter():
        if _local(rel.tag) == "Relationship" and rel.get("Id") == rid:
            target = rel.get("Target")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"no relationship for sheet id {rid}")


def parse_xlsx(path: str, sheet=0) -> Tuple[List[str], List[list]]:
    """Parse an .xlsx → (header, rows); the first sheet row is the
    header (``pandas.read_excel`` default for tabular sheets)."""
    with zipfile.ZipFile(path) as zf:
        shared: List[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                _si_text(si) for si in sst if _local(si.tag) == "si"
            ]
        ws = ElementTree.fromstring(zf.read(_sheet_target(zf, sheet)))

        raw_rows: List[dict] = []
        max_col = -1
        for row in (el for el in ws.iter() if _local(el.tag) == "row"):
            cells = {}
            for c in (el for el in row if _local(el.tag) == "c"):
                ref = c.get("r", "")
                m = _CELL_REF.match(ref)
                if not m:
                    continue
                idx = _col_index(m.group(1))
                ctype = c.get("t", "n")
                value: Optional[object] = None
                if ctype == "inlineStr":
                    value = "".join(
                        t.text or "" for t in c.iter()
                        if _local(t.tag) == "t"
                    )
                else:
                    v = next(
                        (el for el in c if _local(el.tag) == "v"), None
                    )
                    if v is not None and v.text is not None:
                        if ctype == "s":
                            value = shared[int(v.text)]
                        elif ctype == "b":
                            value = v.text == "1"
                        elif ctype == "str":
                            value = v.text
                        else:  # numeric
                            num = float(v.text)
                            value = int(num) if num == int(num) else num
                cells[idx] = value
                max_col = max(max_col, idx)
            raw_rows.append(cells)

    width = max_col + 1
    table = [[r.get(i) for i in range(width)] for r in raw_rows]
    if not table:
        raise ValueError(f"empty sheet in {path}")
    header = [
        str(h) if h is not None else f"col{i}"
        for i, h in enumerate(table[0])
    ]
    return header, table[1:]
