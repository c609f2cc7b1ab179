"""Minimal Excel-binary (.xlsb) codec on the Python stdlib — the final
reference ingest path (utils/file_handlers.py:86-87 dispatches ``.xlsb``
to the pyxlsb engine) re-implemented from the PUBLIC [MS-XLSB] spec, the
way ``xlsx.py`` replaced openpyxl and ``xls.py`` replaced xlrd:

* container: the same OPC/ZIP package as .xlsx (``zipfile`` + the XML
  ``.rels`` parts, which stay XML even in the binary format);
* payload: BIFF12 record streams — a record is a 1-2 byte 7-bit-encoded
  id followed by a 1-4 byte 7-bit varint length. Parsed records:
  BrtBundleSh (sheet catalog), BrtSSTItem (shared strings), BrtRowHdr,
  and the cell family BrtCellBlank/Rk/Error/Bool/Real/St/Isst plus the
  cached values of BrtFmlaString/Num/Bool/Error. Strings, numbers and
  booleans only; formula *text* is never parsed (cached results are
  used, matching the xlsx codec's ``t="str"`` handling), and
  date-formatted numbers stay doubles (no codec here reads number
  formats). Unknown records are skipped by their declared length.

Parsing is driver-side and desktop-sized by design (see xlsx.py:9-12);
the grid feeds the SHARED ``grid_to_df`` typing, so the same content in
.xlsx, .xls and .xlsb yields identical DataFrames — the parity contract
the tests assert. The writer emits the same record subset (inline or
shared strings) so round-trip tests need no binary fixtures.
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

# BIFF12 record ids ([MS-XLSB] 2.3.2)
_ROW_HDR = 0
_CELL_BLANK = 1
_CELL_RK = 2
_CELL_ERROR = 3
_CELL_BOOL = 4
_CELL_REAL = 5
_CELL_ST = 6
_CELL_ISST = 7
_FMLA_STRING = 8
_FMLA_NUM = 9
_FMLA_BOOL = 10
_FMLA_ERROR = 11
_SST_ITEM = 19
_BEGIN_SHEET = 129
_END_SHEET = 130
_BEGIN_BOOK = 131
_END_BOOK = 132
_BEGIN_BUNDLE_SHS = 143
_END_BUNDLE_SHS = 144
_BEGIN_SHEET_DATA = 145
_END_SHEET_DATA = 146
_BEGIN_SST = 159
_END_SST = 160
_BUNDLE_SH = 156

_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_NULL_CCH = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# BIFF12 primitives
# ---------------------------------------------------------------------------


def _records(buf: bytes):
    """Yield (record_id, payload) over a BIFF12 stream ([MS-XLSB] 2.1.4):
    id = 1-2 bytes (high bit of byte 0 ⇒ a second 7-bit byte follows),
    length = 1-4 byte little-endian 7-bit varint."""
    pos, n = 0, len(buf)
    while pos < n:
        b0 = buf[pos]
        pos += 1
        if b0 & 0x80:
            rid = (b0 & 0x7F) | ((buf[pos] & 0x7F) << 7)
            pos += 1
        else:
            rid = b0
        size = shift = 0
        while True:
            b = buf[pos]
            pos += 1
            size |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        yield rid, buf[pos:pos + size]
        pos += size


def _wide_string(data: bytes, pos: int) -> tuple[str, int]:
    """XLWideString: cch (u32, UTF-16 code units) + cch*2 bytes."""
    (cch,) = struct.unpack_from("<I", data, pos)
    pos += 4
    end = pos + 2 * cch
    return data[pos:end].decode("utf-16-le"), end


def _nullable_wide_string(data: bytes, pos: int) -> tuple[str | None, int]:
    (cch,) = struct.unpack_from("<I", data, pos)
    if cch == _NULL_CCH:
        return None, pos + 4
    return _wide_string(data, pos)


def _rk_value(rk: int) -> float:
    """RkNumber — bit-identical to BIFF8's RK (xls.py:257)."""
    from datamatcher_spark.sources.xls import _rk_value as _biff8_rk

    return _biff8_rk(rk)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip member)] from workbook.bin's BrtBundleSh records
    joined to the (still-XML) workbook rels, preserving workbook order."""
    rels: dict[str, str] = {}
    with zf.open("xl/_rels/workbook.bin.rels") as fh:
        for rel in ET.parse(fh).getroot().iter(f"{_REL_NS}Relationship"):
            target = rel.get("Target", "")
            if target.startswith("/"):
                rels[rel.get("Id", "")] = target.lstrip("/")
            else:
                rels[rel.get("Id", "")] = "xl/" + target
    out: list[tuple[str, str]] = []
    for rid, data in _records(zf.read("xl/workbook.bin")):
        if rid == _BUNDLE_SH:
            # hsState (u32) + iTabID (u32) + strRelID + strName
            rel_id, pos = _nullable_wide_string(data, 8)
            name, _ = _wide_string(data, pos)
            if rel_id in rels:
                out.append((name, rels[rel_id]))
        elif rid == _END_BOOK:
            break
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.bin" not in zf.namelist():
        return []
    strings: list[str] = []
    for rid, data in _records(zf.read("xl/sharedStrings.bin")):
        if rid == _SST_ITEM:
            # RichStr: flags (u8: fRichStr|fExtStr) + str (+ runs, ignored)
            s, _ = _wide_string(data, 1)
            strings.append(s)
        elif rid == _END_SST:
            break
    return strings


def _parse_sheet(buf: bytes, strings: list[str]) -> list[list]:
    cells: dict[tuple[int, int], object] = {}
    max_r = max_c = -1
    row = 0

    def put(c: int, v) -> None:
        nonlocal max_r, max_c
        cells[(row, c)] = v
        max_r, max_c = max(max_r, row), max(max_c, c)

    for rid, data in _records(buf):
        if rid == _ROW_HDR:
            (row,) = struct.unpack_from("<I", data, 0)
        elif rid in (_CELL_RK, _CELL_REAL, _CELL_BOOL, _CELL_ST, _CELL_ISST,
                     _CELL_ERROR, _FMLA_STRING, _FMLA_NUM, _FMLA_BOOL,
                     _FMLA_ERROR, _CELL_BLANK):
            # every cell record starts with Cell: column (u32, low 14
            # bits) + iStyleRef/flags (u32) — 8 bytes ([MS-XLSB] 2.5.9)
            col = struct.unpack_from("<I", data, 0)[0] & 0x3FFF
            if rid == _CELL_RK:
                put(col, _rk_value(struct.unpack_from("<I", data, 8)[0]))
            elif rid in (_CELL_REAL, _FMLA_NUM):
                put(col, struct.unpack_from("<d", data, 8)[0])
            elif rid in (_CELL_BOOL, _FMLA_BOOL):
                put(col, bool(data[8]))
            elif rid in (_CELL_ST, _FMLA_STRING):
                put(col, _wide_string(data, 8)[0])
            elif rid == _CELL_ISST:
                # guard malformed/foreign isst like the xls twin:
                # out-of-range indices degrade to None, never IndexError
                isst = struct.unpack_from("<I", data, 8)[0]
                put(col, strings[isst] if isst < len(strings) else None)
            elif rid in (_CELL_ERROR, _FMLA_ERROR):
                put(col, None)
            # BrtCellBlank carries no value — leave the gap as None
        elif rid == _END_SHEET_DATA:
            break

    if max_r < 0:
        return []
    return [
        [cells.get((r, c)) for c in range(max_c + 1)]
        for r in range(max_r + 1)
    ]


def sheet_names_xlsb(path: str | Path) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return [n for n, _ in _sheet_targets(zf)]


def read_xlsb_rows(path: str | Path, sheet: str | None = None) -> list[list]:
    """Raw cell grid of one sheet — same contract as read_xlsx_rows /
    read_xls_rows (str / float / bool / None)."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_targets(zf)
        if not sheets:
            raise ValueError("workbook has no sheets")
        names = [n for n, _ in sheets]
        target = sheet if sheet else names[0]
        if target not in names:
            raise ValueError(f"sheet {target!r} not found; available: {names}")
        return _parse_sheet(zf.read(dict(sheets)[target]), _shared_strings(zf))


def load_xlsb(
    spark: SparkSession,
    path: str | Path,
    *,
    sheet: str | None = None,
    header: bool = True,
) -> tuple[DataFrame, list[str]]:
    """(DataFrame, sheet names) — identical contract and typing to
    ``load_xlsx``/``load_xls`` (shared ``grid_to_df``), so the same
    content in any of the three formats yields the same frame."""
    from datamatcher_spark.sources.xlsx import grid_to_df

    return (
        grid_to_df(spark, read_xlsb_rows(path, sheet), header),
        sheet_names_xlsb(path),
    )


# ---------------------------------------------------------------------------
# writer — fixture-grade BIFF12 in an OPC/ZIP package
# ---------------------------------------------------------------------------


def _rec(rid: int, payload: bytes = b"") -> bytes:
    head = bytes([rid & 0x7F]) if rid < 0x80 else bytes(
        [(rid & 0x7F) | 0x80, (rid >> 7) & 0x7F]
    )
    size, length = len(payload), bytearray()
    while True:
        b = size & 0x7F
        size >>= 7
        length.append(b | (0x80 if size else 0))
        if not size:
            break
    return head + bytes(length) + payload


def _ws(s: str) -> bytes:
    raw = s.encode("utf-16-le")
    return struct.pack("<I", len(raw) // 2) + raw


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="bin" ContentType='
    '"application/vnd.ms-excel.sheet.binary.macroEnabled.main"/>'
    "</Types>"
)

_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.bin"/>'
    "</Relationships>"
)


def _wb_rels(use_sst: bool) -> str:
    sst = (
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.bin"/>'
    ) if use_sst else ""
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.bin"/>' + sst + "</Relationships>"
    )


def write_xlsb(
    rows: list[list],
    path: str | Path,
    *,
    sheet_name: str = "Sheet1",
    use_sst: bool = False,
) -> None:
    """Write a cell grid (str/int/float/bool/None) as a one-sheet .xlsb.
    ``use_sst=True`` routes strings through sharedStrings.bin/BrtCellIsst
    (the layout Excel itself produces); the default inlines them as
    BrtCellSt — both paths are read back identically."""
    sst: list[str] = []
    sst_index: dict[str, int] = {}
    n_refs = 0

    sheet = bytearray(_rec(_BEGIN_SHEET) + _rec(_BEGIN_SHEET_DATA))
    for r, cells in enumerate(rows):
        # BrtRowHdr: rw (u32) + the spec's style/height fields, zeroed
        sheet += _rec(_ROW_HDR, struct.pack("<I", r) + b"\x00" * 13)
        for c, v in enumerate(cells):
            cell = struct.pack("<II", c, 0)
            if v is None:
                continue
            if isinstance(v, bool):
                sheet += _rec(_CELL_BOOL, cell + bytes([int(v)]))
            elif isinstance(v, (int, float)):
                sheet += _rec(_CELL_REAL, cell + struct.pack("<d", float(v)))
            elif use_sst:
                if v not in sst_index:
                    sst_index[v] = len(sst)
                    sst.append(v)
                n_refs += 1
                sheet += _rec(
                    _CELL_ISST, cell + struct.pack("<I", sst_index[v])
                )
            else:
                sheet += _rec(_CELL_ST, cell + _ws(v))
    sheet += _rec(_END_SHEET_DATA) + _rec(_END_SHEET)

    workbook = (
        _rec(_BEGIN_BOOK)
        + _rec(_BEGIN_BUNDLE_SHS)
        + _rec(
            _BUNDLE_SH,
            struct.pack("<II", 0, 1) + _ws("rId1") + _ws(sheet_name),
        )
        + _rec(_END_BUNDLE_SHS)
        + _rec(_END_BOOK)
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.bin", bytes(workbook))
        zf.writestr("xl/_rels/workbook.bin.rels", _wb_rels(bool(sst)))
        zf.writestr("xl/worksheets/sheet1.bin", bytes(sheet))
        if sst:
            body = bytearray(
                _rec(_BEGIN_SST, struct.pack("<II", n_refs, len(sst)))
            )
            for s in sst:
                body += _rec(_SST_ITEM, b"\x00" + _ws(s))
            body += _rec(_END_SST)
            zf.writestr("xl/sharedStrings.bin", bytes(body))
