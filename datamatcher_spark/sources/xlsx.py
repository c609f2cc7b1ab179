"""Minimal XLSX codec on the Python stdlib — Excel ingest (SURVEY §2.1 S1)
without third-party spreadsheet libraries.

The reference loads Excel workbooks through pandas + openpyxl with sheet
selection (utils/file_handlers.py:71-107). This sandbox has no
spreadsheet codec, but .xlsx is just a ZIP of ECMA-376 (ISO/IEC 29500)
SpreadsheetML XML — the subset a data tool actually reads (sheet list,
shared strings, inline strings, numbers, booleans) is ~150 lines of
``zipfile`` + ``xml.etree``. Parsing is driver-side and desktop-sized by
design, exactly like the reference: workbooks are a human-authored input
format, never the 100 TB path (that's parquet/Iceberg). The parsed rows
feed ``spark.createDataFrame`` and everything downstream is distributed.

The writer emits the same subset (inline strings + numbers, one sheet)
so CSV-report-style extracts can round-trip and tests need no fixture
binaries. Legacy .xls (BIFF8, ``xls.py``) and binary .xlsb
(BIFF12, ``xlsb.py``) have their own stdlib codecs sharing this
module's ``grid_to_df`` typing.
"""

from __future__ import annotations

import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _q(tag: str) -> str:
    return f"{{{_MAIN_NS}}}{tag}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB12' → 27 (base-26 letters prefix)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _cell_text(el: ET.Element) -> str:
    """Concatenated <t> runs under an <is> or <si> (plain or rich text)."""
    return "".join(t.text or "" for t in el.iter(_q("t")))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_cell_text(si) for si in root.iter(_q("si"))]


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_id = {
        r.get("Id"): r.get("Target")
        for r in rels.iter(f"{{{_PKG_REL_NS}}}Relationship")
    }
    out = []
    for sh in wb.iter(_q("sheet")):
        rid = sh.get(f"{{{_REL_NS}}}id")
        target = target_by_id.get(rid, "")
        if target.startswith("/"):
            member = target.lstrip("/")
        else:
            member = "xl/" + target
        out.append((sh.get("name", ""), member))
    return out


def sheet_names(path: str | Path) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return [name for name, _ in _sheet_targets(zf)]


def read_xlsx_rows(path: str | Path, sheet: str | None = None) -> list[list]:
    """Raw cell grid of one sheet: list of rows, cells typed as
    str / float / bool / None. Raises ValueError on a missing sheet,
    mirroring the reference's sheet-selection error."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_targets(zf)
        if not sheets:
            raise ValueError("workbook has no sheets")
        names = [n for n, _ in sheets]
        target_name = sheet if sheet else names[0]
        if target_name not in names:
            raise ValueError(f"sheet {target_name!r} not found; available: {names}")
        member = dict(sheets)[target_name]
        strings = _shared_strings(zf)
        root = ET.fromstring(zf.read(member))

        grid: list[list] = []
        width = 0
        for row_el in root.iter(_q("row")):
            row: list = []
            for c in row_el.iter(_q("c")):
                ci = _col_index(c.get("r", ""))
                if ci < 0:  # no r attribute → append position
                    ci = len(row)
                while len(row) <= ci:
                    row.append(None)
                t = c.get("t", "n")
                if t == "inlineStr":
                    is_el = c.find(_q("is"))
                    row[ci] = _cell_text(is_el) if is_el is not None else None
                    continue
                v = c.find(_q("v"))
                if v is None or v.text is None:
                    row[ci] = None
                elif t == "s":
                    row[ci] = strings[int(v.text)]
                elif t == "b":
                    row[ci] = v.text.strip() == "1"
                elif t == "e":
                    row[ci] = None
                elif t == "str":
                    row[ci] = v.text
                else:  # numeric
                    row[ci] = float(v.text)
            width = max(width, len(row))
            grid.append(row)
        return [r + [None] * (width - len(r)) for r in grid]


def grid_to_df(spark: SparkSession, grid: list[list], header: bool = True) -> DataFrame:
    """Shared cell-grid → DataFrame typing for every Excel codec (xlsx and
    the BIFF8 .xls twin must produce IDENTICAL frames for identical grids).

    Column typing mirrors pandas.read_excel loosely: a column whose
    non-null cells are all numeric becomes double, else everything is
    stringified (the engine's merge land is stringly-typed anyway).
    Integral doubles render without the trailing '.0' like the reference
    sees for Excel's integer-valued numeric cells."""
    if not grid:
        raise ValueError("empty sheet")
    if header:
        raw_names, data = grid[0], grid[1:]
        cols = [
            (str(n).strip() if n is not None and str(n).strip() else f"col{i}")
            for i, n in enumerate(raw_names)
        ]
    else:
        data = grid
        cols = [f"col{i}" for i in range(len(grid[0]))]
    # de-duplicate header names the pandas way (name, name.1, ...)
    seen: dict[str, int] = {}
    uniq = []
    for c in cols:
        k = seen.get(c, 0)
        uniq.append(c if k == 0 else f"{c}.{k}")
        seen[c] = k + 1

    n_cols = len(uniq)
    numeric = [True] * n_cols
    for r in data:
        for i in range(n_cols):
            v = r[i] if i < len(r) else None
            if v is not None and not isinstance(v, float):
                numeric[i] = False

    def conv(v, is_num):
        if v is None:
            return None
        if is_num:
            return float(v)
        if isinstance(v, float) and v.is_integer():
            return str(int(v))  # 3.0 numeric cell in a string column → '3'
        if isinstance(v, bool):
            return str(v)
        return str(v)

    rows = [
        tuple(conv(r[i] if i < len(r) else None, numeric[i]) for i in range(n_cols))
        for r in data
    ]
    schema = ", ".join(
        f"`{c}` {'double' if numeric[i] else 'string'}" for i, c in enumerate(uniq)
    )
    return spark.createDataFrame(rows, schema)


def load_xlsx(
    spark: SparkSession,
    path: str | Path,
    *,
    sheet: str | None = None,
    header: bool = True,
) -> tuple[DataFrame, list[str]]:
    """(DataFrame, sheet names) — the reference ``load_excel`` contract
    (utils/file_handlers.py:71-107), typing via ``grid_to_df``."""
    return grid_to_df(spark, read_xlsx_rows(path, sheet), header), sheet_names(path)


# ---------------------------------------------------------------------------
# writer — inline strings + numbers, one sheet
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(rows: list[list], path: str | Path, *, sheet_name: str = "Sheet1") -> None:
    """Write a cell grid (str/int/float/bool/None) as a one-sheet workbook.
    Strings go inline (no sharedStrings table needed), numbers/bools as
    native cells — the same subset the reader consumes, so ingest tests
    round-trip without binary fixtures."""
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">'
        f'<sheets><sheet name="{escape(sheet_name, {chr(34): "&quot;"})}" '
        'sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            ref = f"{_col_letter(ci)}{ri}"
            if v is None:
                continue
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(v))}</t></is></c>"
                )
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}"><sheetData>{"".join(body)}'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
