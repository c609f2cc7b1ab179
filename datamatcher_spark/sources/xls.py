"""Minimal legacy-Excel (.xls, BIFF8) codec on the Python stdlib — the
last reference ingest path (utils/file_handlers.py:78-96 dispatches
``.xls`` to the xlrd engine) re-implemented from the PUBLIC specs, the
same way ``xlsx.py`` replaced openpyxl:

* container: OLE2 / Compound File Binary ([MS-CFB]) — header, DIFAT/FAT
  sector chains, directory, mini-stream for sub-cutoff streams;
* payload: the ``Workbook`` stream's BIFF8 records ([MS-XLS]) — BOF,
  BOUNDSHEET, SST (+CONTINUE with the re-specified option byte at
  character-data splits), LABELSST, LABEL, NUMBER, RK, MULRK, BOOLERR,
  EOF. Strings, numbers and booleans only — no formulas (cached FORMULA
  results are skipped), and date-formatted numbers stay doubles, exactly
  like the xlsx codec (neither reads number formats).

Parsing is driver-side and desktop-sized by design (see xlsx.py:9-12);
the resulting grid feeds the SHARED ``grid_to_df`` typing, so an .xls and
an .xlsx of the same content produce identical DataFrames — the parity
contract the tests assert. The writer emits the same record subset inside
a minimal single-stream CFB container so round-trip tests need no binary
fixtures (xlsx.py precedent). ``.xlsb`` has its own codec (xlsb.py).
"""

from __future__ import annotations

import struct
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


# ---------------------------------------------------------------------------
# CFB container — reader
# ---------------------------------------------------------------------------


class _Cfb:
    def __init__(self, data: bytes):
        if data[:8] != _CFB_MAGIC:
            raise ValueError("not an OLE2 compound file (bad magic)")
        self.data = data
        (sec_shift,) = struct.unpack_from("<H", data, 30)
        (mini_shift,) = struct.unpack_from("<H", data, 32)
        self.ssz = 1 << sec_shift
        self.mssz = 1 << mini_shift
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.first_dir,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.first_minifat,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (first_difat,) = struct.unpack_from("<I", data, 68)
        (n_difat,) = struct.unpack_from("<I", data, 72)

        difat = list(struct.unpack_from("<109I", data, 76))
        sec = first_difat
        for _ in range(n_difat):
            raw = self._sector(sec)
            per = self.ssz // 4 - 1
            entries = struct.unpack_from(f"<{per}I", raw, 0)
            difat.extend(entries)
            (sec,) = struct.unpack_from("<I", raw, self.ssz - 4)
            if sec in (_ENDOFCHAIN, _FREESECT):
                break
        self.fat: list[int] = []
        per = self.ssz // 4
        for s in difat:
            if s in (_FREESECT, _ENDOFCHAIN):
                continue
            self.fat.extend(struct.unpack_from(f"<{per}I", self._sector(s), 0))

        self.dir_entries = self._read_dir()
        root = next(e for e in self.dir_entries if e["type"] == 5)
        self.mini_stream = self._read_chain(root["start"], root["size"])
        self.minifat: list[int] = []
        sec = self.first_minifat
        for _ in range(self.n_minifat):
            if sec in (_ENDOFCHAIN, _FREESECT):
                break
            self.minifat.extend(
                struct.unpack_from(f"<{per}I", self._sector(sec), 0)
            )
            sec = self.fat[sec]

    def _sector(self, i: int) -> bytes:
        off = (i + 1) * self.ssz  # header occupies the first sector slot
        return self.data[off:off + self.ssz]

    def _read_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sec = start
        guard = len(self.fat) + 2
        while sec not in (_ENDOFCHAIN, _FREESECT) and guard:
            out += self._sector(sec)
            sec = self.fat[sec]
            guard -= 1
        return bytes(out[:size])

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sec = start
        guard = len(self.minifat) + 2
        while sec not in (_ENDOFCHAIN, _FREESECT) and guard:
            out += self.mini_stream[sec * self.mssz:(sec + 1) * self.mssz]
            sec = self.minifat[sec]
            guard -= 1
        return bytes(out[:size])

    def _read_dir(self) -> list[dict]:
        raw = bytearray()
        sec = self.first_dir
        guard = len(self.fat) + 2
        while sec not in (_ENDOFCHAIN, _FREESECT) and guard:
            raw += self._sector(sec)
            sec = self.fat[sec]
            guard -= 1
        entries = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 64)
            etype = raw[off + 66]
            if etype == 0 or name_len == 0:
                continue
            name = raw[off:off + max(name_len - 2, 0)].decode("utf-16-le")
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<I", raw, off + 120)  # v3: low 32b
            entries.append(
                {"name": name, "type": etype, "start": start, "size": size}
            )
        return entries

    def stream(self, name_candidates: tuple[str, ...]) -> bytes:
        for e in self.dir_entries:
            if e["type"] == 2 and e["name"] in name_candidates:
                if e["size"] < self.mini_cutoff:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"])
        raise ValueError(
            f"no {'/'.join(name_candidates)} stream; entries: "
            f"{[e['name'] for e in self.dir_entries]}"
        )


# ---------------------------------------------------------------------------
# BIFF8 records — reader
# ---------------------------------------------------------------------------

_BOF, _EOF, _CONTINUE = 0x0809, 0x000A, 0x003C
_BOUNDSHEET, _SST = 0x0085, 0x00FC
_LABELSST, _LABEL, _NUMBER, _RK, _MULRK = 0x00FD, 0x0204, 0x0203, 0x027E, 0x00BD
_BOOLERR = 0x0205


def _iter_records(buf: bytes, pos: int = 0):
    while pos + 4 <= len(buf):
        rid, ln = struct.unpack_from("<HH", buf, pos)
        if rid == 0:  # zero padding after the last EOF
            return
        yield rid, buf[pos + 4:pos + 4 + ln], pos
        pos += 4 + ln


class _Chunks:
    """Reader over an SST record's data chunks (SST + CONTINUEs). Plain
    reads concatenate across chunks; CHARACTER reads re-read the option
    byte at every chunk boundary ([MS-XLS] 2.5.293: a string split inside
    its character data re-specifies fHighByte for the remainder)."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _avail(self) -> int:
        return len(self.chunks[self.ci]) - self.pos

    def _hop(self) -> bool:
        while self.ci < len(self.chunks) and self._avail() == 0:
            self.ci += 1
            self.pos = 0
        return self.ci < len(self.chunks)

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n and self._hop():
            k = min(n, self._avail())
            c = self.chunks[self.ci]
            out += c[self.pos:self.pos + k]
            self.pos += k
            n -= k
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        out = []
        first = True
        while cch:
            if not self._hop():
                break
            if not first and self.pos == 0:
                # continuation boundary inside character data → new grbit
                high = bool(self.read(1)[0] & 1)
                if not self._hop():
                    break
            first = False
            width = 2 if high else 1
            k = min(cch, self._avail() // width)
            if k == 0:  # defensive: malformed split mid-character
                k = 1
            raw = self.read(k * width)
            out.append(
                raw.decode("utf-16-le" if high else "latin-1", errors="replace")
            )
            cch -= k
        return "".join(out)


def _parse_sst(chunks: list[bytes]) -> list[str]:
    r = _Chunks(chunks)
    _total, unique = struct.unpack("<II", r.read(8))
    out = []
    for _ in range(unique):
        hdr = r.read(3)
        if len(hdr) < 3:
            break
        cch, flags = struct.unpack("<HB", hdr)
        high = bool(flags & 0x01)
        ext = bool(flags & 0x04)
        rich = bool(flags & 0x08)
        c_run = struct.unpack("<H", r.read(2))[0] if rich else 0
        cch_ext = struct.unpack("<i", r.read(4))[0] if ext else 0
        out.append(r.read_chars(cch, high))
        r.read(4 * c_run + max(cch_ext, 0))  # formatting runs + phonetic
    return out


def _short_string(data: bytes, off: int) -> str:
    cch = data[off]
    high = bool(data[off + 1] & 1)
    if high:
        return data[off + 2:off + 2 + 2 * cch].decode("utf-16-le", "replace")
    return data[off + 2:off + 2 + cch].decode("latin-1", "replace")


def _unicode_string(data: bytes, off: int) -> str:
    """XLUnicodeString with a 2-byte length (LABEL cell payload)."""
    (cch,) = struct.unpack_from("<H", data, off)
    high = bool(data[off + 2] & 1)
    if high:
        return data[off + 3:off + 3 + 2 * cch].decode("utf-16-le", "replace")
    return data[off + 3:off + 3 + cch].decode("latin-1", "replace")


def _rk_value(rk: int) -> float:
    v: float
    if rk & 0x02:  # 30-bit signed integer
        v = float(rk >> 2 if rk >> 2 < (1 << 29) else (rk >> 2) - (1 << 30))
    else:  # high 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if rk & 0x01 else v


def _parse_workbook(buf: bytes) -> tuple[list[tuple[str, int]], list[str]]:
    """Globals substream → ([(sheet_name, stream_offset)], sst)."""
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    rec_iter = _iter_records(buf)
    for rid, data, _pos in rec_iter:
        if rid == _BOF:
            (version,) = struct.unpack_from("<H", data, 0)
            if version != 0x0600:
                raise NotImplementedError(
                    f"BIFF version 0x{version:04x} unsupported — this codec "
                    "reads BIFF8 (Excel 97-2003); re-save older workbooks"
                )
        elif rid == _BOUNDSHEET:
            (offset,) = struct.unpack_from("<I", data, 0)
            sheets.append((_short_string(data, 6), offset))
        elif rid == _SST:
            chunks = [data]
            # swallow the SST's CONTINUE records
            for rid2, data2, pos2 in rec_iter:
                if rid2 != _CONTINUE:
                    # re-dispatch the non-CONTINUE record we consumed
                    if rid2 == _BOUNDSHEET:
                        (offset,) = struct.unpack_from("<I", data2, 0)
                        sheets.append((_short_string(data2, 6), offset))
                    elif rid2 == _EOF:
                        sst = _parse_sst(chunks)
                        return sheets, sst
                    break
                chunks.append(data2)
            sst = _parse_sst(chunks)
        elif rid == _EOF:
            break
    return sheets, sst


def _parse_sheet(buf: bytes, offset: int, sst: list[str]) -> list[list]:
    cells: dict[int, dict[int, object]] = {}

    def put(row: int, col: int, val: object) -> None:
        cells.setdefault(row, {})[col] = val

    depth = 0
    for rid, data, _pos in _iter_records(buf, offset):
        if rid == _BOF:
            depth += 1
        elif rid == _EOF:
            depth -= 1
            if depth <= 0:
                break
        elif depth != 1:
            continue  # inside an embedded object's substream
        elif rid == _LABELSST:
            row, col, _xf, isst = struct.unpack_from("<HHHI", data, 0)
            put(row, col, sst[isst] if isst < len(sst) else None)
        elif rid == _LABEL:
            row, col, _xf = struct.unpack_from("<HHH", data, 0)
            put(row, col, _unicode_string(data, 6))
        elif rid == _NUMBER:
            row, col, _xf = struct.unpack_from("<HHH", data, 0)
            put(row, col, struct.unpack_from("<d", data, 6)[0])
        elif rid == _RK:
            row, col, _xf, rk = struct.unpack_from("<HHHI", data, 0)
            put(row, col, _rk_value(rk))
        elif rid == _MULRK:
            row, col_first = struct.unpack_from("<HH", data, 0)
            n = (len(data) - 6) // 6
            for i in range(n):
                (rk,) = struct.unpack_from("<I", data, 4 + 6 * i + 2)
                put(row, col_first + i, _rk_value(rk))
        elif rid == _BOOLERR:
            row, col, _xf, val, is_err = struct.unpack_from("<HHHBB", data, 0)
            put(row, col, None if is_err else bool(val))

    if not cells:
        return []
    # grid spans row 0..max populated row, so fully-empty INTERIOR rows
    # survive as all-None rows — the same contract as read_xlsb_rows
    # (range(max_r+1)) and read_xlsx_rows (the writer emits a <row>
    # element per grid row). r7: the previous sorted(cells) iteration
    # silently dropped such rows, breaking the cross-codec "identical
    # DataFrames for identical grids" contract (r6 ADVICE, medium).
    width = max(max(r) for r in cells.values()) + 1
    return [
        [cells.get(ri, {}).get(ci) for ci in range(width)]
        for ri in range(max(cells) + 1)
    ]


def _workbook_stream(path: str | Path) -> bytes:
    return _Cfb(Path(path).read_bytes()).stream(("Workbook", "Book"))


def sheet_names_xls(path: str | Path) -> list[str]:
    sheets, _ = _parse_workbook(_workbook_stream(path))
    return [n for n, _ in sheets]


def read_xls_rows(path: str | Path, sheet: str | None = None) -> list[list]:
    """Raw cell grid of one sheet — same contract as read_xlsx_rows."""
    buf = _workbook_stream(path)
    sheets, sst = _parse_workbook(buf)
    if not sheets:
        raise ValueError("workbook has no sheets")
    names = [n for n, _ in sheets]
    target = sheet if sheet else names[0]
    if target not in names:
        raise ValueError(f"sheet {target!r} not found; available: {names}")
    return _parse_sheet(buf, dict(sheets)[target], sst)


def load_xls(
    spark: SparkSession,
    path: str | Path,
    *,
    sheet: str | None = None,
    header: bool = True,
) -> tuple[DataFrame, list[str]]:
    """(DataFrame, sheet names) — identical contract and typing to
    ``load_xlsx`` (shared ``grid_to_df``), so the same content in either
    format yields the same frame."""
    from datamatcher_spark.sources.xlsx import grid_to_df

    return grid_to_df(spark, read_xls_rows(path, sheet), header), sheet_names_xls(path)


# ---------------------------------------------------------------------------
# writer — fixture-grade BIFF8 in a minimal CFB container
# ---------------------------------------------------------------------------

_MAX_REC = 8224  # maximum BIFF record payload


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(_BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _sst_records(strings: list[str], total_refs: int) -> bytes:
    """SST split at whole-string boundaries into CONTINUE records when the
    payload exceeds the record cap (the only split the reader's chunk
    logic strictly needs; mid-string splits occur only in wild files)."""
    bodies: list[bytes] = []
    for s in strings:
        try:
            raw = s.encode("latin-1")
            cch = len(raw)
            flags = 0
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            # cch is UTF-16 CODE UNITS per [MS-XLS], not Python code
            # points — non-BMP chars (surrogate pairs) count twice, and
            # len(s) under-counted them, corrupting round-trips (r6
            # ADVICE, low). The reader already counts code units.
            cch = len(raw) // 2
            flags = 1
        bodies.append(struct.pack("<HB", cch, flags) + raw)
    chunks: list[bytes] = []
    cur = bytearray(struct.pack("<II", total_refs, len(strings)))
    for b in bodies:
        if len(cur) + len(b) > _MAX_REC and len(cur) > 0:
            chunks.append(bytes(cur))
            cur = bytearray()
        cur += b
    chunks.append(bytes(cur))
    out = _rec(_SST, chunks[0])
    for c in chunks[1:]:
        out += _rec(_CONTINUE, c)
    return out


def write_xls(rows: list[list], path: str | Path, *, sheet_name: str = "Sheet1") -> None:
    """Write a cell grid (str/int/float/bool/None) as a one-sheet BIFF8
    workbook — the record subset the reader consumes (LABELSST via a
    shared SST, NUMBER, BOOLERR), wrapped in a minimal CFB container.
    Fixture-grade, like ``write_xlsx``: enough for ingest tests and
    engine round-trips without binary fixtures."""
    strings: list[str] = []
    s_index: dict[str, int] = {}
    n_refs = 0
    for row in rows:
        for v in row:
            if v is not None and not isinstance(v, (bool, int, float)):
                n_refs += 1
                if str(v) not in s_index:
                    s_index[str(v)] = len(strings)
                    strings.append(str(v))

    sheet = bytearray(_bof(0x0010))
    for ri, row in enumerate(rows):
        for ci, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                sheet += _rec(_BOOLERR, struct.pack("<HHHBB", ri, ci, 0, int(v), 0))
            elif isinstance(v, (int, float)):
                sheet += _rec(_NUMBER, struct.pack("<HHHd", ri, ci, 0, float(v)))
            else:
                sheet += _rec(
                    _LABELSST, struct.pack("<HHHI", ri, ci, 0, s_index[str(v)])
                )
    sheet += _rec(_EOF, b"")

    name_raw = sheet_name.encode("latin-1", "replace")[:31]
    bs_payload = (
        struct.pack("<IBB", 0, 0, 0)
        + struct.pack("<BB", len(name_raw), 0)
        + name_raw
    )
    globals_parts = [
        _bof(0x0005),
        _rec(_BOUNDSHEET, bs_payload),
        _sst_records(strings, n_refs),
        _rec(_EOF, b""),
    ]
    globals_blob = b"".join(globals_parts)
    # patch the BOUNDSHEET's absolute sheet-substream offset
    sheet_offset = len(globals_blob)
    bs_pos = len(globals_parts[0]) + 4  # after the BOUNDSHEET record header
    blob = bytearray(globals_blob + sheet)
    struct.pack_into("<I", blob, bs_pos, sheet_offset)
    _cfb_write(bytes(blob), path)


def _cfb_write(stream: bytes, path: str | Path) -> None:
    """Single-stream CFB: [header][FAT…][directory][stream…]. The stream
    is padded past the 4096-byte mini cutoff so no mini-stream is needed
    (readers, including ours, stop at the last EOF record; zero padding
    parses as record id 0)."""
    ssz = 512
    data = stream + b"\x00" * max(0, 4096 - len(stream))
    if len(data) % ssz:
        data += b"\x00" * (ssz - len(data) % ssz)
    n_stream = len(data) // ssz

    # iterate FAT sector count to a fixed point
    n_fat = 1
    while True:
        total = n_fat + 1 + n_stream  # FAT + dir + stream
        need = (total * 4 + ssz - 1) // ssz
        if need <= n_fat:
            break
        n_fat = need
    dir_sec = n_fat
    first_stream = n_fat + 1

    fat = [_FATSECT] * n_fat + [_ENDOFCHAIN]  # FAT sectors + dir sector
    fat += [first_stream + i + 1 for i in range(n_stream - 1)] + [_ENDOFCHAIN]
    fat += [_FREESECT] * (n_fat * (ssz // 4) - len(fat))
    fat_blob = struct.pack(f"<{len(fat)}I", *fat)

    def dirent(name: str, etype: int, start: int, size: int, child: int) -> bytes:
        raw = (name + "\x00").encode("utf-16-le")
        e = bytearray(128)
        e[0:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    directory = (
        dirent("Root Entry", 5, _ENDOFCHAIN, 0, 1)
        + dirent("Workbook", 2, first_stream, len(data), 0xFFFFFFFF)
        + b"\x00" * 256
    )

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<HH", header, 24, 0x003E, 0x0003)   # minor, major
    struct.pack_into("<H", header, 28, 0xFFFE)            # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)             # 512B / 64B shifts
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_sec)
    struct.pack_into("<I", header, 56, 4096)              # mini cutoff
    struct.pack_into("<II", header, 60, _ENDOFCHAIN, 0)   # no miniFAT
    struct.pack_into("<II", header, 68, _ENDOFCHAIN, 0)   # no extra DIFAT
    difat = [i for i in range(n_fat)] + [_FREESECT] * (109 - n_fat)
    struct.pack_into("<109I", header, 76, *difat)

    Path(path).write_bytes(bytes(header) + fat_blob + directory + data)
