"""Minimal SAS7BDAT fixture writer (tests only).

Emits an uncompressed, little-endian, 32-bit SAS7BDAT file: a 1024-byte
header, one metadata page carrying the RowSize / ColSize / ColumnText /
ColumnName / ColumnAttributes / Format subheaders, then plain data pages
with fixed-width rows.  The layout follows the publicly documented
reverse-engineered format (the same spec pandas' ``SAS7BDATReader`` and
parso implement); the acceptance bar for this writer is that
``pandas.read_sas`` — a real-world third-party reader — parses its output
bit-for-bit (see tests/test_sas7bdat.py).

This exists because no SAS7BDAT fixture ships in the sandbox and pandas
cannot write the format; the engine's reader
(``udacity_dend_capstone_immigration_spark.sources.sas7bdat``) needs a real file to read.
SAS7BDAT supports only two physical types — 8-byte IEEE doubles and
fixed-width byte strings — so that is all this writer accepts.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd

_MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00"
    b"\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
    b"\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)

_SIG_ROWSIZE = b"\xf7\xf7\xf7\xf7"
_SIG_COLSIZE = b"\xf6\xf6\xf6\xf6"
_SIG_COLTEXT = b"\xfd\xff\xff\xff"
_SIG_COLNAME = b"\xff\xff\xff\xff"
_SIG_COLATTR = b"\xfc\xff\xff\xff"
_SIG_FORMAT = b"\xfe\xfb\xff\xff"

_HEADER_LEN = 1024
_PAGE_BIT_OFFSET = 16  # 32-bit layout
_SUBHEADER_PTR_LEN = 12
_PAGE_META = 0x0000
_PAGE_DATA = 0x0100


def _put(buf: bytearray, offset: int, data: bytes) -> None:
    buf[offset : offset + len(data)] = data


def write_sas7bdat(path: str, df: pd.DataFrame, page_size: int = 8192) -> None:
    """Write ``df`` as an uncompressed 32-bit LE .sas7bdat file.

    Numeric columns become SAS doubles (NaN for missing); everything else
    becomes fixed-width strings (utf-8, space padded — SAS blank-missing
    semantics, so empty/None reads back as missing).
    """
    names = list(df.columns)
    is_double = [pd.api.types.is_numeric_dtype(df[c]) for c in names]
    encoded: dict[str, list[bytes]] = {}
    widths: dict[str, int] = {}
    for c, d in zip(names, is_double):
        if not d:
            vals = [
                b"" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v).encode("utf-8")
                for v in df[c]
            ]
            encoded[c] = vals
            widths[c] = max([1] + [len(v) for v in vals])

    # Doubles first, then strings: offsets within the fixed-width row.
    col_offsets: dict[str, int] = {}
    pos = 0
    for c, d in zip(names, is_double):
        if d:
            col_offsets[c] = pos
            pos += 8
    for c, d in zip(names, is_double):
        if not d:
            col_offsets[c] = pos
            pos += widths[c]
    row_length = max(pos, 1)
    n_rows = len(df)
    n_cols = len(names)

    # --- column-text blob: [size:2][pad:6][packed names], offsets relative
    # to the size field (pandas slices the rstripped blob that way).
    name_ptrs: list[tuple[int, int]] = []
    blob = bytearray(8)
    for c in names:
        raw = c.encode("utf-8")
        name_ptrs.append((len(blob), len(raw)))
        blob += raw
    text_block_size = len(blob)
    if text_block_size > 0xFFFF:
        raise ValueError("column names exceed the 64 KiB text block")
    struct.pack_into("<H", blob, 0, text_block_size)

    # --- subheader bodies
    rowsize = bytearray(480)
    _put(rowsize, 0, _SIG_ROWSIZE)
    struct.pack_into("<I", rowsize, 20, row_length)
    struct.pack_into("<I", rowsize, 24, n_rows)
    struct.pack_into("<I", rowsize, 36, n_cols)  # col_count_p1
    struct.pack_into("<I", rowsize, 40, 0)  # col_count_p2
    struct.pack_into("<I", rowsize, 60, 0)  # rows on mix page (none)
    # lcs (354) / lcp (378) stay 0: no creator-proc text.

    colsize = bytearray(12)
    _put(colsize, 0, _SIG_COLSIZE)
    struct.pack_into("<I", colsize, 4, n_cols)

    coltext = bytearray(4 + len(blob))
    _put(coltext, 0, _SIG_COLTEXT)
    _put(coltext, 4, bytes(blob))
    if len(coltext) % 4:
        coltext += b"\x00" * (4 - len(coltext) % 4)

    colname = bytearray(20 + 8 * n_cols)
    _put(colname, 0, _SIG_COLNAME)
    for i, (off, ln) in enumerate(name_ptrs):
        base = 12 + 8 * i  # sig(4) + remnant(8), 8-byte pointer records
        struct.pack_into("<HHH", colname, base, 0, off, ln)

    colattr = bytearray(20 + 12 * n_cols)
    _put(colattr, 0, _SIG_COLATTR)
    for i, (c, d) in enumerate(zip(names, is_double)):
        base = 12 + 12 * i
        struct.pack_into("<I", colattr, base, col_offsets[c])
        struct.pack_into("<I", colattr, base + 4, 8 if d else widths[c])
        colattr[base + 10] = 1 if d else 2

    fmt_bodies = []
    for _ in names:
        fmt = bytearray(52)
        _put(fmt, 0, _SIG_FORMAT)
        fmt_bodies.append(fmt)  # zero idx/offset/len -> empty format+label

    bodies = [rowsize, colsize, coltext, colname, colattr, *fmt_bodies]
    n_sub = len(bodies)
    ptr_table_end = _PAGE_BIT_OFFSET + 8 + _SUBHEADER_PTR_LEN * n_sub
    body_start = (ptr_table_end + 7) // 8 * 8
    meta_needed = body_start + sum(len(b) for b in bodies)
    while page_size < max(meta_needed, _PAGE_BIT_OFFSET + 8 + row_length):
        page_size *= 2

    # --- metadata page
    meta = bytearray(page_size)
    struct.pack_into("<H", meta, _PAGE_BIT_OFFSET, _PAGE_META)
    struct.pack_into("<H", meta, _PAGE_BIT_OFFSET + 2, n_sub)  # block count
    struct.pack_into("<H", meta, _PAGE_BIT_OFFSET + 4, n_sub)  # subheaders
    off = body_start
    for i, body in enumerate(bodies):
        _put(meta, off, bytes(body))
        pbase = _PAGE_BIT_OFFSET + 8 + _SUBHEADER_PTR_LEN * i
        struct.pack_into("<II", meta, pbase, off, len(body))
        meta[pbase + 8] = 0  # uncompressed
        meta[pbase + 9] = 0
        off += len(body)

    # --- data pages
    rows_per_page = (page_size - _PAGE_BIT_OFFSET - 8) // row_length
    row_bytes = []
    for ridx, (_, row) in enumerate(df.iterrows()):
        rb = bytearray(row_length)
        for c, d in zip(names, is_double):
            if d:
                v = row[c]
                struct.pack_into("<d", rb, col_offsets[c], float("nan") if pd.isna(v) else float(v))
            else:
                _put(rb, col_offsets[c], encoded[c][ridx].ljust(widths[c], b" "))
        row_bytes.append(rb)

    data_pages = []
    for start in range(0, n_rows, max(rows_per_page, 1)):
        chunk = row_bytes[start : start + rows_per_page]
        page = bytearray(page_size)
        struct.pack_into("<H", page, _PAGE_BIT_OFFSET, _PAGE_DATA)
        struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 2, len(chunk))
        struct.pack_into("<H", page, _PAGE_BIT_OFFSET + 4, 0)
        o = _PAGE_BIT_OFFSET + 8
        for rb in chunk:
            _put(page, o, bytes(rb))
            o += row_length
        data_pages.append(page)
    if n_rows == 0:
        data_pages = []

    # --- 1024-byte header
    header = bytearray(_HEADER_LEN)
    _put(header, 0, _MAGIC)
    header[32] = 0x22  # not '3' => 32-bit
    header[35] = 0x32  # not '3' => align1 = 0
    header[37] = 0x01  # little endian
    header[39] = ord("1")  # unix
    header[70] = 20  # utf-8
    _put(header, 92, b"FIXTURE".ljust(64, b" "))
    _put(header, 156, b"DATA".ljust(8, b" "))
    struct.pack_into("<d", header, 164, 2_000_000_000.0)  # created (s since 1960)
    struct.pack_into("<d", header, 172, 2_000_000_000.0)  # modified
    struct.pack_into("<I", header, 196, _HEADER_LEN)
    struct.pack_into("<I", header, 200, page_size)
    struct.pack_into("<I", header, 204, 1 + len(data_pages))
    _put(header, 216, b"9.0401M2".ljust(8, b" "))

    with open(path, "wb") as fh:
        fh.write(bytes(header))
        fh.write(bytes(meta))
        for page in data_pages:
            fh.write(bytes(page))


def make_immigration_like_frame(n: int = 20, seed: int = 7) -> pd.DataFrame:
    """Deterministic fixture shaped like the reference's i94 extract:
    SAS doubles for codes/dates plus short string columns (etl.py:133-138
    loads the same shape via the saurfang connector)."""
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "cicid": np.arange(1, n + 1, dtype=np.float64),
            "i94yr": np.full(n, 2016.0),
            "i94mon": np.full(n, 4.0),
            "i94res": rng.choice([582.0, 112.0, 276.0, np.nan], size=n),
            "arrdate": 20545.0 + rng.randint(0, 30, size=n).astype(np.float64),
            "i94visa": rng.choice([1.0, 2.0, 3.0], size=n),
            "gender": rng.choice(["M", "F", ""], size=n).tolist(),
            "visatype": rng.choice(["WT", "B2", "F1", "GMT"], size=n).tolist(),
        }
    )
