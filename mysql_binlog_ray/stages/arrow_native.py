"""Arrow-native typing for the changefeed (SURVEY.md §1.4).

The decoder emits values in the reference's JSON shape (temporals,
decimals and bits as strings; binary tagged base64 — `RowFactory.php`
semantics) so decode parity is testable bit-for-bit.  This stage is the
compat boundary in the other direction: it casts a decoded table to the
*native* Arrow types the survey maps each MySQL type onto:

| MySQL | JSON-shape column | native Arrow |
|---|---|---|
| NEWDECIMAL | string | decimal128(precision, scale) |
| DATE | 'YYYY-MM-DD' (zero-date sentinel) | date32, zero -> null |
| DATETIME2 / TIMESTAMP2 | 'YYYY-MM-DD HH:MM:SS[.fff]' | timestamp('ms'), zero -> null |
| TIME2 | 'HH:MM:SS[.fff]' | time64('us') |
| BIT | '0101...' | uint64 |
| SET | 'a,b,c' | list<string> |
| unsigned LONGLONG | int64 / decimal-string >= 2^63 | uint64 |
| BINARY-collation text | 'binary:base64,\\0\\0\\0...' tag | binary |

Vectorized per batch; zero-date sentinels become nulls (they have no
Arrow representation, `DateTimeReadTrait.php:14-17,47-49`).
"""

from __future__ import annotations

import base64

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..protocol.constants import BINARY_TAG, COLLATION_BINARY, ColumnType
from ..protocol.model import ColumnDef, TableMapDef


def native_arrow_type(col: ColumnDef) -> pa.DataType:
    t = col.type
    if t in (ColumnType.TINY, ColumnType.SHORT, ColumnType.INT24, ColumnType.LONG):
        return pa.int64()
    if t is ColumnType.LONGLONG:
        return pa.int64() if col.signed else pa.uint64()
    if t in (ColumnType.FLOAT, ColumnType.DOUBLE):
        return pa.float64()
    if t is ColumnType.NEWDECIMAL:
        return pa.decimal128(col.precision, col.scale)
    if t is ColumnType.DATE:
        return pa.date32()
    if t in (ColumnType.DATETIME2, ColumnType.TIMESTAMP2):
        return pa.timestamp("ms")
    if t is ColumnType.TIME2:
        return pa.time64("us")
    if t is ColumnType.BIT:
        return pa.uint64()
    if t is ColumnType.SET:
        return pa.list_(pa.string())
    if t in (ColumnType.VARCHAR, ColumnType.STRING, ColumnType.BLOB) and col.charset == COLLATION_BINARY:
        return pa.binary()
    return pa.string()


def _zero_to_null(arr: pa.Array, sentinel_prefix: str) -> pa.Array:
    mask = pc.starts_with(pc.coalesce(arr, pa.scalar("")), sentinel_prefix)
    return pc.if_else(mask, pa.scalar(None, arr.type), arr)


def cast_column_native(arr: pa.Array, col: ColumnDef) -> pa.Array:
    """Cast one JSON-shape column to its native Arrow type."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = col.type
    if t is ColumnType.NEWDECIMAL:
        return pc.cast(arr, pa.decimal128(col.precision, col.scale))
    if t is ColumnType.DATE:
        arr = _zero_to_null(arr, "0000-00-00")
        ts = pc.strptime(arr, format="%Y-%m-%d", unit="s", error_is_null=True)
        return pc.cast(ts, pa.date32())
    if t in (ColumnType.DATETIME2, ColumnType.TIMESTAMP2):
        arr = _zero_to_null(arr, "0000-00-00")
        # Arrow strptime, NOT pandas to_datetime: pandas parses at ns
        # resolution, which silently nulls valid MySQL datetimes outside
        # 1677-2262 (DATETIME spans 1000-9999).  Parse the seconds part
        # with Arrow (timestamp('ms') spans the full range) and add the
        # millisecond fraction arithmetically.
        base = pc.utf8_slice_codeunits(arr, 0, 19)
        ts = pc.strptime(base, format="%Y-%m-%d %H:%M:%S", unit="ms", error_is_null=True)
        frac = pc.utf8_slice_codeunits(arr, 20, 23)  # '' when no fraction
        frac_ms = pc.cast(
            pc.if_else(pc.equal(frac, pa.scalar("")), pa.scalar("0"), frac), pa.int64()
        )
        # frac digits render left-justified to 3 chars upstream => ms
        return pc.cast(
            pc.add(pc.cast(ts, pa.int64()), pc.coalesce(frac_ms, pa.scalar(0, pa.int64()))),
            pa.timestamp("ms"),
        )
    if t is ColumnType.TIME2:
        td = pd.to_timedelta(arr.to_pandas(), errors="coerce")
        micros = (td / pd.Timedelta(microseconds=1)).astype("float64")
        out = pa.array(micros, pa.float64())
        us = pc.cast(pc.round(out), pa.int64())
        # time64('us') is a time-of-day: values outside [0, 86400s) have
        # no representation — null them explicitly instead of emitting
        # invalid Arrow data (MySQL TIME spans -838:59:59..838:59:59)
        in_range = pc.and_(
            pc.greater_equal(us, pa.scalar(0, pa.int64())),
            pc.less(us, pa.scalar(86_400_000_000, pa.int64())),
        )
        return pc.if_else(in_range, us, pa.scalar(None, pa.int64())).cast(pa.time64("us"))
    if t is ColumnType.BIT:
        vals = [int(v, 2) if v is not None else None for v in arr.to_pylist()]
        return pa.array(vals, pa.uint64())
    if t is ColumnType.SET:
        # the empty set ('') must become [], not [''] (split's behavior)
        lists = pc.split_pattern(arr, ",")
        empty = pa.scalar([], pa.list_(pa.string()))
        return pc.if_else(pc.equal(arr, pa.scalar("")), empty, lists)  # null stays null
    if t is ColumnType.LONGLONG and not col.signed:
        # decode emits int for < 2^63, decimal string above (GMP fallback)
        vals = [int(v) if v is not None else None for v in arr.to_pylist()]
        return pa.array(vals, pa.uint64())
    if t in (ColumnType.VARCHAR, ColumnType.STRING, ColumnType.BLOB) and col.charset == COLLATION_BINARY:
        prefix = len(BINARY_TAG)
        vals = [
            base64.b64decode(v[prefix:]) if v is not None else None for v in arr.to_pylist()
        ]
        return pa.array(vals, pa.binary())
    target = native_arrow_type(col)
    if arr.type != target:
        return pc.cast(arr, target)
    return arr


def to_arrow_native(table: pa.Table, tm: TableMapDef) -> pa.Table:
    """Cast every column of a flat decoded table that belongs to ``tm``
    to its native Arrow type; bookkeeping columns pass through."""
    by_name = {c.name: c for c in tm.columns}
    cols = {}
    for name in table.column_names:
        arr = table.column(name)
        if name in by_name:
            cols[name] = cast_column_native(arr, by_name[name])
        else:
            cols[name] = arr
    return pa.table(cols)
