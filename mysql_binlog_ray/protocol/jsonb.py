"""MySQL binary JSON (JSONB) decode/encode.

The reference refuses JSON columns outright
(`/root/reference/src/Deserializer/RowFactory.php:163-165`,
`ColumnMetadataFactory.php:58-62`); we decode the storage format instead,
per the publicly documented layout (mysql-server
sql/json_binary.h, also described in the MySQL internals manual):

    value   := type byte + payload
    0x00/0x01  small/large object     0x02/0x03  small/large array
    0x04  literal (0 null, 1 true, 2 false)
    0x05 int16   0x06 uint16   0x07 int32   0x08 uint32
    0x09 int64   0x0a uint64   0x0b double
    0x0c  utf8mb4 string (varint length)
    0x0f  opaque (custom: decimal/date/... — not decoded here)

Objects/arrays are offset tables: count + total size, then per-element
entries (objects also carry key entries), with "small" formats using
16-bit counts/offsets and "large" using 32-bit.  Values small enough to
fit the offset slot (literals and 16-bit ints; 32-bit ints too in large
format) are inlined into the entry itself.

The encoder covers the subset the decoder emits (objects, arrays,
strings, bools, null, ints, doubles) — enough for wire round-trip tests;
it always uses the small format (fixture payloads are < 64 KiB).
"""

from __future__ import annotations

import json
import struct
from typing import Any

_LITERALS = {0x00: None, 0x01: True, 0x02: False}


def _read_varint(data: bytes, off: int) -> tuple[int, int]:
    """data-length varint: 7 bits per byte, high bit = continue."""
    n = shift = 0
    while True:
        b = data[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return n, off
        shift += 7


def _decode_value(vtype: int, data: bytes, off: int, large_inline: bool = False) -> Any:
    if vtype in (0x00, 0x01):
        return _decode_object(data, off, large=vtype == 0x01)
    if vtype in (0x02, 0x03):
        return _decode_array(data, off, large=vtype == 0x03)
    if vtype == 0x04:
        return _LITERALS[data[off]]
    if vtype == 0x05:
        return struct.unpack_from("<h", data, off)[0]
    if vtype == 0x06:
        return struct.unpack_from("<H", data, off)[0]
    if vtype == 0x07:
        return struct.unpack_from("<i", data, off)[0]
    if vtype == 0x08:
        return struct.unpack_from("<I", data, off)[0]
    if vtype == 0x09:
        return struct.unpack_from("<q", data, off)[0]
    if vtype == 0x0A:
        return struct.unpack_from("<Q", data, off)[0]
    if vtype == 0x0B:
        return struct.unpack_from("<d", data, off)[0]
    if vtype == 0x0C:
        ln, off = _read_varint(data, off)
        return data[off : off + ln].decode("utf-8")
    raise NotImplementedError(f"JSONB value type 0x{vtype:02x} not supported")


def _entry(data: bytes, base: int, entry_off: int, large: bool) -> Any:
    """One value entry: inlined small value or offset into the document."""
    vtype = data[entry_off]
    slot = entry_off + 1
    inlined = (0x04, 0x05, 0x06) + ((0x07, 0x08) if large else ())
    if vtype in inlined:
        return _decode_value(vtype, data, slot)
    voff = struct.unpack_from("<I" if large else "<H", data, slot)[0]
    return _decode_value(vtype, data, base + voff)


def _decode_object(data: bytes, base: int, large: bool) -> dict:
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    count = struct.unpack_from(fmt, data, base)[0]
    key_entries = base + 2 * w
    value_entries = key_entries + count * (w + 2)  # key-offset(w) + key-len(u16)
    out = {}
    for i in range(count):
        ko = struct.unpack_from(fmt, data, key_entries + i * (w + 2))[0]
        kl = struct.unpack_from("<H", data, key_entries + i * (w + 2) + w)[0]
        key = data[base + ko : base + ko + kl].decode("utf-8")
        out[key] = _entry(data, base, value_entries + i * (1 + w), large)
    return out


def _decode_array(data: bytes, base: int, large: bool) -> list:
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    count = struct.unpack_from(fmt, data, base)[0]
    value_entries = base + 2 * w
    return [_entry(data, base, value_entries + i * (1 + w), large) for i in range(count)]


def decode_jsonb(data: bytes) -> Any:
    """Full JSONB document (type byte + payload) -> Python value."""
    if not data:
        return None
    return _decode_value(data[0], data, 1)


def jsonb_to_json_string(data: bytes) -> str | None:
    """Document -> compact JSON text (the changefeed's string rendering)."""
    if not data:
        return None
    return json.dumps(decode_jsonb(data), separators=(",", ":"), ensure_ascii=False)


# -- encoder (small format only) -------------------------------------------


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(value: Any) -> tuple[int, bytes]:
    """-> (type byte, payload bytes) for a standalone (non-inlined) value."""
    if value is None:
        return 0x04, b"\x00"
    if value is True:
        return 0x04, b"\x01"
    if value is False:
        return 0x04, b"\x02"
    if isinstance(value, int):
        if -(1 << 15) <= value < (1 << 15):
            return 0x05, struct.pack("<h", value)
        if -(1 << 31) <= value < (1 << 31):
            return 0x07, struct.pack("<i", value)
        if -(1 << 63) <= value < (1 << 63):
            return 0x09, struct.pack("<q", value)
        return 0x0A, struct.pack("<Q", value)
    if isinstance(value, float):
        return 0x0B, struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return 0x0C, _write_varint(len(raw)) + raw
    if isinstance(value, (list, tuple)):
        return 0x02, _encode_array(list(value))
    if isinstance(value, dict):
        return 0x00, _encode_object(value)
    raise TypeError(f"cannot JSONB-encode {type(value)!r}")


def _inline(value: Any) -> tuple[int, bytes] | None:
    """(type, 2-byte slot) when the value inlines into a small entry."""
    if value is None:
        return 0x04, b"\x00\x00"
    if value is True:
        return 0x04, b"\x01\x00"
    if value is False:
        return 0x04, b"\x02\x00"
    if isinstance(value, int) and -(1 << 15) <= value < (1 << 15):
        return 0x05, struct.pack("<h", value)
    return None


def _encode_array(items: list) -> bytes:
    count = len(items)
    header = 2 * 2 + count * 3  # count + size + entries(type + u16 slot)
    entries = bytearray()
    tail = bytearray()
    for v in items:
        inl = _inline(v)
        if inl is not None:
            entries.append(inl[0])
            entries += inl[1]
        else:
            t, payload = _encode_value(v)
            entries.append(t)
            entries += struct.pack("<H", header + len(tail))
            tail += payload
    size = header + len(tail)
    return struct.pack("<HH", count, size) + bytes(entries) + bytes(tail)


def _encode_object(obj: dict) -> bytes:
    # MySQL sorts object keys by (length, bytes); reproduce for parity
    items = sorted(obj.items(), key=lambda kv: (len(kv[0].encode()), kv[0].encode()))
    count = len(items)
    header = 2 * 2 + count * (2 + 2) + count * 3
    keys = bytearray()
    key_entries = bytearray()
    for k, _ in items:
        raw = k.encode("utf-8")
        key_entries += struct.pack("<HH", header + len(keys), len(raw))
        keys += raw
    value_entries = bytearray()
    tail = bytearray()
    vbase = header + len(keys)
    for _, v in items:
        inl = _inline(v)
        if inl is not None:
            value_entries.append(inl[0])
            value_entries += inl[1]
        else:
            t, payload = _encode_value(v)
            value_entries.append(t)
            value_entries += struct.pack("<H", vbase + len(tail))
            tail += payload
    size = vbase + len(tail)
    return (
        struct.pack("<HH", count, size)
        + bytes(key_entries)
        + bytes(value_entries)
        + bytes(keys)
        + bytes(tail)
    )


def encode_jsonb(value: Any) -> bytes:
    """Python value -> full JSONB document (type byte + payload)."""
    t, payload = _encode_value(value)
    return bytes([t]) + payload
