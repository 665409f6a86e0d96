"""MySQL internal GEOMETRY value parsing (beyond the reference, which
throws on GEOMETRY columns — `RowFactory.php:163-165`; this repo
previously surfaced tagged base64).

MySQL stores a geometry cell as ``SRID (4 bytes LE) + WKB``: byte-order
flag (1 = little-endian, 0 = big-endian), uint32 geometry type, then
coordinates as float64 pairs (public WKB spec / MySQL internal format
docs).  :func:`wkb_to_ewkt` renders POINT / LINESTRING / POLYGON as
``SRID=<n>;<WKT>`` with MySQL ``ST_AsText`` punctuation (comma, no
space); any other type, either byte order's malformed payload, or
trailing junk returns ``None`` so the decoder can fall back to the
tagged-base64 passthrough — never a wrong answer, never an exception in
the decode hot path.
"""

from __future__ import annotations

import struct

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3


def _num(x: float) -> str:
    """Shortest-roundtrip rendering; integral floats drop the '.0'
    (MySQL ST_AsText prints POINT(1 2), not POINT(1.0 2.0))."""
    r = repr(x)
    return r[:-2] if r.endswith(".0") else r


def wkb_to_ewkt(raw: bytes) -> str | None:
    """``SRID+WKB`` bytes -> ``'SRID=<srid>;<WKT>'`` for point /
    linestring / polygon; ``None`` when the payload is any other
    geometry type or malformed (caller falls back to base64)."""
    try:
        if len(raw) < 9:
            return None
        srid = int.from_bytes(raw[:4], "little")
        bo = raw[4]
        if bo not in (0, 1):
            return None
        fmt = "<" if bo == 1 else ">"
        (gtype,) = struct.unpack_from(fmt + "I", raw, 5)
        off = 9

        def point(off: int) -> tuple[str, int]:
            x, y = struct.unpack_from(fmt + "dd", raw, off)
            return f"{_num(x)} {_num(y)}", off + 16

        def ring(off: int) -> tuple[str, int]:
            (n,) = struct.unpack_from(fmt + "I", raw, off)
            off += 4
            pts = []
            for _ in range(n):
                s, off = point(off)
                pts.append(s)
            return ",".join(pts), off

        if gtype == WKB_POINT:
            s, off = point(off)
            wkt = f"POINT({s})"
        elif gtype == WKB_LINESTRING:
            s, off = ring(off)
            wkt = f"LINESTRING({s})"
        elif gtype == WKB_POLYGON:
            (nrings,) = struct.unpack_from(fmt + "I", raw, off)
            off += 4
            rings = []
            for _ in range(nrings):
                s, off = ring(off)
                rings.append(f"({s})")
            wkt = f"POLYGON({','.join(rings)})"
        else:
            return None
        if off != len(raw):
            return None  # trailing bytes: not a clean parse — pass through
        return f"SRID={srid};{wkt}"
    except (struct.error, IndexError):
        return None


def ewkt_point(srid: int, x: float, y: float, big_endian: bool = False) -> bytes:
    """Test/fixture twin: build the SRID+WKB bytes for a point."""
    fmt = ">" if big_endian else "<"
    return (
        srid.to_bytes(4, "little")
        + bytes([0 if big_endian else 1])
        + struct.pack(fmt + "I", WKB_POINT)
        + struct.pack(fmt + "dd", x, y)
    )
