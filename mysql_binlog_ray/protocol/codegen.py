"""Per-table code-generated row decoders (M2 hot path).

The generic decode walks a per-cell closure list; at millions of rows
the Python call/loop overhead dominates actual byte work (~2.7 us/cell
measured).  This module emits a specialized Python function per
(TableMapDef, mode) with the column loop fully unrolled and the common
column types (ints, utf-8 varchar/blob, float/double) inlined; rare
types fall back to the compiled closure for that column, so semantics
are identical by construction — and verified by running the conformance
suite over both paths.

Generated function shape (mode="read"):

    def decode_rows(data, off, end, out_0, ..., out_{n-1}):
        n_rows = 0
        while off < end:
            b0 = data[off]; ...      # null bitmap bytes
            off += nbl
            # per column: null test + inline read or closure call
            ...
            n_rows += 1
        return n_rows, off
"""

from __future__ import annotations

from typing import Callable

from .constants import ColumnType, collation_codec
from .decode import DecodePlan
from .model import ColumnDef

_INT_SIZES = {
    ColumnType.TINY: 1,
    ColumnType.SHORT: 2,
    ColumnType.INT24: 3,
    ColumnType.LONG: 4,
    ColumnType.LONGLONG: 8,
}


def _inline_read(col: ColumnDef, idx: int) -> str | None:
    """Inline source for one cell read appending to ``out_{idx}``;
    None -> use the closure fallback."""
    t = col.type
    if t in _INT_SIZES and not (t is ColumnType.LONGLONG and not col.signed):
        w = _INT_SIZES[t]
        sign = "True" if col.signed else "False"
        return (
            f"out_{idx}.append(int.from_bytes(data[off:off+{w}], 'little', signed={sign})); "
            f"off += {w}"
        )
    if t in (ColumnType.VARCHAR, ColumnType.STRING) and collation_codec(col.charset):
        codec = collation_codec(col.charset)
        # utf-8 text: append RAW BYTES — the Arrow build casts binary ->
        # string, validating utf-8 once in C instead of a per-cell
        # Python decode + re-encode round-trip (the decode hot path's
        # single largest cost, measured)
        cell = f"bytes(data[off:off+_l])" if codec == "utf-8" else f"str(data[off:off+_l], '{codec}')"
        if col.max_length > 255:
            return (
                f"_l = data[off] | (data[off+1] << 8); off += 2; "
                f"out_{idx}.append({cell}); off += _l"
            )
        return (
            f"_l = data[off]; off += 1; "
            f"out_{idx}.append({cell}); off += _l"
        )
    if t is ColumnType.BLOB and collation_codec(col.charset):
        codec = collation_codec(col.charset)
        cell = f"bytes(data[off:off+_l])" if codec == "utf-8" else f"str(data[off:off+_l], '{codec}')"
        lb = col.length_bytes
        return (
            f"_l = int.from_bytes(data[off:off+{lb}], 'little'); off += {lb}; "
            f"out_{idx}.append({cell}); off += _l"
        )
    if t is ColumnType.DOUBLE:
        return f"out_{idx}.append(_unpack_d(data, off)[0]); off += 8"
    return None


def _inline_skip(col: ColumnDef) -> str | None:
    t = col.type
    if t in _INT_SIZES:
        return f"off += {_INT_SIZES[t]}"
    if t in (ColumnType.VARCHAR, ColumnType.STRING):
        if col.max_length > 255:
            return "off += 2 + (data[off] | (data[off+1] << 8))"
        return "off += 1 + data[off]"
    if t in (ColumnType.BLOB, ColumnType.JSON, ColumnType.GEOMETRY):
        lb = col.length_bytes
        return f"off += {lb} + int.from_bytes(data[off:off+{lb}], 'little')"
    if t is ColumnType.DOUBLE:
        return "off += 8"
    return None


def compile_flat_decoder(
    plan: DecodePlan,
    op: str,
    key_src: frozenset[int],
) -> Callable:
    """Build decode_rows(data, off, end, cols, bcols) -> (n_rows, off)
    for one (table, op) pair, matching `_decode_rows_flat` semantics:

    - insert: decode the full after image
    - update: decode merge-KEY columns of the before image into
      ``bcols`` (so key-changing updates can tombstone the old key),
      byte-skip the rest, then decode the after image
    - delete: decode merge-key columns of the before image, skip the rest
    """
    cols = plan.table_map.columns
    n = len(cols)
    nbl = (n + 7) >> 3

    def null_test(i: int) -> str:
        return f"(nb{i >> 3} & {1 << (i & 7)})"

    lines = [
        "def decode_rows(data, off, end, cols, bcols, readers, skippers):",
        " import struct",
        " _unpack_d = struct.Struct('<d').unpack_from",
        " " + ", ".join(f"out_{i}" for i in range(n)) + ("," if n == 1 else "") + " = cols",
    ]
    if op == "update" and key_src:
        lines.append(
            " " + ", ".join(f"bout_{i}" for i in sorted(key_src))
            + ("," if len(key_src) == 1 else "") + " = "
            + ("(" + ", ".join(f"bcols[{i}]" for i in sorted(key_src)) + ("," if len(key_src) == 1 else "") + ")")
        )
    lines.append(" n_rows = 0")
    lines.append(" while off < end:")

    def emit_bitmap(indent: str) -> None:
        for b in range(nbl):
            lines.append(f"{indent}nb{b} = data[off+{b}]")
        lines.append(f"{indent}off += {nbl}")

    indent = "  "
    if op == "update":
        # before image: decode merge-key columns, skip everything else
        emit_bitmap(indent)
        for i, c in enumerate(cols):
            if i in key_src:
                read = _inline_read(c, i)
                if read is None:
                    lines.append(
                        f"{indent}if {null_test(i)}: bout_{i}.append(None)\n"
                        f"{indent}else:\n"
                        f"{indent} _v, off = readers[{i}](data, off)\n"
                        f"{indent} bout_{i}.append(_v)"
                    )
                else:
                    lines.append(
                        f"{indent}if {null_test(i)}: bout_{i}.append(None)\n"
                        f"{indent}else: {read.replace(f'out_{i}.append', f'bout_{i}.append')}"
                    )
                continue
            skip = _inline_skip(c)
            if skip is None:
                lines.append(f"{indent}if not {null_test(i)}: off = skippers[{i}](data, off)")
            else:
                lines.append(f"{indent}if not {null_test(i)}: {skip}")
    emit_bitmap(indent)
    for i, c in enumerate(cols):
        if op == "delete" and i not in key_src:
            skip = _inline_skip(c)
            body = skip if skip is not None else f"off = skippers[{i}](data, off)"
            lines.append(
                f"{indent}if not {null_test(i)}: {body}\n"
                f"{indent}out_{i}.append(None)"
            )
            continue
        read = _inline_read(c, i)
        if read is None:
            lines.append(
                f"{indent}if {null_test(i)}: out_{i}.append(None)\n"
                f"{indent}else:\n"
                f"{indent} _v, off = readers[{i}](data, off)\n"
                f"{indent} out_{i}.append(_v)"
            )
        else:
            lines.append(
                f"{indent}if {null_test(i)}: out_{i}.append(None)\n"
                f"{indent}else: {read}"
            )
    lines.append(f"{indent}n_rows += 1")
    lines.append(" return n_rows, off")

    src = "\n".join(lines)
    ns: dict = {}
    exec(compile(src, f"<codegen:{plan.table_map.table_name}:{op}>", "exec"), ns)
    fn = ns["decode_rows"]
    fn.__codegen_source__ = src  # for debugging/inspection
    return fn


def compile_flat_decoders(plan: DecodePlan, key_src: frozenset[int]) -> dict[str, Callable]:
    return {
        op: compile_flat_decoder(plan, op, key_src)
        for op in ("insert", "update", "delete")
    }
