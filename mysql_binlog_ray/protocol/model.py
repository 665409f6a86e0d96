"""Schema model: typed column descriptors and table maps.

Mirrors the information content of the reference's TableMap event
(`/root/reference/src/Protocol/Event/Events/TableMap.php:10-22`) and its
per-kind Column/Meta classes
(`/root/reference/src/Protocol/Event/Events/TableMap/{Column,Meta}/`),
flattened into one dataclass since we only need the data, not the class
hierarchy.  Serializable to plain dicts for the schema-registry manifest
that is broadcast to decode workers.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any

from .constants import COLLATION_UTF8MB4, ColumnType


@dataclass(frozen=True)
class ColumnDef:
    """One column of a TABLE_MAP: type byte + per-type physical metadata.

    Field usage by type (see `ColumnMetadataFactory.php:22-84`):

    - FLOAT/DOUBLE:        ``size`` (pack length byte; FLOAT values are
                           rounded to ``size`` digits at decode,
                           `RowFactory.php:91`)
    - TIMESTAMP2/DATETIME2/TIME2: ``fsp`` (fractional-second precision)
    - VARCHAR/STRING:      ``max_length`` (1- vs 2-byte length prefix
                           switch at 255, `RowFactory.php:108`)
    - BLOB:                ``length_bytes`` (length-of-length, 1..4)
    - NEWDECIMAL:          ``precision``, ``scale``
    - BIT:                 ``bits`` (total bit count)
    - ENUM/SET:            ``size`` (packed value bytes), ``values``
    - integer types:       ``signed``
    - character types:     ``charset`` collation id
    """

    name: str
    type: ColumnType
    nullable: bool = True
    signed: bool = True
    charset: int = COLLATION_UTF8MB4
    size: int = 0
    fsp: int = 0
    max_length: int = 0
    length_bytes: int = 0
    precision: int = 0
    scale: int = 0
    bits: int = 0
    values: tuple[str, ...] = ()

    @property
    def bit_bytes(self) -> int:
        return (self.bits + 7) >> 3

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "type": int(self.type),
            "nullable": self.nullable,
            "signed": self.signed,
            "charset": self.charset,
            "size": self.size,
            "fsp": self.fsp,
            "max_length": self.max_length,
            "length_bytes": self.length_bytes,
            "precision": self.precision,
            "scale": self.scale,
            "bits": self.bits,
            "values": list(self.values),
        }

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ColumnDef":
        # keep only known fields: a snapshot/manifest written by a newer
        # build with extra per-column keys must still load (forward
        # compatibility on rolling upgrade / cross-version resume)
        known = {f.name for f in fields(ColumnDef)}
        d = {k: v for k, v in d.items() if k in known}
        d["type"] = ColumnType(d["type"])
        d["values"] = tuple(d.get("values") or ())
        return ColumnDef(**d)


@dataclass(frozen=True)
class TableMapDef:
    """A TABLE_MAP event's schema payload: the unit of the schema registry.

    ``table_id`` is the binlog-global table-map id; like a real MySQL
    server we allocate a fresh id when the table layout changes (DDL), so
    ``table_id`` uniquely identifies a schema version
    (`/root/reference/src/EventsIterator.php:40,198-205` keys its registry
    the same way).
    """

    table_id: int
    schema_name: str
    table_name: str
    columns: tuple[ColumnDef, ...]
    primary_key: tuple[int, ...] = ()  # column ordinals
    schema_ver: int = 0  # ours: version ordinal for lineage/metrics
    flags: int = 1

    @property
    def column_count(self) -> int:
        return len(self.columns)

    @property
    def pk_names(self) -> tuple[str, ...]:
        return tuple(self.columns[i].name for i in self.primary_key)

    def to_dict(self) -> dict[str, Any]:
        return {
            "table_id": self.table_id,
            "schema_name": self.schema_name,
            "table_name": self.table_name,
            "columns": [c.to_dict() for c in self.columns],
            "primary_key": list(self.primary_key),
            "schema_ver": self.schema_ver,
            "flags": self.flags,
        }

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "TableMapDef":
        return TableMapDef(
            table_id=d["table_id"],
            schema_name=d["schema_name"],
            table_name=d["table_name"],
            columns=tuple(ColumnDef.from_dict(c) for c in d["columns"]),
            primary_key=tuple(d.get("primary_key") or ()),
            schema_ver=d.get("schema_ver", 0),
            flags=d.get("flags", 1),
        )


@dataclass
class EventHeader:
    """Parsed 19-byte v4 event header (`Header.php:10-23`)."""

    timestamp: int
    type: int
    server_id: int
    event_size: int
    log_pos: int  # lower 32 bits of the next event's position
    flags: int
    checksum_size: int
    payload_size: int  # end-of-body offset within the packet buffer


@dataclass
class RowsEvent:
    """A decoded WRITE/UPDATE/DELETE_ROWS event.

    ``rows`` holds dicts keyed by column name; for updates each element is
    ``{"before": {...}, "after": {...}}`` per `RowFactory.php:52-54,171-177`.
    """

    op: str  # 'insert' | 'update' | 'delete'
    table_id: int
    table_map: TableMapDef
    rows: list[dict[str, Any]] = field(default_factory=list)
