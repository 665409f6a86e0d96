"""Protocol constants for the MySQL/MariaDB binlog wire format.

Derived from public MySQL replication-protocol documentation and the
behavior of the reference implementation (userqq/mysql-binlog):
event types `/root/reference/src/Protocol/Event/Type.php:9-58`, column
types `/root/reference/src/Protocol/ColumnType.php:9-41`, optional
TABLE_MAP metadata TLV tags
`/root/reference/src/Protocol/OptionalMetadataType.php:9-22`, and the
collation ids actually handled by the reference
(`/root/reference/src/Protocol/Collation.php:984-996`).
"""

from __future__ import annotations

from enum import IntEnum


class EventType(IntEnum):
    """Binlog event type byte (header offset 4)."""

    UNKNOWN = 0x00
    QUERY = 0x02
    STOP = 0x03
    ROTATE = 0x04
    INTVAR = 0x05
    USER_VAR = 0x0E
    FORMAT_DESCRIPTION = 0x0F
    XID = 0x10
    TABLE_MAP = 0x13
    WRITE_ROWS_V1 = 0x17
    UPDATE_ROWS_V1 = 0x18
    DELETE_ROWS_V1 = 0x19
    HEARTBEAT = 0x1B
    WRITE_ROWS_V2 = 0x1E
    UPDATE_ROWS_V2 = 0x1F
    DELETE_ROWS_V2 = 0x20
    GTID = 0x21
    ANONYMOUS_GTID = 0x22
    PREVIOUS_GTIDS = 0x23
    ANNOTATE_ROWS = 0xA0
    MARIA_BINLOG_CHECKPOINT = 0xA1
    MARIA_GTID = 0xA2
    MARIA_GTID_LIST = 0xA3


#: Events the reference consumes for position-advance only and never yields
#: (`/root/reference/src/EventsIterator.php:244-254`), plus the logged-and-
#: dropped HEARTBEAT / ANNOTATE_ROWS (`EventsIterator.php:153-161`).
SKIP_EVENT_TYPES = frozenset(
    {
        EventType.USER_VAR,
        EventType.STOP,
        EventType.PREVIOUS_GTIDS,
        EventType.ANONYMOUS_GTID,
        EventType.MARIA_BINLOG_CHECKPOINT,
        EventType.MARIA_GTID,
        EventType.MARIA_GTID_LIST,
        EventType.INTVAR,
        EventType.HEARTBEAT,
        EventType.ANNOTATE_ROWS,
    }
)

ROW_EVENT_TYPES = frozenset(
    {
        EventType.WRITE_ROWS_V1,
        EventType.WRITE_ROWS_V2,
        EventType.UPDATE_ROWS_V1,
        EventType.UPDATE_ROWS_V2,
        EventType.DELETE_ROWS_V1,
        EventType.DELETE_ROWS_V2,
    }
)


class ColumnType(IntEnum):
    """MySQL column type byte used in TABLE_MAP column descriptors."""

    DECIMAL = 0x00
    TINY = 0x01
    SHORT = 0x02
    LONG = 0x03
    FLOAT = 0x04
    DOUBLE = 0x05
    NULL = 0x06
    TIMESTAMP = 0x07
    LONGLONG = 0x08
    INT24 = 0x09
    DATE = 0x0A
    TIME = 0x0B
    DATETIME = 0x0C
    YEAR = 0x0D
    NEWDATE = 0x0E
    VARCHAR = 0x0F
    BIT = 0x10
    TIMESTAMP2 = 0x11
    DATETIME2 = 0x12
    TIME2 = 0x13
    JSON = 0xF5
    NEWDECIMAL = 0xF6
    ENUM = 0xF7
    SET = 0xF8
    TINY_BLOB = 0xF9
    MEDIUM_BLOB = 0xFA
    LONG_BLOB = 0xFB
    BLOB = 0xFC
    VAR_STRING = 0xFD
    STRING = 0xFE
    GEOMETRY = 0xFF


INTEGER_TYPES = frozenset(
    {
        ColumnType.TINY,
        ColumnType.SHORT,
        ColumnType.INT24,
        ColumnType.LONG,
        ColumnType.LONGLONG,
    }
)

#: Types whose TABLE_MAP binding consumes one character-column charset slot
#: (`/root/reference/src/Deserializer/ColumnMetadataFactory.php:221-248`).
CHARACTER_TYPES = frozenset(
    {ColumnType.VARCHAR, ColumnType.STRING, ColumnType.BLOB}
)


class OptMeta(IntEnum):
    """TABLE_MAP optional-metadata TLV tags (binlog_row_metadata=FULL)."""

    SIGNEDNESS = 1
    DEFAULT_CHARSET = 2
    COLUMN_CHARSET = 3
    COLUMN_NAME = 4
    SET_STR_VALUE = 5
    ENUM_STR_VALUE = 6
    GEOMETRY_TYPE = 7
    SIMPLE_PRIMARY_KEY = 8
    PRIMARY_KEY_WITH_PREFIX = 9
    ENUM_AND_SET_DEFAULT_CHARSET = 10
    ENUM_AND_SET_COLUMN_CHARSET = 11
    COLUMN_VISIBILITY = 12


# Collation ids the reference can convert (Collation.php:984-996), plus
# the charset breadth a real-user table needs (the reference and earlier
# rounds THREW on anything else; see collation_codec below).
COLLATION_LATIN1 = 8  # latin1_swedish_ci -> Windows-1252
COLLATION_UTF8MB3 = 33  # utf8mb3_general_ci -> UTF-8
COLLATION_UTF8MB4 = 45  # utf8mb4_general_ci -> UTF-8
COLLATION_BINARY = 63  # binary pseudo-charset -> tagged base64

#: Python codec per collation id; the MySQL "latin1" is cp1252
#: (documented quirk, `Collation.php:986-993`).  Ids are the published
#: MySQL collation table (information_schema.COLLATIONS).
COLLATION_CODECS: dict[int, str] = {
    # latin1_* family -> cp1252
    5: "cp1252", COLLATION_LATIN1: "cp1252", 15: "cp1252", 31: "cp1252",
    47: "cp1252", 48: "cp1252", 49: "cp1252", 94: "cp1252",
    11: "ascii",  # ascii_general_ci
    65: "ascii",  # ascii_bin
    # cp1251_* family
    14: "cp1251", 23: "cp1251", 50: "cp1251", 51: "cp1251", 52: "cp1251",
    # gbk
    28: "gbk", 87: "gbk",
    # utf8mb3
    COLLATION_UTF8MB3: "utf-8", 83: "utf-8",
    # utf8mb4 (incl. utf8mb4_bin)
    COLLATION_UTF8MB4: "utf-8", 46: "utf-8",
}


def collation_codec(charset: int) -> str | None:
    """Python codec for a MySQL collation id, or ``None`` when unmapped
    (the decoder then passes the raw bytes through as tagged base64 —
    an escape hatch, not an exception: the reference and rounds 1-3
    threw, which turns one exotic column into a dead pipeline).

    The range rules cover the published collation blocks: 192-223 are
    the utf8mb3_*_ci family, 224-247 the utf8mb4_*_ci family, and
    255-323 the MySQL 8 utf8mb4_*_0900_* family (255 =
    utf8mb4_0900_ai_ci, the MySQL 8 DEFAULT)."""
    codec = COLLATION_CODECS.get(charset)
    if codec is not None:
        return codec
    if 192 <= charset <= 223:
        return "utf-8"
    if 224 <= charset <= 247 or 255 <= charset <= 323:
        return "utf-8"
    return None

#: Prefix the reference prepends to base64-encoded binary values at the
#: JSON edge (`/root/reference/src/Deserializer/RowFactory.php:108`).
BINARY_TAG = "binary:base64,\x00\x00\x00"

#: First valid byte offset in a binlog file (after the 4-byte magic).
BINLOG_START_POS = 4

#: v4 event header length (timestamp u32, type u8, server_id u32,
#: event_size u32, log_pos u32, flags u16).
EVENT_HEADER_LEN = 19
