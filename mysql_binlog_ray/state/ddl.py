"""DDL interception (SURVEY.md §2.3 E6).

The reference surfaces DDL only as the raw SQL text of QUERY events
(`/root/reference/src/EventsIterator.php:343-355`) and relies on the
server sending a fresh TABLE_MAP afterwards (§1.2 late binding).  Our
engine additionally *parses* the common DDL shapes so the schema
registry can bump versions proactively — decode workers then know the
new layout even before the first post-DDL TABLE_MAP arrives.

Supported subset (everything else returns None and falls back to
TABLE_MAP late binding, exactly the reference's behavior):

- ``ALTER TABLE t ADD COLUMN name TYPE``
- ``ALTER TABLE t MODIFY COLUMN name TYPE`` (type widen/change)
- ``ALTER TABLE t DROP COLUMN name``
- ``ALTER TABLE t RENAME COLUMN a TO b``
- ``ALTER TABLE t RENAME TO t2`` / ``RENAME TABLE t TO t2``
- ``DROP TABLE t``
"""

from __future__ import annotations

import re
from dataclasses import replace

from ..protocol.constants import COLLATION_UTF8MB4, ColumnType
from ..protocol.model import ColumnDef, TableMapDef

_ADD = re.compile(
    r"ALTER\s+TABLE\s+`?(?P<table>\w+)`?\s+ADD\s+(?:COLUMN\s+)?`?(?P<col>\w+)`?\s+(?P<type>\w+)(?:\((?P<args>[\d,\s]+)\))?",
    re.IGNORECASE,
)
_DROP_COL = re.compile(
    r"ALTER\s+TABLE\s+`?(?P<table>\w+)`?\s+DROP\s+(?:COLUMN\s+)?`?(?P<col>\w+)`?",
    re.IGNORECASE,
)
_DROP_TABLE = re.compile(r"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?`?(?P<table>\w+)`?", re.IGNORECASE)
_MODIFY = re.compile(
    r"ALTER\s+TABLE\s+`?(?P<table>\w+)`?\s+MODIFY\s+(?:COLUMN\s+)?`?(?P<col>\w+)`?\s+(?P<type>\w+)(?:\((?P<args>[\d,\s]+)\))?",
    re.IGNORECASE,
)
_RENAME_COL = re.compile(
    r"ALTER\s+TABLE\s+`?(?P<table>\w+)`?\s+RENAME\s+COLUMN\s+`?(?P<old>\w+)`?\s+TO\s+`?(?P<new>\w+)`?",
    re.IGNORECASE,
)
_RENAME_TABLE = re.compile(
    r"(?:ALTER\s+TABLE\s+`?(?P<table>\w+)`?\s+RENAME\s+(?:TO\s+)?(?!COLUMN\b|INDEX\b|KEY\b)|RENAME\s+TABLE\s+`?(?P<table2>\w+)`?\s+TO\s+)`?(?P<new>\w+)`?",
    re.IGNORECASE,
)

_SQL_TYPES: dict[str, dict] = {
    "TINYINT": {"type": ColumnType.TINY},
    "SMALLINT": {"type": ColumnType.SHORT},
    "MEDIUMINT": {"type": ColumnType.INT24},
    "INT": {"type": ColumnType.LONG},
    "INTEGER": {"type": ColumnType.LONG},
    "BIGINT": {"type": ColumnType.LONGLONG},
    "FLOAT": {"type": ColumnType.FLOAT, "size": 4},
    "DOUBLE": {"type": ColumnType.DOUBLE, "size": 8},
    "DECIMAL": {"type": ColumnType.NEWDECIMAL, "precision": 10, "scale": 0},
    "VARCHAR": {"type": ColumnType.VARCHAR, "max_length": 255, "charset": COLLATION_UTF8MB4},
    "TEXT": {"type": ColumnType.BLOB, "length_bytes": 2, "charset": COLLATION_UTF8MB4},
    "LONGTEXT": {"type": ColumnType.BLOB, "length_bytes": 4, "charset": COLLATION_UTF8MB4},
    "DATE": {"type": ColumnType.DATE},
    "DATETIME": {"type": ColumnType.DATETIME2, "fsp": 0},
    "TIMESTAMP": {"type": ColumnType.TIMESTAMP2, "fsp": 0},
    "TIME": {"type": ColumnType.TIME2, "fsp": 0},
    "JSON": {"type": ColumnType.JSON, "length_bytes": 4},
    "BLOB": {"type": ColumnType.BLOB, "length_bytes": 2},
}


def _column_from_sql(name: str, sql_type: str, args: str | None) -> ColumnDef | None:
    base = _SQL_TYPES.get(sql_type.upper())
    if base is None:
        return None
    kw = dict(base)
    t = kw.pop("type")
    nums = [int(x) for x in re.findall(r"\d+", args or "")]
    if t is ColumnType.VARCHAR and nums:
        kw["max_length"] = nums[0]
    elif t is ColumnType.NEWDECIMAL and nums:
        kw["precision"] = nums[0]
        kw["scale"] = nums[1] if len(nums) > 1 else 0
    elif t in (ColumnType.DATETIME2, ColumnType.TIMESTAMP2, ColumnType.TIME2) and nums:
        kw["fsp"] = nums[0]
    return ColumnDef(name=name, type=t, nullable=True, **kw)


def apply_ddl(
    sql: str,
    schema_name: str,
    current: TableMapDef | None,
    next_table_id: int,
) -> TableMapDef | None:
    """Apply one DDL statement to the current table map; returns the new
    versioned TableMapDef, or None when the statement is not understood
    or does not touch ``current`` (late binding handles it instead)."""
    m = _ADD.search(sql)
    if m and current is not None and m.group("table") == current.table_name:
        col = _column_from_sql(m.group("col"), m.group("type"), m.group("args"))
        if col is None:
            return None
        return replace(
            current,
            table_id=next_table_id,
            columns=(*current.columns, col),
            schema_ver=current.schema_ver + 1,
        )
    m = _MODIFY.search(sql)
    if m and current is not None and m.group("table") == current.table_name:
        col = _column_from_sql(m.group("col"), m.group("type"), m.group("args"))
        if col is None:
            return None
        names = [c.name for c in current.columns]
        if m.group("col") not in names:
            return None
        cols = tuple(
            col if c.name == m.group("col") else c for c in current.columns
        )
        return replace(
            current,
            table_id=next_table_id,
            columns=cols,
            schema_ver=current.schema_ver + 1,
        )
    m = _RENAME_COL.search(sql)
    if m and current is not None and m.group("table") == current.table_name:
        old, new = m.group("old"), m.group("new")
        if old not in [c.name for c in current.columns]:
            return None
        cols = tuple(
            replace(c, name=new) if c.name == old else c for c in current.columns
        )
        return replace(
            current,
            table_id=next_table_id,
            columns=cols,
            schema_ver=current.schema_ver + 1,
        )
    m = _RENAME_TABLE.search(sql)
    if m and current is not None and (
        (m.group("table") or m.group("table2")) == current.table_name
    ):
        return replace(
            current,
            table_id=next_table_id,
            table_name=m.group("new"),
            schema_ver=current.schema_ver + 1,
        )
    m = _DROP_COL.search(sql)
    if m and current is not None and m.group("table") == current.table_name:
        cols = tuple(c for c in current.columns if c.name != m.group("col"))
        if len(cols) == len(current.columns):
            return None
        name_to_idx = {c.name: i for i, c in enumerate(cols)}
        pk = tuple(
            name_to_idx[current.columns[i].name]
            for i in current.primary_key
            if current.columns[i].name in name_to_idx
        )
        return replace(
            current,
            table_id=next_table_id,
            columns=cols,
            primary_key=pk,
            schema_ver=current.schema_ver + 1,
        )
    return None
