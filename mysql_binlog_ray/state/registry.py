"""Schema registry (SURVEY.md §2.7 M3).

Distributed home of the reference's single-process table-map dict
(`/root/reference/src/EventsIterator.php:40`, mirrored at
`RowFactory.php:16-26`): a tiny, read-mostly named Ray actor keyed by
``table_id``.  Decode workers receive a snapshot at construction (one
serialization, broadcast by Ray) and fall back to the actor only on an
unknown id (e.g. a DDL that happened after the snapshot was taken), so
the actor is never on the per-batch hot path.
"""

from __future__ import annotations

from typing import Any

import ray

from ..protocol.model import TableMapDef

REGISTRY_ACTOR_NAME = "mysql_binlog_ray_schema_registry"


@ray.remote(num_cpus=0)
class SchemaRegistry:
    """Versioned table-map store; serializes DDL ordering."""

    def __init__(self) -> None:
        self._maps: dict[int, dict[str, Any]] = {}

    def put(self, tm_dict: dict[str, Any]) -> None:
        self._maps[tm_dict["table_id"]] = tm_dict

    def put_many(self, tm_dicts: list[dict[str, Any]]) -> None:
        for d in tm_dicts:
            self.put(d)

    def get(self, table_id: int) -> dict[str, Any] | None:
        return self._maps.get(table_id)

    def snapshot(self) -> list[dict[str, Any]]:
        return list(self._maps.values())

    def latest_for(self, schema_name: str, table_name: str) -> dict[str, Any] | None:
        cands = [
            d
            for d in self._maps.values()
            if d["schema_name"] == schema_name and d["table_name"] == table_name
        ]
        if not cands:
            return None
        return max(cands, key=lambda d: (d.get("schema_ver", 0), d["table_id"]))


def get_or_create_registry(name: str = REGISTRY_ACTOR_NAME):
    """Named detached-within-job actor; safe to call from driver code.
    ``get_if_exists`` makes concurrent creation race-free (two callers
    both missing ``get_actor`` would otherwise collide on the name)."""
    return SchemaRegistry.options(
        name=name, get_if_exists=True, lifetime=None
    ).remote()


def snapshot_to_defs(snapshot: list[dict[str, Any]]) -> list[TableMapDef]:
    return [TableMapDef.from_dict(d) for d in snapshot]
