"""Snapshot bootstrap (Debezium-style snapshot -> stream handoff).

A CDC deployment rarely starts from an empty table: you load a
consistent snapshot of the source table, note the binlog position the
snapshot corresponds to, and then tail the stream from that position.
The reference leaves this to the operator (configure
``binlogFile``/``binlogPosition``, `Config.php:331-339`); here it is a
first-class pipeline:

    bootstrap_lake(snapshot_ds, watermark, lake_dir)   # snapshot load
    follow(manifest, lake_dir)                          # stream tail

Snapshot rows enter the lake with sequence lineage ``(watermark, row
index)`` so any later change event (event_seq > watermark) wins the LWW
merge, and replayed events at or below the watermark are skipped by the
resume filter — the same exactly-once math as a mid-stream checkpoint.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import ray.data as rd

from .cdc import CdcConfig
from ..stages.merge import PARTITION_HASH_ALGO, add_partition_column, lww_final
from ..state.checkpoint import atomic_write_parquet, commit_manifest


def bootstrap_lake(
    snapshot: rd.Dataset,
    watermark: int,
    lake_dir: str,
    cfg: CdcConfig | None = None,
) -> dict[str, Any]:
    """Write a consistent snapshot as the lake's initial state with the
    given watermark committed — ``follow`` then resumes from there."""
    cfg = cfg or CdcConfig()
    key_cols = cfg.key_cols

    def as_flat(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column("op", pa.array(["insert"] * n, pa.string()))
        batch = batch.append_column("event_seq", pa.array([watermark] * n, pa.int64()))
        batch = batch.append_column("row_seq", pa.array(range(n), pa.int32()))
        return add_partition_column(batch, key_cols, cfg.num_partitions)

    parted = snapshot.map_batches(as_flat, batch_format="pyarrow")

    lake = lake_dir

    def write_part(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .cdc import _lake_partition_path

        part = int(group.column("_part")[0].as_py())
        final = lww_final(group, key_cols)
        final = final.take(
            pc.sort_indices(final, sort_keys=[(k, "ascending") for k in key_cols])
        )
        size = atomic_write_parquet(final, _lake_partition_path(lake, part), compression="zstd")
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "rows": pa.array([final.num_rows], pa.int64()),
                "bytes": pa.array([size], pa.int64()),
                "max_event_seq": pa.array([watermark], pa.int64()),
            }
        )

    stats = parted.groupby("_part").map_groups(write_part, batch_format="pyarrow").take_all()
    parts = [
        {
            "part": int(r["part"]),
            "rows": int(r["rows"]),
            "bytes": int(r["bytes"]),
            "max_event_seq": int(r["max_event_seq"]),
        }
        for r in stats
    ]
    return commit_manifest(
        lake_dir,
        watermark,
        parts,
        extra={
            "key_cols": list(cfg.key_cols),
            "num_partitions": cfg.num_partitions,
            "hash_algo": PARTITION_HASH_ALGO,
            "bootstrap": True,
        },
    )
