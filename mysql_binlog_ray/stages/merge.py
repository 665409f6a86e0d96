"""Last-writer-wins merge (SURVEY.md §2.7 M5/M6/M8).

Replays the insert/update/delete ACTION semantics of the reference's row
events (`WriteRows.php:13`, `UpdateRows.php:13`, `DeleteRows.php:13`) in
total order.  The total-order key is ``(event_seq, row_seq)`` — stream
position, exactly the monotone cursor the reference exposes as
BinlogPosition (`src/BinlogPosition.php:9-19`), made explicit per row.

Scale design (the part the single-threaded reference never needed):

1. ``flatten_changefeed``  — changefeed -> flat upsert rows (vectorized,
   pyarrow; key columns come from ``after``, falling back to ``before``
   for deletes).
2. ``lww_partial``         — per-batch combiner: keep only the newest
   image per key within the batch *before* the shuffle, so repeatedly
   updated (hot) keys ship one row per batch, not one per update.
3. partition column        — deterministic hash of the primary key mod
   ``num_partitions`` (stable across runs/processes: required for the
   resumable, idempotent sink).
4. ``groupby("_part").map_groups(lww_final)`` — the single all-to-all
   exchange in the pipeline; within each partition the same vectorized
   kernel picks winners and drops delete tombstones.

Skew (M8): the partition hash spreads keys uniformly; a pathologically
hot *single key* is already collapsed to ~one row per upstream batch by
the partial combine, which is the salting effect — the per-key fan-in to
the merge stage is bounded by the number of upstream batches, not by the
number of updates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SEQ_COLS = ("event_seq", "row_seq")


def flatten_changefeed(batch: pa.Table, key_cols: tuple[str, ...]) -> pa.Table:
    """Changefeed batch -> flat merge rows.

    Output columns: every target-table column (from ``after``; for deletes
    the key columns are taken from ``before``), plus ``op``, ``event_seq``,
    ``row_seq``, ``commit_seq``.
    """
    if batch.num_rows == 0:
        after = batch.schema.field("after").type
        cols = {f.name: pa.array([], f.type) for f in after}
        cols["op"] = pa.array([], pa.string())
        for c in ("event_seq", "commit_seq"):
            cols[c] = pa.array([], pa.int64())
        cols["row_seq"] = pa.array([], pa.int32())
        return pa.table(cols)

    after = batch.column("after")
    before = batch.column("before")
    if isinstance(after, pa.ChunkedArray):
        after = after.combine_chunks()
        before = before.combine_chunks()
    is_delete = pc.equal(batch.column("op"), pa.scalar("delete"))

    out: dict[str, pa.Array] = {}
    struct_type = after.type
    for i in range(struct_type.num_fields):
        name = struct_type.field(i).name
        a = after.field(i)
        if name in key_cols:
            # deletes carry the key in the before-image
            out[name] = pc.if_else(is_delete, before.field(i), a)
        else:
            out[name] = a
    out["op"] = batch.column("op")
    out["event_seq"] = batch.column("event_seq")
    out["row_seq"] = batch.column("row_seq")
    out["commit_seq"] = batch.column("commit_seq")
    return pa.table(out)


def _winner_indices(table: pa.Table, key_cols: tuple[str, ...]) -> np.ndarray:
    """Indices of the newest row per key (vectorized, no Python loop).

    Keys are dictionary-encoded to integer codes, then a single lexsort on
    (key_code, event_seq, row_seq) + boundary mask picks each key's last
    row — the within-group-order trap called out in SURVEY §7.3 is handled
    here by always sorting on the sequence tuple, never trusting block
    arrival order.
    """
    n = table.num_rows
    codes = np.zeros(n, dtype=np.uint64)
    mult = np.uint64(1)
    for kc in key_cols:
        dict_arr = pc.dictionary_encode(table.column(kc).combine_chunks())
        idx = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        card = np.uint64(len(dict_arr.dictionary))
        codes = codes * card + idx
    ev = table.column("event_seq").to_numpy(zero_copy_only=False)
    rs = table.column("row_seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((rs, ev, codes))
    sorted_codes = codes[order]
    is_last = np.r_[sorted_codes[1:] != sorted_codes[:-1], True]
    return order[is_last]


def lww_partial(batch: pa.Table, key_cols: tuple[str, ...]) -> pa.Table:
    """Per-batch LWW combiner: newest image per key, tombstones kept."""
    if batch.num_rows <= 1:
        return batch
    return batch.take(_winner_indices(batch, key_cols))


def lww_final(batch: pa.Table, key_cols: tuple[str, ...]) -> pa.Table:
    """Final per-partition merge: newest image per key, tombstones dropped,
    bookkeeping columns removed (sequence columns retained as lineage for
    checkpoint/resume)."""
    if batch.num_rows == 0:
        return batch.drop_columns([c for c in ("op", "commit_seq", "_part") if c in batch.column_names])
    winners = batch.take(_winner_indices(batch, key_cols))
    live = winners.filter(pc.not_equal(winners.column("op"), pa.scalar("delete")))
    drop = [c for c in ("op", "commit_seq", "_part") if c in live.column_names]
    return live.drop_columns(drop)


_HASH_KEY = "mysql_binlog_ray"  # 16 bytes: fixed siphash key for determinism


def partition_codes(table: pa.Table, key_cols: tuple[str, ...], num_partitions: int) -> np.ndarray:
    """Deterministic partition id per row: stable across processes, runs
    and Python hash randomization (pandas siphash with a fixed key)."""
    key = None
    for kc in key_cols:
        s = table.column(kc).to_pandas().astype(str)
        key = s if key is None else key + "\x00" + s
    h = pd.util.hash_pandas_object(key, index=False, hash_key=_HASH_KEY)
    return (h.to_numpy() % np.uint64(num_partitions)).astype(np.int32)


def add_partition_column(batch: pa.Table, key_cols: tuple[str, ...], num_partitions: int) -> pa.Table:
    return batch.append_column("_part", pa.array(partition_codes(batch, key_cols, num_partitions)))
