"""Per-shard sequential decode (exact M4 commit stamping + E13 integrity).

The block-parallel decode stage (`decode_changefeed`) stamps
``commit_seq = -1`` on rows whose XID lands in a different block.  This
mode trades a little parallelism granularity for exactness: one task per
shard ("binlog file"), each walking its events strictly in order like the
reference's EventsIterator — so

- every row image gets its transaction's XID (`EventsIterator.php:335-341`),
- event-position continuity is verified: each header's ``log_pos`` must
  equal the running offset mod 2^32 (`EventsIterator.php:175-196`),
- the FORMAT_DESCRIPTION-first rule is enforced (`EventsIterator.php:137-139`),
- ROTATE resets the position and drops in-band table maps
  (`EventsIterator.php:163-173`).

Shards are independent files, so the stream still decodes embarrassingly
parallel across shards (SURVEY §4.2) — the unit of order is the file,
exactly as in the source database.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..protocol.constants import BINLOG_START_POS, EventType
from ..stages.decode_stage import BinlogDecoder


class SequentialShardDecoder(BinlogDecoder):
    """BinlogDecoder + strict in-order integrity checks for one shard."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.n_position_errors = 0
        self._expected_offset: int | None = None
        self._seen_fd = False

    def check_event(self, payload: bytes) -> None:
        """Reference integrity semantics per event (E13)."""
        etype = payload[5]
        if etype == EventType.FORMAT_DESCRIPTION:
            self._seen_fd = True
            self._expected_offset = None
            return
        if not self._seen_fd:
            raise ValueError(
                "Expected FORMAT_DESCRIPTION first"  # EventsIterator.php:137-139
            )
        if etype == EventType.ROTATE:
            self._expected_offset = BINLOG_START_POS
            return
        import struct

        event_size, log_pos = struct.unpack_from("<II", payload, 10)
        if self._expected_offset is not None:
            want = (self._expected_offset + event_size) & 0xFFFFFFFF
            if log_pos != want:
                self.n_position_errors += 1
            self._expected_offset = self._expected_offset + event_size
        else:
            # first event after FD: seed from the header
            self._expected_offset = log_pos


def decode_shards_sequential(
    manifest: dict[str, Any],
    registry_snapshot: list[dict[str, Any]] | None = None,
    start_after_seq: int | None = None,
    output: str = "changefeed",
    key_cols: tuple[str, ...] | None = None,
    strict: bool = True,
    **decoder_kwargs: Any,
) -> rd.Dataset:
    """One decode task per shard file; rows get exact commit stamps."""
    registry_snapshot = registry_snapshot or manifest["table_maps"]
    shards = manifest["shards"]
    if start_after_seq is not None:
        shards = [s for s in shards if s["last_event_seq"] > start_after_seq]

    def decode_shard(batch: dict) -> pa.Table:
        tables = []
        for path in batch["path"]:
            dec = SequentialShardDecoder(
                registry_snapshot=registry_snapshot,
                start_after_seq=start_after_seq,
                output=output,
                key_cols=key_cols,
                **decoder_kwargs,
            )
            t = pq.read_table(path, columns=["shard_id", "event_seq", "payload"])
            if strict:
                # zero-copy memoryviews — the integrity walk peeks a few
                # header bytes per event, never copies the payloads
                for p in BinlogDecoder._payload_views(t):
                    dec.check_event(p)
                if dec.n_position_errors:
                    raise ValueError(
                        f"{dec.n_position_errors} event-position discontinuities in {path}"
                    )
            tables.append(dec(t))
        return pa.concat_tables(tables)

    paths = rd.from_items([{"path": s["path"]} for s in shards])
    return paths.map_batches(decode_shard, batch_size=1, batch_format="numpy")
