"""Raw binlog *file* source/sink (second wire format).

The parquet event shards store one framed packet per row (the network
shape the reference consumes).  A binlog file on disk is the other
public layout: the 4-byte magic ``\\xfe bin`` followed by back-to-back
events WITHOUT the packet OK byte — each event's header ``event_size``
is the only framing (what ``mysqlbinlog``/the server write).

``write_binlog_file`` produces that layout from framed packets;
``read_binlog_file``/``binlog_files_to_dataset`` walk it back into the
``(shard_id, event_seq, payload)`` shape the decode stage consumes, so
every downstream stage works unchanged on either format.
"""

from __future__ import annotations

import os
import struct
from typing import Iterable

import pyarrow as pa

from ..protocol.constants import EVENT_HEADER_LEN

BINLOG_MAGIC = b"\xfebin"


def write_binlog_file(path: str, packets: Iterable[bytes]) -> int:
    """Framed packets (leading OK byte) -> binlog file; returns events
    written."""
    n = 0
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(BINLOG_MAGIC)
        for pkt in packets:
            f.write(pkt[1:])  # strip the network OK byte
            n += 1
    return n


def read_binlog_file(data: bytes) -> list[bytes]:
    """Binlog file bytes -> framed packets (OK byte restored).  Events
    are delimited purely by each header's event_size field
    (`Header.php:16`), exactly how the server-side reader walks a file."""
    if data[:4] != BINLOG_MAGIC:
        raise ValueError("not a binlog file (bad magic)")
    off = 4
    out = []
    total = len(data)
    while off + EVENT_HEADER_LEN <= total:
        event_size = struct.unpack_from("<I", data, off + 9)[0]
        if event_size < EVENT_HEADER_LEN or off + event_size > total:
            raise ValueError(f"corrupt event_size {event_size} at offset {off}")
        out.append(b"\x00" + data[off : off + event_size])
        off += event_size
    if off != total:
        raise ValueError(f"trailing garbage: {total - off} bytes")
    return out


def binlog_files_to_dataset(paths: list[str]):
    """Binlog files -> the decode stage's input shape (`ray.data.Dataset`).
    One read task per file (files are the ordering unit); event_seq is
    synthesized as (file_index << 32) | position-in-file, preserving the
    total order the file layout defines.  Ray is imported HERE, not at
    module top: the sources package must stay importable without paying
    (or having) Ray — the wire transport is a thin no-Ray edge."""
    import ray.data as rd

    items = [{"path": p, "file_idx": i} for i, p in enumerate(sorted(paths))]

    def load(batch: dict) -> pa.Table:
        shard_ids, seqs, payloads = [], [], []
        for path, fidx in zip(batch["path"], batch["file_idx"]):
            with open(path, "rb") as f:
                pkts = read_binlog_file(f.read())
            base = int(fidx) << 32
            for j, pkt in enumerate(pkts):
                shard_ids.append(int(fidx))
                seqs.append(base + j)
                payloads.append(pkt)
        return pa.table(
            {
                "shard_id": pa.array(shard_ids, pa.int32()),
                "event_seq": pa.array(seqs, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return rd.from_items(items).map_batches(load, batch_size=1, batch_format="numpy")


def export_stream_to_binlog_files(manifest: dict, out_dir: str) -> list[str]:
    """Convert parquet event shards to binlog files (one per shard)."""
    import pyarrow.parquet as pq

    paths = []
    for s in manifest["shards"]:
        t = pq.read_table(s["path"], columns=["payload"])
        path = os.path.join(out_dir, f"binlog.{s['shard_id']:06d}")
        write_binlog_file(path, t.column("payload").to_pylist())
        paths.append(path)
    return paths
