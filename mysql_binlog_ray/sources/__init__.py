"""Event-stream sources: parquet event shards (the scale path), raw
binlog files, and the live MySQL wire protocol (S1/S4-S7 transport)."""

from .binlog_file import (
    binlog_files_to_dataset,
    export_stream_to_binlog_files,
    read_binlog_file,
    write_binlog_file,
)
from .wire import (
    BinlogWireClient,
    CleanClose,
    PacketConn,
    WireError,
    purge_spool,
    spool_shards,
    spool_state,
    tail_to_shards,
)

__all__ = [
    "BinlogWireClient",
    "CleanClose",
    "PacketConn",
    "WireError",
    "binlog_files_to_dataset",
    "export_stream_to_binlog_files",
    "purge_spool",
    "read_binlog_file",
    "spool_shards",
    "spool_state",
    "tail_to_shards",
    "write_binlog_file",
]
