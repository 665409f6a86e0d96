"""CLI mirror of the reference's example consumer
(`/root/reference/examples/print-row-events.php`): iterate a binlog
stream and print one JSON document per row event, with the reference's
include/exclude filter flags and a start-position (watermark) option.

Usage:
    python -m mysql_binlog_ray.print_row_events --stream-dir /tmp/stream \\
        [--tables code.repos] [--databases code] \\
        [--exclude-tables ...] [--exclude-databases ...] \\
        [--start-after-seq N] [--limit N] [--num-cpus N]

Owns its Ray session (guarded init) — the only module besides bench.py
and the test fixture that does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def env_defaults(env: dict[str, str] | None = None) -> dict:
    """The reference's env→config layer (`Config.php:21-86` fromEnv):
    environment variables override the built-in defaults, CLI args
    override both (`Config.php:88-171` fromArgs runs after fromEnv).
    Names and comma-separated list syntax match the reference; only the
    non-transport settings have an analog here (USER/PASSWORD/HOST/PORT/
    COLLATION/SLAVE_ID/HEARTBEAT_PERIOD are connection-layer — n/a by
    SURVEY's transport mapping).  BINLOG_POSITION maps to the
    start-position watermark (the reference's S3 resume point);
    STREAM_DIR is the engine's source analog of BINLOG_FILE.

    Set-but-EMPTY env values are treated as unset (deliberate
    divergence: PHP's ``explode(',', '')`` would yield the include-list
    ``['']`` that matches nothing, and ``(int) ''`` would silently be
    position 0 — both footguns, not semantics worth preserving); a
    non-numeric BINLOG_POSITION raises a clear error instead of a raw
    traceback."""
    env = os.environ if env is None else env
    out: dict = {}
    if v := env.get("STREAM_DIR"):
        out["stream_dir"] = v
    if v := env.get("BINLOG_POSITION"):
        try:
            out["start_after_seq"] = int(v)
        except ValueError:
            raise SystemExit(f"BINLOG_POSITION must be an integer, got {v!r}")
    for env_name, arg_name in [
        ("TABLES", "tables"),
        ("EXCLUDE_TABLES", "exclude_tables"),
        ("DATABASES", "databases"),
        ("EXCLUDE_DATABASES", "exclude_databases"),
    ]:
        if v := env.get(env_name):
            # reference syntax: comma-separated, items trimmed
            out[arg_name] = [s.strip() for s in v.split(",")]
    return out


def build_parser(env: dict[str, str] | None = None) -> argparse.ArgumentParser:
    defaults = env_defaults(env)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--stream-dir",
        required="stream_dir" not in defaults,
        help="dir containing manifest.json (env: STREAM_DIR)",
    )
    ap.add_argument("--tables", nargs="*", default=None, help="include list: schema.table (env: TABLES, comma-separated)")
    ap.add_argument("--databases", nargs="*", default=None)
    ap.add_argument("--exclude-tables", nargs="*", default=None)
    ap.add_argument("--exclude-databases", nargs="*", default=None)
    ap.add_argument("--target-table", default=None, help="schema.table to decode (default: latest in registry)")
    ap.add_argument(
        "--all-tables",
        action="store_true",
        help="decode EVERY non-filtered table in one pass (the reference's "
        "behavior) via the multi-table JSON changefeed",
    )
    ap.add_argument("--start-after-seq", type=int, default=None, help="replay-skip watermark (F2; env: BINLOG_POSITION)")
    ap.add_argument("--limit", type=int, default=None, help="stop after N row events")
    ap.add_argument("--num-cpus", type=int, default=4)
    ap.set_defaults(**defaults)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    with open(f"{args.stream_dir}/manifest.json") as f:
        manifest = json.load(f)

    target = tuple(args.target_table.split(".", 1)) if args.target_table else None
    if args.all_tables:
        import pyarrow as pa

        from .pipelines.cdc import CdcConfig, decode_all_tables, read_event_stream

        cfg = CdcConfig(
            databases=args.databases,
            tables=args.tables,
            exclude_databases=args.exclude_databases,
            exclude_tables=args.exclude_tables,
        )
        cf = decode_all_tables(
            read_event_stream(manifest, args.start_after_seq),
            manifest["table_maps"],
            cfg,
            start_after_seq=args.start_after_seq,
        )

        def project(batch: pa.Table) -> pa.Table:
            docs_out = []
            for r in batch.to_pylist():
                docs_out.append(
                    json.dumps(
                        {
                            "schema": r["schema_name"],
                            "table": r["table_name"],
                            "action": r["op"],
                            "event_seq": r["event_seq"],
                            "row_seq": r["row_seq"],
                            "commit_seq": r["commit_seq"],
                            "ts": r["ts"],
                            "before": None if r["before"] is None else json.loads(r["before"]),
                            "after": None if r["after"] is None else json.loads(r["after"]),
                        },
                        ensure_ascii=False,
                    )
                )
            return pa.table({"json": pa.array(docs_out, pa.string())})

        docs = cf.map_batches(project, batch_format="pyarrow")
    else:
        from .pipelines.sequential import decode_shards_sequential
        from .stages.json_sink import JsonProjector

        cf = decode_shards_sequential(
            manifest,
            start_after_seq=args.start_after_seq,
            target_table=target,
            databases=args.databases,
            tables=args.tables,
            exclude_databases=args.exclude_databases,
            exclude_tables=args.exclude_tables,
        )
        docs = cf.map_batches(JsonProjector(), batch_format="pyarrow")

    printed = 0
    # stream to stdout in (event_seq, row_seq) order per batch — the
    # reference's single-consumer loop, distributed decode underneath
    for batch in docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for doc in batch.column("json").to_pylist():
            sys.stdout.write(doc + "\n")
            printed += 1
            if args.limit is not None and printed >= args.limit:
                ray.shutdown()
                return 0
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
