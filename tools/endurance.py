"""Endurance soak: incremental exactly-once ingestion of a huge stream.

Protocol (round-4 verdict #7): ingest a 100M-row-image generated stream
(schema evolution mid-stream) into the lake INCREMENTALLY — the
long-lived daemon shape, each step an idempotent `follow` — with a real
SIGKILL mid-write at one increment followed by a resume, then verify
the final lake against the generator's ground truth:

- exact row count vs the oplog's live-key count (DuckDB window over
  oplog.parquet — never pandas over 100M rows);
- a random key sample re-synthesized via ContentFactory and compared on
  commit + content + stars.

Records per-increment wall/rows/rate, driver RSS, object-store usage
and on-disk spill growth; prints one JSON summary line at the end.

Usage:
    python tools/endurance.py /tmp/endurance/stream \
        --lake /tmp/endurance/lake [--increments 16] [--kill-at 8] \
        [--num-cpus 8] [--num-partitions 128] [--sample 200]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import resource
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _spill_bytes() -> int:
    return sum(_du(p) for p in glob.glob("/tmp/ray/session_*/object_spilling*")) + sum(
        _du(p) for p in glob.glob("/tmp/ray/*/object_spilling*")
    )


def _sub_manifest(manifest: dict, n_shards: int) -> dict:
    m = dict(manifest)
    m["shards"] = manifest["shards"][:n_shards]
    return m


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("stream_dir")
    ap.add_argument("--lake", required=True)
    ap.add_argument("--increments", type=int, default=16)
    ap.add_argument("--kill-at", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--num-partitions", type=int, default=128)
    ap.add_argument("--sample", type=int, default=200)
    args = ap.parse_args()

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

    from mysql_binlog_ray.pipelines.cdc import CdcConfig, follow, read_manifest

    with open(os.path.join(args.stream_dir, "manifest.json")) as f:
        manifest = json.load(f)
    total_shards = len(manifest["shards"])
    per = -(-total_shards // args.increments)
    cfg = CdcConfig(num_partitions=args.num_partitions)

    t_start = time.time()
    spill0 = _spill_bytes()
    increments = []
    killed = False
    prev_rows = 0
    for i in range(args.increments):
        n = min(total_shards, (i + 1) * per)
        sub = _sub_manifest(manifest, n)
        t0 = time.time()
        if i == args.kill_at and not killed:
            # real crash: a subprocess ingests this increment and is
            # SIGKILLed as soon as the lake shows write activity; the
            # in-process retry below is the resume.
            subp = os.path.join(args.stream_dir, f"_soak_m{i}.json")
            with open(subp, "w") as f:
                json.dump(sub, f)
            code = (
                "import json,ray;"
                f"ray.init(address='local',num_cpus={args.num_cpus},"
                "include_dashboard=False,logging_level='ERROR');"
                "from ray.data import DataContext;"
                "DataContext.get_current().enable_progress_bars=False;"
                "from mysql_binlog_ray.pipelines.cdc import CdcConfig,follow;"
                f"follow(json.load(open({subp!r})), {args.lake!r},"
                f" CdcConfig(num_partitions={args.num_partitions}))"
            )
            proc = subprocess.Popen([sys.executable, "-c", code])
            deadline = time.time() + 600
            before = _du(args.lake) if os.path.isdir(args.lake) else 0
            while time.time() < deadline and proc.poll() is None:
                now = _du(args.lake) if os.path.isdir(args.lake) else 0
                if now != before and now > 0:
                    break
                time.sleep(0.25)
            if proc.poll() is None:
                proc.send_signal(signal.SIGKILL)
                proc.wait(timeout=60)
                killed = True
                print(f"[soak] increment {i}: subprocess SIGKILLed mid-write", flush=True)
            # fall through: resume the SAME increment in-process
        m = follow(sub, args.lake, cfg)
        dt = time.time() - t0
        rows = m["totals"]["rows"]
        avail = ray.available_resources().get("object_store_memory", 0)
        total_os = ray.cluster_resources().get("object_store_memory", 1)
        increments.append(
            {
                "i": i,
                "shards": n,
                "wall_sec": round(dt, 1),
                "rows_total": rows,
                "rows_delta": rows - prev_rows,
                "watermark": m["watermark"],
                "obj_store_used_frac": round(1 - avail / total_os, 3),
                "driver_rss_gb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
                ),
                "spill_gb": round((_spill_bytes() - spill0) / 1e9, 2),
            }
        )
        print(f"[soak] {json.dumps(increments[-1])}", flush=True)
        prev_rows = rows
        if n == total_shards:
            break

    wall = time.time() - t_start

    # ---- oracle verification ------------------------------------------
    import duckdb

    con = duckdb.connect()
    oplog = os.path.join(args.stream_dir, "oplog.parquet")
    live_count = con.execute(
        f"""
        WITH last AS (
            SELECT key, version, op, op_idx,
                   row_number() OVER (PARTITION BY key
                                      ORDER BY event_seq DESC, row_seq DESC) rn
            FROM '{oplog}'
        ) SELECT count(*) FROM last WHERE rn = 1 AND op != 2
        """
    ).fetchone()[0]
    final = read_manifest(args.lake)
    rows_ok = final["totals"]["rows"] == live_count

    sample = con.execute(
        f"""
        WITH last AS (
            SELECT key, version, op, op_idx,
                   row_number() OVER (PARTITION BY key
                                      ORDER BY event_seq DESC, row_seq DESC) rn
            FROM '{oplog}'
        ) SELECT key, version, op_idx FROM last
          WHERE rn = 1 AND op != 2
          ORDER BY md5(CAST(key AS VARCHAR)) LIMIT {args.sample}
        """
    ).fetchall()

    from mysql_binlog_ray.fixtures.generator import ContentFactory, StreamSpec
    from mysql_binlog_ray.pipelines.cdc import read_lake

    spec = StreamSpec(**manifest["spec"]) if "spec" in manifest else None
    if spec is None:
        raise SystemExit("stream manifest carries no spec; cannot sample-verify")
    factory = ContentFactory(spec)
    ddl_op = spec.ddl_op if spec.ddl_op is not None else spec.n_ops + 1
    expected = {}
    for key, version, op_idx in sample:
        r = factory.row(int(key), int(version), op_idx >= ddl_op)
        expected[(r["repo"], r["path"])] = r

    import pyarrow as pa
    import pyarrow.compute as pc

    want_repos = pa.array(sorted({rp for rp, _ in expected}))

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("repo"), value_set=want_repos))

    got = read_lake(args.lake).map_batches(keep, batch_format="pyarrow").to_pandas()
    matched = 0
    for _, row in got.iterrows():
        exp = expected.get((row["repo"], row["path"]))
        if exp is None:
            continue
        stars_exp = exp.get("stars")
        stars_got = row.get("stars")
        stars_eq = (stars_exp is None and (stars_got is None or stars_got != stars_got)) or (
            stars_exp == stars_got
        )
        if (
            row["commit"] == exp["commit"]
            and row["content"] == exp["content"]
            and row["lang"] == exp["lang"]
            and stars_eq
        ):
            matched += 1

    summary = {
        "metric": "endurance_100m_soak",
        "stream_shards": total_shards,
        "increments": len(increments),
        "killed_mid_write": killed,
        "total_wall_sec": round(wall, 1),
        "final_rows": final["totals"]["rows"],
        "oracle_live_keys": live_count,
        "rows_exact_match": rows_ok,
        "sample_checked": len(expected),
        "sample_matched": matched,
        "peak_driver_rss_gb": max(x["driver_rss_gb"] for x in increments),
        "peak_obj_store_frac": max(x["obj_store_used_frac"] for x in increments),
        "spill_gb": increments[-1]["spill_gb"],
        "sustained_rows_per_sec": round(spec.n_ops / wall),
        "increments_detail": increments,
    }
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0 if (rows_ok and matched == len(expected)) else 1


if __name__ == "__main__":
    sys.exit(main())
