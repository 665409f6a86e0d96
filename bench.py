"""Benchmark harness.

Headline: the flagship CDC pipeline (binlog decode -> LWW merge ->
exactly-once parquet lake) on the synthetic stream sized for
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), plus per-query timings
of representative operators over the testdata tables.

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline twice in fresh processes (8 and 32 CPUs)
on the same input and reports throughputs + scaling efficiency
(sandbox proxy for the north rule's N->4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from mysql_binlog_ray.pipelines import queries as Q
    from mysql_binlog_ray.pipelines.cdc import CdcConfig, run_to_lake

    sf = Q._sf_of(sf_dir)

    # --- headline: CDC pipeline (stream generation is setup, not timed) ---
    spec, manifest = Q.cdc_manifest(sf_dir)
    n_events = sum(s["events"] for s in manifest["shards"])
    lake_dir = f"/tmp/mysql_binlog_ray/bench_lake_{os.getpid()}"
    shutil.rmtree(lake_dir, ignore_errors=True)
    cfg = CdcConfig(
        num_partitions=max(16, num_cpus * 2),
        decode_concurrency=(1, num_cpus),
    )
    t0 = time.time()
    run_to_lake(manifest, lake_dir, cfg, resume=False)
    headline = time.time() - t0
    shutil.rmtree(lake_dir, ignore_errors=True)

    # --- representative operator timings on the testdata tables ---
    bench_queries = [
        "lww_merge_events",
        "events_table_counts",
        "q1_lineitem_agg",
        "join_orders_customer",
        "window_events_hourly",
        "dedup_exact_documents",
        "doc_token_stats",
        "knn_embeddings",
        "minhash_neardup_documents",
        "quality_documents",
    ]
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    qtimes: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.time()
        res = qs[name](sf_dir)
        # consume lazily-built datasets
        if hasattr(res, "count") and not isinstance(res, (int, float)):
            try:
                res.count()
            except AttributeError:
                pass
        qtimes[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "cdc_pipeline_to_lake_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf),
        "num_cpus": num_cpus,
        "stream_events": n_events,
        "stream_row_images": spec.n_ops,
        "events_per_sec": round(n_events / headline, 1),
        "row_images_per_sec": round(spec.n_ops / headline, 1),
    }


def run_scaling() -> dict:
    """Same headline job at two parallelism levels in fresh processes."""
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32

    def once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm: generate the stream + page cache outside the timed runs
    once(lo if os.environ.get("GRAFT_SCALING_WARM") else lo)
    r_lo = once(lo)
    r_hi = once(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "cdc_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "events_per_sec_8": r_lo["events_per_sec"],
        "events_per_sec_32": r_hi["events_per_sec"],
        "sf": r_lo["sf"],
        "num_cpus": [lo, hi],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
