"""Bucketed (hash-clustered) parquet storage and shuffle-free joins.

The single biggest all-to-all cost in a repeated pipeline is re-shuffling
the same fact tables on the same key every run.  Bucketed storage pays
the partitioning ONCE at write time — and the write itself is MAP-ONLY:
each task splits its blocks by ``hash(key) % num_buckets`` (the same
``poly64v2`` Arrow-buffer hash the CDC merge uses, recorded in the
manifest) and appends one file per touched bucket under
``bucket=NNNN/``.  A bucket is a directory of files, so no exchange is
needed to co-locate rows; readers get co-location for free.

``join_bucketed`` then joins two lakes bucketed with the SAME
(num_buckets, hash_algo) without any runtime shuffle: one task per
bucket reads both sides' ``bucket=i`` files and joins locally.  Because
every row of a key lives in exactly one bucket on each side, per-key
aggregates can also run inside the same task (``finish=``), turning
join+groupby into a single map-only stage.

Scale sizing: a join task materializes one bucket of BOTH sides —
choose ``num_buckets >= total_bytes / 256MB`` at write time (same rule
as ``relational.adaptive_num_parts``).  At 100 TB that is ~400k buckets;
the manifest and file naming stay O(1) per bucket per writing task.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..state.checkpoint import atomic_write_json, atomic_write_parquet, read_manifest
from .merge import partition_codes

HASH_ALGO = "poly64v2"


def write_bucketed(
    ds: rd.Dataset,
    out_dir: str,
    key_cols: tuple[str, ...] | str,
    num_buckets: int = 64,
) -> dict:
    """Map-only bucketed write: no shuffle, each task appends
    ``bucket=NNNN/part-*.parquet`` files for the buckets its blocks
    touch.  Overwrites ``out_dir`` (bucketed lakes are derived data —
    the manifest-first pattern guards partial writes like the shard
    sink: no manifest => the lake is not readable)."""
    if isinstance(key_cols, str):
        key_cols = (key_cols,)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def spill(batch: pa.Table) -> pd.DataFrame:
        codes = partition_codes(batch, key_cols, num_buckets)
        order = np.argsort(codes, kind="stable")
        t = batch.take(pa.array(order))
        sorted_codes = codes[order]
        # contiguous runs of equal bucket code -> one file slice each
        bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sorted_codes)]))
        rows = []
        for s, e in zip(starts, ends):
            b = int(sorted_codes[s])
            d = os.path.join(out_dir, f"bucket={b:05d}")
            path = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
            atomic_write_parquet(t.slice(s, e - s), path)
            rows.append({"bucket": b, "rows": int(e - s)})
        return pd.DataFrame(rows, columns=["bucket", "rows"])

    summary = ds.map_batches(spill, batch_format="pyarrow").to_pandas()  # one row per (task, bucket)
    manifest = {
        "kind": "bucketed",
        "key_cols": list(key_cols),
        "num_buckets": num_buckets,
        "hash_algo": HASH_ALGO,
        "total_rows": int(summary["rows"].sum()) if len(summary) else 0,
        "n_files": int(len(summary)),
    }
    atomic_write_json(out_dir, manifest)
    return manifest


def _read_bucket(out_dir: str, b: int, columns: list[str] | None = None) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, f"bucket={b:05d}", "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


def join_bucketed(
    dir_left: str,
    dir_right: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
    finish: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
) -> rd.Dataset:
    """Shuffle-free equi-join of two compatibly-bucketed lakes: one task
    per bucket, local pandas merge, optional per-bucket ``finish`` (all
    rows of a key are in the task, so key-grouped aggregates are exact
    with no further exchange)."""
    ml, mr = read_manifest(dir_left), read_manifest(dir_right)
    for name, m, key in (("left", ml, left_on), ("right", mr, right_on)):
        if m is None:
            raise ValueError(f"{name} side has no manifest — not a bucketed lake (or a write died early)")
        if m.get("key_cols") != [key]:
            raise ValueError(f"{name} side is bucketed by {m.get('key_cols')}, join key is {key}")
    if (ml["num_buckets"], ml["hash_algo"]) != (mr["num_buckets"], mr["hash_algo"]):
        raise ValueError(
            f"incompatible bucketing: {ml['num_buckets']}/{ml['hash_algo']} vs "
            f"{mr['num_buckets']}/{mr['hash_algo']} — rewrite one side"
        )
    nb = ml["num_buckets"]

    def _template(d: str, columns: list[str] | None) -> pd.DataFrame | None:
        """Zero-row frame with the lake's schema (from any one file)."""
        files = glob.glob(os.path.join(d, "bucket=*", "*.parquet"))
        if not files:
            return None
        sch = pq.read_schema(files[0])
        t = sch.empty_table()
        if columns is not None:
            t = t.select(columns)
        return t.to_pandas()

    lt0 = _template(dir_left, left_columns)
    rt0 = _template(dir_right, right_columns)
    if lt0 is None or rt0 is None:
        # a side with zero files joins to zero rows (inner) — and there
        # is no schema to synthesize outer nulls from
        return rd.from_items([])
    tmpl = lt0.merge(rt0, left_on=left_on, right_on=right_on, how=how)
    if finish is not None:
        tmpl = finish(tmpl)

    def join_one(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in batch["bucket"]:
            lt = _read_bucket(dir_left, int(b), left_columns)
            rt = _read_bucket(dir_right, int(b), right_columns)
            if lt is None and rt is None:
                continue
            # a missing side becomes its zero-row template, so pandas
            # merge produces the correct inner/left/outer semantics
            ldf = lt.to_pandas() if lt is not None else lt0
            rdf = rt.to_pandas() if rt is not None else rt0
            j = ldf.merge(rdf, left_on=left_on, right_on=right_on, how=how)
            if finish is not None:
                j = finish(j)
            outs.append(j)
        if not outs:
            return tmpl
        return pd.concat(outs, ignore_index=True)

    buckets = rd.from_items([{"bucket": b} for b in range(nb)])
    return buckets.map_batches(join_one, batch_format="pandas", batch_size=1)
