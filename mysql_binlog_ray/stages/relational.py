"""Relational operators the north-star pipeline adds on top of the
reference (SURVEY.md §2.7 — the reference has no joins/sorts/groupbys,
`README.md:80-104` leaves them to the consumer).

All operators follow the scale rules from the brief:

- aggregates are **pre-aggregated per batch** (combiner) so the shuffle
  carries one row per key per batch, not one per input row;
- small-side joins are **broadcast** (``ray.put`` once, lookup per
  batch), never a shuffle;
- top-k reduces locally per batch before the tiny global sort.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

# agg spec: out_col -> (in_col, kind) with kind in {count,sum,min,max}
AggSpec = dict[str, tuple[str | None, str]]

_PARTIAL_KIND = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
_RAY_AGG = {"sum": Sum, "min": Min, "max": Max}


def preagg_groupby(ds: rd.Dataset, keys: list[str], spec: AggSpec) -> rd.Dataset:
    """groupby with a per-batch combiner: map_batches computes the partial
    aggregate per key, the global groupby merges partials.

    At 100 TB the difference is the shuffle carrying |keys|x|batches|
    rows instead of every input row.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False)
        out = {}
        for out_col, (in_col, kind) in spec.items():
            if kind == "count":
                out[out_col] = g.size()
            else:
                out[out_col] = getattr(g[in_col], kind)()
        return pd.DataFrame(out).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    aggs = [
        _RAY_AGG[_PARTIAL_KIND[kind]](out_col, alias_name=out_col)
        for out_col, (_, kind) in spec.items()
    ]
    return partials.groupby(keys).aggregate(*aggs)


def broadcast_join(
    ds: rd.Dataset,
    small_df: pd.DataFrame,
    left_on: str,
    right_on: str,
    take_cols: list[str],
    how: str = "inner",
) -> rd.Dataset:
    """Join against a small dimension table by broadcasting it: the table
    is ``ray.put`` once; every map task reads the same object-store copy
    (zero per-batch reshipping) and merges per batch.  No shuffle."""
    small_ref = ray.put(small_df[[right_on, *take_cols]])

    class Joiner:
        def __init__(self) -> None:
            self.small = ray.get(small_ref).set_index(right_on)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.merge(
                self.small, left_on=left_on, right_index=True, how=how
            )
            return out

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))


def top_k(ds: rd.Dataset, sort_cols: list[tuple[str, bool]], k: int) -> pa.Table:
    """Global top-k: local top-k per batch, then one tiny driver-side
    sort over <= k * num_batches rows.  ``sort_cols`` is
    [(col, descending)] and also the deterministic tie-break order."""
    by = [c for c, _ in sort_cols]
    ascending = [not d for _, d in sort_cols]

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending).head(k)

    small = ds.map_batches(local, batch_format="pandas").take_all()
    df = pd.DataFrame(small).sort_values(by, ascending=ascending).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def tumbling_window(
    ds: rd.Dataset,
    ts_col: str,
    key_cols: list[str],
    width_sec: int,
    spec: AggSpec,
) -> rd.Dataset:
    """Tumbling event-time window aggregate (the streaming-window gap in
    the reference, SURVEY §2.7): window id computed vectorized per batch,
    then pre-aggregated groupby on (keys..., window_start)."""

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        # robust to the column's datetime64 unit (us vs ns)
        sec = batch[ts_col].to_numpy().astype("datetime64[s]").astype("int64")
        batch = batch.copy()
        batch["window_start"] = (sec // width_sec) * width_sec
        return batch

    windowed = ds.map_batches(add_window, batch_format="pandas")
    return preagg_groupby(windowed, [*key_cols, "window_start"], spec)


def distinct_count(ds: rd.Dataset, col: str) -> int:
    """Exact distinct via per-batch set partials + driver union (the
    column's distinct set must fit the driver; use a sketch otherwise)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({col: batch[col].unique()})

    parts = ds.map_batches(partial, batch_format="pandas")
    return len(parts.unique(col))


def filter_project(
    ds: rd.Dataset,
    predicate: Callable[[pa.Table], pa.Array],
    columns: list[str],
) -> rd.Dataset:
    """Vectorized predicate + projection inside one map_batches (faster
    than row-wise ``Dataset.filter``)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(predicate(batch)).select(columns)

    return ds.map_batches(fn, batch_format="pyarrow")
