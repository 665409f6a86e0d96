"""Incremental materialized-view maintenance (IVM) over a changefeed.

The reference engine stops at emitting row events (`EventsIterator.php`
yields them; `README.md:80-104` shows consumers folding them by hand).
The canonical downstream consumer of a CDC feed is a *maintained
aggregate view*: ``SELECT group, count(*), sum(value) FROM state GROUP
BY group`` kept up to date by applying each change as a delta instead of
re-aggregating the lake.  This module implements that delta algebra in
Ray-Data shape:

- ``changefeed_to_deltas``: changefeed rows ``(key..., group, value, op,
  seq...)`` -> locally pre-aggregated retraction/insertion deltas
  ``(group, d_count, d_value)``.  ONE keyed exchange on the primary key
  (``relational.keyed_reduce`` — adaptive fanout), then a fully
  vectorized per-partition kernel: one sort by ``(key, seq)``, boundary
  masks, two fancy-index gathers.  An upsert retracts the key's previous
  state (if present) and inserts the new one; a delete only retracts; a
  delete of an absent key is a no-op (LWW tombstone semantics, matching
  ``stages/merge.py``).  Per-partition deltas are combined per group
  before leaving the task, so the second exchange moves O(groups) rows.
- ``base_state``: the stored view's underlying state (e.g. the CDC lake
  itself).  Its rows participate as retractable previous state but emit
  no insertion (they are already counted in the stored view) — this is
  what makes *incremental refresh* exact: the deltas of a new binlog
  increment applied on top of the old view equal the view recomputed
  from scratch (regression-tested against the LWW replay oracle).
- ``maintained_view`` / ``refresh_view``: fold deltas into the view /
  apply a delta table to a stored view (groups whose count reaches zero
  drop out, exactly as re-aggregation would drop them).

Scale shape: the only all-to-all is the key-hash exchange of slim
projected rows; group cardinality never appears in a loop; the view and
delta tables are O(groups).  Telescoping sums make the result
order-independent only for exact (integer) value columns — callers that
need bit-exact parity with re-aggregation should pass integer values
(e.g. cents, byte lengths), as both driver queries do.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .relational import keyed_reduce, preagg_groupby

_INIT_SEQ = -(2**62)  # sorts before any real sequence number


def changefeed_to_deltas(
    feed: rd.Dataset,
    *,
    key_cols: Sequence[str],
    group_col: str,
    value_col: str,
    seq_cols: Sequence[str] = ("event_seq",),
    op_col: str = "op",
    delete_op: str = "delete",
    base_state: rd.Dataset | None = None,
    num_parts: int | None = None,
    est_input_bytes: int | None = None,
) -> rd.Dataset:
    """Changefeed -> per-partition-aggregated view deltas.

    ``feed`` columns: ``key_cols + [group_col, value_col, op_col] +
    seq_cols``.  ``(seq_cols)`` must totally order a key's changes (the
    CDC feed's ``(event_seq, row_seq)``).  ``value_col`` must be
    non-null numeric — delete rows' values are ignored (the retraction
    uses the *previous* row's value) but must still be valid numbers
    (fill 0).  ``base_state`` columns: ``key_cols + [group_col,
    value_col]`` — at most one row per key (a lake).

    Returns a Dataset of ``(group_col, d_count int64, d_value)`` with at
    most one row per group per reduce partition.
    """
    kcols = list(key_cols)
    scols = list(seq_cols)
    proj = kcols + [group_col, value_col, op_col] + scols

    def tag_feed(b: pa.Table) -> pa.Table:
        vt = b.schema.field(value_col).type
        if pa.types.is_unsigned_integer(vt):
            # numpy negation of a uint array WRAPS (retracting 5 would
            # add 2**64-5) — require a signed cast from the caller
            raise ValueError(
                f"changefeed_to_deltas: value column {value_col!r} is "
                f"unsigned ({vt}); cast to a signed/float type first — "
                "retraction negation would wrap"
            )
        return b.select(proj).append_column(
            "_init", pa.array(np.zeros(b.num_rows, np.int8))
        )

    tagged = feed.map_batches(tag_feed, batch_format="pyarrow")

    if base_state is not None:
        def tag_base(b: pa.Table) -> pa.Table:
            out = b.select(kcols + [group_col, value_col])
            n = out.num_rows
            out = out.append_column(op_col, pa.array(["insert"] * n, pa.string()))
            for sc in scols:
                out = out.append_column(sc, pa.array(np.full(n, _INIT_SEQ, np.int64)))
            return out.append_column("_init", pa.array(np.ones(n, np.int8)))

        tagged = tagged.union(base_state.map_batches(tag_base, batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                group_col: pd.Series([], dtype=g[group_col].dtype),
                "d_count": pd.Series([], dtype=np.int64),
                "d_value": pd.Series([], dtype=g[value_col].dtype),
            }
        )
        n = len(g)
        if n == 0:
            return empty
        codes = g.groupby(kcols, sort=False, dropna=False).ngroup().to_numpy()
        # init rows carry _INIT_SEQ so they sort first within their key
        order = np.lexsort(
            tuple(g[c].to_numpy() for c in reversed(scols)) + (codes,)
        )
        codes = codes[order]
        grp = g[group_col].to_numpy()[order]
        val = g[value_col].to_numpy()[order]
        is_del = (g[op_col].to_numpy()[order] == delete_op)
        is_init = g["_init"].to_numpy()[order].astype(bool)

        same_key = np.zeros(n, dtype=bool)
        same_key[1:] = codes[1:] == codes[:-1]
        present_after = ~is_del  # state exists after this row applies
        prev_present = same_key.copy()
        prev_present[1:] &= present_after[:-1]

        ins_idx = np.nonzero(~is_del & ~is_init)[0]
        ret_idx = np.nonzero(prev_present)[0] - 1  # retract the PREVIOUS row
        groups = np.concatenate([grp[ins_idx], grp[ret_idx]])
        d_count = np.concatenate(
            [np.ones(len(ins_idx), np.int64), -np.ones(len(ret_idx), np.int64)]
        )
        d_value = np.concatenate([val[ins_idx], -val[ret_idx]])
        if len(groups) == 0:
            return empty
        df = pd.DataFrame({group_col: groups, "d_count": d_count, "d_value": d_value})
        return df.groupby(group_col, as_index=False, sort=False, dropna=False).sum()

    return keyed_reduce(
        tagged, kcols, combine, num_parts=num_parts, est_input_bytes=est_input_bytes
    )


def aggregate_deltas(deltas: rd.Dataset, group_col: str) -> rd.Dataset:
    """Fold per-partition deltas into one row per group (small result)."""
    return preagg_groupby(
        deltas,
        [group_col],
        {"d_count": ("d_count", "sum"), "d_value": ("d_value", "sum")},
    )


def maintained_view(
    deltas: rd.Dataset,
    group_col: str,
    count_name: str = "n_rows",
    value_name: str = "sum_value",
) -> rd.Dataset:
    """View from scratch: aggregate deltas, drop fully-vacated groups."""
    agg = aggregate_deltas(deltas, group_col)

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(b.column("d_count"), 0)
        b = b.filter(keep)
        # rename BY NAME: positional renaming would silently mislabel if
        # the aggregate's column order ever changed
        new_names = {"d_count": count_name, "d_value": value_name}
        return b.rename_columns(
            [new_names.get(n, n) for n in b.schema.names]
        ).select([group_col, count_name, value_name])

    return agg.map_batches(finish, batch_format="pyarrow")


def refresh_view(
    view: pa.Table,
    delta_agg: pa.Table,
    group_col: str,
    count_name: str = "n_rows",
    value_name: str = "sum_value",
) -> pa.Table:
    """Apply an aggregated delta table to a stored view (both O(groups),
    driver-side by design).  Groups whose count reaches zero drop."""
    v = view.to_pandas()
    d = delta_agg.to_pandas().rename(
        columns={"d_count": count_name, "d_value": value_name}
    )
    merged = (
        pd.concat([v, d], ignore_index=True)
        .groupby(group_col, as_index=False, sort=False, dropna=False)
        .sum()
    )
    merged = merged[merged[count_name] != 0].reset_index(drop=True)
    merged[count_name] = merged[count_name].astype(np.int64)
    return pa.Table.from_pandas(merged, preserve_index=False)
