"""Per-key SQL window functions and ROLLUP grouping — the window-operator
class the reference leaves to the consumer (SURVEY.md §2.7: the
reference emits row events; `README.md:80-104` shows consumers doing
their own analytics downstream).

``window_over`` is the ``f(x) OVER (PARTITION BY key ORDER BY ...)``
family: row_number, lag-difference, and running (unbounded-preceding)
sum, computed with ONE keyed exchange (``relational.keyed_reduce`` —
adaptive fanout) and a fully vectorized per-partition kernel: one sort,
one factorize for key boundaries, cumsums rebased per key.  No per-key
or per-row Python anywhere; key cardinality never appears in a loop.

``rollup_aggregate`` is ``GROUP BY ROLLUP(keys...)``: the finest level
is a pre-aggregated groupby (shuffle carries per-batch partials), the
coarser levels re-aggregate the FINEST RESULT (already reduced to one
row per key combination) — so the rollup explode multiplies the small
aggregated frame, never the input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .relational import AggSpec, _PARTIAL_KIND, preagg_groupby

# spec: out_col -> (kind, in_col) with kind in {row_number, lag_diff,
# run_sum}, or (kind, in_col, frame_rows) for moving_sum
WindowSpec = dict[str, tuple]

_KINDS = (
    "row_number",
    "lag",
    "lead",
    "lag_diff",
    "run_sum",
    "moving_sum",
    "first_value",
    "last_value",
    "rank",
    "dense_rank",
    "cume_dist",
    "percent_rank",
)


def _kcols(key_col: str | list[str]) -> list[str]:
    return [key_col] if isinstance(key_col, str) else list(key_col)


def _sort_by_key_codes(g: pd.DataFrame, kcols: list[str], order_col: str) -> pd.DataFrame:
    """The ONE composite-key coding + (key, order) mergesort shared by
    every per-partition combiner here: ``ngroup`` with ``dropna=False``
    keeps NULL key combos as one group each (SQL PARTITION BY parity);
    returns the frame sorted by ``(_kc, order_col)`` with the ``_kc``
    code column attached."""
    codes = g.groupby(kcols, sort=False, dropna=False).ngroup().to_numpy()
    return (
        g.assign(_kc=codes)
        .sort_values(["_kc", order_col], kind="mergesort")
        .reset_index(drop=True)
    )


def window_over(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    spec: WindowSpec,
) -> rd.Dataset:
    """Append window-function columns per ``spec``, partitioned by
    ``key_col`` and ordered by ``order_cols`` (which must be a total
    order within each key for deterministic output — include a unique id
    last).  SQL semantics throughout:

    - ``row_number``: 1-based position within the key (int64).
    - ``lag`` / ``lead`` over ``in_col`` with ``(kind, in_col, offset)``
      (offset defaults to 1): the raw shifted value — ``lag(v, n) OVER
      w`` / ``lead(v, n) OVER w``; NULL outside the partition (the SQL
      default, no explicit default operand) and when the source row's
      value is NULL (int64).
    - ``lag_diff`` over ``in_col``: ``v - lag(v)`` — NULL on each key's
      first row and whenever either operand is NULL (int64).
    - ``run_sum`` over ``in_col``: ``sum(v) OVER (... ROWS UNBOUNDED
      PRECEDING)`` — NULLs contribute nothing, and the running total is
      NULL until the key's first non-null value (int64; callers summing
      floats should pre-scale to integers — float running sums are
      association-order-dependent and can never match a SQL oracle
      bit-for-bit).
    - ``moving_sum`` over ``in_col`` with ``(kind, in_col, frame_rows)``:
      ``sum(v) OVER (... ROWS BETWEEN frame_rows-1 PRECEDING AND CURRENT
      ROW)`` — a bounded sliding frame, computed as two gathers into the
      partition's prefix sums.  NULLs contribute nothing; the result is
      NULL when the frame holds no non-null value (SQL SUM semantics).
    - ``first_value`` / ``last_value`` over ``in_col``: the key's first /
      last row's value in the order — ``first_value(v) OVER w`` (default
      frame already contains the first row) and ``last_value(v) OVER (w
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)`` (the
      SQL default frame would make last_value the CURRENT row — spell
      the full frame in oracles).  A NULL in that row yields NULL.
    - ``rank`` / ``percent_rank`` over ``in_col``: ``RANK() OVER
      (PARTITION BY key ORDER BY v ASC NULLS LAST)`` — ties (including
      the NULL tie group) share a rank, and a NULL value still GETS a
      rank (SQL never NULLs rank itself).  ``percent_rank`` is the
      standard ``(rank - 1) / (rows_in_key - 1)`` as float64 (0.0 for a
      single-row key) — one IEEE division of the same two integers on
      both sides, so it matches a SQL oracle bit-for-bit.  Note these
      rank by ``in_col``, independent of ``order_cols``.
    - ``dense_rank`` / ``cume_dist`` over ``in_col``: the gap-free
      tie-group ordinal (``DENSE_RANK()``) and the SQL cumulative
      distribution ``(# rows with value <= current, peers included) /
      rows_in_key`` as float64 — one IEEE division of two exact integers
      (oracle-exact like percent_rank).  Same ASC-NULLS-LAST ordering
      and NULL-tie-group semantics as rank.

    NULL keys form ONE partition (SQL PARTITION BY parity).  NULL order
    keys sort last (DuckDB's ASC default).

    Integer-typed columns (key, order, inputs) with NULLs are split into
    (filled int64, null flag) pairs BEFORE the pandas exchange: Arrow
    int64-with-nulls round-trips to pandas as float64, which silently
    rounds values above 2^53 (e.g. nanosecond timestamps) — the pair
    keeps every comparison and subtraction exact.  ``lag_diff`` /
    ``run_sum`` inputs must be integer-typed.
    """
    import pyarrow.compute as pc

    norm_spec: dict[str, tuple[str, str | None, int | None]] = {}
    for out_col, entry in spec.items():
        kind, in_col = entry[0], entry[1]
        frame = entry[2] if len(entry) > 2 else None
        if kind not in _KINDS:
            raise ValueError(f"unknown window kind {kind!r} for {out_col!r}")
        if (in_col is None) != (kind == "row_number"):
            raise ValueError(f"{kind} takes {'no' if kind == 'row_number' else 'an'} input column")
        if frame is not None and kind not in ("moving_sum", "lag", "lead"):
            raise ValueError(
                "only moving_sum/lag/lead take (kind, in_col, frame_or_offset)"
            )
        if kind == "moving_sum" and (not isinstance(frame, int) or frame < 1):
            raise ValueError(f"moving_sum frame_rows must be a positive int, got {frame!r}")
        if kind in ("lag", "lead"):
            frame = 1 if frame is None else frame
            if not isinstance(frame, int) or frame < 1:
                raise ValueError(f"{kind} offset must be a positive int, got {frame!r}")
        norm_spec[out_col] = (kind, in_col, frame)
    from .relational import keyed_reduce

    in_cols = sorted({c for _, c, _ in norm_spec.values() if c is not None})

    def _is_int_like(t: pa.DataType) -> bool:
        return (
            pa.types.is_integer(t)
            or pa.types.is_temporal(t)
            or pa.types.is_boolean(t)
        )

    # int-likeness is decided PER BATCH on the real Arrow type (the
    # dataset-level schema reports None for pandas extension dtypes) —
    # every batch of a dataset shares one schema, so all tasks agree,
    # and combine detects the exact-pair columns by presence
    def tag(b: pa.Table) -> pa.Table:
        cols: dict = {c: b.column(c) for c in b.schema.names}
        for c in sorted({*in_cols, *order_cols, key_col}):
            col = b.column(c)
            if not _is_int_like(col.type):
                if c in in_cols:
                    raise ValueError(
                        f"window_over: input column {c!r} must be integer-typed "
                        "(pre-scale floats to integers — float running sums "
                        "can't match a SQL oracle bit-for-bit)"
                    )
                continue  # string/float key or order col: pandas-exact path
            col = col.cast(pa.int64())
            cols[f"_wfv_{c}"] = col.fill_null(0)
            cols[f"_wfn_{c}"] = pc.is_null(col).cast(pa.int8())
        return pa.table(cols)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        key_is_int = f"_wfv_{key_col}" in g.columns
        # NULLS LAST == sort by (null flag, filled value) for exact cols
        sort_cols: list[str] = []
        for c in order_cols:
            if f"_wfv_{c}" in g.columns:
                sort_cols += [f"_wfn_{c}", f"_wfv_{c}"]
            else:
                sort_cols.append(c)
        if key_is_int:
            # factorize over the exact filled int64; nulls (flag rows)
            # get one dedicated code past the real ones
            codes, _ = pd.factorize(g[f"_wfv_{key_col}"], use_na_sentinel=False)
            knull = g[f"_wfn_{key_col}"].to_numpy() == 1
            codes = codes.copy()
            codes[knull] = codes.max(initial=-1) + 1
        else:
            # object/string keys round-trip exactly; all NULLs share -1
            codes, _ = pd.factorize(g[key_col], use_na_sentinel=True)
        g = (
            g.assign(_kc=codes)
            .sort_values(["_kc", *sort_cols], kind="mergesort", na_position="last")
            .reset_index(drop=True)
        )
        n = len(g)
        kc = g["_kc"].to_numpy()
        newkey = np.ones(n, dtype=bool)
        if n > 1:
            newkey[1:] = kc[1:] != kc[:-1]
        starts = np.flatnonzero(newkey)
        run_lens = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64)
        base = np.repeat(pos[starts], run_lens)
        drop = {"_kc", *[c for c in g.columns if c.startswith(("_wfv_", "_wfn_"))]}
        out = {c: g[c] for c in g.columns if c not in drop}
        for out_col, (kind, in_col, frame) in norm_spec.items():
            if kind == "row_number":
                out[out_col] = pos - base + 1
                continue
            null = g[f"_wfn_{in_col}"].to_numpy() == 1
            v = g[f"_wfv_{in_col}"].to_numpy()
            if kind == "first_value":
                d = v[base]
                mask = null[base]
            elif kind == "last_value":
                last = np.repeat(pos[starts] + run_lens - 1, run_lens)
                d = v[last]
                mask = null[last]
            elif kind == "moving_sum":
                # frame [max(key_start, i-frame+1) .. i]: two gathers
                # into prefix sums (values and non-null counts)
                cs1 = np.concatenate([np.zeros(1, np.int64), np.cumsum(v)])
                start = np.maximum(base, pos - frame + 1)
                d = cs1[pos + 1] - cs1[start]
                nn1 = np.concatenate(
                    [np.zeros(1, np.int64), np.cumsum((~null).astype(np.int64))]
                )
                mask = (nn1[pos + 1] - nn1[start]) == 0
            elif kind in ("rank", "percent_rank", "dense_rank", "cume_dist"):
                # sort each key by (null flag, value): ASC NULLS LAST;
                # tie groups (same null flag + value within a key) share
                # the rank of their first sorted position
                order = np.lexsort((v, null, kc))
                kcs, vs, ns = kc[order], v[order], null[order]
                poss = np.arange(n, dtype=np.int64)
                keystart = np.ones(n, dtype=bool)
                grpstart = np.ones(n, dtype=bool)
                if n > 1:
                    keystart[1:] = kcs[1:] != kcs[:-1]
                    grpstart[1:] = (
                        keystart[1:] | (ns[1:] != ns[:-1]) | (vs[1:] != vs[:-1])
                    )
                ks = np.flatnonzero(keystart)
                keylens = np.diff(np.append(ks, n))
                keybase = np.repeat(poss[ks], keylens)
                gs = np.flatnonzero(grpstart)
                grplens = np.diff(np.append(gs, n))
                grpbase = np.repeat(poss[gs], grplens)
                if kind == "dense_rank":
                    # tie-group ordinal within the key, no gaps
                    grp_id = np.cumsum(grpstart)  # global 1-based group id
                    dr_sorted = grp_id - np.repeat(grp_id[ks], keylens) + 1
                    dr = np.empty(n, dtype=np.int64)
                    dr[order] = dr_sorted
                    out[out_col] = pd.Series(dr, dtype="Int64")
                    continue
                if kind == "cume_dist":
                    # (# rows with value <= current, peers included) /
                    # (rows in key) — tie-group END over key length
                    grpend = grpbase + np.repeat(grplens, grplens)
                    cd_sorted = (grpend - keybase) / np.repeat(keylens, keylens)
                    cd = np.empty(n, dtype=np.float64)
                    cd[order] = cd_sorted
                    out[out_col] = cd
                    continue
                rank_sorted = grpbase - keybase + 1
                rank = np.empty(n, dtype=np.int64)
                rank[order] = rank_sorted
                if kind == "rank":
                    out[out_col] = pd.Series(rank, dtype="Int64")
                else:
                    lens = np.repeat(run_lens, run_lens)
                    out[out_col] = np.where(
                        lens > 1, (rank - 1) / np.maximum(lens - 1, 1), 0.0
                    )
                continue
            elif kind in ("lag", "lead"):
                # raw shifted value: NULL outside the partition (SQL
                # LAG/LEAD default) or when the source row's value is NULL
                off = frame
                if kind == "lag":
                    src = pos - off
                    valid = (pos - base) >= off
                else:
                    replen = np.repeat(run_lens, run_lens)
                    src = pos + off
                    valid = (pos - base + off) < replen
                srcc = np.clip(src, 0, n - 1)
                d = v[srcc]
                mask = ~valid | null[srcc]
            elif kind == "lag_diff":
                prev = np.empty(n, dtype=np.int64)
                prev[1:] = v[:-1]
                prev[0] = 0
                prev_null = np.empty(n, dtype=bool)
                prev_null[1:] = null[:-1]
                prev_null[0] = True
                d = v - prev
                mask = newkey | null | prev_null
            else:  # run_sum
                cs = np.cumsum(v)
                d = cs - np.repeat(cs[starts] - v[starts], run_lens)
                nn = np.cumsum((~null).astype(np.int64))
                nn = nn - np.repeat(nn[starts] - (~null[starts]).astype(np.int64), run_lens)
                mask = nn == 0  # NULL until the key's first non-null
            res = pd.Series(d, dtype="Int64")
            res[mask] = pd.NA
            out[out_col] = res
        return pd.DataFrame(out)

    return keyed_reduce(tagged, [key_col], combine)


def scd2_history(
    ds: rd.Dataset,
    key_col: str | list[str],
    order_col: str,
    no_next: int = -1,
) -> rd.Dataset:
    """SCD2 (slowly-changing-dimension type 2) validity intervals: for
    each key's version stream ordered by ``order_col``, append
    ``valid_to`` = the NEXT version's order value (``no_next`` for the
    current version) and ``is_current`` (int64 1/0).  The temporal-
    versioning view a CDC changefeed feeds a warehouse with — the
    reference emits the raw row events (`EventsIterator.php`) and leaves
    history assembly to the consumer (SURVEY.md §2.7).

    ``order_col`` must be integer-typed, non-NULL and unique per key
    (a commit/event sequence — exactly what the changefeed provides).
    ``key_col`` may be a list for composite keys (e.g. the CDC merge
    key).  Payload columns ride along untouched.

    Scale shape: ONE keyed exchange (``keyed_reduce`` — adaptive
    fanout); per partition one mergesort + one shifted compare, fully
    vectorized.  NULL keys form one partition (SQL PARTITION BY parity).
    """

    from .relational import keyed_reduce

    kcols = _kcols(key_col)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = _sort_by_key_codes(g, kcols, order_col)
        n = len(g)
        k = g["_kc"].to_numpy()
        o = g[order_col].to_numpy()
        if o.dtype.kind not in "iu":
            raise ValueError(
                f"scd2_history: order column {order_col!r} must be integer-typed"
            )
        valid_to = np.empty(n, dtype=np.int64)
        last = np.ones(n, dtype=bool)
        if n:
            valid_to[:-1] = o[1:]
            last[:-1] = k[1:] != k[:-1]
            valid_to[last] = no_next
        out = g.drop(columns=["_kc"]).copy()
        out["valid_to"] = valid_to
        out["is_current"] = last.astype(np.int64)
        return out

    return keyed_reduce(ds, kcols, combine)


def asof_snapshots(
    ds: rd.Dataset,
    key_col: str | list[str],
    order_col: str,
    watermarks: list[int],
    snap_col: str = "watermark",
) -> rd.Dataset:
    """Multi-version time-travel export: for EVERY watermark ``w`` in one
    pass, each key's latest row with ``order_col <= w`` (the state a
    consumer would see had it stopped at ``w``).  Keys with no row at or
    before a watermark are absent from that snapshot, exactly like the
    LWW lake built from the truncated stream.

    Scale shape: ONE keyed exchange for ALL watermarks (vs. |W| full
    LWW merges); per partition one mergesort, then per watermark a
    single ``np.maximum.reduceat`` over masked row positions — no
    per-key or per-watermark-per-key Python.  ``order_col`` must be
    integer-typed and non-NULL."""

    from .relational import keyed_reduce

    kcols = _kcols(key_col)
    wms = sorted(set(int(w) for w in watermarks))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = _sort_by_key_codes(g, kcols, order_col)
        n = len(g)
        if n == 0:
            out = g.drop(columns=["_kc"]).copy()
            out.insert(0, snap_col, np.array([], dtype=np.int64))
            return out
        k = g["_kc"].to_numpy()
        o = g[order_col].to_numpy()
        if o.dtype.kind not in "iu":
            raise ValueError(
                f"asof_snapshots: order column {order_col!r} must be integer-typed"
            )
        newkey = np.ones(n, dtype=bool)
        newkey[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(newkey)
        pos = np.arange(n, dtype=np.int64)
        picks: list[np.ndarray] = []
        snaps: list[np.ndarray] = []
        for w in wms:
            # last in-range position per key segment; -1 = no row <= w
            masked = np.where(o <= w, pos, -1)
            sel = np.maximum.reduceat(masked, starts)
            sel = sel[sel >= 0]
            picks.append(sel)
            snaps.append(np.full(len(sel), w, dtype=np.int64))
        take = np.concatenate(picks) if picks else np.array([], dtype=np.int64)
        out = g.drop(columns=["_kc"]).iloc[take].reset_index(drop=True)
        out.insert(0, snap_col, np.concatenate(snaps) if snaps else [])
        return out

    return keyed_reduce(ds, kcols, combine)


def snapshot_diff(
    ds: rd.Dataset,
    key_col: str | list[str],
    order_col: str,
    w_old: int,
    w_new: int,
    tombstone_col: str | None = None,
    compare_cols: list[str] | None = None,
) -> rd.Dataset:
    """Diff two as-of snapshots of a keyed version stream in ONE pass:
    for each key, compare its latest row at watermark ``w_old`` against
    its latest row at ``w_new`` and emit ``added`` / ``removed`` /
    ``changed`` rows (unchanged keys are not emitted) — the
    table-compare a CDC consumer runs to audit what a catch-up window
    did to the lake.

    ``removed`` requires delete markers: ``tombstone_col`` names a
    boolean column; a key whose latest row at ``w`` is a tombstone is
    absent from that snapshot (LWW-lake semantics).  By default a key is
    ``changed`` when its latest VERSION differs (a newer row arrived in
    ``(w_old, w_new]``); pass ``compare_cols`` to instead require a
    NULL-safe value difference on those columns (version-churn with
    identical values then drops out).

    Output: key columns (from the new side where present), ``change``,
    and every non-key column twice as ``old_<c>`` / ``new_<c>`` —
    integer columns as nullable Int64, floats as float64, everything
    else as object with ``None`` for the absent side.

    Scale shape: ONE keyed exchange (same as a single snapshot), one
    mergesort per partition, two masked ``np.maximum.reduceat`` picks —
    never a join of two materialized snapshots.
    """
    from .relational import keyed_reduce

    if not w_old < w_new:
        raise ValueError("snapshot_diff: w_old must be < w_new")
    kcols = _kcols(key_col)
    skip = set(kcols) | ({tombstone_col} if tombstone_col else set())
    w_old, w_new = int(w_old), int(w_new)

    def _side(sub: pd.DataFrame, c: str, absent: np.ndarray) -> pd.Series:
        s = sub[c]
        if s.dtype.kind in "iu":
            s = s.astype("Int64")
        elif s.dtype.kind == "b":
            s = s.astype("boolean")
        elif s.dtype.kind != "f":
            s = s.astype(object)
        return s.where(~pd.Series(absent))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        carry = [c for c in g.columns if c not in skip]
        g = _sort_by_key_codes(g, kcols, order_col)
        n = len(g)
        o = g[order_col].to_numpy() if n else np.array([], dtype=np.int64)
        if o.dtype.kind not in "iu":
            raise ValueError(
                f"snapshot_diff: order column {order_col!r} must be integer-typed"
            )
        k = g["_kc"].to_numpy()
        newkey = np.ones(n, dtype=bool)
        if n:
            newkey[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(newkey)
        pos = np.arange(n, dtype=np.int64)
        sels = []
        for w in (w_old, w_new):
            masked = np.where(o <= w, pos, -1)
            sels.append(
                np.maximum.reduceat(masked, starts)
                if len(starts)
                else np.array([], dtype=np.int64)
            )
        sel_old, sel_new = sels
        tomb = (
            g[tombstone_col].to_numpy(dtype=bool)
            if tombstone_col
            else np.zeros(n, dtype=bool)
        )
        p_old = (sel_old >= 0) & ~tomb[np.maximum(sel_old, 0)]
        p_new = (sel_new >= 0) & ~tomb[np.maximum(sel_new, 0)]
        added = ~p_old & p_new
        removed = p_old & ~p_new
        both = p_old & p_new
        sub_old_all = g.iloc[np.maximum(sel_old, 0)].reset_index(drop=True)
        sub_new_all = g.iloc[np.maximum(sel_new, 0)].reset_index(drop=True)
        if compare_cols is None:
            changed = both & (sel_old != sel_new)
        else:
            diff = np.zeros(len(sel_old), dtype=bool)
            for c in compare_cols:
                a, b = sub_old_all[c], sub_new_all[c]
                eq = (a == b).fillna(False) | (a.isna() & b.isna())
                diff |= ~eq.to_numpy(dtype=bool)
            changed = both & diff
        emit = added | removed | changed
        idx_old, idx_new = sel_old[emit], sel_new[emit]
        # absent side = no row picked OR the picked row is a tombstone
        ab_old, ab_new = ~p_old[emit], ~p_new[emit]
        sub_old = sub_old_all.loc[emit].reset_index(drop=True)
        sub_new = sub_new_all.loc[emit].reset_index(drop=True)
        keysrc = np.where(idx_new >= 0, idx_new, idx_old)
        out: dict = {}
        for c in kcols:
            out[c] = g[c].to_numpy()[keysrc] if len(keysrc) else g[c].to_numpy()[:0]
        out["change"] = np.select(
            [added[emit], removed[emit]], ["added", "removed"], default="changed"
        ).astype(object)
        for c in carry:
            out[f"old_{c}"] = _side(sub_old, c, ab_old)
            out[f"new_{c}"] = _side(sub_new, c, ab_new)
        return pd.DataFrame(out)

    return keyed_reduce(ds, kcols, combine)


def cohort_retention(
    ds: rd.Dataset,
    user_col: str,
    ts_col: str,
    period_seconds: int = 604800,
    num_parts: int | None = None,
) -> rd.Dataset:
    """Cohort retention matrix: users bucketed by the period of their
    FIRST event (the cohort), counted distinct per (cohort, period
    offset) of later activity — the standard activation/retention report
    over a change/event stream.

    Scale shape: ONE keyed exchange on the user — a user's whole history
    co-locates, so the first-event period, every (cohort, offset) pair,
    AND the per-partition distinct-user dedupe all happen vectorized
    inside the partition; each partition emits pre-counted partials
    (cohort, offset, partial n) and a final tiny ``preagg_groupby`` sums
    them.  No join, no second shuffle, nothing O(users) on the driver.
    Distinct counting across partitions is exact because the exchange
    key IS the user: one user never spans two partitions.
    """
    import pyarrow.compute as pc

    from .relational import keyed_reduce

    def project(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col])
        mask = pc.and_(
            pc.is_valid(t.column(user_col)), pc.is_valid(t.column(ts_col))
        )
        return t.filter(mask)

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        us = g[ts_col].to_numpy("datetime64[us]").view("int64")
        period = us // (int(period_seconds) * 1_000_000)
        d = pd.DataFrame({"u": g[user_col].to_numpy(), "p": period})
        first = d.groupby("u", sort=False)["p"].transform("min").to_numpy()
        d["cohort_period"] = first
        d["period_offset"] = d["p"].to_numpy() - first
        ded = d.drop_duplicates(["u", "cohort_period", "period_offset"])
        out = (
            ded.groupby(["cohort_period", "period_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        return out.astype(
            {"cohort_period": "int64", "period_offset": "int64", "n_users": "int64"}
        )

    parts = keyed_reduce(
        ds.map_batches(project, batch_format="pyarrow"),
        [user_col],
        partials,
        num_parts=num_parts,
    )
    return preagg_groupby(
        parts, ["cohort_period", "period_offset"], {"n_users": ("n_users", "sum")}
    )


def rollup_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    spec: AggSpec,
    lvl_col: str = "lvl",
) -> rd.Dataset:
    """``GROUP BY ROLLUP(keys...)``: one row per key combination at every
    prefix level — see :func:`grouping_sets_aggregate` for semantics and
    the scale shape."""
    n_keys = len(keys)
    sets = [frozenset(range(p)) for p in range(n_keys, -1, -1)]
    return grouping_sets_aggregate(ds, keys, spec, sets, lvl_col)


def cube_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    spec: AggSpec,
    lvl_col: str = "lvl",
) -> rd.Dataset:
    """``GROUP BY CUBE(keys...)``: every subset of the keys — see
    :func:`grouping_sets_aggregate`."""
    n_keys = len(keys)
    sets = [
        frozenset(i for i in range(n_keys) if not (m >> (n_keys - 1 - i)) & 1)
        for m in range(1 << n_keys)
    ]
    return grouping_sets_aggregate(ds, keys, spec, sets, lvl_col)


def grouping_sets_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    spec: AggSpec,
    sets: list[frozenset[int]],
    lvl_col: str = "lvl",
) -> rd.Dataset:
    """``GROUP BY GROUPING SETS(...)``: one aggregate row per key
    combination per grouping set, the keys NOT in a set NULL and
    ``lvl_col`` = the SQL ``GROUPING(keys...)`` bitmask (bit set = key
    aggregated away), which disambiguates a genuinely-NULL key value
    from an aggregated-away one.  ROLLUP = the prefix sets, CUBE = all
    subsets.

    Scale shape: the input is reduced ONCE by a pre-aggregated groupby at
    the finest level; the per-set explode and re-aggregate run over that
    already-reduced frame (|distinct key combos| rows), so the grouping
    sets cost |sets| x |finest result|, independent of input size.  Only
    sum/count/min/max specs are allowed (their partials re-aggregate
    losslessly).
    """
    import pyarrow.compute as pc

    n_keys = len(keys)
    # kept-index set -> GROUPING bitmask with a 1-bit per aggregated key
    levels = [
        (s, sum(1 << (n_keys - 1 - i) for i in range(n_keys) if i not in s))
        for s in sets
    ]
    if len({m for _, m in levels}) != len(levels):
        raise ValueError("grouping_sets_aggregate: duplicate grouping sets")
    markers = [f"_isn_{c}" for c in keys]

    def _fill_value(t: pa.DataType):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return ""
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return b""
        if pa.types.is_boolean(t):
            return False
        return 0

    # NULL keys cannot enter a Ray groupby (its sort-based shuffle can't
    # order them), so every key column travels as (filled value, null
    # marker) from the very first aggregate.  Within one lvl a column is
    # either rolled (marker all 1) or kept (marker = genuine nullness),
    # so grouping on (value, marker, lvl) keeps genuinely-NULL key
    # values distinct from real fill-values AND from rolled levels.
    def tag(batch: pa.Table) -> pa.Table:
        for c in keys:
            col = batch.column(c)
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, col.fill_null(_fill_value(col.type)))
            batch = batch.append_column(
                f"_isn_{c}", pc.is_null(col).cast(pa.int64())
            )
        return batch

    base = preagg_groupby(
        ds.map_batches(tag, batch_format="pyarrow"), [*keys, *markers], spec
    )

    def explode(batch: pa.Table) -> pa.Table:
        tables = []
        for kept, mask in levels:
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for j, c in enumerate(keys):
                col = batch.column(c)
                if j not in kept:  # aggregated away in this set
                    cols[c] = pa.nulls(batch.num_rows, col.type).fill_null(
                        _fill_value(col.type)
                    )
                    cols[f"_isn_{c}"] = pa.array(
                        np.ones(batch.num_rows, dtype=np.int64)
                    )
                else:
                    cols[c] = col
                    cols[f"_isn_{c}"] = batch.column(f"_isn_{c}")
            for out in spec:
                cols[out] = batch.column(out)
            cols[lvl_col] = pa.array(np.full(batch.num_rows, mask, dtype=np.int64))
            tables.append(pa.table(cols))
        return pa.concat_tables(tables)

    exploded = base.map_batches(explode, batch_format="pyarrow")
    respec: AggSpec = {
        out: (out, _PARTIAL_KIND[kind]) for out, (_, kind) in spec.items()
    }
    rolled = preagg_groupby(exploded, [*keys, *markers, lvl_col], respec)

    def restore(b: pa.Table) -> pa.Table:
        for c in keys:
            i = b.schema.get_field_index(c)
            col = b.column(c)
            mask = pc.equal(b.column(f"_isn_{c}"), pa.scalar(1, pa.int64()))
            b = b.set_column(
                i, c, pc.if_else(mask, pa.scalar(None, col.type), col)
            )
        return b.drop_columns([f"_isn_{c}" for c in keys])

    return rolled.map_batches(restore, batch_format="pyarrow")


def resample_fill(
    ds: rd.Dataset,
    ts_col: str = "ts",
    group_col: str = "event_type",
    unit_sec: int = 3600,
) -> rd.Dataset:
    """Calendar resampling with gap fill: per (group, time bucket)
    counts over the DENSE global bucket range — buckets with no events
    appear with ``n = 0`` (the time-series regularization step ahead of
    windowed models; SQL twin: ``generate_series`` cross join).

    Rows with a NULL timestamp or NULL group are DROPPED (a NaT views
    as INT64_MIN and would stretch the dense range by ~10^12 buckets;
    a NULL group never joins in the SQL twin — both match SQL
    aggregate/join semantics only by exclusion).

    Intended for bounded group cardinality (categories, tables,
    sources).  Scale shape: one pre-aggregated groupby reduces the
    input to (group x active-bucket) partial rows; the dense grid —
    which IS the output, so nothing larger than the output is ever
    built — is generated distributed from ``rd.range`` over buckets
    with the aggregated counts broadcast once."""
    import pyarrow.compute as pc

    from .relational import broadcast_once

    _TICKS = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}

    def bucketize(tab: pa.Table) -> pa.Table:
        tab = tab.filter(
            pc.and_(pc.is_valid(tab[ts_col]), pc.is_valid(tab[group_col]))
        )
        # divisor follows the column's actual timestamp unit (parquet is
        # typically us; pandas-originated data is ns)
        ticks = _TICKS[tab.schema.field(ts_col).type.unit]
        raw = tab[ts_col].to_numpy().view("int64")
        return pa.table(
            {group_col: tab[group_col], "bucket": pa.array(raw // (unit_sec * ticks))}
        )

    counts = preagg_groupby(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        [group_col, "bucket"],
        {"n": (None, "count")},
    ).to_pandas()  # O(groups x active buckets) == O(output): bounded
    if counts.empty:
        return rd.from_arrow(
            pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )
    lo, hi = int(counts["bucket"].min()), int(counts["bucket"].max())
    groups = sorted(counts[group_col].unique())
    per_group = {
        g: (
            sub["bucket"].to_numpy(np.int64),
            sub["n"].to_numpy(np.int64),
        )
        for g, sub in (
            (g, counts[counts[group_col] == g].sort_values("bucket"))
            for g in groups
        )
    }
    get_state = broadcast_once((groups, per_group))

    def fill(tab: pa.Table) -> pa.Table:
        gs, pg = get_state()
        buckets = tab["id"].to_numpy() + lo
        out_g, out_b, out_n = [], [], []
        for g in gs:
            gb, gn = pg[g]
            idx = np.searchsorted(gb, buckets)
            idx_c = np.minimum(idx, len(gb) - 1)
            n = np.where(gb[idx_c] == buckets, gn[idx_c], 0)
            out_g.append(np.full(len(buckets), g, dtype=object))
            out_b.append(buckets)
            out_n.append(n)
        return pa.table(
            {
                group_col: pa.array(np.concatenate(out_g)),
                "bucket": pa.array(np.concatenate(out_b)),
                "n": pa.array(np.concatenate(out_n).astype(np.int64)),
            }
        )

    return rd.range(hi - lo + 1).map_batches(fill, batch_format="pyarrow")
