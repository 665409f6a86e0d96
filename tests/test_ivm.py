"""Incremental materialized-view maintenance (stages/ivm.py).

Oracle: brute-force recompute of the view from the final state (pandas),
plus the REAL CDC changefeed checked against the replayed lake and the
incremental-refresh identity view(full) == refresh(view(prefix),
deltas(suffix, base_state=state(prefix))).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from mysql_binlog_ray.stages.ivm import (
    aggregate_deltas,
    changefeed_to_deltas,
    maintained_view,
    refresh_view,
)


def brute_state(feed: pd.DataFrame, key, group, value, seq, delete_op="delete"):
    """Final live state by sequential replay — the single source of truth
    for both oracles."""
    f = feed.sort_values(list(seq), kind="mergesort")
    state: dict = {}
    for row in f.itertuples(index=False):
        k = tuple(getattr(row, c) for c in key)
        if getattr(row, "op") == delete_op:
            state.pop(k, None)
        else:
            state[k] = (getattr(row, group), getattr(row, value))
    rows = [k + v for k, v in state.items()]
    return pd.DataFrame(rows, columns=list(key) + [group, value])


def brute_view(feed: pd.DataFrame, key, group, value, seq, delete_op="delete"):
    """Re-aggregation of the replayed final state — what the IVM must
    equal.  Derived from brute_state so the replay exists ONCE."""
    st = brute_state(feed, key, group, value, seq, delete_op)
    if len(st) == 0:
        return pd.DataFrame({group: [], "n_rows": [], "sum_value": []})
    return st.groupby(group, as_index=False).agg(
        n_rows=(value, "size"), sum_value=(value, "sum")
    )


def _norm(df: pd.DataFrame, group: str) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(group).reset_index(drop=True)


def synth_feed(seed: int, n_keys: int = 40, n_ops: int = 400) -> pd.DataFrame:
    """Deterministic mixed insert/update/delete feed with delete-reinsert
    chains, deletes of absent keys, and multiple groups per key history."""
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n_ops)
    groups = rng.choice(["a", "b", "c", "d"], n_ops)
    vals = rng.integers(-50, 500, n_ops).astype(np.int64)
    ops = np.where(rng.random(n_ops) < 0.25, "delete", "insert")
    return pd.DataFrame(
        {
            "k": keys.astype(np.int64),
            "g": groups,
            "v": vals,
            "op": ops,
            "seq": np.arange(n_ops, dtype=np.int64),
        }
    )


class TestIvmDeltas:
    @pytest.mark.parametrize("seed", [1, 7, 31])
    def test_view_matches_brute_force_replay(self, ray_session, seed):
        feed = synth_feed(seed)
        ds = rd.from_pandas(feed)
        deltas = changefeed_to_deltas(
            ds, key_cols=("k",), group_col="g", value_col="v",
            seq_cols=("seq",), num_parts=5,
        )
        got = maintained_view(deltas, "g").to_pandas()
        want = brute_view(feed, ("k",), "g", "v", ("seq",))
        pd.testing.assert_frame_equal(_norm(got, "g"), _norm(want, "g"))

    def test_delete_of_absent_key_is_noop_and_empty_groups_drop(self, ray_session):
        feed = pd.DataFrame(
            {
                "k": [1, 1, 2, 3, 3, 9],
                "g": ["a", "a", "b", "c", "c", "z"],
                "v": [10, 0, 5, 7, 0, 0],
                "op": ["insert", "delete", "insert", "insert", "delete", "delete"],
                "seq": np.arange(6, dtype=np.int64),
            }
        )
        ds = rd.from_pandas(feed)
        deltas = changefeed_to_deltas(
            ds, key_cols=("k",), group_col="g", value_col="v",
            seq_cols=("seq",), num_parts=3,
        )
        got = _norm(maintained_view(deltas, "g").to_pandas(), "g")
        # groups a (deleted) and c (deleted) and z (absent-key delete) drop
        assert got["g"].tolist() == ["b"]
        assert got["n_rows"].tolist() == [1]
        assert got["sum_value"].tolist() == [5]

    def test_unsigned_value_column_refused(self, ray_session):
        feed = pd.DataFrame(
            {
                "k": np.array([1, 1], np.int64),
                "g": ["a", "a"],
                "v": np.array([5, 7], np.uint64),
                "op": ["insert", "insert"],
                "seq": np.array([0, 1], np.int64),
            }
        )
        ds = rd.from_arrow(pa.Table.from_pandas(feed, preserve_index=False))
        deltas = changefeed_to_deltas(
            ds, key_cols=("k",), group_col="g", value_col="v",
            seq_cols=("seq",), num_parts=2,
        )
        with pytest.raises(Exception, match="unsigned"):
            deltas.materialize()

    @pytest.mark.parametrize("seed", [3, 13])
    def test_incremental_refresh_equals_full(self, ray_session, seed):
        feed = synth_feed(seed, n_keys=30, n_ops=300)
        cut = 150
        prefix, suffix = feed[feed.seq < cut], feed[feed.seq >= cut]

        d1 = changefeed_to_deltas(
            rd.from_pandas(prefix), key_cols=("k",), group_col="g",
            value_col="v", seq_cols=("seq",), num_parts=4,
        )
        view1 = (
            maintained_view(d1, "g")
            .to_pandas()
            .pipe(pa.Table.from_pandas, preserve_index=False)
        )

        base = brute_state(prefix, ("k",), "g", "v", ("seq",))
        d2 = changefeed_to_deltas(
            rd.from_pandas(suffix), key_cols=("k",), group_col="g",
            value_col="v", seq_cols=("seq",),
            base_state=rd.from_pandas(base), num_parts=4,
        )
        agg2 = pa.Table.from_pandas(
            aggregate_deltas(d2, "g").to_pandas(), preserve_index=False
        )
        refreshed = refresh_view(view1, agg2, "g").to_pandas()
        want = brute_view(feed, ("k",), "g", "v", ("seq",))
        pd.testing.assert_frame_equal(_norm(refreshed, "g"), _norm(want, "g"))


class TestIvmOverCdc:
    def _flat_feed(self, manifest):
        from mysql_binlog_ray.pipelines.cdc import (
            CdcConfig,
            _with_flat_decode,
            decode_changefeed,
            read_event_stream,
        )
        from mysql_binlog_ray.pipelines.queries import _ivm_prep_flat

        cfg = _with_flat_decode(CdcConfig())
        flat = decode_changefeed(
            read_event_stream(manifest), manifest["table_maps"], cfg
        )
        return flat.map_batches(_ivm_prep_flat, batch_format="pyarrow")

    def test_cdc_view_equals_lake_reaggregation(self, ray_session, small_stream):
        from mysql_binlog_ray.pipelines.cdc import CdcConfig, run_to_dataset

        _, _, manifest = small_stream
        feed = self._flat_feed(manifest)
        deltas = changefeed_to_deltas(
            feed, key_cols=("repo", "path"), group_col="lang",
            value_col="content_bytes", seq_cols=("event_seq", "row_seq"),
            num_parts=8,
        )
        got = _norm(
            maintained_view(
                deltas, "lang", count_name="n_files", value_name="content_bytes"
            ).to_pandas(),
            "lang",
        )

        lake = run_to_dataset(manifest, CdcConfig(num_partitions=8)).to_pandas()
        want = (
            lake.assign(content_bytes=lake["content"].str.encode("utf-8").str.len())
            .groupby("lang", as_index=False)
            .agg(n_files=("lang", "size"), content_bytes=("content_bytes", "sum"))
        )
        pd.testing.assert_frame_equal(got, _norm(want, "lang"))

    def test_cdc_incremental_refresh_across_watermark(self, ray_session, small_stream):
        _, _, manifest = small_stream
        feed = self._flat_feed(manifest)
        fdf = feed.to_pandas()
        cut = int(fdf["event_seq"].median())
        prefix = fdf[fdf.event_seq <= cut]
        suffix = fdf[fdf.event_seq > cut]
        keyc = ("repo", "path")

        d1 = changefeed_to_deltas(
            rd.from_pandas(prefix), key_cols=keyc, group_col="lang",
            value_col="content_bytes", seq_cols=("event_seq", "row_seq"),
            num_parts=8,
        )
        view1 = pa.Table.from_pandas(
            maintained_view(
                d1, "lang", count_name="n_files", value_name="content_bytes"
            ).to_pandas(),
            preserve_index=False,
        )
        base = brute_state(
            prefix, keyc, "lang", "content_bytes", ("event_seq", "row_seq")
        )
        d2 = changefeed_to_deltas(
            rd.from_pandas(suffix), key_cols=keyc, group_col="lang",
            value_col="content_bytes", seq_cols=("event_seq", "row_seq"),
            base_state=rd.from_pandas(base), num_parts=8,
        )
        agg2 = pa.Table.from_pandas(
            aggregate_deltas(d2, "lang").to_pandas(), preserve_index=False
        )
        refreshed = _norm(
            refresh_view(
                view1, agg2, "lang", count_name="n_files", value_name="content_bytes"
            ).to_pandas(),
            "lang",
        )
        want = _norm(
            brute_view(
                fdf, keyc, "lang", "content_bytes", ("event_seq", "row_seq")
            ).rename(columns={"n_rows": "n_files", "sum_value": "content_bytes"}),
            "lang",
        )
        pd.testing.assert_frame_equal(refreshed, want)
