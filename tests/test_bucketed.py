"""Tests for bucketed storage + shuffle-free joins (stages/bucketed.py)."""

import os

import numpy as np
import pandas as pd
import pytest

from mysql_binlog_ray.stages.bucketed import (
    join_bucketed,
    point_lookup,
    wanted_buckets,
    write_bucketed,
)
from mysql_binlog_ray.state.checkpoint import read_manifest


def _sides(n_orders=60, seed=3):
    rng = np.random.default_rng(seed)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_val": rng.integers(0, 100, n_orders),
        }
    )
    # ~3 items per order, some orders with none
    keys = rng.choice(n_orders + 10, size=n_orders * 3).astype(np.int64)
    items = pd.DataFrame(
        {"l_orderkey": keys, "l_qty": rng.integers(1, 9, len(keys)).astype(np.int64)}
    )
    return orders, items


class TestBucketed:
    def test_write_manifest_and_colocation(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from mysql_binlog_ray.stages.merge import key_hash64

        orders, _ = _sides()
        d = str(tmp_path / "orders")
        m = write_bucketed(rd.from_pandas(orders).repartition(5), d, "o_orderkey", 8)
        assert m["total_rows"] == len(orders)
        assert read_manifest(d)["hash_algo"] == "poly64v2"
        assert m["key_families"] == {"o_orderkey": "integer"}
        # every indexed row group's rows hash to its index entry's bucket,
        # and the index accounts for every input row exactly once
        seen = 0
        for e in m["files"]:
            t = pq.ParquetFile(os.path.join(d, e["path"])).read_row_group(
                e["row_group"]
            )
            codes = key_hash64(t, ("o_orderkey",)) % np.uint64(8)
            assert (codes == e["bucket"]).all()
            assert t.num_rows == e["rows"]
            seen += t.num_rows
        assert seen == len(orders)

    def test_orphan_segment_not_read(self, ray_session, tmp_path):
        # a dead task attempt's segment (on disk, not in the index) must
        # never contribute rows to a join
        import shutil as _sh

        import ray.data as rd

        orders, items = _sides()
        do, di = str(tmp_path / "o"), str(tmp_path / "l")
        write_bucketed(rd.from_pandas(orders), do, "o_orderkey", 8)
        m = write_bucketed(rd.from_pandas(items), di, "l_orderkey", 8)
        # simulate a retried write task: duplicate a segment under a new
        # name AFTER the manifest committed
        seg = m["files"][0]["path"]
        _sh.copy(os.path.join(di, seg), os.path.join(di, "seg-deadattempt.parquet"))
        got = join_bucketed(do, di, "o_orderkey", "l_orderkey").to_pandas()
        want = orders.merge(items, left_on="o_orderkey", right_on="l_orderkey")
        assert len(got) == len(want)

    def test_join_matches_pandas(self, ray_session, tmp_path):
        import ray.data as rd

        orders, items = _sides()
        do, di = str(tmp_path / "o"), str(tmp_path / "l")
        write_bucketed(rd.from_pandas(orders).repartition(4), do, "o_orderkey", 8)
        write_bucketed(rd.from_pandas(items).repartition(6), di, "l_orderkey", 8)
        got = (
            join_bucketed(do, di, "o_orderkey", "l_orderkey", how="inner")
            .to_pandas()
            .sort_values(["o_orderkey", "l_qty"])
            .reset_index(drop=True)
        )
        want = (
            orders.merge(items, left_on="o_orderkey", right_on="l_orderkey")
            .sort_values(["o_orderkey", "l_qty"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_join_with_finish_aggregates_per_key(self, ray_session, tmp_path):
        import ray.data as rd

        orders, items = _sides()
        do, di = str(tmp_path / "o"), str(tmp_path / "l")
        write_bucketed(rd.from_pandas(orders), do, "o_orderkey", 8)
        write_bucketed(rd.from_pandas(items), di, "l_orderkey", 8)

        def fin(j):
            return (
                j.groupby("o_orderkey", sort=False)
                .agg(n=("l_qty", "size"), qty=("l_qty", "sum"))
                .reset_index()
            )

        got = (
            join_bucketed(do, di, "o_orderkey", "l_orderkey", finish=fin)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        want = (
            orders.merge(items, left_on="o_orderkey", right_on="l_orderkey")
            .groupby("o_orderkey", sort=False)
            .agg(n=("l_qty", "size"), qty=("l_qty", "sum"))
            .reset_index()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_empty_side_non_inner_raises(self, ray_session, tmp_path):
        import ray.data as rd

        orders, _ = _sides()
        do, de = str(tmp_path / "o"), str(tmp_path / "e")
        write_bucketed(rd.from_pandas(orders), do, "o_orderkey", 8)
        empty = pd.DataFrame({"l_orderkey": pd.Series(dtype="int64")})
        write_bucketed(rd.from_pandas(empty), de, "l_orderkey", 8)
        # inner: an empty side joins to nothing
        assert join_bucketed(do, de, "o_orderkey", "l_orderkey").count() == 0
        # left: correct output needs the empty side's schema, which an
        # empty lake cannot provide — must refuse, not return 0 rows
        with pytest.raises(ValueError, match="no rows"):
            join_bucketed(do, de, "o_orderkey", "l_orderkey", how="left")

    def test_incompatible_bucketing_rejected(self, ray_session, tmp_path):
        import ray.data as rd

        orders, items = _sides()
        do, di = str(tmp_path / "o"), str(tmp_path / "l")
        write_bucketed(rd.from_pandas(orders), do, "o_orderkey", 8)
        write_bucketed(rd.from_pandas(items), di, "l_orderkey", 16)
        with pytest.raises(ValueError, match="incompatible"):
            join_bucketed(do, di, "o_orderkey", "l_orderkey")

    def test_point_lookup_matches_scan(self, ray_session, tmp_path):
        import ray.data as rd

        orders, _ = _sides(n_orders=200)
        do = str(tmp_path / "o")
        m = write_bucketed(rd.from_pandas(orders).repartition(5), do, "o_orderkey", 32)
        # present keys, a duplicate request, and absent keys
        req = [3, 17, 17, 42, 199, 5000, -1]
        got = (
            point_lookup(do, req)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        want = (
            orders[orders["o_orderkey"].isin(req)]
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want)
        # pruning is real: 5 distinct present keys can touch at most 5 of
        # the 32 buckets (the point of the layout)
        import pyarrow as pa

        probed = wanted_buckets(m, pa.table({"o_orderkey": pa.array(req, pa.int64())}))
        assert len(probed) <= len(set(req))
        assert len(probed) < m["num_buckets"]

    def test_point_lookup_column_pruning_and_int_widening(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        orders, _ = _sides()
        do = str(tmp_path / "o")
        write_bucketed(rd.from_pandas(orders), do, "o_orderkey", 8)
        # int32 probe hashes identically to the stored int64 (both widen
        # to int64 in poly64v2), and pruned columns still filter correctly
        probe = pa.table({"o_orderkey": pa.array([7, 9], pa.int32())})
        got = point_lookup(do, probe, columns=["o_val"]).to_pandas()
        want = orders[orders["o_orderkey"].isin([7, 9])]["o_val"]
        assert sorted(got.columns) == ["o_val"]
        assert sorted(got["o_val"]) == sorted(want)

    def test_point_lookup_family_mismatch_and_misses(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        orders, _ = _sides()
        do = str(tmp_path / "o")
        write_bucketed(rd.from_pandas(orders), do, "o_orderkey", 8)
        # float probe against an int lake would hash to the wrong bucket:
        # refuse rather than silently miss
        with pytest.raises(ValueError, match="hashes as"):
            point_lookup(do, pa.table({"o_orderkey": pa.array([7.0])}))
        # all-absent probe returns an empty result, not an error
        assert point_lookup(do, [100000, 100001]).count() == 0
        # an EMPTY probe list (pa.array([]) infers null type) matches
        # nothing — it must not trip the family guard
        assert point_lookup(do, []).count() == 0
        # a non-empty all-NULL probe is a caller bug, named clearly
        with pytest.raises(ValueError, match="all-NULL"):
            point_lookup(do, pa.table({"o_orderkey": pa.array([None, None])}))

    def test_point_lookup_unoccupied_bucket_keeps_schema(self, ray_session, tmp_path):
        # a probe that prunes to ZERO occupied buckets must still return
        # the lake schema (a schema-less empty dataset crashes column
        # selection in callers)
        import pyarrow as pa
        import ray.data as rd

        orders, _ = _sides()
        d1 = str(tmp_path / "one")
        m1 = write_bucketed(rd.from_pandas(orders.head(1)), d1, "o_orderkey", 64)
        occ = {e["bucket"] for e in m1["files"]}
        probe_val = next(
            v
            for v in range(1000, 5000)
            if not (
                wanted_buckets(
                    m1, pa.table({"o_orderkey": pa.array([v], pa.int64())})
                )
                & occ
            )
        )
        # Ray drops 0-row blocks in to_pandas(), so schema rides on
        # Dataset.schema() — which must NOT be None/empty here
        miss = point_lookup(d1, [probe_val])
        assert miss.count() == 0
        assert miss.schema().names == ["o_orderkey", "o_val"]
        miss_pruned = point_lookup(d1, [probe_val], columns=["o_val"])
        assert miss_pruned.count() == 0
        assert miss_pruned.schema().names == ["o_val"]

    def test_wrong_key_rejected(self, ray_session, tmp_path):
        import ray.data as rd

        orders, _ = _sides()
        do = str(tmp_path / "o")
        write_bucketed(rd.from_pandas(orders), do, "o_orderkey", 8)
        with pytest.raises(ValueError, match="bucketed by"):
            join_bucketed(do, do, "o_val", "o_orderkey")
