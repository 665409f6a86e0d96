"""Tests for the distributed ordered-scan primitives (stages/ordered.py):
bucketed prefix sum, hash-order rank (deterministic training shuffle),
and sequence packing."""

import numpy as np
import pandas as pd
import pytest

from mysql_binlog_ray.stages.ordered import (
    SHUFFLE_SEED,
    bucketed_prefix_sum,
    hash_order_rank,
    pack_sequences,
)
from mysql_binlog_ray.stages.split import splitmix64


def _make_ds(df: pd.DataFrame, n_blocks: int = 5):
    import ray.data as rd

    return rd.from_pandas(df).repartition(n_blocks)


class TestBucketedPrefixSum:
    def test_matches_pandas_cumsum(self, ray_session):
        rng = np.random.default_rng(7)
        keys = rng.permutation(np.arange(1000, dtype=np.int64))
        vals = rng.integers(0, 50, size=1000, dtype=np.int64)
        df = pd.DataFrame({"k": keys, "v": vals})
        out = (
            bucketed_prefix_sum(_make_ds(df), "k", "v", "cum")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        expect = df.sort_values("k").reset_index(drop=True)
        expect["cum"] = expect["v"].cumsum() - expect["v"]
        pd.testing.assert_series_equal(out["cum"], expect["cum"], check_names=False)

    def test_negative_and_extreme_keys(self, ray_session):
        # Keys spanning the full int64 range: the sign-flip bucketing
        # must order negatives before positives with no overflow.
        keys = np.array(
            [-(2**63), -17, -1, 0, 1, 2**62, 2**63 - 1], dtype=np.int64
        )
        vals = np.arange(1, 8, dtype=np.int64)
        df = pd.DataFrame({"k": keys, "v": vals})
        out = (
            bucketed_prefix_sum(_make_ds(df, 3), "k", "v", "cum")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        expect = df.sort_values("k").reset_index(drop=True)
        assert list(out["cum"]) == list(expect["v"].cumsum() - expect["v"])

    def test_forced_many_buckets_equals_one_bucket(self, ray_session):
        # Multi-bucket (pass-1 base offsets actually exercised) must
        # equal the single-bucket answer exactly.
        rng = np.random.default_rng(3)
        keys = rng.permutation(np.arange(500, dtype=np.int64))
        vals = rng.integers(0, 9, size=500, dtype=np.int64)
        df = pd.DataFrame({"k": keys, "v": vals})
        many = (
            bucketed_prefix_sum(_make_ds(df), "k", "v", "cum", n_buckets=37)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        one = (
            bucketed_prefix_sum(_make_ds(df), "k", "v", "cum", n_buckets=1)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(many, one)

    def test_full_range_single_bucket_no_overflow(self, ray_session):
        # span == 2^64 with n_buckets=1 must not overflow the uint64
        # step (the clamp merely splits the top key into its own bucket).
        keys = np.array([-(2**63), 0, 2**63 - 1], dtype=np.int64)
        df = pd.DataFrame({"k": keys, "v": np.array([3, 5, 7], dtype=np.int64)})
        out = (
            bucketed_prefix_sum(_make_ds(df, 2), "k", "v", "cum", n_buckets=1)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert list(out["cum"]) == [0, 3, 8]

    def test_duplicate_keys_rejected(self, ray_session):
        df = pd.DataFrame({"k": [1, 2, 2, 3], "v": [1, 1, 1, 1]})
        with pytest.raises(Exception, match="duplicate"):
            bucketed_prefix_sum(_make_ds(df, 1), "k", "v").to_pandas()

    def test_empty_input(self, ray_session):
        df = pd.DataFrame(
            {"k": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}
        )
        out = bucketed_prefix_sum(_make_ds(df, 1), "k", "v", "cum")
        assert out.count() == 0
        # Ray's to_pandas drops columns on zero-row datasets; the
        # Dataset schema is the real contract.
        assert out.schema().names == ["k", "v", "cum"]


class TestHashOrderRank:
    def test_is_permutation_and_matches_local_argsort(self, ray_session):
        ids = np.arange(0, 700, dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids})
        out = (
            hash_order_rank(_make_ds(df), "doc_id", seed=SHUFFLE_SEED)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pos = out["position"].to_numpy()
        assert sorted(pos) == list(range(700))
        h = splitmix64(ids.astype(np.uint64) + np.uint64(SHUFFLE_SEED))
        expect = np.empty(len(ids), dtype=np.int64)
        expect[np.argsort(h, kind="stable")] = np.arange(len(ids))
        assert (pos == expect).all()

    def test_layout_invariant(self, ray_session):
        # Same permutation regardless of block layout.
        ids = np.arange(100, 400, dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids})
        a = (
            hash_order_rank(_make_ds(df, 1), "doc_id")
            .to_pandas()
            .sort_values("doc_id")["position"]
            .to_numpy()
        )
        b = (
            hash_order_rank(_make_ds(df, 13), "doc_id")
            .to_pandas()
            .sort_values("doc_id")["position"]
            .to_numpy()
        )
        assert (a == b).all()

    def test_different_seed_different_order(self, ray_session):
        ids = np.arange(0, 300, dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids})
        a = (
            hash_order_rank(_make_ds(df), "doc_id", seed=1)
            .to_pandas()
            .sort_values("doc_id")["position"]
            .to_numpy()
        )
        b = (
            hash_order_rank(_make_ds(df), "doc_id", seed=2)
            .to_pandas()
            .sort_values("doc_id")["position"]
            .to_numpy()
        )
        assert not (a == b).all()
        assert sorted(a) == sorted(b) == list(range(300))


class TestHashOrderRankEmpty:
    def test_empty_input_keeps_id_column(self, ray_session):
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        out = hash_order_rank(_make_ds(df, 1), "doc_id")
        assert out.count() == 0
        assert set(out.schema().names) == {"doc_id", "position"}


class TestPackSequences:
    def test_offsets_and_slots(self, ray_session):
        # docs of known token counts in id order: 5, 10, 1020, 3, 2048
        df = pd.DataFrame(
            {"doc_id": [0, 1, 2, 3, 4], "n_tokens": [5, 10, 1020, 3, 2048]}
        )
        out = (
            pack_sequences(_make_ds(df, 2), seq_len=1024)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["tok_start"]) == [0, 5, 15, 1035, 1038]
        assert list(out["seq_first"]) == [0, 0, 0, 1, 1]
        # doc 2 spans tokens [15, 1035) -> sequences 0..1; doc 4 spans
        # [1038, 3086) -> sequences 1..3
        assert list(out["seq_last"]) == [0, 0, 1, 1, 3]


class TestCorpusPipelineComposition:
    def test_invariants_at_sf001(self, ray_session):
        """The composed gate->dedup->shuffle->pack pipeline (exact parity
        is the driver oracle's job — this guards the structural
        invariants): positions are a permutation, offsets are the
        exclusive prefix sum in position order, sequences are
        contiguous."""
        from mysql_binlog_ray.pipelines.queries import corpus_pipeline_documents

        out = (
            corpus_pipeline_documents("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("position")
            .reset_index(drop=True)
        )
        n = len(out)
        assert n > 0, "gate kept nothing — composition is a no-op"
        assert out["position"].tolist() == list(range(n))
        assert out["doc_id"].is_unique
        # exclusive prefix sum in shuffle order
        expect = np.concatenate([[0], np.cumsum(out["n_tokens"].to_numpy())[:-1]])
        assert out["tok_start"].to_numpy().tolist() == expect.tolist()
        assert (out["seq_first"] <= out["seq_last"]).all()
        assert (
            out["seq_first"].to_numpy() == out["tok_start"].to_numpy() // 1024
        ).all()
