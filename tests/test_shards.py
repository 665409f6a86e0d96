"""Tests for the training-shard writer (pipelines/shards.py): shard
assignment vs a local prefix-sum oracle, atomic resume, param-change
rewrite, and read-back ordering."""

import os

import numpy as np
import pandas as pd
import pytest

from mysql_binlog_ray.pipelines.shards import (
    read_training_shards,
    shard_manifest,
    write_training_shards,
)
from mysql_binlog_ray.stages.split import splitmix64


def _docs(n=200, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_tokens": rng.integers(1, 400, size=n, dtype=np.int64),
        }
    )


def _expected(df, seq_len, seqs_per_shard, seed=13):
    h = splitmix64(df["doc_id"].to_numpy().astype(np.uint64) + np.uint64(seed))
    order = np.argsort(h, kind="stable")
    tok = df["n_tokens"].to_numpy()[order]
    start = np.cumsum(tok) - tok
    shard = start // (seq_len * seqs_per_shard)
    return pd.DataFrame(
        {"doc_id": df["doc_id"].to_numpy()[order], "shard_id": shard, "n_tokens": tok}
    )


class TestWriteTrainingShards:
    def test_matches_local_oracle_and_files(self, ray_session, tmp_path):
        import ray.data as rd

        df = _docs()
        out = str(tmp_path / "lake")
        summary = write_training_shards(
            rd.from_pandas(df).repartition(7), out, seq_len=64, seqs_per_shard=4
        ).to_pandas()
        exp = _expected(df, 64, 4)
        exp_sum = (
            exp.groupby("shard_id")
            .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
            .reset_index()
        )
        assert list(summary["shard_id"]) == list(exp_sum["shard_id"])
        assert list(summary["n_docs"]) == list(exp_sum["n_docs"])
        assert list(summary["n_tokens"]) == list(exp_sum["n_tokens"])
        assert not summary["skipped"].any()
        # every shard is one atomically-renamed file; contents assign
        # each doc to the oracle's shard, sorted by shuffle key
        for sid in summary["shard_id"]:
            p = os.path.join(out, f"shard={sid:05d}", "data.parquet")
            assert os.path.exists(p)
            got = pd.read_parquet(p)
            want = exp[exp["shard_id"] == sid]["doc_id"].to_numpy()
            assert (got["doc_id"].to_numpy() == want).all()  # shuffle order
        m = shard_manifest(out)
        assert m["n_shards"] == len(summary)
        assert m["total_tokens"] == int(df["n_tokens"].sum())

    def test_resume_skips_complete_shards(self, ray_session, tmp_path):
        import ray.data as rd

        df = _docs(120)
        out = str(tmp_path / "lake")
        write_training_shards(rd.from_pandas(df), out, seq_len=64, seqs_per_shard=4)
        mtimes = {
            d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
            for d in os.listdir(out)
            if d.startswith("shard=")
        }
        s2 = write_training_shards(
            rd.from_pandas(df), out, seq_len=64, seqs_per_shard=4
        ).to_pandas()
        assert s2["skipped"].all()
        for d, t in mtimes.items():
            assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == t

    def test_param_change_forces_rewrite(self, ray_session, tmp_path):
        import ray.data as rd

        df = _docs(80)
        out = str(tmp_path / "lake")
        write_training_shards(rd.from_pandas(df), out, seq_len=64, seqs_per_shard=4)
        s2 = write_training_shards(
            rd.from_pandas(df), out, seq_len=64, seqs_per_shard=8
        ).to_pandas()
        assert not s2["skipped"].any()
        assert shard_manifest(out)["seqs_per_shard"] == 8

    def test_unmanifested_dir_forces_rewrite(self, ray_session, tmp_path):
        # a run that died before committing its params manifest leaves
        # shard files whose params are unknowable: file existence must
        # NOT be trusted, even though the paths match
        import ray.data as rd

        df = _docs(80)
        out = str(tmp_path / "lake")
        write_training_shards(rd.from_pandas(df), out, seq_len=64, seqs_per_shard=4)
        os.remove(os.path.join(out, "_manifest.json"))  # simulate the crash window
        s2 = write_training_shards(
            rd.from_pandas(df), out, seq_len=64, seqs_per_shard=8
        ).to_pandas()
        assert not s2["skipped"].any()
        dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
        assert len(dirs) == len(s2)  # no orphan shards from the dead run

    def test_read_back_round_trip(self, ray_session, tmp_path):
        import ray.data as rd

        df = _docs(100)
        out = str(tmp_path / "lake")
        write_training_shards(rd.from_pandas(df), out, seq_len=64, seqs_per_shard=4)
        back = read_training_shards(out).to_pandas()
        assert sorted(back["doc_id"]) == sorted(df["doc_id"])
        assert "shard" not in back.columns
        assert {"shuffle_key", "tok_start", "n_tokens"} <= set(back.columns)

    def test_empty_input(self, ray_session, tmp_path):
        import ray.data as rd

        out = str(tmp_path / "lake")
        df = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "n_tokens": pd.Series(dtype="int64")}
        )
        summary = write_training_shards(rd.from_pandas(df), out)
        assert summary.num_rows == 0
        assert shard_manifest(out)["n_shards"] == 0
