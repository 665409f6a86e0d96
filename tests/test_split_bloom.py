"""Tests for deterministic splitting/chunking (stages/split.py) and the
Bloom filter + incremental reference-corpus dedup (stages/sketches.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mysql_binlog_ray.stages.sketches import (
    BloomFilter,
    _bloom_hash_strings,
    build_bloom,
    incremental_dedup,
)
from mysql_binlog_ray.stages.split import (
    SPLIT_BUCKETS,
    chunk_documents,
    hash_split,
    hash_split_sql,
    splitmix64,
    splitmix64_sql,
)


class TestSplitmix64:
    def test_reference_vector(self):
        # Published splitmix64 test vector (seed state 0 -> first output):
        # e.g. used as the seeding PRNG in the xoshiro reference code.
        assert int(splitmix64(np.array([0], dtype=np.uint64))[0]) == 0xE220A8397B1DCDAF

    def test_sql_parity_mod_buckets(self):
        duckdb = pytest.importorskip("duckdb")
        con = duckdb.connect()
        xs = np.concatenate(
            [
                np.arange(0, 500, dtype=np.uint64),
                np.array([2**31, 2**40 + 17, 2**62, 2**63 - 1], dtype=np.uint64),
            ]
        )
        for seed in (0, 7, 12345):
            sql = splitmix64_sql("x", seed)
            lst = ",".join(str(int(v)) for v in xs)
            got = (
                con.execute(
                    f"SELECT CAST({sql} % {SPLIT_BUCKETS} AS BIGINT) AS h "
                    f"FROM (SELECT unnest([{lst}]) AS x)"
                )
                .fetchdf()["h"]
                .to_numpy()
            )
            with np.errstate(over="ignore"):
                exp = (
                    splitmix64(xs + np.uint64(seed)) % np.uint64(SPLIT_BUCKETS)
                ).astype(np.int64)
            assert (got == exp).all()


class TestHashSplit:
    def test_fractions_and_stability(self, ray_session):
        import ray.data as rd

        n = 20_000
        ds = rd.from_pandas(pd.DataFrame({"k": np.arange(n, dtype=np.int64)}))
        out = hash_split(ds, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
        df = out.to_pandas()
        counts = df["split"].value_counts()
        # binomial tolerance: ~4 sigma
        assert abs(counts["train"] - 0.8 * n) < 4 * np.sqrt(n * 0.8 * 0.2)
        assert abs(counts["val"] - 0.1 * n) < 4 * np.sqrt(n * 0.1 * 0.9)
        # stability: a grown corpus never reassigns an existing key
        ds2 = rd.from_pandas(
            pd.DataFrame({"k": np.arange(2 * n, dtype=np.int64)})
        )
        df2 = (
            hash_split(ds2, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
            .to_pandas()
            .set_index("k")["split"]
        )
        base = df.set_index("k")["split"]
        assert (df2.loc[base.index] == base).all()

    def test_bad_fractions_rejected(self):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"k": [1, 2]}))
        with pytest.raises(ValueError):
            hash_split(ds, "k", {"a": 0.5, "b": 0.49})  # doesn't sum to 1
        with pytest.raises(ValueError):
            hash_split(ds, "k", {"a": 0.33333, "b": 0.66667})  # off-grid
        # the SQL twin validates identically (shared _edges helper)
        with pytest.raises(ValueError):
            hash_split_sql("k", {"a": 0.33333, "b": 0.66667})

    def test_single_label_sql(self):
        duckdb = pytest.importorskip("duckdb")
        sql = hash_split_sql("k", {"all": 1.0})
        got = (
            duckdb.connect()
            .execute(f"SELECT {sql} AS s FROM (SELECT 42 AS k)")
            .fetchone()[0]
        )
        assert got == "all"

    def test_negative_key_rejected(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"k": [-1, 2]}))
        with pytest.raises(Exception):
            hash_split(ds, "k", {"a": 0.5, "b": 0.5}).to_pandas()

    def test_sql_case_matches(self, ray_session):
        duckdb = pytest.importorskip("duckdb")
        import ray.data as rd

        n = 3000
        ds = rd.from_pandas(pd.DataFrame({"k": np.arange(n, dtype=np.int64)}))
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        got = hash_split(ds, "k", fr, seed=7).to_pandas().sort_values("k")
        case = hash_split_sql("k", fr, 7)
        exp = (
            duckdb.connect()
            .execute(
                f"SELECT k, {case} AS split FROM (SELECT unnest(range(0,{n})) AS k)"
            )
            .fetchdf()
            .sort_values("k")
        )
        assert (got["split"].to_numpy() == exp["split"].to_numpy()).all()


class TestChunkDocuments:
    def test_exact_windows(self, ray_session):
        import ray.data as rd

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "",  # 0 chunks
                    None,  # 0 chunks
                    "a" * 10,  # 1 chunk
                    "x" * 512,  # exactly one window
                    "".join(chr(97 + i % 26) for i in range(1000)),  # 3 chunks
                ],
            }
        )
        ds = rd.from_pandas(docs)
        out = (
            chunk_documents(ds, chunk_chars=512, overlap=64)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        assert set(out["doc_id"]) == {3, 4, 5}
        d5 = docs.loc[4, "text"]
        rows5 = out[out["doc_id"] == 5]
        # stride 448: starts 0, 448, 896; len(text)=1000 -> ceil(936/448)=3
        assert list(rows5["chunk_idx"]) == [0, 1, 2]
        assert list(rows5["chunk_text"]) == [d5[0:512], d5[448:960], d5[896:1000]]
        assert out[out["doc_id"] == 4]["chunk_text"].iloc[0] == "x" * 512

    def test_no_overlap(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["ab" * 300]}))
        out = chunk_documents(ds, chunk_chars=100, overlap=0).to_pandas()
        assert len(out) == 6
        assert "".join(out.sort_values("chunk_idx")["chunk_text"]) == "ab" * 300

    def test_overlap_must_be_smaller(self):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError):
            chunk_documents(ds, chunk_chars=10, overlap=10)


class TestBloomFilter:
    def test_no_false_negatives_and_low_fp(self):
        rng = np.random.default_rng(0)
        keys = pd.Series([f"key-{i}" for i in range(5000)])
        other = pd.Series([f"other-{i}" for i in range(5000)])
        bf = BloomFilter(1 << 17, 6)  # ~26 bits/key at n=5000
        h = _bloom_hash_strings(keys)
        bf.add_hashes(h)
        assert bf.contains_hashes(h).all()  # no false negatives, ever
        fp = bf.contains_hashes(_bloom_hash_strings(other)).mean()
        assert fp < 0.01, fp
        del rng

    def test_merge_is_union(self):
        a, b = BloomFilter(1 << 12, 4), BloomFilter(1 << 12, 4)
        ha = _bloom_hash_strings(pd.Series(["a", "b"]))
        hb = _bloom_hash_strings(pd.Series(["c"]))
        a.add_hashes(ha)
        b.add_hashes(hb)
        m = a.merge(b)
        assert m.contains_hashes(np.concatenate([ha, hb])).all()

    def test_roundtrip_bytes(self):
        bf = BloomFilter(1 << 12, 4)
        h = _bloom_hash_strings(pd.Series(["x", "y", "z"]))
        bf.add_hashes(h)
        bf2 = BloomFilter.from_bytes(bf.to_bytes(), 4)
        assert bf2.m == bf.m and bf2.contains_hashes(h).all()

    def test_build_bloom_distributed(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"t": [f"doc {i}" for i in range(2000)]})
        bf = build_bloom(rd.from_pandas(df).repartition(8), "t", 1 << 16, 6)
        assert bf.contains_hashes(_bloom_hash_strings(df["t"])).all()


class TestIncrementalDedup:
    def test_exact_survivors(self, ray_session):
        import ray.data as rd

        corpus = pd.DataFrame(
            {"doc_id": np.arange(100), "text": [f"c{i % 60}" for i in range(100)]}
        )
        new = pd.DataFrame(
            {
                "doc_id": np.arange(1000, 1080),
                # half collide with the corpus texts, half are new
                "text": [f"c{i}" if i < 40 else f"n{i}" for i in range(80)],
            }
        )
        out = incremental_dedup(
            rd.from_pandas(new).repartition(4),
            rd.from_pandas(corpus).repartition(4),
            text_col="text",
        ).to_pandas()
        # c0..c39 all exist in the corpus (c0..c59) -> dropped; n40.. survive
        exp = new[new["text"].str.startswith("n")]
        assert sorted(out["doc_id"]) == sorted(exp["doc_id"])
        assert sorted(out.columns) == sorted(new.columns)

    def test_tiny_filter_fp_still_exact(self, ray_session):
        """With an absurdly small filter (every probe a maybe), the exact
        confirm pass must still produce the exact answer."""
        import ray.data as rd

        corpus = pd.DataFrame({"doc_id": [0, 2], "text": ["dup", "other"]})
        new = pd.DataFrame(
            {"doc_id": [1, 3, 5], "text": ["dup", "fresh", "fresh2"]}
        )
        out = incremental_dedup(
            rd.from_pandas(new),
            rd.from_pandas(corpus),
            text_col="text",
            m_bits=64,
            k=2,
        ).to_pandas()
        assert sorted(out["doc_id"]) == [3, 5]

    def test_null_text_treated_as_empty(self, ray_session):
        """NULL text is '' on both engine and oracle sides: a NULL-text
        new row dups against an empty-text corpus row."""
        import ray.data as rd

        corpus = pd.DataFrame({"doc_id": [0], "text": [""]})
        new = pd.DataFrame({"doc_id": [1, 3], "text": [None, "keep"]})
        out = incremental_dedup(
            rd.from_pandas(new), rd.from_pandas(corpus), text_col="text"
        ).to_pandas()
        assert sorted(out["doc_id"]) == [3]

    def test_empty_new_side(self, ray_session):
        import ray.data as rd

        corpus = pd.DataFrame({"doc_id": [0], "text": ["x"]})
        new = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype="object")})
        out = incremental_dedup(
            rd.from_pandas(new), rd.from_pandas(corpus)
        ).to_pandas()
        assert len(out) == 0


class TestWeightedBernoulliSample:
    """Integer-exact weight-proportional sampling: boundary semantics
    and bit-parity with a per-row big-int reference."""

    def _run(self, df, denom, seed=7):
        import ray.data as rd

        from mysql_binlog_ray.stages.split import weighted_bernoulli_sample

        out = weighted_bernoulli_sample(
            rd.from_pandas(df), "k", "w", denom, seed=seed
        ).to_pandas()
        return sorted(out["k"])

    def test_matches_bigint_reference(self):
        from mysql_binlog_ray.stages.split import splitmix64

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "k": np.arange(5000, dtype=np.int64),
                "w": rng.integers(0, 900, 5000).astype(np.int64),
            }
        )
        denom = 600
        h = splitmix64(df["k"].to_numpy().astype(np.uint64) + np.uint64(7))
        exp = [
            int(k)
            for k, w, hh in zip(df["k"], df["w"], h)
            if int(hh) * denom < int(w) << 64
        ]
        assert self._run(df, denom) == exp

    def test_weight_ge_denom_always_kept_zero_never(self):
        df = pd.DataFrame(
            {"k": np.arange(50, dtype=np.int64),
             "w": np.array([0, 600, 601, 10**9] * 12 + [0, 600], np.int64)}
        )
        kept = self._run(df, 600)
        assert all(int(k) in kept for k in df.loc[df["w"] >= 600, "k"])
        assert not any(int(k) in kept for k in df.loc[df["w"] == 0, "k"])

    def test_sql_twin_agrees(self):
        import duckdb

        from mysql_binlog_ray.stages.split import weighted_bernoulli_sample_sql

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 2**62, 800).astype(np.int64),
                "w": rng.integers(0, 1200, 800).astype(np.int64),
            }
        )
        pred = weighted_bernoulli_sample_sql("k", "w", 600, seed=7)
        exp = sorted(duckdb.sql(f"SELECT k FROM df WHERE {pred}").df()["k"])
        assert self._run(df, 600) == [int(x) for x in exp]

    def test_rejects_bad_inputs(self):
        import pytest

        df = pd.DataFrame({"k": np.array([-1], np.int64), "w": np.array([5], np.int64)})
        with pytest.raises(Exception, match=">= 0"):
            self._run(df, 600)
        with pytest.raises(ValueError, match="denom"):
            self._run(pd.DataFrame({"k": [1], "w": [1]}), 0)


class TestMixtureSample:
    def _docs(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.arange(2000, dtype=np.int64),
                "lang": np.tile(["en", "zh", "fr", None], 500),
            }
        )

    def test_matches_sql_twin_including_null_group(self):
        import duckdb

        from mysql_binlog_ray.stages.split import mixture_sample, mixture_sample_sql

        df = self._docs()
        rates = {"en": 0.9, "zh": 0.5}
        got = (
            mixture_sample(rd.from_pandas(df), "doc_id", "lang", rates, 0.25)
            .to_pandas()["doc_id"].sort_values().tolist()
        )
        pred = mixture_sample_sql("doc_id", "lang", rates, 0.25)
        exp = (
            duckdb.sql(f"SELECT doc_id FROM df WHERE {pred} ORDER BY doc_id")
            .df()["doc_id"].tolist()
        )
        assert got == exp and 0 < len(got) < len(df)

    def test_rates_roughly_respected_and_key_stable(self):
        from mysql_binlog_ray.stages.split import mixture_sample

        df = self._docs()
        out = mixture_sample(
            rd.from_pandas(df), "doc_id", "lang", {"en": 0.9, "zh": 0.5}, 0.25
        ).to_pandas()
        frac = out.groupby("lang").size() / df.groupby("lang").size()
        assert abs(frac["en"] - 0.9) < 0.1
        assert abs(frac["zh"] - 0.5) < 0.1
        # key-stability: running on a PREFIX yields a prefix-consistent set
        sub = mixture_sample(
            rd.from_pandas(df.head(500)), "doc_id", "lang", {"en": 0.9, "zh": 0.5}, 0.25
        ).to_pandas()
        assert set(sub["doc_id"]) == {d for d in out["doc_id"] if d < 500}

    def test_rejects_off_grid_rate(self):
        from mysql_binlog_ray.stages.split import mixture_sample

        with pytest.raises(ValueError, match="multiple"):
            mixture_sample(
                rd.from_pandas(self._docs()), "doc_id", "lang", {"en": 0.33333}
            )
