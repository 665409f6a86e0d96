"""SCD2 history, as-of snapshots, distinct aggregates, moment-based
correlation, and two-pass exact global percentiles: SQL-semantics edge
cases the sf testdata doesn't exercise — NULL keys/values, empty
snapshots, constant columns (zero variance), negative values crossing
coarse-bucket boundaries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mysql_binlog_ray.stages.relational import (
    exact_global_percentiles,
    grouped_corr,
    grouped_count_distinct,
)
from mysql_binlog_ray.stages.window import asof_snapshots, scd2_history


def _sorted_df(x, cols=None):
    if isinstance(x, rd.Dataset):
        x = x.to_pandas()
    elif isinstance(x, pa.Table):
        x = x.to_pandas()
    cols = cols or sorted(x.columns)
    return x.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)


def _events_df(n=500, n_keys=23, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": pd.array(
                [None if x < 5 else int(x % n_keys) for x in rng.integers(0, 100, n)],
                dtype="Int64",
            ),
            "o": np.arange(n, dtype=np.int64),
            "payload": rng.integers(0, 1000, n),
        }
    )


class TestScd2History:
    def test_matches_duckdb_lead(self, ray_session):
        df = _events_df()
        ds = rd.from_pandas(df).repartition(7)
        got = _sorted_df(scd2_history(ds, "k", "o"))
        con = duckdb.connect()
        con.register("t", df)
        exp = _sorted_df(
            con.execute(
                """
                SELECT k, o, payload,
                       COALESCE(CAST(lead(o) OVER w AS BIGINT), -1) AS valid_to,
                       CAST(CASE WHEN lead(o) OVER w IS NULL THEN 1 ELSE 0 END
                            AS BIGINT) AS is_current
                FROM t WINDOW w AS (PARTITION BY k ORDER BY o)
                """
            ).fetchdf()
        )
        got["k"] = got["k"].astype("Int64")
        exp["k"] = exp["k"].astype("Int64")
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_one_current_row_per_key(self, ray_session):
        df = _events_df(200, 11)
        out = scd2_history(rd.from_pandas(df), "k", "o").to_pandas()
        cur = out[out["is_current"] == 1]
        # exactly one current version per key (incl. the NULL-key group)
        assert len(cur) == df["k"].nunique(dropna=False)
        assert (cur["valid_to"] == -1).all()
        # non-current rows chain: valid_to == the key's next valid_from
        chained = out.sort_values(["k", "o"])
        nxt = chained.groupby("k", dropna=False)["o"].shift(-1)
        expect = nxt.fillna(-1).astype(np.int64)
        assert (chained["valid_to"].to_numpy() == expect.to_numpy()).all()


class TestAsofSnapshots:
    def test_matches_duckdb_per_watermark(self, ray_session):
        df = _events_df(400, 17)
        wms = [50, 200, 10_000]
        ds = rd.from_pandas(df).repartition(5)
        got = _sorted_df(asof_snapshots(ds, "k", "o", wms))
        con = duckdb.connect()
        con.register("t", df)
        exp = _sorted_df(
            con.execute(
                """
                WITH w AS (SELECT unnest([50, 200, 10000]) AS watermark),
                r AS (
                  SELECT CAST(w.watermark AS BIGINT) AS watermark, t.*,
                         row_number() OVER (PARTITION BY w.watermark, t.k
                                            ORDER BY t.o DESC) AS rn
                  FROM t JOIN w ON t.o <= w.watermark)
                SELECT watermark, k, o, payload FROM r WHERE rn = 1
                """
            ).fetchdf()
        )
        got["k"] = got["k"].astype("Int64")
        exp["k"] = exp["k"].astype("Int64")
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_keys_absent_before_watermark(self, ray_session):
        df = pd.DataFrame({"k": [1, 2], "o": np.array([100, 5], dtype=np.int64)})
        out = asof_snapshots(rd.from_pandas(df), "k", "o", [10, 1000]).to_pandas()
        at10 = out[out["watermark"] == 10]
        assert set(at10["k"]) == {2}  # key 1 doesn't exist yet at wm=10
        at1000 = out[out["watermark"] == 1000]
        assert set(at1000["k"]) == {1, 2}


class TestGroupedCountDistinct:
    def test_matches_pandas_nunique(self, ray_session):
        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], 1000),
                "u": rng.integers(0, 40, 1000),
            }
        )
        ds = rd.from_pandas(df).repartition(9)
        got = (
            grouped_count_distinct(ds, ["g"], "u", "n_users", total_col="n_events")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        exp = (
            df.groupby("g")
            .agg(n_users=("u", "nunique"), n_events=("u", "size"))
            .reset_index()
        )
        assert (got["n_users"].to_numpy() == exp["n_users"].to_numpy()).all()
        assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()


class TestGroupedCorr:
    def test_matches_numpy_corrcoef(self, ray_session):
        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "g": rng.choice(["x", "y"], 2000),
                "a": rng.integers(0, 50, 2000),
            }
        )
        df["b"] = df["a"] * 2 + rng.integers(0, 30, 2000)
        ds = rd.from_pandas(df).repartition(8)
        got = grouped_corr(ds, ["g"], "a", "b").to_pandas().set_index("g")
        for g, sub in df.groupby("g"):
            ref = np.corrcoef(sub["a"], sub["b"])[0, 1]
            assert abs(got.loc[g, "corr"] - ref) < 1e-12
            assert abs(got.loc[g, "avg_x"] - sub["a"].mean()) < 1e-12

    def test_constant_side_yields_null(self, ray_session):
        df = pd.DataFrame({"g": ["c"] * 10, "a": [7] * 10, "b": range(10)})
        got = grouped_corr(rd.from_pandas(df), ["g"], "a", "b").to_pandas()
        assert got["corr"].isna().all()

    def test_null_rows_dropped_pairwise(self, ray_session):
        df = pd.DataFrame(
            {
                "g": ["z"] * 6,
                "a": pd.array([1, 2, None, 4, 5, 6], dtype="Int64"),
                "b": pd.array([2, 4, 6, None, 10, 12], dtype="Int64"),
            }
        )
        got = grouped_corr(rd.from_pandas(df), ["g"], "a", "b").to_pandas()
        assert got["n"].iloc[0] == 4  # both-non-null pairs only
        assert abs(got["corr"].iloc[0] - 1.0) < 1e-12


class TestExactGlobalPercentiles:
    @staticmethod
    def _rank_pick(vals, q):
        s = np.sort(vals)
        r = max(0, int(np.ceil(q * len(s) - 1e-9)) - 1)
        return int(s[r])

    def test_matches_sorted_pick_with_negatives(self, ray_session):
        rng = np.random.default_rng(9)
        vals = rng.integers(-500_000, 500_000, 20_000).astype(np.int64)
        df = pd.DataFrame({"v": vals})
        ds = rd.from_pandas(df).repartition(11)
        qs = [0.01, 0.5, 0.95, 0.999]
        out = exact_global_percentiles(ds, "v", qs, coarse_shift=8).to_pandas()
        for q, v in zip(out["q"], out["v"]):
            assert v == self._rank_pick(vals, q), q

    def test_nulls_ignored_and_tiny_input(self, ray_session):
        df = pd.DataFrame({"v": pd.array([5, None, 1, 3], dtype="Int64")})
        out = exact_global_percentiles(
            rd.from_pandas(df), "v", [0.5, 1.0], coarse_shift=4
        ).to_pandas()
        assert list(out["v"]) == [3, 5]

    def test_all_null_returns_null_row(self, ray_session):
        df = pd.DataFrame({"v": pd.array([None, None], dtype="Int64")})
        out = exact_global_percentiles(
            rd.from_pandas(df), "v", [0.5], coarse_shift=4
        ).to_pandas()
        assert len(out) == 1 and out["v"].isna().all()


class TestGroupedCountDistinctNulls:
    def test_null_distinct_values_match_sql(self, ray_session):
        df = pd.DataFrame(
            {
                "g": ["a"] * 5 + ["b"] * 3,
                "u": pd.array([1, 1, 2, None, None, None, None, None], dtype="Int64"),
            }
        )
        ds = rd.from_pandas(df).repartition(3)
        got = (
            grouped_count_distinct(ds, ["g"], "u", "n_users", total_col="n_events")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            "SELECT g, count(DISTINCT u) AS n_users, count(*) AS n_events "
            "FROM t GROUP BY g ORDER BY g"
        ).fetchdf()
        assert list(got["n_users"]) == list(exp["n_users"])  # [2, 0]
        assert list(got["n_events"]) == list(exp["n_events"])  # [5, 3]

    def test_null_fill_collision_stays_distinct(self, ray_session):
        # a genuine 0 value and a NULL must not merge into one pair
        df = pd.DataFrame(
            {"g": ["a"] * 3, "u": pd.array([0, None, 0], dtype="Int64")}
        )
        got = grouped_count_distinct(
            rd.from_pandas(df), ["g"], "u", "n_users", total_col="n_events"
        ).to_pandas()
        assert got["n_users"].iloc[0] == 1 and got["n_events"].iloc[0] == 3


class TestTfidfStringId:
    def test_string_id_column(self, ray_session):
        from mysql_binlog_ray.stages.text import tfidf_top_terms

        df = pd.DataFrame(
            {
                "key": ["d1", "d2", "d3"],
                "text": ["apple banana apple", "banana cherry", ""],
            }
        )
        out = tfidf_top_terms(
            rd.from_pandas(df), n_docs=3, id_col="key", k=2, id_type="string"
        ).to_pandas()
        assert out["key"].dtype == object or str(out["key"].dtype) == "string"
        top_d1 = out[out["key"] == "d1"].sort_values("score", ascending=False)
        assert top_d1["term"].iloc[0] == "apple"


class TestScd2OnCdcChangefeed:
    def test_current_versions_equal_final_state(self, ray_session, tmp_path):
        """scd2_history applied to the REAL decoded changefeed (composite
        merge key, (event_seq, row_seq) version order): the is_current &
        non-delete rows must be exactly the replay oracle's live keys
        with their final content."""
        from mysql_binlog_ray.fixtures.generator import (
            StreamSpec,
            final_state_oracle,
            generate_stream,
        )
        from mysql_binlog_ray.pipelines.cdc import (
            CdcConfig,
            decode_changefeed,
            read_event_stream,
        )
        from mysql_binlog_ray.stages.merge import flatten_changefeed
        from mysql_binlog_ray.stages.window import scd2_history

        spec = StreamSpec(n_keys=120, n_ops=600, n_shards=2)
        m = generate_stream(spec, str(tmp_path / "stream"))
        cfg = CdcConfig()
        cf = decode_changefeed(read_event_stream(m, None), m["table_maps"], cfg)

        def flat_with_order(b: pa.Table) -> pa.Table:
            f = flatten_changefeed(b, cfg.key_cols)
            seq = f.column("event_seq").to_numpy().astype(np.int64)
            rs = f.column("row_seq").to_numpy().astype(np.int64)
            return f.append_column("ver", pa.array((seq << 20) | rs))

        flat = cf.map_batches(flat_with_order, batch_format="pyarrow")
        hist = scd2_history(flat, list(cfg.key_cols), "ver").to_pandas()

        cur = hist[(hist["is_current"] == 1) & (hist["op"] != "delete")]
        got = (
            cur[["repo", "path", "commit", "lang", "content", "stars"]]
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        orc = (
            final_state_oracle(spec, str(tmp_path / "stream"))
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        import hashlib

        got = got.assign(
            content_sha256=got["content"].map(
                lambda s: hashlib.sha256(s.encode()).hexdigest()
            ),
            stars=got["stars"].astype("float64"),
        ).drop(columns=["content"])
        orc = orc[["repo", "path", "commit", "lang", "content_sha256", "stars"]]
        orc = orc.assign(stars=orc["stars"].astype("float64"))
        got = got[["repo", "path", "commit", "lang", "content_sha256", "stars"]]
        pd.testing.assert_frame_equal(got, orc, check_dtype=False)

        # every key's history chains: valid_to == next version's ver
        chained = hist.sort_values(["repo", "path", "ver"])
        nxt = chained.groupby(["repo", "path"], dropna=False)["ver"].shift(-1)
        assert (
            chained["valid_to"].to_numpy() == nxt.fillna(-1).astype(np.int64).to_numpy()
        ).all()


class TestAsofSnapshotsCompositeKeys:
    """Composite and NULL-component keys for asof_snapshots — pinned
    against DuckDB's per-watermark row_number pick."""

    def _df(self):
        rng = np.random.default_rng(9)
        return pd.DataFrame(
            {
                "k1": pd.array(
                    [None if x < 8 else int(x % 5) for x in rng.integers(0, 100, 300)],
                    dtype="Int64",
                ),
                "k2": [("a", "b", None)[x % 3] for x in range(300)],
                "o": np.arange(300, dtype=np.int64),
                "payload": rng.integers(0, 1000, 300),
            }
        )

    def test_matches_duckdb_multi_watermark(self, ray_session):
        df = self._df()
        ds = rd.from_pandas(df).repartition(5)
        got = _sorted_df(asof_snapshots(ds, ["k1", "k2"], "o", [50, 170, 999]))
        con = duckdb.connect()
        con.register("t", df)
        exp = _sorted_df(
            con.execute(
                """
                SELECT w AS watermark, k1, k2, o, payload FROM (
                  SELECT t.*, wm.w,
                         row_number() OVER (PARTITION BY wm.w, k1, k2
                                            ORDER BY o DESC) AS rn
                  FROM t JOIN (VALUES (50), (170), (999)) wm(w) ON t.o <= wm.w
                ) WHERE rn = 1
                """
            ).df()
        )
        got = got.astype({"k1": "float64", "payload": "int64", "watermark": "int64"})
        exp = exp.astype({"k1": "float64", "payload": "int64", "watermark": "int64"})
        pd.testing.assert_frame_equal(got, exp)


class TestResampleFill:
    def test_gaps_filled_and_counts_exact(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from mysql_binlog_ray.stages.window import resample_fill

        base = pd.Timestamp("2025-01-01 00:30:00")
        rows = [
            # type a: hours 0, 0, 3 (gap at 1, 2); type b: hour 2 only
            {"ts": base, "event_type": "a"},
            {"ts": base + pd.Timedelta(minutes=5), "event_type": "a"},
            {"ts": base + pd.Timedelta(hours=3), "event_type": "a"},
            {"ts": base + pd.Timedelta(hours=2), "event_type": "b"},
        ]
        ds = rd.from_pandas(pd.DataFrame(rows))
        out = resample_fill(ds, unit_sec=3600).to_pandas()
        out = out.sort_values(["event_type", "bucket"]).reset_index(drop=True)
        h0 = int(base.value // (3600 * 10**9))
        assert len(out) == 8  # 2 groups x 4 dense hours
        a = out[out["event_type"] == "a"]["n"].tolist()
        b = out[out["event_type"] == "b"]["n"].tolist()
        assert a == [2, 0, 0, 1]
        assert b == [0, 0, 1, 0]
        assert out["bucket"].min() == h0 and out["bucket"].max() == h0 + 3

    def test_empty_input(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from mysql_binlog_ray.stages.window import resample_fill

        ds = rd.from_pandas(
            pd.DataFrame({"ts": pd.Series(dtype="datetime64[us]"),
                          "event_type": pd.Series(dtype="string")})
        )
        out = resample_fill(ds)
        # Ray's to_pandas() drops columns on empty datasets; the typed
        # schema is the contract
        assert out.schema().names == ["event_type", "bucket", "n"]
        assert out.count() == 0
