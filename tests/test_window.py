"""Window functions (stages/window.py), ROLLUP, TF-IDF, and NTILE:
SQL-semantics edge cases the sf testdata doesn't exercise — NULL keys,
NULL operands, fill-value collisions, more tiles than rows."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mysql_binlog_ray.stages.ordered import ntile_assign, pack_order_key
from mysql_binlog_ray.stages.window import rollup_aggregate, window_over


def _sorted_df(x, cols=None):
    if isinstance(x, rd.Dataset):
        x = x.to_pandas()
    elif isinstance(x, pa.Table):
        x = x.to_pandas()
    cols = cols or sorted(x.columns)
    return (
        x.reindex(cols, axis=1)
        .sort_values(cols)
        .reset_index(drop=True)
    )


class TestWindowOver:
    def test_matches_duckdb_with_null_keys_and_values(self, ray_session):
        rng = np.random.default_rng(7)
        n = 400
        df = pd.DataFrame(
            {
                "k": pd.array(
                    [None if x < 25 else int(x % 7) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
                "o": np.arange(n, dtype=np.int64),  # unique order key
                "v": pd.array(
                    [None if x < 20 else int(x) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
            }
        )
        ds = rd.from_pandas(df).repartition(5)
        out = window_over(
            ds,
            "k",
            ["o"],
            {
                "rn": ("row_number", None),
                "d": ("lag_diff", "v"),
                "rs": ("run_sum", "v"),
            },
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        ora = con.execute(
            """
            SELECT k, o, v,
                   row_number() OVER w AS rn,
                   CAST(v - lag(v) OVER w AS BIGINT) AS d,
                   CAST(sum(v) OVER (PARTITION BY k ORDER BY o
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rs
            FROM t WINDOW w AS (PARTITION BY k ORDER BY o)
            """
        ).df()
        a, b = _sorted_df(out), _sorted_df(ora)
        assert len(a) == len(b) == n
        for c in ["k", "o", "v", "rn", "d", "rs"]:
            av, bv = a[c], b[c]
            assert av.isna().tolist() == bv.isna().tolist(), c
            assert (
                av.fillna(-1).astype("int64").tolist()
                == bv.fillna(-1).astype("int64").tolist()
            ), c

    @pytest.mark.parametrize("off", [1, 2, 5])
    def test_lag_lead_match_duckdb_with_nulls(self, ray_session, off):
        """Raw value shifts: NULL outside the partition, NULL source
        values propagate, offsets can exceed a partition's length, and
        NULL keys form one partition."""
        rng = np.random.default_rng(off)
        n = 300
        df = pd.DataFrame(
            {
                "k": pd.array(
                    # ~4-row partitions so off=5 overruns most of them
                    [None if x < 10 else int(x % 70) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
                "o": np.arange(n, dtype=np.int64),
                "v": pd.array(
                    [None if x < 20 else int(x) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
            }
        )
        ds = rd.from_pandas(df).repartition(5)
        out = window_over(
            ds,
            "k",
            ["o"],
            {"lg": ("lag", "v", off), "ld": ("lead", "v", off)},
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        ora = con.execute(
            f"""
            SELECT k, o, v,
                   lag(v, {off}) OVER w AS lg,
                   lead(v, {off}) OVER w AS ld
            FROM t WINDOW w AS (PARTITION BY k ORDER BY o)
            """
        ).df()
        a, b = _sorted_df(out), _sorted_df(ora)
        assert len(a) == len(b) == n
        for c in ["k", "o", "v", "lg", "ld"]:
            assert a[c].isna().tolist() == b[c].isna().tolist(), c
            assert (
                a[c].fillna(-1).astype("int64").tolist()
                == b[c].fillna(-1).astype("int64").tolist()
            ), c

    def test_lag_default_offset_is_one(self, ray_session):
        df = pd.DataFrame({"k": [1, 1, 1], "o": [1, 2, 3], "v": [10, 20, 30]})
        out = (
            window_over(rd.from_pandas(df), "k", ["o"], {"lg": ("lag", "v")})
            .to_pandas()
            .sort_values("o")
        )
        assert out["lg"].fillna(-1).astype("int64").tolist() == [-1, 10, 20]

    @pytest.mark.parametrize("bad", [0, -1, "x"])
    def test_lag_bad_offset_raises(self, ray_session, bad):
        with pytest.raises(ValueError, match="offset"):
            window_over(
                rd.from_items([{"k": 1, "o": 1, "v": 1}]),
                "k",
                ["o"],
                {"lg": ("lag", "v", bad)},
            )

    @pytest.mark.parametrize("frame", [1, 3, 7])
    def test_moving_sum_matches_duckdb_with_nulls(self, ray_session, frame):
        rng = np.random.default_rng(11)
        n = 300
        df = pd.DataFrame(
            {
                "k": pd.array(
                    [None if x < 20 else int(x % 5) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
                "o": np.arange(n, dtype=np.int64),
                "v": pd.array(
                    [None if x < 30 else int(x) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
            }
        )
        ds = rd.from_pandas(df).repartition(4)
        out = window_over(
            ds, "k", ["o"], {"ms": ("moving_sum", "v", frame)}
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        ora = con.execute(
            f"""
            SELECT k, o, v,
                   CAST(sum(v) OVER (PARTITION BY k ORDER BY o
                        ROWS BETWEEN {frame - 1} PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS ms
            FROM t
            """
        ).df()
        a, b = _sorted_df(out), _sorted_df(ora)
        assert len(a) == len(b) == n
        for c in ["k", "o", "v", "ms"]:
            assert a[c].isna().tolist() == b[c].isna().tolist(), c
            assert (
                a[c].fillna(-1).astype("int64").tolist()
                == b[c].fillna(-1).astype("int64").tolist()
            ), c

    def test_first_last_value_match_duckdb_with_nulls(self, ray_session):
        rng = np.random.default_rng(23)
        n = 250
        df = pd.DataFrame(
            {
                "k": pd.array(
                    [None if x < 15 else int(x % 6) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
                "o": np.arange(n, dtype=np.int64),
                "v": pd.array(
                    [None if x < 35 else int(x) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
            }
        )
        out = window_over(
            rd.from_pandas(df).repartition(4),
            "k",
            ["o"],
            {"fv": ("first_value", "v"), "lv": ("last_value", "v")},
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        ora = con.execute(
            """
            SELECT k, o, v,
                   first_value(v) OVER w AS fv,
                   last_value(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS lv
            FROM t WINDOW w AS (PARTITION BY k ORDER BY o)
            """
        ).df()
        a, b = _sorted_df(out), _sorted_df(ora)
        assert len(a) == len(b) == n
        for c in ["k", "o", "v", "fv", "lv"]:
            assert a[c].isna().tolist() == b[c].isna().tolist(), c
            assert (
                a[c].fillna(-1).astype("int64").tolist()
                == b[c].fillna(-1).astype("int64").tolist()
            ), c

    def test_moving_sum_bad_frame_raises(self, ray_session):
        ds = rd.from_items([{"k": 1, "o": 1, "v": 2}])
        with pytest.raises(ValueError):
            window_over(ds, "k", ["o"], {"x": ("moving_sum", "v")})
        with pytest.raises(ValueError):
            window_over(ds, "k", ["o"], {"x": ("moving_sum", "v", 0)})
        with pytest.raises(ValueError):
            window_over(ds, "k", ["o"], {"x": ("run_sum", "v", 3)})

    def test_empty_input(self, ray_session):
        df = pd.DataFrame(
            {"k": pd.array([], dtype="int64"), "o": pd.array([], dtype="int64")}
        )
        out = window_over(
            rd.from_pandas(df), "k", ["o"], {"rn": ("row_number", None)}
        ).to_pandas()
        assert len(out) == 0

    def test_bad_spec_raises(self, ray_session):
        ds = rd.from_items([{"k": 1, "o": 1}])
        with pytest.raises(ValueError):
            window_over(ds, "k", ["o"], {"x": ("median", "o")})
        with pytest.raises(ValueError):
            window_over(ds, "k", ["o"], {"x": ("row_number", "o")})


class TestRollup:
    def test_real_null_key_distinct_from_rolled(self, ray_session):
        # one real-NULL key value and one ""-valued key: the rollup must
        # keep them apart from each other AND from the rolled level
        df = pd.DataFrame(
            {
                "a": ["x", "x", None, "", "x"],
                "b": ["p", "q", "p", "p", "p"],
                "v": [1, 2, 4, 8, 16],
            }
        )
        out = rollup_aggregate(
            rd.from_pandas(df).repartition(2),
            ["a", "b"],
            {"n": (None, "count"), "s": ("v", "sum")},
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        ora = con.execute(
            """
            SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS lvl,
                   count(*) AS n, CAST(sum(v) AS BIGINT) AS s
            FROM t GROUP BY ROLLUP(a, b)
            """
        ).df()
        a, b = _sorted_df(out), _sorted_df(ora)
        assert len(a) == len(b)
        for c in a.columns:
            assert a[c].isna().tolist() == b[c].isna().tolist(), c
            assert (
                a[c].fillna("//NA//").astype(str).tolist()
                == b[c].fillna("//NA//").astype(str).tolist()
            ), c

    def test_grand_total_only_level(self, ray_session):
        df = pd.DataFrame({"a": ["x"] * 3, "v": [1, 2, 3]})
        out = rollup_aggregate(
            rd.from_pandas(df), ["a"], {"s": ("v", "sum")}
        ).to_pandas()
        assert len(out) == 2  # (x, lvl 0) and (NULL, lvl 1)
        total = out[out["lvl"] == 1]
        assert total["s"].iloc[0] == 6 and total["a"].isna().all()


class TestNtile:
    def test_matches_duckdb_uneven_and_tiny(self, ray_session):
        for n, tiles in [(10, 3), (7, 7), (3, 8), (100, 8)]:
            rng = np.random.default_rng(n)
            df = pd.DataFrame(
                {
                    "id": np.arange(n, dtype=np.int64),
                    "k": rng.integers(0, 5, n).astype(np.int64),
                }
            )
            out = ntile_assign(
                rd.from_pandas(df).repartition(3), ["k", "id"], tiles
            ).to_pandas()
            con = duckdb.connect()
            con.register("t", df)
            ora = con.execute(
                "SELECT id, k, CAST(ntile(?) OVER (ORDER BY k, id) AS BIGINT)"
                " AS tile FROM t",
                [tiles],
            ).df()
            a, b = _sorted_df(out), _sorted_df(ora)
            assert a["tile"].tolist() == b["tile"].tolist(), (n, tiles)

    def test_pack_order_key_overflow_raises(self, ray_session):
        df = pd.DataFrame(
            {"a": np.array([1 << 40], dtype=np.int64), "b": np.array([1 << 40], dtype=np.int64)}
        )
        with pytest.raises(ValueError, match="63 bits"):
            pack_order_key(rd.from_pandas(df), ["a", "b"]).materialize()

    def test_pack_order_key_negative_raises(self, ray_session):
        df = pd.DataFrame({"a": np.array([-1], dtype=np.int64)})
        with pytest.raises(ValueError, match="negative"):
            pack_order_key(rd.from_pandas(df), ["a"]).materialize()


class TestTfidf:
    def test_score_and_ties_match_duckdb(self, ray_session):
        from mysql_binlog_ray.stages.text import tfidf_top_terms

        df = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": [
                    "aa bb aa cc",
                    "bb cc dd",
                    "",  # token-less doc: absent from output
                    None,  # NULL text: treated as ''
                    "aa aa aa zz",
                    "yy zz yy zz",  # equal scores -> term asc tie-break
                ],
            }
        )
        out = tfidf_top_terms(
            rd.from_pandas(df).repartition(3), n_docs=len(df), k=2
        ).to_pandas()
        con = duckdb.connect()
        con.register("documents", df)
        ora = con.execute(
            """
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text,'')),
                                                       '[a-z0-9]+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                         CAST(tf.tf * 6 AS DOUBLE) / df.df AS score
                  FROM tf JOIN df USING (term))
            SELECT doc_id, term, tf, df, score FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
              FROM s) WHERE rn <= 2
            """
        ).df()
        a, b = _sorted_df(out), _sorted_df(ora)
        assert len(a) == len(b)
        assert a["term"].tolist() == b["term"].tolist()
        assert a["score"].tolist() == b["score"].tolist()
        assert 2 not in set(a["doc_id"]) and 3 not in set(a["doc_id"])


class TestWindowPrecision:
    def test_big_int64_exact_with_nulls_present(self, ray_session):
        # nullable int64 > 2^53 must NOT round-trip through float64:
        # consecutive ns-scale values differing by 1 keep exact diffs
        base = 1_600_000_000_000_000_000  # ~1.6e18 ns epoch
        df = pd.DataFrame(
            {
                "k": np.zeros(6, dtype=np.int64),
                "o": np.arange(6, dtype=np.int64),
                "v": pd.array(
                    [base, base + 1, None, base + 3, base + 4, base + 1000],
                    dtype="Int64",
                ),
            }
        )
        out = (
            window_over(
                rd.from_pandas(df),
                "k",
                ["o"],
                {"d": ("lag_diff", "v"), "rs": ("run_sum", "v")},
            )
            .to_pandas()
            .sort_values("o")
            .reset_index(drop=True)
        )
        assert out["d"].tolist() == [pd.NA, 1, pd.NA, pd.NA, 1, 996]
        sums = np.cumsum([base, base + 1, 0, base + 3, base + 4, base + 1000])
        assert out["rs"].astype("int64").tolist() == sums.tolist()

    def test_float_input_col_raises(self, ray_session):
        df = pd.DataFrame(
            {"k": [1], "o": [1], "v": [1.5]}
        )
        with pytest.raises(Exception, match="integer-typed"):
            window_over(
                rd.from_pandas(df), "k", ["o"], {"d": ("lag_diff", "v")}
            ).materialize()


class TestGroupingSets:
    def test_cube_and_explicit_sets_match_duckdb(self, ray_session):
        from mysql_binlog_ray.stages.window import (
            cube_aggregate,
            grouping_sets_aggregate,
        )

        df = pd.DataFrame(
            {
                "a": ["x", "x", None, "y", "y", "x"],
                "b": ["p", "q", "p", "p", None, "p"],
                "v": [1, 2, 4, 8, 16, 32],
            }
        )
        ds = rd.from_pandas(df).repartition(2)
        con = duckdb.connect()
        con.register("t", df)

        out = cube_aggregate(ds, ["a", "b"], {"s": ("v", "sum")}).to_pandas()
        ora = con.execute(
            """
            SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS lvl,
                   CAST(sum(v) AS BIGINT) AS s
            FROM t GROUP BY CUBE(a, b)
            """
        ).df()
        a_, b_ = _sorted_df(out), _sorted_df(ora)
        assert len(a_) == len(b_)
        for c in a_.columns:
            assert (
                a_[c].fillna("//NA//").astype(str).tolist()
                == b_[c].fillna("//NA//").astype(str).tolist()
            ), c

        # explicit sets: (a) and (b) only — no finest, no grand total
        out2 = grouping_sets_aggregate(
            ds, ["a", "b"], {"s": ("v", "sum")},
            [frozenset([0]), frozenset([1])],
        ).to_pandas()
        ora2 = con.execute(
            """
            SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS lvl,
                   CAST(sum(v) AS BIGINT) AS s
            FROM t GROUP BY GROUPING SETS ((a), (b))
            """
        ).df()
        a2, b2 = _sorted_df(out2), _sorted_df(ora2)
        assert len(a2) == len(b2)
        for c in a2.columns:
            assert (
                a2[c].fillna("//NA//").astype(str).tolist()
                == b2[c].fillna("//NA//").astype(str).tolist()
            ), c

    def test_duplicate_sets_raise(self, ray_session):
        from mysql_binlog_ray.stages.window import grouping_sets_aggregate

        ds = rd.from_items([{"a": 1, "v": 1}])
        with pytest.raises(ValueError, match="duplicate"):
            grouping_sets_aggregate(
                ds, ["a"], {"s": ("v", "sum")}, [frozenset(), frozenset()]
            )


class TestSnapshotDiff:
    """snapshot_diff: tombstone (removed) and compare_cols semantics the
    events-table oracle query can't exercise (events has no deletes and
    no value-identical version churn)."""

    def _stream(self):
        # key 1: created then deleted in (w_old, w_new]        -> removed
        # key 2: created after w_old                           -> added
        # key 3: updated with a DIFFERENT value                -> changed
        # key 4: updated with the SAME value (version churn)
        # key 5: untouched                                     -> absent
        # key 6: deleted before w_old, re-created after        -> added
        return pd.DataFrame(
            {
                "k": [1, 1, 2, 3, 3, 4, 4, 5, 6, 6, 6],
                "seq": [10, 25, 30, 11, 26, 12, 27, 13, 5, 8, 28],
                "v": ["a", "a", "b", "c", "C", "d", "d", "e", "f", "f", "F"],
                "del": [False, True, False, False, False, False, False,
                        False, False, True, False],
            }
        )

    def _run(self, **kw):
        from mysql_binlog_ray.stages.window import snapshot_diff

        ds = rd.from_pandas(self._stream())
        out = snapshot_diff(
            ds, "k", "seq", 20, 40, tombstone_col="del", **kw
        ).to_pandas()
        return out.sort_values("k").reset_index(drop=True)

    def test_version_based_change(self, ray_session):
        out = self._run()
        assert dict(zip(out["k"], out["change"])) == {
            1: "removed", 2: "added", 3: "changed", 4: "changed", 6: "added"
        }
        r = out.set_index("k")
        assert pd.isna(r.loc[1, "new_v"]) and r.loc[1, "old_v"] == "a"
        assert pd.isna(r.loc[2, "old_v"]) and r.loc[2, "new_v"] == "b"
        assert (r.loc[3, "old_v"], r.loc[3, "new_v"]) == ("c", "C")
        # key 6 was a tombstone at w_old -> old side absent
        assert pd.isna(r.loc[6, "old_v"]) and r.loc[6, "new_v"] == "F"
        assert int(r.loc[3, "old_seq"]) == 11 and int(r.loc[3, "new_seq"]) == 26

    def test_value_compare_drops_identical_churn(self, ray_session):
        out = self._run(compare_cols=["v"])
        assert dict(zip(out["k"], out["change"])) == {
            1: "removed", 2: "added", 3: "changed", 6: "added"
        }

    def test_rejects_bad_watermarks(self, ray_session):
        from mysql_binlog_ray.stages.window import snapshot_diff

        with pytest.raises(ValueError, match="w_old"):
            snapshot_diff(rd.from_pandas(self._stream()), "k", "seq", 40, 20)


class TestCohortRetention:
    def test_matches_pandas_reference(self):
        from mysql_binlog_ray.stages.window import cohort_retention

        rng = np.random.default_rng(9)
        n = 800
        ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 40 * 86400, n), unit="s"
        )
        df = pd.DataFrame({"user_id": rng.integers(0, 60, n).astype(np.int64), "ts": ts})
        got = (
            cohort_retention(rd.from_pandas(df), "user_id", "ts", period_seconds=604800, num_parts=3)
            .to_pandas()
            .sort_values(["cohort_period", "period_offset"])
            .reset_index(drop=True)
        )
        ref = df.copy()
        ref["p"] = ref["ts"].astype("int64") // (604800 * 10**9)
        ref["cohort_period"] = ref.groupby("user_id")["p"].transform("min")
        ref["period_offset"] = ref["p"] - ref["cohort_period"]
        exp = (
            ref.drop_duplicates(["user_id", "cohort_period", "period_offset"])
            .groupby(["cohort_period", "period_offset"])
            .size()
            .reset_index(name="n_users")
            .astype({"cohort_period": "int64", "period_offset": "int64", "n_users": "int64"})
            .sort_values(["cohort_period", "period_offset"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype({"n_users": "int64"}), exp)

    def test_null_rows_dropped(self):
        from mysql_binlog_ray.stages.window import cohort_retention

        df = pd.DataFrame(
            {
                "user_id": pd.array([1, 1, None, 2], dtype="Int64"),
                "ts": pd.to_datetime(
                    ["2024-01-01", "2024-01-10", "2024-01-02", None]
                ),
            }
        )
        got = cohort_retention(
            rd.from_pandas(df), "user_id", "ts", period_seconds=86400, num_parts=2
        ).to_pandas()
        # user 1 contributes (c,0) and (c,9); null user and null ts drop
        assert int(got["n_users"].sum()) == 2


@pytest.mark.usefixtures("ray_session")
class TestRankKinds:
    def test_rank_and_percent_rank_ties_and_nulls(self):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from mysql_binlog_ray.stages.window import window_over

        df = pd.DataFrame(
            {
                "k": ["a"] * 5 + ["b"] * 3 + [None] * 2,
                "id": range(10),
                "v": pd.array([3, 1, 3, None, 2, 7, 7, 7, 5, None], dtype="Int64"),
            }
        )
        out = (
            window_over(
                rd.from_pandas(df),
                "k",
                ["id"],
                {"rnk": ("rank", "v"), "prnk": ("percent_rank", "v")},
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        exp = con.execute(
            """SELECT id, CAST(RANK() OVER w AS BIGINT) AS rnk,
                      percent_rank() OVER w AS prnk
               FROM df WINDOW w AS (PARTITION BY k ORDER BY v ASC NULLS LAST)
               ORDER BY id"""
        ).fetchdf()
        assert list(out["rnk"].astype("int64")) == list(exp["rnk"])
        assert list(out["prnk"]) == list(exp["prnk"])  # bit-exact

    def test_dense_rank_and_cume_dist_ties_and_nulls(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from mysql_binlog_ray.stages.window import window_over

        rng = np.random.default_rng(3)
        n = 400
        df = pd.DataFrame(
            {
                "k": pd.array(
                    [None if x < 15 else int(x % 7) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
                "id": np.arange(n, dtype=np.int64),
                # few distinct values => dense tie groups
                "v": pd.array(
                    [None if x < 20 else int(x % 5) for x in rng.integers(0, 100, n)],
                    dtype="Int64",
                ),
            }
        )
        out = (
            window_over(
                rd.from_pandas(df).repartition(5),
                "k",
                ["id"],
                {"dr": ("dense_rank", "v"), "cd": ("cume_dist", "v")},
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            """SELECT id, CAST(DENSE_RANK() OVER w AS BIGINT) AS dr,
                      cume_dist() OVER w AS cd
               FROM t WINDOW w AS (PARTITION BY k ORDER BY v ASC NULLS LAST)
               ORDER BY id"""
        ).fetchdf()
        assert list(out["dr"].astype("int64")) == list(exp["dr"])
        assert list(out["cd"]) == list(exp["cd"])  # bit-exact
