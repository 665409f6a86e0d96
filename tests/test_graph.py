"""Distributed connected components vs the driver union-find."""

import logging

import numpy as np
import pandas as pd
import pytest

from mysql_binlog_ray.stages.dedup import connected_components
from mysql_binlog_ray.stages.graph import connected_components_distributed


def _dist(edges: pd.DataFrame, **kw) -> pd.DataFrame:
    out = connected_components_distributed(edges, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _uf(edges: pd.DataFrame) -> pd.DataFrame:
    return connected_components(edges).astype({"doc_id": "int64", "cluster_id": "int64"})


def test_cc_distributed_matches_union_find_random_graph():
    rng = np.random.default_rng(7)
    e = pd.DataFrame(
        {
            "doc_a": rng.integers(0, 120, 150).astype(np.int64),
            "doc_b": rng.integers(0, 120, 150).astype(np.int64),
        }
    )
    e = e[e["doc_a"] != e["doc_b"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(_dist(e, num_parts=4), _uf(e))


def test_cc_distributed_chain_needs_multiple_rounds():
    # a path graph: min label must travel the full diameter
    n = 9
    e = pd.DataFrame(
        {"doc_a": np.arange(n - 1, dtype=np.int64), "doc_b": np.arange(1, n, dtype=np.int64)}
    )
    got = _dist(e, num_parts=2)
    assert got["cluster_id"].eq(0).all()
    assert list(got["doc_id"]) == list(range(n))


def test_cc_distributed_duplicate_and_reversed_edges():
    e = pd.DataFrame(
        {"doc_a": np.array([5, 2, 2, 9], np.int64), "doc_b": np.array([2, 5, 5, 9], np.int64)}
    )
    got = _dist(e, num_parts=2)
    exp = pd.DataFrame({"doc_id": [2, 5, 9], "cluster_id": [2, 2, 9]}).astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_cc_distributed_empty():
    e = pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    assert connected_components_distributed(e).count() == 0


def test_cc_distributed_max_rounds_cap_warns(caplog):
    n = 9
    e = pd.DataFrame(
        {"doc_a": np.arange(n - 1, dtype=np.int64), "doc_b": np.arange(1, n, dtype=np.int64)}
    )
    with caplog.at_level(logging.WARNING, logger="mysql_binlog_ray.stages.graph"):
        got = _dist(e, num_parts=2, max_rounds=2)
    assert any("max_rounds" in r.message for r in caplog.records)
    # unconverged but complete: every node present, labels monotone >= exact
    assert list(got["doc_id"]) == list(range(n))
    assert not got["cluster_id"].eq(0).all()


def test_cc_distributed_rejects_negative_ids():
    e = pd.DataFrame({"doc_a": np.array([-1], np.int64), "doc_b": np.array([2], np.int64)})
    with pytest.raises(Exception, match="node ids"):
        connected_components_distributed(e).materialize()


def test_cc_distributed_exact_above_2_53():
    # label changes of +-1 at >= 2^53 alias in float64; the changed
    # detector must compare in int64 (regression: review finding)
    base = 1 << 53
    e = pd.DataFrame(
        {
            "doc_a": np.array([base, base + 4, base + 1], np.int64),
            "doc_b": np.array([base + 4, base + 1, base + 2], np.int64),
        }
    )
    pd.testing.assert_frame_equal(_dist(e, num_parts=2), _uf(e))
