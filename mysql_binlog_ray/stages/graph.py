"""Distributed graph primitives for the dedup/clustering pipelines.

The reference engine has no graph surface (SURVEY.md §2 — clustering is
a consumer-side concern); these operators back the near-dup CLUSTERS
queries at scales where the verified-pair set no longer fits one driver
(`dedup.connected_components` stays the right tool when it provably
does — see its docstring).

Algorithm: synchronous min-label propagation (the classic BSP/"Pregel"
connected-components formulation; cf. Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — we use the simple
propagation variant, whose round count is the graph DIAMETER, because
near-dup graphs are dense blobs of mutually-similar documents with tiny
diameters; the alternating large-star/small-star O(log n) variant is
the documented escape hatch for pathological chain-shaped graphs).

Scale shape per round: TWO keyed exchanges through
``relational.keyed_reduce`` (adaptive fanout sized once from the
materialized edge set), each carrying O(|E| + |V|) slim int64 rows;
labels live in the object store as a Dataset; the driver sees only a
per-round scalar (number of labels that changed).  Nothing is ever
O(graph) on the driver.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .relational import keyed_reduce

logger = logging.getLogger(__name__)


def _as_dataset(edges, a: str, b: str) -> rd.Dataset:
    if isinstance(edges, rd.Dataset):
        return edges
    if isinstance(edges, pd.DataFrame):
        edges = pa.Table.from_pandas(edges[[a, b]], preserve_index=False)
    return rd.from_arrow(edges.select([a, b]))


def connected_components_distributed(
    edges,
    a: str = "doc_a",
    b: str = "doc_b",
    max_rounds: int = 64,
    num_parts: int | None = None,
) -> rd.Dataset:
    """Connected components over an edge Dataset -> ``(doc_id,
    cluster_id)`` Dataset, where ``cluster_id`` is the minimum node id in
    the component (exact parity with ``dedup.connected_components``).

    ``edges`` may be a Dataset, Arrow table or pandas frame with int64
    non-negative endpoint columns ``a``/``b``; isolated nodes (appearing
    in no edge) are not emitted, matching the union-find.  Each round:

    1. exchange keyed on the SOURCE endpoint: every node's current label
       is attached to its outgoing (symmetrized) edges, emitting one
       ``(dst, candidate_label)`` message per edge plus the node's own
       ``(node, label)`` retention row;
    2. exchange keyed on the message target: ``new_label = min`` over
       candidates; a node counts as changed when a message beat the
       label it entered the round with.

    Rounds stop when no label changed (the per-round driver signal is
    ONE scalar from a ``sum`` aggregate) or at ``max_rounds``, which
    warns and returns the current labels — like the LSH bucket caps,
    never silent.  ``num_parts`` pins the exchange fanout (tests);
    ``None`` sizes it ONCE from the materialized edge set with a
    CPU-count floor (rounds pay the fanout twice, so a tiny graph must
    not issue 64-way shuffles per round) — no per-round sizing work.
    """
    eds = _as_dataset(edges, a, b)

    def symmetrize(t: pa.Table) -> pa.Table:
        u = t.column(a).to_numpy().astype(np.int64, copy=False)
        v = t.column(b).to_numpy().astype(np.int64, copy=False)
        if len(u) and (u.min() < 0 or v.min() < 0):
            raise ValueError("connected_components_distributed: node ids must be >= 0")
        return pa.table(
            {
                "node": np.concatenate([u, v]),
                "other": np.concatenate([v, u]),
                # label < 0 marks an edge row; real labels are ids >= 0
                "label": np.full(2 * len(u), -1, dtype=np.int64),
            }
        )

    # one materialization: edge rows are re-shuffled every round (the
    # standard BSP cost), but the upstream pair pipeline runs only once
    sym = eds.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if sym.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    if num_parts is None:
        # size the per-round exchange fanout ONCE from the edge set; the
        # small-graph floor is the CPU count, not keyed_reduce's default
        # 64 — every round pays the fanout TWICE, so a tiny graph must
        # not issue 128 shuffle partitions per round
        import ray

        from .relational import adaptive_num_parts

        cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
        num_parts = adaptive_num_parts(
            max(1, sym.size_bytes() or 1), min_parts=max(2, min(64, cpus))
        )

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.groupby("node", sort=False)["other"].min()
        nodes = lab.index.to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"node": nodes, "label": np.minimum(nodes, lab.to_numpy(dtype=np.int64))}
        )

    # round 0 folded into init: label = min(self, neighbors)
    labels = keyed_reduce(
        sym, ["node"], init_labels, num_parts=num_parts
    ).materialize()

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["label"].to_numpy() < 0
        lab = g.loc[~is_edge].groupby("node", sort=False)["label"].min()
        e = g.loc[is_edge]
        src_lab = lab.reindex(e["node"]).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [e["other"].to_numpy(dtype=np.int64), lab.index.to_numpy(dtype=np.int64)]
                ),
                "cand": np.concatenate([src_lab, lab.to_numpy(dtype=np.int64)]),
                "is_old": np.concatenate(
                    [np.zeros(len(e), np.int64), np.ones(len(lab), np.int64)]
                ),
            }
        )

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        label = g.groupby("node", sort=False)["cand"].min()
        old = g.loc[g["is_old"] == 1].groupby("node", sort=False)["cand"].min()
        old = old.reindex(label.index)
        if old.isna().any():
            # impossible by construction — every node re-emits its label
            # each round; NEVER compare through float64 (ids >= 2^53
            # would alias and freeze propagation early)
            raise AssertionError(
                "connected_components_distributed: node received messages "
                "but has no retention label row"
            )
        lab_np = label.to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "node": label.index.to_numpy(dtype=np.int64),
                "label": lab_np,
                "changed": (lab_np < old.to_numpy(dtype=np.int64)).astype(np.int64),
            }
        )

    def labels_as_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": t.column("node"),
                "other": pa.array(np.zeros(n, dtype=np.int64)),
                "label": t.column("label"),
            }
        )

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        both = sym.union(labels.map_batches(labels_as_rows, batch_format="pyarrow"))
        msgs = keyed_reduce(
            both, ["node"], propagate, num_parts=num_parts
        )
        new_labels = keyed_reduce(
            msgs, ["node"], reduce_min, num_parts=num_parts
        ).materialize()
        n_changed = int(new_labels.sum("changed") or 0)
        labels = new_labels
        if n_changed == 0:
            break
    else:
        logger.warning(
            "connected_components_distributed: labels still changing after "
            "max_rounds=%d — returning the current (unconverged) labels; "
            "raise max_rounds or use the large-star/small-star variant for "
            "chain-shaped graphs",
            max_rounds,
        )
    return labels.map_batches(
        lambda t: t.select(["node", "label"]).rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
    )
