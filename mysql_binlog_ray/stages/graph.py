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


def _empty_labels() -> rd.Dataset:
    return rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
    )


def connected_components_bigstar(
    edges,
    a: str = "doc_a",
    b: str = "doc_b",
    max_rounds: int = 64,
    num_parts: int | None = None,
) -> rd.Dataset:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 §3) -> ``(doc_id, cluster_id)``, ``cluster_id`` =
    minimum node id in the component — exact parity with both
    ``dedup.connected_components`` and ``connected_components_distributed``.

    This is the documented escape hatch for CHAIN-shaped graphs: min-label
    propagation pays one round per unit of graph diameter, while the
    alternating star rounds converge in O(log n) rounds on any topology
    (O(log^2 n) worst-case bound, ~log n observed).  Per round: large-star
    hangs every node's larger neighbors off the minimum of its
    neighborhood, small-star re-parents every node's smaller neighbors
    onto that minimum; the fixed point is a set of depth-1 stars rooted
    at each component's minimum id.

    Scale shape per round: TWO keyed exchanges (one per star step)
    through ``keyed_reduce``, each carrying O(|E|) slim int64 rows;
    the driver sees two scalars per round (changed-edge counts).
    Convergence detection is EXACT and group-local — no edge-set
    checksums: a large-star group is unchanged iff its key is already
    its neighborhood minimum; a small-star group is unchanged iff it has
    exactly one (smaller) neighbor; both-zero in one round implies every
    node has at most one parent and every parented node's parent is its
    neighborhood minimum, i.e. the star fixed point.
    """
    eds = _as_dataset(edges, a, b)

    def canonical(t: pa.Table) -> pa.Table:
        u = t.column(a).to_numpy().astype(np.int64, copy=False)
        v = t.column(b).to_numpy().astype(np.int64, copy=False)
        if len(u) and (min(u.min(), v.min()) < 0):
            raise ValueError("connected_components_bigstar: node ids must be >= 0")
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"ea": np.minimum(u, v), "eb": np.maximum(u, v)})

    from .relational import compact_fragmented

    cur = compact_fragmented(
        eds.map_batches(canonical, batch_format="pyarrow").materialize()
    )
    if cur.count() == 0:
        return _empty_labels()
    if num_parts is None:
        from .relational import adaptive_num_parts, cpu_floor

        # both orientations ride the large-star exchange -> 2x bytes.
        # Tiny MEASURED edge sets take keyed_reduce's single-task route
        # (small_to_one — the star combines are fully vectorized, so one
        # task per round is compute-safe); an UNMEASURED size keeps the
        # pinned-floor exchange path (never silently serialize at scale)
        ebytes = 2 * (cur.size_bytes() or 0)
        num_parts = adaptive_num_parts(
            max(1, ebytes), min_parts=cpu_floor(lo=2), small_to_one=ebytes > 0
        )

    def symmetrize(t: pa.Table) -> pa.Table:
        u = t.column("ea").to_numpy()
        v = t.column("eb").to_numpy()
        return pa.table(
            {"node": np.concatenate([u, v]), "other": np.concatenate([v, u])}
        )

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        # per node u: m = min(N(u) + {u}); emit (m, v) for v in N(u), v > u;
        # the edge {u,v} (u < v) is rewritten by exactly one group (u),
        # so per-row changed = (m != u) counts changed edges exactly
        g = g.drop_duplicates(["node", "other"])
        node = g["node"].to_numpy(dtype=np.int64)
        other = g["other"].to_numpy(dtype=np.int64)
        m = np.minimum(
            g.groupby("node", sort=False)["other"].transform("min").to_numpy(dtype=np.int64),
            node,
        )
        up = other > node
        return pd.DataFrame(
            {
                "ea": m[up],
                "eb": other[up],
                "changed": (m[up] != node[up]).astype(np.int64),
            }
        )

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        # keyed on the LARGER endpoint: node=hi, other=lo (< hi).
        # m = min(N(hi)); emit (m, v) for v in N(hi)\{m} plus (m, hi);
        # group-local unchanged <=> exactly one (smaller) neighbor
        g = g.drop_duplicates(["node", "other"])
        hi = g["node"].to_numpy(dtype=np.int64)
        lo = g["other"].to_numpy(dtype=np.int64)
        m = g.groupby("node", sort=False)["other"].transform("min").to_numpy(dtype=np.int64)
        rewire = lo != m
        heads = g.groupby("node", sort=False)["other"].min()
        return pd.DataFrame(
            {
                "ea": np.concatenate([m[rewire], heads.to_numpy(dtype=np.int64)]),
                "eb": np.concatenate([lo[rewire], heads.index.to_numpy(dtype=np.int64)]),
                "changed": np.concatenate(
                    [np.ones(int(rewire.sum()), np.int64), np.zeros(len(heads), np.int64)]
                ),
            }
        )

    def strip(t: pa.Table) -> pa.Table:
        return t.select(["ea", "eb"])

    def as_hi_keyed(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("eb"), "other": t.column("ea")})

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        ls = keyed_reduce(
            cur.map_batches(symmetrize, batch_format="pyarrow"),
            ["node"],
            large_star,
            num_parts=num_parts,
        ).materialize()
        c_ls = int(ls.sum("changed") or 0)
        ss = keyed_reduce(
            ls.map_batches(strip, batch_format="pyarrow").map_batches(
                as_hi_keyed, batch_format="pyarrow"
            ),
            ["node"],
            small_star,
            num_parts=num_parts,
        ).materialize()
        c_ss = int(ss.sum("changed") or 0)
        cur = ss.map_batches(strip, batch_format="pyarrow")
        if c_ls == 0 and c_ss == 0:
            break
        cur = cur.materialize()
    else:
        logger.warning(
            "connected_components_bigstar: edges still changing after "
            "max_rounds=%d — returning labels from the current "
            "(unconverged) edge set",
            max_rounds,
        )

    def star_labels(t: pa.Table) -> pa.Table:
        root = t.column("ea").to_numpy()
        leaf = t.column("eb").to_numpy()
        return pa.table(
            {
                "node": np.concatenate([leaf, root]),
                "label": np.concatenate([root, root]),
            }
        )

    def label_min(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.groupby("node", sort=False)["label"].min()
        return pd.DataFrame(
            {
                "doc_id": lab.index.to_numpy(dtype=np.int64),
                "cluster_id": lab.to_numpy(dtype=np.int64),
            }
        )

    return keyed_reduce(
        cur.map_batches(star_labels, batch_format="pyarrow"),
        ["node"],
        label_min,
        num_parts=num_parts,
    )


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
    # standard BSP cost), but the upstream pair pipeline runs only once.
    # Compact block fragmentation first — rounds pay per-block exchange
    # cost TWICE per round, and upstream pair pipelines routinely leave
    # a tiny pair set spread over dozens of near-empty blocks
    from .relational import compact_fragmented

    sym = compact_fragmented(
        eds.map_batches(symmetrize, batch_format="pyarrow").materialize()
    )
    if sym.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    if num_parts is None:
        # size the per-round exchange fanout ONCE from the edge set; the
        # small-graph floor is the CPU count, not keyed_reduce's default
        # 64 — every round pays the fanout TWICE, so a tiny graph must
        # not issue 128 shuffle partitions per round
        from .relational import adaptive_num_parts, cpu_floor

        # tiny MEASURED graphs: single-task rounds (vectorized min-label
        # combine); unmeasured sizes keep the pinned-floor exchange path
        sbytes = sym.size_bytes() or 0
        num_parts = adaptive_num_parts(
            max(1, sbytes), min_parts=cpu_floor(lo=2), small_to_one=sbytes > 0
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
        new_labels = compact_fragmented(
            keyed_reduce(
                msgs, ["node"], reduce_min, num_parts=num_parts
            ).materialize()
        )
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
