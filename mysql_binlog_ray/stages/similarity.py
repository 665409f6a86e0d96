"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — the baseline.  Query matrix
  is broadcast via ``ray.put`` once; every batch does one numpy matmul
  and keeps only its local top-k, so the driver-side reduce sees
  k * num_batches rows, never the corpus.
- ``IvfIndex``: the scale path — k-means (numpy Lloyd) centroids from a
  sample, cluster assignment as a map_batches stage, queries probe only
  ``nprobe`` nearest clusters.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _stack(col: pd.Series) -> np.ndarray:
    return np.vstack(col.to_numpy())


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: rd.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | tuple[int, int] = (1, 8),
) -> pd.DataFrame:
    """Exact cosine top-k for each query row; returns
    (query_id, vec_id, sim) sorted by (query_id, -sim, vec_id)."""
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))

    def scorer(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_stack(batch[vec_col]).astype(np.float64))
        sims = m @ q.T  # (batch, nq); q ships once with the task closure
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            # deterministic local top-k: ties at the boundary resolve by
            # lowest id (the global reduce tie-breaks the same way, so a
            # tied-but-dropped smaller id must never be lost per-batch)
            order = np.lexsort((ids, -sims[:, qi]))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[order])
            out_s.extend(sims[order, qi])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "sim": out_s})

    local = ds.map_batches(scorer, batch_format="pandas")
    pdf = local.to_pandas()  # k * nq * num_batches rows: small
    pdf = pdf.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    out = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["sim"] = out["sim"].round(6)
    return out


@dataclass
class IvfIndex:
    """IVF (inverted-file) approximate index: centroids + a
    cluster-assigned copy of the corpus, partitioned by cluster id."""

    centroids: np.ndarray  # (nlist, dim), L2-normalized
    assigned: rd.Dataset  # corpus + `_cluster` column

    @staticmethod
    def build(
        ds: rd.Dataset,
        nlist: int = 16,
        vec_col: str = "embedding",
        sample_size: int = 2048,
        iters: int = 8,
        seed: int = 11,
        concurrency: int | tuple[int, int] = (1, 8),
    ) -> "IvfIndex":
        # centroid training on a bounded sample (driver-side numpy Lloyd).
        # One streaming pass: each block contributes a deterministic
        # random quota of rows and limit() stops the scan early — no
        # ds.count() pre-pass (which would execute the whole upstream
        # pipeline once just to size a fraction).
        per_block = max(8, sample_size // 8)

        def block_sample(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) <= per_block:
                return b
            rng_b = np.random.default_rng(seed ^ len(b))
            return b.iloc[np.sort(rng_b.choice(len(b), per_block, replace=False))]

        sample = (
            ds.map_batches(block_sample, batch_format="pandas")
            .limit(sample_size)
            .to_pandas()
        )
        x = _normalize(_stack(sample[vec_col]).astype(np.float64))
        rng = np.random.default_rng(seed)
        cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                m = x[assign == c]
                if len(m):
                    cent[c] = m.mean(axis=0)
            cent = _normalize(cent)
        def assigner(batch: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_stack(batch[vec_col]).astype(np.float64))
            batch = batch.copy()
            batch["_cluster"] = np.argmax(m @ cent.T, axis=1).astype(np.int32)
            return batch

        assigned = ds.map_batches(assigner, batch_format="pandas")
        return IvfIndex(centroids=cent, assigned=assigned)

    def search(
        self,
        query_vecs: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        """Probe the ``nprobe`` nearest clusters per query; exact cosine
        within the probed subset.

        Scale shape (mirrors brute_force_topk): queries + probe sets are
        broadcast once via ``ray.put``; each batch keeps only its rows in
        probed clusters and reduces to a local top-k per query, so the
        driver-side reduce sees k * nq * num_batches rows — never the
        probed clusters' contents."""
        q = _normalize(np.asarray(query_vecs, dtype=np.float64))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
        wanted = np.unique(probe)
        bc = ray.put((q, probe, wanted))
        cache: dict = {}

        def scorer(batch: pd.DataFrame) -> pd.DataFrame:
            state = cache.get("s")
            if state is None:
                state = cache["s"] = ray.get(bc)  # one read per worker
            qq, pr, want = state
            clusters = batch["_cluster"].to_numpy()
            keep = np.isin(clusters, want)
            empty = pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    id_col: pd.Series(dtype=batch[id_col].dtype),
                    "sim": pd.Series(dtype="float64"),
                }
            )
            if not keep.any():
                return empty
            sub = batch[keep]
            m = _normalize(_stack(sub[vec_col]).astype(np.float64))
            ids = sub[id_col].to_numpy()
            clusters = clusters[keep]
            sims_all = m @ qq.T  # (rows, nq)
            out_q, out_id, out_s = [], [], []
            for qi in range(qq.shape[0]):
                mask = np.isin(clusters, pr[qi])
                if not mask.any():
                    continue
                sims = sims_all[mask, qi]
                sub_ids = ids[mask]
                kk = min(k, len(sub_ids))
                part = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(sub_ids[part])
                out_s.extend(sims[part])
            if not out_q:
                return empty
            return pd.DataFrame({"query_id": out_q, id_col: out_id, "sim": out_s})

        local = self.assigned.map_batches(scorer, batch_format="pandas")
        pdf = local.to_pandas()  # k * nq * num_batches rows: small
        if pdf.empty:
            return pdf
        pdf = pdf.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
        out = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        out["sim"] = out["sim"].round(6)
        return out


def embedding_neardup_exact(
    ds: rd.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tile_rows: int = 65_536,
) -> pd.DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (id_a < id_b): the
    deterministic, SQL-oracle-able baseline next to the IVF-clustered
    scale path (``embedding_neardup_pairs``).

    Scale shape: the corpus is broadcast as TILES of ``tile_rows``
    normalized vectors (one ``ray.put`` per tile, streamed off
    ``iter_batches`` so the driver holds one tile at a time — the full
    corpus lives only in the object store, which is its job); every
    batch matmuls against each tile in turn and emits only its
    above-threshold pairs, so both the per-task working set
    (batch x tile) and the driver collect (true near-dup density) stay
    bounded.  Cost is the honest O(n^2/P) of an exact all-pairs scan —
    use the IVF variant when approximate is acceptable."""
    tile_refs: list = []
    for b in ds.iter_batches(batch_size=tile_rows, batch_format="pandas"):
        ids_t = b[id_col].to_numpy()
        mat_t = _normalize(_stack(b[vec_col]).astype(np.float64))
        tile_refs.append(ray.put((ids_t, mat_t)))
    cache: dict = {}

    def pairs_fn(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_stack(batch[vec_col]).astype(np.float64))
        bid = batch[id_col].to_numpy()
        out = []
        for k, ref in enumerate(tile_refs):
            tile = cache.get(k)
            if tile is None:
                tile = cache[k] = ray.get(ref)  # per-worker object-store read
            cid, cm = tile
            sims = m @ cm.T  # (batch, tile)
            keep = (sims >= threshold) & (bid[:, None] < cid[None, :])
            bi, ci = np.nonzero(keep)
            if len(bi):
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": bid[bi],
                            "id_b": cid[ci],
                            "sim": np.round(sims[bi, ci], 6),
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=bid.dtype),
                    "id_b": pd.Series(dtype=bid.dtype),
                    "sim": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    pdf = ds.map_batches(pairs_fn, batch_format="pandas").to_pandas()
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_neardup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs: cluster with IVF, compare
    only within clusters (plus the pigeonhole risk documented here: pairs
    straddling a centroid boundary can be missed — acceptable for
    near-dup mining, not for exact retrieval)."""
    idx = IvfIndex.build(ds, nlist=nlist, vec_col=vec_col, concurrency=concurrency)

    def pairs_in_cluster(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        g = group.sort_values(id_col)
        m = _normalize(_stack(g[vec_col]).astype(np.float64))
        ids = g[id_col].to_numpy()
        sims = m @ m.T
        iu = np.triu_indices(len(ids), 1)
        mask = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][mask]],
                "id_b": ids[iu[1][mask]],
                "sim": np.round(sims[iu][mask], 6),
            }
        )

    pairs = idx.assigned.groupby("_cluster").map_groups(pairs_in_cluster, batch_format="pandas")
    pdf = pairs.to_pandas()
    if pdf.empty or "id_a" not in pdf.columns:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "sim": pd.Series(dtype="float64")})
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
