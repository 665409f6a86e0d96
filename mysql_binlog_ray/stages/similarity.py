"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — the baseline.  Query matrix
  is broadcast via ``ray.put`` once; every batch does one numpy matmul
  and keeps only its local top-k, so the driver-side reduce sees
  k * num_batches rows, never the corpus.
- ``IvfIndex``: the scale path — k-means (numpy Lloyd) centroids from a
  sample, cluster assignment as a map_batches stage, queries probe only
  ``nprobe`` nearest clusters.
- ``embedding_neardup_exact`` / ``embedding_neardup_pairs``: all-pairs
  cosine near-dup mining.  Both are TILED: the corpus is materialized as
  normalized Arrow blocks IN TASKS and workers stream (batch x tile)
  matmuls — no task ever materializes a whole cluster or the corpus, and
  the driver only ever holds object REFS plus per-tile metadata.
"""

from __future__ import annotations

import warnings
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


def _mat_from_arrow(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(rows, dim) float64 from a list<float> / fixed_size_list column —
    one flat buffer copy, no per-row Python objects."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if isinstance(arr.type, pa.ExtensionType):
        # Ray's ArrowTensorType (appears after pandas round-trips)
        m = arr.to_numpy(zero_copy_only=False)
        return np.asarray(m, dtype=np.float64).reshape(n, -1)
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        # .values ignores the slice offset; re-window explicitly.
        # copy=False keeps already-float64 buffers plasma-backed (the
        # tile path stores float64, so a worker's cached tile is a view
        # into the object store, not a private heap copy)
        off = arr.offset * dim
        return flat[off : off + n * dim].astype(np.float64, copy=False).reshape(n, dim)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return flat.reshape(n, len(flat) // max(1, n))


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
        # Each block contributes its quota of LOWEST-priority rows, where
        # priority is a deterministic hash of the vector bytes; a
        # distributed sort on the slim sampled rows + limit() then picks
        # the global lowest sample_size.  This is scheduling-independent
        # (a bare limit() keeps whichever blocks raced in first, so two
        # builds on the same data could train different centroids) and
        # never funnels more than the per-block quotas through the sort.
        per_block = max(8, sample_size // 8)

        def _prio(m: np.ndarray) -> np.ndarray:
            raw = np.ascontiguousarray(m, dtype=np.float32).view(np.uint32)
            w = np.random.default_rng(seed ^ 0x9E3779B9).integers(
                1, 2**63, size=raw.shape[1], dtype=np.uint64
            ) | np.uint64(1)
            with np.errstate(over="ignore"):
                p = (raw.astype(np.uint64) * w).sum(axis=1)
                # splitmix64-style finalizer for mixing
                p ^= p >> np.uint64(30)
                p *= np.uint64(0xBF58476D1CE4E5B9)
                p ^= p >> np.uint64(27)
            return p

        def block_sample(b: pd.DataFrame) -> pd.DataFrame:
            m = _stack(b[vec_col])
            p = _prio(m)
            if len(b) > per_block:
                keep = np.argsort(p, kind="stable")[:per_block]
                b = b.iloc[np.sort(keep)]
                p = p[np.sort(keep)]
            out = b[[vec_col]].copy()
            out["_prio"] = p
            return out

        sample = (
            ds.map_batches(block_sample, batch_format="pandas")
            .sort("_prio")
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
                # deterministic local top-k (same tie-break as the global
                # reduce: sim desc, id asc) — argpartition would drop a
                # tied smaller id at the k boundary, making results
                # batch-layout-dependent
                order = np.lexsort((sub_ids, -sims))[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(sub_ids[order])
                out_s.extend(sims[order])
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


def vector_stats_by_group(
    ds: rd.Dataset,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Per-group elementwise feature-range profile of an embedding
    column: ``(group, dim, vmin, vmax, n)`` with ``dim`` 1-based (==
    DuckDB ``generate_subscripts``).  The normalization-stats building
    block for per-class feature scaling.

    min/max are EXACT in floating point (no summation-order
    sensitivity — this is why the profile is range-based, not
    mean-based: a distributed mean's partial-sum order is not
    reproducible bit-for-bit against a SQL oracle).

    Scale shape: one vectorized ``reduceat`` partial per batch emits
    (groups-in-batch x dim) slim rows; the only exchange is the final
    tiny groupby over (group, dim)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(tab: pa.Table) -> pa.Table:
        g = tab[group_col].to_numpy()
        m = _mat_from_arrow(tab[vec_col])
        order = np.argsort(g, kind="stable")
        gs, ms = g[order], m[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]]) if len(gs) else np.array([], np.int64)
        if not len(starts):
            return pa.table(
                {
                    group_col: pa.array([], tab.schema.field(group_col).type),
                    "dim": pa.array([], pa.int64()),
                    "vmin": pa.array([], pa.float64()),
                    "vmax": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        vmin = np.minimum.reduceat(ms, starts, axis=0)
        vmax = np.maximum.reduceat(ms, starts, axis=0)
        counts = np.diff(np.r_[starts, len(gs)])
        ng, dim = vmin.shape
        return pa.table(
            {
                group_col: pa.array(np.repeat(gs[starts], dim)).cast(
                    tab.schema.field(group_col).type
                ),
                "dim": pa.array(np.tile(np.arange(1, dim + 1), ng)),
                "vmin": pa.array(vmin.ravel()),
                "vmax": pa.array(vmax.ravel()),
                "n": pa.array(np.repeat(counts, dim).astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(
            Min("vmin", alias_name="vmin"),
            Max("vmax", alias_name="vmax"),
            Sum("n", alias_name="n"),
        )
    )
    return out.sort([group_col, "dim"])


# ---------------------------------------------------------------------------
# Tiled all-pairs machinery (shared by the exact and IVF-clustered near-dup)
# ---------------------------------------------------------------------------


def _block_refs(mat_ds: rd.MaterializedDataset) -> list:
    """Object refs of a materialized dataset's blocks — refs only, no
    block bytes ever touch the driver."""
    refs: list = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


def _tile_dataset(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    tile_rows: int,
    cluster_col: str | None = None,
) -> rd.MaterializedDataset:
    """Normalize vectors IN TASKS and materialize as Arrow blocks of
    ~``tile_rows`` rows (fixed_size_list<float64> so workers can reshape
    the flat buffer without per-row Python).  The materialized blocks ARE
    the broadcast tiles: they live in the object store, owned by the
    returned dataset — keep it referenced while tiles are in use."""

    def to_tile(tab: pa.Table) -> pa.Table:
        mat = _normalize(_mat_from_arrow(tab[vec_col]))
        dim = mat.shape[1]
        vecs = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float64()), dim
        )
        cols = {id_col: tab[id_col], vec_col: vecs}
        if cluster_col is not None:
            cols[cluster_col] = tab[cluster_col]
        return pa.table(cols)

    return ds.map_batches(
        to_tile, batch_format="pyarrow", batch_size=tile_rows
    ).materialize()


# max tiles a worker keeps decoded at once; evicted tiles re-fetch from
# the object store (cheap — float64 tile buffers stay plasma-backed), so
# a worker's heap never grows toward the whole corpus even when it pages
# through every tile
_TILE_CACHE_MAX = 16


def _tile_cache_get(cache: dict, k: int, ref, vec_col: str, id_col: str, cluster_col: str | None = None):
    """Per-worker BOUNDED (LRU) tile cache: one object-store read + one
    reshape per (worker, tile) while resident, reused across batches."""
    tile = cache.get(k)
    if tile is not None:
        return tile
    tab = ray.get(ref)
    ids = tab[id_col].to_numpy()
    mat = _mat_from_arrow(tab[vec_col])
    if cluster_col is not None:
        tile = (ids, mat, tab[cluster_col].to_numpy())
    else:
        tile = (ids, mat)
    if len(cache) >= _TILE_CACHE_MAX:
        cache.pop(next(iter(cache)))  # FIFO eviction (insertion-ordered dict)
    cache[k] = tile
    return tile


_EMPTY_PAIRS = {
    "id_a": pd.Series(dtype="int64"),
    "id_b": pd.Series(dtype="int64"),
    "sim": pd.Series(dtype="float64"),
}


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

    Scale shape: the corpus is normalized + materialized as TILES *in
    tasks* (the driver holds only block refs — no ``iter_batches`` driver
    funnel); every batch matmuls against each tile in turn and emits only
    its above-threshold pairs, so both the per-task working set
    (batch x tile) and the driver collect (true near-dup density) stay
    bounded.  Cost is the honest O(n^2/P) of an exact all-pairs scan —
    use the IVF variant when approximate is acceptable."""
    tiles = _tile_dataset(ds, vec_col, id_col, tile_rows)
    tile_refs = _block_refs(tiles)
    cache: dict = {}

    def pairs_fn(tab: pa.Table) -> pd.DataFrame:
        bid = tab[id_col].to_numpy()
        m = _mat_from_arrow(tab[vec_col])  # already normalized
        out = []
        for k, ref in enumerate(tile_refs):
            cid, cm = _tile_cache_get(cache, k, ref, vec_col, id_col)
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
            return pd.DataFrame(_EMPTY_PAIRS)
        return pd.concat(out, ignore_index=True)

    # the batch side streams over the SAME materialized tiles (already
    # normalized — no second normalization pass over the corpus)
    pdf = tiles.map_batches(pairs_fn, batch_format="pyarrow").to_pandas()
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_neardup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int | None = None,
    tile_rows: int = 65_536,
    max_cluster_size: int = 1_000_000,
    target_cluster_rows: int = 65_536,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs: cluster with IVF, compare
    only within clusters (the pigeonhole risk is documented: pairs
    straddling a centroid boundary can be missed — acceptable for
    near-dup mining, not for exact retrieval).

    Scale shape: rows are cluster-assigned, sorted by cluster (the ONE
    all-to-all), then normalized tiles are materialized in tasks.  Each
    batch matmuls only against tiles whose cluster range overlaps its
    own, with an exact cluster-equality mask — so work is O(sum n_c^2)
    tiled at (batch x tile) granularity and NO task ever materializes a
    whole cluster (the round-2 ``map_groups`` all-pairs is gone).

    ``nlist=None`` scales the cluster count with the corpus
    (ceil(n / target_cluster_rows), min 8) so clusters stay ~bounded as
    the input grows.  Clusters larger than ``max_cluster_size`` are
    SKIPPED (quadratic-compute guard), surfaced via a warning and
    sentinel rows (id_b == -1, sim == NaN, skipped_size > 0) — never
    silently."""
    if nlist is None:
        # metadata-cheap on a parquet read; executes the upstream pipeline
        # once for transformed inputs (documented trade for auto-sizing)
        n = ds.count()
        nlist = max(8, -(-n // target_cluster_rows))
    idx = IvfIndex.build(ds, nlist=nlist, vec_col=vec_col, concurrency=concurrency)
    # the one all-to-all: co-locate clusters into contiguous sorted blocks
    tiles = _tile_dataset(
        idx.assigned.sort("_cluster"), vec_col, id_col, tile_rows, cluster_col="_cluster"
    )
    tile_refs = _block_refs(tiles)

    # per-tile metadata (cluster range + per-cluster row counts): tiny ray
    # tasks returning O(nlist) ints each — the driver never sees a tile
    @ray.remote(num_cpus=0.25)
    def tile_meta(tab: pa.Table):
        cl = tab["_cluster"].to_numpy()
        vals, counts = np.unique(cl, return_counts=True)
        return int(cl.min()), int(cl.max()), vals.tolist(), counts.tolist()

    metas = ray.get([tile_meta.remote(r) for r in tile_refs])
    csizes: dict[int, int] = {}
    for _, _, vals, counts in metas:
        for v, c in zip(vals, counts):
            csizes[v] = csizes.get(v, 0) + c
    skipped = {c: n for c, n in csizes.items() if n > max_cluster_size}
    if skipped:
        warnings.warn(
            f"embedding_neardup_pairs: skipping {len(skipped)} cluster(s) larger "
            f"than max_cluster_size={max_cluster_size}: {skipped} — surfaced as "
            "sentinel rows (id_b == -1); raise max_cluster_size or nlist to cover them",
            stacklevel=2,
        )
    skip_arr = np.array(sorted(skipped), dtype=np.int64)
    ranges = [(m[0], m[1]) for m in metas]
    cache: dict = {}

    def pairs_fn(tab: pa.Table) -> pd.DataFrame:
        bid = tab[id_col].to_numpy()
        m = _mat_from_arrow(tab[vec_col])  # normalized in the tile stage
        bcl = tab["_cluster"].to_numpy()
        if len(skip_arr):
            ok = ~np.isin(bcl, skip_arr)
            bid, m, bcl = bid[ok], m[ok], bcl[ok]
        if not len(bid):
            return pd.DataFrame(_EMPTY_PAIRS)
        bmin, bmax = int(bcl.min()), int(bcl.max())
        out = []
        for k, ref in enumerate(tile_refs):
            tmin, tmax = ranges[k]
            if tmax < bmin or tmin > bmax:
                continue  # cluster-sorted: non-overlapping tiles cost nothing
            cid, cm, ccl = _tile_cache_get(cache, k, ref, vec_col, id_col, "_cluster")
            # trim both sides to the overlapping cluster window before the
            # matmul (sorted order makes these contiguous slices)
            bsel = (bcl >= tmin) & (bcl <= tmax)
            csel = (ccl >= bmin) & (ccl <= bmax)
            if len(skip_arr):
                csel &= ~np.isin(ccl, skip_arr)
            if not bsel.any() or not csel.any():
                continue
            sb_id, sb_m, sb_cl = bid[bsel], m[bsel], bcl[bsel]
            sc_id, sc_m, sc_cl = cid[csel], cm[csel], ccl[csel]
            sims = sb_m @ sc_m.T
            keep = (
                (sims >= threshold)
                & (sb_id[:, None] < sc_id[None, :])
                & (sb_cl[:, None] == sc_cl[None, :])
            )
            bi, ci = np.nonzero(keep)
            if len(bi):
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": sb_id[bi],
                            "id_b": sc_id[ci],
                            "sim": np.round(sims[bi, ci], 6),
                        }
                    )
                )
        if not out:
            return pd.DataFrame(_EMPTY_PAIRS)
        return pd.concat(out, ignore_index=True)

    pdf = tiles.map_batches(pairs_fn, batch_format="pyarrow").to_pandas()
    pdf["skipped_size"] = np.zeros(len(pdf), dtype=np.int64)
    if skipped:
        sent = pd.DataFrame(
            {
                "id_a": np.array(sorted(skipped), dtype=np.int64),
                "id_b": np.full(len(skipped), -1, dtype=np.int64),
                "sim": np.full(len(skipped), np.nan),
                "skipped_size": np.array(
                    [skipped[c] for c in sorted(skipped)], dtype=np.int64
                ),
            }
        )
        pdf = pd.concat([pdf, sent], ignore_index=True)
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
