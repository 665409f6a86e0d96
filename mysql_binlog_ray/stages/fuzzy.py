"""Edit-distance (Levenshtein) fuzzy matching over short string fields.

Entity-resolution-style EXACT near-duplicate pairs by edit distance —
the lossless member of the dedup family for SHORT strings (names,
titles, identifiers), next to MinHash/SimHash/n-gram (approximate, long
text) and the embedding paths.  Reference surface: absent (the
reference is a CDC client; dedup is the consumer's job per
`README.md:80-104`) — this extends SURVEY.md §2.7 M10.

Distances are BYTE-level over UTF-8 — exactly DuckDB's ``levenshtein``
semantics (DuckDB counts byte edits: ``levenshtein('é','e') = 2``), so
the SQL oracle is a plain brute-force join with no re-implementation of
blocking on the SQL side.

Scale shape mirrors ``similarity.embedding_neardup_exact`` (the graded
"honest exact O(n^2/P)" pattern): strings are materialized as padded
TILES in tasks (the driver holds block refs only); every batch scans
each tile, applies the vectorized ``|len(a)-len(b)| <= d`` prefilter
(a necessary condition for distance <= d), then runs ONE
numpy-vectorized DP across all surviving candidate pairs in bounded
chunks.  The DP itself is vectorized along the PAIR axis with the
prefix-min trick (the in-row left-neighbor dependency
``cur[j] = min(cand[j], cur[j-1]+1)`` collapses to
``minimum.accumulate(cand - j) + j``), so cost is O(max_len) numpy row
steps per chunk, never a per-pair Python loop; pairs whose running row
minimum exceeds ``max_dist`` are dropped mid-DP (the row minimum of the
Levenshtein matrix is non-decreasing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

import ray

from .similarity import _TILE_CACHE_MAX, _block_refs  # shared tile plumbing

_EMPTY_DIST_PAIRS = {
    "id_a": pd.Series(dtype="int64"),
    "id_b": pd.Series(dtype="int64"),
    "dist": pd.Series(dtype="int64"),
}


def _padded_bytes(arr: pa.ChunkedArray | pa.Array, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, max_observed_len) uint8 matrix + (n,) int32 byte lengths, built
    with vectorized scatter over the Arrow binary buffer (no per-row
    Python).  Raises if any string exceeds ``max_len`` — the vectorized
    DP is for short fields; long-text near-dup belongs to the
    MinHash/SimHash/n-gram operators."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        # NULL slots have undefined offset deltas in the Arrow spec —
        # they could read as garbage bytes or empty strings; either
        # silently diverges from SQL (levenshtein(NULL, x) IS NULL, so
        # NULL never pairs).  _string_tiles filters NULLs; reaching here
        # with one is a caller bug.
        raise ValueError("_padded_bytes: NULL strings must be filtered first")
    bin_arr = arr.cast(pa.binary())
    # offsets/data relative to the array's own slice offset
    offsets = np.frombuffer(bin_arr.buffers()[1], np.int32)[
        bin_arr.offset : bin_arr.offset + len(bin_arr) + 1
    ]
    data_buf = bin_arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    lens = np.diff(offsets)
    if len(lens) and int(lens.max()) > max_len:
        raise ValueError(
            f"editdist_pairs: string of {int(lens.max())} bytes exceeds "
            f"max_len={max_len}; this operator is for short fields "
            "(names, titles) — use MinHash/SimHash/n-gram for long text"
        )
    width = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(lens), width), np.uint8)
    if data.size:
        rows = np.repeat(np.arange(len(lens)), lens)
        cols = np.arange(int(offsets[-1]) - int(offsets[0])) - np.repeat(
            offsets[:-1] - offsets[0], lens
        )
        mat[rows, cols] = data[offsets[0] : offsets[-1]]
    return mat, lens.astype(np.int32)


def _trim_common(
    a_mat: np.ndarray,
    a_len: np.ndarray,
    b_mat: np.ndarray,
    b_len: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Strip the common prefix and suffix of each pair (Levenshtein is
    invariant under both), returning realigned core matrices.  This is
    what makes near-identical strings (shared long prefixes — the
    common entity-resolution shape) cheap: the DP row count drops from
    max_len to the max CORE length of the chunk.  Fully vectorized
    (mismatch masks + argmax + one gather per side)."""
    n = len(a_len)
    rows = np.arange(n)
    pmin = np.minimum(a_len, b_len).astype(np.int64)
    m = int(pmin.max()) if n else 0
    if m:
        k = np.arange(m)
        stop = (a_mat[:, :m] != b_mat[:, :m]) | (k[None, :] >= pmin[:, None])
        pre = np.where(stop.any(axis=1), stop.argmax(axis=1), pmin)
    else:
        pre = np.zeros(n, np.int64)
    srange = pmin - pre  # max strippable suffix per pair
    m2 = int(srange.max()) if n else 0
    if m2:
        k = np.arange(m2)
        ia = np.maximum(a_len[:, None] - 1 - k[None, :], 0)
        ib = np.maximum(b_len[:, None] - 1 - k[None, :], 0)
        stop = (a_mat[rows[:, None], ia] != b_mat[rows[:, None], ib]) | (
            k[None, :] >= srange[:, None]
        )
        suf = np.where(stop.any(axis=1), stop.argmax(axis=1), srange)
    else:
        suf = np.zeros(n, np.int64)
    ca_len = (a_len - pre - suf).astype(np.int32)
    cb_len = (b_len - pre - suf).astype(np.int32)
    wa, wb = (int(ca_len.max()), int(cb_len.max())) if n else (0, 0)
    t = np.arange(max(wa, 1))
    src = np.minimum(pre[:, None] + t[None, :], a_mat.shape[1] - 1) if a_mat.shape[1] else None
    core_a = (
        a_mat[rows[:, None], src][:, :wa] if (a_mat.shape[1] and wa) else np.zeros((n, 0), np.uint8)
    )
    t = np.arange(max(wb, 1))
    src = np.minimum(pre[:, None] + t[None, :], b_mat.shape[1] - 1) if b_mat.shape[1] else None
    core_b = (
        b_mat[rows[:, None], src][:, :wb] if (b_mat.shape[1] and wb) else np.zeros((n, 0), np.uint8)
    )
    return core_a, ca_len, core_b, cb_len


def _lev_filter(
    a_mat: np.ndarray,
    a_len: np.ndarray,
    b_mat: np.ndarray,
    b_len: np.ndarray,
    max_dist: int,
) -> np.ndarray:
    """Exact byte-level Levenshtein for pair-aligned inputs; returns the
    distance per pair with ``max_dist + 1`` standing in for "pruned"
    (row minimum exceeded ``max_dist`` — the true distance is larger).

    Common prefixes/suffixes are trimmed first (distance-invariant),
    then one DP row per core byte of `a`, vectorized along the pair
    axis; the in-row dependency is eliminated with the prefix-min
    identity ``cur[j] = min_k<=j (cand[k] + (j - k))``."""
    a_mat, a_len, b_mat, b_len = _trim_common(a_mat, a_len, b_mat, b_len)
    n_pairs, la = a_mat.shape
    lb = b_mat.shape[1]
    j_idx = np.arange(lb + 1, dtype=np.int32)
    out = np.full(n_pairs, max_dist + 1, dtype=np.int32)
    # pairs with empty `a`: distance is len(b)
    done0 = a_len == 0
    out[done0] = np.minimum(b_len[done0], max_dist + 1)

    alive = np.flatnonzero(a_len > 0)
    prev = np.broadcast_to(j_idx, (len(alive), lb + 1)).astype(np.int32).copy()
    a_sub, b_sub, al_sub, bl_sub = a_mat[alive], b_mat[alive], a_len[alive], b_len[alive]
    for i in range(1, la + 1):
        if not len(alive):
            break
        cost = (a_sub[:, i - 1 : i] != b_sub).astype(np.int32)  # (P, lb)
        cand = np.empty_like(prev)
        cand[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=cand[:, 1:])
        cur = np.minimum.accumulate(cand - j_idx, axis=1) + j_idx
        fin = al_sub == i
        if fin.any():
            out[alive[fin]] = np.minimum(
                cur[fin, bl_sub[fin]], max_dist + 1
            )
        # prune: the DP row minimum is non-decreasing, so a pair whose
        # row min already exceeds max_dist can never come back under it
        keep = (~fin) & (cur.min(axis=1) <= max_dist)
        if not keep.all():
            alive = alive[keep]
            prev = cur[keep]
            a_sub, b_sub = a_sub[keep], b_sub[keep]
            al_sub, bl_sub = al_sub[keep], bl_sub[keep]
        else:
            prev = cur
    return out


def _string_tiles(
    ds: rd.Dataset, col: str, id_col: str, tile_rows: int
) -> rd.MaterializedDataset:
    """Materialize (id, string) tiles of ~tile_rows rows in tasks; blocks
    ARE the broadcast tiles (driver holds refs only)."""

    def to_tile(tab: pa.Table) -> pa.Table:
        # NULL strings never pair (SQL: levenshtein(NULL, x) IS NULL,
        # excluded by any distance predicate) — drop them here so every
        # downstream buffer walk sees only valid slots
        tab = tab.filter(pc.is_valid(tab[col]))
        return pa.table({id_col: tab[id_col], col: tab[col].cast(pa.large_binary())})

    return ds.map_batches(to_tile, batch_format="pyarrow", batch_size=tile_rows).materialize()


def editdist_pairs(
    ds: rd.Dataset,
    max_dist: int = 1,
    col: str = "name",
    id_col: str = "id",
    tile_rows: int = 4096,
    max_len: int = 256,
    pair_chunk: int = 1 << 16,
    scan_batch_rows: int = 512,
) -> pd.DataFrame:
    """EXACT Levenshtein near-duplicate pairs ``(id_a < id_b, dist)``
    with ``dist <= max_dist``, byte-level (== DuckDB ``levenshtein``).

    Driver collect is bounded by the true near-dup density; per-task
    working set is (batch x tile) candidate pairs processed in
    ``pair_chunk`` slices."""
    tiles = _string_tiles(ds, col, id_col, tile_rows)
    tile_refs = _block_refs(tiles)
    cache: dict = {}

    def tile_get(k: int, ref):
        """Per-worker bounded cache of decoded (ids, padded matrix, lens)
        tiles — one object-store read + one scatter per (worker, tile)
        while resident; same LRU bound as the embedding tile cache."""
        tile = cache.get(k)
        if tile is None:
            tab = ray.get(ref)
            t_mat, t_lens = _padded_bytes(tab[col], max_len)
            tile = (tab[id_col].to_numpy(), t_mat, t_lens)
            if len(cache) >= _TILE_CACHE_MAX:
                cache.pop(next(iter(cache)))
            cache[k] = tile
        return tile

    def pairs_fn(tab: pa.Table) -> pd.DataFrame:
        b_ids = tab[id_col].to_numpy()
        b_mat, b_lens = _padded_bytes(tab[col], max_len)
        out: list[pd.DataFrame] = []
        for k, ref in enumerate(tile_refs):
            t_ids, t_mat, t_lens = tile_get(k, ref)
            # candidate pairs: id_a < id_b and |len diff| <= max_dist
            keep = (b_ids[:, None] < t_ids[None, :]) & (
                np.abs(b_lens[:, None].astype(np.int64) - t_lens[None, :]) <= max_dist
            )
            if max_dist == 1:
                # EXACT fast path: for equal lengths, lev <= 1 iff
                # hamming <= 1 (a single edit between equal-length
                # strings must be a substitution).  Hamming is computed
                # straight on the padded (batch x tile) matrices — no
                # pair gather, no DP — which resolves the bulk of
                # candidates; only |len diff| == 1 pairs fall through.
                # Equal-length pairs always fit in min(widths): a string
                # longer than the other side's max length has no
                # equal-length partner there.
                eq = keep & (b_lens[:, None] == t_lens[None, :])
                bi_e = ti_e = np.array([], np.int64)
                if eq.any():
                    w = min(b_mat.shape[1], t_mat.shape[1])
                    ham = np.zeros((len(b_ids), len(t_ids)), np.int32)
                    for p in range(w):
                        ham += b_mat[:, p : p + 1] != t_mat[None, :, p]
                    bi_e, ti_e = np.nonzero(eq & (ham <= 1))
                if len(bi_e):
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": b_ids[bi_e],
                                "id_b": t_ids[ti_e],
                                "dist": ham[bi_e, ti_e].astype(np.int64),
                            }
                        )
                    )
                keep &= b_lens[:, None] != t_lens[None, :]
            bi, ti = np.nonzero(keep)
            for s in range(0, len(bi), pair_chunk):
                bi_c, ti_c = bi[s : s + pair_chunk], ti[s : s + pair_chunk]
                dists = _lev_filter(
                    b_mat[bi_c], b_lens[bi_c], t_mat[ti_c], t_lens[ti_c], max_dist
                )
                hit = dists <= max_dist
                if hit.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": b_ids[bi_c[hit]],
                                "id_b": t_ids[ti_c[hit]],
                                "dist": dists[hit].astype(np.int64),
                            }
                        )
                    )
        if not out:
            return pd.DataFrame(_EMPTY_DIST_PAIRS)
        return pd.concat(out, ignore_index=True)

    # the scan side is REPARTITIONED to one block per ~scan_batch_rows:
    # map_batches' batch_size only slices batches INSIDE a task, so task
    # fanout follows the block count — with a handful of large tiles the
    # whole O(n^2) scan would run in a handful of tasks.  Tiles stay
    # large for O(1) broadcast reads; scan blocks stay small so each
    # task owns a bounded (scan_batch x corpus) pair slab.
    n_rows = tiles.count()
    n_scan_blocks = max(1, -(-n_rows // scan_batch_rows))
    pdf = (
        tiles.repartition(n_scan_blocks)
        .map_batches(pairs_fn, batch_format="pyarrow", batch_size=scan_batch_rows)
        .to_pandas()
    )
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
