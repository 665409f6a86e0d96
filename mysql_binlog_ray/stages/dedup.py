"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (per the brief / ray_guide "Aggregation at scale"):

- **exact**: content hash added vectorized in ``map_batches`` -> partial
  (min id, count) per batch -> tiny groupby over partials.  The shuffle
  carries hashes, never document bodies.
- **MinHash LSH**: per-batch signature computation (numpy) -> explode to
  (band, band_hash, doc_id) rows -> groupby band buckets -> candidate
  pairs -> signature-estimated Jaccard filter.  Documents are never
  pairwise-compared outside LSH buckets.
- **SimHash**: 64-bit signatures, banded into 4x16-bit chunks; pairs
  within a chunk bucket are verified by Hamming distance.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _md5_series(s: pd.Series) -> pd.Series:
    return s.map(lambda x: hashlib.md5(x.encode()).hexdigest())


def exact_dedup_stats(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize_prefix_tokens: int | None = None,
) -> rd.Dataset:
    """Per distinct content: (text_md5, keep_id=min id, n_copies).

    ``normalize_prefix_tokens`` dedups on the first N whitespace tokens
    (near-exact prefix dedup) instead of the full text.
    """
    npt = normalize_prefix_tokens

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        if npt is not None:
            t = t.str.split().str[:npt].str.join(" ")
        h = _md5_series(t)
        g = pd.DataFrame({"text_md5": h, id_col: batch[id_col]}).groupby(
            "text_md5", sort=False
        )
        out = g.agg(keep_id=(id_col, "min"), n_copies=(id_col, "size"))
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Min, Sum

    return partials.groupby("text_md5").aggregate(
        Min("keep_id", alias_name="keep_id"), Sum("n_copies", alias_name="n_copies")
    )


def exact_dedup(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Keep one row (min id) per distinct content: hash-partitioned
    group-first (ray_guide exact-dedup pattern), bodies shuffled once."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_h"] = _md5_series(batch[text_col].fillna(""))
        return batch

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1).drop(columns=["_h"])

    return hashed.groupby("_h").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_POLY_B = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int, _word_cache: dict | None = None) -> np.ndarray:
    """64-bit hashes of word k-shingles, vectorized: each word hashed once
    (cached), shingle hash = degree-k polynomial over the word hashes —
    no per-shingle cryptographic hashing."""
    words = text.split()
    if not words:
        return np.zeros(1, dtype=np.uint64)
    cache = _word_cache if _word_cache is not None else {}
    h = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        v = cache.get(w)
        if v is None:
            v = cache[w] = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
            )
        h[i] = v
    if len(words) < k:
        k = len(words)
    n = len(words) - k + 1
    s = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        s = s * _POLY_B + h[j : n + j]
    return s


class MinHasher:
    """Per-batch MinHash signatures (actor: permutation params built once).

    Output: one row per (doc, band): ``(doc_id, band, band_hash)`` plus a
    signature column carried on band 0 for later Jaccard estimation.
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 128,
        bands: int = 32,
        shingle_k: int = 5,
    ) -> None:
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)

    def signature(self, text: str, word_cache: dict | None = None) -> np.ndarray:
        sh = _shingle_hashes(text, self.k, word_cache)
        # (P,) permutations x (S,) shingles -> min over shingles
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        word_cache: dict = {}  # per-batch word-hash memo
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        texts = batch[self.text_col].fillna("")
        for i, text in enumerate(texts):
            sigs[i] = self.signature(text, word_cache)
        # band keys: polynomial over each band's rows, fully vectorized
        banded = sigs.reshape(n, self.bands, self.rows_per_band)
        keys = np.zeros((n, self.bands), dtype=np.uint64)
        for j in range(self.rows_per_band):
            keys = keys * _POLY_B + banded[:, :, j]
        ids = np.repeat(batch[self.id_col].to_numpy(), self.bands)
        bands_out = np.tile(np.arange(self.bands, dtype=np.int64), n)
        # single int64 bucket key: band in the top bits, hash truncated to
        # 50 bits.  Ray's groupby round-trips keys through float64, which
        # silently corrupts full 64-bit values — 50 bits survive exactly
        # (and 2^50 bucket space keeps collisions negligible).
        hash50 = (keys.reshape(-1) & np.uint64((1 << 50) - 1)).astype(np.int64)
        bucket = (np.repeat(np.arange(self.bands, dtype=np.int64), 1)[bands_out] << 50) | hash50
        return pd.DataFrame({self.id_col: ids, "bucket": bucket})


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.5,
    concurrency: int | tuple[int, int] | None = None,
) -> pa.Table:
    """Near-dup pairs with signature-estimated Jaccard >= threshold.

    Scale shape: (1) slim ``(doc_id, band, band_hash)`` rows from a
    vectorized signature stage; (2) a count aggregate finds buckets with
    >1 member (collision buckets are rare — their count is bounded by
    near-dup density, not corpus size); (3) only collision-bucket rows
    are collected and paired; (4) only candidate documents have their
    signatures recomputed for the Jaccard estimate.  No per-bucket
    map_groups, no signature bytes through the shuffle.
    """
    hasher_kwargs = dict(
        text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=hasher_kwargs,
        batch_format="pandas",
        concurrency=concurrency or (1, 8),
    )
    mat = sigs.materialize()  # slim (id, bucket) rows, reused twice below

    # bucket occupancy: per-batch partial counts merged on the driver
    # (pre-agg pattern; partials are bounded by distinct buckets, and a
    # collision bucket must appear with n>1 somewhere or split across
    # partials — both covered by summing partials)
    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["bucket"].value_counts()
        return pd.DataFrame({"bucket": vc.index.to_numpy(), "n": vc.to_numpy()})

    parts = mat.map_batches(partial_counts, batch_format="pandas").to_pandas()
    totals = parts.groupby("bucket")["n"].sum()
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )
    hot_keys = set(totals[totals > 1].index)
    if not hot_keys:
        return empty

    def in_hot(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["bucket"].isin(hot_keys)]

    cand = mat.map_batches(in_hot, batch_format="pandas").to_pandas()
    pairs = (
        cand.merge(cand, on=["bucket"], suffixes=("_a", "_b"))
        .query(f"{id_col}_a < {id_col}_b")[[f"{id_col}_a", f"{id_col}_b"]]
        .drop_duplicates()
        .rename(columns={f"{id_col}_a": "doc_a", f"{id_col}_b": "doc_b"})
    )
    if pairs.empty:
        return empty

    # verify: signatures recomputed for candidate docs only
    cand_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])

    def only_cands(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[id_col].isin(cand_ids)]

    docs = ds.map_batches(only_cands, batch_format="pandas").to_pandas()
    mh = MinHasher(**hasher_kwargs)
    word_cache: dict = {}
    sig_map = {
        i: mh.signature(t, word_cache)
        for i, t in zip(docs[id_col], docs[text_col].fillna(""))
    }
    est = [
        float((sig_map[x] == sig_map[y]).mean())
        for x, y in zip(pairs["doc_a"], pairs["doc_b"])
    ]
    pairs = pairs.assign(est_jaccard=np.round(est, 6))
    out = pairs[pairs["est_jaccard"] >= threshold].sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per document + 4x16-bit band keys for bucketing."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col, self.id_col = text_col, id_col

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w in set(words):
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
            acc += bits * 2 - 1
        return int(sum(1 << i for i in range(64) if acc[i] > 0))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_band, rows_key, rows_sim = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sh = self.simhash(text)
            for band in range(4):
                rows_id.append(doc_id)
                rows_band.append(band)
                rows_key.append((sh >> (band * 16)) & 0xFFFF)
                rows_sim.append(sh)
        return pd.DataFrame(
            {self.id_col: rows_id, "band": rows_band, "band_key": rows_key, "simhash": rows_sim}
        )


def simhash_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pa.Table:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.  Any pair
    within distance <=3 agrees exactly on at least one of the 4 bands
    (pigeonhole), so bucketing by band key finds all of them."""
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = group.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.uint64)
        a, b, hd = [], [], []
        for i in range(len(ids)):
            x = np.bitwise_xor(sims[i + 1 :], sims[i])
            cnt = np.vectorize(lambda v: bin(int(v)).count("1"))(x) if len(x) else np.array([])
            for j, c in enumerate(cnt):
                a.append(int(ids[i]))
                b.append(int(ids[i + 1 + j]))
                hd.append(int(c))
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": hd})

    pairs = sigs.groupby(["band", "band_key"]).map_groups(bucket_pairs, batch_format="pandas")
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()), "hamming": pa.array([], pa.int64())})
    out = (
        pdf[pdf["hamming"] <= max_hamming]
        .drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# brute-force n-gram Jaccard (small inputs / test oracle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Exact pairwise Jaccard over word k-shingle sets — O(n^2), intended
    as the verification oracle for the LSH operators at test scale."""
    ids = df[id_col].tolist()
    sets = [
        set(
            " ".join(ws[i : i + shingle_k])
            for ws in [t.split()]
            for i in range(max(1, len(ws) - shingle_k + 1))
        )
        for t in df[text_col].fillna("")
    ]
    a, b, jc = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j]) or 1
            v = inter / union
            if v >= threshold:
                x, y = sorted((ids[i], ids[j]))
                a.append(x)
                b.append(y)
                jc.append(round(v, 6))
    return pd.DataFrame({"doc_a": a, "doc_b": b, "jaccard": jc})


# ---------------------------------------------------------------------------
# near-dup clusters (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def connected_components(pairs: pd.DataFrame, a: str = "doc_a", b: str = "doc_b") -> pd.DataFrame:
    """Union-find over the (small) verified near-dup pair set -> one
    cluster id (the minimum member id) per involved document.

    The pair set is bounded by real near-dup density, not corpus size,
    so a driver-side union-find is the right tool (ray_guide: "union-find
    on the driver only if the candidate set is provably small"); for
    pathological densities run min-label propagation rounds instead.
    """
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs[a], pairs[b]):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    rows = sorted((node, find(node)) for node in parent)
    return pd.DataFrame({"doc_id": [r[0] for r in rows], "cluster_id": [r[1] for r in rows]})


def minhash_dedup_clusters(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    **kwargs: Any,
) -> pa.Table:
    """End-to-end near-dup clustering: MinHash-LSH pairs -> connected
    components -> (doc_id, cluster_id)."""
    pairs = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col, threshold=threshold, **kwargs).to_pandas()
    comp = connected_components(pairs)
    return pa.Table.from_pandas(comp, preserve_index=False)
