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


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of word k-shingles (n-gram set of the document)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
        )
    return out


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

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (P,) permutations x (S,) shingles -> min over shingles
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands_out, bh_out, sig_out = [], [], [], []
        r = self.rows_per_band
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sig = self.signature(text)
            sig_bytes = sig.astype("<u8").tobytes()
            for band in range(self.bands):
                chunk = sig[band * r : (band + 1) * r]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(doc_id)
                bands_out.append(band)
                bh_out.append(bh)
                sig_out.append(sig_bytes if band == 0 else None)
        return pd.DataFrame(
            {self.id_col: ids, "band": bands_out, "band_hash": bh_out, "sig": sig_out}
        )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.5,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pa.Table:
    """Candidate near-dup pairs with signature-estimated Jaccard >=
    threshold.  Returns a (small) pa.Table (doc_a, doc_b, est_jaccard):
    pair count is bounded by real near-dup density, not corpus size.
    """
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
        ),
        batch_format="pandas",
        concurrency=concurrency,
    )

    # doc_id -> signature map (band-0 rows only); built per final verify
    # group via the carried sig column, so no driver-side global index.
    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ids = sorted(group[id_col].unique())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    pairs = (
        sigs.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pairs_pdf = pairs.to_pandas()
    if pairs_pdf.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()), "est_jaccard": pa.array([], pa.float64())})
    pairs_pdf = pairs_pdf.drop_duplicates(["doc_a", "doc_b"])

    # verify with full signatures (est. Jaccard = matching minhash ratio)
    sig_pdf = sigs.to_pandas()
    sig_pdf = sig_pdf[sig_pdf["band"] == 0][[id_col, "sig"]]
    sig_map = {
        i: np.frombuffer(s, dtype="<u8") for i, s in zip(sig_pdf[id_col], sig_pdf["sig"])
    }
    est = [
        float((sig_map[x] == sig_map[y]).mean())
        for x, y in zip(pairs_pdf["doc_a"], pairs_pdf["doc_b"])
    ]
    pairs_pdf = pairs_pdf.assign(est_jaccard=np.round(est, 6))
    out = pairs_pdf[pairs_pdf["est_jaccard"] >= threshold].sort_values(["doc_a", "doc_b"])
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
