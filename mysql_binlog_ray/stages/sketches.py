"""Mergeable sketches for distributed approximate aggregates.

The pattern (ray_guide "Aggregation at scale"): one sketch per batch in
``map_batches``, then a tiny merge stage — sketches are designed to be
mergeable, so the shuffle carries kilobytes regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


class HyperLogLog:
    """Classic HLL (Flajolet et al. 2007, public algorithm): 2^p
    registers of leading-zero ranks; standard bias correction for the
    small-range regime."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> None:
        """Add pre-hashed uint64 values (vectorized)."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # vectorized leading-zero count via float log2.  float64 rounding
        # can over-estimate log2 by one for values within half an ULP of
        # a power of two (~2^-53 probability per value) — an off-by-one
        # rank the HLL estimate absorbs; not bit-exact, good enough.
        v = rest
        with np.errstate(divide="ignore"):
            lz = np.where(v == 0, 64 - self.p, 63 - np.floor(np.log2(v.astype(np.float64) + 0.5)).astype(np.int64))
        ranks = (np.minimum(lz, 64 - self.p) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, ranks)

    def add_strings(self, values) -> None:
        """Add raw values: vectorized siphash (pandas C kernel with a
        fixed key — deterministic across processes), no per-value Python
        hashing loop."""
        s = pd.Series(values, dtype="object")
        s = s[s.notna()].astype(str)  # NULLs are not members (count-DISTINCT semantics)
        hs = pd.util.hash_pandas_object(
            s, index=False, hash_key="mysql_binlog_hll!"[:16]
        ).to_numpy()
        self.add_hashes(hs.astype(np.uint64))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes, p: int = 12) -> "HyperLogLog":
        return HyperLogLog(p, np.frombuffer(b, dtype=np.uint8).copy())


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Distributed approximate count-distinct: one HLL per batch, merged
    on the driver (each partial is 2^p bytes)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add_strings(batch[col].tolist())
        return pd.DataFrame({"sketch": [h.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    acc = HyperLogLog(p)
    for r in parts:
        acc = acc.merge(HyperLogLog.from_bytes(r["sketch"], p))
    return acc.estimate()


# -- Heavy hitters: Space-Saving summaries (mergeable) ----------------------
#
# Summary semantics (Metwally, Agrawal, El Abbadi 2005; mergeability per
# Agarwal et al. 2013 "Mergeability of Summaries" — public algorithms):
#
#   - ``counts[v] = [u, e]``: upper/lower bracket of v's true count,
#     ``u - e <= true_count(v) <= u``.
#   - ``m``: the ABSENT bound — any value not tracked has true count
#     <= m.  Streaming builds keep m = the largest counter ever evicted;
#     merges add the two sides' absent bounds (and raise m when the
#     merged union is truncated back to k).
#
# Completeness: if ``m <= threshold`` then every value with true count
# > threshold is tracked with u >= true count, so ``candidates()`` is a
# guaranteed SUPERSET of the heavy hitters.

# Hashable sentinel standing in for NULL so NaN (NaN != NaN) can be a
# dict key / heavy-hitter candidate; SQL GROUP BY counts the NULL group.
_NULL = ("__mysql_binlog_ray_null__",)


class SpaceSaving:
    """Bounded heavy-hitters summary: at most ``k`` counters.  Streaming
    inserts via :meth:`add_counts` (classic eviction, lazy-deletion heap
    so eviction is O(log k) amortized, not an O(k) min scan); distributed
    use via :meth:`merge` (upper bounds of values absent from one side
    are inflated by that side's absent bound, preserving the superset
    guarantee — the summaries are provably mergeable)."""

    def __init__(self, k: int = 4096) -> None:
        self.k = k
        self.counts: dict = {}  # value -> [upper_bound, err]
        self.n = 0  # total items observed
        self.m = 0  # absent bound: any untracked value's count <= m
        self._heap: list = []  # lazy-deletion min-heap of (u, value)

    def add_counts(self, values, counts) -> None:
        """Bulk-add pre-aggregated (value, count) pairs (e.g. one
        ``value_counts`` per batch — the per-batch side stays fully
        vectorized; this walk touches distinct values only)."""
        import heapq

        c, heap = self.counts, self._heap
        for v, cnt in zip(values, counts):
            cnt = int(cnt)
            self.n += cnt
            cur = c.get(v)
            if cur is not None:
                cur[0] += cnt
                heapq.heappush(heap, (cur[0], id(v), v))
            else:
                if len(c) >= self.k:
                    # evict the current min-u entry (skip stale heap rows)
                    while True:
                        u, _, w = heapq.heappop(heap)
                        ce = c.get(w)
                        if ce is not None and ce[0] == u:
                            del c[w]
                            self.m = max(self.m, u)
                            break
                u = cnt + self.m
                c[v] = [u, self.m]
                heapq.heappush(heap, (u, id(v), v))
        if len(heap) > 8 * self.k:  # compact stale entries
            heap[:] = [(ce[0], id(v), v) for v, ce in c.items()]
            heapq.heapify(heap)

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Mergeable-summaries fold: a value absent from one side may
        have had up to that side's absent bound there, so its merged
        upper bound (and err) absorb it; truncating the union back to k
        raises the absent bound to the largest dropped upper bound."""
        out = SpaceSaving(self.k)
        out.n = self.n + other.n
        a, b, ma, mb = self.counts, other.counts, self.m, other.m
        comb: dict = {}
        for v, (u, e) in a.items():
            ub, eb = b.get(v, (mb, mb))
            comb[v] = [u + ub, e + eb]
        for v, (u, e) in b.items():
            if v not in a:
                comb[v] = [u + ma, e + ma]
        m = ma + mb
        if len(comb) > out.k:
            ordered = sorted(comb.items(), key=lambda kv: kv[1][0], reverse=True)
            m = max(m, ordered[out.k][1][0])
            comb = dict(ordered[: out.k])
        out.counts = comb
        out.m = m
        return out

    def candidates(self, threshold: int) -> list:
        """Values whose count UPPER bound exceeds threshold — a
        guaranteed superset of the true heavy hitters whenever
        :meth:`is_complete_above` holds."""
        return [v for v, (u, _) in self.counts.items() if u > threshold]

    def is_complete_above(self, threshold: int) -> bool:
        """True iff no untracked value can exceed ``threshold`` (absent
        bound m <= threshold) — the exact validity condition for the
        two-pass exact heavy-hitter plan."""
        return self.m <= threshold

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            (self.k, list(self.counts.items()), self.n, self.m), protocol=4
        )

    @staticmethod
    def from_bytes(b: bytes) -> "SpaceSaving":
        import pickle

        k, items, n, m = pickle.loads(b)
        out = SpaceSaving(k)
        out.counts = {v: list(ue) for v, ue in items}
        out.n, out.m = n, m
        return out


def _fold_sketches(payloads, k: int) -> SpaceSaving:
    acc = SpaceSaving(k)
    for b in payloads:
        acc = acc.merge(SpaceSaving.from_bytes(b))
    return acc


def space_saving_sketch(ds: rd.Dataset, col: str, k: int = 4096) -> SpaceSaving:
    """Distributed Space-Saving sketch of ``col``: one EXACT top-k
    summary per block (``value_counts`` is exact within a block, so the
    block summary has err 0 and absent bound = the largest dropped
    count), one tree-merge level in tasks, then a driver fold over the
    per-task partials — the driver sees O(tasks x k) counters, never the
    distinct-value space.  NULL rows count as one group (SQL GROUP BY
    parity), carried as the hashable ``_NULL`` sentinel."""

    def block_summary(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts(dropna=False)  # sorted desc
        sk = SpaceSaving(k)
        sk.n = int(vc.sum())
        if len(vc) > k:
            sk.m = int(vc.iloc[k])  # largest dropped exact count
            vc = vc.iloc[:k]
        vals = vc.index.to_numpy(dtype=object)
        nulls = pd.isna(vals)
        if nulls.any():
            vals = vals.copy()
            # value_counts(dropna=False) folds all NAs into one entry;
            # per-index assignment (vals[nulls] = _NULL would broadcast
            # the tuple's ELEMENTS into the object array)
            for i in np.flatnonzero(nulls):
                vals[i] = _NULL
        sk.counts = {v: [int(c), 0] for v, c in zip(vals, vc.to_numpy())}
        return pd.DataFrame({"sketch": [sk.to_bytes()]})

    def tree_merge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"sketch": [_fold_sketches(batch["sketch"].tolist(), k).to_bytes()]}
        )

    partials = ds.map_batches(block_summary, batch_format="pandas").map_batches(
        tree_merge, batch_format="pandas", batch_size=64
    )
    rows = partials.take_all()
    return _fold_sketches((r["sketch"] for r in rows), k)


def exact_heavy_hitters(
    ds: rd.Dataset, col: str, threshold: int, k: int = 4096
) -> pd.DataFrame:
    """EXACT frequent items via the classic two-pass shape: pass 1 is a
    distributed Space-Saving sketch (kilobytes per task to the driver)
    yielding a candidate SUPERSET; pass 2 exact-counts only the
    candidates (broadcast membership filter + pre-aggregated groupby).
    Output == ``GROUP BY col HAVING count(*) > threshold`` including the
    NULL group (returned as NaN).

    Falls back to a full exact groupby when the sketch's absent bound
    exceeds the threshold (candidate set provably complete otherwise)."""
    import ray

    from .relational import preagg_groupby

    sk = space_saving_sketch(ds, col, k)
    null_hh = False
    if sk.is_complete_above(threshold):
        cand = set(sk.candidates(threshold))
        if _NULL in cand:
            cand.discard(_NULL)
            null_hh = True  # candidate only; exact-counted below
        if not cand and not null_hh:
            return pd.DataFrame(
                {col: pd.Series(dtype="float64"), "n": pd.Series(dtype="int64")}
            )
    else:
        cand = None  # guarantee void: exact-count everything (means k was
        null_hh = True  # sized too small for this threshold/N)

    filtered = ds
    if cand is not None:
        ref = ray.put(np.array(sorted(cand)))
        cache: dict = {}

        def keep(batch: pd.DataFrame) -> pd.DataFrame:
            arr = cache.get("a")
            if arr is None:
                arr = cache["a"] = ray.get(ref)
            return batch[np.isin(batch[col].to_numpy(), arr)]

        filtered = ds.map_batches(keep, batch_format="pandas")
    else:

        def keep(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[col].notna()]

        filtered = ds.map_batches(keep, batch_format="pandas")

    counts = preagg_groupby(filtered, [col], {"n": (None, "count")}).to_pandas()
    if counts.empty:
        counts = pd.DataFrame({col: pd.Series(dtype="float64"), "n": pd.Series(dtype="int64")})
    out = counts[counts["n"] > threshold]
    if null_hh:
        # exact NULL count via a tiny per-batch partial sum (NULL group
        # keys don't round-trip Ray's groupby; count it out-of-band)
        n_null = sum(
            int(b["c"].sum())
            for b in ds.map_batches(
                lambda b: pd.DataFrame({"c": [int(b[col].isna().sum())]}),
                batch_format="pandas",
            ).iter_batches(batch_format="pandas")
        )
        if n_null > threshold:
            out = pd.concat(
                [out, pd.DataFrame({col: [np.nan], "n": [n_null]})],
                ignore_index=True,
            )
    return out.sort_values(col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom filter + incremental (reference-corpus) dedup
# ---------------------------------------------------------------------------

_BLOOM_HASH_KEY = "mysql_binlog_blm!"[:16]


def _bloom_hash_strings(values: pd.Series) -> np.ndarray:
    """Deterministic vectorized uint64 hash of a string series (same
    pandas siphash C kernel the HLL uses, distinct fixed key)."""
    s = values.fillna("").astype(str)
    return pd.util.hash_pandas_object(
        s, index=False, hash_key=_BLOOM_HASH_KEY
    ).to_numpy().astype(np.uint64)


class BloomFilter:
    """Mergeable Bloom filter (Bloom 1970): ``m_bits`` bit array,
    ``k`` probes per key via double hashing (Kirsch & Mitzenmacher
    2006: idx_i = h1 + i*h2 — full independence not required).  No
    false negatives; false-positive rate ~ (1 - e^{-kn/m})^k, so size
    ``m_bits`` at ~10 bits per expected key for ~1% FP.  Merge = OR,
    so per-batch partials tree-merge exactly like the other sketches."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 6, bits: np.ndarray | None = None) -> None:
        if m_bits % 8:
            raise ValueError("m_bits must be a multiple of 8")
        self.m = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)

    def _idx(self, h: np.ndarray) -> np.ndarray:
        from .split import splitmix64

        h1 = h.astype(np.uint64)
        with np.errstate(over="ignore"):
            h2 = splitmix64(h1) | np.uint64(1)
            # (k, n) probe positions
            i = np.arange(self.k, dtype=np.uint64)[:, None]
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        idx = self._idx(h).ravel()
        np.bitwise_or.at(self.bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = definitely absent."""
        if not len(h):
            return np.zeros(0, dtype=bool)
        idx = self._idx(h)
        set_ = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return set_.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        return BloomFilter(self.m, self.k, np.bitwise_or(self.bits, other.bits))

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, k: int = 6) -> "BloomFilter":
        bits = np.frombuffer(b, dtype=np.uint8).copy()
        return cls(len(bits) * 8, k, bits)


def build_bloom(ds: rd.Dataset, col: str, m_bits: int = 1 << 23, k: int = 6) -> BloomFilter:
    """Distributed Bloom build over a string column: one partial filter
    per batch, one OR tree-merge level in tasks, driver folds the
    per-task partials — O(tasks x m/8) driver bytes, never the corpus.
    Sizing: ``m_bits`` ~ 10x the expected key count (so a 10^9-key
    reference corpus needs a ~1.25 GB filter — still one ``ray.put``
    broadcast, shared zero-copy by every worker on a node)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, k)
        bf.add_hashes(_bloom_hash_strings(batch[col]))
        return pd.DataFrame({"bloom": [bf.to_bytes()]})

    def tree_or(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for b in batch["bloom"]:
            np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame({"bloom": [acc.tobytes()]})

    # batch_size=None = one batch per block => ONE m/8-byte partial per
    # input block (not per 1024-row default batch — at the docstring's
    # 10^9-key sizing a per-batch partial would amplify the input by
    # ~1 KB/row before the merge tree ever ran)
    parts = ds.map_batches(
        partial, batch_format="pandas", batch_size=None
    ).map_batches(tree_or, batch_format="pandas", batch_size=32)
    acc = BloomFilter(m_bits, k)
    for row in parts.take_all():
        acc = acc.merge(BloomFilter.from_bytes(row["bloom"], k))
    return acc


def incremental_dedup(
    new_ds: rd.Dataset,
    corpus_ds: rd.Dataset,
    text_col: str = "text",
    m_bits: int = 1 << 23,
    k: int = 6,
) -> rd.Dataset:
    """EXACT incremental dedup against a reference corpus: keep the new
    documents whose ``text_col`` does not appear verbatim in
    ``corpus_ds`` (the standard "new crawl vs what we already trained
    on" pass).  Output: the surviving new rows (all input columns).

    Scale shape (two-pass, no all-to-all):
      1. stream the corpus ONCE into a Bloom filter (hashes only);
      2. probe new docs — Bloom-negative rows are DEFINITELY new (no
         false negatives) and pass through untouched; only the
         maybe-duplicate candidates (true dups + ~1% FP) continue;
      3. broadcast the candidate hash set, stream the corpus a second
         time keeping only rows whose hash collides, broadcast THOSE
         texts, and exact-compare candidate texts against them.
    The driver/broadcast volume is bounded by candidate density
    (dup rate + FP rate), never O(corpus).  For adversarial dup
    density route both sides through ``relational.keyed_reduce``
    keyed on the text hash instead.
    """
    import ray

    from .relational import broadcast_once

    bloom = build_bloom(corpus_ds, text_col, m_bits, k)
    bloom_ref = ray.put(bloom.to_bytes())
    cache: dict = {}

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        bf = cache.get("bf")
        if bf is None:
            bf = cache["bf"] = BloomFilter.from_bytes(ray.get(bloom_ref), k)
        maybe = bf.contains_hashes(_bloom_hash_strings(batch[text_col]))
        out = batch.copy()
        out["_maybe_dup"] = maybe
        return out

    probed = new_ds.map_batches(probe, batch_format="pandas").materialize()
    cand = probed.filter(expr="_maybe_dup == True")

    # candidate hashes -> which corpus rows could collide (tiny by
    # construction; the driver holds hashes, 8 bytes per candidate)
    cand_hash_rows = cand.map_batches(
        lambda b: pd.DataFrame({"h": np.unique(_bloom_hash_strings(b[text_col]))}),
        batch_format="pandas",
    ).take_all()
    cand_hashes = np.unique(np.array([r["h"] for r in cand_hash_rows], dtype=np.uint64))
    if not len(cand_hashes):  # no maybe-dups at all: everything is new
        return probed.drop_columns(["_maybe_dup"])

    get_cand = broadcast_once(cand_hashes)

    def corpus_hits(batch: pd.DataFrame) -> pd.DataFrame:
        hs = _bloom_hash_strings(batch[text_col])
        hit = np.isin(hs, get_cand())
        return pd.DataFrame({"t": batch[text_col].fillna("").to_numpy()[hit]})

    hit_texts = pd.unique(
        corpus_ds.map_batches(corpus_hits, batch_format="pandas").to_pandas()["t"]
    )
    get_texts = broadcast_once(hit_texts, prepare=pd.Index)

    def confirm(batch: pd.DataFrame) -> pd.DataFrame:
        keep = ~batch["_maybe_dup"].to_numpy()
        m = ~keep
        if m.any():
            dup = get_texts().get_indexer(batch[text_col].fillna("").to_numpy()[m]) >= 0
            keep[np.flatnonzero(m)[~dup]] = True
        return batch[keep].drop(columns=["_maybe_dup"])

    return probed.map_batches(confirm, batch_format="pandas")


def _hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate over a (groups, m) register matrix — the
    same math as :meth:`HyperLogLog.estimate`, no per-group Python."""
    g, m = regs.shape
    alpha = 0.7213 / (1 + 1.079 / m)
    inv = np.exp2(-regs.astype(np.float64)).sum(axis=1)
    e = alpha * m * m / inv
    zeros = (regs == 0).sum(axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.where(zeros == 0, 1, zeros))
    return np.where(small, lin, e)


def approx_distinct_per_group(
    ds: rd.Dataset,
    keys: list[str],
    col: str,
    p: int = 12,
    out_col: str = "approx_distinct",
    num_parts: int | None = None,
) -> rd.Dataset:
    """GROUPED approximate count-distinct: ``approx_count_distinct(col)
    GROUP BY keys`` as mergeable HLL sketches.

    Scale shape: each batch emits one 2^p-byte sketch row per key it
    contains (the shuffle carries sketches, never values); ONE keyed
    exchange (``relational.keyed_reduce``); the per-partition merge
    stacks each key's sketch bytes into a (rows, m) uint8 matrix and
    folds with ``np.maximum.reduceat`` — group cardinality never appears
    in a Python loop.  Estimates are computed vectorized across groups.
    NULL values are not members (SQL count-DISTINCT); NULL keys form one
    group (SQL GROUP BY).  A group whose values are ALL NULL emits no
    partial sketch and therefore no output row (SQL would emit it with
    count 0) — union a count(*) groupby if empty groups must surface."""
    from .relational import keyed_reduce

    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        nn = batch[batch[col].notna()]
        if len(nn) == 0:
            return pd.DataFrame(
                {**{k: pd.Series([], dtype=batch[k].dtype) for k in keys},
                 "_sk": pd.Series([], dtype=object)}
            )
        hs = pd.util.hash_pandas_object(
            nn[col].astype(str), index=False, hash_key="mysql_binlog_hll!"[:16]
        ).to_numpy().astype(np.uint64)
        codes = nn.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        order = np.argsort(codes, kind="stable")
        codes_s, hs_s = codes[order], hs[order]
        starts = np.flatnonzero(np.diff(codes_s, prepend=-1))
        # one register matrix for every key in this batch, filled with a
        # single grouped scatter-max
        gidx = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(codes_s))))
        regs = np.zeros((len(starts), m), dtype=np.uint8)
        idx = (hs_s >> np.uint64(64 - p)).astype(np.int64)
        rest = hs_s << np.uint64(p)
        with np.errstate(divide="ignore"):
            lz = np.where(
                rest == 0,
                64 - p,
                63 - np.floor(np.log2(rest.astype(np.float64) + 0.5)).astype(np.int64),
            )
        ranks = (np.minimum(lz, 64 - p) + 1).astype(np.uint8)
        np.maximum.at(regs, (gidx, idx), ranks)
        first_rows = nn.iloc[order[starts]]
        out = {k: first_rows[k].to_numpy() for k in keys}
        out["_sk"] = list(regs.tobytes()[i * m : (i + 1) * m] for i in range(len(starts)))
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {**{k: pd.Series([], dtype=g[k].dtype) for k in keys},
                 out_col: pd.Series([], dtype=np.int64)}
            )
        codes = g.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        order = np.argsort(codes, kind="stable")
        g = g.iloc[order]
        codes = codes[order]
        regs = np.frombuffer(b"".join(g["_sk"]), dtype=np.uint8).reshape(-1, m)
        starts = np.flatnonzero(np.diff(codes, prepend=-1))
        merged = np.maximum.reduceat(regs, starts, axis=0)
        est = np.rint(_hll_estimate_rows(merged)).astype(np.int64)
        first_rows = g.iloc[starts]
        out = {k: first_rows[k].to_numpy() for k in keys}
        out[out_col] = est
        return pd.DataFrame(out)

    return keyed_reduce(parts, keys, combine, num_parts=num_parts)


class MrlQuantileSketch:
    """Deterministic mergeable quantile sketch (Manku–Rajagopalan–
    Lindsay collapse rule: two full level-``l`` buffers merge-sort and
    keep alternate elements as one level-``l+1`` buffer of weight
    ``2^(l+1)``).  Rank error is O(log^2(n/k) / k) — with k=1024 well
    under 1% rank error at millions of rows — and the structure is a
    mergeable summary: merging per-block sketches equals (up to the same
    bound) sketching the concatenation.  Deterministic given a fold
    order (no KLL coin flips), so the driver folds partials in sorted
    partition order for run-to-run stability; the bound itself holds for
    ANY fold order.

    Storage: ``levels[l]`` is ONE sorted float64 array; every compaction
    is vectorized (np.sort + strided slice), no per-item Python."""

    def __init__(self, k: int = 1024) -> None:
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0  # total weight (rows observed)
        self._parity = 0  # alternating compaction offset

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.sort(np.concatenate([self.levels[0], v]))
        self._compact()

    def _compact(self) -> None:
        l = 0
        while l < len(self.levels):
            buf = self.levels[l]
            if len(buf) < 2 * self.k:
                l += 1
                continue
            # classic MRL collapse: promote alternate elements of the
            # whole sorted buffer (even count; at most one element stays
            # behind), alternating the offset between compactions to
            # balance rank bias
            promote_n = len(buf) & ~1
            head, tail = buf[:promote_n], buf[promote_n:]
            picked = head[self._parity :: 2]
            self._parity ^= 1
            self.levels[l] = tail
            if l + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            up = self.levels[l + 1]
            self.levels[l + 1] = np.sort(np.concatenate([up, picked]))
            l += 1

    def merge(self, other: "MrlQuantileSketch") -> "MrlQuantileSketch":
        out = MrlQuantileSketch(self.k)
        out.n = self.n + other.n
        out._parity = self._parity ^ other._parity
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for l in range(depth):
            a = self.levels[l] if l < len(self.levels) else np.empty(0, np.float64)
            b = other.levels[l] if l < len(other.levels) else np.empty(0, np.float64)
            out.levels.append(np.sort(np.concatenate([a, b])))
        out._compact()
        return out

    def quantiles(self, qs: list[float]) -> list[float]:
        """Weighted-rank picks (``quantile_disc`` style: smallest sketch
        element whose cumulative weight reaches q * n)."""
        if self.n == 0:
            return [float("nan")] * len(qs)
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(b), 1 << l, np.int64) for l, b in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1]
        out = []
        for q in qs:
            target = max(1, int(np.ceil(q * total - 1e-9)))
            out.append(float(vals[np.searchsorted(cum, target)]))
        return out

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.n, self._parity, self.levels), protocol=4)

    @staticmethod
    def from_bytes(b: bytes) -> "MrlQuantileSketch":
        import pickle

        k, n, parity, levels = pickle.loads(b)
        out = MrlQuantileSketch(k)
        out.n, out._parity, out.levels = n, parity, levels
        return out


def quantile_sketch(ds: rd.Dataset, col: str, k: int = 1024) -> MrlQuantileSketch:
    """Distributed MRL quantile sketch of ``col``: one sketch per block
    (vectorized sort-based inserts), a tree-merge level in tasks, then a
    deterministic driver fold over O(tasks) partials of O(k log) floats
    each — the driver never sees the data.  NULL/NaN values are ignored
    (SQL aggregate semantics)."""

    def block_sketch(batch: pd.DataFrame) -> pd.DataFrame:
        sk = MrlQuantileSketch(k)
        sk.add(batch[col].to_numpy(dtype=np.float64, na_value=np.nan))
        return pd.DataFrame({"sketch": [sk.to_bytes()]})

    def tree_merge(batch: pd.DataFrame) -> pd.DataFrame:
        acc = MrlQuantileSketch(k)
        for b in batch["sketch"].tolist():
            acc = acc.merge(MrlQuantileSketch.from_bytes(b))
        return pd.DataFrame({"sketch": [acc.to_bytes()]})

    partials = ds.map_batches(block_sketch, batch_format="pandas").map_batches(
        tree_merge, batch_format="pandas", batch_size=64
    )
    rows = partials.take_all()
    acc = MrlQuantileSketch(k)
    for b in sorted(r["sketch"] for r in rows):  # deterministic fold order
        acc = acc.merge(MrlQuantileSketch.from_bytes(b))
    return acc


def quantile_sketch_per_group(
    ds: rd.Dataset,
    keys: list[str],
    col: str,
    qs: list[float],
    k: int = 1024,
    out_cols: list[str] | None = None,
) -> rd.Dataset:
    """GROUPED mergeable quantiles: ``quantile_disc(col, q) GROUP BY
    keys`` as per-group MRL sketches — the bounded-state scale path next
    to the exact ``relational.group_percentiles`` (which shuffles every
    value; this shuffles O(k log n) floats per group).

    Below capacity (group rows < 2k) the sketch never compacts and the
    answers are EXACT ``quantile_disc`` — the regime the SQL oracle
    checks; the approximate regime is bound-checked in
    ``TestMrlQuantileSketch``.  NULL values are ignored (SQL aggregate
    semantics); NULL keys form one group; a group whose values are ALL
    NULL is still emitted, with NULL (NaN) quantiles and n=0 — matching
    SQL GROUP BY and the ``group_percentiles`` convention.

    Scale shape: each batch emits one serialized sketch per key it
    contains (the shuffle carries sketches, never values); ONE keyed
    exchange (``relational.keyed_reduce``); per-partition folds loop
    over DISTINCT groups only, each fold a vectorized merge."""
    from .relational import keyed_reduce, pct_col_names

    out_cols = out_cols or pct_col_names(qs)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        nn = batch  # keep NULL-value rows: MrlQuantileSketch.add drops
        # NaN itself, and an all-NULL group must still emit its (empty)
        # sketch so the group surfaces with NULL quantiles
        if len(nn) == 0:
            return pd.DataFrame(
                {**{kc: pd.Series([], dtype=batch[kc].dtype) for kc in keys},
                 "_qsk": pd.Series([], dtype=object)}
            )
        codes = nn.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        order = np.argsort(codes, kind="stable")
        vals = nn[col].to_numpy(dtype=np.float64, na_value=np.nan)[order]
        codes_s = codes[order]
        starts = np.flatnonzero(np.diff(codes_s, prepend=-1))
        ends = np.append(starts[1:], len(codes_s))
        sks = []
        for s, e in zip(starts, ends):  # loop over DISTINCT groups only
            sk = MrlQuantileSketch(k)
            sk.add(vals[s:e])
            sks.append(sk.to_bytes())
        first_rows = nn.iloc[order[starts]]
        out = {kc: first_rows[kc].to_numpy() for kc in keys}
        out["_qsk"] = sks
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            **{kc: pd.Series([], dtype=g[kc].dtype) for kc in keys},
            **{oc: pd.Series([], dtype=np.float64) for oc in out_cols},
            "n": pd.Series([], dtype=np.int64),
        }
        if len(g) == 0:
            return pd.DataFrame(empty)
        codes = g.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        order = np.argsort(codes, kind="stable")
        g = g.iloc[order]
        codes = codes[order]
        starts = np.flatnonzero(np.diff(codes, prepend=-1))
        ends = np.append(starts[1:], len(codes))
        rows: dict = {oc: [] for oc in out_cols}
        ns = []
        payloads = g["_qsk"].tolist()
        for s, e in zip(starts, ends):
            acc = None
            for b in sorted(payloads[s:e]):  # deterministic fold order
                sk = MrlQuantileSketch.from_bytes(b)
                acc = sk if acc is None else acc.merge(sk)
            est = acc.quantiles(qs)
            for oc, v in zip(out_cols, est):
                rows[oc].append(v)
            ns.append(acc.n)
        first_rows = g.iloc[starts]
        out = {kc: first_rows[kc].to_numpy() for kc in keys}
        ns_arr = np.array(ns, np.int64)
        empty_groups = ns_arr == 0
        for oc in out_cols:
            picked = pd.Series(np.array(rows[oc], np.float64))
            if empty_groups.any():
                # all-NULL group: true typed NULL quantiles, not NaN
                # floats — the group_percentiles / SQL-oracle convention
                # (an Arrow-nullity comparison flags NaN-for-NULL cells)
                picked = picked.convert_dtypes()
                picked[empty_groups] = pd.NA
            out[oc] = picked
        out["n"] = ns_arr
        return pd.DataFrame(out)

    return keyed_reduce(parts, keys, combine)
