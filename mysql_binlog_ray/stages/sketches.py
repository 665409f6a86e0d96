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


class SpaceSaving:
    """Space-Saving heavy-hitters sketch (Metwally, Agrawal, El Abbadi
    2005 — public algorithm): at most ``k`` counters; when a new item
    arrives at capacity it evicts the min counter and inherits its count
    as over-estimation error.  Guarantees: every item with true count
    > N/k is present, and each counter over-estimates by <= N/k."""

    def __init__(self, k: int = 4096) -> None:
        self.k = k
        self.counts: dict = {}  # value -> [count_upper_bound, err]
        self.n = 0  # total items observed

    def add_counts(self, values, counts) -> None:
        """Bulk-add pre-aggregated (value, count) pairs (e.g. one
        ``value_counts`` per batch — the per-batch side stays fully
        vectorized; this dict walk touches distinct values only)."""
        c = self.counts
        for v, cnt in zip(values, counts):
            cnt = int(cnt)
            self.n += cnt
            cur = c.get(v)
            if cur is not None:
                cur[0] += cnt
            elif len(c) < self.k:
                c[v] = [cnt, 0]
            else:
                mv = min(c, key=lambda x: c[x][0])
                mc = c.pop(mv)[0]
                c[v] = [mc + cnt, mc]

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        out = SpaceSaving(self.k)
        out.counts = {v: list(ce) for v, ce in self.counts.items()}
        out.n = self.n
        out.add_counts(
            list(other.counts.keys()), [ce[0] for ce in other.counts.values()]
        )
        out.n = self.n + other.n  # add_counts already added upper bounds
        return out

    def candidates(self, threshold: int) -> list:
        """Values whose count UPPER bound exceeds threshold — a superset
        of the true heavy hitters whenever threshold > N/k."""
        return [v for v, (cnt, _) in self.counts.items() if cnt > threshold]


def exact_heavy_hitters(
    ds: rd.Dataset, col: str, threshold: int, k: int = 4096
) -> pd.DataFrame:
    """EXACT frequent items via the classic two-pass shape: pass 1 is a
    Space-Saving sketch (per-batch ``value_counts`` partials, kilobytes
    to the driver) that yields a candidate SUPERSET; pass 2 exact-counts
    only the candidates (broadcast membership filter + pre-aggregated
    groupby).  Output == ``GROUP BY col HAVING count(*) > threshold``
    with the shuffle carrying candidates only — never the full key space.

    Falls back to a full exact groupby when the sketch guarantee
    (threshold > N/k) does not hold for the observed N."""
    import ray

    from .relational import preagg_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(), "c": vc.to_numpy()})

    sk = SpaceSaving(k)
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        sk.add_counts(b["v"].to_numpy(), b["c"].to_numpy())

    if threshold <= sk.n // k:
        cand = None  # guarantee void: exact-count everything (rare; means
        # k was sized too small for this threshold/N)
    else:
        cand = set(sk.candidates(threshold))
        if not cand:
            return pd.DataFrame({col: pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})

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

    counts = preagg_groupby(filtered, [col], {"n": (None, "count")}).to_pandas()
    out = counts[counts["n"] > threshold].sort_values(col).reset_index(drop=True)
    return out
