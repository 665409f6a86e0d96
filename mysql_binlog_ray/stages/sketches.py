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
