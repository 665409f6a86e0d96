"""Deterministic dataset splitting and chunking for training-data prep.

``hash_split`` assigns every row a stable train/val/test-style label
from a keyed hash — the standard leakage-safe split: the label depends
only on (key, seed), so re-running over a grown corpus never moves a
row between splits, and co-keyed rows land together.  ``chunk_documents``
explodes documents into fixed-size character windows (context-window
packing prep).

Both are embarrassingly parallel ``map_batches`` stages (no shuffle)
and both have EXACT DuckDB oracles: the hash is splitmix64
(`Steele et al. 2014, "Fast splittable pseudorandom number generators"`,
the mix finalizer), chosen because its mod-2^64 arithmetic is
expressible in SQL HUGEINT (see ``splitmix64_sql``), and chunk
boundaries are plain substring arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_U = np.uint64
_MOD = 1 << 64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a non-negative int64/uint64 array:
    golden-ratio increment + the shared :func:`merge._mix64` finalizer
    (one numpy implementation repo-wide, so the SQL twin below has a
    single counterpart that cannot drift)."""
    from .merge import _mix64

    with np.errstate(over="ignore"):
        return _mix64(x.astype(_U) + _U(0x9E3779B97F4A7C15))


def _sql_mulmod(c: int) -> str:
    """SQL for ``(h * c) % 2**64`` in HUGEINT: the 64x64 product can
    overflow int128, so the constant is split into 32-bit halves."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"((((h * {hi}) % 4294967296) * 4294967296) + (h * {lo})) "
        "% 18446744073709551616"
    )


def splitmix64_sql(x_expr: str, seed: int = 0) -> str:
    """A DuckDB scalar expression computing ``splitmix64(x + seed)`` for
    a non-negative BIGINT expression — bit-exact with :func:`splitmix64`
    (xor/shift via ``xor`` + floor-division, multiplies split to stay in
    int128).  Used by the driver oracles; kept next to the numpy
    implementation so the two can never drift apart silently."""
    steps = [
        "xor(h, h // 1073741824)",  # h ^= h >> 30
        _sql_mulmod(0xBF58476D1CE4E5B9),
        "xor(h, h // 134217728)",  # h ^= h >> 27
        _sql_mulmod(0x94D049BB133111EB),
        "xor(h, h // 2147483648)",  # h ^= h >> 31
    ]
    expr = f"((CAST({x_expr} AS HUGEINT) + {seed % _MOD} + 11400714819323198485) % 18446744073709551616)"
    for step in steps:
        expr = f"(SELECT {step} FROM (SELECT {expr} AS h))"
    return expr


SPLIT_BUCKETS = 10_000


def _edges(fractions: dict[str, float]) -> np.ndarray:
    """Validated cumulative cut points on the bucket grid — the ONE
    place the label boundaries are computed, shared by the numpy path
    and the SQL oracle so neither can round differently."""
    labels = list(fractions)
    cuts = np.cumsum([fractions[l] * SPLIT_BUCKETS for l in labels])
    edges = np.rint(cuts).astype(np.int64)
    if not np.allclose(cuts, edges, atol=1e-6) or edges[-1] != SPLIT_BUCKETS:
        raise ValueError(
            f"fractions must be multiples of 1/{SPLIT_BUCKETS} summing to 1.0: {fractions}"
        )
    return edges


def hash_split(
    ds: rd.Dataset,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> rd.Dataset:
    """Add ``out_col`` = a deterministic split label per row.

    ``fractions`` maps label -> fraction, summing to 1.0, each an exact
    multiple of 1/10000 (the bucket grid — enforced, so the SQL oracle
    and the numpy path agree exactly).  A row's bucket is
    ``splitmix64(key + seed) % 10000``; buckets are assigned to labels
    in dict order.  Keys must be non-negative integers (hash the key
    first for strings — e.g. ``Fingerprinter``).  Stability: adding new
    rows or re-running with more workers never reassigns an existing
    key; changing ``seed`` draws a fresh split.
    """
    labels = list(fractions)
    edges = _edges(fractions)
    labels_arr = np.array(labels, dtype=object)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[key_col].to_numpy()
        if len(keys) and keys.min() < 0:
            raise ValueError(f"{key_col} must be non-negative for hash_split")
        with np.errstate(over="ignore"):
            bucket = (splitmix64(keys.astype(_U) + _U(seed % _MOD))
                      % _U(SPLIT_BUCKETS)).astype(np.int64)
        idx = np.searchsorted(edges, bucket, side="right")
        batch = batch.copy()
        batch[out_col] = labels_arr[idx]
        return batch

    return ds.map_batches(assign, batch_format="pandas")


def hash_split_sql(
    key_expr: str, fractions: dict[str, float], seed: int = 0
) -> str:
    """The DuckDB CASE expression matching :func:`hash_split` — cut
    points and validation shared with the numpy path via
    :func:`_edges`."""
    labels = list(fractions)
    edges = _edges(fractions)
    if len(labels) == 1:  # CASE with no WHEN arms is invalid SQL
        return f"'{labels[0]}'"
    h = f"({splitmix64_sql(key_expr, seed)} % {SPLIT_BUCKETS})"
    cases = " ".join(
        f"WHEN {h} < {int(e)} THEN '{l}'" for l, e in zip(labels[:-1], edges[:-1])
    )
    return f"CASE {cases} ELSE '{labels[-1]}' END"


WEIGHTED_SAMPLE_SEED = 0x5EED_FACE_01


def weighted_bernoulli_sample(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    denom: int,
    seed: int = WEIGHTED_SAMPLE_SEED,
) -> rd.Dataset:
    """Deterministic weight-proportional Bernoulli sample: keep a row
    with probability ``min(1, weight / denom)`` — e.g. sampling training
    documents proportional to length so the SAMPLE's token mass, not its
    document count, is uniform per source row (the standard
    mixture-reweighting primitive).

    Inclusion is a pure function of ``(key, seed, weight, denom)``:
    ``splitmix64(key + seed) * denom < weight * 2**64`` — integer-EXACT
    (no float rounding; the SQL twin runs the same inequality in
    HUGEINT), so re-runs, repartitions and incremental appends never
    flip a row.  Keys must be non-negative ints, weights non-negative
    ints, ``denom`` a positive int.  Map-only: no shuffle, no driver.
    """
    if denom <= 0:
        raise ValueError("denom must be a positive integer")

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[key_col].to_numpy()
        w = batch[weight_col].to_numpy()
        if w.dtype.kind not in "iu":
            # float weights would floor here but round-to-nearest in the
            # SQL twin's CAST — refuse rather than silently diverge
            raise ValueError(
                "weighted_bernoulli_sample: weights must be integer-typed "
                "(pre-scale fractional weights to integers)"
            )
        if len(keys) == 0:
            return batch
        if keys.min() < 0 or w.min() < 0:
            raise ValueError("weighted_bernoulli_sample: keys and weights must be >= 0")
        with np.errstate(over="ignore"):
            h = splitmix64(keys.astype(_U) + _U(seed % _MOD))
        # h * denom < w * 2**64  <=>  h <= (w * 2**64 - 1) // denom,
        # with w >= denom always true (h < 2**64).  Thresholds computed
        # in exact Python ints per UNIQUE weight — each fits uint64 when
        # 0 < w < denom, so the vectorized compare never touches floats.
        always = w >= denom
        small = ~always & (w > 0)
        uw = np.unique(w[small])
        thr = np.array(
            [((int(x) << 64) - 1) // denom for x in uw], dtype=np.uint64
        )
        keep = always.copy()
        if len(uw):
            t = thr[np.searchsorted(uw, w[small])]
            keep[small] = h[small].astype(np.uint64) <= t
        return batch.loc[keep]

    return ds.map_batches(pick, batch_format="pandas")


def weighted_bernoulli_sample_sql(
    key_expr: str, weight_expr: str, denom: int, seed: int = WEIGHTED_SAMPLE_SEED
) -> str:
    """DuckDB WHERE predicate matching :func:`weighted_bernoulli_sample`
    bit-for-bit: both sides of the inequality stay in HUGEINT (max
    ~2**64 * denom — keep ``denom`` under ~2**62)."""
    h = splitmix64_sql(key_expr, seed)
    return (
        f"(CAST({h} AS HUGEINT) * {int(denom)}"
        f" < CAST({weight_expr} AS HUGEINT) * 18446744073709551616)"
    )


MIXTURE_SAMPLE_SEED = 0x5EED_D0D0_02


def mixture_sample(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = MIXTURE_SAMPLE_SEED,
) -> rd.Dataset:
    """Per-group Bernoulli mixture sampling — the "domain mixing" step of
    training-data curation (keep 90% of English, 50% of code, 10% of the
    long tail...).  A row survives iff
    ``splitmix64(key + seed) % 10000 < rate_e4[group]``: deterministic,
    key-stable (appends/re-runs never flip a kept row), and map-only —
    no shuffle, no driver state, rates broadcast in the task closure.
    Rates live on the 1/10000 grid (validated) so the SQL twin agrees
    exactly; groups missing from ``rates`` fall back to
    ``default_rate``."""
    rate_e4 = {g: _rate_e4(r, g) for g, r in rates.items()}
    default_e4 = _rate_e4(default_rate, "<default>")

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[key_col].to_numpy()
        if len(keys) == 0:
            return batch
        if keys.min() < 0:
            raise ValueError(f"{key_col} must be non-negative for mixture_sample")
        with np.errstate(over="ignore"):
            bucket = (
                splitmix64(keys.astype(_U) + _U(seed % _MOD)) % _U(SPLIT_BUCKETS)
            ).astype(np.int64)
        cut = batch[group_col].map(rate_e4).fillna(default_e4).to_numpy(np.int64)
        return batch.loc[bucket < cut]

    return ds.map_batches(pick, batch_format="pandas")


def _rate_e4(rate: float, label: str) -> int:
    """A rate on the 1/10000 grid -> integer cut point (the shared
    validation with :func:`_edges`: no float can enter the compare)."""
    cut = rate * SPLIT_BUCKETS
    out = int(np.rint(cut))
    if not np.isclose(cut, out, atol=1e-6) or not 0 <= out <= SPLIT_BUCKETS:
        raise ValueError(
            f"mixture_sample rate for {label!r} must be a multiple of "
            f"1/{SPLIT_BUCKETS} in [0, 1]: {rate}"
        )
    return out


def mixture_sample_sql(
    key_expr: str,
    group_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = MIXTURE_SAMPLE_SEED,
) -> str:
    """DuckDB WHERE predicate matching :func:`mixture_sample`
    bit-for-bit (cut points via the same :func:`_rate_e4` grid)."""
    h = f"({splitmix64_sql(key_expr, seed)} % {SPLIT_BUCKETS})"
    arms = " ".join(
        f"WHEN '{g}' THEN {_rate_e4(r, g)}" for g, r in rates.items()
    )
    cut = f"CASE {group_expr} {arms} ELSE {_rate_e4(default_rate, '<default>')} END"
    return f"({h} < {cut})"


def chunk_documents(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 0,
) -> rd.Dataset:
    """Explode each document into fixed-size character windows:
    ``(id, chunk_idx, chunk_text)`` with stride ``chunk_chars -
    overlap`` (the context-window packing prep step; token-exact
    chunking plugs a tokenizer into the same window arithmetic).

    NULL/empty texts yield zero chunks.  Vectorized shape: window
    starts come from ONE ``np.repeat``/``arange`` pass; the only
    per-element work is the substring copy itself (memcpy-bound).
    Embarrassingly parallel — no shuffle; at 100 TB each task chunks
    only its own batch and output blocks stay bounded by
    ``batch_size x chunk_chars``.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").to_numpy(dtype=object)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        n_chunks = np.where(lens > 0, (np.maximum(lens - overlap, 1) + stride - 1) // stride, 0)
        doc_pos = np.repeat(np.arange(len(texts)), n_chunks)
        # chunk_idx: 0..n_chunks[i)-1 within each doc
        chunk_idx = np.arange(len(doc_pos)) - np.repeat(
            np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks
        )
        starts = chunk_idx * stride
        chunks = [
            texts[d][s : s + chunk_chars] for d, s in zip(doc_pos, starts)
        ]
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[doc_pos],
                "chunk_idx": chunk_idx.astype(np.int64),
                "chunk_text": np.array(chunks, dtype=object),
            }
        )

    return ds.map_batches(explode, batch_format="pandas")
