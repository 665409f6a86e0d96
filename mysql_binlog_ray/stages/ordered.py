"""Distributed ordered-scan primitives: global prefix sum, hash-order
rank (deterministic training shuffle), and sequence packing.

Training-data prep needs a handful of operations whose output depends
on a GLOBAL order — the position of a document in a deterministic
shuffle, the running token offset that packs documents into fixed-size
training sequences.  Ray Data has no scan/window primitive, so this
module implements the classic two-pass parallel prefix pattern
(Blelloch 1990, "Prefix sums and their applications"):

  1. bucket every row by a RANGE-monotone function of the order key and
     reduce per-bucket value sums — a tiny frame (one row per bucket)
     that the driver turns into exclusive per-bucket base offsets;
  2. one hash-partitioned exchange co-locates each bucket, and a
     vectorized per-partition combine sorts each bucket by the order
     key, computes the local exclusive cumsum, and adds the broadcast
     base offset.

Nothing O(corpus) ever touches the driver (pass 1 ships one int per
bucket); the only all-to-all is the pass-2 exchange, which every
operator here needs anyway to co-locate order neighbours.  Fanout
inherits ``relational.keyed_reduce``'s adaptive sizing.

Order keys must be UNIQUE (duplicate keys make "the" prefix sum
ambiguous — the combine detects and rejects them) but may be any int64,
negative included: bucketing maps them through the order-preserving
int64 -> uint64 shift and sizes buckets by division only, so no range
arithmetic can overflow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .split import splitmix64

_U = np.uint64
_SIGN_FLIP = _U(1) << _U(63)


def _to_order_u64(x: np.ndarray) -> np.ndarray:
    """Order-preserving int64 -> uint64 map (flip the sign bit)."""
    return x.astype(np.int64).view(_U) ^ _SIGN_FLIP



def _empty_with(
    sch, extra_cols: list[str], fallback: list[tuple[str, "pa.DataType"]]
) -> rd.Dataset:
    """Empty result carrying the caller's schema plus int64 ``extra_cols``
    — any lazy op chained after a 0-row dataset loses its block schema,
    so the empty table must be built explicitly (shared by every
    operator in this module)."""
    fields = list(zip(sch.names, sch.types)) if sch is not None else fallback
    return rd.from_arrow(
        pa.table(
            {n: pa.array([], t) for n, t in fields}
            | {c: pa.array([], pa.int64()) for c in extra_cols}
        )
    )


def _append_ones(b: pa.Table) -> pa.Table:
    return b.append_column("_one", pa.array(np.ones(b.num_rows, dtype=np.int64)))


def bucketed_prefix_sum(
    ds: rd.Dataset,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Add ``out_col`` = the EXCLUSIVE prefix sum of ``value_col`` in
    global ``order_col`` order (the sum of all values whose order key is
    strictly smaller).

    ``n_buckets=None`` sizes the bucket count from the materialized
    input (~4M rows per bucket at 8 bytes/intermediate row — each
    pass-2 task materializes the buckets hashed to it, exactly the
    ``keyed_reduce`` contract).  Values must be int64; at 100 TB the
    running sum still fits (2^63 ~ 9.2e18 — e.g. 10^13 docs x 10^5
    tokens overflows, so callers summing token counts beyond ~10^4 TB
    of text should switch the accumulator to two-limb arithmetic).
    """
    from .relational import keyed_reduce

    mat = ds.materialize()
    n_rows = mat.count()
    if n_rows == 0:
        # Callers with extra columns (hash_order_rank, pack_sequences)
        # short-circuit empty inputs themselves, so losing non-key
        # columns here is fine.
        return _empty_with(
            mat.schema(),
            [out_col],
            [(order_col, pa.int64()), (value_col, pa.int64())],
        )

    # bucket = (u - lo) // step, step sized so ~target rows per bucket
    # IF keys are uniform over their range (hash-order callers are by
    # construction; dense ids nearly so).  Division-only arithmetic:
    # correct for any int64 range, no overflow.
    def batch_lohi(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"lo": pd.Series(dtype="uint64"), "hi": pd.Series(dtype="uint64")}
            )
        u = _to_order_u64(b[order_col].to_numpy())
        return pd.DataFrame(
            {
                "lo": np.array([u.min()], dtype=np.uint64),
                "hi": np.array([u.max()], dtype=np.uint64),
            }
        )

    lohi = mat.map_batches(batch_lohi, batch_format="pandas").to_pandas()
    lo, hi = _U(lohi["lo"].min()), _U(lohi["hi"].max())
    if n_buckets is None:
        n_buckets = max(1, min(1 << 16, n_rows // 4_000_000 + 8))
    span = int(hi - lo) + 1  # python int: no overflow at full range
    # step stays a uint64: the full-int64-range span (2^64) with
    # n_buckets=1 would not fit, so clamp to 2^64-1 — bucketing only
    # needs a monotone non-decreasing key -> bucket map, and the clamp
    # merely splits the single bucket at the very top key.
    step = _U(min(max(1, -(-span // n_buckets)), (1 << 64) - 1))

    def tag(b: pa.Table) -> pa.Table:
        u = _to_order_u64(b.column(order_col).to_numpy(zero_copy_only=False))
        bk = ((u - lo) // step).astype(np.int64)
        return b.append_column("_psb", pa.array(bk))

    tagged = mat.map_batches(tag, batch_format="pyarrow").materialize()

    # pass 1: per-bucket sums -> driver (one row per non-empty bucket)
    sums = (
        tagged.map_batches(
            lambda b: pd.DataFrame(
                {"_psb": b["_psb"], "_v": b[value_col].astype("int64")}
            )
            .groupby("_psb", sort=False)["_v"]
            .sum()
            .reset_index(),
            batch_format="pandas",
        )
        .groupby("_psb")
        .sum("_v")
        .to_pandas()
        .sort_values("_psb")
    )
    base = dict(
        zip(
            sums["_psb"].to_numpy(),
            np.concatenate(([0], np.cumsum(sums["sum(_v)"].to_numpy())[:-1])),
        )
    )

    from .relational import broadcast_once

    get_base = broadcast_once(base)

    # pass 2: co-locate buckets, sort each by order key, local exclusive
    # cumsum + base.  Fully vectorized: one sort + one cumsum per
    # partition, group starts recovered from bucket boundaries.
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            g = g.copy()
            g[out_col] = pd.Series(dtype="int64")
            return g
        g = g.sort_values(["_psb", order_col], kind="mergesort").reset_index(drop=True)
        ok = g[order_col].to_numpy()
        bk = g["_psb"].to_numpy()
        if (ok[1:] == ok[:-1]).any():  # dup order keys always share a bucket
            raise ValueError(
                f"bucketed_prefix_sum: duplicate {order_col} values — prefix order is ambiguous"
            )
        changed = np.empty(len(g), dtype=bool)
        changed[0] = True
        np.not_equal(bk[1:], bk[:-1], out=changed[1:])
        run_lens = np.diff(np.append(np.flatnonzero(changed), len(g)))
        v = g[value_col].to_numpy().astype(np.int64)
        cs = np.cumsum(v) - v  # exclusive, partition-local
        cs = cs - np.repeat(cs[changed], run_lens)  # rebase each bucket to 0
        bmap = get_base()
        bases = np.array([bmap[b] for b in bk[changed]], dtype=np.int64)
        g[out_col] = cs + np.repeat(bases, run_lens)
        return g

    out = keyed_reduce(
        tagged, ["_psb"], combine, est_input_bytes=tagged.size_bytes()
    )
    return out.drop_columns(["_psb"])


SHUFFLE_SEED = 13


def tag_hash_order(ds: rd.Dataset, id_col: str, seed: int) -> rd.Dataset:
    """Append ``_h`` = order-preserving int64 view of ``splitmix64(id +
    seed)`` — THE deterministic-shuffle key.  Shared by hash_order_rank
    and the training-shard writer so the permutation (and its SQL
    oracles) can never diverge between operators."""

    def tag(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError(f"{id_col} must be non-negative")
        with np.errstate(over="ignore"):
            h = splitmix64(ids.astype(_U) + _U(seed))
        # order-preserving uint64 -> int64 (flip sign bit): ORDER BY this
        # signed column == ORDER BY the unsigned hash
        return b.append_column("_h", pa.array((h ^ _SIGN_FLIP).view(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")


def hash_order_rank(
    ds: rd.Dataset,
    id_col: str,
    seed: int = SHUFFLE_SEED,
    out_col: str = "position",
) -> rd.Dataset:
    """Deterministic global shuffle for training-data ordering: every
    row gets ``out_col`` = its 0-based rank under ``splitmix64(id +
    seed)`` order — the same permutation on every run, every worker
    count, every shard layout (re-shuffling an epoch = new seed).

    ``splitmix64`` is a bijection on uint64, so distinct ids can never
    tie; the rank IS ``row_number() OVER (ORDER BY hash)`` and the SQL
    oracle says exactly that.  Scale shape: the hash is uniform by
    construction, so the range buckets of :func:`bucketed_prefix_sum`
    are balanced regardless of id skew."""

    # Materialize the tagged input here (bucketed_prefix_sum would do it
    # anyway — a second materialize is a no-op) so emptiness can be
    # short-circuited with the caller's schema (_empty_with).
    sch = ds.schema()
    tagged = (
        tag_hash_order(ds, id_col, seed)
        .map_batches(_append_ones, batch_format="pyarrow")
        .materialize()
    )
    if tagged.count() == 0:
        return _empty_with(sch, [out_col], [(id_col, pa.int64())])
    ranked = bucketed_prefix_sum(tagged, "_h", "_one", out_col)
    return ranked.drop_columns(["_h", "_one"])


def pack_order_key(
    ds: rd.Dataset,
    order_cols: list[str],
    out_col: str = "_ok",
) -> rd.Dataset:
    """Pack a lexicographic multi-column integer order into ONE int64 key
    (``bucketed_prefix_sum`` ranks over a single int64): each column gets
    a bit width from its global max (one tiny ``max()`` aggregate per
    column — no data movement beyond per-block partials), columns are
    non-negative, and the packed widths must fit 63 bits — raised as an
    explicit error, never silently truncated.  Sorting by ``out_col`` ==
    sorting by ``order_cols`` lexicographically."""
    from ray.data.aggregate import Max, Min

    # one pass computes every column's min+max (per-block partials only)
    stats = ds.aggregate(
        *[Min(c, alias_name=f"_mn_{c}") for c in order_cols],
        *[Max(c, alias_name=f"_mx_{c}") for c in order_cols],
    )
    widths: list[int] = []
    for c in order_cols:
        mn, mx = stats.get(f"_mn_{c}"), stats.get(f"_mx_{c}")
        if mn is None or mx is None:
            widths.append(1)
            continue
        if mn < 0:
            raise ValueError(f"pack_order_key: {c} has negative values")
        widths.append(max(1, int(mx).bit_length()))
    if sum(widths) > 63:
        raise ValueError(
            f"pack_order_key: widths {dict(zip(order_cols, widths))} exceed 63 bits — "
            "use a coarser leading key or a dedicated multi-key rank"
        )
    shifts = np.cumsum([0, *widths[::-1]])[-2::-1]  # trailing cols at low bits

    def tag(b: pa.Table) -> pa.Table:
        acc = np.zeros(b.num_rows, dtype=np.int64)
        for c, s in zip(order_cols, shifts):
            col = b.column(c)
            if col.null_count:
                # min/max aggregates above skip NULLs, so this is the
                # first place a NULL can be seen — NaN would otherwise
                # silently become INT64_MIN in the astype
                raise ValueError(f"pack_order_key: {c} has NULL values")
            acc |= col.to_numpy(zero_copy_only=False).astype(np.int64) << s
        return b.append_column(out_col, pa.array(acc))

    return ds.map_batches(tag, batch_format="pyarrow")


def ntile_assign(
    ds: rd.Dataset,
    order_cols: list[str],
    n_tiles: int,
    out_col: str = "tile",
) -> rd.Dataset:
    """``NTILE(n) OVER (ORDER BY order_cols)`` — the equal-depth range
    partitioner: every row gets its 1-based tile under the GLOBAL
    lexicographic order, the first ``n % count`` tiles one row larger
    (exact SQL semantics).  This is how a sorted lake write picks range
    boundaries without sampling error: rank via the distributed prefix
    sum (one keyed exchange), tile = arithmetic on the rank.

    ``order_cols`` must be non-negative ints forming a total order (a
    unique id last) and pack into 63 bits — see :func:`pack_order_key`.
    """
    sch = ds.schema()
    packed = pack_order_key(ds, order_cols)
    mat = packed.map_batches(_append_ones, batch_format="pyarrow").materialize()
    n_rows = mat.count()
    if n_rows == 0:
        return _empty_with(sch, [out_col], [])
    ranked = bucketed_prefix_sum(mat, "_ok", "_one", "_rank")
    q, big = divmod(n_rows, n_tiles)
    cut = big * (q + 1)

    def tile(b: pa.Table) -> pa.Table:
        r = b.column("_rank").to_numpy()
        if q == 0:  # more tiles than rows: tile == rank + 1
            t = r + 1
        else:
            t = np.where(r < cut, r // (q + 1) + 1, big + (r - cut) // q + 1)
        return b.drop_columns(["_ok", "_one", "_rank"]).append_column(
            out_col, pa.array(t.astype(np.int64))
        )

    return ranked.map_batches(tile, batch_format="pyarrow")


def pack_sequences(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_len: int = 1024,
) -> rd.Dataset:
    """Concat-and-slice sequence packing (the standard LM training prep:
    concatenate all documents in ``id_col`` order, slice the token
    stream into ``seq_len``-token training sequences): emits per doc its
    global ``tok_start`` offset and the first/last sequence indices it
    lands in.  Pure arithmetic on top of the distributed prefix sum —
    no driver state, one exchange."""
    # Same empty-input short-circuit as hash_order_rank: the slots map
    # chained after a 0-row dataset would lose the schema.
    sch = ds.schema()
    mat = ds.materialize()
    if mat.count() == 0:
        return _empty_with(
            sch,
            ["tok_start", "seq_first", "seq_last"],
            [(id_col, pa.int64()), (tokens_col, pa.int64())],
        )
    ps = bucketed_prefix_sum(mat, id_col, tokens_col, "tok_start")

    def slots(b: pd.DataFrame) -> pd.DataFrame:
        start = b["tok_start"].to_numpy()
        n = b[tokens_col].to_numpy()
        b = b.copy()
        b["seq_first"] = start // seq_len
        # n >= 1 for every tokenizer in this repo (empty text counts 1)
        b["seq_last"] = (start + n - 1) // seq_len
        return b

    return ps.map_batches(slots, batch_format="pandas")
