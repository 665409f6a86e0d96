"""Relational operators the north-star pipeline adds on top of the
reference (SURVEY.md §2.7 — the reference has no joins/sorts/groupbys,
`README.md:80-104` leaves them to the consumer).

All operators follow the scale rules from the brief:

- aggregates are **pre-aggregated per batch** (combiner) so the shuffle
  carries one row per key per batch, not one per input row;
- small-side joins are **broadcast** (``ray.put`` once, lookup per
  batch), never a shuffle;
- top-k reduces locally per batch before the tiny global sort.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

# agg spec: out_col -> (in_col, kind) with kind in {count,sum,min,max}
AggSpec = dict[str, tuple[str | None, str]]

_PARTIAL_KIND = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
_RAY_AGG = {"sum": Sum, "min": Min, "max": Max}


def preagg_groupby(ds: rd.Dataset, keys: list[str], spec: AggSpec) -> rd.Dataset:
    """groupby with a per-batch combiner: map_batches computes the partial
    aggregate per key, the global groupby merges partials.

    At 100 TB the difference is the shuffle carrying |keys|x|batches|
    rows instead of every input row.
    """

    need_count = any(kind == "count" for _, kind in spec.values())

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: no pandas round-trip in the hot path
        if need_count:
            batch = batch.append_column(
                "_one", pa.array(np.ones(batch.num_rows, dtype=np.int64))
            )
        # dedupe (col, fn) pairs: two spec outputs sharing the same
        # source aggregate must not collapse into one renamed column
        srcs: dict[str, tuple[str, str]] = {}
        for out_col, (in_col, kind) in spec.items():
            col = "_one" if kind == "count" else in_col
            fn = "sum" if kind == "count" else kind
            srcs[out_col] = (col, fn)
        aggs = list(dict.fromkeys(srcs.values()))
        res = batch.group_by(keys, use_threads=False).aggregate(aggs)
        cols = {k: res.column(k) for k in keys}
        for out_col, (col, fn) in srcs.items():
            cols[out_col] = res.column(f"{col}_{fn}")
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # Merge the partials with a hash-partitioned exchange + ONE
    # Arrow-native combine per partition (the same group_by kernel as
    # the partial stage, so dtypes and null-group semantics are
    # identical end to end).  This replaces `groupby().aggregate()`,
    # which pays ~2.5x the constant cost of the sort-exchange
    # map_groups path (measured same-session: 0.47s vs 0.19s on a
    # 2k-row input at 8 CPUs) — at ~40 call sites that constant bounds
    # how deep a time-budgeted correctness harness can sample.  The
    # fanout scales like hash_join's: sized from leaf metadata when
    # measurable (partial output <= input bytes), else a
    # cluster-proportional guess — never a flat constant.
    from .merge import key_hash64

    in_bytes = metadata_size_bytes(ds)
    if in_bytes is not None:
        nparts = adaptive_num_parts(in_bytes)
    else:
        nparts = max(16, min(256, int(ray.cluster_resources().get("CPU", 8) or 8)))
    kt = tuple(keys)
    merge_aggs = [
        (out_col, _PARTIAL_KIND[kind]) for out_col, (_, kind) in spec.items()
    ]

    def tag(b: pa.Table) -> pa.Table:
        h = (key_hash64(b, kt) % np.uint64(nparts)).astype(np.int64)
        return b.append_column("_rp", pa.array(h))

    def merge_one(t: pa.Table) -> pa.Table:
        res = t.group_by(keys, use_threads=False).aggregate(merge_aggs)
        cols = {k: res.column(k) for k in keys}
        for out_col, fn in merge_aggs:
            cols[out_col] = res.column(f"{out_col}_{fn}")
        return pa.table(cols)

    if nparts == 1:
        # tiny input (adaptive_num_parts' single-task answer): merge all
        # partials in one task, no exchange — same Arrow kernel
        return partials.repartition(1).map_batches(
            merge_one, batch_format="pyarrow", batch_size=None
        )

    def merge_partials(t: pa.Table) -> pa.Table:
        return merge_one(t.drop_columns(["_rp"]))

    return (
        partials.map_batches(tag, batch_format="pyarrow")
        .groupby("_rp")
        .map_groups(merge_partials, batch_format="pyarrow")
    )


def metadata_size_bytes(ds: rd.Dataset) -> int | None:
    """Input byte size WITHOUT executing the plan: only answered for a
    LEAF — a parquet read (file metadata) or an already-materialized /
    driver-created dataset (block metadata) — so the measurement never
    executes upstream transforms.  Any transformed dataset returns None:
    ``Dataset.size_bytes()`` on those would execute the whole pipeline
    just to measure it."""
    try:
        dag = ds._logical_plan.dag
        leaf_types = ("Read", "ReadFiles", "FromArrow", "FromPandas", "FromItems", "InputData")
        if type(dag).__name__ in leaf_types and not dag.input_dependencies:
            return ds.size_bytes()
    except Exception:
        pass
    return None


def compact_fragmented(
    ds: rd.Dataset,
    target_blocks: int | None = None,
    max_avg_block_bytes: int = 1 << 20,
) -> rd.Dataset:
    """Collapse a MATERIALIZED dataset's near-empty block fragmentation.

    Exchange-producing ops (``groupby.map_groups`` sort shuffles, unions
    of several staged datasets) can leave a kilobyte-sized result spread
    over dozens of blocks; every downstream all-to-all then pays its
    per-block scheduling cost on air (measured: one keyed exchange over
    a 25-row/48-block edge set costs 0.58 s vs 0.12 s over the same rows
    in one block — and BSP graph rounds pay that twice per round).

    Metadata-only check: a dataset whose average block is above
    ``max_avg_block_bytes`` (i.e. any at-scale dataset — healthy blocks
    are tens of MB) or already at/below ``target_blocks`` passes through
    untouched.  Only tiny-but-fragmented results pay the one streaming
    ``repartition`` (split/coalesce, not a shuffle) + materialize."""
    try:
        nb = ds.num_blocks()
        size = ds.size_bytes() or 0
    except Exception:
        return ds
    if target_blocks is None:
        try:
            target_blocks = max(2, min(16, int(ray.cluster_resources().get("CPU", 8) or 8)))
        except Exception:
            target_blocks = 8
    if nb is None or nb <= 2 * target_blocks or size / max(1, nb) > max_avg_block_bytes:
        return ds
    return ds.repartition(target_blocks).materialize()


def cpu_floor(lo: int = 4, hi: int = 64) -> int:
    """The cluster-proportional partition floor (``min(hi, CPUs)``,
    >= ``lo``) — exported so compute-bound stages that must never route
    single-task share ONE definition of the rule."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus))


def adaptive_num_parts(
    size_bytes: int,
    target_part_bytes: int = 256 << 20,
    min_parts: int | None = None,
    max_parts: int = 1 << 18,
    small_bytes: int = 4 << 20,
    small_to_one: bool = False,
) -> int:
    """Partition fanout sized to the INPUT (~256 MB per partition), not a
    constant: each reduce task materializes one whole partition, so a
    fixed fanout means O(corpus / constant) rows per task at 100 TB.

    The default FLOOR scales with the cluster (:func:`cpu_floor`): on a
    big cluster small-but-not-tiny inputs still fan out to 64 ways,
    while a laptop-sized session stops paying 64 shuffle partitions of
    scheduling overhead for kilobyte inputs — per-query constant cost is
    what bounds how many operators a correctness harness can check.

    Below ``min(small_bytes, target_part_bytes)`` the answer is **1** —
    a reduce whose entire MEASURED input fits one partition's budget
    gains nothing from an exchange, and ``keyed_reduce`` turns
    ``num_parts=1`` into a no-shuffle single-task combine (~70 ms/call
    cheaper per exchange, measured on a 5k-row input at 8 CPUs).  The
    ``target_part_bytes`` term keeps an explicit small-partition request
    meaningful (equivalence tests pass target_part_bytes=4096 exactly to
    force the exchange path).  The single-task answer applies when the
    caller did not pin ``min_parts``, or when it passes
    ``small_to_one=True`` alongside a pinned floor (vectorized combines
    that want a floor at scale but no exchange for tiny inputs).
    Unmeasured inputs (``size_bytes <= 0``) never take it.  At 100 TB no
    real exchange input is this small, so the at-scale plan is
    unchanged; compute-bound combines must pin ``min_parts`` (e.g. via
    :func:`cpu_floor`) and not set ``small_to_one``."""
    if (min_parts is None or small_to_one) and 0 < size_bytes <= min(
        small_bytes, target_part_bytes
    ):
        return 1
    if min_parts is None:
        min_parts = cpu_floor()
    return max(min_parts, min(max_parts, -(-int(size_bytes) // target_part_bytes)))


def keyed_reduce(
    ds: rd.Dataset,
    keys: list[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    num_parts: int | None = None,
    target_part_bytes: int = 256 << 20,
    est_input_bytes: int | None = None,
) -> rd.Dataset:
    """Hash-partitioned reduce for HIGH-cardinality keys.

    ``groupby(keys).aggregate(...)`` / ``map_groups`` pay Python-level
    cost per distinct key (measured ~13k groups/s/core) — fine for a few
    hundred groups, pathological for millions.  This routes rows through
    the same single shuffle but keyed on ``hash(keys) % num_parts``, then
    runs ONE vectorized ``combine`` (pandas/arrow groupby inside) per
    partition.  ``combine`` sees every row of each key it receives and
    must output the per-key reduction; key cardinality no longer appears
    in any per-group Python loop.

    ``num_parts=None`` (the default) derives the fanout from the input:
    the tagged input is materialized once (it is about to be shuffled
    anyway — this avoids executing the upstream plan twice), its byte
    size picks ``ceil(bytes / target_part_bytes)`` partitions, so no
    reduce task ever materializes more than ~``target_part_bytes`` of
    rows regardless of corpus size.  Pass an explicit ``num_parts`` to
    skip the sizing materialization when the scale is known, or
    ``est_input_bytes`` (e.g. source parquet bytes x a documented
    expansion factor) to size adaptively WITHOUT materializing — the
    materialize pins the tagged input in the object store for the whole
    downstream shuffle (~2x peak footprint), which matters when the
    reduce input is an exploded intermediate much larger than the corpus.
    """
    from .merge import key_hash64

    kt = tuple(keys)

    def single_task(inp: rd.Dataset) -> rd.Dataset:
        # num_parts == 1: the whole input reduces in ONE task — no
        # exchange at all.  Upstream map stages still run parallel; only
        # the final combine (trivial at these byte sizes) is serial.
        # `combine` already handles arbitrary key mixtures per call, so
        # one call seeing every key is within its contract.
        def combine_all(b: pd.DataFrame) -> pd.DataFrame:
            if "_rph" in b.columns:
                b = b.drop(columns=["_rph"])
            return combine(b)

        # materialize the coalesced input (tiny by construction — this
        # path only engages <= small_bytes) so emptiness is checkable:
        # Ray skips map UDFs on 0-row blocks, so an EMPTY input would
        # surface with the INPUT schema instead of combine's output
        # schema (the normalize_empty_blocks hazard class)
        coalesced = inp.repartition(1).materialize()
        if coalesced.count() == 0:
            # run combine on the empty frame driver-side — 0 rows, so
            # this is schema work, not data work.  A combine that can't
            # take an empty frame keeps the old empty-block behavior.
            try:
                empty_in = coalesced.to_pandas()
                if "_rph" in empty_in.columns:
                    empty_in = empty_in.drop(columns=["_rph"])
                return rd.from_pandas(combine(empty_in))
            except Exception:
                pass
        return coalesced.map_batches(
            combine_all, batch_format="pandas", batch_size=None
        )

    if num_parts is None and est_input_bytes is not None:
        num_parts = adaptive_num_parts(est_input_bytes, target_part_bytes)

    if num_parts is None:
        # a LEAF input's size is answerable from parquet/block metadata —
        # size from it directly and skip the tagging materialization
        # below entirely (one streaming plan, no object-store pinning);
        # the tag column adds ~1% bytes, irrelevant to a /256MB ceil
        leaf_bytes = metadata_size_bytes(ds)
        if leaf_bytes is not None:
            num_parts = adaptive_num_parts(leaf_bytes, target_part_bytes)

    if num_parts == 1:
        return single_task(ds)

    if num_parts is None:
        def tag_full(b: pa.Table) -> pa.Table:
            # full 64-bit key hash now; the mod is applied after sizing
            h = key_hash64(b, kt).view(np.int64)
            return b.append_column("_rph", pa.array(h))

        tagged_full = ds.map_batches(tag_full, batch_format="pyarrow").materialize()
        parts = adaptive_num_parts(
            tagged_full.size_bytes() or 0, target_part_bytes
        )
        if parts == 1:
            return single_task(tagged_full)

        def mod(b: pa.Table) -> pa.Table:
            h = b.column("_rph").to_numpy().view(np.uint64)
            rp = (h % np.uint64(parts)).astype(np.int64)
            return b.drop_columns(["_rph"]).append_column("_rp", pa.array(rp))

        tagged = tagged_full.map_batches(mod, batch_format="pyarrow")
    else:
        def tag(b: pa.Table) -> pa.Table:
            h = (key_hash64(b, kt) % np.uint64(num_parts)).astype(np.int64)
            return b.append_column("_rp", pa.array(h))

        tagged = ds.map_batches(tag, batch_format="pyarrow")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return combine(g.drop(columns=["_rp"]))

    return tagged.groupby("_rp").map_groups(per_part, batch_format="pandas")


def normalize_empty_blocks(ds: rd.Dataset, proto: dict[str, str]) -> rd.Dataset:
    """Ray's groupby/shuffle stages can emit ZERO-COLUMN empty pandas
    blocks for group-less partitions; downstream ops that resolve fields
    by name (``Dataset.join``, ``select_columns``) then fail on that one
    block.  Rebuild empty blocks with the caller's types (Arrow type
    aliases, e.g. ``{"term": "string", "df": "int64"}``); non-empty
    blocks pass through with pandas extension-dtype metadata stripped
    (otherwise a groupby's pandas blocks round-trip ``string`` extension
    dtypes back to consumers instead of plain Arrow strings)."""
    schema = pa.schema([(c, pa.type_for_alias(t)) for c, t in proto.items()])

    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        return b.replace_schema_metadata(None)

    return ds.map_batches(fix, batch_format="pyarrow")


def drop_empty_blocks(
    ds: rd.Dataset, proto: dict[str, str] | pa.Schema | None = None
) -> rd.Dataset:
    """Physically remove 0-row blocks from a dataset.

    Ray 2.49 SKIPS map UDFs on 0-row blocks (``plan_udf_map_op.py``'s
    empty-block passthrough), so the schema-less empty blocks some
    all-to-all ops emit survive :func:`normalize_empty_blocks` untouched
    and crash block-level consumers.  Worse, the hash-shuffle JOIN's
    schema broadcast races on them: ``_shuffle_block`` early-returns on a
    0-row block WITHOUT broadcasting the input schema while the driver
    still marks schemas as broadcast (``hash_shuffle.py:223`` vs
    ``:588``), so if an empty block happens to be shuffled first the
    aggregators finalize zero-column partitions and ``pa.Table.join``
    dies with "No match for key field ...".  This materializes the input
    and rebuilds it from the non-empty block REFS — the driver touches
    refs + metadata only, never rows.  ``proto`` (Arrow type aliases or a
    schema) supplies the schema when every block is empty; when omitted,
    the schema is recovered from the executed bundles.
    """
    @ray.remote(num_cpus=0)
    def _count(blk) -> int:
        return blk.num_rows if hasattr(blk, "num_rows") else len(blk)

    refs = []
    unknown: list = []
    seen_schema: pa.Schema | None = None
    for bundle in ds.iter_internal_ref_bundles():
        if seen_schema is None:
            s = getattr(bundle, "schema", None)
            s = getattr(s, "base_schema", s)
            if isinstance(s, pa.Schema) and len(s.names):
                seen_schema = s
        for ref, meta in bundle.blocks:
            if meta.num_rows is None:
                # unknown count: counted in a 0-CPU task — the block's
                # ROWS never land on the driver (docstring guarantee)
                unknown.append((ref, _count.remote(ref)))
            elif meta.num_rows:
                refs.append(ref)
    refs.extend(ref for (ref, cnt) in unknown if ray.get(cnt))
    if not refs:
        if isinstance(proto, pa.Schema):
            schema = proto
        elif proto is not None:
            schema = pa.schema(
                [(c, pa.type_for_alias(t)) for c, t in proto.items()]
            )
        elif seen_schema is not None:
            schema = seen_schema
        else:
            # pandas-backed blocks carry a PandasBlockSchema, not an
            # Arrow schema — recover via Dataset.schema() (metadata-only
            # on a materialized input) and numpy-dtype conversion.  This
            # engages for driver-created empties (rd.from_pandas); an
            # all-empty TRANSFORMED pandas stage still reports schema()
            # = None and keeps the explicit `proto` requirement.
            obj_cols: list[str] = []

            def _np_to_arrow(n, t):
                if isinstance(t, pa.DataType):
                    return t
                dt = np.dtype(t)  # PandasBlockSchema carries np classes
                if dt.kind == "O":
                    # pandas object columns in empty frames are strings
                    # in every producer this repo has (ids/names/text) —
                    # but the dtype is ambiguous (bytes/lists also map
                    # to object), so the guess is surfaced loudly; pass
                    # `proto` to silence it with the true type
                    obj_cols.append(n)
                    return pa.string()
                return pa.from_numpy_dtype(dt)

            try:
                s = ds.schema()
                base = getattr(s, "base_schema", None)
                if isinstance(base, pa.Schema):
                    schema = base
                else:
                    schema = pa.schema(
                        [(n, _np_to_arrow(n, t)) for n, t in zip(s.names, s.types)]
                    )
                if obj_cols:
                    import logging

                    logging.getLogger(__name__).warning(
                        "drop_empty_blocks: typed object column(s) %s of an "
                        "all-empty input as string — pass `proto` if they "
                        "hold bytes/lists",
                        obj_cols,
                    )
            except Exception as e:
                raise ValueError(
                    "drop_empty_blocks: every block is empty and no schema "
                    "is recoverable — pass `proto`"
                ) from e
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)


def broadcast_once(obj, prepare: Callable | None = None) -> Callable[[], object]:
    """``ray.put`` once, read once per worker process: returns a getter
    whose closure cache persists across tasks (map fns are deserialized
    once per worker), so the object is never re-shipped per batch.
    ``prepare`` runs on the fetched object once per worker (e.g. building
    an index)."""
    ref = ray.put(obj)
    cache: dict = {}

    def get() -> object:
        out = cache.get("o")
        if out is None:
            out = ray.get(ref)
            out = cache["o"] = prepare(out) if prepare is not None else out
        return out

    return get


def broadcast_join(
    ds: rd.Dataset,
    small_df: pd.DataFrame,
    left_on: str,
    right_on: str,
    take_cols: list[str],
    how: str = "inner",
) -> rd.Dataset:
    """Join against a small dimension table by broadcasting it: the table
    is ``ray.put`` once; every map task reads the same object-store copy
    (zero per-batch reshipping) and merges per batch.  No shuffle."""
    get_small = broadcast_once(
        small_df[[right_on, *take_cols]], lambda d: d.set_index(right_on)
    )

    def joiner(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(get_small(), left_on=left_on, right_index=True, how=how)

    return ds.map_batches(joiner, batch_format="pandas")


def top_k(ds: rd.Dataset, sort_cols: list[tuple[str, bool]], k: int) -> pa.Table:
    """Global top-k: local top-k per batch, then one tiny driver-side
    sort over <= k * num_batches rows.  ``sort_cols`` is
    [(col, descending)] and also the deterministic tie-break order."""
    by = [c for c, _ in sort_cols]
    ascending = [not d for _, d in sort_cols]

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending).head(k)

    small = ds.map_batches(local, batch_format="pandas").take_all()
    if not small:  # empty input: keep the schema, return zero rows
        schema = getattr(ds.schema(), "base_schema", None)
        if schema is not None:
            return schema.empty_table()
        return pa.table({c: [] for c in by})
    df = pd.DataFrame(small).sort_values(by, ascending=ascending).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def tumbling_window(
    ds: rd.Dataset,
    ts_col: str,
    key_cols: list[str],
    width_sec: int,
    spec: AggSpec,
) -> rd.Dataset:
    """Tumbling event-time window aggregate (the streaming-window gap in
    the reference, SURVEY §2.7): window id computed vectorized per batch,
    then pre-aggregated groupby on (keys..., window_start)."""

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        # robust to the column's datetime64 unit (us vs ns)
        sec = batch[ts_col].to_numpy().astype("datetime64[s]").astype("int64")
        batch = batch.copy()
        batch["window_start"] = (sec // width_sec) * width_sec
        return batch

    windowed = ds.map_batches(add_window, batch_format="pandas")
    return preagg_groupby(windowed, [*key_cols, "window_start"], spec)


def distinct_count(ds: rd.Dataset, col: str) -> int:
    """Exact distinct via per-batch set partials + driver union (the
    column's distinct set must fit the driver; use a sketch otherwise)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({col: batch[col].unique()})

    parts = ds.map_batches(partial, batch_format="pandas")
    return len(parts.unique(col))


def filter_project(
    ds: rd.Dataset,
    predicate: Callable[[pa.Table], pa.Array],
    columns: list[str],
) -> rd.Dataset:
    """Vectorized predicate + projection inside one map_batches (faster
    than row-wise ``Dataset.filter``)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(predicate(batch)).select(columns)

    return ds.map_batches(fn, batch_format="pyarrow")


def asof_join(
    left_ds: rd.Dataset,
    right_ds: rd.Dataset,
    by: str,
    on: str,
    right_cols: list[str],
    num_buckets: int | None = None,
    suffix: str = "_r",
    target_part_bytes: int = 256 << 20,
) -> rd.Dataset:
    """As-of (backward) join: for each left row, the newest right row of
    the same ``by`` key with ``right.on <= left.on``.

    Scale shape: both sides get a deterministic hash bucket on ``by``;
    one shuffle co-locates each bucket; inside a bucket a single
    ``pd.merge_asof(by=...)`` handles all its keys vectorized.  The
    operator the reference ecosystem lacks entirely (SURVEY §2.7).
    ``num_buckets=None`` derives the fanout from the combined input size
    (~256 MB per bucket) the same way ``keyed_reduce`` does, so no join
    task materializes O(corpus / constant) rows.

    Ties on equal ``on`` values resolve to the right row latest in sort
    order (callers wanting determinism should pre-dedupe the right side).
    """
    import pandas as pd

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            h = pd.util.hash_pandas_object(batch[by].astype(str), index=False, hash_key="mysql_binlog_ray")
            # full 64-bit hash; the bucket mod is applied after sizing
            batch["_bh"] = h.to_numpy().view(np.int64)
            batch["_side"] = side
            return batch

        return fn

    l = left_ds.map_batches(tag("l"), batch_format="pandas")
    r = right_ds.map_batches(tag("r"), batch_format="pandas")
    # align schemas for union: null-fill the other side's columns
    l_cols = [c for c in l.schema().names if c not in ("_bh", "_side")]
    r_cols = [c for c in r.schema().names if c not in ("_bh", "_side")]

    def align(cols_missing):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            for c in cols_missing:
                batch[c] = None
            return batch

        return fn

    l = l.map_batches(align([c for c in r_cols if c not in l_cols]), batch_format="pandas")
    r = r.map_batches(align([c for c in l_cols if c not in r_cols]), batch_format="pandas")
    both = l.union(r)

    if num_buckets is None:
        both = both.materialize()  # about to be shuffled anyway
        sz = both.size_bytes() or 0
        # tiny combined input: ONE merge_asof task, no exchange (the
        # per-bucket join already handles all keys vectorized).  Empty
        # or unmeasured inputs keep the bucketed path, and an explicit
        # small target_part_bytes is honored (small_to_one compares
        # against min(small_bytes, target_part_bytes)).
        buckets = adaptive_num_parts(
            max(1, sz), target_part_bytes, min_parts=16, small_to_one=sz > 0
        )
    else:
        buckets = num_buckets

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = (
            batch["_bh"].to_numpy().view(np.uint64) % np.uint64(buckets)
        ).astype(np.int32)
        return batch.drop(columns=["_bh"])

    both = both.map_batches(add_bucket, batch_format="pandas")

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["_side"] == "l"][l_cols].sort_values([on])
        rg = group[group["_side"] == "r"][[by, on, *[c for c in right_cols if c != by]]].sort_values([on])
        if lg.empty:
            return pd.DataFrame(columns=[*l_cols, *[f"{c}{suffix}" for c in right_cols if c != by]])
        rg = rg.rename(columns={c: f"{c}{suffix}" for c in right_cols if c != by})
        out = pd.merge_asof(
            lg, rg, on=on, by=by, direction="backward", allow_exact_matches=True
        )
        return out

    if buckets == 1:
        # join_bucket ignores the _bucket column (it selects its output
        # columns explicitly), so one coalesced call covers every key
        return both.repartition(1).map_batches(
            join_bucket, batch_format="pandas", batch_size=None
        )
    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def interval_join(
    ds: rd.Dataset,
    intervals: pd.DataFrame,
    by: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    take_cols: list[str] | None = None,
    max_intermediate_rows: int = 4 << 20,
) -> rd.Dataset:
    """Keyed RANGE (interval-containment) join: every left row pairs with
    every interval of the same ``by`` key whose [lo, hi] contains its
    ``ts`` (inner semantics, multiplicity preserved).  The operator the
    brief lists next to as-of join; neither exists in Ray Data.

    Scale shape: the interval side is broadcast (``ray.put`` once, one
    object-store read per worker via :func:`broadcast_once`) — the
    standard case, since interval sets (maintenance windows, promo
    periods, user episodes) are orders of magnitude smaller than the
    fact stream.  For interval sides too big to broadcast, bucket both
    sides by ``by`` with ``keyed_reduce`` and run this join per
    partition.

    The pre-mask cross product is BOUNDED: each batch is processed in
    row chunks sized so the per-key cross product (sum of interval
    counts over the chunk's rows) stays under ``max_intermediate_rows``
    — a skewed key carrying many intervals can't blow up one task's
    heap."""
    cols = [by, lo_col, hi_col, *(take_cols or [])]
    get_small = broadcast_once(
        intervals[cols], lambda d: (d, d[by].value_counts())
    )

    def joiner(batch: pd.DataFrame) -> pd.DataFrame:
        small, per_key = get_small()
        est = per_key.reindex(batch[by]).fillna(0).to_numpy(dtype=np.float64)
        cum = np.cumsum(est)
        total = cum[-1] if len(cum) else 0.0

        def one(chunk: pd.DataFrame) -> pd.DataFrame:
            out = chunk.merge(small, on=by, how="inner")
            mask = (out[ts_col] >= out[lo_col]) & (out[ts_col] <= out[hi_col])
            return out[mask]

        if total <= max_intermediate_rows:
            return one(batch)
        splits = np.searchsorted(
            cum, np.arange(max_intermediate_rows, total, max_intermediate_rows)
        )
        parts = np.split(np.arange(len(batch)), np.unique(splits))
        return pd.concat(
            [one(batch.iloc[idx]) for idx in parts if len(idx)], ignore_index=True
        )

    return ds.map_batches(joiner, batch_format="pandas")


def sessionize(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    gap_sec: float,
) -> rd.Dataset:
    """Gap-based sessionization (the streaming-window operator class the
    reference lacks, next to ``tumbling_window``): per key, a new session
    starts when the time since the previous event exceeds ``gap_sec``.
    Returns one row per (key, session_id) with n_events / t_start_us /
    t_end_us (epoch microseconds — exact at the column's precision).

    Scale shape: ONE keyed exchange (``keyed_reduce`` — adaptive fanout,
    vectorized per partition: sort, diff, cumsum, groupby-agg; no
    per-key Python).  session_id is 0-based per key and deterministic:
    breaks depend only on the sorted timestamp sequence.  NULL keys form
    ONE group (SQL PARTITION BY parity — the key hash routes all NULLs
    to one partition, and factorize codes them as one key here)."""
    gap_us = int(gap_sec * 1_000_000)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # factorize so all NULLs share one code (NaN != NaN would both
        # split them pre-sort and drop them in the groupby below)
        codes, _ = pd.factorize(g[key_col], use_na_sentinel=True)
        g = g.assign(_kc=codes).sort_values(["_kc", ts_col], kind="mergesort")
        k = g["_kc"].to_numpy()
        t = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        newkey = np.ones(n, dtype=bool)
        newkey[1:] = k[1:] != k[:-1]
        brk = newkey.copy()
        brk[1:] |= (t[1:] - t[:-1]) > gap_us
        sid_g = np.cumsum(brk)
        first = np.flatnonzero(newkey)
        base = np.repeat(sid_g[first], np.diff(np.append(first, n)))
        out = pd.DataFrame(
            {
                "_kc": k,
                key_col: g[key_col].to_numpy(),
                "session_id": (sid_g - base).astype(np.int64),
                "_t": t,
            }
        )
        agg = out.groupby(["_kc", "session_id"], sort=False).agg(
            **{key_col: (key_col, "first")},
            n_events=("_t", "size"),
            t_start_us=("_t", "min"),
            t_end_us=("_t", "max"),
        )
        return agg.reset_index()[
            [key_col, "session_id", "n_events", "t_start_us", "t_end_us"]
        ]

    return keyed_reduce(ds, [key_col], combine)


def _scrub_join_input(ds: rd.Dataset) -> tuple[rd.Dataset, bool]:
    """Make one join input safe for Ray's hash-shuffle join.

    Ray 2.49's join races on 0-row input blocks: ``_shuffle_block``
    early-returns on an empty block WITHOUT broadcasting that side's
    schema while the driver marks schemas as broadcast anyway
    (``hash_shuffle.py:223`` vs ``:588``), so when an empty block is
    shuffled first, data-less partitions finalize as zero-column tables
    and ``pa.Table.join`` dies with "No match for key field ...".

    Bare file-read leaves pass through untouched — a parquet fragment
    block always carries its file's rows, and scrubbing would
    materialize the read.  Every TRANSFORMED input (filters,
    pre-aggregates, shuffle outputs — the ones that CAN emit empty
    blocks) is scrubbed with :func:`drop_empty_blocks`; the
    materialization this implies is acceptable because the join buffers
    both sides inside its aggregators anyway.

    Returns ``(dataset, known_empty)``; ``known_empty`` lets the caller
    skip the shuffle join entirely (an ALL-empty side re-triggers the
    same schema-broadcast race even after scrubbing, since its one
    schema-bearing empty block is still skipped by ``_shuffle_block``).
    """
    try:
        dag = ds._logical_plan.dag
        is_file_leaf = (
            type(dag).__name__ in ("Read", "ReadFiles")
            and not dag.input_dependencies
        )
    except Exception:
        is_file_leaf = False
    if is_file_leaf:
        # parquet metadata answers count() without reading data: a
        # 0-row file leaf must be flagged known_empty here, or the
        # downstream fast paths lose its rows silently (Ray skips map
        # UDFs on 0-row blocks, so a single-task join over an empty
        # left never runs and drops every unmatched right row)
        return ds, ds.count() == 0
    scrubbed = drop_empty_blocks(ds)
    # drop_empty_blocks returns a driver-created MaterializedDataset whose
    # row count is block metadata — count() here reads metadata only.
    return scrubbed, scrubbed.count() == 0


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _collect_table(ds: rd.Dataset) -> pa.Table:
    """Materialize a KNOWN-SMALL dataset into one Arrow table via block
    refs (``take_all`` pays per-row dict conversion; ``to_arrow_refs``
    re-executes the plan through its schema fetch — see
    :func:`drop_empty_blocks`).  Callers gate on a byte bound."""
    tables = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            blk = ray.get(ref)
            if isinstance(blk, pd.DataFrame):
                blk = pa.Table.from_pandas(blk, preserve_index=False)
            if blk.num_rows:
                tables.append(blk)
    if not tables:
        return _arrow_schema(ds).empty_table()
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def hash_join(
    left_ds: rd.Dataset,
    right_ds: rd.Dataset,
    on: str,
    right_on: str,
    num_partitions: int | None = None,
    join_type: str = "inner",
    target_part_bytes: int = 256 << 20,
    broadcast_bytes: int = 32 << 20,
) -> rd.Dataset:
    """Equi-join: broadcast fast path for a small side, hash-partitioned
    shuffle join for large-large.

    When one side is KNOWN small (<= ``broadcast_bytes``, measured from
    leaf/materialized block metadata — never by executing a transform),
    the join runs map-side: the small side is collected once, shipped
    once via ``ray.put``, and every batch of the big side does a local
    ``pa.Table.join`` against it — no all-to-all, no aggregator actor
    pool.  That is the right 100 TB shape for dimension tables AND the
    dominant constant-cost saving at small scale (the shuffle join pays
    ~1 s of actor-pool startup regardless of size).  Per-batch soundness
    bounds which types broadcast which side: inner either side,
    left_outer only the right, right_outer only the left, full_outer
    never (unmatched broadcast-side rows must appear exactly once
    globally).  Output columns/nulls are identical either path (Ray's
    shuffle join runs pyarrow joins per partition).

    ``num_partitions=None`` (the default) sizes the shuffle fanout from
    the two LEAF input sizes (parquet metadata — no plan execution;
    falls back to a cluster-proportional guess when a side isn't a leaf
    read), the same ~256 MB-per-partition rule as ``keyed_reduce``: a
    fixed constant would hand each join task O(corpus / constant) rows
    at 100 TB.

    Inputs are scrubbed of 0-row blocks first (:func:`_scrub_join_input`
    — Ray's schema-broadcast race), and a KNOWN-empty side short-circuits
    the shuffle: the join degenerates to a per-batch Arrow join of the
    live side against an empty table of the other side's schema (exact
    semantics for every join type, zero all-to-all)."""
    left_ds, l_empty = _scrub_join_input(left_ds)
    right_ds, r_empty = _scrub_join_input(right_ds)
    if l_empty or r_empty:
        verb = join_type.replace("_", " ")
        if l_empty and r_empty:
            lt = _arrow_schema(left_ds).empty_table()
            rt = _arrow_schema(right_ds).empty_table()
            return rd.from_arrow(
                lt.join(rt, keys=[on], right_keys=[right_on], join_type=verb)
            )
        if l_empty:
            empty_left = _arrow_schema(left_ds).empty_table()

            def join_vs_empty_left(b: pa.Table) -> pa.Table:
                return empty_left.join(
                    b, keys=[on], right_keys=[right_on], join_type=verb
                )

            return right_ds.map_batches(join_vs_empty_left, batch_format="pyarrow")
        empty_right = _arrow_schema(right_ds).empty_table()

        def join_vs_empty_right(b: pa.Table) -> pa.Table:
            return b.join(
                empty_right, keys=[on], right_keys=[right_on], join_type=verb
            )

        return left_ds.map_batches(join_vs_empty_right, batch_format="pyarrow")
    lb = metadata_size_bytes(left_ds)
    rb = metadata_size_bytes(right_ds)
    # broadcast fast path: pick the smallest eligible side.  Scrubbed
    # (transformed) inputs are already materialized, so their size is
    # block metadata; file leaves answer from parquet metadata.  An
    # EXPLICIT num_partitions pins the shuffle plan (callers sizing the
    # aggregator pool / regression tests) — never silently overridden.
    verb = join_type.replace("_", " ")
    cands = []
    if num_partitions is not None:
        broadcast_bytes = 0
    if join_type in ("inner", "left_outer") and rb is not None and rb <= broadcast_bytes:
        cands.append((rb, "right"))
    if join_type in ("inner", "right_outer") and lb is not None and lb <= broadcast_bytes:
        cands.append((lb, "left"))
    if cands:
        _, side = min(cands)
        if side == "right":
            get_small = broadcast_once(_collect_table(right_ds))

            def bcast_right(b: pa.Table) -> pa.Table:
                return b.join(
                    get_small(), keys=[on], right_keys=[right_on], join_type=verb
                )

            return left_ds.map_batches(bcast_right, batch_format="pyarrow")
        get_small = broadcast_once(_collect_table(left_ds))

        def bcast_left(b: pa.Table) -> pa.Table:
            return get_small().join(
                b, keys=[on], right_keys=[right_on], join_type=verb
            )

        return right_ds.map_batches(bcast_left, batch_format="pyarrow")
    # full_outer can never broadcast (unmatched broadcast-side rows must
    # appear exactly once globally) — but when BOTH sides are tiny the
    # whole join fits ONE task: coalesce the left to a single block and
    # join it against a broadcast right in one call, which makes the
    # exactly-once guarantee trivially true.  Same Arrow join kernel and
    # output columns as the other fast paths; skips the shuffle join's
    # ~1 s aggregator-pool startup.  At 100 TB no full_outer input is
    # this small, so the at-scale plan is unchanged.
    if (
        join_type == "full_outer"
        and num_partitions is None
        and lb is not None
        and rb is not None
        and lb + rb <= broadcast_bytes
    ):
        get_small = broadcast_once(_collect_table(right_ds))

        def join_single(b: pa.Table) -> pa.Table:
            return b.join(
                get_small(), keys=[on], right_keys=[right_on], join_type=verb
            )

        return left_ds.repartition(1).map_batches(
            join_single, batch_format="pyarrow", batch_size=None
        )
    if num_partitions is None:
        # cluster-proportional guess for unmeasurable inputs (each
        # partition costs an aggregator slot + actor startup, so a flat
        # constant over-pays on small clusters and under-splits on big)
        cpu_guess = max(16, min(256, int(ray.cluster_resources().get("CPU", 8) or 8)))
        if lb is None and rb is None:
            num_partitions = cpu_guess
        elif lb is None or rb is None:
            # one side unmeasurable: size from the known side but never
            # BELOW the blind guess — a small measured side must not
            # shrink the fanout for a potentially huge transformed side
            num_partitions = max(
                cpu_guess,
                adaptive_num_parts((lb or 0) + (rb or 0), target_part_bytes, min_parts=4),
            )
        else:
            # both measured; min floor 4: each partition costs an
            # aggregator-actor slot + ~0.5s startup, so small inputs
            # should not pay for a big pool (fanout still grows with bytes)
            num_partitions = adaptive_num_parts(
                lb + rb, target_part_bytes, min_parts=4
            )
    # Ray's join spawns an aggregator ACTOR pool whose default per-actor
    # CPU reservation scales with partitions-per-aggregator; when the
    # pool's total reservation reaches the cluster size the actors (or
    # the upstream map tasks they must coexist with) never all become
    # ready and the join deadlocks (observed: 64 partitions on an 8-CPU
    # local cluster).  The fix must NOT cap num_partitions (each
    # aggregator materializes its partitions — capping fanout at CPUs
    # makes partitions O(data/CPUs) and OOMs on big joins): instead size
    # the PER-AGGREGATOR reservation so the whole pool totals ~half the
    # cluster, leaving the other half to the upstream map tasks.
    # (Mutating DataContext doesn't work here: the operator uses the
    # context captured at dataset creation.)
    cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
    ctx_max = (
        getattr(rd.DataContext.get_current(), "max_hash_shuffle_aggregators", None)
        or 64
    )
    expected_aggs = max(1, min(num_partitions, ctx_max))
    per_agg_cpus = max(0.05, (cpus / 2) / expected_aggs)
    return left_ds.join(
        right_ds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
        aggregator_ray_remote_args={
            "num_cpus": per_agg_cpus,
            "scheduling_strategy": "SPREAD",
        },
    )


def bloom_join(
    left_ds: rd.Dataset,
    right_ds: rd.Dataset,
    on: str,
    right_on: str,
    m_bits: int = 1 << 23,
    k: int = 6,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Bloom-prefiltered hash join (the classic shuffle-reduction
    pattern): stream the selective right side ONCE into a mergeable
    Bloom filter (per-block partials, OR tree-merge), broadcast it, and
    drop left rows whose key is DEFINITELY absent BEFORE the all-to-all
    join exchange.  No false negatives, so the result is exactly
    ``hash_join``'s; false positives (~1% at 10 bits/key) only cost
    shuffle bytes.  The scale win: when the right side matches x% of
    left keys, the left shuffle shrinks to ~x% + FP — at 100 TB that is
    the difference between shipping the full fact table and shipping
    only the joinable slice.  The right side is consumed twice (filter
    build + join) — cheap when it is the small/filtered side, which is
    when a Bloom prefilter pays at all.  Only inner/semi-shaped
    ``join_type``s are sound (an outer left side must keep non-matching
    rows)."""
    if join_type not in ("inner",):
        raise ValueError("bloom_join: only inner joins can drop left rows early")
    from .sketches import BloomFilter, _bloom_hash_strings, build_bloom

    bloom = build_bloom(right_ds, right_on, m_bits, k)
    get_bf = broadcast_once(
        bloom.to_bytes(), prepare=lambda blob: BloomFilter.from_bytes(blob, k)
    )

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[get_bf().contains_hashes(_bloom_hash_strings(batch[on]))]

    pref = left_ds.map_batches(prefilter, batch_format="pandas")
    return hash_join(
        pref,
        right_ds,
        on=on,
        right_on=right_on,
        join_type=join_type,
        num_partitions=num_partitions,
    )


def skew_join(
    left_ds: rd.Dataset,
    right_ds: rd.Dataset,
    on: str,
    right_on: str,
    hot_threshold: int,
    join_type: str = "inner",
    num_partitions: int | None = None,
    max_broadcast_rows: int = 2_000_000,
) -> rd.Dataset:
    """Skew-aware large-large equi-join: HOT keys (left-side frequency >
    ``hot_threshold``) join map-side against a broadcast of the right
    side's hot rows; the COLD remainder goes through the ordinary
    hash-partitioned join.  Result == ``hash_join`` row-for-row — the key
    space is split disjointly and each half joins completely within its
    path — but no shuffle partition ever holds a hot key's full row set,
    which is the classic all-to-all skew killer at 100 TB (one zipf-hot
    key lands O(key_count) rows on ONE join task).

    Scale shape: hot detection is `sketches.exact_heavy_hitters` (a
    Space-Saving sketch pass + an exact count of the candidate superset —
    kilobytes to the driver); the right side's hot rows must be
    broadcastable (dimension-bounded per key) — if they exceed
    ``max_broadcast_rows`` this falls back to the plain hash join with a
    warning, never a silent driver blowup.  ``join_type`` supports
    ``inner`` and ``left_outer`` (their semantics decompose per key
    subset map-side; right/full outer would need unmatched-right
    tracking across batches — use ``hash_join``)."""
    import logging

    from .sketches import exact_heavy_hitters

    if join_type not in ("inner", "left_outer"):
        raise ValueError(f"skew_join: unsupported join_type {join_type!r}")

    logger = logging.getLogger(__name__)
    hot = exact_heavy_hitters(
        left_ds.map_batches(lambda b: b.select([on]), batch_format="pyarrow"),
        on,
        threshold=hot_threshold,
    )
    hot = hot[hot[on].notna()]
    if hot.empty:
        return hash_join(
            left_ds, right_ds, on, right_on,
            num_partitions=num_partitions, join_type=join_type,
        )

    hot_set = pa.array(hot[on].to_numpy())

    def keep_hot(col: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b.column(col), value_set=hot_set))

        return fn

    def keep_cold(col: str):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.is_in(b.column(col), value_set=hot_set)
            # NULL keys: is_in yields null -> fill false so NULL-keyed
            # rows ride the cold path (they join nothing / left-outer
            # there, exactly as in the plain hash join)
            return b.filter(pc.invert(pc.fill_null(m, False)))

        return fn

    right_hot = right_ds.map_batches(
        keep_hot(right_on), batch_format="pyarrow"
    ).materialize()
    if right_hot.count() > max_broadcast_rows:
        logger.warning(
            "skew_join: right side has %d rows under hot keys "
            "(max_broadcast_rows=%d) — falling back to the plain hash join",
            right_hot.count(), max_broadcast_rows,
        )
        return hash_join(
            left_ds, right_ds, on, right_on,
            num_partitions=num_partitions, join_type=join_type,
        )
    get_right = broadcast_once(right_hot.to_pandas())
    how = "inner" if join_type == "inner" else "left"

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(get_right(), left_on=on, right_on=right_on, how=how)

    hot_joined = left_ds.map_batches(
        keep_hot(on), batch_format="pyarrow"
    ).map_batches(probe, batch_format="pandas")
    cold_joined = hash_join(
        left_ds.map_batches(keep_cold(on), batch_format="pyarrow"),
        right_ds.map_batches(keep_cold(right_on), batch_format="pyarrow"),
        on,
        right_on,
        num_partitions=num_partitions,
        join_type=join_type,
    )
    # align column order across the two paths before the union (Ray's
    # join drops the right key column; the pandas merge keeps it)
    cols = list(left_ds.schema().names) + [
        n for n in right_ds.schema().names if n != right_on
    ]

    def align(b: pa.Table) -> pa.Table:
        return b.select(cols)

    return hot_joined.map_batches(align, batch_format="pyarrow").union(
        cold_joined.map_batches(align, batch_format="pyarrow")
    )


def stratified_first_n(
    ds: rd.Dataset, strata_col: str, order_col: str, n: int
) -> rd.Dataset:
    """Deterministic per-stratum sample: first n rows per stratum ordered
    by ``order_col`` (hash-partitioned group-first; SQL-oracle-able,
    unlike a random sample)."""
    import pandas as pd

    def head(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(order_col).head(n)

    return ds.groupby(strata_col).map_groups(head, batch_format="pandas")


def hopping_window(
    ds: rd.Dataset,
    ts_col: str,
    key_cols: list[str],
    width_sec: int,
    hop_sec: int,
    spec: AggSpec,
) -> rd.Dataset:
    """Hopping (sliding) event-time window aggregate: windows of
    ``width_sec`` starting every ``hop_sec`` — each event lands in
    ``width/hop`` overlapping windows.  The explode is vectorized
    (``np.repeat`` + per-copy window offsets, no per-row Python), then
    the same pre-aggregated groupby as :func:`tumbling_window`, so the
    shuffle carries per-(key, window) partials, not the exploded rows.

    NULL timestamps emit no windows (SQL parity — NaT would otherwise
    decode to INT64_MIN-sized windows).  Window alignment is FLOOR
    division (pre-epoch timestamps round toward -inf); a trunc-division
    oracle only agrees on post-epoch data."""
    assert width_sec % hop_sec == 0, "width must be a multiple of hop"
    fan = width_sec // hop_sec
    # project to the columns the aggregate can see BEFORE the fan-times
    # explode — never duplicate payload columns the spec ignores
    need = list(
        dict.fromkeys(
            [ts_col, *key_cols]
            + [in_col for in_col, _ in spec.values() if in_col is not None]
        )
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[need]
        batch = batch[batch[ts_col].notna()]
        sec = batch[ts_col].to_numpy().astype("datetime64[s]").astype("int64")
        last = (sec // hop_sec) * hop_sec  # latest window containing t
        idx = np.repeat(np.arange(len(batch)), fan)
        off = np.tile(np.arange(fan, dtype=np.int64) * hop_sec, len(batch))
        out = batch.iloc[idx].reset_index(drop=True)
        out["window_start"] = np.repeat(last, fan) - off
        return out

    exploded = ds.map_batches(explode, batch_format="pandas")
    return preagg_groupby(exploded, [*key_cols, "window_start"], spec)


def grouped_string_agg(
    ds: rd.Dataset,
    keys: list[str],
    val_col: str,
    order_cols: list[str],
    sep: str = ",",
    out_col: str = "agg",
    count_col: str = "n",
) -> rd.Dataset:
    """SQL ``string_agg(val, sep ORDER BY order_cols)`` + ``count(*)``
    per key (the list/collect aggregate class): ONE keyed exchange
    (``keyed_reduce``), per partition a stable mergesort by the order
    columns then pandas' C-level per-group join — group cardinality
    never appears in a Python loop of ours.  NULL values are skipped
    (SQL string_agg semantics; an all-NULL group yields NULL), NULL keys
    form one group each (``dropna=False``).  ``order_cols`` must totally
    order rows within a key or the concatenation is nondeterministic."""

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        cnt = g.groupby(keys, sort=False, dropna=False).size().rename(count_col)
        nn = g[g[val_col].notna()]
        agg = (
            nn.groupby(keys, sort=False, dropna=False)[val_col]
            .agg(sep.join)
            .rename(out_col)
        )
        return pd.concat([cnt, agg], axis=1).reset_index()

    return keyed_reduce(ds, keys, combine)


def pct_col_names(qs: list[float]) -> list[str]:
    """``p50``-style names; round, don't truncate — ``int(0.29 * 100)``
    is 28 (float representation), which would misname the column.

    Raises when two quantiles collide onto one name (banker's rounding:
    qs=[0.135, 0.145] both yield ``p14``) — a silent duplicate would
    overwrite one output column in ``group_percentiles`` and crash
    ``quantile_sketch_per_group`` with a length mismatch; callers with
    sub-percent quantiles must pass explicit ``out_cols``."""
    names = [f"p{round(q * 100)}" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"pct_col_names: quantiles {qs} collide onto duplicate column "
            f"names {names} — pass explicit out_cols"
        )
    return names


def group_percentiles(
    ds: rd.Dataset,
    keys: list[str],
    val_col: str,
    qs: list[float],
    out_cols: list[str] | None = None,
) -> rd.Dataset:
    """EXACT per-group discrete percentiles (SQL ``percentile_disc`` /
    DuckDB ``quantile_disc`` semantics: the smallest element whose
    cumulative rank reaches q, i.e. sorted index ``ceil(q*n)-1``).

    NULL values are ignored (SQL aggregate semantics); a group whose
    values are ALL NULL is still emitted, with NULL percentiles.

    Scale shape: ONE keyed exchange (``keyed_reduce``); the per-partition
    combine is a single vectorized sort + ``np.searchsorted``-free offset
    pick — no per-group Python, no global sort of the whole input."""
    out_cols = out_cols or pct_col_names(qs)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # NaN sorts last within each group, so the non-null values of a
        # group are contiguous from its start offset
        g = g.sort_values([*keys, val_col], kind="mergesort", na_position="last")
        vals = g[val_col].to_numpy()
        n = len(g)
        newkey = np.ones(n, dtype=bool)
        if n > 1:
            acc = np.zeros(n - 1, dtype=bool)
            for kc in keys:
                # factorize codes: NULL keys form one group (NaN != NaN
                # would split them), and != is dtype-safe
                a, _ = pd.factorize(g[kc], use_na_sentinel=True)
                acc |= a[1:] != a[:-1]
            newkey[1:] = acc
        starts = np.flatnonzero(newkey)
        # SQL aggregates ignore NULL values: rank over the group's
        # non-null count, not its row count
        nonnull = g[val_col].notna().to_numpy(dtype=np.int64)
        sizes = np.add.reduceat(nonnull, starts) if n else np.array([], dtype=np.int64)
        empty = sizes == 0
        cols = {kc: g[kc].to_numpy()[starts] for kc in keys}
        for q, oc in zip(qs, out_cols):
            # -1e-9 tolerance: ceil(0.07 * 100) must be 7, not 8 — q*n
            # can carry upward float error past the integer
            rank = np.ceil(q * sizes - 1e-9).astype(np.int64).clip(1) - 1
            picked = pd.Series(vals[starts + np.minimum(rank, np.maximum(sizes - 1, 0))])
            if empty.any():
                # all-NULL group: emit the group with a NULL percentile
                # (nullable dtype maps to the same Arrow type)
                picked = picked.convert_dtypes()
                picked[empty] = pd.NA
            cols[oc] = picked
        return pd.DataFrame(cols)

    return keyed_reduce(ds, keys, combine)


def winsorize(
    ds: rd.Dataset,
    keys: list[str],
    val_col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    out_col: str = "clipped",
) -> rd.Dataset:
    """Per-group winsorization: clip ``val_col`` to its group's
    [q_lo, q_hi] EXACT discrete percentiles (``quantile_disc`` — clip
    bounds are actual data values, so no interpolation arithmetic and
    the SQL oracle matches bit-for-bit).  NULL values stay NULL.

    Rows with a NULL group key are DROPPED (the SQL twin's inner
    ``JOIN ... USING (keys)`` never matches NULL keys; pandas merge
    would silently match NaN==NaN and diverge from the oracle).

    Scale shape: bounds come from :func:`group_percentiles` (one keyed
    exchange, one row per group) and are broadcast once; the clip is a
    stateless vectorized ``map_batches``.  Intended for bounded group
    cardinality (the bounds table is the broadcast)."""

    def drop_null_keys(tab: pa.Table) -> pa.Table:
        mask = None
        for k in keys:
            v = pc.is_valid(tab[k])
            mask = v if mask is None else pc.and_(mask, v)
        return tab.filter(mask)

    ds = ds.map_batches(drop_null_keys, batch_format="pyarrow")
    bounds = group_percentiles(ds, keys, val_col, [q_lo, q_hi], ["_lo", "_hi"]).to_pandas()
    get_bounds = broadcast_once(bounds)

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        merged = batch.merge(get_bounds(), on=keys, how="left")
        v = merged[val_col].to_numpy(dtype=np.float64, na_value=np.nan)
        lo = merged["_lo"].to_numpy(dtype=np.float64, na_value=np.nan)
        hi = merged["_hi"].to_numpy(dtype=np.float64, na_value=np.nan)
        # groups absent from bounds cannot occur (bounds derive from the
        # same input); all-NULL groups have NaN bounds and NaN values,
        # so the NaN-propagating clip is vacuously correct there
        batch = batch.copy()
        batch[out_col] = np.clip(v, lo, hi)
        return batch

    return ds.map_batches(clip, batch_format="pandas")


def mad_outliers(
    ds: rd.Dataset,
    keys: list[str],
    val_col: str,
    k: float = 3.0,
    out_col: str = "is_outlier",
) -> rd.Dataset:
    """Per-group robust outlier detection via the median absolute
    deviation: flag rows with ``|v - median| > k * MAD`` (both the
    median and the MAD are EXACT ``quantile_disc`` picks, and the flag
    is one subtraction, one abs, one multiply, one compare — identical
    IEEE ops on both sides, so the SQL oracle matches bit-for-bit).

    Rows with NULL group keys or NULL values are dropped (the SQL
    twin's inner joins never match NULL keys; a NULL value has no
    defined deviation).

    Scale shape: two ``group_percentiles`` exchanges (median, then MAD
    over deviations) with the small per-group tables broadcast once
    each; the flagging pass is a stateless vectorized map."""

    def drop_nulls(tab: pa.Table) -> pa.Table:
        mask = pc.is_valid(tab[val_col])
        for kc in keys:
            mask = pc.and_(mask, pc.is_valid(tab[kc]))
        return tab.filter(mask)

    ds = ds.map_batches(drop_nulls, batch_format="pyarrow")
    med = group_percentiles(ds, keys, val_col, [0.5], ["_med"]).to_pandas()
    get_med = broadcast_once(med)

    def add_dev(batch: pd.DataFrame) -> pd.DataFrame:
        merged = batch.merge(get_med(), on=keys, how="left")
        batch = batch.copy()
        batch["_dev"] = np.abs(
            merged[val_col].to_numpy(dtype=np.float64)
            - merged["_med"].to_numpy(dtype=np.float64)
        )
        return batch

    with_dev = ds.map_batches(add_dev, batch_format="pandas")
    mad = group_percentiles(with_dev, keys, "_dev", [0.5], ["_mad"]).to_pandas()
    get_mad = broadcast_once(mad)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        merged = batch.merge(get_mad(), on=keys, how="left")
        out = batch.drop(columns=["_dev"]).copy()
        out[out_col] = batch["_dev"].to_numpy() > k * merged["_mad"].to_numpy()
        return out

    return with_dev.map_batches(flag, batch_format="pandas")


def grouped_top_n(
    ds: rd.Dataset,
    group_cols: list[str],
    sort_cols: list[tuple[str, bool]],
    n: int,
) -> rd.Dataset:
    """Per-group top-N (the ``ROW_NUMBER() OVER (PARTITION BY ...) <= n``
    window pattern): ONE keyed exchange, then a vectorized per-partition
    sort + ``groupby.head(n)`` (pandas C kernels; no per-group Python).
    ``sort_cols`` is [(col, descending)] and must be a total order for
    deterministic output (include a unique id as the last tie-break)."""
    by = [c for c, _ in sort_cols]
    ascending = [not d for _, d in sort_cols]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=ascending, kind="mergesort")
        return g.groupby(group_cols, sort=False, dropna=False).head(n)

    return keyed_reduce(ds, group_cols, combine)


def set_op(
    left_ds: rd.Dataset,
    right_ds: rd.Dataset,
    cols: list[str],
    op: str,
    num_parts: int | None = None,
) -> rd.Dataset:
    """SQL set operations over DISTINCT rows: ``intersect`` / ``except``
    (bag-of-distinct-rows semantics, NULL treated as a value — exactly
    SQL's ``INTERSECT`` / ``EXCEPT``).

    Scale shape: each side deduplicates per batch first (the shuffle
    carries per-batch distinct partials, not raw rows), then ONE keyed
    exchange on the row value decides membership per side vectorized
    in-partition.  Nothing on the driver."""
    if op not in ("intersect", "except"):
        raise ValueError(f"set_op: op must be 'intersect' or 'except', got {op!r}")

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            g = b.select(cols).group_by(cols).aggregate([])
            return g.append_column(
                "_side", pa.array(np.full(g.num_rows, side, dtype=np.int64))
            )

        return fn

    both = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    want_right = op == "intersect"

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(cols, sort=False, dropna=False)["_side"]
        has_l = gb.min() == 0
        has_r = gb.max() == 1
        # intersect: on both sides; except: on left only
        keep = has_l & (has_r if want_right else ~has_r)
        out = keep[keep].index.to_frame(index=False)
        out.columns = cols
        return out

    out = keyed_reduce(both, cols, decide, num_parts=num_parts)
    # an all-empty result loses its schema through the shuffle (Ray SKIPS
    # map UDFs on 0-row blocks, so no downstream map can retype them):
    # physically drop the empty blocks, typing the all-empty edge from
    # the left input's Arrow schema when it has one
    lsch = left_ds.schema()
    typed = {n: t for n, t in zip(lsch.names, lsch.types)}
    if all(isinstance(typed.get(c), pa.DataType) for c in cols):
        anchor = pa.schema([(c, typed[c]) for c in cols])
    else:  # pandas-block inputs report Python/extension types
        anchor = pa.schema([])
    return drop_empty_blocks(out, anchor)


def broadcast_semi_join(
    ds: rd.Dataset,
    right_ds: rd.Dataset,
    left_on: str,
    right_on: str,
) -> rd.Dataset:
    """Semi join (``EXISTS``): keep left rows whose key occurs on the
    right — the mirror of ``broadcast_anti_join`` (same distinct-keys
    reduction + one broadcast, vectorized ``isin`` probe, no shuffle).
    NULL left keys never match (SQL semantics: NULL = x is never true),
    and NULL right keys are dropped from the probe set for the same
    reason."""
    keys = preagg_groupby(right_ds, [right_on], {"_n": (None, "count")}).to_pandas()
    keys = keys[keys[right_on].notna()]
    get_keys = broadcast_once(keys[right_on].to_numpy())

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[left_on].isin(get_keys()) & batch[left_on].notna()]

    return ds.map_batches(probe, batch_format="pandas")


def broadcast_anti_join(
    ds: rd.Dataset,
    right_ds: rd.Dataset,
    left_on: str,
    right_on: str,
) -> rd.Dataset:
    """Anti join (``NOT EXISTS``): keep left rows whose key never occurs
    on the right.  The right side is reduced to its DISTINCT keys first
    (pre-aggregated — the shuffle carries per-batch distinct partials),
    then broadcast once; the probe is a vectorized ``isin`` negation.
    For right key sets too large to broadcast, route both sides through
    ``keyed_reduce`` and anti-join per partition."""
    keys = preagg_groupby(right_ds, [right_on], {"_n": (None, "count")}).to_pandas()
    # NOT EXISTS semantics: a NULL right key matches nothing (NULL = x is
    # never true), but pandas isin treats NaN == NaN — drop NULLs from
    # the probe set so NULL-keyed left rows are kept, as SQL does
    keys = keys[keys[right_on].notna()]
    get_keys = broadcast_once(keys[right_on].to_numpy())

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[left_on].isin(get_keys())]

    return ds.map_batches(probe, batch_format="pandas")


def mode_per_group(
    ds: rd.Dataset,
    keys: list[str],
    val_col: str,
    count_col: str = "n_mode",
) -> rd.Dataset:
    """Statistical mode per group with a deterministic tie-break (the
    SMALLEST value among the most frequent wins — SQL ``ROW_NUMBER()
    OVER (PARTITION BY keys ORDER BY count DESC, value)`` semantics, so
    an exact oracle exists).  NULL values are ignored (a group whose
    values are all NULL disappears, like SQL ``mode() FILTER (WHERE v IS
    NOT NULL)``); NULL keys form one group each.

    Two-level shape like ``grouped_count_distinct``: a per-batch partial
    count on ``(keys..., value)`` collapses duplicates BEFORE the only
    exchange, so the shuffle carries one row per distinct pair per
    block, never per input row; the final per-key argmax is a vectorized
    sort + head(1) over O(distinct pairs) rows."""

    def partial(b: pa.Table) -> pa.Table:
        # explicit output schema from the INPUT's Arrow types: an
        # all-NULL batch otherwise infers a null-typed value column on
        # its empty frame — a schema-divergent block in the shuffle (the
        # repo's documented empty-block trap)
        out_schema = pa.schema(
            [b.schema.field(c) for c in [*keys, val_col]]
            + [pa.field("_cnt", pa.int64())]
        )
        df = b.select([*keys, val_col]).to_pandas()
        df = df[df[val_col].notna()]
        if not len(df):
            return out_schema.empty_table()
        cnt = (
            df.groupby([*keys, val_col], sort=False, dropna=False)
            .size()
            .rename("_cnt")
            .reset_index()
        )
        return pa.Table.from_pandas(cnt, schema=out_schema, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        tot = (
            g.groupby([*keys, val_col], sort=False, dropna=False)["_cnt"]
            .sum()
            .reset_index()
        )
        tot = tot.sort_values(
            [*keys, "_cnt", val_col], ascending=[True] * len(keys) + [False, True],
            kind="mergesort",
        )
        top = tot.groupby(keys, sort=False, dropna=False).head(1)
        return top.rename(columns={"_cnt": count_col}).reset_index(drop=True)

    return keyed_reduce(ds.map_batches(partial, batch_format="pyarrow"), keys, combine)


def grouped_count_distinct(
    ds: rd.Dataset,
    keys: list[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    total_col: str | None = None,
) -> rd.Dataset:
    """``count(DISTINCT x)`` per group — the distinct-aggregate pattern a
    plain pre-aggregated groupby can't express (distinct partials don't
    merge by summing).  Two-level reduce: level 1 groups on
    ``(keys..., x)`` with a per-batch combiner, so the first (only
    large) shuffle carries one row per distinct ``(key, x)`` pair per
    batch — duplicates collapse before they move; level 2 groups the
    already-distinct pairs on ``keys`` and counts rows (plus, when
    ``total_col`` is set, sums the carried counts = ``count(*)``).
    Both shuffles are pre-aggregated; nothing is row-wise Python.

    SQL ``count(DISTINCT x)`` ignores NULL x, while ``count(*)`` counts
    every row — so NULL x travels as a (fill-value, null-marker) pair
    (a Ray groupby can't key on NULL anyway): the NULL pair still
    carries its rows into ``total_col``, but contributes 0 to the
    distinct count."""
    import pyarrow.compute as pc

    def _fill_value(t: pa.DataType):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return ""
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return b""
        if pa.types.is_boolean(t):
            return False
        return 0

    # an all-NULL block slice can arrive as Arrow `null` type — resolve
    # the column's REAL type once from the dataset schema so every
    # block's fill value (and thus the shuffle schema) agrees
    try:
        field_t = ds.schema().base_schema.field(distinct_col).type
    except Exception:
        field_t = None
    target_t = (
        field_t if field_t is not None and not pa.types.is_null(field_t) else pa.int64()
    )

    def tag(b: pa.Table) -> pa.Table:
        col = b.column(distinct_col)
        i = b.schema.get_field_index(distinct_col)
        if pa.types.is_null(col.type):
            col = pa.nulls(b.num_rows, target_t)
        b = b.set_column(i, distinct_col, col.fill_null(_fill_value(col.type)))
        return b.append_column("_dn", pc.is_null(col).cast(pa.int64()))

    pairs = preagg_groupby(
        ds.map_batches(tag, batch_format="pyarrow"),
        [*keys, distinct_col, "_dn"],
        {"_n": (None, "count")},
    )

    def mark(b: pa.Table) -> pa.Table:
        one = pc.subtract(pa.scalar(1, pa.int64()), b.column("_dn"))
        return b.append_column("_nn", one)

    marked = pairs.map_batches(mark, batch_format="pyarrow")
    spec: AggSpec = {out_col: ("_nn", "sum")}
    if total_col is not None:
        spec[total_col] = ("_n", "sum")
    return preagg_groupby(marked, keys, spec)


def grouped_corr(
    ds: rd.Dataset,
    keys: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "corr",
) -> rd.Dataset:
    """Pearson correlation per group via mergeable integer moments: the
    per-batch combiner computes exact int64 sums (n, Σx, Σy, Σx², Σy²,
    Σxy), the global groupby merges them (associativity-safe — integer
    partials, unlike float running sums), and ONE final float expression
    produces corr — so results are bit-deterministic regardless of batch
    layout, and a SQL oracle spelling the identical expression matches
    exactly.  ``x_col``/``y_col`` must be integer-typed (pre-scale
    decimals to fixed-point ints) with magnitudes such that n·Σx² fits
    float64's exact-product range; NULLs in either input drop the row
    (SQL corr semantics).

    Output: keys, ``n`` (int64), ``avg_x``/``avg_y`` (single divides)
    and ``out_col`` (NULL when a side is constant — zero variance)."""
    import pyarrow.compute as pc

    def moments(b: pa.Table) -> pa.Table:
        x = b.column(x_col)
        y = b.column(y_col)
        keep = pc.and_(pc.is_valid(x), pc.is_valid(y))
        b = b.filter(keep)
        x = b.column(x_col).to_numpy().astype(np.int64)
        y = b.column(y_col).to_numpy().astype(np.int64)
        cols = {k: b.column(k) for k in keys}
        cols["_sx"] = pa.array(x)
        cols["_sy"] = pa.array(y)
        cols["_sxx"] = pa.array(x * x)
        cols["_syy"] = pa.array(y * y)
        cols["_sxy"] = pa.array(x * y)
        return pa.table(cols)

    pruned = ds.map_batches(moments, batch_format="pyarrow")
    sums = preagg_groupby(
        pruned,
        keys,
        {
            "n": (None, "count"),
            "_sx": ("_sx", "sum"),
            "_sy": ("_sy", "sum"),
            "_sxx": ("_sxx", "sum"),
            "_syy": ("_syy", "sum"),
            "_sxy": ("_sxy", "sum"),
        },
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy().astype(np.float64)
        sx = b.column("_sx").to_numpy().astype(np.float64)
        sy = b.column("_sy").to_numpy().astype(np.float64)
        sxx = b.column("_sxx").to_numpy().astype(np.float64)
        syy = b.column("_syy").to_numpy().astype(np.float64)
        sxy = b.column("_sxy").to_numpy().astype(np.float64)
        # the EXACT float expression the oracle spells: every product,
        # difference, sqrt and divide is IEEE-correctly-rounded, so same
        # order of operations == bit-identical result
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = cov / (np.sqrt(vx) * np.sqrt(vy))
        corr = np.where((vx <= 0) | (vy <= 0), np.nan, corr)
        cols = {k: b.column(k) for k in keys}
        cols["n"] = b.column("n")
        cols["avg_x"] = pa.array(sx / n)
        cols["avg_y"] = pa.array(sy / n)
        cols[out_col] = pa.array(corr, pa.float64(), from_pandas=True)
        return pa.table(cols)

    return sums.map_batches(finish, batch_format="pyarrow")


def exact_global_percentiles(
    ds: rd.Dataset,
    val_col: str,
    qs: list[float],
    coarse_shift: int = 16,
) -> pa.Table:
    """EXACT global discrete percentiles of an int64 column WITHOUT a
    global sort (``quantile_disc`` rank rule: sorted index ``ceil(q*n)-1``,
    matching :func:`group_percentiles`).

    Two-pass histogram selection: pass 1 pre-aggregates counts per
    COARSE bucket (``v >> coarse_shift`` — at most ``2^48`` buckets over
    full int64, in practice |distinct buckets| ≪ rows reach the driver);
    the tiny sorted bucket frame locates each q's bucket and residual
    rank; pass 2 re-scans ONLY rows in the ≤ |qs| selected buckets
    (predicate applied before the shuffle), pre-aggregates exact
    value→count inside them (≤ 2^coarse_shift distinct values each) and
    picks by residual rank.  Both shuffles carry per-batch partials;
    the driver only ever holds bucket/value histograms, never rows.
    NULLs are ignored (SQL aggregate semantics)."""
    import pyarrow.compute as pc

    def bucketize(b: pa.Table) -> pa.Table:
        v = b.column(val_col)
        b = b.filter(pc.is_valid(v))
        x = b.column(val_col).to_numpy().astype(np.int64)
        return pa.table({"_bkt": pa.array(x >> coarse_shift)})

    hist = preagg_groupby(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        ["_bkt"],
        {"cnt": (None, "count")},
    ).to_pandas()
    # all-NULL/empty input: the aggregate emits a zero-COLUMN frame
    n = int(hist["cnt"].sum()) if "cnt" in hist.columns else 0
    if n:
        hist = hist.sort_values("_bkt").reset_index(drop=True)
    if n == 0:
        return pa.table(
            {"q": pa.array(qs, pa.float64()), val_col: pa.nulls(len(qs), pa.int64())}
        )
    cum = hist["cnt"].cumsum().to_numpy()
    ranks = [max(0, int(np.ceil(q * n - 1e-9)) - 1) for q in qs]
    # bucket containing each rank + residual rank within that bucket
    bkt_idx = np.searchsorted(cum, np.array(ranks), side="right")
    need = {}
    for q, r, bi in zip(qs, ranks, bkt_idx):
        bkt = int(hist["_bkt"].iloc[bi])
        resid = r - (int(cum[bi - 1]) if bi > 0 else 0)
        need.setdefault(bkt, []).append((q, resid))
    need_buckets = np.array(sorted(need), dtype=np.int64)

    def in_need(b: pa.Table) -> pa.Table:
        v = b.column(val_col)
        b = b.filter(pc.is_valid(v))
        x = b.column(val_col).to_numpy().astype(np.int64)
        mask = np.isin(x >> coarse_shift, need_buckets)
        return pa.table({val_col: pa.array(x[mask])})

    fine = (
        preagg_groupby(
            ds.map_batches(in_need, batch_format="pyarrow"),
            [val_col],
            {"cnt": (None, "count")},
        )
        .to_pandas()
        .sort_values(val_col)
        .reset_index(drop=True)
    )
    fv = fine[val_col].to_numpy()
    fb = fv >> coarse_shift
    out_q, out_v = [], []
    for bkt, wants in need.items():
        sel = fb == bkt
        vals = fv[sel]
        # cumulative counts WITHIN the bucket
        c = fine["cnt"].to_numpy()[sel].cumsum()
        for q, resid in wants:
            out_q.append(q)
            out_v.append(int(vals[np.searchsorted(c, resid, side="right")]))
    order = np.argsort(np.array(out_q), kind="stable")
    return pa.table(
        {
            "q": pa.array(np.array(out_q)[order], pa.float64()),
            val_col: pa.array(np.array(out_v, dtype=np.int64)[order]),
        }
    )


def approx_percentiles_by_sample(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    qs: list[float],
    rate: float,
    coarse_shift: int = 16,
    seed: int = 0,
) -> pa.Table:
    """Approximate global percentiles for 100-TB inputs: deterministic
    hash-threshold row sampling (``splitmix64(key + seed) % 10000 <
    rate_e4``) followed by :func:`exact_global_percentiles` over the
    sample.  The sample is a pure function of keys — order-insensitive,
    trivially mergeable across shards, stable under re-runs and
    repartitions — which is exactly the property a randomized KLL sketch
    gives up; error is the usual DKW ~O(1/sqrt(rate*n)) bound on ranks.
    Because the sample is deterministic, an exact SQL twin exists (same
    predicate + quantile_disc), so even the APPROXIMATE operator is
    oracle-checkable bit-for-bit."""
    from .split import SPLIT_BUCKETS, _rate_e4, splitmix64

    cut = np.int64(_rate_e4(rate, val_col))

    def keep(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        if len(keys) and keys.min() < 0:
            raise ValueError(f"{key_col} must be non-negative")
        with np.errstate(over="ignore"):
            bucket = (
                splitmix64(keys.astype(np.uint64) + np.uint64(seed))
                % np.uint64(SPLIT_BUCKETS)
            ).astype(np.int64)
        return b.filter(pa.array(bucket < cut)).select([val_col])

    sample = ds.map_batches(keep, batch_format="pyarrow")
    return exact_global_percentiles(sample, val_col, qs, coarse_shift=coarse_shift)


def pivot_counts(
    ds: rd.Dataset,
    key_col: str,
    cat_col: str,
    categories: list[str],
) -> rd.Dataset:
    """Pivot a categorical column into per-category count columns
    (``count(*) FILTER (WHERE cat = c)``): the per-batch combiner
    crosstabs (vectorized), the global groupby sums one int64 column per
    category — so the shuffle carries |keys|x|batches| rows of small
    fixed width regardless of input size.  ``categories`` is the fixed
    output column set (discover it with a tiny distinct query first);
    unseen categories are ignored."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # NOT crosstab: it silently drops NaN from both index and columns,
        # losing NULL keys and keys whose categories are all NULL.  A
        # boolean column per category (NaN == c is False) + dropna=False
        # groupby keeps both, matching count(*) FILTER GROUP BY.
        tmp = pd.DataFrame(
            {f"n_{c}": (batch[cat_col] == c).to_numpy(dtype=np.int64) for c in categories}
        )
        tmp[key_col] = batch[key_col].to_numpy()
        return tmp.groupby(key_col, sort=False, dropna=False).sum().reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    # keyed_reduce instead of groupby().aggregate(): same single
    # exchange, ~2.5x lower constant (see preagg_groupby), and the tiny
    # single-task route at small scale.  dropna=False groupby matches
    # the partial stage's NULL-key semantics exactly.
    ncols = [f"n_{c}" for c in categories]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, sort=False, dropna=False)[ncols].sum()
        return out.reset_index()

    return keyed_reduce(partials, [key_col], combine)
