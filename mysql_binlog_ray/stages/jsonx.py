"""JSON field extraction over string columns (metadata/props columns —
the reference decodes MySQL JSONB into JSON strings, `protocol/jsonb.py`;
this stage consumes such columns relationally).

Vectorized fast path + exact fallback: a compiled regex pulls flat
scalar fields via ONE C-level ``pandas.str.extract`` pass; any row the
regex misses (absent field, nested/escaped shapes) falls back to
``json.loads`` — so the fallback cost is proportional to the odd rows,
not the corpus.  Pass ``strict=True`` to force full JSON parsing on
every row (needed only when a nested object can contain the same field
name BEFORE the top-level occurrence, where the regex would match the
wrong span).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import ray.data as rd


def add_json_number_field(
    ds: rd.Dataset,
    col: str,
    field: str,
    out_col: str | None = None,
    strict: bool = False,
) -> rd.Dataset:
    """Add ``out_col`` = the numeric value of ``field`` in the JSON
    string column ``col`` (float64, NaN when absent/null/unparseable —
    SQL ``CAST(json_extract(...) AS DOUBLE)`` semantics)."""
    out = out_col or field
    # first occurrence of "field": <number>; JSON strings are the only
    # construct that could fake this, and only via a nested/escaped
    # shape, which the fallback (or strict mode) handles
    pat = re.compile(r'"%s"\s*:\s*(-?\d+(?:\.\d+)?([eE][+-]?\d+)?)' % re.escape(field))

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[col]
        vals = np.full(len(batch), np.nan)
        notnull = s.notna().to_numpy()
        if not strict:
            m = s.str.extract(pat, expand=True)[0]
            got = m.notna().to_numpy()
            vals[got] = m[got].astype(np.float64)
            todo = notnull & ~got
        else:
            todo = notnull
        if todo.any():
            def slow(x: str) -> float:
                try:
                    v = json.loads(x).get(field)
                except (ValueError, AttributeError):
                    return np.nan
                return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else np.nan

            vals[todo] = [slow(x) for x in s.to_numpy()[todo]]
        batch = batch.copy()
        batch[out] = vals
        return batch

    return ds.map_batches(extract, batch_format="pandas")
