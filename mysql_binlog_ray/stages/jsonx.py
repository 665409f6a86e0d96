"""JSON field extraction over string columns (metadata/props columns —
the reference decodes MySQL JSONB into JSON strings, `protocol/jsonb.py`;
this stage consumes such columns relationally).

Vectorized fast path + exact fallback: a compiled regex pulls flat
scalar fields via ONE C-level ``pandas.str.extract`` pass, applied only
to rows that are single-level objects (exactly one ``{``) so a nested
object can never shadow the top-level field; every other row (absent
field, nested/quoted/odd shapes) falls back to ``json.loads`` — the
fallback cost is proportional to the odd rows, not the corpus, and the
result is exact either way.  ``strict=True`` forces full JSON parsing
on every row (a debugging/parity knob, not required for correctness).
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
    """Add ``out_col`` = the numeric value of the TOP-LEVEL ``field`` in
    the JSON string column ``col`` (float64; NaN when absent / JSON null
    / bool / non-numeric — SQL ``TRY_CAST(json ->> '$.field' AS
    DOUBLE)`` semantics, so quoted numeric strings coerce)."""
    out = out_col or field
    # fast path: "field": <number> in a FLAT object.  Restricted to rows
    # with exactly one '{' — a nested object could contain the same
    # field name before the top-level occurrence, and nothing else can
    # fake the match (a quote inside a JSON string is always escaped, so
    # the raw byte sequence "field": cannot occur within one).  Rows
    # with nested objects (or a quoted/odd-shaped value) take the exact
    # json.loads fallback, so the fast path is a pure optimization.
    pat = re.compile(r'"%s"\s*:\s*(-?\d+(?:\.\d+)?([eE][+-]?\d+)?)' % re.escape(field))

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[col]
        vals = np.full(len(batch), np.nan)
        notnull = s.notna().to_numpy()
        if not strict:
            flat = s.str.count(r"\{").fillna(0).to_numpy() == 1
            m = s.str.extract(pat, expand=True)[0]
            got = m.notna().to_numpy() & flat
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
                if isinstance(v, bool):
                    return np.nan
                if isinstance(v, (int, float)):
                    return float(v)
                if isinstance(v, str):  # TRY_CAST('7' AS DOUBLE) -> 7.0
                    try:
                        return float(v)
                    except ValueError:
                        return np.nan
                return np.nan

            vals[todo] = [slow(x) for x in s.to_numpy()[todo]]
        batch = batch.copy()
        batch[out] = vals
        return batch

    return ds.map_batches(extract, batch_format="pandas")
