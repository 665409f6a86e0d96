"""Changefeed JSON projection (SURVEY.md §2.6 P1).

Reproduces the reference's only sink-facing shape: every row event
serializes with an ``action`` field and its row images, raw bitmaps
dropped (`WriteRows.php:26-32`, `UpdateRows.php:27-34`,
`DeleteRows.php:26-33`); binary values are already tagged
``binary:base64,\\0\\0\\0`` by the decoder (`RowFactory.php:108`), so the
JSON edge needs no extra handling.  The consumer loop this mirrors is
`examples/print-row-events.php:36-42`.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd


def changefeed_row_to_json_dict(row: dict) -> dict:
    """One changefeed row -> the reference's event JSON shape."""
    out = {
        "action": row["op"],
        "schema": row["schema_name"],
        "table": row["table_name"],
        "tableId": row["table_map_id"],
        "timestamp": row["ts"],
        "position": {
            "file_seq": row["file_seq"],
            "event_seq": row["event_seq"],
            "row_seq": row["row_seq"],
            "commit_seq": row["commit_seq"],
        },
    }
    if row["op"] == "update":
        out["row"] = {"before": row["before"], "after": row["after"]}
    elif row["op"] == "insert":
        out["row"] = row["after"]
    else:
        out["row"] = row["before"]
    return out


class JsonProjector:
    """map_batches stage: changefeed -> one JSON document per row image
    (column ``json``), ready for ``write_json`` / any queue sink."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = [
            json.dumps(changefeed_row_to_json_dict(r), ensure_ascii=False, default=str)
            for r in batch.to_pylist()
        ]
        return pa.table(
            {
                "event_seq": batch.column("event_seq"),
                "row_seq": batch.column("row_seq"),
                "json": pa.array(docs, pa.string()),
            }
        )


def write_changefeed_json(changefeed: rd.Dataset, out_dir: str) -> None:
    """Debug/compat sink: the changefeed as JSON-lines files."""
    # instance, not class: a bare callable class requires `concurrency`
    # on Ray >= 2.44 and the projector is stateless anyway
    changefeed.map_batches(JsonProjector(), batch_format="pyarrow").write_json(out_dir)
