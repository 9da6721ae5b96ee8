"""JSON metadata extraction — typed field pull-out from a JSON-string
column (props/metadata side-channels are standard in event logs and
training-data manifests; the reference stores its extra tweet fields the
same way in its ES docs, /root/reference/sentiment.py:248-266).

Per-batch kernel over Arrow string columns; the parse is per-row by nature
(stdlib json), but allocation stays batched and output columns are typed.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pyarrow as pa


def json_int_field(batch: pa.Table, col: str, key: str, out: str) -> pa.Table:
    """Append int64 column ``out`` = obj[key] parsed from JSON column
    ``col`` (null on missing key / parse failure / non-int value)."""
    vals = []
    for s in batch[col].to_pylist():
        try:
            v = json.loads(s)[key]
            vals.append(int(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None)
        except (TypeError, ValueError, KeyError, json.JSONDecodeError):
            vals.append(None)
    return batch.append_column(out, pa.array(vals, pa.int64()))


def json_str_field(batch: pa.Table, col: str, key: str, out: str) -> pa.Table:
    """Append string column ``out`` = obj[key] (null when absent/invalid)."""
    vals = []
    for s in batch[col].to_pylist():
        try:
            v = json.loads(s)[key]
            vals.append(str(v) if v is not None else None)
        except (TypeError, ValueError, KeyError, json.JSONDecodeError):
            vals.append(None)
    return batch.append_column(out, pa.array(vals, pa.string()))
