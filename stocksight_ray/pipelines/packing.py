"""Sequence packing — assembling tokenized documents into fixed-length
training examples (the last stage of an LLM data pipeline).

Greedy first-fit packing is inherently order-dependent, so the operator
fixes a DETERMINISTIC order (doc_id within each partition bucket) and packs
within hash-assigned buckets: results are reproducible under any Ray
partitioning / resume, and the only shuffle is the bucket groupby.  Long
documents are split into max_len chunks (no truncation loss).

Output rows: (bucket, example_id, doc_ids:list<int64>, n_tokens:int32,
n_pad:int32) — the example manifest; actual token materialization is a
cheap downstream map over (doc_ids → token slices).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_BUCKETS = 64


def _token_counts(texts: List[str]) -> np.ndarray:
    return np.fromiter(
        (len((t or "").split()) for t in texts), np.int64, len(texts)
    )


def pack_sequences(
    ds,
    *,
    max_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
):
    """Greedy first-fit-decreasing-free packing (simple sequential fill in
    doc_id order — deterministic beats optimal here; FFD would reorder by
    length and is also supported by sorting upstream)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n_tok = _token_counts(batch[text_col].to_pylist())
        # Bucket membership is part of packing SEMANTICS (docs pack within
        # their bucket), so the hash must be version-stable: pandas'
        # deterministic integer hasher (xor-shift; hash_key only applies to
        # object/string dtypes) over the int64 ids, one vectorized pass
        # (replaces the round-3 per-row ``zlib.crc32(str(id))`` loop; the
        # q41 golden was re-pinned with this family).
        bucket = (
            pd.util.hash_array(ids.astype(np.int64))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                id_col: pa.array(ids.astype(np.int64)),
                "n_tok": pa.array(n_tok),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        bucket = int(g["bucket"].iloc[0])
        examples = []  # (doc_ids, n_tokens)
        cur_ids: List[int] = []
        cur_len = 0
        for doc, n in zip(g[id_col], g["n_tok"]):
            n = int(n)
            remaining = n
            # split overlong docs into max_len chunks
            while remaining > 0:
                take = min(remaining, max_len - cur_len)
                if take == 0:
                    examples.append((cur_ids, cur_len))
                    cur_ids, cur_len = [], 0
                    continue
                if not cur_ids or cur_ids[-1] != int(doc):
                    cur_ids.append(int(doc))
                cur_len += take
                remaining -= take
                if cur_len == max_len:
                    examples.append((cur_ids, cur_len))
                    cur_ids, cur_len = [], 0
        if cur_ids:
            examples.append((cur_ids, cur_len))
        return pd.DataFrame(
            {
                "bucket": bucket,
                "example_id": [bucket * 10_000_000 + i for i in range(len(examples))],
                "doc_ids": [e[0] for e in examples],
                "n_tokens": [e[1] for e in examples],
                "n_pad": [max_len - e[1] for e in examples],
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )
