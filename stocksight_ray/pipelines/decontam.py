"""Benchmark decontamination — flag corpus documents that share word
n-grams with an evaluation/benchmark set (the standard pre-training hygiene
step; n-gram overlap is the method used by GPT-3/PaLM/Llama dataset cards).

Shape: the benchmark side is collected as a DISTINCT n-gram hash set and
broadcast via ray.put — eval sets are tiny next to the corpus, so this is
the small-side-broadcast pattern, one corpus map pass, no shuffle.  For a
benchmark too large to broadcast, explode corpus grams and semi-join on
the hash instead (same machinery as ``joins.semi_join``); the broadcast
path is the right default by orders of magnitude.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """DISTINCT word n-gram 64-bit hashes; docs shorter than n words have
    none.  Split on single space (SQL string_split parity)."""
    words = (text or "").split(" ")
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha1(g.encode()).digest()[:8], "big")
            for g in grams
        ),
        np.uint64,
        len(grams),
    )


def benchmark_gram_set(benchmark, text_col: str = "text", *, ngram: int = 8) -> np.ndarray:
    """Collect the benchmark's distinct n-gram hashes as a sorted array
    (driver state is O(benchmark grams) — the small side by construction)."""

    def local(batch: pa.Table) -> pa.Table:
        hs = [_gram_hashes(t, ngram) for t in batch[text_col].to_pylist()]
        merged = (
            np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
        )
        return pa.table({"h": pa.array([merged.tobytes()], pa.binary())})

    rows = benchmark.map_batches(local, batch_format="pyarrow").take_all()
    parts = [np.frombuffer(r["h"], dtype=np.uint64) for r in rows if r["h"]]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(
    corpus,
    benchmark,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
):
    """-> Dataset (id_col, n_hits, contaminated): per corpus doc, the count
    of its DISTINCT n-grams present in the benchmark set and the resulting
    contamination flag (n_hits > 0)."""
    import ray

    bench = benchmark_gram_set(benchmark, text_col, ngram=ngram)
    bench_ref = ray.put(bench)

    def flag(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hits = np.empty(len(ids), np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            hs = _gram_hashes(t, ngram)
            hits[i] = int(np.isin(hs, b).sum()) if hs.size else 0
        return pa.table({
            id_col: pa.array(ids),
            "n_hits": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })

    return corpus.map_batches(flag, batch_format="pyarrow")
