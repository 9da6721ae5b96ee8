"""Query serving: BM25 top-k as an actor-pool stage and as a persistent
actor service (SURVEY.md §2.7 J3 — the query-side term→postings lookup is
actor state, loaded once).

Two forms:

* ``search_dataset(queries, index_dir)`` — Ray-Data-idiomatic batch scoring:
  a Dataset of (query_id, query[, k]) flows through
  ``map_batches(SearchStage, concurrency=N)``; each actor holds ONE warm
  QueryEngine (built in __init__) and scores its batches vectorized.  Use
  for bulk evaluation (the reference query set, offline relevance jobs).

* ``QueryService`` — a handle over ``n`` detached-lifetime=no, named=no
  ``QueryServerActor``s for online lookups with round-robin routing.  Use
  when latency matters and the index fits per-actor memory; at 10^12 docs
  each actor instead holds one doc_id-range shard and the service fans out
  + merges (scores are shard-independent: idf/avgdl are global manifest
  constants), which is the standard distributed top-k merge.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from .query import QueryEngine


class SearchStage:
    """map_batches actor: (query_id, query[, k]) → (query_id, rank, doc_id,
    score) rows.  Engine + partitions load once per actor."""

    def __init__(self, index_dir: str, default_k: int = 10, method: str = "auto"):
        self.engine = QueryEngine(index_dir)
        self.engine.warm(deep=True)
        self.default_k = default_k
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ks = (
            batch["k"].to_pylist()
            if "k" in batch.column_names
            else [self.default_k] * batch.num_rows
        )
        for qid, q, k in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist(), ks
        ):
            for rank, (d, s) in enumerate(
                self.engine.search(q, int(k), self.method), start=1
            ):
                qids.append(qid)
                ranks.append(rank)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def search_dataset(
    queries,
    index_dir: str,
    *,
    k: int = 10,
    method: str = "auto",
    concurrency=(2, 8),
    batch_size: int = 64,
):
    """Bulk top-k over a Dataset of (query_id:int64, query:string[, k])."""
    return queries.map_batches(
        SearchStage,
        fn_constructor_kwargs={"index_dir": index_dir, "default_k": k, "method": method},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class QueryService:
    """Round-robin pool of warm query actors for online serving."""

    def __init__(self, index_dir: str, num_actors: int = 2, method: str = "auto"):
        import ray

        @ray.remote
        class QueryServerActor:
            def __init__(self, index_dir: str, method: str):
                self.engine = QueryEngine(index_dir)
                self.engine.warm(deep=True)
                self.method = method

            def search(self, query: str, k: int = 10):
                return self.engine.search(query, k, self.method)

            def search_many(self, queries: List[str], k: int = 10):
                return [self.engine.search(q, k, self.method) for q in queries]

        self._actors = [
            QueryServerActor.remote(index_dir, method) for _ in range(num_actors)
        ]
        self._rr = 0

    def _next(self):
        a = self._actors[self._rr % len(self._actors)]
        self._rr += 1
        return a

    def search(self, query: str, k: int = 10):
        import ray

        return ray.get(self._next().search.remote(query, k))

    def search_many(self, queries: List[str], k: int = 10):
        """Fan queries across the pool; preserves input order."""
        import ray

        chunks = [[] for _ in self._actors]
        idx = [[] for _ in self._actors]
        for i, q in enumerate(queries):
            a = i % len(self._actors)
            chunks[a].append(q)
            idx[a].append(i)
        futs = [
            actor.search_many.remote(ch, k)
            for actor, ch in zip(self._actors, chunks)
            if ch
        ]
        out = [None] * len(queries)
        fi = 0
        for a, ch in enumerate(chunks):
            if not ch:
                continue
            for i, res in zip(idx[a], ray.get(futs[fi])):
                out[i] = res
            fi += 1
        return out

    def shutdown(self):
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []
