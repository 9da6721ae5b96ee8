"""Deliberately naive, obviously-correct BM25 oracle (SURVEY.md §5.2):
linear scan over analyzed token lists, same formulas as the engine
(Okapi BM25, Lucene idf, k1=1.2, b=0.75), accumulation in query-term order,
ties broken by doc_id asc."""

from typing import Dict, List, Tuple

import numpy as np


def naive_bm25_topk(
    doc_tokens: Dict[int, List[str]],
    query_terms: List[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> List[Tuple[int, float]]:
    # dedupe query terms, keep order
    seen = set()
    terms = [t for t in query_terms if not (t in seen or seen.add(t))]

    doc_ids = sorted(doc_tokens)
    n = len(doc_ids)
    if n == 0:
        return []
    dls = np.array([len(doc_tokens[d]) for d in doc_ids], dtype=np.float64)
    avgdl = dls.mean() if n else 1.0

    scores = np.zeros(n, dtype=np.float64)
    matched = np.zeros(n, dtype=bool)
    for t in terms:
        tfs = np.array([doc_tokens[d].count(t) for d in doc_ids], dtype=np.float64)
        df = int((tfs > 0).sum())
        if df == 0:
            continue
        idf = float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        tf_norm = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        contrib = idf * tf_norm
        contrib[tfs == 0] = 0.0
        scores = scores + contrib
        matched |= tfs > 0

    hits = [
        (doc_ids[i], float(scores[i])) for i in range(n) if matched[i]
    ]
    hits.sort(key=lambda h: (-h[1], h[0]))
    return hits[:k]
