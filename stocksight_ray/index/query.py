"""BM25 top-k query engine over the built index (SURVEY.md §7 step 5).

Replaces the ES/Lucene query side the reference reaches through Kibana
(/root/reference/export.json ``stocksight_savesearch``): Okapi BM25
(k1=1.2, b=0.75 — the ES 5.x defaults) with Lucene's idf

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm    = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(d,q) = Σ_t idf(t) · tf_norm(t, d)

Three scorers, required to agree exactly (same per-doc float summation
order — query-term order — so even exact score ties match):
  * ``search(..., method="exhaustive")`` — term-at-a-time accumulation into a
    dense score array (obviously correct; the oracle baseline);
  * ``search(..., method="wand")``       — windowed Block-Max scorer: the
    docid space is swept in fixed windows; a window is skipped without
    decoding when the sum of per-term block-max upper bounds cannot beat the
    running top-k threshold; surviving windows are scored with vectorized
    numpy over the decoded blocks (the serving hot path);
  * ``search(..., method="wand_doc")``   — classic per-document Block-Max
    WAND with pivoting (the textbook reference; slower in CPython, kept for
    cross-checking the pruning logic).

Ties broken by doc_id ascending (explicit, so rank-identity is well-defined).
Duplicate query terms are deduplicated (one contribution per distinct term).

The engine is a library object (loadable inside query-serving actors); it
memory-maps nothing mutable — index partitions are immutable parquet files
loaded lazily per ``part = crc32(term) % P`` and cached.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..functions.analyzer import ANALYZERS
from . import codec
from .build import term_partition


class _TermPostings:
    __slots__ = ("df", "cf", "meta", "payload", "blocks")

    def __init__(self, df: int, cf: int, meta: np.ndarray, payload: bytes):
        self.df = df
        self.cf = cf
        self.meta = meta  # decoded block-meta structured array
        self.payload = payload
        # cross-query decoded-block cache {block_idx: (docids, tfs)} — head
        # terms recur across queries; a production deployment bounds this
        # with an LRU keyed by (term, block).
        self.blocks: Dict[int, tuple] = {}

    def block(self, bi: int):
        blk = self.blocks.get(bi)
        if blk is None:
            blk = codec.decode_block(self.payload, self.meta[bi])
            self.blocks[bi] = blk
        return blk

    def full(self):
        """Concatenated (docids, tfs) across all blocks, cached — the warm
        serving path.  Bounded per serving shard (salt-range sharding at
        trillion-doc scale); a cold-path engine can stay block-lazy via
        block()/wand_doc.  Decodes locally WITHOUT populating the per-block
        cache (that would hold every posting twice in deep-warmed actors)."""
        f = self.blocks.get(-1)
        if f is None:
            parts = [
                codec.decode_block(self.payload, self.meta[bi])
                for bi in range(self.meta.size)
            ]
            f = (
                np.concatenate([d for d, _ in parts]),
                np.concatenate([t for _, t in parts]),
            )
            self.blocks[-1] = f
        return f


def _binary_views(arr: pa.Array):
    """Zero-copy per-row memoryview slices of an Arrow binary column — the
    blobs stay in the Arrow data buffer (kept alive by the views) instead of
    being copied out into one Python ``bytes`` per row via ``to_pylist``.
    ``np.frombuffer`` (codec.decode_meta / varbyte_decode) reads memoryviews
    directly."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()  # [validity, offsets(int32), data]
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1
    ]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return [data[offsets[i]: offsets[i + 1]] for i in range(len(arr))]


def read_postings_table(path: str) -> Dict[str, _TermPostings]:
    """Load one postings parquet file → {term: _TermPostings} (shared by
    the global engine's partition loader and segment serving).  Arrow-native:
    df/cf come out as numpy, meta/payload as zero-copy buffer views — only
    the term strings (dict keys) materialize as Python objects."""
    from .. import fsio

    table: Dict[str, _TermPostings] = {}
    if fsio.exists(path):
        t = fsio.read_table(path)
        if t.num_rows == 0:
            return table
        dfs = t["df"].to_numpy(zero_copy_only=False)
        cfs = t["cf"].to_numpy(zero_copy_only=False)
        metas = _binary_views(t["meta"])
        payloads = _binary_views(t["payload"])
        for i, term in enumerate(t["term"].to_pylist()):
            table[term] = _TermPostings(
                int(dfs[i]), int(cfs[i]),
                codec.decode_meta(metas[i]), payloads[i],
            )
    return table


class QueryEngine:
    def __init__(self, index_dir: str):
        from .. import fsio

        self.manifest = fsio.read_json(fsio.join(index_dir, "manifest.json"))
        self.index_dir = index_dir
        self.N = int(self.manifest["num_docs"])
        self.avgdl = float(self.manifest["avgdl"]) or 1.0
        self.k1 = float(self.manifest["k1"])
        self.b = float(self.manifest["b"])
        self.num_partitions = int(self.manifest["num_partitions"])
        self._analyze = ANALYZERS[self.manifest["analyzer"]]
        self._parts: Dict[int, Dict[str, _TermPostings]] = {}

        # doc_len store: doc_id-indexed dense array when ids are dense,
        # else (sorted ids, lens) for searchsorted lookup.
        import pyarrow.dataset as pads

        _nfs, _npath = fsio.resolve(fsio.join(index_dir, "norms"))
        norms = pads.dataset(_npath, filesystem=_nfs).to_table()
        ids = norms["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = norms["doc_len"].to_numpy(zero_copy_only=False).astype(np.int32)
        order = np.argsort(ids, kind="stable")
        self._norm_ids = ids[order]
        self._norm_lens = lens[order]
        self._dense = bool(
            self._norm_ids.size
            and self._norm_ids[0] == 0
            and self._norm_ids[-1] == self._norm_ids.size - 1
        )

        # tombstoned doc_ids (index/deletes.py): sorted array, O(deletes)
        # memory — every scorer path filters against it exactly; N/avgdl/df
        # stay the manifest's (stale-until-compact, Lucene live-docs
        # semantics) so scores of surviving docs are unchanged by a delete.
        from .deletes import load_deletes

        self._deleted = load_deletes(index_dir)

    def refresh_deletes(self) -> int:
        """Re-read the tombstone set (after a delete_docs on a live
        engine).  Returns the number of tombstoned ids."""
        from .deletes import load_deletes

        self._deleted = load_deletes(self.index_dir)
        return int(self._deleted.size)

    def _live(self, docs: np.ndarray) -> np.ndarray:
        from .deletes import live_mask

        return live_mask(self._deleted, docs)

    # ------------------------------------------------------------------
    def doc_lens(self, docids: np.ndarray) -> np.ndarray:
        if self._dense:
            return self._norm_lens[docids]
        idx = np.searchsorted(self._norm_ids, docids)
        return self._norm_lens[idx]

    def _load_part(self, part: int) -> Dict[str, _TermPostings]:
        cached = self._parts.get(part)
        if cached is not None:
            return cached
        from .. import fsio

        path = fsio.join(self.index_dir, "index", f"part-{part:05d}.parquet")
        table = read_postings_table(path)
        self._parts[part] = table
        return table

    def lookup(self, term: str) -> Optional[_TermPostings]:
        return self._load_part(term_partition(term, self.num_partitions)).get(term)

    def expand_prefix(self, prefix: str, limit: Optional[int] = None) -> List[str]:
        """Dictionary terms starting with ``prefix``, sorted (wildcard-term
        expansion for index/qparse.py).  The full sorted vocabulary is
        built lazily from projected term-column reads of every partition
        (strings only — no df/payload bytes) and cached; term dictionaries
        are O(vocabulary), tiny next to postings even at corpus scale."""
        allt = getattr(self, "_all_terms", None)
        if allt is None:
            from .. import fsio

            terms: List[str] = []
            idx_dir = fsio.join(self.index_dir, "index")
            for name in fsio.listdir(idx_dir):
                if name.startswith("part-") and name.endswith(".parquet"):
                    terms.extend(
                        fsio.read_table(
                            fsio.join(idx_dir, name), columns=["term"]
                        )["term"].to_pylist()
                    )
            allt = self._all_terms = sorted(terms)
        from .qparse import prefix_range

        return prefix_range(allt, prefix, limit)

    def warm(self, deep: bool = False) -> None:
        """Preload every index partition (term dictionary + block metadata).
        A serving actor calls this once in __init__ so query latency never
        pays cold parquet reads.  ``deep=True`` also decodes every term's
        postings into the cache (one-time cost ~ index size) so even the
        first query per term runs at warm latency."""
        for part in range(self.num_partitions):
            table = self._load_part(part)
            if deep:
                for p in table.values():
                    p.full()

    def idf(self, df: int) -> float:
        return float(np.log(1.0 + (self.N - df + 0.5) / (df + 0.5)))

    def analyze_query(self, query: str) -> List[str]:
        seen = set()
        out = []
        for t in self._analyze(query):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    # ------------------------------------------------------------------
    def search(
        self, query: str, k: int = 10, method: str = "auto"
    ) -> List[Tuple[int, float]]:
        """Top-k [(doc_id, score)] for an OR (match) query.

        method="auto" picks the regime winner (all methods are exactly
        rank- and score-identical): dense term-at-a-time when the query's
        postings are a sizable fraction of the shard (accumulator cost is
        amortized), windowed block-max when postings are sparse relative to
        the shard (selective terms — pruning + O(postings) work wins, and no
        shard-sized allocation)."""
        if k <= 0:
            return []
        terms = self.analyze_query(query)
        posts = [(t, self.lookup(t)) for t in terms]
        posts = [(t, p) for t, p in posts if p is not None]
        if not posts:
            return []
        if method == "auto":
            # measured: the windowed block-max scorer beats the dense path at
            # every selectivity once postings are cache-warm (theta pruning +
            # O(postings-in-window) work); the dense path remains the oracle.
            method = "wand"
        if method == "exhaustive":
            return self._search_exhaustive(posts, k)
        if method == "wand_doc":
            return self._search_wand(posts, k)
        return self._search_bmw(posts, k)

    def _positions(self, docids: np.ndarray) -> np.ndarray:
        """Map docids → dense accumulator slots (identity when ids are dense;
        at 10^12 docs a serving actor holds one salt-range shard, so the
        accumulator is shard-sized, not corpus-sized)."""
        if self._dense:
            return docids
        return np.searchsorted(self._norm_ids, docids)

    def _search_exhaustive(self, posts, k: int) -> List[Tuple[int, float]]:
        acc = np.zeros(self._norm_ids.size, dtype=np.float64)
        touched = np.zeros(self._norm_ids.size, dtype=bool)
        for term, p in posts:  # term-at-a-time: per-doc sum in query-term order
            w = self.idf(p.df)
            docids, tfs = p.full()
            dls = self.doc_lens(docids)
            pos = self._positions(docids)
            acc[pos] += w * codec.tf_norm(tfs, dls, self.avgdl, self.k1, self.b)
            touched[pos] = True
        idx = np.flatnonzero(touched)
        scores = acc[idx]
        docs = idx if self._dense else self._norm_ids[idx]
        if self._deleted.size:
            m = self._live(docs)
            docs, scores = docs[m], scores[m]
        order = np.lexsort((docs, -scores))[:k]  # (-score, doc_id)
        return [(int(docs[i]), float(scores[i])) for i in order]

    # ------------------------------------------------------------------
    def _search_bmw(self, posts, k: int) -> List[Tuple[int, float]]:
        """Windowed block-max scorer (see module docstring)."""
        terms = []
        max_doc = 0
        for qi, (_, p) in enumerate(posts):
            w = self.idf(p.df)
            ub = w * codec.block_upper_bounds(p.meta, self.avgdl, self.k1, self.b)
            terms.append((qi, w, p, ub))
            max_doc = max(max_doc, int(p.meta["last"][-1]))

        W = 1 << 14  # window width in docid space
        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        theta = -np.inf

        # Sweep only OCCUPIED windows: start at the smallest posted docid and
        # after each window jump to the next docid any term posts — cost is
        # O(occupied windows), not O(docid range), so sparse/offset id spaces
        # (salt-range shards at 10^12 ids) don't pay for empty ranges.
        min_doc = min(int(t[2].meta["first"][0]) for t in terms)
        nxt = (min_doc // W) * W
        while nxt <= max_doc:
            a = nxt
            b_end = a + W
            overlaps = []
            ub_sum = 0.0
            next_doc = None  # smallest posted docid >= b_end (for the jump)
            for qi, w, p, ub in terms:
                lo = int(np.searchsorted(p.meta["last"], a, side="left"))
                hi = int(np.searchsorted(p.meta["first"], b_end, side="left"))
                if hi > lo:
                    ub_sum += float(ub[lo:hi].max())
                    overlaps.append((qi, w, p, lo, hi))
                # candidate next occupied docid for this term: the first block
                # whose last >= b_end starts at max(first, b_end)
                nb = int(np.searchsorted(p.meta["last"], b_end, side="left"))
                if nb < p.meta.size:
                    cand = max(int(p.meta[nb]["first"]), b_end)
                    next_doc = cand if next_doc is None else min(next_doc, cand)
            nxt = max_doc + 1 if next_doc is None else (next_doc // W) * W
            if not overlaps:
                continue
            # Skip the whole window (no decode) when even the sum of block-max
            # upper bounds cannot beat the running threshold. Strict '<' keeps
            # tie-by-doc_id semantics exact.
            if top_scores.size >= k and ub_sum < theta:
                continue

            acc = np.zeros(W, dtype=np.float64)
            touched = np.zeros(W, dtype=bool)
            for qi, w, p, lo, hi in overlaps:  # qi order == term order
                docids, tfs = p.full()
                s = int(np.searchsorted(docids, a, side="left"))
                e = int(np.searchsorted(docids, b_end, side="left"))
                if e <= s:
                    continue
                d_slice = docids[s:e]
                dls = self.doc_lens(d_slice)
                sl = d_slice - a
                acc[sl] += w * codec.tf_norm(
                    tfs[s:e], dls, self.avgdl, self.k1, self.b
                )
                touched[sl] = True
            idx = np.flatnonzero(touched)
            if idx.size == 0:
                continue
            scores = acc[idx]
            docs = idx + a
            if self._deleted.size:
                # mask BEFORE theta pruning/merge — ub-based window skips
                # above remain safe (bounds only overestimate; removing
                # docs can never raise a window's best score)
                m = self._live(docs)
                scores, docs = scores[m], docs[m]
                if scores.size == 0:
                    continue
            # prune before sorting: only candidates that can enter the top-k
            # (>= keeps score ties so doc_id tie-break stays exact)
            if top_scores.size >= k:
                m = scores >= theta
                scores, docs = scores[m], docs[m]
                if scores.size == 0:
                    continue
            if scores.size > 4 * k:
                # kth-largest value cut (keeps all equal values → exact ties)
                thresh = np.partition(scores, scores.size - k)[scores.size - k]
                m = scores >= thresh
                scores, docs = scores[m], docs[m]
            # merge window candidates into the running top-k
            all_scores = np.concatenate([top_scores, scores])
            all_docs = np.concatenate([top_docs, docs])
            order = np.lexsort((all_docs, -all_scores))[:k]
            top_scores = all_scores[order]
            top_docs = all_docs[order]
            if top_scores.size >= k:
                theta = float(top_scores[-1])

        return [(int(d), float(s)) for d, s in zip(top_docs, top_scores)]

    # ------------------------------------------------------------------
    class _Cursor:
        """Block-wise postings cursor for WAND."""

        __slots__ = ("idx", "w", "meta", "payload", "bi", "pos", "docids", "tfs", "ub")

        def __init__(self, idx: int, w: float, p: _TermPostings, engine: "QueryEngine"):
            self.idx = idx  # query-term position: fixes float summation order
            self.w = w
            self.meta = p.meta
            self.payload = p.payload
            self.bi = -1
            self.pos = 0
            self.docids: Optional[np.ndarray] = None
            self.tfs: Optional[np.ndarray] = None
            # per-block score upper bounds: idf * tfnorm(max_tf, min_dl)
            self.ub = w * codec.block_upper_bounds(p.meta, engine.avgdl, engine.k1, engine.b)
            self._open_block(0)

        def _open_block(self, bi: int) -> None:
            self.bi = bi
            self.pos = 0
            self.docids = None  # decoded lazily on first access
            self.tfs = None

        def exhausted(self) -> bool:
            return self.bi >= self.meta.size

        def _ensure_decoded(self, engine: "QueryEngine") -> None:
            if self.docids is None:
                self.docids, self.tfs = codec.decode_block(self.payload, self.meta[self.bi])

        def cur_doc(self, engine: "QueryEngine") -> int:
            """Current candidate docid (uses block meta when undecoded)."""
            if self.exhausted():
                return 1 << 62
            if self.docids is None and self.pos == 0:
                return int(self.meta[self.bi]["first"])
            self._ensure_decoded(engine)
            return int(self.docids[self.pos])

        def max_remaining_ub(self) -> float:
            if self.exhausted():
                return 0.0
            return float(self.ub[self.bi :].max())

        def advance_to(self, target: int, engine: "QueryEngine") -> None:
            """Move to the first posting with docid >= target (block skipping
            via last-docid metadata — blocks never decoded when skipped)."""
            while not self.exhausted() and int(self.meta[self.bi]["last"]) < target:
                self._open_block(self.bi + 1)
            if self.exhausted():
                return
            self._ensure_decoded(engine)
            self.pos = int(np.searchsorted(self.docids, target, side="left"))
            if self.pos >= self.docids.size:  # defensive; last>=target ⇒ in block
                self._open_block(self.bi + 1)
                if not self.exhausted():
                    self._ensure_decoded(engine)
                    self.pos = 0

        def advance_past(self, doc: int, engine: "QueryEngine") -> None:
            self.advance_to(doc + 1, engine)

        def score_at(self, doc: int, engine: "QueryEngine") -> float:
            self._ensure_decoded(engine)
            tf = int(self.tfs[self.pos])
            dl = int(engine.doc_lens(np.array([doc], dtype=np.int64))[0])
            tfn = codec.tf_norm(
                np.array([tf]), np.array([dl]), engine.avgdl, engine.k1, engine.b
            )[0]
            return self.w * float(tfn)

    def _search_wand(self, posts, k: int) -> List[Tuple[int, float]]:
        cursors = [
            self._Cursor(i, self.idf(p.df), p, self) for i, (_, p) in enumerate(posts)
        ]
        # top-k min-heap of (score, -doc_id) so ties prefer SMALLER doc_id:
        # a new (score, doc) beats heap-min iff score higher, or equal score
        # and smaller doc.
        heap: List[Tuple[float, int]] = []
        theta = -np.inf  # current k-th best score (entry threshold)

        def consider(doc: int, score: float) -> None:
            nonlocal theta
            entry = (score, -doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
                if len(heap) == k:
                    theta = heap[0][0]
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
                theta = heap[0][0]

        while True:
            live = [c for c in cursors if not c.exhausted()]
            if not live:
                break
            live.sort(key=lambda c: c.cur_doc(self))
            # find pivot: smallest prefix whose UB sum can beat theta
            ub_sum = 0.0
            pivot_idx = -1
            for i, c in enumerate(live):
                ub_sum += c.max_remaining_ub()
                if len(heap) < k or ub_sum >= theta:
                    pivot_idx = i
                    break
            if pivot_idx == -1:
                break  # no prefix can beat theta
            pivot_doc = live[pivot_idx].cur_doc(self)
            if self._deleted.size and not self._live(
                np.array([pivot_doc], dtype=np.int64)
            )[0]:
                # tombstoned pivot: never scored; every cursor sitting on it
                # (at least live[pivot_idx]) skips past.  Docs below the
                # pivot stay safe to skip — only sub-theta prefixes can
                # score them, same argument as the undeleted pivot move.
                for c in live:
                    if c.cur_doc(self) == pivot_doc:
                        c.advance_past(pivot_doc, self)
                continue
            if live[0].cur_doc(self) == pivot_doc:
                # all cursors up to pivot aligned on pivot_doc → score it,
                # summing in query-term order (same float order as the
                # exhaustive scorer, so exact ties stay exact)
                score = 0.0
                for c in sorted(
                    (c for c in live if c.cur_doc(self) == pivot_doc),
                    key=lambda c: c.idx,
                ):
                    score += c.score_at(pivot_doc, self)
                consider(pivot_doc, score)
                for c in live:
                    if c.cur_doc(self) == pivot_doc:
                        c.advance_past(pivot_doc, self)
            else:
                # advance one of the leading cursors to the pivot
                live[0].advance_to(pivot_doc, self)

        out = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return [(int(-nd), float(s)) for s, nd in out]

    # ------------------------------------------------------------------
    def search_and(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Conjunctive (operator=AND) match: only docs containing EVERY
        query term, scored with the same BM25 sum (ES ``match`` with
        ``operator: and``).  Vectorized: smallest-df term first, running
        intersection of decoded docid arrays, then score the survivors."""
        return self._search_and_terms(self.analyze_query(query), k)

    def _search_and_terms(self, terms: List[str], k: int) -> List[Tuple[int, float]]:
        """AND over PRE-ANALYZED terms — callers that already hold index
        terms (search_phrase) must NOT round-trip them through the analyzer:
        the stop filter runs before Porter stemming, so a stem that equals a
        stopword (e.g. 'willing' → 'will') would vanish on re-analysis."""
        if k <= 0:
            return []
        posts = [(t, self.lookup(t)) for t in terms]
        if not posts or any(p is None for _, p in posts):
            return []  # a missing term empties the conjunction
        posts_sorted = sorted(posts, key=lambda tp: tp[1].df)
        cand: Optional[np.ndarray] = None
        decoded = {}
        for t, p in posts_sorted:
            ids, tfs = p.full()
            decoded[t] = (ids, tfs)
            cand = ids if cand is None else cand[np.isin(cand, ids, assume_unique=True)]
            if cand.size == 0:
                return []
        if self._deleted.size:
            cand = cand[self._live(cand)]
            if cand.size == 0:
                return []
        # score candidates in query-term order (same float order as OR path)
        scores = np.zeros(cand.size, dtype=np.float64)
        dls = self.doc_lens(cand)
        for t, p in posts:  # original order
            ids, tfs = decoded[t]
            pos = np.searchsorted(ids, cand)
            scores += self.idf(p.df) * codec.tf_norm(
                tfs[pos], dls, self.avgdl, self.k1, self.b
            )
        order = np.lexsort((cand, -scores))[:k]
        return [(int(cand[i]), float(scores[i])) for i in order]

    def search_phrase(
        self, query: str, k: int = 10, docs_path: Optional[str] = None,
        text_col: Optional[str] = None,
    ) -> List[Tuple[int, float]]:
        """Phrase match (ES ``match_phrase``, the reference's Kibana
        saved-search filter): conjunctive candidates from the index, then
        exact consecutive-terms verification against the docs table (the
        index stores no positions — re-verification against `_source` is the
        standard positionless design; at scale the docs read prunes to the
        candidate row groups via a doc_id filter)."""
        import pyarrow.dataset as pads
        import pyarrow.compute as pc_

        docs_path = docs_path or self.manifest.get("docs_path")
        text_col = text_col or self.manifest.get("docs_text_col", "text")
        if docs_path is None:
            raise ValueError("search_phrase needs docs_path (or manifest docs_path)")
        terms = [t for t in self._analyze(query)]  # keep duplicates + order
        if not terms:
            return []
        # pre-analyzed terms go straight to the AND scorer — no re-analysis
        cand_scored = self._search_and_terms(list(dict.fromkeys(terms)), k=1 << 30)
        if not cand_scored:
            return []
        cand_ids = np.array([d for d, _ in cand_scored], dtype=np.int64)
        score_of = dict(cand_scored)
        from .. import fsio

        _dfs, _dpath = fsio.resolve(docs_path)
        dset = pads.dataset(_dpath, filesystem=_dfs)
        tbl = dset.to_table(
            columns=["doc_id", text_col],
            filter=pads.field("doc_id").isin(pa.array(cand_ids)),
        )
        out = []
        n = len(terms)
        for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl[text_col].to_pylist()):
            toks = self._analyze(text or "")
            for i in range(len(toks) - n + 1):
                if toks[i : i + n] == terms:
                    out.append((int(doc_id), float(score_of[int(doc_id)])))
                    break
        out.sort(key=lambda ds_: (-ds_[1], ds_[0]))
        return out[:k]

    def search_sorted(
        self, query: str, k: int = 10, *,
        sort_col: str = "warc_ts", descending: bool = True,
        docs_path: Optional[str] = None, mode: str = "or",
    ) -> List[Tuple[int, object]]:
        """The reference's Kibana saved search (sort: ["date","desc"],
        /root/reference/export.json stocksight_savesearch): matching docs
        ordered by a METADATA column instead of score.  Candidates come from
        the index (OR or AND match); the sort key is fetched from the docs
        table with a doc_id filter (row-group pruning at scale).  Returns
        [(doc_id, sort_value)] — ties by doc_id asc."""
        import pyarrow.dataset as pads

        docs_path = docs_path or self.manifest.get("docs_path")
        if docs_path is None:
            raise ValueError("search_sorted needs docs_path (or manifest docs_path)")
        if mode == "and":
            cand = self.search_and(query, k=1 << 30)
        else:
            cand = self.search(query, k=1 << 30, method="exhaustive")
        if not cand:
            return []
        from .. import fsio

        ids = pa.array([d for d, _ in cand], pa.int64())
        _dfs, _dpath = fsio.resolve(docs_path)
        tbl = pads.dataset(_dpath, filesystem=_dfs).to_table(
            columns=["doc_id", sort_col],
            filter=pads.field("doc_id").isin(ids),
        )
        rows = [
            (d, v)
            for d, v in zip(tbl["doc_id"].to_pylist(), tbl[sort_col].to_pylist())
            if v is not None  # ES sorts missing last; we drop them (documented)
        ]
        if descending:
            rows.sort(key=lambda r: (r[1], -r[0]), reverse=True)  # val desc, id asc
        else:
            rows.sort(key=lambda r: (r[1], r[0]))
        return rows[:k]

    def search_filtered(
        self, query: str, k: int = 10, *,
        filters: List[Tuple[str, str, object]],
        docs_path: Optional[str] = None, mode: str = "or",
    ) -> List[Tuple[int, float]]:
        """ES bool query with FILTER CONTEXT (the reference's Kibana phrase
        filters, e.g. ``_type: tweet`` at /root/reference/export.json:40,82
        combined with the match query): score with BM25 as usual, admit
        only docs satisfying every metadata predicate, scores unaffected
        by the filter (non-scoring filter context, exactly ES).

        filters: [(column, op, value)] with op in
        {"==", "!=", "<", "<=", ">", ">=", "in"}.  The predicate is pushed
        down into the docs-parquet read (row-group pruning) and only the
        doc_id column of PASSING rows is fetched — a serving shard reads
        only its id range's row groups."""
        import pyarrow.dataset as pads

        docs_path = docs_path or self.manifest.get("docs_path")
        if docs_path is None:
            raise ValueError("search_filtered needs docs_path (or manifest docs_path)")
        if mode == "and":
            cand = self._search_and_terms(self.analyze_query(query), k=1 << 30)
        else:
            cand = self.search(query, k=1 << 30, method="exhaustive")
        if not cand:
            return []

        expr = None
        for col, op, val in filters:
            f = pads.field(col)
            e = (f == val if op == "==" else f != val if op == "!=" else
                 f < val if op == "<" else f <= val if op == "<=" else
                 f > val if op == ">" else f >= val if op == ">=" else
                 f.isin(val) if op == "in" else None)
            if e is None:
                raise ValueError(f"unsupported filter op {op!r}")
            expr = e if expr is None else expr & e
        from .. import fsio

        _dfs, _dpath = fsio.resolve(docs_path)
        allowed = (
            pads.dataset(_dpath, filesystem=_dfs)
            .to_table(columns=["doc_id"], filter=expr)["doc_id"]
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        allowed.sort(kind="stable")
        ids = np.array([d for d, _ in cand], dtype=np.int64)
        pos = np.searchsorted(allowed, ids)
        ok = (pos < allowed.size) & (allowed[np.minimum(pos, max(allowed.size - 1, 0))] == ids) if allowed.size else np.zeros(ids.size, bool)
        hits = [cand[i] for i in np.flatnonzero(ok)]
        hits.sort(key=lambda ds_: (-ds_[1], ds_[0]))
        return hits[:k]

    def highlight(self, text: str, query: str, pre: str = "<em>", post: str = "</em>") -> str:
        """Kibana-style highlightAll: wrap every word whose ANALYZED form
        matches an analyzed query term (so stemming variants highlight too,
        matching the english-analyzer search semantics)."""
        terms = set(self.analyze_query(query))
        if not terms or not text:
            return text or ""
        out = []
        for w in text.split(" "):
            # a word may analyze to several terms (hyphenated compounds);
            # highlight when ANY of them matches, per Kibana highlightAll
            if any(t in terms for t in self._analyze(w)):
                out.append(f"{pre}{w}{post}")
            else:
                out.append(w)
        return " ".join(out)

    def search_query(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Lucene-mini query-string search (the Kibana search-bar surface):
        ``sentiment:negative AND "stock market"``, AND/OR/NOT, quoted
        phrases, wildcards (``mark*``), ``field:value`` filter-context
        clauses — parsed and composed over the primitives above.  See
        index/qparse.py for the grammar and ES bool-query semantics."""
        from .qparse import search_query as _sq

        return _sq(self, query, k)

    def matching_docs(self, query: str, *, columns=None, docs_path=None):
        """Query-context Dataset (Kibana dashboard scope): the docs
        matching a query string, streamed for downstream aggs — see
        ``index/qparse.py::matching_docs``."""
        from .qparse import matching_docs as _md

        return _md(self, query, columns=columns, docs_path=docs_path)

    # ------------------------------------------------------------------
    def search_table(self, query: str, k: int = 10, method: str = "auto") -> pa.Table:
        hits = self.search(query, k, method)
        return pa.table(
            {
                "rank": pa.array(range(1, len(hits) + 1), pa.int32()),
                "doc_id": pa.array([d for d, _ in hits], pa.int64()),
                "score": pa.array([s for _, s in hits], pa.float64()),
            }
        )
