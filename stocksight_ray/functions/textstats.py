"""Text-analysis kernels for large-scale training-data curation:
language-ID, quality scoring, token counting, document fingerprinting.

These extend the reference's document-admission surface (the min-token /
required-token / ignore-token filters at /root/reference/sentiment.py:148-181)
with the standard curation signals a 100-TB webtext pipeline needs.  All
kernels are deterministic, vectorized where the semantics allow, and designed
to run inside ``map_batches(batch_format="pyarrow")``.

SQL-parity note: the kernels used by __ray_entry__ oracle checks
(whitespace token count, regex token count, punct/upper counts, stopword
count) are defined to match DuckDB expressions exactly:
  n_ws_tokens  == len(string_split(text, ' '))           (empties counted)
  n_re_tokens  == len(regexp_extract_all(text, TOKEN_RE))
  n_punct      == len(regexp_extract_all(text, PUNCT_RE))
  n_stopwords  == len(list_filter(string_split(text,' '), x -> x IN (...)))
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish word/number/symbol splitter; RE2- and Python-re-compatible syntax.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
PUNCT_RE = "[.,!?;:]"

# Small fixed stopword head, inlined in oracle SQL too (keep in sync with
# __ray_entry__.py::_STOP_SQL).
QUALITY_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)

_token_re = re.compile(TOKEN_RE)
_punct_re = re.compile(PUNCT_RE)

# ---------------------------------------------------------------------------
# language ID — character/word n-gram heuristic
# ---------------------------------------------------------------------------

# Per-language marker sets: high-frequency function words + characteristic
# character n-grams.  Deterministic scoring: count marker hits per language,
# normalize by token count, argmax with tie-break by language code.
_LANG_MARKERS: Dict[str, frozenset] = {
    "en": frozenset(
        "the and of to in is it for on with as are was this that have from "
        "by at or an be not we you they".split()
    ),
    "de": frozenset(
        "der die das und ist von mit nicht ein eine den dem des im für auf "
        "als auch sich werden bei aus nach wird".split()
    ),
    "fr": frozenset(
        "le la les des une est et dans pour que qui sur pas avec plus par "
        "son ses mais nous vous ils elle au du".split()
    ),
    "es": frozenset(
        "el la los las una es y en que de por para con no se su como más "
        "pero sus le ya o este fue han".split()
    ),
    "zh": frozenset(),  # handled via CJK codepoint ratio below
}

_LANG_BIGRAMS: Dict[str, frozenset] = {
    "en": frozenset(["th", "he", "in", "er", "an"]),
    "de": frozenset(["ch", "ei", "en", "sch", "ung"]),
    "fr": frozenset(["ou", "es", "ai", "eu", "qu"]),
    "es": frozenset(["ci", "ón", "qu", "ll", "rr"]),
}


def lang_id(text: str) -> str:
    """Deterministic n-gram language heuristic → 2-letter code or 'und'."""
    if not text:
        return "und"
    n_cjk = sum(1 for ch in text if 0x4E00 <= ord(ch) <= 0x9FFF)
    if n_cjk > 0 and n_cjk >= 0.2 * len(text):
        return "zh"
    low = text.lower()
    words = low.split()
    if not words:
        return "und"
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        if not markers:
            continue
        word_hits = sum(1 for w in words if w in markers)
        score = word_hits / len(words)
        if score == 0:
            grams = _LANG_BIGRAMS.get(lang, frozenset())
            score = sum(low.count(g) for g in grams) / max(len(low), 1) * 0.1
        scores[lang] = score
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


# ---------------------------------------------------------------------------
# counting / quality kernels (vectorized, SQL-parity)
# ---------------------------------------------------------------------------

def ws_token_count(arr: pa.Array) -> pa.Array:
    """len(string_split(text, ' ')) — empties counted, matching DuckDB."""
    return pc.cast(pc.list_value_length(pc.split_pattern(arr, " ")), pa.int64())


def re_token_count(texts: List[str]) -> np.ndarray:
    return np.fromiter(
        (len(_token_re.findall(t or "")) for t in texts), np.int64, len(texts)
    )


def punct_count(texts: List[str]) -> np.ndarray:
    return np.fromiter(
        (len(_punct_re.findall(t or "")) for t in texts), np.int64, len(texts)
    )


def stopword_count(texts: List[str], stopwords=QUALITY_STOPWORDS) -> np.ndarray:
    sw = frozenset(stopwords)
    return np.fromiter(
        (sum(1 for w in (t or "").split(" ") if w in sw) for t in texts),
        np.int64,
        len(texts),
    )


def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document quality signals: char/token/punct/stopword counts and
    derived ratios.  Ratios are float64 divisions of the integer counts, so
    they reproduce bit-identically in any engine.  Null text is treated as
    "" (all counts 0, ratios 0) — consistent across every derived column."""
    col = pc.fill_null(batch[text_col], "")
    texts = col.to_pylist()
    n_chars = pc.cast(pc.utf8_length(col), pa.int64())
    n_ws = ws_token_count(col)
    n_re = re_token_count(texts)
    n_punct = punct_count(texts)
    n_stop = stopword_count(texts)
    n_ws_np = np.asarray(n_ws.combine_chunks() if isinstance(n_ws, pa.ChunkedArray) else n_ws)
    n_chars_np = np.asarray(n_chars.combine_chunks() if isinstance(n_chars, pa.ChunkedArray) else n_chars)
    denom_t = np.maximum(n_ws_np, 1).astype(np.float64)
    denom_c = np.maximum(n_chars_np, 1).astype(np.float64)
    return (
        batch.append_column("n_chars_txt", n_chars)
        .append_column("n_ws_tokens", n_ws)
        .append_column("n_re_tokens", pa.array(n_re))
        .append_column("n_punct", pa.array(n_punct))
        .append_column("n_stopwords", pa.array(n_stop))
        .append_column("punct_ratio", pa.array(n_punct / denom_c))
        .append_column("stopword_ratio", pa.array(n_stop / denom_t))
    )


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Composite 0-1 quality score (heuristic, documented weights):
    rewards stopword presence (natural language), penalizes extreme length
    and punctuation density.  Deterministic float64 arithmetic."""
    t = quality_stats_batch(batch, text_col)
    n_tok = np.asarray(t["n_ws_tokens"].combine_chunks() if isinstance(t["n_ws_tokens"], pa.ChunkedArray) else t["n_ws_tokens"], dtype=np.float64)
    stop_r = np.asarray(t["stopword_ratio"].combine_chunks() if isinstance(t["stopword_ratio"], pa.ChunkedArray) else t["stopword_ratio"], dtype=np.float64)
    punct_r = np.asarray(t["punct_ratio"].combine_chunks() if isinstance(t["punct_ratio"], pa.ChunkedArray) else t["punct_ratio"], dtype=np.float64)
    len_score = np.clip(n_tok / 100.0, 0.0, 1.0)
    stop_score = np.clip(stop_r * 5.0, 0.0, 1.0)
    punct_pen = np.clip(1.0 - punct_r * 10.0, 0.0, 1.0)
    score = 0.4 * len_score + 0.4 * stop_score + 0.2 * punct_pen
    return t.append_column("quality", pa.array(score))


# ---------------------------------------------------------------------------
# document fingerprinting — rolling (Karp-Rabin) hash
# ---------------------------------------------------------------------------

_FP_BASE = 1315423911
_FP_MULT = 2654435761
_FP_MASK = (1 << 64) - 1


def _fp64(data: bytes) -> int:
    """Horner's rule over bytes in plain Python ints (measured ~6x faster
    than numpy uint64 scalar ops), masked to 64 bits."""
    h = _FP_BASE
    for b in data:
        h = (h * _FP_MULT + b) & _FP_MASK
    return h


def fingerprint(text: str) -> int:
    """64-bit Karp-Rabin-style rolling fingerprint over bytes; stable across
    processes (no python hash()).  Returns the SIGNED int64 view — the same
    representation the ``fingerprint`` column holds, so scalar and column
    values compare directly."""
    h = _fp64((text or "").encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row Horner fingerprint column (int64, same values as
    ``fingerprint``)."""
    texts = batch[text_col].to_pylist()
    vals = [fingerprint(t) for t in texts]
    return batch.append_column("fingerprint", pa.array(vals, pa.int64()))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        "lang_pred", pa.array([lang_id(t) for t in texts], pa.string())
    )


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style intra-document repetition signals (Rae et al. 2021 §A1):
    distinct-word ratio, most-common-word fraction, top-bigram fraction,
    and max word length — the filters web-corpus pipelines use to drop
    boilerplate/repeated-token documents.  Integer counts + float64 ratios,
    whitespace tokenization (split on single space like the quality stats),
    so every value reproduces exactly in SQL."""
    col = pc.fill_null(batch[text_col], "")
    texts = col.to_pylist()
    n = len(texts)
    n_tok = np.empty(n, np.int64)
    n_distinct = np.empty(n, np.int64)
    top_word = np.empty(n, np.int64)
    top_bigram = np.empty(n, np.int64)
    max_len = np.empty(n, np.int64)
    for i, t in enumerate(texts):
        # NOTE: ''.split(' ') == [''] — one empty token, matching DuckDB
        # string_split('', ' ') so the SQL oracle agrees on empty docs
        # (n_words=1, distinct_ratio=1) — ADVICE r2.
        words = t.split(" ")
        n_tok[i] = len(words)
        vals, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
        n_distinct[i] = len(vals)
        top_word[i] = counts.max()
        max_len[i] = max(len(w) for w in words)
        if len(words) > 1:
            bi = [words[j] + " " + words[j + 1] for j in range(len(words) - 1)]
            _, bc = np.unique(np.asarray(bi, dtype=object), return_counts=True)
            top_bigram[i] = bc.max()
        else:
            top_bigram[i] = 0
    denom = np.maximum(n_tok, 1).astype(np.float64)
    denom_bi = np.maximum(n_tok - 1, 1).astype(np.float64)
    return (
        batch.append_column("n_words", pa.array(n_tok))
        .append_column("n_distinct_words", pa.array(n_distinct))
        .append_column("distinct_ratio", pa.array(n_distinct / denom))
        .append_column("top_word_frac", pa.array(top_word / denom))
        .append_column("top_bigram_frac", pa.array(top_bigram / denom_bi))
        .append_column("max_word_len", pa.array(max_len))
    )
