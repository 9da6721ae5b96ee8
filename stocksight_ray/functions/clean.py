"""Text cleaning kernels — semantics of the reference's clean_text /
clean_text_sentiment (/root/reference/sentiment.py:412-428), quirks included:

* ``&.*?;`` strips non-greedily from any ``&`` to the next ``;`` (can eat
  legitimate text between them);
* the literal substring ``"RT"`` is removed anywhere, even word-internal;
* ``…`` (U+2026) removed; ``\\n`` → space; ``https?\\S+`` and ``<.*?>`` stripped.

Both row kernels and vectorized pyarrow batch kernels are provided; the
vectorized path uses RE2 via pyarrow.compute (zero-copy Arrow in/out).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = re.compile(r"https?\S+")
_ENTITY_RE = re.compile(r"&.*?;")
_TAG_RE = re.compile(r"<.*?>")
_HASH_MENTION_RE = re.compile(r"[#|@]\S+")

# RE2's \S is ASCII-only while Python's excludes Unicode whitespace (U+00A0,
# Zs, NEL, IS4..IS1) — the vectorized kernels must stop runs at the same
# characters as the row kernels, so spell out Python-\s explicitly for RE2.
_RE2_NOT_SPACE = r"[^\s\p{Zs}\x{2028}\x{2029}\x{0085}\x{001C}-\x{001F}]"


def clean_text(text: str) -> str:
    """Row kernel. Reference: /root/reference/sentiment.py:412-421."""
    text = text.replace("\n", " ")
    text = _URL_RE.sub("", text)
    text = _ENTITY_RE.sub("", text)
    text = _TAG_RE.sub("", text)
    text = text.replace("RT", "")
    text = text.replace("…", "")
    return text.strip()


def clean_text_sentiment(text: str) -> str:
    """Row kernel. Reference: /root/reference/sentiment.py:424-428.
    Note the char class ``[#|@]`` also strips ``|``-prefixed runs — a
    reference quirk preserved deliberately."""
    return _HASH_MENTION_RE.sub("", text).strip()


def clean_text_array(arr: pa.Array) -> pa.Array:
    """Vectorized clean_text over a string array (RE2 kernels).

    RE2 lacks backreferences but all patterns here are plain; ``.*?``
    non-greedy is supported.  Null-safe: nulls propagate."""
    arr = pc.replace_substring(arr, "\n", " ")
    arr = pc.replace_substring_regex(arr, r"https?" + _RE2_NOT_SPACE + "+", "")
    arr = pc.replace_substring_regex(arr, r"&.*?;", "")
    arr = pc.replace_substring_regex(arr, r"<.*?>", "")
    arr = pc.replace_substring(arr, "RT", "")
    arr = pc.replace_substring(arr, "…", "")
    return pc.utf8_trim_whitespace(arr)


def clean_text_sentiment_array(arr: pa.Array) -> pa.Array:
    arr = pc.replace_substring_regex(arr, r"[#|@]" + _RE2_NOT_SPACE + "+", "")
    return pc.utf8_trim_whitespace(arr)


def clean_batch(batch: pa.Table, col: str = "text", out: str = "text_clean") -> pa.Table:
    """map_batches kernel: adds a cleaned column (stateless, vectorized)."""
    return batch.append_column(out, clean_text_array(batch[col]))


URL_RE = re.compile(r"(https?://[^\s]+)")


def extract_urls(text: str):
    """P3: url extraction from text — the reference's
    ``re.findall(r'(https?://[^\\s]+)', text)`` at
    /root/reference/sentiment.py:88-90 (used with ``-l`` link-following)."""
    return URL_RE.findall(text or "")


def extract_urls_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    texts = batch[col].to_pylist()
    urls = [URL_RE.findall(t or "") for t in texts]
    import numpy as np

    return batch.append_column(
        "urls", pa.array(urls, pa.list_(pa.string()))
    ).append_column(
        "n_urls",
        pa.array(np.fromiter((len(u) for u in urls), np.int64, len(urls))),
    )


# ---------------------------------------------------------------------------
# pattern scrubbing (PII-style masking — standard corpus-curation step)
# ---------------------------------------------------------------------------

SCRUB_PATTERNS = {
    "email": re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    "url": re.compile(r"https?://[^\s]+"),
    "ipv4": re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
}


def scrub_batch(batch: pa.Table, col: str = "text", out: str = "text_scrubbed",
                patterns: dict = None) -> pa.Table:
    """Mask every occurrence of each named pattern with ``<NAME>`` and count
    redactions per row/pattern.  Compiled patterns are module constants
    (compile-once); the kernel is a per-row re.sub chain over the batch —
    pattern masking is inherently per-string, but allocation stays batched
    and the output columns are typed (n_<name>: int64)."""
    import numpy as np

    pats = patterns or SCRUB_PATTERNS
    texts = batch[col].to_pylist()
    n = len(texts)
    counts = {name: np.zeros(n, np.int64) for name in pats}
    scrubbed = []
    for i, t in enumerate(texts):
        s = t or ""
        for name, rx in pats.items():
            s, c = rx.subn(f"<{name.upper()}>", s)
            counts[name][i] = c
        scrubbed.append(s)
    batch = batch.append_column(out, pa.array(scrubbed, pa.string()))
    for name in pats:
        batch = batch.append_column(f"n_{name}", pa.array(counts[name]))
    return batch
