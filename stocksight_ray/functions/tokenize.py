"""NLTK-style token pipeline (T1) — from-scratch, no NLTK.

Reference semantics (/root/reference/sentiment.py:130-144):
  1. prefilter regex removes ``% | $ . , ! : @ ( ) # + ? -`` and `` `` ``/``''``
     pairs (the reference's char class ``[\\%|\\$|\\.|\\,|\\!|\\:|\\@]``
     includes the literal pipe);
  2. word tokenization (we substitute a deterministic regex tokenizer for
     nltk.word_tokenize: runs of word chars, or runs of non-space
     non-word chars — the downstream punctuation-strip + isalpha filters make
     the results converge for natural text);
  3. lowercase;
  4. strip ASCII punctuation from each token (str.translate);
  5. keep alphabetic tokens only (str.isalpha);
  6. drop English stopwords;
  7. drop tokens shorter than 3 chars.

The divergence from nltk.word_tokenize (Treebank) is confined to step 2 and
is erased by steps 4-5 for the fixture corpus; golden tests pin this
pipeline's own committed outputs (the reference ships no tests — SURVEY.md §5).
"""

from __future__ import annotations

import re
import string
from typing import List

from .stopwords import ENGLISH_STOPWORDS

# Reference prefilter at /root/reference/sentiment.py:130-131 (same effective
# character set, written without the redundant alternation quirks).
_PREFILTER_RE = re.compile(r"[%|$.,!:@()#+?\-]|(``)|('')")

_WORD_RE = re.compile(r"\w+|[^\w\s]+")

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def prefilter(text: str) -> str:
    return _PREFILTER_RE.sub("", text)


def word_tokenize(text: str) -> List[str]:
    return _WORD_RE.findall(text)


def nltk_style_tokens(text: str, min_len: int = 3) -> List[str]:
    """Full T1 pipeline: prefilter → tokenize → lower → strip punct →
    isalpha → stopwords → len>=min_len."""
    tokens = word_tokenize(prefilter(text))
    out: List[str] = []
    for w in tokens:
        w = w.lower().translate(_PUNCT_TABLE)
        if w.isalpha() and w not in ENGLISH_STOPWORDS and len(w) >= min_len:
            out.append(w)
    return out
