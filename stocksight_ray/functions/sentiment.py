"""Deterministic 2-source sentiment analysis (M1) — from-scratch lexicon
scorers with the reference's exact combine rule
(/root/reference/sentiment.py:467-528):

    negative  iff pattern_polarity < 0  and  vader_compound <= -0.05
    positive  iff pattern_polarity > 0  and  vader_compound >= +0.05
    neutral   otherwise
    polarity      = (pattern_polarity + vader_compound) / 2
    subjectivity  = pattern_subjectivity

The third source (web sentiment API, ``-w``) is dropped: non-deterministic
external service (SURVEY.md §2.5).  Lexicons are packaged data
(functions/lexicon.py) loaded once per actor; scoring is pure.
"""

from __future__ import annotations

import math
import re
from typing import List, Tuple

from .lexicon import BOOSTERS, NEGATIONS, PATTERN_LEXICON, VADER_LEXICON

_TOKEN_RE = re.compile(r"[a-z']+")
_NEG_SCALAR = -0.74  # VADER's published negation dampener
_EXCL_BOOST = 0.292  # per '!' amplification, capped at 4


def _words(text: str) -> List[str]:
    # strip enclosing apostrophes ('good' → good) so quoted words still hit
    # the lexicons; internal apostrophes (don't) are preserved
    return [w.strip("'") for w in _TOKEN_RE.findall(text.lower()) if w.strip("'")]


def pattern_scores(text: str, words: "List[str] | None" = None) -> Tuple[float, float]:
    """TextBlob/pattern-style (polarity, subjectivity): average over matched
    lexicon words; a negator in the 2 preceding words multiplies polarity by
    -0.5 (pattern's published rule).  ``words`` lets callers share one
    ``_words(text)`` pass across both scorers."""
    if words is None:
        words = _words(text)
    pols: List[float] = []
    subs: List[float] = []
    for i, w in enumerate(words):
        entry = PATTERN_LEXICON.get(w)
        if entry is None:
            continue
        pol, sub = entry
        if any(words[j] in NEGATIONS for j in range(max(0, i - 2), i)):
            pol *= -0.5
        pols.append(pol)
        subs.append(sub)
    if not pols:
        return 0.0, 0.0
    return sum(pols) / len(pols), sum(subs) / len(subs)


def vader_compound(text: str, words: "List[str] | None" = None) -> float:
    """VADER-style compound in [-1, 1]: summed valences with distance-decayed
    degree boosters, negation dampening, '!' amplification, normalized by
    x/sqrt(x^2+15) (Hutto & Gilbert 2014 normalization)."""
    if words is None:
        words = _words(text)
    total = 0.0
    for i, w in enumerate(words):
        valence = VADER_LEXICON.get(w)
        if valence is None:
            continue
        for dist, j in enumerate(range(i - 1, max(-1, i - 4), -1)):
            prev = words[j]
            prev2 = (words[j - 1] + " " + prev) if j - 1 >= 0 else None
            scalar = None
            if prev2 in BOOSTERS:  # two-word boosters ('kind of', ...)
                scalar = BOOSTERS[prev2] * (1.0, 0.95, 0.9)[dist]
            elif prev in BOOSTERS:
                scalar = BOOSTERS[prev] * (1.0, 0.95, 0.9)[dist]
            if scalar is not None:
                valence += scalar if valence >= 0 else -scalar
            if prev in NEGATIONS:
                valence *= _NEG_SCALAR
                break
        total += valence
    n_excl = min(text.count("!"), 4)
    if total > 0:
        total += n_excl * _EXCL_BOOST
    elif total < 0:
        total -= n_excl * _EXCL_BOOST
    compound = total / math.sqrt(total * total + 15.0)
    return max(-1.0, min(1.0, compound))


def sentiment_analysis(text: str) -> Tuple[float, float, str]:
    """(polarity, subjectivity, label) per the reference combine rule."""
    words = _words(text)  # ONE tokenize pass shared by both scorers
    tb_pol, tb_sub = pattern_scores(text, words)
    compound = vader_compound(text, words)
    if tb_pol < 0 and compound <= -0.05:
        label = "negative"
    elif tb_pol > 0 and compound >= 0.05:
        label = "positive"
    else:
        label = "neutral"
    return (tb_pol + compound) / 2.0, tb_sub, label
