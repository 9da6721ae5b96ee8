"""Sentiment scorer (M1) goldens: deterministic lexicon scorers with the
reference combine rule (/root/reference/sentiment.py:467-528)."""

import math

from stocksight_ray.functions.sentiment import (
    pattern_scores,
    sentiment_analysis,
    vader_compound,
)


def test_combine_rule_positive():
    pol, sub, label = sentiment_analysis("great gains and strong growth today")
    assert label == "positive"
    assert pol > 0
    assert 0 <= sub <= 1


def test_combine_rule_negative():
    pol, sub, label = sentiment_analysis("terrible losses, market crash fears")
    assert label == "negative"
    assert pol < 0


def test_combine_rule_neutral_when_no_lexicon_hits():
    pol, sub, label = sentiment_analysis("the quarterly report was filed on tuesday")
    assert label == "neutral"
    assert pol == 0.0
    assert sub == 0.0


def test_neutral_on_disagreement():
    # pattern negative but vader clearly positive → neither branch fires
    # construct: pattern-only word with negative pol? use mixed signals
    pol, sub, label = sentiment_analysis("risk")  # tb<0 but compound of -1.1 → negative
    # 'risk': tb=-0.2, vader=-1.1/sqrt(...)<-0.05 → negative
    assert label == "negative"


def test_negation_flips_pattern():
    pos, _ = pattern_scores("good result")
    neg, _ = pattern_scores("not good result")
    assert pos > 0 and neg < 0
    assert math.isclose(neg, pos * -0.5)


def test_negation_dampens_vader():
    assert vader_compound("not good") < vader_compound("good")


def test_booster_amplifies():
    assert vader_compound("very good") > vader_compound("good")
    assert vader_compound("slightly good") < vader_compound("good")


def test_exclamation_amplifies():
    assert vader_compound("good!!") > vader_compound("good")
    assert vader_compound("bad!!") < vader_compound("bad")


def test_compound_normalized():
    for text in ["best best best best best!!!!", "worst worst worst worst"]:
        assert -1.0 <= vader_compound(text) <= 1.0


def test_determinism_golden():
    got = sentiment_analysis("markets rally strongly, investors very happy!")
    again = sentiment_analysis("markets rally strongly, investors very happy!")
    assert got == again
    assert got[2] == "positive"


def test_quoted_words_and_bigram_boosters():
    from stocksight_ray.functions.sentiment import sentiment_analysis, vader_compound

    # quoted sentiment words still hit the lexicon
    plain = sentiment_analysis("the results were good")
    quoted = sentiment_analysis("the results were 'good'")
    assert quoted[0] == plain[0] and quoted[2] == plain[2]
    # 'kind of' dampens relative to the bare word
    assert abs(vader_compound("kind of good")) < abs(vader_compound("good"))
