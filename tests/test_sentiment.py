"""Sentiment scorer (M1) goldens: deterministic lexicon scorers with the
reference combine rule (/root/reference/sentiment.py:467-528)."""

import math

import pyarrow as pa

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


# ---------------------------------------------------------------------------
# J2 link-score fold (/root/reference/sentiment.py:201-222)
# ---------------------------------------------------------------------------

def test_fold_link_scores_golden():
    from stocksight_ray.pipelines.linkfold import fold_link_scores

    # hand trace of the reference fold:
    # urls_pol = ((0 + 0.5)/2 + (-0.3))/2 = -0.025 -> NOT > 0 -> polarity kept
    # urls_sub = ((0 + 0.2)/2 + 0.1)/2 = 0.1 -> subjectivity = (0.4+0.1)/2
    # label: positive link first -> positive, then "positive or negative"
    # -> first branch (sentiment == positive) -> stays positive
    p, s, lab = fold_link_scores(
        0.1, 0.4, "neutral",
        [(0.5, 0.2, "positive"), (-0.3, 0.1, "negative")],
    )
    assert p == 0.1  # urls_pol <= 0 quirk: polarity unchanged
    assert s == (0.4 + 0.1) / 2
    assert lab == "positive"

    # no links -> unchanged
    assert fold_link_scores(0.2, 0.3, "negative", []) == (0.2, 0.3, "negative")

    # order dependence of the polarity fold: later links weigh more
    p1, _, _ = fold_link_scores(0.0, 0.0, "neutral", [(0.8, 0, "neutral"), (0.2, 0, "neutral")])
    p2, _, _ = fold_link_scores(0.0, 0.0, "neutral", [(0.2, 0, "neutral"), (0.8, 0, "neutral")])
    assert p1 != p2
    assert p1 == (0.0 + ((0.0 + 0.8) / 2 + 0.2) / 2) / 2


def test_link_score_fold_distributed(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.linkfold import fold_link_scores, link_score_fold

    pages = pa.table({
        "url": pa.array([f"https://p{i}.example/" for i in range(6)], pa.string()),
        "polarity": pa.array([0.5, -0.3, 0.0, 0.9, -0.8, 0.1], pa.float64()),
        "subjectivity": pa.array([0.2, 0.1, 0.0, 0.7, 0.6, 0.3], pa.float64()),
        "sentiment": pa.array(
            ["positive", "negative", "neutral", "positive", "negative", "neutral"],
            pa.string()),
    })
    url = pages["url"].to_pylist()
    docs = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "polarity": pa.array([0.1, -0.2, 0.0, 0.4, 0.05], pa.float64()),
        "subjectivity": pa.array([0.4, 0.3, 0.0, 0.5, 0.2], pa.float64()),
        "sentiment": pa.array(
            ["neutral", "negative", "neutral", "positive", "neutral"], pa.string()),
        "urls": pa.array(
            [
                [url[0], url[1]],
                [url[1], url[0]],          # same links, other order
                [],
                [url[3], "https://missing.example/", url[4]],  # skip missing
                [url[2]],
            ],
            pa.list_(pa.string())),
    })
    got = (
        link_score_fold(
            rd.from_arrow(docs).repartition(3), rd.from_arrow(pages).repartition(2)
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    page_map = {
        r["url"]: (r["polarity"], r["subjectivity"], r["sentiment"])
        for r in pages.to_pylist()
    }
    d = docs.to_pandas()
    for i, r in d.iterrows():
        res = [page_map[u] for u in r["urls"] if u in page_map]
        ep, es, el = fold_link_scores(
            r["polarity"], r["subjectivity"], r["sentiment"], res
        )
        assert got.loc[i, "polarity"] == ep, i
        assert got.loc[i, "subjectivity"] == es, i
        assert got.loc[i, "sentiment"] == el, i
    # the two orderings of the same links produced different polarities
    assert got.loc[0, "polarity"] != got.loc[1, "polarity"]


def test_filter_pages_substring_f5(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.linkfold import (
        filter_pages_substring, link_score_fold,
    )

    pages = pa.table({
        "url": pa.array(["https://a/", "https://b/"], pa.string()),
        "polarity": pa.array([0.9, 0.9], pa.float64()),
        "subjectivity": pa.array([0.5, 0.5], pa.float64()),
        "sentiment": pa.array(["positive", "positive"], pa.string()),
        "text": pa.array(
            ["real article text", "Tweet with a location embedded"], pa.string()),
    })
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "polarity": pa.array([0.0, 0.0], pa.float64()),
        "subjectivity": pa.array([0.0, 0.0], pa.float64()),
        "sentiment": pa.array(["neutral", "neutral"], pa.string()),
        "urls": pa.array([["https://a/"], ["https://b/"]], pa.list_(pa.string())),
    })
    filtered = filter_pages_substring(rd.from_arrow(pages)).select_columns(
        ["url", "polarity", "subjectivity", "sentiment"]
    )
    out = (
        link_score_fold(rd.from_arrow(docs), filtered)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # doc 0's link survives (folded positive); doc 1's link was a twitter
    # page -> skipped, scores unchanged
    assert out.loc[0, "sentiment"] == "positive"
    assert out.loc[0, "polarity"] == (0.0 + (0.0 + 0.9) / 2) / 2
    assert out.loc[1, "sentiment"] == "neutral"
    assert out.loc[1, "polarity"] == 0.0
