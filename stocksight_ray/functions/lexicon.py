"""Packaged sentiment lexicons — from-scratch, deterministic, versioned.

Two lexicons mirror the reference's two scorers
(/root/reference/sentiment.py:467-528): a TextBlob/pattern-style lexicon of
(polarity, subjectivity) pairs and a VADER-style valence lexicon in [-4, 4].
Values are this engine's committed definitions (the reference's lexicons live
in unavailable third-party packages); golden tests pin outputs.
"""

# word -> (polarity [-1,1], subjectivity [0,1])
PATTERN_LEXICON = {
    # strong positive
    "excellent": (1.0, 1.0), "amazing": (0.8, 0.9), "wonderful": (1.0, 1.0),
    "fantastic": (0.9, 0.9), "outstanding": (0.9, 0.9), "best": (1.0, 0.3),
    "great": (0.8, 0.75), "perfect": (1.0, 1.0), "awesome": (1.0, 1.0),
    "love": (0.5, 0.6), "superb": (0.9, 0.9), "brilliant": (0.9, 0.9),
    # positive
    "good": (0.7, 0.6), "strong": (0.4, 0.5), "positive": (0.4, 0.6),
    "gain": (0.4, 0.4), "gains": (0.4, 0.4), "winning": (0.5, 0.6),
    "win": (0.5, 0.5), "success": (0.5, 0.5), "successful": (0.5, 0.5),
    "profit": (0.3, 0.3), "profits": (0.3, 0.3), "growth": (0.3, 0.3),
    "upgrade": (0.4, 0.4), "beat": (0.3, 0.4), "happy": (0.8, 1.0),
    "happiness": (0.7, 0.9), "generous": (0.6, 0.7), "generously": (0.6, 0.7),
    "improve": (0.4, 0.4), "improved": (0.4, 0.4), "rally": (0.4, 0.5),
    "surge": (0.4, 0.5), "soar": (0.5, 0.5), "bullish": (0.5, 0.7),
    "record": (0.2, 0.3), "boom": (0.4, 0.5), "recovery": (0.3, 0.4),
    # negative
    "bad": (-0.7, 0.67), "weak": (-0.4, 0.5), "negative": (-0.4, 0.6),
    "loss": (-0.4, 0.4), "losses": (-0.4, 0.4), "decline": (-0.3, 0.4),
    "falling": (-0.3, 0.4), "fall": (-0.2, 0.3), "fails": (-0.5, 0.5),
    "failure": (-0.5, 0.5), "fail": (-0.5, 0.5), "failed": (-0.5, 0.5),
    "crash": (-0.6, 0.6), "fears": (-0.4, 0.6), "fear": (-0.4, 0.6),
    "worry": (-0.4, 0.6), "worried": (-0.4, 0.6), "downgrade": (-0.4, 0.4),
    "miss": (-0.3, 0.4), "missed": (-0.3, 0.4), "bearish": (-0.5, 0.7),
    "recession": (-0.5, 0.5), "slump": (-0.4, 0.5), "plunge": (-0.5, 0.5),
    "drop": (-0.2, 0.3), "weakness": (-0.4, 0.5), "risk": (-0.2, 0.4),
    "risks": (-0.2, 0.4), "debt": (-0.2, 0.3), "lawsuit": (-0.4, 0.4),
    # strong negative
    "terrible": (-1.0, 1.0), "horrible": (-1.0, 1.0), "awful": (-1.0, 1.0),
    "worst": (-1.0, 0.3), "disaster": (-0.8, 0.8), "disastrous": (-0.8, 0.8),
    "hate": (-0.8, 0.9), "catastrophe": (-0.9, 0.9), "bankrupt": (-0.8, 0.6),
    "bankruptcy": (-0.8, 0.6), "fraud": (-0.8, 0.7), "scandal": (-0.6, 0.6),
}

# word -> valence [-4, 4]
VADER_LEXICON = {
    "excellent": 2.7, "amazing": 2.8, "wonderful": 2.7, "fantastic": 2.6,
    "outstanding": 2.8, "best": 3.2, "great": 3.1, "perfect": 2.7,
    "awesome": 3.1, "love": 3.2, "superb": 3.0, "brilliant": 2.8,
    "good": 1.9, "strong": 1.4, "positive": 2.3, "gain": 1.5, "gains": 1.5,
    "winning": 2.4, "win": 2.8, "success": 2.7, "successful": 2.2,
    "profit": 1.8, "profits": 1.6, "growth": 1.6, "upgrade": 1.3,
    "beat": 0.8, "happy": 2.7, "happiness": 2.6, "generous": 2.3,
    "generously": 2.2, "improve": 1.9, "improved": 2.1, "rally": 1.4,
    "surge": 1.2, "soar": 1.6, "bullish": 1.9, "boom": 1.4, "recovery": 1.8,
    "bad": -2.5, "weak": -1.9, "negative": -2.7, "loss": -1.3,
    "losses": -1.3, "decline": -1.6, "falling": -1.4, "fall": -1.2,
    "fails": -2.0, "failure": -2.3, "fail": -2.5, "failed": -2.3,
    "crash": -2.5, "fears": -1.9, "fear": -2.2, "worry": -1.9,
    "worried": -1.8, "downgrade": -1.3, "miss": -1.0, "missed": -1.1,
    "bearish": -1.8, "recession": -2.2, "slump": -1.6, "plunge": -1.5,
    "drop": -1.1, "weakness": -1.8, "risk": -1.1, "risks": -1.1,
    "debt": -1.4, "lawsuit": -1.6, "terrible": -3.1, "horrible": -2.5,
    "awful": -2.0, "worst": -3.1, "disaster": -3.1, "disastrous": -2.9,
    "hate": -2.7, "catastrophe": -3.4, "bankrupt": -2.6, "bankruptcy": -2.6,
    "fraud": -2.8, "scandal": -2.2,
}

# degree modifiers (VADER-style booster dictionary)
BOOSTER_INCR = 0.293
BOOSTERS = {
    "absolutely": BOOSTER_INCR, "completely": BOOSTER_INCR,
    "extremely": BOOSTER_INCR, "hugely": BOOSTER_INCR,
    "incredibly": BOOSTER_INCR, "really": BOOSTER_INCR,
    "remarkably": BOOSTER_INCR, "so": BOOSTER_INCR, "totally": BOOSTER_INCR,
    "very": BOOSTER_INCR, "highly": BOOSTER_INCR,
    "almost": -BOOSTER_INCR, "barely": -BOOSTER_INCR,
    "hardly": -BOOSTER_INCR, "kind of": -BOOSTER_INCR,
    "less": -BOOSTER_INCR, "little": -BOOSTER_INCR,
    "marginally": -BOOSTER_INCR, "occasionally": -BOOSTER_INCR,
    "partly": -BOOSTER_INCR, "scarcely": -BOOSTER_INCR,
    "slightly": -BOOSTER_INCR, "somewhat": -BOOSTER_INCR,
}

NEGATIONS = frozenset(
    """
    not no never none nobody nothing neither nor cannot cant can't won't
    wont isn't isnt aren't arent wasn't wasnt weren't werent don't dont
    doesn't doesnt didn't didnt hasn't hasnt haven't havent hadn't hadnt
    without rarely seldom despite
    """.split()
)
