"""Golden tests for clean kernels (reference quirks preserved:
/root/reference/sentiment.py:412-428) and the NLTK-style token pipeline
(/root/reference/sentiment.py:130-144)."""

import pyarrow as pa

from stocksight_ray.functions.clean import (
    clean_text,
    clean_text_array,
    clean_text_sentiment,
    clean_text_sentiment_array,
)
from stocksight_ray.functions.tokenize import nltk_style_tokens, prefilter

CLEAN_CASES = [
    ("hello\nworld", "hello world"),
    ("go https://x.co/abc now", "go  now"),
    # &.*?; over-strips text between & and the next ;
    ("a &amp; b", "a  b"),
    ("bread & butter; and more", "bread  and more"),
    ("<b>bold</b> text", "bold text"),
    # literal RT removed anywhere, even word-internal
    ("RT @user hi", "@user hi"),
    ("staRTed", "staed"),
    ("wait… what", "wait what"),
    ("  padded  ", "padded"),
    ("", ""),
]


def test_clean_text_golden():
    for raw, want in CLEAN_CASES:
        assert clean_text(raw) == want, raw


def test_clean_text_vectorized_matches_row_kernel():
    raws = [r for r, _ in CLEAN_CASES]
    got = clean_text_array(pa.array(raws)).to_pylist()
    assert got == [clean_text(r) for r in raws]


SENT_CASES = [
    ("love #stocks and @user today", "love  and  today"),
    ("|pipe quirk", "quirk"),  # [#|@] class strips |-prefixed runs too
    ("plain words", "plain words"),
]


def test_clean_sentiment_golden():
    for raw, want in SENT_CASES:
        assert clean_text_sentiment(raw) == want, raw
    raws = [r for r, _ in SENT_CASES]
    got = clean_text_sentiment_array(pa.array(raws)).to_pylist()
    assert got == [w for _, w in SENT_CASES]


def test_prefilter_removes_reference_charset():
    assert prefilter("a%b|c$d.e,f!g:h@i(j)k#l+m?n-o") == "abcdefghijklmno"
    assert prefilter("``quoted''") == "quoted"


def test_token_pipeline_golden():
    # lowercase, punctuation stripped, isalpha only, stopwords out, len>=3
    text = "The Markets are falling! $TSLA dropped 5% today - so bad, really..."
    assert nltk_style_tokens(text) == ["markets", "falling", "tsla", "dropped", "today", "bad", "really"]
    assert nltk_style_tokens("a an the is") == []
    assert nltk_style_tokens("ab cd efg") == ["efg"]
    assert nltk_style_tokens("price123 ok42x") == []  # non-alpha after strip


def test_tokens_deterministic():
    text = "Stocks surge as markets rally; investors are happy!"
    assert nltk_style_tokens(text) == nltk_style_tokens(text)


def test_vectorized_clean_matches_row_on_unicode_whitespace():
    """RE2 \\S is ASCII-only; the vectorized kernels must stop at the same
    Unicode whitespace as the Python row kernels (U+00A0, thin space...)."""
    import pyarrow as pa

    from stocksight_ray.functions.clean import (
        clean_text, clean_text_array, clean_text_sentiment,
        clean_text_sentiment_array,
    )

    cases = [
        "see https://x.com\xa0next words",
        "hello @user\xa0world and #tag done",
        "u https://a b end",
        "#x\x85y plain",
    ]
    arr = pa.array(cases, pa.string())
    for t, v, sv in zip(
        cases,
        clean_text_array(arr).to_pylist(),
        clean_text_sentiment_array(arr).to_pylist(),
    ):
        assert v == clean_text(t)
        assert sv == clean_text_sentiment(t)


def test_scrub_batch_masks_and_counts():
    import pyarrow as pa

    from stocksight_ray.functions.clean import scrub_batch

    t = pa.table({
        "text": pa.array([
            "contact me at bob@example.com or https://x.test/page now",
            "server 192.168.0.1 and 10.0.0.255 responded",
            "no sensitive content here",
            None,
        ], pa.string()),
    })
    out = scrub_batch(t)
    s = out["text_scrubbed"].to_pylist()
    assert s[0] == "contact me at <EMAIL> or <URL> now"
    assert s[1] == "server <IPV4> and <IPV4> responded"
    assert s[2] == "no sensitive content here"
    assert s[3] == ""
    assert out["n_email"].to_pylist() == [1, 0, 0, 0]
    assert out["n_url"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0, 0]


def test_idlist_roundtrip_and_track_kwargs(ray_session, tmp_path):
    """S5: one-id-per-line cache file — write, read back in file order via
    the Ray text source, and map onto F3 admission kwargs; missing/empty
    files impose no constraint (reference logs-and-continues on IOError)."""
    from stocksight_ray.functions.idlist import (
        load_track_ids, save_track_ids, track_filter_kwargs,
    )

    p = str(tmp_path / "track_ids.txt")
    assert load_track_ids(p) == ()
    assert track_filter_kwargs(p) == {}

    n = save_track_ids(p, ["alice", "bob", "carol"])
    assert n == 3
    assert load_track_ids(p) == ("alice", "bob", "carol")
    kw = track_filter_kwargs(p, min_required=2)
    assert kw == {"tokens_required": ("alice", "bob", "carol"),
                  "min_required": 2}

    # blank/whitespace lines are dropped like the reference's strip loop
    with open(p, "wt", encoding="utf-8") as f:
        f.write("alice\n\n  \nbob\n")
    assert load_track_ids(p) == ("alice", "bob")
