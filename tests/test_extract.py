"""HTML → text extraction: the byte-identical per-url invariant
(BASELINE.json input_hint; reference /root/reference/sentiment.py:385-409)."""

from stocksight_ray.functions.htmlx import (
    extract_headlines,
    extract_page_text,
    extract_paragraphs,
    parse_html,
)
from stocksight_ray.webtext import generate_rows


def test_byte_identical_on_corpus():
    rows = generate_rows(0, 1000, seed=42)
    for html, expected in zip(rows["html"], rows["text"]):
        assert extract_page_text(html) == expected


def test_paragraph_cap():
    html = "".join(f"<p>para {i}.</p>" for i in range(15))
    assert extract_paragraphs(html) == [f"para {i}." for i in range(10)]


def test_nested_markup_skipped():
    # bs4 .string is None for multi-child <p>
    assert extract_paragraphs("<p>a <b>b</b> c</p><p>kept.</p>") == ["kept."]


def test_single_child_tag_recursive_string():
    # bs4 .string recurses through a single child tag
    assert extract_paragraphs("<p><em>inner text</em></p>") == ["inner text"]


def test_empty_paragraph_skipped():
    assert extract_paragraphs("<p></p><p>x</p>") == ["x"]


def test_entities_unescaped():
    assert extract_paragraphs("<p>A &amp; B</p>") == ["A & B"]


def test_malformed_never_raises():
    for bad in [b"", b"<p>unclosed", b"<html><body><p>a</p><div class=\"x", b"</p></div>", None]:
        extract_page_text(bad)  # must not raise
    assert extract_paragraphs("<p>unclosed tail") == ["unclosed tail"]


def test_headline_next4_rule():
    html = (
        '<h3 class="Mb(5px)"><a href="/news/1.html">'
        "<u class=\"x\"><b>Big Headline</b></u></a></h3>"
    )
    assert extract_headlines(html) == ["Big Headline"]
    # wrong shape (only 3 successors to the text) → no headline
    assert extract_headlines("<h3><a><b>t</b></a></h3>") == []


def test_void_elements_no_children():
    root = parse_html("<p>a<br>b</p>")
    # br is void: 'a', <br>, 'b' are three siblings under <p> → .string None
    assert extract_paragraphs("<p>a<br>b</p>") == []


def test_poison_html_never_crashes():
    """Adversarial payloads (random bytes, truncated tags, control chars,
    invalid UTF-8) must yield text (possibly empty), never raise — poison
    rows degrade to empty docs instead of killing a task."""
    import hashlib

    from stocksight_ray.functions.htmlx import extract_headlines, extract_page_text

    cases = [
        b"", None, b"\x00\xff\xfe garbage \x80\x81",
        b"<p>unclosed", b"<<<<>>>>", b"<p" + b"a" * 10000,
        b"<html><body><p>" + hashlib.sha256(b"x").digest() * 100,
        "<p>ok</p>".encode("utf-16"),  # wrong encoding
        b"<p>" + "  ﻿".encode() + b"</p>",
    ]
    for c in cases:
        out = extract_page_text(c)
        assert isinstance(out, str)
        assert isinstance(extract_headlines(c), list)


def test_comment_semantics_match_bs4():
    """Comments are NavigableString-like: they occupy .next positions, make
    mixed-content paragraphs .string-None, and a comment-only <p> yields
    the comment text (bs4 parity on the byte-identity surface)."""
    from stocksight_ray.functions.htmlx import extract_headlines, extract_page_text

    assert extract_page_text("<p>Real text<!-- ad --></p><p>Second</p>") == "Second"
    assert extract_page_text("<p><!-- only --></p><p>Kept</p>") == " only \nKept"
    # a comment before <a> shifts the .next^4 successor off the headline
    assert extract_headlines("<h3><!-- c --><a><u><b>H</b></u></a></h3>") == []
    assert extract_headlines("<h3><a><u><b>H</b></u></a></h3>") == ["H"]
