"""From-scratch HTML → text extraction (no bs4 dependency).

Replicates the extraction semantics of the reference
(/root/reference/sentiment.py:385-409 ``get_page_text`` and
/root/reference/sentiment.py:356-358 headline extraction):

* ``extract_page_text(html)``: the first ``max_paragraphs`` (10) ``<p>``
  elements in document order; a paragraph contributes its text only when its
  content is a *single text node* (the bs4 ``tag.string is not None``
  condition, including the recursive single-child-tag case); kept paragraph
  strings are joined with ``"\\n"``.  This is the per-url byte-identical
  invariant surface (BASELINE.json input_hint).
* ``extract_headlines(html)``: for each ``<h3>`` take the 4th successor node
  in document (pre-)order — the reference's quirky ``i.next.next.next.next``
  — and keep it when it is a text node.

The parser is a small DOM built on stdlib ``html.parser.HTMLParser``:
defensive on malformed input (never raises), deterministic, with
bs4-html.parser-like behavior: character references are unescaped
(``convert_charrefs=True``), contiguous character data merges into one text
node, void elements never take children, and unclosed tags simply stay open
(no implied-end-tag magic).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, List, Optional, Union

MAX_PARAGRAPHS = 10

_VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


class TextNode:
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        self.data = data

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TextNode({self.data!r})"


class CommentNode(TextNode):
    """HTML comment.  Subclasses TextNode deliberately: bs4's Comment is a
    NavigableString subclass, so a comment occupies a position in the
    ``.next`` chain, a tag whose ONLY child is a comment has a non-None
    ``.string`` (the comment text), and a tag with text + comment children
    has ``.string is None`` — all of which the extractors must replicate."""

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"CommentNode({self.data!r})"


class TagNode:
    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: Optional[dict] = None) -> None:
        self.name = name
        self.attrs = attrs or {}
        self.children: List[Union["TagNode", TextNode]] = []

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TagNode(<{self.name}> {len(self.children)} children)"

    @property
    def string(self) -> Optional[str]:
        """bs4-compatible ``.string``: non-None iff this tag has exactly one
        child and that child is a text node, or a single child tag whose
        ``.string`` is itself non-None (recursive)."""
        if len(self.children) != 1:
            return None
        child = self.children[0]
        if isinstance(child, TextNode):
            return child.data
        return child.string


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = TagNode("[document]")
        self._stack: List[TagNode] = [self.root]
        self._pending_text: List[str] = []

    # -- text accumulation: contiguous data calls merge into one TextNode,
    #    mirroring one NavigableString per text run in bs4.
    def _flush_text(self) -> None:
        if self._pending_text:
            self._stack[-1].children.append(TextNode("".join(self._pending_text)))
            self._pending_text = []

    def handle_data(self, data: str) -> None:
        if data:
            self._pending_text.append(data)

    def handle_comment(self, data: str) -> None:
        self._flush_text()
        self._stack[-1].children.append(CommentNode(data))

    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush_text()
        node = TagNode(tag, dict(attrs))
        self._stack[-1].children.append(node)
        if tag not in _VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._flush_text()
        self._stack[-1].children.append(TagNode(tag, dict(attrs)))

    def handle_endtag(self, tag: str) -> None:
        self._flush_text()
        # close the nearest matching open tag; ignore stray end tags
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                break

    def close(self) -> None:
        super().close()
        self._flush_text()


def parse_html(html: Union[str, bytes, None]) -> TagNode:
    """Parse HTML into a small DOM. Never raises on malformed input."""
    if html is None:
        return TagNode("[document]")
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _DomBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # Defensive: a truncated/poison page yields whatever parsed so far.
        builder._flush_text()
    return builder.root


def iter_nodes(root: TagNode) -> Iterator[Union[TagNode, TextNode]]:
    """Document-order (depth-first pre-order) node stream, excluding the
    synthetic root.  Equivalent to bs4's ``.next`` chain."""
    stack: List[Union[TagNode, TextNode]] = list(reversed(root.children))
    while stack:
        node = stack.pop()
        yield node
        if isinstance(node, TagNode):
            stack.extend(reversed(node.children))


def find_all(root: TagNode, name: str) -> List[TagNode]:
    return [n for n in iter_nodes(root) if isinstance(n, TagNode) and n.name == name]


def extract_paragraphs(
    html: Union[str, bytes, None], max_paragraphs: int = MAX_PARAGRAPHS
) -> List[str]:
    """First ``max_paragraphs`` <p> tags in document order; keep only those
    whose content is a single text node (``.string is not None``).
    Reference semantics: /root/reference/sentiment.py:385-409."""
    root = parse_html(html)
    out: List[str] = []
    for n, p in enumerate(find_all(root, "p"), start=1):
        if n > max_paragraphs:
            break
        s = p.string
        if s is not None:
            out.append(s)
    return out


def extract_page_text(
    html: Union[str, bytes, None], max_paragraphs: int = MAX_PARAGRAPHS
) -> str:
    """Kept paragraph strings joined with "\\n" — the byte-identical
    per-url contract (FIXTURES.md §1)."""
    return "\n".join(extract_paragraphs(html, max_paragraphs))


def extract_headlines(html: Union[str, bytes, None]) -> List[str]:
    """For each <h3>, take the 4th successor node in document order; keep it
    when it is a text node.  Reference: the ``i.next.next.next.next`` rule at
    /root/reference/sentiment.py:356-358 (shaped for Yahoo Finance markup
    ``<h3><a><u><b>Headline</b></u></a></h3>``)."""
    root = parse_html(html)
    nodes = list(iter_nodes(root))
    out: List[str] = []
    for idx, node in enumerate(nodes):
        if isinstance(node, TagNode) and node.name == "h3":
            succ = idx + 4
            if succ < len(nodes) and isinstance(nodes[succ], TextNode):
                out.append(nodes[succ].data)
    return out
