"""HTML → markdown text extraction — the byte-identity kernel.

A pure-Python reimplementation of the reference's extraction semantics
(packages/graph/src/loader/html.ts):

* ``parse_html``    — html.ts:28-35  (htmlparser2 parseDocument with
  decodeEntities / lowerCaseTags / lowerCaseAttributeNames /
  recognizeSelfClosing → here: html.parser with convert_charrefs plus an
  open-element stack with htmlparser2's openImpliesClose rules)
* ``html_to_markdown`` — html.ts:42-177 (renderer; every branch ported)
* ``normalize_html``  — html.ts:37-40  (re-serialize, "html" document mode)

No Spark imports here: this module is shipped to executors and invoked from
an Arrow-batched ``mapInPandas`` stage (kiwi_spark.operators.extract_text).
The per-row invariant is byte-identical output per url versus the reference
renderer on well-formed HTML (SURVEY.md §2.1).
"""

from __future__ import annotations

from html.parser import HTMLParser

from .jsstr import (
    RE_3PLUS_NL,
    collapse_inline_whitespace,
    js_trim,
    normalize_markdown,
)

VOID_ELEMENTS = frozenset(
    "area base basefont br col command embed frame hr img input isindex "
    "keygen link meta param source track wbr".split()
)

# htmlparser2 openImpliesClose (subset covering HTML block structure): when
# <new> opens while <open> is on the stack top, <open> is implicitly closed.
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hr main nav ol p pre "
    "section table ul".split()
)
_OPEN_IMPLIES_CLOSE = {
    "li": frozenset(["li"]),
    "dt": frozenset(["dt", "dd"]),
    "dd": frozenset(["dt", "dd"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "tbody": frozenset(["thead", "tbody"]),
    "tfoot": frozenset(["thead", "tbody"]),
    "option": frozenset(["option"]),
    "optgroup": frozenset(["option", "optgroup"]),
}


class TextNode:
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        self.data = data


class ElementNode:
    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict[str, str]) -> None:
        self.name = name
        self.attrs = attrs
        self.children: list[object] = []


class _DomBuilder(HTMLParser):
    """Builds an htmlparser2-shaped DOM; entities decoded, tags lowercased."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root: list[object] = []
        self.stack: list[ElementNode] = []

    # -- helpers ---------------------------------------------------------
    def _append(self, node: object) -> None:
        (self.stack[-1].children if self.stack else self.root).append(node)

    def _implied_close(self, name: str) -> None:
        while self.stack:
            top = self.stack[-1].name
            if name in _P_CLOSERS and top == "p":
                self.stack.pop()
                continue
            closers = _OPEN_IMPLIES_CLOSE.get(name)
            if closers and top in closers:
                self.stack.pop()
                continue
            break

    # -- HTMLParser hooks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._implied_close(tag)
        node = ElementNode(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # recognizeSelfClosing: <tag/> never opens a scope
        self._implied_close(tag)
        self._append(ElementNode(tag, {k: (v if v is not None else "") for k, v in attrs}))

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored (htmlparser2 behaviour)

    def handle_data(self, data: str) -> None:
        if data:
            self._append(TextNode(data))

    def handle_comment(self, data: str) -> None:  # comments render as ""
        pass

    def handle_decl(self, decl: str) -> None:  # <!doctype ...>
        pass


def parse_html(html: str) -> list[object]:
    """Parse to a node list (the "document children")."""
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def _find_first(nodes: list[object], name: str) -> ElementNode | None:
    for node in nodes:
        if isinstance(node, ElementNode):
            if node.name == name:
                return node
            found = _find_first(node.children, name)
            if found is not None:
                return found
    return None


def _text_content(node: object) -> str:
    """DomUtils.textContent — concatenated descendant text."""
    if isinstance(node, TextNode):
        return node.data
    if isinstance(node, ElementNode):
        return "".join(_text_content(child) for child in node.children)
    return ""


_HEADINGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
_BLOCKS = frozenset(
    ["p", "div", "section", "article", "main", "header", "footer", "aside", "nav"]
)
_DROPPED = frozenset(["script", "style", "noscript", "template", "head"])
_TABLE_PASSTHROUGH = frozenset(["thead", "tbody", "tfoot", "tr", "td", "th"])


def _render_nodes(nodes: list[object], list_depth: int) -> str:
    return "".join(_render_node(node, list_depth) for node in nodes)


def _read_attr(node: ElementNode, name: str) -> str | None:
    value = node.attrs.get(name)
    if value is None:
        return None
    value = js_trim(value)
    return value or None


def _render_list(node: ElementNode, ordered: bool, depth: int) -> str:
    # html.ts:145-155
    items = [c for c in node.children if isinstance(c, ElementNode) and c.name == "li"]
    indent = "  " * depth
    out = []
    for index, item in enumerate(items):
        marker = f"{index + 1}." if ordered else "-"
        child_text = js_trim(_render_nodes(item.children, depth + 1))
        child_text = RE_3PLUS_NL.sub("\n\n", child_text).replace("\n", "\n" + indent + "  ")
        out.append(f"{indent}{marker} {child_text}")
    return "\n".join(out)


def _find_all_tr(node: ElementNode) -> list[ElementNode]:
    found: list[ElementNode] = []

    def walk(n: object) -> None:
        if isinstance(n, ElementNode):
            if n.name == "tr":
                found.append(n)
            for child in n.children:
                walk(child)

    for child in node.children:
        walk(child)
    return found


def _render_table(table: ElementNode) -> str:
    # html.ts:157-177
    rows = _find_all_tr(table)
    if not rows:
        return f"\n\n{js_trim(_text_content(table))}\n\n"
    rendered = []
    for row in rows:
        cells = [
            c
            for c in row.children
            if isinstance(c, ElementNode) and c.name in ("td", "th")
        ]
        rendered.append(
            [
                collapse_inline_whitespace(_render_nodes(cell.children, 0)).replace("|", "\\|")
                for cell in cells
            ]
        )
    width = max(len(r) for r in rendered)
    normalized = [r + [""] * (width - len(r)) for r in rendered]
    header = normalized[0] if normalized else []
    separator = ["---"] * len(header)
    body = normalized[1:]
    lines = [f"| {' | '.join(row)} |" for row in [header, separator, *body]]
    return "\n\n" + "\n".join(lines) + "\n\n"


def _render_node(node: object, list_depth: int) -> str:
    # html.ts:53-143, branch for branch
    if isinstance(node, TextNode):
        return node.data
    if not isinstance(node, ElementNode):
        return ""

    name = node.name

    if name in _DROPPED:
        return ""
    if name == "br":
        return "\n"
    if name == "hr":
        return "\n\n---\n\n"
    if name in _HEADINGS:
        level = int(name[1])
        inline = collapse_inline_whitespace(_render_nodes(node.children, list_depth))
        return f"\n\n{'#' * level} {inline}\n\n"
    if name in _BLOCKS:
        children = js_trim(_render_nodes(node.children, list_depth))
        return f"\n\n{children}\n\n"
    if name == "blockquote":
        children = js_trim(_render_nodes(node.children, list_depth))
        quoted = "\n".join(
            ("> " + line) if js_trim(line) else ">" for line in children.split("\n")
        )
        return f"\n\n{quoted}\n\n"
    if name in ("strong", "b"):
        return f"**{collapse_inline_whitespace(_render_nodes(node.children, list_depth))}**"
    if name in ("em", "i"):
        return f"_{collapse_inline_whitespace(_render_nodes(node.children, list_depth))}_"
    if name in ("s", "del"):
        return f"~~{collapse_inline_whitespace(_render_nodes(node.children, list_depth))}~~"
    if name == "code":
        inline = collapse_inline_whitespace(_render_nodes(node.children, list_depth))
        return "`" + inline.replace("`", "\\`") + "`"
    if name == "pre":
        return f"\n\n```\n{js_trim(_text_content(node))}\n```\n\n"
    if name == "a":
        text = collapse_inline_whitespace(_render_nodes(node.children, list_depth))
        href = _read_attr(node, "href")
        return f"[{text or href}]({href})" if href else text
    if name == "img":
        alt = _read_attr(node, "alt") or _read_attr(node, "title")
        src = _read_attr(node, "src")
        if alt and src:
            return f"[Image: {alt}]({src})"
        return f"[Image: {alt}]" if alt else ""
    if name in ("ul", "ol"):
        return f"\n{_render_list(node, name == 'ol', list_depth)}\n"
    if name == "li":
        return collapse_inline_whitespace(_render_nodes(node.children, list_depth))
    if name == "table":
        return _render_table(node)
    if name in _TABLE_PASSTHROUGH:
        return js_trim(_render_nodes(node.children, list_depth))
    return _render_nodes(node.children, list_depth)


def html_to_markdown(html: str | list[object]) -> str:
    """html.ts:42-47 — the extraction entry point."""
    nodes = parse_html(html) if isinstance(html, str) else html
    body = _find_first(nodes, "body")
    target = body.children if body is not None else nodes
    return js_trim(normalize_markdown(_render_nodes(target, 0)))


# --- documentMode "html" (S8) -------------------------------------------

_ESC_TEXT = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def _escape_text(value: str) -> str:
    for ch, rep in _ESC_TEXT.items():
        value = value.replace(ch, rep)
    return value


def _serialize(node: object) -> str:
    if isinstance(node, TextNode):
        return _escape_text(node.data)
    if not isinstance(node, ElementNode):
        return ""
    attrs = "".join(
        f' {k}="{v.replace("&", "&amp;").replace(chr(34), "&quot;")}"'
        for k, v in node.attrs.items()
    )
    if node.name in VOID_ELEMENTS:
        return f"<{node.name}{attrs}>"
    inner = "".join(_serialize(child) for child in node.children)
    return f"<{node.name}{attrs}>{inner}</{node.name}>"


def normalize_html(html: str | list[object]) -> str:
    """html.ts:37-40 — re-serialize parsed DOM (fixes malformed HTML)."""
    nodes = parse_html(html) if isinstance(html, str) else html
    return js_trim("".join(_serialize(node) for node in nodes))
