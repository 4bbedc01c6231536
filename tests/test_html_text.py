"""HTML→markdown renderer tests, mirroring the reference's fixture families
(packages/graph/src/loader/__tests__/html.test.ts) plus renderer branches
from loader/html.ts:53-177."""

from kiwi_spark.functions.html_text import html_to_markdown, normalize_html


def test_converts_html_to_markdown():  # html.test.ts:8-27
    text = html_to_markdown(
        "<html><head><title>Ignored</title><script>bad()</script></head>"
        "<body><h1>Title</h1><p>Hello <strong>world</strong>.</p>"
        '<ul><li>One</li><li><a href="https://example.com">Two</a></li></ul>'
        "</body></html>"
    )
    assert "# Title" in text
    assert "Hello **world**." in text
    assert "- One" in text
    assert "[Two](https://example.com)" in text
    assert "bad()" not in text


def test_normalizes_malformed_html():  # html.test.ts:29-36
    assert (
        normalize_html("<main><p>Hello <strong>world")
        == "<main><p>Hello <strong>world</strong></p></main>"
    )


def test_entities_and_angle_brackets():  # html.test.ts:38-41
    assert "©—B" in html_to_markdown("<p>A&nbsp;&copy;&mdash;B</p>")
    assert html_to_markdown("<p>2 < 3 and 5 > 4</p>") == "2 < 3 and 5 > 4"


def test_nbsp_survives_collapse():
    # &nbsp; decodes to U+00A0 *before* collapseInlineWhitespace, and JS \s
    # matches it — so it collapses with adjacent spaces (html.ts:193-195)
    assert html_to_markdown("<h1>a &nbsp; b</h1>") == "# a b"


def test_table_ragged_rows_and_pipe_escape():  # html.ts:157-177
    text = html_to_markdown(
        "<table><thead><tr><th>a</th><th>b|c</th></tr></thead>"
        "<tbody><tr><td>1</td></tr><tr><td>2</td><td>3</td></tr></tbody></table>"
    )
    assert text == "| a | b\\|c |\n| --- | --- |\n| 1 |  |\n| 2 | 3 |"


def test_nested_lists_numbering():  # html.ts:126-155
    text = html_to_markdown(
        "<ul><li>One<ol><li>x</li><li>y</li></ol></li><li>Two</li></ul>"
    )
    assert text == "- One\n    1. x\n    2. y\n- Two"


def test_blockquote_pre_hr_br_img():
    text = html_to_markdown(
        "<blockquote><p>line1<br>line2</p></blockquote>"
        "<pre>  keep   spacing `x` </pre><hr>"
        '<p><img src="i.png" alt="A pic"></p>'
    )
    assert "> line1\n> line2" in text
    assert "```\nkeep   spacing `x`\n```" in text
    assert "\n---\n" in text
    assert "[Image: A pic](i.png)" in text


def test_code_backtick_escape_and_em():
    assert html_to_markdown("<p><code>a`b</code> and <em>it</em></p>") == (
        "`a\\`b` and _it_"
    )


def test_dropped_elements():
    text = html_to_markdown(
        "<p>keep</p><script>s()</script><style>.x{}</style>"
        "<noscript>n</noscript><template>t</template>"
    )
    assert text == "keep"


def test_normalize_markdown_collapses_blank_runs():
    text = html_to_markdown("<div><p>a</p><p></p><p></p><p>b</p></div>")
    assert text == "a\n\nb"


def test_anchor_without_href_and_img_title():
    assert html_to_markdown('<p><a>plain</a></p>') == "plain"
    assert html_to_markdown('<p><img title="T" src="s.png"></p>') == "[Image: T](s.png)"
    assert html_to_markdown('<p><img alt="only alt"></p>') == "[Image: only alt]"


def test_whitespace_collapse_in_inline_content():
    assert html_to_markdown("<h2>a \t\n  b</h2>") == "## a b"


def test_determinism():
    html = "<body><h1>T</h1><p>x <b>y</b> z</p></body>"
    assert html_to_markdown(html) == html_to_markdown(html)
