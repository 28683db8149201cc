"""Unit tests for the HTML main-content extraction kernel."""

from deepdoc_api_spark.kernels.html_extract import extract_html_blocks


def kinds(records):
    return [r["kind"] for r in records]


def test_basic_paragraph_and_heading():
    html = "<h1>Title Words</h1><p>This is a paragraph with enough characters.</p>"
    recs = extract_html_blocks(html)
    assert kinds(recs) == ["title", "text"]
    assert recs[0]["text"] == "Title Words"
    assert recs[1]["text"] == "This is a paragraph with enough characters."


def test_nav_footer_aside_dropped():
    html = (
        "<nav><ul><li><a href='/a'>Home page link</a></li></ul></nav>"
        "<p>Main content paragraph that is long enough to keep.</p>"
        "<footer>Copyright two thousand something long footer text</footer>"
        "<aside>Sidebar content that would otherwise be long enough</aside>"
    )
    recs = extract_html_blocks(html)
    assert kinds(recs) == ["text"]
    assert "Main content" in recs[0]["text"]


def test_boilerplate_class_dropped():
    html = (
        '<div class="ads banner"><p>Buy this amazing product now please.</p></div>'
        "<p>Real content paragraph that is long enough to keep.</p>"
        '<div id="comments-section"><p>A comment that is long enough to drop.</p></div>'
    )
    recs = extract_html_blocks(html)
    assert len(recs) == 1
    assert recs[0]["text"].startswith("Real content")


def test_link_density_filter():
    # a block made mostly of links is furniture
    html = (
        '<p><a href="/x">link one text</a> <a href="/y">link two text</a> and</p>'
        "<p>Normal paragraph with a small <a href='/z'>link</a> inside it, kept.</p>"
    )
    recs = extract_html_blocks(html)
    assert len(recs) == 1
    assert "Normal paragraph" in recs[0]["text"]


def test_short_text_blocks_dropped_but_titles_and_lists_kept():
    html = "<p>tiny</p><h3>Hd</h3><ul><li>item one</li><li>item two</li></ul>"
    recs = extract_html_blocks(html)
    assert kinds(recs) == ["title", "list", "list"]


def test_inline_img_becomes_media_in_order():
    html = (
        "<p>First paragraph long enough to be kept around.</p>"
        '<img src="media://1/pic.png">'
        "<p>Second paragraph long enough to be kept around.</p>"
    )
    recs = extract_html_blocks(html)
    assert kinds(recs) == ["text", "media", "text"]
    assert recs[1]["media_ref"] == "media://1/pic.png"


def test_img_inside_boilerplate_dropped():
    html = '<nav><img src="logo.png"></nav><p>Content paragraph long enough here.</p>'
    recs = extract_html_blocks(html)
    assert kinds(recs) == ["text"]


def test_table_extraction():
    html = "<table><tr><td>cell one</td><td>cell two</td></tr><tr><td>r2c1</td><td>r2c2</td></tr></table>"
    recs = extract_html_blocks(html)
    assert kinds(recs) == ["table"]
    assert recs[0]["text"] == "cell one | cell two r2c1 | r2c2"


def test_script_style_dropped():
    html = (
        "<script>var x = 'this script text must never ever appear';</script>"
        "<style>p { color: red; font-size: larger than life }</style>"
        "<p>Visible paragraph content that is long enough.</p>"
    )
    recs = extract_html_blocks(html)
    assert len(recs) == 1
    assert "script" not in recs[0]["text"]


def test_loose_container_text():
    html = "<div>Loose container text that is definitely long enough to keep.</div>"
    recs = extract_html_blocks(html)
    assert kinds(recs) == ["text"]


def test_entities_and_whitespace_normalized():
    html = "<p>alpha &amp; beta\n\n   gamma &lt;tag&gt; delta epsilon zeta</p>"
    recs = extract_html_blocks(html)
    assert recs[0]["text"] == "alpha & beta gamma <tag> delta epsilon zeta"


def test_empty_and_garbage():
    assert extract_html_blocks("") == []
    assert extract_html_blocks("   ") == []
    recs = extract_html_blocks("no tags at all but a reasonably long sentence here")
    assert kinds(recs) == ["text"]


def test_deterministic():
    html = "<h2>H</h2><p>Paragraph long enough to be kept for sure.</p>"
    assert extract_html_blocks(html) == extract_html_blocks(html)
