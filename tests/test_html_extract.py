"""HTML extraction (C8 + boilerplate heuristics) unit tests."""

from docling_serve_spark.extract.html_extract import extract_html
from docling_serve_spark.docmodel.export import export_to_text
from docling_serve_spark.sources.pages import gen_page


PAGE = b"""<!DOCTYPE html><html><head><title>t</title>
<script>var boiler = 1;</script><style>.x{color:red}</style></head>
<body>
<header><ul class="nav"><li><a href="/a">Home</a></li><li><a href="/b">About</a></li></ul></header>
<div class="sidebar"><a href="/1">link one</a><a href="/2">link two</a><a href="/3">link three</a></div>
<main><article>
<h1>Real Title</h1>
<h2>Section One</h2>
<p>This is the main article content with plenty of meaningful text to win the density score over the navigation chrome around it.</p>
<p>Another paragraph of body text that belongs to the extracted output and nothing else.</p>
<ul><li>alpha item</li><li>beta item</li></ul>
<table><tr><th>k</th><th>v</th></tr><tr><td>x</td><td>1</td></tr></table>
</article></main>
<footer><p>copyright footer text</p></footer>
</body></html>"""


def test_boilerplate_stripped():
    doc = extract_html(PAGE, name="u")
    txt = export_to_text(doc)
    assert "Real Title" in txt
    assert "main article content" in txt
    assert "Home" not in txt          # nav
    assert "link one" not in txt      # sidebar (boiler class)
    assert "copyright" not in txt     # footer
    assert "var boiler" not in txt    # script
    assert "color:red" not in txt     # style


def test_item_types_and_order():
    doc = extract_html(PAGE)
    kinds = [i.item_type for i in doc.items]
    assert kinds == [
        "title",
        "section_header",
        "text",
        "text",
        "list_item",
        "list_item",
        "table",
    ]
    assert doc.items[0].text == "Real Title"
    assert doc.items[4].text == "alpha item"
    t = doc.items[6].table
    assert t.num_rows == 2 and t.num_cols == 2
    assert t.grid[1][0].text == "x"


def test_charspans_index_text_channel():
    doc = extract_html(PAGE)
    txt = export_to_text(doc)
    for item in doc.items:
        s, e = item.prov[0].charspan
        from docling_serve_spark.docmodel.export import item_text

        assert txt[s:e] == item_text(item)


def test_unclosed_tags_tolerated():
    raw = b"<html><body><p>first para<p>second para<ul><li>one<li>two"
    doc = extract_html(raw)
    txt = export_to_text(doc)
    assert "first para" in txt and "second para" in txt
    assert "one" in txt and "two" in txt


def test_empty_page_yields_no_items():
    doc = extract_html(b"<html><head></head><body></body></html>")
    assert doc.items == []


def test_whitespace_normalization_nfc():
    raw = "<html><body><p>á   b\n\tc</p></body></html>".encode()
    doc = extract_html(raw)
    assert doc.items[0].text == "á b c"  # NFC composed + collapsed


def test_determinism_over_corpus():
    for i in range(40):
        row = gen_page(i)
        if not row["html"].startswith(b"%PDF"):
            a = export_to_text(extract_html(row["html"]))
            b = export_to_text(extract_html(row["html"]))
            assert a == b


def test_title_outside_main_is_kept():
    raw = b"""<html><body><h1>Masthead Title</h1><main>
    <p>Body text long enough to be selected as the main content of the page easily.</p>
    <p>More body text here to raise the score of this container well above others.</p>
    </main></body></html>"""
    doc = extract_html(raw)
    assert doc.items[0].item_type == "title"
    assert doc.items[0].text == "Masthead Title"
