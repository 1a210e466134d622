"""BiDi (T2-T4), markdown downgrades (A5), language map (P4)."""

from docling_serve_spark.extract.bidi import get_display
from docling_serve_spark.extract.langmap import (
    convert_to_tesseract_codes,
    format_for_ocrmypdf,
)
from docling_serve_spark.extract.postprocess import (
    bidi_line,
    line_is_rtl,
    markdown_to_doctags,
    markdown_to_html_fallback,
    markdown_to_text,
    process_markdown_bidi,
)

AR = "السلام عليكم"


def test_rtl_predicate():
    assert line_is_rtl("## " + AR)
    assert not line_is_rtl("plain english line")


def test_ltr_lines_untouched():
    text = "# Title\n\nplain body\n"
    assert process_markdown_bidi(text) == text


def test_prefix_preserved_on_rtl_line():
    raw = "## " + AR + "\n"
    out = bidi_line(raw)
    assert out.startswith("## ")
    assert out.endswith("\n")
    # body visually reordered: RTL text reversed at display time
    assert out[3:-1] == get_display(AR)


def test_bullet_and_quote_prefixes():
    for prefix in ("- ", "+ ", "* ", "> "):
        out = bidi_line(prefix + AR + "\n")
        assert out.startswith(prefix)


def test_get_display_pure_ltr_identity():
    assert get_display("hello world 123") == "hello world 123"


def test_get_display_rtl_reverses_words():
    # pure-Arabic two words: display order is word2 word1, chars reversed
    out = get_display(AR)
    assert out == AR[::-1]


def test_get_display_mirrors_brackets():
    out = get_display("قبل (بعد)")
    assert "(" in out and ")" in out
    assert out == "قبل (بعد)"[::-1].replace(")", "\x00").replace("(", ")").replace("\x00", "(")


def test_mixed_line_keeps_latin_run_readable():
    out = get_display("كلمة abc كلمة")
    assert "abc" in out  # embedded LTR run not reversed


def test_process_markdown_groups_consecutive_rtl():
    text = "intro\n" + AR + "\n" + AR + "\nclose\n"
    out = process_markdown_bidi(text)
    lines = out.splitlines()
    assert lines[0] == "intro" and lines[3] == "close"
    assert lines[1] == get_display(AR) and lines[2] == get_display(AR)


def test_idempotence_on_ltr_markdown():
    md = "# h\n\n- a\n- b\n\n```\ncode\n```\n"
    assert process_markdown_bidi(process_markdown_bidi(md)) == process_markdown_bidi(md)


# --- A5 downgrades (reference:response_preparation.py:24-71) ---


def test_markdown_to_text_strips_and_collapses():
    md = "# Head\n\n*bold* `code` [link](url)\n\n\nend"
    out = markdown_to_text(md)
    assert out == "Head\nbold code linkurl\nend"


def test_html_and_doctags_fallbacks():
    assert markdown_to_html_fallback("x") == "<pre>x</pre>"
    assert markdown_to_doctags("x") == "<document>x</document>"


# --- P4 language mapping (reference:ocr_language_utils.py) ---


def test_langmap_conversion():
    assert convert_to_tesseract_codes(["en", "ar"]) == ["eng", "ara"]
    # already-tesseract codes pass through
    assert convert_to_tesseract_codes(["eng"]) == ["eng"]
    # unknown dropped, dupes removed preserving order, case-normalized
    assert convert_to_tesseract_codes(["EN", "xx-unknown", "english", "fr"]) == [
        "eng",
        "fra",
    ]
    assert convert_to_tesseract_codes([]) == []
    assert convert_to_tesseract_codes(None) == []


def test_format_for_ocrmypdf():
    assert format_for_ocrmypdf(["eng", "ara"]) == "eng+ara"
    assert format_for_ocrmypdf([]) == ""


def test_pure_rtl_fast_path_matches_full_pipeline():
    """The all-RTL shortcut in get_display must be indistinguishable
    from the full W/N/I/L pipeline (run here with the gate disabled
    via a source-patched module copy)."""
    import random
    import types

    import docling_serve_spark.extract.bidi as bidi

    src = open(bidi.__file__).read().replace(
        "if base == 1 and all(", "if False and base == 1 and all("
    )
    nofast = types.ModuleType("bidi_nofast")
    exec(compile(src, "bidi_nofast", "exec"), nofast.__dict__)

    rng = random.Random(11)
    arabic = [chr(c) for c in range(0x0621, 0x064B)] + [" "]
    hebrew = [chr(c) for c in range(0x05D0, 0x05EB)] + [" ", "«", "»"]
    for pool in (arabic, hebrew):
        for _ in range(500):
            s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 50)))
            assert bidi.get_display(s) == nofast.get_display(s), repr(s)
