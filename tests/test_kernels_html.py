"""Tier-1: HTML stripper kernel (no Spark)."""

from ai_ocr_spark.kernels.html import (
    collapse_ws,
    decode_entities,
    extract_main_text,
    parse_blocks,
    sniff_kind,
)


def test_collapse_ws():
    assert collapse_ws("  a\t\nb\xa0 c  ") == "a b c"
    assert collapse_ws("") == ""
    assert collapse_ws(" \n\t ") == ""


def test_entities():
    assert decode_entities("a &amp; b &lt;x&gt; &#65;&#x42; &nbsp;") == "a & b <x> AB \xa0"
    assert decode_entities("no entities") == "no entities"
    assert decode_entities("&bogus12345;") == "&bogus12345;"


def test_basic_extraction_drops_chrome():
    html = (
        "<!DOCTYPE html><html><head><title>T</title><script>var x='<p>no</p>';"
        "</script><style>p{}</style></head><body>"
        '<nav><a href="/">Home</a> <a href="/x">X</a></nav>'
        "<article><p>Main content paragraph one.</p>"
        "<p>Second paragraph with more words here.</p></article>"
        '<footer><a href="/tos">Terms</a></footer></body></html>'
    )
    out = extract_main_text(html)
    assert out == "Main content paragraph one.\nSecond paragraph with more words here."


def test_link_density_removes_menus():
    html = (
        "<body><ul>"
        + "".join(f'<li><a href="/{i}">item {i}</a></li>' for i in range(10))
        + "</ul><p>Real body text that should stay in the output.</p></body>"
    )
    out = extract_main_text(html)
    assert out == "Real body text that should stay in the output."


def test_nested_and_misnested_tags():
    html = "<div><p>alpha <b>beta</b> gamma</div></p><p>delta</p>"
    out = extract_main_text(html)
    assert "alpha beta gamma" in out
    assert "delta" in out


def test_entities_in_text():
    html = "<p>Tom &amp; Jerry &lt;3 &#x263A;</p>"
    assert extract_main_text(html) == "Tom & Jerry <3 ☺"


def test_empty_and_truncated():
    assert extract_main_text("") == ""
    assert extract_main_text("<p>cut off here <div cla") == "cut off here"


def test_comment_and_doctype_skipped():
    html = "<!-- <p>ghost</p> --><p>visible</p>"
    assert extract_main_text(html) == "visible"


def test_arena_block_fields():
    arena = parse_blocks("<p>one two three</p><p><a href='/'>link text</a></p>")
    assert len(arena) == 2
    assert arena.text(0) == "one two three"
    assert int(arena.n_words[0]) == 3
    assert int(arena.link_chars[1]) == len("link text")


def test_title_excluded():
    html = "<html><head><title>Page Title</title></head><body><p>body words here</p></body></html>"
    assert extract_main_text(html) == "body words here"


def test_quoted_gt_in_attr():
    html = '<p data-x="a>b">kept text here</p>'
    assert extract_main_text(html) == "kept text here"


def test_sniff_kind():
    assert sniff_kind(b"") == "empty"
    assert sniff_kind(b"%PDF-1.4\n...") == "pdf"
    assert sniff_kind(b"<!DOCTYPE html><html></html>") == "html"
    assert sniff_kind(b"  <html><body></body></html>") == "html"
    assert sniff_kind(b"a,b,c\n1,2,3\n4,5,6\n") == "csv"
    assert sniff_kind(b"just some plain text\nwith lines\n") == "text"
    assert sniff_kind(bytes([0, 159, 146, 150]) * 16) == "binary"


def test_byte_identity_utf8():
    html = "<p>日本語のテキスト &amp; more</p>"
    out = extract_main_text(html)
    assert out.encode("utf-8") == "日本語のテキスト & more".encode("utf-8")


def test_unclosed_head_does_not_blank_the_page():
    """HTML5 allows omitting </head>; <body> must imply it."""
    from ai_ocr_spark.kernels.html import extract_main_text

    html = (
        "<html><head><title>T</title><meta charset=utf-8>"
        "<body><p>Real content words here for everyone</p></body></html>"
    )
    assert extract_main_text(html) == "Real content words here for everyone"


def test_deeply_unclosed_lists_do_not_overflow_depth():
    from ai_ocr_spark.kernels.html import extract_main_text

    html = "<html><body>" + "<li>item one two three " * 40000 + "</body></html>"
    out = extract_main_text(html)
    assert "item one two three" in out


# --- outlink recorder + reference resolution ---------------------------------


def test_links_recorded_in_document_order_with_all_href_forms():
    from ai_ocr_spark.kernels.html import parse_document_links

    html = (
        '<html><body><p><a href="https://x.org/a?q=1">Abs</a>'
        "<a href='/root'>Root</a>"
        '<a href=bare>Bare</a>'
        '<a href="../up/two">Up &amp; Two</a>'
        '<a href="//cdn.x/y">Proto</a>'
        '<a href="#frag">Frag only</a>'
        '<a href="">Empty</a>'
        '<a>No href</a>'
        '<a href="mailto:a@b.c">Mail</a></p></body></html>'
    )
    _arena, _tables, links = parse_document_links(
        html, "https://s.example.com/dir/page.html"
    )
    assert [(l["href"], l["resolved"], l["anchor"]) for l in links] == [
        ("https://x.org/a?q=1", "https://x.org/a?q=1", "Abs"),
        ("/root", "https://s.example.com/root", "Root"),
        ("bare", "https://s.example.com/dir/bare", "Bare"),
        ("../up/two", "https://s.example.com/up/two", "Up & Two"),
        ("//cdn.x/y", "https://cdn.x/y", "Proto"),
        # fragment-only, empty and href-less anchors are not outlinks
        ("mailto:a@b.c", "mailto:a@b.c", "Mail"),
    ]


def test_links_survive_unclosed_and_nested_anchors_and_skip_main_text():
    from ai_ocr_spark.kernels.html import (
        extract_main_text,
        parse_document_links,
    )

    html = (
        "<html><body><p>before "
        '<a href="/outer">out <a href="/inner">in</a></a>'
        ' mid <a href="/tail">tail text'
        "</body></html>"
    )
    _a, _t, links = parse_document_links(html, "https://h.example.com/p/q")
    by_href = {l["href"]: l["anchor"] for l in links}
    # nested (invalid) anchor: text accrues to the innermost open one
    assert by_href["/inner"] == "in"
    assert by_href["/outer"] == "out"
    # unclosed anchor at EOF still finalizes
    assert by_href["/tail"] == "tail text"
    # the recorder is passive: this link-dense block classifies as
    # boilerplate exactly as it did before the recorder existed
    assert extract_main_text(html) == ""
    # and a content-dominant block keeps its exact bytes with the
    # anchor text inline
    content = (
        "<html><body><p>seven plain words before the link "
        '<a href="/x">x</a> and seven more plain words after</p>'
        "</body></html>"
    )
    assert extract_main_text(content) == (
        "seven plain words before the link x and seven more plain words after"
    )


def test_href_attribute_tokenizer_ignores_lookalikes():
    from ai_ocr_spark.kernels.html import parse_document_links

    def hrefs(a_tag):
        _, _, links = parse_document_links(
            f"<html><body><p>{a_tag}</p></body></html>", "https://h.x/a/b"
        )
        return [l["href"] for l in links]

    # a data-href attribute is NOT an href
    assert hrefs('<a data-href="/tracked">x</a>') == []
    # an 'href=' INSIDE another attribute's quoted value is not the href
    assert hrefs('<a title="see href=foo" href="/real">x</a>') == ["/real"]
    # a valueless attribute before the real href does not derail it
    assert hrefs('<a download href="/dl">x</a>') == ["/dl"]


def test_resolve_url_edge_cases():
    from ai_ocr_spark.kernels.html import resolve_url

    base = "https://h.example.com/a/b/c.html"
    assert resolve_url(base, "d.html") == "https://h.example.com/a/b/d.html"
    assert resolve_url(base, "./d") == "https://h.example.com/a/b/d"
    assert resolve_url(base, "../../up") == "https://h.example.com/up"
    # cannot climb past the root
    assert resolve_url(base, "../../../../x") == "https://h.example.com/x"
    assert resolve_url("https://h.example.com", "/p") == "https://h.example.com/p"
    # no parseable base: href passes through untouched
    assert resolve_url("", "p/q") == "p/q"
    assert resolve_url(base, "") == base
