"""HTML extraction unit tests pinning the reference's DOM-walk quirks
(SURVEY §5.1; crawler.go:246-349)."""

from rse_ray.functions.extract import extract, resolve_links


def page(head: str, body: str = "") -> str:
    return f"<!DOCTYPE html><html><head>{head}</head><body>{body}</body></html>"


def test_first_title_wins():
    r = extract(page("<title>first</title><title>second</title>"))
    assert r["title"] == "first"


def test_empty_first_title_falls_through():
    # guard is `title == ""` (crawler.go:256-258): an empty first title
    # lets a later non-empty one win
    r = extract(page("<title></title><title>second</title>"))
    assert r["title"] == "second"


def test_title_rcdata_literal_markup():
    # <title> is RCDATA (HTML5 / x/net/html): tags inside are literal text
    r = extract(page("<title>a<b>c</b></title>"))
    assert r["title"] == "a<b>c</b>"


def test_title_entity_decoded():
    r = extract(page("<title>a &amp; b</title>"))
    assert r["title"] == "a & b"


def test_last_meta_description_wins():
    r = extract(
        page(
            '<meta name="description" content="one">'
            '<meta name="description" content="two">'
        )
    )
    assert r["description"] == "two"


def test_meta_description_no_emptiness_guard():
    # no guard: a later matching meta with empty/missing content resets it
    r = extract(
        page('<meta name="description" content="one"><meta name="description">')
    )
    assert r["description"] == ""


def test_meta_name_value_case_insensitive():
    r = extract(page('<meta name="DESCRIPTION" content="x">'))
    assert r["description"] == "x"


def test_meta_other_names_ignored():
    r = extract(page('<meta name="keywords" content="x">'))
    assert r["description"] == ""


def test_body_paragraph_concat():
    r = extract(page("<title>t</title>", "<p>one <b>bold</b> two</p><p>second</p>"))
    # within a <p>: DFS concat, NO separators (crawler.go:281-292);
    # between <p>s: single space (FIXTURES.md §1.3)
    assert r["body"] == "one bold two second"
    assert r["text"] == "t\n\none bold two second"


def test_missing_title_and_meta():
    r = extract(page("", "<p>x</p>"))
    assert r["title"] == "" and r["description"] == ""
    assert r["text"] == "\n\nx"


def test_text_contract():
    r = extract(
        page(
            '<title>T</title><meta name="description" content="D">',
            "<p>B1</p><p>B2</p>",
        )
    )
    assert r["text"] == "T\nD\nB1 B2"


def test_first_href_only():
    # duplicate href attrs on one <a>: first wins (crawler.go:313)
    r = extract('<a href="http://a.example/1" href="http://a.example/2">x</a>')
    assert r["hrefs"] == ["http://a.example/1"]


def test_link_validation_and_resolution():
    hrefs = [
        "/rel/path",                       # relative -> resolved
        "http://other.example/abs",        # absolute http
        "https://sec.example/x",           # https
        "ftp://files.example/f",           # bad scheme -> dropped
        "#frag",                            # fragment-only -> dropped
        "http://other.example/p#frag",     # has fragment -> dropped
        "mailto:x@example.com",            # bad scheme -> dropped
    ]
    out = resolve_links("http://base.example/dir/page.html", hrefs)
    assert out == [
        "http://base.example/rel/path",
        "http://other.example/abs",
        "https://sec.example/x",
    ]


def test_links_extracted_in_document_order_with_duplicates():
    html = (
        '<a href="http://a.example/1">x</a>'
        '<a href="http://a.example/2">y</a>'
        '<a href="http://a.example/1">z</a>'
    )
    r = extract(html)
    assert r["hrefs"] == [
        "http://a.example/1",
        "http://a.example/2",
        "http://a.example/1",
    ]


def test_bytes_input():
    r = extract(page("<title>bytes</title>").encode("utf-8"))
    assert r["title"] == "bytes"


def test_self_closing_meta():
    r = extract(page('<meta name="description" content="sc"/>'))
    assert r["description"] == "sc"


def test_anchor_text_capture():
    """Anchors pair the FIRST href with the <a>'s text content
    (depth-first concat, entities decoded); nested <a> implicitly
    closes; href-less and self-closing anchors behave; anchor text
    inside <p> still reaches the paragraph."""
    from rse_ray.functions.extract import extract

    html = (
        "<html><body>"
        '<p>before <a href="/x">click &amp; go<b>!</b></a> after</p>'
        '<a href="/dup" href="/other">dup</a>'
        "<a>no href</a>"
        '<a href="/open">open one<a href="/two">two</a>'
        '<a href="/selfclosed"/>'
        "</body></html>"
    )
    got = extract(html)
    assert got["anchors"] == [
        ("/x", "click & go!"),
        ("/dup", "dup"),
        ("/open", "open one"),
        ("/two", "two"),
        ("/selfclosed", ""),
    ]
    # hrefs list (the link_extract contract) is exactly the anchor hrefs
    assert got["hrefs"] == [a for a, _ in got["anchors"]]
    # anchor text still contributes to the enclosing paragraph
    assert "before click & go! after" in got["body"]


def test_main_content_blocks_and_rules():
    """Block segmentation + jusText-lite classification unit cases:
    inline tags don't split blocks, script/style/head text vanishes,
    link-dense blocks die regardless of word count, short blocks die
    regardless of density, inline anchors inside long content stay."""
    from rse_ray.functions.maincontent import content_blocks, extract_main

    html = (
        "<html><head><title>t</title><style>p{}</style></head><body>"
        "<p>one two <b>three</b> four</p>"
        "<div>alpha <span>beta</span></div>"
        "</body></html>"
    )
    blocks = [t for t, _, _ in content_blocks(html)]
    assert blocks == ["one two three four", "alpha beta"]

    # link farm: 12 words but ~all chars linked -> dropped
    farm = "<div>" + " ".join(
        f'<a href="/{i}">w{i} x{i}</a>' for i in range(6)) + "</div>"
    # content: 12 words, one 2-word anchor -> kept, anchor text kept
    content = ("<p>aaa bbb ccc ddd eee fff ggg hhh iii "
               '<a href="/y">jjj kkk</a> lll</p>')
    short = "<p>tiny block here</p>"
    text, kept, total = extract_main(
        f"<body>{farm}{content}{short}</body>")
    assert kept == 1 and total == 3
    assert text == "aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk lll"


def test_main_content_malformed_skip_tags():
    """Malformed-HTML behavior of the skip-tag machinery (round-4
    ADVICE): an unterminated <head>/<title> closes implicitly at the
    first block-level start tag (browser auto-close) instead of
    silently discarding the whole document; an unterminated <script>
    swallows the remainder (html.parser CDATA mode — matches browsers);
    valid block content inside <noscript> stays skipped; stray close
    tags are ignored."""
    from rse_ray.functions.maincontent import content_blocks

    words = " ".join(f"w{i}" for i in range(12))

    # unterminated <head> (no </head>): body text must survive
    got = [t for t, _, _ in content_blocks(
        f"<html><head><title>t</title><body><p>{words}</p></body>")]
    assert got == [words]
    # unterminated <title> inside an unterminated <head>: both pop
    got = [t for t, _, _ in content_blocks(
        f"<head><title>site<p>{words}</p>")]
    assert got == [words]
    # unterminated <script>: CDATA mode swallows the remainder —
    # documented, browser-consistent
    got = [t for t, _, _ in content_blocks(
        f"<body><script>var x=1;<p>{words}</p></body>")]
    assert got == []
    # block content inside noscript is valid markup and stays skipped
    got = [t for t, _, _ in content_blocks(
        f"<body><noscript><p>enable js</p></noscript><p>{words}</p>")]
    assert got == [words]
    # stray close tags don't underflow the stack
    got = [t for t, _, _ in content_blocks(
        f"</head></script></title><p>{words}</p>")]
    assert got == [words]


def test_main_content_fixture_golden_roundtrip(tmp_path):
    """The planted-fixture golden (written by construction, not by the
    extractor) is reproduced exactly for every page."""
    import os

    import pyarrow.parquet as pq

    from rse_ray.functions.maincontent import extract_main
    from rse_ray.sources.fixtures import write_boilerplate_fixture

    d = str(tmp_path / "boiler")
    write_boilerplate_fixture(d, n=40, seed=23)
    pages = pq.read_table(os.path.join(d, "pages.parquet")).to_pylist()
    gold = {r["url"]: r for r in pq.read_table(
        os.path.join(d, "golden_main.parquet")).to_pylist()}
    for r in pages:
        t, k, _n = extract_main(r["html"])
        assert t == gold[r["url"]]["main_text"]
        assert k == gold[r["url"]]["n_kept"]


def test_webtext_clean_dedups_only_after_boilerplate(ray_session,
                                                     tmp_path):
    """The composed chain collapses each syndicated copy to one
    survivor — and the raw html level shows NO duplicates, proving
    the dedup can only fire after boilerplate removal."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.pipelines.text import webtext_clean
    from rse_ray.sources.fixtures import write_boilerplate_fixture

    d = str(tmp_path / "boiler")
    write_boilerplate_fixture(d, n=40, n_dup=6, seed=17)
    pages = pq.read_table(os.path.join(d, "pages.parquet"))
    raw = pages.column("html").to_pylist()
    assert len(set(bytes(h) for h in raw)) == len(raw)  # no raw dups

    out = webtext_clean(
        ray.data.read_parquet(os.path.join(d, "pages.parquet")),
        min_tokens=1).to_pandas()
    # with the length gate off, survivors = pages minus the 6 copies
    assert len(out) == 40 - 6
    # survivor per syndicate is the lexicographically-min url
    gold = pq.read_table(os.path.join(d, "golden_main.parquet")) \
        .to_pandas()
    want = gold.groupby("main_text")["url"].min().sort_values()
    assert sorted(out["url"]) == sorted(want)
